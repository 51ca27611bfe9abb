"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969).

Entity resolution over a single master table (dedup flavor) or two
tables (linkage flavor): candidate pairs come from equi-join BLOCKING,
each pair is compared on a set of agree/disagree features, and the
match score is the sum of per-feature log-odds weights
``ln(m/u)`` (agreement) / ``ln((1-m)/(1-u))`` (disagreement), where
``m`` is the feature's agreement probability among true matches and
``u`` among non-matches. Pairs are classified by two thresholds into
match / possible / non-match — the classic three-way FS decision rule.

Scale shape: the pair generator is an equi-join on the blocking key
(never a cross join), so work is sum over blocks of O(n_b^2) — the
standard blocking bound; at 100 TB the blocking key is the lever
(sorted-neighborhood windows or LSH buckets swap in as ``block_col``
without touching the scorer). Features are plain column predicates
evaluated inside whole-stage codegen; weights are Python-computed
double literals so an external SQL engine re-deriving the score adds
the exact same IEEE doubles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FSFeature:
    """One comparison feature: ``agree(left, right)`` is a boolean
    Column over the pair; ``m``/``u`` are the FS conditional agreement
    probabilities (0 < u < m < 1)."""

    name: str
    agree: Callable[[Callable[[str], Column], Callable[[str], Column]], Column]
    m: float
    u: float

    @property
    def w_agree(self) -> float:
        return math.log(self.m / self.u)

    @property
    def w_disagree(self) -> float:
        return math.log((1.0 - self.m) / (1.0 - self.u))


def fs_score_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    features: list[FSFeature],
    match_threshold: float,
    possible_threshold: float,
) -> DataFrame:
    """Score all within-block pairs (id_a < id_b) of ``df``.

    Returns (block, id_a, id_b, <feature flags>, score, decision) with
    ``decision`` in {'match', 'possible', 'non_match'}. The join is
    equi-keyed on ``block_col`` only; feature predicates are residual
    conditions so Catalyst keeps the sort-merge/shuffled-hash plan.
    """
    left = df.select([F.col(c).alias(f"__l_{c}") for c in df.columns])
    right = df.select([F.col(c).alias(f"__r_{c}") for c in df.columns])
    lc = lambda c: F.col(f"__l_{c}")  # noqa: E731
    rc = lambda c: F.col(f"__r_{c}")  # noqa: E731
    pairs = left.join(
        right,
        (lc(block_col) == rc(block_col)) & (lc(id_col) < rc(id_col)),
    )
    score = F.lit(0.0)
    flags = []
    for f in features:
        flag = f.agree(lc, rc)
        flags.append(flag.alias(f"agree_{f.name}"))
        score = score + F.when(flag, F.lit(f.w_agree)).otherwise(
            F.lit(f.w_disagree)
        )
    scored = pairs.select(
        lc(block_col).alias("block"),
        lc(id_col).alias("id_a"),
        rc(id_col).alias("id_b"),
        *flags,
        score.alias("score"),
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("score") >= match_threshold, F.lit("match"))
        .when(F.col("score") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def _distributed_block_rank(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_by: list[str],
    carry: list[str],
) -> DataFrame:
    """Materialized per-block dense rank: ``_block_rank_plan`` built and
    eagerly localCheckpoint'd (see that function's determinism note).
    Returns (block, __id, __c_<carry>..., __rn)."""
    return _block_rank_plan(
        df, id_col=id_col, block_col=block_col, order_by=order_by,
        carry=carry,
    ).localCheckpoint(eager=True)


def _block_rank_plan(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_by: list[str],
    carry: list[str],
    _freeze: bool = True,
) -> DataFrame:
    """Per-block dense rank (1-based, ordered by ``order_by`` then
    ``id_col``) computed with parallelism INDEPENDENT of block
    cardinality. Returns (block, __id, __c_<carry>..., __rn).

    Three stages, none of which concentrates a block on one task:
      1. ``repartitionByRange(block, *order, id)`` — the distributed
         sort; each block occupies a contiguous run of partitions.
      2. ``row_number() over (partition by (spark_partition_id, block))``
         — local ranks; every task sorts only its own partition slice.
      3. per-(partition, block) counts → cumulative offsets per block
         (a window over an O(n_partitions + n_blocks)-row side frame,
         broadcast-joined back) lift local ranks to global ones.

    Determinism: the total order (block, *order_by, id) is strict (id
    is unique), so the global rank is independent of where the range
    boundaries fall. The returned frame is MATERIALIZED (eager
    localCheckpoint): spark_partition_id is only stable within one
    physical execution — callers join two projections of this frame,
    and without the checkpoint each projection re-executes the range
    exchange, where AQE may coalesce the two instances differently and
    hand the offset join inconsistent pids (observed at sf0.1 as a
    ~8% pair-count inflation in sorted_neighborhood_pairs: probes
    ranked by one execution, the join side by another). One
    materialization also removes the duplicate rank computation the
    old per-block-window version paid.
    """
    from pyspark.sql import Window as W

    order_cols = [F.col(c).alias(f"__o_{i}") for i, c in enumerate(order_by)]
    o_names = [f"__o_{i}" for i in range(len(order_by))]
    base = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("__id"),
        *order_cols,
        *[F.col(c).alias(f"__c_{c}") for c in carry],
    )
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    ranged = base.repartitionByRange(
        n_parts,
        F.col("block"),
        *[F.col(c) for c in o_names],
        F.col("__id"),
    ).withColumn("__pid", F.spark_partition_id())
    if _freeze:
        # freeze __pid as DATA before anything consumes it: the
        # local-rank window and the offset counts are two consumers,
        # and two physical executions of the range exchange need not
        # coalesce identically under AQE — observed at sf0.1 as a ~8%
        # pair-count inflation when the probes side and the join side
        # ranked against different pid layouts. The eager checkpoint
        # makes every consumer read one materialization. (_freeze=False
        # exists ONLY so tests can pin the pre-checkpoint plan shape.)
        ranged = ranged.localCheckpoint(eager=True)
    local = ranged.withColumn(
        "__lrn",
        F.row_number().over(
            W.partitionBy("__pid", "block").orderBy(*o_names, "__id")
        ),
    )
    counts = ranged.groupBy("__pid", "block").agg(
        F.count(F.lit(1)).alias("__n")
    )
    cum = W.partitionBy("block").orderBy("__pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        "block",
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias("__off"),
    )
    return local.join(F.broadcast(offsets), ["__pid", "block"]).select(
        "block",
        "__id",
        *[f"__c_{c}" for c in carry],
        (F.col("__lrn") + F.col("__off")).cast("int").alias("__rn"),
    )


def snm_tolerance_components(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_col: str,
    tol: float,
) -> DataFrame:
    """Connected components of an SNM tolerance match graph WITHOUT
    iterative contraction: one ranked pass, O(1) rounds at any scale.

    The match graph "edge iff rank distance <= window AND
    |key_b - key_a| <= tol over a per-block sort on ``order_col``" has
    interval structure: for ranks i < m < m+1 <= j, IEEE subtraction
    is correctly rounded and rounding is monotone, so
    fl(key_{m+1} - key_m) <= fl(key_j - key_i) UNCONDITIONALLY — any
    edge (i, j) implies every consecutive-rank edge between them
    (window >= 1 covers the rank condition). Components are therefore
    EXACTLY the maximal runs of consecutive ranks whose adjacent gap
    is <= tol — gaps-and-islands, independent of the window size.
    This replaces the 9-round two-star contraction the sf0.1 SNM
    chain graph needed (28 s, 11% of the whole bench) with one
    segmented scan (~45 shuffled stages down to ~7); the definitional
    recursive-closure oracle of ``linkage_snm_clusters`` is unchanged
    and re-proves the equivalence hash-exactly every round, and
    ``tests/test_linkage.py`` pins symmetric-diff-0 against
    ``connected_components_twostar`` on the real pipeline.

    Scale shape: ranks come from ``_distributed_block_rank`` (range
    partition + pid-local windows + broadcast offsets — parallelism
    independent of block cardinality), the consecutive-gap lag is a
    pure equi-join on (block, rank), and the island index is a
    segmented prefix sum built with the SAME machinery as the rank:
    pid-local cumulative sums over a frozen range layout plus
    broadcast per-(pid, block) break-count offsets (an
    O(n_partitions + n_blocks) side frame, never row data).

    Returns (id, component) for EVERY input row, component = min id
    in the component (``connected_components_twostar``'s convention;
    singletons label themselves).
    """
    from pyspark.sql import Window as W

    ranked = _distributed_block_rank(
        df,
        id_col=id_col,
        block_col=block_col,
        order_by=[order_col],
        carry=[order_col],
    )
    val = f"__c_{order_col}"
    prev = ranked.select(
        "block",
        (F.col("__rn") + 1).alias("__rn"),
        F.col(val).alias("__prev"),
    )
    # NULL/NaN keys break UNCONDITIONALLY (ADVICE r12): the definitional
    # window graph produces no edge for a NULL/NaN key (NULL arithmetic
    # is NULL; NaN - x is NaN, never <= tol), so such rows must be
    # singletons — the old NULL-compares-falsy path silently fused them
    # into the preceding island. Equivalence survives because Spark's
    # sort order puts NULLs first and NaNs last: bad-key rows are never
    # BETWEEN two real keys in rank order, so the reals remain one
    # contiguous run where the IEEE interval-structure argument applies
    # unchanged, and breaking on either side of a bad key isolates it.
    bad_a = F.col(val).isNull() | F.isnan(F.col(val).cast("double"))
    bad_p = F.isnan(F.col("__prev").cast("double"))
    brk = ranked.join(prev, ["block", "__rn"], "left").select(
        "block",
        "__id",
        "__rn",
        F.when(
            F.col("__prev").isNull()  # rank 1 OR prev key NULL
            | bad_a
            | bad_p
            | (F.col(val) - F.col("__prev") > F.lit(tol)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__brk"),
    )
    # segmented prefix sum of break flags = island index; same freeze
    # discipline as _block_rank_plan (pid as data, one materialization)
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    ranged = (
        brk.repartitionByRange(n_parts, F.col("block"), F.col("__rn"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = ranged.withColumn(
        "__lcum",
        F.sum("__brk").over(
            W.partitionBy("__pid", "block")
            .orderBy("__rn")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    counts = ranged.groupBy("__pid", "block").agg(
        F.sum("__brk").alias("__n")
    )
    cum = W.partitionBy("block").orderBy("__pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        "block",
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias("__off"),
    )
    islands = local.join(F.broadcast(offsets), ["__pid", "block"]).select(
        "block",
        "__id",
        (F.col("__lcum") + F.col("__off")).alias("__island"),
    )
    reps = islands.groupBy("block", "__island").agg(
        F.min("__id").alias("component")
    )
    return islands.join(reps, ["block", "__island"]).select(
        F.col("__id").alias("id"), "component"
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_by: list[str],
    window: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo,
    SIGMOD 1995) — the other classic blocking scheme: within each block,
    sort by a fuzzy key and pair every record with its ``window``
    nearest neighbors in sort order. Where equi-blocking misses matches
    that straddle a block boundary value, SNM catches anything CLOSE in
    the sort key; pair count is exactly O(n * window), never O(n_b^2).

    Plan shape: rank assignment is a DISTRIBUTED sort, never a
    per-block window — ``Window.partitionBy(block)`` would put each
    block's entire sort on one task, and with a low-cardinality block
    key (5 market segments) that is a single-core sort of n/5 rows no
    matter how many executors exist. Instead: ``repartitionByRange``
    on (block, order keys, id) gives a global range-sorted layout
    whose parallelism is the partition count, a window keyed on
    (spark_partition_id, block) assigns LOCAL row numbers (each task
    sorts only its own partition), and per-(partition, block) counts
    — a frame of O(n_partitions + n_blocks) rows, never row data —
    yield cumulative offsets that lift local ranks to global ones.
    Because range partitioning makes each block occupy a contiguous
    partition span, offset + local rank reproduces exactly the
    per-block dense rank of the naive window. A/B on the adversarial
    ONE-block case (tools/ab_snm_rank.py, 8M rows, local[32], min of
    3): naive per-block window 13.56 s (one task sorts everything);
    distributed rank 2.53 s (5.4x) with a symmetric-diff-0 identical
    output — and the gap is the cluster size at 100 TB, not 5.4x.
    Each record then explodes into ``window`` (rank + offset)
    probe keys and candidate pairs come from a pure EQUI-join on
    (block, rank) — no range join, no self-join with inequality
    residuals, so the plan stays sort-merge/shuffled-hash friendly at
    any scale. Returns one row per candidate pair:
    (block, id_a, id_b, rank_gap, <carry>_a, <carry>_b).
    """
    if window < 1:
        raise ValueError("window must be >= 1")

    carry = carry or []
    ranked = _distributed_block_rank(
        df, id_col=id_col, block_col=block_col, order_by=order_by,
        carry=carry,
    )
    probes = ranked.select(
        "block",
        F.col("__id").alias("id_a"),
        *[F.col(f"__c_{c}").alias(f"{c}_a") for c in carry],
        F.col("__rn").alias("__rn_a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, window + 1)])
        ).alias("__off"),
    ).withColumn("__rn", F.col("__rn_a") + F.col("__off"))
    right = ranked.select(
        "block",
        F.col("__id").alias("id_b"),
        *[F.col(f"__c_{c}").alias(f"{c}_b") for c in carry],
        "__rn",
    )
    return probes.join(right, ["block", "__rn"]).select(
        "block",
        "id_a",
        "id_b",
        F.col("__off").cast("int").alias("rank_gap"),
        *[f"{c}_a" for c in carry],
        *[f"{c}_b" for c in carry],
    )


def _jaro(a: str, b: str) -> float:
    """Textbook Jaro similarity (match window floor(max/2)-1,
    half-transpositions) — bit-for-bit equal to DuckDB's
    jaro_similarity on every fixture pair (verified over the 44,970
    sf0.1 SNM candidate pairs at full double precision)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(la, lb) // 2 - 1
    if win < 0:
        win = 0
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                bm[j] = am[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if am[i]:
            while not bm[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_winkler(a: str, b: str, p: float = 0.1, thresh: float = 0.7) -> float:
    sim = _jaro(a, b)
    if sim > thresh:
        pl = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            pl += 1
        sim = sim + pl * p * (1.0 - sim)
    return sim


def jaro_winkler_scores(
    pairs: DataFrame, left_col: str, right_col: str, out_col: str = "jw"
) -> DataFrame:
    """Append the Jaro-Winkler similarity of two string columns.

    Spark has no built-in JW (levenshtein yes, JW no), and the
    character-level matching DP is genuinely non-relational, so this
    is one Arrow-batched ``mapInPandas`` kernel — the same dispensation
    as the PNG/PCM codecs, never a row-at-a-time ``F.udf``. The cost
    model is what makes it scale-sound: the kernel runs on CANDIDATE
    pairs (SNM / blocking output, O(n·window)), never on a cross
    join, so the Python-side work is proportional to the blocked
    candidate volume exactly like ``edit_distance_neardup``'s
    levenshtein stage. Winkler variant pinned to DuckDB's: prefix
    cap 4, scale 0.1, boost threshold 0.7 (bonus only when jaro >
    0.7) — verified bit-identical on all 44,970 sf0.1 candidate
    pairs, so the oracle can be DuckDB's own jaro_winkler_similarity.
    """
    import pandas as pd  # noqa: F401 (arrow batch contract)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    ) + f", {out_col} double"

    def batches(it):
        for pdf in it:
            pdf[out_col] = [
                _jaro_winkler(x, y)
                for x, y in zip(pdf[left_col], pdf[right_col])
            ]
            yield pdf

    return pairs.mapInPandas(batches, schema=out_schema)
