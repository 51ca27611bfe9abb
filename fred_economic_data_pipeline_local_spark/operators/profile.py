"""Single-pass column profiling: the ingest-monitoring statistics a
lake pipeline checks after every snapshot load (null explosions, key
cardinality drift, out-of-range values) — the distributed counterpart of
the reference pipeline's ad-hoc ``df.info()``-style inspection during
transform (reference: ``scripts/transform_fred_data.py`` null/sentinel
handling, which presumes exactly these per-column facts).

Output is long-form — one row per column — so the profile of a
1000-column table is 1000 rows, not a 6000-column row: directly
joinable against a previous snapshot's profile for drift alerts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one row per profiled column.

    ONE scan, ONE aggregate row, zero joins: all per-column aggregates
    are expressions of a single global ``agg`` (partial map-side
    aggregation shuffles one tiny row per task), then the wide row is
    pivoted to long form driver-side-free via a literal struct array +
    explode — a constant-size projection of a 1-row DataFrame.

    min/max are computed on the NATIVE type (so numeric columns order
    numerically, not lexicographically) and cast to string afterwards,
    giving the profile a single stable schema across heterogeneous
    columns.

    ``n_distinct`` defaults to exact ``count(DISTINCT col)``. Multiple
    exact distincts in one aggregate make Catalyst plan an Expand (one
    duplicated stream per distinct column) — fine for the tens-of-
    columns case, but at 100 TB x wide tables pass
    ``approx_distinct=True`` to use HyperLogLog++
    (``approx_count_distinct``, default rsd 5%): no Expand, constant
    sketch memory per column, single exchange. The exact mode is the
    oracle-checkable one; the approx mode is the scale path (same
    contract as ``df_cap``/``fp_cap`` elsewhere: exactness is the
    default, scale is an explicit opt-in).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    nd = (
        (lambda c: F.approx_count_distinct(F.col(c)))
        if approx_distinct
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def profile_drift(
    curr: DataFrame,
    prev: DataFrame,
    null_rate_jump: float = 0.01,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
) -> DataFrame:
    """Snapshot-over-snapshot drift report from two ``profile_columns``
    outputs: one row per column with current/previous null rates,
    distinct cardinalities, and boolean alerts.

    This is the consumer the long-form profile exists for: a full-outer
    join on ``col_name`` (so a column appearing in or vanishing from the
    schema surfaces as a row with one NULL side and ``alert_schema``
    set), then pure column arithmetic. Both inputs are tiny (one row per
    column), so the join is trivially broadcast and the whole report
    costs two profile scans — there is no third pass over the data.

    Alerts: ``alert_nulls`` when the null RATE rose by more than
    ``null_rate_jump`` (absolute); ``alert_distinct`` when the distinct-
    cardinality ratio curr/prev leaves ``distinct_ratio_band`` (key
    explosion or collapse); ``alert_schema`` on column add/remove.
    Rates and the ratio are rounded to 6dp so the report is stable
    across engines.
    """
    lo, hi = distinct_ratio_band
    c = curr.select(
        F.col("col_name"),
        F.col("n_rows").alias("n_rows_curr"),
        F.col("n_nulls").alias("__nn_c"),
        F.col("n_distinct").alias("n_distinct_curr"),
    )
    p = prev.select(
        F.col("col_name"),
        F.col("n_rows").alias("n_rows_prev"),
        F.col("n_nulls").alias("__nn_p"),
        F.col("n_distinct").alias("n_distinct_prev"),
    )
    j = c.join(p, "col_name", "full_outer")
    rate_c = F.round(F.col("__nn_c") / F.greatest(F.col("n_rows_curr"), F.lit(1)), 6)
    rate_p = F.round(F.col("__nn_p") / F.greatest(F.col("n_rows_prev"), F.lit(1)), 6)
    ratio = F.round(
        F.col("n_distinct_curr") / F.greatest(F.col("n_distinct_prev"), F.lit(1)).cast("double"),
        6,
    )
    schema_alert = F.col("n_rows_curr").isNull() | F.col("n_rows_prev").isNull()
    return j.select(
        "col_name",
        "n_rows_curr",
        "n_rows_prev",
        rate_c.alias("null_rate_curr"),
        rate_p.alias("null_rate_prev"),
        "n_distinct_curr",
        "n_distinct_prev",
        ratio.alias("distinct_ratio"),
        F.coalesce(rate_c - rate_p > F.lit(null_rate_jump), F.lit(False)).alias(
            "alert_nulls"
        ),
        F.coalesce(
            (ratio < F.lit(lo)) | (ratio > F.lit(hi)), F.lit(False)
        ).alias("alert_distinct"),
        schema_alert.alias("alert_schema"),
    )


def sketch_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable per-column profile: (col_name, n_rows, n_nulls,
    distinct_sketch) with a Datasketches HLL sketch per column.

    The incremental counterpart of ``profile_columns``: counts add and
    HLL sketches UNION, so a lake pipeline profiles each ingested
    snapshot once and maintains the whole-corpus profile by merging —
    O(delta) per ingest instead of re-scanning the accumulated corpus,
    the same maintenance shape as the fingerprint/band indexes in
    ``operators/dedup``. Same single-scan / single-aggregate-row /
    explode-to-long-form plan as ``profile_columns``; the sketch column
    is a few KB of binary per profiled column, safely collectable and
    persistable alongside the lake.

    ``lg_k`` must match across profiles that will be merged (the union
    operator requires a common configuration to stay lossless).
    """
    cols = cols or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        # hll_sketch_agg skips nulls; cast to string so heterogeneous
        # column types share one sketch item type (union-compatible)
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(
                f"__sk_{c}"
            )
        )
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__sk_{c}").alias("distinct_sketch"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def merge_sketch_profiles(*profiles: DataFrame) -> DataFrame:
    """Union N per-snapshot sketch profiles into one corpus profile:
    (col_name, n_rows, n_nulls, n_distinct_est).

    Counts sum; sketches merge via ``hll_union_agg`` — lossless in the
    HLL sense: register state is a per-item max, so the union carries
    the same information as sketching the concatenated corpus directly.
    The ESTIMATES can differ by a hair (the union gadget holds HLL_8
    registers while a direct sketch may estimate from a sparser mode);
    ``tests/test_profile.py`` pins merged-vs-direct within 1% and both
    within the sketch's published error at fixture cardinality. The merge
    input is #snapshots x #columns tiny rows — driver-free, broadcast
    territory, no scan of any corpus."""
    import functools

    if not profiles:
        raise ValueError("merge_sketch_profiles needs at least one profile")
    all_p = functools.reduce(lambda a, b: a.unionByName(b), profiles)
    return all_p.groupBy("col_name").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("distinct_sketch"), F.lit(False))
        ).alias("n_distinct_est"),
    )


def dd_sketch(df: DataFrame, col: str, alpha: float = 0.01) -> DataFrame:
    """DDSketch-style quantile sketch: (sign, idx, n) log-bucket counts
    with relative-error guarantee ``alpha`` (DataDog's DDSketch, VLDB
    2019, reduced to its deterministic core).

    Values bucket by ``ceil(log_gamma |x|)`` with
    ``gamma = (1+alpha)/(1-alpha)``; sign splits the stores (DDSketch's
    negative mirror), zero gets its own bucket. Unlike KLL/t-digest the
    sketch is fully DETERMINISTIC (no sampling, no order-dependent
    compaction): the same data always yields the same bucket counts, on
    any partitioning — so two snapshots' sketches merge EXACTLY (counts
    add; ``tests/test_profile.py`` pins merged == direct bucket-for-
    bucket), and a replica can be audited bit-for-bit.

    One scan, one partial+final count aggregate on at most
    O(log_gamma(max/min)) buckets (~2,300 buckets spanning 10 orders of
    magnitude at alpha=0.01) — the shuffle carries bucket ids and
    counts, never values. Nulls are excluded (profile convention).
    """
    import math

    if not (0 < alpha < 1):
        raise ValueError(f"alpha must be in (0, 1); got {alpha}")
    gamma = (1 + alpha) / (1 - alpha)
    x = F.col(col).cast("double")
    sign = (
        F.when(x > 0, F.lit(1)).when(x < 0, F.lit(-1)).otherwise(F.lit(0))
    )
    idx = F.when(x == 0, F.lit(0)).otherwise(
        F.ceil(F.log(F.abs(x)) / F.lit(math.log(gamma)))
    )
    return (
        df.where(x.isNotNull())
        .select(sign.cast("int").alias("sign"), idx.cast("long").alias("idx"))
        .groupBy("sign", "idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dd_merge(*sketches: DataFrame) -> DataFrame:
    """Union N dd_sketch frames into one: bucket counts ADD — exactly,
    not approximately, because the bucket function is deterministic.
    Input is N x O(buckets) tiny rows; no corpus scan."""
    import functools

    if not sketches:
        raise ValueError("dd_merge needs at least one sketch")
    all_s = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return all_s.groupBy("sign", "idx").agg(F.sum("n").alias("n"))


def dd_quantiles(
    sketch: DataFrame, qs: list[float], alpha: float = 0.01
) -> DataFrame:
    """Answer quantiles from a dd_sketch: (q, est) with
    ``|est - exact_q| <= alpha * |exact_q|`` guaranteed (the DDSketch
    bound; exact_q taken at rank ``floor(q*(n-1)) + 1``).

    The walk is a cumulative sum over the value-ordered buckets
    (negatives by descending idx, zero, positives by ascending idx) —
    a single-partition window over O(buckets) rows, NOT over the data
    (the sketch is the only input; the corpus never re-enters). Each
    requested q picks the first bucket whose cumulative count reaches
    its rank; the estimate is the bucket's midpoint representative
    ``sign * 2*gamma^idx / (gamma+1)``. The q-to-bucket match is a
    broadcast range join of #qs x O(buckets) rows — both sides tiny by
    construction.
    """
    import math

    from pyspark.sql import Window

    gamma = (1 + alpha) / (1 - alpha)
    order = F.when(F.col("sign") < 0, -F.col("idx")).otherwise(F.col("idx"))
    w = (
        Window.orderBy(F.col("sign").asc(), order.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    buckets = sketch.select(
        "sign",
        "idx",
        "n",
        F.sum("n").over(w).alias("cum"),
    ).withColumn("cum_lo", F.col("cum") - F.col("n"))
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * (2.0 / (gamma + 1.0))
        * F.pow(F.lit(gamma), F.col("idx").cast("double"))
    )
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    total = sketch.agg(F.sum("n").alias("total"))
    qr = qdf.crossJoin(F.broadcast(total)).select(
        "q",
        "total",
        (F.floor(F.col("q") * (F.col("total") - 1)) + 1).alias("rank"),
    )
    matched = qr.join(
        F.broadcast(buckets),
        (F.col("cum") >= F.col("rank")) & (F.col("cum_lo") < F.col("rank")),
        "inner",
    )
    return matched.select(
        "q", F.col("total").alias("n_values"), est.alias("est")
    )


def cms_sketch(
    df: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Count-min sketch over ``df[col]`` items: (row, pos, n) counts for
    a d x w counter matrix (Cormode & Muthukrishnan 2005).

    Each item increments one counter per hash row
    (``pmod(xxhash64(item, row_seed), w)``). The construction is fully
    DETERMINISTIC given (w, d) — no sampling — so two snapshots'
    sketches merge EXACTLY by counter addition (``cms_merge``), the
    incremental-maintenance property the exact top-k table lacks: a
    100 TB corpus keeps d*w counters per snapshot and answers frequency
    queries over the union without re-scanning anything.

    Guarantees per query item (``cms_estimate``): est >= exact ALWAYS
    (counters only ever over-count), and est <= exact + 2N/w with
    probability 1 - (1/2)^d over the hash rows (N = total item count).

    One scan; the shuffle carries at most d*w (row, pos) keys with
    map-side partial counts, never items. Nulls are excluded.
    """
    if w < 2 or d < 1:
        raise ValueError(f"need w >= 2 and d >= 1; got w={w}, d={d}")
    x = F.col(col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    F.pmod(F.xxhash64(x, F.lit(r)), F.lit(w)).alias("pos"),
                )
                for r in range(d)
            ]
        )
    ).alias("c")
    return (
        df.where(x.isNotNull())
        .select(cells)
        .groupBy(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union N cms_sketch frames: counters ADD exactly (same (w, d)
    required — the caller's contract, as with the HLL lg_k)."""
    import functools

    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    all_s = functools.reduce(lambda a, b: a.unionByName(b), sketches)
    return all_s.groupBy("row", "pos").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Point-frequency estimates for ``items[col]``: min over the d
    counters each item hashes to. The SKETCH is the broadcast side —
    at most d*w counter rows by construction (a left join builds its
    right side, so broadcasting the probe side would be unsupported
    anyway); probe items stream map-side. An item hashing to a counter
    no inserted item touched estimates 0 (left join, missing counter =
    0) — correct, since est >= exact = 0.
    """
    x = F.col(col)
    probes = items.select(
        x.alias("__item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.pmod(F.xxhash64(x, F.lit(r)), F.lit(w)).alias(
                            "pos"
                        ),
                    )
                    for r in range(d)
                ]
            )
        ).alias("c"),
    ).select("__item", "c.row", "c.pos")
    joined = probes.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (
        joined.groupBy("__item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
        .select(F.col("__item").alias(col), "est")
    )


# KMV normalization: map xxhash64's signed-long output onto [0, 1).
# Oracle-reproducible — DuckDB computes h / 2^64 + 0.5 identically
# (one IEEE division + add), so every estimate derived from an
# exported sketch hash-checks.
_KMV_SCALE = float(1 << 64)


def _kmv_u(h: Column) -> Column:
    return h / F.lit(_KMV_SCALE) + F.lit(0.5)


def kmv_sketch(
    df: DataFrame, col: str, k: int = 128, by: str | None = None
) -> DataFrame:
    """K-minimum-values distinct sketch (the theta-sketch family's
    deterministic core): the k smallest DISTINCT xxhash64 values of
    ``col``, optionally per ``by`` group.

    Unlike HLL (whose register state Spark's hll_* functions own), the
    KMV state is plain rows — persistable, exportable, and every
    downstream estimate (distinct count, union, intersection) is
    re-derivable by any SQL engine from the rows alone, which is what
    makes the catalog entry fully hash-checkable. Sketches with the
    same k compose: union = k smallest of the concatenated rows;
    intersection estimates via the shared-theta rule (Beyer et al.
    2007; Dasgupta et al., the DataSketches theta framework).

    Plan: distinct (group, hash) — one map-combined shuffle — then the
    k-smallest cap: a per-group row_number window when grouped, a
    TakeOrdered (per-partition top-k merged at the driver, never a
    global sort or single-task window) when ungrouped. State is O(k)
    rows per group regardless of corpus size; at 100 TB the sketch
    table is broadcast territory. Returns (grp?, h, u) rows, u = hash
    normalized to [0,1).
    """
    grp = [F.col(by).alias("grp")] if by else []
    h = F.xxhash64(F.col(col))
    d = df.where(F.col(col).isNotNull()).select(*grp, h.alias("h")).distinct()
    if by:
        w = Window.partitionBy("grp").orderBy("h")
        capped = (
            d.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )
    else:
        capped = d.orderBy("h").limit(k)
    return capped.select(*(["grp"] if by else []), "h", _kmv_u(F.col("h")).alias("u"))


def kmv_estimate(sketch: DataFrame, k: int, by: bool = False) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact row count while
    the sketch is unsaturated (< k rows means every distinct value is
    present), else (k-1) / u_k with u_k the largest retained normalized
    hash. Returns (grp?, n_distinct_est)."""
    keys = ["grp"] if by else []
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"), F.max("u").alias("__uk")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("__uk")
    )
    return agg.select(*keys, F.round(est, 6).alias("n_distinct_est"))


def kmv_union(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Union sketch: k smallest distinct hashes of both sketches —
    lossless (identical to sketching the concatenated inputs), the
    property that lets per-snapshot sketches maintain a corpus sketch
    by O(k) merges instead of rescans."""
    u = a.select("h", "u").union(b.select("h", "u")).distinct()
    # TakeOrdered over <= 2k rows — never a global-order window
    return u.orderBy("h").limit(k)


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Intersection estimate under the shared-theta rule: theta = the
    smaller of the two sketches' inclusion thresholds (1.0 while
    unsaturated), matched = hashes in BOTH sketches below theta,
    estimate = matched / theta. One row (n_matched, theta,
    n_intersect_est)."""

    def _theta(s: DataFrame, name: str) -> DataFrame:
        return s.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(1.0))
            .otherwise(F.max("u"))
            .alias(name)
        )

    thetas = _theta(a, "__ta").crossJoin(_theta(b, "__tb"))
    matched = (
        a.select("h", "u")
        .join(b.select("h"), "h")
        .crossJoin(F.broadcast(thetas))
        .where(F.col("u") < F.least("__ta", "__tb"))
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return matched.crossJoin(F.broadcast(thetas)).select(
        "n_matched",
        F.round(F.least("__ta", "__tb"), 6).alias("theta"),
        F.round(
            F.col("n_matched") / F.least("__ta", "__tb"), 6
        ).alias("n_intersect_est"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog with PLAIN-ROW register state (the KMV family's HLL
# sibling — Flajolet et al. 2007). Spark's own approx_count_distinct
# owns its HLL++ register binary; this variant keeps the registers as
# ordinary (grp, reg, rho) rows so they are persistable, exportable,
# O(delta)-mergeable by MAX, and every estimate is re-derivable by any
# SQL engine from the rows alone — the property that makes the catalog
# entry fully hash-checkable (same design rationale as kmv_sketch).
# ---------------------------------------------------------------------------

def hll_alpha(p: int) -> float:
    """Standard HLL bias constant for m = 2**p registers."""
    m = 1 << p
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, p: int = 10, by: str | None = None
) -> DataFrame:
    """HLL register table for ``col``: register index = the HIGH ``p``
    bits of xxhash64, rho = leading-zero count of the remaining
    ``64 - p`` bits + 1, computed EXACTLY via ``length(bin(w))``
    (integer bit arithmetic, never floating log2 — a float log2 rounds
    ``w`` just below a power of two onto the wrong integer for large
    ``w``). Returns (grp?, reg, rho) with one row per NON-ZERO register
    per group: max-aggregated, O(groups x 2^p) state regardless of
    corpus size — at 100 TB the register table is broadcast territory,
    and per-snapshot register tables merge by MAX (``hll_merge``)
    instead of rescans, exactly like Delta/DataSketches HLL columns.

    Plan: one map-combined exchange of (grp, reg) partial maxima; the
    bin/length/bit expressions are all codegen'd built-ins.
    """
    wbits = 64 - p
    grp = [F.col(by).alias("grp")] if by else []
    h = F.xxhash64(F.col(col))
    reg = F.shiftrightunsigned(h, wbits).alias("reg")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    # length(bin(w)) = floor(log2(w)) + 1 for w > 0, exactly.
    # rho is CAPPED at 52 - p so every 2^-rho term and every partial
    # sum in hll_estimate is an exact multiple of 2^-(52-p) bounded by
    # 2^(p+1) — exactly representable in a double, which makes the
    # register-sum ORDER-INDEPENDENT (the same engine-determinism trick
    # as pareto's integer cents; an uncapped rho of up to 64-p+1 makes
    # the float sum depend on partial-aggregation order). The cap costs
    # nothing statistically: it binds only past ~2^(52-p) distinct
    # values per register.
    rho = F.least(
        F.when(w == 0, F.lit(wbits + 1)).otherwise(
            F.lit(wbits + 1) - F.length(F.bin(w))
        ),
        F.lit(52 - p),
    ).alias("rho")
    return (
        df.where(F.col(col).isNotNull())
        .select(*grp, reg, rho)
        .groupBy(*(["grp"] if by else []), "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union of sketches = MAX over the concatenated register rows —
    lossless (identical to sketching the concatenated inputs), so
    per-source / per-snapshot sketches roll up without rescanning."""
    it = iter(register_tables)
    u = next(it)
    for t in it:
        u = u.unionByName(t)
    keys = [c for c in u.columns if c != "rho"]
    return u.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, p: int, by: bool = False, round_dp: int = 4
) -> DataFrame:
    """Distinct-count estimate from a register table: the harmonic-mean
    raw estimate alpha * m^2 / (V + sum 2^-rho) with the standard
    small-range linear-counting correction E <= 2.5m -> m * ln(m / V)
    (V = zero registers = m - rows). 2^-rho is computed as
    1.0 / (1 << rho) — integer shift + power-of-two division, both
    IEEE-exact — and the rho cap in ``hll_registers`` makes every
    partial sum exactly representable, so Z is order-independent and
    engine-independent; the only libm call is the correction's ln, with
    an identical exact-double argument in any engine. Returns
    (grp?, n_registers, n_distinct_est)."""
    m = 1 << p
    alpha = hll_alpha(p)
    keys = ["grp"] if by else []
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), rho)")
        ).alias("__z"),
    )
    v = F.lit(float(m)) - F.col("n_registers")  # zero registers
    raw = F.lit(alpha * m * m) / (v + F.col("__z"))
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        *keys, "n_registers", F.round(est, round_dp).alias("n_distinct_est")
    )
