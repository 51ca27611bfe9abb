"""Training-data curation operators: deterministic sampling, per-domain
caps, sequence packing, repetition metrics, centroid-based pruning.

Everything here is a narrow projection or a keyed window — no all-pairs
work, no Python in the hot path — and every operator is deterministic
(hash- or key-ordered, never rand()) so samples are reproducible across
runs, engines, and retries: the property a 100 TB training-mix pipeline
actually needs from its sampler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def hash_sample(
    df: DataFrame, key_col: str, rate_16ths: int
) -> DataFrame:
    """Deterministic ~rate_16ths/16 sample: keep rows whose md5(key)
    starts below the cutoff nibble.

    md5 (not xxhash64) so any engine can reproduce the exact sample —
    the split is a pure function of content, stable under re-runs,
    retries, and engine migrations. Granularity is 1/16 per nibble;
    chain two calls for finer rates.
    """
    if not 0 <= rate_16ths <= 16:
        raise ValueError("rate_16ths must be in [0, 16]")
    nibble = F.conv(F.substring(F.md5(F.col(key_col)), 1, 1), 16, 10).cast("int")
    return df.where(nibble < rate_16ths)


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic stratified sample: n rows per stratum, ordered by
    md5(key) then id (a reproducible shuffle within each stratum).

    One keyed window — the shuffle is on the strata key, so skew is
    bounded by stratum size, and the per-stratum sort is the standard
    top-k pushdown shape.
    """
    order = [F.md5(F.col(key_col or id_col)).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def cap_per_group(
    df: DataFrame, group_col: str, cap: int, id_col: str
) -> DataFrame:
    """Per-domain cap: keep at most ``cap`` rows per group (deterministic
    by id order) — the anti-over-representation gate every web-crawl mix
    applies per registered domain."""
    w = Window.partitionBy(group_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    shard_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign docs to fixed-token-budget training sequences (bins).

    Streaming first-fit within each shard: docs are laid out in
    deterministic id order and a bin boundary falls every
    ``budget_tokens`` of cumulative token count —
    ``bin_id = floor(exclusive_cumsum / budget)``. A bin can overflow by
    at most one document (the standard approximation used when packing
    is done as a data-parallel pass rather than a sequential loop).

    Sharding (``shard_col``) keeps the window keyed — a global ORDER BY
    would serialize the corpus through one task; per-shard packing is
    embarrassingly parallel, and bins are named (shard, bin_id).
    """
    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)  # inclusive cumulative tokens
    return df.select(
        F.col(id_col),
        F.col(shard_col).alias("shard"),
        n_tok.alias("n_tokens"),
        F.floor((cum - n_tok) / F.lit(budget_tokens)).cast("long").alias("bin_id"),
    )


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 2,
) -> DataFrame:
    """Per-doc k-gram repetition: (id, n_grams, n_distinct, dup_ratio).

    dup_ratio = 1 - distinct/total k-grams — the Gopher-style repetition
    gate (high ratio = boilerplate/looping text). Same
    slice+arrays_zip+explode codegen shape as ``shingle_df``, but
    keeping duplicates so the total is observable; docs shorter than k
    tokens report zero grams and ratio 0.
    """
    base = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("tk")
    )
    n = F.size("tk")
    m = n - (k - 1)
    zipped = F.arrays_zip(*[F.slice(F.col("tk"), j + 1, m) for j in range(k)])
    ex = base.select(
        "id",
        F.explode_outer(F.when(n >= k, zipped)).alias("z"),
    ).select(
        "id",
        F.when(
            F.col("z").isNotNull(),
            F.xxhash64(*[F.col("z")[str(j)] for j in range(k)]),
        ).alias("s"),
    )
    return ex.groupBy("id").agg(
        F.count("s").alias("n_grams"),
        F.count_distinct("s").alias("n_distinct"),
        F.round(
            F.when(
                F.count("s") > 0,
                1 - F.count_distinct("s") / F.count("s").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_ratio"),
    )


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector: (label, centroid array<double>).

    posexplode -> per-(label, dim) avg -> re-assemble ordered array.
    Two keyed shuffles on (label, pos) then (label); output cardinality
    is #labels — a broadcastable dim table for pruning joins.
    """
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    per_dim = ex.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("c")))
            ).alias("pc")
        )
        .select(
            "label",
            F.transform(F.col("pc"), lambda x: x["c"]).alias("centroid"),
        )
    )


def centroid_cosines(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Cosine of each vector to its own label centroid:
    (id, label, cos_centroid) — the SemDeDup/prototype-pruning signal
    (low cosine = outlier within its class; near-1 = redundant core).

    The centroid table is #labels rows -> broadcast join; per-row work
    is one fold over the vector. The corpus never shuffles.
    """
    from .similarity import dot, l2_norm

    # each centroid's norm computes once in the #labels-row broadcast
    # table, not per corpus row (same fold association the oracle uses)
    cents = label_centroids(emb, vec_col, label_col).withColumn(
        "__cn", l2_norm(F.col("centroid"))
    )
    e = F.col(vec_col).cast("array<double>")
    joined = emb.join(F.broadcast(cents), emb[label_col] == cents["label"])
    cos = dot(e, F.col("centroid")) / (l2_norm(e) * F.col("__cn"))
    return joined.select(
        F.col(id_col),
        emb[label_col].alias(label_col),
        F.round(cos, 6).alias("cos_centroid"),
    )


def adaptive_quality_gate(
    df: DataFrame,
    score_col: str = "score",
    group_col: str = "source",
    q: float = 0.3,
) -> DataFrame:
    """Per-group adaptive quality gating: keep rows whose score clears
    their OWN group's q-quantile, instead of one global threshold.

    A fixed cutoff over-prunes inherently low-scoring sources (e.g.
    forums vs encyclopedias under the same classifier) and under-prunes
    high-scoring ones; quantile gates drop the worst q of EVERY source,
    preserving the corpus mix while still culling within-source tails —
    standard practice when a quality classifier's calibration varies by
    domain.

    The cutoff table is one row per group (exact interpolated
    percentile, 6-dp rounded — the cross-engine-stable discipline
    ``percentile_order_prices`` pinned) and broadcasts back; rows keep
    a boolean ``keep`` rather than being dropped so callers can audit
    the gate before applying it. One aggregate + one broadcast join;
    nothing shuffles but the per-group combine.
    """
    cuts = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({score_col}, {q!r})"), 6).alias("cutoff")
    )
    return df.join(F.broadcast(cuts), group_col).withColumn(
        "keep", F.col(score_col) >= F.col("cutoff")
    )


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point-first) coreset selection
    (Gonzalez 1985; the diverse-subset selection used for active
    learning and training-data coverage pruning): start from the
    smallest id, then k-1 times pick the point whose cosine distance to
    its NEAREST already-selected center is LARGEST. The selected set
    2-approximates the optimal k-center cover — a principled "most
    diverse k examples" picker.

    Output: (step, center_id, dist) — dist is the selection score, the
    distance to the nearest prior center (null for the seed), rounded
    to 6 dp BEFORE the argmax with smallest-id tiebreak so the greedy
    trace is deterministic and oracle-reproducible step for step.

    Scale shape: the algorithm is inherently k sequential passes — each
    step is ONE corpus scan against the <=k selected centers (a few KB,
    broadcast as literals into the comparison expression) ending in a
    single max_by aggregate; the driver collects exactly one row per
    step (the O(k) collect edge, same bounded-sequential contract as
    BPE merge induction). Nothing shuffles but the aggregate combine.
    The distance expressions are sequential-fold cosines (matching the
    oracle's list_dot_product association); the working set is
    persisted across the k jobs. (Measured dead end: static element_at
    chains — the usual codegen win — LOSE here ~2x, because at k·dims
    = 512 terms per distance Catalyst planning/compilation of the
    expression trees dominates a 2,000-row scan. At corpus scale, where
    row work amortizes planning, the exploded-codegen form from
    `_pq_assign` is the swap-in.)
    """
    from .similarity import cosine

    def dist_to(cv: list[float]):
        return F.round(
            1.0 - cosine(F.col("__v"), F.array(*[F.lit(float(x)) for x in cv])),
            6,
        )

    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    seed = base.orderBy("__id").limit(1).collect()[0]
    centers: list[tuple[int, list[float], float | None]] = [
        (seed["__id"], list(seed["__v"]), None)
    ]
    # classic incremental form: carry the running min-distance column
    # and fold in ONE new cosine per row per step (min over
    # per-distance-rounded values commutes, so the trace is identical
    # to re-deriving all j distances each step — which would cost
    # O(k^2) cosine evaluations instead of O(k)); each step's frame is
    # persisted and read by the next step's single aggregate job
    pinned = [base.withColumn("__d", dist_to(centers[0][1])).persist()]
    for _ in range(k - 1):
        chosen = [cid for cid, _, _ in centers]
        # the winner's vector rides through the max_by struct — no
        # join-back to re-fetch it
        row = (
            pinned[-1]
            .where(~F.col("__id").isin(chosen))
            .agg(
                F.max_by(
                    F.struct("__id", "__d", "__v"),
                    F.struct(F.col("__d"), (-F.col("__id")).alias("__neg")),
                ).alias("w")
            )
            .select(
                F.col("w.__id").alias("__id"),
                F.col("w.__d").alias("__d"),
                F.col("w.__v").alias("__v"),
            )
            .collect()[0]
        )
        centers.append((row["__id"], list(row["__v"]), row["__d"]))
        if len(centers) < k:
            pinned.append(
                pinned[-1]
                .withColumn(
                    "__d", F.least(F.col("__d"), dist_to(list(row["__v"])))
                )
                .persist()
            )
    for p in pinned:
        p.unpersist()
    return spark.createDataFrame(
        [(i, cid, d) for i, (cid, _, d) in enumerate(centers)],
        "step int, center_id long, dist double",
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    key_col: str | None = None,
) -> DataFrame:
    """Temperature-based source mixing: per-group quota ~ ceil(n^alpha),
    filled deterministically (md5 order) — the Pile/ROOTS-style
    re-weighting that flattens over-represented sources (alpha < 1 pulls
    the mix toward uniform; alpha = 1 keeps natural proportions).

    One aggregate builds the (tiny) per-group quota table, broadcast back
    onto the corpus; the per-group fill is the same keyed-window shape as
    ``stratified_take``. Fully deterministic: re-runs and other engines
    reproduce the identical mix.
    """
    quotas = df.groupBy(group_col).agg(
        F.ceil(F.pow(F.count(F.lit(1)), F.lit(alpha))).alias("__quota")
    )
    order = [F.md5(F.col(key_col or id_col)).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


# --- PII redaction -----------------------------------------------------------

# (tag, pattern) pairs in the Java-regex / RE2 COMMON dialect: character
# classes, bounded repetition, \b, and non-capturing groups only — no
# backreferences or lookaround — so the DuckDB oracle (RE2) evaluates the
# exact same language as Spark's JVM regex. Order matters: IP before
# phone so dotted quads are never half-eaten by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("PHONE", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Mask PII spans in ``text_col`` with ``<TAG>`` tokens and count hits.

    Adds ``{text_col}_redacted`` plus one ``n_<tag>`` count per pattern.
    Pure regexp_replace/regexp_count projection: codegen'd, narrow, zero
    shuffle — at 100 TB this runs at scan speed and pushes nothing to
    Python. Patterns apply in order to the running result, so a span
    matched by an earlier pattern is never re-matched by a later one —
    and each ``n_<tag>`` is counted on that same running text, so the
    counts equal the number of ``<TAG>`` tokens actually inserted (e.g.
    ``555-123-4567@x.com`` is one EMAIL, zero PHONE).
    """
    out = df
    red = F.col(text_col)
    for tag, pat in patterns:
        out = out.withColumn(f"n_{tag.lower()}", F.regexp_count(red, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"<{tag}>")
    return out.withColumn(f"{text_col}_redacted", red)


# --- corpus-level boilerplate line removal -----------------------------------

def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Drop lines that appear (trimmed) in more than ``max_df_frac`` of
    docs — the classic header/footer/cookie-banner filter — and rebuild
    each doc with surviving lines in their original order.

    Shape: posexplode(split) -> per-line document frequency (one shuffle
    on the trimmed line text, counting DISTINCT docs so in-doc repeats
    don't inflate df) -> broadcast anti-join of the tiny hot-line set ->
    per-doc reassembly keyed on id (second shuffle). Nothing all-pairs;
    the hot-line set is what boilerplate IS (few distinct strings, huge
    df), so the broadcast side stays small by construction. The in-doc
    reassembly transform() runs interpreted but only over a doc's own
    handful of lines, never corpus-wide.
    """
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__nd"))
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).withColumn("__key", F.trim("__line"))
    hot = (
        lines.select("__id", "__key")
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") > F.col("__nd") * max_df_frac)
        .select("__key")
    )
    kept = lines.join(F.broadcast(hot), "__key", "left_anti")
    rebuilt = (
        kept.groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__line"))).alias("__ls"))
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.expr("transform(__ls, e -> e.__line)"), sep
            ).alias(f"{text_col}_clean"),
        )
    )
    # left join keeps docs whose every line was boilerplate (empty result)
    return df.join(rebuilt, id_col, "left").withColumn(
        f"{text_col}_clean", F.coalesce(F.col(f"{text_col}_clean"), F.lit(""))
    )


# --- deterministic dataset splitting -----------------------------------------

def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash.

    Each row gets a ``split`` label by bucketing md5(id) mod 100 against
    cumulative integer weights (must sum to 100). md5 — not rand() and
    not xxhash64 — for the same reason as ``hash_sample``: the assignment
    is a pure function of the key that any engine reproduces bit-for-bit,
    so a doc never migrates between train and test across re-runs,
    retries, or engine migrations (the leakage failure mode of
    rand-based splits). Narrow projection; zero shuffle at any scale.
    """
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError(f"weights must sum to 100, got {total}")
    # first 8 hex chars -> int, mod 100: uniform over the keyspace
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    acc = 0
    expr = None
    for name, w in weights:
        acc += w
        cond = bucket < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


# --- hard-negative mining over embeddings ------------------------------------

def hard_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    n_query: int | None = None,
    unbounded: bool = False,
) -> DataFrame:
    """Top-k most-similar vectors with a DIFFERENT label, per query vector.

    Contrastive-training data mining: the hardest negatives are the
    near-misses — high cosine similarity, wrong label. Implemented as a
    broadcast of the (bounded) query side against the corpus with the
    label-inequality predicate fused into the join, then a per-query
    top-k window. The corpus side never shuffles for the join (broadcast
    hash join); the single shuffle is the window's partition on query id,
    which is bounded by |queries| * |corpus-candidates-above-cut| only if
    a threshold is applied first — here the window input is
    |queries| x |corpus|, so ``n_query`` is REQUIRED: with every row a
    query this is an O(n²) broadcast nested loop, which at corpus scale
    is a driver OOM (broadcasting the full corpus) before it is a
    quadratic compute bill. Callers that genuinely want all-pairs on a
    KNOWN-small input (tests, eval sets) opt in with ``unbounded=True``;
    the IVF/LSH paths are the unbounded-query scale path. Returns
    (query_id, neg_id, neg_label, cos_sim).
    """
    if n_query is None and not unbounded:
        raise ValueError(
            "hard_negatives: pass n_query to bound the broadcast query "
            "side, or unbounded=True to accept the O(n^2) all-pairs "
            "broadcast on a known-small input (scale path: IVF/LSH "
            "similarity operators)"
        )
    from .similarity import dot, l2_norm

    # per-side norms once per row (same association as cosine()'s
    # folds) — one fold per pair in the broadcast join, not three
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("e"),
        F.col(label_col).alias("lbl"),
    ).withColumn("n", l2_norm(F.col("e")))
    # n_query bounds the NUMBER of query rows (deterministically, lowest
    # ids first) — not an id-value threshold, which would silently yield
    # fewer/zero queries on corpora whose ids aren't dense from 0
    q = base if n_query is None else base.orderBy(F.col("id").asc()).limit(n_query)
    joined = base.alias("c").join(
        F.broadcast(q.alias("q")),
        (F.col("q.id") != F.col("c.id")) & (F.col("q.lbl") != F.col("c.lbl")),
    )
    cos = dot(F.col("q.e"), F.col("c.e")) / (F.col("q.n") * F.col("c.n"))
    scored = joined.select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neg_id"),
        F.col("c.lbl").alias("neg_label"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Row-level diff of two corpus snapshots by content fingerprint.

    The what-changed report run between lake snapshots before an
    incremental job decides what to reprocess: full outer join on the id
    carrying ONLY (id, fingerprint) — never the payload — so the shuffle
    is two narrow columns regardless of document size. With both
    snapshots bucketed on the id (operators/bucketing.py) the join plans
    exchange-free; at 100 TB that makes the diff a co-located
    merge, not a data move. Status per id:

    - ``added``: id only in ``new``
    - ``removed``: id only in ``old``
    - ``changed``: id in both, fingerprints differ (null-safe: a
      null->content or content->null transition counts as changed)
    - ``unchanged``: id in both, fingerprints equal (null == null)

    Inputs must carry (id_col, fp_col) — fingerprint via
    ``operators.text.fingerprint`` or any stable content hash.
    Returns (id, status).
    """
    # presence is tracked with explicit markers, NOT fingerprint
    # nullness: a null-text row (null fp) present in both snapshots must
    # compare as present. The fp comparison is NULL-SAFE (IS DISTINCT
    # FROM): a fingerprint transitioning between null and real content
    # IS a change — reprocessing decisions consume this diff, and a
    # null-propagating <> would silently classify those rows 'unchanged'
    # and skip them. The DuckDB oracle mirrors with IS DISTINCT FROM.
    o = old.select(
        F.col(id_col).alias("id"),
        F.lit(True).alias("__in_old"),
        F.col(fp_col).alias("__ofp"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.lit(True).alias("__in_new"),
        F.col(fp_col).alias("__nfp"),
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("__ofp").eqNullSafe(F.col("__nfp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("id", status.alias("status"))


def snapshot_diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Aggregate ``snapshot_diff`` to (status, n) — the 4-row dashboard
    line an ingest pipeline alerts on (a spike in ``changed`` between
    snapshots usually means an upstream re-crawl, not new data)."""
    return (
        snapshot_diff(old, new, id_col, fp_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def split_leakage_audit(
    assignments: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup groups that span train/val/test splits — the
    contamination audit run after any split assignment.

    A deterministic hash split (``assign_split``) keys on the doc id,
    so two NEAR-duplicate documents (different ids, same content) can
    legally land in different splits — which silently leaks training
    data into test. This audit joins the split assignment onto the
    near-dup component labels and reports every component whose members
    straddle more than one split. ``components`` is (id, component) from
    ``neardup_components`` / ``incremental_components`` — already
    restricted to non-singleton groups, which are exactly the leakage
    candidates.

    Scale shape: both inputs are narrow (id, label) tables; the join
    shuffles on the id, the audit aggregate on the component — no text,
    no vectors, no window. Output: (component, n_docs, n_splits,
    splits) for leaking components only, splits as a sorted CSV so the
    row is engine-stable.
    """
    j = components.join(
        assignments.select(F.col(id_col).alias("id"), "split"), "id"
    )
    per = j.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split").alias("n_splits"),
        F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
    )
    return per.where(F.col("n_splits") > 1)


def shuffle_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 16,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic distributed corpus shuffle: (bucket, pos) per doc.

    Training-order randomization at scale is NOT a global sort: the
    scalable (and restart-stable) construction hashes each doc into one
    of ``n_buckets`` shuffle shards and orders within the shard by a
    second hash — readers then concatenate shards. Both coordinates are
    md5-derived (like ``assign_split``/``hash_sample``): a pure function
    of (seed, id) any engine reproduces bit-for-bit, so a re-run, a
    retried task, or a different engine yields the identical order —
    rand() would reshuffle on every retry, which silently breaks
    data-order reproducibility claims in training logs.

    Plan shape: one narrow projection + one hash exchange on the bucket
    + per-bucket sort for the row_number — no global sort, no
    single-partition window; bucket count scales with the cluster.
    Ties cannot occur (the tiebreak includes the unique id). Returns
    (id, bucket, pos) with pos dense 1..|bucket|.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    sid = F.col(id_col).cast("string")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), F.lit(":b:"), sid)), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    ).cast("int")
    order_key = F.md5(F.concat(F.lit(seed), F.lit(":o:"), sid))
    w = Window.partitionBy("bucket").orderBy("order_key", "id")
    return (
        df.select(
            F.col(id_col).alias("id"),
            bucket.alias("bucket"),
            order_key.alias("order_key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("id", "bucket", "pos")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis'
    A-ES (reservoir sampling with exponential jumps, IPL 2006): each
    row draws key u^(1/w) and the n largest keys win, which realizes
    exact weighted-without-replacement inclusion probabilities in one
    pass. The mixture-balancing upgrade of ``hash_sample``'s uniform
    rates: quality scores, dedup-cluster sizes, or domain priorities
    become per-ROW weights rather than per-source quotas.

    Determinism contract (the property every sampler in this module
    carries): u is md5(id)-derived, not rand(), so the sample is a pure
    function of content — stable under re-runs, retries, partitioning,
    and engine migrations, and exactly reproducible by the DuckDB
    oracle. Ranking uses ln(u)/w (monotone in u^(1/w), numerically
    safer), id tiebreak.

    Plan shape: one projection + one window top-n per stratum (or
    global with ``strata_col=None`` — then prefer a stratum column at
    scale: a single global top-n funnels through one partition, the
    same caveat stratified_take documents). Non-positive weights drop
    (a zero weight means "never sample me").
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967297.0)  # strictly in (0, 1)
    w = F.col(weight_col).cast("double")
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(F.desc("__key"), F.asc(id_col))
    return (
        df.where(w > 0)
        .withColumn("__key", F.log(u) / w)
        .withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= n)
        .drop("__key", "__rn")
    )


def mixture_allocation(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Exact training-mix seat apportionment: split an integer token/
    document ``budget`` across groups in proportion to ``n_group **
    alpha`` (alpha<1 flattens over-represented sources — the standard
    temperature reweighting), using the largest-remainder (Hamilton)
    method so the allocations are INTEGERS that sum exactly to the
    budget — the property per-group ``ceil``/``round`` quotas (cf.
    ``temperature_mix``) cannot give, and the one a token-budgeted
    pretraining mix actually needs.

    Cross-engine determinism: the only order-sensitive float operation
    is the weight-sum denominator, which is computed as a RUNNING sum
    over groups ordered by ``group_col`` (any IEEE engine folds the
    same sequence to the same double); sqrt/multiply/divide are
    correctly rounded everywhere, remainders are exact subtractions,
    and remainder ties break by group id.

    Plan: one map-combined count exchange; everything after runs on the
    O(groups) aggregate — the single-partition windows here order
    GROUPS, never corpus rows. Returns (group, n_avail, quota, n_alloc,
    capped) plus conservation is the caller's assert: sum(n_alloc) ==
    budget always.
    """
    if budget < 0:
        raise ValueError("mixture_allocation: budget must be >= 0")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_avail")
    )
    # alpha=0.5 routes through sqrt, which (unlike libm pow) is
    # IEEE-correctly-rounded in every engine — the cross-engine-safe
    # default; other alphas accept the ~1-ulp pow() variance
    weight = (
        F.sqrt(F.col("n_avail").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_avail").cast("double"), F.lit(alpha))
    )
    sq = counts.withColumn("sq", weight)
    wrun = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = sq.withColumn("rs", F.sum("sq").over(wrun))
    denom = run.agg(F.max("rs").alias("dd"))
    quota = run.join(F.broadcast(denom)).withColumn(
        "q", (F.lit(budget) * F.col("sq")) / F.col("dd")
    )
    base = quota.withColumn("b", F.floor("q")).withColumn(
        "rem", F.col("q") - F.floor("q")
    )
    leftover = base.agg(
        (F.lit(budget) - F.sum("b")).cast("long").alias("leftover")
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("grp"))
    ranked = base.withColumn("rnk", F.row_number().over(wr)).join(
        F.broadcast(leftover)
    )
    return ranked.select(
        F.col("grp").alias(group_col),
        "n_avail",
        F.round("q", 6).alias("quota"),
        (
            F.col("b")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_alloc"),
        (
            F.col("b")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
            > F.col("n_avail")
        ).alias("capped"),
    )
