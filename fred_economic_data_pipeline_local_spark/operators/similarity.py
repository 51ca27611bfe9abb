"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- brute-force cosine top-k: exact baseline. The query set is broadcast, so
  the plan is scan(corpus) x broadcast(queries) -> per-row dot products ->
  per-query top-k. No shuffle of the corpus; scales to any corpus size
  with #queries bounded.
- LSH-bucketed (random hyperplane signs): candidates share a signature
  bucket, cutting the compared pairs by ~2^planes. Hyperplanes are
  hash-derived (deterministic, no stored model), so the operator is a pure
  DataFrame transformation.

All arithmetic is sequential-fold double precision inside Catalyst
(zip_with/aggregate) — deterministic and bit-reproducible, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pyspark.sql import Window


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) with the exact association order mirrored by the
    DuckDB oracle (sqrt(dot(a,a)) * sqrt(dot(b,b)))."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))




def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim), k rows per query,
    self-matches excluded. Ties broken by neighbor id (deterministic).
    """
    # norms computed once per row before the pair join (identical
    # association to cosine()'s folds — the oracle mirrors both); the
    # per-pair work is then ONE interpreted fold instead of three
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
        .drop("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def hyperplane_signatures(
    df: DataFrame,
    id_out: str,
    vec_out: str,
    planes: int = 16,
) -> DataFrame:
    """Random-hyperplane LSH signatures: (id, vec) -> (id, vec, sig bigint).

    Plane p's weight on dimension i is a deterministic pseudo-random value
    in [-1, 1] derived from xxhash64(p, i) — no stored model, identical
    across runs and executors. Bit p = sign(v . plane_p).

    Shaped as posexplode(vec) -> ``planes`` codegen'd sum-aggregates ->
    join the signature back on id. Lambda higher-order functions never
    codegen, so the fold form of this runs interpreted per plane x dim;
    the exploded form keeps the dot products vectorized and parallel.
    ``df`` must have exactly the columns (id_out, vec_out).
    """
    from functools import reduce

    def plane_weight(p: int) -> Column:
        h = F.xxhash64(F.lit(p), F.col("__i"))
        return (F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0) - 1.0

    ex = df.select(id_out, F.posexplode(vec_out).alias("__i", "__x"))
    dots = ex.groupBy(id_out).agg(
        *[
            F.sum(F.col("__x") * plane_weight(p)).alias(f"d{p}")
            for p in range(planes)
        ]
    )
    bit_terms = [
        F.when(F.col(f"d{p}") > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for p in range(planes)
    ]
    sig = reduce(lambda a, x: a.bitwiseOR(x), bit_terms)
    return df.join(dots.select(id_out, sig.alias("sig")), on=id_out)


def hyperplane_sig_table(
    df: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig): the persistable hyperplane-LSH index table for
    ``lsh_topk`` — exported so the DuckDB oracle can re-run the bucket
    join + exact scoring downstream of the (unmirrorable) xxhash64
    plane derivation."""
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__v")
    )
    return hyperplane_signatures(base, "id", "__v", planes).select("id", "sig")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_sigs: DataFrame | None = None,
    query_sigs: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k: only candidates in the query's LSH bucket
    are scored. Recall < 1 by construction; the bucket join replaces the
    corpus-wide scan per query with a hash-partitioned equi-join on the
    signature — the 100 TB-scale path.

    ``corpus_sigs``/``query_sigs`` (optional): precomputed (id, sig)
    tables from ``hyperplane_sig_table`` — the persisted-index /
    oracle-export hook; when given, the signature build is skipped and
    the vectors join the index on the id.
    """
    # per-side norms once per row (same fold association the oracle
    # mirrors) — one fold per bucket-candidate pair instead of three
    cbase = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    if corpus_sigs is None:
        c = hyperplane_signatures(cbase, "neighbor_id", "__cv", planes)
    else:
        c = cbase.join(
            corpus_sigs.select(F.col("id").alias("neighbor_id"), "sig"),
            "neighbor_id",
        )
    if query_sigs is None:
        q = hyperplane_signatures(qbase, "query_id", "__qv", planes)
    else:
        q = qbase.join(
            query_sigs.select(F.col("id").alias("query_id"), "sig"), "query_id"
        )
    scored = (
        c.join(broadcast(q), on="sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
        .drop("__qv", "__cv", "__qn", "__cn", "sig")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


# --- IVF (inverted-file) coarse quantization ---------------------------------

def _seed_centroids(spark, n_cells: int, dims: int) -> DataFrame:
    """(cell, i, w) seed centroid weights, pseudo-random in [-1, 1] derived
    from xxhash64(cell, dim) — deterministic, no stored model. One
    spark.range with arithmetic index decode (a single narrow stage;
    the crossJoin-of-ranges form paid two broadcast-nested-loop
    stages for the same rows)."""
    base = spark.range(n_cells * dims).select(
        (F.col("id") / dims).cast("int").alias("cell"),
        F.pmod(F.col("id"), F.lit(dims)).cast("int").alias("__i"),
    )
    h = F.xxhash64(F.col("cell"), F.col("__i"))
    w = (F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0) - 1.0
    return base.select("cell", "__i", w.alias("w"))


def _assign_cells(ex: DataFrame, centroids: DataFrame, id_out: str) -> DataFrame:
    """Nearest-centroid assignment from exploded vectors (id, __i, __x).

    argmin_c |v - c|^2  ==  argmax_c (v . c - |c|^2 / 2), so one
    broadcast join on the dimension index + two hash aggregates does it:
    partial sums build the per-(id, cell) dot product, max_by picks the
    winning cell. Everything codegens; nothing but (id, cell) shuffles.
    """
    half_norm = centroids.groupBy("cell").agg(
        (F.sum(F.col("w") * F.col("w")) / 2.0).alias("half_cn")
    )
    scores = (
        ex.join(broadcast(centroids), "__i")
        .groupBy("id", "cell")
        .agg(F.sum(F.col("__x") * F.col("w")).alias("dp"))
        .join(broadcast(half_norm), "cell")
        .select("id", "cell", (F.col("dp") - F.col("half_cn")).alias("score"))
    )
    return scores.groupBy("id").agg(F.max_by("cell", "score").alias("cell"))


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
    dims: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: returns (assignment (id, cell), centroids
    (cell, __i, w)).

    Deterministic seed centroids are refined by ``lloyd_iters``
    distributed Lloyd iterations (assign -> per-cell dimension means);
    centroid state never leaves the cluster except as a broadcast of
    n_cells x dims rows. Empty cells fall back to their seed position so
    the cell count is stable.

    Pass ``dims`` when known (it's a property of the embedding model, so
    callers usually know it); otherwise a one-row probe reads it, which
    costs one tiny job before the plan is built.
    """
    spark = corpus.sparkSession
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])  # one-row probe
    ex = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__i", "__x"),
    )
    cents = _seed_centroids(spark, n_cells, dims)
    for _ in range(lloyd_iters):
        assign = _assign_cells(ex, cents, id_col)
        means = (
            ex.join(assign, "id")
            .groupBy("cell", "__i")
            .agg(F.avg("__x").alias("w_new"))
        )
        cents = (
            cents.join(means, ["cell", "__i"], "left")
            .select("cell", "__i", F.coalesce("w_new", "w").alias("w"))
            # materialize the n_cells x dims model each round: downstream
            # consumers (half-norm, assignment, query probing) would each
            # replay the whole Lloyd chain otherwise
            .localCheckpoint()
        )
    # the index-build phase ends here. At lake scale the assignment is
    # the persisted IVF index (write_bucketed on cell), rebuilt only when
    # the corpus changes; in-query it stays lazy — single-consumer plans
    # (one probe join) would pay a materialization job for nothing
    return _assign_cells(ex, cents, id_col), cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF approximate cosine top-k: each query scores only the corpus
    vectors assigned to its ``nprobe`` nearest cells.

    The scale path when the query set is too large to broadcast against
    the whole corpus: candidate volume per query is ~nprobe/n_cells of
    the corpus, and the candidate join is a hash equi-join on the cell id
    (skew-bounded by cell balance, which the Lloyd refinement improves).
    Recall is bounded by cell/probe geometry — tests pin recall@k against
    ``brute_force_topk`` rather than asserting exactness.
    """
    assign, cents = ivf_assign(
        corpus, n_cells, id_col, vec_col, lloyd_iters=lloyd_iters, dims=dims
    )
    probes = ivf_probes(queries, cents, nprobe, id_col, vec_col)
    return ivf_topk_from(corpus, queries, assign, probes, k, id_col, vec_col)


def ivf_probes(
    queries: DataFrame,
    cents: DataFrame,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, cell): each query's ``nprobe`` best coarse cells by the
    same argmax(v.c - |c|^2/2) score the assignment uses. Exportable —
    together with the (id, cell) assignment it fully determines the IVF
    candidate set, which is what lets DuckDB hash-check the probe join +
    exact scoring downstream of the hash-seeded centroids."""
    q_ex = queries.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__i", "__x"),
    )
    half_norm = cents.groupBy("cell").agg(
        (F.sum(F.col("w") * F.col("w")) / 2.0).alias("half_cn")
    )
    q_scores = (
        q_ex.join(broadcast(cents), "__i")
        .groupBy("id", "cell")
        .agg(F.sum(F.col("__x") * F.col("w")).alias("dp"))
        .join(broadcast(half_norm), "cell")
        .select("id", "cell", (F.col("dp") - F.col("half_cn")).alias("score"))
    )
    wq = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("cell"))
    return (
        q_scores.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(F.col("id").alias("query_id"), "cell")
    )


def ivf_topk_from(
    corpus: DataFrame,
    queries: DataFrame,
    assign: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The probe-and-score phase of ``ivf_topk`` against a materialized
    index: ``assign`` (id, cell) and ``probes`` (query_id, cell) — the
    production shape, where the assignment is a persisted bucketed table
    rebuilt only when the corpus changes."""
    q_ex = queries.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__i", "__x"),
    )
    cand = probes.join(
        assign.select(F.col("id").alias("neighbor_id"), "cell"), "cell"
    ).where(F.col("query_id") != F.col("neighbor_id")).drop("cell")
    # candidate scoring via exploded codegen sums, NOT the fold-based
    # ``cosine`` helper: aggregate/zip_with lambdas run interpreted at
    # ~ms per 64-dim pair, which dominates the whole probe phase once
    # candidates number in the thousands. The exploded join keeps every
    # multiply-add inside whole-stage codegen; norms are computed once
    # per side, not per pair.
    c_norm = ex_norms(corpus, id_col, vec_col, "c_l2").withColumnRenamed(
        "id", "neighbor_id"
    )
    q_norm = ex_norms(queries, id_col, vec_col, "q_l2").withColumnRenamed(
        "id", "query_id"
    )
    c_ex = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__i", "__cx"),
    )
    dp = (
        cand.join(c_ex, "neighbor_id")
        .join(
            broadcast(q_ex.select(F.col("id").alias("query_id"), "__i", F.col("__x").alias("__qx"))),
            ["query_id", "__i"],
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("__cx") * F.col("__qx")).alias("dp"))
    )
    scored = (
        dp.join(broadcast(q_norm), "query_id")
        .join(c_norm, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("dp") / (F.col("q_l2") * F.col("c_l2")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def ex_norms(df: DataFrame, id_col: str, vec_col: str, out_col: str) -> DataFrame:
    """(id, <out_col>) L2 norms via exploded codegen sum (no HOF fold)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("__i", "__x"),
        )
        .groupBy("id")
        .agg(F.sqrt(F.sum(F.col("__x") * F.col("__x"))).alias(out_col))
    )


def multitable_sig_table(
    emb: DataFrame,
    planes: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, t, sig): the multi-table hyperplane index ``cosine_neardup_
    lsh`` buckets on — one signature per (vector, table), all
    tables x planes dot products in a single pass of codegen'd
    sum-aggregates. Persistable/exportable: DuckDB re-derives candidate
    generation (bucket_cap + collision join) and exact cosine verify
    from this table plus the raw embeddings."""
    from functools import reduce

    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    ex = base.select("id", F.posexplode("v").alias("__i", "__x"))

    def weight(t: int, p: int) -> Column:
        h = F.xxhash64(F.lit(t), F.lit(p), F.col("__i"))
        return (F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0) - 1.0

    dots = ex.groupBy("id").agg(
        *[
            F.sum(F.col("__x") * weight(t, p)).alias(f"d{t}_{p}")
            for t in range(tables)
            for p in range(planes)
        ]
    )

    def sig(t: int) -> Column:
        bits = [
            F.when(F.col(f"d{t}_{p}") > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for p in range(planes)
        ]
        return reduce(lambda a, x: a.bitwiseOR(x), bits)

    return dots.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), sig(t).alias("sig"))
                    for t in range(tables)
                ]
            )
        ).alias("ts"),
    ).select("id", "ts.t", "ts.sig")


def bucket_cosine_pairs(
    with_vec: DataFrame,
    bucket_cols: list[str],
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """All within-bucket UNORDERED pair cosines (src < dst, RAW double)
    via an Arrow ``applyInPandas`` kernel — the scoring engine for the
    LSH candidate paths.

    Bit-identical to the JVM expression ``dot(a,b)/(l2(a)*l2(b))`` with
    sequential-fold dots: the kernel accumulates one DIMENSION at a
    time (``acc += A[:, k] * B[:, k]``), so every double add/multiply
    happens in exactly the order (and therefore with exactly the IEEE
    rounding) of ``F.aggregate``'s sequential fold, while numpy
    vectorizes over the PAIR axis — ~100x less per-element overhead
    than Catalyst higher-order functions, which allocate a zipped
    array per pair and fold it element-by-element. Norms use the same
    per-dimension accumulation; sqrt/divide are correctly rounded
    unary/binary ops, so the quotient is bit-identical too.

    Scale shape: one task per bucket group, pair loops chunked (32k
    pairs x dims per temp) so a cap-sized bucket (1000 members,
    ~500k pairs) peaks ~32 MB per task rather than pairs x dims x 16
    bytes. Callers must cap buckets COUNT-FIRST upstream. A pair
    colliding in multiple tables is emitted once per table with
    bit-identical cosine — dedupe downstream with ``.distinct()``.

    Input: (bucket_cols..., id_col, vec_col: array<double>).
    Output: (src long, dst long, __cos double), raw (un-rounded).
    """
    import numpy as np
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        empty = pd.DataFrame(
            {
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
                "__cos": pd.Series([], dtype="float64"),
            }
        )
        if m < 2:
            return empty
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        d = V.shape[1]
        nrm = np.zeros(m)
        for k in range(d):
            c = V[:, k]
            nrm += c * c
        nrm = np.sqrt(nrm)
        iu, ju = np.triu_indices(m, 1)
        chunks = []
        step = 32768
        for s in range(0, len(iu), step):
            ii, jj = iu[s : s + step], ju[s : s + step]
            A, B = V[ii], V[jj]
            acc = np.zeros(len(ii))
            for k in range(d):
                acc += A[:, k] * B[:, k]
            den = nrm[ii] * nrm[jj]
            # SQL division semantics, NOT IEEE: both Spark and DuckDB
            # return NULL for double x/0 (probed — ANSI behavior),
            # where numpy would give inf/NaN. A zero-norm vector (all
            # zeros, or components so small every square underflows)
            # must therefore yield NULL cosine, exactly like the JVM
            # expression this kernel replaces.
            zero = den == 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / den
            # mask EXPLICITLY (FloatingArray(values, mask)) rather than
            # pd.array(cos, dtype="Float64"), which coerces EVERY NaN to
            # NA: a genuinely-NaN cosine (NaN component, or inf/inf from
            # overflowing norms) must stay NaN — both the JVM fold and
            # DuckDB propagate it — while ONLY den==0 becomes NULL
            vals = pd.arrays.FloatingArray(
                np.ascontiguousarray(cos, dtype=np.float64), zero
            )
            chunks.append(
                pd.DataFrame(
                    {
                        "src": np.minimum(ids[ii], ids[jj]).astype("int64"),
                        "dst": np.maximum(ids[ii], ids[jj]).astype("int64"),
                        "__cos": vals,
                    }
                )
            )
        return pd.concat(chunks, ignore_index=True)

    return with_vec.groupBy(*bucket_cols).applyInPandas(
        kernel, "src long, dst long, __cos double"
    )


def cosine_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 1000,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-duplicate PAIRS at cosine >= threshold, LSH-bucketed
    (the scale path beside the exact all-pairs ``embedding_neardup_cosine``).

    ``tables`` independent hyperplane signatures (seeded off the table
    index; deterministic, no stored model): a pair is a candidate when it
    collides in ANY table, then candidates are verified exactly. Recall
    for a pair at angle theta is 1 - (1 - (1 - theta/pi)^planes)^tables —
    ~0.93 at cos 0.9 with 8x8, approaching 1 as similarity rises, which
    is the regime near-DUP detection cares about. All tables * planes
    dot products run as one pass of codegen'd sum-aggregates (the same
    explode shape as minhash signatures); candidate generation groups
    each bucket's ids and double-explodes pairs, with ``bucket_cap``
    dropping degenerate buckets (e.g. all-zero vectors) COUNT-FIRST:
    a partial-aggregated count + broadcast anti-join of hot (t, sig)
    keys runs BEFORE any list aggregation (the minhash_lsh_pairs /
    ngram df_cap shape), so a degenerate mega-bucket never
    materializes its full id array in one aggregation buffer — the
    single-task blowout the cap exists to prevent. Every surviving
    list is bounded by ``bucket_cap``. ``banded`` (optional): a
    precomputed/persisted (id, t, sig) table from
    ``multitable_sig_table`` — the oracle-export / persisted-index
    hook.
    """
    base = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if banded is None:
        banded = multitable_sig_table(emb, planes, tables, id_col, vec_col)
    if bucket_cap is not None:
        hot = (
            banded.groupBy("t", "sig")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > bucket_cap)
            .select("t", "sig")
        )
        banded = banded.join(F.broadcast(hot), ["t", "sig"], "left_anti")
    buckets = banded.groupBy("t", "sig").agg(F.collect_list("id").alias("ids"))
    cand = (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    # per-side norms computed once per row (same association as
    # cosine()'s folds) — one fold per candidate pair instead of three
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        l2_norm(F.col("v")).alias("__na"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        l2_norm(F.col("v")).alias("__nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where(cos >= threshold)
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
    )


# --- int8 scalar quantization ------------------------------------------------

def int8_codes(vec: Column) -> tuple[Column, Column]:
    """(scale, codes) for symmetric max-abs int8 quantization of an
    array<double> column.

    scale = max|x| / 127; code_i = floor(x_i/scale + 0.5) — explicit
    half-up rounding rather than round(), because round() half-even vs
    half-away semantics differ across engines while floor(x + 0.5) is
    identical everywhere. An all-zero vector gets scale 0 and all-zero
    codes (the 0/0 guard), so dequantization code*scale is total.
    """
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = maxabs / F.lit(127.0)
    codes = F.transform(
        vec,
        lambda x: F.when(scale > 0, F.floor(x / scale + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return scale, codes


def quantize_int8_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 quantization audit: scale, code mass, worst error.

    The go/no-go report run before switching an ANN index to compressed
    codes: max_abs_err ≤ scale/2 by construction, so a violation means
    the quantizer (not the data) is broken. Pure projection — no shuffle,
    no Python; at 100 TB this is a single scan that can ride along any
    other pass over the embedding table.
    Returns (id, n_dims, scale, sum_codes, max_abs_err), doubles 6 dp.
    """
    v = _as_double(F.col(vec_col))
    scale, codes = int8_codes(v)
    err = F.array_max(
        F.zip_with(v, codes, lambda x, c: F.abs(x - c.cast("double") * scale))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(v).alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "sum_codes"
        ),
        F.round(err, 6).alias("max_abs_err"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k via int8 codes with exact rescoring.

    The compressed-index ANN pattern: candidate generation ranks by the
    cosine of the QUANTIZED vectors — the per-vector scales cancel in
    cos(q̂, ĉ) = idot(cq, cc)/(√idot(cq,cq)·√idot(cc,cc)), so the scoring
    pass touches only integer codes (4× less data than float32, the
    whole point at 100 TB: the scan that dominates brute-force ANN reads
    the code column, never the float column). The top refine·k
    candidates per query are then rescored with exact double cosine and
    the final top-k is exact over that candidate set. All integer dot
    products are exact in doubles (|code| ≤ 127, so 64-dim dots stay
    ≪ 2^53), making candidate ranking bit-identical across engines.
    Ties broken by neighbor id at both cuts. Recall < 1 only when a true
    neighbor's quantized rank falls past refine·k; tests pin recall@k
    against ``brute_force_topk``.

    The candidate phase is the exploded posexplode→groupBy-sum shape
    (the same one ivf_topk uses): every multiply-add runs inside
    whole-stage codegen — no per-pair interpreted fold — and because
    the operands are int8 codes, every partial dot product is EXACT
    integer arithmetic (|code| ≤ 127 ⇒ 64-dim dots ≪ 2^53), so the
    summation order genuinely cannot matter: the exploded sums are
    bit-identical to a sequential fold and to DuckDB's
    list_dot_product, with none of the float-reassociation caveats the
    exploded shape carries elsewhere. Rows carry ONLY codes + norms —
    never the float vectors (the whole 4×-smaller-scan point) — and
    narrow to (query_id, neighbor_id, approx_cos) before the shortlist
    window; the float column joins the refine·k shortlist rows only
    (ADVICE r5). Measured (tools/measure_shuffles.py, sf0.1): the fold
    form shuffled 2.4 KB; this form shuffles the exploded code rows
    once into the per-pair aggregate and nothing wide.
    """
    def codes_ex(df_in: DataFrame, id_out: str, code_out: str) -> DataFrame:
        """(id, __i, code): the exploded int8 code table. Checkpointed
        by callers so the (interpreted, per-element) quantization
        transform runs once per vector, not once per consumer."""
        v = _as_double(F.col(vec_col))
        _, codes = int8_codes(v)
        return df_in.select(
            F.col(id_col).alias(id_out), codes.alias("__cd")
        ).select(id_out, F.posexplode("__cd").alias("__i", code_out))

    c_ex = codes_ex(corpus, "neighbor_id", "__cc").localCheckpoint()
    q_ex = codes_ex(queries, "query_id", "__qc").localCheckpoint()
    # per-side code norms, computed once per vector (never per pair);
    # pure integer sums under the sqrt. Zero-norm vectors (all-zero
    # codes) drop here, mirroring the oracle's nonzero-code filters.
    c_norm = (
        c_ex.groupBy("neighbor_id")
        .agg(F.sqrt(F.sum(F.col("__cc") * F.col("__cc"))).alias("__cn"))
        .where(F.col("__cn") > 0)
    )
    q_norm = (
        q_ex.groupBy("query_id")
        .agg(F.sqrt(F.sum(F.col("__qc") * F.col("__qc"))).alias("__qn"))
        .where(F.col("__qn") > 0)
    )
    dp = (
        c_ex.join(broadcast(q_ex), "__i")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("__cc") * F.col("__qc")).alias("__dp"))
    )
    cand = (
        dp.join(c_norm, "neighbor_id")
        .join(broadcast(q_norm), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.col("__dp") / (F.col("__qn") * F.col("__cn"))).alias("approx_cos"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= refine * k)
        .select("query_id", "neighbor_id")
    )
    # exact rescore: the float column enters here, joined onto the
    # refine·k shortlist rows only
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    rescored = (
        shortlist.join(cv, "neighbor_id")
        .join(broadcast(qv), "query_id")
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rescored.select("query_id", "neighbor_id", "cos_sim")
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# --- k-means assignment ------------------------------------------------------

def kmeans_assign_report(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-pass nearest-seed k-means assignment with a cluster report.

    Seeds are the ``k`` lowest-id vectors (deterministic — no RNG, no
    stored model); every vector is assigned to the seed minimizing
    squared L2, computed as dot(a,a) - 2·dot(a,s) + dot(s,s) so each
    side's self-dot is one fold and the expression order is mirrorable
    in SQL. The k-row seed table broadcasts, so every seed row for a
    vector is partition-local and the argmin is a min_by aggregate with
    a (sqdist, seed_id) struct tiebreak. The struct ordering makes Spark
    plan it as a partial+final SortAggregate rather than a hash
    aggregate — the partial still completes map-side (the broadcast
    keeps all k rows of a vector in one partition), so the one exchange
    carries a single narrow (vid, cluster, sqdist) row per vector; no
    Window node anywhere (pinned). Lloyd refinement lives in ``ivf_assign``;
    this operator is the assignment/report step a curation pipeline
    runs against FIXED centroids (cluster balance, inertia drift
    between snapshots).
    Returns (cluster_id, n_members, avg_sqdist) — doubles 6 dp.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    c = emb.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e"))
    seeds = (
        c.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("seed_id"), F.col("e").alias("se"))
    )
    a, s = F.col("e"), F.col("se")
    sqdist = dot(a, a) - F.lit(2.0) * dot(a, s) + dot(s, s)
    scored = c.crossJoin(broadcast(seeds)).withColumn("sqdist", sqdist)
    assigned = scored.groupBy("vid").agg(
        F.min_by("seed_id", F.struct(F.col("sqdist"), F.col("seed_id"))).alias(
            "cluster_id"
        ),
        F.min("sqdist").alias("sqdist"),
    )
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("sqdist"), 6).alias("avg_sqdist"),
    )


# --- product quantization (PQ) ANN -------------------------------------------
#
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011) — the compressed-index family's next step past
# int8 scalar quantization: split each D-dim vector into m_sub
# subvectors, learn a k_codes-centroid codebook PER SUBSPACE, and store
# each vector as m_sub small codes (here 8 codes over 16 centroids =
# 8×4 bits, a 64× compression of a 64-dim float64 vector). Queries
# never decompress the corpus: a per-query lookup table of
# subspace-centroid dot products turns scoring into m_sub table
# lookups + adds per corpus vector (asymmetric distance computation).


def _pq_subspace_ex(
    df: DataFrame, id_col: str, vec_col: str, sub_dims: int, id_out: str
) -> DataFrame:
    """(id, m, j, x): vectors exploded into (subspace, within-dim) form."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.posexplode(_as_double(F.col(vec_col))).alias("__i", "__x"),
    ).select(
        id_out,
        (F.col("__i") / sub_dims).cast("int").alias("m"),
        F.pmod(F.col("__i"), F.lit(sub_dims)).alias("j"),
        "__x",
    )


def _pq_seed_codebook(spark, m_sub: int, k_codes: int, sub_dims: int) -> DataFrame:
    """(m, c, j, w) seed codebooks, hash-derived in [-1, 1] — same
    deterministic no-stored-model convention as _seed_centroids, and
    the same single-range index decode (the three chained crossJoins
    cost two extra broadcast-nested-loop stages for identical rows)."""
    base = spark.range(m_sub * k_codes * sub_dims).select(
        (F.col("id") / (k_codes * sub_dims)).cast("int").alias("m"),
        F.pmod((F.col("id") / sub_dims).cast("long"), F.lit(k_codes))
        .cast("int")
        .alias("c"),
        F.pmod(F.col("id"), F.lit(sub_dims)).cast("int").alias("j"),
    )
    h = F.xxhash64(F.lit("pq"), F.col("m"), F.col("c"), F.col("j"))
    w = (F.pmod(h, F.lit(2000001)).cast("double") / 1000000.0) - 1.0
    return base.select("m", "c", "j", w.alias("w"))


def _pq_subvec_ex(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    sub_dims: int,
    id_out: str,
) -> DataFrame:
    """(id, m, sv): one row per (vector, subspace) carrying the dense
    sub-vector — N·m_sub narrow rows (vs the N·dims·k_codes rows the
    naive per-dimension explode-join pays), built with static slices so
    everything codegens."""
    v = _as_double(F.col(vec_col))
    entries = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(v, m * sub_dims + 1, sub_dims).alias("sv"),
            )
            for m in range(m_sub)
        ]
    )
    return df.select(
        F.col(id_col).alias(id_out), F.explode(entries).alias("e")
    ).select(id_out, F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))


def _pq_cb_arrays(codebook: DataFrame, sub_dims: int) -> DataFrame:
    """(m, c, warr, half_cn): the (m, c, j, w) codebook pivoted to one
    dense weight array per centroid — m_sub·k_codes rows, broadcast-
    sized model state."""
    from functools import reduce

    jw = codebook.groupBy("m", "c").agg(
        F.array_sort(F.collect_list(F.struct("j", "w"))).alias("jw")
    )
    warr = F.transform("jw", lambda s: s["w"])
    half = reduce(
        lambda a, b: a + b,
        [
            F.element_at(F.col("warr"), j + 1) * F.element_at(F.col("warr"), j + 1)
            for j in range(sub_dims)
        ],
    ) / 2.0
    return jw.select("m", "c", warr.alias("warr")).withColumn("half_cn", half)


def _pq_assign(
    sub_ex: DataFrame,
    codebook: DataFrame,
    id_out: str,
    sub_dims: int,
    keep_sv: bool = False,
) -> DataFrame:
    """(id, m, code): nearest centroid per (vector, subspace).

    Same argmin-as-argmax trick as _assign_cells, per subspace:
    argmin_c |v_m - c|² == argmax_c (v_m·c - |c|²/2). The dot against
    each centroid is a FIXED-ORDER codegen sum over the sub-vector
    (static element_at chain — no interpreted fold, no per-dimension
    explode), the centroid table enters as a broadcast join on m alone,
    and the argmax is one min_by aggregate with partial map-side
    combine — the only exchange carries N·m_sub (id, m, code) rows.
    Ties break to the smallest c so the assignment is deterministic
    and oracle-mirrorable.

    ``keep_sv`` additionally carries the sub-vector through the
    aggregate (it is constant within an (id, m) group, so ``first`` is
    deterministic) — the Lloyd means consumer uses it to avoid
    re-joining the assignment back to the sub-vector table."""
    from functools import reduce

    cb_arr = _pq_cb_arrays(codebook, sub_dims)
    dp = reduce(
        lambda a, b: a + b,
        [
            F.element_at(F.col("sv"), j + 1) * F.element_at(F.col("warr"), j + 1)
            for j in range(sub_dims)
        ],
    )
    scored = sub_ex.join(broadcast(cb_arr), "m").select(
        id_out, "m", "c", "sv", (dp - F.col("half_cn")).alias("score")
    )
    aggs = [
        F.min_by("c", F.struct((-F.col("score")).alias("s"), F.col("c"))).alias(
            "code"
        )
    ]
    if keep_sv:
        aggs.append(F.first("sv").alias("sv"))
    return scored.groupBy(id_out, "m").agg(*aggs)


def pq_codebook(
    corpus: DataFrame,
    m_sub: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    iters: int = 1,
) -> DataFrame:
    """Learn the per-subspace codebooks: (m, c, j, w).

    Hash-seeded centroids refined by ``iters`` distributed Lloyd
    rounds run across ALL subspaces in one job pipeline per round
    (assign → per-(m, c, j) means); empty codes keep their seed so the
    codebook shape is stable. The model state is m_sub·k_codes·sub_dims
    rows — broadcast-sized by construction, localCheckpointed per round
    like ivf_assign's centroids.

    Cost shape (measured, tools/ab_pq.py): one Lloyd round is ONE pass
    over the N·m_sub sub-vector rows — broadcast centroid join,
    fixed-order codegen dots, min_by argmax that carries the sub-vector
    through (keep_sv), element-wise avg means over the same frame, and
    a broadcast coalesce back into the seed. No (id, m) re-join, no
    per-element explode, no mid-round materialization (the
    per-dimension explode-join form cost 1.5-2x more end to end; the
    earlier assign-checkpoint + re-join form cost ~1.7x at fixture
    scale). At fixture scale wall clock is fixed per-stage overhead, at
    corpus scale the single linear scan — both the right 100 TB
    posture.
    Production PQ typically trains the codebook on a bounded sample
    (FAISS-style); pass a sampled frame as ``corpus`` for that."""
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])  # one-row probe
    if dims % m_sub != 0:
        raise ValueError(f"dims={dims} not divisible by m_sub={m_sub}")
    sub_dims = dims // m_sub
    spark = corpus.sparkSession
    sub_ex = _pq_subvec_ex(corpus, id_col, vec_col, m_sub, sub_dims, "id")
    cb = _pq_seed_codebook(spark, m_sub, k_codes, sub_dims)
    for _ in range(iters):
        # one fused pipeline per round: the argmin aggregate carries the
        # sub-vector through (keep_sv), so the means are element-wise
        # avgs over the SAME frame — no (id, m) re-join against the
        # sub-vector table and no per-element posexplode shuffle. The
        # round's only exchanges are the N·m_sub argmin combine and the
        # m_sub·k_codes means combine; the tiny means table broadcasts
        # into the coalesce, and the single round-ending checkpoint
        # executes the whole chain exactly once (the old per-round
        # assign checkpoint paid an extra eager job for a frame with
        # one consumer).
        assign = _pq_assign(sub_ex, cb, "id", sub_dims, keep_sv=True)
        avgs = assign.groupBy("m", F.col("code").alias("c")).agg(
            *[
                F.avg(F.element_at("sv", j + 1)).alias(f"__w{j}")
                for j in range(sub_dims)
            ]
        )
        means = avgs.select(
            "m",
            "c",
            F.posexplode(
                F.array(*[F.col(f"__w{j}") for j in range(sub_dims)])
            ).alias("j", "w_new"),
        )
        cb = (
            cb.join(broadcast(means), ["m", "c", "j"], "left")
            .select("m", "c", "j", F.coalesce("w_new", "w").alias("w"))
            .localCheckpoint()
        )
    return cb


def pq_codes(
    corpus: DataFrame,
    codebook: DataFrame,
    m_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """(id, m, code): the compressed index — m_sub·ceil(log2 k) bits per
    vector. This is the table a production deployment persists
    (bucketable on id; append-maintained like the minhash band index);
    the float column is read only to build it."""
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])
    sub_dims = dims // m_sub
    sub_ex = _pq_subvec_ex(corpus, id_col, vec_col, m_sub, sub_dims, "id")
    return _pq_assign(sub_ex, codebook, "id", sub_dims)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    iters: int = 1,
    codebook: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Cosine top-k via PQ/ADC with exact rescoring:
    (query_id, neighbor_id, cos_sim).

    Scoring never touches corpus floats: per query the LUT of
    (m, c) → ⟨q_m, centroid⟩ dot products (m_sub·k_codes rows,
    broadcast) joins the code table on (m, code) and sums —
    whole-stage-codegen lookups + adds over the 64×-compressed index,
    the scan shape that survives 100 TB. Approximate cosine divides by
    the RECONSTRUCTION norm √Σ_m |c_(m,code)|² (the concatenated
    centroids' norm — exact for the reconstructed vector). The top
    refine·k candidates per query (ranked on 6-dp-rounded ADC cosine,
    id tiebreak — mirrored by the oracle, same float discipline as
    embedding_kmeans_assign) are rescored with exact double cosine.
    ``codebook``/``codes`` inject persisted/exported index tables.
    Recall@k vs brute force is pinned in tests/test_similarity_pq.py.
    """
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])
    sub_dims = dims // m_sub
    if codebook is None:
        codebook = pq_codebook(
            corpus, m_sub, k_codes, id_col, vec_col, dims=dims, iters=iters
        )
    if codes is None:
        # single consumer (the fused ADC+recon aggregate) — no
        # materialization needed; injected codes (persisted/exported
        # index) are already on disk
        codes = pq_codes(corpus, codebook, m_sub, id_col, vec_col, dims=dims)

    q_sub = _pq_subspace_ex(queries, id_col, vec_col, sub_dims, "query_id")
    adc = (
        codes.withColumnRenamed("code", "c")
        .join(broadcast(_pq_lut_n2(q_sub, codebook)), ["m", "c"])
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(F.sum("dot").alias("adot"), F.sum("n2").alias("recon2"))
    )
    return _pq_rank_rescore(adc, queries, corpus, k, refine, id_col, vec_col)


def _pq_lut_n2(q_sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """(query_id, m, c, dot, n2): the per-query ADC lookup table —
    m_sub·k_codes rows per query, broadcast-sized by construction —
    carrying the centroid's squared norm so the single (m, c) join
    against the code table yields BOTH the ADC dot-sum and the
    reconstruction norm Σ_m |c_(m,code)|² in one aggregate (the
    separate recon2 pass cost a second code-table scan + shuffle)."""
    return (
        q_sub.join(broadcast(codebook), ["m", "j"])
        .groupBy("query_id", "m", "c")
        .agg(
            F.sum(F.col("__x") * F.col("w")).alias("dot"),
            F.sum(F.col("w") * F.col("w")).alias("n2"),
        )
    )


def _pq_rank_rescore(
    adc: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    refine: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared PQ tail: ADC-cosine ranking (6-dp rounded, id tiebreak) →
    refine·k shortlist → exact double-cosine rescore → final top-k.

    ``adc`` already carries the reconstruction norm (``recon2``) from
    the fused LUT join, so no second code-table pass happens here; the
    query norm is a narrow sequential fold over the query vectors (no
    exchange — the groupBy form shuffled N·m_sub exploded rows for a
    handful of queries); the refine·k shortlist (bounded by the query
    count) broadcasts into the corpus-vector join — at 100 TB the
    corpus side streams and only shortlisted rows survive the scan."""
    q_l2 = queries.select(
        F.col(id_col).alias("query_id"),
        F.sqrt(
            F.aggregate(
                _as_double(F.col(vec_col)),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        ).alias("ql2"),
    ).where(F.col("ql2") > 0)
    cand = (
        adc.where(F.col("recon2") > 0)
        .join(broadcast(q_l2), "query_id")
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                F.col("adot") / (F.col("ql2") * F.sqrt(F.col("recon2"))), 6
            ).alias("cos_adc"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_adc"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= refine * k)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    rescored = (
        cv.join(broadcast(shortlist), "neighbor_id")
        .join(broadcast(qv), "query_id")
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.select("query_id", "neighbor_id", "cos_sim")
        .withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m_sub: int = 16,
    k_codes: int = 16,
    refine: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    iters: int = 1,
    assign: DataFrame | None = None,
    probes: DataFrame | None = None,
    codebook: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: coarse cell pruning composed with PQ/ADC scoring — the
    FAISS IVFADC architecture (Jégou et al. §V) and the full 100 TB ANN
    shape: a query touches only its ``nprobe`` cells' inverted lists
    (~nprobe/n_cells of the corpus), and what it reads there are the
    m_sub-byte PQ codes, never float vectors. Candidate volume is cut
    by the coarse quantizer AND each candidate costs table lookups +
    adds; the float column is read once, for the exact-rescored
    refine·k shortlist. All four index tables ((id, cell) assignment,
    (query_id, cell) probes, codebook, codes) are injectable —
    persisted/exported index hooks; at scale the code table is
    bucketed BY CELL so a probe's inverted list is one partition scan.
    Recall compounds the two approximations (cell miss × shortlist
    miss); tests pin the floor and the planted-duplicate limit.
    """
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])
    sub_dims = dims // m_sub
    if (assign is None) != (probes is None):
        # probes derived from freshly re-seeded centroids would index a
        # DIFFERENT partition of space than an injected assignment
        # (e.g. one built with Lloyd refinement), silently collapsing
        # recall — the two tables share centroid geometry, so inject
        # them together or not at all
        raise ValueError(
            "ivfpq_topk: inject `assign` and `probes` together — both "
            "derive from the same coarse centroids"
        )
    if assign is None:
        a, cents = ivf_assign(corpus, n_cells, id_col, vec_col, 0, dims)
        assign = a
        probes = ivf_probes(queries, cents, nprobe, id_col, vec_col)
    if codebook is None:
        codebook = pq_codebook(
            corpus, m_sub, k_codes, id_col, vec_col, dims=dims, iters=iters
        )
    if codes is None:
        # single consumer (the candidate-restricted fused ADC+recon
        # aggregate) — no materialization needed
        codes = pq_codes(corpus, codebook, m_sub, id_col, vec_col, dims=dims)

    # inverted-list candidates: (query_id, id) via the probed cells;
    # assignment is one cell per id, so no duplicate pairs arise
    cand_ids = (
        probes.join(assign, "cell")
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", "id")
    )
    q_sub = _pq_subspace_ex(queries, id_col, vec_col, sub_dims, "query_id")
    adc = (
        cand_ids.join(codes, "id")
        .withColumnRenamed("code", "c")
        .join(broadcast(_pq_lut_n2(q_sub, codebook)), ["query_id", "m", "c"])
        .groupBy("query_id", "id")
        .agg(F.sum("dot").alias("adot"), F.sum("n2").alias("recon2"))
    )
    return _pq_rank_rescore(adc, queries, corpus, k, refine, id_col, vec_col)


def semdedup_prune(
    emb: DataFrame,
    k: int = 16,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) reduced to its deterministic core:
    cluster the embedding space, then prune within-cluster semantic
    near-duplicates — pairs whose exact cosine clears ``threshold`` keep
    only the lowest id.

    The paper's insight is the scale story: clustering first means the
    quadratic pair join runs WITHIN clusters only (expected size N/k),
    never across the corpus — with k grown proportionally to N (so
    cluster size stays bounded), total pair work stays linear-ish while
    a corpus-wide pair join would be O(N^2). Here the assignment is the
    same deterministic nearest-seed rule as ``kmeans_assign_report``
    (k lowest-id seeds, min_by argmin with seed-id tiebreak — no RNG,
    so the whole operator is oracle-checkable end to end); production
    swaps in trained centroids without touching the prune.

    Plan shape: broadcast seed table -> map-side argmin (one narrow
    (vid, cluster) row per vector shuffled) -> self-join on cluster_id
    (the ONLY pair-generating join, equi-keyed on the cluster) with
    per-side norms precomputed before the join (never recomputed per
    pair) -> distinct pruned-id set -> left join back onto the
    assignment. Returns (id_col, cluster_id, pruned).
    """
    c = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e")
    )
    seeds = (
        c.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("seed_id"), F.col("e").alias("se"))
    )
    a, s = F.col("e"), F.col("se")
    sqdist = dot(a, a) - F.lit(2.0) * dot(a, s) + dot(s, s)
    assigned = (
        c.crossJoin(broadcast(seeds))
        .withColumn("sqdist", sqdist)
        .groupBy("vid")
        .agg(
            F.min_by(
                "seed_id", F.struct(F.col("sqdist"), F.col("seed_id"))
            ).alias("cluster_id")
        )
    )
    side = c.join(assigned, "vid").withColumn("__n", l2_norm(F.col("e")))
    left = side.select(
        F.col("vid").alias("id_a"),
        "cluster_id",
        F.col("e").alias("ea"),
        F.col("__n").alias("na"),
    )
    right = side.select(
        F.col("vid").alias("id_b"),
        "cluster_id",
        F.col("e").alias("eb"),
        F.col("__n").alias("nb"),
    )
    cos = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    dup_b = (
        left.join(right, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= threshold)
        .select(F.col("id_b").alias("vid"))
        .distinct()
        .withColumn("__p", F.lit(True))
    )
    return assigned.join(dup_b, "vid", "left").select(
        F.col("vid").alias(id_col),
        "cluster_id",
        F.coalesce("__p", F.lit(False)).alias("pruned"),
    )


def centroid_silhouette_report(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified-silhouette clustering quality per cluster: for every
    vector, a = distance to its (nearest) centroid and b = distance to
    the second-nearest, s = (b - a)/max(a, b) in [-1, 1] — the
    centroid-based silhouette (Hruschka 2004), O(n*k) instead of the
    O(n^2) pairwise classic, which is the only form that survives at
    corpus scale. High mean s = tight, well-separated clusters; near 0
    = boundary soup (the drift alarm between snapshot re-clusterings).

    Same deterministic frame as ``kmeans_assign_report``: k lowest-id
    seeds broadcast, squared distances via the mirrorable
    dot(a,a) - 2 dot(a,s) + dot(s,s) form; the per-vector nearest-two
    fold is a sort_array(collect_list) over exactly k partition-local
    structs (the broadcast keeps every seed row of a vector in one
    partition — the aggregate's partial completes map-side). sqrt and
    the ratio are identical IEEE ops in any engine; 6 dp rounding on
    the per-cluster mean only. Returns
    (cluster_id, n_members, avg_silhouette).
    """
    if k < 2:
        raise ValueError(f"silhouette needs k >= 2, got {k}")
    c = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e")
    )
    seeds = (
        c.orderBy("vid")
        .limit(k)
        .select(F.col("vid").alias("seed_id"), F.col("e").alias("se"))
    )
    a, s = F.col("e"), F.col("se")
    sqdist = dot(a, a) - F.lit(2.0) * dot(a, s) + dot(s, s)
    scored = c.crossJoin(broadcast(seeds)).withColumn("sqdist", sqdist)
    nearest2 = scored.groupBy("vid").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("sqdist"), F.col("seed_id")))
        ).alias("__arr")
    )
    a_d = F.sqrt(F.col("__arr")[0]["sqdist"])
    b_d = F.sqrt(F.col("__arr")[1]["sqdist"])
    sil = F.when(F.greatest(a_d, b_d) == 0, F.lit(0.0)).otherwise(
        (b_d - a_d) / F.greatest(a_d, b_d)
    )
    return (
        nearest2.select(
            F.col("__arr")[0]["seed_id"].alias("cluster_id"),
            sil.alias("__s"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("__s"), 6).alias("avg_silhouette"),
        )
    )


def quantized_rank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by the cosine of int8 codes WITHOUT exact rescoring:
    (query_id, neighbor_id, approx_rank), k rows per query.

    The candidate phase of ``quantized_topk`` exposed as its own
    ranking — what an index-quality eval needs when the question is
    "how does the COMPRESSED ranking order candidates" rather than
    "what does the rescored pipeline return". Same exploded
    integer-dot plan (codes only); the ordering key is a double
    cosine dp / (||q|| * ||c||) whose inputs (dot product and
    squared norms) are exact integers, so the key is cross-engine
    deterministic because sqrt, *, and / are correctly-rounded
    IEEE-754 ops applied in the same association on both sides —
    not because the key itself is an integer. Ranks tie-break on
    neighbor id.
    """

    def codes_ex(df_in: DataFrame, id_out: str, code_out: str) -> DataFrame:
        v = _as_double(F.col(vec_col))
        _, codes = int8_codes(v)
        return df_in.select(
            F.col(id_col).alias(id_out), codes.alias("__cd")
        ).select(id_out, F.posexplode("__cd").alias("__i", code_out))

    c_ex = codes_ex(corpus, "neighbor_id", "__cc").localCheckpoint()
    q_ex = codes_ex(queries, "query_id", "__qc").localCheckpoint()
    c_norm = (
        c_ex.groupBy("neighbor_id")
        .agg(F.sqrt(F.sum(F.col("__cc") * F.col("__cc"))).alias("__cn"))
        .where(F.col("__cn") > 0)
    )
    q_norm = (
        q_ex.groupBy("query_id")
        .agg(F.sqrt(F.sum(F.col("__qc") * F.col("__qc"))).alias("__qn"))
        .where(F.col("__qn") > 0)
    )
    dp = (
        c_ex.join(broadcast(q_ex), "__i")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("__cc") * F.col("__qc")).alias("__dp"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cos"), F.asc("neighbor_id")
    )
    return (
        dp.join(c_norm, "neighbor_id")
        .join(broadcast(q_norm), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.col("__dp") / (F.col("__qn") * F.col("__cn"))).alias(
                "approx_cos"
            ),
        )
        .withColumn("approx_rank", F.row_number().over(w))
        .where(F.col("approx_rank") <= k)
        .select("query_id", "neighbor_id", "approx_rank")
    )
