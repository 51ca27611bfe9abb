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
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv")
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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: only candidates in the query's LSH bucket
    are scored. Recall < 1 by construction; the bucket join replaces the
    corpus-wide scan per query with a hash-partitioned equi-join on the
    signature — the 100 TB-scale path.
    """
    c = hyperplane_signatures(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("__cv"),
        ),
        "neighbor_id",
        "__cv",
        planes,
    )
    q = hyperplane_signatures(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("__qv"),
        ),
        "query_id",
        "__qv",
        planes,
    )
    scored = (
        c.join(broadcast(q), on="sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
        .drop("__qv", "__cv", "sig")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )
