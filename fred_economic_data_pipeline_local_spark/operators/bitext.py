"""Margin-based parallel-pair mining over embedding columns — the
standard recipe for mining aligned text pairs (translation pairs,
paraphrases, caption/image matches) from two large unaligned corpora
embedded in a shared space (Artetxe & Schwenk, "Margin-based Parallel
Corpus Mining with Multilingual Sentence Embeddings", ACL 2019; the
CCMatrix/LASER mining pipeline).

Raw cosine is a poor mining score because some embeddings sit in dense
neighborhoods where EVERYTHING scores high (hubness). The margin score
divides each pair's cosine by the mean cosine of the two sides' own
k-NN neighborhoods:

    margin(x, y) = cos(x, y) / (avgNN_k(x)/2 + avgNN_k(y)/2)

so a pair only mines well if it stands out ABOVE its neighborhoods'
background similarity. Pairs are mined forward (best target per source
by margin) and gated by a threshold; margin > 1 means "closer than the
average of the k nearest neighbors".

Scale shape: the pair table is the whole cost. The default builds it as
scan(side_b) x broadcast(side_a) — exact, one pass over the bigger
side, right while one side is broadcastable. For two 100 TB sides,
inject ``pairs`` from an ANN candidate source (the IVF/PQ/LSH operators
in ``operators.similarity`` produce exactly the (a_id, b_id, cos_sim)
shape) — the margin math downstream is identical and touches only
candidate pairs. Neighborhood averages are then computed over the SAME
candidate set, which is the approximation every production miner makes
(x's k-NN list comes from the same ANN index that proposed the pairs).

All ranking follows the repo-wide float discipline, hardened (round 11)
to EXACT INTEGER MICRO-UNITS: each pair cosine is fixed to an integer
``cos_u = floor(cos * 1e6 + 0.5)`` (identical double arithmetic in both
engines — engine round() differs on .5e-6 edges), neighborhood
background is carried as integer (sum_u, count) pairs, and the margin
is ONE double division of exact integers
``2 * ca * cb * cos_u / (sa * cb + sb * ca)`` — algebraically equal to
cos / (avg_a/2 + avg_b/2) but with no order-sensitive float averaging
anywhere (a float avg of the top-k cosines differed by 1 ulp between
engines at sf0.1 and flipped a 6-dp rounding edge). Id tiebreaks on
every ranking; the DuckDB oracle reproduces every row by value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .similarity import _as_double, dot, l2_norm


def margin_pairs(
    side_a: DataFrame,
    side_b: DataFrame,
    k_nn: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Mine (a_id, b_id, cos_sim, margin) pairs, one best-by-margin
    target per source, gated by ``margin >= threshold``.

    ``pairs`` injects a candidate table (a_id, b_id, cos_sim) from an
    ANN source for corpora too large to score exhaustively; by default
    ``side_a`` is broadcast against one scan of ``side_b``.
    """
    if pairs is None:
        # per-side norms once per row (association identical to
        # cosine()'s folds, which the oracle mirrors) — one fold per
        # pair in the broadcast kernel instead of three
        a = side_a.select(
            F.col(id_col).alias("a_id"), _as_double(F.col(vec_col)).alias("__av")
        ).withColumn("__an", l2_norm(F.col("__av")))
        b = side_b.select(
            F.col(id_col).alias("b_id"), _as_double(F.col(vec_col)).alias("__bv")
        ).withColumn("__bn", l2_norm(F.col("__bv")))
        pairs = (
            b.join(broadcast(a))
            .withColumn(
                "cos_sim",
                dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn")),
            )
            .select("a_id", "b_id", "cos_sim")
        )

    # fix the pair cosine to integer micro-units once; every downstream
    # quantity is integer arithmetic + one exact-input double division
    pairs = pairs.withColumn(
        "__cos_u",
        F.floor(F.col("cos_sim") * 1_000_000 + F.lit(0.5)).cast("long"),
    ).withColumn("cos_sim", F.col("__cos_u") / 1_000_000.0)

    # neighborhood background similarity per element, each side: the
    # k best cosines (over the same pair/candidate set), carried as
    # exact (sum_u, count) integers — never a float average.
    # Window-rank -> filter -> tiny per-element aggregate; the joins
    # back onto the pair table are equi-joins on the pair's own keys.
    w_a = Window.partitionBy("a_id").orderBy(F.desc("__cos_u"), F.asc("b_id"))
    w_b = Window.partitionBy("b_id").orderBy(F.desc("__cos_u"), F.asc("a_id"))
    nn_a = (
        pairs.withColumn("__rn", F.row_number().over(w_a))
        .where(F.col("__rn") <= k_nn)
        .groupBy("a_id")
        .agg(
            F.sum("__cos_u").alias("__sa"),
            F.count(F.lit(1)).alias("__ca"),
        )
    )
    nn_b = (
        pairs.withColumn("__rn", F.row_number().over(w_b))
        .where(F.col("__rn") <= k_nn)
        .groupBy("b_id")
        .agg(
            F.sum("__cos_u").alias("__sb"),
            F.count(F.lit(1)).alias("__cb"),
        )
    )
    # margin = cos / (avg_a/2 + avg_b/2) == 2*ca*cb*cos_u /
    # (sa*cb + sb*ca): one double division of exact integers, then the
    # engine-identical half-up fix to 6 dp
    margin_raw = (
        (F.lit(2) * F.col("__ca") * F.col("__cb") * F.col("__cos_u"))
        .cast("double")
        / (F.col("__sa") * F.col("__cb") + F.col("__sb") * F.col("__ca"))
        .cast("double")
    )
    scored = (
        pairs.join(nn_a, "a_id")
        .join(nn_b, "b_id")
        .withColumn(
            "margin",
            F.floor(margin_raw * 1_000_000 + F.lit(0.5)) / 1_000_000.0,
        )
    )
    w_fwd = Window.partitionBy("a_id").orderBy(F.desc("margin"), F.asc("b_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w_fwd))
        .where((F.col("__rn") == 1) & (F.col("margin") >= threshold))
        .select("a_id", "b_id", "cos_sim", "margin")
    )
