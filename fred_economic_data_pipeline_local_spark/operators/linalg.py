"""Distributed linear algebra over embedding columns.

Power iteration for the top principal component, and the
"all-but-the-top" embedding post-processing (Mu & Viswanath, ICLR 2018)
that removes it — the standard debias step for anisotropic embedding
spaces before cosine-based retrieval/dedup. The reference has no
numeric operators; this extends the embedding-curation family.

Determinism contract (same discipline as ``operators/graph.pagerank``):
each iteration's component vector is rounded to ``round_dp`` decimals
in BOTH this implementation and the SQL oracle — the only
order-dependent floating-point steps are the per-dimension sums across
rows (error ~1e-13 relative, far below the rounding granularity), so
cross-engine and cross-partitioning runs agree on the rounded values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double, dot


def _mean_vector(c: DataFrame) -> DataFrame:
    """One-row frame with the per-dimension mean (rounded 8 dp) as an
    array column ``ml`` — explode/aggregate, never a driver loop."""
    m = (
        c.select(F.posexplode("e").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.round(F.sum("x") / F.count(F.lit(1)), 8).alias("m")
        )
    )
    return m.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s.m,
        ).alias("ml")
    )


def power_iteration_top_component(
    emb: DataFrame,
    dims: int,
    iterations: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 8,
) -> DataFrame:
    """Top principal component of the (centered) embedding matrix by
    power iteration: v <- normalize(X^T (X v)), ``iterations`` times
    from the uniform start 1/sqrt(dims), each iterate rounded to
    ``round_dp``; the sign is canonicalized so the largest-|.| loading
    is positive (ties to the lowest dimension).

    Plan shape: the matvec X v is one broadcast of the current 1-row
    component against the corpus (a fold per row, no shuffle); the
    X^T s step is a posexplode + per-dimension sum — ``dims`` groups,
    map-side combined, so the one exchange per iteration carries
    O(dims x partitions) partial sums, never the corpus. The component
    stays a 1-row frame end to end (no driver collect in the loop);
    ``localCheckpoint`` truncates per-iteration lineage. At 100 TB the
    corpus is scanned once per iteration — the unavoidable cost of the
    algorithm — and everything else is broadcast-sized.

    Returns ``dims`` rows (dim 1-based, loading, eigenvalue) with the
    eigenvalue estimate (the final pre-normalization norm) rounded 4 dp.
    """
    c = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("e")
    )
    mean = _mean_vector(c)
    cc = (
        c.join(F.broadcast(mean))
        .select(
            "vid", F.zip_with("e", "ml", lambda x, m: x - m).alias("ec")
        )
        .localCheckpoint(eager=True)
    )
    v = cc.sparkSession.range(1).select(
        F.array(*[F.lit(1.0 / dims**0.5) for _ in range(dims)]).alias("vl")
    )
    nrm = None
    for _ in range(iterations):
        s = cc.join(F.broadcast(v)).select(
            "ec", dot(F.col("ec"), F.col("vl")).alias("s")
        )
        w = (
            s.select(F.posexplode("ec").alias("i", "x"), "s")
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("s")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = (
            w.join(F.broadcast(nrm))
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "i",
                                F.round(
                                    F.col("w") / F.col("nrm"), round_dp
                                ).alias("v"),
                            )
                        )
                    ),
                    lambda st: st.v,
                ).alias("vl")
            )
            .localCheckpoint(eager=True)
        )
    # canonical sign: the largest-|loading| dimension reads positive
    out = v.join(F.broadcast(nrm)).select(
        F.posexplode("vl").alias("i", "loading"),
        F.round("nrm", 4).alias("eigenvalue"),
    )
    amax = out.orderBy(F.abs(F.col("loading")).desc(), F.col("i").asc()).limit(
        1
    ).select(
        F.when(F.col("loading") < 0, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("sgn")
    )
    return out.join(F.broadcast(amax)).select(
        (F.col("i") + 1).alias("dim"),
        (F.col("loading") * F.col("sgn")).alias("loading"),
        "eigenvalue",
    )


def remove_top_component(
    emb: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-but-the-top debias: x' = x - (x . v) v per row, with ``v``
    the (dim, loading) frame ``power_iteration_top_component`` returns.
    Broadcast component, one narrow projection — no shuffle. Keeps the
    id column and returns the debiased vector under ``vec_col``."""
    vrow = component.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "loading"))),
            lambda s: s.loading,
        ).alias("vl")
    )
    e = _as_double(F.col(vec_col))
    proj = dot(e, F.col("vl"))
    return emb.join(F.broadcast(vrow)).select(
        F.col(id_col),
        F.zip_with(
            e, F.col("vl"), lambda x, vc: x - proj * vc
        ).alias(vec_col),
    )
