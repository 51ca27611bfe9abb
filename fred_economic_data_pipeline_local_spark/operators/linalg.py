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
    if iterations < 1:
        # iterations=0 would leave the norm frame unbuilt and surface
        # as an opaque TypeError at the final join (ADVICE r8)
        raise ValueError("power_iteration_top_component: iterations must be >= 1")
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


def gram_pca_components(
    emb: DataFrame,
    dims: int,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 8,
) -> DataFrame:
    """Top-``k`` principal components via the distributed Gram matrix —
    the classic tall-skinny PCA: each Arrow batch contributes its local
    ``X^T X`` (one numpy GEMM per batch, the only Python in the plan,
    Arrow-batched via ``mapInPandas``), the d x d partials are summed
    elementwise in one map-combined exchange of O(d^2 x partitions)
    values (the corpus never shuffles), and the d x d result — O(d^2)
    bounded driver state, like the touched-bucket collects — is
    eigendecomposed locally with ``numpy.linalg.eigh``. For d = 64
    that is a 4,096-double collect; at 100 TB the corpus cost is ONE
    scan, which is why Gram-PCA beats iterating power iteration k
    times when k > 1 and d^2 fits on the driver.

    Embeddings are centered with the 8-dp-rounded mean (same contract
    as ``power_iteration_top_component``); loadings are rounded to
    ``round_dp`` and sign-canonicalized (largest-|loading| dimension
    positive, ties to the lowest dimension), so downstream projections
    consume engine-portable doubles.

    Returns ``dims`` rows: (dim 1-based, m = rounded per-dim mean,
    c1..ck = rounded loadings, eig1..eigk = 4-dp eigenvalues).
    """
    import numpy as np
    import pandas as pd

    c = emb.select(_as_double(F.col(vec_col)).alias("e"))
    mean = _mean_vector(c)
    cc = c.join(F.broadcast(mean)).select(
        F.zip_with("e", "ml", lambda x, m: x - m).alias("ec"), "ml"
    )

    def _gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["ec"]]
            )
            yield pd.DataFrame({"g": [(x.T @ x).ravel().tolist()]})

    partials = cc.select("ec").mapInPandas(
        _gram_partials, schema="g array<double>"
    )
    sums = (
        partials.select(F.posexplode("g").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    gram = np.zeros((dims, dims))
    for r in sums:
        gram[r["i"] // dims, r["i"] % dims] = r["s"]
    eigval, eigvec = np.linalg.eigh(gram)
    order = np.argsort(eigval)[::-1][:k]
    comps, eigs = [], []
    for j in order:
        v = eigvec[:, j]
        amax = np.lexsort((np.arange(dims), -np.abs(v)))[0]
        if v[amax] < 0:
            v = -v
        comps.append(np.round(v, round_dp))
        eigs.append(round(float(eigval[j]), 4))
    ml = [round(float(x), 8) for x in _collect_mean(mean)]
    rows = [
        (
            d + 1,
            ml[d],
            *[float(comps[j][d]) for j in range(k)],
            *eigs,
        )
        for d in range(dims)
    ]
    cols = (
        ["dim", "m"]
        + [f"c{j + 1}" for j in range(k)]
        + [f"eig{j + 1}" for j in range(k)]
    )
    return emb.sparkSession.createDataFrame(rows, cols)


def _collect_mean(mean: DataFrame) -> list[float]:
    """The 1-row mean frame's array — O(dims) driver state."""
    return list(mean.collect()[0]["ml"])


def project_onto_components(
    emb: DataFrame,
    components: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Project each embedding onto the (dim, m, c1..ck) component frame
    ``gram_pca_components`` returns: p_j = sum_i (x_i - m_i) * c_j[i].
    Components aggregate to one broadcast row of arrays; the projection
    is a narrow per-row fold — no shuffle at all."""
    aggs = [
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.m
        ).alias("ml")
    ] + [
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", f"c{j + 1}"))),
            lambda s: s[f"c{j + 1}"],
        ).alias(f"cl{j + 1}")
        for j in range(k)
    ]
    crow = components.agg(*aggs)
    e = _as_double(F.col(vec_col))
    centered = F.zip_with(e, F.col("ml"), lambda x, m: x - m)
    return emb.join(F.broadcast(crow)).select(
        F.col(id_col),
        *[
            F.round(dot(centered, F.col(f"cl{j + 1}")), round_dp).alias(
                f"p{j + 1}"
            )
            for j in range(k)
        ],
    )
