"""Bit-identity pin for the Arrow per-bucket cosine kernel.

``bucket_cosine_pairs`` claims its numpy per-DIMENSION sequential
accumulation reproduces the JVM ``F.aggregate`` fold's IEEE rounding
exactly (same op order, correctly-rounded doubles). The oracle-parity
suite proves it end-to-end against DuckDB; this pins it DIRECTLY
against the Catalyst expression it replaced, on adversarial vectors —
random magnitudes across 12 orders, exact ties, a zero-norm vector
(NaN cosine on both paths), denormal-scale components — so a kernel
regression (e.g. someone 'optimizing' to np.dot, whose pairwise
summation reorders the adds) fails here, with the cause named, not in
a value-hash three layers up.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.similarity import (
    bucket_cosine_pairs,
    dot,
    l2_norm,
)


def _jvm_scored(spark, rows, dims):
    df = spark.createDataFrame(rows, "b: long, id: long, v: array<double>")
    a = df.select(
        "b",
        F.col("id").alias("src"),
        F.col("v").alias("va"),
        l2_norm(F.col("v")).alias("na"),
    )
    bb = df.select(
        "b",
        F.col("id").alias("dst"),
        F.col("v").alias("vb"),
        l2_norm(F.col("v")).alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(bb, "b")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", cos.alias("__cos"))
    )


def test_kernel_bit_identical_to_jvm_fold(spark):
    rng = np.random.default_rng(42)
    rows = []
    dims = 17  # odd, non-power-of-2
    for b in range(4):
        m = [3, 9, 1, 40][b]
        for i in range(m):
            v = rng.normal(size=dims) * (10.0 ** rng.integers(-6, 6))
            rows.append((b, b * 1000 + i, [float(x) for x in v]))
    # adversarial: exact duplicates (cos must be exactly 1.0-ish fold),
    # a zero vector (0/0 -> NaN on BOTH paths), denormal-scale values
    rows.append((0, 900, rows[0][2]))
    rows.append((1, 901, [0.0] * dims))
    rows.append((1, 902, [5e-324 * (i + 1) for i in range(dims)]))
    # non-finite inputs: a NaN component poisons every cosine it
    # touches to NaN (NOT NULL — only den==0 is NULL), and a vector
    # whose squared norm overflows to inf gives den=inf: cos is 0.0
    # against a finite partner, NaN (inf/inf) against another
    # overflowing one — all propagated identically by the JVM fold
    rows.append((2, 903, [float("nan")] + [1.0] * (dims - 1)))
    rows.append((2, 904, [1e300] * dims))
    rows.append((2, 905, [-1e300] * dims))

    df = spark.createDataFrame(rows, "b: long, id: long, v: array<double>")
    got = {
        (r.src, r.dst): r["__cos"]
        for r in bucket_cosine_pairs(df, ["b"], id_col="id", vec_col="v").collect()
    }
    want = {
        (r.src, r.dst): r["__cos"] for r in _jvm_scored(spark, rows, dims).collect()
    }
    assert set(got) == set(want)
    # the fixture must exercise ALL THREE outcome classes, or the
    # NaN/NULL branches below silently stop testing anything
    assert any(w is None for w in want.values())
    assert any(
        isinstance(w, float) and np.isnan(w) for w in want.values()
    )
    assert any(isinstance(w, float) and not np.isnan(w) for w in want.values())
    for k in want:
        g, w = got[k], want[k]
        if w is None:
            # SQL double x/0 is NULL on both Spark and DuckDB (probed);
            # the kernel masks zero denominators to NULL to match
            assert g is None, (k, g, w)
        elif isinstance(w, float) and np.isnan(w):
            # reachable: bucket 2's NaN-component and inf-norm vectors
            # (the 5e-324 denormals underflow to den==0 -> NULL instead)
            assert g is not None and np.isnan(g), (k, g, w)
        else:
            # BIT identity, not approx: the kernel's whole claim
            assert np.float64(g).tobytes() == np.float64(w).tobytes(), (
                k, g.hex(), w.hex(),
            )
