"""Mann-Kendall and Theil-Sen pinned against hand-computed values:
monotone series, constant series (the var=0 edge), and outlier
robustness vs OLS."""

from __future__ import annotations

import math

import pytest


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _series(spark, xs):
    return spark.createDataFrame(
        [("s", i, float(x)) for i, x in enumerate(xs)],
        "k string, t long, v double",
    )


def test_mk_strictly_increasing(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import mann_kendall

    n = 10
    df = _series(spark, range(n))
    [(_, np, s, z)] = _rows(mann_kendall(df, "k", ["t"], "v"))
    assert (np, s) == (n, n * (n - 1) // 2)
    want = (s - 1) / math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
    assert z == pytest.approx(want, abs=1e-6)


def test_mk_constant_series_is_zero_without_div_by_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import mann_kendall

    df = _series(spark, [5] * 8)
    [(_, np, s, z)] = _rows(mann_kendall(df, "k", ["t"], "v"))
    # all ties: S = 0 and Var(S) = 0 — the S = 0 branch returns exact 0
    assert (np, s, z) == (8, 0, 0.0)


def test_mk_decreasing_is_negative_symmetric(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import mann_kendall

    up = _rows(mann_kendall(_series(spark, range(9)), "k", ["t"], "v"))[0]
    dn = _rows(
        mann_kendall(_series(spark, range(8, -1, -1)), "k", ["t"], "v")
    )[0]
    assert dn[2] == -up[2]
    assert dn[3] == pytest.approx(-up[3], abs=1e-6)


def test_theil_sen_exact_on_linear_and_robust_to_outlier(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import (
        theil_sen_slope,
    )

    # pure line slope 2: every pairwise slope is 2
    [(_, n_pairs, slope)] = _rows(
        theil_sen_slope(_series(spark, [2 * i for i in range(10)]), "k", ["t"], "v")
    )
    assert (n_pairs, slope) == (45, 2.0)
    # one wild outlier: the median pairwise slope stays 2 (OLS would not)
    xs = [2 * i for i in range(11)]
    xs[5] = 1000
    [(_, _, slope2)] = _rows(
        theil_sen_slope(_series(spark, xs), "k", ["t"], "v")
    )
    assert slope2 == 2.0
