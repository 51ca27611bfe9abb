"""Unit pins for operators/series.py (EWMA, ACF) and the 2-D skyline —
math checked against sequential pure-Python references; the skyline's
partition-local prune checked for exactness against brute-force
dominance."""

from __future__ import annotations

import math
import random

import pytest


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- ewma_last ----------------------------------------------------------------


def _py_ewma(xs, alpha):
    y = xs[0]
    for x in xs[1:]:
        y = alpha * x + (1 - alpha) * y
    return y


def test_ewma_matches_sequential_recursion(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import ewma_last

    rng = random.Random(11)
    xs = [round(rng.uniform(0, 100), 2) for _ in range(50)]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k long, t long, v double"
    )
    [(_, n, ewma)] = _rows(ewma_last(df, "k", ["t"], "v", alpha=0.3))
    assert n == 50
    assert ewma == pytest.approx(_py_ewma(xs, 0.3), abs=1e-6)


def test_ewma_single_observation_is_identity(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import ewma_last

    df = spark.createDataFrame([(1, 0, 42.5)], "k long, t long, v double")
    [(_, n, ewma)] = _rows(ewma_last(df, "k", ["t"], "v"))
    assert (n, ewma) == (1, 42.5)


def test_ewma_excludes_nulls_and_validates_alpha(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import ewma_last

    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, None), (1, 2, 20.0)], "k long, t long, v double"
    )
    [(_, n, ewma)] = _rows(ewma_last(df, "k", ["t"], "v", alpha=0.5))
    assert n == 2
    assert ewma == pytest.approx(0.5 * 20.0 + 0.5 * 10.0, abs=1e-6)
    with pytest.raises(ValueError):
        ewma_last(df, "k", ["t"], "v", alpha=1.0)


# --- acf_lags -------------------------------------------------------------------


def _py_corr(xs, ys):
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    return num / den


def test_acf_matches_pure_python(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import acf_lags

    rng = random.Random(5)
    xs = [round(rng.uniform(0, 10), 2) for _ in range(30)]
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "k string, t long, v double"
    )
    got = {lag: (n, a) for _, lag, n, a in _rows(acf_lags(df, "k", ["t"], "v", 2))}
    for lag in (1, 2):
        want = _py_corr(xs[:-lag], xs[lag:])
        assert got[lag][0] == 30 - lag
        assert got[lag][1] == pytest.approx(want, abs=1e-6)


def test_acf_alternating_series_lag_parity(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import acf_lags

    xs = [float(i % 2) for i in range(40)]
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "k string, t long, v double"
    )
    got = {lag: a for _, lag, _, a in _rows(acf_lags(df, "k", ["t"], "v", 2))}
    assert got[1] == pytest.approx(-1.0, abs=1e-6)
    assert got[2] == pytest.approx(1.0, abs=1e-6)


def test_acf_rejects_bad_lag(spark):
    from fred_economic_data_pipeline_local_spark.operators.series import acf_lags

    df = spark.createDataFrame([("s", 0, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        acf_lags(df, "k", ["t"], "v", 0)


# --- pareto_frontier_2d -----------------------------------------------------------


def _py_skyline(pts):
    out = set()
    for p in set(pts):
        dominated = any(
            q[0] >= p[0]
            and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.add(p)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_skyline_matches_bruteforce(spark, seed):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        pareto_frontier_2d,
    )

    rng = random.Random(seed)
    pts = [
        (float(rng.randint(0, 30)), float(rng.randint(0, 30)))
        for _ in range(300)
    ]
    # repartition wide so the local-prune stage actually runs multi-partition
    df = spark.createDataFrame(pts, "x double, y double").repartition(8)
    got = set(_rows(pareto_frontier_2d(df, "x", "y")))
    assert got == _py_skyline(pts)


def test_skyline_keeps_duplicate_frontier_points_once(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        pareto_frontier_2d,
    )

    # (5,5) duplicated: neither copy dominates the other; the frontier
    # frame is (x, y)-distinct and the caller's join-back recovers both
    pts = [(5.0, 5.0), (5.0, 5.0), (4.0, 6.0), (4.0, 4.0), (6.0, 1.0)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = sorted(_rows(pareto_frontier_2d(df, "x", "y")))
    assert got == [(4.0, 6.0), (5.0, 5.0), (6.0, 1.0)]
