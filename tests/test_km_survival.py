"""Kaplan-Meier estimator pinned against hand-computed product-limit
values, including the censoring correction and the d == n endpoint."""

from __future__ import annotations

import pytest


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _km(spark, rows):
    from fred_economic_data_pipeline_local_spark.operators.stats import km_survival

    df = spark.createDataFrame(rows, "dur double, cens boolean")
    return sorted(_rows(km_survival(df, "dur", "cens")))


def test_km_textbook_example_with_censoring(spark):
    # classic: events at 1, 3; censored at 2. n=4
    # t=1: n=4, d=1 -> S = 3/4
    # t=2: censored only (no row emitted), risk set shrinks to 2
    # t=3: n=2, d=1 -> S = 3/4 * 1/2 = 3/8
    rows = [(1.0, False), (2.0, True), (3.0, False), (5.0, True)]
    got = _km(spark, rows)
    assert got == [
        (1.0, 4, 1, pytest.approx(0.75, abs=1e-6)),
        (3.0, 2, 1, pytest.approx(0.375, abs=1e-6)),
    ]


def test_km_no_censoring_equals_empirical_survival(spark):
    # without censoring KM == 1 - ECDF at each event time
    rows = [(float(t), False) for t in [1, 1, 2, 3, 3, 3, 4, 5]]
    got = {t: s for t, _, _, s in _km(spark, rows)}
    n = 8
    alive = n
    for t in [1, 2, 3, 4, 5]:
        d = [r[0] for r in rows].count(float(t))
        alive -= d
        assert got[float(t)] == pytest.approx(alive / n, abs=1e-6)


def test_km_everyone_exits_at_last_time_hits_exact_zero(spark):
    rows = [(1.0, False), (2.0, False), (2.0, False)]
    got = _km(spark, rows)
    # t=2: d=2, n=2 -> survival exactly 0.0 (flag path, never ln(0))
    assert got[-1] == (2.0, 2, 2, 0.0)


def test_km_censored_only_durations_still_shrink_risk_set(spark):
    # censored exits between event times reduce n for LATER events
    rows = [(1.0, False), (1.5, True), (1.6, True), (3.0, False)]
    got = _km(spark, rows)
    # t=3: only 1 at risk (two censored left) -> S = 0.75 * 0 -> 0.0
    assert got[0] == (1.0, 4, 1, pytest.approx(0.75, abs=1e-6))
    assert got[1] == (3.0, 1, 1, 0.0)
