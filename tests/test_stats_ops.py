"""Unit pins for operators/stats.py against closed-form expectations and
pure-Python references (the parity tests cover the DuckDB mirror; these
pin the MATH on constructed inputs where the right answer is known)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- rank_auc ----------------------------------------------------------------


def _py_auc(pairs):
    """Midrank AUC of [(score, is_pos)] — the textbook Mann-Whitney form."""
    s = sorted(pairs)
    out = []
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j][0] == s[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        out.extend((mid, pos) for _, pos in s[i:j])
        i = j
    n_pos = sum(p for _, p in out)
    n_neg = len(out) - n_pos
    rank_pos = sum(m for m, p in out if p)
    return (rank_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_perfect_separation_is_one(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import rank_auc

    df = spark.createDataFrame(
        [("g", float(i), i >= 5) for i in range(10)], "g string, s double, y boolean"
    )
    [(g, n_pos, n_neg, auc)] = _rows(rank_auc(df, "g", "s", F.col("y")))
    assert (n_pos, n_neg, auc) == (5, 5, 1.0)


def test_auc_matches_pure_python_with_ties(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import rank_auc

    import random

    rng = random.Random(7)
    pairs = [(float(rng.randint(0, 5)), rng.random() < 0.4) for _ in range(200)]
    df = spark.createDataFrame(
        [("g", s, y) for s, y in pairs], "g string, s double, y boolean"
    )
    [(_, _, _, auc)] = _rows(rank_auc(df, "g", "s", F.col("y")))
    assert auc == pytest.approx(_py_auc(pairs), abs=1e-6)


def test_auc_drops_single_class_groups(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import rank_auc

    df = spark.createDataFrame(
        [("a", 1.0, True), ("a", 2.0, True), ("b", 1.0, True), ("b", 2.0, False)],
        "g string, s double, y boolean",
    )
    got = _rows(rank_auc(df, "g", "s", F.col("y")))
    assert [g for g, *_ in got] == ["b"]


# --- chi2_independence --------------------------------------------------------


def test_chi2_independent_table_is_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        chi2_independence,
    )

    # perfectly proportional 2x2 -> expected == observed everywhere
    rows = (
        [("x", "p")] * 20 + [("x", "q")] * 10 + [("y", "p")] * 40 + [("y", "q")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = _rows(chi2_independence(df, "a", "b"))
    assert len(got) == 4
    for _, _, n_obs, expected, contrib, chi2_total, dof in got:
        assert contrib == 0.0
        assert chi2_total == 0.0
        assert dof == 1
        assert expected == float(n_obs)


def test_chi2_known_2x2(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        chi2_independence,
    )

    # classic 2x2: [[10, 20], [30, 5]] -> chi2 = N*(ad-bc)^2/(r1*r2*c1*c2)
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 30 + [("y", "q")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    n, a, b, c, d = 65, 10, 20, 30, 5
    want = n * (a * d - b * c) ** 2 / (30 * 35 * 40 * 25)
    [(chi2_total,)] = _rows(
        chi2_independence(df, "a", "b").select("chi2_total").distinct()
    )
    assert chi2_total == pytest.approx(want, abs=1e-6)


# --- benford_first_digit --------------------------------------------------------


def test_benford_digit_extraction_and_shares(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import (
        BENFORD_SHARES,
        benford_first_digit,
    )

    # 9.99 floors to 9; 0.5 filtered; digit = leading decimal digit
    vals = [1.2, 19.0, 123.4, 2.0, 250.0, 9.99, 0.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {d: (n, obs) for d, n, obs, _, _ in _rows(benford_first_digit(df, "v"))}
    assert got[1] == (3, round(3 / 6, 6))
    assert got[2] == (2, round(2 / 6, 6))
    assert got[9] == (1, round(1 / 6, 6))
    full = {r[0]: r for r in _rows(benford_first_digit(df, "v"))}
    assert full[1][3] == round(BENFORD_SHARES[1], 6)
    # contrib = N * (obs - exp)^2 / exp
    want = 6 * (3 / 6 - BENFORD_SHARES[1]) ** 2 / BENFORD_SHARES[1]
    assert full[1][4] == pytest.approx(want, abs=1e-6)


# --- gini_by_group --------------------------------------------------------------


def test_gini_equal_values_is_zero(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import gini_by_group

    df = spark.createDataFrame(
        [("g", i, 10.0) for i in range(8)], "g string, e long, v double"
    )
    [(_, n, total, gini)] = _rows(gini_by_group(df, "g", "e", "v"))
    assert (n, total, gini) == (8, 80.0, 0.0)


def test_gini_full_concentration(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import gini_by_group

    # one entity holds everything -> G = (n-1)/n
    df = spark.createDataFrame(
        [("g", 0, 100.0)] + [("g", i, 0.0) for i in range(1, 5)],
        "g string, e long, v double",
    )
    [(_, n, total, gini)] = _rows(gini_by_group(df, "g", "e", "v"))
    assert n == 5
    assert gini == pytest.approx((5 - 1) / 5, abs=1e-6)


def test_gini_sums_entity_rows_before_ranking(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import gini_by_group

    # two rows per entity must collapse first; [1, 3] -> G = 0.25
    df = spark.createDataFrame(
        [("g", 0, 0.5), ("g", 0, 0.5), ("g", 1, 2.0), ("g", 1, 1.0)],
        "g string, e long, v double",
    )
    [(_, n, total, gini)] = _rows(gini_by_group(df, "g", "e", "v"))
    assert (n, total) == (2, 4.0)
    assert gini == pytest.approx(0.25, abs=1e-6)


# --- spearman_corr ---------------------------------------------------------------


def test_spearman_monotone_is_one(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [("g", float(i), math.exp(i)) for i in range(20)],
        "g string, x double, y double",
    )
    [(_, n, rho)] = _rows(spearman_corr(df, "g", "x", "y"))
    assert (n, rho) == (20, 1.0)


def test_spearman_reversed_is_minus_one(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [("g", float(i), float(-i)) for i in range(10)],
        "g string, x double, y double",
    )
    [(_, _, rho)] = _rows(spearman_corr(df, "g", "x", "y"))
    assert rho == -1.0


def test_spearman_ties_match_scipy_formula(spark):
    from fred_economic_data_pipeline_local_spark.operators.stats import spearman_corr

    import random

    rng = random.Random(3)
    xs = [float(rng.randint(0, 4)) for _ in range(60)]
    ys = [float(rng.randint(0, 4)) for _ in range(60)]

    def midranks(vs):
        order = sorted(range(len(vs)), key=lambda i: vs[i])
        r = [0.0] * len(vs)
        i = 0
        while i < len(vs):
            j = i
            while j < len(vs) and vs[order[j]] == vs[order[i]]:
                j += 1
            for k in range(i, j):
                r[order[k]] = (i + 1 + j) / 2.0
            i = j
        return r

    rx, ry = midranks(xs), midranks(ys)
    mx, my = sum(rx) / len(rx), sum(ry) / len(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    want = num / den
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    [(_, _, rho)] = _rows(spearman_corr(df, "g", "x", "y"))
    assert rho == pytest.approx(want, abs=1e-6)
