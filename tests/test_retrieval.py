"""Reciprocal-rank fusion: hand-computed fusion values, absent-leg
handling, determinism of the rank derivation."""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.operators.retrieval import (
    rank_of,
    rrf_fuse,
)


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "id long, rank int")


def test_hand_computed_fusion(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (3, 2), (4, 3)])
    out = {r["id"]: r["rrf_score"] for r in rrf_fuse([a, b], k0=60, k=4).collect()}
    assert out[2] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[1] == pytest.approx(round(1 / 61, 6))
    assert out[3] == pytest.approx(round(1 / 63 + 1 / 62, 6))
    assert out[4] == pytest.approx(round(1 / 63, 6))
    # doc in both legs outranks single-leg docs of comparable rank
    assert out[2] == max(out.values())


def test_absent_leg_is_null_rank(spark):
    a = _ranked(spark, [(1, 1)])
    b = _ranked(spark, [(2, 1)])
    rows = {r["id"]: (r["rank_1"], r["rank_2"]) for r in rrf_fuse([a, b]).collect()}
    assert rows[1] == (1, None)
    assert rows[2] == (None, 1)


def test_rank_of_tiebreak_and_limit(spark):
    scored = spark.createDataFrame(
        [(3, 0.5), (1, 0.5), (2, 0.9), (4, 0.1)], "id long, s double"
    )
    got = {r["id"]: r["rank"] for r in rank_of(scored, "id", "s", 3).collect()}
    # 0.9 first; the 0.5 tie breaks by id ascending; limit drops id 4
    assert got == {2: 1, 1: 2, 3: 3}


def test_single_leg_fusion_is_rank_monotone(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    rows = rrf_fuse([a], k=7).collect()
    ids = [r["id"] for r in rows]
    assert ids == [1, 2, 3, 4, 5, 6, 7]


def test_empty_rankings_raise(spark):
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])
