"""Fellegi-Sunter record linkage: scoring, decisions, blocking shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.linkage import (
    FSFeature,
    fs_score_pairs,
)


def _feats():
    return [
        FSFeature("seg", lambda lc, rc: lc("seg") == rc("seg"), 0.9, 0.2),
        FSFeature(
            "bal",
            lambda lc, rc: F.abs(lc("bal") - rc("bal")) <= 50.0,
            0.8,
            0.05,
        ),
    ]


def _df(spark):
    rows = [
        # block 1: two near-identical records + one distant one
        (1, 1, "A", 100.0),
        (2, 1, "A", 120.0),
        (3, 1, "B", 900.0),
        # block 2: a single record -> no pairs
        (4, 2, "A", 100.0),
    ]
    return spark.createDataFrame(rows, ["id", "blk", "seg", "bal"])


def test_pairs_within_block_only_and_no_self_pairs(spark):
    out = fs_score_pairs(_df(spark), "id", "blk", _feats(), 4.0, 0.0)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}  # block 2 contributes none
    assert all(a < b for a, b in pairs)


def test_scores_are_exact_log_odds_sums(spark):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in fs_score_pairs(
            _df(spark), "id", "blk", _feats(), 4.0, 0.0
        ).collect()
    }
    # note: weights must come from the SAME float expressions the
    # operator uses — math.log(0.1/0.8) differs from
    # math.log((1.0-0.9)/(1.0-0.2)) by an ulp (1.0-0.9 != 0.1)
    f_seg, f_bal = _feats()
    w_seg = (f_seg.w_agree, f_seg.w_disagree)
    w_bal = (f_bal.w_agree, f_bal.w_disagree)
    assert out[(1, 2)]["score"] == w_seg[0] + w_bal[0]
    assert out[(1, 2)]["decision"] == "match"
    assert out[(1, 3)]["score"] == w_seg[1] + w_bal[1]
    assert out[(1, 3)]["decision"] == "non_match"
    # 2-3: seg disagrees, bal disagrees -> non_match too
    assert out[(2, 3)]["decision"] == "non_match"


def test_possible_band_between_thresholds(spark):
    rows = [(1, 1, "A", 100.0), (2, 1, "B", 110.0)]  # bal agrees only
    df = spark.createDataFrame(rows, ["id", "blk", "seg", "bal"])
    r = fs_score_pairs(df, "id", "blk", _feats(), 4.0, 0.5).collect()[0]
    assert r["decision"] == "possible"
    assert r["agree_bal"] and not r["agree_seg"]


def test_blocking_join_is_equi_not_nested_loop(spark):
    out = fs_score_pairs(_df(spark), "id", "blk", _feats(), 4.0, 0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
