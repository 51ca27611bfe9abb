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


# --- snm_tolerance_components: islands == two-star CC of the SNM graph ---


def _snm_cc_reference(spark, df, tol, window):
    """Definitional reference: SNM candidate pairs -> tolerance match
    edges -> generic two-star contraction (the engine the islands pass
    replaced)."""
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        connected_components_twostar,
    )
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    pairs = sorted_neighborhood_pairs(
        df,
        id_col="id",
        block_col="blk",
        order_by=["bal"],
        window=window,
        carry=["bal"],
    )
    edges = pairs.where(
        F.abs(F.col("bal_b") - F.col("bal_a")) <= F.lit(tol)
    ).select("id_a", "id_b")
    comp = connected_components_twostar(edges)
    return (
        df.select("id")
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("component"),
        )
    )


def test_tolerance_components_match_twostar_on_adversarial_cases(spark):
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        snm_tolerance_components,
    )

    rows = [
        # block 1: a chain 0,40,80,120 (each adjacent gap 40 <= 50, so
        # ONE component although ends differ by 120) + a far singleton
        (10, 1, 0.0),
        (3, 1, 40.0),
        (7, 1, 80.0),
        (1, 1, 120.0),
        (99, 1, 500.0),
        # block 2: exact-boundary gap (50.0 merges; 50.01 breaks)
        (20, 2, 100.0),
        (21, 2, 150.0),
        (22, 2, 200.01),
        # block 3: ties (gap 0) and duplicate balances across a break
        (30, 3, 7.25),
        (31, 3, 7.25),
        (32, 3, 7.25),
        (33, 3, 300.0),
        (34, 3, 300.0),
    ]
    df = spark.createDataFrame(rows, ["id", "blk", "bal"])
    got = snm_tolerance_components(
        df, id_col="id", block_col="blk", order_col="bal", tol=50.0
    )
    ref = _snm_cc_reference(spark, df, tol=50.0, window=3)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    # spot-pin the semantics, not just the equivalence
    lab = {r["id"]: r["component"] for r in got.collect()}
    assert lab[10] == lab[3] == lab[7] == lab[1] == 1  # min id of chain
    assert lab[99] == 99
    assert lab[20] == lab[21] == 20  # 50.0 gap: inclusive merge
    assert lab[22] == 22  # 50.01 gap: break
    assert lab[30] == lab[31] == lab[32] == 30
    assert lab[33] == lab[34] == 33


def test_tolerance_components_match_twostar_on_fixture(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        snm_tolerance_components,
    )

    from .conftest import SF_DIR

    cust = load_table(spark, "customer", SF_DIR).select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("blk"),
        F.col("c_acctbal").alias("bal"),
    )
    got = snm_tolerance_components(
        cust, id_col="id", block_col="blk", order_col="bal", tol=50.0
    )
    ref = _snm_cc_reference(spark, cust, tol=50.0, window=3)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0

def test_tolerance_components_null_nan_keys_are_singletons(spark):
    # ADVICE r12: a NULL/NaN order key has NO edge in the definitional
    # window graph (NULL arithmetic is NULL; NaN - x is NaN, never
    # <= tol), so such rows must come out singletons — the old
    # NULL-compares-falsy break silently fused them into the preceding
    # island. Spark sorts NULLs first and NaNs last, so bad keys never
    # sit between two reals and the islands equivalence is preserved.
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        snm_tolerance_components,
    )

    rows = [
        (1, 1, None),
        (2, 1, None),
        (3, 1, 10.0),
        (4, 1, 20.0),
        (5, 1, float("nan")),
        (6, 1, float("nan")),
        (7, 2, float("nan")),
        (8, 2, 5.0),
    ]
    df = spark.createDataFrame(rows, "id: long, blk: long, bal: double")
    got = snm_tolerance_components(
        df, id_col="id", block_col="blk", order_col="bal", tol=50.0
    )
    ref = _snm_cc_reference(spark, df, tol=50.0, window=3)
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
    lab = {r["id"]: r["component"] for r in got.collect()}
    assert lab[3] == lab[4] == 3       # the only real edge
    for single in (1, 2, 5, 6, 7, 8):
        assert lab[single] == single, (single, lab)
