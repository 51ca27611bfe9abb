"""Semantics + plan pins for the two-pass exact-rank primitive.

``operators/rank.py`` claims bit-identical semantics to the
single-partition forms it replaces — ``row_number()/ntile(k)/sum()
OVER (ORDER BY ...)`` — while never concentrating the data on one
task. Semantics are pinned here by direct comparison against the
built-in window on the SAME frame (adversarial shapes: ties needing
the tiebreak, n < k, n % k != 0, descending keys, negative sums);
the plan shape is pinned by asserting the range exchange exists and
every row_number window is keyed on __pid.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.rank import (
    exact_ntile,
    ordered_prefix,
)


def _fixture(spark, n, seed=7):
    # many ties on v (v = i % 13) so the unique id tiebreak matters;
    # negative values exercise signed prefix sums
    rows = [(i, (i * seed) % 13 - 4, ((i * 29) % 11) - 3) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, x long").repartition(
        8
    )


@pytest.mark.parametrize("n", [0, 1, 3, 97, 1000])
def test_global_rank_and_prefix_sum_match_builtin_window(spark, n):
    df = _fixture(spark, n)
    got = {
        r.id: (r["__rn"], r["__cum_x"])
        for r in ordered_prefix(
            df, [("v", True), ("id", True)], carry=["id"], sums=["x"]
        ).collect()
    }
    w = W.orderBy("v", "id")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r.id: (r.rn, r.cx)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.sum("x").over(wc).alias("cx"),
        ).collect()
    }
    assert got == want


def test_descending_order_matches_builtin(spark):
    df = _fixture(spark, 500)
    got = {
        r.id: r["__rn"]
        for r in ordered_prefix(
            df, [("v", False), ("id", True)], carry=["id"]
        ).collect()
    }
    w = W.orderBy(F.desc("v"), F.asc("id"))
    want = {
        r.id: r.rn
        for r in df.select(
            "id", F.row_number().over(w).alias("rn")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "n,k", [(1000, 10), (97, 10), (7, 10), (10, 10), (1, 4), (13, 4)]
)
def test_exact_ntile_matches_builtin_ntile(spark, n, k):
    """n % k != 0 (uneven buckets), n < k (one row per bucket), and the
    ties-need-tiebreak shape all bucket exactly like SQL ntile."""
    df = _fixture(spark, n)
    got = {
        r.id: r["__tile"]
        for r in exact_ntile(
            df, k, [("v", True), ("id", True)], carry=["id"]
        ).collect()
    }
    want = {
        r.id: r.t
        for r in df.select(
            "id", F.ntile(k).over(W.orderBy("v", "id")).alias("t")
        ).collect()
    }
    assert got == want


def test_plan_never_ranks_through_a_single_partition(spark):
    """r15 shape: the data shuffles EXACTLY once (hash on the
    deterministic µkey bucket id), every row_number window is
    __pid-keyed, offsets come back as a broadcast — no range exchange,
    no checkpoint (no Scan ExistingRDD), and the only unpartitioned
    window is the offsets walk over the bounded µkey-counts frame
    (ordered by __pid, never carrying data rows)."""
    df = _fixture(spark, 100)
    plan = (
        ordered_prefix(
            df, [("v", True), ("id", True)], carry=["id"], sums=["x"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan
    assert "BroadcastExchange" in plan  # the offsets frame
    data_windows = [
        l for l in plan.splitlines() if "Window [row_number()" in l
    ]
    assert data_windows
    for l in data_windows:
        assert "__pid" in l, l
    for l in plan.splitlines():  # offsets walk: bounded frame only
        if "Window [sum(" in l:
            assert "__pid" in l, l


def test_mu_key_edge_values_match_builtin_window(spark):
    """The µkey quantization's sentinel classes — NULL, NaN, ±inf,
    negatives, zero, subnormals — bucket in Spark's own sort order, so
    ranks and prefix sums stay bit-identical to the built-in window in
    both directions."""
    vals = [
        None, float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
        1e-310, -1e-310, 1.5, -1.5, 3.7e200, -3.7e200, 2.0, 2.0, -2.0,
    ]
    rows = [(i, v, i % 5) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double, x long")
    for asc in (True, False):
        got = {
            r.id: (r["__rn"], r["__cum_x"])
            for r in ordered_prefix(
                df, [("v", asc), ("id", True)], carry=["id"], sums=["x"]
            ).collect()
        }
        w = W.orderBy(F.asc("v") if asc else F.desc("v"), F.asc("id"))
        wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        want = {
            r.id: (r.rn, r.cx)
            for r in df.select(
                "id",
                F.row_number().over(w).alias("rn"),
                F.sum("x").over(wc).alias("cx"),
            ).collect()
        }
        assert got == want, f"asc={asc}"


def test_blocked_rank_and_ntile_match_builtin_partitioned_window(spark):
    """block columns reproduce PARTITION BY semantics: per-block rank
    restart, per-block ntile sizing — against the built-in on the same
    frame, including a 1-row block and an empty-after-filter shape."""
    rows = [
        (i, ["a", "b", "c", "solo"][min(i % 7, 3)], (i * 5) % 13, i % 4)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, g string, v long, x long"
    ).repartition(8)
    got = {
        (r.g, r.id): (r["__rn"], r["__cum_x"])
        for r in ordered_prefix(
            df, [("v", True), ("id", True)], carry=["id"], sums=["x"],
            block=["g"],
        ).collect()
    }
    w = W.partitionBy("g").orderBy("v", "id")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        (r.g, r.id): (r.rn, r.cx)
        for r in df.select(
            "g", "id",
            F.row_number().over(w).alias("rn"),
            F.sum("x").over(wc).alias("cx"),
        ).collect()
    }
    assert got == want
    got_t = {
        (r.g, r.id): r["__tile"]
        for r in exact_ntile(
            df, 4, [("v", True), ("id", True)], carry=["id"], block=["g"]
        ).collect()
    }
    want_t = {
        (r.g, r.id): r.t
        for r in df.select(
            "g", "id", F.ntile(4).over(w).alias("t")
        ).collect()
    }
    assert got_t == want_t
