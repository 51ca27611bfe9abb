"""Regression pins for the round-8 ADVICE items.

1. pagerank's adjacency must be MATERIALIZED before the iteration loop
   (a lazy .cache() never filled: no action runs inside the loop, and
   the old pre-return unpersist dropped the blocks before the caller's
   first action) — pinned by checking the returned plan no longer
   contains the adjacency-building join subtree (a checkpoint scan
   replaces it), plus a value check.
2. power_iteration_top_component(iterations=0) must raise a clear
   ValueError, not an opaque TypeError from joining None.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.graph import pagerank
from fred_economic_data_pipeline_local_spark.operators.linalg import (
    power_iteration_top_component,
)


def _edges(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    return spark.createDataFrame(rows, "src string, dst string")


class TestPagerankAdjacencyMaterialized:
    def test_result_plan_reads_checkpoint_not_join(self, spark):
        r = pagerank(_edges(spark), iterations=3)
        plan = r._jdf.queryExecution().optimizedPlan().toString()
        # the links join (edges x outdeg) must have been cut off by the
        # eager checkpoint: the returned lineage sees scans, not the
        # re-derivable adjacency join per iteration
        assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan

    def test_values_unchanged_by_materialization(self, spark):
        got = {
            row["node"]: row["rank"]
            for row in pagerank(_edges(spark), iterations=5).collect()
        }
        # hand-computed invariants: ranks sum to ~1 (strongly-connected
        # core + 1 dangling-free source), node 'a' has the most in-mass
        assert abs(sum(got.values()) - 1.0) < 1e-6
        assert got["a"] == max(got.values())
        assert got["d"] == min(got.values())


class TestPowerIterationGuard:
    def test_zero_iterations_raises_value_error(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="iterations must be >= 1"):
            power_iteration_top_component(emb, dims=2, iterations=0)

    def test_one_iteration_runs(self, spark):
        emb = spark.createDataFrame(
            [(1, [2.0, 0.0]), (2, [-2.0, 0.0]), (3, [0.1, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = power_iteration_top_component(emb, dims=2, iterations=1)
        rows = out.collect()
        assert len(rows) == 2
        loadings = {r["dim"]: r["loading"] for r in rows}
        # variance is entirely along dim 1
        assert abs(abs(loadings[1]) - 1.0) < 1e-6
