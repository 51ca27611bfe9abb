"""Personalized weighted PageRank: seed-concentration semantics,
weight sensitivity, conservation, and input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)


def _edges(spark, weighted=False):
    # a -- b -- c chain plus d -- e island, both directions
    rows = [("a", "b"), ("b", "c"), ("d", "e")]
    if weighted:
        rows = [(s, d, 2.0 if s == "a" else 1.0) for s, d in rows]
        e = spark.createDataFrame(rows, "src string, dst string, w double")
        return e.union(e.select("dst", "src", "w"))
    e = spark.createDataFrame(rows, "src string, dst string")
    return e.union(e.select("dst", "src"))


def _seeds(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_mass_concentrates_near_seeds(spark):
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(
            _edges(spark), _seeds(spark, "a"), iterations=8
        ).collect()
    }
    # the d-e island is unreachable from the seed: zero rank
    assert r["d"] == 0.0 and r["e"] == 0.0
    # proximity ordering from the seed
    assert r["a"] > r["b"] > r["c"] > 0


def test_uniform_seed_set_on_connected_graph_matches_pagerank(spark):
    # seeding EVERY node of a connected graph with uniform restart is
    # exactly standard PageRank (same recursion, same N)
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    tri = tri.union(tri.select("dst", "src"))
    ppr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            tri, _seeds(spark, "a", "b", "c"), iterations=5
        ).collect()
    }
    pr = {
        r["node"]: r["rank"]
        for r in pagerank(tri, iterations=5).collect()
    }
    assert ppr == pr


def test_weights_steer_the_walk(spark):
    # b's out-mass splits a:c by weight 3:1 instead of 1:1
    e = spark.createDataFrame(
        [("b", "a", 3.0), ("b", "c", 1.0), ("a", "b", 1.0), ("c", "b", 1.0)],
        "src string, dst string, w double",
    )
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(
            e, _seeds(spark, "b"), iterations=6, weight_col="w"
        ).collect()
    }
    assert r["a"] > r["c"]


def test_seed_not_in_graph_still_gets_floor(spark):
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(
            _edges(spark), _seeds(spark, "zz"), iterations=3
        ).collect()
    }
    # isolated seed keeps exactly the teleport floor (its rank mass
    # decays through the missing out-edges, the documented PPR form)
    assert r["zz"] == pytest.approx(0.15, abs=1e-8)
    assert all(v == 0.0 for k, v in r.items() if k != "zz")


def test_empty_seed_set_raises(spark):
    with pytest.raises(ValueError, match="empty seed set"):
        personalized_pagerank(
            _edges(spark), _seeds(spark).where(F.lit(False))
        )
