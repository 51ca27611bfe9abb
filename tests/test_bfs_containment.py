"""Unit pins for BFS levels and n-gram containment on constructed
inputs (the parity tests cover the DuckDB mirrors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _edges(spark, pairs):
    und = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src long, dst long")


def test_bfs_levels_min_distance_on_a_cycle_with_chord(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import bfs_levels

    # 0-1-2-3-4-5-0 ring plus chord 0-3: node 3 is 1 hop, 4 is 2 hops
    edges = _edges(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 3)]
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = dict(_rows(bfs_levels(edges, seeds, max_depth=3)))
    assert got == {0: 0, 1: 1, 5: 1, 3: 1, 2: 2, 4: 2}


def test_bfs_levels_respects_depth_cap_and_disconnection(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import bfs_levels

    # path 0-1-2-3-4 and island 9-10; cap 2 stops at node 2
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (9, 10)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = dict(_rows(bfs_levels(edges, seeds, max_depth=2)))
    assert got == {0: 0, 1: 1, 2: 2}
    with pytest.raises(ValueError):
        bfs_levels(edges, seeds, max_depth=-1)


def test_bfs_multi_seed_takes_nearest(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import bfs_levels

    edges = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    got = dict(_rows(bfs_levels(edges, seeds, max_depth=3)))
    assert got == {0: 0, 3: 0, 1: 1, 2: 1}


def test_containment_detects_subset_jaccard_misses(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    short = "alpha beta gamma"
    long_ = short + " " + " ".join(f"w{i} w{i}x" for i in range(30))
    df = spark.createDataFrame(
        [(0, short, "s"), (1, long_, "s")],
        "doc_id long, text string, source string",
    )
    [(a, b, c_ab, c_ba)] = _rows(
        ngram_containment_pairs(df, shingle_k=2, threshold=0.9)
    )
    # every 2-gram of the short doc appears in the long doc
    assert (a, b, c_ab) == (0, 1, 1.0)
    assert c_ba < 0.1  # Jaccard-style symmetry would have rejected this


def test_containment_blocks_and_threshold(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    df = spark.createDataFrame(
        [
            (0, "a b c d", "s1"),
            (1, "a b c d e", "s2"),  # would match, but different block
            (2, "x y z", "s1"),  # same block, no overlap
        ],
        "doc_id long, text string, source string",
    )
    assert _rows(ngram_containment_pairs(df, shingle_k=2, threshold=0.5)) == []


def _wedges(spark, triples):
    und = triples + [(b, a, w) for a, b, w in triples]
    return spark.createDataFrame(und, "src long, dst long, w long")


def test_weighted_sssp_prefers_cheap_detour_over_direct_edge(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        weighted_sssp,
    )

    # direct 0-2 costs 10; detour 0-1-2 costs 2+3=5; 2-3 extends to 9
    edges = _wedges(spark, [(0, 2, 10), (0, 1, 2), (1, 2, 3), (2, 3, 4)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = dict(_rows(weighted_sssp(edges, seeds, rounds=4)))
    assert got == {0: 0, 1: 2, 2: 5, 3: 9}


def test_weighted_sssp_hop_bound_truncates_long_cheap_paths(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        weighted_sssp,
    )

    # 2-hop bound: direct 0-2 (10) wins because the cheaper 3-hop
    # chain 0-10-11-2 (1+1+1) exceeds the bound; node 3 rides the
    # direct edge (0-2-3 = 11), node 4 needs 3 hops and is absent
    edges = _wedges(
        spark,
        [(0, 2, 10), (0, 10, 1), (10, 11, 1), (11, 2, 1), (2, 3, 1),
         (3, 4, 1)],
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = dict(_rows(weighted_sssp(edges, seeds, rounds=2)))
    assert got[2] == 10 and got[3] == 11 and got[11] == 2 and 4 not in got


def test_kcore_peel_strips_tail_keeps_triangle(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        kcore_peel,
    )

    # triangle 0-1-2 plus tail 2-3-4: round 1 drops leaf 4, round 2
    # drops 3 (its only surviving neighbor is 2), triangle is stable
    edges = _wedges(
        spark, [(0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1), (3, 4, 1)]
    ).select("src", "dst")
    rows = {r["round"]: r for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (4, 8)
    assert (rows[2]["n_nodes"], rows[2]["n_edges"]) == (3, 6)
    assert (rows[3]["n_nodes"], rows[3]["n_edges"]) == (3, 6)


def test_kcore_peel_empty_core_reports_zero_rounds(spark):
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        kcore_peel,
    )

    # pure path graph has no 2-core: trajectory must reach (0, 0)
    edges = _wedges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)]).select(
        "src", "dst"
    )
    rows = {r["round"]: r for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert (rows[3]["n_nodes"], rows[3]["n_edges"]) == (0, 0)
