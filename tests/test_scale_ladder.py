"""Scale-factor ladder for the iterative dedup operators.

Pins the two properties that make the fixpoint safe at 100 TB and that
no single-sf test can show:

- convergence stays O(cluster diameter), NOT O(corpus): the real
  near-dup graphs at sf0.001/0.01/0.1 are clique-like, so min-label
  propagation must finish in <= 4 rounds at EVERY rung of the ladder
  (rounds growing with sf would mean the loop scales with data size);
- the per-round state partitioning derives from the EDGE data, not from
  ``spark.sql.shuffle.partitions`` — inheriting a wide static conf would
  turn each tiny round into a storm of near-empty tasks on a cluster.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.dedup import (
    neardup_components,
    ngram_jaccard_pairs,
    resolve_neardups,
)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize(
    "sf_dir", [d for d in SF_DIRS if os.path.isdir(d) or os.path.exists(d)]
)
def test_components_converge_within_four_rounds_at_every_sf(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)
    stats: dict = {}
    comp = neardup_components(pairs, stats=stats)
    n_nodes = comp.count()
    n_components = comp.select("component").distinct().count()
    assert n_nodes > 0, f"degenerate ladder rung: no near-dup pairs at {sf_dir}"
    # O(diameter), independent of corpus size (includes the final
    # verifying zero-change round)
    assert stats["rounds"] <= 4, (sf_dir, stats)
    # resolve keeps exactly one representative per component:
    # survivors = corpus - (nodes in the pair graph - components)
    resolved = resolve_neardups(docs, pairs)
    assert resolved.count() == docs.count() - (n_nodes - n_components)
    # the representative is the min id of its component
    bad = (
        resolved.groupBy("component")
        .agg(F.min("doc_id").alias("m"), F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > 1) | (F.col("m") != F.col("component")))
        .count()
    )
    # components are labeled by min reachable id, so the kept row's id
    # IS the component label, one row per component
    assert bad == 0


def test_round_partitions_follow_edges_not_shuffle_conf(spark):
    """Edge table repartitioned to 40 while the session conf says 4:
    the per-round state must size off the edges (40//4=10), proving the
    loop ignores the static shuffle conf in both directions."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 2)], "id_a long, id_b long"
    ).repartition(40)
    stats: dict = {}
    neardup_components(pairs, stats=stats).count()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert stats["n_parts"] == 10  # max(1, 40 // 4), not conf-derived


def test_round_partitions_floor_at_one(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long").coalesce(1)
    stats: dict = {}
    neardup_components(pairs, stats=stats).count()
    assert stats["n_parts"] == 1
