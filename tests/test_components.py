"""Connected-components (min-label propagation) semantics on known graphs."""

from __future__ import annotations

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    neardup_components,
)


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = neardup_components(df)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1 forces multiple propagation rounds
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_cliques(spark):
    got = _components(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_singleton_free_output(spark):
    # only nodes that appear in pairs are labeled
    got = _components(spark, [(7, 9)])
    assert got == {7: 7, 9: 7}


def test_empty_pairs(spark):
    df = _components(spark, [])
    assert df == {}
