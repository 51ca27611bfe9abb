"""connected_components_twostar: O(log diameter) convergence on chains
(where min-label propagation is O(diameter)) and exact equivalence to
neardup_components on random graphs."""

from __future__ import annotations

import random

import pytest


def _comp(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_long_chain_converges_in_log_rounds(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        connected_components_twostar,
    )

    # a 600-node path: plain propagation needs ~600 rounds; jumping
    # must label it well inside the 40-round cap (log2(600) ~ 10)
    n = 600
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    stats = {}
    got = _comp(connected_components_twostar(pairs, stats=stats))
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 15


def test_matches_neardup_components_on_random_graphs(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        connected_components_twostar,
        neardup_components,
    )

    rng = random.Random(13)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randint(0, 80), rng.randint(0, 80)) for _ in range(60)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    assert _comp(connected_components_twostar(df)) == _comp(
        neardup_components(df)
    )


def test_empty_and_single_edge(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        connected_components_twostar,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert _comp(connected_components_twostar(empty)) == {}
    one = spark.createDataFrame([(7, 3)], "id_a long, id_b long")
    assert _comp(connected_components_twostar(one)) == {3: 3, 7: 3}
