"""Regression tests for round-1 advisor findings (ADVICE.md):

1. asof_join must attach ONE right row — a NULL payload field in the
   matching row stays NULL instead of being backfilled from an older row.
2. Lake writers must be dynamic-overwrite even on sessions that don't set
   spark.sql.sources.partitionOverwriteMode (external/driver sessions).
3. neardup_components terminates on an exact changed-label count and
   raises when max_iters is exhausted before the fixpoint.
4. salted_join rejects join types where small-side replication would
   surface unmatched rows N times.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    neardup_components,
)
from fred_economic_data_pipeline_local_spark.operators.skew import salted_join
from fred_economic_data_pipeline_local_spark.operators.temporal import asof_join
from fred_economic_data_pipeline_local_spark.sources import lake


def test_asof_attaches_matching_rows_nulls_not_older_values(spark):
    """The most recent right row has value=NULL: the joined output must
    carry that NULL (merge_asof semantics), not the older row's 5.0."""
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, t(25))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), 5.0, "older"), (1, t(20), None, "newest")],
        "user_id long, ts timestamp, value double, note string",
    )
    [row] = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value", "note"]
    ).collect()
    assert row.note_right == "newest"
    assert row.ts_right == t(20)
    assert row.value_right is None  # not backfilled from the t=10 row


def test_lake_overwrite_is_dynamic_even_on_static_session(spark, tmp_path):
    """Writing series B must not truncate series A's partitions, even when
    the session conf asks for static overwrite (external-session case)."""
    root = str(tmp_path)
    mk = lambda ind: spark.createDataFrame(
        [(ind, "2024-01-01", 1.5, 2024, 1)],
        "indicator string, observation_date string, value double,"
        " observation_year int, observation_month int",
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        lake.write_silver(mk("GDP"), root)
        lake.write_silver(mk("UNRATE"), root)
        got = {
            r.indicator
            for r in lake.read_silver(spark, root).select("indicator").collect()
        }
        assert got == {"GDP", "UNRATE"}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _path_graph(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )


def test_components_converge_on_path_graph(spark):
    comp = neardup_components(_path_graph(spark, 8))
    rows = comp.collect()
    assert len(rows) == 8
    assert {r.component for r in rows} == {0}


def test_components_raise_when_max_iters_exhausted(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        # a path of 8 nodes needs ~7 propagation rounds; 2 can't finish
        neardup_components(_path_graph(spark, 8), max_iters=2)


def test_salted_join_rejects_replicating_join_types(spark):
    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, on=["k"], how=how)
    # allowed types still work
    assert salted_join(big, small, on=["k"], how="left").count() == 1
