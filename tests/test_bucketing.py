"""Bucketed-layout proof: joins and aggs on the bucket key must plan with
zero Exchange operators — the 100 TB co-located join story, asserted on
the physical plan, not just on results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, lt).join(
            read_bucketed(spark, ot),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sorted buckets: SMJ needs no per-task sort either
        assert "SortMergeJoin" in plan
        n = j.count()
        assert n == load_table(spark, "lineitem", SF_DIR).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, lt = bucketed_tables
    agg = (
        read_bucketed(spark, lt)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join off raw parquet must exchange both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = load_table(spark, "lineitem", SF_DIR).join(
            load_table(spark, "orders", SF_DIR),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
