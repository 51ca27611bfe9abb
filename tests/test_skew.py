"""Salted join/aggregate must be result-identical to the unsalted forms,
and must actually spread a hot key across salt buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", SF_DIR).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    ).collect()[0]
    salted = salted_join(li, orders, ["l_orderkey"], salt_buckets=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    ).collect()[0]
    assert (plain.n, plain.q) == (salted.n, salted.q)


def test_salted_join_spreads_hot_key(spark):
    # one pathological key with 10k rows
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(1, "x")], "k int, name string")
    salted = hot.withColumn(
        "__salt",
        F.pmod(F.xxhash64("k", "v"), F.lit(8)).cast("int"),
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8  # the hot key occupies every salt bucket

    out = salted_join(hot, dim, ["k"], salt_buckets=8)
    assert out.count() == 10_000  # no row lost or duplicated


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, "events", SF_DIR)
    plain = {
        (r.event_type): (r.n, r.mx)
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type): (r.count_value, r.max_value)
        for r in salted_aggregate(
            ev, ["event_type"], {"value": "count"}, salt_buckets=8
        )
        .join(
            salted_aggregate(ev, ["event_type"], {"value": "max"}, salt_buckets=8),
            "event_type",
        )
        .collect()
    }
    assert plain == salted
