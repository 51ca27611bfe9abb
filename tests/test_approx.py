"""Approximate aggregates must stay within their error contracts vs the
exact answers (the reason they're rows-only in the oracle corpus)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.plans import all_queries

from .conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in all_queries()["approx_aggregates_lineitem"](spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: r.exact
        for r in load_table(spark, "lineitem", SF_DIR)
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        # rsd=0.02 -> generous 5x margin for small-cardinality wobble
        assert abs(est - exact[flag]) / exact[flag] < 0.10, (flag, est, exact[flag])


def test_approx_percentile_within_tolerance(spark):
    approx = {
        r.l_returnflag: r.approx_p50
        for r in all_queries()["approx_aggregates_lineitem"](spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: r.exact
        for r in load_table(spark, "lineitem", SF_DIR)
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("exact"))
        .collect()
    }
    for flag, est in approx.items():
        assert abs(est - exact[flag]) / exact[flag] < 0.02, (flag, est, exact[flag])
