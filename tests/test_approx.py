"""Approximate aggregates must stay within their error contracts vs the
exact answers. The registered query is self-certifying (it emits the
exact aggregates plus boolean bound certificates, and its DuckDB oracle
pins the certificates TRUE) — these tests check the certificates from
the consumer side and keep an independent raw approx-vs-exact probe."""

from __future__ import annotations

import pyspark.sql.functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.plans import all_queries

from .conftest import SF_DIR


def test_bound_certificates_hold(spark):
    rows = all_queries()["approx_aggregates_lineitem"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.nd_within_bounds, (r.l_returnflag, "HLL out of bounds")
        assert r.p50_within_bounds, (r.l_returnflag, "t-digest out of bounds")
        assert r.n_rows > 0 and r.n_parts_exact > 0


def test_exact_columns_match_direct_aggregation(spark):
    got = {
        r.l_returnflag: r
        for r in all_queries()["approx_aggregates_lineitem"](spark, SF_DIR).collect()
    }
    direct = {
        r.l_returnflag: r
        for r in load_table(spark, "lineitem", SF_DIR)
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.expr("round(percentile(l_extendedprice, 0.5), 6)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for flag, d in direct.items():
        assert got[flag].n_parts_exact == d.nd
        assert got[flag].p50_exact == d.p50
        assert got[flag].n_rows == d.n


def test_raw_approx_within_published_error(spark):
    """Independent of the query's own certificates: the raw sketch
    aggregates stay near the exact values on the fixture."""
    li = load_table(spark, "lineitem", SF_DIR)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_nd"),
            F.countDistinct("l_partkey").alias("e_nd"),
            F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("a_p50"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("e_p50"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.a_nd - r.e_nd) / r.e_nd < 0.10, r
        assert abs(r.a_p50 - r.e_p50) / abs(r.e_p50) < 0.02, r
