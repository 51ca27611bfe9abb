"""KMV/theta distinct sketches: exactness below saturation, lossless
union, shared-theta intersection, per-group form."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.profile import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
    kmv_union,
)


def _vals(spark, xs, col="v"):
    return spark.createDataFrame([(x,) for x in xs], f"{col} long")


class TestKmv:
    def test_unsaturated_sketch_is_exact(self, spark):
        df = _vals(spark, [1, 2, 3, 2, 1, 4])
        est = kmv_estimate(kmv_sketch(df, "v", k=16), k=16).collect()[0]
        assert est.n_distinct_est == 4.0

    def test_sketch_capped_at_k(self, spark):
        df = _vals(spark, range(1000))
        sk = kmv_sketch(df, "v", k=32)
        assert sk.count() == 32

    def test_saturated_estimate_within_error(self, spark):
        n, k = 2000, 64
        df = _vals(spark, range(n))
        est = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()[0]
        # KMV rse ~ 1/sqrt(k-2) = 12.7%; allow 4 sigma
        assert abs(est.n_distinct_est - n) / n < 0.51

    def test_union_is_lossless(self, spark):
        a = _vals(spark, range(0, 500))
        b = _vals(spark, range(300, 900))
        k = 48
        u = kmv_union(kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k), k=k)
        direct = kmv_sketch(a.union(b), "v", k=k)
        assert sorted(r.h for r in u.collect()) == sorted(
            r.h for r in direct.collect()
        )

    def test_intersection_exact_when_unsaturated(self, spark):
        a = _vals(spark, [1, 2, 3, 4, 5])
        b = _vals(spark, [4, 5, 6, 7])
        k = 16
        row = kmv_intersect_estimate(
            kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k), k=k
        ).collect()[0]
        assert row.theta == 1.0
        assert row.n_matched == 2 and row.n_intersect_est == 2.0

    def test_disjoint_intersection_is_zero(self, spark):
        a = _vals(spark, range(0, 100))
        b = _vals(spark, range(100, 200))
        k = 16
        row = kmv_intersect_estimate(
            kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k), k=k
        ).collect()[0]
        assert row.n_matched == 0 and row.n_intersect_est == 0.0

    def test_grouped_sketch_estimates_per_group(self, spark):
        df = spark.createDataFrame(
            [("x", i) for i in range(10)] + [("y", i) for i in range(3)],
            "g string, v long",
        )
        est = kmv_estimate(
            kmv_sketch(df, "v", k=16, by="g"), k=16, by=True
        )
        got = {r.grp: r.n_distinct_est for r in est.collect()}
        assert got == {"x": 10.0, "y": 3.0}

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [(1,), (None,), (2,), (None,)], "v long"
        )
        est = kmv_estimate(kmv_sketch(df, "v", k=8), k=8).collect()[0]
        assert est.n_distinct_est == 2.0
