"""profile_columns: single-pass column profiling semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.profile import (
    profile_columns,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {r["col_name"]: r.asDict() for r in df.collect()}


def test_profile_nulls_distincts_native_minmax(spark):
    df = spark.createDataFrame(
        [(9, "b", None), (10, "a", 2.5), (None, "a", -1.5), (9, None, None)],
        "k long, s string, v double",
    )
    p = _rows(profile_columns(df))
    assert set(p) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in p.values())
    assert (p["k"]["n_nulls"], p["s"]["n_nulls"], p["v"]["n_nulls"]) == (1, 1, 2)
    # count(DISTINCT) excludes nulls in both engines
    assert (p["k"]["n_distinct"], p["s"]["n_distinct"], p["v"]["n_distinct"]) == (2, 2, 2)
    # min/max computed on the NATIVE type then stringified: numeric 9 < 10
    # (lexicographic would invert), negative doubles order correctly
    assert (p["k"]["min_value"], p["k"]["max_value"]) == ("9", "10")
    assert (p["s"]["min_value"], p["s"]["max_value"]) == ("a", "b")
    assert (p["v"]["min_value"], p["v"]["max_value"]) == ("-1.5", "2.5")


def test_profile_all_null_column_and_subset(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b string")
    p = _rows(profile_columns(df, cols=["b"]))
    assert list(p) == ["b"]
    assert p["b"]["n_nulls"] == 2
    assert p["b"]["n_distinct"] == 0
    assert p["b"]["min_value"] is None and p["b"]["max_value"] is None


def test_profile_approx_mode_drops_expand(spark):
    df = spark.range(1000).selectExpr("id", "id % 7 as m")
    exact = _rows(profile_columns(df))
    approx = _rows(profile_columns(df, approx_distinct=True))
    # HLL++ at rsd 5%: tiny cardinalities are near-exact
    assert approx["m"]["n_distinct"] == 7
    assert abs(approx["id"]["n_distinct"] - 1000) <= 50
    assert exact["id"]["n_distinct"] == 1000
    # the scale path plans no Expand (no per-distinct-column row blowup)
    assert "Expand" in profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in (
        profile_columns(df, approx_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_profile_drift_alerts(spark):
    from fred_economic_data_pipeline_local_spark.operators.profile import (
        profile_drift,
    )

    curr = spark.createDataFrame(
        [("a", 100, 10, 50, "x", "y"), ("b", 100, 0, 10, "x", "y"),
         ("new", 100, 0, 3, "x", "y")],
        "col_name string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string",
    )
    prev = spark.createDataFrame(
        [("a", 100, 1, 49, "x", "y"), ("b", 100, 0, 30, "x", "y"),
         ("gone", 100, 0, 7, "x", "y")],
        curr.schema,
    )
    d = {r["col_name"]: r.asDict() for r in profile_drift(curr, prev).collect()}
    # a: null rate jumped 0.01 -> 0.10 (alert); distinct 50/49 in band
    assert d["a"]["alert_nulls"] and not d["a"]["alert_distinct"]
    # b: distinct collapsed 30 -> 10 (ratio 0.33 < 0.5)
    assert d["b"]["alert_distinct"] and not d["b"]["alert_nulls"]
    # schema changes surface from BOTH sides of the full-outer join,
    # with alerts coalesced to definite booleans, never NULL
    assert d["new"]["alert_schema"] and d["new"]["n_rows_prev"] is None
    assert d["gone"]["alert_schema"] and d["gone"]["n_rows_curr"] is None
    assert d["gone"]["alert_nulls"] is False
    assert not d["a"]["alert_schema"] and not d["b"]["alert_schema"]


class TestSketchProfile:
    def test_merge_tracks_direct_sketch_of_union(self, spark):
        """The defining property: union of per-snapshot sketches carries
        the information of sketching the union directly. Estimates are
        NOT bit-equal (the union gadget estimates from HLL_8 registers;
        a direct sketch may estimate from a sparser mode), so the pin is
        1% — far inside the gap any real drift would show."""
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            merge_sketch_profiles,
            sketch_profile,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        cols = ["lang", "source", "doc_id"]
        old = docs.where(F.col("doc_id") % 5 != 0)
        new = docs.where(F.col("doc_id") % 5 == 0)
        merged = {
            r["col_name"]: r
            for r in merge_sketch_profiles(
                sketch_profile(old, cols), sketch_profile(new, cols)
            ).collect()
        }
        direct = {
            r["col_name"]: r
            for r in merge_sketch_profiles(sketch_profile(docs, cols)).collect()
        }
        assert set(merged) == set(cols)
        for c in cols:
            assert merged[c]["n_rows"] == direct[c]["n_rows"] == docs.count()
            assert merged[c]["n_nulls"] == direct[c]["n_nulls"]
            m, d = merged[c]["n_distinct_est"], direct[c]["n_distinct_est"]
            assert abs(m - d) <= max(1, 0.01 * d), (c, m, d)

    def test_estimates_track_exact_distincts(self, spark):
        """At fixture cardinalities (<= 500) lg_k=12 HLL is exact-ish:
        within 2% of the true distinct count per column."""
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            merge_sketch_profiles,
            sketch_profile,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        cols = ["lang", "source", "doc_id"]
        est = {
            r["col_name"]: r["n_distinct_est"]
            for r in merge_sketch_profiles(sketch_profile(docs, cols)).collect()
        }
        for c in cols:
            exact = docs.select(c).distinct().count()
            assert abs(est[c] - exact) <= max(1, exact * 0.02), (c, est[c], exact)


def test_merge_requires_at_least_one_profile():
    """Zero-arg merge fails with a clear contract error, not a bare
    functools.reduce TypeError (ADVICE r5)."""
    import pytest

    from fred_economic_data_pipeline_local_spark.operators.profile import (
        merge_sketch_profiles,
    )

    with pytest.raises(ValueError, match="at least one profile"):
        merge_sketch_profiles()


class TestDDSketch:
    """DDSketch quantile sketch: deterministic buckets, EXACT merge
    (counts add bucket-for-bucket), relative-error quantile bound."""

    def _vals(self, spark):
        import random

        rng = random.Random(7)
        rows = (
            [(float(rng.lognormvariate(5, 2)),) for _ in range(2000)]
            + [(-float(rng.lognormvariate(2, 1)),) for _ in range(300)]
            + [(0.0,)] * 50
        )
        return spark.createDataFrame(rows, "v double")

    def test_merge_equals_direct_exactly(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_merge,
            dd_sketch,
        )

        df = self._vals(spark).withColumn("g", F.monotonically_increasing_id() % 3)
        parts = [df.where(F.col("g") == i).select("v") for i in range(3)]
        merged = dd_merge(*[dd_sketch(p, "v") for p in parts])
        direct = dd_sketch(df.select("v"), "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_quantile_relative_error_bound(self, spark):
        from pyspark.sql import Window
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_quantiles,
            dd_sketch,
        )

        alpha = 0.02
        df = self._vals(spark)
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        ests = {
            r["q"]: r["est"]
            for r in dd_quantiles(dd_sketch(df, "v", alpha), qs, alpha).collect()
        }
        ranked = df.select(
            "v", F.row_number().over(Window.orderBy("v")).alias("r")
        )
        n = df.count()
        for q in qs:
            rank = int(q * (n - 1)) + 1
            exact = ranked.where(F.col("r") == rank).first()["v"]
            tol = alpha * abs(exact) + 1e-9
            assert abs(ests[q] - exact) <= tol, (q, ests[q], exact)

    def test_zero_and_sign_stores(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_quantiles,
            dd_sketch,
        )

        df = spark.createDataFrame(
            [(-4.0,), (-2.0,), (0.0,), (0.0,), (3.0,), (9.0,)], "v double"
        )
        sk = dd_sketch(df, "v", 0.01)
        signs = {r["sign"] for r in sk.collect()}
        assert signs == {-1, 0, 1}
        got = {r["q"]: r["est"] for r in dd_quantiles(sk, [0.0, 0.5, 1.0], 0.01).collect()}
        assert got[0.0] < 0 and got[0.5] == 0.0 and got[1.0] > 0

    def test_counts_and_nulls(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_sketch,
        )

        df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
        sk = dd_sketch(df, "v")
        assert sk.agg(F.sum("n")).first()[0] == 2  # null excluded

    def test_alpha_validation(self, spark):
        import pytest

        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_sketch,
        )

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="alpha"):
            dd_sketch(df, "v", alpha=1.5)

    def test_empty_input_yields_empty_quantiles(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            dd_quantiles,
            dd_sketch,
        )

        df = spark.createDataFrame([], "v double")
        sk = dd_sketch(df, "v")
        assert sk.count() == 0
        assert dd_quantiles(sk, [0.5]).count() == 0


class TestCountMinSketch:
    def _items(self, spark):
        import random

        rng = random.Random(11)
        # Zipf-ish: token_0 dominates, long tail
        rows = []
        for i in range(60):
            rows += [(f"token_{i}",)] * max(1, 600 // (i + 1))
        rng.shuffle(rows)
        return spark.createDataFrame(rows, "tok string")

    def test_merge_equals_direct_exactly(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            cms_merge,
            cms_sketch,
        )

        df = self._items(spark).withColumn(
            "g", F.monotonically_increasing_id() % 2
        )
        a = cms_sketch(df.where(F.col("g") == 0).select("tok"), "tok")
        b = cms_sketch(df.where(F.col("g") == 1).select("tok"), "tok")
        merged = cms_merge(a, b)
        direct = cms_sketch(df.select("tok"), "tok")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_never_underestimates_and_bound_holds(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            cms_estimate,
            cms_sketch,
        )

        df = self._items(spark)
        w, d = 256, 4
        sk = cms_sketch(df, "tok", w=w, d=d)
        exact = df.groupBy("tok").count()
        ests = cms_estimate(sk, exact.select("tok"), "tok", w=w, d=d)
        n_total = df.count()
        rows = ests.join(exact, "tok").collect()
        assert rows
        for r in rows:
            assert r["est"] >= r["count"], (r, "CMS underestimated")
            assert r["est"] <= r["count"] + 2 * n_total / w + 1, r

    def test_unseen_item_estimates_from_counters(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            cms_estimate,
            cms_sketch,
        )

        df = self._items(spark)
        sk = cms_sketch(df, "tok", w=1024, d=4)
        probe = spark.createDataFrame([("never_seen_xyz",)], "tok string")
        [r] = cms_estimate(sk, probe, "tok", w=1024, d=4).collect()
        assert r["est"] >= 0  # overestimate-only; often exactly 0

    def test_sketch_is_bounded_by_matrix_size(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            cms_sketch,
        )

        w, d = 64, 3
        sk = cms_sketch(self._items(spark), "tok", w=w, d=d)
        assert sk.count() <= w * d
        assert sk.agg(F.sum("n")).first()[0] == self._items(spark).count() * d

    def test_validation(self, spark):
        import pytest

        from fred_economic_data_pipeline_local_spark.operators.profile import (
            cms_merge,
            cms_sketch,
        )

        df = spark.createDataFrame([("a",)], "tok string")
        with pytest.raises(ValueError, match="w >= 2"):
            cms_sketch(df, "tok", w=1)
        with pytest.raises(ValueError, match="at least one"):
            cms_merge()
