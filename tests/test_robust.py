"""Robust statistics: winsorize + MAD outlier screen semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.robust import (
    mad_outliers,
    winsorize,
)


def _frame(spark, vals, key="g"):
    return spark.createDataFrame(
        [(key, float(v)) for v in vals], ["k", "v"]
    )


def test_winsorize_clips_both_tails(spark):
    # 1..100: p05 = 5.95, p95 = 95.05 (linear interpolation) — values
    # 1..5 clip low, 96..100 clip high
    df = _frame(spark, range(1, 101))
    r = winsorize(df, "k", "v").collect()[0]
    assert r["n"] == 100
    assert r["n_clip_lo"] == 5
    assert r["n_clip_hi"] == 5
    assert abs(r["lo"] - 5.95) < 1e-9
    assert abs(r["hi"] - 95.05) < 1e-9
    # clipped mean: replace 1..5 by 5.95 and 96..100 by 95.05
    exp = (sum(range(6, 96)) + 5 * 5.95 + 5 * 95.05) / 100.0
    assert abs(r["avg_winsorized"] - round(exp, 2)) < 1e-9


def test_winsorize_constant_group_never_clips(spark):
    df = _frame(spark, [7.0] * 10)
    r = winsorize(df, "k", "v").collect()[0]
    assert r["n_clip_lo"] == 0 and r["n_clip_hi"] == 0
    assert r["avg_winsorized"] == 7.0


def test_winsorize_approx_path_same_shape(spark):
    df = _frame(spark, range(1, 101))
    r = winsorize(df, "k", "v", approx_rel_err=0.001).collect()[0]
    # percentile_approx returns exact data values (no interpolation);
    # bounds land on real rows and the contract columns are intact
    assert r["n"] == 100
    assert set(r.asDict()) == {
        "k", "lo", "hi", "n", "n_clip_lo", "n_clip_hi", "avg_winsorized",
    }


def test_mad_flags_only_the_outlier(spark):
    # tight cluster + one spike: med=10, MAD=1 -> threshold 4.4478
    df = _frame(spark, [9, 9, 10, 10, 10, 11, 11, 1000])
    r = mad_outliers(df, "k", "v").collect()[0]
    assert r["med"] == 10.0
    assert r["mad"] == 1.0
    assert r["n"] == 8
    assert r["n_outliers"] == 1


def test_mad_constant_group_zero_mad_no_flags_on_equal(spark):
    # all-equal group: MAD = 0 and |v - med| = 0 is NOT > 0 -> no flags
    df = _frame(spark, [5.0] * 6)
    r = mad_outliers(df, "k", "v").collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 0


def test_mad_groups_are_independent(spark):
    df = _frame(spark, [1, 1, 1, 100], key="a").union(
        _frame(spark, [100, 100, 100, 100], key="b")
    )
    rows = {r["k"]: r for r in mad_outliers(df, "k", "v").collect()}
    assert rows["a"]["n_outliers"] == 1
    assert rows["b"]["n_outliers"] == 0


def test_sliding_window_expands_each_event_twice(spark):
    from fred_economic_data_pipeline_local_spark.plans import all_queries

    ev_n = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    )
    out = all_queries()["sliding_window_events"](
        spark, "/root/testdata/sf0.001"
    )
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * ev_n


class TestBootstrap:
    def test_point_is_plain_mean_and_ci_brackets_it(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.robust import (
            poisson_bootstrap_ci,
        )

        df = spark.createDataFrame(
            [(i, float(100 + (i % 7))) for i in range(200)], ["id", "v"]
        )
        r = poisson_bootstrap_ci(df, "id", "v", reps=16).collect()[0]
        exact = sum(100 + (i % 7) for i in range(200)) / 200.0
        assert abs(r["point"] - round(exact, 4)) < 1e-9
        assert r["n_reps"] == 16
        assert r["boot_se"] > 0
        assert r["ci_lo"] < r["point"] < r["ci_hi"]

    def test_deterministic_across_runs_and_partitionings(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.robust import (
            poisson_bootstrap_ci,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], ["id", "v"]
        )
        a = poisson_bootstrap_ci(df, "id", "v", reps=8).collect()[0]
        b = poisson_bootstrap_ci(
            df.repartition(7), "id", "v", reps=8
        ).collect()[0]
        assert a == b


class TestKS:
    def test_identical_distributions_not_rejected(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.robust import (
            ks_two_sample,
        )

        rows = [("a", float(i % 10)) for i in range(100)] + [
            ("b", float(i % 10)) for i in range(100)
        ]
        r = ks_two_sample(
            spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
        ).collect()[0]
        assert r["d_stat"] == 0.0 and not r["reject"]
        assert r["n_a"] == 100 and r["n_b"] == 100

    def test_disjoint_distributions_rejected_with_d_one(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.robust import (
            ks_two_sample,
        )

        rows = [("a", float(i)) for i in range(50)] + [
            ("b", float(1000 + i)) for i in range(50)
        ]
        r = ks_two_sample(
            spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
        ).collect()[0]
        assert r["d_stat"] == 1.0 and r["reject"]

    def test_other_groups_excluded(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.robust import (
            ks_two_sample,
        )

        rows = [("a", 1.0), ("b", 1.0), ("z", 999.0)]
        r = ks_two_sample(
            spark.createDataFrame(rows, ["g", "v"]), "g", "v", "a", "b"
        ).collect()[0]
        assert r["n_a"] == 1 and r["n_b"] == 1 and r["d_stat"] == 0.0


def test_export_root_is_pid_scoped_and_consistent():
    # concurrent JVMs must not share export dirs (the r7 hash-red
    # mechanism, reproduced locally as FILE_NOT_EXIST during a
    # pytest-vs-bench race); within one process the SQL fragment and the
    # write path must embed the SAME root
    import os

    from fred_economic_data_pipeline_local_spark.exports import (
        EXPORT_DIR,
        export_path,
        export_sql,
    )

    assert EXPORT_DIR.endswith(f"pid-{os.getpid()}")
    assert export_path("x") == os.path.join(EXPORT_DIR, "x")
    assert EXPORT_DIR in export_sql("x")


def test_cusum_window_identity_matches_recursion(spark):
    # the engine computes S_t = P_t - min(0, min_j P_j); pin it against
    # the literal Page recursion S_t = max(0, S_{t-1} + z_t - k) on the
    # real fixture (per event_type, hourly counts, k = 0.5)
    import math

    from fred_economic_data_pipeline_local_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    out = {
        r["event_type"]: r
        for r in all_queries()["events_changepoint_cusum"](
            spark, sf
        ).collect()
    }
    from datetime import timezone

    ev = spark.read.parquet(f"{sf}/events.parquet").collect()
    hourly: dict = {}
    for r in ev:
        # fixture timestamps are UTC; Row carries a naive datetime
        hr = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp()
        ) // 3600
        hourly.setdefault(r["event_type"], {}).setdefault(hr, 0)
        hourly[r["event_type"]][hr] += 1
    for et, bucket in hourly.items():
        counts = [bucket[h] for h in sorted(bucket)]
        n = len(counts)
        if n <= 1:
            assert et not in out
            continue
        s_, ss = sum(counts), sum(c * c for c in counts)
        var = (ss - s_ * s_ / n) / (n - 1)
        best, best_hr, cur = -1.0, None, 0.0
        for h in sorted(bucket):
            z = (bucket[h] - s_ / n) / math.sqrt(var) if var > 0 else 0.0
            cur = max(0.0, cur + z - 0.5)
            if round(cur, 8) > best:
                best, best_hr = round(cur, 8), h
        r = out[et]
        assert r["n_hours"] == n
        assert abs(r["max_cusum"] - round(best, 6)) < 1e-9, et
        assert r["alarm_hr"] == best_hr, et
        assert r["alarm"] == (best > 5.0)


def test_jaccard_source_pairs_small_known(spark):
    from fred_economic_data_pipeline_local_spark.plans import all_queries

    rows = all_queries()["text_jaccard_source_pairs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(rows) <= 20
    # scores sorted desc with the documented tiebreak; all in (0, 1]
    seq = [(r["jaccard"], r["src_a"], r["src_b"]) for r in rows]
    assert all(0.0 < j <= 1.0 for j, *_ in seq)
    assert seq == sorted(seq, key=lambda t: (-t[0], t[1], t[2]))


def test_trend_slope_matches_numpy_polyfit(spark):
    import numpy as np

    from fred_economic_data_pipeline_local_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["events_trend_slope"](spark, sf).collect()
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["d"])):
        by_type.setdefault(r["event_type"], []).append(r)
    checked = 0
    for et, series in by_type.items():
        for i, r in enumerate(series):
            lo = max(0, i - 6)
            xs = [s["d"] for s in series[lo : i + 1]]
            ys = [s["y"] for s in series[lo : i + 1]]
            if len(xs) >= 2 and len(set(xs)) > 1:
                exp = np.polyfit(xs, ys, 1)[0]
                assert abs(r["slope"] - exp) < 1e-5, (et, r["d"])
                checked += 1
            else:
                assert r["slope"] is None
    assert checked > 20


def test_ks_null_values_excluded(spark):
    from fred_economic_data_pipeline_local_spark.operators.robust import (
        ks_two_sample,
    )

    rows = [("a", 1.0), ("a", None), ("b", 1.0), ("b", None), ("b", None)]
    r = ks_two_sample(
        spark.createDataFrame(rows, "g string, v double"), "g", "v", "a", "b"
    ).collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 1 and r["d_stat"] == 0.0


def test_winsorize_apply_with_exact_bounds_matches_winsorize(spark):
    from fred_economic_data_pipeline_local_spark.operators.robust import (
        winsorize,
        winsorize_apply,
        winsorize_bounds,
    )

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 101)]
        + [("h", float(i * 3)) for i in range(1, 51)],
        "k string, v double",
    )
    direct = {tuple(r) for r in winsorize(df, "k", "v").collect()}
    split = {
        tuple(r)
        for r in winsorize_apply(
            df, "k", "v", winsorize_bounds(df, "k", "v")
        ).collect()
    }
    assert direct == split


def test_winsorize_bounds_approx_within_rank_tolerance(spark):
    from fred_economic_data_pipeline_local_spark.operators.robust import (
        winsorize_bounds,
    )

    n = 2000
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(n)], "k string, v double"
    )
    ex = winsorize_bounds(df, "k", "v").collect()[0]
    ap = winsorize_bounds(df, "k", "v", approx_rel_err=0.001).collect()[0]
    # GK guarantee: rank error <= rel_err * n -> value error <= 2/0.001
    # ranks on this uniform grid; generous envelope
    assert abs(ap["lo"] - ex["lo"]) <= n * 0.001 * 2 + 1
    assert abs(ap["hi"] - ex["hi"]) <= n * 0.001 * 2 + 1
