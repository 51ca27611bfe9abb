"""Semantic pins for the round-11 wave. The DuckDB parity test
(`test_oracle_parity.py`) proves engine-vs-oracle equality; these pin
the MEANING — streak algebra against a pure-Python reference, the
Wilson bound's defining inequalities, sample-size contracts, BPE
fertility invariants, and the PIT visibility rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.plans import all_queries

from .conftest import SF_DIR


def test_gaps_islands_matches_pure_python(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table

    ev = load_table(spark, "events", SF_DIR)
    days = {}
    for r in ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).collect():
        days.setdefault(r["user_id"], set()).add(r["d"])
    want = {}
    for u, ds in days.items():
        ds = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[u] = (len(ds), len(runs), max(runs))
    got = all_queries()["events_gaps_islands"](spark, SF_DIR).collect()
    assert len(got) == min(20, len(want))
    # top-20 ordering: longest desc then user asc, and stats exact
    keys = [(-r["longest_streak"], r["user_id"]) for r in got]
    assert keys == sorted(keys)
    for r in got:
        assert want[r["user_id"]] == (
            r["n_active_days"], r["n_streaks"], r["longest_streak"]
        )


def test_wilson_bound_inequalities(spark):
    rows = all_queries()["supplier_ontime_wilson"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= r["ontime_rate"] <= 1.0
        # closed form re-check
        n, s = r["n_shipments"], r["n_on_time"]
        z = 1.959963984540054
        p = s / n
        lb = (
            p + z * z / (2 * n)
            - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        ) / (1 + z * z / n)
        assert abs(lb - r["wilson_lb"]) < 5e-7


def test_exact_k_per_group_size_and_rank_contract(spark):
    out = all_queries()["sample_exact_k_per_group"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {}
    for r in out.collect():
        got.setdefault(r["lang"], []).append(r["draw_rank"])
    assert set(got) == set(sizes)
    for lang, ranks in got.items():
        k = min(25, sizes[lang])
        assert sorted(ranks) == list(range(1, k + 1))


def test_tokenizer_fertility_invariants(spark):
    rows = all_queries()["text_tokenizer_fertility"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # BPE only merges within words: 1 <= subwords/word, and a
        # subword is at least one char
        assert r["fertility"] >= 1.0
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["chars_per_token"] > 0.0


def test_textrank_returns_ranked_words(spark):
    rows = all_queries()["text_textrank_keywords"](spark, SF_DIR).collect()
    assert len(rows) == 20
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank"] > 0 and r["word"] for r in rows)


def test_pit_features_see_version_correct_values(spark):
    out = all_queries()["scd2_point_in_time_features"](spark, SF_DIR)
    rows = out.collect()
    assert {r["asof_version"] for r in rows} == {0, 1, 2}
    by = {}
    for r in rows:
        by[(r["indicator"], r["observation_year"], r["asof_version"])] = r
    # the v0->v1 hop doubles months 5-10 and adds 9-10: with positive
    # values some (indicator, year) must strictly grow; the v2
    # overwrite deletes months 1-2 so visibility can shrink vs v1
    grew = sum(
        1
        for (ind, y, v), r in by.items()
        if v == 1
        and (ind, y, 0) in by
        and r["sum_value"] > by[(ind, y, 0)]["sum_value"]
    )
    assert grew > 0
    for (ind, y, v), r in by.items():
        if v == 2 and (ind, y, 1) in by:
            assert r["n_months"] <= by[(ind, y, 1)]["n_months"] + 2


def test_max_drawdown_matches_pure_python(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table

    ev = load_table(spark, "events", SF_DIR)
    daily = {}
    for r in (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .collect()
    ):
        daily.setdefault(r["event_type"], []).append((r["d"], r["v"]))
    got = {
        r["event_type"]: r
        for r in all_queries()["events_max_drawdown"](spark, SF_DIR).collect()
    }
    for et, series in daily.items():
        series.sort()
        peak, best = series[0][1], (0.0, series[0][0], series[0][1], series[0][1])
        for d, v in series:
            peak = max(peak, v)
            dd = (peak - v) / peak
            if dd > best[0]:
                best = (dd, d, peak, v)
        r = got[et]
        assert abs(r["max_drawdown"] - round(best[0], 6)) < 1e-9
        assert r["trough_day"] == best[1]
        assert r["peak_revenue"] == round(best[2], 2)
        assert r["trough_revenue"] == round(best[3], 2)
        assert r["n_days"] == len(series)


def test_rolling_bands_are_ordered_and_bracket_median(spark):
    rows = all_queries()["window_rolling_quantile_bands"](
        spark, SF_DIR
    ).collect()
    assert rows
    for r in rows:
        assert r["p10"] <= r["p50"] <= r["p90"]


def test_markov_stationary_is_a_distribution(spark):
    rows = all_queries()["events_markov_stationary"](spark, SF_DIR).collect()
    assert rows
    total = sum(r["pi"] for r in rows)
    # 5 iterations of 8-dp-rounded sums: mass conserved to rounding
    assert abs(total - 1.0) < 1e-4
    assert all(r["pi"] >= 0 for r in rows)
    ranks = [r["pi"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
