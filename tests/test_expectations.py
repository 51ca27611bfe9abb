"""Declarative expectations: report math, quarantine split semantics,
null-never-passes, self-describing violation arrays."""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.operators.expectations import (
    expectations_report,
    quarantine,
)

ROWS = [
    (1, 10.0, "a"),
    (2, -5.0, "a"),
    (3, None, "b"),
    (4, 100.0, "zz"),
    (5, 3.0, None),
]
RULES = {
    "v_positive": "v > 0",
    "k_known": "k IN ('a', 'b')",
}


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, v double, k string")


class TestExpectations:
    def test_report_counts(self, spark):
        got = {
            r.rule: (r.n_rows, r.n_violations, r.violation_frac)
            for r in expectations_report(_df(spark), RULES).collect()
        }
        # null v and null k are VIOLATIONS (unknown never passes)
        assert got == {
            "v_positive": (5, 2, 0.4),
            "k_known": (5, 2, 0.4),
        }

    def test_quarantine_split(self, spark):
        good, bad = quarantine(_df(spark), RULES)
        assert {r.id for r in good.collect()} == {1}
        got = {r.id: list(r.violated) for r in bad.collect()}
        assert got == {
            2: ["v_positive"],
            3: ["v_positive"],
            4: ["k_known"],
            5: ["k_known"],
        }

    def test_multi_violation_row_lists_all_sorted(self, spark):
        df = spark.createDataFrame(
            [(9, -1.0, "zz")], "id long, v double, k string"
        )
        _, bad = quarantine(df, RULES)
        assert list(bad.collect()[0].violated) == ["k_known", "v_positive"]

    def test_good_rows_drop_helper_columns(self, spark):
        good, _ = quarantine(_df(spark), RULES)
        assert good.columns == ["id", "v", "k"]

    def test_empty_rules_rejected(self, spark):
        with pytest.raises(ValueError):
            expectations_report(_df(spark), {})


class TestTimeWeightedAvg:
    def _run(self, spark, rows):
        from fred_economic_data_pipeline_local_spark.operators.temporal import (
            time_weighted_avg,
        )

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double, event_id long"
        )
        return {
            r.user_id: (r.n_obs, r.twap)
            for r in time_weighted_avg(df).collect()
        }

    def test_duration_weighting(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # value 10 holds 1s, value 20 holds 3s -> twap 17.5
            (1, t0, 10.0, 1),
            (1, t0 + dt.timedelta(seconds=1), 20.0, 2),
            (1, t0 + dt.timedelta(seconds=4), 99.0, 3),  # last: no interval
        ]
        got = self._run(spark, rows)
        assert got == {1: (3, 17.5)}

    def test_single_observation_excluded(self, spark):
        import datetime as dt

        rows = [(7, dt.datetime(2024, 1, 1), 5.0, 1)]
        assert self._run(spark, rows) == {}

    def test_null_values_ignored(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 10.0, 1),
            (1, t0 + dt.timedelta(seconds=1), None, 2),
            (1, t0 + dt.timedelta(seconds=2), 10.0, 3),
        ]
        got = self._run(spark, rows)
        assert got == {1: (2, 10.0)}
