"""Driver-contract guards for __spark_entry__: the exact surface the
external harness consumes."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    # flagship silver schema (SURVEY §3.2): grouping keys + avg/count/max
    cols = set(df.columns)
    assert {"value", "observation_count"} <= cols


def test_every_oracle_has_a_query(spark):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 79  # surface only grows within a round
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_names_are_stable_identifiers(spark):
    # names feed file paths / JSON keys in the driver — keep them clean
    import re

    for name in entrymod.queries():
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_rotation_orders_least_recently_checked_first(spark):
    """The driver records the first 50 registry entries per round; the
    emitted order must put never-driver-checked queries before any query
    with an existing CORRECTNESS row, oldest-round rows next — so every
    query accumulates a driver-green row across rounds without manual
    reordering."""
    from fred_economic_data_pipeline_local_spark.plans.registry import (
        _CHECK_FIRST,
        _last_checked_round,
    )

    qs = list(entrymod.queries())
    assert len(_CHECK_FIRST) == len(set(_CHECK_FIRST))
    missing = [n for n in _CHECK_FIRST if n not in qs]
    assert not missing, f"_CHECK_FIRST names not in registry: {missing}"

    last = _last_checked_round()
    rounds = [last.get(n, -1) for n in qs]
    assert rounds == sorted(rounds), "emitted order is not stalest-first"
    # round-1 artifact exists in this repo: its 50 checked queries must
    # all sort behind the never-checked ones
    if last:
        n_unchecked = sum(1 for n in qs if n not in last)
        assert all(n in last for n in qs[n_unchecked:])
