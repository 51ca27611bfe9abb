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
