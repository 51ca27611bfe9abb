"""Permanent dtype-kind audit over EVERY oracle in the catalog.

The external driver compares Spark and DuckDB through pandas (DuckDB
``fetchdf()`` / Spark ``toPandas()``) and hashes values — so an oracle
whose SQL types a column as HUGEINT (any ``sum(INTEGER)`` /
``sum(CASE WHEN ... 1 ...)``) renders float64 in pandas while Spark
returns int64: same values, different hash, red driver row. This class
shipped twice (round-2 ``pack_bin_stats``; the 11 round-7/8 reds,
root-caused in VERDICT r8) because the detector lived in
``tools/audit_oracle_types.py`` — a manually-run script, not a test.

This test closes the hole permanently and cheaply: ``DESCRIBE SELECT``
types every oracle through DuckDB's binder (zero rows executed, no
Spark needed — the whole catalog audits in seconds) and fails on any
driver-hash-hazardous output type:

- HUGEINT / UHUGEINT  -> pandas float64 vs Spark int64 (hash flip)
- DECIMAL(p,s)        -> pandas float64-or-object vs Spark's type
- LIST / STRUCT / MAP -> unhashable object cells (the round-2
  ``embedding_label_centroids`` harness error)

Fix at the oracle: ``CAST(sum(x) AS BIGINT)``, ``CAST(... AS DOUBLE)``,
or export/explode the nested column. The exact-value parity check
(tests/test_oracle_parity.py) remains the value gate; this is the
dtype gate the value gate is structurally blind to (its fetchall/repr
path erases the int-vs-float distinction for integral values).
"""

from __future__ import annotations

import duckdb
import pytest

from fred_economic_data_pipeline_local_spark.plans import all_oracles

from .conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB logical types whose pandas rendering diverges from the
# same-valued Spark result (or cannot be hashed at all).
_HAZARD_EXACT = {"HUGEINT", "UHUGEINT"}
_HAZARD_PREFIX = ("DECIMAL(", "STRUCT(", "MAP(", "UNION(")


def _hazard(duck_type: str) -> str | None:
    t = duck_type.strip().upper()
    if t in _HAZARD_EXACT:
        return "pandas renders as float64; Spark sum(int) is int64 -> hash flip"
    if t.endswith("[]"):
        return "list-typed cell is unhashable in the driver's pandas sort"
    for p in _HAZARD_PREFIX:
        if t.startswith(p):
            return f"{t}: pandas rendering diverges from Spark's dtype kind"
    return None


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_output_types_are_driver_hash_safe(duck, name):
    sql = all_oracles()[name]
    try:
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    except duckdb.IOException as exc:
        if ".oracle_exports" in str(exc):
            # exported-index oracle: its SQL reads parquet the Spark query
            # writes first, so the binder can't type it statically. These
            # are covered DYNAMICALLY by the same-kind assertion inside
            # tests/oracle_utils.compare_query (runs after the export
            # exists, for every oracle, every parity run).
            pytest.skip("exported-index oracle; dtype-checked in compare_query")
        raise
    bad = []
    for col, duck_type, *_ in rows:
        why = _hazard(duck_type)
        if why:
            bad.append(f"{col} {duck_type} ({why})")
    assert not bad, (
        f"{name}: driver-hash-hazardous oracle output type(s): "
        + "; ".join(bad)
        + " — CAST in the oracle SQL (e.g. CAST(sum(x) AS BIGINT))"
    )
