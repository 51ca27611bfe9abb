"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column names and order-insensitive
values — strict equality, so anything that would break the driver's
value-hash breaks here first.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0; otherwise EXACT repr — stricter than the
        # driver's hash so sub-ulp drift is caught here first
        if v == 0:
            return "0.0"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return repr(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare_query(
    spark, name: str, sf_dir: str, conf_overrides: dict[str, str] | None = None
) -> None:
    """Assert the Spark query matches its DuckDB oracle. Raises on any
    count/column/value difference with a readable diff.

    ``conf_overrides`` are applied AFTER the query builder runs (the
    builder's load_table path calls catalog.tune_session, which pins the
    local-mode profile) but before the collect, so runtime-execution
    confs like AQE can be forced for a cluster-profile check."""
    from fred_economic_data_pipeline_local_spark.plans import all_oracles, all_queries

    q = all_queries()[name]
    sql = all_oracles().get(name)
    assert sql is not None, f"{name} has no oracle"

    sdf = q(spark, sf_dir)
    for k, v in (conf_overrides or {}).items():
        spark.conf.set(k, v)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = duckdb_run(sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
