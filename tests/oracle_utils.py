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
    # DESCRIBE types the query through the binder without executing it —
    # the logical types feed the dtype-kind check below (the driver
    # hashes through fetchdf(), whose dtype kind is a pure function of
    # the logical type: HUGEINT -> float64, BIGINT -> int64, ...)
    duck_types = {
        c: t for c, t, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows, duck_types


# pandas dtype KIND each engine's result lands as on the driver's
# compare path (DuckDB fetchdf / Spark toPandas). None = non-numeric,
# hash-stable across engines (strings, dates, binaries) — not compared.
_DUCK_KIND = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
    "HUGEINT": "f", "UHUGEINT": "f",  # fetchdf renders int128 as float64
    "FLOAT": "f", "DOUBLE": "f",
    "BOOLEAN": "b",
    "TIMESTAMP": "M", "TIMESTAMP WITH TIME ZONE": "M",
}
_SPARK_KIND = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f",
    "boolean": "b",
    "timestamp": "M", "timestamp_ntz": "M",
}


def assert_dtype_kinds_match(
    name: str, spark_dtypes: list[tuple[str, str]], duck_types: dict[str, str]
) -> None:
    """Fail if any column's pandas dtype KIND differs between the two
    engines on the driver's fetchdf()/toPandas() hash path — the drift
    the exact-value repr comparison is structurally blind to (int64 vs
    float64 repr identically for integral values). Known offender:
    DuckDB HUGEINT from sum(INTEGER); fix with CAST(... AS BIGINT)."""
    bad = []
    for col, s_type in spark_dtypes:
        d_type = duck_types.get(col)
        if d_type is None:
            continue  # column-name parity is asserted separately
        if d_type.upper().startswith("DECIMAL("):
            bad.append(f"{col}: DuckDB {d_type} (pandas rendering unstable)")
            continue
        sk = _SPARK_KIND.get(s_type)
        dk = _DUCK_KIND.get(d_type.upper())
        if sk and dk and sk != dk:
            bad.append(f"{col}: spark {s_type}({sk}) vs duckdb {d_type}({dk})")
    assert not bad, (
        f"{name}: dtype-kind drift on the driver hash path — "
        + "; ".join(bad)
        + " — CAST in the oracle SQL (e.g. CAST(sum(x) AS BIGINT))"
    )


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
    d_cols, d_rows, duck_types = duckdb_run(sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert_dtype_kinds_match(name, sdf.dtypes, duck_types)
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
