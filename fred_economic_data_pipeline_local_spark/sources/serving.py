"""Serving-store connectors: RDBMS upsert + sheet-style dedup append.

Engine-side semantics live in operators/serve.py (pure DataFrames,
oracle-checked); this module is the thin I/O edge:

- the exact ``INSERT ... ON CONFLICT DO UPDATE`` statement the reference
  executes (load_fred_data.py:54-59), generated for the two-phase JDBC
  pattern: write the batch to a staging table with the DataFrame JDBC
  writer, then run one server-side statement so the merge stays a single
  transaction (SURVEY.md §7.3 item 1);
- a sheet-style append edge that collects ONLY the anti-joined delta
  (O(delta), never O(table)) and hands the rows to a pluggable writer.

No live Postgres or Sheets exists in this environment, so ``jdbc_upsert``
takes the JDBC url/properties and is exercised in tests only down to the
generated SQL; the statement text itself is pinned against the reference.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from ..operators.serve import dedup_append_delta

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _q(ident: str) -> str:
    if not _IDENT.match(ident):
        raise ValueError(f"invalid SQL identifier: {ident!r}")
    return f'"{ident}"'


def build_upsert_sql(
    table: str,
    columns: Sequence[str],
    key_columns: Sequence[str],
    staging_table: str | None = None,
) -> str:
    """The reference's upsert statement (load_fred_data.py:54-59):
    INSERT ... ON CONFLICT (keys) DO UPDATE SET <every non-key column> =
    EXCLUDED.<column>. With ``staging_table`` the VALUES list is replaced
    by SELECT from staging — the two-phase distributed pattern."""
    non_key = [c for c in columns if c not in key_columns]
    cols_sql = ", ".join(_q(c) for c in columns)
    keys_sql = ", ".join(_q(c) for c in key_columns)
    update_sql = ", ".join(f"{_q(c)} = EXCLUDED.{_q(c)}" for c in non_key)
    if staging_table:
        source = f"SELECT {cols_sql} FROM {_q(staging_table)}"
    else:
        placeholders = ", ".join(f":{c}" for c in columns)
        source = f"VALUES ({placeholders})"
    return (
        f"INSERT INTO {_q(table)} ({cols_sql}) {source} "
        f"ON CONFLICT ({keys_sql}) DO UPDATE SET {update_sql}"
    )


def build_merge_sql(
    table: str,
    columns: Sequence[str],
    key_columns: Sequence[str],
    staging_table: str,
) -> str:
    """ANSI-standard MERGE equivalent of ``build_upsert_sql`` — same
    row-level semantics (update non-key columns on key match, insert
    otherwise) for databases without Postgres's ON CONFLICT (Derby, DB2,
    SQL Server, Oracle)."""
    non_key = [c for c in columns if c not in key_columns]
    cols_sql = ", ".join(_q(c) for c in columns)
    on_sql = " AND ".join(f"t.{_q(c)} = s.{_q(c)}" for c in key_columns)
    update_sql = ", ".join(f"{_q(c)} = s.{_q(c)}" for c in non_key)
    insert_vals = ", ".join(f"s.{_q(c)}" for c in columns)
    return (
        f"MERGE INTO {_q(table)} t USING {_q(staging_table)} s ON {on_sql} "
        f"WHEN MATCHED THEN UPDATE SET {update_sql} "
        f"WHEN NOT MATCHED THEN INSERT ({cols_sql}) VALUES ({insert_vals})"
    )


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_columns: Sequence[str],
    properties: dict[str, str],
    staging_table: str | None = None,
    batchsize: int = 10_000,
    dialect: str = "postgres",
    staging_options: dict[str, str] | None = None,
) -> str:
    """Two-phase JDBC upsert: stage with the parallel DataFrame writer,
    then one server-side merge transaction (K3 parity).

    ``dialect='postgres'`` executes the reference's INSERT..ON CONFLICT
    (load_fred_data.py:54-59); ``dialect='merge'`` executes the ANSI MERGE
    equivalent (Derby/DB2/SQL Server). Returns the merge SQL it executed
    (or would execute), so callers and tests can assert the exact
    statement. Requires a JDBC driver on the Spark classpath and a
    reachable database."""
    staging = staging_table or f"{table}_staging"
    if dialect == "merge":
        sql = build_merge_sql(table, df.columns, key_columns, staging)
    elif dialect == "postgres":
        sql = build_upsert_sql(table, df.columns, key_columns, staging_table=staging)
    else:
        raise ValueError(f"unknown dialect {dialect!r}; use 'postgres' or 'merge'")
    writer = df.write.mode("overwrite").option("batchsize", str(batchsize))
    # staging_options passes writer options through, e.g.
    # createTableColumnTypes to pin VARCHAR widths where the dialect's
    # default string mapping (TEXT/CLOB) can't join against the target
    for k, v in (staging_options or {}).items():
        writer = writer.option(k, v)
    writer.jdbc(url, staging, properties=properties)
    # server-side merge in one transaction via the driver's connection
    jvm_props = df.sparkSession._jvm.java.util.Properties()  # type: ignore[union-attr]
    for k, v in properties.items():
        jvm_props.setProperty(k, v)
    conn = df.sparkSession._jvm.java.sql.DriverManager.getConnection(url, jvm_props)  # type: ignore[union-attr]
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        stmt.execute(sql)
        conn.commit()
    finally:
        conn.close()
    return sql


def read_jdbc(
    spark,
    url: str,
    query: str,
    properties: dict[str, str],
    partition_options: dict[str, str] | None = None,
) -> DataFrame:
    """S4: arbitrary SQL against an RDBMS -> DataFrame
    (load_fred_data.py:68-81's read_data_from_db).

    ``partition_options`` (partitionColumn/lowerBound/upperBound/
    numPartitions) turns the single-cursor read into a parallel range
    scan — the scale path the reference's pandas read_sql lacks."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in properties.items():
        reader = reader.option(k, v)
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def sheet_rows_to_df(spark, rows: list[list], header: list[str]) -> DataFrame:
    """S5: sheet payload (header + all-string rows) -> DataFrame.

    Sheets return everything as strings (load_fred_data_to_google.py:83-92);
    downstream dedup uses the lenient-key normalization, so no casting
    happens here — fidelity to the serving-store's actual shape."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(h, StringType(), True) for h in header])
    return spark.createDataFrame(
        [[None if c == "" else str(c) for c in r] for r in rows], schema
    )


def sheet_append_delta(
    incoming: DataFrame,
    existing: DataFrame,
    key_columns: Sequence[str],
    writer: Callable[[list[list]], None],
    lenient: bool = True,
) -> int:
    """K4: dedup append to a sheet-like store.

    The anti-join runs distributed (operators/serve.py); only the delta is
    collected and handed to ``writer`` (e.g. a gspread append_rows call) —
    O(delta) driver memory, matching the one allowed collect edge
    (SURVEY.md §4.2). Returns the number of appended rows."""
    delta = dedup_append_delta(incoming, existing, keys=list(key_columns), lenient=lenient)
    rows = [list(r) for r in delta.collect()]
    if rows:
        writer(rows)
    return len(rows)
