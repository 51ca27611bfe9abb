"""Catalog / DDL operations (SURVEY.md §2.12 D1-D5).

The reference manages its serving schema with SQLAlchemy DDL helpers
(fred_rds_manager.py): create table from a column spec, batched column
renames, add column, truncate, and schema reflection. Here the same
operations target the Spark catalog (works against the session catalog,
Hive metastore, or any V2 catalog plugged into the session); the JDBC
passthrough variants for a Postgres serving store live in
``sources/serving.py``.

Identifiers are validated against a strict [A-Za-z_][A-Za-z0-9_]* rule
and then backtick-quoted — these helpers build DDL strings, so nothing
user-supplied may inject through them.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _q(ident: str) -> str:
    if not _IDENT.match(ident):
        raise ValueError(f"invalid SQL identifier: {ident!r}")
    return ".".join(f"`{part}`" for part in ident.split("."))


def create_table(
    spark: SparkSession,
    table: str,
    columns: dict[str, str] | StructType,
    using: str = "parquet",
    partition_by: list[str] | None = None,
    location: str | None = None,
    if_not_exists: bool = True,
) -> None:
    """D1: CREATE TABLE from a column spec (fred_rds_manager.py:72-91)."""
    if isinstance(columns, StructType):
        col_sql = ", ".join(f"{_q(f.name)} {f.dataType.simpleString()}" for f in columns.fields)
    else:
        col_sql = ", ".join(f"{_q(c)} {t}" for c, t in columns.items())
    parts = [
        f"CREATE TABLE {'IF NOT EXISTS ' if if_not_exists else ''}{_q(table)}",
        f"({col_sql}) USING {using}",
    ]
    if partition_by:
        parts.append(f"PARTITIONED BY ({', '.join(_q(c) for c in partition_by)})")
    if location:
        parts.append(f"LOCATION '{location}'")
    spark.sql(" ".join(parts))


def rename_columns(spark: SparkSession, table: str, renames: dict[str, str]) -> None:
    """D2: batch of column renames (fred_rds_manager.py:30-49).

    Native ALTER..RENAME COLUMN where the catalog supports it (Delta, V2
    catalogs); session-catalog parquet tables don't, so fall back to a
    rewrite: materialize the renamed projection to a staging table and
    swap names — the batch lands atomically-per-table like the
    reference's single-transaction rename batch."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        for old, new in renames.items():
            spark.sql(
                f"ALTER TABLE {_q(table)} RENAME COLUMN {_q(old)} TO {_q(new)}"
            )
        return
    except AnalysisException:
        pass  # v1 table — rewrite below

    staging = f"{table}__rename_staging"
    renamed = spark.table(table).withColumnsRenamed(renames)
    renamed.write.mode("overwrite").saveAsTable(staging)
    spark.sql(f"DROP TABLE {_q(table)}")
    spark.sql(f"ALTER TABLE {_q(staging)} RENAME TO {_q(table)}")


def add_columns(spark: SparkSession, table: str, columns: dict[str, str]) -> None:
    """D3: ALTER TABLE ADD COLUMNS (fred_rds_manager.py:51-70)."""
    col_sql = ", ".join(f"{_q(c)} {t}" for c, t in columns.items())
    spark.sql(f"ALTER TABLE {_q(table)} ADD COLUMNS ({col_sql})")


def truncate_table(spark: SparkSession, table: str) -> None:
    """D4: delete all rows (fred_rds_manager.py:93-110)."""
    spark.sql(f"TRUNCATE TABLE {_q(table)}")


def table_schema(spark: SparkSession, table: str) -> StructType:
    """D5: schema reflection (load_fred_data.py:51's autoload)."""
    return spark.table(table).schema
