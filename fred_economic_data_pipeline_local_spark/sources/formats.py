"""Generic lake-table format support: parquet / json-lines / csv / orc.

The reference's lake speaks JSON-lines (bronze) and parquet
(silver/gold) — ``sources/lake.py`` mirrors those layouts exactly. This
module generalizes the same sink/scan posture to every columnar/text
format Spark ships without extra jars, so a consumer pointing the
engine at CSV drops or ORC warehouses gets the identical contract:

- writes are Hive-partitioned with dynamic partition overwrite set
  PER WRITE (never trusting session conf — the same foreign-session
  safety the lake writers pin) and empty-input short-circuited
  (reference parity F3);
- reads are SCHEMA-PINNED: inference is banned on principle (CSV
  inference reads the data twice and guesses types per run; a pinned
  schema is both faster — single pass, no sampling job — and stable
  across snapshots). CSV is round-trip lossy by nature (no nested
  types, empty string == null ambiguity); the writer refuses nested
  columns rather than silently flattening.

At 100 TB: parquet/orc are the storage formats (columnar, predicate
pushdown, splittable compression); json/csv exist as EDGES — ingest
from upstream drops, export to downstream consumers — and a pipeline
reads them once and lands parquet. ``read_table`` still pushes
partition-column filters for all four (directory pruning is
format-independent); only parquet/orc additionally push data filters
into the file scan.

String fidelity contract: adversarial text (embedded newlines, quotes,
delimiters, backslashes, tabs) round-trips in all four formats. CSV
achieves it by pinning RFC 4180 quoting (quote='"', escape='"' —
doubled quotes, the dialect DuckDB/Excel/Postgres COPY agree on,
instead of Spark's default backslash escapes) and multiLine reads.
multiLine makes a CSV file non-splittable — acceptable because csv is
an edge format read once at ingest, never the 100 TB storage layout.
The one documented CSV loss: empty string and NULL collapse (both
write as nothing); don't use csv when that distinction matters.

Timestamp precision contract: Catalyst TimestampType is MICROSECOND
everywhere, and all four formats round-trip full micros — parquet and
orc natively (TIMESTAMP_MICROS / orc nanos truncated to Catalyst's
micros), csv and json via the pinned micros ``timestampFormat``
(Spark's default format truncates to millis on WRITE — the pin is the
contract). Session-timezone-stable: values are written with explicit
UTC offsets (XXX), so a reader in any session timezone reconstructs
the same instant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "json", "csv", "orc")

# micros + explicit offset: see "Timestamp precision contract" above
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _check_format(fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported lake format {fmt!r}; one of {FORMATS}")


def _has_nested(schema: StructType) -> bool:
    from pyspark.sql.types import ArrayType, MapType

    return any(
        isinstance(f.dataType, (StructType, ArrayType, MapType))
        for f in schema.fields
    )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
) -> None:
    """Partitioned, dynamic-overwrite, empty-guarded write in ``fmt``."""
    _check_format(fmt)
    if fmt == "csv" and _has_nested(df.schema):
        raise ValueError(
            "csv cannot represent nested columns; land parquet/orc instead"
        )
    if df.isEmpty():
        return
    w = df
    if partition_cols:
        w = w.repartition(*partition_cols)
    writer = (
        w.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .format(fmt)
    )
    if fmt == "csv":
        writer = (
            writer.option("header", True)
            .option("quote", '"')
            .option("escape", '"')  # RFC 4180 doubled quotes
            # Spark's CSV WRITER trims value-edge whitespace by default
            # (read defaults are already false) — fidelity pins both off
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .option("timestampFormat", _TS_FMT)
        )
    elif fmt == "json":
        writer = writer.option("timestampFormat", _TS_FMT)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Schema-pinned scan in ``fmt``; partition columns come back from
    the directory layout, so the pinned schema covers DATA columns only
    (pass the full row schema — partition fields are filtered out here,
    mirroring ``lake.read_bronze``)."""
    _check_format(fmt)
    part = set(partition_cols or [])
    data_cols = StructType([f for f in schema.fields if f.name not in part])
    reader = spark.read.schema(data_cols).format(fmt)
    if fmt == "csv":
        reader = (
            reader.option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("multiLine", True)  # embedded newlines in quoted fields
            .option("timestampFormat", _TS_FMT)
        )
    elif fmt == "json":
        reader = reader.option("timestampFormat", _TS_FMT)
    return reader.load(path)


def convert_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    schema: StructType,
    src_fmt: str,
    dst_fmt: str = "parquet",
    partition_cols: list[str] | None = None,
) -> None:
    """Land an edge-format drop as a storage format (the one-time
    ingest hop: read the csv/json edge once, write parquet/orc)."""
    df = read_table(spark, src_path, schema, src_fmt, partition_cols)
    write_table(df, dst_path, dst_fmt, partition_cols)


def lake_layout(root: str, fmt: str) -> str:
    return os.path.join(root, f"table_{fmt}")
