"""Generic format round trips (parquet/json/csv/orc): schema-pinned
reads, partitioned dynamic-overwrite writes, value fidelity per format,
and the csv nested-column refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fred_economic_data_pipeline_local_spark.sources.formats import (
    FORMATS,
    convert_table,
    read_table,
    write_table,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _frame(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        "doc_id", "lang", "n_chars", (F.col("n_chars") / 7.0).alias("score")
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_partitioned_round_trip(spark, tmp_path, fmt):
    df = _frame(spark)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt, partition_cols=["lang"])
    back = read_table(spark, path, SCHEMA, fmt, partition_cols=["lang"])
    want = sorted(tuple(r) for r in df.collect())
    got = sorted(
        tuple(r) for r in back.select("doc_id", "lang", "n_chars", "score").collect()
    )
    assert got == want  # schema-pinned reads restore exact types/values


@pytest.mark.parametrize("fmt", FORMATS)
def test_dynamic_overwrite_keeps_sibling_partitions(spark, tmp_path, fmt):
    df = _frame(spark)
    path = str(tmp_path / fmt)
    write_table(df, path, fmt, partition_cols=["lang"])
    one_lang = df.where(F.col("lang") == "en").withColumn(
        "n_chars", F.lit(0)
    )
    write_table(one_lang, path, fmt, partition_cols=["lang"])
    back = read_table(spark, path, SCHEMA, fmt, partition_cols=["lang"])
    n_langs = back.select("lang").distinct().count()
    assert n_langs == df.select("lang").distinct().count()  # siblings intact
    assert back.where("lang = 'en' and n_chars != 0").count() == 0


def test_empty_write_guard(spark, tmp_path):
    import os

    df = _frame(spark).where("doc_id < 0")
    path = str(tmp_path / "empty")
    write_table(df, path, "orc", partition_cols=["lang"])
    assert not os.path.exists(path)  # reference F3 parity


def test_csv_refuses_nested_columns(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="nested"):
        write_table(emb, str(tmp_path / "csv"), "csv")
    sch = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    # the same frame lands fine as orc
    write_table(emb.select("vec_id", "embedding"), str(tmp_path / "orc"), "orc")
    back = read_table(spark, str(tmp_path / "orc"), sch, "orc")
    assert back.count() == emb.count()
    assert back.schema["embedding"].dataType.typeName() == "array"


def test_convert_edge_drop_to_storage(spark, tmp_path):
    """The ingest hop: csv edge drop -> parquet landing, values equal."""
    df = _frame(spark)
    csv_path, pq_path = str(tmp_path / "drop"), str(tmp_path / "landed")
    write_table(df, csv_path, "csv", partition_cols=["lang"])
    convert_table(
        spark, csv_path, pq_path, SCHEMA, "csv", "parquet",
        partition_cols=["lang"],
    )
    back = read_table(spark, pq_path, SCHEMA, "parquet", partition_cols=["lang"])
    assert sorted(map(tuple, back.select(*[f.name for f in SCHEMA]).collect())) == sorted(
        map(tuple, df.collect())
    )


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        write_table(_frame(spark), str(tmp_path / "x"), "avro")


ADVERSARIAL = [
    (1, 'line one\nline two\nline three'),          # embedded newlines
    (2, 'she said "hi, there" twice'),              # quotes + delimiter
    (3, 'a,b,,d,"e",\tf'),                          # commas/empty/tab
    (4, 'back\\slash and trailing backslash \\'),   # backslashes
    (5, '"fully quoted"'),                          # leading/trailing quote
    (6, 'uniçødé — emoji \U0001f600'),  # unicode
    (7, '\r\nwindows\r\nnewlines\r\n'),             # CRLF
    (8, ' leading and trailing spaces '),           # whitespace edges
]
ADV_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("text", StringType())]
)


@pytest.mark.parametrize("fmt", FORMATS)
def test_adversarial_strings_round_trip(spark, tmp_path, fmt):
    """Embedded newlines/quotes/delimiters survive every format — csv
    via RFC 4180 doubled-quote escaping + multiLine read."""
    df = spark.createDataFrame(ADVERSARIAL, ADV_SCHEMA)
    path = str(tmp_path / f"adv_{fmt}")
    write_table(df, path, fmt)
    got = read_table(spark, path, ADV_SCHEMA, fmt)
    assert sorted(map(tuple, got.collect())) == sorted(ADVERSARIAL)


@pytest.mark.parametrize("fmt", FORMATS)
def test_adversarial_strings_round_trip_partitioned(spark, tmp_path, fmt):
    """Same fidelity through the Hive-partitioned layout (the multiLine
    read path must compose with partition discovery)."""
    df = spark.createDataFrame(
        [(i, t, i % 2) for i, t in ADVERSARIAL],
        StructType(ADV_SCHEMA.fields + [StructField("p", LongType())]),
    )
    path = str(tmp_path / f"advp_{fmt}")
    write_table(df, path, fmt, partition_cols=["p"])
    got = read_table(
        spark,
        path,
        StructType(ADV_SCHEMA.fields + [StructField("p", LongType())]),
        fmt,
        partition_cols=["p"],
    )
    assert sorted((r["id"], r["text"], r["p"]) for r in got.collect()) == sorted(
        (i, t, i % 2) for i, t in ADVERSARIAL
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_timestamp_micros_round_trip(spark, tmp_path, fmt):
    """The documented precision contract: TimestampType round-trips at
    full microsecond precision in ALL four formats (csv/json only
    because the micros timestampFormat is pinned — Spark's default
    write format truncates to millis)."""
    import datetime

    from pyspark.sql.types import TimestampType

    rows = [
        (1, datetime.datetime(2024, 3, 1, 12, 34, 56, 123456)),
        (2, datetime.datetime(1999, 12, 31, 23, 59, 59, 999999)),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 0, 1)),
    ]
    ts_schema = StructType(
        [StructField("id", LongType()), StructField("ts", TimestampType())]
    )
    df = spark.createDataFrame(rows, ts_schema)
    path = str(tmp_path / f"ts_{fmt}")
    write_table(df, path, fmt)
    got = read_table(spark, path, ts_schema, fmt)
    assert sorted(map(tuple, got.collect())) == sorted(rows)


def test_csv_empty_string_null_collapse_is_documented_loss(spark, tmp_path):
    """The one csv fidelity exception: '' and NULL both write as
    nothing and read back as NULL. Pinned so the contract stays
    honest (parquet keeps them distinct)."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], ADV_SCHEMA
    )
    for fmt, expect in [
        ("csv", [(1, None), (2, None), (3, "x")]),
        ("parquet", [(1, ""), (2, None), (3, "x")]),
    ]:
        path = str(tmp_path / f"nullcol_{fmt}")
        write_table(df, path, fmt)
        got = read_table(spark, path, ADV_SCHEMA, fmt)
        assert sorted(map(tuple, got.collect()), key=repr) == sorted(
            expect, key=repr
        ), fmt
