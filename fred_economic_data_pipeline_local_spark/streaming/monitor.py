"""Streaming corpus-quality monitoring: watermarked windowed Gopher
pass rates over a document ingest stream.

The ingest-time dashboard a crawling pipeline alerts on — a sudden drop
in a source's keep rate inside a window means the crawler started
pulling garbage NOW, which a batch report only reveals at the next
snapshot. Quality flags are the same scan-only column arithmetic as the
batch gate (``operators/text.py:gopher_quality_flags``); the stream
adds only a watermark and an event-time window, so state is bounded and
the stream/batch unification property holds exactly (pinned in
``tests/test_streaming.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def ingest_time(df: DataFrame) -> DataFrame:
    """Attach a deterministic synthetic ingest timestamp.

    The documents fixture carries no event time, so ingest time derives
    from the id (doc_id minutes past a fixed epoch) — identical in the
    stream and batch forms, which is what makes the equivalence test
    exact. A real pipeline replaces this with the crawl timestamp
    column.
    """
    return df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(mins=F.col("doc_id").cast("int")),
    )


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents fixture (schema-pinned,
    bounded micro-batches) — the lake-ingest discovery pattern."""
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def quality_monitor(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, source) Gopher keep rates over timestamped docs.

    Works identically on a batch frame or a watermarked stream: the
    quality flags are a pure projection, the aggregate is one keyed
    window group-by, and the watermark bounds streaming state (windows
    older than max-event-time - watermark finalize and evict).
    Returns (window_start, source, n_docs, n_keep, keep_rate 6dp).
    """
    from ..operators.text import gopher_quality_flags

    flagged = gopher_quality_flags(docs.withWatermark("ts", watermark))
    return (
        flagged.groupBy(F.window("ts", window).alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q_keep").cast("long")).alias("n_keep"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "source",
            "n_docs",
            "n_keep",
            F.round(F.col("n_keep") / F.col("n_docs"), 6).alias("keep_rate"),
        )
    )
