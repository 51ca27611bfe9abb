"""Structured Streaming surface: event-time windows, watermarks, state.

The reference has no streaming runtime — its temporal semantics are
batch-incremental monthly replays (SURVEY.md §2.10). This module supplies
the Spark-native streaming expression of the same semantics plus the
standard event-stream analytics a 100 TB pipeline needs:

- file-source ``readStream`` with pinned schema (incremental discovery of
  new lake files — the Airflow catchup loop replaced by
  ``Trigger.AvailableNow`` runs);
- watermarked tumbling / sliding / session windows for late data;
- an ``applyInPandasWithState`` custom stateful operator (running
  per-user aggregates with timeout-based session flush).

Every transformation here takes/returns DataFrames, so the same function
works on a batch frame (tests, oracle comparison) and a streaming frame
(production) — the Structured Streaming unification.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# events fixture schema variants: ts as raw int64 nanos (parquet
# TIMESTAMP(NANOS) generations) or a plain microsecond timestamp — the
# unit is sniffed from the footer, mirroring catalog.load_table
_EVENTS_RAW_NANOS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)
_EVENTS_MICROS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture directory.

    ``maxFilesPerTrigger`` bounds per-micro-batch work; when the fixture
    generation carries TIMESTAMP(NANOS), the timestamp is truncated to
    micros exactly as the batch reader does.
    """
    import os

    from ..catalog import _events_ts_is_nanos

    # the file source wants a directory: stream the fixture dir with a
    # glob pinned to the events file (new files matching the glob would be
    # picked up incrementally — the lake-ingest discovery pattern)
    nanos = _events_ts_is_nanos(os.path.join(sf_dir, "events.parquet"))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_EVENTS_RAW_NANOS if nanos else _EVENTS_MICROS)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling event-time aggregation.

    State is bounded by the watermark: windows older than (max event time
    - watermark) are finalized and evicted — the streaming analogue of the
    reference's idempotent month re-runs handling late FRED revisions.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Watermarked sliding-window mean (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "avg_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-based) — the streaming counterpart of
    the batch sessionize_users query (plans/timeseries_queries.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


_STATE_OUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", IntegerType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)
_STATE = StructType(
    [
        StructField("n", IntegerType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum).

    ``applyInPandasWithState`` — arbitrary per-key state the built-in
    windows can't express (the escape hatch for custom streaming
    operators). Emits one row per key per update.

    ``timeout_ms > 0`` arms a processing-time timeout that flushes and
    drops idle keys (bounding state for continuous jobs). Leave it 0 for
    ``AvailableNow`` backfills: pending timers keep an available-now run
    spinning state-cleanup micro-batches until every timer has expired,
    so bounded replays should not arm them.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_value": [total]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_STATE_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "update"
) -> DataFrame:
    """Execute a streaming frame to completion over the data available now.

    ``Trigger.AvailableNow`` + memory sink: processes every pending file in
    bounded micro-batches, then stops — the Spark-native form of the
    reference's Airflow catchup backfill. Returns the materialized result
    as a batch DataFrame (query it with spark.table too).
    """
    spark = stream_df.sparkSession
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(query_name)


def click_purchase_join(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: purchases attributed to the
    clicks they follow within ``horizon``.

    Both sides carry a watermark and the join condition bounds event time
    from BOTH directions (purchase in [click, click + horizon]), so the
    state store can evict: clicks older than the watermark + horizon can
    never match a future purchase and are dropped — bounded state, the
    requirement for an unbounded 100 TB event stream. Works identically
    on batch frames (inner range join) for the equivalence tests.
    """
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_time"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exactly-once-ish dedup: drop event_id replays within the
    watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's first-seen event time — bounded state, so
    re-delivered events (at-least-once sources, reference-style backfill
    re-runs) are suppressed without remembering every id forever. On a
    batch frame this degrades to plain dropDuplicates (full-history
    dedup), which the equivalence test exploits: the fixture has no
    cross-watermark replays, so the two agree.
    """
    keyed = events.select("event_id", "ts", "user_id", "event_type", "value")
    if events.isStreaming:
        return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return keyed.dropDuplicates(["event_id"])


def stream_upsert_sink(
    stream_df: DataFrame,
    upsert_batch,
    checkpoint_dir: str | None = None,
) -> None:
    """Streaming -> serving-store composition: run the stream to
    completion (``Trigger.AvailableNow``), handing every micro-batch to
    ``upsert_batch(batch_df, batch_id)`` — typically a closure over
    ``sources.serving.jdbc_upsert`` into the keyed serving table.

    This is the streaming form of the reference's load step
    (load_fred_data.py:36-66): because the sink is a keyed MERGE, replayed
    micro-batches (restart after failure, reprocessed files) converge to
    the same table state — end-to-end idempotence from checkpointed
    source offsets + idempotent writes, which is exactly-once delivery as
    Structured Streaming defines it. In update-mode aggregations each
    batch carries only changed keys, so merge cost tracks the delta, not
    the table.
    """
    import contextlib

    ctx = (
        contextlib.nullcontext(checkpoint_dir)
        if checkpoint_dir
        else tempfile.TemporaryDirectory(prefix="ckpt_upsert_")
    )
    with ctx as ckpt:
        q = (
            stream_df.writeStream.foreachBatch(upsert_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def dedup_replayed_events(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once view of an at-least-once event stream: drop replayed
    event ids.

    File sources redeliver on checkpoint replay and queue sources
    redeliver on ack timeout — the standard fix is keyed dedup state
    bounded by a watermark (``dropDuplicatesWithinWatermark``: a
    duplicate arriving within the watermark window is dropped; state
    older than the watermark is evicted, so memory tracks arrival rate,
    not stream history). On a batch frame the same call site degrades to
    plain ``dropDuplicates`` — duplicates are byte-identical replays, so
    any representative is THE row.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])
