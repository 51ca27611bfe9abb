"""Streaming additive-counter maintenance (the DQ-monitor shape):
boundary independence (streamed totals == one batch aggregate) and the
txn watermark that makes NON-idempotent additive state replay-safe."""

from __future__ import annotations

from pyspark.sql import functions as F


def _stream(spark, inbox, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )


def _counters(batch_df):
    bad = F.when(F.col("kind") == "bad", 1).otherwise(0)
    return batch_df.agg(
        F.lit("bad_kind").alias("rule"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(bad).alias("n_violations"),
    )


def _state(spark, table):
    return sorted(tuple(r) for r in table.read(spark).collect())


def test_stream_counters_boundary_independence_and_replay_noop(
    spark, tmp_path
):
    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        ManifestLakeTable,
    )
    from fred_economic_data_pipeline_local_spark.streaming.lake_ingest import (
        stream_counter_merge,
    )

    rows = spark.createDataFrame(
        [(i, "bad" if i % 5 == 0 else "ok") for i in range(100)],
        "id long, kind string",
    )
    inbox = str(tmp_path / "inbox")
    rows.repartition(5).write.parquet(inbox)
    t = ManifestLakeTable(str(tmp_path / "ctr"), keys=["rule"], n_buckets=2)

    n1 = stream_counter_merge(
        _stream(spark, inbox, rows.schema), t, _counters, app_id="a",
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    assert n1 >= 1
    state1 = _state(spark, t)
    # streamed totals over arbitrary micro-batch boundaries == one batch
    # aggregate of the whole input
    assert state1 == [("bad_kind", 100, 20)]

    # full replay on a FRESH checkpoint (batch ids restart at 0), same
    # app_id: every batch at-or-below the watermark -> all no-ops.
    # Without the watermark, every counter would double.
    v1 = t.current_version()
    n2 = stream_counter_merge(
        _stream(spark, inbox, rows.schema), t, _counters, app_id="a",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert n2 == 0
    assert _state(spark, t) == state1
    assert t.current_version() == v1

    # a genuinely NEW batch (different app restarts at 0 are the replay
    # case; new data under the SAME app advances the watermark and adds)
    more = spark.createDataFrame(
        [(100 + i, "bad") for i in range(10)], "id long, kind string"
    )
    inbox2 = str(tmp_path / "inbox2")
    more.write.parquet(inbox2)
    n3 = stream_counter_merge(
        _stream(spark, inbox2, rows.schema), t, _counters, app_id="b",
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    assert n3 >= 1
    assert _state(spark, t) == [("bad_kind", 110, 30)]
