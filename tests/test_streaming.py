"""Structured Streaming: AvailableNow runs over the events fixture must
agree with the equivalent batch computation (stream/batch unification)."""

from __future__ import annotations

import pytest

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.streaming.windows import (
    run_available_now,
    running_user_totals,
    session_windows,
    sliding_avg,
    stream_events,
    tumbling_counts,
)

from .conftest import SF_DIR


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_counts_stream_matches_batch(spark):
    batch = tumbling_counts(load_table(spark, "events", SF_DIR))
    streamed = run_available_now(
        tumbling_counts(stream_events(spark, SF_DIR)), "t_tumbling"
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0


def test_sliding_avg_stream_matches_batch(spark):
    batch = sliding_avg(load_table(spark, "events", SF_DIR))
    streamed = run_available_now(
        sliding_avg(stream_events(spark, SF_DIR)), "t_sliding"
    )
    cols = ["window_start", "window_end", "event_type", "avg_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_session_windows_stream_runs(spark):
    # session-window aggregation only supports append/complete sinks
    streamed = run_available_now(
        session_windows(stream_events(spark, SF_DIR)), "t_sessions", "complete"
    )
    assert streamed.count() > 0
    # every session has at least one event and a well-formed interval
    bad = streamed.where("n_events < 1 OR session_end < session_start")
    assert bad.count() == 0


def test_running_user_totals_stateful(spark):
    streamed = run_available_now(
        running_user_totals(stream_events(spark, SF_DIR)), "t_state"
    )
    # update-mode emits one row per key per micro-batch; the LAST row per
    # user carries the final running totals -> compare against batch agg
    import pyspark.sql.functions as F

    batch = (
        load_table(spark, "events", SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("total_value"),
        )
    )
    finals = (
        streamed.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("total_value"), 2).alias("total_value"),
        )
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(finals, cols) == _rows(batch, cols)


def test_click_purchase_join_stream_matches_batch(spark):
    from fred_economic_data_pipeline_local_spark.streaming.windows import (
        click_purchase_join,
    )

    batch = click_purchase_join(load_table(spark, "events", SF_DIR))
    streamed = run_available_now(
        click_purchase_join(stream_events(spark, SF_DIR)), "t_ss_join", "append"
    )
    cols = ["user_id", "click_id", "click_time", "purchase_time", "purchase_value"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0


def test_streaming_dedup_matches_batch(spark):
    from fred_economic_data_pipeline_local_spark.streaming.windows import (
        dedup_events_stream,
    )

    batch = dedup_events_stream(load_table(spark, "events", SF_DIR))
    streamed = run_available_now(
        dedup_events_stream(stream_events(spark, SF_DIR)), "t_dedup", "append"
    )
    assert streamed.count() == batch.count()
    # ids must be unique after dedup
    assert streamed.select("event_id").distinct().count() == streamed.count()


def test_curation_ops_are_streaming_safe(spark):
    """The narrow curation operators (quality gate, deterministic sample,
    repetition-free projections) are stateless DataFrame transforms, so
    the same function body runs on a streaming frame and agrees with the
    batch result — curation can run incrementally as documents land."""
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.operators.curation import (
        hash_sample,
    )
    from fred_economic_data_pipeline_local_spark.operators.text import (
        token_count,
    )

    def curate(df):
        gated = df.where(token_count(F.col("text")) >= 5)
        return hash_sample(gated, "text", 4).select("doc_id", "lang", "source")

    batch = curate(load_table(spark, "documents", SF_DIR))
    stream_docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    streamed = run_available_now(curate(stream_docs), "t_curate", "append")
    cols = ["doc_id", "lang", "source"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_round3_text_ops_are_streaming_safe(spark):
    """Gopher flags, the linear quality scorer, chunking, and split
    assignment are stateless projections — they run unchanged on a
    streaming frame and agree with the batch result."""
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.operators.curation import (
        assign_split,
    )
    from fred_economic_data_pipeline_local_spark.operators.text import (
        chunk_tokens,
        gopher_quality_flags,
        score_linear,
    )
    from fred_economic_data_pipeline_local_spark.plans.llm_queries import (
        QUALITY_WEIGHTS,
    )

    def curate(df):
        flagged = gopher_quality_flags(df).select("doc_id", "text", "q_keep")
        scored = score_linear(flagged, QUALITY_WEIGHTS).select(
            "id", F.col("score")
        )
        chunks = chunk_tokens(assign_split(flagged.where("q_keep"))).select(
            "id", "chunk_id", "n_chunk_tokens"
        )
        return chunks.join(scored, "id")

    batch = curate(load_table(spark, "documents", SF_DIR))
    stream_docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
    )
    streamed = run_available_now(curate(stream_docs), "t_curate3", "append")
    cols = ["id", "chunk_id", "n_chunk_tokens", "score"]
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_ingest_dedup_matches_incremental_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        duplicate_groups,
        incremental_exact_dedup,
    )
    from fred_economic_data_pipeline_local_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    existing = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha  BETA"),   # cross-corpus dup under normalization
            (11, "fresh one"),
            (12, "fresh one"),     # in-stream dup of 11
            (13, "fresh two"),
        ],
        "doc_id long, text string",
    )
    inc_dir = str(tmp_path / "incoming")
    incoming.repartition(2).write.parquet(inc_dir)
    index = duplicate_groups(existing).select("fingerprint", "keep_id")

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(inc_dir)
    streamed = run_available_now(
        stream_ingest_dedup(stream, index), "t_ingest_dedup", "append"
    )
    # batch equivalence on CONTENT: the stream keeps the first arrival per
    # fingerprint (order nondeterministic across files), the batch path
    # keeps the min id — same fingerprint set either way
    batch_kept, _ = incremental_exact_dedup(incoming, index)
    fp = lambda df: {
        r[0]
        for r in df.select(
            F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
        ).collect()
    }
    assert fp(streamed) == fp(batch_kept)
    assert streamed.count() == 2  # "fresh one" once, "fresh two"
    # batch frames run the identical plan (left outer + filter == anti)
    assert fp(stream_ingest_dedup(incoming, index)) == fp(batch_kept)


def test_quality_monitor_stream_matches_batch(spark):
    """The watermarked windowed Gopher keep-rate monitor is the same
    computation on a stream and a batch frame (stream/batch
    unification) — and it must produce non-trivial windows."""
    from fred_economic_data_pipeline_local_spark.streaming.monitor import (
        ingest_time,
        quality_monitor,
        stream_documents,
    )

    batch = quality_monitor(ingest_time(load_table(spark, "documents", SF_DIR)))
    streamed = run_available_now(
        quality_monitor(ingest_time(stream_documents(spark, SF_DIR))),
        "t_quality_monitor",
    )
    cols = ["window_start", "source", "n_docs", "n_keep", "keep_rate"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 1


def test_stream_merge_into_lake_exactly_once(spark, tmp_path):
    """foreachBatch lake ingest: N micro-batches of upserts land as N
    transactional merges; a crash-replayed batch is a no-op (the txn
    watermark rides in the manifest commit itself)."""
    import pyspark.sql.functions as F

    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        ManifestLakeTable,
    )
    from fred_economic_data_pipeline_local_spark.streaming.lake_ingest import (
        stream_merge_into,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "lang", "n_chars"
    )
    inbox = str(tmp_path / "inbox")
    docs.where(F.col("doc_id") >= 10).repartition(4).write.parquet(inbox)
    t = ManifestLakeTable(str(tmp_path / "lake"), keys=["doc_id"], n_buckets=8)
    t.overwrite(docs.where(F.col("doc_id") < 10))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    ckpt = str(tmp_path / "ckpt")
    n = stream_merge_into(stream, t, app_id="ingest-test", checkpoint_dir=ckpt)
    assert n >= 2  # maxFilesPerTrigger=1 over 4 files -> several batches
    got = sorted(tuple(r) for r in t.read(spark).collect())
    want = sorted(tuple(r) for r in docs.collect())
    assert got == want
    # the manifest carries the per-app watermark
    wm = t.txn()["ingest-test"]
    assert wm >= n - 1

    # crash-replay simulation: re-merging an already-applied batch id
    # is a no-op — no new version, content unchanged
    v_before = t.current_version()
    assert t.merge_into(docs.limit(3), txn=("ingest-test", wm)) == []
    assert t.current_version() == v_before

    # a NEW batch id still commits
    assert t.merge_into(
        docs.limit(1).withColumn("lang", F.lit("xx")),
        txn=("ingest-test", wm + 1),
    )
    assert t.txn()["ingest-test"] == wm + 1

    # rerunning the whole stream from the same checkpoint drains nothing
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    assert stream_merge_into(stream2, t, "ingest-test", ckpt) == 0


def test_replay_dedup_stream_restores_exactly_once(spark, tmp_path):
    import os
    import shutil

    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.streaming.windows import (
        dedup_replayed_events,
    )

    # an at-least-once source: the same events file delivered twice
    src = os.path.join(SF_DIR, "events.parquet")
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    shutil.copy(src, os.path.join(inbox, "events_a.parquet"))
    shutil.copy(src, os.path.join(inbox, "events_b.parquet"))

    from fred_economic_data_pipeline_local_spark.catalog import (
        _events_ts_is_nanos,
    )
    from fred_economic_data_pipeline_local_spark.streaming.windows import (
        _EVENTS_MICROS,
        _EVENTS_RAW_NANOS,
    )

    nanos = _events_ts_is_nanos(src)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            _EVENTS_RAW_NANOS if nanos else _EVENTS_MICROS
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    if nanos:
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    streamed = run_available_now(
        dedup_replayed_events(raw), "t_replay_dedup", "append"
    )
    n_exact = load_table(spark, "events", SF_DIR).count()
    assert streamed.count() == n_exact
    assert streamed.select("event_id").distinct().count() == n_exact


class TestStreamHllMerge:
    def _table(self, spark, tmp_path, docs):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        # no bootstrap: the first committing batch creates the sketch
        return ManifestLakeTable(
            str(tmp_path / "sketch"), keys=["grp", "reg"], n_buckets=2
        )

    def test_streamed_state_equals_batch_sketch(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.operators.profile import (
            hll_registers,
        )
        from fred_economic_data_pipeline_local_spark.streaming.lake_ingest import (
            stream_hll_merge,
        )

        docs = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(300)], "doc_id long, source string"
        )
        inbox = str(tmp_path / "inbox")
        docs.repartition(5).write.parquet(inbox)
        t = self._table(spark, tmp_path, docs)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        n = stream_hll_merge(stream, t, "doc_id", p=8, by="source")
        assert n >= 2  # genuinely multi-batch
        streamed = {
            (r["grp"], r["reg"], r["rho"]) for r in t.read(spark).collect()
        }
        batch = {
            (r["grp"], r["reg"], r["rho"])
            for r in hll_registers(docs, "doc_id", p=8, by="source").collect()
        }
        assert streamed == batch

    def test_replay_is_a_no_op_by_idempotence(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.streaming.lake_ingest import (
            stream_hll_merge,
        )

        docs = spark.createDataFrame(
            [(i, "s") for i in range(100)], "doc_id long, source string"
        )
        inbox = str(tmp_path / "inbox")
        docs.write.parquet(inbox)
        t = self._table(spark, tmp_path, docs)
        stream = spark.readStream.schema(docs.schema).parquet(inbox)
        stream_hll_merge(
            stream, t, "doc_id", p=8, by="source",
            checkpoint_dir=str(tmp_path / "ck1"),
        )
        before = {tuple(r) for r in t.read(spark).collect()}
        # a FRESH checkpoint re-delivers every file: max-merge must fold
        # the duplicate delivery to the identical state
        stream2 = spark.readStream.schema(docs.schema).parquet(inbox)
        stream_hll_merge(
            stream2, t, "doc_id", p=8, by="source",
            checkpoint_dir=str(tmp_path / "ck2"),
        )
        after = {tuple(r) for r in t.read(spark).collect()}
        assert before == after
