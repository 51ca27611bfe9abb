"""Streaming count-min maintenance: boundary-independence (streamed
state == one batch sketch, cell-for-cell) and the txn watermark that
makes the NON-idempotent additive state replay-safe — the guarantee
HLL's register max gets for free and CMS must buy with the
txnAppId/txnVersion protocol."""

from __future__ import annotations

import os


def _state(spark, table):
    return sorted(
        tuple(r) for r in table.read(spark).collect()
    )


def _stream(spark, inbox, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )


def test_stream_cms_boundary_independence_and_replay_noop(spark, tmp_path):
    from fred_economic_data_pipeline_local_spark.operators.profile import cms_sketch
    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        ManifestLakeTable,
    )
    from fred_economic_data_pipeline_local_spark.streaming.lake_ingest import (
        stream_cms_merge,
    )

    w, d = 64, 3
    items = spark.createDataFrame(
        [(i, f"t{i % 7}") for i in range(100)], "id long, tok string"
    )
    inbox = str(tmp_path / "inbox")
    items.repartition(5).write.parquet(inbox)
    t = ManifestLakeTable(str(tmp_path / "cms"), keys=["row", "pos"], n_buckets=2)

    n1 = stream_cms_merge(
        _stream(spark, inbox, items.schema), t, "tok", app_id="a", w=w, d=d,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    assert n1 >= 1
    state1, v1 = _state(spark, t), t.current_version()

    # streamed state over arbitrary micro-batch boundaries == one batch
    # sketch of the whole input (counters add over the batch partition)
    one = sorted(tuple(r) for r in cms_sketch(items, "tok", w=w, d=d).collect())
    assert state1 == one

    # full replay on a FRESH checkpoint (batch ids restart at 0), same
    # app_id: every batch is at-or-below the watermark -> all no-ops.
    # Without the watermark this would double every counter.
    n2 = stream_cms_merge(
        _stream(spark, inbox, items.schema), t, "tok", app_id="a", w=w, d=d,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert n2 == 0
    assert t.current_version() == v1
    assert _state(spark, t) == state1

    # a DIFFERENT app_id is a new idempotence domain: the same batches
    # apply again and counters double — proving the watermark (not some
    # accident of the data) is what blocked the replay above
    n3 = stream_cms_merge(
        _stream(spark, inbox, items.schema), t, "tok", app_id="b", w=w, d=d,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    assert n3 == n1
    doubled = {(r, p): n for r, p, n in _state(spark, t)}
    base = {(r, p): n for r, p, n in state1}
    assert doubled == {k: 2 * v for k, v in base.items()}


def test_overwrite_txn_watermark_skips_applied_batches(spark, tmp_path):
    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        ManifestLakeTable,
    )

    t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=2)
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    assert t.overwrite(df, txn=("app", 0)) == 0
    # replay of batch 0 and any earlier batch: no-op, version unchanged
    assert t.overwrite(df, txn=("app", 0)) is None
    assert t.current_version() == 0
    # next batch commits; untracked writers and other apps unaffected
    assert t.overwrite(df, txn=("app", 1)) == 1
    assert t.overwrite(df) == 2
    assert t.overwrite(df, txn=("other", 0)) == 3
    assert t.txn() == {"app": 1, "other": 0}
