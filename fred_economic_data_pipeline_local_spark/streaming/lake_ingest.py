"""Streaming lakehouse ingest: ``writeStream.foreachBatch`` merging
micro-batches into a ``ManifestLakeTable`` — the Delta streaming-MERGE
sink reduced to its core.

Exactly-once, by composition of two guarantees:

- the file source + checkpoint give at-least-once micro-batch delivery
  with STABLE batch ids (a crash-restart replays the same (batch_id,
  files) assignment from the offset log);
- ``merge_into(txn=(app_id, batch_id))`` makes the commit idempotent
  per batch id: the watermark rides inside the manifest write itself,
  so a replayed batch whose commit already landed is a no-op, and a
  batch whose crash preceded the commit replays and lands once.

This is exactly Delta's ``txnAppId``/``txnVersion`` recipe
(foreachBatch being the documented idempotent-sink escape hatch for
non-append sinks), without relying on the sink to be talking to Delta.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

from ..sources.lakehouse import ManifestLakeTable


def stream_merge_into(
    stream_df: DataFrame,
    table: ManifestLakeTable,
    app_id: str,
    checkpoint_dir: str | None = None,
) -> int:
    """Drain ``stream_df`` (AvailableNow) into ``table``, one
    transactional MERGE per micro-batch. Returns the number of
    micro-batches that committed (replayed/empty batches excluded).

    The table must be initialized (``overwrite``) — bootstrap is a
    batch concern; the stream's job is incremental upsert. Each batch
    shuffles only its own rows plus the touched buckets' slices
    (``merge_into`` is O(delta)), so steady-state ingest cost tracks
    arrival rate, not table size.
    """
    applied = {"n": 0}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.merge_into(batch_df, txn=(app_id, int(batch_id))):
            applied["n"] += 1

    def _run(ckpt: str) -> None:
        q = (
            stream_df.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if checkpoint_dir is not None:
        _run(checkpoint_dir)
    else:
        with tempfile.TemporaryDirectory(prefix="lake_ingest_ckpt_") as ckpt:
            _run(ckpt)
    return applied["n"]


def stream_hll_merge(
    stream_df: DataFrame,
    table: ManifestLakeTable,
    col: str,
    p: int = 10,
    by: str | None = None,
    checkpoint_dir: str | None = None,
) -> int:
    """Maintain an HLL register table (operators/profile.hll_registers
    schema: grp?, reg, rho) under a stream: per micro-batch, sketch the
    batch and MAX-merge it into the table with one versioned overwrite
    commit. Returns the number of committed batches.

    Exactly-once is FREE here — no txn watermark needed: register max
    is idempotent, commutative and associative, so a replayed batch,
    a duplicated row, or any batch-boundary placement folds to the
    same final register table as one batch sketch of the whole input.
    (Contrast ``stream_merge_into``, whose row upserts need the
    txnAppId/txnVersion watermark.) Per batch the work is the batch's
    own register aggregate plus an O(groups x 2^p)-row merge — sketch
    state never grows with the corpus, so steady-state cost tracks
    arrival rate only.
    """
    from ..operators.profile import hll_merge, hll_registers

    applied = {"n": 0}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_regs = hll_registers(batch_df, col, p=p, by=by)
        spark = batch_df.sparkSession
        try:
            current = table.read(spark)
        except FileNotFoundError:
            # uninitialized (or empty-bootstrap) table = empty sketch;
            # the first committing batch creates it
            current = batch_regs.limit(0)
        merged = hll_merge(current, batch_regs)
        # localCheckpoint: the overwrite must not lazily re-read the
        # table dirs it is about to supersede
        table.overwrite(merged.localCheckpoint(eager=True))
        applied["n"] += 1

    def _run(ckpt: str) -> None:
        q = (
            stream_df.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if checkpoint_dir is not None:
        _run(checkpoint_dir)
    else:
        with tempfile.TemporaryDirectory(prefix="hll_ingest_ckpt_") as ckpt:
            _run(ckpt)
    return applied["n"]


def stream_cms_merge(
    stream_df: DataFrame,
    table: ManifestLakeTable,
    col: str,
    app_id: str,
    w: int = 1024,
    d: int = 4,
    checkpoint_dir: str | None = None,
) -> int:
    """Maintain a count-min sketch (operators/profile.cms_sketch schema:
    row, pos, n) under a stream: per micro-batch, sketch the batch and
    ADD it into the table with one watermarked overwrite commit.
    Returns the number of committed (non-replayed, non-empty) batches.

    CMS counters are ADDITIVE, not idempotent — a replayed micro-batch
    would double-count every item, silently inflating every estimate
    (the failure HLL's register max is immune to). So exactly-once here
    NEEDS the txnAppId/txnVersion watermark: ``overwrite(...,
    txn=(app_id, batch_id))`` records the applied batch inside the same
    atomic manifest flip that publishes the counters, and a
    checkpoint-replayed batch is a no-op. Per batch the work is the
    batch's own counter aggregate (shuffle carries at most d*w cells,
    map-combined) plus an O(d*w) read-add-overwrite — state never grows
    with the corpus.
    """
    from ..operators.profile import cms_merge, cms_sketch

    applied = {"n": 0}

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # fast-path replay skip BEFORE computing the batch sketch; the
        # authoritative check re-runs inside overwrite's locked region
        if (
            table.current_version() is not None
            and table.txn().get(app_id, -1) >= int(batch_id)
        ):
            return
        batch_cms = cms_sketch(batch_df, col, w=w, d=d)
        spark = batch_df.sparkSession
        try:
            current = table.read(spark)
        except FileNotFoundError:
            current = batch_cms.limit(0)
        merged = cms_merge(current, batch_cms)
        # localCheckpoint: the overwrite must not lazily re-read the
        # table dirs it is about to supersede
        if (
            table.overwrite(
                merged.localCheckpoint(eager=True),
                txn=(app_id, int(batch_id)),
            )
            is not None
        ):
            applied["n"] += 1

    def _run(ckpt: str) -> None:
        q = (
            stream_df.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if checkpoint_dir is not None:
        _run(checkpoint_dir)
    else:
        with tempfile.TemporaryDirectory(prefix="cms_ingest_ckpt_") as ckpt:
            _run(ckpt)
    return applied["n"]


def stream_counter_merge(
    stream_df: DataFrame,
    table: ManifestLakeTable,
    counter_fn,
    app_id: str,
    checkpoint_dir: str | None = None,
) -> int:
    """Maintain ADDITIVE per-key counters under a stream: per
    micro-batch, ``counter_fn(batch_df)`` reduces the batch to a tiny
    (key..., counter...) frame whose non-key LONG columns are summed
    into the table's running totals with one watermarked overwrite
    commit. Returns the number of committed (non-replayed, non-empty)
    batches.

    The counter schema is the table's schema: every non-key column is
    an additive LONG. Like the CMS counters (and unlike HLL's register
    max), sums are NOT idempotent — a replayed batch would double-count
    — so exactly-once rides the txnAppId/txnVersion watermark inside
    the same atomic manifest flip that publishes the totals. Per batch
    the work is the batch's own aggregate plus an O(keys) read-add-
    overwrite; state never grows with the corpus. This is the streaming
    shape of every monitoring gate (DQ violation counters, SLA
    breaches, quarantine tallies).
    """
    from pyspark.sql import functions as F

    applied = {"n": 0}
    key_cols = list(table.keys)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if (
            table.current_version() is not None
            and table.txn().get(app_id, -1) >= int(batch_id)
        ):
            return
        batch_counters = counter_fn(batch_df)
        spark = batch_df.sparkSession
        try:
            current = table.read(spark)
        except FileNotFoundError:
            current = batch_counters.limit(0)
        val_cols = [c for c in batch_counters.columns if c not in key_cols]
        merged = (
            current.unionByName(batch_counters)
            .groupBy(*key_cols)
            .agg(*[F.sum(c).alias(c) for c in val_cols])
        )
        if (
            table.overwrite(
                merged.localCheckpoint(eager=True),
                txn=(app_id, int(batch_id)),
            )
            is not None
        ):
            applied["n"] += 1

    def _run(ckpt: str) -> None:
        q = (
            stream_df.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if checkpoint_dir is not None:
        _run(checkpoint_dir)
    else:
        with tempfile.TemporaryDirectory(prefix="ctr_ingest_ckpt_") as ckpt:
            _run(ckpt)
    return applied["n"]
