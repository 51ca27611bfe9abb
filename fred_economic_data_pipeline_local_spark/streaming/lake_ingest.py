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
