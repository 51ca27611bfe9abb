"""Streaming ingest dedup — the stream form of the incremental-ingest
path (``operators/dedup.py:incremental_exact_dedup``): new documents
arrive as a file-source stream, the corpus' fingerprint index is the
static side, and only never-seen content flows through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def stream_ingest_dedup(
    docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop streamed docs whose content fingerprint is already in the
    static ``index`` (fingerprint column), then drop in-stream replays.

    The cross-corpus check is a stream-static join written as LEFT OUTER
    + IS NULL — the formulation Structured Streaming's support matrix
    guarantees for a streaming left side (plain ``left_anti`` is not in
    the stream-static matrix), and exactly equivalent to the anti join
    on a batch frame, which the equivalence test exploits. The static
    side is re-read every micro-batch, so index appends committed
    between batches take effect without restarting the query; at 100 TB
    the index is a bucketed narrow table (see ``incremental_exact_dedup``)
    and the per-batch join shuffles only the micro-batch.

    In-stream duplicates are removed with stateful ``dropDuplicates`` on
    the fingerprint. The fixture documents carry no event time, so this
    form keeps full-history state; a production ingest attaches an
    arrival timestamp and uses ``dropDuplicatesWithinWatermark`` to
    bound it (same pattern as ``dedup_events_stream``).

    Returns the deduplicated doc rows (original columns). Works
    identically on batch frames for the equivalence tests.
    """
    with_fp = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    idx = index.select(
        F.col("fingerprint").alias("__fp"), F.lit(True).alias("__seen")
    )
    fresh = (
        with_fp.join(idx, "__fp", "left_outer")
        .where(F.col("__seen").isNull())
        .drop("__seen")
    )
    return fresh.dropDuplicates(["__fp"]).drop("__fp")
