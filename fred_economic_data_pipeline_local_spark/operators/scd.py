"""Type-2 slowly-changing-dimension history from the lakehouse commit log.

The reference's serving layer keeps only current state (one row per key,
upserted in place — load_fred_data.py:54-59). A warehouse consumer of
the same data usually wants the OTHER contract: every historical value
a key has held, effective-dated — SCD Type 2. Rather than making
writers maintain a history table (a second write path to keep
consistent), the history is derivable after the fact from the
``ManifestLakeTable`` commit log: each version hop's ``changes()`` feed
is an event stream, and SCD2 epochs are one window function over it.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def committed_versions(table) -> list[int]:
    """All committed manifest versions, ascending (commit-log metadata:
    O(#versions) driver-side listing, no data touched)."""
    mdir = os.path.join(table.root, "_manifests")
    out = []
    for name in os.listdir(mdir):
        m = re.fullmatch(r"m=(\d+)\.json", name)
        if m:
            out.append(int(m.group(1)))
    cur = table.current_version()
    # debris above _LATEST (a crashed writer's un-flipped manifest) is
    # not committed history
    return sorted(v for v in out if cur is not None and v <= cur)


def scd2_history(
    spark: SparkSession, table, keys: list[str] | None = None
) -> DataFrame:
    """Reconstruct the SCD Type-2 history of ``table`` from its change
    feeds: one row per (key, attribute-epoch) with ``valid_from`` /
    ``valid_to`` version bounds (``valid_to`` null = current).

    Event algebra: version 0's full read enters as inserts at 0; each
    hop's ``changes()`` enters at the destination version. An insert or
    update OPENS an epoch at its version; the next event on the same key
    (any type — a delete closes without opening) bounds it at
    ``lead(version) - 1``. Byte-identical rewrites never reach the feed,
    so epochs are genuine value changes, never file-layout noise.

    Cost: each hop's feed is the O(delta) manifest diff — the union is
    sized by total change volume, not versions x table size; the one
    shuffle is the per-key window (the same key partitioning every feed
    already carries). Version count is commit-log metadata, so the
    driver loop is bounded by history length, not data.
    """
    keys = list(keys or table.keys)
    versions = committed_versions(table)
    if not versions:
        raise FileNotFoundError(
            f"manifest lake table {table.root} has no committed version"
        )
    v0 = versions[0]
    base = table.read(spark, v0).withColumns(
        {
            "_change_type": F.lit("insert"),
            "__v": F.lit(v0),
        }
    )
    feeds = [base]
    for lo, hi in zip(versions, versions[1:]):
        feeds.append(
            table.changes(spark, lo, hi).withColumn("__v", F.lit(hi))
        )
    events = feeds[0]
    for f in feeds[1:]:
        events = events.unionByName(f, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy("__v")
    bounded = events.withColumn("__next", F.lead("__v").over(w))
    attrs = [
        c
        for c in bounded.columns
        if c not in keys and c not in ("_change_type", "__v", "__next")
    ]
    return (
        bounded.where(
            F.col("_change_type").isin("insert", "update", "update_postimage")
        )
        .select(
            *keys,
            *attrs,
            F.col("__v").alias("valid_from"),
            (F.col("__next") - 1).alias("valid_to"),
        )
    )
