#!/usr/bin/env python
"""Measure the O(delta) claim of PartitionedLakeTable.merge_into
(VERDICT r6 item 7): the bucket-pruned merge's read/rewrite volume must
track the DELTA's bucket footprint, not the table size.

For each delta size the tool reports, from the on-disk layout (byte
sizes are deterministic; Spark's vectorized-reader inputBytes metric is
not — see measure_shuffles.py):

  - touched buckets / total buckets;
  - target bytes READ (sum of touched partition dirs before the merge —
    the scan carries a __bucket partition filter, pinned in
    tests/test_lakehouse.py::test_merge_scan_prunes_partitions, so
    untouched directories are never listed);
  - bytes REWRITTEN (sum of touched dirs after);
  - table bytes total, and the read fraction.

    python tools/measure_merge_delta.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def dir_bytes(root: str, buckets=None) -> int:
    total = 0
    for d in os.listdir(root):
        if not d.startswith("__bucket="):
            continue
        if buckets is not None and int(d.split("=")[1]) not in buckets:
            continue
        p = os.path.join(root, d)
        total += sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if not f.startswith((".", "_"))
        )
    return total


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.session import get_spark
    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        PartitionedLakeTable,
    )

    spark = get_spark(app_name="measure-merge-delta")
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", "source", "lang", "n_chars", "text"
    )
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="merge_delta_")
    print(f"# sf_dir={SF_DIR} docs={n_docs} n_buckets=64")
    try:
        for label, pred in [
            ("1 row", F.col("doc_id") == 7),
            ("~0.1% rows", F.col("doc_id") % 1024 == 0),
            ("~1.5% rows", F.col("doc_id") % 64 == 0),
            ("~25% rows", F.col("doc_id") % 4 == 0),
        ]:
            root = os.path.join(work, label.replace(" ", "_"))
            t = PartitionedLakeTable(root, keys=["doc_id"], n_buckets=64)
            t.overwrite(docs)
            total = dir_bytes(root)
            src = docs.where(pred).withColumn("n_chars", F.col("n_chars") + 1)
            n_src = src.count()
            # read volume = touched dirs BEFORE the merge rewrites them
            touched_pre = sorted(
                r[0]
                for r in src.select(
                    F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int").alias("b")
                )
                .distinct()
                .collect()
            )
            read_b = dir_bytes(root, set(touched_pre))
            touched = t.merge_into(src)
            assert touched == touched_pre
            wrote_b = dir_bytes(root, set(touched))
            print(
                f"delta={label:11s} rows={n_src:6,}  "
                f"buckets={len(touched):2d}/64  "
                f"read={read_b:>10,}B  rewrote={wrote_b:>10,}B  "
                f"table={total:>11,}B  read_frac={read_b / total:.3f}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
