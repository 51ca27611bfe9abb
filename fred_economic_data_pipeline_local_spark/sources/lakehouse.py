"""Versioned parquet lake table with transactional MERGE INTO (K3's
lakehouse backend).

The reference's serving upsert is server-side SQL (``INSERT ... ON
CONFLICT (keys) DO UPDATE SET <all non-key> = EXCLUDED.*``,
load_fred_data.py:54-59). ``sources/serving.py`` executes that against
a JDBC RDBMS; this module is the second backend (SURVEY §7.1 step 4's
alternative): the same one-transaction merge semantics against parquet
in the lake, with no external store and no extra jars.

Design — a minimal copy-on-write version log, the same commit protocol
Delta/Iceberg use reduced to its core:

- table root holds immutable version directories ``v=N`` plus a
  ``_LATEST`` pointer file containing the committed version number;
- readers resolve ``_LATEST`` once and scan only ``v=N`` — a reader
  never sees a half-written merge because uncommitted version dirs are
  unreachable;
- MERGE computes ``operators.serve.upsert_merge`` (update all non-key
  columns on key match, insert unmatched — exactly the reference's
  ON CONFLICT semantics) into ``v=N+1``, then commits by atomically
  replacing ``_LATEST`` (os.replace of a same-directory temp file, the
  POSIX atomic-rename contract). The flip IS the transaction: a crash
  before it leaves the table at version N with an orphan directory the
  next merge simply overwrites; a crash after it is a completed commit.
- old versions remain readable (time travel / audit) until ``vacuum``.

Scale posture: the commit path is O(1) driver-side metadata regardless
of data size; the merge itself is the distributed full-outer join from
``upsert_merge``. This implementation rewrites the full table per
version (copy-on-write over one un-partitioned table); at 100 TB the
table is hash-bucketed on the merge key (operators/bucketing.py) and
only buckets containing source keys need rewriting — the version-dir +
pointer protocol is unchanged by that optimization.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..operators.serve import upsert_merge

_VDIR = re.compile(r"^v=(\d+)$")


class LakeTable:
    """A versioned parquet table at ``root`` supporting transactional
    keyed MERGE INTO."""

    def __init__(self, root: str):
        self.root = root

    # --- version log ---------------------------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def current_version(self) -> int | None:
        """Committed version, or None for an uninitialized table."""
        try:
            with open(self._latest_path()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def versions(self) -> list[int]:
        """All version directories present on disk (committed or orphaned)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            m = _VDIR.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _commit(self, version: int) -> None:
        """Atomically flip the _LATEST pointer (same-dir temp + os.replace)."""
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._latest_path())

    def _vpath(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    # --- I/O -----------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"lake table {self.root} has no committed version")
        return spark.read.parquet(self._vpath(v))

    def overwrite(self, df: DataFrame) -> int:
        """(Re)initialize the table: write version 0 and commit it.
        Orphan higher versions from earlier runs are overwritten by
        subsequent merges, never read (unreachable via _LATEST)."""
        os.makedirs(self.root, exist_ok=True)
        df.write.mode("overwrite").parquet(self._vpath(0))
        self._commit(0)
        return 0

    def merge_into(self, source: DataFrame, keys: list[str] | None = None) -> int:
        """MERGE semantics of load_fred_data.py:54-59 in one commit:
        key match -> update every non-key column from ``source``,
        no match -> insert the source row; untouched target rows carry
        over. Returns the committed version. Re-running the same merge
        commits a new version with identical content (idempotent by
        value)."""
        spark = source.sparkSession
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(
                f"lake table {self.root} is uninitialized; call overwrite() first"
            )
        target = self.read(spark, cur)
        merged = upsert_merge(target, source, keys)
        nxt = cur + 1
        merged.write.mode("overwrite").parquet(self._vpath(nxt))
        self._commit(nxt)
        return nxt

    def vacuum(self, keep: int = 1) -> list[int]:
        """Drop all version directories except the newest ``keep``
        committed-or-newer ones. Never drops the current version.
        Returns the removed version numbers."""
        import shutil

        cur = self.current_version()
        vs = self.versions()
        protect = set(vs[-keep:]) if keep > 0 else set()
        if cur is not None:
            protect.add(cur)
        removed = []
        for v in vs:
            if v not in protect:
                shutil.rmtree(self._vpath(v), ignore_errors=True)
                removed.append(v)
        return removed


class PartitionedLakeTable:
    """Key-bucketed parquet lake table with O(delta-buckets) MERGE INTO —
    the scale variant of ``LakeTable``.

    ``LakeTable`` rewrites the whole table per version (copy-on-write),
    which buys all-or-nothing commits but costs O(table) per merge. At
    100 TB the table must instead be laid out so a merge rewrites only
    the data it touches: rows are hash-bucketed on the merge key into
    ``n_buckets`` Hive partitions (``__bucket = pmod(xxhash64(keys),
    n)``), and MERGE:

    1. computes the source's touched bucket set (<= n_buckets values,
       driver-side by construction — this is the one intentional
       collect, bounded by the bucket count, never the data);
    2. reads ONLY those partitions of the target (Catalyst partition
       pruning — the scan lists just the touched directories);
    3. runs the same ``upsert_merge`` on that slice;
    4. writes back with dynamic partition overwrite, replacing only the
       touched partition directories.

    Work per merge is O(|delta| + |touched buckets' data|), independent
    of total table size. The tradeoff vs ``LakeTable`` is atomicity
    granularity: dynamic overwrite commits per partition, not per
    table (the same tradeoff Hive-style pipelines accept; a global
    commit needs the version-pointer design, which is what ``LakeTable``
    provides — at 100 TB real deployments layer file-level logs à la
    Delta/Iceberg, whose commit protocol ``LakeTable._commit`` models).
    """

    def __init__(self, root: str, keys: list[str], n_buckets: int = 64):
        self.root = root
        self.keys = list(keys)
        self.n_buckets = n_buckets

    def _bucket(self) -> "F.Column":
        from pyspark.sql import functions as F

        return F.pmod(F.xxhash64(*self.keys), F.lit(self.n_buckets)).cast("int")

    def overwrite(self, df: DataFrame) -> None:
        (
            df.withColumn("__bucket", self._bucket())
            .repartition("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(self.root)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.root).drop("__bucket")

    def merge_into(self, source: DataFrame) -> list[int]:
        """MERGE with bucket-pruned rewrite; returns the touched bucket
        ids (sorted). Read-back equals ``upsert_merge(full_target,
        source)`` because a key's rows can only ever live in its own
        bucket — untouched buckets cannot contain source keys."""
        from pyspark.sql import functions as F

        spark = source.sparkSession
        src = source.withColumn("__bucket", self._bucket())
        touched = sorted(
            r[0] for r in src.select("__bucket").distinct().collect()
        )
        target_slice = (
            spark.read.parquet(self.root)
            .where(F.col("__bucket").isin(touched))
            .drop("__bucket")
        )
        merged = upsert_merge(target_slice, src.drop("__bucket"), self.keys)
        (
            merged.withColumn("__bucket", self._bucket())
            .repartition("__bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bucket")
            .parquet(self.root)
        )
        return touched
