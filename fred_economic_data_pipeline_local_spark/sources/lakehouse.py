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
  Either way the crashed writer leaves a stale ``_LOCK`` (see below),
  so the failure is surfaced explicitly rather than silently retried.
- writes are SINGLE-WRITER, enforced by an O_CREAT|O_EXCL ``_LOCK``
  sentinel (``ConcurrentWriteError`` for the loser — two merges racing
  from version N would otherwise both claim v=N+1); after a crash the
  operator verifies the holder pid is dead and calls ``break_lock()``.
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

import datetime
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.serve import upsert_merge

_VDIR = re.compile(r"^v=(\d+)$")


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted to mutate a lake table while another
    writer holds its ``_LOCK``. Single-writer is a documented invariant
    of both table variants (the reference's writes are serialized by
    its orchestrator — dags/fred_historical_backfill.py:172 chains
    extract >> transform >> aggregate >> load — and these tables keep
    that contract rather than pretending to multi-writer semantics a
    pointer file cannot provide)."""


class _WriterLock:
    """O_CREAT|O_EXCL sentinel at ``<root>/_LOCK`` — atomic on POSIX and
    ignored by Spark reads (underscore-prefixed). The file records
    holder pid + UTC time so a stale lock after a writer crash is
    diagnosable; recovery is explicit (``break_lock``) after verifying
    the holder is dead, never automatic (a timeout-based steal would
    reintroduce the two-writer race it exists to prevent)."""

    def __init__(self, root: str):
        self.path = os.path.join(root, "_LOCK")

    def acquire(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(self.path) as fh:
                    holder = fh.read().strip()
            except OSError:
                holder = "<unreadable>"
            raise ConcurrentWriteError(
                f"lake table {os.path.dirname(self.path)} is locked by "
                f"[{holder}]; if that writer crashed, verify it is dead "
                f"and call break_lock() (or delete {self.path})"
            ) from None
        with os.fdopen(fd, "w") as fh:
            fh.write(
                f"pid={os.getpid()} "
                f"at={datetime.datetime.now(datetime.timezone.utc).isoformat()}"
            )

    def release(self) -> None:
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


class _LockedTable:
    """Shared single-writer surface for every lake variant: the
    ``_WriterLock`` plus its explicit crash-recovery escape hatch
    (one implementation — a behavior change here applies to all three
    variants in lockstep)."""

    def break_lock(self) -> None:
        """Remove a stale ``_LOCK`` left by a crashed writer. Caller
        asserts the holder (pid in the file) is dead."""
        self._lock.release()


class _KeyBucketedTable(_LockedTable):
    """Adds the shared key→bucket expression. Both bucketed variants
    MUST agree on it byte-for-byte — a divergence would silently break
    cross-variant migrations and every oracle that re-derives bucket
    ids — so it lives in exactly one place."""

    def _bucket(self) -> "F.Column":
        from pyspark.sql import functions as F

        return F.pmod(F.xxhash64(*self.keys), F.lit(self.n_buckets)).cast("int")


class LakeTable(_LockedTable):
    """A versioned parquet table at ``root`` supporting transactional
    keyed MERGE INTO."""

    def __init__(self, root: str):
        self.root = root
        self._lock = _WriterLock(root)

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
        self._lock.acquire()
        try:
            df.write.mode("overwrite").parquet(self._vpath(0))
            self._commit(0)
        finally:
            self._lock.release()
        return 0

    def merge_into(self, source: DataFrame, keys: list[str] | None = None) -> int:
        """MERGE semantics of load_fred_data.py:54-59 in one commit:
        key match -> update every non-key column from ``source``,
        no match -> insert the source row; untouched target rows carry
        over. Returns the committed version. Re-running the same merge
        commits a new version with identical content (idempotent by
        value)."""
        spark = source.sparkSession
        # single-writer enforced: two concurrent merges would both read
        # version N and race to write v=N+1 / flip _LATEST — lost
        # update. current_version() is read INSIDE the locked region:
        # the lock is non-blocking, so a pre-lock read lets writer B
        # observe N while A commits N+1, then acquire after A releases
        # and rewrite A's committed version (ADVICE r7 TOCTOU).
        self._lock.acquire()
        try:
            cur = self.current_version()
            if cur is None:
                raise FileNotFoundError(
                    f"lake table {self.root} is uninitialized; "
                    "call overwrite() first"
                )
            target = self.read(spark, cur)
            merged = upsert_merge(target, source, keys)
            nxt = cur + 1
            merged.write.mode("overwrite").parquet(self._vpath(nxt))
            self._commit(nxt)
        finally:
            self._lock.release()
        return nxt

    def vacuum(self, keep: int = 1) -> list[int]:
        """Drop all version directories except the newest ``keep``
        committed-or-newer ones. Never drops the current version.
        Returns the removed version numbers. Takes the writer lock:
        an unlocked vacuum racing a mid-merge writer could delete the
        staged-but-uncommitted next version dir."""
        import shutil

        self._lock.acquire()
        try:
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
        finally:
            self._lock.release()


class PartitionedLakeTable(_KeyBucketedTable):
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

    Writer contract and crash matrix (VERDICT r6 item 5):

    - SINGLE WRITER, enforced: every mutation takes the ``_LOCK``
      sentinel (O_CREAT|O_EXCL); a second writer gets
      ``ConcurrentWriteError`` instead of silently interleaving
      partition overwrites (two dynamic overwrites of the same bucket
      commit file-by-file — interleaving would mix their row sets).
      The reference's writes are Airflow-serialized
      (dags/fred_historical_backfill.py:172); the lock turns that
      implicit assumption into a checked invariant.
    - Crash BEFORE any partition commit (during task writes): data dirs
      unchanged; leftovers are underscore-prefixed staging
      (``_temporary``) that readers ignore; the stale ``_LOCK`` makes
      the failure explicit — operator verifies the writer is dead,
      calls ``break_lock()``, and the next merge's ``clean_orphans``
      sweep removes staging debris.
    - Crash DURING partition commits: TORN table — some touched buckets
      already hold merged data, others still the old state. Every
      bucket is individually consistent (complete parquet, never a
      half-file: commit is a directory rename), so reads succeed and
      per-bucket atomicity is the guarantee readers get. RE-RUNNING THE
      SAME MERGE HEALS: upsert_merge is idempotent by value per key and
      buckets partition the key space, so replaying the merge brings
      every touched bucket — already-committed or not — to the same
      final state (pinned in tests/test_lakehouse.py).
    - Crash AFTER all partition commits (before lock release): merge is
      complete; recovery is just ``break_lock()``.
    """

    def __init__(self, root: str, keys: list[str], n_buckets: int = 64):
        self.root = root
        self.keys = list(keys)
        self.n_buckets = n_buckets
        self._lock = _WriterLock(root)

    def clean_orphans(self) -> list[str]:
        """Remove writer-staging debris (underscore/dot-prefixed entries
        other than the data partitions and the lock) left by a crashed
        write. Readers never see these (Spark hides _/. paths); the
        sweep just reclaims space. Runs under the writer lock — also
        called automatically at the start of every merge."""
        self._lock.acquire()
        try:
            return self._clean_orphans_locked()
        finally:
            self._lock.release()

    def _clean_orphans_locked(self) -> list[str]:
        removed = []
        if not os.path.isdir(self.root):
            return removed
        for name in os.listdir(self.root):
            if name.startswith("__bucket=") or name in ("_LOCK", "_SUCCESS"):
                continue
            if name.startswith(("_", ".")):
                p = os.path.join(self.root, name)
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(
                    p
                ) else os.remove(p)
                removed.append(name)
        return removed

    def overwrite(self, df: DataFrame) -> None:
        self._lock.acquire()
        try:
            (
                df.withColumn("__bucket", self._bucket())
                .repartition("__bucket")
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(self.root)
            )
        finally:
            self._lock.release()

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.root).drop("__bucket")

    def merge_into(self, source: DataFrame) -> list[int]:
        """MERGE with bucket-pruned rewrite; returns the touched bucket
        ids (sorted). Read-back equals ``upsert_merge(full_target,
        source)`` because a key's rows can only ever live in its own
        bucket — untouched buckets cannot contain source keys."""
        from pyspark.sql import functions as F

        spark = source.sparkSession
        self._lock.acquire()
        try:
            self._clean_orphans_locked()
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
        finally:
            self._lock.release()
        return touched


class ManifestLakeTable(_KeyBucketedTable):
    """Key-bucketed lake table with a FILE-LEVEL commit log: global
    atomic commits AND O(delta-buckets) merges — the combination the
    other two variants trade against each other, and the reduced core
    of the Delta/Iceberg design (immutable data files + a manifest
    naming the current file set + an atomic pointer flip).

    Layout:

    - ``data/b{bucket}_v{N}/``  immutable parquet directories, one per
      (bucket, version-that-rewrote-it); never mutated, never deleted
      until ``vacuum``;
    - ``_manifests/m={N}.json`` the commit log: version N's complete
      {bucket: data dir} mapping. A merge's manifest REFERENCES the
      untouched buckets' existing directories — untouched data is not
      rewritten, not even re-listed by Spark (reads list files from
      the manifest, not from directory discovery);
    - ``_LATEST`` the committed manifest number, flipped by
      same-directory os.replace — the one atomic transition. A reader
      resolves it once and sees exactly one manifest's file set; a
      crash ANYWHERE before the flip leaves the table at the prior
      version with unreachable orphan dirs (global all-or-nothing, the
      property ``PartitionedLakeTable``'s per-partition commits give
      up), plus the stale ``_LOCK`` that makes the failure explicit.

    Reads prune through the manifest: ``read_buckets`` selects the
    touched buckets' directories driver-side (O(n_buckets) metadata —
    the manifest is the pruning index, the same job Delta's file
    statistics do), so a merge's target scan lists only touched
    directories without relying on Hive partition discovery.

    Crash matrix: identical to ``LakeTable`` (commit = pointer flip)
    with ``vacuum`` extended to drop data dirs no retained manifest
    references. Single-writer enforced by ``_WriterLock``.
    """

    def __init__(
        self,
        root: str,
        keys: list[str],
        n_buckets: int = 64,
        stats_cols: list[str] | None = None,
    ):
        self.root = root
        self.keys = list(keys)
        self.n_buckets = n_buckets
        # zone maps: per-bucket [min, max] for these columns ride in the
        # manifest (Delta/Iceberg file statistics reduced to its core),
        # so range predicates on NON-key columns prune buckets
        # driver-side before any file is listed. Numeric/string columns
        # only (values must round-trip JSON); stats ignore nulls, which
        # is safe because range predicates exclude nulls anyway.
        self.stats_cols = list(stats_cols or [])
        self._lock = _WriterLock(root)

    # --- commit log ----------------------------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"m={version}.json")

    def current_version(self) -> int | None:
        try:
            with open(self._latest_path()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _manifest_doc(self, version: int | None = None) -> dict:
        import json

        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(
                f"manifest lake table {self.root} has no committed version"
            )
        with open(self._manifest_path(v)) as fh:
            doc = json.load(fh)
        if "buckets" not in doc:  # pre-stats manifest format
            doc = {"buckets": doc, "stats": {}}
        return doc

    def manifest(self, version: int | None = None) -> dict[int, str]:
        """{bucket: data-dir relative path} for a committed version."""
        return {int(b): p for b, p in self._manifest_doc(version)["buckets"].items()}

    def layout(self, version: int | None = None) -> str:
        """'hash' (key-bucketed; merges allowed) or 'zorder' (cluster-
        ordered by ``optimize_zorder``; read-optimized, merge-frozen
        until the next overwrite re-establishes key bucketing)."""
        return self._manifest_doc(version).get("layout", "hash")

    def txn(self, version: int | None = None) -> dict[str, int]:
        """{app_id: highest applied batch version} — the idempotent-
        writer watermarks a committed version carries (empty when no
        transactional writer has committed)."""
        return dict(self._manifest_doc(version).get("txn", {}))

    def stats(self, version: int | None = None) -> dict[int, dict[str, list]]:
        """{bucket: {col: [min, max]}} zone maps for a committed version
        (empty where stats_cols wasn't set when the bucket was written)."""
        return {
            int(b): s for b, s in self._manifest_doc(version)["stats"].items()
        }

    def _commit(
        self,
        version: int,
        mapping: dict[int, str],
        stats: dict[int, dict[str, list]] | None = None,
        layout: str = "hash",
        txn_update: dict[str, int] | None = None,
    ) -> None:
        """Write manifest N, fsync it, then atomically flip _LATEST.

        The per-application transaction watermarks (Delta's
        txnAppId/txnVersion idempotent-writer protocol) ride INSIDE the
        manifest so "data committed" and "batch recorded as applied"
        are one atomic transition — a crash can never persist one
        without the other."""
        import json

        cur = self.current_version()
        txn: dict[str, int] = {}
        if cur is not None:
            try:
                txn = dict(self._manifest_doc(cur).get("txn", {}))
            except FileNotFoundError:
                pass
        if txn_update:
            txn.update(txn_update)
        os.makedirs(os.path.dirname(self._manifest_path(version)), exist_ok=True)
        mpath = self._manifest_path(version)
        with open(mpath, "w") as fh:
            json.dump(
                {
                    "buckets": {str(b): p for b, p in mapping.items()},
                    "stats": {str(b): s for b, s in (stats or {}).items()},
                    "layout": layout,
                    "txn": txn,
                    # bucketing spec rides in the commit so every later
                    # writer/reader instance can validate its routing
                    # against what is actually on disk (see _check_spec)
                    "keys": list(self.keys),
                    "n_buckets": self.n_buckets,
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._latest_path())

    def _stats_from_dirs(
        self, spark: SparkSession, dirs: dict[int, str]
    ) -> dict[int, dict[str, list]]:
        """Per-bucket [min, max] of stats_cols aggregated from the
        JUST-WRITTEN parquet dirs (the Delta convention: statistics
        describe the bytes on disk). Reading back the delta-sized dirs
        costs one scan of what was just written — aggregating the
        pre-write frame instead would re-execute the whole merge
        lineage a second time. <= n_buckets result rows (bounded driver
        state, like the touched-bucket collect)."""
        from pyspark.sql import functions as F

        if not self.stats_cols or not dirs:
            return {}
        aggs = []
        for c in self.stats_cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        paths = [os.path.join(self.root, rel) for rel in dirs.values()]
        rows = (
            spark.read.parquet(*paths)
            .withColumn(
                "__bucket",
                F.regexp_extract(
                    F.input_file_name(), r"/b([0-9]+)_v[0-9]+/[^/]*$", 1
                ).cast("int"),
            )
            .groupBy("__bucket")
            .agg(*aggs)
            .collect()
        )
        return {
            int(r["__bucket"]): {
                c: [r[f"__lo_{c}"], r[f"__hi_{c}"]] for c in self.stats_cols
            }
            for r in rows
        }

    # --- I/O -----------------------------------------------------------------

    def _write_buckets(
        self, df: DataFrame, version: int, prebucketed: bool = False
    ) -> dict[int, str]:
        """Write each present bucket's rows to its own immutable dir;
        returns {bucket: relative dir}. One distributed write job —
        Hive-partitioned by __bucket under a version-scoped staging
        root, then the per-bucket dirs are renamed into ``data/`` (same
        filesystem, so renames are metadata-only).

        ``prebucketed``: df already carries ``__bucket`` AND is
        partitioned so each task holds one bucket (the zorder path's
        range partitioning) — write as-is, no extra exchange."""
        stage = os.path.join(self.root, f"_stage_v{version}")
        staged = (
            df
            if prebucketed
            else df.withColumn("__bucket", self._bucket()).repartition(
                "__bucket"
            )
        )
        (
            staged.write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(stage)
        )
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        out: dict[int, str] = {}
        for name in os.listdir(stage):
            if not name.startswith("__bucket="):
                continue
            b = int(name.split("=")[1])
            rel = os.path.join("data", f"b{b}_v{version}")
            dst = os.path.join(self.root, rel)
            # an existing b{b}_v{version} dir can only be debris from a
            # CRASHED attempt at this same version (a committed version
            # is never re-written: merges only ever target cur+1) —
            # replace it, completing the interrupted write
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.replace(os.path.join(stage, name), dst)
            out[b] = rel
        shutil.rmtree(stage, ignore_errors=True)
        return out

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if not m:
            # an empty-input overwrite commits an empty manifest; with no
            # data file there is no schema to produce an empty frame from
            raise FileNotFoundError(
                f"manifest lake table {self.root} version has no data files "
                "(initialized from an empty frame?)"
            )
        return self.read_buckets(spark, sorted(m), version)

    def read_buckets(
        self, spark: SparkSession, buckets, version: int | None = None
    ) -> DataFrame:
        """Manifest-pruned scan: only the named buckets' directories are
        listed — the file set comes from the commit log, never from
        directory discovery (orphans are invisible by construction)."""
        m = self.manifest(version)
        paths = [
            os.path.join(self.root, m[b]) for b in buckets if b in m
        ]
        if not paths:
            return self.read(spark, version).limit(0)
        # mergeSchema: after a schema-evolving merge, untouched dirs
        # predate the new columns — the union schema reads them as null
        return spark.read.option("mergeSchema", True).parquet(*paths)

    def overwrite(
        self, df: DataFrame, txn: tuple[str, int] | None = None
    ) -> int | None:
        """Full replace as a VERSIONED commit (Delta's overwrite
        semantics): the new manifest references only the new dirs, so
        prior versions stay readable, diffable (``changes`` across an
        overwrite surfaces true deletes), and vacuumable; on an
        uninitialized table this is the bootstrap commit 0. Returns the
        committed version.

        ``txn=(app_id, batch_version)`` engages the same idempotent-
        writer watermark as ``merge_into``: an overwrite whose batch
        version is already recorded for ``app_id`` is a NO-OP returning
        None. This is the exactly-once lever for NON-idempotent
        aggregate states maintained by read-modify-overwrite (e.g.
        additive count-min counters, where a replayed batch would
        double-count — contrast HLL register max, which needs no
        watermark)."""
        os.makedirs(self.root, exist_ok=True)
        self._lock.acquire()
        try:
            cur = self.current_version()
            if (
                txn is not None
                and cur is not None
                and self.txn(cur).get(txn[0], -1) >= txn[1]
            ):
                return None
            nxt = 0 if cur is None else cur + 1
            mapping = self._write_buckets(df, nxt)
            self._commit(
                nxt,
                mapping,
                self._stats_from_dirs(df.sparkSession, mapping),
                txn_update={txn[0]: txn[1]} if txn is not None else None,
            )
        finally:
            self._lock.release()
        return nxt

    def read_range(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Zone-map-pruned range scan: rows with ``lo <= col <= hi``,
        listing only buckets whose recorded [min, max] for ``col``
        intersects the range (buckets without stats are read —
        conservative). The residual predicate still applies exactly, so
        pruning is purely an I/O optimization, never a semantics one."""
        from pyspark.sql import functions as F

        st = self.stats(version)
        m = self.manifest(version)
        keep = []
        for b in sorted(m):
            s = st.get(b, {}).get(col)
            if s is None or s[0] is None or s[1] is None:
                keep.append(b)  # no stats -> cannot prune
            elif not (s[1] < lo or s[0] > hi):
                keep.append(b)
        return self.read_buckets(spark, keep, version).where(
            F.col(col).between(lo, hi)
        )

    def optimize_zorder(
        self,
        spark: SparkSession,
        cols: list[str],
        bits: int = 8,
    ) -> int:
        """OPTIMIZE ... ZORDER BY, reduced to its core: rewrite the
        current version with rows CLUSTERED by the interleaved-bit
        Z-value of ``cols``, so the per-bucket zone maps in the manifest
        turn from full-range (key-hash scatters every value range into
        every bucket) into tight slices — ``read_range`` on any zorder
        column then prunes most buckets driver-side, the same I/O win
        Delta/Iceberg get from clustering files before consulting file
        statistics.

        Mechanics: each column is min-max quantized to ``bits`` bits
        (nulls → 0; constant columns → 0), the codes are bit-interleaved
        into the Z-value (codegen'd shift/or arithmetic, no UDF), rows
        are range-partitioned on Z into ``n_buckets`` tasks (one
        distributed sample-sort — the only full-data exchange; Delta's
        OPTIMIZE pays the same) and each task writes its bucket dir
        directly (``prebucketed`` — no second exchange), sorted within
        the bucket so parquet row-group statistics tighten too. The
        rewrite commits under the standard atomic pointer flip; a crash
        leaves the prior version current.

        The committed manifest records ``layout: zorder``: Z-buckets no
        longer agree with the key-hash routing, so ``merge_into`` /
        ``apply_changes`` refuse (a key-routed rewrite against
        value-clustered buckets would silently duplicate keys) until an
        ``overwrite`` re-establishes hash layout. Range partitioning
        samples, so the bucket BOUNDARIES are not bit-deterministic
        across runs — contents and zone-map correctness are unaffected
        (stats always describe the bytes actually written).

        Returns the committed version.
        """
        from pyspark.sql import functions as F

        if not cols:
            raise ValueError("optimize_zorder needs at least one column")
        # current_version() read inside the lock — see merge_into for
        # the TOCTOU rationale (ADVICE r7)
        self._lock.acquire()
        try:
            cur = self.current_version()
            if cur is None:
                raise FileNotFoundError(
                    f"manifest lake table {self.root} is uninitialized; "
                    "call overwrite() first"
                )
            self._check_spec("optimize_zorder", cur)
            df = self.read(spark, cur)
            missing = [c for c in cols if c not in df.columns]
            if missing:
                raise ValueError(f"zorder columns not in table: {missing}")
            # per-column min/max for the quantizer: one tiny aggregate
            aggs = []
            for c in cols:
                x = F.col(c).cast("double")
                aggs += [F.min(x).alias(f"__lo_{c}"), F.max(x).alias(f"__hi_{c}")]
            rng = df.agg(*aggs).first()
            levels = (1 << bits) - 1
            codes = []
            for c in cols:
                lo, hi = rng[f"__lo_{c}"], rng[f"__hi_{c}"]
                x = F.col(c).cast("double")
                if lo is None or hi is None or hi == lo:
                    codes.append(F.lit(0).cast("long"))
                else:
                    scaled = (x - F.lit(float(lo))) / F.lit(float(hi - lo))
                    codes.append(
                        F.when(x.isNull(), F.lit(0))
                        .otherwise(F.floor(scaled * levels))
                        .cast("long")
                    )
            z = F.lit(0).cast("long")
            for b in range(bits):
                for i in range(len(cols)):
                    bit = F.shiftright(codes[i], b).bitwiseAND(F.lit(1))
                    z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
            nxt = cur + 1
            clustered = (
                df.withColumn("__z", z)
                .repartitionByRange(self.n_buckets, F.col("__z"))
                .sortWithinPartitions("__z")
                .withColumn("__bucket", F.spark_partition_id())
                .drop("__z")
            )
            new_dirs = self._write_buckets(clustered, nxt, prebucketed=True)
            self._commit(
                nxt,
                new_dirs,
                self._stats_from_dirs(spark, new_dirs),
                layout="zorder",
            )
        finally:
            self._lock.release()
        return nxt

    def _check_spec(self, op: str, version: int | None = None) -> None:
        """Refuse to operate with a bucketing spec that disagrees with
        the committed one. The bucket expression is pmod(xxhash64(keys),
        n_buckets): an instance constructed with a different key list or
        bucket count computes DIFFERENT routing, so a merge through it
        would land keys in buckets no future (correctly-configured)
        merge or pruned read would look in — silent duplicates and
        silently incomplete reads, not an error. Manifests written
        before the spec was recorded (no "keys" entry) are accepted
        as-is. Changing the bucket count is a data rewrite by nature —
        that is what ``rebucket`` (one exchange) and ``overwrite`` are
        for."""
        try:
            doc = self._manifest_doc(version)
        except FileNotFoundError:
            return  # uninitialized: the first commit defines the spec
        if "keys" not in doc:
            return  # pre-spec manifest format
        disk_keys, disk_n = list(doc["keys"]), int(doc["n_buckets"])
        if disk_keys != list(self.keys) or disk_n != self.n_buckets:
            raise RuntimeError(
                f"{op}: this instance's bucketing spec (keys="
                f"{list(self.keys)}, n_buckets={self.n_buckets}) does "
                f"not match the committed table (keys={disk_keys}, "
                f"n_buckets={disk_n}); open the table with the "
                "committed spec, or rebucket()/overwrite() to change it"
            )

    def rebucket(self, spark: SparkSession, n_buckets: int) -> int:
        """Change the bucket count — the layout-evolution operation a
        growing table needs (64 buckets sized for 1 TB are a shuffle
        bottleneck and a zone-map blur at 100 TB). Rewrites the current
        version's rows through the new key-hash routing in ONE exchange
        (the same cost OPTIMIZE pays), commits atomically with
        layout=hash and the new spec recorded, and leaves prior
        versions readable under their own manifests. Also the sanctioned
        way back to hash layout from a zorder-clustered table. The
        instance adopts the new bucket count on success. Returns the
        committed version."""
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self._lock.acquire()
        try:
            cur = self.current_version()
            if cur is None:
                raise FileNotFoundError(
                    f"manifest lake table {self.root} is uninitialized; "
                    "call overwrite() first"
                )
            self._check_spec("rebucket", cur)
            df = self.read(spark, cur)
            old_n = self.n_buckets
            self.n_buckets = n_buckets
            try:
                nxt = cur + 1
                mapping = self._write_buckets(df, nxt)
                self._commit(
                    nxt, mapping, self._stats_from_dirs(spark, mapping)
                )
            except BaseException:
                self.n_buckets = old_n  # commit didn't land; keep spec
                raise
        finally:
            self._lock.release()
        return nxt

    def _require_hash_layout(self, op: str) -> None:
        if self.layout() != "hash":
            raise RuntimeError(
                f"{op} requires key-hash bucketing, but the current "
                "version is zorder-clustered (key-routed rewrites "
                "against value-clustered buckets would duplicate keys); "
                "overwrite() to re-establish hash layout first"
            )

    def merge_into(
        self,
        source: DataFrame,
        evolve_schema: bool = False,
        txn: tuple[str, int] | None = None,
    ) -> list[int]:
        """MERGE with manifest-pruned O(delta) rewrite under a GLOBAL
        atomic commit: new dirs for touched buckets, the new manifest
        re-references untouched buckets' existing dirs, one pointer
        flip publishes all of it. Returns touched bucket ids.

        ``txn=(app_id, batch_version)`` engages Delta's idempotent-
        writer protocol: if this table has already committed a merge
        for ``app_id`` at a batch version >= ``batch_version``, the
        call is a NO-OP returning [] — the exactly-once guarantee a
        restarted streaming query needs when the checkpoint replays a
        micro-batch whose commit already landed. The watermark is
        recorded in the same manifest write as the data (atomic).

        ``evolve_schema`` enables Delta-mergeSchema semantics: columns
        new in ``source`` are added (null for rows the merge doesn't
        touch — untouched buckets' files stay as-is, the union-schema
        read supplies the nulls); columns ``source`` lacks KEEP their
        current target values on key match (never nulled) and are null
        for inserted keys. Off by default: silent schema drift in an
        ingest is usually a bug, so it stays an explicit opt-in and the
        mismatch otherwise raises."""
        from pyspark.sql import functions as F

        spark = source.sparkSession
        # NOTE: the source is consumed twice (touched-bucket collect +
        # the merge write). The collect side column-prunes to the key
        # columns, so for scan-backed sources the second execution is a
        # cheap pruned scan; callers whose source is an expensive
        # pipeline persist it themselves (see manifest_incremental_agg)
        # — an unconditional persist here measured net-negative for
        # scan-backed sources (cache write+read > pruned re-scan).
        # version/layout/txn state is all read INSIDE the locked region
        # (non-blocking lock => a pre-lock read races a concurrent
        # writer's commit: B reads N while A holds the lock, acquires
        # after A commits N+1, rewrites N+1 from N's mapping — lost
        # update; ADVICE r7 TOCTOU)
        self._lock.acquire()
        try:
            cur = self.current_version()
            if cur is None:
                raise FileNotFoundError(
                    f"manifest lake table {self.root} is uninitialized; "
                    "call overwrite() first"
                )
            self._check_spec("merge_into", cur)
            self._require_hash_layout("merge_into")
            if txn is not None and self.txn(cur).get(txn[0], -1) >= txn[1]:
                return []  # replayed batch: its commit already landed
            src = source.withColumn("__bucket", self._bucket())
            touched = sorted(
                r[0] for r in src.select("__bucket").distinct().collect()
            )
            if self.manifest(cur):
                target_slice = self.read_buckets(spark, touched, cur)
            else:
                # bootstrap-by-merge: an empty-input overwrite committed
                # an empty manifest, so there is no target schema on
                # disk — the merge is insert-only against an empty
                # slice shaped like the source
                target_slice = spark.createDataFrame([], source.schema)
            source_aligned = source
            if evolve_schema:
                t_names = set(target_slice.columns)
                s_names = set(source.columns)
                for f in source.schema.fields:
                    if f.name not in t_names:
                        target_slice = target_slice.withColumn(
                            f.name, F.lit(None).cast(f.dataType)
                        )
                missing = [
                    f.name
                    for f in target_slice.schema.fields
                    if f.name not in s_names
                ]
                if missing:
                    # absent source columns keep their current values:
                    # pull them onto the source rows via a null-safe key
                    # join against the (already pruned) target slice
                    cur_vals = target_slice.select(
                        *[F.col(k).alias(f"__t_{k}") for k in self.keys],
                        *missing,
                    )
                    cond = [
                        F.col(k).eqNullSafe(F.col(f"__t_{k}"))
                        for k in self.keys
                    ]
                    source_aligned = (
                        source.join(cur_vals, on=cond, how="left").drop(
                            *[f"__t_{k}" for k in self.keys]
                        )
                    )
            merged = upsert_merge(target_slice, source_aligned, self.keys)
            nxt = cur + 1
            new_dirs = self._write_buckets(merged, nxt)
            mapping = dict(self.manifest(cur))
            mapping.update(new_dirs)
            # untouched buckets carry their zone maps forward unchanged
            # (their files are byte-identical); every TOUCHED bucket's
            # old entry is dropped first — if this writer's stats_cols
            # doesn't cover what a previous writer recorded, carrying
            # the old [min, max] over rewritten data would let
            # read_range prune rows that now exist (missing stats are
            # merely unprunable, stale stats are wrong answers)
            stats = dict(self.stats(cur))
            for b in touched:
                stats.pop(b, None)
            stats.update(self._stats_from_dirs(spark, new_dirs))
            # a touched bucket can vanish entirely only if merge emptied
            # it — impossible under upsert semantics (rows are never
            # deleted), so touched buckets absent from new_dirs had no
            # target rows AND no source rows, which contradicts touched
            self._commit(
                nxt,
                mapping,
                stats,
                txn_update={txn[0]: txn[1]} if txn is not None else None,
            )
        finally:
            self._lock.release()
        return touched

    def changes(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
        update_preimages: bool = False,
    ) -> DataFrame:
        """Change feed between two committed versions — Delta's CDC
        ("table_changes") reduced to its core, and the incremental-
        consumption read the commit log makes O(delta): the manifest
        DIFF names the buckets whose data dir changed between the two
        versions (driver-side, O(n_buckets) metadata), so only those
        buckets' two slices are read and keyed-diffed; untouched
        buckets are never listed, let alone scanned.

        Output: ``_change_type`` ('insert' | 'update' | 'delete') plus
        the table's columns — post-image values for insert/update,
        pre-image for delete (deletes only arise from overwrite;
        upsert merges never remove a key). Rows that were rewritten
        byte-identically inside a changed bucket (an upsert that
        touched the bucket but not that key) compare equal and drop
        out. Key matching and value comparison are null-safe, matching
        ``upsert_merge``'s key semantics.

        ``update_preimages=True`` splits each update into TWO rows —
        ``update_preimage`` (old values) then ``update_postimage`` (new
        values), Delta CDF's exact row contract — which downstream
        incremental view maintenance needs: subtracting an updated
        row's old contribution requires the old values, not just the
        new ones (``operators/ivm.py``).
        """
        from pyspark.sql import functions as F

        v_to_r = self.current_version() if v_to is None else v_to
        m_from = self.manifest(v_from)
        m_to = self.manifest(v_to_r)
        changed = sorted(
            b
            for b in set(m_from) | set(m_to)
            if m_from.get(b) != m_to.get(b)
        )
        def _slice(m: dict, version: int) -> DataFrame | None:
            present = [b for b in changed if b in m]
            return (
                self.read_buckets(spark, present, version) if present else None
            )

        new = _slice(m_to, v_to_r)
        old = _slice(m_from, v_from)
        if new is None and old is None:
            # identical manifests (or both empty): no changes — an
            # empty frame shaped like the current table
            new = old = self.read(spark, v_to_r).limit(0)
        elif new is None:
            new = spark.createDataFrame([], old.schema)
        elif old is None:
            old = spark.createDataFrame([], new.schema)
        # align both slices to the UNION schema (typed null literals for
        # absent columns, as the evolve_schema merge path does): across
        # an evolve_schema commit the old slice lacks the new columns,
        # and across a column-dropping overwrite the new slice lacks
        # old ones — either way the struct build below must resolve
        # every name on both sides (ADVICE r7: CDC/IVM consumers broke
        # on the first schema-evolving commit)
        for f in new.schema.fields:
            if f.name not in old.columns:
                old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
        for f in old.schema.fields:
            if f.name not in new.columns:
                new = new.withColumn(f.name, F.lit(None).cast(f.dataType))
        keys = self.keys
        nonkeys = [c for c in new.columns if c not in keys]
        newf = new.select(
            *keys, F.struct(*nonkeys).alias("__new"), F.lit(True).alias("__pn")
        )
        oldf = old.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.struct(*nonkeys).alias("__old"),
            F.lit(True).alias("__po"),
        )
        cond = [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys]
        j = newf.join(oldf, cond, "full_outer")

        def _ev(t: str, img: "F.Column") -> "F.Column":
            return F.struct(F.lit(t).alias("t"), img.alias("img"))

        if update_preimages:
            upd = F.array(
                _ev("update_preimage", F.col("__old")),
                _ev("update_postimage", F.col("__new")),
            )
        else:
            upd = F.array(_ev("update", F.col("__new")))
        # unchanged rows produce a typed EMPTY array (slice of a typed
        # one — F.array() alone cannot infer the struct type)
        events = (
            F.when(
                F.col("__po").isNull(),
                F.array(_ev("insert", F.col("__new"))),
            )
            .when(
                F.col("__pn").isNull(),
                F.array(_ev("delete", F.col("__old"))),
            )
            .when(~F.col("__old").eqNullSafe(F.col("__new")), upd)
            .otherwise(F.slice(upd, 1, 0))
        )
        return j.select(
            F.explode(events).alias("__e"),
            *[
                F.coalesce(F.col(k), F.col(f"__k_{k}")).alias(k)
                for k in keys
            ],
        ).select(
            F.col("__e.t").alias("_change_type"),
            *keys,
            *[F.col("__e.img").getField(c).alias(c) for c in nonkeys],
        )

    def apply_changes(self, feed: DataFrame) -> list[int]:
        """Consume a ``changes()`` feed — CDC replication's other half:
        insert/update post-images upsert, delete pre-images remove
        their keys, all under ONE atomic commit, so a replica that
        replays a source table's feeds hop by hop reconstructs exactly
        the source's committed states (pinned by
        ``tests/test_lakehouse.py`` replay tests).

        O(delta) like ``merge_into``: only the feed's touched buckets
        are read and rewritten; a bucket emptied by deletes drops out
        of the new manifest. The replica's bucketing is its own
        (``keys`` must match the feed's key columns, ``n_buckets`` need
        not match the source's — buckets are per-table physical
        layout, not part of the feed contract). Replays are
        key-idempotent: an insert for a present key degrades to an
        update, a delete for an absent key is a no-op.

        Returns the touched bucket ids ([] for an empty feed — no
        commit is written)."""
        from pyspark.sql import functions as F

        spark = feed.sparkSession
        data_cols = [c for c in feed.columns if c != "_change_type"]
        missing = [k for k in self.keys if k not in data_cols]
        if "_change_type" not in feed.columns or missing:
            raise ValueError(
                "apply_changes expects a changes() feed: _change_type "
                f"plus the table columns including keys {self.keys}; "
                f"got {feed.columns}"
            )
        # NOTE: the feed is consumed three times (touched-bucket
        # collect, the upsert slice, the delete slice); the collect is
        # a key-pruned scan and the two slices land in one write job,
        # so an unconditional persist measured net-negative for
        # scan-backed feeds — callers with expensive feeds persist them
        # themselves.
        # table state (version, layout) read inside the lock — see
        # merge_into for the TOCTOU rationale (ADVICE r7)
        self._lock.acquire()
        try:
            cur = self.current_version()
            if cur is None:
                raise FileNotFoundError(
                    f"manifest lake table {self.root} is uninitialized; "
                    "call overwrite() first"
                )
            self._check_spec("apply_changes", cur)
            self._require_hash_layout("apply_changes")
            touched = sorted(
                r[0]
                for r in feed.withColumn("__bucket", self._bucket())
                .select("__bucket")
                .distinct()
                .collect()
            )
            if not touched:
                return []
            # both feed forms apply: plain updates carry post-images as
            # 'update'; a preimage feed carries them as
            # 'update_postimage' ('update_preimage' rows are for view
            # maintenance, not state replay — skipped here)
            upserts = feed.where(
                F.col("_change_type").isin(
                    "insert", "update", "update_postimage"
                )
            ).select(*data_cols)
            deletes = feed.where(F.col("_change_type") == "delete").select(
                *[F.col(k).alias(f"__d_{k}") for k in self.keys]
            )
            if self.manifest(cur):
                target_slice = self.read_buckets(spark, touched, cur)
            else:
                target_slice = spark.createDataFrame([], upserts.schema)
            merged = upsert_merge(target_slice, upserts, self.keys)
            cond = [
                F.col(k).eqNullSafe(F.col(f"__d_{k}")) for k in self.keys
            ]
            final = merged.join(deletes, cond, "left_anti")
            nxt = cur + 1
            new_dirs = self._write_buckets(final, nxt)
            mapping = dict(self.manifest(cur))
            stats = dict(self.stats(cur))
            for b in touched:
                # a touched bucket absent from new_dirs was emptied by
                # deletes — it must leave the manifest, not keep
                # referencing its pre-feed dir
                mapping.pop(b, None)
                stats.pop(b, None)
            mapping.update(new_dirs)
            stats.update(self._stats_from_dirs(spark, new_dirs))
            self._commit(nxt, mapping, stats)
        finally:
            self._lock.release()
        return touched

    def vacuum(self, keep: int = 1) -> list[str]:
        """Drop data dirs referenced by NO retained manifest (the newest
        ``keep`` plus the current one) and the dropped manifests.
        Returns removed relative paths.

        Takes the writer lock: vacuum is a mutation, and an unlocked
        vacuum racing a mid-merge writer could delete the b*_v{N+1}
        dirs the writer has staged but not yet committed (they are
        referenced by no retained manifest until the pointer flips)."""
        import re as _re

        self._lock.acquire()
        try:
            return self._vacuum_locked(keep)
        finally:
            self._lock.release()

    def _vacuum_locked(self, keep: int) -> list[str]:
        import re as _re

        cur = self.current_version()
        mdir = os.path.join(self.root, "_manifests")
        versions = sorted(
            int(m.group(1))
            for m in (
                _re.match(r"^m=(\d+)\.json$", n) for n in os.listdir(mdir)
            )
            if m
        )
        protect_v = set(versions[-keep:]) if keep > 0 else set()
        if cur is not None:
            protect_v.add(cur)
        live = set()
        for v in protect_v:
            live.update(self.manifest(v).values())
        removed = []
        data = os.path.join(self.root, "data")
        for name in os.listdir(data):
            rel = os.path.join("data", name)
            if rel not in live:
                shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
                removed.append(rel)
        for v in versions:
            if v not in protect_v:
                os.remove(self._manifest_path(v))
                removed.append(os.path.join("_manifests", f"m={v}.json"))
        return removed


def shallow_clone(
    source: "ManifestLakeTable",
    dest_root: str,
    version: int | None = None,
) -> "ManifestLakeTable":
    """Delta-style SHALLOW CLONE: commit a new table at ``dest_root``
    whose manifest references the SOURCE's data dirs by absolute path —
    zero bytes copied, O(buckets) metadata work. The clone then lives
    its own life copy-on-write: a MERGE/overwrite on the clone writes
    new dirs under the CLONE's root and re-references untouched source
    dirs, so clone mutations never touch source files, and source
    mutations (which always write NEW version dirs) never move the
    dirs the clone pinned. ``version`` clones a historical snapshot
    (time-travel clone).

    The clone's ``vacuum`` is safe by construction: it sweeps only
    ``dest_root/data`` (a foreign absolute reference is never listed
    there), so it can drop clone-local garbage but never source bytes.
    The one shared-fate edge — same as Delta's shallow clones — is a
    VACUUM ON THE SOURCE, which may delete dirs historical clones still
    reference; pin retention accordingly (tests pin both properties).

    Bucketing spec, zone maps, and layout are inherited verbatim (the
    clone's key-hash routing must agree with the referenced buckets);
    txn watermarks are NOT copied — the clone is a new idempotence
    domain, matching Delta (a replayed streaming batch must re-apply to
    a fresh clone).
    """
    doc = source._manifest_doc(version)
    mapping = {
        int(b): (
            rel if os.path.isabs(rel) else os.path.join(source.root, rel)
        )
        for b, rel in doc["buckets"].items()
    }
    keys = doc.get("keys", source.keys)
    n_buckets = doc.get("n_buckets", source.n_buckets)
    clone = ManifestLakeTable(
        dest_root,
        keys=keys,
        n_buckets=n_buckets,
        stats_cols=list(source.stats_cols),
    )
    os.makedirs(os.path.join(dest_root, "data"), exist_ok=True)
    clone._lock.acquire()
    try:
        if clone.current_version() is not None:
            raise FileExistsError(
                f"shallow_clone target {dest_root} is already a table"
            )
        clone._commit(
            0,
            mapping,
            {int(b): s for b, s in doc.get("stats", {}).items()},
            layout=doc.get("layout", "hash"),
        )
    finally:
        clone._lock.release()
    return clone
