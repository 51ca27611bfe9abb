"""Lakehouse MERGE INTO backend (sources/lakehouse.py): the same checks
test_jdbc_derby.py runs against the RDBMS backend — merge read-back
equals the engine-level upsert_merge, idempotence on re-run — plus the
version-log properties the parquet backend adds (atomic commit, orphan
tolerance, time travel, vacuum)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from fred_economic_data_pipeline_local_spark.operators.serve import upsert_merge
from fred_economic_data_pipeline_local_spark.sources.lakehouse import LakeTable


def _frames(spark):
    target = spark.createDataFrame(
        [("gdp", 2024, 1, 1.0, 3), ("gdp", 2024, 2, 2.0, 4), ("cpi", 2024, 1, 9.0, 1)],
        "indicator string, observation_year int, observation_month int, "
        "value double, observation_count long",
    )
    source = spark.createDataFrame(
        [("gdp", 2024, 2, 20.0, 5), ("gdp", 2024, 3, 30.0, 6)],
        target.schema,
    )
    return target, source


KEYS = ["indicator", "observation_year", "observation_month"]


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_merge_matches_engine_upsert_and_is_idempotent(spark, tmp_path):
    target, source = _frames(spark)
    table = LakeTable(str(tmp_path / "t"))
    table.overwrite(target)
    v1 = table.merge_into(source, KEYS)
    expected = _rows(upsert_merge(target, source, KEYS))
    assert _rows(table.read(spark)) == expected
    assert v1 == 1
    # re-running the identical merge commits a new version with
    # identical content (idempotent by value)
    v2 = table.merge_into(source, KEYS)
    assert v2 == 2
    assert _rows(table.read(spark)) == expected


def test_time_travel_and_vacuum(spark, tmp_path):
    target, source = _frames(spark)
    table = LakeTable(str(tmp_path / "t"))
    table.overwrite(target)
    table.merge_into(source, KEYS)
    # version 0 still reads as the pre-merge target
    assert _rows(table.read(spark, version=0)) == _rows(target)
    removed = table.vacuum(keep=1)
    assert removed == [0]
    assert table.versions() == [1]
    assert table.read(spark).count() == 4


def test_orphan_version_is_unreachable_and_overwritten(spark, tmp_path):
    """A crash between the version write and the pointer flip leaves an
    orphan v-dir: readers never see it (pointer still names the old
    version) and the next merge overwrites it."""
    target, source = _frames(spark)
    root = str(tmp_path / "t")
    table = LakeTable(root)
    table.overwrite(target)
    # simulate the crash: v=1 written with garbage content, no commit
    source.limit(1).write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    assert table.current_version() == 0
    assert _rows(table.read(spark)) == _rows(target)  # orphan invisible
    v = table.merge_into(source, KEYS)
    assert v == 1  # overwrote the orphan
    assert _rows(table.read(spark)) == _rows(upsert_merge(target, source, KEYS))


def test_uninitialized_table_raises(spark, tmp_path):
    import pytest

    table = LakeTable(str(tmp_path / "missing"))
    with pytest.raises(FileNotFoundError):
        table.read(spark)
    _, source = _frames(spark)
    with pytest.raises(FileNotFoundError):
        table.merge_into(source, KEYS)


def test_null_keys_merge_null_safely(spark, tmp_path):
    """upsert_merge joins null-safely on keys; the lakehouse round trip
    must preserve that (a null-keyed target row is UPDATED by a
    null-keyed source row, not duplicated)."""
    target = spark.createDataFrame(
        [(None, 2024, 1, 1.0, 1), ("gdp", 2024, 1, 2.0, 2)],
        "indicator string, observation_year int, observation_month int, "
        "value double, observation_count long",
    )
    source = spark.createDataFrame([(None, 2024, 1, 10.0, 9)], target.schema)
    table = LakeTable(str(tmp_path / "t"))
    table.overwrite(target)
    table.merge_into(source, KEYS)
    got = _rows(table.read(spark))
    assert got == _rows(upsert_merge(target, source, KEYS))
    assert (None, 2024, 1, 10.0, 9) in got
    assert len(got) == 2


class TestPartitionedLakeTable:
    def _table(self, spark, tmp_path, n_buckets=8):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            PartitionedLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select("doc_id", "source", "lang", "n_chars")
        t = PartitionedLakeTable(
            str(tmp_path / "pt"), keys=["doc_id"], n_buckets=n_buckets
        )
        t.overwrite(target)
        return t, target

    def test_merge_equals_engine_upsert(self, spark, tmp_path):
        t, target = self._table(spark, tmp_path)
        source = (
            target.where(F.col("doc_id") % 10 == 0)
            .withColumn("n_chars", F.col("n_chars") + 1)
        )
        touched = t.merge_into(source)
        assert 0 < len(touched) <= t.n_buckets
        got = _rows(t.read(spark))
        assert got == _rows(upsert_merge(target, source, ["doc_id"]))

    def test_untouched_partitions_not_rewritten(self, spark, tmp_path):
        """The O(delta) claim, checked on disk: partition directories
        outside the touched bucket set keep their exact files (names +
        mtimes) across a merge — dynamic overwrite replaced only the
        touched directories."""
        import os

        t, target = self._table(spark, tmp_path, n_buckets=16)

        def snapshot():
            out = {}
            for d in os.listdir(t.root):
                if d.startswith("__bucket="):
                    p = os.path.join(t.root, d)
                    out[d] = sorted(
                        (f, os.path.getmtime(os.path.join(p, f)))
                        for f in os.listdir(p)
                        if not f.startswith(".")
                    )
            return out

        before = snapshot()
        source = target.where(F.col("doc_id") == 7).withColumn(
            "lang", F.lit("xx")
        )
        touched = t.merge_into(source)
        after = snapshot()
        touched_dirs = {f"__bucket={b}" for b in touched}
        assert touched_dirs  # something was merged
        for d, files in before.items():
            if d not in touched_dirs:
                assert after[d] == files, f"untouched {d} was rewritten"
        for d in touched_dirs:
            assert after[d] != before.get(d), f"touched {d} unchanged"

    def test_merge_scan_prunes_partitions(self, spark, tmp_path):
        """The target read under a merge must carry a __bucket partition
        filter so the scan lists only touched directories."""
        from pyspark.sql import functions as F2

        t, target = self._table(spark, tmp_path, n_buckets=16)
        src = target.where(F.col("doc_id") == 7)
        bucket = src.select(
            F2.pmod(F2.xxhash64("doc_id"), F2.lit(16)).cast("int")
        ).first()[0]
        pruned = spark.read.parquet(t.root).where(
            F.col("__bucket").isin([bucket])
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "__bucket" in plan

    def test_null_key_rows_bucket_consistently(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            PartitionedLakeTable,
        )

        target = spark.createDataFrame(
            [(None, "a"), (1, "b")], "k long, v string"
        )
        t = PartitionedLakeTable(str(tmp_path / "nk"), keys=["k"], n_buckets=4)
        t.overwrite(target)
        source = spark.createDataFrame([(None, "A2")], "k long, v string")
        t.merge_into(source)
        got = _rows(t.read(spark))
        assert got == _rows(upsert_merge(target, source, ["k"]))
        assert (None, "A2") in got and len(got) == 2


class TestWriterLockAndCrashRecovery:
    """VERDICT r6 item 5: single-writer enforcement plus the crash
    matrix — staging orphans are swept, and a merge torn mid-commit
    heals by replaying the same merge."""

    def test_second_writer_rejected_then_break_lock(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ConcurrentWriteError,
            PartitionedLakeTable,
        )
        import pytest

        target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        t = PartitionedLakeTable(str(tmp_path / "pt"), keys=["k"], n_buckets=4)
        t.overwrite(target)
        # simulate a live (or crashed) writer holding the lock
        t._lock.acquire()
        src = spark.createDataFrame([(1, "A")], "k long, v string")
        with pytest.raises(ConcurrentWriteError, match="locked by"):
            t.merge_into(src)
        with pytest.raises(ConcurrentWriteError):
            t.overwrite(target)
        # table unchanged by the rejected writers
        assert _rows(t.read(spark)) == _rows(target)
        t.break_lock()
        t.merge_into(src)
        assert _rows(t.read(spark)) == _rows(
            upsert_merge(target, src, ["k"])
        )

    def test_versioned_table_lock_and_break(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ConcurrentWriteError,
        )
        import pytest

        target, source = _frames(spark)
        table = LakeTable(str(tmp_path / "vt"))
        table.overwrite(target)
        table._lock.acquire()
        with pytest.raises(ConcurrentWriteError, match="locked by"):
            table.merge_into(source, KEYS)
        assert table.current_version() == 0  # lost-update prevented
        table.break_lock()
        assert table.merge_into(source, KEYS) == 1

    def test_staging_orphans_swept_and_ignored(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            PartitionedLakeTable,
        )

        target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        t = PartitionedLakeTable(str(tmp_path / "pt"), keys=["k"], n_buckets=4)
        t.overwrite(target)
        # crash before any partition commit: staging debris + stale lock
        stage = os.path.join(t.root, "_temporary")
        os.makedirs(os.path.join(stage, "0"))
        open(os.path.join(stage, "0", "part-000"), "w").write("junk")
        open(os.path.join(t.root, "_LOCK"), "w").write("pid=0 at=crashed")
        # readers never see staging
        assert _rows(t.read(spark)) == _rows(target)
        t.break_lock()
        removed = t.clean_orphans()
        assert "_temporary" in removed and not os.path.exists(stage)

    def test_torn_merge_heals_on_replay(self, spark, tmp_path):
        """Simulate a crash DURING partition commits: of two touched
        buckets, one directory already holds merged data, the other
        still the old state. Reads stay per-bucket consistent, and
        replaying the identical merge converges the table to the full
        merged result."""
        import shutil

        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            PartitionedLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select("doc_id", "source", "lang", "n_chars")
        t = PartitionedLakeTable(str(tmp_path / "pt"), keys=["doc_id"], n_buckets=8)
        t.overwrite(target)
        source = target.where(F.col("doc_id") % 10 == 0).withColumn(
            "n_chars", F.col("n_chars") + 100
        )
        # run the complete merge in a scratch copy to obtain the merged
        # partition payloads, then rebuild the torn state at t.root
        done = PartitionedLakeTable(
            str(tmp_path / "done"), keys=["doc_id"], n_buckets=8
        )
        shutil.copytree(t.root, done.root, dirs_exist_ok=True)
        done.break_lock()
        touched = done.merge_into(source)
        assert len(touched) >= 2, "need >= 2 touched buckets to tear"
        committed, uncommitted = touched[0], touched[1:]
        # crash replayed: only `committed`'s directory was flipped
        cdir = f"__bucket={committed}"
        shutil.rmtree(os.path.join(t.root, cdir))
        shutil.copytree(
            os.path.join(done.root, cdir), os.path.join(t.root, cdir)
        )
        open(os.path.join(t.root, "_LOCK"), "w").write("pid=0 at=crashed")

        # torn but readable: committed bucket shows merged rows, the
        # others still the old state
        torn = spark.read.parquet(t.root)
        merged_expect = upsert_merge(target, source, ["doc_id"])
        bexpr = F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
        assert _rows(torn.where(F.col("__bucket") == committed).drop("__bucket")) \
            == _rows(merged_expect.where(bexpr == committed))
        for b in uncommitted:
            assert _rows(torn.where(F.col("__bucket") == b).drop("__bucket")) \
                == _rows(target.where(bexpr == b))

        # heal: break the stale lock, replay the same merge
        t.break_lock()
        assert t.merge_into(source) == touched
        assert _rows(t.read(spark)) == _rows(merged_expect)


class TestManifestLakeTable:
    """The file-level commit-log variant: global atomic commits AND
    O(delta) merges at once (the tradeoff the other two variants split
    between them)."""

    def _table(self, spark, tmp_path, n_buckets=16):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select("doc_id", "source", "lang", "n_chars")
        t = ManifestLakeTable(
            str(tmp_path / "mt"), keys=["doc_id"], n_buckets=n_buckets
        )
        t.overwrite(target)
        return t, target

    def test_merge_equals_engine_upsert_and_is_idempotent(self, spark, tmp_path):
        t, target = self._table(spark, tmp_path)
        source = target.where(F.col("doc_id") % 10 == 0).withColumn(
            "n_chars", F.col("n_chars") + 1
        )
        touched = t.merge_into(source)
        assert 0 < len(touched) <= t.n_buckets
        expected = _rows(upsert_merge(target, source, ["doc_id"]))
        assert _rows(t.read(spark)) == expected
        t.merge_into(source)  # idempotent by value, new version
        assert t.current_version() == 2
        assert _rows(t.read(spark)) == expected

    def test_untouched_bucket_dirs_are_reused_not_rewritten(self, spark, tmp_path):
        """O(delta) at the commit-log level: the new manifest REFERENCES
        untouched buckets' existing directories — same relative path,
        same files, same bytes."""
        t, target = self._table(spark, tmp_path)
        before = t.manifest()
        source = target.where(F.col("doc_id") == 7).withColumn(
            "lang", F.lit("xx")
        )
        touched = t.merge_into(source)
        after = t.manifest()
        for b, rel in before.items():
            if b in touched:
                assert after[b] != rel, f"touched bucket {b} dir not replaced"
            else:
                assert after[b] == rel, f"untouched bucket {b} was rewritten"

    def test_crash_before_flip_is_invisible_then_heals(self, spark, tmp_path):
        """Global atomicity: data dirs + manifest written but _LATEST
        not flipped == nothing happened; replaying the merge converges
        and vacuum reclaims the orphan dirs."""
        import json
        import os as _os

        t, target = self._table(spark, tmp_path)
        v0 = _rows(t.read(spark))
        source = target.where(F.col("doc_id") % 10 == 0).withColumn(
            "n_chars", F.col("n_chars") + 5
        )
        # simulate the crashed merge: run a real one, then roll the
        # pointer back and leave everything else (dirs, manifest, lock)
        t.merge_into(source)
        with open(_os.path.join(t.root, "_LATEST"), "w") as fh:
            fh.write("0")
        open(_os.path.join(t.root, "_LOCK"), "w").write("pid=0 at=crashed")
        assert t.current_version() == 0
        assert _rows(t.read(spark)) == v0  # reader sees the old version
        t.break_lock()
        # heals by REWRITING version 1: the replay targets cur+1 = 1,
        # clobbers the crashed attempt's debris dirs, and commits
        t.merge_into(source)
        assert t.current_version() == 1
        assert _rows(t.read(spark)) == _rows(
            upsert_merge(target, source, ["doc_id"])
        )
        # vacuum now reclaims version 0's superseded bucket dirs while
        # the live version keeps reading identically
        removed = t.vacuum(keep=1)
        assert any("_v0" in r for r in removed)
        assert _rows(t.read(spark)) == _rows(
            upsert_merge(target, source, ["doc_id"])
        )

    def test_time_travel_and_vacuum_protection(self, spark, tmp_path):
        t, target = self._table(spark, tmp_path)
        source = target.where(F.col("doc_id") % 7 == 0).withColumn(
            "n_chars", F.lit(0)
        )
        t.merge_into(source)
        assert _rows(t.read(spark, version=0)) == _rows(target)
        assert _rows(t.read(spark, version=1)) == _rows(
            upsert_merge(target, source, ["doc_id"])
        )
        t.vacuum(keep=2)  # both versions retained -> both readable
        assert _rows(t.read(spark, version=0)) == _rows(target)

    def test_manifest_pruned_read_lists_only_named_buckets(self, spark, tmp_path):
        t, target = self._table(spark, tmp_path)
        m = t.manifest()
        some = sorted(m)[:3]
        got = t.read_buckets(spark, some)
        bexpr = F.pmod(F.xxhash64("doc_id"), F.lit(t.n_buckets)).cast("int")
        assert _rows(got) == _rows(target.where(bexpr.isin(some)))
        # the scan's file list comes from the manifest: exactly 3 dirs
        files = got.inputFiles()
        dirs = {f.rsplit("/", 2)[-2] for f in files}
        assert dirs == {m[b].split("/")[-1] for b in some}

    def test_second_writer_rejected(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ConcurrentWriteError,
        )
        import pytest

        t, target = self._table(spark, tmp_path)
        t._lock.acquire()
        with pytest.raises(ConcurrentWriteError, match="locked by"):
            t.merge_into(target.limit(1))
        assert t.current_version() == 0
        t.break_lock()

    def test_empty_overwrite_reads_raise_not_recurse(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )
        import pytest

        t = ManifestLakeTable(str(tmp_path / "e"), keys=["k"], n_buckets=4)
        t.overwrite(
            spark.createDataFrame([], "k long, v string")
        )
        with pytest.raises(FileNotFoundError, match="no data files"):
            t.read(spark)

    def test_bootstrap_by_merge_after_empty_overwrite(self, spark, tmp_path):
        """An empty-input overwrite commits an empty manifest; a
        subsequent merge is insert-only against an empty slice shaped
        like the source, not a FileNotFoundError."""
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(tmp_path / "bs"), keys=["k"], n_buckets=4)
        t.overwrite(spark.createDataFrame([], "k long, v string"))
        source = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        t.merge_into(source)
        assert _rows(t.read(spark)) == _rows(source)

    def test_vacuum_requires_writer_lock(self, spark, tmp_path):
        """vacuum is a mutation: racing a mid-merge writer it could
        delete staged-but-uncommitted dirs, so it takes the lock."""
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ConcurrentWriteError,
            ManifestLakeTable,
        )
        import pytest

        t = ManifestLakeTable(str(tmp_path / "vl"), keys=["k"], n_buckets=4)
        t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
        t._lock.acquire()
        with pytest.raises(ConcurrentWriteError, match="locked by"):
            t.vacuum()
        t.break_lock()
        t.vacuum()  # lock released -> proceeds


class TestZoneMaps:
    """Per-bucket [min, max] statistics in the manifest: range
    predicates on NON-key columns prune buckets driver-side (the
    Delta/Iceberg file-statistics idea reduced to its core)."""

    def _table(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        # key the buckets by a RANGE-correlated id so zone maps have
        # something to prune on (hash-bucketing a uniform column gives
        # every bucket the full range); sorted doc_id blocks of 100
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select(
            (F.col("doc_id") / 100).cast("long").alias("blk"),
            "doc_id",
            "n_chars",
        )
        t = ManifestLakeTable(
            str(tmp_path / "zm"),
            keys=["blk"],
            n_buckets=8,
            stats_cols=["doc_id", "n_chars"],
        )
        t.overwrite(target)
        return t, target

    def test_range_read_prunes_and_matches_full_filter(self, spark, tmp_path):
        t, target = self._table(spark, tmp_path)
        got = t.read_range(spark, "doc_id", 120, 180)
        assert _rows(got) == _rows(
            target.where(F.col("doc_id").between(120, 180))
        )
        # pruning is real: the scan lists a strict subset of the dirs
        m = t.manifest()
        read_dirs = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
        all_dirs = {p.split("/")[-1] for p in m.values()}
        assert read_dirs < all_dirs
        # and exactly the stats-intersecting buckets
        st = t.stats()
        expect = {
            m[b].split("/")[-1]
            for b in m
            if not (st[b]["doc_id"][1] < 120 or st[b]["doc_id"][0] > 180)
        }
        assert read_dirs == expect

    def test_stats_survive_merge_and_update_for_touched(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select("doc_id", "n_chars")
        t = ManifestLakeTable(
            str(tmp_path / "zm2"),
            keys=["doc_id"],
            n_buckets=8,
            stats_cols=["n_chars"],
        )
        t.overwrite(target)
        before = t.stats()
        # push one doc's n_chars above every recorded max
        source = target.where(F.col("doc_id") == 150).withColumn(
            "n_chars", F.lit(10_000_000)
        )
        touched = t.merge_into(source)
        after = t.stats()
        for b in before:
            if b in touched:
                assert after[b]["n_chars"][1] == 10_000_000
            else:
                assert after[b] == before[b]
        # range read over the new extreme finds exactly the updated row
        got = t.read_range(spark, "n_chars", 9_999_999, 10_000_001)
        assert got.count() == 1

    def test_touched_bucket_stats_dropped_when_writer_lacks_stats_cols(
        self, spark, tmp_path
    ):
        """A writer whose stats_cols doesn't cover a previously
        recorded column must DROP the touched buckets' old zone maps,
        not carry them forward over rewritten data — stale stats make
        read_range silently prune rows that exist."""
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        target = docs.select("doc_id", "n_chars")
        root = str(tmp_path / "ss")
        ManifestLakeTable(
            root, keys=["doc_id"], n_buckets=8, stats_cols=["n_chars"]
        ).overwrite(target)
        # reopened WITHOUT stats_cols (constructor-only config drift)
        t2 = ManifestLakeTable(root, keys=["doc_id"], n_buckets=8)
        source = target.where(F.col("doc_id") == 150).withColumn(
            "n_chars", F.lit(10_000_000)
        )
        touched = t2.merge_into(source)
        after = t2.stats()
        for b in touched:
            assert b not in after  # stale entry dropped, not carried
        # the extreme row is found: its bucket is unprunable, not
        # wrongly pruned by the pre-merge max
        got = t2.read_range(spark, "n_chars", 9_999_999, 10_000_001)
        assert got.count() == 1

    def test_preexisting_stats_free_manifest_still_reads(self, spark, tmp_path):
        """Backward compat: a bucket (or whole manifest) without stats
        is read, never pruned."""
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        t = ManifestLakeTable(
            str(tmp_path / "ns"), keys=["doc_id"], n_buckets=4
        )  # no stats_cols
        t.overwrite(docs.select("doc_id", "n_chars"))
        got = t.read_range(spark, "n_chars", 0, 10**9)
        assert got.count() == docs.count()


class TestSchemaEvolution:
    def _t(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        target = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k long, n long"
        )
        t = ManifestLakeTable(str(tmp_path / "se"), keys=["k"], n_buckets=4)
        t.overwrite(target)
        return t

    def test_drift_raises_without_opt_in(self, spark, tmp_path):
        import pytest

        t = self._t(spark, tmp_path)
        src = spark.createDataFrame([(2, 21, "en")], "k long, n long, lang string")
        with pytest.raises(ValueError, match="identical target/source"):
            t.merge_into(src)

    def test_new_source_column_backfills_null(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        src = spark.createDataFrame(
            [(2, 21, "en"), (9, 90, "de")], "k long, n long, lang string"
        )
        t.merge_into(src, evolve_schema=True)
        got = {r["k"]: (r["n"], r["lang"]) for r in t.read(spark).collect()}
        assert got == {1: (10, None), 2: (21, "en"), 3: (30, None), 9: (90, "de")}

    def test_missing_source_column_keeps_current_values(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        # source without n: matched key keeps its n, inserted key gets null
        src = spark.createDataFrame([(2,), (9,)], "k long")
        t.merge_into(src, evolve_schema=True)
        got = {r["k"]: r["n"] for r in t.read(spark).collect()}
        assert got == {1: 10, 2: 20, 3: 30, 9: None}


class TestChangeFeed:
    def _t(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(tmp_path / "cf"), keys=["k"], n_buckets=8)
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
                "k long, v string, n int",
            )
        )
        return t

    def test_merge_changes_classified_and_pruned(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        # update k=2 (value change), touch k=3 with identical values
        # (rewritten byte-identically -> must NOT appear), insert k=9
        src = spark.createDataFrame(
            [(2, "B", 21), (3, "c", 30), (9, "z", 90)],
            "k long, v string, n int",
        )
        t.merge_into(src)
        got = {
            r["k"]: (r["_change_type"], r["v"], r["n"])
            for r in t.changes(spark, 0, 1).collect()
        }
        assert got == {2: ("update", "B", 21), 9: ("insert", "z", 90)}
        # manifest-diff pruning: only changed buckets' dirs are listed
        feed = t.changes(spark, 0, 1)
        m0, m1 = t.manifest(0), t.manifest(1)
        changed_dirs = {
            p.split("/")[-1]
            for b in set(m0) | set(m1)
            if m0.get(b) != m1.get(b)
            for p in (m0.get(b), m1.get(b))
            if p
        }
        read_dirs = {f.rsplit("/", 2)[-2] for f in feed.inputFiles()}
        assert read_dirs <= changed_dirs
        all_dirs = {p.split("/")[-1] for p in m0.values()} | {
            p.split("/")[-1] for p in m1.values()
        }
        assert read_dirs < all_dirs

    def test_overwrite_surfaces_deletes_with_preimage(self, spark, tmp_path):
        """Overwrite is a versioned commit, so the FORWARD feed across
        it shows dropped keys as deletes carrying their pre-images."""
        t = self._t(spark, tmp_path)
        v = t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10), (2, "b2", 22)], "k long, v string, n int"
            )
        )
        assert v == 1  # overwrite did NOT clobber version 0
        got = {
            r["k"]: (r["_change_type"], r["v"], r["n"])
            for r in t.changes(spark, 0, 1).collect()
        }
        assert got == {
            2: ("update", "b2", 22),
            3: ("delete", "c", 30),
            4: ("delete", "d", 40),
        }
        # both versions stay readable (time travel across the overwrite)
        assert t.read(spark, 0).count() == 4
        assert t.read(spark, 1).count() == 2

    def test_identical_versions_yield_empty_feed(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        assert t.changes(spark, 0, 0).count() == 0


class TestApplyChanges:
    """CDC consumer half: replaying a source table's feeds into a
    replica reconstructs the source's committed states exactly."""

    def _source(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(tmp_path / "src"), keys=["k"], n_buckets=8)
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
                "k long, v string, n int",
            )
        )
        return t

    def _replica_from_v0(self, spark, tmp_path, src, n_buckets=8):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        r = ManifestLakeTable(
            str(tmp_path / "rep"), keys=["k"], n_buckets=n_buckets
        )
        r.overwrite(src.read(spark, 0))
        return r

    @staticmethod
    def _state(spark, t, version=None):
        return {
            r["k"]: (r["v"], r["n"]) for r in t.read(spark, version).collect()
        }

    def test_replay_upserts_and_deletes_hop_by_hop(self, spark, tmp_path):
        src = self._source(spark, tmp_path)
        # v1: merge (update k=2, insert k=9); v2: overwrite dropping k=3,4
        src.merge_into(
            spark.createDataFrame(
                [(2, "B", 21), (9, "z", 90)], "k long, v string, n int"
            )
        )
        src.overwrite(
            spark.createDataFrame(
                [(1, "a", 10), (2, "B", 21), (9, "z", 99)],
                "k long, v string, n int",
            )
        )
        rep = self._replica_from_v0(spark, tmp_path, src)
        rep.apply_changes(src.changes(spark, 0, 1))
        assert self._state(spark, rep) == self._state(spark, src, 1)
        rep.apply_changes(src.changes(spark, 1, 2))
        assert self._state(spark, rep) == self._state(spark, src, 2)

    def test_replay_collapsed_feed_reaches_same_state(self, spark, tmp_path):
        """One collapsed feed (0 -> head) lands on the same state as the
        hop-by-hop replay: the diff semantics compose."""
        src = self._source(spark, tmp_path)
        src.merge_into(
            spark.createDataFrame([(2, "B", 21)], "k long, v string, n int")
        )
        src.overwrite(
            spark.createDataFrame(
                [(2, "B", 21), (9, "z", 90)], "k long, v string, n int"
            )
        )
        rep = self._replica_from_v0(spark, tmp_path, src)
        rep.apply_changes(src.changes(spark, 0))
        assert self._state(spark, rep) == self._state(spark, src)

    def test_replica_bucket_count_is_independent(self, spark, tmp_path):
        src = self._source(spark, tmp_path)
        src.merge_into(
            spark.createDataFrame([(9, "z", 90)], "k long, v string, n int")
        )
        rep = self._replica_from_v0(spark, tmp_path, src, n_buckets=3)
        rep.apply_changes(src.changes(spark, 0, 1))
        assert self._state(spark, rep) == self._state(spark, src, 1)

    def test_empty_feed_is_a_no_op(self, spark, tmp_path):
        src = self._source(spark, tmp_path)
        rep = self._replica_from_v0(spark, tmp_path, src)
        before = rep.current_version()
        assert rep.apply_changes(src.changes(spark, 0, 0)) == []
        assert rep.current_version() == before

    def test_bucket_emptied_by_deletes_leaves_manifest(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )
        from pyspark.sql import functions as F

        src = self._source(spark, tmp_path)
        src.overwrite(src.read(spark, 0).where(F.col("k") == 1))
        rep = self._replica_from_v0(spark, tmp_path, src)
        n_before = len(rep.manifest())
        rep.apply_changes(src.changes(spark, 0, 1))
        assert self._state(spark, rep) == self._state(spark, src, 1)
        assert len(rep.manifest()) < n_before

    def test_feed_shape_validated(self, spark, tmp_path):
        src = self._source(spark, tmp_path)
        rep = self._replica_from_v0(spark, tmp_path, src)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="changes\\(\\) feed"):
            rep.apply_changes(src.read(spark, 0))  # no _change_type

    def test_o_delta_touched_buckets_only(self, spark, tmp_path):
        """apply_changes rewrites only the feed's buckets: untouched
        replica dirs are carried by reference, byte-identical."""
        import os

        src = self._source(spark, tmp_path)
        src.merge_into(
            spark.createDataFrame([(1, "A", 11)], "k long, v string, n int")
        )
        rep = self._replica_from_v0(spark, tmp_path, src)
        m_before = dict(rep.manifest())
        touched = rep.apply_changes(src.changes(spark, 0, 1))
        m_after = dict(rep.manifest())
        untouched = [b for b in m_before if b not in touched]
        assert untouched and all(m_after[b] == m_before[b] for b in untouched)


class TestOptimizeZorder:
    def _t(self, spark, tmp_path, n_buckets=16):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "source", "lang", "n_chars")
        t = ManifestLakeTable(
            str(tmp_path / "zo"),
            keys=["doc_id"],
            n_buckets=n_buckets,
            stats_cols=["n_chars", "doc_id"],
        )
        t.overwrite(docs)
        return t, docs

    @staticmethod
    def _buckets_intersecting(t, col, lo, hi):
        st, m = t.stats(), t.manifest()
        keep = []
        for b in sorted(m):
            s = st.get(b, {}).get(col)
            if s is None or s[0] is None or not (s[1] < lo or s[0] > hi):
                keep.append(b)
        return len(keep), len(m)

    def test_content_identical_after_rewrite(self, spark, tmp_path):
        t, docs = self._t(spark, tmp_path)
        v = t.optimize_zorder(spark, ["n_chars"])
        assert v == 1 and t.layout() == "zorder"
        got = t.read(spark)
        assert got.exceptAll(docs).count() == 0
        assert docs.exceptAll(got).count() == 0

    def test_single_column_cluster_prunes_ranges(self, spark, tmp_path):
        t, docs = self._t(spark, tmp_path)
        import pyspark.sql.functions as F2

        lo, hi = 200, 300
        before, n = self._buckets_intersecting(t, "n_chars", lo, hi)
        assert before == n  # key-hash scatters every range everywhere
        t.optimize_zorder(spark, ["n_chars"])
        after, n2 = self._buckets_intersecting(t, "n_chars", lo, hi)
        assert after < n2 / 2  # the clustered layout prunes driver-side
        # read_range stays exact regardless of layout
        want = docs.where(F2.col("n_chars").between(lo, hi)).count()
        assert t.read_range(spark, "n_chars", lo, hi).count() == want

    def test_two_column_zorder_prunes_both_dimensions(self, spark, tmp_path):
        t, _ = self._t(spark, tmp_path)
        t.optimize_zorder(spark, ["n_chars", "doc_id"])
        a, n = self._buckets_intersecting(t, "n_chars", 200, 280)
        b, _ = self._buckets_intersecting(t, "doc_id", 0, 60)
        # Z-order trades single-column locality for coverage of BOTH
        # dimensions: each must beat the hash layout's read-everything
        assert a < n and b < n

    def test_merge_refused_until_overwrite_restores_hash(self, spark, tmp_path):
        import pytest as _pytest

        t, docs = self._t(spark, tmp_path)
        t.optimize_zorder(spark, ["n_chars"])
        with _pytest.raises(RuntimeError, match="zorder-clustered"):
            t.merge_into(docs.limit(1))
        with _pytest.raises(RuntimeError, match="zorder-clustered"):
            t.apply_changes(
                docs.limit(0).selectExpr("'insert' as _change_type", "*")
            )
        t.overwrite(docs)
        assert t.layout() == "hash"
        assert t.merge_into(docs.limit(1))  # routes by key again

    def test_prior_version_untouched_and_time_travel(self, spark, tmp_path):
        t, docs = self._t(spark, tmp_path)
        t.optimize_zorder(spark, ["n_chars"])
        # v0 (hash layout) still reads exactly
        v0 = t.read(spark, 0)
        assert v0.count() == docs.count()
        assert t.layout(0) == "hash"

    def test_validation(self, spark, tmp_path):
        import pytest as _pytest

        t, _ = self._t(spark, tmp_path)
        with _pytest.raises(ValueError, match="at least one column"):
            t.optimize_zorder(spark, [])
        with _pytest.raises(ValueError, match="not in table"):
            t.optimize_zorder(spark, ["nope"])


class TestIncrementalViewMaintenance:
    def _src(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(tmp_path / "ivm"), keys=["k"], n_buckets=8)
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
                "k long, g string, v double",
            )
        )
        return t

    def test_preimage_feed_carries_both_update_images(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame([(2, "a", 25.0)], "k long, g string, v double")
        )
        rows = {
            (r["_change_type"], r["k"], r["v"])
            for r in t.changes(spark, 0, 1, update_preimages=True).collect()
        }
        assert rows == {
            ("update_preimage", 2, 20.0),
            ("update_postimage", 2, 25.0),
        }
        # default form unchanged: one 'update' post-image row
        plain = {
            (r["_change_type"], r["k"], r["v"])
            for r in t.changes(spark, 0, 1).collect()
        }
        assert plain == {("update", 2, 25.0)}

    def test_maintained_agg_equals_direct_recompute(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            apply_agg_delta,
            incremental_agg_delta,
            materialize_agg,
        )

        t = self._src(spark, tmp_path)
        # hop 1: update k=2, insert k=9 (new group c)
        t.merge_into(
            spark.createDataFrame(
                [(2, "a", 25.0), (9, "c", 90.0)], "k long, g string, v double"
            )
        )
        # hop 2: overwrite dropping group b entirely and k=9
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "a", 26.0)], "k long, g string, v double"
            )
        )
        agg = materialize_agg(t.read(spark, 0), ["g"], ["v"])
        for hop in ((0, 1), (1, 2)):
            feed = t.changes(spark, *hop, update_preimages=True)
            agg = apply_agg_delta(
                agg, incremental_agg_delta(feed, ["g"], ["v"]), ["g"], ["v"]
            )
        direct = materialize_agg(t.read(spark, 2), ["g"], ["v"])
        got = sorted(map(tuple, agg.collect()))
        want = sorted(map(tuple, direct.collect()))
        assert got == want  # group b and c dropped, sums match
        assert [g for g, *_ in got] == ["a"]

    def test_post_image_only_feed_refused(self, spark, tmp_path):
        import pytest as _pytest

        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            incremental_agg_delta,
        )

        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame([(2, "a", 25.0)], "k long, g string, v double")
        )
        feed = t.changes(spark, 0, 1)  # no preimages
        # r15: the refusal rides the computation (embedded raise_error,
        # no separate validation pass) — it fires at action time
        with _pytest.raises(Exception, match="update_preimages=True"):
            incremental_agg_delta(feed, ["g"], ["v"]).collect()

    def test_apply_changes_accepts_preimage_feed(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame([(2, "a", 25.0)], "k long, g string, v double")
        )
        rep = ManifestLakeTable(str(tmp_path / "rep"), keys=["k"], n_buckets=4)
        rep.overwrite(t.read(spark, 0))
        rep.apply_changes(t.changes(spark, 0, 1, update_preimages=True))
        got = sorted(map(tuple, rep.read(spark).collect()))
        want = sorted(map(tuple, t.read(spark, 1).collect()))
        assert got == want


class TestMinMaxIVM:
    """apply_minmax_delta: extremes maintained through pre-image feeds —
    inserts fold monotonically; deletes that hit a recorded extreme
    trigger the affected-groups-only recompute from the post-change
    base; deletes that don't, never touch base."""

    def _src(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(tmp_path / "mm"), keys=["k"], n_buckets=8)
        t.overwrite(
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
                "k long, g string, v double",
            )
        )
        return t

    def _maintain(self, spark, t, hops):
        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            apply_minmax_delta,
            materialize_minmax,
        )

        agg = materialize_minmax(t.read(spark, 0), ["g"], "v")
        for v_from, v_to in hops:
            feed = t.changes(spark, v_from, v_to, update_preimages=True)
            agg = apply_minmax_delta(
                agg, feed, t.read(spark, v_to), ["g"], "v"
            )
        return agg

    def _assert_matches_direct(self, spark, t, agg, version):
        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            materialize_minmax,
        )

        got = sorted(map(tuple, agg.collect()))
        want = sorted(
            map(tuple, materialize_minmax(t.read(spark, version), ["g"], "v").collect())
        )
        assert got == want

    def test_insert_extends_extremes_fast_path(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame(
                [(5, "a", 99.0), (6, "a", 1.0)], "k long, g string, v double"
            )
        )
        agg = self._maintain(spark, t, [(0, 1)])
        self._assert_matches_direct(spark, t, agg, 1)

    def test_delete_of_non_extreme_keeps_extremes(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        # delete k=2 (v=20, strictly inside group a's [10, 20]... no —
        # 20 IS the max; delete k=3 instead: 30 is group b's min) — use
        # a mid value: add one first so the delete is truly interior
        t.merge_into(
            spark.createDataFrame([(5, "b", 35.0)], "k long, g string, v double")
        )
        t.overwrite(t.read(spark, 1).where("k <> 5"))  # delete interior 35
        agg = self._maintain(spark, t, [(0, 1), (1, 2)])
        self._assert_matches_direct(spark, t, agg, 2)

    def test_delete_of_max_triggers_recompute(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        t.overwrite(t.read(spark, 0).where("k <> 4"))  # 40 was b's max
        agg = self._maintain(spark, t, [(0, 1)])
        self._assert_matches_direct(spark, t, agg, 1)
        row = {r["g"]: r for r in agg.collect()}
        assert row["b"]["max_v"] == 30.0 and row["b"]["n_rows"] == 1

    def test_update_moving_extreme_down(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        # k=4 held b's max 40 -> now 5.0: preimage delete hits max AND
        # postimage insert sets the new min — both paths in one hop
        t.merge_into(
            spark.createDataFrame([(4, "b", 5.0)], "k long, g string, v double")
        )
        agg = self._maintain(spark, t, [(0, 1)])
        self._assert_matches_direct(spark, t, agg, 1)
        row = {r["g"]: r for r in agg.collect()}
        assert (row["b"]["min_v"], row["b"]["max_v"]) == (5.0, 30.0)

    def test_group_vanishes_when_all_rows_deleted(self, spark, tmp_path):
        t = self._src(spark, tmp_path)
        t.overwrite(t.read(spark, 0).where("g <> 'b'"))
        agg = self._maintain(spark, t, [(0, 1)])
        assert [r["g"] for r in agg.collect()] == ["a"]

    def test_non_invalidated_groups_never_read_base(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            apply_minmax_delta,
            materialize_minmax,
        )

        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame([(7, "a", 15.0)], "k long, g string, v double")
        )
        agg0 = materialize_minmax(t.read(spark, 0), ["g"], "v")
        feed = t.changes(spark, 0, 1, update_preimages=True)
        # insert-only feed: maintained WITHOUT recomputing any group —
        # pass a base that raises if any of its v values is evaluated
        poisoned = t.read(spark, 1).withColumn(
            "v", F.raise_error(F.lit("base must not be aggregated"))
        )
        agg = apply_minmax_delta(agg0, feed, poisoned, ["g"], "v")
        self._assert_matches_direct(spark, t, agg, 1)

    def test_post_image_only_feed_refused(self, spark, tmp_path):
        import pytest as _pytest

        from fred_economic_data_pipeline_local_spark.operators.ivm import (
            apply_minmax_delta,
            materialize_minmax,
        )

        t = self._src(spark, tmp_path)
        t.merge_into(
            spark.createDataFrame([(2, "a", 25.0)], "k long, g string, v double")
        )
        agg0 = materialize_minmax(t.read(spark, 0), ["g"], "v")
        # r15: embedded raise_error fires at action time (see above)
        with _pytest.raises(Exception, match="update_preimages=True"):
            apply_minmax_delta(
                agg0, t.changes(spark, 0, 1), t.read(spark, 1), ["g"], "v"
            ).collect()


class TestShallowClone:
    def _docs(self, spark, n=40):
        return spark.range(n).selectExpr("id AS k", "id * 10 AS v")

    def _table(self, spark, root, df):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            ManifestLakeTable,
        )

        t = ManifestLakeTable(str(root), keys=["k"], n_buckets=4)
        t.overwrite(df)
        return t

    def test_clone_reads_source_snapshot_zero_copy(self, spark, tmp_path):
        import os

        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        df = self._docs(spark)
        src = self._table(spark, tmp_path / "src", df)
        clone = shallow_clone(src, str(tmp_path / "cl"))
        assert sorted(r.k for r in clone.read(spark).collect()) == list(
            range(40)
        )
        # zero copy: no data files under the clone's own data dir
        data = os.path.join(str(tmp_path / "cl"), "data")
        assert os.listdir(data) == []

    def test_clone_mutations_never_touch_source(self, spark, tmp_path):
        import os

        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        src = self._table(spark, tmp_path / "src", self._docs(spark))
        before = {
            d: sorted(os.listdir(os.path.join(str(tmp_path / "src"), "data", d)))
            for d in os.listdir(os.path.join(str(tmp_path / "src"), "data"))
        }
        clone = shallow_clone(src, str(tmp_path / "cl"))
        clone.merge_into(
            spark.range(5).selectExpr("id AS k", "id * 1000 AS v")
        )
        after = {
            d: sorted(os.listdir(os.path.join(str(tmp_path / "src"), "data", d)))
            for d in os.listdir(os.path.join(str(tmp_path / "src"), "data"))
        }
        assert before == after  # source bytes untouched
        got = {r.k: r.v for r in clone.read(spark).collect()}
        assert got[3] == 3000 and got[39] == 390
        # the source still reads its own state
        src_got = {r.k: r.v for r in src.read(spark).collect()}
        assert src_got[3] == 30

    def test_source_merge_does_not_move_clone(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        src = self._table(spark, tmp_path / "src", self._docs(spark))
        clone = shallow_clone(src, str(tmp_path / "cl"))
        src.merge_into(
            spark.range(10).selectExpr("id AS k", "id * 777 AS v")
        )
        got = {r.k: r.v for r in clone.read(spark).collect()}
        assert got[3] == 30  # clone pinned to the cloned snapshot

    def test_clone_vacuum_cannot_drop_source_bytes(self, spark, tmp_path):
        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        src = self._table(spark, tmp_path / "src", self._docs(spark))
        clone = shallow_clone(src, str(tmp_path / "cl"))
        clone.merge_into(
            spark.range(5).selectExpr("id AS k", "id * 1000 AS v")
        )
        removed = clone.vacuum(keep=1)
        assert all(not r.startswith("/") for r in removed)
        assert sorted(
            r.k for r in src.read(spark).collect()
        ) == list(range(40))

    def test_source_vacuum_breaks_historical_clone_documented(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        src = self._table(spark, tmp_path / "src", self._docs(spark))
        clone = shallow_clone(src, str(tmp_path / "cl"))
        src.overwrite(spark.range(3).selectExpr("id AS k", "id AS v"))
        src.vacuum(keep=1)  # drops the dirs the clone references
        with _pytest.raises(Exception):
            clone.read(spark).collect()

    def test_time_travel_clone_and_existing_target_refused(
        self, spark, tmp_path
    ):
        import pytest as _pytest

        from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
            shallow_clone,
        )

        src = self._table(spark, tmp_path / "src", self._docs(spark, 10))
        src.merge_into(
            spark.range(10, 20).selectExpr("id AS k", "id * 10 AS v")
        )
        old = shallow_clone(src, str(tmp_path / "cl0"), version=0)
        assert old.read(spark).count() == 10
        with _pytest.raises(FileExistsError):
            shallow_clone(src, str(tmp_path / "cl0"))


def test_zone_overlap_hash_vs_zorder(spark, tmp_path):
    """The clustering-quality metric behind manifest_zone_report:
    key-hash routing scatters every value range into every bucket
    (full pairwise overlap), OPTIMIZE ZORDER turns the same data into
    (near-)disjoint slices."""
    from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
        ManifestLakeTable,
    )

    df = spark.range(400).selectExpr("id AS k", "id AS v")
    t = ManifestLakeTable(
        str(tmp_path / "t"), keys=["k"], n_buckets=8, stats_cols=["v"]
    )
    t.overwrite(df)

    def overlap_pairs(stats):
        rs = [(s["v"][0], s["v"][1]) for s in stats.values()]
        return sum(
            1
            for i, a in enumerate(rs)
            for j, b in enumerate(rs)
            if i != j and not (b[1] < a[0] or b[0] > a[1])
        )

    hash_overlap = overlap_pairs(t.stats())
    t.optimize_zorder(spark, ["v"])
    zorder_overlap = overlap_pairs(t.stats())
    assert hash_overlap == 8 * 7  # every pair overlaps under hash
    assert zorder_overlap < hash_overlap / 4
