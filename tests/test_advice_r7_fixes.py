"""Regression tests for round-7 advisor findings (ADVICE.md):

1. Writer-lock TOCTOU: every mutating lakehouse method reads
   current_version() / layout / txn state INSIDE the locked region, so
   a writer that blocks on the lock can never commit from a stale
   version read (lost update). Simulated by mutating the table between
   a would-be pre-lock read and the lock via a lock-acquire hook.
2. changes() across an evolve_schema merge: both version slices align
   to the union schema, so the CDC diff resolves instead of raising.
3. bloom_prune casts the probe key to the BUILD side's recorded type:
   an int-vs-bigint key width mismatch must not create false negatives.
4. bloom_pruned_join sizes the mask by bloom_params when
   expected_keys is given (fpp-driven, not the fixed default).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_prune,
    bloom_pruned_join,
)
from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
    ManifestLakeTable,
)


def _table(spark, root, rows, n_buckets=4):
    t = ManifestLakeTable(str(root), keys=["k"], n_buckets=n_buckets)
    t.overwrite(spark.createDataFrame(rows, "k long, v string"))
    return t


class TestWriterLockToctou:
    """The race: writer B reads version N, writer A commits N+1, B
    acquires the lock and rewrites N+1 from N's state. With the state
    read inside the locked region, B must observe N+1. We simulate A's
    interleaved commit with an acquire hook on B's lock."""

    def _interpose(self, table_b, commit_fn):
        real_acquire = table_b._lock.acquire
        fired = {"n": 0}

        def hooked():
            if fired["n"] == 0:
                fired["n"] += 1
                commit_fn()  # "A" commits while "B" is entering
            real_acquire()

        table_b._lock.acquire = hooked
        return fired

    def test_merge_into_sees_interleaved_commit(self, spark, tmp_path):
        t = _table(spark, tmp_path / "t", [(1, "a"), (2, "b")])
        other = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)

        def a_commits():
            other.merge_into(spark.createDataFrame([(3, "c")], "k long, v string"))

        fired = self._interpose(t, a_commits)
        t.merge_into(spark.createDataFrame([(4, "d")], "k long, v string"))
        assert fired["n"] == 1
        got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
        # A's row 3 must survive B's merge — the lost update of the bug
        assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}

    def test_apply_changes_sees_interleaved_commit(self, spark, tmp_path):
        t = _table(spark, tmp_path / "t", [(1, "a")])
        other = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)

        def a_commits():
            other.merge_into(spark.createDataFrame([(9, "z")], "k long, v string"))

        self._interpose(t, a_commits)
        feed = spark.createDataFrame(
            [("insert", 2, "b")], "_change_type string, k long, v string"
        )
        t.apply_changes(feed)
        got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
        assert got == {(1, "a"), (9, "z"), (2, "b")}

    def test_optimize_zorder_rewrites_interleaved_commit(self, spark, tmp_path):
        t = _table(spark, tmp_path / "t", [(i, f"v{i}") for i in range(20)])
        other = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)

        def a_commits():
            other.merge_into(
                spark.createDataFrame([(100, "late")], "k long, v string")
            )

        self._interpose(t, a_commits)
        t.optimize_zorder(spark, ["k"])
        got = {r["k"] for r in t.read(spark).collect()}
        assert 100 in got  # A's commit is inside the clustered rewrite


class TestChangesAcrossSchemaEvolution:
    def test_changes_across_evolve_schema_merge(self, spark, tmp_path):
        t = _table(spark, tmp_path / "t", [(1, "a"), (2, "b")])
        v0 = t.current_version()
        t.merge_into(
            spark.createDataFrame(
                [(2, "b2", 7.0), (3, "c", 8.0)], "k long, v string, w double"
            ),
            evolve_schema=True,
        )
        feed = t.changes(spark, v0)
        assert set(feed.columns) == {"_change_type", "k", "v", "w"}
        rows = {
            (r["_change_type"], r["k"], r["v"], r["w"])
            for r in feed.collect()
        }
        assert ("insert", 3, "c", 8.0) in rows
        assert ("update", 2, "b2", 7.0) in rows
        # untouched key 1 appears only if its bucket was rewritten; if
        # present it must NOT be a spurious change row
        assert not any(r[1] == 1 for r in rows)

    def test_changes_across_column_dropping_overwrite(self, spark, tmp_path):
        t = _table(spark, tmp_path / "t", [(1, "a")])
        t.merge_into(
            spark.createDataFrame([(1, "a", 1.5)], "k long, v string, w double"),
            evolve_schema=True,
        )
        v1 = t.current_version()
        t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
        feed = t.changes(spark, v1)
        assert "w" in feed.columns  # union schema, old side supplies w


class TestBloomKeyTypeCanonicalization:
    def test_int_fact_bigint_dim_no_false_negatives(self, spark):
        dim = spark.createDataFrame([(i,) for i in range(0, 50, 2)], "k long")
        fact = spark.createDataFrame(
            [(i,) for i in range(50)], "k int"
        )
        mask = bloom_build(dim, "k", m_bits=1 << 10)
        kept = {r["k"] for r in bloom_prune(fact, "k", mask).collect()}
        assert set(range(0, 50, 2)) <= kept  # every true match survives

    def test_bigint_fact_int_dim_no_false_negatives(self, spark):
        dim = spark.createDataFrame([(i,) for i in range(0, 50, 2)], "k int")
        fact = spark.createDataFrame([(i,) for i in range(50)], "k long")
        mask = bloom_build(dim, "k", m_bits=1 << 10)
        kept = {r["k"] for r in bloom_prune(fact, "k", mask).collect()}
        assert set(range(0, 50, 2)) <= kept

    def test_mixed_width_pruned_join_row_identical(self, spark):
        dim = spark.createDataFrame([(i, f"d{i}") for i in range(0, 40, 4)],
                                    "dk int, name string")
        fact = spark.createDataFrame([(i, i * 10) for i in range(40)],
                                     "fk long, val long")
        j = bloom_pruned_join(fact, dim, "fk", "dk")
        plain = fact.join(dim, fact["fk"] == dim["dk"], "inner")
        assert sorted(tuple(r) for r in j.collect()) == sorted(
            tuple(r) for r in plain.collect()
        )


class TestBloomParamSizing:
    def test_expected_keys_drives_mask_size(self, spark):
        dim = spark.createDataFrame([(i,) for i in range(100)], "k long")
        fact = spark.createDataFrame([(i,) for i in range(1000)], "k long")
        m, k = bloom_params(100, fpp=0.01)
        # the sized mask appears in the plan as an array literal of
        # exactly m/64 words — fpp-driven, not the 1<<17 default
        j = bloom_pruned_join(
            fact, dim, "k", "k", expected_keys=100, fpp=0.01
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        n_words = m // 64
        assert n_words != (1 << 17) // 64
        literal_arrays = [
            seg for seg in plan.split("[") if seg.count(",") >= n_words - 1
        ]
        assert literal_arrays, "sized mask literal not found in plan"
        assert j.count() == 100
