"""Bucketing-spec validation + rebucket() layout evolution for
ManifestLakeTable: the spec (keys, n_buckets) rides in every manifest,
mismatched writer instances are refused instead of silently mis-routing
merges, and rebucket() changes the bucket count in one exchange."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
    ManifestLakeTable,
)


def _df(spark, n=40, base=0):
    return spark.range(base, base + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )


def _content(t, spark):
    return sorted(
        (r.k, r.v) for r in t.read(spark).select("k", "v").collect()
    )


class TestSpecValidation:
    def test_spec_recorded_in_manifest(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark))
        doc = json.load(open(t._manifest_path(0)))
        assert doc["keys"] == ["k"] and doc["n_buckets"] == 4

    def test_mismatched_bucket_count_refused(self, spark, tmp_path):
        root = str(tmp_path / "t")
        ManifestLakeTable(root, keys=["k"], n_buckets=4).overwrite(_df(spark))
        wrong = ManifestLakeTable(root, keys=["k"], n_buckets=8)
        with pytest.raises(RuntimeError, match="bucketing spec"):
            wrong.merge_into(_df(spark, n=5, base=100))

    def test_mismatched_keys_refused(self, spark, tmp_path):
        root = str(tmp_path / "t")
        ManifestLakeTable(root, keys=["k"], n_buckets=4).overwrite(_df(spark))
        wrong = ManifestLakeTable(root, keys=["v"], n_buckets=4)
        with pytest.raises(RuntimeError, match="bucketing spec"):
            wrong.merge_into(_df(spark, n=5, base=100))

    def test_pre_spec_manifest_accepted(self, spark, tmp_path):
        # manifests written before the spec existed have no "keys" entry
        root = str(tmp_path / "t")
        t = ManifestLakeTable(root, keys=["k"], n_buckets=4)
        t.overwrite(_df(spark))
        p = t._manifest_path(0)
        doc = json.load(open(p))
        del doc["keys"], doc["n_buckets"]
        json.dump(doc, open(p, "w"))
        t2 = ManifestLakeTable(root, keys=["k"], n_buckets=4)
        assert t2.merge_into(_df(spark, n=5, base=100))

    def test_overwrite_may_change_spec(self, spark, tmp_path):
        # overwrite is a full rewrite: a new spec is legitimate there
        root = str(tmp_path / "t")
        ManifestLakeTable(root, keys=["k"], n_buckets=4).overwrite(_df(spark))
        t2 = ManifestLakeTable(root, keys=["k"], n_buckets=8)
        t2.overwrite(_df(spark))
        assert json.load(open(t2._manifest_path(1)))["n_buckets"] == 8
        assert t2.merge_into(_df(spark, n=5, base=100))


class TestRebucket:
    def test_content_identical_and_spec_updated(self, spark, tmp_path):
        t = ManifestLakeTable(
            str(tmp_path / "t"), keys=["k"], n_buckets=4, stats_cols=["v"]
        )
        t.overwrite(_df(spark, n=60))
        t.merge_into(_df(spark, n=10, base=60))
        before = _content(t, spark)
        v = t.rebucket(spark, 16)
        assert t.n_buckets == 16
        assert _content(t, spark) == before
        doc = json.load(open(t._manifest_path(v)))
        assert doc["n_buckets"] == 16 and doc["layout"] == "hash"
        # more buckets than the old 4 actually materialized
        assert len(t.manifest(v)) > 4

    def test_prior_version_still_readable(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, n=30))
        before = _content(t, spark)
        t.rebucket(spark, 8)
        assert sorted(
            (r.k, r.v) for r in t.read(spark, 0).collect()
        ) == before

    def test_merges_work_after_rebucket(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, n=30))
        t.rebucket(spark, 8)
        t.merge_into(_df(spark, n=10, base=30))
        assert len(_content(t, spark)) == 40
        # and the fresh instance opened with the NEW count also works
        t2 = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=8)
        t2.merge_into(_df(spark, n=5, base=40))
        assert len(_content(t2, spark)) == 45

    def test_rebucket_restores_hash_from_zorder(self, spark, tmp_path):
        t = ManifestLakeTable(
            str(tmp_path / "t"), keys=["k"], n_buckets=4, stats_cols=["v"]
        )
        t.overwrite(_df(spark, n=60))
        t.optimize_zorder(spark, ["v"])
        with pytest.raises(RuntimeError, match="zorder"):
            t.merge_into(_df(spark, n=5, base=60))
        t.rebucket(spark, 8)
        assert t.layout() == "hash"
        t.merge_into(_df(spark, n=5, base=60))
        assert len(_content(t, spark)) == 65

    def test_zone_maps_recomputed(self, spark, tmp_path):
        t = ManifestLakeTable(
            str(tmp_path / "t"), keys=["k"], n_buckets=2, stats_cols=["v"]
        )
        t.overwrite(_df(spark, n=50))
        t.rebucket(spark, 8)
        st = t.stats()
        assert st and all("v" in s for s in st.values())
        # stats describe the new buckets' actual bytes
        got = sorted(
            (r.k, r.v) for r in t.read_range(spark, "v", 100, 200).collect()
        )
        assert got == [(k, k * 10) for k in range(10, 21)]

    def test_failed_rebucket_keeps_old_spec(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        with pytest.raises(FileNotFoundError):
            t.rebucket(spark, 8)  # uninitialized
        assert t.n_buckets == 4
