"""SCD Type-2 reconstruction from the manifest commit log: epoch
bounds, deletes, re-inserts, byte-identical non-fragmentation, schema
evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.scd import (
    committed_versions,
    scd2_history,
)
from fred_economic_data_pipeline_local_spark.sources.lakehouse import (
    ManifestLakeTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _hist(spark, t):
    return {
        (r.k, r.v, r.valid_from, r.valid_to)
        for r in scd2_history(spark, t).collect()
    }


class TestScd2:
    def test_update_bounds_epoch(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
        t.merge_into(_df(spark, [(1, "a2")]))
        assert _hist(spark, t) == {
            (1, "a", 0, 0),
            (1, "a2", 1, None),
            (2, "b", 0, None),
        }

    def test_delete_closes_without_opening(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
        t.overwrite(_df(spark, [(2, "b")]))  # true delete of k=1
        assert _hist(spark, t) == {
            (1, "a", 0, 0),
            (2, "b", 0, None),
        }

    def test_reinsert_opens_new_epoch(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a")]))
        t.overwrite(_df(spark, [(2, "x")]))       # delete k=1
        t.merge_into(_df(spark, [(1, "back")]))   # re-insert at v2
        h = _hist(spark, t)
        assert (1, "a", 0, 0) in h and (1, "back", 2, None) in h

    def test_byte_identical_rewrite_does_not_fragment(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
        t.merge_into(_df(spark, [(1, "a")]))  # no-op value
        t.merge_into(_df(spark, [(2, "b2")]))
        assert _hist(spark, t) == {
            (1, "a", 0, None),  # single unfragmented epoch
            (2, "b", 0, 1),
            (2, "b2", 2, None),
        }

    def test_schema_evolution_epochs(self, spark, tmp_path):
        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a")]))
        t.merge_into(
            spark.createDataFrame(
                [(1, "a2", 7)], "k long, v string, extra long"
            ),
            evolve_schema=True,
        )
        rows = {
            (r.k, r.v, r.extra, r.valid_from, r.valid_to)
            for r in scd2_history(spark, t).collect()
        }
        assert rows == {(1, "a", None, 0, 0), (1, "a2", 7, 1, None)}

    def test_committed_versions_ignores_debris(self, spark, tmp_path):
        import json
        import os

        t = ManifestLakeTable(str(tmp_path / "t"), keys=["k"], n_buckets=4)
        t.overwrite(_df(spark, [(1, "a")]))
        t.merge_into(_df(spark, [(2, "b")]))
        # crashed writer's manifest above _LATEST: not committed history
        debris = os.path.join(str(tmp_path / "t"), "_manifests", "m=9.json")
        json.dump({"buckets": {}, "stats": {}}, open(debris, "w"))
        assert committed_versions(t) == [0, 1]
