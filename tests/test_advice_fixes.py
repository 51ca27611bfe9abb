"""Regression tests for round-1 advisor findings (ADVICE.md):

1. asof_join must attach ONE right row — a NULL payload field in the
   matching row stays NULL instead of being backfilled from an older row.
2. Lake writers must be dynamic-overwrite even on sessions that don't set
   spark.sql.sources.partitionOverwriteMode (external/driver sessions).
3. neardup_components terminates on an exact changed-label count and
   raises when max_iters is exhausted before the fixpoint.
4. salted_join rejects join types where small-side replication would
   surface unmatched rows N times.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    neardup_components,
)
from fred_economic_data_pipeline_local_spark.operators.skew import salted_join
from fred_economic_data_pipeline_local_spark.operators.temporal import asof_join
from fred_economic_data_pipeline_local_spark.sources import lake


def test_asof_attaches_matching_rows_nulls_not_older_values(spark):
    """The most recent right row has value=NULL: the joined output must
    carry that NULL (merge_asof semantics), not the older row's 5.0."""
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, t(25))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), 5.0, "older"), (1, t(20), None, "newest")],
        "user_id long, ts timestamp, value double, note string",
    )
    [row] = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value", "note"]
    ).collect()
    assert row.note_right == "newest"
    assert row.ts_right == t(20)
    assert row.value_right is None  # not backfilled from the t=10 row


def test_lake_overwrite_is_dynamic_even_on_static_session(spark, tmp_path):
    """Writing series B must not truncate series A's partitions, even when
    the session conf asks for static overwrite (external-session case)."""
    root = str(tmp_path)
    mk = lambda ind: spark.createDataFrame(
        [(ind, "2024-01-01", 1.5, 2024, 1)],
        "indicator string, observation_date string, value double,"
        " observation_year int, observation_month int",
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        lake.write_silver(mk("GDP"), root)
        lake.write_silver(mk("UNRATE"), root)
        got = {
            r.indicator
            for r in lake.read_silver(spark, root).select("indicator").collect()
        }
        assert got == {"GDP", "UNRATE"}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _path_graph(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )


def test_components_converge_on_path_graph(spark):
    comp = neardup_components(_path_graph(spark, 8))
    rows = comp.collect()
    assert len(rows) == 8
    assert {r.component for r in rows} == {0}


def test_components_raise_when_max_iters_exhausted(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        # a path of 8 nodes needs ~7 propagation rounds; 2 can't finish
        neardup_components(_path_graph(spark, 8), max_iters=2)


def test_salted_join_rejects_replicating_join_types(spark):
    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, on=["k"], how=how)
    # allowed types still work
    assert salted_join(big, small, on=["k"], how="left").count() == 1


# --- round-5 advisor findings ------------------------------------------------
#
# 5. run_curation_job must account for 100% of its input: the benchmark
#    rows (doc_id % bench_modulus == 0) are written as split=benchmark,
#    not silently dropped; and the returned counts come from the written
#    DataFrame, never a re-read of out_root where stale pre-existing
#    partitions would leak in.
# 6. The events.ts timestamp-unit sniff is keyed on (path, mtime, size)
#    so a regenerated fixture at the same path is re-probed, and it
#    fails loudly for an existing-but-uninspectable file instead of
#    guessing "not nanos".
# 7. hard_negatives requires an explicit query bound (n_query) or an
#    explicit unbounded=True opt-in — the default can't be an O(n^2)
#    broadcast nested loop.


def test_curation_job_counts_ignore_stale_partitions(spark, tmp_path):
    """A pre-existing split partition the job didn't produce must not
    appear in the returned counts."""
    import os

    from fred_economic_data_pipeline_local_spark.jobs import run_curation_job

    out = str(tmp_path / "curated")
    # poison the lake with a partition no run produces
    stale = spark.createDataFrame(
        [(999_999, "stale doc", "en", "web", 9)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    stale.write.parquet(os.path.join(out, "split=zombie"))
    counts = run_curation_job(
        spark, "/root/testdata/sf0.001/documents.parquet", out
    )
    assert "zombie" not in counts
    assert counts.get("benchmark", 0) > 0


def test_curation_job_accounts_for_every_input_doc(spark, tmp_path):
    """benchmark + gated-out + deduped-out + decontaminated-out +
    train/val/test = total input; in particular the benchmark rows are
    in the written lake."""
    from fred_economic_data_pipeline_local_spark.jobs import (
        CurationConfig,
        run_curation_job,
    )

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "curated")
    cfg = CurationConfig()
    counts = run_curation_job(spark, docs_path, out, cfg)
    docs = spark.read.parquet(docs_path)
    n_bench = docs.where(F.col("doc_id") % cfg.bench_modulus == 0).count()
    assert counts["benchmark"] == n_bench
    written = spark.read.parquet(out)
    assert written.where(F.col("split") == "benchmark").count() == n_bench
    # the lake and the returned summary agree exactly
    lake_counts = {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert lake_counts == counts


def test_ts_unit_cache_invalidated_on_rewrite(tmp_path):
    """Same path, new file contents -> the footer is re-probed (the old
    path-keyed cache would keep serving the first verdict forever)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fred_economic_data_pipeline_local_spark.catalog import (
        _events_ts_is_nanos,
    )

    path = str(tmp_path / "events.parquet")
    ns = pa.table({"ts": pa.array([1], type=pa.timestamp("ns"))})
    us = pa.table({"ts": pa.array([1], type=pa.timestamp("us"))})
    pq.write_table(ns, path)
    assert _events_ts_is_nanos(path) is True
    import os
    import time

    os.remove(path)
    pq.write_table(us, path)
    # ensure the stat key actually changed even on coarse mtime clocks
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert _events_ts_is_nanos(path) is False


def test_ts_unit_probe_missing_file_is_plain_read(tmp_path):
    from fred_economic_data_pipeline_local_spark.catalog import (
        _events_ts_is_nanos,
    )

    assert _events_ts_is_nanos(str(tmp_path / "nope.parquet")) is False


def test_ts_unit_probe_fails_loudly_on_unreadable_existing_file(tmp_path):
    from fred_economic_data_pipeline_local_spark.catalog import (
        _events_ts_is_nanos,
    )

    bad = tmp_path / "events.parquet"
    bad.write_bytes(b"this is not parquet")
    with pytest.raises(RuntimeError, match="timestamp unit"):
        _events_ts_is_nanos(str(bad))


def test_hard_negatives_requires_explicit_bound(spark):
    from fred_economic_data_pipeline_local_spark.operators.curation import (
        hard_negatives,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    with pytest.raises(ValueError, match="n_query"):
        hard_negatives(emb, k=1)
    # both opt-ins still work
    assert hard_negatives(emb, k=1, n_query=1).count() == 1
    assert hard_negatives(emb, k=1, unbounded=True).count() == 2
