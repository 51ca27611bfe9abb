"""FRED-parity queries over the driver fixtures.

The ``events`` table stands in for bronze observations (event_type ->
indicator, ts -> observation date/ingest time), so the reference's core
computations (SURVEY.md §3.2/§3.3 + serving ops K3/K4) are exercised and
oracle-checked end-to-end on driver data. Audit columns that are
wall-clock-dependent (processed_at/aggregated_at) are pinned to a fixed
literal inside checked queries (SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.fred import events_as_bronze, gold_aggregate, silver_transform
from ..operators.serve import dedup_append_delta, upsert_merge
from .registry import query

# fixed audit stamp inside oracle-checked queries (determinism)
_STAMP = "2026-01-01T00:00:00+00:00"

_SILVER_ORACLE_BODY = """
SELECT event_type AS indicator,
       CAST(year(ts) AS INTEGER) AS observation_year,
       CAST(day(ts) AS INTEGER) AS observation_month,  -- fixture spans one month: day plays the bucket key
       round(avg(value), 6) AS value,
       count(value) AS observation_count,
       strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%f+00:00') AS ingested_at
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2, 3
"""


def _silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    bronze = events_as_bronze(load_table(spark, "events", sf_dir))
    return silver_transform(bronze, processed_at_iso=_STAMP).withColumn(
        "value", F.round("value", 6)
    )


@query(
    "fred_silver_monthly",
    oracle=f"""
SELECT indicator, observation_year, observation_month, value,
       observation_count, ingested_at, '{_STAMP}' AS processed_at
FROM ({_SILVER_ORACLE_BODY})
""",
    description="SURVEY §3.2 flagship: filter+cast+group avg/count/max (A1,F1,F2,C3,C5,P2,P4)",
)
def fred_silver_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _silver(spark, sf_dir)


@query(
    "fred_gold_yearly",
    oracle=f"""
SELECT indicator, observation_year, observation_month,
       round_even(value, 2) AS value,
       observation_count, ingested_at,
       '{_STAMP}' AS processed_at, '{_STAMP}' AS aggregated_at
FROM ({_SILVER_ORACLE_BODY})
""",
    description="SURVEY §3.3 gold: union-by-scan + half-even bround (U1, A2, P4)",
)
def fred_gold_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold_aggregate(_silver(spark, sf_dir), aggregated_at_iso=_STAMP)


@query(
    "fred_dedup_append",
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
incoming AS (SELECT * FROM silver WHERE observation_month >= 5),
existing AS (SELECT indicator, observation_year, observation_month
             FROM silver WHERE observation_month <= 8)
SELECT i.* FROM incoming i
WHERE NOT EXISTS (
  SELECT 1 FROM existing e
  WHERE e.indicator = i.indicator
    AND e.observation_year = i.observation_year
    AND e.observation_month = i.observation_month
)
""",
    description="SURVEY §2.5 J1 / §2.2 K4: left-anti dedup append with lenient keys",
)
def fred_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = _silver(spark, sf_dir).drop("processed_at")
    incoming = silver.where(F.col("observation_month") >= 5)
    # serving state comes back all-string (Sheets): exercise the lenient
    # key normalization (load_fred_data_to_google.py:94-101)
    existing = (
        silver.where(F.col("observation_month") <= 8)
        .select(
            F.col("indicator"),
            F.col("observation_year").cast("string").alias("observation_year"),
            F.col("observation_month").cast("string").alias("observation_month"),
        )
    )
    return dedup_append_delta(incoming, existing)


@query(
    "fred_upsert_merge",
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5)
SELECT COALESCE(s.indicator, t.indicator) AS indicator,
       COALESCE(s.observation_year, t.observation_year) AS observation_year,
       COALESCE(s.observation_month, t.observation_month) AS observation_month,
       CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value,
       CASE WHEN s.indicator IS NOT NULL THEN s.observation_count
            ELSE t.observation_count END AS observation_count
FROM t FULL OUTER JOIN s
  ON t.indicator = s.indicator
 AND t.observation_year = s.observation_year
 AND t.observation_month = s.observation_month
""",
    description="SURVEY §2.2 K3 / §2.5 J2: ON CONFLICT DO UPDATE as full-outer merge",
)
def fred_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: the v0 write and the merge source otherwise each
    # re-execute the silver transform
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value", "observation_count"
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    return upsert_merge(target, source)


@query(
    "fred_merge_into_lake",
    # identical oracle to fred_upsert_merge: the lakehouse MERGE must
    # produce byte-identical content through its full write-commit-read
    # round trip (versioned parquet + atomic _LATEST pointer flip)
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5)
SELECT COALESCE(s.indicator, t.indicator) AS indicator,
       COALESCE(s.observation_year, t.observation_year) AS observation_year,
       COALESCE(s.observation_month, t.observation_month) AS observation_month,
       CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value,
       CASE WHEN s.indicator IS NOT NULL THEN s.observation_count
            ELSE t.observation_count END AS observation_count
FROM t FULL OUTER JOIN s
  ON t.indicator = s.indicator
 AND t.observation_year = s.observation_year
 AND t.observation_month = s.observation_month
""",
    description="SURVEY §2.2 K3, lakehouse backend: the same ON CONFLICT "
    "DO UPDATE merge executed as a transactional MERGE INTO against a "
    "versioned parquet lake table (copy-on-write version dirs + atomic "
    "_LATEST pointer commit — sources/lakehouse.py), read back from the "
    "committed version",
)
def fred_merge_into_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint'd result: no oracle reads
    # this table's files, and a fixed shared root let any concurrent
    # process (bench reps, a parallel pytest) rewrite the bytes a
    # lazily-returned frame re-reads (the r7 driver hash-red mechanism)
    import tempfile

    from ..sources.lakehouse import LakeTable

    # persist: the v0 write and the merge source otherwise each
    # re-execute the silver transform
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value", "observation_count"
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    table = LakeTable(tempfile.mkdtemp(prefix="fred_merge_lake_"))
    table.overwrite(target)
    table.merge_into(source)
    out = table.read(spark).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "fred_merge_into_manifest",
    # identical oracle to fred_merge_into_lake: whatever the storage
    # backend, MERGE INTO must produce byte-identical content through
    # its full write-commit-read round trip — here the file-level
    # commit-log variant (immutable bucket dirs + manifest + atomic
    # pointer flip), exercising manifest-pruned target reads and
    # untouched-dir re-referencing on the way
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5)
SELECT COALESCE(s.indicator, t.indicator) AS indicator,
       COALESCE(s.observation_year, t.observation_year) AS observation_year,
       COALESCE(s.observation_month, t.observation_month) AS observation_month,
       CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value,
       CASE WHEN s.indicator IS NOT NULL THEN s.observation_count
            ELSE t.observation_count END AS observation_count
FROM t FULL OUTER JOIN s
  ON t.indicator = s.indicator
 AND t.observation_year = s.observation_year
 AND t.observation_month = s.observation_month
""",
    description="SURVEY §2.2 K3, file-level-commit-log backend: the same "
    "ON CONFLICT merge against a manifest lake table — immutable bucket "
    "dirs, manifest naming the live file set, one atomic pointer flip "
    "(global atomicity AND O(delta) rewrite at once; "
    "sources/lakehouse.py ManifestLakeTable), read back via the "
    "manifest, never directory discovery",
)
def fred_merge_into_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    # persist: the writes below each re-execute the silver transform
    # otherwise (and merges consume their source twice internally)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    table = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_merge_manifest_"),
        keys=["indicator", "observation_year", "observation_month"],
        n_buckets=16,
    )
    table.overwrite(target)
    table.merge_into(source)
    out = table.read(spark).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "manifest_change_feed",
    # the oracle re-derives the expected feed from the same source
    # expressions: inserts are source keys beyond the target's range,
    # updates are matched keys whose post-merge values differ (note
    # value = 0 rows double to 0 -> byte-identical rewrite, correctly
    # absent from both engines' feeds); upsert merges produce no deletes
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5)
SELECT 'insert' AS _change_type, indicator, observation_year,
       observation_month, value, observation_count
FROM s WHERE observation_month > 8
UNION ALL
SELECT 'update' AS _change_type, s.indicator, s.observation_year,
       s.observation_month, s.value, s.observation_count
FROM s JOIN t ON s.indicator = t.indicator
            AND s.observation_year = t.observation_year
            AND s.observation_month = t.observation_month
WHERE s.value IS DISTINCT FROM t.value
   OR s.observation_count IS DISTINCT FROM t.observation_count
""",
    description="change feed over the file-level commit log (Delta CDC "
    "reduced to its core): the manifest DIFF between two versions names "
    "the changed buckets driver-side, only their two slices are read "
    "and keyed-diffed — O(delta) incremental consumption; inserts carry "
    "post-images, byte-identical rewrites inside touched buckets "
    "correctly drop out",
)
def manifest_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    # persist: the writes below each re-execute the silver transform
    # otherwise (and merges consume their source twice internally)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    table = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_change_feed_"),
        keys=["indicator", "observation_year", "observation_month"],
        n_buckets=16,
    )
    table.overwrite(target)
    table.merge_into(source)
    out = table.changes(spark, 0, 1).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "manifest_apply_changes",
    # the oracle computes the SOURCE table's final state independently
    # (merge result restricted by the v2 overwrite's predicate); the
    # Spark side never reads that state directly — the replica must
    # RECONSTRUCT it purely by replaying the two change feeds (an
    # upsert hop, then an overwrite hop with true deletes) into its own
    # differently-bucketed layout
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5),
merged AS (
  SELECT COALESCE(s.indicator, t.indicator) AS indicator,
         COALESCE(s.observation_year, t.observation_year) AS observation_year,
         COALESCE(s.observation_month, t.observation_month) AS observation_month,
         CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value,
         CASE WHEN s.indicator IS NOT NULL THEN s.observation_count
              ELSE t.observation_count END AS observation_count
  FROM t FULL OUTER JOIN s
    ON t.indicator = s.indicator
   AND t.observation_year = s.observation_year
   AND t.observation_month = s.observation_month)
SELECT * FROM merged WHERE observation_month BETWEEN 3 AND 10
""",
    description="CDC replication loop over the file-level commit log: a "
    "replica (different bucket count) bootstrapped from the source's v0 "
    "replays changes(0,1) — an upsert merge — then changes(1,2) — an "
    "overwrite with true deletes (overwrite is a versioned commit) — via "
    "apply_changes, each hop one atomic O(delta) commit; the result is "
    "the replica's own read, which must equal the source's final state "
    "the oracle derives independently",
)
def manifest_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import os
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    # persist: the writes below each re-execute the silver transform
    # otherwise (and merges consume their source twice internally)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    keys = ["indicator", "observation_year", "observation_month"]
    scratch = tempfile.mkdtemp(prefix="fred_cdc_")
    src_root = os.path.join(scratch, "source")
    rep_root = os.path.join(scratch, "replica")
    src = ManifestLakeTable(src_root, keys=keys, n_buckets=16)
    src.overwrite(target)                      # v0
    src.merge_into(source)                     # v1: upserts
    src.overwrite(                             # v2: drops rows -> deletes
        src.read(spark, 1).where(F.col("observation_month").between(3, 10))
    )
    rep = ManifestLakeTable(rep_root, keys=keys, n_buckets=8)
    rep.overwrite(src.read(spark, 0))
    rep.apply_changes(src.changes(spark, 0, 1))
    rep.apply_changes(src.changes(spark, 1, 2))
    out = rep.read(spark).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "manifest_incremental_agg",
    # the oracle recomputes the FINAL aggregate directly from the
    # source expressions (the v2 overwrite's state); the Spark side
    # never aggregates that state — it maintains the v0 aggregate
    # through two pre-image change-feed hops (Gupta-Mumick delta
    # rules), so equality proves the incremental fold, not the
    # aggregation
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5),
merged AS (
  SELECT COALESCE(s.indicator, t.indicator) AS indicator,
         COALESCE(s.observation_year, t.observation_year) AS observation_year,
         COALESCE(s.observation_month, t.observation_month) AS observation_month,
         CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value,
         CASE WHEN s.indicator IS NOT NULL THEN s.observation_count
              ELSE t.observation_count END AS observation_count
  FROM t FULL OUTER JOIN s
    ON t.indicator = s.indicator
   AND t.observation_year = s.observation_year
   AND t.observation_month = s.observation_month),
final AS (SELECT * FROM merged WHERE observation_month BETWEEN 3 AND 10)
SELECT indicator, observation_year AS yr,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(value), 2) AS sum_value
FROM final GROUP BY indicator, observation_year
""",
    description="incremental view maintenance over the change feed "
    "(Gupta-Mumick delta rules, SUM/COUNT case): a materialized "
    "per-(indicator, year) aggregate maintained through an upsert hop "
    "and an overwrite-with-deletes hop using ONLY the pre-image feeds "
    "(insert/update_postimage add, delete/update_preimage subtract, "
    "zero-count groups drop) — O(|delta| + touched groups) per ingest "
    "where the direct recompute the oracle performs is O(corpus)",
)
def manifest_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..operators.ivm import (
        apply_agg_delta,
        incremental_agg_delta,
        materialize_agg,
    )
    from ..sources.lakehouse import ManifestLakeTable

    # the v0 write and the v1 merge both execute the silver transform
    # (and the merge consumes its source twice internally) — persist
    # so the events scan + aggregate run once (guide §5)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    keys = ["indicator", "observation_year", "observation_month"]
    root = tempfile.mkdtemp(prefix="fred_ivm_source_")
    src = ManifestLakeTable(root, keys=keys, n_buckets=16)
    src.overwrite(target)                      # v0
    src.merge_into(source)                     # v1
    src.overwrite(                             # v2: deletes
        src.read(spark, 1).where(F.col("observation_month").between(3, 10))
    )
    group_cols, sum_cols = ["indicator", "observation_year"], ["value"]
    agg = materialize_agg(src.read(spark, 0), group_cols, sum_cols)
    for hop in ((0, 1), (1, 2)):
        feed = src.changes(spark, *hop, update_preimages=True)
        agg = apply_agg_delta(
            agg,
            incremental_agg_delta(feed, group_cols, sum_cols),
            group_cols,
            sum_cols,
        )
    out = agg.select(
        "indicator",
        F.col("observation_year").alias("yr"),
        "n_rows",
        F.round("sum_value", 2).alias("sum_value"),
    ).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "manifest_incremental_minmax",
    # the oracle recomputes the final extremes directly from the v2
    # state; the Spark side maintains the v0 extremes through the two
    # pre-image feed hops — inserts fold monotonically, deletes that
    # hit a group's recorded extreme trigger the affected-groups-only
    # recompute (the v2 overwrite deletes month<3 / month>10 rows,
    # which removes several groups' recorded min/max, so the
    # invalidation path is genuinely exercised, not just compiled)
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value,
             observation_count FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value, observation_count
      FROM silver WHERE observation_month >= 5),
merged AS (
  SELECT COALESCE(s.indicator, t.indicator) AS indicator,
         COALESCE(s.observation_year, t.observation_year) AS observation_year,
         COALESCE(s.observation_month, t.observation_month) AS observation_month,
         CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END AS value
  FROM t FULL OUTER JOIN s
    ON t.indicator = s.indicator
   AND t.observation_year = s.observation_year
   AND t.observation_month = s.observation_month),
final AS (SELECT * FROM merged WHERE observation_month BETWEEN 3 AND 10)
SELECT indicator, observation_year AS yr,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM final GROUP BY indicator, observation_year
""",
    description="MIN/MAX incremental view maintenance (the aggregate "
    "class Gupta-Mumick delta rules alone cannot maintain under "
    "deletes): inserts fold into the extremes monotonically; a delete "
    "that ties a group's recorded extreme invalidates it and ONLY those "
    "groups re-aggregate from the post-change base (broadcast semi-join "
    "on the affected keys) — the reference's silver layer maintains "
    "exactly such an extreme (max(ingested_at) per series, "
    "transform_fred_data.py:124-128), here taken to lake scale",
)
def manifest_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..operators.ivm import apply_minmax_delta, materialize_minmax
    from ..sources.lakehouse import ManifestLakeTable

    # persist: v0 write + v1 merge (twice internally) share one silver
    # execution — same rationale as manifest_incremental_agg
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    keys = ["indicator", "observation_year", "observation_month"]
    src = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_ivm_minmax_"), keys=keys, n_buckets=16
    )
    src.overwrite(target)                      # v0
    src.merge_into(source)                     # v1: upserts
    src.overwrite(                             # v2: true deletes
        src.read(spark, 1).where(F.col("observation_month").between(3, 10))
    )
    group_cols = ["indicator", "observation_year"]
    agg = materialize_minmax(src.read(spark, 0), group_cols, "value")
    for hop in ((0, 1), (1, 2)):
        feed = src.changes(spark, *hop, update_preimages=True)
        agg = apply_minmax_delta(
            agg, feed, src.read(spark, hop[1]), group_cols, "value"
        )
    out = agg.select(
        "indicator",
        F.col("observation_year").alias("yr"),
        "n_rows",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    ).localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "manifest_scd2_history",
    # the oracle re-derives the full effective-dated history from the
    # same source expressions, epoch by epoch: v0 = months <= 8
    # (original values), v1 = merge of months 5-10 with value doubled,
    # v2 = overwrite to months 3-12 at original values (true deletes of
    # months 1-2, updates back for 5-10). Months 3-4 survive all three
    # commits byte-identical, so their single epoch spans from 0 —
    # byte-identical rewrites must NOT fragment epochs
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
b AS (SELECT indicator, observation_year, observation_month AS m,
             value, observation_count FROM silver)
SELECT indicator, observation_year, m AS observation_month,
       value, observation_count,
       0 AS valid_from, 1 AS valid_to
FROM b WHERE m <= 2
UNION ALL
SELECT indicator, observation_year, m, value, observation_count,
       0, NULL FROM b WHERE m IN (3, 4)
UNION ALL
SELECT indicator, observation_year, m, value, observation_count,
       0, 0 FROM b WHERE m BETWEEN 5 AND 8
UNION ALL
SELECT indicator, observation_year, m, round(value * 2, 6),
       observation_count, 1, 1 FROM b WHERE m BETWEEN 5 AND 10
UNION ALL
SELECT indicator, observation_year, m, value, observation_count,
       2, NULL FROM b WHERE m BETWEEN 5 AND 12
""",
    description="SCD Type-2 history reconstructed from the commit log: "
    "each version hop's O(delta) change feed is an event stream, one "
    "per-key window bounds the epochs (valid_from/valid_to versions, "
    "null = current) — the warehouse history contract derived AFTER THE "
    "FACT from the same commits the serving upsert already writes, no "
    "second write path; byte-identical rewrites never fragment epochs",
)
def manifest_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..operators.scd import scd2_history
    from ..sources.lakehouse import ManifestLakeTable

    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    )
    m = F.col("observation_month")
    table = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_scd2_"),
        keys=["indicator", "observation_year", "observation_month"],
        n_buckets=16,
    )
    table.overwrite(silver.where(m <= 8))
    table.merge_into(
        silver.where(m.between(5, 10)).withColumn(
            "value", F.round(F.col("value") * 2, 6)
        )
    )
    table.overwrite(silver.where(m.between(3, 12)))
    return scd2_history(spark, table).localCheckpoint(eager=True)


@query(
    "manifest_incremental_topk",
    # the oracle ranks the FINAL v2 state directly; the Spark side
    # maintains the v0 top-20 through both feed hops — the v0->v1
    # upsert's update-preimages hit keys inside the top-20 (doubled
    # values re-rank the head), so the invalidation/recompute path is
    # genuinely exercised; the v1->v2 hop folds or invalidates as the
    # deletes fall
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
t AS (SELECT indicator, observation_year, observation_month, value
      FROM silver WHERE observation_month <= 8),
s AS (SELECT indicator, observation_year, observation_month,
             round(value * 2, 6) AS value
      FROM silver WHERE observation_month >= 5),
merged AS (
  SELECT COALESCE(s.indicator, t.indicator) AS indicator,
         COALESCE(s.observation_year, t.observation_year)
           AS observation_year,
         COALESCE(s.observation_month, t.observation_month)
           AS observation_month,
         CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END
           AS value
  FROM t FULL OUTER JOIN s
    ON t.indicator = s.indicator
   AND t.observation_year = s.observation_year
   AND t.observation_month = s.observation_month),
final AS (SELECT * FROM merged WHERE observation_month BETWEEN 3 AND 10)
SELECT indicator, observation_year, observation_month, value
FROM final
ORDER BY value DESC, indicator, observation_year, observation_month
LIMIT 20
""",
    description="top-k incremental view maintenance through the commit "
    "log: inserts merge with the k materialized rows and re-cut "
    "(O(k + delta), corpus untouched); a delete/update-preimage whose "
    "key sits INSIDE the current top-k invalidates it and only then "
    "does the view recompute from the post-change base (one "
    "TakeOrderedAndProject) — like MIN/MAX, ranking state is not "
    "feed-maintainable under deletes (Gupta-Mumick), and the k-row "
    "auxiliary state buys the O(k + delta) common case; the "
    "leaderboard/top-sellers view every serving layer materializes "
    "(operators/ivm.py:apply_topk_delta)",
)
def manifest_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..operators.ivm import apply_topk_delta, materialize_topk
    from ..sources.lakehouse import ManifestLakeTable

    # persist: the writes below each re-execute the silver transform
    # otherwise (and merges consume their source twice internally)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    keys = ["indicator", "observation_year", "observation_month"]
    src = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_ivm_topk_"), keys=keys, n_buckets=16
    )
    src.overwrite(target)                      # v0
    src.merge_into(source)                     # v1: upserts
    src.overwrite(                             # v2: true deletes
        src.read(spark, 1).where(F.col("observation_month").between(3, 10))
    )
    view = materialize_topk(src.read(spark, 0), keys, "value", 20)
    for hop in ((0, 1), (1, 2)):
        feed = src.changes(spark, *hop, update_preimages=True)
        view = apply_topk_delta(
            view, feed, src.read(spark, hop[1]), keys, "value", 20
        )
    out = view.localCheckpoint(eager=True)
    silver.unpersist()
    return out


@query(
    "fred_vintage_revisions",
    # the oracle derives both vintages from the silver expressions
    # directly; the Spark side reads them as manifest VERSIONS (time
    # travel) — the revision triangle FRED publishes as ALFRED: months
    # 5-8 exist in both vintages with the value doubled in v1, so the
    # revision is exactly (round(2v,6) - v), an exact double difference
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
v0 AS (SELECT indicator, observation_year, observation_month, value
       FROM silver WHERE observation_month <= 8),
v1m AS (SELECT indicator, observation_year, observation_month,
               round(value * 2, 6) AS value
        FROM silver WHERE observation_month >= 5),
v1 AS (
  SELECT COALESCE(s.indicator, t.indicator) AS indicator,
         COALESCE(s.observation_year, t.observation_year)
           AS observation_year,
         COALESCE(s.observation_month, t.observation_month)
           AS observation_month,
         CASE WHEN s.indicator IS NOT NULL THEN s.value ELSE t.value END
           AS value
  FROM v0 t FULL OUTER JOIN v1m s
    ON t.indicator = s.indicator
   AND t.observation_year = s.observation_year
   AND t.observation_month = s.observation_month
),
j AS (
  SELECT v0.indicator, v1.value - v0.value AS rev
  FROM v0 JOIN v1
    ON v0.indicator = v1.indicator
   AND v0.observation_year = v1.observation_year
   AND v0.observation_month = v1.observation_month
)
SELECT indicator,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(CASE WHEN rev <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_revised,
       round(avg(rev), 6) AS mean_revision,
       round(avg(abs(rev)), 6) AS mean_abs_revision,
       round(max(abs(rev)), 6) AS max_abs_revision
FROM j GROUP BY 1
""",
    description="data-vintage revision analysis (FRED publishes exactly "
    "this as ALFRED — how much did the first print move by the next "
    "release?): vintage v0 and vintage v1 are MANIFEST VERSIONS read by "
    "time travel from the same commit log the serving upsert writes, "
    "joined on the observation key; per indicator the revised-count, "
    "mean/mean-abs/max-abs revision — the trust metric every "
    "economic-series consumer reads before acting on a fresh print; "
    "one version join + one rollup, revisions are exact double "
    "differences of 6-dp values",
)
def fred_vintage_revisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    # persist: the writes below each re-execute the silver transform
    # otherwise (and merges consume their source twice internally)
    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    ).persist()
    target = silver.where(F.col("observation_month") <= 8)
    source = silver.where(F.col("observation_month") >= 5).withColumn(
        "value", F.round(F.col("value") * 2, 6)
    )
    keys = ["indicator", "observation_year", "observation_month"]
    src = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_vintage_"), keys=keys, n_buckets=16
    )
    src.overwrite(target)   # vintage 0: the first print
    src.merge_into(source)  # vintage 1: the revised release
    v0 = src.read(spark, 0).select(*keys, F.col("value").alias("__v0"))
    v1 = src.read(spark, 1).select(*keys, F.col("value").alias("__v1"))
    rev = (F.col("__v1") - F.col("__v0")).alias("__rev")
    j = v0.join(v1, keys).select("indicator", rev)
    out = (
        j.groupBy("indicator")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum((F.col("__rev") != 0).cast("long")).alias("n_revised"),
            F.round(F.avg("__rev"), 6).alias("mean_revision"),
            F.round(F.avg(F.abs("__rev")), 6).alias("mean_abs_revision"),
            F.round(F.max(F.abs("__rev")), 6).alias("max_abs_revision"),
        )
        .localCheckpoint(eager=True)
    )
    silver.unpersist()
    return out


@query(
    "scd2_point_in_time_features",
    # the oracle re-derives the effective-dated history as the same
    # literal epoch algebra manifest_scd2_history's oracle proved, then
    # replays the PIT visibility rule per version — fully independent
    # of the engine's commit log and window derivation
    oracle=f"""
WITH silver AS ({_SILVER_ORACLE_BODY}),
b AS (SELECT indicator, observation_year, observation_month AS m,
             value FROM silver),
hist AS (
  SELECT indicator, observation_year, m, value, 0 AS vf, 1 AS vt
  FROM b WHERE m <= 2
  UNION ALL
  SELECT indicator, observation_year, m, value, 0, NULL
  FROM b WHERE m IN (3, 4)
  UNION ALL
  SELECT indicator, observation_year, m, value, 0, 0
  FROM b WHERE m BETWEEN 5 AND 8
  UNION ALL
  SELECT indicator, observation_year, m, round(value * 2, 6), 1, 1
  FROM b WHERE m BETWEEN 5 AND 10
  UNION ALL
  SELECT indicator, observation_year, m, value, 2, NULL
  FROM b WHERE m BETWEEN 5 AND 12
),
v(av) AS (VALUES (0), (1), (2))
SELECT CAST(v.av AS INTEGER) AS asof_version, indicator,
       observation_year,
       CAST(count(*) AS BIGINT) AS n_months,
       round(sum(value), 6) AS sum_value
FROM hist JOIN v ON hist.vf <= v.av
                AND (hist.vt IS NULL OR v.av <= hist.vt)
GROUP BY 1, 2, 3
""",
    description="point-in-time (as-of-version) feature extraction "
    "against the SCD2 dimension — the feature-store correctness rule: "
    "training rows must see the attribute values that were CURRENT at "
    "their own time, never later backfills (label/feature leakage "
    "otherwise); the effective-dated history comes from the commit "
    "log (operators/scd.py:scd2_history over the same 3-commit "
    "merge/overwrite sequence as manifest_scd2_history), each probe "
    "version joins by epoch containment (valid_from <= v <= valid_to, "
    "null = current) against a 3-row broadcast version frame, and "
    "per-(version, indicator, year) visibility counts + value sums "
    "verify every epoch boundary: v0 sees originals, v1 sees the "
    "doubled 5-10 window, v2 sees the post-overwrite state with "
    "months 1-2 deleted",
)
def scd2_point_in_time_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from ..operators.scd import scd2_history
    from ..sources.lakehouse import ManifestLakeTable

    silver = _silver(spark, sf_dir).select(
        "indicator", "observation_year", "observation_month", "value",
        "observation_count",
    )
    m = F.col("observation_month")
    table = ManifestLakeTable(
        tempfile.mkdtemp(prefix="fred_pit_"),
        keys=["indicator", "observation_year", "observation_month"],
        n_buckets=16,
    )
    table.overwrite(silver.where(m <= 8))
    table.merge_into(
        silver.where(m.between(5, 10)).withColumn(
            "value", F.round(F.col("value") * 2, 6)
        )
    )
    table.overwrite(silver.where(m.between(3, 12)))
    hist = scd2_history(spark, table)
    vers = spark.range(3).select(
        F.col("id").cast("int").alias("asof_version")
    )
    visible = hist.crossJoin(F.broadcast(vers)).where(
        (F.col("valid_from") <= F.col("asof_version"))
        & (
            F.col("valid_to").isNull()
            | (F.col("asof_version") <= F.col("valid_to"))
        )
    )
    return (
        visible.groupBy("asof_version", "indicator", "observation_year")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .localCheckpoint(eager=True)
    )


@query(
    "manifest_erasure_audit",
    # the oracle recomputes the post-erasure state DIRECTLY from the
    # source table; the Spark side must reproduce it through the
    # lakehouse round trip (overwrite -> CDC delete feed ->
    # apply_changes -> time-travel reads), and the n_residual column
    # pins the erasure CONTRACT: the oracle hard-codes 0, so any
    # erased key surviving in the final state is a hash mismatch
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS INTEGER) AS n_before,
       CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
            AS INTEGER) AS n_erased,
       CAST(count(*) - sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
            AS INTEGER) AS n_after,
       CAST(0 AS INTEGER) AS n_residual
FROM customer GROUP BY 1
""",
    description="right-to-be-forgotten erasure through the lakehouse: "
    "deletion requests (every 97th customer) are consumed as a CDC "
    "delete feed by apply_changes — an O(touched-buckets) rewrite "
    "under one atomic manifest commit, never a full-table rewrite — "
    "then audited per segment: pre-erasure count (time travel to v0), "
    "erased count as witnessed by the COMMITTED change feed "
    "changes(v0, v1) (not by the request set — proving the deletes "
    "landed), post-erasure count, and the residual join of erased "
    "keys against the final state, which the oracle pins to ZERO so "
    "an incomplete erasure is a correctness failure, not a log line; "
    "the compliance-side complement to privacy_k_anonymity and "
    "curation_redact_pii",
)
def manifest_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint: see fred_merge_into_lake
    import os
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    scratch = tempfile.mkdtemp(prefix="fred_erasure_")
    tbl = ManifestLakeTable(
        os.path.join(scratch, "customer"), keys=["c_custkey"], n_buckets=16
    )
    tbl.overwrite(cust)  # v0
    requests = cust.where(F.col("c_custkey") % 97 == 0).withColumn(
        "_change_type", F.lit("delete")
    )
    tbl.apply_changes(requests)  # v1: O(touched buckets), atomic
    before = tbl.read(spark, 0)
    after = tbl.read(spark, 1)
    feed = tbl.changes(spark, 0, 1)
    erased = feed.where(F.col("_change_type") == "delete")
    residual = after.join(
        erased.select("c_custkey"), "c_custkey", "left_semi"
    )
    b = before.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("int").alias("n_before")
    )
    e = erased.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("int").alias("n_erased")
    )
    a = after.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("int").alias("n_after")
    )
    r = residual.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("int").alias("n_residual")
    )
    out = (
        b.join(e, "c_mktsegment", "left")
        .join(a, "c_mktsegment", "left")
        .join(r, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            "n_before",
            F.coalesce("n_erased", F.lit(0)).alias("n_erased"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            F.coalesce("n_residual", F.lit(0)).alias("n_residual"),
        )
    )
    return out.localCheckpoint(eager=True)
