"""Hash-bucketed table layout: the co-located join/agg path.

At 100 TB the dominant cost of fact-fact joins and keyed aggregations is
the shuffle. Persisting a table bucketed (and optionally sorted) on its
join/agg key makes the parquet scan itself hash-partitioned
(FileSourceScanExec reports outputPartitioning = HashPartitioning over
the bucket columns), so joins between same-bucketed tables and groupBys
on the bucket key plan with ZERO Exchange operators — the shuffle is
paid once at write time and amortized over every subsequent query.

The reference's medallion layers correlate rows only by partition path
(SURVEY.md §1.1); bucketing is the engine-level generalization for keys
too high-cardinality to be Hive partitions (orderkey, custkey, doc_id).
Rule of thumb: partitionBy low-cardinality routing keys (indicator,
year, month — scripts/transform/transform_fred_data.py:202's layout),
bucketBy high-cardinality join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table hash-bucketed on ``bucket_cols``.

    ``sort_cols`` additionally sorts within each bucket file, upgrading
    bucketed joins from shuffle-free hash joins to shuffle-AND-sort-free
    sort-merge joins. ``n_buckets`` must match across tables that will be
    co-joined (Spark only elides the exchange when both sides' bucket
    counts align, or differ by an integer factor with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table; the scan carries the bucket partitioning."""
    return spark.table(table)
