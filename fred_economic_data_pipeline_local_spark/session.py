"""SparkSession builder.

One place owns every performance-relevant config so a 1000-executor
deployment only overrides ``master`` and the sizing knobs; the *plan shapes*
(AQE, broadcast thresholds, partition overwrite mode, Arrow) are identical
between ``local[32]`` tests and a real cluster.

Scale posture (100 TB target):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting mean we
  do not hand-tune ``spark.sql.shuffle.partitions`` per query.
- Dynamic partition overwrite: idempotent month/year re-runs (the reference's
  ``replace=True`` overwrite semantics, extract_fred_data.py:225) without
  clobbering sibling partitions.
- Arrow enabled: any unavoidable pandas_udf exchanges columnar batches.
- Session timezone pinned to UTC: the reference stamps/parses all times in
  UTC (extract_fred_data.py:168); also keeps parquet timestamps bit-stable
  against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "fred-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for tests; pass a cluster master in production. All other settings are
    scale-invariant plan-shape settings.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- planner behavior ------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # --- I/O -------------------------------------------------------------
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- python exchange -------------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # events.ts is parquet TIMESTAMP(NANOS): unreadable as a Spark
        # timestamp; read the raw int64 and convert (catalog.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- semantics -------------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # JVM case mapping instead of ICU for UTF8_BINARY lower/upper:
        # ICU's CollationAwareUTF8String static init burns minutes of CPU
        # the first time a non-ASCII string hits lower() (observed via
        # jstack on the documents fixture); JVM mapping matches DuckDB on
        # the Latin-script fixture text
        .config("spark.sql.icu.caseMappings.enabled", "false")
        # reference relies on lenient casts (pd.to_numeric errors='coerce',
        # extract_fred_data.py:175): null-on-garbage, not error-on-garbage
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # 8g measured fastest for local[32] (larger heaps slow the
        # allocation-heavy explode/agg stages: first-run ngram pairs was
        # 12s at 8g, 27s at 16g, 35s at 24g — bigger young gen, worse
        # locality). On a cluster this is per-executor memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ContextCleaner only *forces* a GC every 30 min by default; shuffle
        # and broadcast state is reference-tracked, so a long query-server
        # session can hold gigabytes of dead state between natural GCs.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # wide codegen (64-agg minhash/simhash stages) fills the default
        # 240 MB JIT code cache after a dozen queries; once full, new
        # generated classes run interpreted (measured 33s -> 111s on the
        # same query late in a session). Size it for query-server use.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
