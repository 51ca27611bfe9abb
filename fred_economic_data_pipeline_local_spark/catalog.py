"""Fixture-table catalog: schema-pinned parquet loads for the driver tables.

Mirrors the declarative source catalog idea of config/fred_indicators.yaml
(reference dags/fred_historical_backfill.py:27-35): names -> typed sources.
Explicit schemas keep the scan free of footer-inference and guarantee the
column types the operators were written against.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import FIXTURE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = tuple(FIXTURE_SCHEMAS)

# Runtime confs applied to whatever session executes our queries (the
# correctness driver builds its own SparkSession, so the builder-time confs
# in session.py may not be present):
# - UTC session timezone: all date/timestamp formatting must agree with the
#   (timezone-naive) DuckDB oracle;
# - nanosAsLong: events.ts is parquet TIMESTAMP(NANOS) — unreadable
#   otherwise (set at builder in session.py; static conf, best-effort here);
# - AQE off: measured pathology on local mode — per-stage re-planning of
#   large expression trees (lenient-key casts, minhash lambdas) costs
#   seconds per stage, turning sub-second queries into minutes. On a real
#   multi-executor cluster AQE pays for itself (skew splitting, runtime
#   broadcast); on a single-JVM local master the static planner already
#   picks the same joins. See session.py for the cluster profile.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ICU lower/upper pays a minutes-long static init the first time a
    # non-ASCII string is case-mapped (see session.py); JVM mapping is
    # fast and agrees with DuckDB on the Latin-script fixtures
    "spark.sql.icu.caseMappings.enabled": "false",
    # lake writers also set this per-write (sources/lake.py), but pin it
    # here too so ad-hoc overwrites on a foreign session can't static-
    # truncate sibling partitions
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def tune_session(spark: SparkSession) -> None:
    for k, v in _RUNTIME_CONF.items():
        if k == "spark.sql.adaptive.enabled":
            # cluster-profile escape hatch: local mode pins AQE off (see
            # note above), but tests proving config-independence (and a
            # real cluster deployment) override via the environment so
            # the pin doesn't silently undo their setting mid-query-build
            v = os.environ.get("SPARK_GRAFT_AQE", v)
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static/locked conf on this session — keep going


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one fixture table with its pinned schema.

    Schema is passed explicitly so the vectorized parquet reader prunes
    columns against a known struct and never pays inference; predicate
    pushdown + column pruning then happen in Catalyst.
    """
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(FIXTURE_SCHEMAS)}")
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        # ts is parquet TIMESTAMP(NANOS,false): Spark has no nanosecond
        # timestamp, so scan the physical int64 (nanosAsLong) and truncate
        # to microseconds with integer division (ns magnitudes exceed
        # double's 2^53 — float division would corrupt), matching DuckDB's
        # ns->us truncation. Fixture generations with plain
        # TIMESTAMP(MICROS) take the ordinary schema-pinned read below —
        # the unit is sniffed once per path from the parquet footer.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StructField, StructType

        raw_schema = StructType(
            [
                StructField("event_id", LongType(), True),
                StructField("ts", LongType(), True),
            ]
            + [f for f in FIXTURE_SCHEMAS["events"].fields if f.name not in ("event_id", "ts")]
        )
        raw = spark.read.schema(raw_schema).parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select(*[f.name for f in FIXTURE_SCHEMAS["events"].fields])
    return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(path)


# keyed on (path, mtime_ns, size): a regenerated fixture at the SAME path
# (the driver rewrites testdata between rounds, possibly switching the
# parquet timestamp unit) invalidates the cached verdict automatically
_TS_UNIT_CACHE: dict[tuple[str, int, int], bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """True if events.ts is parquet TIMESTAMP(NANOS) at this path.

    One driver-side footer read per file version (cached on
    (path, mtime, size)) — the same metadata the scan planner reads
    anyway, so this adds no data I/O. A missing path is not an error
    (probe before fixture generation -> plain read); a path that EXISTS
    but whose footer can't be inspected (pyarrow absent, corrupt footer)
    raises instead of silently guessing: guessing "not nanos" on a real
    NANOS file would mis-read every timestamp by 10^3, which must be a
    loud failure, never a wrong answer.
    """
    try:
        st = os.stat(path)
    except OSError:
        # not there yet — nothing to sniff; not cached, so a later file
        # at the same path is probed fresh
        return False
    key = (path, st.st_mtime_ns, st.st_size)
    cached = _TS_UNIT_CACHE.get(key)
    if cached is None:
        # Spark may write a parquet *directory*; the footer lives in the
        # part files
        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if not parts:
                raise RuntimeError(
                    f"parquet dir {path!r} has no part files to sniff the "
                    "events.ts timestamp unit from"
                )
            probe = os.path.join(path, parts[0])
        try:
            import pyarrow.parquet as pq

            cached = str(pq.read_schema(probe).field("ts").type) == "timestamp[ns]"
        except Exception as exc:
            raise RuntimeError(
                f"cannot determine the parquet timestamp unit of existing "
                f"file {probe!r} (events.ts may be TIMESTAMP(NANOS), which "
                f"Spark would silently mis-scan): {exc}"
            ) from exc
        _TS_UNIT_CACHE[key] = cached
    return cached


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
