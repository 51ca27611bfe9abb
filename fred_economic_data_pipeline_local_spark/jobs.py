"""Declarative job runner: the YAML series catalog -> medallion pipeline.

Replaces the reference's Airflow DAG factory (dags/fred_historical_backfill.py:
27-178): one config entry per indicator drives extract -> transform ->
aggregate -> serve, idempotently (all sinks are dynamic-partition
overwrites or keyed merges, so re-running a window is safe — the
reference's catchup/backfill semantics without a scheduler).

Config format mirrors config/fred_indicators.yaml: a list of entries with
series_id, name, start_date, end_date, table_name, sheet_name.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .functions.scalars import now_iso_utc
from .operators.fred import format_observations, gold_aggregate, silver_transform
from .sources.extract import Fetcher, fetch_observations, month_ranges
from .sources.lake import (
    read_bronze,
    read_silver,
    write_bronze,
    write_gold,
    write_silver,
)


@dataclass(frozen=True)
class SeriesConfig:
    series_id: str
    name: str = ""
    start_date: str = ""
    end_date: str = ""
    table_name: str = "economic_indicators"
    sheet_name: str = "FRED_data"


def load_catalog(path: str) -> list[SeriesConfig]:
    """Parse the YAML series catalog (config/fred_indicators.yaml shape)."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh)
    entries = raw.get("indicators", raw) if isinstance(raw, dict) else raw
    out = []
    for e in entries:
        out.append(
            SeriesConfig(
                series_id=e["series_id"],
                name=e.get("name", ""),
                start_date=str(e.get("start_date", "")),
                end_date=str(e.get("end_date", "")),
                table_name=e.get("table_name", "economic_indicators"),
                sheet_name=e.get("sheet_name", "FRED_data"),
            )
        )
    return out


def run_series(
    spark: SparkSession,
    cfg: SeriesConfig,
    lake_root: str,
    fetcher: Fetcher,
) -> dict[str, int]:
    """One series end-to-end: extract -> bronze -> silver -> gold.

    Returns per-layer row counts. Serving loads (RDS upsert / sheet
    append) are separate calls on the gold output (sources/serving.py) so
    environments without those stores can still run the lake pipeline.
    """
    stamp = now_iso_utc()

    ranges = month_ranges(spark, cfg.start_date, cfg.end_date)
    raw = fetch_observations(ranges, cfg.series_id, fetcher)
    bronze = format_observations(raw, cfg.series_id, ingested_at_iso=stamp)
    write_bronze(bronze, lake_root)

    # parameterized predicate, not interpolated SQL: series_id is config
    # input and must never reach the parser as text
    bronze_back = read_bronze(spark, lake_root).where(
        F.col("indicator") == F.lit(cfg.series_id)
    )
    silver = silver_transform(bronze_back, processed_at_iso=stamp)
    write_silver(silver, lake_root)

    silver_back = read_silver(spark, lake_root).where(
        F.col("indicator") == F.lit(cfg.series_id)
    )
    gold = gold_aggregate(silver_back, aggregated_at_iso=stamp)
    write_gold(gold, lake_root)

    return {
        "bronze": bronze_back.count(),
        "silver": silver_back.count(),
        "gold": gold.count(),
    }


def run_catalog(
    spark: SparkSession, catalog_path: str, lake_root: str, fetcher: Fetcher
) -> dict[str, dict[str, int]]:
    """Run every series in the catalog (the reference's 11 DAGs, as a loop
    of idempotent Spark jobs)."""
    return {
        cfg.series_id: run_series(spark, cfg, lake_root, fetcher)
        for cfg in load_catalog(catalog_path)
    }
