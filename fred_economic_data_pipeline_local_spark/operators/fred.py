"""FRED medallion operators — the reference's actual computations, Spark-first.

Pipeline parity map (SURVEY.md §3):
    format_observations   bronze build   extract_fred_data.py:148-193
    silver_transform      silver build   transform_fred_data.py:104-145
    gold_aggregate        gold build     aggregate_fred_data.py:88-133

Each function is a pure DataFrame->DataFrame transformation; sinks live in
``sinks.py`` and connectors in ``sources/``. At 100 TB these are all
single-shuffle plans: filter+project are pushed to the scan, the group-agg
is partial+final hash aggregation on (indicator, year, month) — a key space
small enough to never skew (12 months x #indicators x #years).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import iso_utc_micros, now_iso_utc, parse_fred_value

# Serving-layer primary key (load_fred_data.py:121,
# load_fred_data_to_google.py:185).
FRED_KEY = ["indicator", "observation_year", "observation_month"]


def format_observations(
    raw: DataFrame,
    series_id: str,
    ingested_at_iso: str | None = None,
) -> DataFrame:
    """Raw FRED payload rows -> bronze observation rows.

    Mirrors format_fred_data (extract_fred_data.py:148-193): constant
    ``indicator`` column, date parts from ``date``, value kept as string
    (including the "." sentinel — coercion is silver's job), and a
    batch-constant ``ingested_at`` stamp.

    ``raw`` needs columns ``date`` (YYYY-MM-DD string) and ``value``
    (string), i.e. FRED_OBSERVATION_SCHEMA.
    """
    stamp = ingested_at_iso or now_iso_utc()
    d = F.to_date("date")
    return raw.select(
        F.lit(series_id).alias("indicator"),
        F.date_format(d, "yyyy-MM-dd").alias("observation_date"),
        F.month(d).alias("observation_month"),
        F.year(d).alias("observation_year"),
        F.col("value").cast("string").alias("value"),
        F.to_timestamp(F.lit(stamp)).alias("ingested_at"),
    )


def clean_values(bronze: DataFrame, value_col: str = "value") -> DataFrame:
    """Bronze value hygiene: drop nulls and the FRED "." sentinel, coerce.

    transform_fred_data.py:117-121. The literal "nan" string survives the
    drop (the reference's dropna doesn't catch it) but coerces to null, and
    both pandas mean(skipna) and Spark avg ignore nulls — so we coerce it
    to null *without* filtering it, keeping observation_count parity:
    count(value) counts non-null post-coercion values only.
    """
    return (
        bronze.where(F.col(value_col).isNotNull() & (F.col(value_col) != "."))
        .withColumn(value_col, parse_fred_value(F.col(value_col)))
    )


def silver_transform(bronze: DataFrame, processed_at_iso: str | None = None) -> DataFrame:
    """Bronze -> silver: the reference's core query (SURVEY.md §3.2).

    GROUP BY (indicator, year, month) -> AVG(value), COUNT(value),
    MAX(ingested_at) (transform_fred_data.py:124-128), plus the
    batch-constant ``processed_at`` audit stamp (:135) and the fixed silver
    projection (:137-141). ``ingested_at`` lands as the ISO string the
    reference produces after its epoch-ms round-trip repair (:131).

    Plan shape: scan(+pushed filter) -> partial hash agg -> exchange on the
    3-column group key -> final hash agg. One shuffle; no skew risk.
    """
    stamp = processed_at_iso or now_iso_utc()
    cleaned = clean_values(bronze)
    return (
        cleaned.groupBy("indicator", "observation_year", "observation_month")
        .agg(
            F.avg("value").alias("value"),
            F.count("value").alias("observation_count"),
            F.max("ingested_at").alias("ingested_at"),
        )
        # NB: a month whose rows were ALL "."/null never forms a group (row
        # absent, matching the reference's empty-input short-circuit at
        # transform_fred_data.py:112-114); a month of only "nan" artifacts
        # keeps its group with value=null, observation_count=0 — exactly the
        # pandas mean(skipna)/count outcome.
        .select(
            "indicator",
            "observation_year",
            "observation_month",
            "value",
            "observation_count",
            iso_utc_micros(F.col("ingested_at")).alias("ingested_at"),
            F.lit(stamp).alias("processed_at"),
        )
    )


def gold_aggregate(silver: DataFrame, aggregated_at_iso: str | None = None) -> DataFrame:
    """Silver -> gold: yearly consolidation (SURVEY.md §3.3).

    The reference loops 12 monthly files and pd.concat's them
    (aggregate_fred_data.py:106-113); in Spark the union is simply reading
    the year's partitions in one scan — this function takes that unioned
    silver frame and applies the gold derivations: half-even rounding of
    ``value`` to 2 decimals (:122 — numpy round is banker's, so ``bround``
    not ``round``) and the ``aggregated_at`` stamp (:121).

    Narrow-only plan: no shuffle at all.
    """
    stamp = aggregated_at_iso or now_iso_utc()
    return silver.select(
        "indicator",
        "observation_year",
        "observation_month",
        F.bround("value", 2).alias("value"),
        "observation_count",
        "ingested_at",
        "processed_at",
        F.lit(stamp).alias("aggregated_at"),
    )


def events_as_bronze(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` fixture into bronze-observation shape.

    Lets every FRED-parity operator run (and be oracle-checked) on driver
    data: event_type plays ``indicator``, ``ts`` the observation date,
    ``value`` round-trips through string so the "."/"nan" coercion path is
    exercised end-to-end. The fixture spans a single calendar month, so
    day-of-month plays the ``observation_month`` bucket key — same operator
    shapes (30 buckets/indicator) over the data that exists.
    """
    return events.select(
        F.col("event_type").alias("indicator"),
        F.date_format("ts", "yyyy-MM-dd").alias("observation_date"),
        F.dayofmonth("ts").alias("observation_month"),
        F.year("ts").alias("observation_year"),
        F.col("value").cast("string").alias("value"),
        F.col("ts").alias("ingested_at"),
    )
