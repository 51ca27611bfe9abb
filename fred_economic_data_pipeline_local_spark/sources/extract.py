"""FRED source connector: month-range planning + distributed fetch.

Reference behavior reproduced (SURVEY.md §2.1 S1, §3.1):
- calendar-month range enumeration (DateRangeGenerator,
  extract_fred_data.py:22-51) — here a Catalyst ``sequence``/``explode``
  so the task list itself is a DataFrame;
- per-range GET of series/observations with payload validation
  (extract_fred_data.py:80-146), retry/backoff on {429,5xx} honoring
  Retry-After (:74-77,:105-110) and fixed pacing between calls (:284);
- observation normalization to bronze rows (format_observations in
  operators/fred.py).

Scale shape: the fetch fans out as ``mapInPandas`` over the month-range
task DataFrame — each partition holds a slice of (series, month) tasks and
performs its own paced HTTP calls, so 11 series x 60 years of backfill
parallelizes across executors instead of the reference's single-threaded
5 s-per-request loop. The HTTP edge is injectable: tests pass a
fixture-replay fetcher and never touch the network.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

FRED_BASE_URL = "https://api.stlouisfed.org/fred/series/observations"

# a fetcher maps (series_id, start_date, end_date) -> list of
# {"date": "YYYY-MM-DD", "value": "<string>"} observation dicts
Fetcher = Callable[[str, str, str], list[dict]]

OBSERVATION_SCHEMA = StructType(
    [
        StructField("series_id", StringType(), False),
        StructField("date", StringType(), True),
        StructField("value", StringType(), True),
    ]
)


def month_ranges(spark: SparkSession, start_date: str, end_date: str) -> DataFrame:
    """Calendar-month (range_start, range_end) pairs covering [start, end].

    The reference's DateRangeGenerator (extract_fred_data.py:22-51) as one
    Catalyst expression: month sequence -> explode -> clamp the edges to
    the requested bounds. Returns a DataFrame so the plan IS the task list.
    """
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.trunc(F.lit(start_date).cast("date"), "month"),
                    F.trunc(F.lit(end_date).cast("date"), "month"),
                    F.expr("interval 1 month"),
                )
            ).alias("month_start")
        )
        .select(
            F.date_format(
                F.greatest(F.col("month_start"), F.lit(start_date).cast("date")),
                "yyyy-MM-dd",
            ).alias("range_start"),
            F.date_format(
                F.least(F.last_day("month_start"), F.lit(end_date).cast("date")),
                "yyyy-MM-dd",
            ).alias("range_end"),
        )
    )


def fred_http_fetcher(
    api_key: str,
    pace_seconds: float = 5.0,
    max_retries: int = 3,
    backoff_factor: float = 1.0,
    timeout: float = 30.0,
) -> Fetcher:
    """The real FRED REST fetcher (driver/executor side, stdlib only).

    Reference parity: 3 retries with backoff on {429,500,502,503,504}
    (extract_fred_data.py:74-77), Retry-After honored with a 10 s default
    (:105-110), fixed pacing between calls (:284), payload validation of
    observations[].date/value (:116-129).
    """
    retry_statuses = {429, 500, 502, 503, 504}

    def fetch(series_id: str, start: str, end: str) -> list[dict]:
        params = urllib.parse.urlencode(
            {
                "series_id": series_id,
                "observation_start": start,
                "observation_end": end,
                "api_key": api_key,
                "file_type": "json",
            }
        )
        url = f"{FRED_BASE_URL}?{params}"
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=timeout) as resp:
                    payload = json.load(resp)
                break
            except urllib.error.HTTPError as err:
                last_err = err
                if err.code not in retry_statuses or attempt == max_retries:
                    raise
                retry_after = err.headers.get("Retry-After")
                wait = float(retry_after) if retry_after else 10.0
                time.sleep(max(wait, backoff_factor * (2**attempt)))
        else:  # pragma: no cover
            raise last_err  # type: ignore[misc]
        obs = payload.get("observations")
        if not isinstance(obs, list) or not obs:
            raise ValueError(f"FRED returned no observations for {series_id} {start}..{end}")
        for o in obs:
            if "date" not in o or "value" not in o:
                raise ValueError(f"malformed observation in {series_id}: {o!r}")
        time.sleep(pace_seconds)
        return [{"date": o["date"], "value": str(o["value"])} for o in obs]

    return fetch


def fetch_observations(
    ranges: DataFrame, series_id: str, fetcher: Fetcher
) -> DataFrame:
    """Distributed fetch: month-range tasks -> raw observation rows.

    ``mapInPandas`` over the task DataFrame: each partition executes its
    ranges sequentially (per-partition pacing preserves the reference's
    rate-limit behavior per worker) while partitions run in parallel.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for start, end in zip(pdf["range_start"], pdf["range_end"]):
                for o in fetcher(series_id, str(start), str(end)):
                    rows.append(
                        {"series_id": series_id, "date": o["date"], "value": o["value"]}
                    )
            yield pd.DataFrame(
                rows, columns=["series_id", "date", "value"]
            )

    return ranges.mapInPandas(run, OBSERVATION_SCHEMA)


def replay_fetcher(observations: dict[tuple[str, str], list[dict]]) -> Fetcher:
    """Deterministic fixture-replay fetcher for tests: keyed by
    (start, end) range; raises KeyError on an unplanned request."""

    def fetch(series_id: str, start: str, end: str) -> list[dict]:
        return observations[(start, end)]

    return fetch
