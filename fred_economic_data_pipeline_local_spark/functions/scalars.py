"""Scalar expression helpers — Catalyst built-ins only (zero Python UDFs).

Each helper returns a Column so it composes inside whole-stage codegen.
Semantics pinned to the reference where cited.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference audit-timestamp format: pd.Timestamp.isoformat() with microseconds
# and a +00:00 offset (extract_fred_data.py:168, transform_fred_data.py:131).
ISO_MICROS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"


def iso_utc_micros(col: Column) -> Column:
    """Format a timestamp column as ISO-8601 with microseconds and +00:00."""
    return F.date_format(col, ISO_MICROS_FMT)


def now_iso_utc() -> str:
    """Driver-computed batch-constant audit stamp.

    The reference stamps once per batch as a scalar broadcast
    (transform_fred_data.py:135) — so we compute once on the driver and
    inject as a literal, never per-row (SURVEY.md §2.3 P4).
    """
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


def parse_fred_value(col: Column) -> Column:
    """FRED value coercion: string -> double, null on garbage.

    Matches pd.to_numeric(errors='coerce') (transform_fred_data.py:121):
    the "." missing sentinel and the bronze "nan" artifact both become null
    (Spark's non-ANSI cast maps "nan" to NaN; normalize NaN -> null so
    avg/count semantics match pandas skipna).
    """
    d = col.cast("double")
    return F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)


def lenient_key(col: Column) -> Column:
    """Type-lenient join-key normalization for serving-state dedup.

    The reference tries numeric coercion and falls back to
    lowercase/trimmed string (load_fred_data_to_google.py:94-101) because
    Sheets state comes back all-string. Canonical form: numeric values
    render without trailing ".0" (so int 2024, "2024", 2024.0 all agree);
    non-numerics are lower(trim(s)).
    """
    s = F.trim(col.cast("string"))
    d = s.cast("double")
    as_num = F.when(
        d == d.cast("long").cast("double"),
        d.cast("long").cast("string"),
    ).otherwise(d.cast("string"))
    return F.when(d.isNotNull() & ~F.isnan(d), as_num).otherwise(F.lower(s))
