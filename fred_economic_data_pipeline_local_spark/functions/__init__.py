from .scalars import (
    iso_utc_micros,
    lenient_key,
    now_iso_utc,
    parse_fred_value,
)

__all__ = [
    "iso_utc_micros",
    "lenient_key",
    "now_iso_utc",
    "parse_fred_value",
]
