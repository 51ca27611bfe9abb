"""Serving-edge operators: keyed upsert and dedup-append.

The reference's two serving sinks are really two relational operators plus
connector I/O (SURVEY.md §2.2 K3/K4, §2.5 J1/J2):

- RDS upsert  = keyed merge: matched -> update all non-key columns,
  unmatched -> insert (load_fred_data.py:54-59).
- Sheets sync = left-anti join on the serving key with type-lenient key
  equality, then append only the delta (load_fred_data_to_google.py:94-125).

Both are expressed here as pure DataFrame ops so they run distributed; the
O(delta) collect for the actual Sheets append and the JDBC staging write
live in ``sources/``. At 100 TB the anti-join broadcasts the serving-state
key set when small, else hash-shuffles on the key — never a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import lenient_key
from .fred import FRED_KEY


def dedup_append_delta(
    incoming: DataFrame,
    existing: DataFrame,
    keys: list[str] | None = None,
    lenient: bool = True,
) -> DataFrame:
    """Rows of ``incoming`` whose key tuple is absent from ``existing``.

    The reference builds a python set of existing key tuples and loops
    (load_fred_data_to_google.py:108-119) — O(table) on the driver. Here:
    a left-anti hash join; Spark broadcasts the existing key set when it is
    under the broadcast threshold, which is the common case (serving state
    keys are tiny next to the incoming fact data).

    ``lenient=True`` applies the reference's type-lenient key equality
    (:94-101): both sides' keys normalized to one canonical string form
    before comparison, so "2024" == 2024 == 2024.0.
    """
    keys = keys or FRED_KEY
    if lenient:
        norm = [lenient_key(F.col(k)).alias(f"__k_{k}") for k in keys]
        left = incoming.select("*", *norm)
        right = existing.select(
            *[lenient_key(F.col(k)).alias(f"__k_{k}") for k in keys]
        ).distinct()
        joined = left.join(right, on=[f"__k_{k}" for k in keys], how="left_anti")
        return joined.drop(*[f"__k_{k}" for k in keys])
    return incoming.join(existing.select(*keys).distinct(), on=keys, how="left_anti")


def upsert_merge(
    target: DataFrame,
    source: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Pure-DataFrame expression of the reference's ON CONFLICT DO UPDATE.

    INSERT ... ON CONFLICT (keys) DO UPDATE SET <all non-key> = EXCLUDED.*
    (load_fred_data.py:54-59): source rows win on key collision, target
    rows survive otherwise, new source keys are inserted. Expressed as a
    full-outer join + per-column coalesce(source, target) — the Delta/JDBC
    backends in ``sources/`` execute the same semantics server-side; this
    operator is the engine-level (and oracle-checkable) form.

    If ``source`` carries duplicate keys, last-write-wins is undefined in
    Postgres multi-VALUES upserts too; we pre-dedup source on the key via
    max-struct to stay deterministic.
    """
    keys = keys or FRED_KEY
    non_key = [c for c in target.columns if c not in keys]
    if set(target.columns) != set(source.columns):
        raise ValueError("upsert requires identical target/source columns")

    # deterministic source dedup: keep the lexicographically-max non-key
    # struct per key (stable regardless of partitioning); columns are
    # prefix-renamed so target/source stay unambiguous even when both
    # derive from the same lineage (self-merge)
    src = (
        source.groupBy(*keys)
        .agg(F.max(F.struct(*non_key)).alias("__s"))
        .select(
            *[F.col(k).alias(f"__src_{k}") for k in keys],
            *[F.col(f"__s.{c}").alias(f"__src_{c}") for c in non_key],
        )
        .withColumn("__src", F.lit(True))  # presence marker, robust to null keys
    )

    cond = [
        F.col(k).eqNullSafe(F.col(f"__src_{k}")) for k in keys
    ]
    merged = target.join(src, on=cond, how="full_outer")
    return merged.select(
        *[F.coalesce(F.col(f"__src_{k}"), F.col(k)).alias(k) for k in keys],
        *[
            # matched or new key -> source value; unmatched target -> target
            F.when(F.col("__src"), F.col(f"__src_{c}")).otherwise(F.col(c)).alias(c)
            for c in non_key
        ],
    )
