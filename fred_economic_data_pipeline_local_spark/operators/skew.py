"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles most runtime skew on real clusters
(session.py enables it), but pathological hot keys — the power-law user,
the empty-string document, the null-bucket — still need explicit salting
when a single key exceeds what one task can hold. These helpers implement
the standard recipe: spread the hot side over N salt replicas, replicate
the other side across all N, join on (key, salt); results are identical to
the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over salt buckets.

    big rows get a random-but-deterministic salt (hash of the full row's
    monotonic id would be non-deterministic across retries; a hash of all
    join-key-independent ordering isn't available generically, so we use
    pmod(xxhash64(all columns), N) — deterministic per row content);
    small rows are replicated N times. The join key becomes
    (on..., salt), so one hot key's rows land in N tasks instead of 1.

    Replication multiplies the small side by ``salt_buckets`` — use only
    when `small` is modest (but too big / too skew-prone to broadcast).

    ``how`` is restricted to joins where replicated small-side rows can
    never surface unmatched: for right/full(/right_semi) joins each
    unmatched small row would appear once per salt replica, silently
    diverging from the unsalted join.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r} "
            "(replicated small-side rows would duplicate unmatched output)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt.cast("long"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return big_s.join(small_s, on=on + ["__salt"], how=how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt stage for hot keys.

    Phase 1 aggregates on (keys, salt) — hot keys split N ways; phase 2
    re-aggregates the partials on keys alone. Supports the decomposable
    aggregates (sum/count/min/max); ``avg`` decomposes as sum+count at the
    call site. Spark's own partial aggregation usually makes this
    unnecessary; it matters when the partial-agg hash table itself can't
    hold a hot key's group (extreme cardinality-within-key).
    """
    supported = {"sum", "count", "min", "max"}
    for col, fn in aggs.items():
        if fn not in supported:
            raise ValueError(f"{fn!r} not decomposable; use sum+count for avg")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()])
    )
    refold = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, refold[fn])(f"__p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
