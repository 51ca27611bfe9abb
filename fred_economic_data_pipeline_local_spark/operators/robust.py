"""Robust statistics operators: winsorization and MAD outlier flags.

The reference's gold layer publishes plain means (``transform_fred_data
.py:124-128``); production economic series need the robust variants —
winsorized means (clip at per-group quantiles before averaging) and
median-absolute-deviation outlier screens — because a single bad API
row (the reference's ``"."`` sentinel family) otherwise moves the
published aggregate. Both operators are compositions of built-in
aggregates: no UDFs, no driver loops.

Scale notes. Exact per-group percentiles (``F.percentile`` /
``F.median``) buffer each group's values in the aggregation state, so
the exact forms here are for bounded-size groups (the reference's
per-indicator monthly series; the fixtures' per-priority / per-type
groups). At 100 TB with huge groups, pass ``approx_rel_err`` to switch
the same plan to ``percentile_approx`` (GK sketch, constant state,
identical shape) — the exact form is kept as the default because it is
what the DuckDB oracle can re-derive bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def winsorize(
    df: DataFrame,
    key: str,
    value: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    approx_rel_err: float | None = None,
) -> DataFrame:
    """Per-``key`` winsorized summary of ``value``: clip at the group's
    [lo_q, hi_q] quantiles, then aggregate.

    Plan shape: ONE exchange on ``key`` computes the per-group quantile
    bounds (map-side partial aggregation carries the percentile buffer);
    the bounds frame is O(groups) rows and broadcast back onto the fact
    side, so the clip + re-aggregate costs one more map-combined
    exchange of (key, clipped) partials — the fact table never shuffles
    twice and never sorts. Returns one row per key:
    (key, lo, hi, n, n_clip_lo, n_clip_hi, avg_winsorized).
    """
    if approx_rel_err is not None:
        acc = max(1, int(1.0 / approx_rel_err))
        qagg = F.percentile_approx(value, [lo_q, hi_q], acc)
    else:
        qagg = F.percentile(value, [lo_q, hi_q])
    bounds = df.groupBy(key).agg(
        qagg.getItem(0).alias("__lo"), qagg.getItem(1).alias("__hi")
    )
    v = F.col(value)
    clipped = (
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v)
    )
    return (
        df.join(broadcast(bounds), key)
        .groupBy(key)
        .agg(
            F.round(F.first("__lo"), 2).alias("lo"),
            F.round(F.first("__hi"), 2).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum((v < F.col("__lo")).cast("long")).alias("n_clip_lo"),
            F.sum((v > F.col("__hi")).cast("long")).alias("n_clip_hi"),
            F.round(F.avg(clipped), 2).alias("avg_winsorized"),
        )
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    value: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-``key`` MAD outlier screen: a row is an outlier when
    ``|value - median| > k * 1.4826 * MAD`` (1.4826 scales MAD to the
    stddev of a normal, so ``k`` reads in sigmas — the robust z-score).

    Plan shape: two map-combined exchanges on ``key`` (the group median,
    then the median of absolute deviations — MAD is a median OF a
    derived column, irreducibly two rounds), each O(groups)-row result
    broadcast back; the final per-group flag counts ride the second
    aggregation. Exact medians both rounds so the DuckDB oracle matches
    bit-for-bit (medians of an even count interpolate midpoints — the
    same IEEE double in both engines). Returns one row per key:
    (key, med, mad, n, n_outliers).
    """
    med = df.groupBy(key).agg(F.median(value).alias("__med"))
    dev = df.join(broadcast(med), key).withColumn(
        "__adev", F.abs(F.col(value) - F.col("__med"))
    )
    mad = dev.groupBy(key).agg(F.median("__adev").alias("__mad"))
    flagged = dev.join(broadcast(mad), key)
    return flagged.groupBy(key).agg(
        F.round(F.first("__med"), 4).alias("med"),
        F.round(F.first("__mad"), 4).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("__adev") > F.lit(k) * F.lit(1.4826) * F.col("__mad")).cast(
                "long"
            )
        ).alias("n_outliers"),
    )
