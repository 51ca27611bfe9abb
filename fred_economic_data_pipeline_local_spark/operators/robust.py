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


# Poisson(1) cumulative probabilities, computed once in Python and
# shared as literals with any SQL mirror (same discipline as the
# linkage log-odds weights: no libm divergence between engines).
import math as _math

_POIS1_CUM: list[float] = []
_acc, _p = 0.0, _math.exp(-1.0)
for _k in range(8):
    _acc += _p
    _POIS1_CUM.append(_acc)
    _p /= _k + 1


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value: str,
    reps: int = 32,
    z: float = 1.959963984540054,  # Phi^-1(0.975), shared literal
) -> DataFrame:
    """Bootstrap standard error + normal-approximation CI for
    ``mean(value)`` by the Poisson bootstrap (Chamandy et al., Google
    2012 — "Estimating Uncertainty for Massive Data Streams"): each of
    ``reps`` replicates re-weights every row with an independent
    Poisson(1) count, a distributed-friendly surrogate for resampling
    n-out-of-n (no global state, no sampling pass per replicate).

    Determinism contract: the Poisson draw for (row, rep) inverts the
    shared cumulative table above at u = first-8-hex-digits of
    md5(id:rep) / 16^8 — md5, not rand(), so every engine, partition
    layout, and retry reproduces the identical replicate weights (the
    same recipe as the md5 samplers in operators/curation.py).

    Plan shape: one explode of the fact rows into ``reps`` weighted
    copies feeding a map-combined (rep) aggregate — ONE exchange of
    O(reps x partitions) partial sums; replicate means then reduce to a
    1-row (point, se, ci_lo, ci_hi) frame. The explode multiplies rows
    ``reps``-fold BEFORE the combiner, but partials absorb it: the
    exchange itself stays O(reps), independent of table size.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.col("__rep").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = F.lit(len(_POIS1_CUM))
    for k in range(len(_POIS1_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CUM[k]), F.lit(k)).otherwise(w)
    rep_means = (
        df.select(
            F.col(id_col),
            F.col(value),
            F.explode(F.array(*[F.lit(r) for r in range(reps)])).alias(
                "__rep"
            ),
        )
        .select("__rep", (w.cast("double") * F.col(value)).alias("__wx"), w.alias("__w"))
        .groupBy("__rep")
        .agg(
            (F.sum("__wx") / F.sum("__w")).alias("__mean")
        )
    )
    point = df.agg(F.avg(value).alias("__point"))
    return (
        rep_means.agg(
            F.round(F.stddev_samp("__mean"), 4).alias("boot_se"),
            F.count(F.lit(1)).alias("n_reps"),
        )
        .join(F.broadcast(point))
        .select(
            F.round("__point", 4).alias("point"),
            "boot_se",
            "n_reps",
            F.round(F.col("__point") - F.lit(z) * F.col("boot_se"), 4).alias(
                "ci_lo"
            ),
            F.round(F.col("__point") + F.lit(z) * F.col("boot_se"), 4).alias(
                "ci_hi"
            ),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group: str,
    value: str,
    a,
    b,
    alpha_c: float = 1.358,  # Kolmogorov c(0.05), shared literal
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between groups ``a`` and
    ``b`` of ``group``: D = sup |F_a(x) - F_b(x)| over the observed
    support, with the large-sample alpha=0.05 rejection threshold
    c * sqrt((n_a + n_b) / (n_a * n_b)).

    Plan shape: the corpus collapses to per-(group, value) counts in
    one map-combined exchange — the ECDF lives on the DISTINCT-value
    domain, so the cumulative window that follows runs over O(|support|)
    rows (a single-partition window, same bounded-domain justification
    as the profile sketches; n_chars-like supports are hundreds of
    values, never the corpus). Returns one row:
    (n_a, n_b, d_stat, d_crit, reject).
    """
    from pyspark.sql import Window

    cnt = (
        # drop null values: an ECDF is undefined on them, and the two
        # engines would order a null group differently (Spark sorts
        # nulls first, DuckDB last) — excluding them keeps the window
        # deterministic everywhere
        df.where(F.col(group).isin([a, b]) & F.col(value).isNotNull())
        .groupBy(value)
        .agg(
            F.sum((F.col(group) == a).cast("long")).alias("__ca"),
            F.sum((F.col(group) == b).cast("long")).alias("__cb"),
        )
    )
    totals = cnt.agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    wv = Window.orderBy(value).rowsBetween(Window.unboundedPreceding, 0)
    ecdf = cnt.select(
        F.sum("__ca").over(wv).alias("__fa"),
        F.sum("__cb").over(wv).alias("__fb"),
    ).join(broadcast(totals))
    crit = F.lit(alpha_c) * F.sqrt(
        (F.col("n_a") + F.col("n_b"))
        / (F.col("n_a") * F.col("n_b")).cast("double")
    )
    return (
        ecdf.groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("__fa") / F.col("n_a")
                        - F.col("__fb") / F.col("n_b")
                    )
                ),
                6,
            ).alias("d_stat")
        )
        .select(
            "n_a",
            "n_b",
            "d_stat",
            F.round(crit, 6).alias("d_crit"),
            (F.col("d_stat") > crit).alias("reject"),
        )
    )


def winsorize_bounds(
    df: DataFrame,
    key: str,
    value: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    approx_rel_err: float | None = None,
) -> DataFrame:
    """Per-group clip bounds only — the winsorize plan's first exchange,
    split out so the approx path can PERSIST/EXPORT the O(groups) bounds
    table (at 100 TB the GK sketch pass over the corpus is the expensive
    step; its product is a tiny bounds table you keep). Returns
    (key, lo, hi) raw doubles."""
    if approx_rel_err is not None:
        acc = max(1, int(1.0 / approx_rel_err))
        qagg = F.percentile_approx(value, [lo_q, hi_q], acc)
    else:
        qagg = F.percentile(value, [lo_q, hi_q])
    return df.groupBy(key).agg(
        qagg.getItem(0).alias("lo"), qagg.getItem(1).alias("hi")
    )


def winsorize_apply(
    df: DataFrame, key: str, value: str, bounds: DataFrame
) -> DataFrame:
    """Clip + aggregate against a PRECOMPUTED bounds frame (key, lo,
    hi) — the winsorize plan's second exchange. The bounds frame is
    O(groups) and broadcast; the fact side shuffles once, map-combined.
    Output shape matches ``winsorize``."""
    v = F.col(value)
    b = bounds.select(
        key, F.col("lo").alias("__lo"), F.col("hi").alias("__hi")
    )
    clipped = (
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v)
    )
    return (
        df.join(broadcast(b), key)
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
