"""Ordered-series operators: closed-form EWMA and lagged autocorrelation.

The reference's time dimension stops at calendar averages
(``transform_fred_data.py:86-99``); monitoring an economic or telemetry
series needs recency-weighted levels (EWMA) and persistence diagnostics
(ACF). A recursive EWMA looks stateful, but the closed form

    y_N = (1-a)^(N-1) * x_1 + sum_{i=2..N} a * (1-a)^(N-i) * x_i

is one weighted sum over the ordered series — pure window + aggregate,
no recursion, no applyInPandas, no state store.

Scale notes. Both operators partition by the series key, so the sort
parallelizes across keys; the ACF runs on the per-day AGGREGATED series
(O(days) rows per key), never the raw events. Weights use
``pow(1-a, k)`` with integer k — sub-ulp libm variance across engines
is absorbed by the 6 dp output rounding; (1-a)^k underflows gracefully
to 0 for long histories, which is exactly the semantics (old
observations stop mattering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_last(
    df: DataFrame,
    key: str,
    order_by: list[str],
    value: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-``key`` exponentially-weighted moving average of ``value``
    over the ``order_by``-ordered history, initialized at the first
    observation (y_1 = x_1) — the last EWMA level each series currently
    sits at, computed as ONE weighted sum via the closed form above.

    Plan shape: a single per-key sort (row_number and count share the
    partition window), then one map-combined aggregate. Null values are
    excluded (the reference's "." sentinel family arrives as null).
    Returns one row per key: (key, n_events, ewma).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    q = 1.0 - alpha
    w = Window.partitionBy(key).orderBy(*order_by)
    wk = Window.partitionBy(key)
    x = (
        df.where(F.col(value).isNotNull())
        .select(
            F.col(key),
            F.col(value).alias("__x"),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wk).alias("__n"),
        )
    )
    weight = F.when(
        F.col("__rn") == 1, F.pow(F.lit(q), F.col("__n") - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(q), F.col("__n") - F.col("__rn")))
    return x.groupBy(key).agg(
        F.max("__n").alias("n_events"),
        F.round(F.sum(weight * F.col("__x")), 6).alias("ewma"),
    )


def acf_lags(
    df: DataFrame,
    key: str,
    order_by: list[str],
    value: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-``key`` sample autocorrelation of the ordered series at index
    lags 1..``max_lag``: Pearson correlation of (x_t, x_{t+lag}) pairs —
    the persistence diagnostic read before trusting a trend slope.

    Plan shape: one per-key sort produces all ``max_lag`` lead columns
    in the same window pass; the leads then unpivot (in-partition
    explode, no shuffle) into (key, lag, x, y) pairs feeding one
    map-combined corr aggregate. Returns one row per (key, lag):
    (key, lag, n_pairs, acf).
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    w = Window.partitionBy(key).orderBy(*order_by)
    leads = df.select(
        F.col(key),
        F.col(value).alias("__x"),
        *[
            F.lead(value, k).over(w).alias(f"__y{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    pairs = leads.select(
        key,
        "__x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"__y{k}").alias("y")
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("__p"),
    ).select(
        key,
        F.col("__p.lag").alias("lag"),
        "__x",
        F.col("__p.y").alias("__y"),
    ).where(F.col("__y").isNotNull())
    return pairs.groupBy(key, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("__x", "__y"), 6).alias("acf"),
    )


def _indexed(df: DataFrame, key: str, order_by: list[str], value: str):
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.select(
        F.col(key),
        F.col(value).alias("__x"),
        F.row_number().over(w).alias("__i"),
    )


def _pairs(idx: DataFrame, key: str):
    """All i < j index pairs WITHIN a series — an equi-join on the
    series key with the index inequality as residual. Pair count is
    O(len^2) per series (len = points AFTER per-period aggregation,
    e.g. days — bounded by the calendar, not the corpus), parallel
    across series."""
    a = idx.select(
        key, F.col("__x").alias("__xa"), F.col("__i").alias("__ia")
    )
    b = idx.select(
        key, F.col("__x").alias("__xb"), F.col("__i").alias("__ib")
    )
    return a.join(b, key).where(F.col("__ia") < F.col("__ib"))


def mann_kendall(
    df: DataFrame, key: str, order_by: list[str], value: str
) -> DataFrame:
    """Mann-Kendall nonparametric trend test per series:
    S = sum over i<j of sign(x_j - x_i), with the tie-corrected
    variance Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 and the
    continuity-corrected z = (S -/+ 1)/sqrt(Var). Detects monotone
    trend without OLS's normality/linearity assumptions — the robust
    companion to the least-squares slope (events_trend_slope).

    Everything up to the final z is exact integer arithmetic (sign
    sums, tie-group cubics), so the statistic is engine-deterministic;
    z rounds at 6 dp. Returns (key, n_points, s_stat, z_stat).
    """
    idx = _indexed(df, key, order_by, value)
    s = (
        _pairs(idx, key)
        .groupBy(key)
        .agg(
            F.sum(
                F.signum(F.col("__xb") - F.col("__xa")).cast("long")
            ).alias("s_stat")
        )
    )
    n = idx.groupBy(key).agg(F.count(F.lit(1)).alias("n_points"))
    ties = (
        idx.groupBy(key, "__x")
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy(key)
        .agg(
            F.sum(
                F.col("__t")
                * (F.col("__t") - 1)
                * (2 * F.col("__t") + 5)
            ).alias("__tie_sum")
        )
    )
    nn = F.col("n_points")
    var = (
        nn * (nn - 1) * (2 * nn + 5) - F.col("__tie_sum")
    ).cast("double") / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(ties, key)
        .join(s, key)
        .select(key, "n_points", "s_stat", F.round(z, 6).alias("z_stat"))
    )


def theil_sen_slope(
    df: DataFrame, key: str, order_by: list[str], value: str
) -> DataFrame:
    """Theil-Sen estimator per series: the MEDIAN of all pairwise
    slopes (x_j - x_i)/(j - i) over the index-ordered points — a
    29.3%-breakdown robust slope (one wild day cannot move it, unlike
    OLS). Pair slopes are identical IEEE divisions in any engine and
    the exact median interpolates the same midpoint, so only the final
    6 dp rounding is nominal. Same bounded O(len^2)-per-series pair
    join as ``mann_kendall``. Returns (key, n_pairs, sen_slope).
    """
    idx = _indexed(df, key, order_by, value)
    slopes = _pairs(idx, key).select(
        key,
        (
            (F.col("__xb") - F.col("__xa"))
            / (F.col("__ib") - F.col("__ia")).cast("double")
        ).alias("__slope"),
    )
    return slopes.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.median("__slope"), 6).alias("sen_slope"),
    )


def conformal_backtest(
    daily: DataFrame,
    key: str,
    time_col: str,
    value: str,
    period: int = 7,
    alpha: float = 0.1,
    cal_frac_num: int = 2,
    cal_frac_den: int = 3,
) -> DataFrame:
    """Split-conformal interval calibration for the seasonal-naive
    forecaster: per ``key``, forecast each ``time_col`` step with the
    value ``period`` steps back, take absolute residuals, calibrate the
    (1 - alpha) interval half-width on the FIRST cal_frac of residual
    steps as the exact order statistic

        qhat = the ceil((1 - alpha) * (n_cal + 1))-th smallest residual

    (the finite-sample-valid split-conformal quantile, Vovk et al. /
    Lei et al. 2018), then report empirical coverage of |r| <= qhat on
    the held-out remainder — the distribution-free uncertainty wrapper
    a production forecaster ships with, and the honesty check on it.

    Determinism: residuals are differences of 2-dp-rounded aggregates
    (identical doubles in both engines); the order statistic ranks by
    (residual, time) so ties pin; coverage is a ratio of exact integer
    counts. Scale: everything runs per key over the O(steps) aggregated
    series — the lag is one window partitioned by key, the order
    statistic one per-key sort of the calibration slice, never a global
    window over raw events.

    Returns one row per key:
    (key, n_cal, n_test, qhat, coverage, target_coverage). A key whose
    calibration slice is too small for the order statistic
    (ceil((1 - alpha) * (n_cal + 1)) > n_cal) reports qhat = +inf and
    coverage 1.0 — the split-conformal "not enough data" interval —
    rather than disappearing from the output.
    """
    w_lag = Window.partitionBy(key).orderBy(time_col)
    resid = (
        daily.select(
            key,
            time_col,
            F.col(value).alias("__v"),
            F.lag(F.col(value), period).over(w_lag).alias("__fc"),
        )
        .where(F.col("__fc").isNotNull())
        .select(
            key, time_col, F.abs(F.col("__v") - F.col("__fc")).alias("__r")
        )
    )
    # per-key cutoff: first cal_frac of residual steps calibrate
    b = resid.groupBy(key).agg(
        F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi")
    )
    cut = (
        F.col("__lo")
        + ((F.col("__hi") - F.col("__lo")) * cal_frac_num) / cal_frac_den
    )
    tagged = resid.join(F.broadcast(b), key).select(
        key, "__r", (F.col(time_col) <= cut).alias("__is_cal")
    )
    cal = tagged.where(F.col("__is_cal"))
    n_cal = cal.groupBy(key).agg(F.count(F.lit(1)).alias("n_cal"))
    w_rank = Window.partitionBy(key).orderBy("__r")
    ranked = cal.select(
        key, "__r", F.row_number().over(w_rank).alias("__rk")
    )
    qhat = (
        ranked.join(F.broadcast(n_cal), key)
        .where(
            F.col("__rk")
            >= F.ceil(F.lit(1.0 - alpha) * (F.col("n_cal") + 1))
        )
        .groupBy(key)
        .agg(F.min("__r").alias("qhat"))
    )
    test = tagged.where(~F.col("__is_cal"))
    # a calibration slice too small for the order statistic
    # (ceil((1-alpha)(n_cal+1)) > n_cal) yields no qhat row; the
    # split-conformal convention is qhat = +inf — full coverage, the
    # honest "not enough calibration data" interval — so the key is
    # REPORTED with an infinite half-width, never silently dropped
    # (left join + coalesce instead of an inner join)
    return (
        test.join(F.broadcast(qhat), key, "left")
        .withColumn(
            "qhat", F.coalesce(F.col("qhat"), F.lit(float("inf")))
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("__r") <= F.col("qhat")).cast("long")
            ).alias("__hits"),
            F.round(F.min("qhat"), 4).alias("qhat"),
        )
        .join(F.broadcast(n_cal), key)
        .select(
            key,
            "n_cal",
            "n_test",
            "qhat",
            F.round(
                F.col("__hits").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
            F.lit(round(1.0 - alpha, 6)).alias("target_coverage"),
        )
    )
