"""Temporal join operators Spark lacks natively: as-of and range joins.

Both are implemented as compositions of shuffle-friendly primitives
(union + ordered window; bucket-explode + equi-join) rather than
nested-loop conditional joins, so they scale like ordinary sort-merge
plans instead of degenerating into BroadcastNestedLoop at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    right_suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: attach the most recent right row at-or-before
    each left row's ``on`` time, per ``by`` group (pandas merge_asof /
    DuckDB ASOF JOIN semantics, left-outer flavor).

    Implementation — the union trick, no join at all:
    tag both sides, union them, sort by (by, on, side) inside one window
    pass, and carry the latest right payload forward with
    ``last(ignorenulls=True)``. One shuffle on the ``by`` keys total,
    versus a per-row backward probe; skew is bounded by ``by``
    cardinality exactly like any keyed window.

    Right rows sort before left rows at equal timestamps, so an exact-time
    match is visible to the left row (merge_asof's inclusive backward).
    ``tolerance_seconds`` nulls the attached payload when the match is
    older than the tolerance.

    The whole right row is carried as ONE struct (non-null for every right
    row even when its payload fields are NULL), so the attached match is
    always a single right row — a per-column ``last(ignorenulls=True)``
    would instead backfill a NULL field from an older right row, mixing
    values across rows and diverging from merge_asof/DuckDB semantics.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != on
    ]
    carried = [f"{c}{right_suffix}" for c in value_cols]

    l_tagged = left.select(
        "*",
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(value_cols, carried)],
        F.lit(None).cast(right.schema[on].dataType).alias("__rt"),
    )
    r_tagged = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(n) for c, n in zip(value_cols, carried)],
        F.col(on).alias("__rt"),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rt").alias("__rt"),
            *[F.col(n).alias(n) for n in carried],
        ),
    )
    attached = unioned.withColumn("__p", payload).select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__a")
    )
    out = attached.where(F.col("__side") == 1)

    keep_match = F.col("__a").isNotNull()
    if tolerance_seconds is not None:
        keep_match = keep_match & (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("__a.__rt"))
            <= tolerance_seconds * 1_000_000
        )
    return out.select(
        *left.columns,
        *[
            F.when(keep_match, F.col(f"__a.{n}")).otherwise(F.lit(None)).alias(n)
            for n in carried
        ],
        F.when(keep_match, F.col("__a.__rt"))
        .otherwise(F.lit(None))
        .alias(f"{on}{right_suffix}"),
    )


def range_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Range join against a SMALL interval table: value in [lo, hi).

    The right side is broadcast, so the conditional join is a broadcast
    nested-loop over a handful of rows per record — the right tool when
    the interval table is dimension-sized (price bands, SLA tiers).
    For interval tables that are themselves large, use
    ``interval_bucket_join``.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return left.join(broadcast(right), cond, "left")


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    broadcast_right: bool = False,
) -> DataFrame:
    """Scalable interval join: left.time in [right.start, right.end].

    The O(n*m) conditional join is decomposed into an equi-join:
    each right interval explodes into the time buckets it covers, the left
    row maps to its single bucket, and the equi-join on bucket id feeds an
    exact predicate verify. Candidate pairs shrink from |L|x|R| to pairs
    sharing a bucket — the standard points-in-intervals decomposition.
    ``bucket_seconds`` trades explode factor against candidate density
    (pick ~= median interval length).

    ``broadcast_right=True`` ships the exploded interval side to every
    task instead of shuffling the (usually much larger) point side — the
    planner can't pick this itself because its size estimate for the
    exploded side is inflated. Use when |right| x explode-factor fits the
    broadcast threshold; the point side is then never shuffled at all.
    """
    # floor division (not truncate-toward-zero) so negative-epoch
    # timestamps bucket consistently on both sides of a boundary
    b = F.lit(bucket_seconds * 1_000_000)
    l_b = left.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(left_time)) / b).cast("long")
    )
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(right_start)) / b).cast("long"),
                F.floor(F.unix_micros(F.col(right_end)) / b).cast("long"),
            )
        ),
    )
    if broadcast_right:
        r_b = broadcast(r_b)
    return (
        l_b.join(r_b, "__bucket")
        .where(
            (F.col(left_time) >= F.col(right_start))
            & (F.col(left_time) <= F.col(right_end))
        )
        .drop("__bucket")
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per key (the TWAP/step-interpolation
    aggregate): each observation's value holds until the next one, so
    the mean is duration-weighted — the correct summary for irregularly
    sampled series, where the plain avg over-weights bursts.

    twap(k) = sum_i v_i * (t_{i+1} - t_i) / (t_last - t_first) over the
    key's observations ordered by (ts, tiebreak); the last observation
    carries no interval. Keys with fewer than two observations (or zero
    span) have no defined weighting and are excluded. One shuffle on
    the key (the lead window), then a map-combined weighted-sum
    aggregate on the same key — at 100 TB this is two narrow passes
    over (key, ts, value), never a self-join.

    Returns (key, n_obs, twap) with twap rounded to 6 dp.
    """
    from pyspark.sql import Window

    stepped = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("t"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    )
    # the tiebreak pins lead() order under duplicate timestamps — the
    # tied interval gets zero duration either way, but BOTH engines must
    # hand the interval to the same row for the weighted sum to hash
    w = Window.partitionBy("k").orderBy("t", "tb")
    with_next = stepped.withColumn("t_next", F.lead("t").over(w))
    agg = (
        with_next.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(
                F.when(
                    F.col("t_next").isNotNull(),
                    F.col("v") * (F.col("t_next") - F.col("t")),
                )
            ).alias("__wsum"),
            (F.max("t") - F.min("t")).alias("__span"),
        )
        .where(F.col("__span") > 0)
    )
    return agg.select(
        F.col("k").alias(key_col),
        "n_obs",
        F.round(F.col("__wsum") / F.col("__span"), 6).alias("twap"),
    )
