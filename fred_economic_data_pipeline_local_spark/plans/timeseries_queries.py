"""Time-series / window / event queries over ``events`` and the star schema.

Window functions are absent from the reference (SURVEY.md §2.7) but are the
natural analytics over its gold layer (month-over-month change, rolling
means); here they run over the driver's ``events`` fixture. All window
specs carry a unique-key tiebreak so results are deterministic for the
oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "window_rank_customers",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
    description="ranking window: per-group top-3 via row_number",
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


# fixture spans one calendar month -> bucket by day for real series depth
_DAILY = """
SELECT event_type,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS m,
       CAST(day(ts) AS INTEGER) AS d,
       round(sum(value), 2) AS revenue
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2, 3, 4
"""


@query(
    "window_lag_month_over_month",
    oracle=f"""
SELECT event_type, y, m, d, revenue,
       round(revenue - lag(revenue) OVER (PARTITION BY event_type ORDER BY y, m, d), 2) AS mom_change
FROM ({_DAILY})
""",
    description="lag window: period-over-period delta (gold-layer analytics shape)",
)
def window_lag_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = Window.partitionBy("event_type").orderBy("y", "m", "d")
    return daily.withColumn(
        "mom_change", F.round(F.col("revenue") - F.lag("revenue").over(w), 2)
    )


@query(
    "window_rolling_mean",
    oracle=f"""
SELECT event_type, y, m, d, revenue,
       round(avg(revenue) OVER (PARTITION BY event_type ORDER BY y, m, d
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS rolling3
FROM ({_DAILY})
""",
    description="rolling frame window: trailing 3-bucket mean",
)
def window_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("y", "m", "d")
        .rowsBetween(-2, Window.currentRow)
    )
    return daily.withColumn("rolling3", F.round(F.avg("revenue").over(w), 6))


@query(
    "window_cumulative_user_value",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM events
WHERE value IS NOT NULL
""",
    description="cumulative sum window per user",
)
def window_cumulative_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_total"),
    )


@query(
    "tumbling_window_events",
    oracle="""
SELECT event_type,
       strftime(ts - to_microseconds(epoch_us(ts) % 3600000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    description="SURVEY §2.10: tumbling event-time window (1 h) computed in batch",
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bucket_us = F.unix_micros("ts") - F.unix_micros("ts") % (3600 * 1_000_000)
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.timestamp_micros(bucket_us), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "sessionize_users",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
FROM sessions
GROUP BY user_id, session_idx
""",
    description="gap-based sessionization (30 min) via lag + cumulative flag sum",
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.withColumn(
        "new_session", F.when(gap_us > 1800 * 1_000_000, 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "json_extract_props",
    oracle="""
SELECT event_id, event_type,
       TRY_CAST(props->>'$.k' AS BIGINT) AS k_value
FROM events
""",
    description="SURVEY §2.9 C11: semi-structured JSON extraction from props",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "stream_click_attribution",
    oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
       round(p.value, 2) AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""",
    description="SURVEY §2.10: click->purchase attribution (interval "
    "self-join); same function runs as a watermarked stream-stream join "
    "with bounded state on streaming input (tests/test_streaming.py)",
)
def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import click_purchase_join

    return click_purchase_join(load_table(spark, "events", sf_dir))


@query(
    "gap_fill_forward_monthly",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
),
cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM bounds),
monthly AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
         round(sum(o_totalprice), 2) AS v
  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2
),
custs AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 100)
SELECT c.o_custkey AS custkey,
       strftime(cal.m, '%Y-%m-%d') AS month,
       monthly.v AS month_total,
       last_value(monthly.v IGNORE NULLS) OVER (
         PARTITION BY c.o_custkey ORDER BY cal.m
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
FROM custs c
CROSS JOIN cal
LEFT JOIN monthly ON monthly.o_custkey = c.o_custkey AND monthly.m = cal.m
""",
    description="calendar gap-fill + forward-fill imputation: dense month "
    "spine via sequence/explode (broadcast — never a driver loop), left "
    "join of the sparse aggregate, last-non-null carried forward with an "
    "IGNORE NULLS running window",
)
def gap_fill_forward_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    sub = orders.where(F.col("o_custkey") < 100)
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m")
    )
    monthly = sub.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
    custs = sub.select("o_custkey").distinct()
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        custs.crossJoin(F.broadcast(cal))
        .join(monthly, ["o_custkey", "m"], "left")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.date_format("m", "yyyy-MM-dd").alias("month"),
            F.col("v").alias("month_total"),
            F.last("v", ignorenulls=True).over(w).alias("filled_total"),
        )
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
  FROM events GROUP BY user_id
)
SELECT
  CAST(count(t_view) AS BIGINT) AS n_view,
  CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_click,
  CAST(count(CASE WHEN t_click > t_view AND t_purch > t_click THEN 1 END) AS BIGINT)
    AS n_view_click_purchase
FROM u
""",
    description="event funnel: users reaching view -> click-after-view -> "
    "purchase-after-click, via one conditional min-aggregation per user "
    "then one global conditional count — two partial-aggregated shuffles, "
    "no join, no window over the raw event stream",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purch"),
    )
    vc = F.col("t_click") > F.col("t_view")
    vcp = vc & (F.col("t_purch") > F.col("t_click"))
    return firsts.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(vc, F.lit(1))).alias("n_view_click"),
        F.count(F.when(vcp, F.lit(1))).alias("n_view_click_purchase"),
    )


@query(
    "cohort_weekly_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(datediff('week', f.cohort_week, a.active_week) AS INTEGER) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity a JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
    description="cohort retention: users bucketed by first-activity week, "
    "counted per (cohort, week offset); first-touch aggregation reuses the "
    "user_id shuffle for the activity-distinct and the join",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    firsts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_volume_anomaly",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         strftime(ts - to_microseconds(epoch_us(ts) % 3600000000),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, avg(n_events) AS mu, stddev_samp(n_events) AS sd
  FROM hourly GROUP BY event_type
)
SELECT hourly.event_type, hourly.window_start, hourly.n_events,
       round((hourly.n_events - st.mu) / st.sd, 6) AS z
FROM hourly JOIN st USING (event_type)
""",
    description="event-volume anomaly scores: hourly counts per type "
    "z-normalized against the type's own across-hours distribution — "
    "the traffic-spike/dropout monitor; the per-type stats table is "
    "#types rows broadcast back, no window over the timeline",
)
def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bucket_us = F.unix_micros("ts") - F.unix_micros("ts") % (3600 * 1_000_000)
    hourly = ev.groupBy(
        "event_type",
        F.date_format(
            F.timestamp_micros(bucket_us), "yyyy-MM-dd HH:mm:ss"
        ).alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    st = hourly.groupBy(F.col("event_type").alias("__t")).agg(
        F.avg("n_events").alias("__mu"),
        F.stddev_samp("n_events").alias("__sd"),
    )
    return hourly.join(
        F.broadcast(st), hourly.event_type == F.col("__t")
    ).select(
        "event_type",
        "window_start",
        "n_events",
        F.round((F.col("n_events") - F.col("__mu")) / F.col("__sd"), 6).alias("z"),
    )


@query(
    "session_window_events",
    # Spark's session_window extends a session while the next event's
    # ts is STRICTLY before prev_ts + gap ([start, end) windows), so the
    # island break is diff >= gap — one boundary tighter than the lag
    # formulation in sessionize_users (diff > gap); session_end is
    # last_ts + gap, the window's eviction horizon
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    description="native session windows (F.session_window, gap 30 min): "
    "the streaming-native gap-merge operator run on the batch frame — "
    "the SAME function streams with a watermark and bounded state "
    "(tests/test_streaming.py); one shuffle on user_id, windows merged "
    "by the session-window exec, no self-join and no window-function "
    "double scan",
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import session_windows

    ev = load_table(spark, "events", sf_dir)
    return session_windows(ev)


@query(
    "stream_event_dedup",
    # the input is the fixture replayed TWICE (an at-least-once source);
    # dedup must restore exactly-once semantics, so the oracle is the
    # plain per-type aggregate over the fixture read ONCE
    oracle="""
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
""",
    description="at-least-once replay dedup (SURVEY §2.10 extension): "
    "dropDuplicatesWithinWatermark on the event id with watermark-bound "
    "state on streaming input (tests/test_streaming.py pins the "
    "streaming path over a doubled file source); the batch frame takes "
    "the same call site as plain keyed dropDuplicates — state tracks "
    "arrival rate within the watermark, never stream history",
)
def stream_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import dedup_replayed_events

    ev = load_table(spark, "events", sf_dir)
    replayed = ev.union(ev)  # at-least-once delivery: every row twice
    return (
        dedup_replayed_events(replayed)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "sliding_window_events",
    # a 1h window sliding every 30 min puts each event in EXACTLY two
    # windows (window = 2 x slide), both aligned to the epoch 30-min
    # grid: start1 = ts - (epoch_us(ts) % 30min), start2 = start1 - 30min
    oracle="""
WITH w AS (
  SELECT event_type, value,
         unnest([ts - to_microseconds(epoch_us(ts) % 1800000000),
                 ts - to_microseconds(epoch_us(ts) % 1800000000)
                    - INTERVAL '30 minutes']) AS wstart
  FROM events
)
SELECT event_type,
       strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM w
GROUP BY 1, 2
""",
    description="SURVEY §2.10: sliding (hopping) event-time window — "
    "native F.window(ts, '1 hour', slide '30 minutes') in batch; the "
    "same expression streams with a watermark; Spark expands each row "
    "into its overlapping windows BEFORE the one map-combined exchange, "
    "so the shuffle carries (type, window) partials, never 2x the rows",
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            "event_type", F.window("ts", "1 hour", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "total_value",
        )
    )


_CUSUM_K = 0.5  # drift allowance (in sigmas)
_CUSUM_H = 5.0  # alarm threshold


@query(
    "events_changepoint_cusum",
    # every float both engines compute derives from INTEGER hourly
    # counts through the identical expression (mean = s/n, var from the
    # sum-of-squares identity, ordered cumulative sums) — bit-exact
    # across engines, no rounding needed until the output edge
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         count(*) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, sum(c) AS s, sum(c * c) AS ss, count(*) AS n
  FROM hourly GROUP BY 1
),
z AS (
  SELECT h.event_type, h.hr,
         CASE WHEN (ss - CAST(s AS DOUBLE) * s / n) / (n - 1) > 0
              THEN (c - CAST(s AS DOUBLE) / n)
                   / sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1))
              ELSE 0.0 END - {_CUSUM_K!r} AS y
  FROM hourly h JOIN stats USING (event_type) WHERE n > 1
),
p AS (
  SELECT event_type, hr,
         sum(y) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS UNBOUNDED PRECEDING) AS pt
  FROM z
),
s AS (
  SELECT event_type, hr,
         round(pt - least(0.0,
               min(pt) OVER (PARTITION BY event_type ORDER BY hr
                             ROWS UNBOUNDED PRECEDING)), 8) AS cusum
  FROM p
),
ranked AS (
  SELECT event_type, hr, cusum,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cusum DESC, hr) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_hours
  FROM s
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
       round(cusum, 6) AS max_cusum,
       CAST(hr AS BIGINT) AS alarm_hr,
       cusum > {_CUSUM_H!r} AS alarm
FROM ranked WHERE rn = 1
""",
    description="CUSUM changepoint detection per event type over hourly "
    "counts (Page 1954): the one-sided recursion S_t = max(0, S_t-1 + "
    "z_t - k) is NOT a window function, but the prefix-sum identity "
    "S_t = P_t - min_j<=t P_j IS — one cumulative sum + one running min "
    "over the O(hours) per-type domain, no recursion, no UDF, no "
    "iteration; variance derived from integer count aggregates so both "
    "engines compute bit-identical floats up to the output edge",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # `div` = exact long division (a double divide + cast could flip a
    # row at an exact hour boundary; DuckDB's // is exact too)
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (
        hourly.join(F.broadcast(stats), "event_type")
        .where(F.col("n") > 1)
        .select(
            "event_type",
            "hr",
            (
                F.when(
                    var > 0,
                    (F.col("c") - F.col("s").cast("double") / F.col("n"))
                    / F.sqrt(var),
                ).otherwise(F.lit(0.0))
                - F.lit(_CUSUM_K)
            ).alias("y"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = z.select(
        "event_type",
        "hr",
        F.sum("y").over(w).alias("pt"),
    ).select(
        "event_type", "hr", "pt", F.min("pt").over(w).alias("minp")
    )
    s = p.select(
        "event_type",
        "hr",
        F.round(F.col("pt") - F.least(F.lit(0.0), F.col("minp")), 8).alias(
            "cusum"
        ),
    )
    wt = Window.partitionBy("event_type")
    ranked = s.select(
        "event_type",
        "hr",
        "cusum",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.desc("cusum"), F.asc("hr")
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_hours"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "event_type",
        "n_hours",
        F.round("cusum", 6).alias("max_cusum"),
        F.col("hr").alias("alarm_hr"),
        (F.col("cusum") > F.lit(_CUSUM_H)).alias("alarm"),
    )


@query(
    "events_trend_slope",
    # every input to the slope is either exact (LONG day index, its
    # squares/sums) or an ordered sequential window sum of doubles —
    # same addition order in both engines, so the formula's
    # cancellation (n*Sxy - Sx*Sy over a trailing window) reproduces
    # bit-for-bit; the denominator is all-integer and exact
    oracle="""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS d,
         round(sum(value), 2) AS y
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
win AS (
  SELECT event_type, d, y,
         count(*) OVER w AS n,
         sum(d) OVER w AS sx,
         sum(y) OVER w AS sy,
         sum(d * y) OVER w AS sxy,
         sum(d * d) OVER w AS sxx
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(d AS BIGINT) AS d, y,
       CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
            THEN round((n * sxy - sx * sy)
                       / CAST(n * sxx - sx * sx AS DOUBLE), 6)
            END AS slope
FROM win
""",
    description="trailing 7-bucket OLS trend slope per event type — the "
    "rolling regression a monitoring pipeline runs over every series: "
    "slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) from FIVE window sums "
    "over one (type)-partitioned ordered frame — one exchange, no "
    "iteration, no UDF; the denominator is exact integer arithmetic "
    "(LONG day indexes), so the classic cancellation pitfall costs "
    "nothing",
)
def events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    win = daily.select(
        "event_type",
        "d",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("d").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("d") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).over(w).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return win.select(
        "event_type",
        "d",
        "y",
        F.col("n").alias("n_window"),
        F.when(
            (F.col("n") >= 2) & (den > 0),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / den.cast("double"),
                6,
            ),
        ).alias("slope"),
    )


_LTV_REF_DAY = 19815  # 2024-04-02 UTC, just past the fixture's span
_LTV_HALFLIFE_DAYS = 30.0


@query(
    "events_user_ltv_decay",
    # both engines compute exp() on the same doubles (age derived from
    # exact LONG day buckets); per-term 1-ulp libm differences are
    # ~1e-16 relative, invisible at the 2-dp output rounding — and the
    # reference day is a shared literal, never now()
    oracle=f"""
SELECT user_id,
       count(*) AS n_events,
       round(sum(value * exp(-(
         ({_LTV_REF_DAY} - epoch_us(ts) // 86400000000)
         / {_LTV_HALFLIFE_DAYS!r}) * 0.6931471805599453)), 2)
         AS ltv_decayed
FROM events WHERE value IS NOT NULL
GROUP BY user_id
""",
    description="exponentially-decayed lifetime value per user "
    "(half-life 30 days, fixed reference day — never now(), so the "
    "result is reproducible): one map-combined exchange of per-user "
    "partials, the decay factored as exp(-age*ln2/halflife) inside "
    "whole-stage codegen; the recency-weighted aggregate every "
    "engagement pipeline publishes",
)
def events_user_ltv_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).where(
        F.col("value").isNotNull()
    )
    age_days = F.lit(_LTV_REF_DAY) - F.expr(
        "unix_micros(ts) div 86400000000"
    )
    decay = F.exp(
        -(age_days / F.lit(_LTV_HALFLIFE_DAYS)) * F.lit(0.6931471805599453)
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value") * decay), 2).alias("ltv_decayed"),
    )


_WHLL_P = 10


def _whll_est_sql(v: str, z: str) -> str:
    """HLL estimate fragment — same alpha/m literals as the Spark side
    (operators/profile.hll_estimate with p = _WHLL_P)."""
    from ..operators.profile import hll_alpha

    m = 1 << _WHLL_P
    raw = f"{hll_alpha(_WHLL_P) * m * m!r} / ({v} + {z})"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / {v}) "
        f"ELSE {raw} END, 4)"
    )


def _whll_oracle() -> str:
    from ..exports import export_sql

    m = 1 << _WHLL_P
    return f"""
WITH regs AS (SELECT grp AS day, reg, rho FROM {export_sql('whll_day_regs')}),
days AS (SELECT DISTINCT day FROM regs),
allregs AS (SELECT DISTINCT reg FROM regs),
grid AS (
  SELECT d.day, r.reg, max(g.rho) OVER (
           PARTITION BY r.reg ORDER BY d.day
           ROWS UNBOUNDED PRECEDING) AS rmax
  FROM days d CROSS JOIN allregs r
  LEFT JOIN regs g ON g.day = d.day AND g.reg = r.reg
),
cum AS (
  SELECT day, count(rmax) AS n_regs,
         sum(CASE WHEN rmax IS NULL THEN 0.0
                  ELSE 1.0 / (1::BIGINT << rmax) END) AS z
  FROM grid GROUP BY day
),
cum_est AS (
  SELECT day, {_whll_est_sql(f'({m} - n_regs)', 'z')} AS n_cum_est
  FROM cum
),
day_agg AS (
  SELECT day, count(*) AS n_regs,
         sum(1.0 / (1::BIGINT << rho)) AS z
  FROM regs GROUP BY day
),
day_est AS (
  SELECT day, {_whll_est_sql(f'({m} - n_regs)', 'z')} AS n_day_est
  FROM day_agg
),
ev AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
day_exact AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_day_exact
  FROM ev GROUP BY day
),
firsts AS (SELECT user_id, min(day) AS day FROM ev GROUP BY user_id),
news AS (SELECT day, count(*) AS n_new FROM firsts GROUP BY day),
cum_exact AS (
  SELECT d.day,
         CAST(sum(coalesce(n.n_new, 0)) OVER (
           ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS n_cum_exact
  FROM (SELECT DISTINCT day FROM ev) d LEFT JOIN news n ON d.day = n.day
)
SELECT de.day, dx.n_day_exact, de.n_day_est,
       cx.n_cum_exact, ce.n_cum_est
FROM day_est de
JOIN day_exact dx USING (day)
JOIN cum_est ce USING (day)
JOIN cum_exact cx USING (day)
"""


@query(
    "window_hll_distinct_users",
    oracle=_whll_oracle(),
    description="windowed HLL distinct-user report with a CUMULATIVE "
    "rollup by running register max (the sketch-union-over-time shape: "
    "Snowflake's HLL_COMBINE over a window): per-day register tables "
    "(one map-combined exchange, O(days x 2^p) total state) are "
    "exported, the to-date sketch at day d is max(rho) over days <= d "
    "per register — an O(days x 2^p) dense-grid window, NEVER a "
    "re-scan of the corpus per day — and both the per-day and "
    "cumulative estimates are certified against exact distinct counts "
    "(cumulative exact via the first-seen trick, no quadratic "
    "count-distinct-per-prefix)",
)
def window_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.profile import hll_estimate, hll_registers

    m = 1 << _WHLL_P
    ev = load_table(spark, "events", sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    regs = export_table(
        hll_registers(ev, "user_id", p=_WHLL_P, by="day"), "whll_day_regs"
    )
    day_est = hll_estimate(regs, p=_WHLL_P, by=True).select(
        F.col("grp").alias("day"), F.col("n_distinct_est").alias("n_day_est")
    )
    # cumulative sketch: dense (day x reg) grid (O(days x 2^p) rows,
    # both sides tiny) + running max per register; missing cells stay
    # null and are ignored by the window max
    days = regs.select("grp").distinct().select(F.col("grp").alias("day"))
    allregs = regs.select("reg").distinct()
    w = (
        Window.partitionBy("reg")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = (
        days.crossJoin(allregs)
        .join(
            regs.select(F.col("grp").alias("day"), "reg", "rho"),
            ["day", "reg"],
            "left",
        )
        .withColumn("rmax", F.max("rho").over(w))
    )
    cum_regs = grid.where(F.col("rmax").isNotNull()).select(
        F.col("day").alias("grp"), "reg", F.col("rmax").alias("rho")
    )
    cum_est = hll_estimate(cum_regs, p=_WHLL_P, by=True).select(
        F.col("grp").alias("day"), F.col("n_distinct_est").alias("n_cum_est")
    )
    day_exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_day_exact")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    news = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_exact = (
        ev.select("day")
        .distinct()
        .join(news, "day", "left")
        .withColumn(
            "n_cum_exact",
            F.sum(F.coalesce("n_new", F.lit(0))).over(wcum),
        )
        .select("day", "n_cum_exact")
    )
    return (
        day_est.join(day_exact, "day")
        .join(cum_est, "day")
        .join(cum_exact, "day")
        .select("day", "n_day_exact", "n_day_est", "n_cum_exact", "n_cum_est")
    )


# EWMA smoothing constant, shared as one literal with the SQL mirror
_EWMA_ALPHA = 0.3
_EWMA_Q = 1.0 - _EWMA_ALPHA


@query(
    "ewma_user_values",
    oracle=f"""
WITH x AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       round(sum(CASE WHEN rn = 1 THEN pow({_EWMA_Q!r}, n - 1)
                      ELSE {_EWMA_ALPHA!r} * pow({_EWMA_Q!r}, n - rn)
                 END * value), 6) AS ewma
FROM x GROUP BY user_id
""",
    description="per-user EWMA level (alpha=0.3, initialized at the "
    "first observation) via the closed-form weighted sum — a recursive-"
    "looking statistic expressed as ONE per-key sort + map-combined "
    "aggregate, no state store, no applyInPandas; weights pow(q, k) "
    "with integer k, sub-ulp libm variance absorbed by 6 dp rounding "
    "(operators/series.py:ewma_last)",
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import ewma_last

    ev = load_table(spark, "events", sf_dir)
    return ewma_last(
        ev, "user_id", ["ts", "event_id"], "value", alpha=_EWMA_ALPHA
    )


@query(
    "acf_event_type_daily",
    oracle=f"""
WITH leads AS (
  SELECT event_type, revenue AS x,
         lead(revenue, 1) OVER (PARTITION BY event_type
                                ORDER BY y, m, d) AS y1,
         lead(revenue, 2) OVER (PARTITION BY event_type
                                ORDER BY y, m, d) AS y2,
         lead(revenue, 3) OVER (PARTITION BY event_type
                                ORDER BY y, m, d) AS y3
  FROM ({_DAILY})
),
pairs AS (
  SELECT event_type, 1 AS lag, x, y1 AS yy FROM leads WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2 AS lag, x, y2 AS yy FROM leads WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3 AS lag, x, y3 AS yy FROM leads WHERE y3 IS NOT NULL
)
SELECT event_type, lag,
       count(*) AS n_pairs,
       round(corr(x, yy), 6) AS acf
FROM pairs GROUP BY 1, 2
""",
    description="sample autocorrelation at lags 1-3 of each event "
    "type's daily revenue series (persistence diagnostic before "
    "trusting a trend slope) — the ACF runs on the per-day AGGREGATED "
    "series, all leads produced in one per-key window pass then "
    "unpivoted in-partition (operators/series.py:acf_lags)",
)
def acf_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import acf_lags

    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    return acf_lags(daily, "event_type", ["y", "m", "d"], "revenue", max_lag=3)


@query(
    "interarrival_burstiness",
    oracle="""
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id))
           / CAST(1000000 AS DOUBLE) AS gap_s
  FROM events
)
SELECT user_id,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       round(avg(gap_s), 4) AS mean_gap_s,
       round(stddev_samp(gap_s) / avg(gap_s), 6) AS cv,
       round((stddev_samp(gap_s) - avg(gap_s))
             / (stddev_samp(gap_s) + avg(gap_s)), 6) AS burstiness
FROM g
WHERE gap_s IS NOT NULL
GROUP BY user_id
HAVING count(gap_s) >= 2
""",
    description="per-user inter-arrival burstiness (Goh-Barabasi "
    "B = (sigma - mu)/(sigma + mu), plus the coefficient of variation): "
    "B ~ 0 is Poisson traffic, B -> 1 is bursty, B -> -1 is periodic — "
    "the bot/automation screen over the event stream; one per-user "
    "sort for the lag gaps, exact integer microsecond diffs scaled to "
    "seconds, then a map-combined aggregate",
)
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "user_id",
        ((us - F.lag(us).over(w)) / F.lit(1000000.0)).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    sd = F.stddev_samp("gap_s")
    mu = F.avg("gap_s")
    return (
        g.groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(mu, 4).alias("mean_gap_s"),
            F.round(sd / mu, 6).alias("cv"),
            F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
        )
        .where(F.col("n_gaps") >= 2)
    )


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )


_MK_IDX = f"""
SELECT event_type, revenue AS x,
       row_number() OVER (PARTITION BY event_type ORDER BY y, m, d) AS i
FROM ({_DAILY})
"""


@query(
    "mann_kendall_trend",
    oracle=f"""
WITH idx AS ({_MK_IDX}),
p AS (
  SELECT a.event_type, sign(b.x - a.x) AS sg
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND a.i < b.i
),
s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat
      FROM p GROUP BY 1),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
      FROM idx GROUP BY 1),
t AS (
  SELECT event_type,
         CAST(sum(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie_sum
  FROM (SELECT event_type, x, count(*) AS tt FROM idx GROUP BY 1, 2)
  GROUP BY 1
)
SELECT n.event_type, n.n_points, s.s_stat,
       round(CASE
         WHEN s.s_stat > 0 THEN (s.s_stat - 1)
           / sqrt((n_points * (n_points - 1) * (2 * n_points + 5)
                   - tie_sum) / CAST(18 AS DOUBLE))
         WHEN s.s_stat < 0 THEN (s.s_stat + 1)
           / sqrt((n_points * (n_points - 1) * (2 * n_points + 5)
                   - tie_sum) / CAST(18 AS DOUBLE))
         ELSE CAST(0 AS DOUBLE)
       END, 6) AS z_stat
FROM n JOIN t USING (event_type) JOIN s USING (event_type)
""",
    description="Mann-Kendall nonparametric trend test per event type "
    "over the daily revenue series: S = sum of pairwise signs with "
    "tie-corrected variance and continuity-corrected z — monotone-trend "
    "detection without OLS assumptions; the pair join is per-series "
    "O(days^2), bounded by the calendar, parallel across series, and "
    "everything up to z is exact integer arithmetic "
    "(operators/series.py:mann_kendall)",
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import mann_kendall

    daily = _daily_revenue(spark, sf_dir)
    return mann_kendall(daily, "event_type", ["y", "m", "d"], "revenue")


@query(
    "theil_sen_trend",
    oracle=f"""
WITH idx AS ({_MK_IDX}),
sl AS (
  SELECT a.event_type,
         (b.x - a.x) / CAST(b.i - a.i AS DOUBLE) AS slope
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND a.i < b.i
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(slope), 6) AS sen_slope
FROM sl GROUP BY event_type
""",
    description="Theil-Sen robust slope per event type: median of all "
    "pairwise daily-revenue slopes (29.3% breakdown — one wild day "
    "cannot move it, unlike the OLS events_trend_slope it pairs with); "
    "identical IEEE pair divisions in both engines, exact median "
    "(operators/series.py:theil_sen_slope)",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.series import theil_sen_slope

    daily = _daily_revenue(spark, sf_dir)
    return theil_sen_slope(daily, "event_type", ["y", "m", "d"], "revenue")


# epoch-day arithmetic (integer) instead of engine dayofweek(): Spark
# numbers Sunday=1..7, DuckDB Sunday=0..6 — epoch_day % 7 is the same
# integer everywhere
_EPOCH_DAILY = """
SELECT event_type,
       epoch_us(ts) // 86400000000 AS eday,
       round(sum(value), 2) AS revenue
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
"""


@query(
    "forecast_seasonal_naive_mape",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
mx AS (SELECT max(eday) AS mxd FROM d),
train AS (
  SELECT event_type, eday % 7 AS wd, revenue
  FROM d CROSS JOIN mx WHERE eday < mxd - 6
),
fc AS (
  SELECT event_type, wd, round(avg(revenue), 4) AS fc_rev
  FROM train GROUP BY 1, 2
),
test AS (
  SELECT event_type, eday % 7 AS wd, revenue
  FROM d CROSS JOIN mx WHERE eday >= mxd - 6
)
SELECT t.event_type,
       CAST(count(*) AS BIGINT) AS n_test_days,
       round(avg(abs(t.revenue - f.fc_rev) / t.revenue), 6) AS mape
FROM test t JOIN fc f ON t.event_type = f.event_type AND t.wd = f.wd
GROUP BY t.event_type
""",
    description="seasonal-naive forecast backtest: hold out the final "
    "week of the daily revenue series, forecast each test day with its "
    "weekday's train mean, report per-type MAPE — the eval-harness "
    "shape every production forecaster is judged by before anything "
    "fancier ships; weekday from integer epoch-day % 7 (Spark and "
    "DuckDB number dayofweek() differently — integer arithmetic is "
    "engine-identical), forecasts rounded 4 dp before scoring",
)
def forecast_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    mx = d.agg(F.max("eday").alias("__mxd"))
    dd = d.join(F.broadcast(mx)).withColumn("wd", F.col("eday") % 7)
    train = dd.where(F.col("eday") < F.col("__mxd") - 6)
    fc = train.groupBy("event_type", "wd").agg(
        F.round(F.avg("revenue"), 4).alias("__fc")
    )
    test = dd.where(F.col("eday") >= F.col("__mxd") - 6)
    return (
        test.join(fc, ["event_type", "wd"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test_days"),
            F.round(
                F.avg(
                    F.abs(F.col("revenue") - F.col("__fc"))
                    / F.col("revenue")
                ),
                6,
            ).alias("mape"),
        )
    )


@query(
    "events_dow_seasonality",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
wd AS (
  SELECT event_type, eday % 7 AS dow, round(avg(revenue), 4) AS dow_avg
  FROM d GROUP BY 1, 2
),
o AS (SELECT event_type, round(avg(revenue), 4) AS overall_avg
      FROM d GROUP BY 1)
SELECT wd.event_type, CAST(wd.dow AS INTEGER) AS dow,
       wd.dow_avg, o.overall_avg,
       round(wd.dow_avg / o.overall_avg, 6) AS seasonality_index
FROM wd JOIN o USING (event_type)
""",
    description="day-of-week seasonality index per event type (weekday "
    "mean daily revenue over the overall mean; 1 = flat) — the "
    "decomposition readout behind forecast_seasonal_naive_mape's "
    "forecaster; weekday from integer epoch-day % 7 (engine-identical), "
    "averages rounded 4 dp before the ratio",
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    wd = d.groupBy(
        "event_type", (F.col("eday") % 7).cast("int").alias("dow")
    ).agg(F.round(F.avg("revenue"), 4).alias("dow_avg"))
    o = d.groupBy("event_type").agg(
        F.round(F.avg("revenue"), 4).alias("overall_avg")
    )
    return wd.join(F.broadcast(o), "event_type").select(
        "event_type",
        "dow",
        "dow_avg",
        "overall_avg",
        F.round(F.col("dow_avg") / F.col("overall_avg"), 6).alias(
            "seasonality_index"
        ),
    )


@query(
    "forecast_conformal_intervals",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
r0 AS (
  SELECT event_type, eday, revenue,
         lag(revenue, 7) OVER (PARTITION BY event_type
                               ORDER BY eday) AS fc
  FROM d
),
resid AS (SELECT event_type, eday, abs(revenue - fc) AS r
          FROM r0 WHERE fc IS NOT NULL),
b AS (SELECT event_type, min(eday) AS lo, max(eday) AS hi
      FROM resid GROUP BY 1),
tg AS (
  SELECT resid.event_type, r,
         eday <= lo + (hi - lo) * 2 / 3 AS is_cal
  FROM resid JOIN b USING (event_type)
),
cal AS (SELECT event_type, r FROM tg WHERE is_cal),
nc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
       FROM cal GROUP BY 1),
rk AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type ORDER BY r) AS rkn
  FROM cal
),
qh AS (
  SELECT rk.event_type, min(r) AS qhat
  FROM rk JOIN nc USING (event_type)
  WHERE rkn >= ceil(0.9 * (n_cal + 1))
  GROUP BY 1
),
tst AS (
  -- LEFT join + infinite fallback: a calibration slice too small for
  -- the order statistic reports qhat = +inf (split-conformal
  -- convention), never a dropped key
  SELECT tg.event_type,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN r <= COALESCE(qhat, CAST('infinity' AS DOUBLE))
                  THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         round(min(COALESCE(qhat, CAST('infinity' AS DOUBLE))), 4) AS qhat
  FROM tg LEFT JOIN qh USING (event_type) WHERE NOT is_cal
  GROUP BY 1
)
SELECT tst.event_type, n_cal, n_test, qhat,
       round(CAST(hits AS DOUBLE) / n_test, 6) AS coverage,
       CAST(0.9 AS DOUBLE) AS target_coverage
FROM tst JOIN nc USING (event_type)
""",
    description="split-conformal prediction intervals for the "
    "seasonal-naive daily-revenue forecaster (Lei et al. 2018): "
    "absolute lag-7 residuals per event type, the finite-sample-valid "
    "ceil(0.9*(n+1))-th order-statistic half-width calibrated on the "
    "first two-thirds of steps, empirical coverage reported on the "
    "held-out remainder — the distribution-free uncertainty wrapper a "
    "production forecaster ships with; residuals are differences of "
    "2-dp-rounded aggregates, the order statistic is tie-invariant, "
    "coverage is a ratio of exact integer counts; everything runs per "
    "key over the O(days) aggregated series "
    "(operators/series.py:conformal_backtest)",
)
def forecast_conformal_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.series import conformal_backtest

    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    return conformal_backtest(
        d, "event_type", "eday", "revenue", period=7, alpha=0.1
    )


@query(
    "orders_open_backlog_daily",
    oracle="""
WITH o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS open_day
  FROM orders
),
c AS (
  SELECT l_orderkey AS o_orderkey,
         max(epoch_us(l_shipdate) // 86400000000) AS close_day
  FROM lineitem GROUP BY 1
),
span AS (SELECT o.o_orderkey, open_day, c.close_day
         FROM o JOIN c USING (o_orderkey)),
ev AS (
  SELECT open_day AS eday, 1 AS opened, 0 AS closed FROM span
  UNION ALL
  SELECT close_day, 0, 1 FROM span
),
daily AS (
  SELECT eday, CAST(sum(opened) AS BIGINT) AS n_opened,
         CAST(sum(closed) AS BIGINT) AS n_closed
  FROM ev GROUP BY 1
)
SELECT eday, n_opened, n_closed,
       CAST(sum(n_opened - n_closed) OVER (ORDER BY eday
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM daily
""",
    description="daily open-order backlog: an order opens at its order "
    "date and closes when its LAST line item ships; +1/-1 boundary "
    "events collapse the fact tables to O(days) rows BEFORE the "
    "running-sum window (the event-boundary identity — never a "
    "day x open-orders interval join), the cumulative walk runs over "
    "the bounded day domain; the WIP/lead-time monitor every "
    "fulfillment dashboard ships, exact integer counts throughout; "
    "orders with no line items (nothing ever shipped) are out of "
    "scope by the inner join",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = orders.select(
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias(
            "open_day"
        ),
    )
    c = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max(
            F.expr("unix_micros(l_shipdate) div 86400000000")
        ).alias("close_day")
    )
    span = o.join(c, "o_orderkey")
    ev = span.select(
        F.col("open_day").alias("eday"),
        F.lit(1).alias("opened"),
        F.lit(0).alias("closed"),
    ).unionAll(
        span.select(
            F.col("close_day").alias("eday"),
            F.lit(0).alias("opened"),
            F.lit(1).alias("closed"),
        )
    )
    daily = ev.groupBy("eday").agg(
        F.sum("opened").alias("n_opened"),
        F.sum("closed").alias("n_closed"),
    )
    w = Window.orderBy("eday").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "eday",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w).alias(
            "backlog"
        ),
    )


@query(
    "orders_fulfillment_sla",
    oracle="""
WITH span AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(epoch_us(max(l.l_shipdate)) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
           AS days_to_ship
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, epoch_us(o.o_orderdate) // 86400000000
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN days_to_ship <= 30 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_30d,
       round(CAST(sum(CASE WHEN days_to_ship <= 30 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS sla_30d_rate,
       round(avg(CAST(days_to_ship AS DOUBLE)), 6) AS avg_days_to_ship
FROM span GROUP BY 1
""",
    description="fulfillment SLA by order priority: days from order "
    "date to the LAST line-item ship date per order (the honest "
    "completion metric — first-ship flatters), 30-day SLA attainment "
    "rate and mean lead time — the operations scorecard over the same "
    "order-completion spans as orders_open_backlog_daily; one "
    "map-combined per-order collapse then one per-priority rollup, "
    "exact integer day arithmetic",
)
def orders_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    span = (
        orders.join(
            li, li["l_orderkey"] == orders["o_orderkey"]
        )
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.expr("unix_micros(o_orderdate) div 86400000000").alias(
                "__oday"
            ),
        )
        .agg(
            (
                F.max(
                    F.expr("unix_micros(l_shipdate) div 86400000000")
                )
                - F.col("__oday")
            ).alias("days_to_ship")
        )
    )
    within = (F.col("days_to_ship") <= 30).cast("long")
    return span.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(within).alias("n_within_30d"),
        F.round(
            F.sum(within).cast("double") / F.count(F.lit(1)), 6
        ).alias("sla_30d_rate"),
        F.round(F.avg(F.col("days_to_ship").cast("double")), 6).alias(
            "avg_days_to_ship"
        ),
    )


@query(
    "events_runs_test",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
s AS (
  SELECT event_type, eday,
         revenue - lag(revenue) OVER (PARTITION BY event_type
                                      ORDER BY eday) AS diff
  FROM d
),
sg AS (
  SELECT event_type, eday,
         CASE WHEN diff > 0 THEN 1 ELSE -1 END AS sgn
  FROM s WHERE diff IS NOT NULL AND diff <> 0
),
ch AS (
  SELECT event_type, sgn,
         CASE WHEN sgn <> lag(sgn) OVER (PARTITION BY event_type
                                         ORDER BY eday)
              THEN 1 ELSE 0 END AS chg
  FROM sg
),
agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down,
         CAST(1 + sum(chg) AS BIGINT) AS n_runs
  FROM ch GROUP BY 1
),
st AS (
  SELECT event_type, n_up, n_down, n_runs,
         2.0 * n_up * n_down / (n_up + n_down) + 1 AS mu,
         2.0 * n_up * n_down
           * (2.0 * n_up * n_down - n_up - n_down)
           / (CAST(n_up + n_down AS DOUBLE) * (n_up + n_down)
              * (n_up + n_down - 1)) AS v
  FROM agg WHERE n_up > 0 AND n_down > 0
)
SELECT event_type, n_up, n_down, n_runs,
       round(mu, 6) AS expected_runs,
       round((n_runs - mu) / sqrt(v), 6) AS z_score
FROM st
""",
    description="Wald-Wolfowitz runs test on the daily revenue "
    "direction per event type: are up/down days random, trending "
    "(too few runs, z << 0), or oscillating (too many, z >> 0)? The "
    "randomness screen behind trusting any seasonal/trend model; runs "
    "counted with one lag window over the O(days) sign series, the "
    "statistic from four exact integer counts via the closed-form "
    "mean/variance — nothing to simulate",
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = Window.partitionBy("event_type").orderBy("eday")
    s = d.select(
        "event_type",
        "eday",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("__diff"),
    )
    sg = s.where(
        F.col("__diff").isNotNull() & (F.col("__diff") != 0)
    ).select(
        "event_type",
        "eday",
        F.when(F.col("__diff") > 0, 1).otherwise(-1).alias("__sgn"),
    )
    ch = sg.select(
        "event_type",
        "__sgn",
        F.when(
            F.col("__sgn") != F.lag("__sgn").over(w), 1
        ).otherwise(0).alias("__chg"),
    )
    agg = ch.groupBy("event_type").agg(
        F.sum((F.col("__sgn") == 1).cast("long")).alias("n_up"),
        F.sum((F.col("__sgn") == -1).cast("long")).alias("n_down"),
        (F.lit(1) + F.sum("__chg")).alias("n_runs"),
    )
    n1, n2 = F.col("n_up"), F.col("n_down")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + 1
    v = (
        F.lit(2.0) * n1 * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.where((n1 > 0) & (n2 > 0)).select(
        "event_type",
        "n_up",
        "n_down",
        "n_runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round((F.col("n_runs") - mu) / F.sqrt(v), 6).alias("z_score"),
    )


@query(
    "events_ccf_leadlag",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         a.revenue AS ra, b.revenue AS rb
  FROM d a
  CROSS JOIN lags l
  JOIN d b ON b.event_type > a.event_type AND b.eday = a.eday + l.lag
)
SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(ra, rb), 6) AS ccf
FROM pairs GROUP BY 1, 2, 3
""",
    description="lead-lag cross-correlation between event types' daily "
    "revenue series (lags -3..+3): does one stream's movement predict "
    "another's days later — the cause-or-coincidence screen behind any "
    "cross-series claim; the fact table collapses to O(days x types) "
    "once, the lag join is an integer-day equi-join (never a window "
    "over raw events), one corr aggregate per (pair, lag)",
)
def events_ccf_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    lags = F.broadcast(
        ev.sparkSession.range(-3, 4).select(F.col("id").alias("lag"))
    )
    a = d.select(
        F.col("event_type").alias("type_a"),
        "eday",
        F.col("revenue").alias("ra"),
    )
    b = d.select(
        F.col("event_type").alias("type_b"),
        F.col("eday").alias("__bd"),
        F.col("revenue").alias("rb"),
    )
    pairs = (
        a.crossJoin(lags)
        .join(
            b,
            (F.col("type_b") > F.col("type_a"))
            & (F.col("__bd") == F.col("eday") + F.col("lag")),
        )
    )
    return pairs.groupBy("type_a", "type_b", F.col("lag").cast("int").alias("lag")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("ra", "rb"), 6).alias("ccf"),
    )


@query(
    "events_daily_peaks",
    oracle=f"""
WITH d AS ({_EPOCH_DAILY}),
n AS (
  SELECT event_type, eday, revenue,
         lag(revenue) OVER (PARTITION BY event_type ORDER BY eday)
           AS prv,
         lead(revenue) OVER (PARTITION BY event_type ORDER BY eday)
           AS nxt
  FROM d
)
SELECT event_type, eday, revenue
FROM n
WHERE prv IS NOT NULL AND nxt IS NOT NULL
  AND revenue > prv AND revenue > nxt
""",
    description="local-maximum peak detection over the daily revenue "
    "series per event type (strictly above both neighbors; boundary "
    "days excluded): the spike-inventory a monitoring pipeline feeds "
    "into anomaly triage — comparisons are between exact 2-dp-rounded "
    "aggregates, so membership is engine-exact (no threshold-times-"
    "average boundary to sit on); one lag/lead window over the O(days) "
    "aggregate",
)
def events_daily_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = Window.partitionBy("event_type").orderBy("eday")
    n = d.select(
        "event_type",
        "eday",
        "revenue",
        F.lag("revenue").over(w).alias("__prv"),
        F.lead("revenue").over(w).alias("__nxt"),
    )
    return n.where(
        F.col("__prv").isNotNull()
        & F.col("__nxt").isNotNull()
        & (F.col("revenue") > F.col("__prv"))
        & (F.col("revenue") > F.col("__nxt"))
    ).select("event_type", "eday", "revenue")


@query(
    "events_gaps_islands",
    oracle="""
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS eday FROM events),
r AS (
  SELECT user_id, eday,
         row_number() OVER (PARTITION BY user_id ORDER BY eday) AS rn
  FROM d
),
s AS (SELECT user_id, eday - rn AS island,
             CAST(count(*) AS BIGINT) AS len
      FROM r GROUP BY 1, 2)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM s GROUP BY 1
ORDER BY longest_streak DESC, user_id
LIMIT 20
""",
    description="gaps-and-islands streak mining: per user, consecutive "
    "active-day runs via the classic rank-difference island key "
    "(eday - row_number is constant exactly on a consecutive run), "
    "then per-user streak stats and the top-20 longest streaks — the "
    "engagement/retention workhorse every activity warehouse ships; "
    "both windows are partitioned by the HIGH-cardinality user key "
    "(never a low-cardinality block sort), the dedup and both "
    "aggregations are map-combined, and the final cut is "
    "TakeOrderedAndProject, not a global sort",
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    days = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("eday")
    islands = days.withColumn(
        "island", F.col("eday") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
        .orderBy(F.desc("longest_streak"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "events_max_drawdown",
    oracle="""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS eday,
         round(sum(value), 2) AS revenue
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT event_type, eday, revenue,
         max(revenue) OVER (PARTITION BY event_type ORDER BY eday
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_peak
  FROM d
),
dd AS (
  SELECT event_type, eday, revenue, run_peak,
         round((run_peak - revenue) / run_peak, 6) AS drawdown,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY (run_peak - revenue) / run_peak DESC,
                                     eday) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM r
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       round(run_peak, 2) AS peak_revenue,
       round(revenue, 2) AS trough_revenue,
       eday AS trough_day, drawdown AS max_drawdown
FROM dd WHERE rk = 1
""",
    description="maximum drawdown of each event type's daily-revenue "
    "series: worst relative drop from the running peak, with the peak/"
    "trough values and the (earliest) trough day — the risk statistic "
    "monitoring and finance both use for 'how bad did it get'; one "
    "running-max window + one ranking window over the O(days x types) "
    "daily aggregate (the fact table collapses first, the raw corpus "
    "never enters a window), drawdowns are ratios of 2-dp-rounded "
    "aggregates so both engines rank identical doubles",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("eday")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = d.withColumn("run_peak", F.max("revenue").over(w_run))
    dd_raw = (F.col("run_peak") - F.col("revenue")) / F.col("run_peak")
    w_rank = Window.partitionBy("event_type").orderBy(
        dd_raw.desc(), F.asc("eday")
    )
    w_cnt = Window.partitionBy("event_type")
    return (
        r.withColumn("max_drawdown", F.round(dd_raw, 6))
        .withColumn("__rk", F.row_number().over(w_rank))
        .withColumn("n_days", F.count(F.lit(1)).over(w_cnt))
        .where(F.col("__rk") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.round("run_peak", 2).alias("peak_revenue"),
            F.round("revenue", 2).alias("trough_revenue"),
            F.col("eday").alias("trough_day"),
            "max_drawdown",
        )
    )


@query(
    "window_rolling_quantile_bands",
    oracle="""
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS eday,
         round(sum(value), 2) AS revenue
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, eday, revenue,
       round(quantile_cont(revenue, 0.1) OVER w, 6) AS p10,
       round(quantile_cont(revenue, 0.5) OVER w, 6) AS p50,
       round(quantile_cont(revenue, 0.9) OVER w, 6) AS p90
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY eday
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    description="rolling 7-day P10/P50/P90 envelope per event type's "
    "daily revenue — the robust monitoring band (a median band flags "
    "level shifts a rolling MEAN smears, and the P10/P90 envelope is "
    "the alert corridor); exact linearly-interpolated percentiles over "
    "a 7-row frame of the O(days x types) daily aggregate, verified "
    "bit-identical between Spark percentile() and DuckDB "
    "quantile_cont() on the same 2-dp inputs; one key-partitioned "
    "window, the corpus collapses before any sort",
)
def window_rolling_quantile_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("eday"),
        )
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("eday")
        .rowsBetween(-6, Window.currentRow)
    )
    return d.select(
        "event_type",
        "eday",
        "revenue",
        F.round(F.percentile("revenue", F.lit(0.1)).over(w), 6).alias("p10"),
        F.round(F.percentile("revenue", F.lit(0.5)).over(w), 6).alias("p50"),
        F.round(F.percentile("revenue", F.lit(0.9)).over(w), 6).alias("p90"),
    )


# --- Discrete-Fourier periodogram over daily event counts -------------
#
# Cross-engine trig is the determinism hazard (libm cos vs Java
# Math.cos can differ in the last ulp), so the DFT basis is fixed at
# import time as INTEGER micro-units: cu = round(cos(2*pi*r/p) * 1e6)
# for r in [0, p).  Day index t only enters through t % p, so the
# basis table is 54 rows for periods 2..10.  Both the Spark plan and
# the DuckDB oracle consume the SAME integers, and every accumulation
# below is exact integer arithmetic (see the query docstring), so the
# two engines agree bit-for-bit before the single final division.
_PGRAM_PERIODS = range(2, 11)


def _pgram_basis() -> list[tuple[int, int, int, int]]:
    import math

    rows = []
    for p in _PGRAM_PERIODS:
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append(
                (p, r, round(math.cos(ang) * 1e6), round(math.sin(ang) * 1e6))
            )
    return rows


_PGRAM_ROWS = _pgram_basis()
_PGRAM_VALUES = ",\n       ".join(
    f"({p}, {r}, {cu}, {su})" for p, r, cu, su in _PGRAM_ROWS
)

_PGRAM_SQL = f"""
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS eday,
         count(*) AS v
  FROM events GROUP BY 1, 2
),
m AS (SELECT min(eday) AS d0 FROM d),
s AS (
  SELECT event_type, eday - m.d0 AS t, v,
         count(*) OVER (PARTITION BY event_type) AS n_days,
         sum(v) OVER (PARTITION BY event_type) AS sv
  FROM d CROSS JOIN m
),
basis(p, r, cu, su) AS (
  VALUES {_PGRAM_VALUES}
),
-- w = n*v - sum(v): integer centering (n * (v - mean)), exact
proj AS (
  SELECT s.event_type, b.p,
         sum((s.n_days * s.v - s.sv) * b.cu) AS pc,
         sum((s.n_days * s.v - s.sv) * b.su) AS ps
  FROM s JOIN basis b ON (s.t % b.p) = b.r
  GROUP BY 1, 2
),
pw AS (
  SELECT event_type, p,
         CAST(pc AS DECIMAL(20, 0)) * CAST(pc AS DECIMAL(20, 0))
         + CAST(ps AS DECIMAL(20, 0)) * CAST(ps AS DECIMAL(20, 0)) AS power
  FROM proj
),
tot AS (SELECT event_type, sum(power) AS total FROM pw GROUP BY 1)
SELECT pw.event_type,
       CAST(pw.p AS INTEGER) AS period,
       round(CAST(pw.power AS DOUBLE) / CAST(tot.total AS DOUBLE), 6)
         AS power_share,
       CAST(row_number() OVER (PARTITION BY pw.event_type
                               ORDER BY pw.power DESC, pw.p) AS INTEGER)
         AS power_rank
FROM pw JOIN tot USING (event_type)
"""


@query(
    "events_periodogram",
    oracle=_PGRAM_SQL,
    description="discrete-Fourier periodogram of daily event counts at "
    "candidate periods 2..10 days — which cycle dominates each event "
    "type's arrival process, the spectral readout behind capacity "
    "planning and the dow-seasonality entries; the cos/sin basis is "
    "pinned as integer micro-units at import time (no cross-engine "
    "libm trig), centering is the exact-integer w = n*v - sum(v), and "
    "projections/powers stay exact (LONG sums, DECIMAL squares) so "
    "both engines divide the same integers for the 6-dp share",
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    ).agg(F.count(F.lit(1)).alias("v"))
    d0 = d.agg(F.min("eday").alias("d0"))
    wt = Window.partitionBy("event_type")
    s = (
        d.join(F.broadcast(d0))
        .select(
            "event_type",
            (F.col("eday") - F.col("d0")).alias("t"),
            "v",
            F.count(F.lit(1)).over(wt).alias("n_days"),
            F.sum("v").over(wt).alias("sv"),
        )
    )
    basis = spark.createDataFrame(
        _PGRAM_ROWS, schema="p INT, r INT, cu LONG, su LONG"
    )
    w_expr = F.col("n_days") * F.col("v") - F.col("sv")
    proj = (
        s.join(F.broadcast(basis), (F.col("t") % F.col("p")) == F.col("r"))
        .groupBy("event_type", "p")
        .agg(
            F.sum(w_expr * F.col("cu")).alias("pc"),
            F.sum(w_expr * F.col("su")).alias("ps"),
        )
    )
    dec = "decimal(20,0)"
    pw = proj.select(
        "event_type",
        "p",
        (
            F.col("pc").cast(dec) * F.col("pc").cast(dec)
            + F.col("ps").cast(dec) * F.col("ps").cast(dec)
        ).alias("power"),
    )
    tot = pw.groupBy("event_type").agg(F.sum("power").alias("total"))
    wr = Window.partitionBy("event_type").orderBy(F.desc("power"), F.asc("p"))
    # the raw 20-digit power is NOT emitted: DECIMAL(38)->DOUBLE casts
    # disagree at the last ulp between engines at sf0.1 magnitudes; the
    # 6-dp share of an exact-integer ratio is the stable readout
    return pw.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("p").cast("int").alias("period"),
        F.round(
            F.col("power").cast("double") / F.col("total").cast("double"), 6
        ).alias("power_share"),
        F.row_number().over(wr).cast("int").alias("power_rank"),
    )


_SEASONAL_SQL = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS eday,
         count(*) AS v
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, eday, v,
         sum(v) OVER (PARTITION BY event_type ORDER BY eday
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
         count(*) OVER (PARTITION BY event_type ORDER BY eday
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM d
),
-- detrended in exact sevenths: dt = 7*v - sum7 = 7 * (v - trend)
det AS (
  SELECT event_type, eday % 7 AS dow, 7 * v - sum7 AS dt
  FROM ma WHERE n7 = 7
)
SELECT event_type,
       CAST(dow AS INTEGER) AS dow,
       CAST(count(*) AS INTEGER) AS n_days,
       round(sum(dt) / (7.0 * count(*)), 6) AS seasonal_effect
FROM det
GROUP BY 1, 2
"""


@query(
    "events_seasonal_decompose",
    oracle=_SEASONAL_SQL,
    description="additive trend/seasonal decomposition of daily event "
    "counts (STL-lite): trend is the centered 7-day moving average, "
    "the day-of-week seasonal effect is the mean of the detrended "
    "series per dow — how many extra events a weekday contributes "
    "after removing the trend, the additive complement to "
    "events_dow_seasonality's ratio index; detrending is kept in "
    "exact integer sevenths (dt = 7*v - sum7) so both engines reach "
    "the 6-dp effect through one identical final division",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    ).agg(F.count(F.lit(1)).alias("v"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("eday")
        .rowsBetween(-3, 3)
    )
    ma = d.select(
        "event_type",
        "eday",
        "v",
        F.sum("v").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
    )
    det = ma.where(F.col("n7") == 7).select(
        "event_type",
        (F.col("eday") % 7).cast("int").alias("dow"),
        (F.lit(7) * F.col("v") - F.col("sum7")).alias("dt"),
    )
    return det.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("int").alias("n_days"),
        F.round(
            F.sum("dt") / (F.lit(7.0) * F.count(F.lit(1))), 6
        ).alias("seasonal_effect"),
    ).select("event_type", "dow", "n_days", "seasonal_effect")


_ATTR_LOOKBACK_US = 24 * 3600 * 1000000

_ATTR_SQL = f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS t_id, user_id, event_type AS channel, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.p_id, t.channel, t.t_us, t.t_id,
         count(*) OVER (PARTITION BY p.p_id) AS n,
         row_number() OVER (PARTITION BY p.p_id
                            ORDER BY t.t_us, t.t_id) AS rn
  FROM p JOIN t ON p.user_id = t.user_id
              AND t.t_us < p.p_us
              AND t.t_us >= p.p_us - {_ATTR_LOOKBACK_US}
),
c AS (
  SELECT p_id, channel,
         CASE
           WHEN n = 1 THEN 1000000
           WHEN n = 2 THEN 500000
           WHEN rn = 1 OR rn = n THEN 400000
           ELSE 200000 // (n - 2)
                + CASE WHEN rn - 1 <= 200000 % (n - 2) THEN 1 ELSE 0 END
         END AS credit_micro
  FROM j
)
SELECT channel,
       CAST(count(DISTINCT p_id) AS INTEGER) AS n_purchases,
       CAST(count(*) AS INTEGER) AS n_touches,
       round(CAST(sum(credit_micro) AS BIGINT) / 1000000.0, 6)
         AS attributed_credit
FROM c GROUP BY 1
"""


@query(
    "attribution_position_based",
    oracle=_ATTR_SQL,
    description="position-based (U-shaped) multi-touch attribution: "
    "every purchase distributes one unit of credit over the view/click "
    "touches in its 24 h lookback — 40% to the first touch, 40% to the "
    "last, 20% split across the middle — the marketing-mix readout "
    "last-touch attribution (stream_click_attribution) systematically "
    "biases toward bottom-funnel channels; credits are EXACT integer "
    "micro-units (the 20% middle share is floor-divided with the "
    "remainder assigned to the earliest middles, so every purchase "
    "sums to exactly 1e6) and the engines agree bit-for-bit before "
    "one final division; the touch join is an equi-join on the "
    "high-cardinality user id with the lookback as a residual "
    "predicate, so pair volume is bounded by touches-per-24h, not "
    "touches-per-user",
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    us = F.expr("unix_micros(ts)")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        us.alias("p_us"),
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        us.alias("t_us"),
    )
    j = p.join(
        t,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _ATTR_LOOKBACK_US),
    )
    wp = Window.partitionBy("p_id")
    j = j.select(
        "p_id",
        "channel",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number()
        .over(wp.orderBy("t_us", "t_id"))
        .alias("rn"),
    )
    n, rn = F.col("n"), F.col("rn")
    credit = (
        F.when(n == 1, F.lit(1000000))
        .when(n == 2, F.lit(500000))
        .when((rn == 1) | (rn == n), F.lit(400000))
        .otherwise(
            F.expr("div(200000, n - 2)")
            + F.when(rn - 1 <= F.expr("200000 % (n - 2)"), 1).otherwise(0)
        )
    )
    return (
        j.select("p_id", "channel", credit.alias("credit_micro"))
        .groupBy("channel")
        .agg(
            F.count_distinct(F.col("p_id")).cast("int").alias("n_purchases"),
            F.count(F.lit(1)).cast("int").alias("n_touches"),
            F.round(F.sum("credit_micro") / 1000000.0, 6).alias(
                "attributed_credit"
            ),
        )
    )


_HAAR_SQL = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS eday,
         count(*) AS v
  FROM events GROUP BY 1, 2
),
m AS (SELECT min(eday) AS d0 FROM d),
s AS (SELECT event_type, eday - m.d0 AS t, v FROM d CROSS JOIN m),
-- level 1: adjacent-pair difference/sum (complete pairs only)
p1 AS (
  SELECT event_type, t // 2 AS j,
         sum(CASE WHEN t % 2 = 0 THEN v ELSE -v END) AS d1,
         sum(v) AS a1
  FROM s GROUP BY 1, 2 HAVING count(*) = 2
),
-- level 2: pair the level-1 smooths
p2 AS (
  SELECT event_type, j // 2 AS j2,
         sum(CASE WHEN j % 2 = 0 THEN a1 ELSE -a1 END) AS d2
  FROM p1 GROUP BY 1, 2 HAVING count(*) = 2
),
-- orthonormal detail energies in exact QUARTER units:
-- E1 = sum(d1^2)/2 = 2*sum(d1^2)/4;  E2 = sum(d2^2)/4
e1 AS (SELECT event_type, CAST(count(*) AS INTEGER) AS n_coefs,
              CAST(max(abs(d1)) AS BIGINT) AS max_abs_coef,
              CAST(2 * sum(d1 * d1) AS BIGINT) AS energy_q
       FROM p1 GROUP BY 1),
e2 AS (SELECT event_type, CAST(count(*) AS INTEGER) AS n_coefs,
              CAST(max(abs(d2)) AS BIGINT) AS max_abs_coef,
              CAST(sum(d2 * d2) AS BIGINT) AS energy_q
       FROM p2 GROUP BY 1),
u AS (
  SELECT event_type, 1 AS level, n_coefs, max_abs_coef, energy_q FROM e1
  UNION ALL
  SELECT event_type, 2 AS level, n_coefs, max_abs_coef, energy_q FROM e2
),
tot AS (SELECT event_type, sum(energy_q) AS tq FROM u GROUP BY 1)
SELECT u.event_type, CAST(u.level AS INTEGER) AS level, u.n_coefs,
       u.max_abs_coef, u.energy_q,
       round(u.energy_q / CAST(tot.tq AS DOUBLE), 6) AS energy_share
FROM u JOIN tot USING (event_type)
"""


@query(
    "events_haar_wavelet",
    oracle=_HAAR_SQL,
    description="two-level Haar wavelet detail energies of the daily "
    "event-count series: level-1 details are adjacent-day differences "
    "(day-to-day noise), level-2 details difference adjacent 2-day "
    "smooths (2-4 day swings) — the time-LOCALIZED complement to "
    "events_periodogram's global spectrum (a single burst day shows "
    "up as one big coefficient here but smears across every Fourier "
    "period); all coefficients and the orthonormal energies (kept in "
    "exact quarter-units: E1 = 2*sum(d1^2)/4, E2 = sum(d2^2)/4) are "
    "exact integers, group-by-pair aggregation with a count(*)=2 "
    "completeness guard, one final division for the 6-dp share",
)
def events_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    ).agg(F.count(F.lit(1)).alias("v"))
    d0 = d.agg(F.min("eday").alias("d0"))
    s = d.join(F.broadcast(d0)).select(
        "event_type", (F.col("eday") - F.col("d0")).alias("t"), "v"
    )
    signed1 = F.when(F.col("t") % 2 == 0, F.col("v")).otherwise(-F.col("v"))
    p1 = (
        s.groupBy("event_type", F.expr("t div 2").alias("j"))
        .agg(
            F.sum(signed1).alias("d1"),
            F.sum("v").alias("a1"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") == 2)
    )
    signed2 = F.when(F.col("j") % 2 == 0, F.col("a1")).otherwise(-F.col("a1"))
    p2 = (
        p1.groupBy("event_type", F.expr("j div 2").alias("j2"))
        .agg(F.sum(signed2).alias("d2"), F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == 2)
    )
    e1 = p1.groupBy("event_type").agg(
        F.lit(1).alias("level"),
        F.count(F.lit(1)).cast("int").alias("n_coefs"),
        F.max(F.abs(F.col("d1"))).cast("long").alias("max_abs_coef"),
        (F.lit(2) * F.sum(F.col("d1") * F.col("d1")))
        .cast("long")
        .alias("energy_q"),
    )
    e2 = p2.groupBy("event_type").agg(
        F.lit(2).alias("level"),
        F.count(F.lit(1)).cast("int").alias("n_coefs"),
        F.max(F.abs(F.col("d2"))).cast("long").alias("max_abs_coef"),
        F.sum(F.col("d2") * F.col("d2")).cast("long").alias("energy_q"),
    )
    u = e1.select(
        "event_type", "level", "n_coefs", "max_abs_coef", "energy_q"
    ).union(
        e2.select(
            "event_type", "level", "n_coefs", "max_abs_coef", "energy_q"
        )
    )
    tot = u.groupBy("event_type").agg(F.sum("energy_q").alias("tq"))
    return u.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("level").cast("int").alias("level"),
        "n_coefs",
        "max_abs_coef",
        "energy_q",
        F.round(F.col("energy_q") / F.col("tq").cast("double"), 6).alias(
            "energy_share"
        ),
    )


# Residual units: dt = 7v - sum7 is exact in sevenths; subtracting the
# dow mean needs /cnt_dow, so residuals are rescaled by L/cnt where L
# is the per-type LCM of the OBSERVED per-dow day-counts (derived at
# runtime — a pinned constant like lcm(1..10) silently breaks the
# common-unit property the moment any dow count exceeds the pin, see
# ADVICE r12), keeping EVERYTHING through the MAD comparison in exact
# integer 7*L-ths. For a contiguous daily series the seven counts take
# at most two consecutive values, so L <= cnt*(cnt+1).
_SEAS_ANOM_SQL = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS eday,
         count(*) AS v
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, eday, v,
         sum(v) OVER (PARTITION BY event_type ORDER BY eday
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
         count(*) OVER (PARTITION BY event_type ORDER BY eday
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM d
),
det AS (
  SELECT event_type, eday, eday % 7 AS dow, 7 * v - sum7 AS dt
  FROM ma WHERE n7 = 7
),
g AS (
  SELECT event_type, dow,
         sum(dt) AS sum_dt, count(*) AS cnt
  FROM det GROUP BY 1, 2
),
l AS (
  SELECT event_type,
         list_reduce(list(DISTINCT cnt), (a, b) -> lcm(a, b)) AS lcm_cnt
  FROM g GROUP BY 1
),
r AS (
  SELECT det.event_type, det.eday,
         (det.dt * g.cnt - g.sum_dt) * (l.lcm_cnt // g.cnt) AS e
  FROM det
  JOIN g ON det.event_type = g.event_type AND det.dow = g.dow
  JOIN l ON det.event_type = l.event_type
),
m AS (
  SELECT event_type, median(abs(e)) AS mad FROM r GROUP BY 1
)
SELECT r.event_type, CAST(r.eday AS BIGINT) AS eday,
       CAST(r.e AS BIGINT) AS residual_u,
       round(r.e / nullif(m.mad, 0), 4) AS mad_ratio
FROM r JOIN m USING (event_type)
WHERE abs(r.e) > 3 * m.mad
"""


@query(
    "events_seasonal_anomalies",
    oracle=_SEAS_ANOM_SQL,
    description="seasonal anomaly days: daily event counts detrended "
    "(centered 7-day MA) AND deseasonalized (dow effect removed), "
    "then flagged where the residual exceeds 3x the per-type median "
    "absolute deviation — the robust alert that survives both trend "
    "drift and weekly rhythm, which raw-count thresholds "
    "(events_volume_anomaly) and pure MAD screens "
    "(anomaly_mad_outliers) false-positive on; residuals stay EXACT "
    "integers (detrending in sevenths, dow-mean removal rescaled by "
    "L/cnt where L = the runtime per-type LCM of the observed per-dow "
    "day-counts, so every dow shares ONE unit at any series length) "
    "so the MAD and the 3x comparison are engine-identical, with one "
    "4-dp ratio division at the end; the per-type LCM is tiny model "
    "state (<= 7 counts/type, same class as Lloyd seeds) computed "
    "driver-side with math.lcm and broadcast back, mirrored by the "
    "oracle's list_reduce(list(DISTINCT cnt), lcm)",
)
def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = load_table(spark, "events", sf_dir)
    d = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    ).agg(F.count(F.lit(1)).alias("v"))
    w7 = (
        Window.partitionBy("event_type").orderBy("eday").rowsBetween(-3, 3)
    )
    det = (
        d.select(
            "event_type",
            "eday",
            "v",
            F.sum("v").over(w7).alias("sum7"),
            F.count(F.lit(1)).over(w7).alias("n7"),
        )
        .where(F.col("n7") == 7)
        .select(
            "event_type",
            "eday",
            (F.col("eday") % 7).alias("dow"),
            (F.lit(7) * F.col("v") - F.col("sum7")).alias("dt"),
        )
    )
    g = det.groupBy("event_type", "dow").agg(
        F.sum("dt").alias("sum_dt"),
        F.count(F.lit(1)).alias("cnt"),
        F.max(F.abs("dt")).alias("__mx"),
    )
    # Common-unit rescale denominator: per-type lcm of the <= 7
    # distinct per-dow day-counts. A contiguous daily series has at
    # most two consecutive count values, so lcm <= cnt*(cnt+1); the
    # guard below checks the FULL rescaled-residual bound
    # max|dt*cnt - sum_dt| * (lcm/cnt) < 2^63 (ADVICE r12) — the old
    # LCM-only 2^40 cutoff left the (dt*cnt - sum_dt) factor
    # unchecked — using exact arbitrary-precision Python ints on the
    # <= 7-rows/type collected aggregate (same model-state class as
    # Lloyd seeds).
    cnt_rows = g.select("event_type", "dow", "cnt", "sum_dt", "__mx").collect()
    by_type: dict = {}
    for row in cnt_rows:
        by_type.setdefault(row["event_type"], set()).add(row["cnt"])
    lcm_by_type = {
        t: math.lcm(*sorted(cnts)) for t, cnts in by_type.items()
    }
    for row in cnt_rows:
        lcm = lcm_by_type[row["event_type"]]
        bound = (row["__mx"] * row["cnt"] + abs(row["sum_dt"])) * (
            lcm // row["cnt"]
        )
        if bound >= 2**63:
            raise ValueError(
                "events_seasonal_anomalies: rescaled residual bound "
                f"{bound} for type {row['event_type']!r} dow "
                f"{row['dow']} exceeds int64 — the per-dow day-count "
                "LCM of this (pathologically gapped) series is too "
                "large for the exact-integer rescale"
            )
    lcm_df = spark.createDataFrame(
        [(t, lcm) for t, lcm in sorted(lcm_by_type.items())],
        "event_type string, lcm_cnt long",
    )
    r = (
        det.join(F.broadcast(g), ["event_type", "dow"])
        .join(F.broadcast(lcm_df), "event_type")
        .select(
            "event_type",
            "eday",
            (
                (F.col("dt") * F.col("cnt") - F.col("sum_dt"))
                * F.expr("div(lcm_cnt, cnt)")
            ).alias("e"),
        )
    )
    m = r.groupBy("event_type").agg(
        F.expr("percentile(abs(e), 0.5)").alias("mad")
    )
    return (
        r.join(F.broadcast(m), "event_type")
        .where(F.abs(F.col("e")) > 3 * F.col("mad"))
        .select(
            "event_type",
            F.col("eday").cast("long").alias("eday"),
            F.col("e").cast("long").alias("residual_u"),
            F.round(
                F.col("e") / F.nullif(F.col("mad"), F.lit(0.0)), 4
            ).alias("mad_ratio"),
        )
    )
