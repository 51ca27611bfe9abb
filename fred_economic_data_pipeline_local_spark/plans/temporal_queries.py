"""As-of / range / interval join queries (operators/temporal.py).

These are the custom temporal operators the reference lacks and Spark has
no built-in for; DuckDB's native ASOF JOIN / BETWEEN joins are the
oracles, so the composition-based implementations are value-checked, not
just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.temporal import (
    asof_join,
    interval_bucket_join,
    range_join_broadcast,
)
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "asof_clicks_to_purchases",
    oracle=f"""
SELECT c.event_id,
       c.user_id,
       strftime(c.ts, '{_TS_FMT_SQL}') AS click_ts,
       round(p.value, 6) AS purchase_value,
       strftime(p.ts, '{_TS_FMT_SQL}') AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    description="backward as-of join via union+window (no per-row probe)",
)
def asof_clicks_to_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BENCH_r08 delta (1.40x vs r7) A/B'd round 9: isolated min-of-5 at
    # sf0.1 is 0.40s, matching BENCH_r06's 0.23-0.4s envelope — the r7/r8
    # bench numbers were session-context (bench-prefix JVM state), zero
    # diff on this plan. No action taken.
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts"),
        F.round("value_right", 6).alias("purchase_value"),
        F.date_format("ts_right", _TS_FMT).alias("purchase_ts"),
    )


@query(
    "range_join_price_bands",
    oracle="""
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
FROM part
JOIN (VALUES ('b900', 900.0, 925.0), ('b925', 925.0, 950.0),
             ('b950', 950.0, 975.0), ('b975', 975.0, 1000.0)) AS t(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
    description="range join against a broadcast interval dimension",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    bands = spark.createDataFrame(
        [("b900", 900.0, 925.0), ("b925", 925.0, 950.0),
         ("b950", 950.0, 975.0), ("b975", 975.0, 1000.0)],
        "band string, lo double, hi double",
    )
    joined = range_join_broadcast(part, bands, "p_retailprice", "lo", "hi")
    return (
        joined.where(F.col("band").isNotNull())
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
    )


@query(
    "interval_join_shipments",
    oracle="""
SELECT o.o_orderkey, count(*) AS n_shipped_week1
FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
    description="interval join via bucket-explode equi-join (points-in-intervals)",
)
def interval_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderstatus") == "P")
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("start_ts"),
            (F.timestamp_micros(
                F.unix_micros("o_orderdate") + 7 * 86400 * 1_000_000
            )).alias("end_ts"),
        )
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_shipdate")
    # The aggregate only needs COUNTs, so collapse the point side to
    # (distinct ship timestamp, count) BEFORE the interval join — exact for
    # any data, and on date-grained timestamps it shrinks the join input
    # from |lineitem| to ~#distinct days (~250x here; measured 10.6s ->
    # 1.4s at sf0.1). The filtered+exploded order side is broadcast-sized,
    # so nothing large ever shuffles: scan -> partial agg -> map-side
    # bucket join -> final agg.
    pts = li.groupBy(F.col("l_shipdate").alias("ship_ts")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    joined = interval_bucket_join(
        pts, orders, "ship_ts", "start_ts", "end_ts", bucket_seconds=86400,
        broadcast_right=True,
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("__c").alias("n_shipped_week1")
    )


@query(
    "twap_user_values",
    oracle="""
WITH s AS (
  SELECT user_id AS k, epoch_us(ts) AS t, value AS v, event_id AS tb
  FROM events WHERE value IS NOT NULL
),
n AS (SELECT *, lead(t) OVER (PARTITION BY k ORDER BY t, tb) AS t_next
      FROM s),
a AS (
  SELECT k, count(*) AS n_obs,
         sum(CASE WHEN t_next IS NOT NULL
                  THEN v * (t_next - t) END) AS wsum,
         max(t) - min(t) AS span
  FROM n GROUP BY k
)
SELECT k AS user_id, n_obs, round(wsum / span, 6) AS twap
FROM a WHERE span > 0
""",
    description="time-weighted average per user (TWAP / step "
    "interpolation): each observation's value holds until the next, so "
    "the mean is duration-weighted — the correct summary for "
    "irregularly sampled series where a plain avg over-weights bursts; "
    "one key-partitioned lead window + a map-combined weighted sum on "
    "the same key, never a self-join",
)
def twap_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import time_weighted_avg

    ev = load_table(spark, "events", sf_dir)
    return time_weighted_avg(ev)


@query(
    "markov_event_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (SELECT event_type, next_type, count(*) AS n FROM s
      WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type, sum(n) AS row_n FROM t GROUP BY 1)
SELECT t.event_type, t.next_type, t.n,
       round(t.n / CAST(tot.row_n AS DOUBLE), 6) AS p
FROM t JOIN tot USING (event_type)
""",
    description="first-order Markov transition matrix over per-user "
    "event sequences: one key-partitioned lead window builds the "
    "bigrams, counts map-combine on the (from, to) pair, and the "
    "row-normalizer joins back as #types rows broadcast — the "
    "session-flow model behind next-action prediction and bot "
    "detection, never a self-join",
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    return t.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
    )


@query(
    "markov_conditional_entropy",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (SELECT event_type, next_type, count(*) AS n FROM s
      WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS row_n
        FROM t GROUP BY 1),
g AS (SELECT CAST(sum(n) AS BIGINT) AS grand FROM t)
SELECT t.event_type,
       tot.row_n AS n_transitions,
       round(-sum((t.n / CAST(tot.row_n AS DOUBLE))
                  * ln(t.n / CAST(tot.row_n AS DOUBLE))), 6) AS h_next,
       round(CAST(tot.row_n AS DOUBLE) / g.grand, 6) AS weight
FROM t JOIN tot USING (event_type) CROSS JOIN g
GROUP BY t.event_type, tot.row_n, g.grand
""",
    description="next-event predictability per state: conditional "
    "entropy H(next | current) of the first-order Markov transition "
    "rows, with each state's share of all transitions — low entropy = "
    "scripted/bot-like flows, high = organic browsing; derived "
    "entirely from the transition counts (exact integers), nats, one "
    "lead window + two map-combined aggregates",
)
def markov_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    g = t.agg(F.sum("n").alias("__grand"))
    p = F.col("n") / F.col("row_n").cast("double")
    return (
        t.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(g))
        .groupBy("event_type", "row_n", "__grand")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("h_next"))
        .select(
            "event_type",
            F.col("row_n").alias("n_transitions"),
            "h_next",
            F.round(
                F.col("row_n").cast("double") / F.col("__grand"), 6
            ).alias("weight"),
        )
    )


def _pi_iter_sql(prev: str, cur: str) -> str:
    # one power-iteration step pi_next(j) = sum_i pi(i) P(i, j), 8-dp
    # per-iteration rounding (the pagerank determinism convention)
    return f"""{cur} AS (
  SELECT p.next_type AS st, round(sum(pi.pi * p.p), 8) AS pi
  FROM p JOIN {prev} pi ON p.event_type = pi.st
  GROUP BY 1
)"""


_PI_ITERS = 5
_MARKOV_PI_SQL = (
    """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (SELECT event_type, next_type, count(*) AS n FROM s
      WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type, sum(n) AS row_n FROM t GROUP BY 1),
states AS (
  SELECT event_type AS st FROM t
  UNION SELECT next_type FROM t
),
p AS (
  SELECT t.event_type, t.next_type, t.n / CAST(tot.row_n AS DOUBLE) AS p
  FROM t JOIN tot USING (event_type)
  UNION ALL
  -- dangling state (no outgoing transition observed): self-loop so
  -- probability mass is conserved through every iteration
  SELECT st, st, 1.0 FROM states
  WHERE st NOT IN (SELECT event_type FROM t)
),
nn AS (SELECT count(*) AS k FROM states),
pi0 AS (SELECT st, round(1.0 / nn.k, 8) AS pi FROM states CROSS JOIN nn),
"""
    + ",\n".join(
        _pi_iter_sql(f"pi{i}", f"pi{i + 1}") for i in range(_PI_ITERS)
    )
    + f"""
SELECT st AS event_type, round(pi, 6) AS pi FROM pi{_PI_ITERS}
ORDER BY pi DESC, event_type
"""
)


@query(
    "events_markov_stationary",
    oracle=_MARKOV_PI_SQL,
    description="stationary distribution of the first-order event-type "
    "Markov chain by 5 fixed power iterations from uniform (dangling "
    "states get a self-loop so mass is conserved) — where the session "
    "flow settles if it runs forever, the long-run traffic mix behind "
    "capacity planning and the steady-state baseline anomaly scores "
    "compare against; the transition matrix is the same one-window "
    "derivation as markov_event_transitions (O(types^2) cells), each "
    "iteration is one broadcast join over the tiny cell frame with "
    "8-dp per-iteration rounding so both engines iterate identical "
    "doubles",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = s.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    states = (
        t.select(F.col("event_type").alias("st"))
        .union(t.select(F.col("next_type").alias("st")))
        .distinct()
    )
    p = (
        t.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "next_type",
            (F.col("n") / F.col("row_n").cast("double")).alias("p"),
        )
        .union(
            states.join(
                t.select("event_type").distinct(),
                states["st"] == F.col("event_type"),
                "left_anti",
            ).select(
                F.col("st").alias("event_type"),
                F.col("st").alias("next_type"),
                F.lit(1.0).alias("p"),
            )
        )
        # the transition matrix is O(types^2) cells: materialize once,
        # iterate against the local copy (the pagerank adjacency move)
        .localCheckpoint(eager=True)
    )
    k = states.count()
    pi = states.select(
        "st", F.round(F.lit(1.0) / F.lit(float(k)), 8).alias("pi")
    )
    for _ in range(_PI_ITERS):
        pi = (
            p.join(F.broadcast(pi), p["event_type"] == pi["st"])
            .groupBy(F.col("next_type").alias("st_next"))
            .agg(F.round(F.sum(F.col("pi") * F.col("p")), 8).alias("pi"))
            .select(F.col("st_next").alias("st"), "pi")
        )
    return (
        pi.select(F.col("st").alias("event_type"), F.round("pi", 6).alias("pi"))
        .orderBy(F.desc("pi"), F.asc("event_type"))
    )
