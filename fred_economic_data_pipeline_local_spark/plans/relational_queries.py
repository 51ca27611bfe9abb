"""Relational query surface over the TPC-H-ish star schema.

The reference never joins (SURVEY.md §2.5) — its layers correlate by
partition path — but a complete engine exposes the full relational
algebra. Each query is written declaratively so Catalyst picks the
physical strategy; dimension tables (region/nation/supplier/part,
customer at small SF) sit under the broadcast threshold so every
dim join is a BroadcastHashJoin with zero shuffle of the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..exports import export_sql
from .registry import query


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 shape: scan + pushed filter + wide hash agg (partial+final)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3 shape: fact-fact join + broadcast dim filter + top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(
            orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'AFRICA'
GROUP BY n_name
""",
    description="TPC-H Q5 shape: 5-way join chain, dims broadcast, one fact shuffle",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "AFRICA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    dims = broadcast(
        cust.join(
            broadcast(nation.join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "semi_join_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    description="left-semi join (EXISTS)",
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "anti_join_customers_no_recent_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
""",
    description="left-anti join (NOT EXISTS) — the J1 dedup-append "
    "primitive. The right side is date-filtered so the result is nonempty "
    "at every fixture SF (every customer has SOME order, so the unfiltered "
    "variant would be a vacuous 0-row check)",
)
def anti_join_customers_no_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    recent = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "outer_join_order_counts",
    oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS order_count
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
""",
    description="left-outer join + count-preserving agg",
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@query(
    "union_nations_of_parties",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    description="UNION DISTINCT (U1 extends: reference only has UNION ALL)",
)
def union_nations_of_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


@query(
    "except_orders_without_items",
    oracle="""
SELECT o_orderkey AS orderkey FROM orders
EXCEPT
SELECT l_orderkey FROM lineitem
""",
    description="EXCEPT DISTINCT set op (orders with no lineitems — "
    "nonempty at every fixture SF, unlike nation-key differences which "
    "are fully covered above sf0.001)",
)
def except_orders_without_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("orderkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("orderkey")
    )
    return orders.subtract(li)  # EXCEPT DISTINCT semantics


@query(
    "intersect_shared_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    description="INTERSECT set op",
)
def intersect_shared_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "union_all_lake_layers",
    oracle="""
SELECT o_orderkey AS keycol, o_totalprice AS amount FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
""",
    description="SURVEY §2.8 U1: UNION ALL accumulate (the yearly concat loop)",
)
def union_all_lake_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("keycol"), F.col("o_totalprice").alias("amount")
    )
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("keycol"), F.col("o_totalprice").alias("amount")
    )
    return f.unionByName(o)


@query(
    "topk_orders_by_price",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    description="global top-k: TakeOrderedAndProject, no full sort",
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "rollup_region_nation_customers",
    oracle="""
SELECT r_name, n_name, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    description="ROLLUP grouping sets (absent in reference, SURVEY §2.6)",
)
def rollup_region_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="CUBE grouping sets (all 4 grouping combinations)",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "null_functions_events",
    oracle="""
SELECT event_id,
       COALESCE(value, 0.0) AS value_or_zero,
       CASE WHEN value IS NULL THEN 'missing' ELSE 'present' END AS presence,
       IFNULL(NULLIF(event_type, 'error'), 'suppressed') AS type_clean
FROM events
""",
    description="null functions: coalesce / nullif / is-null conditionals",
)
def null_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.coalesce("value", F.lit(0.0)).alias("value_or_zero"),
        F.when(F.col("value").isNull(), "missing")
        .otherwise("present")
        .alias("presence"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("suppressed")).alias(
            "type_clean"
        ),
    )


@query(
    "from_json_typed_props",
    oracle="""
SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k,
       CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
""",
    description="from_json with explicit schema -> typed struct access (C11+)",
)
def from_json_typed_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    parsed = ev.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.where(F.col("p.k").isNotNull())
        .select("event_id", F.col("p.k").alias("k"), (F.col("p.k") % 10).alias("k_mod"))
    )


@query(
    "distinct_parts_per_flag",
    oracle="""
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
""",
    description="multi distinct aggregation (expand + two-phase agg)",
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "percentile_order_prices",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
    description="exact interpolated percentiles + min/max",
)
def percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "approx_aggregates_lineitem",
    # sketch estimates (HLL registers, t-digest centroids) differ
    # engine-to-engine BY DESIGN, so the sketch VALUES can't be hashed.
    # What can be: the exact aggregates the sketches approximate, plus
    # Spark-computed bound certificates (|approx - exact| within the
    # sketch's published error). The oracle recomputes the exact side
    # and pins the certificates TRUE — a sketch drifting out of its
    # error contract now hash-mismatches at the driver instead of only
    # failing a local test.
    oracle="""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
       TRUE AS nd_within_bounds,
       TRUE AS p50_within_bounds
FROM lineitem GROUP BY 1
""",
    description="approximate aggregates: HLL distinct + t-digest "
    "percentile (the 100 TB substitutes for exact distinct/percentile) "
    "emitted as self-certifying bound checks against the exact values, "
    "which the oracle independently recomputes — the exact columns "
    "hash-match and the TRUE certificates fail the hash if either "
    "sketch leaves its error envelope",
)
def approx_aggregates_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_partkey").alias("n_parts_exact"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__p50"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx_nd"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("__approx_p50"),
    )
    # bound certificates: HLL within 3x its configured rsd (or +-1 at
    # tiny cardinality), t-digest median within 2% of the exact median
    nd_ok = F.abs(F.col("__approx_nd") - F.col("n_parts_exact")) <= F.greatest(
        F.lit(3 * 0.02) * F.col("n_parts_exact"), F.lit(1.0)
    )
    p50_ok = F.abs(F.col("__approx_p50") - F.col("__p50")) <= F.lit(0.02) * F.abs(
        F.col("__p50")
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        "n_parts_exact",
        F.round("__p50", 6).alias("p50_exact"),
        nd_ok.alias("nd_within_bounds"),
        p50_ok.alias("p50_within_bounds"),
    )


@query(
    "case_when_price_bands",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS band,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1
""",
    description="CASE WHEN conditional bucketing (absent in reference, SURVEY §2.9)",
)
def case_when_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        orders.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "string_functions_parts",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_name, 1, 4) AS name_prefix,
       replace(p_type, 'ECONOMY', 'ECON') AS type_short,
       concat(p_brand, ':', p_type) AS brand_type,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       lower(trim(p_brand)) AS brand_norm
FROM part
""",
    description="SURVEY §2.9 C8 string surface: case/trim/substr/replace/concat/regex",
)
def string_functions_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECON")).alias("type_short"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.lower(F.trim(F.col("p_brand"))).alias("brand_norm"),
    )


@query(
    "date_functions_orders",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
    description="SURVEY §2.9 C1/C2/C9/C10 date surface: parts, trunc, arithmetic, format",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
    description="scalar subquery in predicate (Catalyst subquery rewrite)",
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
        """
    )


@query(
    "correlated_subquery_max_per_cust",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
    description="correlated scalar subquery (decorrelated to aggregate+join)",
)
def correlated_subquery_max_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v2")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders_v2 o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders_v2 o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "profile_table_lineitem",
    oracle="""
SELECT 'l_quantity' AS col,
       count(*) AS n_rows,
       count(l_quantity) AS n_nonnull,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       round(min(l_quantity), 6) AS min_val,
       round(max(l_quantity), 6) AS max_val,
       round(avg(l_quantity), 4) AS mean_val
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(l_discount),
       CAST(count(DISTINCT l_discount) AS BIGINT),
       round(min(l_discount), 6), round(max(l_discount), 6), round(avg(l_discount), 4)
FROM lineitem
""",
    description="data-profiling sweep: per-column null/distinct/min/max/mean in one pass-per-column",
)
def profile_table_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)

    def profile(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col), 6).alias("min_val"),
            F.round(F.max(col), 6).alias("max_val"),
            # 4dp, not the usual 6: avg over 600k doubles sits within
            # summation-order noise of a 6dp rounding boundary at sf0.01
            # (0.0499185|. between engines), and a profiling mean doesn't
            # need microprecision
            F.round(F.avg(col), 4).alias("mean_val"),
        )

    return profile("l_quantity").unionByName(profile("l_discount"))


@query(
    "cast_coercion_values",
    oracle="""
SELECT event_id,
       TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip,
       CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS user_id_roundtrip,
       TRY_CAST('.' AS DOUBLE) AS sentinel_null,
       TRY_CAST('garbage' AS DOUBLE) AS garbage_null
FROM events
""",
    description="SURVEY §1.4/C3/C4: lenient string<->numeric casts, null on garbage",
)
def cast_coercion_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.col("value").cast("string").cast("double").alias("value_roundtrip"),
        F.col("user_id").cast("string").cast("long").alias("user_id_roundtrip"),
        F.lit(".").cast("double").alias("sentinel_null"),
        F.lit("garbage").cast("double").alias("garbage_null"),
    )


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a "
    "non-equi conjunct, then agg (fixture has no commitdate; shipdate>orderdate "
    "plays the late-line role)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6 shape: pure scan+filter+scalar agg — every predicate "
    "pushes to the parquet reader, no shuffle beyond the final 1-row reduce",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS F,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS O,
       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS P
FROM orders
GROUP BY o_orderpriority
""",
    description="PIVOT (groupBy().pivot() with explicit value list -> single-pass "
    "conditional agg, no per-value scan)",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    # explicit values list: keeps the plan a single hash-agg (no distinct-scan
    # to discover pivot columns -> one job, not two, at 100 TB)
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, round(l_quantity, 6) AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', round(l_discount, 6) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', round(l_tax, 6) FROM lineitem
""",
    description="UNPIVOT/melt (wide measures -> long form; Expand node, one scan "
    "instead of the oracle's three)",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="raw_val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("raw_val", 6).alias("val"),
    )


@query(
    "grouping_sets_region_segment",
    oracle="""
SELECT r_name, c_mktsegment, count(*) AS n_customers
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), ())
""",
    description="explicit GROUPING SETS (beyond rollup/cube: arbitrary set list)",
)
def grouping_sets_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        broadcast(region), nation.n_regionkey == region.r_regionkey
    ).createOrReplaceTempView("cust_geo_v")
    return spark.sql(
        """
        SELECT r_name, c_mktsegment, count(*) AS n_customers
        FROM cust_geo_v
        GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), ())
        """
    )


@query(
    "window_ntile_percent_rank",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    description="ranking window surface: ntile / percent_rank / "
    "cume_dist — computed from the two-pass blocked exact rank "
    "(operators/rank.py), not the built-in partitioned window: 5 "
    "market segments means 5 window tasks each sorting O(customers/5) "
    "rows, the same single-task class the unpartitioned global forms "
    "have. The (c_acctbal, c_custkey) order is strict, so rank == "
    "row_number, percent_rank = (rn-1)/(n-1) (0.0 at n=1), cume_dist "
    "= rn/n — bit-identical doubles to the built-ins",
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import _ntile_from_rank, ordered_prefix

    cust = load_table(spark, "customer", sf_dir)
    r = ordered_prefix(
        cust,
        [("c_acctbal", True), ("c_custkey", True)],
        carry=["c_custkey"],
        block=["c_mktsegment"],
    )
    n = r.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("__n_seg"))
    r = r.join(F.broadcast(n), "c_mktsegment")
    q = _ntile_from_rank(
        r,
        4,
        "__n_seg",
        ["c_custkey", "c_mktsegment", "__rn", "__n_seg"],
        "quartile",
    )
    pct = F.when(F.col("__n_seg") == 1, F.lit(0.0)).otherwise(
        (F.col("__rn") - 1).cast("double")
        / (F.col("__n_seg") - 1).cast("double")
    )
    return q.select(
        "c_custkey",
        "c_mktsegment",
        F.col("quartile").cast("int").alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(
            F.col("__rn").cast("double") / F.col("__n_seg").cast("double"),
            6,
        ).alias("cume"),
    )


@query(
    "explode_token_frequency",
    oracle="""
SELECT token, count(*) AS freq
FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token
LIMIT 100
""",
    description="lateral explode (split -> explode -> agg -> top-k): the "
    "generate/flatMap shape; partial agg absorbs the token blow-up before the "
    "shuffle",
)
def explode_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(100)
    )


@query(
    "q7_nation_trade_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
     OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    description="TPC-H Q7 shape: 6-way join, nation self-joined twice; the "
    "disjunctive cross-nation predicate is split into per-side IN filters "
    "(pushed below the joins) + the pair filter above them, so both fact "
    "probes shrink before any shuffle",
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_0", "NATION_1")
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin(*nations))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin(*nations))
    # dim-side joins first: supplier/customer reduced to the two nations
    # before touching the facts, so the broadcast hash tables are tiny
    sup = load_table(spark, "supplier", sf_dir).join(
        broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    cust = load_table(spark, "customer", sf_dir).join(
        broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    pair = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    return (
        li.join(broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="TPC-H Q10 shape: returned-item revenue per customer; both "
    "fact filters pushed to the scans, dims broadcast, TakeOrderedAndProject "
    "top-k (no global sort)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "window_frame_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER w, 2) AS last_price,
       round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    description="value window functions over an explicit full frame: "
    "first_value / last_value / nth_value (default growing frame would make "
    "last_value degenerate; the frame is pinned identically in both engines)",
)
def window_frame_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@query(
    "window_range_trailing_30d",
    oracle="""
SELECT o_orderkey, o_custkey,
       count(*) OVER w AS n_orders_30d,
       round(sum(o_totalprice) OVER w, 2) AS sum_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
""",
    description="RANGE frame (event-time trailing 30 days): Spark range "
    "frames need a numeric sort key, so the timestamp is ordered as epoch "
    "seconds with a [-30d, 0] bound — value-identical to DuckDB's interval "
    "frame (both bounds inclusive, peers included)",
)
def window_range_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_30d"),
    )


@query(
    "cross_join_region_pairs",
    oracle="""
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
""",
    description="explicit cartesian product (BroadcastNestedLoopJoin) over a "
    "dim small enough to enumerate pairs — the only join shape where NLJ is "
    "the right plan",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    a = region.select(F.col("r_name").alias("region_a"))
    b = region.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(broadcast(b)).where(F.col("region_a") < F.col("region_b"))


@query(
    "skew_salted_join_revenue",
    oracle="""
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
""",
    description="salted equi-join (hot keys spread over 8 salt replicas, "
    "small side replicated): result-identical to the plain join, which is "
    "exactly what the oracle checks",
)
def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    orders_sub = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
    )
    j = salted_join(li, orders_sub, ["o_orderkey"], salt_buckets=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@query(
    "skew_salted_agg_quantities",
    oracle="""
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_l_quantity,
       count(l_orderkey) AS count_l_orderkey
FROM lineitem
GROUP BY l_returnflag
""",
    description="two-phase salted aggregation (partials on (key, salt), "
    "refold on key): decomposable aggs only; result-identical to the "
    "direct groupBy",
)
def skew_salted_agg_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    li = load_table(spark, "lineitem", sf_dir)
    out = salted_aggregate(
        li.select("l_returnflag", "l_quantity", "l_orderkey"),
        ["l_returnflag"],
        {"l_quantity": "sum", "l_orderkey": "count"},
        salt_buckets=8,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        "count_l_orderkey",
    )


@query(
    "histogram_order_prices",
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                 WHEN o_totalprice >= 500000 THEN 11
                 ELSE floor(o_totalprice / 50000) + 1 END AS INTEGER) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
    description="equi-width histogram via width_bucket: single-pass "
    "partial+final agg — the profiling shape that replaces a sort-based "
    "bucketing at scale",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(10))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "except_all_nation_multiset",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
    description="EXCEPT ALL (multiset difference — per-key counts "
    "preserved, unlike the DISTINCT variant)",
)
def except_all_nation_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.exceptAll(supp)


@query(
    "intersect_all_nation_multiset",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
    description="INTERSECT ALL (multiset intersection — min of per-key "
    "counts)",
)
def intersect_all_nation_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp)


@query(
    "stats_aggregates_lineitem",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    description="statistical aggregates (stddev/variance/correlation/"
    "covariance) — single-pass partial+final moments, no sort",
)
def stats_aggregates_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@query(
    "q18_large_volume_customers",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS price,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY round(o_totalprice, 2) DESC, o_orderkey
LIMIT 100
""",
    description="TPC-H Q18 shape: HAVING-filtered aggregate subquery "
    "joined back to the facts — the aggregate runs FIRST, shrinking the "
    "join input from |lineitem| to the few hot orders before any "
    "wide-row shuffle; dims broadcast, top-k via TakeOrderedAndProject",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("price"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "string_agg_region_nations",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    description="ordered string aggregation: Spark has no ordered "
    "listagg, so it's collect_list -> sort_array -> array_join — "
    "deterministic regardless of shuffle arrival order",
)
def string_agg_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        nation.join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "array_functions_tokens",
    oracle="""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_toks,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3_sorted,
       CAST(list_contains(toks, 'the') AS BOOLEAN) AS has_the,
       array_to_string(list_reverse_sort(list_distinct(toks))[1:2], '|') AS top2_desc
FROM t
""",
    description="array function surface: size / distinct / sort / slice / "
    "contains / reverse sort — all codegen'd array expressions, scalar "
    "outputs so the cross-engine hash stays type-stable",
)
def array_functions_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.lower("text"), " ")
    dist = F.array_distinct(toks)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(dist).alias("n_distinct"),
        F.array_join(F.slice(F.sort_array(dist), 1, 3), "|").alias("first3_sorted"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.slice(F.sort_array(dist, asc=False), 1, 2), "|").alias(
            "top2_desc"
        ),
    )


@query(
    "null_safe_join_event_kinds",
    oracle="""
WITH e AS (SELECT nullif(event_type, 'error') AS kind, value FROM events),
k AS (SELECT DISTINCT kind FROM e)
SELECT k.kind, count(*) AS n_events, round(sum(e.value), 2) AS total_value
FROM e JOIN k ON e.kind IS NOT DISTINCT FROM k.kind
GROUP BY k.kind
""",
    description="null-safe equi-join (<=> / IS NOT DISTINCT FROM): the "
    "null key joins instead of dropping — still plans as a hash join on "
    "the null-safe key, not a nested loop",
)
def null_safe_join_event_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        F.nullif("event_type", F.lit("error")).alias("kind"), "value"
    )
    kinds = ev.select("kind").distinct().withColumnRenamed("kind", "k_kind")
    return (
        ev.join(broadcast(kinds), ev["kind"].eqNullSafe(F.col("k_kind")))
        .groupBy(F.col("k_kind").alias("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1
""",
    description="TPC-H Q14 shape: conditional-aggregate ratio over a "
    "broadcast dim join — one pass, no self-join for the numerator",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_share_pct"
            )
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END)
             / sum(vol), 6) AS mkt_share
FROM base GROUP BY 1
""",
    description="TPC-H Q8 shape: national market share within a region — "
    "7-way join with nation in two roles, conditional-aggregate ratio",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_type") == "PROMO")
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(cn), F.col("cn.n_nationkey") == F.col("c_nationkey"))
        .join(broadcast(region), F.col("r_regionkey") == F.col("cn.n_regionkey"))
        .join(broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(sn), F.col("sn.n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    num = F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(F.lit(0))
    return base.groupBy("o_year").agg(
        F.round(F.sum(num) / F.sum("vol"), 6).alias("mkt_share")
    )


@query(
    "q12_shipping_delay",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
            THEN 'late' ELSE 'on_time' END AS delay_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY 1
""",
    description="TPC-H Q12 shape (fixture carries no shipmode/commitdate, "
    "so ship-delay bands replace shipmode): fact-fact join + dual "
    "conditional counts per band",
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    band = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90, "late"
    ).otherwise("on_time")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
WITH co AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY 1
""",
    description="TPC-H Q13 shape: customer order-count distribution — "
    "outer join with a non-key ON predicate, then a two-level aggregate",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") != "5-LOW"
    )
    co = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
""",
    description="TPC-H Q17 shape: small-quantity order revenue — "
    "correlated per-part average decorrelated into a broadcast agg join",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part_keys = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    # semi-join the fact against the (broadcast) qualifying part keys
    # BEFORE the per-part aggregate, so the broadcast agg covers only the
    # filtered brand's parts — O(#brand parts), not O(#parts) (ADVICE r2)
    brand_li = li.join(
        broadcast(part_keys),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    per_part_cap = brand_li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        brand_li.join(broadcast(per_part_cap), F.col("__pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_discounted_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
    description="TPC-H Q19 shape: disjunctive multi-attribute predicate "
    "(OR of ANDs across both join sides) over a broadcast dim join",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
""",
    description="TPC-H Q22 shape: positive-balance customers with no "
    "orders — scalar-subquery threshold broadcast + anti join + aggregate",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT c.partkey, min(c.supplycost) AS min_cost
  FROM cost c JOIN eu ON c.suppkey = s_suppkey
  GROUP BY 1
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       p_partkey, p_name,
       -- explicit half-up: round()'s scale-multiply can land a 1-ulp
       -- hair differently than Java BigDecimal on .XXXX5 edges (seen
       -- at sf0.1); floor(x*1e4 + 0.5) is the same double arithmetic
       -- in both engines (supplycost > 0, so floor == half-up)
       floor(c.supplycost * 10000 + 0.5) / 10000 AS supplycost
FROM part
JOIN cost c ON c.partkey = p_partkey
JOIN eu ON c.suppkey = s_suppkey
JOIN best b ON b.partkey = p_partkey AND c.supplycost = b.min_cost
WHERE p_size <= 10 AND p_type IN ('LARGE', 'SMALL')
""",
    description="TPC-H Q2 shape: min-cost supplier per part in a region — "
    "correlated-min subquery decorrelated into an agg + equi-join "
    "(fixture has no partsupp, so lineitem unit price is the cost bridge)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference never joins (SURVEY.md §2.5); this extends the engine's
    relational surface with TPC-H Q2's correlated-min shape.

    Scale notes: ``cost`` is one shuffle on (partkey, suppkey); the
    per-part min is decorrelated into a second agg over the *already
    region-filtered* cost rows (never the full corpus), and supplier/
    nation/region dims broadcast.  The min is an exact selection (no
    summation), so cross-engine float drift cannot flip the winner.
    """
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    part = load_table(spark, "part", sf_dir).where(
        (F.col("p_size") <= 10) & F.col("p_type").isin("LARGE", "SMALL")
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    eu = (
        supp.join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_cost = cost.join(broadcast(eu), F.col("suppkey") == F.col("s_suppkey"))
    best = eu_cost.groupBy(F.col("partkey").alias("__bpk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        eu_cost.join(broadcast(part), F.col("p_partkey") == F.col("partkey"))
        .join(
            best,
            (F.col("__bpk") == F.col("partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # explicit half-up (floor(x*1e4 + 0.5)): engine-identical
            # double arithmetic; see the oracle-side comment
            (
                F.floor(F.col("supplycost") * 10000 + F.lit(0.5)) / 10000
            ).alias("supplycost"),
        )
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    description="TPC-H Q9 shape: product-type profit by nation and year — "
    "5-way star join with a LIKE-filtered part dim (no partsupp cost "
    "term in the fixture, so profit is discounted revenue)",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: lineitem joins supplier/part dims (broadcast)
    and orders (fact-fact shuffle join); the %red% part filter prunes
    before the orders join so the shuffled side is pre-filtered."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%red%"))
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l_partkey AS partkey, sum(l_extendedprice) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY 1
)
SELECT partkey, round(value, 2) AS value
FROM v
WHERE value > (SELECT sum(value) * 0.001 FROM v)
""",
    description="TPC-H Q11 shape: important stock value by part — "
    "grouped value with a HAVING threshold from a scalar subquery over "
    "the same aggregate (fixture: lineitem value for partsupp value)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: the scalar global-sum subquery is decorrelated
    into a broadcast cross join of a 1-row aggregate, so the per-part
    aggregate is computed ONCE and reused for both branches."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).where(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    v = (
        li.join(broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = v.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        v.crossJoin(broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    description="TPC-H Q15 shape: top supplier by quarterly revenue — "
    "reused CTE aggregate + scalar-max subquery against itself",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the revenue 'view' is built once; the scalar max is a
    1-row broadcast crossJoin so the filter never re-aggregates.  The
    revenue aggregate shuffles only (suppkey, partial sums)."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(broadcast(top))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
""",
    description="TPC-H Q16 shape: supplier count per part group with a "
    "NOT-IN exclusion subquery (negative-balance suppliers stand in for "
    "the comment-complaints filter; lineitem bridges part to supplier)",
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: the NOT IN becomes a broadcast left_anti join (the
    excluded-supplier set is tiny); distinct-count shuffles only the
    surviving (brand, type, size, suppkey) tuples."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = (
        load_table(spark, "supplier", sf_dir)
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            broadcast(bad_supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_potential_promotion",
    oracle="""
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9',
                   'NATION_13', 'NATION_17', 'NATION_21')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100.0
  )
""",
    description="TPC-H Q20 shape: suppliers with heavy shipments of "
    "name-matched parts — nested IN subqueries decorrelated into "
    "broadcast semi-joins with a HAVING'd aggregate in the middle",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (availqty -> shipped quantity): innermost IN is
    a broadcast semi-join on partkey; the HAVING aggregate shuffles only
    qualifying (suppkey, qty) rows; the outer IN is a semi-join against
    the tiny qualifying-supplier set."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir).where(
        F.col("n_name").isin(
            "NATION_1", "NATION_5", "NATION_9", "NATION_13", "NATION_17", "NATION_21"
        )
    )
    small_parts = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    heavy_suppliers = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(
            broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi"
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        supp.join(broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            broadcast(heavy_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND n_name IN ('NATION_0', 'NATION_2', 'NATION_4', 'NATION_6',
                 'NATION_8', 'NATION_10', 'NATION_12', 'NATION_14',
                 'NATION_16', 'NATION_18', 'NATION_20', 'NATION_22')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
    description="TPC-H Q21 shape: sole-blame suppliers on failed orders "
    "— correlated EXISTS + NOT-EXISTS pair decorrelated into one "
    "per-order distinct-count aggregate (returnflag 'R' stands in for "
    "the missing receipt/commit dates)",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted.  Instead of two correlated sub-scans per row,
    one pass over lineitem computes per-order supplier counts:

      EXISTS(other supplier)            <=> n_suppliers  >= 2
      NOT EXISTS(other supplier w/ 'R') <=> n_r_suppliers = 1
        (l1 itself carries 'R', so the sole flagged supplier is l1's)

    The fact side then takes ONE broadcast join against the per-order
    counts — O(|lineitem|) total instead of O(|lineitem| * probes).
    """
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "F"
    )
    nation = load_table(spark, "nation", sf_dir).where(
        F.col("n_name").isin(
            *[f"NATION_{k}" for k in range(0, 23, 2)]
        )
    )
    order_stats = li.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_suppliers"),
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            broadcast(
                supp.join(
                    broadcast(nation),
                    F.col("n_nationkey") == F.col("s_nationkey"),
                ).select("s_suppkey", "s_name")
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(order_stats, F.col("__ok") == F.col("l_orderkey"))
        .where((F.col("n_suppliers") >= 2) & (F.col("n_r_suppliers") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "bloom_pruned_join_revenue",
    oracle="""
SELECT l_returnflag, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice >= 150000
GROUP BY l_returnflag
""",
    description="Bloom-join semi-join reduction: the selective dim's keys "
    "fold distributedly into a Bloom mask SIZED BY MATH (bloom_params "
    "from the dim's measured key count at fpp=0.01, not a fixed "
    "default; bit_or partial+final, O(mask) driver collect), the fact "
    "side is pruned map-side by a codegen'd literal-array probe BEFORE "
    "the join exchange, and the join removes the false positives — "
    "row-identical to the plain join, which is exactly what the oracle "
    "checks (operators/bloom.py)",
)
def bloom_pruned_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_pruned_join

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    dim = (
        load_table(spark, "orders", sf_dir)
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") >= 150000)
        )
        .select("o_orderkey")
    )
    # the tiny dim count plays the role table statistics / manifest zone
    # maps play in production: fpp-driven mask sizing instead of 1<<17
    j = bloom_pruned_join(
        li, dim, "l_orderkey", "o_orderkey",
        expected_keys=max(int(dim.count()), 1), fpp=0.01,
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def _ppr_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT b.node, round(b.b + 0.85 * coalesce(s.s, 0), 8) AS r
  FROM base b
  LEFT JOIN (
    SELECT e.dst AS node, sum((p.r * e.w) / ws.ws) AS s
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN ws ON e.src = ws.src
    GROUP BY e.dst
  ) s ON b.node = s.node
)"""


_PPR_ITERS = 5
# teleport literal is written (1.0 - 0.85), NOT 0.15: the operator
# computes (1.0 - damping) in Python and 1.0 - 0.85 is NOT the double
# 0.15 — both engines must round the same IEEE value
_PPR_SQL = (
    """
WITH e0 AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         's' || CAST(l_suppkey AS VARCHAR) AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst, src, w FROM e0),
seeds AS (
  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
  FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
),
ns AS (SELECT count(*) AS n FROM seeds),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL SELECT dst FROM edges
    UNION ALL SELECT node FROM seeds
  )
),
ws AS (SELECT src, sum(w) AS ws FROM edges GROUP BY src),
base AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL
              THEN (1.0 - 0.85) / ns.n ELSE 0.0 END AS b,
         CASE WHEN s.node IS NOT NULL
              THEN 1.0 / ns.n ELSE 0.0 END AS r00
  FROM nodes n CROSS JOIN ns LEFT JOIN seeds s ON n.node = s.node
),
r0 AS (SELECT node, round(r00, 8) AS r FROM base),
"""
    + ",\n".join(_ppr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PPR_ITERS))
    + f"""
SELECT node, round(r, 6) AS rank FROM r{_PPR_ITERS}
WHERE node LIKE 's%'
ORDER BY rank DESC, node
LIMIT 20
"""
)


@query(
    "graph_personalized_pagerank",
    oracle=_PPR_SQL,
    description="personalized weighted PageRank (Haveliwala 2002) over "
    "the customer-supplier co-purchase graph: teleport mass restarts at "
    "the AUTOMOBILE-segment customers, transition probabilities "
    "proportional to co-purchase counts (w/W, a ratio of exact integer "
    "aggregates) — 'which suppliers are most relevant to this customer "
    "segment', the relevance-propagation form of the recommendation "
    "query. Same scale posture as pagerank: adjacency shuffled once and "
    "eagerly checkpointed, per-iteration exchange is (node, double) "
    "pairs with map-side combine, seed floor precomputed once, 8-dp "
    "per-iteration rounding for cross-engine determinism; top-20 "
    "supplier nodes",
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import personalized_pagerank

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
    )
    r = personalized_pagerank(edges, seeds, iterations=5, weight_col="w")
    return (
        r.where(F.col("node").startswith("s"))
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         round(0.15 / nn.n + 0.85 * coalesce(s.s, 0), 8) AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / od.od) AS s
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN od ON e.src = od.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""


_PR_ITERS = 5
_PR_SQL = (
    """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
od AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
r0 AS (SELECT node, round(1.0 / nn.n, 8) AS r FROM nodes CROSS JOIN nn),
"""
    + ",\n".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))
    + f"""
SELECT node, round(r, 6) AS rank FROM r{_PR_ITERS}
ORDER BY rank DESC, node
LIMIT 20
"""
)


@query(
    "graph_pagerank_topk",
    oracle=_PR_SQL,
    description="fixed-iteration PageRank over the undirected "
    "customer-supplier trade graph (edges = distinct (cust, supp) pairs "
    "via orders x lineitem, both directions so no dangling leakage): "
    "the canonical iterative-join workload — the adjacency is shuffled "
    "ONCE onto src and cached, each of the 5 iterations exchanges only "
    "(node, double) rank pairs with map-side combine, lineage truncated "
    "per iteration; per-iteration 8-dp rounding makes the FP sum "
    "deterministic across engines and partitionings",
)
def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_topk

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey"
    )
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank_topk(edges, k=20, iterations=_PR_ITERS)


_PMI_TOPK = 25


@query(
    "basket_pmi_pairs",
    oracle=f"""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_baskets FROM b),
item AS (SELECT pk, count(*) AS n_item FROM b GROUP BY pk),
pair AS (
  SELECT a.pk AS part_a, c.pk AS part_b, count(*) AS n_pair
  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT part_a, part_b, n_pair,
       round(ln((n_pair * n_baskets) /
                (CAST(ia.n_item AS DOUBLE) * ib.n_item)), 6) AS pmi
FROM pair
JOIN item ia ON ia.pk = part_a
JOIN item ib ON ib.pk = part_b
CROSS JOIN n
ORDER BY pmi DESC, part_a, part_b
LIMIT {_PMI_TOPK}
""",
    description="basket co-occurrence with PMI scoring (the "
    "market-basket / co-occurrence-embedding statistic): the pair join "
    "is equi-keyed on the basket id so pair work is bounded by basket "
    "size squared (TPC-H baskets are <=7 items), never corpus-"
    "quadratic; item marginals join back as the Zipf-bounded item "
    "table; min-support prunes the pair tail before scoring",
)
def basket_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = b.agg(
        F.count_distinct("ok").cast("double").alias("n_baskets")
    )
    item = b.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    a = b.select(F.col("ok"), F.col("pk").alias("part_a"))
    c = b.select(F.col("ok"), F.col("pk").alias("part_b"))
    pair = (
        a.join(c, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 2)
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("n_item").alias("__na"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("n_item").alias("__nb"))
    scored = (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") * F.col("n_baskets"))
                    / (F.col("__na").cast("double") * F.col("__nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("part_a"), F.asc("part_b")
    ).limit(_PMI_TOPK)


@query(
    "winsorize_order_prices",
    oracle="""
WITH b AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY 1
)
SELECT o.o_orderpriority,
       round(b.lo, 2) AS lo,
       round(b.hi, 2) AS hi,
       count(*) AS n,
       CAST(sum(CASE WHEN o_totalprice < b.lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_lo,
       CAST(sum(CASE WHEN o_totalprice > b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_hi,
       round(avg(CASE WHEN o_totalprice < b.lo THEN b.lo
                      WHEN o_totalprice > b.hi THEN b.hi
                      ELSE o_totalprice END), 2) AS avg_winsorized
FROM orders o JOIN b USING (o_orderpriority)
GROUP BY o.o_orderpriority, b.lo, b.hi
""",
    description="robust aggregation: per-priority winsorized mean of "
    "order prices (clip at the group's exact p05/p95 before averaging) "
    "— one map-combined exchange computes the quantile bounds, the "
    "O(groups) bounds frame broadcasts back, one more map-combined "
    "exchange aggregates the clipped values; percentile_approx swap-in "
    "for unbounded groups (operators/robust.py)",
)
def winsorize_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import winsorize

    orders = load_table(spark, "orders", sf_dir)
    return winsorize(orders, "o_orderpriority", "o_totalprice")


@query(
    "winsorize_approx_path",
    # approx bounds come from Spark's GK sketch — unverifiable in SQL
    # by construction, so they are EXPORTED (the exported-index
    # pattern) and DuckDB certifies everything downstream: the clip
    # counts and winsorized mean re-derived exactly from the exported
    # bounds, plus an accuracy gate against the EXACT quantile path
    oracle=f"""
WITH b AS (
  SELECT o_orderpriority, lo, hi
  FROM {export_sql('winsorize_approx_bounds')}
),
a AS (
  SELECT o.o_orderpriority,
         round(b.lo, 2) AS lo,
         round(b.hi, 2) AS hi,
         count(*) AS n,
         CAST(sum(CASE WHEN o_totalprice < b.lo THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clip_lo,
         CAST(sum(CASE WHEN o_totalprice > b.hi THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clip_hi,
         round(avg(CASE WHEN o_totalprice < b.lo THEN b.lo
                        WHEN o_totalprice > b.hi THEN b.hi
                        ELSE o_totalprice END), 2) AS avg_winsorized
  FROM orders o JOIN b USING (o_orderpriority)
  GROUP BY o.o_orderpriority, b.lo, b.hi
),
eb AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY 1
),
e AS (
  SELECT o.o_orderpriority,
         round(avg(CASE WHEN o_totalprice < eb.lo THEN eb.lo
                        WHEN o_totalprice > eb.hi THEN eb.hi
                        ELSE o_totalprice END), 2) AS avg_exact
  FROM orders o JOIN eb USING (o_orderpriority)
  GROUP BY o.o_orderpriority
)
SELECT a.*,
       round(abs(a.avg_winsorized - e.avg_exact) / e.avg_exact, 6)
         AS rel_gap,
       abs(a.avg_winsorized - e.avg_exact) / e.avg_exact <= 0.005
         AS within_tol
FROM a JOIN e USING (o_orderpriority)
""",
    description="the 100 TB winsorize path: percentile_approx (GK "
    "sketch, rel err 1e-3, constant aggregation state — exact "
    "F.percentile buffers every group value and is refused at "
    "unbounded group sizes) computes the per-group bounds, the "
    "O(groups) bounds table is exported/persisted, and the clip + "
    "re-aggregate runs against it; DuckDB re-derives clip counts and "
    "the winsorized mean EXACTLY from the exported bounds and gates "
    "the approx mean against the exact-quantile mean at 0.5% — the "
    "sketch's accuracy is measured, not assumed",
)
def winsorize_approx_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.robust import winsorize_apply, winsorize_bounds

    orders = load_table(spark, "orders", sf_dir)
    bounds = export_table(
        winsorize_bounds(
            orders, "o_orderpriority", "o_totalprice", approx_rel_err=0.001
        ),
        "winsorize_approx_bounds",
    )
    a = winsorize_apply(orders, "o_orderpriority", "o_totalprice", bounds)
    exact_b = winsorize_bounds(orders, "o_orderpriority", "o_totalprice")
    e = winsorize_apply(
        orders, "o_orderpriority", "o_totalprice", exact_b
    ).select(
        "o_orderpriority", F.col("avg_winsorized").alias("avg_exact")
    )
    gap = F.abs(F.col("avg_winsorized") - F.col("avg_exact")) / F.col(
        "avg_exact"
    )
    return a.join(e, "o_orderpriority").select(
        a["*"],
        F.round(gap, 6).alias("rel_gap"),
        (gap <= 0.005).alias("within_tol"),
    )


@query(
    "anomaly_mad_outliers",
    oracle="""
WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
d AS (
  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN m USING (event_type)
),
s AS (SELECT event_type, median(adev) AS mad FROM d GROUP BY 1)
SELECT d.event_type,
       round(any_value(d.med), 4) AS med,
       round(any_value(s.mad), 4) AS mad,
       count(*) AS n,
       CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * s.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN s USING (event_type)
GROUP BY d.event_type
""",
    description="robust anomaly screen: per-event-type median absolute "
    "deviation with 3-sigma-equivalent flags (|v - med| > 3*1.4826*MAD) "
    "— two map-combined exchanges (median, then median of deviations; "
    "MAD is irreducibly two rounds), O(groups) frames broadcast back; "
    "exact medians so the oracle's interpolated midpoints are the same "
    "IEEE doubles",
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import mad_outliers

    ev = load_table(spark, "events", sf_dir)
    return mad_outliers(ev, "event_type", "value")


# Fellegi-Sunter weights, computed ONCE in Python and embedded as
# identical full-precision double literals in both engines (libm ln()
# could differ by 1 ulp between engines; a shared literal cannot)
import math as _math

_FS_M_U = {"seg": (0.9, 0.2), "bal": (0.8, 0.05), "seq": (0.7, 0.01)}
_FS_W = {
    n: (_math.log(m / u), _math.log((1 - m) / (1 - u)))
    for n, (m, u) in _FS_M_U.items()
}
_FS_MATCH, _FS_POSSIBLE = 6.0, 1.0


@query(
    "record_linkage_fs",
    oracle=f"""
WITH pairs AS (
  SELECT a.c_nationkey AS block,
         a.c_mktsegment = b.c_mktsegment AS agree_seg,
         abs(a.c_acctbal - b.c_acctbal) <= 50.0 AS agree_bal,
         abs(a.c_custkey - b.c_custkey) <= 10 AS agree_seq,
         (CASE WHEN a.c_mktsegment = b.c_mktsegment
               THEN {_FS_W['seg'][0]!r} ELSE {_FS_W['seg'][1]!r} END
          + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 50.0
                 THEN {_FS_W['bal'][0]!r} ELSE {_FS_W['bal'][1]!r} END
          + CASE WHEN abs(a.c_custkey - b.c_custkey) <= 10
                 THEN {_FS_W['seq'][0]!r} ELSE {_FS_W['seq'][1]!r} END
         ) AS score
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
)
SELECT block,
       CASE WHEN score >= {_FS_MATCH!r} THEN 'match'
            WHEN score >= {_FS_POSSIBLE!r} THEN 'possible'
            ELSE 'non_match' END AS decision,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN agree_seg THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree_seg,
       CAST(sum(CASE WHEN agree_bal THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree_bal,
       CAST(sum(CASE WHEN agree_seq THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree_seq,
       round(avg(score), 6) AS avg_score
FROM pairs
GROUP BY 1, 2
""",
    description="probabilistic record linkage (Fellegi-Sunter 1969) as "
    "master-dedup: nation-blocked candidate pairs (equi-join, never a "
    "cross join — work bounded by sum of block^2), three agree/disagree "
    "features scored with log-odds weights embedded as shared double "
    "literals, three-way match/possible/non-match decision; "
    "sorted-neighborhood or LSH blocking swaps in as block_col at scale "
    "(operators/linkage.py)",
)
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import FSFeature, fs_score_pairs

    cust = load_table(spark, "customer", sf_dir)
    feats = [
        FSFeature(
            "seg",
            lambda lc, rc: lc("c_mktsegment") == rc("c_mktsegment"),
            *_FS_M_U["seg"],
        ),
        FSFeature(
            "bal",
            lambda lc, rc: F.abs(lc("c_acctbal") - rc("c_acctbal")) <= 50.0,
            *_FS_M_U["bal"],
        ),
        FSFeature(
            "seq",
            lambda lc, rc: F.abs(lc("c_custkey") - rc("c_custkey")) <= 10,
            *_FS_M_U["seq"],
        ),
    ]
    scored = fs_score_pairs(
        cust, "c_custkey", "c_nationkey", feats, _FS_MATCH, _FS_POSSIBLE
    )
    return scored.groupBy(
        F.col("block"), F.col("decision")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("agree_seg").cast("long")).alias("n_agree_seg"),
        F.sum(F.col("agree_bal").cast("long")).alias("n_agree_bal"),
        F.sum(F.col("agree_seq").cast("long")).alias("n_agree_seq"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )


@query(
    "graph_triangle_topk",
    # the oracle enumerates triangles with the simple id-ordered
    # closure — the triangle SET is orientation-invariant, so it needn't
    # mirror the engine's degree orientation (which exists purely to
    # bound wedge fanout on hubs); per-node counts explode identically
    oracle="""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS x, c.pk AS y FROM b a JOIN b c
    ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
t AS (
  SELECT w1.x AS na, w1.y AS nb, w2.y AS nc
  FROM e w1 JOIN e w2 ON w1.x = w2.x AND w1.y < w2.y
  JOIN e e3 ON e3.x = w1.y AND e3.y = w2.y
),
pn AS (
  SELECT unnest([na, nb, nc]) AS node FROM t
)
SELECT node, count(*) AS n_triangles
FROM pn GROUP BY node
ORDER BY n_triangles DESC, node LIMIT 20
""",
    description="triangle census over the part co-purchase graph "
    "(edges = part pairs sharing >= 2 orders — the bundle-detection "
    "graph): Suri-Vassilvitskii MR triangles with DEGREE orientation, "
    "so wedge fanout per node is bounded by O(sqrt(|E|)) instead of "
    "hub-degree^2 — the difference between a plan that survives a "
    "power-law graph at 100 TB and one that explodes on the first hub; "
    "all equi-joins, per-node counts via a 3-way explode, TakeOrdered "
    "top-20",
)
def graph_triangle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts

    li = load_table(spark, "lineitem", sf_dir)
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = b.select("ok", F.col("pk").alias("src"))
    c = b.select("ok", F.col("pk").alias("dst"))
    edges = (
        a.join(c, "ok")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(edges, topk=20)


from ..operators.robust import _POIS1_CUM as _BOOT_CUM  # noqa: E402

_BOOT_REPS = 32
_BOOT_Z = 1.959963984540054

# the shared Poisson(1) inverse-CDF CASE chain, rendered once for SQL
_BOOT_W_SQL = "CASE " + " ".join(
    f"WHEN u < {p!r} THEN {k}" for k, p in enumerate(_BOOT_CUM)
) + f" ELSE {len(_BOOT_CUM)} END"


@query(
    "bootstrap_ci_order_prices",
    oracle=f"""
WITH reps AS (
  SELECT o_orderkey, o_totalprice, r
  FROM orders CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_REPS - 1})) AS r)
),
drawn AS (
  SELECT r, o_totalprice,
         CAST(CONCAT('0x', substr(md5(CONCAT(CAST(o_orderkey AS VARCHAR), ':',
              CAST(r AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS u
  FROM reps
),
weighted AS (SELECT r, o_totalprice, {_BOOT_W_SQL} AS w FROM drawn),
rep_means AS (
  SELECT r, sum(CAST(w AS DOUBLE) * o_totalprice) / sum(w) AS m
  FROM weighted GROUP BY r
),
se AS (SELECT round(stddev_samp(m), 4) AS boot_se,
              count(*) AS n_reps FROM rep_means),
pt AS (SELECT avg(o_totalprice) AS p FROM orders)
SELECT round(p, 4) AS point, boot_se, n_reps,
       round(p - {_BOOT_Z!r} * boot_se, 4) AS ci_lo,
       round(p + {_BOOT_Z!r} * boot_se, 4) AS ci_hi
FROM se CROSS JOIN pt
""",
    description="Poisson bootstrap CI for the mean order price "
    "(Chamandy et al. 2012): 32 replicates re-weight every row with a "
    "deterministic md5-inverted Poisson(1) count — no global resampling "
    "pass, ONE exchange of O(reps x partitions) partial sums; the "
    "uncertainty-quantification primitive a 100 TB aggregate needs "
    "because exact resampling is a shuffle per replicate",
)
def bootstrap_ci_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import poisson_bootstrap_ci

    orders = load_table(spark, "orders", sf_dir)
    return poisson_bootstrap_ci(
        orders, "o_orderkey", "o_totalprice", reps=_BOOT_REPS, z=_BOOT_Z
    )


@query(
    "customer_rfm_segments",
    # quartile scores are VALUE-based (compare against the exact
    # quartile boundaries), not ntile-based: a global ntile needs a
    # single-partition sort of every customer — the boundary join is
    # the form that scales; boundaries are the same interpolated
    # doubles in both engines (quantile_cont = F.percentile), and every
    # comparison is >= against those shared doubles
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate) // 86400000000) AS r_day,
         count(*) AS f,
         round(sum(o_totalprice), 2) AS m
  FROM orders GROUP BY 1
),
b AS (
  SELECT quantile_cont(r_day, 0.25) AS r1, quantile_cont(r_day, 0.5) AS r2,
         quantile_cont(r_day, 0.75) AS r3,
         quantile_cont(f, 0.25) AS f1, quantile_cont(f, 0.5) AS f2,
         quantile_cont(f, 0.75) AS f3,
         quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
         quantile_cont(m, 0.75) AS m3
  FROM rfm
),
scored AS (
  SELECT o_custkey,
         CASE WHEN r_day >= r3 THEN 1 WHEN r_day >= r2 THEN 2
              WHEN r_day >= r1 THEN 3 ELSE 4 END AS r_score,
         CASE WHEN f >= f3 THEN 1 WHEN f >= f2 THEN 2
              WHEN f >= f1 THEN 3 ELSE 4 END AS f_score,
         CASE WHEN m >= m3 THEN 1 WHEN m >= m2 THEN 2
              WHEN m >= m1 THEN 3 ELSE 4 END AS m_score
  FROM rfm CROSS JOIN b
)
SELECT CASE
         WHEN r_score = 1 AND f_score = 1 THEN \'champion\'
         WHEN r_score = 1 THEN \'recent\'
         WHEN f_score = 1 THEN \'loyal\'
         WHEN r_score = 4 AND f_score = 4 THEN \'lost\'
         ELSE \'regular\' END AS segment,
       count(*) AS n_customers,
       round(avg(r_score), 6) AS avg_r,
       round(avg(f_score), 6) AS avg_f,
       round(avg(m_score), 6) AS avg_m
FROM scored GROUP BY 1
""",
    description="RFM customer segmentation (recency/frequency/monetary "
    "quartiles): one per-customer aggregate, ONE 9-value quartile "
    "aggregate broadcast back, value-based scores by comparison — no "
    "global ntile sort (the textbook form needs a single-partition "
    "window over every customer; this is the shape that survives "
    "100 TB), rule-based segment labels",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    rfm = orders.groupBy("o_custkey").agg(
        F.max(F.expr("unix_micros(o_orderdate) div 86400000000")).alias(
            "r_day"
        ),
        F.count(F.lit(1)).alias("f"),
        F.round(F.sum("o_totalprice"), 2).alias("m"),
    )
    b = rfm.agg(
        *[
            F.percentile(c, q).alias(f"{c[0]}{i + 1}")
            for c in ("r_day", "f", "m")
            for i, q in enumerate((0.25, 0.5, 0.75))
        ]
    )

    def _score(col, lo, mid, hi):
        return (
            F.when(F.col(col) >= F.col(hi), 1)
            .when(F.col(col) >= F.col(mid), 2)
            .when(F.col(col) >= F.col(lo), 3)
            .otherwise(4)
        )

    scored = rfm.join(F.broadcast(b)).select(
        "o_custkey",
        _score("r_day", "r1", "r2", "r3").alias("r_score"),
        _score("f", "f1", "f2", "f3").alias("f_score"),
        _score("m", "m1", "m2", "m3").alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
        .when(F.col("r_score") == 1, "recent")
        .when(F.col("f_score") == 1, "loyal")
        .when((F.col("r_score") == 4) & (F.col("f_score") == 4), "lost")
        .otherwise("regular")
    )
    return scored.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("r_score"), 6).alias("avg_r"),
        F.round(F.avg("f_score"), 6).alias("avg_f"),
        F.round(F.avg("m_score"), 6).alias("avg_m"),
    )


@query(
    "pareto_abc_parts",
    # the cumulative-share window runs over the O(parts) aggregate
    # (parts << lineitems), with rev rounded to 2dp BEFORE ordering so
    # both engines sort identical doubles; partkey tiebreak pins ties
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(rev_c) AS t FROM rev),
cum AS (
  SELECT l_partkey, rev_c,
         CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / t AS cum_share
  FROM rev CROSS JOIN tot
),
cls AS (
  SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
              WHEN cum_share <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev_c
  FROM cum
)
SELECT abc_class, count(*) AS n_parts,
       CAST(sum(rev_c) AS DOUBLE) / 100.0 AS class_revenue
FROM cls GROUP BY 1
""",
    description="ABC/Pareto inventory classification: per-part revenue "
    "aggregate (one map-combined exchange collapses the fact table), "
    "cumulative-share window over the O(parts) domain — the global sort "
    "is over the AGGREGATE, never the fact rows — 80/95% class "
    "boundaries, per-class rollup",
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # exact-cents discipline from the ROW level up: the per-row
    # extended revenue is the same double in both engines (identical
    # inputs, identical multiply), so round(x*100) is the same LONG,
    # and every aggregate above it is order-independent integer math —
    # per-part 2-dp double sums were observed to land on rounding
    # boundaries (1-cent cross-engine diffs in the class rollup)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("rev_c"))
    tot = rev.agg(F.sum("rev_c").alias("t"))
    # cumulative revenue via the two-pass ordered_prefix (range
    # partition desc by revenue + local running sum + broadcast
    # offsets): exact long-cent adds regroup associatively, so the
    # share is bit-identical to the unpartitioned cumulative window
    # this replaces — which would single-partition the O(parts) domain
    from ..operators.rank import ordered_prefix

    cum = ordered_prefix(
        rev,
        [("rev_c", False), ("l_partkey", True)],
        carry=["rev_c"],
        sums=["rev_c"],
    ).join(F.broadcast(tot)).select(
        "rev_c",
        (F.col("__cum_rev_c").cast("double") / F.col("t")).alias(
            "cum_share"
        ),
    )
    cls = F.when(F.col("cum_share") <= 0.8, "A").when(
        F.col("cum_share") <= 0.95, "B"
    ).otherwise("C")
    return cum.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum("rev_c").cast("double") / 100.0).alias("class_revenue"),
    )


@query(
    "graph_link_prediction",
    # id-ordered wedge enumeration (same orientation-invariance argument
    # as graph_triangle_topk's oracle); candidate pairs are distance-2
    # non-edges, scored by neighborhood Jaccard — all integer counts, so
    # the score is the same double in both engines
    oracle="""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS x, c.pk AS y FROM b a JOIN b c
    ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
und AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
deg AS (SELECT x AS node, count(*) AS d FROM und GROUP BY 1),
wedge AS (
  SELECT w1.y AS a, w2.y AS b2, count(*) AS common
  FROM und w1 JOIN und w2 ON w1.x = w2.x AND w1.y < w2.y
  GROUP BY 1, 2
),
cand AS (
  SELECT w.a, w.b2, w.common FROM wedge w
  LEFT JOIN e ON e.x = w.a AND e.y = w.b2
  WHERE e.x IS NULL
)
SELECT c.a AS part_a, c.b2 AS part_b, c.common AS n_common,
       round(c.common / CAST(da.d + db.d - c.common AS DOUBLE), 6)
         AS jaccard
FROM cand c
JOIN deg da ON da.node = c.a
JOIN deg db ON db.node = c.b2
ORDER BY jaccard DESC, part_a, part_b LIMIT 20
""",
    description="link prediction over the co-purchase graph "
    "(common-neighbors Jaccard, the classic recommender baseline): "
    "distance-2 candidate pairs from ONE wedge equi-join at the shared "
    "neighbor, existing edges removed by an anti join, neighborhood "
    "sizes joined back — integer-exact scores, TakeOrdered top-20; the "
    "same bounded-fanout join family as the triangle census",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("x", "y")
    )
    und = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    deg = und.groupBy("x").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("x").alias("node"), "d"
    )
    w1 = und.select(F.col("x").alias("apex"), F.col("y").alias("a"))
    w2 = und.select(F.col("x").alias("apex"), F.col("y").alias("b2"))
    wedge = (
        w1.join(w2, "apex")
        .where(F.col("a") < F.col("b2"))
        .groupBy("a", "b2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        e, (e.x == wedge.a) & (e.y == wedge.b2), "left_anti"
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("node").alias("b2"), F.col("d").alias("__db"))
    return (
        cand.join(da, "a")
        .join(db, "b2")
        .select(
            F.col("a").alias("part_a"),
            F.col("b2").alias("part_b"),
            F.col("common").alias("n_common"),
            F.round(
                F.col("common")
                / (F.col("__da") + F.col("__db") - F.col("common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


_RULES_TOPK = 20
_RULES_MINSUP = 2


@query(
    "assoc_rules_parts",
    oracle=f"""
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_baskets FROM b),
item AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY pk),
pair AS (
  SELECT a.pk AS part_a, c.pk AS part_b, CAST(count(*) AS BIGINT) AS n_pair
  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2
  HAVING count(*) >= {_RULES_MINSUP}
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, n_pair FROM pair
  UNION ALL
  SELECT part_b, part_a, n_pair FROM pair
)
SELECT r.antecedent, r.consequent, r.n_pair,
       round(r.n_pair / n.n_baskets, 6) AS support,
       round(CAST(r.n_pair AS DOUBLE) / ia.n_item, 6) AS confidence,
       round(CAST(r.n_pair AS DOUBLE) * n.n_baskets
             / (CAST(ia.n_item AS DOUBLE) * ic.n_item), 6) AS lift
FROM rules r
JOIN item ia ON ia.pk = r.antecedent
JOIN item ic ON ic.pk = r.consequent
CROSS JOIN n
ORDER BY lift DESC, antecedent, consequent
LIMIT {_RULES_TOPK}
""",
    description="association rules (support / confidence / lift) over "
    "order baskets: the basket_pmi pair shape — equi-keyed on the "
    "basket id, pair work bounded by basket size squared, min-support "
    "pruned BEFORE scoring — then each surviving pair unfolds into both "
    "rule directions in-partition (no extra shuffle); ordering uses the "
    "ROUNDED lift so the top-k cut is engine-deterministic",
)
def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = b.agg(F.count_distinct("ok").cast("double").alias("n_baskets"))
    item = b.groupBy("pk").agg(F.count(F.lit(1)).alias("n_item"))
    a = b.select("ok", F.col("pk").alias("part_a"))
    c = b.select("ok", F.col("pk").alias("part_b"))
    pair = (
        a.join(c, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= _RULES_MINSUP)
    )
    rules = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("antecedent"),
                    F.col("part_b").alias("consequent"),
                    F.col("n_pair"),
                ),
                F.struct(
                    F.col("part_b").alias("antecedent"),
                    F.col("part_a").alias("consequent"),
                    F.col("n_pair"),
                ),
            )
        ).alias("__r")
    ).select("__r.*")
    ia = item.select(
        F.col("pk").alias("antecedent"), F.col("n_item").alias("__na")
    )
    ic = item.select(
        F.col("pk").alias("consequent"), F.col("n_item").alias("__nc")
    )
    scored = (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .join(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_baskets"), 6).alias("support"),
            F.round(
                F.col("n_pair").cast("double") / F.col("__na"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_pair").cast("double")
                * F.col("n_baskets")
                / (F.col("__na").cast("double") * F.col("__nc")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    ).limit(_RULES_TOPK)


_SNM_WINDOW = 3


@query(
    "linkage_sorted_neighborhood",
    oracle=f"""
WITH r AS (
  SELECT c_mktsegment AS block, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
)
SELECT a.block, a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
       round(b.c_acctbal - a.c_acctbal, 2) AS bal_gap
FROM r a
JOIN r b ON a.block = b.block
        AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
""",
    description="sorted-neighborhood candidate generation (Hernandez-"
    "Stolfo SNM) — BENCH r11 note: 0.28 s (r10) -> ~0.7 s, the cost "
    "of the round-11 correctness fix that eagerly freezes __pid "
    "before consumers (AQE could re-coalesce re-executions of the "
    "range exchange differently, inflating pair counts ~8%); the "
    "checkpoint is the price of a deterministic rank layout and "
    "stays: within each segment, pair every customer with its 3 "
    "nearest neighbors in account-balance sort order — O(n * w) pairs "
    "by construction; the Spark plan explodes rank+offset probe keys "
    "so candidates come from a pure EQUI-join on (block, rank), no "
    "inequality self-join (operators/linkage.py:"
    "sorted_neighborhood_pairs); the oracle runs the definitional "
    "BETWEEN join",
)
def linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import sorted_neighborhood_pairs

    cust = load_table(spark, "customer", sf_dir)
    pairs = sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        block_col="c_mktsegment",
        order_by=["c_acctbal"],
        window=_SNM_WINDOW,
        carry=["c_acctbal"],
    )
    return pairs.select(
        "block",
        "id_a",
        "id_b",
        "rank_gap",
        F.round(
            F.col("c_acctbal_b") - F.col("c_acctbal_a"), 2
        ).alias("bal_gap"),
    )


@query(
    "graph_bfs_levels",
    # the whole walk is integer set algebra, so the oracle can be the
    # DEFINITION: a recursive CTE enumerating (node, lvl) pairs with
    # UNION set semantics, min(lvl) = BFS distance
    oracle="""
WITH RECURSIVE
b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS x, c.pk AS y FROM b a JOIN b c
    ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
und AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
seed AS (SELECT min(x) AS node FROM und),
w(node, lvl) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT u.y, w.lvl + 1 FROM w JOIN und u ON u.x = w.node WHERE w.lvl < 3
)
SELECT node, CAST(min(lvl) AS INTEGER) AS level
FROM w GROUP BY node
""",
    description="BFS hop distance (<=3) from the smallest part in the "
    "co-purchase graph: frontier-based expansion — each iteration "
    "joins ONLY the new frontier against the adjacency and anti-joins "
    "the visited set, so per-hop cost is frontier out-degree, never "
    "visited x edges; all-integer levels, nothing to round "
    "(operators/graph.py:bfs_levels); the oracle is the definitional "
    "recursive CTE",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_levels

    li = load_table(spark, "lineitem", sf_dir)
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("x", "y")
    )
    und = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    edges = und.select(F.col("x").alias("src"), F.col("y").alias("dst"))
    seeds = und.agg(F.min("x").alias("node"))
    return bfs_levels(edges, seeds, max_depth=3)


_SNM_BAL_TOL = 50.0

# One SNM match pipeline feeds BOTH linkage entries (the exported-index
# pattern, exports.py): ``linkage_snm_clusters`` is the PRODUCER — it
# runs SNM blocking -> match rule -> two-star components and exports
# the labeled (c_custkey, c_mktsegment, c_acctbal, entity_id) table,
# i.e. the entity index a production MDM pipeline persists anyway;
# ``linkage_golden_record`` is a CONSUMER — survivorship over the
# exported index, its oracle re-deriving from the same parquet the way
# the PQ/IVF oracles consume exported codebooks. Before this split the
# two bench queries recomputed one byte-identical SNM->match->CC
# pipeline end-to-end (38.4 s + 34.3 s at sf0.1 = 26% of the whole
# bench). The memo keys on sf_dir so a consumer in a process that never
# ran the producer — or ran it at a different scale — rebuilds itself.
_SNM_ENTITY_EXPORT = "linkage_snm_entities"
_snm_entity_sf: str | None = None


def _build_snm_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCER: run the full SNM linkage pipeline and export the
    labeled entity table; returns the read-back frame.

    Components come from ``snm_tolerance_components`` — the SNM
    tolerance graph has interval structure (any window edge implies
    its consecutive-rank sub-edges; IEEE-rigorous, see the operator
    docstring), so entity labels are ONE segmented gaps-and-islands
    pass instead of the 9-round two-star contraction the sf0.1 chain
    graph used to need (28 s -> ~4 s of this entry's bench time). The
    definitional recursive-closure oracle below is UNCHANGED: every
    hash-green round re-proves the equivalence; the generic CC engine
    keeps its own pins (tests/test_components.py) and its consumers
    (mutual-kNN, near-dup resolve) where no sort-key structure exists.
    """
    global _snm_entity_sf
    from ..exports import export_table
    from ..operators.linkage import snm_tolerance_components

    cust = load_table(spark, "customer", sf_dir)
    comp = snm_tolerance_components(
        cust,
        id_col="c_custkey",
        block_col="c_mktsegment",
        order_col="c_acctbal",
        tol=_SNM_BAL_TOL,
    )
    lab = (
        cust.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(comp, cust["c_custkey"] == comp["id"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.coalesce("component", "c_custkey").alias("entity_id"),
        )
    )
    out = export_table(lab, _SNM_ENTITY_EXPORT)
    _snm_entity_sf = sf_dir
    return out


def _snm_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSUMER view of the exported entity table: reuse the index this
    process already built at ``sf_dir``, else build it."""
    if _snm_entity_sf == sf_dir:
        from ..exports import export_path

        return spark.read.parquet(export_path(_SNM_ENTITY_EXPORT))
    return _build_snm_entities(spark, sf_dir)


@query(
    "linkage_snm_clusters",
    # the oracle is the DEFINITION end-to-end: the SNM BETWEEN join for
    # candidates, the match rule, and a recursive-CTE transitive
    # closure with min-label components (UNION set semantics bounds the
    # walk; per-component state is size^2 over tiny match clusters)
    oracle=f"""
WITH RECURSIVE
r0 AS MATERIALIZED (
  SELECT c_mktsegment AS blk, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
),
e0 AS MATERIALIZED (
  SELECT a.c_custkey AS x, b.c_custkey AS y
  FROM r0 a JOIN r0 b
    ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
  WHERE abs(b.c_acctbal - a.c_acctbal) <= {_SNM_BAL_TOL!r}
),
e AS MATERIALIZED (SELECT x, y FROM e0 UNION ALL SELECT y AS x, x AS y FROM e0),
n AS (SELECT DISTINCT x AS node FROM e),
w(node, lbl) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.y, w.lbl FROM w JOIN e ON e.x = w.node
),
comp AS (SELECT node, min(lbl) AS entity FROM w GROUP BY node),
sel AS (
  SELECT c.c_custkey, COALESCE(comp.entity, c.c_custkey) AS entity_id
  FROM customer c LEFT JOIN comp ON c.c_custkey = comp.node
)
SELECT c_custkey, entity_id,
       CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT) AS n_members
FROM sel
""",
    description="end-to-end entity resolution: SNM blocking (window-3 "
    "balance-sorted neighbors per segment) -> match rule (balance "
    "within 50) -> connected-component entity ids in ONE segmented "
    "gaps-and-islands pass (the tolerance graph has interval "
    "structure: every window edge implies its consecutive-rank "
    "sub-edges because IEEE subtraction rounds monotonically, so "
    "components are exactly the maximal adjacent-gap<=tol runs — no "
    "iterative contraction; operators/linkage.py:"
    "snm_tolerance_components) -> every customer labeled with its "
    "entity and cluster size (singletons = own id); the composition "
    "a dedup/linkage pipeline actually ships; the oracle re-derives "
    "the whole pipeline definitionally with a recursive-CTE "
    "transitive closure over the WINDOWED match graph, so every "
    "hash-green round re-proves the islands/closure equivalence",
)
def linkage_snm_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # This entry is the PRODUCER of the exported entity index
    # (_build_snm_entities); linkage_golden_record consumes it.
    labeled = _build_snm_entities(spark, sf_dir).select(
        "c_custkey", "entity_id"
    )
    sizes = labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return labeled.join(sizes, "entity_id").select(
        "c_custkey", "entity_id", "n_members"
    )


_RI_CHECKS = [
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey -> customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey -> region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]


@query(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS relation,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       round(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS orphan_rate
FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        for name, child, fk, parent, pk in _RI_CHECKS
    ),
    description="referential-integrity audit across the whole star "
    "schema: per foreign-key relation, child count, orphan count "
    "(child keys with no parent), and orphan rate — the first DQ gate "
    "a warehouse load runs; each relation is one left join against a "
    "unique parent key (no row multiplication) with map-combined "
    "counts, dimensions broadcast",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    parts = []
    for name, child, fk, parent, pk in _RI_CHECKS:
        c = load_table(spark, child, sf_dir).select(F.col(fk))
        p = load_table(spark, parent, sf_dir).select(
            F.col(pk), F.lit(1).alias("__hit")
        )
        j = c.join(F.broadcast(p), c[fk] == p[pk], "left")
        orphans = F.sum(F.col("__hit").isNull().cast("long"))
        parts.append(
            j.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).alias("n_child"),
                orphans.alias("n_orphans"),
                F.round(
                    orphans / F.count(F.lit(1)).cast("double"), 6
                ).alias("orphan_rate"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


_PK_CHECKS = [
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("customer.c_custkey", "customer", "c_custkey"),
    ("part.p_partkey", "part", "p_partkey"),
    ("supplier.s_suppkey", "supplier", "s_suppkey"),
    ("nation.n_nationkey", "nation", "n_nationkey"),
    ("region.r_regionkey", "region", "r_regionkey"),
    ("events.event_id", "events", "event_id"),
    ("documents.doc_id", "documents", "doc_id"),
    ("embeddings.vec_id", "embeddings", "vec_id"),
]


@query(
    "dq_uniqueness_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS key_col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(count(*) - count(DISTINCT {col}) AS BIGINT) AS n_dup_rows,
       count(*) = count(DISTINCT {col}) AS is_unique
FROM {table}"""
        for name, table, col in _PK_CHECKS
    ),
    description="primary-key uniqueness audit across every fixture "
    "table (row count vs distinct-key count, duplicate surplus, pass "
    "flag) — the DQ gate that pairs with dq_referential_integrity: "
    "RI assumes unique parents, this proves it; one map-combined "
    "count-distinct per table, no joins",
)
def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    parts = []
    for name, table, col in _PK_CHECKS:
        t = load_table(spark, table, sf_dir)
        parts.append(
            t.agg(
                F.lit(name).alias("key_col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col(col)).alias("n_distinct"),
                (F.count(F.lit(1)) - F.count_distinct(F.col(col))).alias(
                    "n_dup_rows"
                ),
                (
                    F.count(F.lit(1)) == F.count_distinct(F.col(col))
                ).alias("is_unique"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "dq_freshness_audit",
    oracle="""
WITH m AS (
  SELECT 'events.ts' AS time_col, max(ts) AS mx FROM events
  UNION ALL
  SELECT 'orders.o_orderdate', max(o_orderdate) FROM orders
  UNION ALL
  SELECT 'lineitem.l_shipdate', max(l_shipdate) FROM lineitem
),
g AS (SELECT max(mx) AS gmx FROM m)
SELECT time_col,
       strftime(mx, '%Y-%m-%d %H:%M:%S') AS latest,
       CAST(date_diff('day', CAST(mx AS DATE), CAST(gmx AS DATE))
            AS INTEGER) AS lag_days
FROM m CROSS JOIN g
""",
    description="data-freshness audit: each time-bearing table's latest "
    "timestamp and its staleness in days behind the freshest feed — "
    "the third DQ gate (after uniqueness and referential integrity) a "
    "warehouse load runs; three map-combined max aggregates, one 1-row "
    "broadcast, calendar-day lag via DATE casts (engine-identical, no "
    "boundary-counting ambiguity)",
)
def dq_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    srcs = [
        ("events.ts", "events", "ts"),
        ("orders.o_orderdate", "orders", "o_orderdate"),
        ("lineitem.l_shipdate", "lineitem", "l_shipdate"),
    ]
    maxes = [
        load_table(spark, t, sf_dir).agg(
            F.lit(name).alias("time_col"), F.max(c).alias("__mx")
        )
        for name, t, c in srcs
    ]
    m = functools.reduce(lambda a, b: a.unionByName(b), maxes)
    g = m.agg(F.max("__mx").alias("__gmx"))
    return m.join(F.broadcast(g)).select(
        "time_col",
        F.date_format("__mx", "yyyy-MM-dd HH:mm:ss").alias("latest"),
        F.datediff(F.to_date("__gmx"), F.to_date("__mx"))
        .cast("int")
        .alias("lag_days"),
    )


@query(
    "lorenz_customer_spend",
    oracle="""
WITH totals AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS x
  FROM orders GROUP BY 1
),
r AS (
  SELECT x, ntile(10) OVER (ORDER BY x, o_custkey) AS decile FROM totals
),
d AS (
  SELECT CAST(decile AS INTEGER) AS decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         round(sum(x), 2) AS spend
  FROM r GROUP BY 1
),
t AS (SELECT CAST(sum(n_customers) AS BIGINT) AS tn,
             round(sum(spend), 2) AS tspend FROM d)
SELECT decile, n_customers, spend,
       round(sum(n_customers) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) / CAST(t.tn AS DOUBLE), 6)
         AS cum_share_customers,
       round(sum(spend) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) / t.tspend, 6)
         AS cum_share_spend
FROM d CROSS JOIN t
""",
    description="Lorenz curve points for customer spend (ascending "
    "spend deciles vs cumulative spend share) — the visualization "
    "table behind gini_customer_spend's single number; per-customer "
    "totals reduce first, the decile walk runs on 10 rows",
)
def lorenz_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.rank import exact_ntile

    orders = load_table(spark, "orders", sf_dir)
    totals = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("x")
    )
    # the decile assignment over O(customers) rows uses the two-pass
    # exact_ntile (range partition + local rank + broadcast offsets) —
    # a global ntile would single-partition every customer, the shape
    # this file's own customer_rfm_segments pin refuses; only the
    # 10-row decile frame below ever enters an unpartitioned window
    r = exact_ntile(
        totals,
        10,
        [("x", True), ("o_custkey", True)],
        carry=["x"],
        tile_col="decile",
    )
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("x"), 2).alias("spend"),
    )
    t = d.agg(
        F.sum("n_customers").alias("__tn"),
        F.round(F.sum("spend"), 2).alias("__tspend"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.join(F.broadcast(t)).select(
        "decile",
        "n_customers",
        "spend",
        F.round(
            F.sum("n_customers").over(wc) / F.col("__tn").cast("double"), 6
        ).alias("cum_share_customers"),
        F.round(F.sum("spend").over(wc) / F.col("__tspend"), 6).alias(
            "cum_share_spend"
        ),
    )


# shared co-purchase edge CTE prefix (the same graph every graph_* entry
# derives: part pairs sharing >= 2 orders)
_COPURCHASE_E = """
b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT a.pk AS x, c.pk AS y FROM b a JOIN b c
    ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
und AS (SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
deg AS (SELECT x AS node, count(*) AS d FROM und GROUP BY 1)
"""


@query(
    "graph_degree_assortativity",
    oracle=f"""
WITH {_COPURCHASE_E}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       CAST(count(*) / 2 AS BIGINT) AS n_edges,
       round(corr(CAST(da.d AS DOUBLE), CAST(db.d AS DOUBLE)), 6)
         AS assortativity
FROM und JOIN deg da ON da.node = und.x JOIN deg db ON db.node = und.y
""",
    description="degree assortativity of the part co-purchase graph "
    "(Newman 2002): Pearson correlation of endpoint degrees over every "
    "edge in both directions — positive = hubs link hubs, negative = "
    "hub-and-spoke; the one-number screen for whether hub salting / "
    "degree orientation will matter on this graph at scale; exact "
    "integer degrees, two equi-joins onto the O(|V|) degree table, one "
    "corr aggregate (operators/graph.py:degree_assortativity)",
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import degree_assortativity

    li = load_table(spark, "lineitem", sf_dir)
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select(F.col("x").alias("src"), F.col("y").alias("dst"))
    )
    return degree_assortativity(e)


@query(
    "graph_clustering_topk",
    # id-ordered triangle closure in the oracle (orientation-invariant
    # triangle SET — the graph_triangle_topk argument); coefficient is
    # an exact ratio of integers
    oracle=f"""
WITH {_COPURCHASE_E},
t AS (
  SELECT w1.x AS na, w1.y AS nb, w2.y AS nc
  FROM e w1 JOIN e w2 ON w1.x = w2.x AND w1.y < w2.y
  JOIN e e3 ON e3.x = w1.y AND e3.y = w2.y
),
pn AS (SELECT unnest([na, nb, nc]) AS node FROM t),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       FROM pn GROUP BY 1)
SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
       COALESCE(tc.n_triangles, 0) AS n_triangles,
       round(2.0 * COALESCE(tc.n_triangles, 0)
             / CAST(deg.d * (deg.d - 1) AS DOUBLE), 6)
         AS clustering_coeff
FROM deg LEFT JOIN tc USING (node)
WHERE deg.d >= 2
ORDER BY clustering_coeff DESC, node LIMIT 20
""",
    description="local clustering coefficient top-20 over the part "
    "co-purchase graph (Watts-Strogatz 2 T(v) / (d (d-1))): the "
    "bundle-vs-hub-artifact screen — a dense neighborhood is a real "
    "product bundle, a hub with coefficient ~0 is an artifact; "
    "triangles via the degree-oriented O(sqrt(|E|))-fanout census "
    "(same engine as graph_triangle_topk), degrees from one "
    "map-combined aggregate, exact integer ratio, TakeOrdered top-20 "
    "(operators/graph.py:clustering_coefficients)",
)
def graph_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import clustering_coefficients

    li = load_table(spark, "lineitem", sf_dir)
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select(F.col("x").alias("src"), F.col("y").alias("dst"))
    )
    return clustering_coefficients(e, min_degree=2, topk=20)


# Accepted-values contracts (dbt-style): the business-legal domain per
# categorical column. events.event_type deliberately EXCLUDES 'error' —
# error events are telemetry, not business events, so the audit counts
# them as contract violations (a non-vacuous gate).
_AV_RULES: list[tuple[str, str, str, list[str]]] = [
    ("orders.o_orderstatus", "orders", "o_orderstatus", ["F", "O", "P"]),
    (
        "orders.o_orderpriority",
        "orders",
        "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    ),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag", ["A", "N", "R"]),
    ("lineitem.l_linestatus", "lineitem", "l_linestatus", ["F", "O"]),
    (
        "events.event_type",
        "events",
        "event_type",
        ["view", "click", "purchase", "signup"],
    ),
    ("documents.lang", "documents", "lang", ["en", "de", "es", "fr", "zh"]),
]


def _av_sql(name: str, table: str, col: str, vals: list[str]) -> str:
    inlist = ", ".join(f"'{v}'" for v in vals)
    return f"""SELECT '{name}' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {col} IN ({inlist}) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_violations,
       round(CAST(sum(CASE WHEN {col} IN ({inlist}) THEN 0 ELSE 1 END)
                  AS DOUBLE) / count(*), 6) AS violation_share,
       sum(CASE WHEN {col} IN ({inlist}) THEN 0 ELSE 1 END) = 0 AS passes
FROM {table}"""


@query(
    "dq_accepted_values_audit",
    oracle="\nUNION ALL\n".join(_av_sql(*r) for r in _AV_RULES),
    description="accepted-values audit (the dbt accepted_values test "
    "shape) over six categorical contract columns: per rule the row "
    "count, out-of-domain count (NULL counts as a violation — CASE "
    "falls to ELSE), violation share, and pass flag; events.event_type "
    "deliberately excludes 'error' so the gate is non-vacuous; one "
    "map-combined aggregate per table, no joins — completes the "
    "uniqueness / referential-integrity / freshness DQ quartet",
)
def dq_accepted_values_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    parts = []
    for name, table, col, vals in _AV_RULES:
        t = load_table(spark, table, sf_dir)
        viol = F.when(F.col(col).isin(vals), 0).otherwise(1)
        parts.append(
            t.agg(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(viol).alias("n_violations"),
                F.round(
                    F.sum(viol).cast("double") / F.count(F.lit(1)), 6
                ).alias("violation_share"),
                (F.sum(viol) == 0).alias("passes"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "linkage_golden_record",
    oracle=f"""
WITH lab AS (SELECT * FROM {export_sql('linkage_snm_entities')}),
sz AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
       FROM lab GROUP BY 1),
g AS (
  SELECT lab.*, row_number() OVER (PARTITION BY entity_id
                                   ORDER BY c_acctbal DESC, c_custkey)
           AS rk
  FROM lab
)
SELECT g.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(n_members) AS BIGINT) AS n_records,
       CAST(sum(CASE WHEN n_members > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_multi_entities,
       CAST(sum(n_members) - count(*) AS BIGINT) AS n_absorbed,
       round(avg(c_acctbal), 6) AS avg_golden_bal
FROM g JOIN sz USING (entity_id) WHERE rk = 1
GROUP BY 1
""",
    description="survivorship (golden-record selection) on top of the "
    "SNM entity clusters: per entity the canonical record is the "
    "highest-balance member (custkey tiebreak — a deterministic "
    "most-complete-record rule), reported per segment as entity/record/"
    "absorption counts and the mean canonical balance — the master-"
    "data step AFTER match+cluster that linkage pipelines actually "
    "ship; a CONSUMER of the entity index linkage_snm_clusters "
    "produces and exports (clustering itself — SNM blocking, match "
    "rule, two-star components — is verified end-to-end by that "
    "entry's definitional oracle); survivorship is one per-entity "
    "window over the O(entities) exported frame, and the oracle "
    "re-derives it from the same parquet the way the PQ/IVF oracles "
    "consume exported codebooks (operators/linkage.py + exports.py)",
)
def linkage_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    lab = _snm_entities(spark, sf_dir)
    sz = lab.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    g = lab.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") == 1
    )
    return (
        g.join(sz, "entity_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.sum("n_members").alias("n_records"),
            F.sum((F.col("n_members") > 1).cast("long")).alias(
                "n_multi_entities"
            ),
            (F.sum("n_members") - F.count(F.lit(1))).alias("n_absorbed"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_golden_bal"),
        )
    )


@query(
    "graph_modularity_brands",
    oracle=f"""
WITH {_COPURCHASE_E},
cls AS (SELECT p_partkey AS node, p_brand AS cls FROM part),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
dn AS (SELECT deg.node, d, cls FROM deg JOIN cls USING (node)),
intra AS (
  SELECT ca.cls, CAST(count(*) AS BIGINT) AS e_c
  FROM e JOIN cls ca ON ca.node = e.x JOIN cls cb ON cb.node = e.y
  WHERE ca.cls = cb.cls GROUP BY 1
),
dsum AS (SELECT cls, CAST(sum(d) AS BIGINT) AS d_c,
                CAST(count(*) AS BIGINT) AS n_nodes
         FROM dn GROUP BY 1),
per AS (
  SELECT dsum.cls AS brand, n_nodes, COALESCE(e_c, 0) AS intra_edges,
         d_c,
         CAST(COALESCE(e_c, 0) AS DOUBLE) / m.m
           - (CAST(d_c AS DOUBLE) / (2 * m.m))
             * (CAST(d_c AS DOUBLE) / (2 * m.m)) AS qc
  FROM dsum LEFT JOIN intra USING (cls) CROSS JOIN m
)
SELECT brand, n_nodes, intra_edges, d_c AS degree_sum,
       round(qc, 6) AS q_contrib,
       (SELECT round(sum(qc), 6) FROM per) AS modularity
FROM per
""",
    description="Newman modularity of the brand partition over the part "
    "co-purchase graph: Q = sum_c (e_c/m - (d_c/2m)^2) — do brands form "
    "real co-purchase communities or is the partition no better than "
    "chance (Q ~ 0)? The partition-quality readout behind any "
    "community/segment claim; per-brand contributions plus the total "
    "(chi2 convention), all exact integer edge/degree counts, two "
    "broadcast class joins — never a community-detection iteration",
)
def graph_modularity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("cls")
    )
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("x", "y")
    )
    und = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    deg = und.groupBy("x").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("x").alias("node"), "d"
    )
    m = e.agg(F.count(F.lit(1)).alias("m"))
    ca = part.select(F.col("node").alias("x"), F.col("cls").alias("__ca"))
    cb = part.select(F.col("node").alias("y"), F.col("cls").alias("__cb"))
    intra = (
        e.join(F.broadcast(ca), "x")
        .join(F.broadcast(cb), "y")
        .where(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("cls"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    dsum = (
        deg.join(F.broadcast(part), "node")
        .groupBy("cls")
        .agg(
            F.sum("d").alias("d_c"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
    )
    half = F.col("d_c").cast("double") / (2 * F.col("m"))
    per = (
        dsum.join(intra, "cls", "left")
        .join(F.broadcast(m))
        .select(
            F.col("cls").alias("brand"),
            "n_nodes",
            F.coalesce("e_c", F.lit(0)).alias("intra_edges"),
            F.col("d_c").alias("degree_sum"),
            (
                F.coalesce("e_c", F.lit(0)).cast("double") / F.col("m")
                - half * half
            ).alias("__qc"),
        )
    )
    tot = per.agg(F.round(F.sum("__qc"), 6).alias("modularity"))
    return per.join(F.broadcast(tot)).select(
        "brand",
        "n_nodes",
        "intra_edges",
        "degree_sum",
        F.round("__qc", 6).alias("q_contrib"),
        "modularity",
    )


@query(
    "price_index_fisher",
    # unit prices derive from EXACT integer cents (round(ext*100) per
    # row is the same long in both engines) over exact integral
    # quantity sums, so every p*q product is the identical double; the
    # index ratios round 6 dp. Matched-sample discipline: only parts
    # traded in BOTH the base year and year t enter year t's basket.
    oracle="""
WITH py AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_partkey,
         sum(l_quantity) AS q,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1, 2
),
p AS (SELECT yr, l_partkey, q, (rev_c / 100.0) / q AS up FROM py),
b AS (SELECT min(yr) AS base_yr FROM p),
pb AS (SELECT p.* FROM p CROSS JOIN b WHERE p.yr = b.base_yr),
m AS (
  SELECT t.yr, t.l_partkey, t.up AS p_t, t.q AS q_t,
         pb.up AS p_0, pb.q AS q_0
  FROM p t JOIN pb ON pb.l_partkey = t.l_partkey
  CROSS JOIN b WHERE t.yr <> b.base_yr
),
ix AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n_matched_parts,
         sum(p_t * q_0) / sum(p_0 * q_0) AS laspeyres,
         sum(p_t * q_t) / sum(p_0 * q_t) AS paasche
  FROM m GROUP BY yr
)
SELECT yr, n_matched_parts,
       round(laspeyres, 6) AS laspeyres,
       round(paasche, 6) AS paasche,
       round(sqrt(laspeyres * paasche), 6) AS fisher
FROM ix
""",
    description="Fisher price index by ship year (the economic-series "
    "operator a FRED-style pipeline publishes): Laspeyres (base-year "
    "basket) and Paasche (current basket) from matched-sample unit "
    "prices, Fisher = their geometric mean — base-period bias bracketed "
    "from both sides; unit prices come from exact integer cents over "
    "exact integral quantity sums (identical doubles in both engines), "
    "one map-combined (year, part) collapse then a broadcast base-year "
    "join — the fact table is read once",
)
def price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    py = li.groupBy(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    ).agg(
        F.sum("l_quantity").alias("q"),
        F.sum(cents).alias("rev_c"),
    )
    p = py.select(
        "yr",
        "l_partkey",
        "q",
        ((F.col("rev_c") / 100.0) / F.col("q")).alias("up"),
    )
    b = p.agg(F.min("yr").alias("base_yr"))
    pb = p.join(F.broadcast(b)).where(
        F.col("yr") == F.col("base_yr")
    ).select(
        "l_partkey", F.col("up").alias("p_0"), F.col("q").alias("q_0")
    )
    m = (
        p.join(F.broadcast(b))
        .where(F.col("yr") != F.col("base_yr"))
        .join(pb, "l_partkey")
        .select(
            "yr",
            F.col("up").alias("p_t"),
            F.col("q").alias("q_t"),
            "p_0",
            "q_0",
        )
    )
    ix = m.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_matched_parts"),
        (
            F.sum(F.col("p_t") * F.col("q_0"))
            / F.sum(F.col("p_0") * F.col("q_0"))
        ).alias("__l"),
        (
            F.sum(F.col("p_t") * F.col("q_t"))
            / F.sum(F.col("p_0") * F.col("q_t"))
        ).alias("__p"),
    )
    return ix.select(
        "yr",
        "n_matched_parts",
        F.round("__l", 6).alias("laspeyres"),
        F.round("__p", 6).alias("paasche"),
        F.round(F.sqrt(F.col("__l") * F.col("__p")), 6).alias("fisher"),
    )


@query(
    "price_index_chained",
    # adjacent-year Fisher links chained by exp(sum(ln)) — the KM
    # product-limit discipline (links are strictly positive); unit
    # prices from exact integer cents as in price_index_fisher
    oracle="""
WITH py AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_partkey,
         sum(l_quantity) AS q,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1, 2
),
p AS (SELECT yr, l_partkey, q, (rev_c / 100.0) / q AS up FROM py),
m AS (
  SELECT t.yr, t.l_partkey, t.up AS p_t, t.q AS q_t,
         b.up AS p_0, b.q AS q_0
  FROM p t JOIN p b ON b.l_partkey = t.l_partkey AND b.yr = t.yr - 1
),
lk AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n_matched_parts,
         sqrt((sum(p_t * q_0) / sum(p_0 * q_0))
              * (sum(p_t * q_t) / sum(p_0 * q_t))) AS link
  FROM m GROUP BY yr
)
SELECT yr, n_matched_parts,
       round(link, 6) AS link_fisher,
       round(exp(sum(ln(link)) OVER (ORDER BY yr
             ROWS UNBOUNDED PRECEDING)), 6) AS chained_index
FROM lk
""",
    description="chain-linked Fisher price index: adjacent-year links "
    "from matched-sample unit prices (each year's basket compares to "
    "its OWN previous year, so new/retired parts enter and leave the "
    "basket gracefully — the fixed-base index silently shrinks its "
    "matched sample), chained with the exp(sum(ln)) product-limit walk "
    "over the O(years) link frame; this is how national statistics "
    "offices actually publish price series — the natural second "
    "economic-series operator after price_index_fisher",
)
def price_index_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    py = li.groupBy(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    ).agg(
        F.sum("l_quantity").alias("q"),
        F.sum(cents).alias("rev_c"),
    )
    p = py.select(
        "yr",
        "l_partkey",
        "q",
        ((F.col("rev_c") / 100.0) / F.col("q")).alias("up"),
    )
    t = p.select(
        "yr", "l_partkey",
        F.col("up").alias("p_t"), F.col("q").alias("q_t"),
    )
    b = p.select(
        (F.col("yr") + 1).alias("yr"), "l_partkey",
        F.col("up").alias("p_0"), F.col("q").alias("q_0"),
    )
    m = t.join(b, ["yr", "l_partkey"])
    lk = m.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_matched_parts"),
        F.sqrt(
            (
                F.sum(F.col("p_t") * F.col("q_0"))
                / F.sum(F.col("p_0") * F.col("q_0"))
            )
            * (
                F.sum(F.col("p_t") * F.col("q_t"))
                / F.sum(F.col("p_0") * F.col("q_t"))
            )
        ).alias("__link"),
    )
    w = Window.orderBy("yr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lk.select(
        "yr",
        "n_matched_parts",
        F.round("__link", 6).alias("link_fisher"),
        F.round(F.exp(F.sum(F.log("__link")).over(w)), 6).alias(
            "chained_index"
        ),
    )


@query(
    "market_hhi_suppliers",
    # exact-cents revenue (the pareto_abc discipline: round(x*100) per
    # row is the same long in both engines), shares are ratios of exact
    # integers, HHI a sum of their squares rounded 6 dp
    oracle="""
WITH r AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_c
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT yr, CAST(sum(rev_c) AS BIGINT) AS tot FROM r GROUP BY 1)
SELECT r.yr, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum((CAST(rev_c AS DOUBLE) / tot)
                 * (CAST(rev_c AS DOUBLE) / tot)), 6) AS hhi,
       round(1.0 / sum((CAST(rev_c AS DOUBLE) / tot)
                       * (CAST(rev_c AS DOUBLE) / tot)), 6)
         AS n_effective
FROM r JOIN t USING (yr) GROUP BY r.yr
""",
    description="Herfindahl-Hirschman market concentration by ship "
    "year: supplier revenue shares squared and summed (antitrust's "
    "concentration statistic; 1/HHI = effective number of competitors) "
    "— the market-structure reading of the same concentration story "
    "gini_customer_spend tells for demand; one map-combined (year, "
    "supplier) collapse, the O(years) totals broadcast back, exact "
    "integer cents throughout",
)
def market_hhi_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    r = li.groupBy(
        F.year("l_shipdate").alias("yr"), "l_suppkey"
    ).agg(F.sum(cents).alias("rev_c"))
    t = r.groupBy("yr").agg(F.sum("rev_c").alias("tot"))
    share = F.col("rev_c").cast("double") / F.col("tot")
    return (
        r.join(F.broadcast(t), "yr")
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
            F.round(F.lit(1.0) / F.sum(share * share), 6).alias(
                "n_effective"
            ),
        )
    )


@query(
    "supplier_scorecard",
    # exact-cents revenue, integer counts, value-rank tiebroken by
    # supplier key; top-20 by revenue with return-rate and share
    oracle="""
WITH r AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_c,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned
  FROM lineitem GROUP BY 1
),
t AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot FROM r)
SELECT l_suppkey, n_items,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       round(CAST(n_returned AS DOUBLE) / n_items, 6) AS return_share,
       round(CAST(rev_c AS DOUBLE) / tot, 6) AS revenue_share
FROM r CROSS JOIN t
ORDER BY rev_c DESC, l_suppkey LIMIT 20
""",
    description="supplier scorecard top-20 by revenue: exact-cents "
    "revenue, item count, return-flag rate (the quality signal next to "
    "the volume signal), corpus revenue share — the vendor-management "
    "readout joining what q15_top_supplier ranks with what the return "
    "flags say about it; one map-combined per-supplier collapse, a "
    "1-row total broadcast, TakeOrdered top-20",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    r = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(cents).alias("__rev_c"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias(
            "__n_ret"
        ),
    )
    t = r.agg(F.sum("__rev_c").alias("__tot"))
    return (
        r.join(F.broadcast(t))
        .select(
            "l_suppkey",
            "n_items",
            (F.col("__rev_c").cast("double") / 100.0).alias("revenue"),
            F.round(
                F.col("__n_ret").cast("double") / F.col("n_items"), 6
            ).alias("return_share"),
            F.round(
                F.col("__rev_c").cast("double") / F.col("__tot"), 6
            ).alias("revenue_share"),
            F.col("__rev_c").alias("__rc"),
        )
        .orderBy(F.desc("__rc"), F.asc("l_suppkey"))
        .limit(20)
        .drop("__rc")
    )


@query(
    "nation_trade_balance",
    # exact-cents revenue on both sides; each side is one fact pass
    # with broadcast dims, the balance an exact integer difference
    oracle="""
WITH exp AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                             * 100) AS BIGINT)) AS BIGINT) AS exp_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1
),
imp AS (
  SELECT n.n_name AS nation,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                             * 100) AS BIGINT)) AS BIGINT) AS imp_c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
)
SELECT COALESCE(exp.nation, imp.nation) AS nation,
       CAST(COALESCE(exp_c, 0) AS DOUBLE) / 100.0 AS exports,
       CAST(COALESCE(imp_c, 0) AS DOUBLE) / 100.0 AS imports,
       CAST(COALESCE(exp_c, 0) - COALESCE(imp_c, 0) AS DOUBLE) / 100.0
         AS balance,
       round(CAST(COALESCE(exp_c, 0) AS DOUBLE)
             / greatest(CAST(COALESCE(imp_c, 0) AS DOUBLE), 1.0), 6)
         AS coverage_ratio
FROM exp FULL OUTER JOIN imp ON exp.nation = imp.nation
""",
    description="nation trade balance: revenue supplied BY each "
    "nation's suppliers (exports) vs revenue ordered BY its customers "
    "(imports), balance and export/import coverage ratio — the "
    "macro-economic readout of the star schema a FRED-style dashboard "
    "sits next to; two independent fact passes with broadcast "
    "dimension chains (never a supplier x customer join), exact "
    "integer cents, one tiny full-outer merge on the nation domain",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    exp = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == sup["s_suppkey"],
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("exp_c"))
    )
    imp = (
        # orders is a FACT side — no broadcast hint; Catalyst/AQE picks
        # (broadcast at fixture scale, shuffle join at 100 TB)
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("imp_c"))
    )
    e = F.coalesce("exp_c", F.lit(0))
    i = F.coalesce("imp_c", F.lit(0))
    return exp.join(imp, "nation", "full_outer").select(
        "nation",
        (e.cast("double") / 100.0).alias("exports"),
        (i.cast("double") / 100.0).alias("imports"),
        ((e - i).cast("double") / 100.0).alias("balance"),
        F.round(
            e.cast("double") / F.greatest(i.cast("double"), F.lit(1.0)),
            6,
        ).alias("coverage_ratio"),
    )


# Wilson 95% z pinned as one full-precision literal shared with the SQL
# mirror (scipy.stats.norm.ppf(0.975) — no cross-engine inverse-normal
# in the query path)
_WILSON_Z = 1.959963984540054
_ONTIME_DAYS = 30


@query(
    "supplier_ontime_wilson",
    oracle=f"""
WITH s AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n_shipments,
         CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                      CAST(l_shipdate AS DATE))
                       <= {_ONTIME_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_on_time
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
),
w AS (
  SELECT l_suppkey, n_shipments, n_on_time,
         CAST(n_on_time AS DOUBLE) / n_shipments AS p,
         CAST(n_shipments AS DOUBLE) AS n
  FROM s
)
SELECT sup.s_suppkey, sup.s_name, n_shipments, n_on_time,
       round(p, 6) AS ontime_rate,
       round((p + {_WILSON_Z!r} * {_WILSON_Z!r} / (2 * n)
              - {_WILSON_Z!r} * sqrt(p * (1 - p) / n
                  + {_WILSON_Z!r} * {_WILSON_Z!r} / (4 * n * n)))
             / (1 + {_WILSON_Z!r} * {_WILSON_Z!r} / n), 6)
         AS wilson_lb
FROM w JOIN supplier sup ON sup.s_suppkey = w.l_suppkey
ORDER BY wilson_lb DESC, sup.s_suppkey
LIMIT 20
""",
    description="supplier reliability ranked by the Wilson 95% lower "
    "bound of the on-time-ship rate (shipped within 30 days of order "
    "date) — the ranking-under-uncertainty correction to naive rate "
    "sorting: a 3/3 supplier must NOT outrank a 96/100 one; one "
    "fact-fact equi-join, map-combined counts per supplier, the "
    "closed-form bound in whole-stage codegen (z pinned as a shared "
    "full-precision literal), TakeOrdered top-20 — never a global sort",
)
def supplier_ontime_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name"
    )
    on_time = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        <= _ONTIME_DAYS
    ).cast("long")
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum(on_time).alias("n_on_time"),
        )
    )
    p = F.col("n_on_time").cast("double") / F.col("n_shipments")
    n = F.col("n_shipments").cast("double")
    z = F.lit(_WILSON_Z)
    wilson = (
        p + z * z / (2 * n)
        - z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (4 * n * n))
    ) / (F.lit(1.0) + z * z / n)
    return (
        agg.join(broadcast(sup), agg["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            "n_shipments",
            "n_on_time",
            F.round(p, 6).alias("ontime_rate"),
            F.round(wilson, 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), F.asc("s_suppkey"))
        .limit(20)
    )


_SSSP_SCALE = 10**15
_SSSP_ROUNDS = 4

_SSSP_SQL = f"""
WITH RECURSIVE
vol AS (
  SELECT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b,
         sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
           AS vol_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
und AS (
  SELECT a AS src, b AS dst, {_SSSP_SCALE} // vol_cents + 1 AS w FROM vol
  UNION ALL
  SELECT b AS src, a AS dst, {_SSSP_SCALE} // vol_cents + 1 AS w FROM vol
),
seed AS (SELECT min(n_nationkey) AS node FROM nation),
walk(node, dist, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seed
  UNION
  SELECT u.dst, walk.dist + u.w, walk.hops + 1
  FROM walk JOIN und u ON u.src = walk.node
  WHERE walk.hops < {_SSSP_ROUNDS}
)
SELECT CAST(n.n_nationkey AS INTEGER) AS nationkey, n.n_name,
       min(walk.dist) AS dist
FROM walk JOIN nation n ON n.n_nationkey = walk.node
GROUP BY 1, 2
"""


@query(
    "graph_weighted_sssp",
    oracle=_SSSP_SQL,
    description="hop-bounded weighted shortest paths over the nation "
    "trade network: edge weight is inverse traded volume in exact "
    "integer units (10^15 div volume-cents + 1 — heavier trade = "
    "shorter distance), 4 synchronous Bellman-Ford relaxation rounds "
    "from the smallest nation (operators/graph.py:weighted_sssp) — the "
    "trade-proximity readout behind market-access ranking; the volume "
    "aggregation is the only big shuffle (map-combined over lineitem), "
    "the 25-node relaxation exchanges (node, dist) only, and distances "
    "stay exact BIGINT so the oracle is the definitional <=4-hop "
    "path-enumeration recursive CTE with nothing to round",
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import weighted_sssp

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    flows = (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice")
        .join(orders.select("o_orderkey", "o_custkey"),
              li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(sup.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
    )
    vol = (
        flows.groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("vol_cents")
        )
    )
    w = (F.expr(f"div({_SSSP_SCALE}, vol_cents)") + 1).alias("w")
    und = vol.select(F.col("a").alias("src"), F.col("b").alias("dst"), w).union(
        vol.select(F.col("b").alias("src"), F.col("a").alias("dst"), w)
    )
    seeds = nation.agg(F.min("n_nationkey").alias("node"))
    dist = weighted_sssp(und, seeds, rounds=_SSSP_ROUNDS)
    return dist.join(
        broadcast(nation), dist["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_nationkey").cast("int").alias("nationkey"),
        "n_name",
        "dist",
    )


_FIFO_SQL = """
WITH r AS (
  SELECT l_partkey,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM lineitem WHERE l_returnflag <> 'R'
),
i AS (
  SELECT l_partkey,
         CAST(l_quantity AS BIGINT) AS qty,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM lineitem WHERE l_returnflag = 'R'
),
m AS (
  SELECT i.l_partkey,
         least(r.hi, i.hi) - greatest(r.hi - r.qty, i.hi - i.qty) AS ov,
         (r.price_cents * 1000) // r.qty AS unit_milli
  FROM i JOIN r ON i.l_partkey = r.l_partkey
              AND r.hi - r.qty < i.hi AND i.hi - i.qty < r.hi
),
ma AS (
  SELECT l_partkey,
         CAST(count(*) AS INTEGER) AS n_lot_matches,
         CAST(sum(ov) AS BIGINT) AS matched_qty,
         CAST(sum(ov * unit_milli) AS BIGINT) AS alloc_milli
  FROM m GROUP BY 1
),
it AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS issued_qty
      FROM i GROUP BY 1)
SELECT it.l_partkey,
       it.issued_qty,
       coalesce(ma.n_lot_matches, 0) AS n_lot_matches,
       CAST(coalesce(ma.matched_qty, 0) AS BIGINT) AS matched_qty,
       CAST(it.issued_qty - coalesce(ma.matched_qty, 0) AS BIGINT)
         AS unfilled_qty,
       -- exact half-up to cents in INTEGER arithmetic, then one
       -- division: round(x/1e5, 2) hits .XX5 ulp edges cross-engine
       ((coalesce(ma.alloc_milli, 0) + 500) // 1000) / 100.0 AS fifo_cost
FROM it LEFT JOIN ma USING (l_partkey)
"""


@query(
    "fifo_lot_allocation",
    oracle=_FIFO_SQL,
    description="FIFO lot matching via cumulative-interval alignment: "
    "per part, returned quantities ('R' lineitems in shipdate order) "
    "are allocated against supply lots (non-returned lineitems in "
    "shipdate order) by overlapping the two exact cumulative-quantity "
    "ranges — matched qty between lot r and issue i is the overlap of "
    "[r.lo, r.hi) x [i.lo, i.hi) — the inventory-costing primitive "
    "(COGS under FIFO) that otherwise needs a per-part procedural "
    "loop; the lot join is an equi-join on the high-cardinality part "
    "key with a residual range predicate (per-part groups are small, "
    "so no interval index is needed at any scale), quantities and "
    "prices stay exact integers (cents, floor-div milli-unit costs) "
    "so both engines agree bit-for-bit before one final 2-dp division",
)
def fifo_lot_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    wcum = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    qty = F.col("l_quantity").cast("long")
    base = li.select(
        "l_partkey",
        "l_returnflag",
        qty.alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("price_cents"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    r = (
        base.where(F.col("l_returnflag") != "R")
        .withColumn("hi", F.sum("qty").over(wcum))
        .select(
            F.col("l_partkey").alias("r_partkey"),
            (F.col("hi") - F.col("qty")).alias("r_lo"),
            F.col("hi").alias("r_hi"),
            F.expr("div(price_cents * 1000, qty)").alias("unit_milli"),
        )
    )
    i = (
        base.where(F.col("l_returnflag") == "R")
        .withColumn("hi", F.sum("qty").over(wcum))
        .select(
            "l_partkey",
            "qty",
            (F.col("hi") - F.col("qty")).alias("i_lo"),
            F.col("hi").alias("i_hi"),
        )
    )
    m = i.join(
        r,
        (F.col("l_partkey") == F.col("r_partkey"))
        & (F.col("r_lo") < F.col("i_hi"))
        & (F.col("i_lo") < F.col("r_hi")),
    ).select(
        "l_partkey",
        (
            F.least("r_hi", "i_hi") - F.greatest("r_lo", "i_lo")
        ).alias("ov"),
        "unit_milli",
    )
    ma = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("int").alias("n_lot_matches"),
        F.sum("ov").alias("matched_qty"),
        F.sum(F.col("ov") * F.col("unit_milli")).alias("alloc_milli"),
    )
    it = i.groupBy("l_partkey").agg(F.sum("qty").alias("issued_qty"))
    matched = F.coalesce(F.col("matched_qty"), F.lit(0).cast("long"))
    return it.join(ma, "l_partkey", "left").select(
        "l_partkey",
        "issued_qty",
        F.coalesce(F.col("n_lot_matches"), F.lit(0)).alias("n_lot_matches"),
        matched.alias("matched_qty"),
        (F.col("issued_qty") - matched).alias("unfilled_qty"),
        # exact half-up to integer cents, then ONE division (the
        # floor(x + 0.5) idiom: round(milli/1e5, 2) has .XX5 edges)
        (
            F.expr("div(coalesce(alloc_milli, 0L) + 500, 1000)") / 100.0
        ).alias("fifo_cost"),
    )


_LITTLE_SQL = """
WITH o AS (
  SELECT o.o_orderkey, o.o_orderdate AS start_d,
         min(l.l_shipdate) AS end_d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
m AS (
  SELECT DISTINCT date_trunc('month', start_d) AS m_start,
         date_trunc('month', start_d) + INTERVAL 1 MONTH AS m_next
  FROM o
),
arr AS (
  SELECT date_trunc('month', start_d) AS m_start,
         CAST(count(*) AS BIGINT) AS n_arrivals,
         CAST(sum(date_diff('day', start_d, end_d)) AS BIGINT) AS ship_days
  FROM o GROUP BY 1
),
wip AS (
  SELECT m.m_start,
         CAST(sum(date_diff('day',
                  greatest(o.start_d, CAST(m.m_start AS DATE)),
                  least(o.end_d, CAST(m.m_next AS DATE)))) AS BIGINT)
           AS wip_days
  FROM m JOIN o ON o.start_d < m.m_next AND o.end_d > m.m_start
  GROUP BY 1
),
dim AS (
  SELECT m_start, date_diff('day', CAST(m_start AS DATE),
                            CAST(m_next AS DATE)) AS days_in_month
  FROM m
)
SELECT strftime(arr.m_start, '%Y-%m') AS month,
       CAST(arr.n_arrivals AS INTEGER) AS n_arrivals,
       round(arr.n_arrivals / CAST(dim.days_in_month AS DOUBLE), 6)
         AS lambda_per_day,
       round(arr.ship_days / CAST(arr.n_arrivals AS DOUBLE), 6) AS w_days,
       round(coalesce(wip.wip_days, 0) / CAST(dim.days_in_month AS DOUBLE), 6)
         AS l_avg_wip,
       round(coalesce(wip.wip_days, 0)
             / CAST(nullif(arr.ship_days, 0) AS DOUBLE), 6) AS littles_ratio
FROM arr JOIN dim USING (m_start)
LEFT JOIN wip USING (m_start)
"""


@query(
    "orders_littles_law",
    oracle=_LITTLE_SQL,
    description="Little's law audit per order month: arrival rate "
    "lambda (orders/day), mean time-in-system W (orderdate to first "
    "ship), and measured average WIP L from exact day-overlap of each "
    "order's open interval with the month — L = lambda*W only in "
    "steady state, so littles_ratio (which algebraically reduces to "
    "wip_days/ship_days, a ratio of two exact integer day-sums) reads "
    "out ramp-up/drain-down months; the queueing-theory sanity check "
    "behind backlog dashboards (orders_open_backlog_daily gives the "
    "instantaneous curve, this gives the conservation-law audit); the "
    "month dimension is a tiny broadcast side against the orders "
    "interval table, everything integer until three final divisions",
)
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = (
        orders.select("o_orderkey", F.col("o_orderdate").alias("start_d"))
        .join(
            li.select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "start_d")
        .agg(F.min("l_shipdate").alias("end_d"))
    )
    m = o.select(
        F.date_trunc("month", "start_d").alias("m_start")
    ).distinct().select(
        "m_start", F.expr("m_start + INTERVAL 1 MONTH").alias("m_next")
    )
    arr = o.groupBy(
        F.date_trunc("month", "start_d").alias("m_start")
    ).agg(
        F.count(F.lit(1)).alias("n_arrivals"),
        F.sum(F.datediff("end_d", "start_d")).cast("long").alias("ship_days"),
    )
    wip = (
        o.join(
            broadcast(m),
            (F.col("start_d") < F.col("m_next"))
            & (F.col("end_d") > F.col("m_start")),
        )
        .groupBy("m_start")
        .agg(
            F.sum(
                F.datediff(
                    F.least("end_d", F.col("m_next").cast("date")),
                    F.greatest("start_d", F.col("m_start").cast("date")),
                )
            )
            .cast("long")
            .alias("wip_days")
        )
    )
    dim = m.select(
        "m_start",
        F.datediff(
            F.col("m_next").cast("date"), F.col("m_start").cast("date")
        ).alias("days_in_month"),
    )
    wd = F.coalesce(F.col("wip_days"), F.lit(0).cast("long"))
    return (
        arr.join(broadcast(dim), "m_start")
        .join(wip, "m_start", "left")
        .select(
            F.date_format("m_start", "yyyy-MM").alias("month"),
            F.col("n_arrivals").cast("int").alias("n_arrivals"),
            F.round(
                F.col("n_arrivals") / F.col("days_in_month").cast("double"), 6
            ).alias("lambda_per_day"),
            F.round(
                F.col("ship_days") / F.col("n_arrivals").cast("double"), 6
            ).alias("w_days"),
            F.round(wd / F.col("days_in_month").cast("double"), 6).alias(
                "l_avg_wip"
            ),
            F.round(
                wd
                / F.nullif(F.col("ship_days"), F.lit(0)).cast("double"),
                6,
            ).alias("littles_ratio"),
        )
    )


_SRC_RISK_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT l_partkey,
         CAST(count(*) AS INTEGER) AS n_suppliers,
         CAST(sum(q) AS BIGINT) AS tot_q,
         CAST(max(q) AS BIGINT) AS max_q,
         CAST(sum(rev_cents) AS BIGINT) AS rev_cents
  FROM ps GROUP BY 1
)
SELECT CAST(least(9, (max_q * 10) // tot_q) AS INTEGER)
         AS concentration_decile,
       CAST(count(*) AS INTEGER) AS n_parts,
       CAST(min(n_suppliers) AS INTEGER) AS min_suppliers,
       round(sum(rev_cents) / 100.0, 2) AS revenue,
       round(sum((max_q * 1000000) // tot_q)
             / (count(*) * 1000000.0), 6) AS avg_top_share,
       round(sum(CASE WHEN n_suppliers = 1 THEN rev_cents ELSE 0 END)
             / 100.0, 2) AS single_sourced_revenue
FROM p GROUP BY 1
"""


@query(
    "part_single_source_risk",
    oracle=_SRC_RISK_SQL,
    description="supply-concentration risk profile: parts bucketed "
    "by the DECILE of their top supplier's quantity share (decile 9 "
    "= one supplier ships >=90%), with the revenue exposed per "
    "bucket, the minimum supplier count, the mean top share, and the "
    "revenue riding on a single source — the procurement complement "
    "to market_hhi_suppliers (that measures market concentration "
    "across suppliers; this measures per-part resilience); two "
    "map-combined aggregations, quantities/revenue exact integers, "
    "deciles and per-part micro-unit shares floor-divided so every "
    "bucketing decision and average is exact integer arithmetic",
)
def part_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).alias("rev_cents"),
    )
    p = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("int").alias("n_suppliers"),
        F.sum("q").alias("tot_q"),
        F.max("q").alias("max_q"),
        F.sum("rev_cents").alias("rev_cents"),
    )
    tier = F.least(F.lit(9), F.expr("div(max_q * 10, tot_q)")).cast("int")
    n = F.count(F.lit(1))
    return p.groupBy(tier.alias("concentration_decile")).agg(
        n.cast("int").alias("n_parts"),
        F.min("n_suppliers").cast("int").alias("min_suppliers"),
        F.round(F.sum("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(
            F.sum(F.expr("div(max_q * 1000000, tot_q)"))
            / (n * 1000000.0),
            6,
        ).alias("avg_top_share"),
        F.round(
            F.sum(
                F.when(F.col("n_suppliers") == 1, F.col("rev_cents")).otherwise(
                    F.lit(0).cast("long")
                )
            )
            / 100.0,
            2,
        ).alias("single_sourced_revenue"),
    )


_JW_TOPK = 50

_JW_SQL = f"""
WITH r AS (
  SELECT c_mktsegment AS block, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
),
cand AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM r a JOIN r b ON a.block = b.block
                   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
)
SELECT id_a, id_b, name_a, name_b,
       round(jaro_winkler_similarity(name_a, name_b), 6) AS jw
FROM cand
QUALIFY row_number() OVER (
  ORDER BY round(jaro_winkler_similarity(name_a, name_b), 6) DESC,
           id_a, id_b) <= {_JW_TOPK}
"""


@query(
    "linkage_jaro_winkler",
    oracle=_JW_SQL,
    description="Jaro-Winkler name scoring over the SNM candidate "
    "pairs: the string-similarity evidence channel a Fellegi-Sunter "
    "matcher weighs alongside the numeric tolerances "
    "(record_linkage_fs), top-50 most-similar pairs — Spark has no "
    "built-in JW, so the character-matching DP runs as ONE "
    "Arrow-batched mapInPandas kernel over the O(n*window) blocked "
    "candidates (operators/linkage.py:jaro_winkler_scores; never a "
    "cross join, the same cost posture as edit_distance_neardup); "
    "the Winkler variant is pinned to DuckDB's (prefix cap 4, scale "
    "0.1, boost threshold 0.7) and verified bit-identical on every "
    "fixture candidate pair, so the oracle is DuckDB's own "
    "jaro_winkler_similarity over the definitional BETWEEN join",
)
def linkage_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import (
        jaro_winkler_scores,
        sorted_neighborhood_pairs,
    )

    cust = load_table(spark, "customer", sf_dir)
    pairs = sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        block_col="c_mktsegment",
        order_by=["c_acctbal"],
        window=_SNM_WINDOW,
        carry=["c_name"],
    ).select(
        "id_a",
        "id_b",
        F.col("c_name_a").alias("name_a"),
        F.col("c_name_b").alias("name_b"),
    )
    scored = jaro_winkler_scores(pairs, "name_a", "name_b", out_col="__jw")
    return (
        scored.select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.round("__jw", 6).alias("jw"),
        )
        .orderBy(F.desc("jw"), F.asc("id_a"), F.asc("id_b"))
        .limit(_JW_TOPK)
    )


_KCORE_K = 2
_KCORE_ROUNDS = 4


def _kcore_round_sql(r: int) -> str:
    prev = f"s{r - 1}"
    return f"""d{r} AS (
  SELECT u.x, count(*) AS d
  FROM und u JOIN {prev} a ON u.x = a.node JOIN {prev} b ON u.y = b.node
  GROUP BY u.x
),
s{r} AS (SELECT x AS node FROM d{r} WHERE d >= {_KCORE_K})"""


def _kcore_row_sql(r: int) -> str:
    return f"""SELECT CAST({r} AS INTEGER) AS round,
       CAST((SELECT count(*) FROM s{r}) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und u
             JOIN s{r} a ON u.x = a.node
             JOIN s{r} b ON u.y = b.node) AS BIGINT) AS n_edges"""


_KCORE_SQL = (
    """
WITH
b AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
-- MATERIALIZED: und is referenced 2x per unrolled round — inlined,
-- DuckDB would recompute the co-purchase self-join ~10 times (45+ s
-- at sf0.1; 0.6 s materialized)
e AS MATERIALIZED (
  SELECT a.pk AS x, c.pk AS y FROM b a JOIN b c
    ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2 HAVING count(*) >= 2
),
und AS MATERIALIZED (
  SELECT x, y FROM e UNION ALL SELECT y AS x, x AS y FROM e),
s0 AS (SELECT DISTINCT x AS node FROM und),
"""
    + ",\n".join(_kcore_round_sql(r) for r in range(1, _KCORE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        _kcore_row_sql(r) for r in range(1, _KCORE_ROUNDS + 1)
    )
)


@query(
    "graph_kcore_peel",
    oracle=_KCORE_SQL,
    description="2-core peeling trajectory of the co-purchase graph "
    "over 4 fixed synchronous rounds (Montresor et al., PODC'11 round "
    "structure): each round drops nodes with fewer than 2 surviving "
    "neighbors, and the entry reports (survivors, surviving directed "
    "edges) per round — how fast the tree-like periphery evaporates "
    "and what cyclic core remains (sf0.1: 5922 nodes peel to 22 by "
    "round 3), the structure readout behind community seeding and "
    "influence floors (operators/graph.py:kcore_peel; k=3 measured "
    "VACUOUS on this graph — empty after round 1 at every SF — so "
    "the entry pins the non-degenerate k=2); per round ONE "
    "within-survivors degree table reused for both the edge count "
    "and the next peel, membership-only state, all-integer outputs, "
    "per-round summaries union LAZILY into one action; the oracle "
    "unrolls the same rounds as MATERIALIZED CTEs",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel

    li = load_table(spark, "lineitem", sf_dir)
    bkt = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    pa = bkt.select("ok", F.col("pk").alias("x"))
    pb = bkt.select("ok", F.col("pk").alias("y"))
    e = (
        pa.join(pb, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("x", "y")
    )
    und = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
    edges = und.select(F.col("x").alias("src"), F.col("y").alias("dst"))
    return kcore_peel(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


_BRIDGE_Y0, _BRIDGE_Y1 = 1997, 1998

_BRIDGE_SQL = f"""
WITH y AS (
  SELECT l_partkey,
         CAST(year(l_shipdate) AS INTEGER) AS yr,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM lineitem
  -- range form, not year() IN (...): comparable to the column, so the
  -- parquet scan can prune row groups on l_shipdate min/max stats
  WHERE l_shipdate >= TIMESTAMP '{_BRIDGE_Y0}-01-01'
    AND l_shipdate < TIMESTAMP '{_BRIDGE_Y1 + 1}-01-01'
  GROUP BY 1, 2
),
y0 AS (SELECT l_partkey, q AS q0, r AS r0 FROM y WHERE yr = {_BRIDGE_Y0}),
y1 AS (SELECT l_partkey, q AS q1, r AS r1 FROM y WHERE yr = {_BRIDGE_Y1}),
j AS (
  SELECT coalesce(y0.l_partkey, y1.l_partkey) AS l_partkey,
         y0.q0, y0.r0, y1.q1, y1.r1
  FROM y0 FULL OUTER JOIN y1 USING (l_partkey)
),
-- unit prices as exact integer micro-cents (floor-div convention);
-- price/volume effects only on parts traded in BOTH years
eff AS (
  SELECT j.l_partkey, p.p_brand,
         coalesce(j.r1, 0) - coalesce(j.r0, 0) AS d_rev,
         CASE WHEN j.q0 IS NOT NULL AND j.q1 IS NOT NULL THEN
           ((j.r1 * 1000000) // j.q1 - (j.r0 * 1000000) // j.q0) * j.q1
         ELSE 0 END AS price_eff_u,
         CASE WHEN j.q0 IS NOT NULL AND j.q1 IS NOT NULL THEN
           ((j.r0 * 1000000) // j.q0) * (j.q1 - j.q0)
         ELSE 0 END AS volume_eff_u,
         CASE WHEN j.q0 IS NULL THEN j.r1 ELSE 0 END AS new_rev,
         CASE WHEN j.q1 IS NULL THEN -j.r0 ELSE 0 END AS exit_rev
  FROM j JOIN part p ON p.p_partkey = j.l_partkey
)
SELECT p_brand,
       round(CAST(sum(d_rev) AS BIGINT) / 100.0, 2) AS delta_revenue,
       round(CAST(sum(price_eff_u) AS BIGINT) / 100000000.0, 2)
         AS price_effect,
       round(CAST(sum(volume_eff_u) AS BIGINT) / 100000000.0, 2)
         AS volume_effect,
       round(CAST(sum(new_rev) AS BIGINT) / 100.0, 2) AS new_parts_revenue,
       round(CAST(sum(exit_rev) AS BIGINT) / 100.0, 2)
         AS exited_parts_revenue
FROM eff GROUP BY 1
"""


@query(
    "revenue_bridge_price_volume",
    oracle=_BRIDGE_SQL,
    description="year-over-year revenue bridge per brand "
    f"({_BRIDGE_Y0} -> {_BRIDGE_Y1}): the waterfall decomposition of "
    "revenue change into price effect ((u1-u0)*q1), volume effect "
    "(u0*(q1-q0)), new-part revenue, and exited-part revenue — the "
    "FP&A variance analysis behind every 'why did revenue move' "
    "review; per-part unit prices are exact integer micro-cents "
    "(floor-div convention) so both engines decompose identical "
    "integers, one per-year map-combined aggregate + a full outer "
    "join on the high-cardinality part key + a broadcast brand "
    "lookup, four final divisions",
)
def revenue_bridge_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    y = (
        # range predicate (pushable to parquet min/max row-group stats),
        # not year() IN (...) (an expression over the column, unpushable)
        li.where(
            (F.col("l_shipdate") >= F.lit(f"{_BRIDGE_Y0}-01-01").cast(
                "timestamp"
            ))
            & (
                F.col("l_shipdate")
                < F.lit(f"{_BRIDGE_Y1 + 1}-01-01").cast("timestamp")
            )
        )
        .groupBy(
            "l_partkey", F.year("l_shipdate").cast("int").alias("yr")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("r"),
        )
    )
    y0 = y.where(F.col("yr") == _BRIDGE_Y0).select(
        "l_partkey", F.col("q").alias("q0"), F.col("r").alias("r0")
    )
    y1 = y.where(F.col("yr") == _BRIDGE_Y1).select(
        "l_partkey", F.col("q").alias("q1"), F.col("r").alias("r1")
    )
    j = y0.join(y1, "l_partkey", "full_outer")
    both = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    u0 = F.expr("div(r0 * 1000000, q0)")
    u1 = F.expr("div(r1 * 1000000, q1)")
    zero = F.lit(0).cast("long")
    eff = j.join(
        broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        (
            F.coalesce(F.col("r1"), zero) - F.coalesce(F.col("r0"), zero)
        ).alias("d_rev"),
        F.when(both, (u1 - u0) * F.col("q1")).otherwise(zero).alias(
            "price_eff_u"
        ),
        F.when(both, u0 * (F.col("q1") - F.col("q0"))).otherwise(zero).alias(
            "volume_eff_u"
        ),
        F.when(F.col("q0").isNull(), F.col("r1")).otherwise(zero).alias(
            "new_rev"
        ),
        F.when(F.col("q1").isNull(), -F.col("r0")).otherwise(zero).alias(
            "exit_rev"
        ),
    )
    return eff.groupBy("p_brand").agg(
        F.round(F.sum("d_rev") / 100.0, 2).alias("delta_revenue"),
        F.round(F.sum("price_eff_u") / 100000000.0, 2).alias("price_effect"),
        F.round(F.sum("volume_eff_u") / 100000000.0, 2).alias(
            "volume_effect"
        ),
        F.round(F.sum("new_rev") / 100.0, 2).alias("new_parts_revenue"),
        F.round(F.sum("exit_rev") / 100.0, 2).alias("exited_parts_revenue"),
    )
