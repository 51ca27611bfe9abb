"""Explicit StructTypes for every layer and fixture table.

The reference writes fixed column lists but re-infers types on every read
(pd.read_json transform_fred_data.py:83-87; pd.read_parquet
aggregate_fred_data.py:43), which produces its epoch-ms ``ingested_at``
accident (SURVEY.md §1.2). We declare schemas once and never infer.

Bronze/silver/gold column sets mirror extract_fred_data.py:177-186,
transform_fred_data.py:137-141 and aggregate_fred_data.py:121-122.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- FRED medallion layers ---------------------------------------------------

# raw_data/ layer: one row per observation (extract_fred_data.py:177-186).
# `value` stays a string at bronze: FRED emits the missing sentinel "." and
# the reference's astype(str) leaves literal "nan" artifacts; silver owns the
# coercion (SURVEY.md §1.4).
BRONZE_SCHEMA = StructType(
    [
        StructField("indicator", StringType(), False),
        StructField("observation_date", StringType(), True),  # YYYY-MM-DD
        StructField("observation_month", IntegerType(), True),
        StructField("observation_year", IntegerType(), True),
        StructField("value", StringType(), True),
        StructField("ingested_at", TimestampType(), True),
    ]
)

# processed_data/ layer: one row per (indicator, year, month)
# (transform_fred_data.py:124-141).
SILVER_SCHEMA = StructType(
    [
        StructField("indicator", StringType(), False),
        StructField("observation_year", IntegerType(), True),
        StructField("observation_month", IntegerType(), True),
        StructField("value", DoubleType(), True),  # monthly mean
        StructField("observation_count", LongType(), True),
        StructField("ingested_at", StringType(), True),  # ISO-8601 +00:00
        StructField("processed_at", StringType(), True),
    ]
)

# aggregated_data/ layer: silver + aggregated_at, value bround'ed to 2
# (aggregate_fred_data.py:121-122).
GOLD_SCHEMA = StructType(
    SILVER_SCHEMA.fields
    + [StructField("aggregated_at", StringType(), True)]
)

# FRED REST payload observation element (extract_fred_data.py:114-131):
# {"realtime_start", "realtime_end", "date", "value"}
FRED_OBSERVATION_SCHEMA = StructType(
    [
        StructField("realtime_start", StringType(), True),
        StructField("realtime_end", StringType(), True),
        StructField("date", StringType(), True),
        StructField("value", StringType(), True),
    ]
)

# --- driver fixture tables (TESTDATA.md / FIXTURES.md §A) --------------------

REGION_SCHEMA = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION_SCHEMA = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER_SCHEMA = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART_SCHEMA = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

FIXTURE_SCHEMAS: dict[str, StructType] = {
    "region": REGION_SCHEMA,
    "nation": NATION_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "supplier": SUPPLIER_SCHEMA,
    "part": PART_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "lineitem": LINEITEM_SCHEMA,
    "events": EVENTS_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
}
