"""PySpark-native analytics engine with the query and data-processing
capabilities of ``eulloa10/fred-economic-data-pipeline-local``.

The reference is a pandas/Airflow batch ETL (FRED REST -> bronze JSON ->
silver parquet -> gold parquet -> Postgres upsert / Sheets dedup-append).
This package re-expresses every operator the reference computes — plus the
extended large-scale query surface (joins, windows, set ops, dedup,
similarity search, text analysis, streaming) — as idiomatic Spark
DataFrame/SQL plans that Catalyst can optimize.

Layout:
    session     SparkSession builder tuned for the target cluster profile
    schemas     explicit StructTypes per layer (never inferred)
    catalog     fixture-table loader (TPC-H-ish star + events/documents/embeddings)
    operators/  relational + FRED-parity + LLM-data operators
    sources/    connector edges (FRED REST, JDBC, Sheets) kept off the engine path
    functions/  scalar expression helpers (Catalyst built-ins only on hot paths)
    plans/      named query catalog (the driver-facing queries()/oracle_sql())
    streaming/  Structured Streaming equivalents of the batch-incremental flows
"""

__version__ = "0.1.0"
