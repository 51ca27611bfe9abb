"""Audit every oracle-backed query for driver-canonicalization hazards.

The external driver compares Spark and DuckDB results through pandas
(DuckDB ``fetchdf()`` / Spark ``toPandas()``), sorts by all columns and
hashes values — so two classes of bug pass the repo's exact-value local
mirror (tests/oracle_utils.py, which uses ``fetchall``) yet fail in the
driver:

1. dtype-kind drift: DuckDB HUGEINT (e.g. ``sum(INTEGER)``) lands in
   pandas as float64 while Spark returns int64 → same values, different
   hash (the round-2 ``pack_bin_stats`` failure).
2. unhashable cells: array-typed columns become Python lists, which
   pandas sort_values cannot factorize (the round-2
   ``embedding_label_centroids`` harness error).

This tool runs every oracle through the pandas path at a given scale and
reports both hazards per query. Run:

    python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_fetchdf(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.execute(sql).fetchdf()
    con.close()
    return df


def hazards_for(name: str, spark_df, duck_df) -> list[str]:
    out: list[str] = []
    s_pd = spark_df.toPandas()
    for col in sorted(set(s_pd.columns) | set(duck_df.columns)):
        if col not in s_pd.columns or col not in duck_df.columns:
            out.append(f"{col}: missing on one side")
            continue
        sk, dk = s_pd[col].dtype.kind, duck_df[col].dtype.kind
        if sk != dk and {sk, dk} - {"O"}:
            # int-vs-float (or any numeric-kind drift) changes the hash
            if not ({sk, dk} <= {"i", "u"}):
                out.append(f"{col}: dtype kind spark={sk} duckdb={dk}")
        for side, pd_df in (("spark", s_pd), ("duckdb", duck_df)):
            if pd_df[col].dtype.kind == "O" and len(pd_df):
                cell = pd_df[col].iloc[0]
                if isinstance(cell, (list, dict, set, bytearray)) or (
                    type(cell).__name__ == "ndarray"
                ):
                    out.append(f"{col}: unhashable {side} cell {type(cell).__name__}")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from fred_economic_data_pipeline_local_spark.plans import all_oracles, all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(master="local[8]")
    qs, oracles = all_queries(), all_oracles()
    bad = 0
    for name, sql in oracles.items():
        try:
            hz = hazards_for(name, qs[name](spark, sf_dir), duckdb_fetchdf(sql, sf_dir))
        except Exception as exc:  # noqa: BLE001 — audit must visit every query
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            bad += 1
            continue
        if hz:
            bad += 1
            print(f"WARN {name}: " + "; ".join(hz))
    print(f"audited {len(oracles)} oracles at {sf_dir}: {bad} with hazards")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
