#!/usr/bin/env python
"""Run one registered query by name. From the repo root:

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_minhash_lsh --sf /root/testdata/sf0.1
    python tools/run_query.py q19_discounted_revenue --explain
    python tools/run_query.py --list

--explain prints the formatted physical plan instead of rows;
--oracle additionally runs the DuckDB oracle side-by-side and diffs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--list", action="store_true", dest="list_all")
    args = ap.parse_args()

    from fred_economic_data_pipeline_local_spark.plans import (
        all_oracles,
        all_queries,
        get_query,
    )

    qs = all_queries()
    if args.list_all or not args.name:
        oracles = all_oracles()
        for n in qs:
            kind = "oracle" if n in oracles else "rows-only"
            print(f"{n:36s} {kind:9s} {get_query(n).description}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2

    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.name}")
    df = qs[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.oracle:
        from tests.oracle_utils import compare_query

        compare_query(spark, args.name, args.sf)
        print(f"{args.name}: spark == duckdb oracle at {args.sf}")
        return 0
    df.show(args.rows, truncate=False)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
