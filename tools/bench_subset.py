#!/usr/bin/env python
"""Bench a named subset of catalog entries with bench.py's exact timing
protocol (min-of-REPS ``df.count()``, SQL-cache clear + forced GC
between reps, the same warm-up and calibration probes) — the in-session
A/B instrument for optimization rounds, so a candidate change is priced
on THIS host session before touching the committed bench numbers.

    python tools/bench_subset.py spearman_quantity_price gini_customer_spend
    python tools/bench_subset.py --file names.txt --sf /root/testdata/sf0.1

Prints one JSON line: {"queries": {...}, "calibration": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the probes + REPS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--file", help="newline-separated entry names")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=bench.REPS)
    args = ap.parse_args()
    names = list(args.names)
    if args.file:
        with open(args.file) as fh:
            names += [ln.strip() for ln in fh if ln.strip()]
    if not names:
        print("no entries named", file=sys.stderr)
        return 2

    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="bench-subset")
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2

    # bench.py's warm-up, verbatim
    spark.range(1_000_000).selectExpr(
        "id % 32 as k", "id as v").groupBy("k").count().count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()
    cal_first = bench._calibration_probes(spark)
    print(f"# calibration(first): {cal_first}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        reps: list[float] = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            n = df.count()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(min(reps), 3)
        print(
            f"# {name}: min {timings[name]:.3f}s of "
            f"{[round(r, 3) for r in reps]} ({n} rows)",
            file=sys.stderr,
        )
    cal_last = bench._calibration_probes(spark)
    print(f"# calibration(last): {cal_last}", file=sys.stderr)
    out = {
        "queries": timings,
        "calibration": {
            "first": cal_first,
            "last": cal_last,
            "min": {k: round(min(cal_first[k], cal_last[k]), 3)
                    for k in cal_first},
        },
        "sf": args.sf,
        "reps": args.reps,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
