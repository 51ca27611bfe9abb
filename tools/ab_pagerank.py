#!/usr/bin/env python
"""Isolated A/B for graph_pagerank_topk: current operator vs an
edge-materialization variant (eager localCheckpoint of the edge list
before the iteration loop, so edge construction — the orders x lineitem
join + distinct — runs once instead of once per downstream action).

    python tools/ab_pagerank.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _edges(spark):
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.catalog import load_table

    o = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", SF_DIR).select(
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
    return e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def main() -> None:
    from fred_economic_data_pipeline_local_spark.operators.graph import (
        pagerank_topk,
    )
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab_pagerank")
    spark.range(1_000_000).selectExpr("id % 32 k").groupBy("k").count().count()

    def run(materialize: bool) -> float:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.monotonic()
            e = _edges(spark)
            if materialize:
                e = e.localCheckpoint(eager=True)
            pagerank_topk(e, k=20, iterations=5).count()
            best = min(best, time.monotonic() - t0)
        return best

    a = run(False)
    b = run(True)
    print(f"lazy-edges    min of {REPS}: {a:.3f}s")
    print(f"checkpointed  min of {REPS}: {b:.3f}s  ({a / b:.2f}x)")


if __name__ == "__main__":
    main()
