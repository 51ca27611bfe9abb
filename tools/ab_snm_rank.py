"""Controlled A/B for the SNM rank assignment (VERDICT r10 item 2).

The naive per-block rank — ``row_number() over (partition by block
order by keys)`` — concentrates each block's entire sort on ONE task:
with a low-cardinality blocking key (5 market segments; worst case 1)
parallelism is capped at n_blocks regardless of cluster size. The
shipped ``_distributed_block_rank`` replaces it with repartitionByRange
(the distributed sort) + per-partition local row_number + cumulative
per-(partition, block) offsets, making parallelism = n_partitions.

This script builds the adversarial case — ALL rows in one block — and
measures both variants in one session, then verifies the outputs are
row-for-row identical (the distributed rank is a pure plan change).

    python tools/ab_snm_rank.py [n_rows] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        _distributed_block_rank,
    )
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab_snm_rank")
    spark.range(1_000_000).selectExpr("id % 32 as k").groupBy("k").count().count()

    # one block: the degenerate case a per-block window serializes
    df = (
        spark.range(N)
        .select(
            F.lit("BLK").alias("blk"),
            F.col("id").alias("id"),
            (F.hash(F.col("id")) % 100_000).alias("v"),
        )
        .repartition(32)
    )

    def naive():
        rn = F.row_number().over(W.partitionBy("blk").orderBy("v", "id"))
        return df.select("blk", "id", rn.alias("rn"))

    def distributed():
        r = _distributed_block_rank(
            df, id_col="id", block_col="blk", order_by=["v"], carry=[]
        )
        return r.select(
            F.col("block").alias("blk"),
            F.col("__id").alias("id"),
            F.col("__rn").alias("rn"),
        )

    for label, fn in (("naive_window", naive), ("distributed_rank", distributed)):
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn().select(F.sum(F.col("rn") * F.col("id"))).collect()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{label}: min {min(times):.3f}s of {[round(t, 3) for t in times]}")

    diff = naive().exceptAll(distributed()).count() + distributed().exceptAll(
        naive()
    ).count()
    print(f"output identical: {diff == 0} (symmetric diff {diff} rows)")


if __name__ == "__main__":
    main()
