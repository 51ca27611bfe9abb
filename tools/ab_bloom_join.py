#!/usr/bin/env python
"""A/B the Bloom-join semi-join reduction (operators/bloom.py): shuffle
bytes/records of the plain fact ⋈ selective-dim join vs the
bloom-pruned join, in the regime the operator targets — a dim side too
big to broadcast (emulated by autoBroadcastJoinThreshold=-1; at fixture
scale Catalyst would otherwise broadcast the dim and neither plan
shuffles the fact).

    python tools/ab_bloom_join.py [sf_dir]

Recorded result (sf0.1, local[32], 2026-08-14):
    plain shuffle join:  10,771,741 B  621,252 records
    bloom-pruned join:    2,158,967 B  136,797 records   (5.0x less,
        including the mask build's own bit_or shuffle of <=2,048 words)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.bloom import (
        bloom_pruned_join,
    )
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab-bloom-join")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc = spark.sparkContext

    def totals() -> tuple[int, int]:
        status = sc._jsc.sc().statusStore()
        it = status.stageList(
            sc._jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        ).iterator()
        sw = rec = 0
        while it.hasNext():
            s = it.next()
            sw += s.shuffleWriteBytes()
            rec += s.shuffleWriteRecords()
        return sw, rec

    def build():
        li = load_table(spark, "lineitem", SF_DIR).select(
            "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
        )
        dim = (
            load_table(spark, "orders", SF_DIR)
            .where(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") >= 150000)
            )
            .select("o_orderkey")
        )
        return li, dim

    def agg(j):
        return j.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev"),
        )

    li, dim = build()
    b0 = totals()
    plain = agg(li.join(dim, li.l_orderkey == dim.o_orderkey, "inner")).collect()
    b1 = totals()
    print(f"plain shuffle join:  shuffle={b1[0] - b0[0]:,}B "
          f"records={b1[1] - b0[1]:,}")

    li, dim = build()
    b2 = totals()
    pruned = agg(bloom_pruned_join(li, dim, "l_orderkey", "o_orderkey")).collect()
    b3 = totals()
    print(f"bloom-pruned join:   shuffle={b3[0] - b2[0]:,}B "
          f"records={b3[1] - b2[1]:,}")
    assert sorted(map(tuple, plain)) == sorted(map(tuple, pruned)), (
        "bloom-pruned result diverged from the plain join"
    )


if __name__ == "__main__":
    main()
