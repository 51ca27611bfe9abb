"""Controlled A/B for the round-7 pair-join cosine sweep: reproduces
the numbers behind the norm-precompute commits on demand, in ONE
session, so they are insulated from the cross-session host variance the
full bench totals carry.

Variants per workload:
  old       cosine() per pair (three interpreted folds: dot + 2 norms)
  prenorm   norms computed once per row, one fold per pair (shipped)
  static    64-term element_at chain for the pair dot (measured dead
            end: BroadcastNestedLoopJoin conditions run interpreted
            Expression.eval, where the 127-node tree loses to the fold)

Workloads: the semantic decontamination screen (corpus x broadcast
bench) and the all-pairs embedding near-dup self-join.

    python tools/ab_pairjoin.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
DIMS = 64


def main() -> None:
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.similarity import (
        cosine,
        dot,
        l2_norm,
    )
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab_pairjoin")
    spark.range(1_000_000).selectExpr("id % 32 as k").groupBy("k").count().count()

    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    bench = emb.where(F.col("vec_id") % 17 == 0)
    corpus = emb.where(F.col("vec_id") % 17 != 0)

    def sdot(a, b):
        return reduce(
            lambda x, y: x + y,
            [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(DIMS)],
        )

    def decon(form):
        c = corpus.select(F.col("vec_id").alias("id"), F.col("e").alias("cv"))
        b = bench.select(F.col("vec_id").alias("bid"), F.col("e").alias("bv"))
        if form == "old":
            cos = cosine(F.col("cv"), F.col("bv"))
        else:
            c = c.withColumn("cn", l2_norm(F.col("cv")))
            b = b.withColumn("bn", l2_norm(F.col("bv")))
            d = (
                sdot(F.col("cv"), F.col("bv"))
                if form == "static"
                else dot(F.col("cv"), F.col("bv"))
            )
            cos = d / (F.col("cn") * F.col("bn"))
        return (
            c.join(F.broadcast(b), cos >= 0.35)
            .groupBy("id")
            .agg(F.count(F.lit(1)), F.round(F.max(cos), 6))
        )

    def neardup(form):
        pre = emb if form == "old" else emb.withColumn("n", l2_norm(F.col("e")))
        a, b = pre.alias("a"), pre.alias("b")
        if form == "old":
            cos = cosine(F.col("a.e"), F.col("b.e"))
        else:
            d = (
                sdot(F.col("a.e"), F.col("b.e"))
                if form == "static"
                else dot(F.col("a.e"), F.col("b.e"))
            )
            cos = d / (F.col("a.n") * F.col("b.n"))
        return (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .where(cos >= 0.4)
            .select(F.col("a.vec_id"), F.col("b.vec_id"), F.round(cos, 6))
        )

    for wname, wl in (("decontam", decon), ("neardup_allpairs", neardup)):
        for form in ("old", "prenorm", "static"):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                wl(form).count()
                ts.append(round(time.perf_counter() - t0, 2))
            print(f"{wname:18s} {form:8s} min={min(ts):6.2f}  all={ts}")


if __name__ == "__main__":
    main()
