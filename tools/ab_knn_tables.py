"""A/B: mutual-kNN index width (tables) vs true-3-NN candidate recall
and entry wall-clock at sf0.1 (VERDICT r13 item 6).

Recall here is CANDIDATE recall of the exact 3-NN set (the
candidate-bounded-eval discipline: the eval is only meaningful if the
index covers the target set). Wall-clock is min-of-3 of the full
``embedding_mutual_knn_clusters`` entry with the module's table count
monkeypatched. Run alone — no other JVM live.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TABLES = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["16", "12", "10"])]


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.similarity import (
        dot,
        l2_norm,
        multitable_sig_table,
    )
    from fred_economic_data_pipeline_local_spark.plans import similarity_queries as sq
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(master="local[32]", app_name="ab_knn_tables")
    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    emb = emb.withColumn("__n", l2_norm(F.col("e"))).localCheckpoint(True)
    n = emb.count()
    planes = max(4, math.ceil(math.log2(max(n, 1) / 128)))
    print(f"n={n} planes={planes}")

    a = emb.select(F.col("vec_id").alias("src"), F.col("e").alias("ea"), F.col("__n").alias("na"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("e").alias("eb"), F.col("__n").alias("nb"))
    cos = F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
    w = Window.partitionBy("src").orderBy(F.desc("__cos"), F.asc("dst"))
    exact = (
        a.join(b, F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("__cos"))
        .withColumn("rk", F.row_number().over(w))
        .where("rk <= 3")
        .select("src", "dst")
    ).localCheckpoint(True)
    n_exact = exact.count()

    fn = all_queries()["embedding_mutual_knn_clusters"]
    for t in TABLES:
        banded = multitable_sig_table(
            emb.select("vec_id", "e"), planes=planes, tables=t, vec_col="e"
        )
        cand = (
            banded.groupBy("t", "sig")
            .agg(F.collect_list("id").alias("ids"))
            .where(F.size("ids") <= 1000)
            .select(F.explode("ids").alias("src"), "ids")
            .select("src", F.explode("ids").alias("dst"))
            .where("src != dst")
            .distinct()
        )
        n_hit = exact.join(cand, ["src", "dst"], "left_semi").count()
        recall = n_hit / n_exact
        sq._MUTUAL_KNN_TABLES = t
        reps = []
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).count()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(
            f"tables={t}: recall={recall:.4f} ({n_hit}/{n_exact}) "
            f"min={min(reps):.2f}s of {[round(r, 2) for r in reps]} rows={rows}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
