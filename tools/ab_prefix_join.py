"""Head-to-head: postings self-join vs PPJoin prefix filtering for the
exact n-gram Jaccard pair join, plus prefix-materialization variants —
the measurement VERDICT r5 item 3 asked for (the dedup.py:539 docstring
claimed numbers BENCH_r05 contradicted).

Variants:
  postings       ngram_jaccard_pairs (the live postings form)
  prefix         ngram_jaccard_pairs_prefix (live: checkpoint sh + prefix)
  prefix_nock    prefix with NO localCheckpoints (lineage recompute)
  prefix_shonly  prefix with only the shingle table checkpointed

Bench conditions: sf0.1, local[SPARK_GRAFT_CPUS], cache-clear + GC
between measurements, alternating order across reps.

    python tools/ab_prefix_join.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    shingle_df,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def prefix_variant(
    df: DataFrame,
    ck_sh: bool,
    ck_prefix: bool,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    shingle_k: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """ngram_jaccard_pairs_prefix with switchable materialization."""
    blocked = df.withColumn("block", F.col(block_col) if block_col else F.lit(1))
    sh = shingle_df(
        blocked, text_col, id_col, shingle_k, extra_cols=("block",)
    ).withColumn("__n", F.size("sh"))
    if ck_sh:
        sh = sh.localCheckpoint()
    ex = sh.select("id", "block", "__n", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("block", "s").agg(F.count(F.lit(1)).alias("__df"))
    t = float(threshold)
    w = Window.partitionBy("block", "id").orderBy(F.col("__df").asc(), F.col("s").asc())
    prefix = (
        ex.join(dfreq, ["block", "s"])
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1)
        .select("id", "block", "__n", "s")
    )
    if ck_prefix:
        prefix = prefix.localCheckpoint()
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.__n") >= F.lit(t) * F.col("b.__n"))
            & (F.col("b.__n") >= F.lit(t) * F.col("a.__n")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("__sha"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("__shb"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("__common", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__common")
                / (F.size("__sha") + F.size("__shb") - F.col("__common")).cast(
                    "double"
                ),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab_prefix_join")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # warm scan

    variants = {
        "postings": lambda: ngram_jaccard_pairs(docs, threshold=0.5),
        "prefix": lambda: ngram_jaccard_pairs_prefix(docs, threshold=0.5),
        "prefix_nock": lambda: prefix_variant(docs, ck_sh=False, ck_prefix=False),
        "prefix_shonly": lambda: prefix_variant(docs, ck_sh=True, ck_prefix=False),
    }
    timings: dict[str, list[float]] = {k: [] for k in variants}
    counts: dict[str, int] = {}
    for r in range(reps):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            counts[name] = fn().count()
            timings[name].append(time.perf_counter() - t0)
    assert len(set(counts.values())) == 1, f"variant results differ: {counts}"
    for name, ts in timings.items():
        print(
            f"{name}: min {min(ts):.2f}s of {[round(x, 2) for x in ts]} "
            f"({counts[name]} pairs)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
