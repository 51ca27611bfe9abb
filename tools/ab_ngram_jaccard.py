"""Head-to-head: grouped-posting-list vs exploded-self-join pair
generation for ngram_jaccard_pairs, under bench.py conditions (sf0.1,
local[SPARK_GRAFT_CPUS], cache-clear + GC between measurements,
alternating order so JVM drift hits both variants equally).

The LIVE operator (``ngram_jaccard_pairs``) is the self-join form; the
grouped form (round 2's collect_list + double-explode rewrite, reverted
in round 3) is preserved verbatim below as ``grouped_variant`` so the
comparison stays reproducible from the repo alone.

    python tools/ab_ngram_jaccard.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    ngram_jaccard_pairs,
    shingle_df,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def grouped_variant(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    shingle_k: int = 2,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Round 2's pair generation (commit f71e54b), kept verbatim for
    measurement: group postings per (block, shingle), emit each list's
    id pairs with a double explode — one exchange for the lists + one
    for the pair counts, versus the self-join's shuffled-both-sides."""
    blocked = df.withColumn("block", F.col(block_col) if block_col else F.lit(1))
    sh = shingle_df(
        blocked, text_col, id_col, shingle_k, extra_cols=("block",)
    ).withColumn("__n", F.size("sh"))
    postings = (
        sh.select("id", "block", "__n", F.explode("sh").alias("s"))
        .groupBy("block", "s")
        .agg(F.collect_list(F.struct("id", "__n")).alias("docs"))
    )
    if df_cap is not None:
        postings = postings.where(F.size("docs") <= df_cap)
    t = F.lit(float(threshold))
    pairs = (
        postings.select(F.explode("docs").alias("a"), F.col("docs"))
        .select("a", F.explode("docs").alias("b"))
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.__n") >= t * F.col("b.__n"))
            & (F.col("b.__n") >= t * F.col("a.__n"))
        )
    )
    common = pairs.groupBy(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.__n").alias("na"),
        F.col("b.__n").alias("nb"),
    ).agg(F.count(F.lit(1)).alias("common"))
    return (
        common.withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab_ngram")
    docs = load_table(spark, "documents", SF_DIR)

    # warm-up, same as bench.py
    spark.range(1_000_000).selectExpr("id % 32 as k", "id as v").groupBy(
        "k"
    ).count().count()

    variants = {
        "grouped": lambda: grouped_variant(docs, df_cap=None),
        "selfjoin": lambda: ngram_jaccard_pairs(docs, df_cap=None),
    }
    n_g = variants["grouped"]().count()
    n_s = variants["selfjoin"]().count()
    print(f"# rows grouped={n_g} selfjoin={n_s} (must match)", file=sys.stderr)
    assert n_g == n_s

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        order = list(variants) if r % 2 == 0 else list(reversed(variants))
        for name in order:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            variants[name]().count()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name}: min={ts[0]:.3f} median={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
