"""Isolated phase A/B for the round-7 PQ family bench numbers
(`similarity_pq_topk` 6.8 s, `similarity_ivfpq_topk` 8.5 s in the r7
bench preview — the two heaviest headline entries by 2x).

At sf0.1 the embeddings table is 2,000 rows x 64 dims, so wall clock is
fixed per-stage overhead (job count x scheduling + shuffle rounds), not
data volume. This tool splits the catalog entry into its phases to show
where the seconds go and to A/B structural changes:

  codebook   pq_codebook (1 Lloyd round, 2 localCheckpoints) + export
  codes      pq_codes (1 assignment pass) + export
  topk       pq_topk with injected codebook/codes (ADC + rescore DAG)
  full       the catalog entry end to end (what bench times)

    python tools/ab_pq.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
_NQUERY, _K, _M, _KC, _REFINE = 5, 10, 16, 16, 8


def timed(fn, reps=REPS):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.exports import export_table
    from fred_economic_data_pipeline_local_spark.operators.similarity import (
        pq_codebook,
        pq_codes,
        pq_topk,
    )
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab_pq")
    spark.range(1_000_000).selectExpr("id % 32 as k", "id as v").groupBy(
        "k"
    ).count().count()

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < _NQUERY)

    def phase_codebook():
        export_table(
            pq_codebook(emb, m_sub=_M, k_codes=_KC, dims=64), "ab_pq_codebook"
        ).count()

    def phase_codes():
        from fred_economic_data_pipeline_local_spark.exports import export_path

        cb = spark.read.parquet(export_path("ab_pq_codebook"))
        export_table(
            pq_codes(emb, cb, m_sub=_M, dims=64), "ab_pq_codes"
        ).count()

    def phase_topk():
        from fred_economic_data_pipeline_local_spark.exports import export_path

        cb = spark.read.parquet(export_path("ab_pq_codebook"))
        codes = spark.read.parquet(export_path("ab_pq_codes"))
        pq_topk(
            emb,
            queries,
            k=_K,
            m_sub=_M,
            k_codes=_KC,
            refine=_REFINE,
            dims=64,
            codebook=cb,
            codes=codes,
        ).count()

    qs = all_queries()

    def full():
        qs["similarity_pq_topk"](spark, SF_DIR).count()

    def full_ivfpq():
        qs["similarity_ivfpq_topk"](spark, SF_DIR).count()

    for name, fn in [
        ("codebook+export", phase_codebook),
        ("codes+export", phase_codes),
        ("topk(injected)", phase_topk),
        ("full pq_topk", full),
        ("full ivfpq_topk", full_ivfpq),
    ]:
        ts = timed(fn)
        print(f"{name:18s} min={min(ts):6.3f}  all={ts}")
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
