"""Isolated A/B for the two flagged similarity bench numbers (VERDICT r6
item 2): `similarity_ivf_topk` 2.41 s (r5) -> 3.08 s (r6) and the
`similarity_quantized_topk` commit-message "2.6 s" vs BENCH_r06 3.34 s.

Hypotheses measured:
  H1 (ivf): round 6's hash-upgrade ADDED two export_table parquet
     write+read round trips (similarity_ivf_assign / _probes) to the
     CATALOG query — the operator itself was untouched, the catalog
     entry was not. The r5 number predates the exports, so the "1.28x
     regression on untouched code" is the export cost, not a plan
     regression. Variants: live (with exports) vs noexport (identical
     plan, exports skipped).
  H2 (quantized): the commit-message number was measured in a light
     session; BENCH runs it after ~20 queries whose broadcast/shuffle
     state and GC pressure inflate wall clock even with clearCache+GC
     between queries. Variants: isolated vs bench-context (the full
     HEADLINE prefix before it, as bench.py runs it).

Conditions mirror bench.py: sf0.1, local[SPARK_GRAFT_CPUS], count() to
force execution, clearCache + System.gc between reps, min-of-reps.

    python tools/ab_similarity.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
_NQUERY, _K = 100, 10


def ivf_noexport(spark, sf_dir):
    """similarity_ivf_topk with the exports elided — byte-identical
    operator plan, no mid-query parquet round trips."""
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.similarity import (
        ivf_assign,
        ivf_probes,
        ivf_topk_from,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    probes = ivf_probes(queries, cents, nprobe=2)
    return ivf_topk_from(emb, queries, assign, probes, k=_K)


def timed(spark, fn, reps=REPS):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        out.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return out


def main() -> None:
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    qs = all_queries()
    spark = get_spark(app_name="ab_similarity")
    # bench.py's warm-up
    spark.range(1_000_000).selectExpr("id % 32 as k", "id as v").groupBy(
        "k"
    ).count().count()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").count()

    res: dict[str, list[float]] = {}
    # --- isolated: fresh-ish session, nothing ran before ---
    res["quantized_isolated"] = timed(spark, qs["similarity_quantized_topk"])
    res["ivf_noexport_isolated"] = timed(spark, ivf_noexport)
    res["ivf_live_isolated"] = timed(spark, qs["similarity_ivf_topk"])

    # --- bench context: replay the HEADLINE prefix before each target ---
    from bench import HEADLINE

    for target in ("similarity_ivf_topk", "similarity_quantized_topk"):
        for name in HEADLINE[: HEADLINE.index(target)]:
            if name in qs:
                qs[name](spark, SF_DIR).count()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        res[target.split("similarity_")[1] + "_benchctx"] = timed(
            spark, qs[target], reps=3
        )

    for k, v in res.items():
        print(f"{k}: min {min(v):.3f}s of {v}")
    spark.stop()


if __name__ == "__main__":
    main()
