"""Head-to-head: per-snapshot incremental ingest vs full-corpus
recompute, under bench.py conditions (sf0.1, local[SPARK_GRAFT_CPUS],
cache-clear + GC between measurements, alternating order).

Scenario: the corpus is already ingested (every doc_id % 5 != 0); a new
snapshot delivers the remaining 20%. "full" re-runs the corpus-wide
operator over everything, which is what a pipeline without index
maintenance must do every snapshot; "incremental" signs/fingerprints the
DELTA only and probes the persisted index. Index construction is
EXCLUDED from the incremental timings — it was paid at previous
snapshots (that amortization is the operator's whole point) — so the
index is materialized (checkpoint/parquet-shaped localCheckpoint) before
the loop.

    python tools/ab_incremental.py [reps]

Measured (sf0.1, local[32], min of 4 alternating reps):
  exact_full=0.491s  exact_incremental=0.381s   (1.3x win)
  minhash_full=1.788s  minhash_incremental=2.179s (1.2x LOSS)
Honest reading: at 60k-row fixture scale the MinHash pipeline is
fixed-overhead-bound, not data-bound — signing the full corpus and
signing the 20% delta cost the same 0.78s (per-job scheduling over
near-empty shuffle partitions dominates), so the incremental path's
extra join/aggregate overheads outweigh the signing it skips. The
per-doc regime only emerges as data grows: on a 20x-replicated corpus
(100k docs) full signing is 1.37s vs 0.92s for the delta — the
corpus-proportional component scales with the 5x data ratio above a
~0.8s fixed floor. The operator's advantage is structural — O(delta)
document text shuffled vs O(corpus) — which is what matters at 100 TB
and is invisible at fixture scale; the equivalence tests, not this
A/B, are its correctness evidence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        duplicate_groups,
        exact_dedup,
        incremental_exact_dedup,
        incremental_minhash_candidates,
        minhash_banded,
        minhash_candidates,
    )
    from fred_economic_data_pipeline_local_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab_incremental")
    docs = load_table(spark, "documents", SF_DIR)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    existing = docs.where(F.col("doc_id") % 5 != 0)

    # warm-up, same as bench.py
    spark.range(1_000_000).selectExpr("id % 32 as k", "id as v").groupBy(
        "k"
    ).count().count()

    # persisted state from previous snapshots — built once, outside timing
    fp_index = duplicate_groups(existing).select(
        "fingerprint", "keep_id"
    ).localCheckpoint()
    band_index = minhash_banded(existing)  # localCheckpoints internally

    variants = {
        "exact_full": lambda: exact_dedup(docs),
        "exact_incremental": lambda: incremental_exact_dedup(
            incoming, fp_index
        )[0],
        "minhash_full": lambda: minhash_candidates(docs),
        "minhash_incremental": lambda: incremental_minhash_candidates(
            incoming, band_index
        )[0],
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        order = list(variants) if r % 2 == 0 else list(reversed(variants))
        for name in order:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n = variants[name]().count()
            times[name].append(time.perf_counter() - t0)
            if r == 0:
                print(f"# {name}: {n} rows", file=sys.stderr)
    for name, ts in times.items():
        ts = sorted(ts)
        print(
            f"{name}: min={ts[0]:.3f} median={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
