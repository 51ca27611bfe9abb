"""Isolated A/B for the r7 `dedup_edit_distance` bench regression
(VERDICT r7 item 5): 2.38 s (r6) -> 3.71 s (r7) on byte-identical
operator code — 1.56x, beyond the documented ~1.3x session-context
envelope.

Hypothesis: the r7 bench HEADLINE grew by 14 queries (~40 s) ahead of
dedup_edit_distance; the accumulated JVM session state (code-cache and
broadcast churn, GC pressure) inflates later entries beyond what
clearCache+System.gc reclaims. Variants:

  A (isolated): fresh session, dedup_edit_distance alone, min-of-REPS.
  B (bench-context): same session AFTER executing the full bench
    HEADLINE prefix that precedes dedup_edit_distance (each prefix
    query once, bench-style clearCache+gc between), then min-of-REPS.

If A ~= the r6 number and B ~= the r7 number, the regression is
session context, not code — recorded in the operator docstring.

    python tools/ab_edit_distance.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _time_query(spark, qs, name, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return times


def main() -> None:
    from bench import HEADLINE
    from fred_economic_data_pipeline_local_spark.plans import all_queries
    from fred_economic_data_pipeline_local_spark.session import get_spark

    spark = get_spark(app_name="ab-edit-distance")
    qs = all_queries()
    spark.range(1_000_000).selectExpr("id % 32 as k", "id as v").groupBy(
        "k"
    ).count().count()

    # A: isolated
    a = _time_query(spark, qs, "dedup_edit_distance", REPS)
    print(f"# A isolated: min {min(a):.3f}s of {[round(t, 3) for t in a]}",
          file=sys.stderr)

    # B: after the bench prefix (everything before dedup_edit_distance)
    prefix = HEADLINE[: HEADLINE.index("dedup_edit_distance")]
    t0 = time.perf_counter()
    for name in prefix:
        if name in qs:
            qs[name](spark, SF_DIR).count()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    prefix_s = time.perf_counter() - t0
    b = _time_query(spark, qs, "dedup_edit_distance", REPS)
    print(f"# B bench-context (after {len(prefix)} queries, {prefix_s:.0f}s): "
          f"min {min(b):.3f}s of {[round(t, 3) for t in b]}", file=sys.stderr)

    print(json.dumps({
        "isolated_min": round(min(a), 3),
        "bench_context_min": round(min(b), 3),
        "ratio": round(min(b) / min(a), 2),
        "reps": REPS,
        "sf_dir": SF_DIR,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
