"""Full-catalog oracle sweep with a per-entry wall-clock budget.

driver_rehearsal.py mirrors the external driver exactly but has no
defense against an oracle whose DuckDB cost explodes at larger scale
factors: at sf0.1 the brute-force ground-truth side of the eval
entries (e.g. embedding_mutual_knn_clusters' exact 3-NN over the full
corpus) is an eval-harness cost, not a plan under test, and one such
entry can eat the whole sweep. This runner gives every entry a
SIGALRM budget (DuckDB and py4j both surface the interrupt as an
exception), records ok / MISMATCH / TIMEOUT / ERROR per entry with
timings, and writes a JSON summary — the artifact behind the
"full-catalog sweep at sf0.1" record in CHANGELOG.md.

    python tools/sweep_oracle.py [sf_dir] [budget_s] [out_json]
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Budget(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Budget()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sweep_oracle.json"

    from pyspark.sql import SparkSession

    from fred_economic_data_pipeline_local_spark.plans import all_oracles, all_queries
    from fred_economic_data_pipeline_local_spark.plans.registry import CATALOG_ORDER
    from tests.oracle_utils import compare_query

    # vanilla session: the same shape the external driver builds
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        # harness capacity, not semantics: one JVM hosts all 322
        # entries back-to-back, which no real driver session does —
        # size the heap for the sweep's cumulative footprint
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SWEEP_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = all_queries(), all_oracles()
    signal.signal(signal.SIGALRM, _alarm)

    results: dict[str, dict] = {}
    t_all = time.time()
    for i, name in enumerate(CATALOG_ORDER, 1):
        t0 = time.time()
        signal.alarm(budget)
        try:
            if name in oracles:
                compare_query(spark, name, sf_dir)
                status = "ok"
            else:
                n = qs[name](spark, sf_dir).count()
                status = f"rows-only({n})"
        except _Budget:
            status = "TIMEOUT"
        except AssertionError as e:
            status = f"MISMATCH: {str(e)[:200]}"
        except Exception as e:  # noqa: BLE001 - sweep must survive
            status = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
        finally:
            signal.alarm(0)
        dt = round(time.time() - t0, 1)
        results[name] = {"status": status, "sec": dt}
        print(f"[{i}/{len(CATALOG_ORDER)}] {name}: {status} ({dt}s)", flush=True)
        spark.catalog.clearCache()
        # release py4j refs so the ContextCleaner can drop the finished
        # query's broadcasts / localCheckpoint blocks — a 322-entry
        # sweep otherwise accumulates them in the single local-mode
        # heap until it OOMs (observed at entry 278 once the two-pass
        # rank entries added eager checkpoint storage)
        import gc

        gc.collect()
        if i % 50 == 0:
            spark.sparkContext._jvm.System.gc()

    ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {
        "sf_dir": sf_dir,
        "budget_s": budget,
        "total_sec": round(time.time() - t_all, 1),
        "n": len(results),
        "ok": ok,
        "not_ok": {
            k: v for k, v in results.items() if v["status"] != "ok"
        },
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(
        f"SWEEP DONE: {ok}/{len(results)} ok in {summary['total_sec']}s "
        f"-> {out_path}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
