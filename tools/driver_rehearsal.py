"""Rehearse the external driver's correctness sweep exactly: a VANILLA
SparkSession (none of session.py's tuning — the driver builds its own),
the first N entries of the static catalog order, sf0.01, and the DuckDB
oracle comparison for every oracle-backed entry (rows-only execution +
schema check otherwise).

This is the strongest pre-round guarantee available locally: anything
that would turn a CORRECTNESS_r{N}.json row red — a conf the engine
silently depends on, a dtype the driver's canonicalization hashes
differently, a query that only breaks at the driver's scale — breaks
here first, on the same session shape the driver uses.

``--contend`` additionally runs bench.py in a SECOND JVM for the whole
sweep (sf0.001 so it loops continuously) — the concurrent-process shape
the r7 driver host may have had when the two shared-scratch lakehouse
rows went hash-red: any query whose result lazily depends on files
another process rewrites fails here first. (VERDICT r7 item 6.)

    python tools/driver_rehearsal.py [n_window] [sf_dir] [--contend]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--contend"]
    contend = "--contend" in sys.argv[1:]
    n_window = int(args[0]) if len(args) > 0 else 50
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    bench_proc = None
    if contend:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
            SPARK_GRAFT_CPUS="8",
            SPARK_GRAFT_BENCH_REPS="3",
        )
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench_proc = subprocess.Popen(
            [sys.executable, os.path.join(here, "bench.py")],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        print("contention: bench.py running in a second JVM "
              f"(pid {bench_proc.pid})", file=sys.stderr)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle_utils import compare_query

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver_rehearsal")
        .getOrCreate()
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    window = list(qs)[:n_window]
    failures = []
    for i, name in enumerate(window, 1):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                compare_query(spark, name, sf_dir)
                status = "hash-ok"
            else:
                df = qs[name](spark, sf_dir)
                n = df.count()
                assert df.columns, "empty schema"
                status = f"rows-ok ({n})"
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            status = f"FAIL: {exc}"
            failures.append(name)
        print(f"[{i:2d}/{n_window}] {name}: {status} "
              f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    print(f"rehearsed {n_window} window entries at {sf_dir} on a vanilla "
          f"session{' UNDER CONTENTION' if contend else ''}: "
          f"{len(failures)} failures {failures or ''}")
    if bench_proc is not None:
        bench_proc.terminate()
        bench_proc.wait(timeout=60)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
