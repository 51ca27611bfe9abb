"""Oracle-visible intermediate exports.

The hash-family operators (MinHash/SimHash/hyperplane LSH, IVF cells)
derive candidates from xxhash64 — a hash DuckDB cannot recompute, which
is why those catalog entries historically carried only the weak
rows-only check. The fix (VERDICT r5 item 2) is the pattern
``tests/test_oracle_parity.py`` already proved locally: the operator's
INTERMEDIATE (signature table, band/bucket index, cell assignment) is
itself deterministic data. Export it as parquet, and the DuckDB oracle
recomputes the downstream candidate-generation + exact-verification
from the exported index with plain SQL — upgrading the driver's check
from rows-only to full value-hash equality. The hash computation itself
stays unverifiable by construction; everything AFTER it (bucketing,
candidate joins, caps, exact verify, ranking, tiebreaks) becomes
hash-gated.

At 100 TB this is not test scaffolding but the real shape: LSH band
tables, IVF assignments, and signature tables are persisted index
tables (bucketed, append-maintained — see ``incremental_minhash_
candidates``), and reading the operator's input back from the persisted
index is exactly what a production query does. ``export_table`` writes
the index once and returns the read-back DataFrame, so the downstream
plan consumes the materialized parquet (also truncating lineage, the
same job the localCheckpoints used to do on these paths).

The export root is a PER-PROCESS subdirectory of a fixed, git-ignored
location inside the repo (the only writable root the driver and the
local tests share): ``.oracle_exports/pid-<pid>``. The pid scoping,
computed ONCE at import, keeps every consumer consistent — oracle SQL
strings embed the absolute path at import time via ``export_sql`` and
``export_table`` writes under the same constant, so within one process
(or its forked children, which inherit the constant) query and oracle
always agree — while ISOLATING concurrent processes: a bench.py JVM
re-running an export-backed query can no longer rewrite the files a
concurrently-running test's oracle is reading (observed: the r7 driver
hash-reds' mechanism, reproduced locally as a FILE_NOT_EXIST on
``dedup_minhash_shingles`` with pytest and bench live at once).
Query → oracle ordering is guaranteed by the comparison protocol (the
Spark callable runs before the oracle SQL), matching both
``tests/oracle_utils.compare_query`` and the driver's sweep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_EXPORT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".oracle_exports",
)
EXPORT_DIR = os.path.join(_EXPORT_ROOT, f"pid-{os.getpid()}")


def _sweep_dead_pid_dirs() -> None:
    """Best-effort: drop pid-scoped export dirs whose owning process is
    gone (each run leaves one; at bench scale they hold a few MB). Only
    dirs whose pid is provably not alive are touched, so a live
    process — even an unrelated one that reused the pid — never loses
    its files. Pre-pid-scoping flat dirs are left alone."""
    import shutil

    try:
        names = os.listdir(_EXPORT_ROOT)
    except FileNotFoundError:
        return
    for name in names:
        if not name.startswith("pid-"):
            continue
        try:
            pid = int(name[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(_EXPORT_ROOT, name), ignore_errors=True)
        except PermissionError:
            pass  # alive, owned by someone else


_sweep_dead_pid_dirs()


def export_path(name: str) -> str:
    return os.path.join(EXPORT_DIR, name)


def export_sql(name: str) -> str:
    """DuckDB FROM-clause fragment reading an exported intermediate."""
    return f"read_parquet('{export_path(name)}/*.parquet')"


def export_table(df: DataFrame, name: str) -> DataFrame:
    """Materialize ``df`` at the fixed export location; return the
    read-back frame (the downstream plan consumes the same bytes the
    oracle reads — no recompute divergence window)."""
    path = export_path(name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
