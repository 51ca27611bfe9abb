"""HLL register-table sketch: exactness of the register derivation
(pinned against a pure-Python HLL over the same xxhash64 values),
losslessness of the max-merge, and the estimate's error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.profile import (
    hll_estimate,
    hll_merge,
    hll_registers,
)

P = 10
WBITS = 64 - P


def _py_registers(hashes: list[int], p: int) -> dict[int, int]:
    """Reference HLL registers from signed-64 xxhash values."""
    regs: dict[int, int] = {}
    wbits = 64 - p
    for h in hashes:
        uh = h & 0xFFFFFFFFFFFFFFFF
        reg = uh >> wbits
        w = uh & ((1 << wbits) - 1)
        rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
        rho = min(rho, 52 - p)  # the operator's exact-summation cap
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_registers_match_pure_python(spark):
    df = spark.createDataFrame(
        [(f"val{i}",) for i in range(500)], "doc string"
    )
    hashes = [
        r["h"] for r in df.select(F.xxhash64("doc").alias("h")).collect()
    ]
    want = _py_registers(hashes, P)
    got = {
        r["reg"]: r["rho"]
        for r in hll_registers(df, "doc", p=P).collect()
    }
    assert got == want


def test_merge_of_split_equals_whole(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "id long, doc string"
    )
    whole = hll_registers(df, "doc", p=P)
    a = hll_registers(df.where("id % 2 = 0"), "doc", p=P)
    b = hll_registers(df.where("id % 2 = 1"), "doc", p=P)
    merged = hll_merge(a, b)
    w = {(r["reg"], r["rho"]) for r in whole.collect()}
    m = {(r["reg"], r["rho"]) for r in merged.collect()}
    assert w == m


def test_estimate_within_standard_error(spark):
    # HLL standard error is 1.04/sqrt(m) ~ 3.25% at p=10; allow 4 sigma
    n = 5000
    df = spark.createDataFrame([(f"x{i}",) for i in range(n)], "doc string")
    est = hll_estimate(hll_registers(df, "doc", p=P), p=P).collect()[0]
    rel = abs(est["n_distinct_est"] - n) / n
    assert rel < 4 * 1.04 / (1 << P) ** 0.5, rel


def test_grouped_estimate_and_duplicates_ignored(spark):
    rows = [("a", f"v{i % 100}") for i in range(1000)] + [
        ("b", f"w{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "grp string, doc string")
    out = {
        r["grp"]: r["n_distinct_est"]
        for r in hll_estimate(
            hll_registers(df, "doc", p=P, by="grp"), p=P, by=True
        ).collect()
    }
    # small-range linear counting is near-exact here
    assert abs(out["a"] - 100) / 100 < 0.1
    assert abs(out["b"] - 50) / 50 < 0.1


def test_rho_capped_for_exact_summation(spark):
    df = spark.createDataFrame(
        [(f"val{i}",) for i in range(2000)], "doc string"
    )
    mx = hll_registers(df, "doc", p=P).agg(F.max("rho")).collect()[0][0]
    assert mx <= 52 - P
