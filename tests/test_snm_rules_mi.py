"""Unit pins for sorted-neighborhood pair generation, association-rule
scoring, and token-label mutual information (parity tests cover the
DuckDB mirrors; these pin semantics on constructed inputs)."""

from __future__ import annotations

import math

import pytest


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- sorted_neighborhood_pairs --------------------------------------------------


def test_snm_pair_count_is_n_times_w_minus_tail(spark):
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    # one block of 6 records, window 2 -> pairs = (6-1) + (6-2) = 9
    df = spark.createDataFrame(
        [("b", i, float(i * 10)) for i in range(6)],
        "blk string, id long, v double",
    )
    pairs = _rows(
        sorted_neighborhood_pairs(df, "id", "blk", ["v"], window=2)
    )
    assert len(pairs) == 9
    # every pair's rank distance respects the window and sort order
    got = {(a, b) for _, a, b, _ in pairs}
    want = {(i, j) for i in range(6) for j in range(i + 1, min(i + 3, 6))}
    assert got == want


def test_snm_does_not_pair_across_blocks(spark):
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [("x", 1, 1.0), ("x", 2, 2.0), ("y", 3, 1.5)],
        "blk string, id long, v double",
    )
    pairs = _rows(sorted_neighborhood_pairs(df, "id", "blk", ["v"], window=3))
    assert {(blk, a, b) for blk, a, b, _ in pairs} == {("x", 1, 2)}


def test_snm_carries_attributes_and_validates_window(spark):
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [("b", 1, 5.0), ("b", 2, 7.0)], "blk string, id long, v double"
    )
    [(blk, a, b, gap, va, vb)] = _rows(
        sorted_neighborhood_pairs(df, "id", "blk", ["v"], 1, carry=["v"])
    )
    assert (blk, a, b, gap, va, vb) == ("b", 1, 2, 1, 5.0, 7.0)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "blk", ["v"], 0)


# --- assoc_rules_parts (scoring math on a constructed basket set) ----------------


def test_assoc_rules_scoring_math(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fred_economic_data_pipeline_local_spark.plans import all_queries

    # 4 baskets; A={1,2} B={1,2} C={1,3} D={2}: pair (1,2) support 2/4,
    # conf(1->2) = 2/3, lift = (2*4)/(3*3)
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2)]
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(table, sf / "lineitem.parquet")
    got = {
        (ant, cons): (n, s, c, lf)
        for ant, cons, n, s, c, lf in _rows(
            all_queries()["assoc_rules_parts"](spark, str(sf))
        )
    }
    assert got[(1, 2)] == (2, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    assert got[(2, 1)] == (2, 0.5, round(2 / 3, 6), round(8 / 9, 6))
    # min-support prunes the singleton pairs (1,3) etc.
    assert set(got) == {(1, 2), (2, 1)}


# --- text_token_mi_lang (MI math on a constructed corpus) ------------------------


def test_token_mi_math(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fred_economic_data_pipeline_local_spark.plans import all_queries

    # 4 docs, 2 en; token "aa" in both en docs only -> perfectly
    # informative; token "zz" in one of each -> partially informative
    docs = [
        (0, "aa zz", "en"),
        (1, "aa", "en"),
        (2, "zz", "fr"),
        (3, "qq", "fr"),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "lang": pa.array([d[2] for d in docs]),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(table, sf / "documents.parquet")
    got = {
        tok: (df_t, df_en, mi)
        for tok, df_t, df_en, mi in _rows(
            all_queries()["text_token_mi_lang"](spark, str(sf))
        )
    }

    def mi_cells(cells, n):
        total = 0.0
        for nij, r, c in cells:
            if nij > 0:
                total += (nij / n) * math.log(n * nij / (r * c))
        return round(total, 6)

    # "aa": n11=2 n10=0 n01=0 n00=2; marginals r1=2 r0=2 c1=2 c0=2
    want_aa = mi_cells([(2, 2, 2), (0, 2, 2), (0, 2, 2), (2, 2, 2)], 4)
    assert got["aa"] == (2, 2, want_aa)
    # "zz": n11=1 n10=1 n01=1 n00=1 -> independent, MI = 0
    assert got["zz"] == (2, 1, 0.0)


def test_snm_pair_count_exact_on_fixture(spark):
    """Regression for the AQE pid-layout drift (round 11): without the
    ranged-frame checkpoint, the probes and join sides could rank
    against different physical executions and inflate the pair count
    ~8% at sf0.1. The count must equal the closed form
    sum_blocks(n_b * w - w(w+1)/2) exactly, every run."""
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    cust = load_table(spark, "customer", "/root/testdata/sf0.001")
    sizes = [
        r["n"]
        for r in cust.groupBy("c_mktsegment").count().withColumnRenamed(
            "count", "n"
        ).collect()
    ]
    w = 3
    want = sum(n * w - w * (w + 1) // 2 for n in sizes)
    for _ in range(2):
        pairs = sorted_neighborhood_pairs(
            cust, "c_custkey", "c_mktsegment", ["c_acctbal"], window=w
        )
        assert pairs.count() == want
