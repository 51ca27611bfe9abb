"""Product-quantization ANN (operators/similarity.py pq_*): codebook
determinism, index shape, the exact-duplicate recall limit, and the
recall floor vs brute force on the fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.similarity import (
    brute_force_topk,
    pq_codebook,
    pq_codes,
    pq_topk,
)

SF_DIR = "/root/testdata/sf0.001"
CFG = dict(m_sub=16, k_codes=16, dims=64)


def test_codebook_deterministic_and_shaped(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    cb1 = sorted(map(tuple, pq_codebook(emb, **CFG).collect()))
    cb2 = sorted(map(tuple, pq_codebook(emb, **CFG).collect()))
    assert cb1 == cb2
    # m_sub * k_codes * sub_dims rows, every (m, c) cell present
    assert len(cb1) == 16 * 16 * 4
    ms = {r[0] for r in cb1}
    cs = {r[1] for r in cb1}
    assert ms == set(range(16)) and cs == set(range(16))


def test_codes_one_per_vector_subspace(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    cb = pq_codebook(emb, **CFG)
    codes = pq_codes(emb, cb, m_sub=16, dims=64)
    n = emb.count()
    assert codes.count() == n * 16
    assert codes.groupBy("id").count().where(F.col("count") != 16).count() == 0
    # codes are valid centroid ids
    assert codes.where((F.col("code") < 0) | (F.col("code") >= 16)).count() == 0


def test_indivisible_dims_rejected(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebook(emb, m_sub=7, dims=64)


def test_exact_duplicates_always_rank_first(spark):
    """The recall limit at its sharpest: a planted exact duplicate gets
    the identical code word, so its ADC score is the maximal
    self-reconstruction score and it cannot fall out of the shortlist;
    the exact rescore then pins cos 1.0 at rank 1."""
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < 5)
    planted = queries.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    top = pq_topk(corpus, queries, k=10, refine=8, **CFG)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    first = {
        r["query_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in top.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    for qid in range(5):
        nid, cos = first[qid]
        assert nid == qid + 10_000_000
        assert cos == pytest.approx(1.0)


def test_recall_floor_vs_brute_force(spark):
    """Hash-random fixture vectors are PQ's adversarial case (no
    cluster structure for the codebooks to exploit); the floor reflects
    that regime, not production corpora."""
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < 20)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, k=10, refine=8, **CFG).collect()
    }
    recall = len(pq & bf) / len(bf)
    assert recall >= 0.5, recall


class TestIvfPq:
    def test_recall_floor_and_candidate_restriction(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.similarity import (
            ivfpq_topk,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        queries = emb.where(F.col("vec_id") < 20)
        bf = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, queries, k=10).collect()
        }
        got = ivfpq_topk(emb, queries, k=10, nprobe=2, refine=8, **CFG)
        pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        recall = len(pairs & bf) / len(bf)
        assert recall >= 0.4, recall  # compounds cell miss x shortlist miss

    def test_ivfpq_contained_in_probed_cells(self, spark):
        """Every returned neighbor must come from a probed cell — the
        inverted-list restriction is real, not advisory."""
        from fred_economic_data_pipeline_local_spark.operators.similarity import (
            ivf_assign,
            ivf_probes,
            ivfpq_topk,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        queries = emb.where(F.col("vec_id") < 10)
        assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
        probes = ivf_probes(queries, cents, nprobe=2)
        got = ivfpq_topk(
            emb, queries, k=10, assign=assign, probes=probes, **CFG
        )
        allowed = {
            (r["query_id"], r["id"])
            for r in probes.join(assign, "cell").collect()
        }
        for r in got.collect():
            assert (r["query_id"], r["neighbor_id"]) in allowed

    def test_one_sided_index_injection_rejected(self, spark):
        """assign and probes share centroid geometry; injecting one
        while re-deriving the other from fresh seed centroids would
        silently collapse recall — it must raise instead."""
        from fred_economic_data_pipeline_local_spark.operators.similarity import (
            ivf_assign,
            ivfpq_topk,
        )

        emb = load_table(spark, "embeddings", SF_DIR)
        queries = emb.where(F.col("vec_id") < 5)
        assign, _ = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
        with pytest.raises(ValueError, match="together"):
            ivfpq_topk(emb, queries, k=10, assign=assign, **CFG)


def test_incremental_encode_equals_full_reencode(spark):
    """Appending delta codes to the persisted base index reproduces a
    full re-encode under the same frozen codebook — encoding is
    row-local, so index maintenance is O(delta) by construction."""
    emb = load_table(spark, "embeddings", SF_DIR)
    base = emb.where(F.col("vec_id") % 13 != 0)
    delta = emb.where(F.col("vec_id") % 13 == 0)
    cb = pq_codebook(base, **CFG)
    incremental = pq_codes(base, cb, m_sub=16, dims=64).unionByName(
        pq_codes(delta, cb, m_sub=16, dims=64)
    )
    full = pq_codes(emb, cb, m_sub=16, dims=64)
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, full.collect())
    )
