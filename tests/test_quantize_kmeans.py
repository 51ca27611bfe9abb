"""int8 quantization, quantized ANN, and k-means assignment operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fred_economic_data_pipeline_local_spark.operators.similarity import (
    brute_force_topk,
    kmeans_assign_report,
    quantize_int8_stats,
    quantized_topk,
)

from .conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


class TestQuantizeInt8:
    def test_error_bound_holds_corpus_wide(self, spark):
        """max |x - code*scale| <= scale/2: the defining property of
        half-up rounding at the int8 grid — a violation means the
        quantizer is broken, independent of the data.

        Both report columns are rounded to 6 dp, so the comparison gets
        one ulp-of-rounding slack per side (1e-6 total): a true err of
        .00132258 against a true bound of .00132268 legitimately rounds
        to .001323 > .001323/… — that's reporting precision, not a
        quantizer defect."""
        stats = quantize_int8_stats(_emb(spark))
        bad = stats.where(
            F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1.01e-6)
        ).count()
        assert bad == 0
        assert stats.count() == _emb(spark).count()

    def test_zero_vector_quantizes_to_zero(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
            "vec_id long, embedding array<double>",
        )
        rows = {r["id"]: r for r in quantize_int8_stats(df).collect()}
        assert rows[1]["scale"] == 0.0
        assert rows[1]["sum_codes"] == 0
        assert rows[1]["max_abs_err"] == 0.0
        # max-abs dim codes to exactly +/-127 (scale reported at 6 dp)
        assert rows[2]["scale"] == pytest.approx(2.0 / 127.0, abs=1e-6)

    def test_codes_reconstruct_known_vector(self, spark):
        # scale = 1.27/127 = 0.01; codes = [100, -50, 127]
        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 1.27])], "vec_id long, embedding array<double>"
        )
        r = quantize_int8_stats(df).collect()[0]
        assert r["sum_codes"] == 100 - 50 + 127
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12


class TestQuantizedTopk:
    def test_recall_vs_brute_force(self, spark):
        """int8 candidate ranking with 3x refinement must recover almost
        all true top-10 neighbors; < 0.9 recall would mean the code path
        (not quantization noise) is wrong."""
        emb = _emb(spark)
        queries = emb.where(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, queries, k=10).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in quantized_topk(emb, queries, k=10, refine=3).collect()
        }
        assert len(approx) == len(exact)
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9

    def test_rescore_is_exact_cosine(self, spark):
        """Surviving pairs carry the EXACT cosine, not the quantized
        approximation: every (q, n, cos) also present in brute force must
        agree to the rounded digit."""
        emb = _emb(spark)
        queries = emb.where(F.col("vec_id") < 3)
        exact = {
            (r["query_id"], r["neighbor_id"]): r["cos_sim"]
            for r in brute_force_topk(emb, queries, k=10).collect()
        }
        for r in quantized_topk(emb, queries, k=10, refine=3).collect():
            key = (r["query_id"], r["neighbor_id"])
            if key in exact:
                assert r["cos_sim"] == exact[key]


class TestKmeansAssign:
    def test_partition_of_corpus(self, spark):
        """Every vector lands in exactly one cluster; cluster ids are the
        k lowest vec_ids; inertia is non-negative."""
        emb = _emb(spark)
        n = emb.count()
        rep = kmeans_assign_report(emb, k=8).collect()
        assert sum(r["n_members"] for r in rep) == n
        seed_ids = {
            r["vec_id"]
            for r in emb.select("vec_id").orderBy("vec_id").limit(8).collect()
        }
        assert {r["cluster_id"] for r in rep} <= seed_ids
        assert all(r["avg_sqdist"] >= 0 for r in rep)

    def test_seed_is_its_own_nearest(self, spark):
        """With well-separated seeds, each seed vector must sit in its own
        cluster (distance 0 beats every other centroid)."""
        df = spark.createDataFrame(
            [
                (0, [10.0, 0.0]),
                (1, [-10.0, 0.0]),
                (2, [10.1, 0.0]),
                (3, [-9.9, 0.1]),
            ],
            "vec_id long, embedding array<double>",
        )
        rep = {r["cluster_id"]: r for r in kmeans_assign_report(df, k=2).collect()}
        assert rep[0]["n_members"] == 2  # vec 0 and 2
        assert rep[1]["n_members"] == 2  # vec 1 and 3

    def test_no_sort_window_in_plan(self, spark):
        """The argmin is a min_by aggregate (partial completes map-side):
        a Window node in the plan would mean the narrow-shuffle design
        regressed to a sort-the-world row_number formulation."""
        plan = kmeans_assign_report(_emb(spark), k=8)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # k-row broadcast seeds


class TestValidation:
    def test_rejects_bad_parameters(self, spark):
        import pytest as _pt

        from fred_economic_data_pipeline_local_spark.operators.curation import (
            shuffle_assignment,
        )
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bpe_train,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pt.raises(ValueError):
            shuffle_assignment(docs, n_buckets=0)
        with _pt.raises(ValueError):
            kmeans_assign_report(_emb(spark), k=0)
        with _pt.raises(ValueError):
            bpe_train(docs, min_freq=0)

    def test_bpe_empty_corpus_returns_no_merges(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.text import (
            bpe_train,
        )

        docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
        merges, vocab = bpe_train(docs, n_merges=4)
        assert merges == []
        assert vocab.count() == 0
