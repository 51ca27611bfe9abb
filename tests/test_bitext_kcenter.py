"""Margin-based bitext mining (operators/bitext.py) and greedy
k-center coreset selection (operators/curation.kcenter_select)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.catalog import load_table
from fred_economic_data_pipeline_local_spark.operators.bitext import margin_pairs
from fred_economic_data_pipeline_local_spark.operators.curation import (
    kcenter_select,
)

SF_DIR = "/root/testdata/sf0.001"


def _sides(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    return (
        emb.where(F.col("label") == 0),
        emb.where(F.col("label") == 1),
    )


class TestMarginPairs:
    def test_forward_mining_shape_and_gate(self, spark):
        a, b = _sides(spark)
        got = margin_pairs(a, b, k_nn=4, threshold=1.0).collect()
        # at most one mined pair per source, all above the gate
        assert len({r["a_id"] for r in got}) == len(got)
        assert all(r["margin"] >= 1.0 for r in got)
        b_ids = {r["vec_id"] for r in b.select("vec_id").collect()}
        assert all(r["b_id"] in b_ids for r in got)

    def test_planted_exact_pair_mines_at_high_margin(self, spark):
        """A target identical to a source is cos 1.0 against it; with
        hubness normalization it must be that source's mined pair."""
        a, b = _sides(spark)
        probe = a.orderBy("vec_id").limit(1)
        probe_id = probe.collect()[0]["vec_id"]
        planted = probe.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        got = {
            r["a_id"]: r
            for r in margin_pairs(a, b.unionByName(planted), k_nn=4).collect()
        }
        assert got[probe_id]["b_id"] == probe_id + 10_000_000
        assert got[probe_id]["cos_sim"] == 1.0
        assert got[probe_id]["margin"] > 1.0

    def test_injected_full_pair_table_reproduces_default(self, spark):
        """`pairs` injection with the exhaustive pair table is the
        identity — the ANN swap-in changes candidates, not the math."""
        from fred_economic_data_pipeline_local_spark.operators.similarity import (
            _as_double,
            cosine,
        )
        from pyspark.sql.functions import broadcast

        a, b = _sides(spark)
        av = a.select(
            F.col("vec_id").alias("a_id"),
            _as_double(F.col("embedding")).alias("__av"),
        )
        bv = b.select(
            F.col("vec_id").alias("b_id"),
            _as_double(F.col("embedding")).alias("__bv"),
        )
        full = (
            bv.join(broadcast(av))
            .withColumn("cos_sim", F.round(cosine(F.col("__av"), F.col("__bv")), 6))
            .select("a_id", "b_id", "cos_sim")
        )
        default = sorted(map(tuple, margin_pairs(a, b, k_nn=4).collect()))
        injected = sorted(
            map(tuple, margin_pairs(a, b, k_nn=4, pairs=full).collect())
        )
        assert default == injected


class TestKCenter:
    def test_deterministic_trace_and_shape(self, spark):
        emb = load_table(spark, "embeddings", SF_DIR)
        t1 = [tuple(r) for r in kcenter_select(emb, k=6).collect()]
        t2 = [tuple(r) for r in kcenter_select(emb, k=6).collect()]
        assert t1 == t2
        assert [r[0] for r in t1] == list(range(6))
        ids = [r[1] for r in t1]
        assert len(set(ids)) == 6  # no re-selection
        min_id = emb.agg(F.min("vec_id")).collect()[0][0]
        assert ids[0] == min_id and t1[0][2] is None

    def test_selection_scores_non_increasing(self, spark):
        """Greedy max-min distances shrink (or hold) as centers grow —
        the k-center invariant."""
        emb = load_table(spark, "embeddings", SF_DIR)
        dists = [
            r["dist"] for r in kcenter_select(emb, k=6).collect() if r["dist"]
        ]
        assert all(a >= b for a, b in zip(dists, dists[1:]))

    def test_matches_sequential_reference(self, spark):
        """The distributed trace equals a plain sequential greedy
        k-center run in Python over the same vectors."""
        emb = load_table(spark, "embeddings", SF_DIR)
        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }

        def cos_dist(u, v):
            d = sum(x * y for x, y in zip(u, v))
            nu = math.sqrt(sum(x * x for x in u))
            nv = math.sqrt(sum(x * x for x in v))
            return round(1.0 - d / (nu * nv), 6)

        sel = [min(vecs)]
        expect = [(0, sel[0], None)]
        for step in range(1, 5):
            best = None
            for i, v in vecs.items():
                if i in sel:
                    continue
                d = min(cos_dist(v, vecs[c]) for c in sel)
                if best is None or (d, -i) > (best[1], -best[0]):
                    best = (i, d)
            sel.append(best[0])
            expect.append((step, best[0], best[1]))
        got = [tuple(r) for r in kcenter_select(emb, k=5).collect()]
        assert got == expect
