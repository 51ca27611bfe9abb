"""SemDeDup cluster-then-prune pinned against a pure-Python sequential
reference (same nearest-seed assignment, same keep-lowest-id rule)."""

from __future__ import annotations

import math

from fred_economic_data_pipeline_local_spark.operators.similarity import (
    semdedup_prune,
)


def _py_semdedup(vecs, k, threshold):
    ids = sorted(vecs)
    seeds = ids[:k]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assign = {
        i: min(seeds, key=lambda s: (d2(vecs[i], vecs[s]), s)) for i in ids
    }
    pruned = set()
    for b in ids:
        for a in ids:
            if a >= b or assign[a] != assign[b]:
                continue
            na = math.sqrt(sum(x * x for x in vecs[a]))
            nb = math.sqrt(sum(x * x for x in vecs[b]))
            cs = sum(x * y for x, y in zip(vecs[a], vecs[b])) / (na * nb)
            if cs >= threshold:
                pruned.add(b)
                break
    return {i: (assign[i], i in pruned) for i in ids}


# ids 1 and 2 are the k=2 seeds (orthogonal); near-dups sit at HIGHER
# ids so they share their seed's cluster and the keep-lowest-id rule
# has something to do
VECS = {
    1: [1.0, 0.0, 0.0],
    2: [0.0, 1.0, 0.0],
    3: [0.99, 0.1, 0.0],    # cluster of 1, cos(1,3) ~0.995 -> pruned
    4: [0.98, 0.15, 0.0],   # cluster of 1, near 1 and 3 -> pruned
    5: [0.0, 0.97, 0.2],    # cluster of 2, cos(2,5) ~0.98 -> pruned
    6: [-1.0, 0.0, 0.1],    # cluster of 2, orthogonal to 2 -> kept
}


class TestSemdedup:
    def _run(self, spark, k, t):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in VECS.items()],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: (r.cluster_id, r.pruned)
            for r in semdedup_prune(df, k=k, threshold=t).collect()
        }
        return got

    def test_matches_sequential_reference(self, spark):
        assert self._run(spark, 2, 0.9) == _py_semdedup(VECS, 2, 0.9)

    def test_keeps_lowest_id_of_neardup_group(self, spark):
        got = self._run(spark, 2, 0.9)
        assert {i for i, (_, p) in got.items() if p} == {3, 4, 5}
        assert {i for i, (_, p) in got.items() if not p} == {1, 2, 6}

    def test_high_threshold_prunes_nothing(self, spark):
        got = self._run(spark, 2, 0.9999)
        assert not any(p for _, p in got.values())

    def test_cross_cluster_neardups_not_pruned(self, spark):
        # vectors 1 and 2 are near-dups; with k=6 every vector is its
        # own seed/cluster, so nothing shares a cluster -> no pruning
        got = self._run(spark, 6, 0.5)
        assert not any(p for _, p in got.values())
