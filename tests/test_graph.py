"""PageRank pinned against a pure-Python sequential reference, with the
same per-iteration rounding contract the oracle uses."""

from __future__ import annotations

from fred_economic_data_pipeline_local_spark.operators.graph import (
    pagerank,
    pagerank_topk,
)


def _py_pagerank(edges, iterations=5, d=0.85, dp=8):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: round(1.0 / n, dp) for v in nodes}
    for _ in range(iterations):
        s = {v: 0.0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] / out[u]
        r = {v: round((1 - d) / n + d * s[v], dp) for v in nodes}
    return r


EDGES = [
    ("a", "b"),
    ("b", "a"),
    ("a", "c"),
    ("c", "a"),
    ("b", "c"),
    ("c", "b"),
    ("c", "d"),
    ("d", "c"),
]


class TestPagerank:
    def test_matches_sequential_reference(self, spark):
        df = spark.createDataFrame(EDGES, "src string, dst string")
        got = {r.node: r.rank for r in pagerank(df).collect()}
        assert got == _py_pagerank(EDGES)

    def test_rank_sums_to_one(self, spark):
        df = spark.createDataFrame(EDGES, "src string, dst string")
        total = sum(r.rank for r in pagerank(df).collect())
        assert abs(total - 1.0) < 1e-6

    def test_high_degree_node_ranks_first(self, spark):
        # c has in-edges from a, b, d — the hub
        df = spark.createDataFrame(EDGES, "src string, dst string")
        top = pagerank_topk(df, k=1).collect()[0]
        assert top.node == "c"

    def test_zero_in_degree_keeps_floor(self, spark):
        # directed: x -> y only; x gets exactly (1-d)/N each iteration
        df = spark.createDataFrame(
            [("x", "y"), ("y", "y2"), ("y2", "x")], "src string, dst string"
        )
        got = {r.node: r.rank for r in pagerank(df, iterations=1).collect()}
        ref = _py_pagerank(
            [("x", "y"), ("y", "y2"), ("y2", "x")], iterations=1
        )
        assert got == ref


class TestTriangles:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, ["src", "dst"])

    def test_k4_counts(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.graph import (
            triangle_counts,
        )

        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        out = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(self._edges(spark, k4)).collect()
        }
        # K4 has 4 triangles; every node sits in C(3,2) = 3 of them
        assert out == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_star_has_no_triangles(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.graph import (
            triangle_counts,
        )

        star = [(0, i) for i in range(1, 6)]
        assert triangle_counts(self._edges(spark, star)).count() == 0

    def test_duplicates_reverses_and_self_loops_ignored(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.graph import (
            triangle_counts,
        )

        messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 2), (0, 1)]
        out = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(self._edges(spark, messy)).collect()
        }
        assert out == {0: 1, 1: 1, 2: 1}

    def test_topk_ordering_and_no_cartesian(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.graph import (
            triangle_counts,
        )

        # two triangles sharing node 0 -> node 0 leads
        edges = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
        df = triangle_counts(self._edges(spark, edges), topk=3)
        rows = df.collect()
        assert rows[0]["node"] == 0 and rows[0]["n_triangles"] == 2
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
