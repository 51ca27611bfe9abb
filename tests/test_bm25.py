"""BM25 top-k retrieval pinned against a pure-Python sequential
reference (Lucene BM25Similarity semantics: k1=1.2, b=0.75,
always-positive Robertson idf ln(1 + (N - df + 0.5)/(df + 0.5)))."""

from __future__ import annotations

import math

from fred_economic_data_pipeline_local_spark.operators.text import bm25_topk


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: [t for t in text.lower().split() if t] for i, text in docs}
    n = len(toks)
    avgdl = sum(len(tk) for tk in toks.values()) / n
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in terms
    }
    scores = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            c = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl)
            )
            s += round(c, 10)
        if s:
            scores[i] = round(s, 6)
    return scores


DOCS = [
    (1, "spark scan merge scan scan"),
    (2, "the quick brown fox"),
    (3, "merge merge merge spark"),
    (4, "scan"),
    (5, "spark spark spark spark spark spark spark spark"),
    (6, "vector stream vector"),
]
TERMS = ["spark", "scan", "vector", "absentterm"]


class TestBm25:
    def test_matches_sequential_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r.id: r.score for r in bm25_topk(df, TERMS, k=10).collect()
        }
        assert got == _py_bm25(DOCS, TERMS)

    def test_topk_truncates_with_id_tiebreak(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        rows = bm25_topk(df, TERMS, k=2).collect()
        ref = sorted(
            _py_bm25(DOCS, TERMS).items(), key=lambda kv: (-kv[1], kv[0])
        )[:2]
        assert [(r.id, r.score) for r in rows] == ref

    def test_doc_without_query_terms_absent(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        ids = {r.id for r in bm25_topk(df, TERMS, k=10).collect()}
        assert 2 not in ids  # no query term -> no score row

    def test_rare_term_outscores_common_at_equal_tf(self, spark):
        # 'vector' appears in 1 doc, 'spark' in 3 -> higher idf for the
        # rarer term at the same tf and dl
        docs = [
            (1, "vector pad pad"),
            (2, "spark pad pad"),
            (3, "spark x y"),
            (4, "spark a b"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.id: r.score
            for r in bm25_topk(df, ["vector", "spark"], k=10).collect()
        }
        assert got[1] > got[2]
