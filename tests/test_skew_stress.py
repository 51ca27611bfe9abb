"""Skew stress: the dedup caps must actually FIRE and bound candidates.

The fixture corpora are too uniform to trigger ``df_cap``/``bucket_cap``
(VERDICT r3/r4), so these tests synthesize the corpus shape the caps
exist for — one boilerplate shingle in 35% of docs, one degenerate LSH
bucket — and assert the candidate-pair counts against the documented
bound: postings/buckets above the cap are dropped, so surviving
candidate pairs are exactly Σ over surviving groups of C(d, 2), which
is <= Σ min(d_i, cap)². The prefix-filtered exact path must return the
full uncapped result on the same skewed corpus — its quadratic
reduction comes from indexing rare shingles, not from approximation.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    minhash_candidates,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    shingle_df,
)

BOILER_DOCS = 70  # 70 of 200 docs (35%) share one boilerplate bigram
PLANTED = 5  # near-dup pairs sharing only rare shingles


def _skewed_docs(spark):
    """200 singleton docs, 70 of which share the bigram 'all rights';
    plus 5 planted identical pairs with unique (df=2) shingles."""
    rows = []
    for i in range(BOILER_DOCS):
        rows.append((i, f"all rights tailA{i} tailB{i}"))
    for i in range(BOILER_DOCS, 200):
        rows.append((i, f"solo{i} words{i} here{i}"))
    for p in range(PLANTED):
        dup = f"pair{p}x pair{p}y pair{p}z"
        rows.append((1000 + 2 * p, dup))
        rows.append((1001 + 2 * p, dup))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _df_histogram(spark):
    """Per-shingle document frequency of the skewed corpus, via the
    operator's own shingling (so the bound is computed on exactly the
    postings the join sees)."""
    sh = shingle_df(_skewed_docs(spark), shingle_k=2)
    return {
        r["s"]: r["d"]
        for r in sh.select("id", F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }


def test_df_cap_bounds_candidates_to_capped_sum(spark):
    docs = _skewed_docs(spark)
    cap = 10
    dfs = _df_histogram(spark)
    assert max(dfs.values()) == BOILER_DOCS  # the skew is real: df=70 shingle
    # every pair sharing >= 1 shingle passes threshold=0.01, so the
    # operator's output IS its candidate-pair set
    uncapped = ngram_jaccard_pairs(
        docs, block_col=None, threshold=0.01, df_cap=None
    ).count()
    capped = ngram_jaccard_pairs(
        docs, block_col=None, threshold=0.01, df_cap=cap
    ).count()
    # exact accounting: boilerplate contributes C(70,2) pairs uncapped,
    # zero capped; the planted pairs share only df=2 shingles and survive
    assert uncapped == comb(BOILER_DOCS, 2) + PLANTED
    assert capped == PLANTED
    # the documented bound: surviving candidates <= Σ min(d_i, cap)^2
    # over surviving (d <= cap) shingles
    bound = sum(min(d, cap) ** 2 for d in dfs.values() if d <= cap)
    assert capped <= bound < uncapped


def test_prefix_path_stays_exact_under_skew(spark):
    docs = _skewed_docs(spark)
    kw = dict(block_col=None, shingle_k=2, threshold=0.01)
    full = {tuple(r) for r in ngram_jaccard_pairs(docs, **kw).collect()}
    pref = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, **kw).collect()}
    # zero false negatives even though 35% of postings are one shingle
    assert pref == full
    assert len(full) == comb(BOILER_DOCS, 2) + PLANTED


def _hot_bucket_docs(spark):
    """60 byte-identical docs (one degenerate LSH bucket per band) plus
    one planted identical pair with different content."""
    hot = "the same boilerplate document repeated verbatim across the corpus"
    rows = [(i, hot) for i in range(60)]
    dup = "a genuinely distinct near duplicate pair of documents here"
    rows += [(100, dup), (101, dup)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_drops_degenerate_lsh_bucket(spark):
    docs = _hot_bucket_docs(spark)
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(docs, bucket_cap=10_000).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(docs, bucket_cap=50).collect()
    }
    # identical docs collide in every band: all C(60,2) pairs uncapped
    assert {(a, b) for (a, b) in uncapped if b < 60} == {
        (a, b) for a in range(60) for b in range(a + 1, 60)
    }
    assert (100, 101) in uncapped
    # capped: the 60-doc bucket (> 50) is dropped entirely; the planted
    # pair's 2-doc buckets survive -> candidates collapse from C(60,2)+1
    # to exactly 1, the Σ C(min(d,cap) not exceeded, 2) accounting
    assert capped == {(100, 101)}


def _boiler_span_docs(spark):
    """40 docs opening with one 10-token boilerplate span then unique
    tails (every pair shares a >= k+w-1 token run => a fingerprint), plus
    3 planted identical pairs made of globally unique tokens."""
    boiler = " ".join(f"b{j}" for j in range(10))
    rows = [(i, f"{boiler} tx{i} ty{i} tz{i}") for i in range(40)]
    for p in range(3):
        dup = " ".join(f"u{p}w{j}" for j in range(8))
        rows += [(500 + 2 * p, dup), (501 + 2 * p, dup)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fp_cap_drops_boilerplate_span_fingerprints(spark):
    from fred_economic_data_pipeline_local_spark.operators.text import (
        span_overlap_pairs,
        winnow_fingerprints,
    )

    docs = _boiler_span_docs(spark)
    cap = 10
    # ground truth from the operator's own fingerprint table, so the
    # accounting covers exactly the postings the join sees (window
    # minima at the boilerplate/tail boundary are doc-dependent)
    posting = {}
    for r in winnow_fingerprints(docs).collect():
        posting.setdefault(r["fp"], set()).add(r["id"])
    dfs = {fp: len(ids) for fp, ids in posting.items()}
    assert max(dfs.values()) == 40  # the skew is real: df=40 fingerprints

    def expected(max_df):
        pairs = {}
        for fp, ids in posting.items():
            if dfs[fp] > max_df:
                continue
            for a in ids:
                for b in ids:
                    if a < b:
                        pairs[(a, b)] = pairs.get((a, b), 0) + 1
        return {(a, b, n) for (a, b), n in pairs.items()}

    proj = ["id_a", "id_b", "n_shared"]
    res_uncapped = span_overlap_pairs(docs, min_shared=1).collect()
    res_capped = span_overlap_pairs(docs, min_shared=1, fp_cap=cap).collect()
    # containment is consistently capped-denominated: in (0, 1] always
    assert all(0.0 < r["containment"] <= 1.0 for r in res_uncapped + res_capped)
    uncapped = {tuple(r[c] for c in proj) for r in res_uncapped}
    capped = {tuple(r[c] for c in proj) for r in res_capped}
    assert uncapped == expected(10**9)
    assert capped == expected(cap)
    # the mega-clique collapses; the planted rare-span pairs survive
    assert {(a, b) for (a, b, _) in uncapped} >= {
        (a, b) for a in range(40) for b in range(a + 1, 40)
    }
    planted = {(500 + 2 * p, 501 + 2 * p) for p in range(3)}
    assert {(a, b) for (a, b, _) in capped if a >= 500} == planted
    # false negatives only: capped pairs are a subset at reduced counts
    assert {(a, b) for (a, b, _) in capped} <= {(a, b) for (a, b, _) in uncapped}


class TestEditDistanceSegCap:
    def _boiler_strings(self, spark):
        """120 equal-length strings sharing an identical first half
        (the boilerplate segment) with distinct second halves, plus 3
        planted typo pairs differing only in their unique tails."""
        rows = []
        for i in range(120):
            rows.append((i, f"BOILERPLATEHEAD-{i:06d}suffix"))
        for p in range(3):
            rows.append((2000 + 2 * p, f"unique{p}headxx-{p:06d}suffix"))
            rows.append((2001 + 2 * p, f"unique{p}headxy-{p:06d}suffix"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_uncapped_is_exact_and_capped_drops_only_boiler_pairs(self, spark):
        from fred_economic_data_pipeline_local_spark.operators.dedup import (
            edit_distance_neardup,
        )

        docs = self._boiler_strings(spark)
        # ground truth: brute force
        a, b = docs.alias("a"), docs.alias("b")
        exact = sorted(
            tuple(r)
            for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.levenshtein("a.text", "b.text").alias("edit_dist"),
            )
            .where(F.col("edit_dist") <= 2)
            .collect()
        )
        got = sorted(
            tuple(r)
            for r in edit_distance_neardup(docs, max_dist=2).collect()
        )
        assert got == exact  # default (no cap) stays exact under skew

        capped = sorted(
            tuple(r)
            for r in edit_distance_neardup(docs, max_dist=2, seg_cap=50).collect()
        )
        # the planted typo pairs match through their UNIQUE segments and
        # must survive the cap; only pairs whose every shared segment is
        # boilerplate may disappear
        planted = {(2000 + 2 * p, 2001 + 2 * p) for p in range(3)}
        got_capped = {(x, y) for x, y, _ in capped}
        assert planted <= got_capped
        assert set(capped) <= set(exact)  # never false positives
