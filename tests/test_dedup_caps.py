"""ngram_jaccard_pairs document-frequency cap (VERDICT r1 item 2).

A shingle appearing in d documents contributes d² posting pairs to the
inverted-index self-join, regardless of the size-band predicate — one
boilerplate phrase shared corpus-wide makes the exact path quadratic.
``df_cap`` drops postings whose block-local document frequency exceeds
the cap, bounding the join at Σ_s min(d_s, df_cap)².
"""

from __future__ import annotations

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    ngram_jaccard_pairs,
)


def _docs(spark, n=12):
    """Every doc: unique filler + a corpus-wide boilerplate tail."""
    rows = [
        (
            i,
            " ".join(f"w{i}x{j}" for j in range(10))
            + " all rights reserved worldwide",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_drops_boilerplate_only_pairs(spark):
    docs = _docs(spark)
    # uncapped: every pair shares the boilerplate bigrams and clears a
    # tiny threshold -> all C(12,2)=66 pairs materialize
    uncapped = ngram_jaccard_pairs(
        docs, block_col=None, threshold=0.01, df_cap=None
    )
    assert uncapped.count() == 66
    # capped below the boilerplate df: those postings are dropped before
    # the self-join; no pair shares any surviving shingle -> zero pairs
    capped = ngram_jaccard_pairs(
        docs, block_col=None, threshold=0.01, df_cap=3
    )
    assert capped.count() == 0


def test_df_cap_above_corpus_df_is_exact(spark):
    docs = _docs(spark)
    exact = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, block_col=None, threshold=0.01, df_cap=None
            ).collect(),
        )
    )
    capped = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, block_col=None, threshold=0.01, df_cap=10_000
            ).collect(),
        )
    )
    assert exact == capped and len(exact) == 66


# --- prefix filtering (exact scale path) -------------------------------------

def test_prefix_filter_matches_full_selfjoin_on_fixture(spark):
    from fred_economic_data_pipeline_local_spark.catalog import load_table
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    full = {
        tuple(r)
        for r in ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5).collect()
    }
    pref = {
        tuple(r)
        for r in ngram_jaccard_pairs_prefix(
            docs, shingle_k=2, threshold=0.5
        ).collect()
    }
    assert full == pref and len(full) > 0


def test_prefix_filter_matches_on_boilerplate_heavy_corpus(spark):
    """The corpus shape prefix filtering exists for: a high-df boilerplate
    phrase shared by every doc plus rare per-doc tails. The prefix index
    holds only the rare shingles, yet the result must stay exact."""
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    boiler = "all rights reserved contact us terms of service"
    rows = []
    for i in range(40):
        tail = f"unique{i} token{i} extra{i % 7} words{i % 5}"
        rows.append((i, f"{boiler} {tail}"))
    # a couple of true near-dups sharing tails
    rows.append((100, f"{boiler} unique1 token1 extra1 words1"))
    rows.append((101, f"{boiler} unique2 token2 extra2 words2 different"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(block_col=None, shingle_k=2, threshold=0.5)
    full = {tuple(r) for r in ngram_jaccard_pairs(docs, **kw).collect()}
    pref = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs, **kw).collect()}
    assert full == pref
    assert any(pair[0] == 1 and pair[1] == 100 for pair in full)
