"""incremental_exact_dedup: the O(delta) ingest path must admit exactly
what a full-corpus exact_dedup would have admitted from the batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    duplicate_groups,
    exact_dedup,
    incremental_exact_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_matches_full_corpus_dedup(spark):
    existing = _docs(
        spark,
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha  BETA ")],
    )
    incoming = _docs(
        spark,
        [
            (10, "alpha beta"),      # cross-batch dup (normalizes to doc 0)
            (11, "fresh content"),   # genuinely new
            (12, "fresh content"),   # in-batch dup of 11
            (13, "Gamma   delta"),   # cross-batch dup under normalization
            (14, "also new"),
        ],
    )
    index = duplicate_groups(existing).select("fingerprint", "keep_id")
    kept, delta = incremental_exact_dedup(incoming, index)
    assert {r["doc_id"] for r in kept.collect()} == {11, 14}
    # the index delta carries exactly the admitted fingerprints
    d = {r["keep_id"] for r in delta.collect()}
    assert d == {11, 14}
    # equivalence: full-corpus dedup over existing+incoming admits the
    # same incoming ids (min-id representatives fall in `existing` for
    # every cross-batch dup because existing ids are smaller)
    full = exact_dedup(existing.unionByName(incoming))
    full_incoming = {r["doc_id"] for r in full.collect() if r["doc_id"] >= 10}
    assert full_incoming == {11, 14}


def test_incremental_empty_index_is_plain_dedup(spark):
    incoming = _docs(spark, [(5, "x y"), (6, "x  Y"), (7, "z")])
    empty_index = _docs(spark, []).selectExpr(
        "CAST(NULL AS STRING) AS fingerprint", "doc_id AS keep_id"
    ).where(F.lit(False))
    kept, delta = incremental_exact_dedup(incoming, empty_index)
    assert {r["doc_id"] for r in kept.collect()} == {5, 7}
    assert delta.count() == 2


def test_incremental_minhash_equals_full_minus_old_pairs(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_banded,
        minhash_candidates,
    )

    rows = []
    # three near-dup families straddling the old/new split, plus noise
    for fam in range(3):
        t = f"family {fam} shared body of text tokens one two three four"
        rows += [(fam * 10, t), (fam * 10 + 1, t), (fam * 10 + 100, t)]
    rows += [(500 + i, f"noise{i} unique{i} words{i} here{i} now{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)

    kw = dict(num_hashes=16, bands=4, shingle_k=2, bucket_cap=1000)
    full = {tuple(r) for r in minhash_candidates(docs, **kw).collect()}
    old_only = {tuple(r) for r in minhash_candidates(old, **kw).collect()}
    index = minhash_banded(old, num_hashes=16, bands=4, shingle_k=2)
    pairs, delta = incremental_minhash_candidates(new, index, **kw)
    got = {tuple(r) for r in pairs.collect()}
    assert got == full - old_only
    assert got  # the split really produces cross-batch candidates
    # index delta: one banding row per (new doc, band)
    assert delta.count() == new.count() * 4


def test_incremental_minhash_union_bucket_cap(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_banded,
    )

    # 30 old + 30 new byte-identical docs: every band bucket holds 60
    # members only in the UNION — a per-side count (30) would miss the cap
    hot = "identical boilerplate doc repeated across old and new snapshots"
    old = spark.createDataFrame(
        [(i, hot) for i in range(30)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, hot) for i in range(30)] + [(990, "rare pair a b c"), (991, "rare pair a b c")],
        "doc_id long, text string",
    )
    index = minhash_banded(old, num_hashes=16, bands=4, shingle_k=2)
    pairs, _ = incremental_minhash_candidates(
        new, index, num_hashes=16, bands=4, shingle_k=2, bucket_cap=50
    )
    got = {tuple(r) for r in pairs.collect()}
    # the 60-member union bucket (> 50) is dropped; the rare in-batch
    # pair survives
    assert got == {(990, 991)}


def test_incremental_components_equals_full_recompute(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        incremental_components,
        neardup_components,
    )

    old_pairs = spark.createDataFrame(
        # two old components: {1,2,3} and {10,11}; 20 is a singleton
        [(1, 2), (2, 3), (10, 11)],
        "id_a long, id_b long",
    )
    old_ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20)], "id long"
    )
    comps = neardup_components(old_pairs)
    assignments = (
        old_ids.join(comps, "id", "left")
        .selectExpr("id", "coalesce(component, id) AS component")
    )
    new_pairs = spark.createDataFrame(
        # 100-3 bridges INTO component {1,2,3}; 10-20 merges the old
        # {10,11} component with old singleton 20; 200-201 is brand new
        [(100, 3), (10, 20), (200, 201)],
        "id_a long, id_b long",
    )
    got = {
        (r["id"], r["component"])
        for r in incremental_components(assignments, new_pairs).collect()
    }
    full = neardup_components(
        old_pairs.unionByName(new_pairs)
    )
    scope = {1, 2, 3, 10, 11, 20, 100, 200, 201}
    expect = {
        (r["id"], r["component"]) for r in full.collect() if r["id"] in scope
    }
    assert got == expect
    assert got == {
        (1, 1), (2, 1), (3, 1), (100, 1),
        (10, 10), (11, 10), (20, 10),
        (200, 200), (201, 200),
    }


def test_incremental_components_no_new_pairs_is_identity(spark):
    from fred_economic_data_pipeline_local_spark.operators.dedup import (
        incremental_components,
    )

    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7)], "id long, component long"
    )
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        (r["id"], r["component"])
        for r in incremental_components(assignments, empty).collect()
    }
    assert got == {(1, 1), (2, 1), (7, 7)}
