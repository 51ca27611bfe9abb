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
