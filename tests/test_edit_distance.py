"""PassJoin edit-distance similarity join: the segment-pigeonhole
blocking must be LOSSLESS — the verified result equals brute-force
levenshtein filtering — including under insertions/deletions (which
shift segment positions, the part the +-d probe window exists for)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fred_economic_data_pipeline_local_spark.operators.dedup import (
    edit_distance_neardup,
)


def _brute(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, v string")
    a, b = df.alias("a"), df.alias("b")
    return sorted(
        tuple(r)
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.v", "b.v").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= d)
        .collect()
    )


def _pass(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, v string")
    return sorted(
        tuple(r)
        for r in edit_distance_neardup(
            df, text_col="v", id_col="id", max_dist=d
        ).collect()
    )


CORPUS = [
    (1, "tokenization"),
    (2, "tokenization"),      # transposition = 2 substitution-ish edits
    (3, "tokeniation"),       # 1 deletion (shifts every later segment)
    (4, "tokenizationx"),     # 1 insertion at the end
    (5, "xxtokenization"),    # 2 insertions at the FRONT (max shift)
    (6, "tokenizer"),         # far (> d)
    (7, "tokenization"),      # exact duplicate of 1
    (8, ""),                  # empty string
    (9, "a"),                 # near-empty
    (10, "ab"),
    (11, "ba"),               # ed 2 from 10 (swap)
    (12, "completely different thing"),
]


def test_equals_brute_force_d2(spark):
    assert _pass(spark, CORPUS, 2) == _brute(spark, CORPUS, 2)


def test_equals_brute_force_d3(spark):
    assert _pass(spark, CORPUS, 3) == _brute(spark, CORPUS, 3)


def test_indel_shift_pairs_found(spark):
    """The deletion/insertion variants MUST appear (they are the cases
    a naive same-position segment join silently drops)."""
    got = {(a, b) for a, b, _ in _pass(spark, CORPUS, 2)}
    assert (1, 3) in got   # deletion
    assert (1, 4) in got   # insertion
    assert (1, 5) in got   # two leading insertions (shift == d)
    assert (1, 7) in got   # exact dup at distance 0
    assert (8, 9) in got   # '' vs 'a'
    assert not any(6 in p for p in got)  # 'tokenizer' is farther than 2


def test_nulls_dropped(spark):
    rows = [(1, "abc"), (2, None), (3, "abd")]
    got = _pass(spark, rows, 1)
    assert got == [(1, 3, 1)]
