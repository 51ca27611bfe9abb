"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB corpora):
- exact dedup is a single hash-shuffle on a 128-bit content fingerprint
  (never on the full text — shuffle bytes stay tiny);
- near-dup never compares all pairs: MinHash banding buckets candidates so
  the join is equi-join on (band, bucket-hash), and only bucket-mates get
  verified. Bucket skew (e.g. empty/boilerplate docs) is bounded by a
  per-bucket candidate cap;
- all hashing is xxhash64 (JVM built-in, codegen'd) — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, tokens


# --- exact -------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per distinct (normalized) content.

    Shuffles md5 fingerprints + ids only; the winning rows are recovered by
    a self-semi-join on (fingerprint, id) — at scale this is two cheap
    shuffles on narrow keys rather than one wide shuffle of full documents.
    """
    with_fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        with_fp.join(keep, on=["__fp", id_col], how="left_semi").drop("__fp")
    )


def duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per distinct content: representative id + duplicate count."""
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy(F.col("__fp").alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# --- shingling ---------------------------------------------------------------

def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the text (array<string>).

    Whole thing is JVM-side: split -> transform over a shingle-start index
    sequence -> slice+join. Short docs (< k tokens) yield their full text
    as the single shingle.
    """
    toks = tokens(F.lower(col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
    )
    return F.array_distinct(sh)


# --- MinHash + LSH -----------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature (array<bigint>).

    Hash family h_i(s) = xxhash64(s, i) via seed-prefix concat; min over
    the doc's shingle set per i. One pass, all in codegen.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("#"), s)))
        ),
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    bucket_cap: int = 1000,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing >= 1 MinHash band bucket.

    rows/band = num_hashes/bands tunes the similarity threshold
    (s* ~ (1/bands)^(1/rows)). Plan: narrow signature build -> explode to
    (band, bucket) -> self equi-join per bucket. ``bucket_cap`` guards
    against degenerate buckets (boilerplate): buckets larger than the cap
    are dropped (they would be exact-dup territory anyway).
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(word_shingles(F.col(text_col), shingle_k), num_hashes).alias(
            "sig"
        ),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    w = Window.partitionBy("band", "bucket")
    banded = banded.withColumn("__n", F.count(F.lit(1)).over(w)).where(
        F.col("__n") <= bucket_cap
    ).drop("__n")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_neardup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    **lsh_kwargs,
) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates + exact Jaccard check.

    Only bucket-mates are verified (no cross join). Output:
    (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    pairs = minhash_candidates(df, text_col, id_col, **lsh_kwargs)
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), lsh_kwargs.get("shingle_k", 3)).alias("sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- n-gram Jaccard (exact, blocked) ----------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "source",
    shingle_k: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity over word k-grams for pairs within a block.

    Blocking (default: same ``source``) keeps the pair space tractable;
    with no block column this becomes a full cross-pair comparison and
    should only run on bounded inputs. Returns (id_a, id_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- SimHash -----------------------------------------------------------------

def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash of the token set: per-bit majority vote of token hashes.

    For each bit b: sum over tokens of (+1 if bit set else -1); bit b of
    the output is 1 when the sum is positive. Pure fold over the token
    array — JVM-side, one pass.
    """
    toks = F.array_distinct(tokens(F.lower(col)))
    # bit positions are compile-time constants: python-int shift amounts keep
    # the expressions shallow (shiftright/shiftleft take literal bit counts)
    bit_votes = F.aggregate(
        toks,
        F.array(*[F.lit(0) for _ in range(bits)]),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    powers = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(bits)]
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_neardup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= max_hamming.

    Candidate generation by banding the 64-bit simhash into 64/band_bits
    chunks (pigeonhole: any pair within distance d < #chunks shares an
    exact chunk), then exact popcount verify on bucket-mates.
    """
    chunks = 64 // band_bits
    sh = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh"))
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "sh", "ck.chunk", "ck.key")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs
