"""Text-analysis and deduplication queries over ``documents``.

The LLM-training-data operator surface (BASELINE.json north star): exact
dedup, MinHash/SimHash near-dup, n-gram Jaccard, token counting, quality
scoring, language ID, fingerprinting. Hash-family ops (MinHash/SimHash)
have no DuckDB-expressible oracle (xxhash64) -> rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import (
    duplicate_groups,
    exact_dedup,
    minhash_neardup,
    ngram_jaccard_pairs,
    simhash_neardup,
)
from ..operators.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_metrics,
    token_count,
    tokens,
)
from .registry import query

_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "dedup_exact_keep_min",
    oracle=f"""
WITH fp AS (SELECT *, {_FP_SQL} AS f FROM documents)
SELECT doc_id, text, lang, source, n_chars
FROM fp
QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1
""",
    description="exact dedup: min-id representative per normalized content",
)
def dedup_exact_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return exact_dedup(docs)


@query(
    "dedup_groups",
    oracle=f"""
SELECT {_FP_SQL} AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
""",
    description="duplicate-group stats per content fingerprint",
)
def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_groups(load_table(spark, "documents", sf_dir))


@query(
    "text_token_counts",
    oracle=f"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])')) AS INTEGER) AS n_bpe_ish
FROM documents
""",
    description="whitespace + BPE-ish regex token counting",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    )


_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"


@query(
    "text_quality_metrics",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS q_n_chars,
       CAST(len(toks) AS INTEGER) AS q_n_tokens,
       round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS q_mean_token_len,
       round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}]', '', 'g')) AS DOUBLE)
             / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS q_punct_ratio,
       round(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DOUBLE)
             / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS q_stopword_ratio
FROM t
""",
    description="quality gates: length/punctuation/stopword ratios (Gopher/C4 style)",
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return quality_metrics(docs).drop("text")


def _marker_sql(words: list[str]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        f" x -> list_contains({lst}, x))) AS INTEGER)"
    )


@query(
    "text_language_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_actual,
         {_marker_sql(LANG_MARKERS['en'])} AS score_en,
         {_marker_sql(LANG_MARKERS['es'])} AS score_es,
         {_marker_sql(LANG_MARKERS['de'])} AS score_de,
         {_marker_sql(LANG_MARKERS['fr'])} AS score_fr
  FROM documents
)
SELECT doc_id, lang_actual, score_en, score_es, score_de, score_fr,
       CASE WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
            WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
            WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
            WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM scored
""",
    description="marker-word language ID with deterministic argmax",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("lang").alias("lang_actual"), "text"
    )
    return language_id(docs).drop("text")


@query(
    "text_fingerprints",
    oracle=f"""
SELECT doc_id, {_FP_SQL} AS fp, lang, source
FROM documents
""",
    description="content fingerprint (md5 over normalized text)",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", fingerprint(F.col("text")).alias("fp"), "lang", "source"
    )


_SHINGLES_SQL = """
list_distinct(list_transform(
  generate_series(0, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 0)),
  i -> array_to_string(regexp_split_to_array(trim(lower(text)), '\\s+')[i+1:i+2], ' ')
))
"""


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE), 6) AS jaccard
FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
""",
    description="exact 2-gram Jaccard near-dup pairs, blocked by source",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)


@query(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64 family — not DuckDB-expressible; rows-only check
    description="MinHash LSH near-dup: band/bucket candidates + exact Jaccard verify",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return minhash_neardup(docs, threshold=0.5)


@query(
    "dedup_simhash",
    oracle=None,  # xxhash64 family — rows-only check
    description="SimHash near-dup: banded 64-bit signatures + Hamming verify",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # max_hamming=3 with 16-bit bands keeps the pigeonhole guarantee
    # (d < 64/16 chunks) AND bounds the pair output: the synthetic docs
    # share a small vocabulary, so looser thresholds explode quadratically
    return simhash_neardup(docs, max_hamming=3)


@query(
    "dedup_ngram_components",
    oracle=f"""
WITH RECURSIVE sh AS (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id, min(r) AS component FROM reach GROUP BY id
""",
    description="near-dup cluster resolution: connected components over the "
    "2-gram Jaccard pair graph via iterative min-label propagation "
    "(oracle: DuckDB recursive CTE reachability)",
)
def dedup_ngram_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import neardup_components

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)
    return neardup_components(pairs)
