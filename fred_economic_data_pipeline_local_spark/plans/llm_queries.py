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
from ..exports import export_sql
from ..operators.dedup import (
    duplicate_groups,
    exact_dedup,
    minhash_neardup,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    simhash_neardup,
)
from ..operators.text import (
    LANG_MARKERS,
    LN2,
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
    # BENCH_r08 delta (1.26x vs r7) A/B'd round 9: isolated min-of-5 at
    # sf0.1 is 0.42s vs BENCH_r06's 0.415s — session context, not a plan
    # change. No action taken.
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


# shared by the postings-join and prefix-filtered (PPJoin) forms: both
# compute the SAME exact result set — one oracle proves both.
# sh AS MATERIALIZED (self-joined twice) and the jaccard computed ONCE
# per pair in a derived CTE instead of re-evaluating the quadratic
# list_intersect/list_concat in both SELECT and WHERE — ~2x the whole
# oracle cost at sf0.1 (the sweep-budget headroom item, VERDICT r12 #5)
_NGRAM_JACCARD_ORACLE = f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
j AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jac
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
)
SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j WHERE jac >= 0.5
"""


@query(
    "dedup_ngram_jaccard",
    oracle=_NGRAM_JACCARD_ORACLE,
    description="exact 2-gram Jaccard near-dup pairs, blocked by source",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)


@query(
    "dedup_ngram_jaccard_prefix",
    oracle=_NGRAM_JACCARD_ORACLE,
    description="exact 2-gram Jaccard pairs via PPJoin prefix filtering: "
    "only each doc's rarest |A| - ceil(t|A|) + 1 shingles are indexed and "
    "self-joined, then candidates verify on the full shingle sets — the "
    "100 TB shape for exact set-similarity joins (same result set as "
    "dedup_ngram_jaccard, proven by the shared oracle)",
)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs_prefix(docs, shingle_k=2, threshold=0.5)


@query(
    "dedup_minhash_lsh",
    # the xxhash64 signature build itself has no SQL mirror, but its
    # OUTPUTS — the shingle sets and the (id, band, bucket) index — are
    # exported, and DuckDB re-derives everything downstream of the hash:
    # bucket_cap, candidate self-join, exact-Jaccard verify, threshold
    oracle=f"""
WITH sh AS (SELECT * FROM {export_sql('dedup_minhash_shingles')}),
bk AS (SELECT * FROM {export_sql('dedup_minhash_banded')}),
hot AS (
  SELECT band, bucket FROM bk GROUP BY band, bucket HAVING count(*) > 1000
),
bkf AS (SELECT bk.* FROM bk ANTI JOIN hot USING (band, bucket)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bkf a JOIN bkf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE),
             6) AS jaccard
FROM cand c JOIN sh x ON x.id = c.id_a JOIN sh y ON y.id = c.id_b
WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE),
            6) >= 0.5
""",
    description="MinHash LSH near-dup: band/bucket candidates + exact "
    "Jaccard verify, hash-checked end to end — the shingle sets and band "
    "index are exported (the persisted-index shape a production ingest "
    "maintains anyway) and DuckDB independently re-runs candidate "
    "generation + verification from them",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.dedup import minhash_banded, shingle_df

    docs = load_table(spark, "documents", sf_dir)
    sh = export_table(shingle_df(docs), "dedup_minhash_shingles")
    banded = export_table(
        minhash_banded(docs, shingles=sh), "dedup_minhash_banded"
    )
    return minhash_neardup(docs, threshold=0.5, shingles=sh, banded=banded)


@query(
    "dedup_edit_distance",
    # deterministic 2/5 corpus cut (doc_id % 5 < 2, the dedup_lsh_recall
    # sample-bounding pattern): the oracle is a BRUTE-FORCE all-pairs
    # levenshtein whose cost floor on the full sf0.1 corpus is ~96 s of
    # pure DP (measured; a lossless q-gram-lemma prefilter was A/B'd at
    # 104 s — DuckDB list ops cost more than they prune) — the cut keeps
    # the blocking-losslessness pin (2.6M verified pairs at sf0.1) at
    # ~16% of the quadratic cost. Spark side carries the same cut.
    oracle="""
WITH base AS (
  SELECT doc_id AS id, substr(text, 1, 40) AS v
  FROM documents WHERE text IS NOT NULL AND doc_id % 5 < 2
),
ed AS (
  SELECT id + 1000000 AS id, substr(v, 1, 38) || 'zq' AS v
  FROM base WHERE id % 7 = 0
),
s AS MATERIALIZED (SELECT * FROM base UNION ALL SELECT * FROM ed),
-- levenshtein computed ONCE per length-band pair (the WHERE+SELECT
-- double evaluation was the whole oracle cost at sf0.1)
d AS (
  SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.v, b.v) AS ed
  FROM s a JOIN s b ON a.id < b.id
  WHERE abs(len(a.v) - len(b.v)) <= 3
)
SELECT id_a, id_b, CAST(ed AS INTEGER) AS edit_dist FROM d WHERE ed <= 3
""",
    description="typo-level near-dup: PassJoin segment-pigeonhole "
    "edit-distance self-join (levenshtein <= 3) over 40-char document "
    "prefixes of the corpus plus a simulated re-crawl (every 7th doc "
    "re-ingested with its prefix tail edited — the OCR-noise/suffix-"
    "edit scenario char-level dedup exists for). Candidates come from "
    "the lossless (length, segment, text) index join, never all pairs; "
    "the oracle IS the all-pairs brute force, so blocking losslessness "
    "is externally hash-checked",
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import edit_distance_neardup

    docs = load_table(spark, "documents", sf_dir)
    base = docs.where(
        F.col("text").isNotNull() & (F.col("doc_id") % 5 < 2)
    ).select(
        F.col("doc_id").alias("id"), F.substring("text", 1, 40).alias("v")
    )
    edited = base.where(F.col("id") % 7 == 0).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.concat(F.substring("v", 1, 38), F.lit("zq")).alias("v"),
    )
    corpus = base.unionByName(edited)
    return edit_distance_neardup(corpus, text_col="v", id_col="id", max_dist=3)


@query(
    "dedup_simhash",
    # the 64-bit signatures are exported; pigeonhole banding at
    # max_hamming=3 < 4 chunks has FULL recall, so the Spark pair set
    # must EQUAL DuckDB's brute-force xor+bit_count over the signatures
    oracle=f"""
WITH sig AS (SELECT * FROM {export_sql('dedup_simhash_sig')})
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
""",
    description="SimHash near-dup: banded 64-bit signatures + Hamming "
    "verify, hash-checked — signatures are exported and DuckDB's "
    "all-pairs popcount ground truth must equal the banded result "
    "exactly (pigeonhole banding has full recall at this distance)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.dedup import simhash_table

    docs = load_table(spark, "documents", sf_dir)
    sig = export_table(simhash_table(docs), "dedup_simhash_sig")
    # max_hamming=3 with 16-bit bands keeps the pigeonhole guarantee
    # (d < 64/16 chunks) AND bounds the pair output: the synthetic docs
    # share a small vocabulary, so looser thresholds explode quadratically
    return simhash_neardup(docs, max_hamming=3, signatures=sig)


@query(
    "dedup_ngram_components",
    # sh/pairs/edges AS MATERIALIZED: DuckDB inlines multiply-referenced
    # CTEs (sh twice via the self-join, pairs twice via edges' branches,
    # edges on every recursive iteration), re-running the quadratic
    # exact-Jaccard join each time — 138 s -> 41 s at sf0.1 measured
    oracle=f"""
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
edges AS MATERIALIZED (
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


_GOPHER_STOP = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
_LTOKS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


@query(
    "text_gopher_flags",
    oracle=f"""
WITH t AS (SELECT doc_id, {_LTOKS_SQL} AS tk, text FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(tk) AS DOUBLE) AS n_tok,
         greatest(CAST(len(tk) AS DOUBLE), 1.0) AS safe_n,
         CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
           / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS mean_len,
         CAST(len(regexp_extract_all(text, '(#|\\.\\.\\.)')) AS DOUBLE) AS n_sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS n_alpha,
         len(list_filter(tk, x -> list_contains({_GOPHER_STOP}, x))) AS stop_hits
  FROM t
)
SELECT doc_id,
       (n_tok >= 20 AND n_tok <= 100000) AS r_word_count,
       (mean_len >= 3.0 AND mean_len <= 10.0) AS r_mean_word_len,
       (n_sym / safe_n) <= 0.1 AS r_symbol_ratio,
       (n_alpha / safe_n) >= 0.8 AS r_alpha_words,
       stop_hits >= 2 AS r_stopwords,
       ((n_tok >= 20 AND n_tok <= 100000)
        AND (mean_len >= 3.0 AND mean_len <= 10.0)
        AND (n_sym / safe_n) <= 0.1
        AND (n_alpha / safe_n) >= 0.8
        AND stop_hits >= 2) AS q_keep
FROM m
""",
    description="Gopher-style quality rule flags: word count, mean word "
    "length, symbol ratio, alphabetic-word ratio, stopword screen — each "
    "rule a boolean column plus the conjunction keep flag",
)
def text_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import gopher_quality_flags

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return gopher_quality_flags(docs).drop("text")


@query(
    "text_unigram_logprob",
    oracle=f"""
WITH ex AS (
  SELECT doc_id AS id, unnest({_LTOKS_SQL}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS n FROM ex GROUP BY tok),
total AS (SELECT sum(n) AS N FROM vocab)
SELECT ex.id, CAST(count(*) AS INTEGER) AS n_tokens,
       round(avg(ln(CAST(vocab.n AS DOUBLE) / total.N)), 6) AS logprob
FROM ex JOIN vocab USING (tok) CROSS JOIN total
GROUP BY ex.id
""",
    description="corpus-unigram mean log-probability per doc (perplexity "
    "proxy): vocab build + token join + per-doc avg — the cheap LM "
    "quality screen",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import unigram_logprob

    docs = load_table(spark, "documents", sf_dir)
    return unigram_logprob(docs)


_CHUNK_W, _CHUNK_S = 32, 24


@query(
    "text_chunk_windows",
    oracle=f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           FROM documents),
ex AS (
  SELECT doc_id, tk,
         unnest(generate_series(1, greatest(len(tk), 1), {_CHUNK_S})) AS start
  FROM t
)
SELECT doc_id AS id,
       CAST((start - 1) / {_CHUNK_S} AS INTEGER) AS chunk_id,
       array_to_string(list_slice(tk, start, start + {_CHUNK_W} - 1), ' ') AS chunk_text,
       CAST(len(list_slice(tk, start, start + {_CHUNK_W} - 1)) AS INTEGER) AS n_chunk_tokens
FROM ex
""",
    description="overlapping token-window chunking (window 32, stride 24): "
    "sequence+posexplode+slice, all codegen, no shuffle",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import chunk_tokens

    docs = load_table(spark, "documents", sf_dir)
    return chunk_tokens(docs, window=_CHUNK_W, stride=_CHUNK_S)


# fastText-style linear quality model over the fixture vocabulary:
# positive weight on function/common words, negative on markup-ish and
# jargon tokens. The values are an editorial constant, not learned —
# the operator under test is the scoring plan, not the model.
QUALITY_WEIGHTS: dict[str, float] = {
    "the": 1.5, "a": 1.0, "and": 1.2, "of": 1.1, "to": 0.9,
    "data": 0.6, "value": 0.5, "query": 0.4, "table": 0.4, "row": 0.3,
    "hash": -0.4, "vector": -0.5, "batch": -0.3, "dup": -1.2, "spark": -0.2,
}


def _weight_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{tok}' THEN {wt!r}" for tok, wt in sorted(QUALITY_WEIGHTS.items())
    )
    return f"CASE x {whens} ELSE 0.0 END"


@query(
    "text_quality_score",
    oracle=f"""
WITH t AS (SELECT doc_id, {_LTOKS_SQL} AS tk FROM documents),
m AS (
  SELECT doc_id AS id,
         CAST(len(tk) AS INTEGER) AS n_tokens,
         CAST(list_sum(list_transform(tk, x -> {_weight_case_sql()})) AS DOUBLE)
           / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS logit
  FROM t
)
SELECT id, n_tokens,
       round(1.0 / (1.0 + exp(-logit)), 6) AS score
FROM m
""",
    description="fastText-style linear quality score: sigmoid of the mean "
    "token weight under a broadcast bag-of-words model (literal map, "
    "codegen aggregate — no explode, no join, no Python)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import score_linear

    docs = load_table(spark, "documents", sf_dir)
    return score_linear(docs, QUALITY_WEIGHTS)


@query(
    "dedup_neardup_resolve",
    # AS MATERIALIZED on the multiply-referenced CTEs: see
    # dedup_ngram_components (DuckDB otherwise re-runs the quadratic
    # Jaccard join per reference / per recursive iteration)
    oracle=f"""
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
       coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
QUALIFY row_number() OVER (PARTITION BY coalesce(c.component, d.doc_id)
                           ORDER BY d.doc_id) = 1
""",
    description="near-dup resolution end to end: verified 2-gram Jaccard "
    "pairs -> connected components -> min-id representative per cluster; "
    "singletons survive via left join + coalesce",
)
def dedup_neardup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_neardups

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)
    return resolve_neardups(docs, pairs)


@query(
    "curation_quality_report",
    oracle=f"""
WITH t AS (SELECT source, {_LTOKS_SQL} AS tk, text FROM documents),
m AS (
  SELECT source,
         CAST(len(tk) AS DOUBLE) AS n_tok,
         greatest(CAST(len(tk) AS DOUBLE), 1.0) AS safe_n,
         CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
           / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS mean_len,
         CAST(len(regexp_extract_all(text, '(#|\\.\\.\\.)')) AS DOUBLE) AS n_sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS n_alpha,
         len(list_filter(tk, x -> list_contains({_GOPHER_STOP}, x))) AS stop_hits
  FROM t
),
f AS (
  SELECT source,
         (n_tok >= 20 AND n_tok <= 100000) AS r_word_count,
         (mean_len >= 3.0 AND mean_len <= 10.0) AS r_mean_word_len,
         (n_sym / safe_n) <= 0.1 AS r_symbol_ratio,
         (n_alpha / safe_n) >= 0.8 AS r_alpha_words,
         stop_hits >= 2 AS r_stopwords
  FROM m
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CASE WHEN r_word_count THEN 1.0 ELSE 0.0 END), 6) AS p_word_count,
       round(avg(CASE WHEN r_mean_word_len THEN 1.0 ELSE 0.0 END), 6) AS p_mean_word_len,
       round(avg(CASE WHEN r_symbol_ratio THEN 1.0 ELSE 0.0 END), 6) AS p_symbol_ratio,
       round(avg(CASE WHEN r_alpha_words THEN 1.0 ELSE 0.0 END), 6) AS p_alpha_words,
       round(avg(CASE WHEN r_stopwords THEN 1.0 ELSE 0.0 END), 6) AS p_stopwords,
       round(avg(CASE WHEN r_word_count AND r_mean_word_len AND r_symbol_ratio
                       AND r_alpha_words AND r_stopwords THEN 1.0 ELSE 0.0 END), 6)
         AS p_keep
FROM f GROUP BY source
""",
    description="curation dashboard: per-source pass rate of each Gopher "
    "rule plus the overall keep rate — the monitoring query a 100 TB "
    "ingest runs per crawl snapshot (per-rule booleans aggregate "
    "map-side; one narrow shuffle on source)",
)
def curation_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import gopher_quality_flags

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    flagged = gopher_quality_flags(docs)
    rules = [
        "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_alpha_words", "r_stopwords",
    ]
    aggs = [
        F.round(F.avg(F.when(F.col(r), 1.0).otherwise(0.0)), 6).alias(
            f"p_{r[2:]}"
        )
        for r in rules
    ]
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *aggs,
        F.round(F.avg(F.when(F.col("q_keep"), 1.0).otherwise(0.0)), 6).alias("p_keep"),
    )


# winnowing CTE (k=3 token grams, window w=4), mirroring
# operators/text.py:winnow_fingerprints — md5-based 60-bit hashes are
# bit-identical across engines, so the min-selection (which depends on
# hash VALUES, not set membership) mirrors exactly
_WINNOW_SQL = r"""
t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
  FROM documents
),
tok AS (
  SELECT doc_id, g.pos AS pos, g.tok AS tok
  FROM t, unnest(list_transform(generate_series(1, len(tk)),
                 i -> {'pos': i, 'tok': tk[i]})) AS u(g)
),
gram AS (
  SELECT doc_id, pos,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
),
h AS (
  SELECT doc_id, pos,
         CAST(CONCAT('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
  FROM gram
),
win AS (
  SELECT doc_id, min(h) OVER fw AS fp, count(*) OVER fw AS n_in_win
  FROM h
  WINDOW fw AS (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
  QUALIFY n_in_win = 4
),
fps AS (SELECT DISTINCT doc_id, fp FROM win)
"""


@query(
    "text_winnow_fingerprints",
    oracle=f"""
WITH {_WINNOW_SQL}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, min(fp) AS min_fp
FROM fps GROUP BY doc_id
""",
    description="MOSS-style winnowing fingerprints (k=3 grams, w=4 "
    "windows, 60-bit md5 rolling hashes): per-doc selected-fingerprint "
    "count + min — the span-level document signature; any shared run of "
    ">= k+w-1 tokens is guaranteed a fingerprint collision",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import winnow_fingerprints

    docs = load_table(spark, "documents", sf_dir)
    fps = winnow_fingerprints(docs)
    return fps.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fp"), F.min("fp").alias("min_fp")
    )


@query(
    "dedup_span_overlap",
    oracle=f"""
WITH {_WINNOW_SQL},
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM fps GROUP BY 1),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.id_a, p.id_b, p.n_shared,
       round(p.n_shared / CAST(least(ca.nfp, cb.nfp) AS DOUBLE), 6)
         AS containment
FROM p JOIN cnt ca ON p.id_a = ca.doc_id JOIN cnt cb ON p.id_b = cb.doc_id
""",
    description="span-level near-dup/containment candidates: doc pairs "
    "sharing >= 3 winnowed fingerprints via a narrow equi-join on the "
    "8-byte fingerprint, scored by containment = n_shared / min(|fp|) — "
    "the asymmetric measure that catches a short doc pasted inside a "
    "long one, which set-Jaccard scores near zero (union dominates)",
)
def dedup_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import span_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    return span_overlap_pairs(docs, min_shared=3)


@query(
    "dedup_span_removal",
    # fully SQL-expressible: the oracle independently re-derives the
    # entire pipeline — n-gram occurrences, the corpus-wide keep-one
    # rule (row_number over (gram) ordered by (doc_id, start)),
    # gaps-and-islands span merge, and the cleaned-token md5 via an
    # indexed list_filter (DuckDB lambda index is 1-based; Spark's is
    # 0-based, hence i - 1). coalesce'd array_to_string: DuckDB returns
    # NULL for an empty list where Spark's concat_ws returns ''.
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
  FROM documents
),
occ AS (
  SELECT doc_id, i.s AS start,
         array_to_string(tk[i.s + 1 : i.s + 8], ' ') AS gram
  FROM t, LATERAL (
    SELECT unnest(range(0, greatest(len(tk) - 7, 0))) AS s
  ) i
),
marked AS (
  SELECT doc_id, start,
         count(*) OVER (PARTITION BY gram) AS cnt,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) AS rn
  FROM occ
),
flagged AS (
  SELECT doc_id, start, start + 8 AS e
  FROM marked WHERE cnt >= 2 AND rn > 1
),
isl AS (
  SELECT doc_id, start, e,
         sum(CASE WHEN start > coalesce(prev_max, -1) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, start, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max
    FROM flagged
  )
),
spans AS (
  SELECT doc_id, island, min(start) AS s0, max(e) AS e0
  FROM isl GROUP BY 1, 2
),
doc_spans AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_spans,
         CAST(sum(e0 - s0) AS INT) AS n_removed,
         flatten(list(range(s0, e0))) AS rm
  FROM spans GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(tk) AS INT) AS n_tok,
       coalesce(d.n_spans, 0) AS n_spans,
       coalesce(d.n_removed, 0) AS n_removed,
       round(CAST(coalesce(d.n_removed, 0) AS DOUBLE)
             / greatest(len(tk), 1), 6) AS removed_frac,
       md5(coalesce(array_to_string(
         list_filter(tk, (x, i) -> NOT list_contains(
           coalesce(d.rm, CAST([] AS BIGINT[])), i - 1)), ' '), ''))
         AS clean_md5
FROM t LEFT JOIN doc_spans d USING (doc_id)
""",
    description="Lee et al. 2022 exact duplicate-substring removal: "
    "every 8-token gram occurring >= 2x corpus-wide is cut everywhere "
    "but its minimum-(doc_id, start) occurrence; overlapping cuts merge "
    "via gaps-and-islands; output is the per-doc cleaned-corpus summary "
    "(span count, removed tokens, removed fraction, md5 of surviving "
    "tokens). One gram-keyed map-combined shuffle + one narrow "
    "(id, start) shuffle — nothing all-pairs, no text in shuffle two",
)
def dedup_span_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dup_span_removal

    docs = load_table(spark, "documents", sf_dir)
    return dup_span_removal(docs, n=8).withColumnRenamed("id", "doc_id")


@query(
    "dedup_incremental_ingest",
    oracle=f"""
WITH fp AS (SELECT *, {_FP_SQL} AS f FROM documents),
idx AS (SELECT DISTINCT f FROM fp WHERE doc_id % 5 <> 0),
inc AS (SELECT * FROM fp WHERE doc_id % 5 = 0)
SELECT doc_id, text, lang, source, n_chars
FROM inc
WHERE f NOT IN (SELECT f FROM idx)
QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1
""",
    description="O(delta) per-snapshot ingest dedup: incoming docs "
    "(every 5th) anti-joined against the existing corpus' fingerprint "
    "index, then exact-deduped within the batch — the incremental path "
    "that avoids re-pairing the full corpus each ingest (index is a "
    "narrow fp table, bucketable so only the delta shuffles)",
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_exact_dedup

    docs = load_table(spark, "documents", sf_dir)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    existing = docs.where(F.col("doc_id") % 5 != 0)
    index = duplicate_groups(existing).select("fingerprint", "keep_id")
    kept, _delta = incremental_exact_dedup(incoming, index)
    return kept


@query(
    "dedup_incremental_minhash",
    # both band indexes (existing corpus + incoming delta) are exported;
    # DuckDB re-derives union-accounted bucket_cap, delta-probe join,
    # and unordered-pair normalization (equivalence to full-corpus
    # candidates minus old-only pairs is separately pinned in
    # tests/test_incremental_dedup.py)
    oracle=f"""
WITH idx AS (SELECT * FROM {export_sql('dedup_incr_minhash_index')}),
nb AS (SELECT * FROM {export_sql('dedup_incr_minhash_delta')}),
un AS (SELECT * FROM idx UNION ALL SELECT * FROM nb),
hot AS (
  SELECT band, bucket FROM un GROUP BY band, bucket HAVING count(*) > 1000
),
probe AS (SELECT nb.* FROM nb ANTI JOIN hot USING (band, bucket)),
build AS (SELECT un.* FROM un ANTI JOIN hot USING (band, bucket))
SELECT DISTINCT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
FROM probe a JOIN build b
  ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
""",
    description="O(delta) near-dup ingest: incoming docs (every 5th) "
    "signed and banded, probed against the existing corpus' persisted "
    "(id, band, bucket) index — signatures computed over the delta "
    "only; bucket_cap accounts on union (old+new) bucket sizes; "
    "hash-checked via both exported band indexes",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.dedup import incremental_minhash_candidates, minhash_banded

    docs = load_table(spark, "documents", sf_dir)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    existing = docs.where(F.col("doc_id") % 5 != 0)
    index = export_table(minhash_banded(existing), "dedup_incr_minhash_index")
    delta = export_table(minhash_banded(incoming), "dedup_incr_minhash_delta")
    pairs, _delta = incremental_minhash_candidates(
        incoming, index, new_banded=delta
    )
    return pairs


@query(
    "dedup_incremental_components",
    # AS MATERIALIZED: pairs is referenced FOUR times here (edges' two
    # branches + scope's two arms) — see dedup_ngram_components
    oracle=f"""
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
scope AS (
  SELECT doc_id AS id FROM documents WHERE doc_id % 5 <> 0
  UNION
  SELECT id_a AS id FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0
  UNION
  SELECT id_b AS id FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0
)
SELECT s.id, coalesce(c.component, s.id) AS component
FROM scope s LEFT JOIN comp c ON s.id = c.id
""",
    description="O(delta) component maintenance: the existing corpus' "
    "(id, component) assignments enter as star edges (one narrow row "
    "per non-singleton doc, diameter 2) and only the delta's pairs are "
    "new graph structure — provably equal to recomputing components "
    "over the full pair graph (the oracle does exactly that recompute)",
)
def dedup_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_components, neardup_components

    docs = load_table(spark, "documents", sf_dir)
    existing = docs.where(F.col("doc_id") % 5 != 0)
    old_pairs = ngram_jaccard_pairs(existing, shingle_k=2, threshold=0.5)
    comps_old = neardup_components(old_pairs)
    assignments = (
        existing.select(F.col("doc_id").alias("id"))
        .join(comps_old, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
    # delta pair generation: in production this is the incremental
    # MinHash path's verified output; here the exact pair join filtered
    # to pairs touching the batch gives identical semantics
    new_pairs = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5).where(
        (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0)
    )
    return incremental_components(assignments, new_pairs)


_TFIDF_K = 5


@query(
    "text_tfidf_top_terms",
    oracle=f"""
WITH ex AS (
  SELECT doc_id AS id, unnest({_LTOKS_SQL}) AS term FROM documents
),
fx AS (SELECT id, term FROM ex WHERE term <> ''),
tf AS (SELECT id, term, count(*) AS tf FROM fx GROUP BY id, term),
dfq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT tf.id, tf.term, tf.tf,
       round(tf.tf * ln(CAST(n_docs AS DOUBLE) / dfc), 6) AS tfidf
FROM tf JOIN dfq USING (term) CROSS JOIN n
QUALIFY row_number() OVER (
  PARTITION BY tf.id
  ORDER BY round(tf.tf * ln(CAST(n_docs AS DOUBLE) / dfc), 6) DESC, term
) <= {_TFIDF_K}
""",
    description="per-doc top-5 keywords by tf-idf: explode -> tf ->"
    " Zipf-bounded df join -> windowed top-k; unsmoothed idf so"
    " corpus-wide boilerplate terms score exactly 0",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tfidf_top_terms

    docs = load_table(spark, "documents", sf_dir)
    return tfidf_top_terms(docs, k=_TFIDF_K)


_NGRAM_TOPK = 20


@query(
    "text_topk_ngrams",
    oracle=f"""
WITH t AS (SELECT {_LTOKS_SQL} AS tk FROM documents),
g AS (
  SELECT unnest(list_transform(
           generate_series(1, len(tk) - 1),
           i -> tk[i] || ' ' || tk[i + 1])) AS ngram
  FROM t WHERE len(tk) >= 2
)
SELECT ngram, count(*) AS freq
FROM g GROUP BY ngram
ORDER BY freq DESC, ngram
LIMIT {_NGRAM_TOPK}
""",
    description="corpus-wide top-20 word bigrams: JVM-side n-gram build,"
    " one map-combined shuffle on the ngram string, TakeOrdered top-k —"
    " the boilerplate-mining / contamination-screen corpus statistic",
)
def text_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import topk_ngrams

    docs = load_table(spark, "documents", sf_dir)
    return topk_ngrams(docs, n=2, k=_NGRAM_TOPK)


@query(
    "text_compression_ratio",
    # zlib itself is a C library call, not SQL (byte-exact equality vs
    # direct python zlib stays pinned in tests/test_text_ops.py), but
    # the deflated SIZES — the only Python-computed values — are
    # exported, and DuckDB independently recomputes the raw byte counts
    # (strlen == utf-8 octet_length) plus the ratio arithmetic and null
    # handling: everything downstream of the codec edge hash-checks
    oracle=f"""
WITH d AS (SELECT id, n_deflate FROM {export_sql('text_deflate_sizes')}),
doc AS (SELECT doc_id AS id, CAST(strlen(text) AS INTEGER) AS n_bytes
        FROM documents)
SELECT doc.id, doc.n_bytes, d.n_deflate,
       CASE WHEN doc.n_bytes > 0
            THEN round(CAST(d.n_deflate AS DOUBLE) / doc.n_bytes, 6)
       END AS ratio
FROM doc LEFT JOIN d USING (id)
""",
    description="zlib-compressibility quality gate (RefinedWeb/FineWeb "
    "family): deflated/raw byte ratio per doc — near 0 flags repetitive "
    "boilerplate, near/above 1 flags high-entropy gibberish; "
    "Arrow-batched mapInPandas at the codec edge, zero shuffles; "
    "hash-checked via the exported deflate sizes (ratio + byte counts "
    "recomputed JVM-side and mirrored by DuckDB)",
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.text import compression_ratio

    docs = load_table(spark, "documents", sf_dir)
    # the codec edge emits only (id, n_deflate); byte counts and the
    # ratio are recomputed JVM-side so the arithmetic is oracle-mirrored
    defl = export_table(
        compression_ratio(docs).select("id", "n_deflate"), "text_deflate_sizes"
    )
    base = docs.select(
        F.col("doc_id").alias("id"), F.octet_length("text").alias("n_bytes")
    )
    return base.join(defl, "id", "left").select(
        "id",
        "n_bytes",
        "n_deflate",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_deflate").cast("double") / F.col("n_bytes"), 6),
        ).alias("ratio"),
    )


_VOCAB_K = 20


@query(
    "text_vocab_coverage",
    oracle=f"""
WITH ex AS (
  SELECT unnest({_LTOKS_SQL}) AS token FROM documents
),
v AS (SELECT token, count(*) AS freq FROM ex WHERE token <> '' GROUP BY token),
t AS (SELECT sum(freq) AS n FROM v),
tk AS (SELECT token, freq FROM v ORDER BY freq DESC, token LIMIT {_VOCAB_K})
SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER) AS rank,
       token, freq,
       round(freq / (SELECT n FROM t), 6) AS share,
       round(sum(freq) OVER (ORDER BY freq DESC, token
                             ROWS UNBOUNDED PRECEDING)
             / (SELECT n FROM t), 6) AS cum_share
FROM tk
""",
    description="Zipf coverage curve: top-20 tokens with per-token and "
    "cumulative corpus share — TakeOrdered cuts to k rows before the "
    "running-sum window, so the full vocabulary is never globally sorted",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import vocab_coverage

    docs = load_table(spark, "documents", sf_dir)
    return vocab_coverage(docs, k=_VOCAB_K)


@query(
    "quality_monitor_windows",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, text,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_minutes(CAST(doc_id AS INTEGER)) AS ts
  FROM documents
),
m AS (
  SELECT doc_id, source, ts, {_LTOKS_SQL} AS tk,
         CAST(len(regexp_extract_all(text, '(#|\\.\\.\\.)')) AS DOUBLE) AS n_sym
  FROM base
),
k AS (
  SELECT source, ts,
         (CAST(len(tk) AS DOUBLE) >= 20 AND CAST(len(tk) AS DOUBLE) <= 100000
          AND CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
              / greatest(CAST(len(tk) AS DOUBLE), 1.0) BETWEEN 3.0 AND 10.0
          AND n_sym / greatest(CAST(len(tk) AS DOUBLE), 1.0) <= 0.1
          AND CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
              / greatest(CAST(len(tk) AS DOUBLE), 1.0) >= 0.8
          AND len(list_filter(tk, x -> list_contains({_GOPHER_STOP}, x))) >= 2
         ) AS keep
  FROM m
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         AS keep_rate
FROM k GROUP BY 1, 2
""",
    description="windowed ingest-quality monitor (batch form of the "
    "watermarked stream in streaming/monitor.py): per-(hour window, "
    "source) Gopher keep rates over synthetic ingest time — the "
    "keep-rate-drop alert a crawler dashboard fires on; stream/batch "
    "equivalence pinned in tests/test_streaming.py",
)
def quality_monitor_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.monitor import ingest_time, quality_monitor

    docs = load_table(spark, "documents", sf_dir)
    return quality_monitor(ingest_time(docs))


@query(
    "text_bpe_merges",
    # The merge-induction loop itself (iterative argmax) is not one
    # ANSI query, so the oracle is FIXTURE-PINNED: the expected merge
    # sequence for each testdata corpus, computed by the independent
    # pure-Python sequential BPE in tests/test_text_ops.py::TestBpe
    # (the classic algorithm, no Spark), embedded as VALUES and
    # selected by the corpus's total-text-length signature — the same
    # precedent as the exported-index oracles (VERDICT r10 item 4).
    # Covers sf0.001 / sf0.01 / sf0.1; an unknown corpus yields zero
    # oracle rows, failing loudly rather than passing vacuously.
    oracle="""
WITH sig AS (SELECT CAST(sum(len(text)) AS BIGINT) AS s
             FROM documents WHERE text IS NOT NULL),
pin(sig_s, rank, lft, rgt, freq) AS (VALUES
  -- sf0.001 (signature 153156)
  (153156, 1, 'e', 'r', 4650), (153156, 2, 'o', 'r', 2880),
  (153156, 3, 'i', 'n', 2858), (153156, 4, 'o', 'w', 2763),
  (153156, 5, 's', 't', 2721), (153156, 6, 'l', 'u', 1928),
  (153156, 7, 'a', 'r', 1873), (153156, 8, 'p', 'ar', 1873),
  -- sf0.01 (signature 149174)
  (149174, 1, 'e', 'r', 4568), (149174, 2, 'i', 'n', 2760),
  (149174, 3, 'o', 'w', 2747), (149174, 4, 'o', 'r', 2696),
  (149174, 5, 's', 't', 2676), (149174, 6, 'm', 'er', 1852),
  (149174, 7, 'a', 't', 1845), (149174, 8, 'l', 'u', 1831),
  -- sf0.1 (signature 1485576)
  (1485576, 1, 'e', 'r', 45089), (1485576, 2, 'i', 'n', 27190),
  (1485576, 3, 'o', 'r', 27095), (1485576, 4, 's', 't', 27060),
  (1485576, 5, 'o', 'w', 27044), (1485576, 6, 't', 'a', 18248),
  (1485576, 7, 'l', 'u', 18239), (1485576, 8, 'm', 'er', 18174))
SELECT CAST(rank AS INTEGER) AS rank, lft AS "left", rgt AS "right",
       CAST(freq AS BIGINT) AS freq
FROM pin JOIN sig ON pin.sig_s = sig.s
""",
    description="BPE tokenizer-vocabulary induction: top-8 merges "
    "learned as iterative Spark jobs over the Zipf-bounded "
    "distinct-word table (corpus scanned once; each round is one "
    "map-combined pair-count shuffle + one regexp merge + checkpoint); "
    "deterministic tie policy (freq desc, pair asc); oracle is the "
    "independent sequential BPE's merge list, fixture-pinned per "
    "corpus signature",
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _train_bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, left string, right string, freq long",
    )


# The learned merge list is a trained model artifact a production
# pipeline fits once and persists; three entries consume it
# (text_bpe_merges, text_bpe_token_counts, text_tokenizer_fertility).
# Same producer/consumer split as the SNM entity index: the induction
# entry ALWAYS retrains (it is the training benchmark), consumers reuse
# the per-process memo keyed by sf_dir and retrain only when the scale
# changes or the producer never ran.
_bpe_memo_sf: str | None = None
_bpe_memo: list[tuple[str, str, int]] | None = None


def _train_bpe_merges(spark: SparkSession, sf_dir: str):
    global _bpe_memo_sf, _bpe_memo
    from ..operators.text import bpe_train

    docs = load_table(spark, "documents", sf_dir)
    merges, _vocab = bpe_train(docs, n_merges=8, min_freq=2)
    _bpe_memo_sf, _bpe_memo = sf_dir, merges
    return merges


def _bpe_merges_cached(spark: SparkSession, sf_dir: str):
    if _bpe_memo_sf == sf_dir and _bpe_memo is not None:
        return _bpe_memo
    return _train_bpe_merges(spark, sf_dir)



@query(
    "text_bigram_logprob",
    oracle=f"""
WITH t AS (SELECT doc_id AS id, {_LTOKS_SQL} AS tk FROM documents),
ex AS (
  SELECT id, CASE WHEN u.i > 1 THEN tk[u.i - 1] END AS prev, tk[u.i] AS cur
  FROM t CROSS JOIN unnest(generate_series(1, len(tk))) AS u(i)
  WHERE len(tk) >= 1
),
uni AS (SELECT cur, count(*) AS cn FROM ex GROUP BY cur),
pv AS (SELECT prev AS pw, count(*) AS pn FROM ex WHERE prev IS NOT NULL GROUP BY prev),
bi AS (SELECT prev AS bp, cur AS bc, count(*) AS bn
       FROM ex WHERE prev IS NOT NULL GROUP BY prev, cur),
tot AS (SELECT sum(cn) AS n FROM uni)
SELECT ex.id, CAST(count(*) AS INTEGER) AS n_tokens,
       round(avg(CASE WHEN ex.prev IS NULL
                      THEN ln(uni.cn / (SELECT n FROM tot))
                      ELSE ln(0.7 * coalesce(bi.bn / pv.pn, 0.0)
                              + 0.30000000000000004 * uni.cn / (SELECT n FROM tot))
                 END), 6) AS logprob
FROM ex
JOIN uni ON ex.cur = uni.cur
LEFT JOIN pv ON ex.prev = pv.pw
LEFT JOIN bi ON ex.prev = bi.bp AND ex.cur = bi.bc
GROUP BY ex.id
""",
    description="interpolated bigram-LM mean log-probability per doc "
    "(lam=0.7): the transition-aware perplexity proxy that separates "
    "word salad from prose sharing the same unigram distribution; "
    "JVM-side pair build (no window), Zipf-bounded count-table joins",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_logprob

    docs = load_table(spark, "documents", sf_dir)
    return bigram_logprob(docs, lam=0.7)


@query(
    "text_bpe_token_counts",
    # The iteratively-LEARNED merge list is deterministic data, so it is
    # exported (rank, l, r) and DuckDB independently re-applies it: a
    # recursive CTE steps through the merges in rank order, and each
    # step replays the greedy left-to-right non-overlapping pair merge
    # as a list_reduce fold over the spaced-symbol form (merging
    # acc-tail+next exactly when they equal the pair — provably
    # equivalent to the Java-regex lookaround replace Spark runs, since
    # a merged symbol can never re-match as the left element within the
    # same pass: left || right == left is impossible). Everything
    # downstream of the induction loop — segmentation, counting, per-doc
    # aggregation — is therefore externally hash-checked; the induction
    # loop itself stays pinned merge-for-merge against the pure-Python
    # sequential BPE in tests/test_text_ops.py::TestBpe.
    oracle=f"""
WITH RECURSIVE
m AS (SELECT rank, l, r FROM {export_sql('text_bpe_merge_table')}),
t AS (SELECT doc_id AS id, {_LTOKS_SQL} AS tk FROM documents),
tok AS (SELECT id, unnest(tk) AS w FROM t),
dw AS (SELECT DISTINCT w FROM tok),
sym0 AS (SELECT w, array_to_string(regexp_extract_all(w, '.'), ' ') AS sym FROM dw),
app AS (
  SELECT w, sym, 0 AS k FROM sym0
  UNION ALL
  SELECT a.w,
         list_reduce(string_split(a.sym, ' '),
           (acc, x) -> CASE
             WHEN x = m.r AND acc = m.l THEN m.l || m.r
             WHEN x = m.r AND ends_with(acc, ' ' || m.l)
               THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
             ELSE acc || ' ' || x END),
         a.k + 1
  FROM app a JOIN m ON m.rank = a.k + 1
),
fin AS (SELECT w, sym FROM app WHERE k = (SELECT count(*) FROM m)),
cnt AS (SELECT w, CAST(len(string_split(sym, ' ')) AS INTEGER) AS nb FROM fin),
agg AS (SELECT tok.id, CAST(sum(cnt.nb) AS INTEGER) AS n_bpe_tokens
        FROM tok JOIN cnt ON tok.w = cnt.w GROUP BY tok.id)
SELECT t.id, CAST(len(t.tk) AS INTEGER) AS n_words, agg.n_bpe_tokens
FROM t JOIN agg ON t.id = agg.id
""",
    description="apply the corpus-learned BPE merges: per-doc whitespace "
    "vs subword token counts — the learned-tokenizer upgrade of "
    "text_token_counts' regex proxy; the merge list is baked into one "
    "chained-regexp projection (no join, no Python); hash-checked via "
    "the exported merge table (DuckDB re-applies the merges with a "
    "recursive CTE + greedy fold and recounts per doc)",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.text import bpe_tokenize

    docs = load_table(spark, "documents", sf_dir)
    merges = _bpe_merges_cached(spark, sf_dir)
    export_table(
        spark.createDataFrame(
            [(i + 1, a, b) for i, (a, b, _) in enumerate(merges)],
            "rank int, l string, r string",
        ),
        "text_bpe_merge_table",
    )
    return bpe_tokenize(docs, merges)


@query(
    "text_langid_confusion",
    oracle=f"""
WITH scored AS (
  SELECT lang AS lang_actual,
         {_marker_sql(LANG_MARKERS['en'])} AS score_en,
         {_marker_sql(LANG_MARKERS['es'])} AS score_es,
         {_marker_sql(LANG_MARKERS['de'])} AS score_de,
         {_marker_sql(LANG_MARKERS['fr'])} AS score_fr
  FROM documents
),
pred AS (
  SELECT lang_actual,
         CASE WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
              WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
              WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
              WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
              ELSE 'fr' END AS lang_pred
  FROM scored
)
SELECT lang_actual, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang_actual, lang_pred
""",
    description="language-ID evaluation: (actual, predicted) confusion "
    "counts for the marker-word classifier against the fixture's lang "
    "labels — the per-snapshot classifier-drift check an ingest "
    "pipeline alerts on; one #langs^2-row aggregate over the scan",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("lang").alias("lang_actual"), "text"
    )
    return (
        language_id(docs)
        .groupBy("lang_actual", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_unigram_drift",
    # fully SQL-expressible; the ln + round(6)-before-ranking float
    # discipline is the one text_bigram_logprob pinned hash-green
    oracle="""
WITH o AS (SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
           FROM documents WHERE doc_id % 7 <> 0),
n AS (SELECT regexp_split_to_array(trim(lower(
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)), '\\s+') AS tk
      FROM documents WHERE doc_id % 5 <> 0),
co AS (SELECT u.tok AS token, count(*) AS cn_old
       FROM o CROSS JOIN unnest(tk) AS u(tok) WHERE u.tok <> ''
       GROUP BY u.tok),
cn AS (SELECT u.tok AS token, count(*) AS cn_new
       FROM n CROSS JOIN unnest(tk) AS u(tok) WHERE u.tok <> ''
       GROUP BY u.tok),
v AS (SELECT coalesce(co.token, cn.token) AS token,
             coalesce(cn_old, 0) AS cn_old,
             coalesce(cn_new, 0) AS cn_new
      FROM co FULL OUTER JOIN cn ON co.token = cn.token),
t AS (SELECT sum(cn_old) AS n_old, sum(cn_new) AS n_new, count(*) AS vv
      FROM v),
s AS (SELECT token,
             round((cn_new + 0.5) / (n_new + 0.5 * vv), 6) AS p_new,
             round((cn_old + 0.5) / (n_old + 0.5 * vv), 6) AS p_old,
             round(((cn_new + 0.5) / (n_new + 0.5 * vv)) *
                   ln(((cn_new + 0.5) / (n_new + 0.5 * vv)) /
                      ((cn_old + 0.5) / (n_old + 0.5 * vv))), 6) AS contribution
      FROM v CROSS JOIN t)
SELECT token, p_new, p_old, contribution FROM s
QUALIFY row_number() OVER (ORDER BY abs(contribution) DESC, token) <= 25
""",
    description="content-level snapshot drift: per-token contributions "
    "to KL(new || old) over add-alpha-smoothed unigram distributions on "
    "the union vocabulary (same synthetic snapshots as "
    "snapshot_diff_counts: every 7th doc absent from old, every 5th "
    "from new, every 3rd re-crawled with ' v2' appended — the injected "
    "token surfaces at the top). Complements profile_drift's "
    "column-shape alerts: composition changes move probability mass "
    "long before row counts move. Two Zipf-bounded count aggregates, "
    "one token equi-join, three broadcast scalars",
)
def text_unigram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import unigram_drift

    docs = load_table(spark, "documents", sf_dir)
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 5 != 0).select(
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text")
    )
    return unigram_drift(old, new, top_n=25)


@query(
    "curation_adaptive_quality_gate",
    # score CTE identical to text_quality_score's oracle; the per-source
    # interpolated quantile is the percentile_order_prices parity
    # pattern (Spark `percentile` == DuckDB quantile_cont); cutoffs and
    # scores are 6-dp rounded before the >= comparison on both engines
    oracle=f"""
WITH t AS (SELECT doc_id, source, {_LTOKS_SQL} AS tk FROM documents),
m AS (
  SELECT doc_id AS id, source,
         CAST(list_sum(list_transform(tk, x -> {_weight_case_sql()})) AS DOUBLE)
           / greatest(CAST(len(tk) AS DOUBLE), 1.0) AS logit
  FROM t
),
s AS (SELECT id, source,
             round(1.0 / (1.0 + exp(-logit)), 6) AS score
      FROM m),
c AS (SELECT source, round(quantile_cont(score, 0.3), 6) AS cutoff
      FROM s GROUP BY source)
SELECT s.id, s.source, s.score, c.cutoff, s.score >= c.cutoff AS keep
FROM s JOIN c USING (source)
""",
    description="per-source adaptive quality gating: each doc is kept "
    "iff its linear-classifier score clears its OWN source's 30th "
    "percentile — drops every source's worst tail without letting one "
    "global threshold gut inherently low-scoring domains (classifier "
    "calibration varies by domain). One per-source percentile "
    "aggregate broadcast back onto the scored scan",
)
def curation_adaptive_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import adaptive_quality_gate
    from ..operators.text import score_linear

    docs = load_table(spark, "documents", sf_dir)
    scored = score_linear(docs, QUALITY_WEIGHTS).join(
        docs.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    return adaptive_quality_gate(
        scored.select("id", "source", "score"), q=0.3
    ).select("id", "source", "score", "cutoff", "keep")


@query(
    "text_cms_heavy_hitters",
    # self-certifying like profile_quantile_sketch: the counter matrix
    # has no SQL mirror worth hashing (xxhash64 row-seeds are Spark's),
    # so the exact-checkable fields hash (token, exact corpus count for
    # the top-20 heavy hitters, the same tokenizer the text family
    # oracles use) and the two CMS guarantees ship as certificates the
    # oracle requires TRUE: est >= exact (deterministic — counters only
    # over-count) and est <= exact + 2N/w (the Markov bound at d=4)
    oracle=f"""
WITH t AS (SELECT {_LTOKS_SQL} AS tk FROM documents),
g AS (SELECT unnest(tk) AS tok FROM t),
c AS (SELECT tok, count(*) AS freq FROM g GROUP BY tok)
SELECT tok, freq, TRUE AS never_underestimates, TRUE AS within_bound
FROM c ORDER BY freq DESC, tok LIMIT 20
""",
    description="mergeable heavy-hitter frequencies (count-min sketch, "
    "Cormode & Muthukrishnan 2005): two snapshots' d x w counter "
    "matrices merge EXACTLY by addition (deterministic xxhash64 rows, "
    "no sampling), frequency queries answer from d*w counters without "
    "re-scanning the corpus; certified per top-20 token against the "
    "exact count — overestimate-only always, within 2N/w here",
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import cms_estimate, cms_merge, cms_sketch
    from ..operators.text import tokens

    w, d = 2048, 4
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    merged = cms_merge(
        cms_sketch(toks.where(F.col("doc_id") % 5 != 0), "tok", w=w, d=d),
        cms_sketch(toks.where(F.col("doc_id") % 5 == 0), "tok", w=w, d=d),
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = exact.orderBy(F.desc("freq"), F.asc("tok")).limit(20)
    n_total = toks.count()
    est = cms_estimate(merged, top.select("tok"), "tok", w=w, d=d)
    return top.join(est, "tok").select(
        "tok",
        "freq",
        (F.col("est") >= F.col("freq")).alias("never_underestimates"),
        (F.col("est") <= F.col("freq") + F.lit(2.0 * n_total / w)).alias(
            "within_bound"
        ),
    )


_BM25_TERMS = ["vector", "stream", "merge", "scan", "spark", "quantile"]
_BM25_K = 10
_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"


@query(
    "text_bm25_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter({_LTOKS_SQL}, t -> t <> '') AS tk
  FROM documents
),
corpus AS (SELECT count(*) AS n_docs, sum(len(tk)) AS sum_dl FROM toks),
ex AS (
  SELECT id, len(tk) AS dl,
         unnest(list_filter(tk, t -> list_contains({_BM25_TERMS_SQL}, t)))
           AS term
  FROM toks
),
tf AS (SELECT id, term, count(*) AS tf, max(dl) AS dl
       FROM ex GROUP BY id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
c AS (
  SELECT tf.id,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (0.25
                  + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))),
               10) AS c
  FROM tf JOIN dfq USING (term) CROSS JOIN corpus
)
SELECT id, round(sum(c), 6) AS score
FROM c GROUP BY id
ORDER BY score DESC, id
LIMIT {_BM25_K}
""",
    description="BM25 top-k retrieval (Lucene BM25Similarity semantics, "
    "k1=1.2 b=0.75, always-positive Robertson idf): the inverted-index "
    "plan shape — the broadcast term filter runs before any shuffle, so "
    "cost tracks the queried terms' posting lists, not the corpus; tf "
    "and the per-doc score sum are map-combined on the same doc key; df "
    "and corpus stats broadcast as |terms|+1 rows; TakeOrdered top-k",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


_RRF_L, _RRF_K0, _RRF_K = 50, 60, 10


@query(
    "hybrid_rrf_retrieval",
    # both legs reuse the proven oracle shapes (text_bm25_topk /
    # similarity_cosine_topk): scores rounded 6dp + id tiebreak make
    # the integer ranks engine-deterministic; the fused score is two
    # exact-input divisions + one addition in fixed leg order; absent
    # legs surface as rank 0 (never NULL) so no pandas NaN typing
    oracle=f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter({_LTOKS_SQL}, t -> t <> '') AS tk
  FROM documents
),
corpus AS (SELECT count(*) AS n_docs, sum(len(tk)) AS sum_dl FROM toks),
ex AS (
  SELECT id, len(tk) AS dl,
         unnest(list_filter(tk, t -> list_contains({_BM25_TERMS_SQL}, t)))
           AS term
  FROM toks
),
tf AS (SELECT id, term, count(*) AS tf, max(dl) AS dl
       FROM ex GROUP BY id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
c AS (
  SELECT tf.id,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (0.25
                  + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))),
               10) AS c
  FROM tf JOIN dfq USING (term) CROSS JOIN corpus
),
lex AS (
  SELECT id, round(sum(c), 6) AS score
  FROM c GROUP BY id ORDER BY score DESC, id LIMIT {_RRF_L}
),
lexr AS (
  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS INTEGER)
           AS rank_1
  FROM lex
),
ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
qv AS (SELECT e FROM ce WHERE vec_id = 0),
sem AS (
  SELECT c.vec_id AS id,
         round(list_dot_product(qv.e, c.e) /
               (sqrt(list_dot_product(qv.e, qv.e)) *
                sqrt(list_dot_product(c.e, c.e))), 6) AS cos_sim
  FROM ce c CROSS JOIN qv WHERE c.vec_id <> 0
  ORDER BY cos_sim DESC, id LIMIT {_RRF_L}
),
semr AS (
  SELECT id, CAST(row_number() OVER (ORDER BY cos_sim DESC, id) AS INTEGER)
           AS rank_2
  FROM sem
),
f AS (
  SELECT coalesce(l.id, s.id) AS id, l.rank_1, s.rank_2
  FROM lexr l FULL OUTER JOIN semr s ON l.id = s.id
)
SELECT id,
       coalesce(rank_1, 0) AS lex_rank,
       coalesce(rank_2, 0) AS sem_rank,
       round(coalesce(1.0 / ({_RRF_K0} + rank_1), 0.0)
             + coalesce(1.0 / ({_RRF_K0} + rank_2), 0.0), 6) AS rrf_score
FROM f
ORDER BY rrf_score DESC, id
LIMIT {_RRF_K}
""",
    description="hybrid retrieval with reciprocal-rank fusion (Cormack "
    "2009, the production fuser for lexical+semantic search): the BM25 "
    "leg ranks by posting-list-pruned inverted-index scores, the "
    "semantic leg by exact cosine against the query vector, both top-L "
    "lists reduced to integer ranks (6-dp score rounding + id "
    "tiebreak), fused as sum 1/(k0+rank) in fixed leg order — "
    "parameter-free, score-scale-free; fusion work is O(L) broadcast "
    "joins, all corpus-scale cost stays inside the legs' own scale "
    "paths (posting lists, IVF cells)",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import rank_of, rrf_fuse
    from ..operators.similarity import brute_force_topk
    from ..operators.text import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = rank_of(
        bm25_topk(docs, _BM25_TERMS, k=_RRF_L), "id", "score", _RRF_L
    )
    qv = emb.where(F.col("vec_id") == 0)
    sem = rank_of(
        brute_force_topk(emb, qv, k=_RRF_L).select(
            F.col("neighbor_id").alias("id"), "cos_sim"
        ),
        "id",
        "cos_sim",
        _RRF_L,
    )
    fused = rrf_fuse([lex, sem], k0=_RRF_K0, k=_RRF_K)
    return fused.select(
        "id",
        F.coalesce("rank_1", F.lit(0)).alias("lex_rank"),
        F.coalesce("rank_2", F.lit(0)).alias("sem_rank"),
        "rrf_score",
    )


@query(
    "curation_perplexity_buckets",
    # per-doc logprob is rounded to 6 dp in BOTH engines before the
    # ntile, and the ordering carries the doc-id tiebreak, so bucket
    # assignment is cross-engine deterministic
    oracle=f"""
WITH ex AS (
  SELECT doc_id AS id, unnest({_LTOKS_SQL}) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS n FROM ex GROUP BY tok),
total AS (SELECT sum(n) AS N FROM vocab),
lp AS (
  SELECT ex.id, round(avg(ln(CAST(vocab.n AS DOUBLE) / total.N)), 6) AS logprob
  FROM ex JOIN vocab USING (tok) CROSS JOIN total
  GROUP BY ex.id
),
b AS (
  SELECT d.lang, lp.logprob,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY lp.logprob DESC, lp.id) AS t
  FROM lp JOIN documents d ON d.doc_id = lp.id
)
SELECT lang,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket,
       count(*) AS n_docs,
       round(avg(logprob), 6) AS avg_logprob,
       min(logprob) AS min_logprob,
       max(logprob) AS max_logprob
FROM b
GROUP BY 1, 2
""",
    description="CCNet-style perplexity bucketing (Wenzek et al. 2020): "
    "per-doc corpus-unigram logprob (the cheap LM screen) ntile'd into "
    "head/middle/tail WITHIN each language — the per-lang split is the "
    "recipe's point (one global cutoff would gut low-resource "
    "languages); the per-lang thirds come from the blocked two-pass "
    "exact_ntile after the two Zipf-bounded logprob shuffles (r14 — "
    "languages are few, so the old built-in per-lang ntile was a "
    "handful of single-task sorts of every document), per-bucket "
    "stats map-combined",
)
def curation_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import exact_ntile
    from ..operators.text import unigram_logprob

    docs = load_table(spark, "documents", sf_dir)
    lp = unigram_logprob(docs)
    j = docs.select(F.col("doc_id").alias("id"), "lang").join(lp, "id")
    t = exact_ntile(
        j,
        3,
        [("logprob", False), ("id", True)],
        carry=["logprob"],
        block=["lang"],
    )
    labels = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    b = t.withColumn(
        "bucket", F.element_at(labels, F.col("__tile").cast("int"))
    )
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logprob"), 6).alias("avg_logprob"),
        F.min("logprob").alias("min_logprob"),
        F.max("logprob").alias("max_logprob"),
    )


@query(
    "ks_test_doc_lengths",
    # the reject comparison mirrors the engine exactly: ROUNDED d_stat
    # vs UNROUNDED critical value (both engines compute crit from the
    # same integer counts, so it is the same IEEE double)
    oracle="""
WITH cnt AS (
  SELECT n_chars,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY n_chars
),
tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM cnt),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fa,
         sum(cb) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fb
  FROM cnt
),
d AS (
  SELECT n_a, n_b,
         round(max(abs(fa / n_a - fb / n_b)), 6) AS d_stat
  FROM ecdf CROSS JOIN tot GROUP BY n_a, n_b
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, d_stat,
       round(1.358 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE)), 6)
         AS d_crit,
       d_stat > 1.358 * sqrt((n_a + n_b) / CAST(n_a * n_b AS DOUBLE))
         AS reject
FROM d
""",
    description="two-sample Kolmogorov-Smirnov test between two "
    "sources' document-length distributions (operators/robust.py): the "
    "corpus collapses to per-(group, value) counts in ONE map-combined "
    "exchange, the ECDF cumulates over the O(|support|) distinct-value "
    "domain (a bounded single-partition window, never the corpus), "
    "alpha=0.05 large-sample rejection threshold — the drift test for "
    "'did this source's length profile change between crawls'",
)
def ks_test_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import ks_two_sample

    docs = load_table(spark, "documents", sf_dir)
    return ks_two_sample(docs, "source", "n_chars", "src0", "src1")


@query(
    "text_entropy_by_source",
    oracle="""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT source, sum(c) AS n_tokens,
         count(*) AS n_distinct,
         sum(c * ln(c)) AS clogc
  FROM cnt GROUP BY source
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(ln(n_tokens) - clogc / n_tokens, 6) AS entropy_nats
FROM agg
""",
    description="Shannon token entropy per source — the vocabulary-"
    "diversity screen (template/boilerplate sources read low-entropy): "
    "H = ln N - (1/N) sum c ln c needs only (source, token) counts, one "
    "map-combined exchange + an O(vocab) re-aggregate; no p_i "
    "materialization, no second corpus scan",
)
def text_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cnt = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.log("c")).alias("__clogc"),
        )
        .select(
            "source",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log("n_tokens") - F.col("__clogc") / F.col("n_tokens"), 6
            ).alias("entropy_nats"),
        )
    )


@query(
    "text_jaccard_source_pairs",
    oracle="""
WITH v AS (
  SELECT DISTINCT source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
sz AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared,
       round(n_shared / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6)
         AS jaccard
FROM inter
JOIN sz sa ON sa.source = src_a
JOIN sz sb ON sb.source = src_b
ORDER BY jaccard DESC, src_a, src_b LIMIT 20
""",
    description="pairwise source-vocabulary Jaccard (corpus-overlap "
    "dashboard: which sources mirror each other): the pair join is "
    "equi-keyed on the TOKEN (work bounded by per-token source lists — "
    "vocabulary postings, never a source cross join); sizes broadcast "
    "back, integer-exact similarity, TakeOrdered top-20",
)
def text_jaccard_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    v = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("source").alias("src_a"), "tok")
    b = v.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("__na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("__nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("__na") + F.col("__nb") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("src_a"), F.asc("src_b"))
        .limit(20)
    )


_MI_TOPK = 20


def _mi_term_sql(n: str, r: str, c: str) -> str:
    """One MI cell term (n/N) * ln(N*n / (r*c)) with the n=0 guard —
    operand order mirrors the Spark expression exactly for IEEE
    identity (double(N)*n first, double(r)*c second)."""
    return (
        f"CASE WHEN {n} > 0 THEN (CAST({n} AS DOUBLE) / n_docs)"
        f" * ln(CAST(n_docs AS DOUBLE) * {n}"
        f" / (CAST({r} AS DOUBLE) * {c})) ELSE 0 END"
    )


@query(
    "text_token_mi_lang",
    oracle=f"""
WITH tl AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
         unnest(list_distinct({_LTOKS_SQL})) AS token
  FROM documents
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_en
  FROM documents
),
per_tok AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df_t,
         CAST(sum(en) AS BIGINT) AS df_en
  FROM tl GROUP BY token
),
cells AS (
  SELECT token, df_t, df_en, n_docs,
         df_en AS n11,
         df_t - df_en AS n10,
         n_en - df_en AS n01,
         n_docs - df_t - n_en + df_en AS n00,
         df_t AS r1, n_docs - df_t AS r0,
         n_en AS c1, n_docs - n_en AS c0
  FROM per_tok CROSS JOIN tot
)
SELECT token, df_t, df_en,
       round({_mi_term_sql('n11', 'r1', 'c1')}
             + {_mi_term_sql('n10', 'r1', 'c0')}
             + {_mi_term_sql('n01', 'r0', 'c1')}
             + {_mi_term_sql('n00', 'r0', 'c0')}, 6) AS mi
FROM cells
ORDER BY mi DESC, token
LIMIT {_MI_TOPK}
""",
    description="top tokens by mutual information between per-doc "
    "token presence and the English label — the feature-relevance "
    "screen behind langid feature selection: one explode of per-doc "
    "DISTINCT tokens to a map-combined (token) aggregate, the 1-row "
    "corpus marginals broadcast back, MI from exact integer cell "
    "counts with the n=0 guard; ordering uses the ROUNDED score so "
    "the top-k cut is engine-deterministic",
)
def text_token_mi_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tl = docs.select(
        (F.col("lang") == "en").cast("long").alias("__en"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col("text"))))
        ).alias("token"),
    )
    per_tok = tl.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_t"), F.sum("__en").alias("df_en")
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((F.col("lang") == "en").cast("long")).alias("__n_en"),
    )
    cells = per_tok.join(F.broadcast(tot)).select(
        "token",
        "df_t",
        "df_en",
        F.col("__n"),
        F.col("df_en").alias("__n11"),
        (F.col("df_t") - F.col("df_en")).alias("__n10"),
        (F.col("__n_en") - F.col("df_en")).alias("__n01"),
        (F.col("__n") - F.col("df_t") - F.col("__n_en") + F.col("df_en"))
        .alias("__n00"),
        F.col("df_t").alias("__r1"),
        (F.col("__n") - F.col("df_t")).alias("__r0"),
        F.col("__n_en").alias("__c1"),
        (F.col("__n") - F.col("__n_en")).alias("__c0"),
    )

    def term(n: str, r: str, c: str):
        nn, rr, cc = F.col(n), F.col(r), F.col(c)
        return F.when(
            nn > 0,
            (nn.cast("double") / F.col("__n"))
            * F.log(
                F.col("__n").cast("double")
                * nn
                / (rr.cast("double") * cc)
            ),
        ).otherwise(F.lit(0.0))

    mi = F.round(
        term("__n11", "__r1", "__c1")
        + term("__n10", "__r1", "__c0")
        + term("__n01", "__r0", "__c1")
        + term("__n00", "__r0", "__c0"),
        6,
    )
    return (
        cells.select("token", "df_t", "df_en", mi.alias("mi"))
        .orderBy(F.desc("mi"), F.asc("token"))
        .limit(_MI_TOPK)
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
WITH sh AS (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6)
         AS cont_a_in_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s), 6)
         AS cont_b_in_a
FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
WHERE greatest(
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s),
        CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s)) >= 0.6
""",
    description="asymmetric 2-gram set containment pairs (either "
    "direction >= 0.6), blocked by source — the near-SUBSET detector "
    "resemblance misses: a short doc pasted into a long one has tiny "
    "Jaccard but containment ~1; same postings self-join as "
    "dedup_ngram_jaccard but with NO size band (containment admits "
    "mismatched sizes by design) "
    "(operators/dedup.py:ngram_containment_pairs)",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_containment_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_containment_pairs(docs, shingle_k=2, threshold=0.6)


_ZIPF_TOP_RANKS = 50


@query(
    "text_zipf_slope",
    oracle=f"""
WITH tf AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT source, unnest({_LTOKS_SQL}) AS token FROM documents)
  GROUP BY 1, 2
),
rk AS (
  SELECT source, token, freq,
         row_number() OVER (PARTITION BY source
                            ORDER BY freq DESC, token) AS r
  FROM tf
),
xy AS (
  SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
  FROM rk WHERE r <= {_ZIPF_TOP_RANKS}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_terms,
       round((count(*) * sum(x * y) - sum(x) * sum(y))
             / (count(*) * sum(x * x) - sum(x) * sum(x)), 6) AS zipf_slope
FROM xy GROUP BY source
""",
    description="Zipf conformance per source: OLS slope of ln(freq) on "
    "ln(rank) over the top-50 token ranks (healthy natural-language "
    "sources sit near -1; generated/templated text flattens) — one "
    "map-combined term-frequency exchange, a per-source rank window on "
    "the O(vocab) frame, closed-form OLS on 50 points",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            "source",
            F.explode(tokens(F.lower(F.col("text")))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), F.asc("token"))
    xy = (
        tf.select("source", "freq", F.row_number().over(w).alias("r"))
        .where(F.col("r") <= _ZIPF_TOP_RANKS)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    n = F.count(F.lit(1))
    return xy.groupBy("source").agg(
        n.alias("n_terms"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("zipf_slope"),
    )


@query(
    "stream_cms_ingest",
    # contract (the text_cms_heavy_hitters certificate shape plus the
    # streaming guarantee): the hash-checkable fields are the exact
    # top-20 token counts from the raw fixture; the CMS guarantees
    # (overestimate-only, Markov bound) AND the streaming guarantee
    # (streamed counter state == ONE batch sketch of the whole corpus,
    # exact cell-level equality — counters are additive over the
    # batch partition) ship as certificates the oracle requires TRUE.
    # Unlike stream_hll_ingest, exactly-once here is NOT free: CMS
    # counts add, so a replayed batch double-counts — the
    # txnAppId/txnVersion watermark inside the overwrite commit is
    # what makes the replay a no-op (tests/test_stream_cms.py replays
    # the whole stream on a fresh checkpoint and asserts the state is
    # byte-identical).
    oracle=f"""
WITH t AS (SELECT {_LTOKS_SQL} AS tk FROM documents),
g AS (SELECT unnest(tk) AS tok FROM t),
c AS (SELECT tok, count(*) AS freq FROM g GROUP BY tok)
SELECT tok, freq,
       TRUE AS never_underestimates,
       TRUE AS within_bound,
       TRUE AS state_equals_batch
FROM c ORDER BY freq DESC, tok LIMIT 20
""",
    description="streaming count-min maintenance (foreachBatch counter "
    "ADD through a WATERMARKED overwrite commit): per micro-batch the "
    "work is the batch's own d x w counter aggregate plus an O(d*w) "
    "read-add-overwrite — state never grows with the corpus; CMS "
    "counters are additive (NOT idempotent — a replayed batch would "
    "double-count, unlike HLL register max), so exactly-once rides the "
    "txnAppId/txnVersion watermark committed atomically with the "
    "counters; final streamed state must equal one batch sketch of the "
    "whole corpus cell-for-cell, certified alongside the "
    "overestimate-only and Markov-bound guarantees against exact "
    "top-20 counts",
)
def stream_cms_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.profile import cms_estimate, cms_sketch
    from ..sources.lakehouse import ManifestLakeTable
    from ..streaming.lake_ingest import stream_cms_merge

    w, d = 2048, 4
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    scratch = tempfile.mkdtemp(prefix="stream_cms_")
    inbox = os.path.join(scratch, "inbox")
    root = os.path.join(scratch, "sketch")
    bootstrap = toks.where(F.col("doc_id") % 7 == 0)
    arriving = toks.where(F.col("doc_id") % 7 != 0)
    arriving.repartition(4).write.parquet(inbox)
    t = ManifestLakeTable(root, keys=["row", "pos"], n_buckets=4)
    t.overwrite(cms_sketch(bootstrap, "tok", w=w, d=d))
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    stream_cms_merge(stream, t, "tok", app_id="cms_ingest", w=w, d=d)
    streamed = t.read(spark)
    one_batch = cms_sketch(toks, "tok", w=w, d=d)
    mismatch = (
        streamed.join(
            one_batch.withColumnRenamed("n", "__n2"),
            ["row", "pos"],
            "full_outer",
        )
        .where(
            F.coalesce(F.col("n"), F.lit(-1))
            != F.coalesce(F.col("__n2"), F.lit(-1))
        )
        .agg(F.count(F.lit(1)).alias("__bad"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = exact.orderBy(F.desc("freq"), F.asc("tok")).limit(20)
    n_total = toks.count()
    est = cms_estimate(streamed, top.select("tok"), "tok", w=w, d=d)
    return (
        top.join(est, "tok")
        .join(F.broadcast(mismatch))
        .select(
            "tok",
            "freq",
            (F.col("est") >= F.col("freq")).alias("never_underestimates"),
            (
                F.col("est")
                <= F.col("freq") + F.lit(2.0 * n_total / w)
            ).alias("within_bound"),
            (F.col("__bad") == 0).alias("state_equals_batch"),
        )
        .orderBy(F.desc("freq"), F.asc("tok"))
        .localCheckpoint(eager=True)
    )


@query(
    "text_novelty_rate",
    oracle=f"""
WITH oldsh AS (
  SELECT DISTINCT unnest({_SHINGLES_SQL}) AS s
  FROM documents WHERE doc_id % 5 <> 0
),
newsh AS (
  SELECT DISTINCT source, unnest({_SHINGLES_SQL}) AS s
  FROM documents WHERE doc_id % 5 = 0
)
SELECT n.source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN o.s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN o.s IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
FROM newsh n LEFT JOIN oldsh o ON n.s = o.s
GROUP BY n.source
""",
    description="per-source 2-gram novelty of an arriving snapshot vs "
    "the existing corpus: the share of the new docs' distinct shingles "
    "never seen before — high novelty = fresh signal worth ingesting, "
    "near-zero = re-crawl/duplication (the ingest-value screen next to "
    "dedup); hashed-shingle postings left-anti the old corpus set, one "
    "equi-join on the 8-byte shingle hash, counts match the string-"
    "shingle oracle by the same injectivity-in-practice argument as "
    "the Jaccard family",
)
def text_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_df

    docs = load_table(spark, "documents", sf_dir)
    old_sh = (
        shingle_df(docs.where(F.col("doc_id") % 5 != 0), shingle_k=2)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    new_sh = (
        shingle_df(
            docs.where(F.col("doc_id") % 5 == 0),
            shingle_k=2,
            extra_cols=("source",),
        )
        .select("source", F.explode("sh").alias("s"))
        .distinct()
    )
    joined = new_sh.join(
        old_sh.withColumn("__seen", F.lit(1)), "s", "left"
    )
    novel = F.sum((F.col("__seen").isNull()).cast("long"))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        novel.alias("n_novel"),
        F.round(
            novel / F.count(F.lit(1)).cast("double"), 6
        ).alias("novelty_rate"),
    )


@query(
    "text_hapax_ratio",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_LTOKS_SQL}) AS token FROM documents
),
tf AS (SELECT source, token, CAST(count(*) AS BIGINT) AS freq
       FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(sum(freq) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       round(CAST(count(*) AS DOUBLE) / sum(freq), 6) AS type_token_ratio,
       round(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
FROM tf GROUP BY source
""",
    description="vocabulary-richness screen per source: type-token "
    "ratio and hapax-legomena share (tokens seen exactly once) — "
    "template/boilerplate text collapses both, organic text keeps "
    "hapax near half the vocabulary (Zipf); one term-frequency "
    "exchange, then an O(vocab) rollup — the corpus-health companion "
    "to text_zipf_slope",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            "source",
            F.explode(tokens(F.lower(F.col("text")))).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    hapax = F.sum((F.col("freq") == 1).cast("long"))
    types = F.count(F.lit(1))
    return tf.groupBy("source").agg(
        F.sum("freq").alias("n_tokens"),
        types.alias("n_types"),
        hapax.alias("n_hapax"),
        F.round(types / F.sum("freq").cast("double"), 6).alias(
            "type_token_ratio"
        ),
        F.round(hapax / types.cast("double"), 6).alias("hapax_ratio"),
    )


@query(
    "text_js_divergence_sources",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
ng AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY 1),
corp AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM cnt GROUP BY 1),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_all FROM corp),
j AS (
  SELECT cnt.source, c,
         CAST(c AS DOUBLE) / n_g AS p,
         CAST(ct AS DOUBLE) / n_all AS q
  FROM cnt JOIN corp USING (tok) JOIN ng USING (source) CROSS JOIN tot
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       round(sum(q), 6) AS coverage,
       round(sum(0.5 * p * ln(2 * p / (p + q))
                 + 0.5 * q * ln(2 * q / (p + q)))
             + 0.5 * {LN2!r} * (1 - sum(q)), 6) AS jsd_nats
FROM j GROUP BY source
""",
    description="Jensen-Shannon divergence (nats) between each "
    "source's unigram distribution and the corpus distribution — the "
    "symmetric, ln2-bounded drift/outlier screen for source mixing "
    "(KL is unbounded and asymmetric, so sources aren't comparable); "
    "the missing-token mass is closed-form 0.5·ln2·(1 - coverage), so "
    "there is NO outer join against the corpus vocabulary; one "
    "(source, token) exchange, corpus totals re-aggregated from it and "
    "joined back keyed by token, ln2 a shared Python literal "
    "(operators/text.py:js_divergence_by_group)",
)
def text_js_divergence_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.text import js_divergence_by_group

    docs = load_table(spark, "documents", sf_dir)
    return js_divergence_by_group(docs, "source")


@query(
    "text_readability_scores",
    oracle="""
WITH per_doc AS (
  SELECT source,
         greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> length(x) >= 7)) AS l
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(w AS DOUBLE) / s), 6) AS avg_words_per_sentence,
       round(CAST(sum(l) AS DOUBLE) / sum(w), 6) AS long_word_share,
       round(avg(CAST(w AS DOUBLE) / s + 100 * CAST(l AS DOUBLE) / w), 6)
         AS avg_lix
FROM per_doc GROUP BY source
""",
    description="LIX readability profile per source (Björnsson 1968: "
    "words/sentence + 100·longwords/words — language-agnostic and "
    "syllable-free, so exactly computable): the complexity/boilerplate "
    "screen next to the Gopher flags — very low = fragmentary list "
    "text, very high = run-on machine text; sentences = [.!?]+ runs "
    "(min 1), long = 7+ chars, all counts exact integers from one "
    "narrow JVM-side projection, per-source averages of exact ratios "
    "(operators/text.py:readability_scores)",
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import readability_scores

    docs = load_table(spark, "documents", sf_dir)
    return readability_scores(docs, "source")


@query(
    "dedup_lsh_recall",
    # the eval is definitionally exact-vs-approx on a deterministic
    # sample — an id-RANGE prefix (doc_id <= max*2 div 5, exact integer
    # arithmetic in both engines), because a modulus sample keeps a
    # near-dup pair only when BOTH endpoints land in it (~1/25 of
    # pairs; measured vacuous at sf0.01, 0 of the 25 planted pairs):
    # exact Jaccard pairs from the exported shingle sets, LSH
    # candidates from the exported band index (prod's hot-bucket cap
    # included), recall/precision from exact integer counts
    oracle=f"""
WITH sh AS (SELECT * FROM {export_sql('lsh_recall_shingles')}),
bk AS (SELECT * FROM {export_sql('lsh_recall_banded')}),
ex AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(a.sh, b.sh)))
                     AS DOUBLE), 6) >= 0.5
),
hot AS (
  SELECT band, bucket FROM bk GROUP BY band, bucket HAVING count(*) > 1000
),
bkf AS (SELECT bk.* FROM bk ANTI JOIN hot USING (band, bucket)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bkf a JOIN bkf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
hit AS (SELECT * FROM cand SEMI JOIN ex USING (id_a, id_b)),
n AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
         (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
         (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hits
)
SELECT n_exact, n_candidates, n_hits,
       CASE WHEN n_exact > 0
            THEN round(CAST(n_hits AS DOUBLE) / n_exact, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS recall,
       CASE WHEN n_candidates > 0
            THEN round(CAST(n_hits AS DOUBLE) / n_candidates, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS candidate_precision
FROM n
""",
    description="measured recall of the MinHash LSH index against "
    "ground truth: on the deterministic id-range eval sample, exact "
    "Jaccard >= 0.5 pairs (brute self-join over the sample's shingle "
    "sets — eval-on-sample is the methodology, never the corpus) vs "
    "the banded candidates with prod's hot-bucket cap; recall and "
    "pre-verify candidate precision from exact integer counts — the "
    "'measure, don't guess' number that justifies the (bands, rows) "
    "configuration at scale; both index tables exported, DuckDB "
    "re-derives both sides (operators/dedup.py:minhash_banded)",
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.dedup import minhash_banded, shingle_df

    docs_all = load_table(spark, "documents", sf_dir)
    cut = docs_all.agg(
        F.expr("max(doc_id) * 2 div 5").alias("__cut")
    )
    docs = docs_all.join(F.broadcast(cut)).where(
        F.col("doc_id") <= F.col("__cut")
    )
    sh = export_table(shingle_df(docs), "lsh_recall_shingles")
    banded = export_table(
        minhash_banded(docs, shingles=sh), "lsh_recall_banded"
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        6,
    )
    ex = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(jac >= 0.5)
        .select("id_a", "id_b")
    )
    hot = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1000)
        .select("band", "bucket")
    )
    bkf = banded.join(hot, ["band", "bucket"], "left_anti")
    ba = bkf.select("band", "bucket", F.col("id").alias("id_a"))
    bb = bkf.select("band", "bucket", F.col("id").alias("id_b"))
    cand = (
        ba.join(bb, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    hit = cand.join(ex, ["id_a", "id_b"], "left_semi")
    n_e = ex.agg(F.count(F.lit(1)).alias("n_exact"))
    n_c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_h = hit.agg(F.count(F.lit(1)).alias("n_hits"))
    joined = F.broadcast(n_e).join(F.broadcast(n_c)).join(F.broadcast(n_h))
    return joined.select(
        "n_exact",
        "n_candidates",
        "n_hits",
        F.when(
            F.col("n_exact") > 0,
            F.round(
                F.col("n_hits").cast("double") / F.col("n_exact"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
        F.when(
            F.col("n_candidates") > 0,
            F.round(
                F.col("n_hits").cast("double") / F.col("n_candidates"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("candidate_precision"),
    )


_DELTA_WORDS = sorted(set(STOPWORDS_EN))
_DELTA_WORDS_SQL = ", ".join(f"'{w}'" for w in _DELTA_WORDS)


@query(
    "text_burrows_delta",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
nt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
fw AS (SELECT source, tok, count(*) AS c FROM toks
       WHERE tok IN ({_DELTA_WORDS_SQL}) GROUP BY 1, 2),
grid AS (
  SELECT nt.source, w.tok, COALESCE(fw.c, 0) AS c, nt.n
  FROM nt CROSS JOIN (SELECT unnest([{_DELTA_WORDS_SQL}]) AS tok) w
  LEFT JOIN fw ON fw.source = nt.source AND fw.tok = w.tok
),
sh AS (SELECT source, tok, CAST(c AS DOUBLE) / n AS share FROM grid),
st AS (SELECT tok, avg(share) AS mu, stddev_samp(share) AS sd
       FROM sh GROUP BY 1),
z AS (SELECT source, sh.tok, (share - mu) / sd AS z
      FROM sh JOIN st USING (tok) WHERE sd > 0),
d AS (
  SELECT a.source AS source_a, b.source AS source_b,
         round(avg(abs(a.z - b.z)), 6) AS delta,
         CAST(count(*) AS BIGINT) AS n_words
  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_words, delta
FROM d ORDER BY delta, source_a, source_b LIMIT 10
""",
    description="Burrows' Delta stylometry between sources: per-source "
    "function-word frequency shares z-normalized across the source "
    "population, delta = mean |z_a - z_b| per pair, ten most "
    "similar-styled pairs — the authorship/template-provenance screen "
    "('are these two feeds the same generator?') that unigram overlap "
    "misses; the corpus reduces to a |sources| x |function words| grid "
    "in one exchange, pair work is O(sources^2 x words) over that tiny "
    "grid, TakeOrdered top-10; zero-variance words are dropped in both "
    "engines (exact-zero is engine-stable on identical shares)",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: F401  (parity with others)

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    nt = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    fw = (
        toks.where(F.col("tok").isin(_DELTA_WORDS))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    words = spark.createDataFrame(
        [(w,) for w in _DELTA_WORDS], "tok string"
    )
    grid = (
        nt.crossJoin(F.broadcast(words))
        .join(fw, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (
                F.coalesce("c", F.lit(0)).cast("double") / F.col("n")
            ).alias("share"),
        )
    )
    st = grid.groupBy("tok").agg(
        F.avg("share").alias("mu"),
        F.stddev_samp("share").alias("sd"),
    )
    z = (
        grid.join(F.broadcast(st), "tok")
        .where(F.col("sd") > 0)
        .select(
            "source",
            "tok",
            ((F.col("share") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )
    a = z.select(
        F.col("source").alias("source_a"),
        "tok",
        F.col("z").alias("__za"),
    )
    b = z.select(
        F.col("source").alias("source_b"),
        "tok",
        F.col("z").alias("__zb"),
    )
    return (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.avg(F.abs(F.col("__za") - F.col("__zb"))), 6
            ).alias("delta"),
        )
        .select("source_a", "source_b", "n_words", "delta")
        .orderBy("delta", "source_a", "source_b")
        .limit(10)
    )


@query(
    "dedup_bias_report",
    # the report D is descriptive (kept ⊂ all, so the two samples are
    # not independent and no alpha threshold applies) — exactly the
    # right number for "did dedup skew the length distribution"
    oracle=f"""
WITH fp AS (SELECT *, {_FP_SQL} AS f FROM documents),
kept AS (
  SELECT doc_id, source, n_chars FROM fp
  QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1
),
per AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(k.doc_id) AS BIGINT) AS n_kept,
         round(CAST(count(k.doc_id) AS DOUBLE) / count(*), 6)
           AS retention
  FROM documents d LEFT JOIN kept k USING (doc_id) GROUP BY 1
),
cnt AS (
  SELECT n_chars,
         sum(CASE WHEN grp = 'all' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN grp = 'kept' THEN 1 ELSE 0 END) AS cb
  FROM (SELECT 'all' AS grp, n_chars FROM documents
        UNION ALL SELECT 'kept', n_chars FROM kept)
  WHERE n_chars IS NOT NULL GROUP BY n_chars
),
tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM cnt),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fa,
         sum(cb) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS fb
  FROM cnt
),
ks AS (
  SELECT round(max(abs(fa / n_a - fb / n_b)), 6) AS length_ks_d
  FROM ecdf CROSS JOIN tot
)
SELECT per.source, per.n_docs, per.n_kept, per.retention, ks.length_ks_d
FROM per CROSS JOIN ks
""",
    description="dedup bias audit — the check the dedup literature says "
    "to run and pipelines skip: per-source retention under exact dedup "
    "(does dedup silently defund one source?) plus the KS distance "
    "between the corpus and survivor length distributions (does it skew "
    "short/long?); descriptive D — kept is a subset of all, so no alpha "
    "threshold applies; reuses the min-id dedup rule, the per-source "
    "rollup, and the bounded-domain ECDF engine "
    "(operators/robust.py:ks_two_sample)",
)
def dedup_bias_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import ks_two_sample

    docs = load_table(spark, "documents", sf_dir)
    kept = exact_dedup(docs)
    per = (
        docs.join(
            kept.select("doc_id", F.lit(1).alias("__k")), "doc_id", "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__k", F.lit(0))).alias("n_kept"),
            F.round(
                F.sum(F.coalesce("__k", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("retention"),
        )
    )
    tagged = docs.select(
        F.lit("all").alias("grp"), "n_chars"
    ).unionByName(kept.select(F.lit("kept").alias("grp"), "n_chars"))
    ks = ks_two_sample(tagged, "grp", "n_chars", "all", "kept").select(
        F.col("d_stat").alias("length_ks_d")
    )
    return per.join(F.broadcast(ks)).select(
        "source", "n_docs", "n_kept", "retention", "length_ks_d"
    )


@query(
    "dedup_quality_resolve",
    # survivorship for documents: same cluster derivation as
    # dedup_ngram_components (recursive-CTE closure in the oracle,
    # min-label propagation in the engine), but the kept doc is the
    # HIGHEST-QUALITY member (score_linear, id tiebreak) — the
    # production keep-rule; score parity is already proven by
    # text_quality_score, ranking reuses the same expressions
    oracle=f"""
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_SHINGLES_SQL} AS s
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b
  FROM sh a JOIN sh b ON a.block = b.block AND a.id < b.id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE)
        >= 0.5
),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a AS id, a AS r FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
comp AS MATERIALIZED (SELECT id, min(r) AS component FROM reach GROUP BY id),
sc AS (
  SELECT doc_id AS id,
         1.0 / (1.0 + exp(-(
           CAST(list_sum(list_transform({_LTOKS_SQL},
                x -> {_weight_case_sql()})) AS DOUBLE)
           / greatest(CAST(len({_LTOKS_SQL}) AS DOUBLE), 1.0)))) AS score
  FROM documents
),
ranked AS (
  SELECT comp.component, comp.id, sc.score,
         row_number() OVER (PARTITION BY comp.component
                            ORDER BY sc.score DESC, comp.id) AS rk,
         count(*) OVER (PARTITION BY comp.component) AS n_members
  FROM comp JOIN sc USING (id)
)
SELECT component, id AS keep_id,
       CAST(n_members AS BIGINT) AS n_members,
       round(score, 6) AS keep_score
FROM ranked WHERE rk = 1
""",
    description="quality-based survivorship over near-dup clusters: "
    "the kept representative is the HIGHEST-scoring member under the "
    "linear quality model (id tiebreak), not the arbitrary min-id — "
    "the keep-rule an LLM-data pipeline actually ships (dedup should "
    "delete the WORST copy); clusters from the 2-gram Jaccard pair "
    "graph via min-label components, one score projection, one "
    "per-cluster window over the O(cluster-members) frame "
    "(operators/dedup.py:neardup_components, "
    "operators/text.py:score_linear)",
)
def dedup_quality_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import neardup_components
    from ..operators.text import score_linear

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, shingle_k=2, threshold=0.5)
    comp = neardup_components(pairs)
    sc = score_linear(docs, QUALITY_WEIGHTS).select(
        F.col("id"), F.col("score").alias("__score")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("__score"), F.asc("id")
    )
    ws = Window.partitionBy("component")
    ranked = (
        comp.join(sc, "id")
        .withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(ws))
    )
    return ranked.where(F.col("__rk") == 1).select(
        "component",
        F.col("id").alias("keep_id"),
        F.col("__n").cast("long").alias("n_members"),
        F.round("__score", 6).alias("keep_score"),
    )


@query(
    "text_duplication_growth",
    # bucket arithmetic is exact integers (doc_id * 10 div (max+1));
    # "duplicate" = fingerprint first seen at a LOWER doc_id (ingestion
    # order proxy), so the curve shows how dup mass grows as the corpus
    # accretes — the capacity-planning number behind incremental dedup
    oracle=f"""
WITH fp AS (SELECT doc_id, {_FP_SQL} AS f FROM documents),
fo AS (SELECT f, min(doc_id) AS first_id FROM fp GROUP BY 1),
mx AS (SELECT max(doc_id) AS mxid FROM fp),
b AS (
  SELECT CAST(fp.doc_id * 10 // (mxid + 1) AS INTEGER) AS bucket,
         CASE WHEN fp.doc_id > fo.first_id THEN 1 ELSE 0 END AS is_dup
  FROM fp JOIN fo USING (f) CROSS JOIN mx
),
g AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(is_dup) AS BIGINT) AS n_dups
  FROM b GROUP BY 1
)
SELECT bucket, n_docs, n_dups,
       round(CAST(n_dups AS DOUBLE) / n_docs, 6) AS dup_share,
       round(CAST(sum(n_dups) OVER (ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / sum(n_docs) OVER (ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING), 6) AS cum_dup_share
FROM g
""",
    description="duplication growth curve: per ingestion decile (id "
    "buckets as arrival-order proxy), the share of docs whose content "
    "fingerprint was already seen earlier, plus the cumulative dup "
    "share — dup mass GROWS superlinearly as a corpus accretes, and "
    "this curve is the capacity/savings forecast behind running "
    "incremental dedup at all; one fingerprint aggregate, one "
    "first-seen join, a 10-row cumulative window",
)
def text_duplication_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("f"))
    fo = fp.groupBy("f").agg(F.min("doc_id").alias("__first"))
    mx = fp.agg(F.max("doc_id").alias("__mx"))
    b = (
        fp.join(fo, "f")
        .join(F.broadcast(mx))
        .select(
            F.expr("doc_id * 10 div (__mx + 1)")
            .cast("int")
            .alias("bucket"),
            (F.col("doc_id") > F.col("__first")).cast("int").alias(
                "__dup"
            ),
        )
    )
    g = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__dup").alias("n_dups"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "bucket",
        "n_docs",
        "n_dups",
        F.round(
            F.col("n_dups").cast("double") / F.col("n_docs"), 6
        ).alias("dup_share"),
        F.round(
            F.sum("n_dups").over(w).cast("double")
            / F.sum("n_docs").over(w),
            6,
        ).alias("cum_dup_share"),
    )



@query(
    "text_tokenizer_fertility",
    # same exported-merge-table machinery as text_bpe_token_counts:
    # DuckDB independently re-applies the learned merges (recursive CTE
    # + greedy fold over the distinct-word table) and recomputes the
    # per-language aggregates from its own segmentation
    oracle=f"""
WITH RECURSIVE
m AS (SELECT rank, l, r FROM {export_sql('text_bpe_merge_table')}),
t AS (SELECT doc_id AS id, {_LTOKS_SQL} AS tk FROM documents),
tok AS (SELECT id, unnest(tk) AS w FROM t),
dw AS (SELECT DISTINCT w FROM tok),
sym0 AS (SELECT w, array_to_string(regexp_extract_all(w, '.'), ' ') AS sym FROM dw),
app AS (
  SELECT w, sym, 0 AS k FROM sym0
  UNION ALL
  SELECT a.w,
         list_reduce(string_split(a.sym, ' '),
           (acc, x) -> CASE
             WHEN x = m.r AND acc = m.l THEN m.l || m.r
             WHEN x = m.r AND ends_with(acc, ' ' || m.l)
               THEN substr(acc, 1, length(acc) - length(m.l)) || m.l || m.r
             ELSE acc || ' ' || x END),
         a.k + 1
  FROM app a JOIN m ON m.rank = a.k + 1
),
fin AS (SELECT w, sym FROM app WHERE k = (SELECT count(*) FROM m)),
cnt AS (SELECT w, CAST(len(string_split(sym, ' ')) AS INTEGER) AS nb FROM fin),
agg AS (SELECT tok.id, CAST(sum(cnt.nb) AS INTEGER) AS n_bpe
        FROM tok JOIN cnt ON tok.w = cnt.w GROUP BY tok.id)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(t.tk)) AS BIGINT) AS n_words,
       CAST(sum(agg.n_bpe) AS BIGINT) AS n_bpe_tokens,
       round(sum(agg.n_bpe) / CAST(sum(len(t.tk)) AS DOUBLE), 6)
         AS fertility,
       round(sum(d.n_chars) / CAST(sum(agg.n_bpe) AS DOUBLE), 6)
         AS chars_per_token
FROM t JOIN agg ON t.id = agg.id
JOIN documents d ON d.doc_id = t.id
GROUP BY 1
""",
    description="tokenizer fertility by language: subword-per-word and "
    "chars-per-subword ratios of the corpus-learned BPE, per lang — "
    "THE tokenizer-equity eval for multilingual training data (a "
    "tokenizer with fertility 2x on one language inflates its compute "
    "share and shrinks its effective context); segmentation is the "
    "same chained-regexp projection as text_bpe_token_counts (no "
    "Python in the hot path), aggregates are map-combined; oracle "
    "re-applies the exported merges and re-derives every ratio",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.text import bpe_tokenize

    docs = load_table(spark, "documents", sf_dir)
    merges = _bpe_merges_cached(spark, sf_dir)
    export_table(
        spark.createDataFrame(
            [(i + 1, a, b) for i, (a, b, _) in enumerate(merges)],
            "rank int, l string, r string",
        ),
        "text_bpe_merge_table",
    )
    tk = bpe_tokenize(docs, merges).select(
        F.col("id").alias("doc_id"), "n_words", "n_bpe_tokens"
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .join(tk, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_bpe_tokens")
                / F.sum("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.sum("n_chars")
                / F.sum("n_bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )


def _textrank_iter_sql(prev: str, cur: str) -> str:
    # one damped PageRank step over the word graph (mirrors
    # operators/graph.py:pagerank's per-iteration 8-dp rounding)
    return f"""{cur} AS (
  SELECT n.node,
         round(0.15 / nn.n + 0.85 * coalesce(s.s, 0), 8) AS r
  FROM wnodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / od.od) AS s
    FROM wedges e
    JOIN {prev} p ON e.src = p.node
    JOIN od ON e.src = od.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""


_TEXTRANK_ITERS = 5
_TEXTRANK_SQL = (
    f"""
WITH t AS (SELECT doc_id AS id, {_LTOKS_SQL} AS tk FROM documents),
adj AS (
  SELECT tk[u.i] AS a, tk[u.i + 1] AS b
  FROM t CROSS JOIN unnest(generate_series(1, len(tk) - 1)) AS u(i)
  WHERE len(tk) >= 2
),
e0 AS (SELECT DISTINCT a AS src, b AS dst FROM adj WHERE a <> b),
wedges AS (SELECT src, dst FROM e0
           UNION SELECT dst AS src, src AS dst FROM e0),
wnodes AS (SELECT DISTINCT src AS node FROM wedges),
nn AS (SELECT count(*) AS n FROM wnodes),
od AS (SELECT src, count(*) AS od FROM wedges GROUP BY src),
r0 AS (SELECT node, round(1.0 / nn.n, 8) AS r
       FROM wnodes CROSS JOIN nn),
"""
    + ",\n".join(
        _textrank_iter_sql(f"r{i}", f"r{i + 1}")
        for i in range(_TEXTRANK_ITERS)
    )
    + f"""
SELECT node AS word, round(r, 6) AS rank FROM r{_TEXTRANK_ITERS}
ORDER BY rank DESC, word
LIMIT 20
"""
)


@query(
    "text_textrank_keywords",
    oracle=_TEXTRANK_SQL,
    description="TextRank keyword extraction (Mihalcea & Tarau, EMNLP "
    "2004): PageRank over the word co-occurrence graph (undirected "
    "distinct adjacent-token pairs), top-20 corpus keywords — the "
    "unsupervised keyword baseline; the graph is Zipf-bounded (distinct "
    "word pairs, not token instances), built with one map-combined "
    "dedup, and the 5 fixed damped iterations reuse the engine's "
    "pagerank kernel: adjacency shuffled once and checkpointed, each "
    "iteration exchanges only (word, rank) pairs with per-iteration "
    "8-dp rounding so the FP sums are deterministic across engines "
    "(operators/graph.py:pagerank)",
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank
    from ..operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    tk = docs.select(tokens(F.lower(F.col("text"))).alias("tk")).where(
        F.size("tk") >= 2
    )
    adj = tk.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("a"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    e0 = adj.where(F.col("a") != F.col("b")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).distinct()
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    r = pagerank(edges, iterations=_TEXTRANK_ITERS)
    return (
        r.select(F.col("node").alias("word"), F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(20)
    )
