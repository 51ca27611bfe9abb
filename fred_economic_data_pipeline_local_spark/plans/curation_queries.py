"""Training-data curation queries: decontamination, sampling, packing,
repetition, centroid pruning — over ``documents`` and ``embeddings``.

Every query is oracle-backed: the hash families used Spark-side (xxhash64
k-grams) are mirrored in DuckDB with the equivalent string k-grams (same
sets, collision odds ~1e-11), and the deterministic samplers use md5 so
BOTH engines compute the identical sample — reproducible sampling is the
operator's point, and the oracle proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exports import export_sql
from ..operators.curation import (
    cap_per_group,
    centroid_cosines,
    hash_sample,
    label_centroids,
    pack_sequences,
    repetition_metrics,
    stratified_take,
)
from ..operators.decontam import contamination_hits, decontaminate
from .registry import query

# k-gram shingle sets as strings (DuckDB mirror of shingle_df's hashed
# form; same fallback: docs shorter than k contribute their whole text)
def _sh_sql(k: int) -> str:
    tk = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    gram = " || ' ' || ".join(f"{tk}[i+{j}]" if j else f"{tk}[i]" for j in range(k))
    return f"""
list_distinct(CASE
  WHEN len({tk}) >= {k} THEN
    list_transform(generate_series(1, len({tk}) - {k - 1}), i -> {gram})
  ELSE [trim(lower(text))] END)
"""


_SH2_SQL = _sh_sql(2)

# benchmark split: every 50th doc stands in for the eval set
_BENCH = "doc_id % 50 = 0"


@query(
    "decontam_ngram_hits",
    oracle=f"""
WITH sh AS (SELECT doc_id, {_SH2_SQL} AS s FROM documents),
bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_BENCH}),
corp AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ({_BENCH}))
SELECT c.doc_id, count(DISTINCT c.g) AS n_hits
FROM corp c JOIN bench b ON c.g = b.g
GROUP BY 1
""",
    description="test-set decontamination: per-doc count of 2-grams "
    "shared with the benchmark split (broadcast semi-join on hashed "
    "shingles; GPT-3-style n-gram overlap)",
)
def decontam_ngram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return contamination_hits(corpus, bench).select(
        F.col("id").alias("doc_id"), "n_hits"
    )


@query(
    "decontam_clean_count",
    oracle=f"""
WITH sh AS (SELECT doc_id, {_SH2_SQL} AS s FROM documents),
bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_BENCH}),
corp AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ({_BENCH})),
flagged AS (
  SELECT c.doc_id FROM corp c JOIN bench b ON c.g = b.g
  GROUP BY 1 HAVING count(DISTINCT c.g) >= 3
)
SELECT d.source, count(*) AS n_clean
FROM documents d
WHERE NOT ({_BENCH}) AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
GROUP BY 1
""",
    description="decontaminated corpus size per source (min_hits=3 "
    "tolerance for incidental short-n-gram collisions)",
)
def decontam_clean_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    clean = decontaminate(corpus, bench, min_hits=3)
    return clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_clean"))


_COS_DECON = (
    "list_dot_product(c.e, b.e) / "
    "(sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(b.e, b.e)))"
)


@query(
    "decontam_embedding_hits",
    oracle=f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
b AS (SELECT * FROM v WHERE vec_id % 17 = 0),
c AS (SELECT * FROM v WHERE vec_id % 17 <> 0),
hits AS (
  SELECT c.vec_id AS id, {_COS_DECON} AS cs
  FROM c JOIN b ON {_COS_DECON} >= 0.35
)
SELECT id, CAST(count(*) AS BIGINT) AS n_bench_hits,
       round(max(cs), 6) AS max_cos
FROM hits GROUP BY id
""",
    description="semantic decontamination: per-corpus-vector count of "
    "benchmark embeddings above cosine 0.35 plus the worst similarity "
    "— the paraphrase-leakage screen n-gram decontam misses (every "
    "17th vector stands in for the eval set; the threshold sits inside "
    "the fixture's similarity range, production runs ~0.9). Benchmark "
    "side broadcasts, corpus streams one scan, only contaminated rows "
    "shuffle",
)
def decontam_embedding_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.decontam import embedding_contamination_hits

    emb = load_table(spark, "embeddings", sf_dir)
    bench = emb.where(F.col("vec_id") % 17 == 0)
    corpus = emb.where(F.col("vec_id") % 17 != 0)
    return embedding_contamination_hits(corpus, bench, threshold=0.35)


@query(
    "decontam_embedding_hits_lsh",
    # both (id, t, sig) signature tables are exported; DuckDB re-runs
    # the bench-side hot-bucket cap, the (t, sig) collision join, the
    # exact cosine verify and the per-id aggregate — hash-checked
    # EQUALITY downstream of the (data-independent) hash planes.
    # Containment vs the exact broadcast screen is pinned separately in
    # tests/test_curation.py.
    oracle=f"""
WITH cs AS (SELECT * FROM {export_sql('decontam_corpus_sig')}),
bs AS (SELECT id AS bench_id, t, sig FROM {export_sql('decontam_bench_sig')}),
hot AS (SELECT t, sig FROM bs GROUP BY t, sig HAVING count(*) > 1000),
bsf AS (SELECT bs.* FROM bs ANTI JOIN hot USING (t, sig)),
cand AS (SELECT DISTINCT cs.id, bsf.bench_id
         FROM cs JOIN bsf ON cs.t = bsf.t AND cs.sig = bsf.sig),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
hits AS (
  SELECT cand.id,
         list_dot_product(c.e, b.e) /
         (sqrt(list_dot_product(c.e, c.e)) *
          sqrt(list_dot_product(b.e, b.e))) AS cs
  FROM cand JOIN v c ON c.vec_id = cand.id
            JOIN v b ON b.vec_id = cand.bench_id
  WHERE list_dot_product(c.e, b.e) /
        (sqrt(list_dot_product(c.e, c.e)) *
         sqrt(list_dot_product(b.e, b.e))) >= 0.35
)
SELECT id, CAST(count(*) AS BIGINT) AS n_bench_hits,
       round(max(cs), 6) AS max_cos
FROM hits GROUP BY id
""",
    description="semantic decontamination, LSH-bucketed: the scale path "
    "for decontam_embedding_hits when the benchmark outgrows broadcast "
    "— multi-table hyperplane signatures on both sides, (t, sig) "
    "equi-join candidates, exact cosine verify; approximate (recall "
    "-> 1 as similarity rises), hit sets contained in the exact "
    "screen's; hash-checked via the exported signature index tables",
)
def decontam_embedding_hits_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.decontam import (
        embedding_contamination_hits,
        lsh_contamination_candidates,
    )
    from ..operators.similarity import multitable_sig_table

    emb = load_table(spark, "embeddings", sf_dir)
    bench = emb.where(F.col("vec_id") % 17 == 0)
    corpus = emb.where(F.col("vec_id") % 17 != 0)
    csig = export_table(multitable_sig_table(corpus), "decontam_corpus_sig")
    bsig = export_table(multitable_sig_table(bench), "decontam_bench_sig")
    cand = lsh_contamination_candidates(
        corpus, bench, corpus_sig=csig, bench_sig=bsig
    )
    return embedding_contamination_hits(
        corpus, bench, threshold=0.35, candidates=cand
    )


@query(
    "sample_hash_deterministic",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')
""",
    description="deterministic ~25% sample: first md5 nibble < 4 — "
    "content-addressed, so any engine reproduces the identical sample",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return hash_sample(docs, "text", 4).select("doc_id", "lang", "source")


@query(
    "sample_stratified_lang",
    oracle="""
SELECT doc_id, lang
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) <= 20
""",
    description="stratified sample: 20 docs per language, md5-ordered "
    "(reproducible per-stratum shuffle)",
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return stratified_take(docs, ["lang"], 20, "doc_id", key_col="text").select(
        "doc_id", "lang"
    )


@query(
    "domain_cap_filter",
    oracle="""
SELECT doc_id, source
FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
""",
    description="per-domain cap: at most 10 docs per source "
    "(anti-over-representation gate)",
)
def domain_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return cap_per_group(docs, "source", 10, "doc_id").select("doc_id", "source")


_NTOK_SQL = "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)"


@query(
    "pack_sequences_greedy",
    oracle=f"""
WITH t AS (SELECT doc_id, source AS shard, {_NTOK_SQL} AS n_tokens FROM documents)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) / 256.0) AS BIGINT) AS bin_id
FROM t
""",
    description="sequence packing: docs laid into 256-token training bins "
    "per shard (streaming first-fit, bounded one-doc overflow; per-shard "
    "windows keep the pass embarrassingly parallel)",
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return pack_sequences(docs, budget_tokens=256, shard_col="source")


@query(
    "pack_bin_stats",
    oracle=f"""
WITH t AS (SELECT doc_id, source AS shard, {_NTOK_SQL} AS n_tokens FROM documents),
p AS (
  SELECT shard, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n_tokens) / 256.0) AS BIGINT) AS bin_id
  FROM t
)
SELECT shard, bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
       round(sum(n_tokens) / 256.0, 6) AS fill_ratio
FROM p GROUP BY shard, bin_id
""",
    description="packing efficiency: docs, tokens, and fill ratio per bin",
)
def pack_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    packed = pack_sequences(docs, budget_tokens=256, shard_col="source")
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_packed"),
        F.round(F.sum("n_tokens") / 256.0, 6).alias("fill_ratio"),
    )


@query(
    "text_repetition_metrics",
    oracle="""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
           FROM documents),
g AS (SELECT doc_id,
             CASE WHEN len(tk) >= 2 THEN
               list_transform(generate_series(1, len(tk) - 1),
                              i -> tk[i] || ' ' || tk[i+1])
             ELSE [] END AS grams
      FROM t)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       round(CASE WHEN len(grams) > 0
                  THEN 1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                  ELSE 0.0 END, 6) AS dup_ratio
FROM g
""",
    description="Gopher-style repetition gate: duplicate 2-gram fraction "
    "per doc (high ratio = boilerplate/looping text)",
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return repetition_metrics(docs, k=2).select(
        F.col("id").alias("doc_id"), "n_grams", "n_distinct", "dup_ratio"
    )


@query(
    "embedding_label_centroids",
    oracle="""
WITH c AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT label,
             unnest(generate_series(1, len(e))) AS i,
             unnest(e) AS v
      FROM c)
SELECT label, CAST(i - 1 AS INTEGER) AS dim, round(avg(v), 6) AS value
FROM d GROUP BY label, i
""",
    description="per-label mean embedding (class prototypes), emitted as "
    "(label, dim, value) rows — the exploded form is hashable by any "
    "order-insensitive comparator; library callers get the array form "
    "from operators.curation.label_centroids",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cents = label_centroids(emb)
    return cents.select(
        "label",
        F.posexplode(F.col("centroid")).alias("dim", "v"),
    ).select("label", "dim", F.round(F.col("v"), 6).alias("value"))


@query(
    "embedding_centroid_prune",
    oracle="""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT label,
             unnest(generate_series(1, len(e))) AS i,
             unnest(e) AS v
      FROM c),
cent AS (SELECT label, list(cv ORDER BY i) AS ce
         FROM (SELECT label, i, avg(v) AS cv FROM d GROUP BY label, i)
         GROUP BY label)
SELECT c.vec_id, c.label,
       round(list_dot_product(c.e, cent.ce) /
             (sqrt(list_dot_product(c.e, c.e)) *
              sqrt(list_dot_product(cent.ce, cent.ce))), 6) AS cos_centroid
FROM c JOIN cent USING (label)
""",
    description="SemDeDup/prototype pruning signal: cosine of each vector "
    "to its own label centroid (low = class outlier, ~1 = redundant core)",
)
def embedding_centroid_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return centroid_cosines(emb)


@query(
    "curation_pipeline_end_to_end",
    oracle=f"""
WITH corpus AS (SELECT * FROM documents WHERE NOT ({_BENCH})),
q AS (SELECT * FROM corpus
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 5),
d AS (SELECT * FROM q
      QUALIFY row_number() OVER (
        PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        ORDER BY doc_id) = 1),
sh AS (SELECT doc_id, {_sh_sql(4)} AS s FROM documents),
bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE {_BENCH}),
corp_g AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE NOT ({_BENCH})),
flagged AS (
  SELECT c.doc_id FROM corp_g c JOIN bench b ON c.g = b.g
  GROUP BY 1 HAVING count(DISTINCT c.g) >= 2
),
dc AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
smp AS (SELECT * FROM dc
        WHERE substr(md5(text), 1, 1) IN ('0','1','2','3','4','5','6','7'))
SELECT doc_id, lang, source
FROM smp
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15
""",
    description="the full curation flow as ONE composed plan: quality gate "
    "-> exact dedup -> benchmark decontamination (4-gram, min_hits=2: "
    "flags a real but bounded fraction of the word-soup fixture at every "
    "scale) -> deterministic 50% sample -> per-source cap (operators "
    "compose because each is a DataFrame -> DataFrame transform; Catalyst "
    "fuses the narrow stages)",
)
def curation_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup
    from ..operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    quality = corpus.where(token_count(F.col("text")) >= 5)
    deduped = exact_dedup(quality)
    clean = decontaminate(deduped, bench, shingle_k=4, min_hits=2)
    sampled = hash_sample(clean, "text", 8)
    return cap_per_group(sampled, "source", 15, "doc_id").select(
        "doc_id", "lang", "source"
    )


@query(
    "curation_mixture_allocation",
    # budget is derived from the data (60% of the corpus), the weight
    # denominator is an ORDERED running sum (the only order-sensitive
    # float op, folded in the same sequence by any IEEE engine), and
    # remainder ties break by source — fully engine-deterministic
    oracle="""
WITH counts AS (
  SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_avail
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(floor(0.6 * sum(n_avail)) AS BIGINT) AS n_budget
  FROM counts
),
run AS (
  SELECT grp, n_avail, sqrt(CAST(n_avail AS DOUBLE)) AS sq,
         sum(sqrt(CAST(n_avail AS DOUBLE))) OVER (
           ORDER BY grp ROWS UNBOUNDED PRECEDING) AS rs
  FROM counts
),
d AS (SELECT max(rs) AS dd FROM run),
base AS (
  SELECT grp, n_avail,
         (n_budget * sq) / dd AS q,
         CAST(floor((n_budget * sq) / dd) AS BIGINT) AS b,
         (n_budget * sq) / dd - floor((n_budget * sq) / dd) AS rem
  FROM run CROSS JOIN d CROSS JOIN tot
),
lo AS (
  SELECT CAST(any_value(n_budget) - sum(b) AS BIGINT) AS leftover
  FROM base CROSS JOIN tot
),
rk AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, grp) AS rnk
  FROM base
)
SELECT grp AS source, n_avail, round(q, 6) AS quota,
       CAST(b + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS n_alloc,
       b + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END > n_avail
         AS capped
FROM rk CROSS JOIN lo
""",
    description="token-budgeted training-mix apportionment: a fixed "
    "integer budget (60% of the corpus) split across sources in "
    "proportion to n^0.5 (temperature flattening) by the "
    "largest-remainder / Hamilton method — INTEGER allocations that "
    "sum exactly to the budget, the conservation property per-group "
    "ceil quotas cannot give; one map-combined count exchange, then "
    "O(sources) arithmetic (the single-partition windows order the "
    "20-row group table, never the corpus); weight denominator as an "
    "ordered running sum so any IEEE engine folds the identical "
    "sequence",
)
def curation_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.curation import mixture_allocation

    docs = load_table(spark, "documents", sf_dir)
    budget = math.floor(0.6 * docs.count())
    return mixture_allocation(docs, "source", budget, alpha=0.5)


@query(
    "sample_temperature_mix",
    oracle="""
WITH q AS (SELECT source, CAST(ceil(sqrt(count(*))) AS BIGINT) AS quota
           FROM documents GROUP BY 1)
SELECT doc_id, source
FROM documents JOIN q USING (source)
QUALIFY row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id)
        <= quota
""",
    description="temperature-based training mix (alpha=0.5): per-source "
    "quota ceil(n^0.5) filled in deterministic md5 order — flattens "
    "over-represented sources, reproducible across engines",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import temperature_mix

    docs = load_table(spark, "documents", sf_dir)
    return temperature_mix(docs, "source", alpha=0.5, key_col="text").select(
        "doc_id", "source"
    )


# The documents fixture is clean word-soup (no emails/digits/newlines),
# so the PII and boilerplate queries inject deterministic spans derived
# from doc_id via concat — identically on both engines — and then prove
# the distributed redaction/line-df computation matches the oracle.

@query(
    "curation_redact_pii",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or 555-123-4567 at 10.0.' ||
         CAST(doc_id % 256 AS VARCHAR) || '.1' AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
       len(regexp_extract_all(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ip,
       len(regexp_extract_all(
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
           '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
         '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '<PHONE>', 'g') AS text_redacted
FROM seeded
""",
    description="PII redaction: mask emails / IPs / phone numbers with "
    "typed tokens and count hits — pure codegen regexp projection, zero "
    "shuffle (PII spans injected deterministically; fixture is clean)",
)
def curation_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import redact_pii

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    return redact_pii(docs).select(
        "doc_id", "n_email", "n_ip", "n_phone", "text_redacted"
    )


_SPLIT_BUCKET_SQL = (
    "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@query(
    "curation_split_counts",
    oracle=f"""
WITH s AS (
  SELECT lang,
         CASE WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs FROM s GROUP BY split, lang
""",
    description="deterministic 90/5/5 train/val/test split by md5(id) "
    "bucket — content-hash assignment that never migrates docs between "
    "splits across re-runs or engines; per-(split, lang) counts",
)
def curation_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import assign_split

    docs = load_table(spark, "documents", sf_dir)
    return (
        assign_split(docs)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_HN_COS = (
    "list_dot_product(q.e, c.e) / "
    "(sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))"
)


@query(
    "embedding_hard_negatives",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id < 5)
SELECT q.vec_id AS query_id, c.vec_id AS neg_id, c.label AS neg_label,
       round({_HN_COS}, 6) AS cos_sim
FROM q JOIN c ON q.vec_id <> c.vec_id AND q.label <> c.label
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY round({_HN_COS}, 6) DESC, neg_id) <= 5
""",
    description="contrastive hard-negative mining: per query vector, the "
    "top-5 highest-cosine corpus vectors with a DIFFERENT label "
    "(broadcast query side; corpus never shuffles for the join)",
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import hard_negatives

    emb = load_table(spark, "embeddings", sf_dir)
    return hard_negatives(emb, k=5, n_query=5)


# DuckDB mirror of run_curation_job's default-config pipeline
# (jobs.py:run_curation_job): benchmark holdout (doc_id % 50) -> token
# gate (>= 5 whitespace tokens) -> exact dedup (min-id per normalized-
# content fingerprint) -> 4-gram decontamination vs the benchmark
# (drop at >= 2 shared shingles) -> md5-bucket 90/5/5 split, with the
# benchmark rows themselves landing in split=benchmark.
_JOB_SH4 = _sh_sql(4)
_CURATION_JOB_ORACLE = f"""
WITH bench AS (SELECT * FROM documents WHERE {_BENCH}),
corpus AS (
  SELECT * FROM documents
  WHERE NOT ({_BENCH})
    AND len(regexp_split_to_array(trim(text), '\\s+')) >= 5
),
dedup AS (
  SELECT * FROM (
    SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
    FROM corpus
  ) QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1
),
bsh AS (
  SELECT DISTINCT unnest(s) AS g
  FROM (SELECT {_JOB_SH4} AS s FROM bench)
),
csh AS (
  SELECT doc_id, unnest(s) AS g
  FROM (SELECT doc_id, {_JOB_SH4} AS s FROM dedup)
),
flagged AS (
  SELECT c.doc_id FROM csh c JOIN bsh b ON c.g = b.g
  GROUP BY 1 HAVING count(DISTINCT c.g) >= 2
),
labeled AS (
  SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
  UNION ALL
  SELECT 'benchmark' AS split FROM bench
)
SELECT split, count(*) AS n_docs FROM labeled GROUP BY 1
"""


@query(
    "curation_job_split_counts",
    oracle=_CURATION_JOB_ORACLE,
    description="the declarative curation JOB end-to-end (gate -> exact "
    "dedup -> benchmark decontamination -> deterministic split -> "
    "partitioned lake write): per-split doc counts read back from the "
    "written lake, so the driver verifies the composed job, not just its "
    "stages",
)
def curation_job_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs ``run_curation_job`` against a scratch lake and returns the
    per-split counts FROM THE WRITTEN FILES (a real write-read round
    trip — the oracle independently recomputes the whole pipeline in
    DuckDB). The scratch root is deterministic per sf so re-runs hit the
    job's dynamic-overwrite idempotence path instead of littering tmp."""
    import os
    import tempfile

    from ..jobs import run_curation_job

    out_root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_curation_job",
        os.path.basename(sf_dir.rstrip("/") or "sf"),
    )
    run_curation_job(spark, os.path.join(sf_dir, "documents.parquet"), out_root)
    return (
        spark.read.parquet(out_root)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# per-column profile blocks, one UNION ALL branch per documents column —
# the DuckDB mirror of profile_columns' single-agg + pivot (BIGINT casts:
# DuckDB count arithmetic can land HUGEINT, which pandas reads as float64
# and the driver's value hash would then diverge on, r3 lesson)
def _profile_sql(cols: tuple[str, ...], where: str = "TRUE") -> str:
    return "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM documents WHERE {where}"""
        for c in cols
    )


_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")
_PROFILE_SQL = _profile_sql(_DOC_COLS)


@query(
    "profile_documents",
    oracle=_PROFILE_SQL,
    description="snapshot ingest monitor: per-column null count, exact "
    "distinct cardinality, and native-typed min/max over documents in "
    "ONE scan + ONE aggregate row (long-form output joins against the "
    "previous snapshot's profile for drift alerts; approx_distinct=True "
    "is the HLL++ scale path)",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns

    return profile_columns(load_table(spark, "documents", sf_dir))


# drift oracle: full-outer join of two profile CTEs (current snapshot vs
# a simulated previous one missing every 5th doc AND the n_chars column,
# so both the cardinality-ratio and the schema-change alerts fire)
_DRIFT_PREV_WHERE = "doc_id % 5 <> 0"
_DRIFT_SQL = f"""
WITH curr AS ({_profile_sql(_DOC_COLS)}),
prev AS ({_profile_sql(_DOC_COLS[:-1], _DRIFT_PREV_WHERE)}),
j AS (
  SELECT coalesce(c.col_name, p.col_name) AS col_name,
         c.n_rows AS n_rows_curr, p.n_rows AS n_rows_prev,
         round(c.n_nulls / greatest(c.n_rows, 1), 6) AS null_rate_curr,
         round(p.n_nulls / greatest(p.n_rows, 1), 6) AS null_rate_prev,
         c.n_distinct AS n_distinct_curr, p.n_distinct AS n_distinct_prev,
         round(c.n_distinct / CAST(greatest(p.n_distinct, 1) AS DOUBLE), 6)
           AS distinct_ratio,
         (c.n_rows IS NULL OR p.n_rows IS NULL) AS alert_schema
  FROM curr c FULL OUTER JOIN prev p ON c.col_name = p.col_name
)
SELECT col_name, n_rows_curr, n_rows_prev, null_rate_curr, null_rate_prev,
       n_distinct_curr, n_distinct_prev, distinct_ratio,
       coalesce(null_rate_curr - null_rate_prev > 0.01, FALSE) AS alert_nulls,
       coalesce(distinct_ratio < 0.5 OR distinct_ratio > 2.0, FALSE)
         AS alert_distinct,
       alert_schema
FROM j
"""


@query(
    "profile_drift_documents",
    oracle=_DRIFT_SQL,
    description="snapshot drift report: full-outer join of two column "
    "profiles (current vs a simulated previous snapshot missing every "
    "5th doc and the n_chars column) with null-rate, distinct-ratio, "
    "and schema-change alerts — the alerting consumer the long-form "
    "profile exists for; both profile inputs are one-row-per-column, "
    "so the report adds zero passes over the data",
)
def profile_drift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns, profile_drift

    docs = load_table(spark, "documents", sf_dir)
    curr = profile_columns(docs)
    prev = profile_columns(
        docs.where(F.col("doc_id") % 5 != 0), cols=list(_DOC_COLS[:-1])
    )
    return profile_drift(curr, prev)


_SNAP_FP = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


@query(
    "snapshot_diff_counts",
    oracle=f"""
WITH oldv AS (
  SELECT doc_id, {_SNAP_FP} AS fp FROM documents WHERE doc_id % 7 <> 0
),
newv AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(
           CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
         )), '\\s+', ' ', 'g')) AS fp
  FROM documents WHERE doc_id % 5 <> 0
),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
)
SELECT status, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY status
""",
    description="content-level snapshot diff: old (every 7th doc absent) "
    "vs new (every 5th absent, every 3rd re-crawled with edited text) "
    "full-outer-joined on (id, fingerprint) only — two narrow columns "
    "shuffled regardless of document size, exchange-free when both "
    "snapshots are id-bucketed — aggregated to the 4-row "
    "added/removed/changed/unchanged dashboard",
)
def snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import snapshot_diff_counts as diff_counts
    from ..operators.text import fingerprint

    docs = load_table(spark, "documents", sf_dir)
    old = docs.where(F.col("doc_id") % 7 != 0).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    edited = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    new = docs.where(F.col("doc_id") % 5 != 0).select(
        "doc_id", fingerprint(edited).alias("fp")
    )
    return diff_counts(old, new)


_LEAK_SHINGLES = """
list_distinct(list_transform(
  generate_series(0, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 0)),
  i -> array_to_string(regexp_split_to_array(trim(lower(text)), '\\s+')[i+1:i+2], ' ')
))
"""


@query(
    "curation_split_leakage",
    oracle=f"""
WITH RECURSIVE corpus AS MATERIALIZED (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' v2', source
  FROM documents WHERE doc_id % 50 = 0
),
sh AS MATERIALIZED (
  SELECT doc_id AS id, source AS block, {_LEAK_SHINGLES} AS s FROM corpus
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
sp AS (
  SELECT doc_id AS id,
         CASE WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM corpus
),
agg AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
         array_to_string(list_sort(list_distinct(list(split))), ',') AS splits
  FROM comp JOIN sp USING (id)
  GROUP BY component
)
SELECT * FROM agg WHERE n_splits > 1
""",
    description="split-contamination audit over a simulated re-crawl "
    "(every 50th doc re-ingested under a new id with edited text — the "
    "exact mechanism that defeats id-hash splits): near-dup components "
    "(2-gram Jaccard >= 0.5) joined onto the deterministic md5 "
    "train/val/test assignment; every component straddling splits is a "
    "test-set leak. Narrow (id, label) joins only, no text shuffled",
)
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import assign_split, split_leakage_audit
    from ..operators.dedup import neardup_components, ngram_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "source"
    )
    recrawl = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "source",
    )
    corpus = docs.unionByName(recrawl)
    pairs = ngram_jaccard_pairs(corpus, shingle_k=2, threshold=0.5)
    comps = neardup_components(pairs)
    return split_leakage_audit(assign_split(corpus), comps)


_SHUF_B = (
    "CAST(CONCAT('0x', substr(md5('s0:b:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 16"
)


@query(
    "curation_shuffle_assignment",
    oracle=f"""
WITH s AS (
  SELECT doc_id AS id,
         CAST({_SHUF_B} AS INTEGER) AS bucket,
         md5('s0:o:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents
)
SELECT id, bucket,
       CAST(row_number() OVER (PARTITION BY bucket
                               ORDER BY order_key, id) AS INTEGER) AS pos
FROM s
""",
    description="deterministic distributed corpus shuffle: md5 hash into "
    "16 shuffle shards + md5 in-shard order — training-order "
    "randomization WITHOUT a global sort (one bucket exchange, per-bucket "
    "sort), reproducible bit-for-bit across runs/retries/engines where "
    "rand() would reshuffle on every retry",
)
def curation_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import shuffle_assignment

    docs = load_table(spark, "documents", sf_dir)
    return shuffle_assignment(docs, n_buckets=16, seed="s0")


_PROF_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "profile_incremental_documents",
    # the HLL sketch registers have no SQL mirror, so like
    # approx_aggregates_lineitem this is self-certifying: the merged
    # profile's COUNTS (exact sums by construction) hash-check against
    # DuckDB's direct aggregation, and the merged distinct ESTIMATE is
    # emitted as a bound certificate (within 2% of exact, the envelope
    # tests/test_profile.py pins) that the oracle requires TRUE —
    # a sketch-merge bug now fails the external hash, not just a test
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct_exact,
       TRUE AS est_within_bounds
FROM documents"""
        for c in _PROF_COLS
    ),
    description="O(delta) profile maintenance: per-snapshot mergeable "
    "column profiles (counts + Datasketches HLL per column) unioned "
    "into the corpus profile without re-scanning the accumulated "
    "corpus — the statistics-side counterpart of the incremental "
    "dedup indexes; merge input is #snapshots x #columns tiny rows. "
    "Self-certifying: merged counts hash-check exactly, the HLL "
    "estimate certifies against an exact-distinct pass (the "
    "certification pass exists for the gate only — production runs "
    "sketches precisely to avoid it)",
)
def profile_incremental_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import merge_sketch_profiles, sketch_profile

    docs = load_table(spark, "documents", sf_dir)
    cols = list(_PROF_COLS)
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    merged = merge_sketch_profiles(
        sketch_profile(old, cols), sketch_profile(new, cols)
    )
    # exact-distinct certification pass (one scan, one aggregate row,
    # unpivoted to long form to join the merged profile on col_name)
    wide = docs.agg(
        *[F.count_distinct(c).alias(f"__nd_{c}") for c in cols]
    )
    exact = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"__nd_{c}").alias("n_distinct_exact"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    ok = F.abs(
        F.col("n_distinct_est") - F.col("n_distinct_exact")
    ) <= F.greatest(F.lit(0.02) * F.col("n_distinct_exact"), F.lit(1.0))
    return merged.join(F.broadcast(exact), "col_name").select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct_exact",
        ok.alias("est_within_bounds"),
    )


@query(
    "embedding_outlier_zscores",
    oracle="""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
d AS (SELECT label,
             unnest(generate_series(1, len(e))) AS i,
             unnest(e) AS v
      FROM c),
cent AS (SELECT label, list(cv ORDER BY i) AS ce
         FROM (SELECT label, i, avg(v) AS cv FROM d GROUP BY label, i)
         GROUP BY label),
cos AS (
  SELECT c.vec_id, c.label,
         round(list_dot_product(c.e, cent.ce) /
               (sqrt(list_dot_product(c.e, c.e)) *
                sqrt(list_dot_product(cent.ce, cent.ce))), 6) AS cc
  FROM c JOIN cent USING (label)
),
st AS (SELECT label, avg(cc) AS mu, stddev_samp(cc) AS sd
       FROM cos GROUP BY label)
SELECT cos.vec_id, cos.label,
       round((cos.cc - st.mu) / st.sd, 6) AS z
FROM cos JOIN st USING (label)
""",
    description="per-label outlier score: z-normalized cosine-to-centroid "
    "(the normalized SemDeDup signal — comparable across labels with "
    "different intra-class spreads); label-stats table is #labels rows, "
    "broadcast back, no window",
)
def embedding_outlier_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import centroid_cosines

    emb = load_table(spark, "embeddings", sf_dir)
    cos = centroid_cosines(emb)
    st = cos.groupBy(F.col("label").alias("__l")).agg(
        F.avg("cos_centroid").alias("__mu"),
        F.stddev_samp("cos_centroid").alias("__sd"),
    )
    return cos.join(F.broadcast(st), cos.label == F.col("__l")).select(
        "vec_id",
        "label",
        F.round((F.col("cos_centroid") - F.col("__mu")) / F.col("__sd"), 6).alias(
            "z"
        ),
    )


_AES_KEY_SQL = (
    "ln((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT) + 1.0) / 4294967297.0) / n_chars"
)


@query(
    "sample_weighted_aes",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE n_chars > 0
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY {_AES_KEY_SQL} DESC, doc_id
) <= 20
""",
    description="weighted sampling without replacement (Efraimidis-"
    "Spirakis A-ES): 20 docs per language with inclusion probability "
    "proportional to n_chars — key ln(u)/w over md5-derived u, so the "
    "sample is a pure function of content (reproducible across engines, "
    "which the oracle proves); the per-row-weight upgrade of the "
    "uniform/stratified/temperature samplers",
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import weighted_sample

    docs = load_table(spark, "documents", sf_dir)
    return weighted_sample(
        docs.select("doc_id", "lang", "source", "n_chars"),
        n=20,
        weight_col="n_chars",
        strata_col="lang",
    )


@query(
    "profile_quantile_sketch",
    # self-certifying like profile_incremental_documents: the sketch's
    # bucket walk has no SQL mirror (the oracle would re-derive
    # ln/pow bucket boundaries whose last-ulp placement is
    # engine-specific), so the exact-checkable fields hash (q, exact
    # value count) and the DDSketch relative-error guarantee ships as a
    # bound certificate the oracle requires TRUE — computed against an
    # exact-rank pass that exists for the gate only
    oracle="\nUNION ALL\n".join(
        f"""SELECT CAST({q} AS DOUBLE) AS q,
       count(n_chars) AS n_values, TRUE AS est_within_alpha
FROM documents"""
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    ),
    description="mergeable quantile profile (DDSketch reduced to its "
    "deterministic core): per-snapshot log-bucket count sketches merge "
    "EXACTLY (counts add — no KLL/t-digest order dependence), the "
    "corpus quantile walk touches O(buckets) rows, never the data; "
    "each estimate certifies |est - exact_q| <= alpha*|exact_q| "
    "against an exact-rank pass (gate-only; production keeps sketches "
    "precisely to avoid that pass)",
)
def profile_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import dd_merge, dd_quantiles, dd_sketch
    from ..operators.rank import ordered_prefix

    alpha = 0.01
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    docs = load_table(spark, "documents", sf_dir)
    vals = docs.select(
        F.col("n_chars").cast("double").alias("v"), "doc_id"
    ).where(F.col("v").isNotNull())
    # two ingest snapshots, profiled independently, merged O(buckets)
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    merged = dd_merge(
        dd_sketch(old.select(F.col("n_chars").alias("v")), "v", alpha),
        dd_sketch(new.select(F.col("n_chars").alias("v")), "v", alpha),
    )
    ests = dd_quantiles(merged, qs, alpha)
    # exact-rank certification pass (gate only): value at the same
    # rank rule the sketch answers, floor(q*(n-1)) + 1. The rank comes
    # from the two-pass ordered_prefix (range partition + local rank +
    # broadcast offsets) — the old row_number() OVER (ORDER BY v)
    # single-partitioned the whole corpus — and the join broadcasts the
    # 7-row quantile frame onto the distributed ranked values, never
    # the reverse. Value-at-rank is tie-insensitive, but doc_id makes
    # the order strict anyway (the primitive's determinism contract).
    ranked = ordered_prefix(
        vals, [("v", True), ("doc_id", True)], carry=["v"]
    ).withColumnRenamed("__rn", "rank")
    cert = ranked.join(
        F.broadcast(
            ests.withColumn(
                "rank",
                F.floor(F.col("q") * (F.col("n_values") - 1)) + 1,
            )
        ),
        "rank",
    )
    ok = F.abs(F.col("est") - F.col("v")) <= (
        F.lit(alpha) * F.abs(F.col("v")) + F.lit(1e-9)
    )
    return cert.select(
        "q", "n_values", ok.alias("est_within_alpha")
    )


@query(
    "manifest_zorder_range_read",
    # content is the whole contract: clustering is a pure LAYOUT
    # rewrite, so the range read over the zorder-clustered table must
    # equal the plain predicate over the raw fixture — the driver-side
    # bucket pruning (zone maps tightened by clustering) is pinned in
    # tests/test_lakehouse.py, invisible to (and unneeded by) the oracle
    oracle="""
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE n_chars BETWEEN 200 AND 400
GROUP BY source
""",
    description="OPTIMIZE ZORDER reduced to core: min-max bit-interleave "
    "Z-value (codegen'd shift/or, no UDF), one range-partition sample-sort "
    "into bucket dirs written without a second exchange, atomic manifest "
    "commit with layout=zorder (merges refuse until overwrite restores "
    "hash routing); zone maps turn from full-range to tight slices so "
    "read_range prunes buckets driver-side before any file is listed",
)
def manifest_zorder_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scratch is run-unique (mkdtemp) and the result is
    # localCheckpoint-pinned — correct hygiene for a lazily-returned
    # frame over temp files, but NOT the cause of the r7/r8 driver
    # hash-reds: those were oracle dtype drift (the oracle's bare
    # sum(n_chars) typed HUGEINT, which DuckDB fetchdf renders float64
    # vs Spark's int64 — fixed r9 with CAST(... AS BIGINT); VERDICT r8
    # root-caused it, and tests/test_oracle_dtypes.py now pins it).
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "lang", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="zorder_docs_")
    t = ManifestLakeTable(
        root, keys=["doc_id"], n_buckets=16, stats_cols=["n_chars"]
    )
    t.overwrite(docs)
    t.optimize_zorder(spark, ["n_chars"])
    return (
        t.read_range(spark, "n_chars", 200, 400)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .localCheckpoint(eager=True)
    )


@query(
    "stream_lake_ingest",
    # content is the contract: bootstrap slice + N streamed micro-batch
    # merges must land EXACTLY the full corpus in the table (no row
    # lost to a batch boundary, none duplicated by upsert replay) — so
    # the oracle is the plain aggregate over the raw fixture; the
    # exactly-once txn mechanics are pinned in tests/test_streaming.py
    oracle="""
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY source, lang
""",
    description="streaming lakehouse ingest (Delta streaming-MERGE sink "
    "reduced to core): file-source stream drained AvailableNow, one "
    "transactional O(delta) MERGE per micro-batch via foreachBatch, "
    "exactly-once by the txnAppId/txnVersion watermark riding inside "
    "the manifest commit (a checkpoint-replayed batch is a no-op); "
    "steady-state cost tracks arrival rate, not table size",
)
def stream_lake_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Run-unique scratch + localCheckpoint'd result, same hygiene
    # rationale as manifest_zorder_range_read — and the same correction:
    # the r7/r8 driver hash-reds were HUGEINT oracle dtype drift, not
    # scratch races (fixed r9 with CAST(... AS BIGINT) in the oracle).
    import os
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable
    from ..streaming.lake_ingest import stream_merge_into

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "lang", "n_chars"
    )
    scratch = tempfile.mkdtemp(prefix="stream_ingest_")
    inbox = os.path.join(scratch, "inbox")
    root = os.path.join(scratch, "lake")
    bootstrap = docs.where(F.col("doc_id") % 7 == 0)
    arriving = docs.where(F.col("doc_id") % 7 != 0)
    arriving.repartition(4).write.parquet(inbox)
    t = ManifestLakeTable(root, keys=["doc_id"], n_buckets=8)
    t.overwrite(bootstrap)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    stream_merge_into(stream, t, app_id="catalog-ingest")
    return (
        t.read(spark)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .localCheckpoint(eager=True)
    )


_HLL_P = 10  # m = 1024 registers; alpha embedded as a shared literal


def _hll_est_sql(v: str, z: str) -> str:
    """The HLL estimate as DuckDB SQL from zero-register count ``v``
    and the exact register sum ``z`` — the SAME alpha/m literals and
    branch the Spark side uses (operators/profile.hll_estimate)."""
    from ..operators.profile import hll_alpha

    m = 1 << _HLL_P
    raw = f"{hll_alpha(_HLL_P) * m * m!r} / ({v} + {z})"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / {v}) "
        f"ELSE {raw} END, 4)"
    )


@query(
    "stream_hll_ingest",
    # contract: the streamed register MAX-merge over arbitrary batch
    # boundaries must equal one batch sketch of the full corpus — so
    # the oracle re-derives every per-source estimate from the exported
    # FINAL register table and certifies it against the exact distinct
    # count over the raw fixture. Exactly-once needs no watermark here:
    # register max is idempotent, so replays cannot change the state.
    oracle=f"""
WITH regs AS (SELECT grp, reg, rho FROM {export_sql('stream_hll_regs')}),
per AS (
  SELECT grp AS source, CAST(count(*) AS BIGINT) AS n_registers,
         sum(1.0 / (1::BIGINT << rho)) AS z
  FROM regs GROUP BY grp
),
est AS (
  SELECT source, n_registers,
         {_hll_est_sql(f'({1 << _HLL_P} - n_registers)', 'z')}
           AS n_distinct_est
  FROM per
),
ex AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_exact
  FROM documents GROUP BY source
)
SELECT est.source, est.n_registers, est.n_distinct_est,
       ex.n_distinct_exact,
       round(abs(est.n_distinct_est - ex.n_distinct_exact)
             / ex.n_distinct_exact, 6) AS rel_err
FROM est JOIN ex USING (source)
""",
    description="streaming sketch maintenance (foreachBatch HLL "
    "register MAX-merge into a versioned manifest table): per "
    "micro-batch the work is the batch's own register aggregate plus "
    "an O(groups x 2^p) merge commit — sketch state never grows with "
    "the corpus, and exactly-once is FREE because register max is "
    "idempotent/commutative/associative (no txn watermark, unlike row "
    "upserts); the final streamed state must equal one batch sketch of "
    "the whole corpus regardless of batch boundaries, which the oracle "
    "certifies from the exported registers against exact counts",
)
def stream_hll_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..exports import export_table
    from ..operators.profile import hll_estimate, hll_registers
    from ..sources.lakehouse import ManifestLakeTable
    from ..streaming.lake_ingest import stream_hll_merge

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    scratch = tempfile.mkdtemp(prefix="stream_hll_")
    inbox = os.path.join(scratch, "inbox")
    root = os.path.join(scratch, "sketch")
    bootstrap = docs.where(F.col("doc_id") % 7 == 0)
    arriving = docs.where(F.col("doc_id") % 7 != 0)
    arriving.repartition(4).write.parquet(inbox)
    t = ManifestLakeTable(root, keys=["grp", "reg"], n_buckets=4)
    t.overwrite(hll_registers(bootstrap, "doc_id", p=_HLL_P, by="source"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    stream_hll_merge(stream, t, "doc_id", p=_HLL_P, by="source")
    regs = export_table(t.read(spark), "stream_hll_regs")
    est = hll_estimate(regs, p=_HLL_P, by=True).select(
        F.col("grp").alias("source"), "n_registers", "n_distinct_est"
    )
    exact = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_distinct_exact")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            "n_registers",
            "n_distinct_est",
            "n_distinct_exact",
            F.round(
                F.abs(F.col("n_distinct_est") - F.col("n_distinct_exact"))
                / F.col("n_distinct_exact"),
                6,
            ).alias("rel_err"),
        )
        .localCheckpoint(eager=True)
    )


@query(
    "manifest_rebucket_read",
    # content is the whole contract: rebucketing is a pure LAYOUT
    # rewrite (new key-hash routing, same rows), so bootstrap + merge +
    # rebucket + zone-map-pruned range read must equal the plain
    # predicate over the raw fixture; the spec validation and
    # bucket-count mechanics are pinned in tests/test_rebucket.py
    oracle="""
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE n_chars BETWEEN 150 AND 450
GROUP BY source
""",
    description="bucket-count evolution (ALTER TABLE ... CLUSTERED BY "
    "reduced to core): the committed manifest records the bucketing "
    "spec (keys + n_buckets) so mis-configured writers are refused "
    "instead of silently mis-routing merges; rebucket() rewrites the "
    "current version through the new key-hash routing in ONE exchange, "
    "recomputes zone maps from the new buckets' bytes, and commits "
    "atomically — the layout operation a table growing 100x needs, with "
    "prior versions still readable under their own manifests",
)
def manifest_rebucket_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint'd result, same driver-
    # robustness rationale as manifest_zorder_range_read
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "lang", "n_chars"
    )
    root = tempfile.mkdtemp(prefix="rebucket_docs_")
    t = ManifestLakeTable(
        root, keys=["doc_id"], n_buckets=4, stats_cols=["n_chars"]
    )
    t.overwrite(docs.where(F.col("doc_id") % 3 != 0))
    t.merge_into(docs.where(F.col("doc_id") % 3 == 0))
    t.rebucket(spark, 16)
    return (
        t.read_range(spark, "n_chars", 150, 450)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .localCheckpoint(eager=True)
    )


_KMV_K = 128
_KMV_U = "h / 18446744073709551616.0 + 0.5"


@query(
    "sketch_theta_set_ops",
    # the two per-half sketches are exported; the oracle INDEPENDENTLY
    # re-normalizes the hashes, re-derives every estimate (distinct,
    # lossless union, shared-theta intersection), recomputes the exact
    # distinct counts from the raw fixture, and re-checks the error
    # certificates — everything after the xxhash64 edge is hash-gated
    oracle=f"""
WITH ska AS (SELECT h, {_KMV_U} AS u FROM {export_sql('kmv_a')}),
skb AS (SELECT h, {_KMV_U} AS u FROM {export_sql('kmv_b')}),
sku AS (
  SELECT h, {_KMV_U} AS u
  FROM (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb))
  QUALIFY row_number() OVER (ORDER BY h) <= {_KMV_K}
),
na AS (SELECT count(*) AS n, max(u) AS uk FROM ska),
nb AS (SELECT count(*) AS n, max(u) AS uk FROM skb),
nu AS (SELECT count(*) AS n, max(u) AS uk FROM sku),
th AS (
  SELECT least(
           CASE WHEN na.n < {_KMV_K} THEN 1.0 ELSE na.uk END,
           CASE WHEN nb.n < {_KMV_K} THEN 1.0 ELSE nb.uk END
         ) AS theta
  FROM na, nb
),
mt AS (
  SELECT count(*) AS m
  FROM ska JOIN skb USING (h) CROSS JOIN th
  WHERE ska.u < th.theta
),
ea AS (SELECT CAST(count(DISTINCT n_chars) AS BIGINT) AS x
       FROM documents WHERE doc_id % 2 = 0),
eb AS (SELECT CAST(count(DISTINCT n_chars) AS BIGINT) AS x
       FROM documents WHERE doc_id % 2 = 1),
eu AS (SELECT CAST(count(DISTINCT n_chars) AS BIGINT) AS x FROM documents),
ei AS (SELECT CAST(count(*) AS BIGINT) AS x FROM (
         SELECT DISTINCT n_chars FROM documents WHERE doc_id % 2 = 0
         INTERSECT
         SELECT DISTINCT n_chars FROM documents WHERE doc_id % 2 = 1)),
est AS (
  SELECT 'a' AS set_op,
         round(CASE WHEN na.n < {_KMV_K} THEN CAST(na.n AS DOUBLE)
                    ELSE {_KMV_K - 1}.0 / na.uk END, 6) AS est,
         ea.x AS exact
  FROM na, ea
  UNION ALL
  SELECT 'b',
         round(CASE WHEN nb.n < {_KMV_K} THEN CAST(nb.n AS DOUBLE)
                    ELSE {_KMV_K - 1}.0 / nb.uk END, 6), eb.x
  FROM nb, eb
  UNION ALL
  SELECT 'union',
         round(CASE WHEN nu.n < {_KMV_K} THEN CAST(nu.n AS DOUBLE)
                    ELSE {_KMV_K - 1}.0 / nu.uk END, 6), eu.x
  FROM nu, eu
  UNION ALL
  SELECT 'intersect', round(mt.m / th.theta, 6), ei.x FROM mt, th, ei
)
SELECT set_op, est, exact,
       abs(est - exact) <= 0.3 * eu.x AS within_bound
FROM est CROSS JOIN eu
""",
    description="theta/KMV distinct sketches with set operations (Beyer "
    "et al. 2007 / DataSketches theta family, deterministic core): "
    "per-half k-minimum-values sketches over documents.n_chars — O(k) "
    "rows of plain persistable state per sketch, one map-combined "
    "distinct shuffle to build; union merges losslessly (k smallest of "
    "the concatenation), intersection estimates via the shared-theta "
    "rule; every estimate certified within 0.3x the exact union "
    "cardinality against an exact pass (gate-only at scale)",
)
def sketch_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.profile import (
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_sketch,
        kmv_union,
    )

    k = _KMV_K
    docs = load_table(spark, "documents", sf_dir)
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    ska = export_table(kmv_sketch(a, "n_chars", k), "kmv_a")
    skb = export_table(kmv_sketch(b, "n_chars", k), "kmv_b")

    def _est(sk: DataFrame, name: str) -> DataFrame:
        return kmv_estimate(sk, k).select(
            F.lit(name).alias("set_op"), F.col("n_distinct_est").alias("est")
        )

    ests = (
        _est(ska, "a")
        .union(_est(skb, "b"))
        .union(_est(kmv_union(ska, skb, k), "union"))
        .union(
            kmv_intersect_estimate(ska, skb, k).select(
                F.lit("intersect").alias("set_op"),
                F.col("n_intersect_est").alias("est"),
            )
        )
    )
    av = a.select("n_chars").distinct()
    bv = b.select("n_chars").distinct()

    def _one(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("exact")).select(
            F.lit(name).alias("set_op"), "exact"
        )

    exacts = (
        _one(av, "a")
        .union(_one(bv, "b"))
        .union(_one(docs.select("n_chars").distinct(), "union"))
        .union(_one(av.join(bv, "n_chars"), "intersect"))
    )
    eu = docs.agg(F.count_distinct("n_chars").alias("__eu"))
    return (
        ests.join(exacts, "set_op")
        .join(F.broadcast(eu))
        .select(
            "set_op",
            "est",
            "exact",
            (
                F.abs(F.col("est") - F.col("exact"))
                <= 0.3 * F.col("__eu")
            ).alias("within_bound"),
        )
    )


@query(
    "tpch_refresh_pricing",
    # the oracle applies the same refresh-set algebra directly:
    # bootstrap (not RF1) + RF1 inserts = the full fixture, minus RF2's
    # deleted orders — then the Q1-shape pricing aggregate over the
    # refreshed state
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE NOT (l_orderkey % 13 = 5)
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H refresh functions through the lakehouse (RF1 "
    "insert batch via O(delta) MERGE, RF2 delete batch via the CDC "
    "delete feed) on the LARGEST fixture table — the fact-scale probe "
    "of the manifest commit log: only touched buckets rewrite, deletes "
    "land under one atomic commit, and the Q1-shape pricing aggregate "
    "over the refreshed table must equal the plain set algebra over "
    "the raw fixture",
)
def tpch_refresh_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BENCH r11 delta 1.31x vs r10 (5.69 -> 7.46 s): A/B'd in-session —
    # isolated fresh-session min-of-4 at sf0.1 is 6.78 s with zero code
    # changes on this path this round, i.e. inside the documented ±20%
    # cross-session host-variance envelope (see the provenance note on
    # similarity_quantized_topk); the residual +0.7 s in the bench run
    # is session context from the 165-query sequence. No action taken.
    # run-unique scratch + localCheckpoint: see manifest_zorder_range_read
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    raw = load_table(spark, "lineitem", sf_dir)
    # the synthetic fixture's (l_orderkey, l_linenumber) is NOT unique
    # (TPC-H proper's PK doesn't hold here) — a keyed upsert table needs
    # one, so derive a full-row surrogate: rows are unique as tuples,
    # and every refresh set derives the SAME rid from the same frame
    rid = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in raw.columns]))
    li = raw.select(
        rid.alias("rid"),
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    rf1 = F.col("l_orderkey") % 7 == 3
    t = ManifestLakeTable(
        tempfile.mkdtemp(prefix="tpch_rf_"),
        keys=["rid"],
        n_buckets=32,
    )
    t.overwrite(li.where(~rf1))
    t.merge_into(li.where(rf1))  # RF1: late-arriving order batch
    rf2 = li.where(F.col("l_orderkey") % 13 == 5).withColumn(
        "_change_type", F.lit("delete")
    )
    t.apply_changes(rf2)  # RF2: aged-out order batch
    out = (
        t.read(spark)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .localCheckpoint(eager=True)
    )
    return out


_DQ_RULES = {
    "totalprice_positive": "o_totalprice > 0",
    "totalprice_under_cap": "o_totalprice <= 300000",
    "orderdate_before_2000": "o_orderdate < TIMESTAMP '2000-01-01'",
    "priority_known": (
        "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
        "'4-NOT SPECIFIED','5-LOW')"
    ),
    "custkey_resolves": "__cust_hit = 1",
}
_DQ_CASES_SQL = {
    "totalprice_positive": "o_totalprice > 0",
    "totalprice_under_cap": "o_totalprice <= 300000",
    "orderdate_before_2000": "o_orderdate < TIMESTAMP '2000-01-01'",
    "priority_known": (
        "o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM',"
        "'4-NOT SPECIFIED','5-LOW')"
    ),
    "custkey_resolves": (
        "o_custkey IN (SELECT c_custkey FROM customer)"
    ),
}


def _dq_flagged_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with the referential flag precomputed (broadcast left
    join against distinct customer keys) so the rule set stays
    single-scan SQL booleans."""
    o = load_table(spark, "orders", sf_dir)
    c = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("__ck"))
        .distinct()
        .withColumn("__cust_hit", F.lit(1))
    )
    return o.join(
        F.broadcast(c), o.o_custkey == F.col("__ck"), "left"
    ).drop("__ck")


@query(
    "dq_expectations_orders",
    oracle="""
SELECT r.rule,
       (SELECT count(*) FROM orders) AS n_rows,
       r.v AS n_violations,
       round(r.v / (SELECT CAST(count(*) AS DOUBLE) FROM orders), 6)
         AS violation_frac
FROM (
"""
    + "\nUNION ALL\n".join(
        f"""  SELECT '{name}' AS rule,
         (SELECT count(*) FROM orders
          WHERE NOT coalesce(({sql}), FALSE)) AS v"""
        for name, sql in _DQ_CASES_SQL.items()
    )
    + """
) r
""",
    description="declarative data-quality expectations (Delta Live "
    "Tables expect/Great Expectations contract reduced to core): named "
    "SQL boolean rules — range, domain, recency, and a broadcast "
    "referential check — evaluated in ONE scan as a single aggregate "
    "row exploded to the per-rule violations report; unknown (null) "
    "never passes a gate",
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import expectations_report

    return expectations_report(
        _dq_flagged_orders(spark, sf_dir), _DQ_RULES
    )


@query(
    "dq_quarantine_orders",
    oracle="""
WITH f AS (
  SELECT o.*,
"""
    + ",\n".join(
        f"         coalesce(({sql}), FALSE) AS ok_{i}"
        for i, sql in enumerate(_DQ_CASES_SQL.values())
    )
    + """
  FROM orders o
),
v AS (
  SELECT list_aggr(list_sort(list_filter(["""
    + ", ".join(
        f"CASE WHEN NOT ok_{i} THEN '{name}' END"
        for i, name in enumerate(_DQ_CASES_SQL)
    )
    + """], x -> x IS NOT NULL)), 'string_agg', ',') AS violated
  FROM f
  WHERE """
    + " OR ".join(f"NOT ok_{i}" for i in range(len(_DQ_CASES_SQL)))
    + """
)
SELECT violated, count(*) AS n_rows
FROM v GROUP BY violated
""",
    description="quarantine split for the same expectation set: failing "
    "rows land in a dead-letter frame carrying the sorted violated-rule "
    "array (self-describing), grouped here into the per-violation-"
    "signature census; passing/failing are projections of one flagged "
    "frame — no shuffle beyond the census aggregate",
)
def dq_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import quarantine

    _, bad = quarantine(_dq_flagged_orders(spark, sf_dir), _DQ_RULES)
    return (
        bad.select(F.concat_ws(",", "violated").alias("violated"))
        .groupBy("violated")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_KMV_G_K = 64


@query(
    "sketch_kmv_by_source",
    oracle=f"""
WITH sk AS (SELECT grp, h, h / 18446744073709551616.0 + 0.5 AS u
            FROM {export_sql('kmv_src')}),
agg AS (SELECT grp, count(*) AS n, max(u) AS uk FROM sk GROUP BY grp),
ex AS (SELECT source AS grp,
              CAST(count(DISTINCT n_chars) AS BIGINT) AS exact
       FROM documents GROUP BY source)
SELECT agg.grp AS source,
       round(CASE WHEN agg.n < {_KMV_G_K} THEN CAST(agg.n AS DOUBLE)
                  ELSE {_KMV_G_K - 1}.0 / agg.uk END, 6) AS n_distinct_est,
       ex.exact,
       abs(round(CASE WHEN agg.n < {_KMV_G_K} THEN CAST(agg.n AS DOUBLE)
                      ELSE {_KMV_G_K - 1}.0 / agg.uk END, 6) - ex.exact)
         <= 0.4 * ex.exact AS within_bound
FROM agg JOIN ex USING (grp)
""",
    description="per-group KMV distinct sketches (the profiling shape: "
    "one sketch per ingest source, merged corpus-wide by the lossless "
    "union): grouped k-smallest cap over one map-combined distinct "
    "shuffle, O(k) rows per group exported; DuckDB re-normalizes the "
    "hashes, re-derives each group's estimate, and certifies it "
    "against the exact per-source distinct count",
)
def sketch_kmv_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.profile import kmv_estimate, kmv_sketch

    docs = load_table(spark, "documents", sf_dir)
    sk = export_table(
        kmv_sketch(docs, "n_chars", k=_KMV_G_K, by="source"), "kmv_src"
    )
    est = kmv_estimate(sk, k=_KMV_G_K, by=True)
    exact = docs.groupBy(F.col("source").alias("grp")).agg(
        F.count_distinct("n_chars").alias("exact")
    )
    return est.join(exact, "grp").select(
        F.col("grp").alias("source"),
        "n_distinct_est",
        "exact",
        (
            F.abs(F.col("n_distinct_est") - F.col("exact"))
            <= 0.4 * F.col("exact")
        ).alias("within_bound"),
    )


@query(
    "sketch_hll_report",
    oracle=f"""
WITH regs AS (SELECT grp, reg, rho FROM {export_sql('hll_regs_src')}),
per AS (
  SELECT grp AS scope, CAST(count(*) AS BIGINT) AS n_registers,
         sum(1.0 / (1::BIGINT << rho)) AS z
  FROM regs GROUP BY grp
),
mrg AS (SELECT reg, max(rho) AS rho FROM regs GROUP BY reg),
tot AS (
  SELECT 'ALL' AS scope, CAST(count(*) AS BIGINT) AS n_registers,
         sum(1.0 / (1::BIGINT << rho)) AS z
  FROM mrg
),
est AS (
  SELECT scope, n_registers,
         {_hll_est_sql(f'({1 << _HLL_P} - n_registers)', 'z')}
           AS n_distinct_est
  FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
),
ex AS (
  SELECT source AS scope,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_exact
  FROM documents GROUP BY source
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT doc_id) AS BIGINT) FROM documents
)
SELECT est.scope, est.n_registers, est.n_distinct_est,
       ex.n_distinct_exact,
       round(abs(est.n_distinct_est - ex.n_distinct_exact)
             / ex.n_distinct_exact, 6) AS rel_err
FROM est JOIN ex USING (scope)
""",
    description="grouped HLL distinct-sketch report with a lossless "
    "max-merge rollup (the KMV/theta family's HLL sibling, Flajolet "
    "2007): register state is PLAIN ROWS (grp, reg, rho) — one "
    "map-combined exchange, O(groups x 2^p) state, exportable and "
    "O(delta)-mergeable — rho derived by exact integer bit arithmetic "
    "(length(bin(w)), never float log2) and capped at 52-p so the "
    "register sum is order- and engine-independent; DuckDB re-derives "
    "every per-source estimate AND the max-merged corpus-wide estimate "
    "from the exported registers and certifies both against exact "
    "distinct counts",
)
def sketch_hll_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.profile import hll_estimate, hll_registers

    docs = load_table(spark, "documents", sf_dir)
    regs = export_table(
        hll_registers(docs, "doc_id", p=_HLL_P, by="source"), "hll_regs_src"
    )
    per = hll_estimate(regs, p=_HLL_P, by=True).select(
        F.col("grp").alias("scope"), "n_registers", "n_distinct_est"
    )
    merged = regs.groupBy("reg").agg(F.max("rho").alias("rho"))
    tot = hll_estimate(merged, p=_HLL_P, by=False).select(
        F.lit("ALL").alias("scope"), "n_registers", "n_distinct_est"
    )
    exact = (
        docs.groupBy(F.col("source").alias("scope"))
        .agg(F.count_distinct("doc_id").alias("n_distinct_exact"))
        .unionByName(
            docs.agg(
                F.count_distinct("doc_id").alias("n_distinct_exact")
            ).select(F.lit("ALL").alias("scope"), "n_distinct_exact")
        )
    )
    return (
        per.unionByName(tot)
        .join(exact, "scope")
        .select(
            "scope",
            "n_registers",
            "n_distinct_est",
            "n_distinct_exact",
            F.round(
                F.abs(F.col("n_distinct_est") - F.col("n_distinct_exact"))
                / F.col("n_distinct_exact"),
                6,
            ).alias("rel_err"),
        )
    )


@query(
    "manifest_time_travel",
    # content is the whole contract: every committed version stays a
    # reproducible snapshot, so reading v0/v1/v2 AFTER later commits
    # must equal the plain set algebra of the three states over the raw
    # fixture (the oracle re-derives all three) — version immutability
    # mechanics are pinned in tests/test_lakehouse.py
    oracle="""
WITH v0 AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
u AS (
  SELECT doc_id, n_chars + 1000 AS n_chars FROM documents
  WHERE doc_id % 3 = 0 AND doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 1
),
v1 AS (
  SELECT * FROM u
  UNION ALL
  SELECT * FROM v0 WHERE doc_id NOT IN (SELECT doc_id FROM u)
),
v2 AS (SELECT * FROM v1 WHERE doc_id % 7 <> 0)
SELECT CAST(0 AS INTEGER) AS version, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM v0
UNION ALL
SELECT CAST(1 AS INTEGER), count(*), CAST(sum(n_chars) AS BIGINT) FROM v1
UNION ALL
SELECT CAST(2 AS INTEGER), count(*), CAST(sum(n_chars) AS BIGINT) FROM v2
""",
    description="time travel over the commit log (Delta's VERSION AS OF "
    "reduced to core): bootstrap v0, an upsert+insert MERGE commits v1, "
    "a delete-expressing overwrite commits v2 — then ALL THREE versions "
    "are read back concurrently from their immutable manifests (data "
    "dirs are never rewritten, a version pin is just a different "
    "manifest file, zero storage copied) and aggregated side by side",
)
def manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint'd result, same driver-
    # robustness rationale as manifest_zorder_range_read
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="time_travel_")
    t = ManifestLakeTable(root, keys=["doc_id"], n_buckets=8)
    t.overwrite(docs.where(F.col("doc_id") % 3 == 0))
    upserts = docs.where(
        (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)
    ).withColumn("n_chars", F.col("n_chars") + 1000)
    inserts = docs.where(F.col("doc_id") % 3 == 1)
    t.merge_into(upserts.unionByName(inserts))
    t.overwrite(t.read(spark, 1).where(F.col("doc_id") % 7 != 0))
    snaps = [
        t.read(spark, v)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(F.lit(v).alias("version"), "n_docs", "sum_chars")
        for v in (0, 1, 2)
    ]
    out = snaps[0].unionByName(snaps[1]).unionByName(snaps[2])
    return out.localCheckpoint(eager=True)


@query(
    "manifest_vacuum_read",
    # content is the whole contract: after three commits and a
    # keep-1 vacuum, the CURRENT version must still read exactly the
    # final state (vacuum may only ever remove unreferenced history) —
    # the retention mechanics (protected versions, lock requirement,
    # orphan invisibility) are pinned in tests/test_lakehouse.py
    oracle="""
WITH final AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, n_chars + 500 FROM documents WHERE doc_id % 2 = 1
)
SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       count(DISTINCT doc_id) AS n_keys
FROM final
""",
    description="VACUUM retention (Delta's VACUUM reduced to core): "
    "bootstrap + two MERGE commits build history, vacuum(keep=1) drops "
    "every data dir no retained manifest references — O(history) "
    "metadata work, zero data reads — and the current version still "
    "reads byte-identically; the storage-reclaim op a 100 TB table "
    "needs because every MERGE strands prior bucket versions",
)
def manifest_vacuum_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint'd result, same driver-
    # robustness rationale as manifest_zorder_range_read
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="vacuum_docs_")
    t = ManifestLakeTable(root, keys=["doc_id"], n_buckets=8)
    t.overwrite(docs.where(F.col("doc_id") % 3 == 0))
    t.merge_into(docs)  # full upsert: history now has 2 versions
    t.merge_into(
        docs.where(F.col("doc_id") % 2 == 1).withColumn(
            "n_chars", F.col("n_chars") + 500
        )
    )
    t.vacuum(keep=1)
    return (
        t.read(spark)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.count_distinct("doc_id").alias("n_keys"),
        )
        .localCheckpoint(eager=True)
    )


@query(
    "manifest_shallow_clone",
    # content is the whole contract: the clone reads the source's
    # snapshot without copying a byte, then diverges copy-on-write —
    # so (source after its own later merge) and (clone after ITS merge)
    # must equal two independent set-algebra states over the fixture;
    # zero-copy + isolation mechanics are pinned in tests/test_lakehouse
    oracle="""
WITH base AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0 THEN n_chars + 111 ELSE n_chars END
           AS n_chars
  FROM base
),
cl AS (
  SELECT doc_id, n_chars + 999 AS n_chars FROM documents
  WHERE doc_id % 4 = 1
  UNION ALL
  SELECT doc_id, n_chars FROM base WHERE doc_id % 4 <> 1
)
SELECT 'source' AS side, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM src
UNION ALL
SELECT 'clone', count(*), CAST(sum(n_chars) AS BIGINT) FROM cl
""",
    description="SHALLOW CLONE (Delta's CREATE TABLE ... SHALLOW CLONE "
    "reduced to core): the clone's commit references the source's data "
    "dirs by absolute path — zero bytes copied, O(buckets) metadata — "
    "then diverges copy-on-write: the clone's MERGE writes only under "
    "the clone's root, the source's own later MERGE writes only new "
    "version dirs, and both read their independent states; the "
    "dev/test-against-production-data primitive at 100 TB",
)
def manifest_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-unique scratch + localCheckpoint'd result, same driver-
    # robustness rationale as manifest_zorder_range_read
    import os
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable, shallow_clone

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    scratch = tempfile.mkdtemp(prefix="shallow_clone_")
    src = ManifestLakeTable(
        os.path.join(scratch, "src"), keys=["doc_id"], n_buckets=8
    )
    src.overwrite(docs.where(F.col("doc_id") % 2 == 0))
    clone = shallow_clone(src, os.path.join(scratch, "clone"))
    # diverge BOTH sides after the clone point
    src.merge_into(
        docs.where(F.col("doc_id") % 6 == 0).withColumn(
            "n_chars", F.col("n_chars") + 111
        )
    )
    clone.merge_into(
        docs.where(F.col("doc_id") % 4 == 1).withColumn(
            "n_chars", F.col("n_chars") + 999
        )
    )
    sides = [
        src.read(spark)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(F.lit("source").alias("side"), "n_docs", "sum_chars"),
        clone.read(spark)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(F.lit("clone").alias("side"), "n_docs", "sum_chars"),
    ]
    return sides[0].unionByName(sides[1]).localCheckpoint(eager=True)


@query(
    "manifest_zone_report",
    # the (doc_id, bucket) assignment is exported; the oracle re-derives
    # every bucket's TRUE min/max/count from the export joined to the
    # raw fixture and recomputes the pairwise overlap degree — value
    # equality therefore certifies that the manifest's zone maps
    # describe the bytes on disk exactly (the property read_range
    # pruning depends on), not merely that a report was produced
    oracle=f"""
WITH assign AS (SELECT * FROM {{EXPORT}}),
r AS (
  SELECT a.bucket,
         min(d.n_chars) AS lo, max(d.n_chars) AS hi,
         count(*) AS n_rows
  FROM assign a JOIN documents d USING (doc_id)
  GROUP BY a.bucket
)
SELECT x.bucket, x.lo, x.hi, x.n_rows,
       (SELECT count(*) FROM r y
        WHERE y.bucket <> x.bucket
          AND NOT (y.hi < x.lo OR y.lo > x.hi)) AS n_overlapping
FROM r x
""".replace("{EXPORT}", export_sql("zone_report_assign")),
    description="zone-map observability report over a ZORDER-clustered "
    "table: per-bucket [min, max] straight from the committed manifest "
    "+ pairwise range-overlap degree (the clustering-quality metric — "
    "hash layout overlaps everywhere, zorder approaches disjoint "
    "slices); the oracle re-derives the true ranges from the exported "
    "bucket assignment, so a hash match CERTIFIES the zone maps "
    "describe the bytes read_range prunes by",
)
def manifest_zone_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..exports import export_table
    from ..sources.lakehouse import ManifestLakeTable

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    root = tempfile.mkdtemp(prefix="zone_report_")
    t = ManifestLakeTable(
        root, keys=["doc_id"], n_buckets=16, stats_cols=["n_chars"]
    )
    t.overwrite(docs)
    t.optimize_zorder(spark, ["n_chars"])
    assign = t.read(spark).select(
        "doc_id",
        F.regexp_extract(
            F.input_file_name(), r"/b([0-9]+)_v[0-9]+/[^/]*$", 1
        )
        .cast("int")
        .alias("bucket"),
    )
    exported = export_table(assign, "zone_report_assign")
    counts = exported.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    st = t.stats()
    ranges = spark.createDataFrame(
        [
            (int(b), int(s["n_chars"][0]), int(s["n_chars"][1]))
            for b, s in sorted(st.items())
        ],
        "bucket int, lo bigint, hi bigint",
    )
    other = ranges.select(
        F.col("bucket").alias("__ob"),
        F.col("lo").alias("__olo"),
        F.col("hi").alias("__ohi"),
    )
    overlap = (
        ranges.join(
            F.broadcast(other),
            (F.col("bucket") != F.col("__ob"))
            & ~((F.col("__ohi") < F.col("lo")) | (F.col("__olo") > F.col("hi"))),
            "left",
        )
        .groupBy("bucket", "lo", "hi")
        .agg(
            F.count("__ob").alias("n_overlapping")
        )
    )
    return (
        overlap.join(F.broadcast(counts), "bucket")
        .select("bucket", "lo", "hi", "n_rows", "n_overlapping")
        .localCheckpoint(eager=True)
    )


_NEYMAN_BUDGET = 1000


@query(
    "curation_neyman_allocation",
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sx,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
  FROM documents GROUP BY 1
),
v AS (
  SELECT source, n_docs,
         sqrt(greatest((CAST(sx2 AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx / n_docs)
                       / (n_docs - 1), 0.0)) AS sd
  FROM s WHERE n_docs > 1
),
t AS (SELECT sum(n_docs * sd) AS tw FROM v)
SELECT source, n_docs,
       round(sd, 6) AS sd_chars,
       round(n_docs * sd / tw, 6) AS alloc_share,
       round({_NEYMAN_BUDGET} * (n_docs * sd) / tw, 4) AS alloc_docs
FROM v CROSS JOIN t
""",
    description="Neyman allocation of a {budget}-doc sampling budget "
    "across sources: n_h x S_h proportional (the variance-optimal "
    "stratified design — oversample heterogeneous strata, not big "
    "ones); the stratum SD comes from EXACT integer sums (sum x, "
    "sum x^2 are BIGINTs, so both engines take sqrt of the identical "
    "rational) — one map-combined exchange, a 1-row total broadcast "
    "back; the design readout a curation sampler consumes before "
    "drawing (pairs with sample_stratified_lang / "
    "sampling_effective_size)".format(budget=_NEYMAN_BUDGET),
)
def curation_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    x = F.col("n_chars")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sx2"),
    )
    var = (
        F.col("__sx2").cast("double")
        - F.col("__sx").cast("double") * F.col("__sx") / F.col("n_docs")
    ) / (F.col("n_docs") - 1)
    v = s.where(F.col("n_docs") > 1).select(
        "source",
        "n_docs",
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("__sd"),
    )
    t = v.agg(F.sum(F.col("n_docs") * F.col("__sd")).alias("__tw"))
    return v.join(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round("__sd", 6).alias("sd_chars"),
        F.round(
            F.col("n_docs") * F.col("__sd") / F.col("__tw"), 6
        ).alias("alloc_share"),
        F.round(
            F.lit(_NEYMAN_BUDGET)
            * (F.col("n_docs") * F.col("__sd"))
            / F.col("__tw"),
            4,
        ).alias("alloc_docs"),
    )


# streaming DQ monitor rules (events): accepted-values on event_type
# (the contract excludes 'error' — telemetry, not business events) and
# null business value on purchases
_SDQ_ACCEPTED = ("view", "click", "purchase", "signup")


def _sdq_counters(batch_df: DataFrame) -> DataFrame:
    at = F.when(
        F.col("event_type").isin(list(_SDQ_ACCEPTED)), 0
    ).otherwise(1)
    nv = (
        (F.col("event_type") == "purchase") & F.col("value").isNull()
    ).cast("long")
    a = batch_df.agg(
        F.lit("event_type_accepted").alias("rule"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(at).alias("n_violations"),
    )
    b = batch_df.agg(
        F.lit("purchase_value_not_null").alias("rule"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_rows"
        ),
        F.sum(nv).alias("n_violations"),
    )
    return a.unionByName(b)


@query(
    "stream_dq_ingest",
    # the streamed ADDITIVE counters, drained over arbitrary micro-batch
    # boundaries with txn-watermarked exactly-once, must equal the batch
    # audit of the full corpus — so the oracle IS the batch audit over
    # the raw fixture, the strongest possible check
    oracle=f"""
SELECT 'event_type_accepted' AS rule,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN event_type IN
                ({", ".join(f"'{v}'" for v in _SDQ_ACCEPTED)})
                THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
       round(CAST(sum(CASE WHEN event_type IN
                  ({", ".join(f"'{v}'" for v in _SDQ_ACCEPTED)})
                  THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6)
         AS violation_share
FROM events
UNION ALL
SELECT 'purchase_value_not_null',
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(sum(CASE WHEN event_type = 'purchase' AND value IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       round(CAST(sum(CASE WHEN event_type = 'purchase'
                       AND value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
             6)
FROM events
""",
    description="streaming DQ monitor: per micro-batch the accepted-"
    "values and null-value violation counters ADD into a versioned "
    "manifest table — counters are additive (NOT idempotent like HLL "
    "register max), so exactly-once rides the txnAppId/txnVersion "
    "watermark inside the same atomic commit that publishes the "
    "totals; per batch the work is the batch's own 2-rule aggregate "
    "plus an O(rules) read-add-overwrite, state never grows with the "
    "corpus; the drained state must equal the batch audit of the full "
    "corpus regardless of batch boundaries — the oracle IS that audit "
    "(streaming/lake_ingest.py:stream_counter_merge)",
)
def stream_dq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.lakehouse import ManifestLakeTable
    from ..streaming.lake_ingest import stream_counter_merge

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="stream_dq_")
    inbox = os.path.join(scratch, "inbox")
    root = os.path.join(scratch, "counters")
    bootstrap = ev.where(F.col("event_id") % 7 == 0)
    arriving = ev.where(F.col("event_id") % 7 != 0)
    arriving.repartition(4).write.parquet(inbox)
    t = ManifestLakeTable(root, keys=["rule"], n_buckets=2)
    t.overwrite(_sdq_counters(bootstrap))
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    stream_counter_merge(stream, t, _sdq_counters, app_id="stream_dq")
    final = t.read(spark)
    return final.select(
        "rule",
        "n_rows",
        "n_violations",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_rows"), 6
        ).alias("violation_share"),
    ).localCheckpoint(eager=True)


@query(
    "curation_split_balance_chi2",
    # chi2 via the full-table identity sum(o^2/e) - N (empty
    # (split, lang) cells keep their mass) and Cramér's V — the same
    # formulas as the stats-family entries, applied to the split audit
    oracle=f"""
WITH s AS (
  SELECT lang,
         CASE WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'train'
              WHEN {_SPLIT_BUCKET_SQL} < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
c AS (SELECT split AS va, lang AS vb, count(*) AS n_obs
      FROM s WHERE split IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2),
rm AS (SELECT va, CAST(sum(n_obs) AS BIGINT) AS rt FROM c GROUP BY 1),
cm AS (SELECT vb, CAST(sum(n_obs) AS BIGINT) AS ct FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n,
             count(DISTINCT va) AS ka, count(DISTINCT vb) AS kb FROM c),
x AS (
  SELECT sum(CAST(n_obs AS DOUBLE) * n_obs
             / (CAST(rt * ct AS DOUBLE) / t.n)) - max(t.n) AS chi2
  FROM c JOIN rm USING (va) JOIN cm USING (vb) CROSS JOIN t
)
SELECT 'split_x_lang' AS pair, t.n,
       CAST(t.ka AS INTEGER) AS ka, CAST(t.kb AS INTEGER) AS kb,
       round(x.chi2, 6) AS chi2,
       round(sqrt(x.chi2 / (t.n * CAST(least(t.ka - 1, t.kb - 1)
                                       AS DOUBLE))), 6) AS cramers_v
FROM t CROSS JOIN x
""",
    description="split-balance audit: chi-squared independence + "
    "Cramér's V between the deterministic train/val/test assignment "
    "and language — a content-hash split SHOULD be independent of "
    "every label (V near 0); a nonzero V here means the eval split is "
    "linguistically skewed and downstream eval numbers are biased; "
    "reuses the split assigner and the full-table-identity association "
    "engine (operators/curation.py:assign_split, "
    "operators/stats.py:cramers_v)",
)
def curation_split_balance_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.curation import assign_split
    from ..operators.stats import cramers_v

    docs = load_table(spark, "documents", sf_dir)
    return cramers_v(assign_split(docs), "split", "lang", "split_x_lang")


_EXACT_K = 25
_EXACT_K_SALT = "r11s1:"


@query(
    "sample_exact_k_per_group",
    oracle=f"""
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{_EXACT_K_SALT}' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS rk
  FROM documents
)
SELECT lang, doc_id, CAST(rk AS INTEGER) AS draw_rank
FROM r WHERE rk <= {_EXACT_K}
""",
    description="exact-k-per-group uniform sample without replacement: "
    "rank every doc inside its language by a salted md5 of its id (a "
    "hash both engines compute bit-identically — no exported state "
    "needed) and keep the first k — the deterministic, re-runnable "
    "analogue of ORDER BY random() LIMIT k per group that data-card "
    "spot-check samples and labeling batches need; the plan is "
    "TWO-PHASE top-k (per-partition local rank keyed on "
    "(spark_partition_id, lang) prunes to k rows per partition, then a "
    "global per-lang rank over the <= k * n_partitions survivors) so a "
    "low-cardinality group key never serializes a full sort onto one "
    "task — the same scale posture as the SNM distributed rank "
    "(operators/linkage.py)",
)
def sample_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).select("lang", "doc_id")
    key = F.md5(
        F.concat(F.lit(_EXACT_K_SALT), F.col("doc_id").cast("string"))
    )
    local = (
        docs.withColumn("__pid", F.spark_partition_id())
        .withColumn("__key", key)
        .withColumn(
            "__lrk",
            F.row_number().over(
                W.partitionBy("__pid", "lang").orderBy("__key", "doc_id")
            ),
        )
        .where(F.col("__lrk") <= _EXACT_K)
    )
    return (
        local.withColumn(
            "draw_rank",
            F.row_number()
            .over(W.partitionBy("lang").orderBy("__key", "doc_id"))
            .cast("int"),
        )
        .where(F.col("draw_rank") <= _EXACT_K)
        .select("lang", "doc_id", "draw_rank")
    )


_KANON_K = 5

_KANON_SQL = f"""
SELECT c.c_nationkey,
       c.c_mktsegment,
       CAST(floor(c.c_acctbal / 1000.0) AS INTEGER) AS bal_band,
       CAST(count(DISTINCT c.c_custkey) AS INTEGER) AS k_anonymity,
       CAST(count(DISTINCT o.o_orderpriority) AS INTEGER) AS l_diversity,
       (count(DISTINCT c.c_custkey) < {_KANON_K}
        OR count(DISTINCT o.o_orderpriority) < 2) AS suppress
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2, 3
"""


@query(
    "privacy_k_anonymity",
    oracle=_KANON_SQL,
    description="k-anonymity / l-diversity audit over the "
    "quasi-identifier (nation, market segment, account-balance "
    "thousand-band): the anonymity-set size k of every QI cell, the "
    "diversity l of the sensitive order-priority attribute inside it, "
    "and the suppression flag (k < 5 or l < 2) a privacy-preserving "
    "release would apply — the release-side complement to "
    "curation_redact_pii's content-side scrubbing, the audit a "
    "training-data pipeline runs before publishing per-cohort "
    "statistics; one join + one aggregation (both distinct-counts "
    "ride the same shuffle), no per-cell anything",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderpriority"
    )
    j = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left"
    )
    k = F.count_distinct(F.col("c_custkey"))
    ldiv = F.count_distinct(F.col("o_orderpriority"))
    return j.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        k.cast("int").alias("k_anonymity"),
        ldiv.cast("int").alias("l_diversity"),
        ((k < _KANON_K) | (ldiv < 2)).alias("suppress"),
    )
