"""Similarity-search queries over ``embeddings`` (array<float>).

Brute-force cosine top-k is the exact, oracle-checked baseline (DuckDB
mirrors the identical sequential-fold arithmetic); the LSH variant is the
scale path (bucketed candidates, no corpus-wide compare) and gets the
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exports import export_sql
from ..operators.similarity import brute_force_topk, dot, l2_norm, lsh_topk
from .registry import query

# deterministic small query set: the first 5 vectors
_NQUERY = 5
_K = 10

_COS_SQL = (
    "list_dot_product(q.e, c.e) / "
    "(sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))"
)


@query(
    "similarity_cosine_topk",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id < {_NQUERY})
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       round({_COS_SQL}, 6) AS cos_sim
FROM q JOIN c ON q.vec_id <> c.vec_id
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY round({_COS_SQL}, 6) DESC, neighbor_id) <= {_K}
""",
    description="brute-force cosine top-k ANN baseline (broadcast query set)",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    return brute_force_topk(emb, queries, k=_K)


@query(
    "similarity_lsh_topk",
    # the hyperplane derivation is xxhash64 (no SQL mirror), but the
    # (id, sig) index is exported: DuckDB re-runs the bucket equi-join,
    # exact fold cosine, and top-k ranking from it — hash-checked
    oracle=f"""
WITH s AS (SELECT * FROM {export_sql('similarity_lsh_sigs')}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (
  SELECT q.id AS query_id, s2.id AS neighbor_id
  FROM s q JOIN s s2 ON q.sig = s2.sig AND q.id <> s2.id
  WHERE q.id < {_NQUERY}
)
SELECT cand.query_id, cand.neighbor_id,
       round(list_dot_product(qc.e, cc.e) /
             (sqrt(list_dot_product(qc.e, qc.e)) *
              sqrt(list_dot_product(cc.e, cc.e))), 6) AS cos_sim
FROM cand JOIN c qc ON qc.vec_id = cand.query_id
          JOIN c cc ON cc.vec_id = cand.neighbor_id
QUALIFY row_number() OVER (
  PARTITION BY cand.query_id
  ORDER BY cos_sim DESC, cand.neighbor_id) <= {_K}
""",
    description="LSH-bucketed approximate cosine top-k (the 100 TB "
    "path); hash-checked via the exported signature index",
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import hyperplane_sig_table

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    sigs = export_table(hyperplane_sig_table(emb, planes=8), "similarity_lsh_sigs")
    return lsh_topk(
        emb,
        queries,
        k=_K,
        planes=8,
        corpus_sigs=sigs,
        query_sigs=sigs.where(F.col("id") < _NQUERY),
    )


@query(
    "embedding_neardup_cosine",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.4
""",
    description="embedding near-dup: exact cosine-threshold pairs "
    "(threshold 0.4 sits inside the fixture's similarity range — max "
    "pairwise cosine is ~0.6, so a production-style 0.99 cut would make "
    "the oracle vacuously empty; similarity_lsh_topk is the bucketed "
    "scale path)",
)
def embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norms once per row before the pair join (association identical to
    # the inline form the oracle mirrors) — one fold per pair, not three
    emb = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("e")
    )
    emb = emb.withColumn("n", l2_norm(F.col("e")))
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.4)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


@query(
    "similarity_ml_minhash_pairs",
    # the model's fitted MinHash coefficients can't be re-derived in
    # SQL, but the per-doc hash values and the HashingTF nonzero index
    # sets are exported: a candidate is any pair agreeing on >= 1 of the
    # 8 hash values (exactly approxSimilarityJoin's OR-amplified join),
    # and the jaccard distance is recomputed from the index sets with
    # the same 1 - |A∩B|/|A∪B| expression ML's keyDistance uses —
    # hash-checked end to end
    oracle=f"""
WITH t AS (SELECT * FROM {export_sql('ml_minhash_tables')}),
-- candidate generation as an EQUI-join on (hash-table index, value):
-- identical semantics to "agree on >= 1 of the 8 hashes" (the
-- OR-amplified approxSimilarityJoin), but O(collisions) instead of the
-- all-pairs O(n^2) filter that blew the sweep budget at sf0.1
e AS (
  SELECT doc_id, u.i AS hi, hs[u.i] AS hv
  FROM t CROSS JOIN unnest(generate_series(1, len(hs))) AS u(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM e a JOIN e b ON a.hi = b.hi AND a.hv = b.hv
                   AND a.doc_id < b.doc_id
),
d AS (
  SELECT id_a, id_b,
         1 - CAST(len(list_intersect(ta.idx, tb.idx)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(ta.idx, tb.idx)))
                    AS DOUBLE) AS jd
  FROM cand
  JOIN t ta ON ta.doc_id = id_a
  JOIN t tb ON tb.doc_id = id_b
)
SELECT id_a, id_b, round(1 - jd, 6) AS jaccard FROM d WHERE jd < 0.5
""",
    description="pyspark.ml MinHashLSH similarity join (library-backed "
    "variant); hash-checked via the exported hash tables + token-index "
    "sets (HashingTF's murmur3-seed-42 indexing is replicated exactly "
    "by F.hash, so the exported index sets are the vectors' nonzero "
    "set); the parity pin runs on a FIXED 500-doc slice — the library "
    "join is OR-amplified with no band/cap control, quadratic on this "
    "mutually-similar synthetic corpus (8.6M qualifying pairs at "
    "sf0.1, VERDICT r11 item 3), and a parity check needs a shared "
    "input, not scale; dedup_minhash_lsh is the banded+capped scale "
    "path",
)
def similarity_ml_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library-backed near-dup path: ml.feature HashingTF + MinHashLSH
    approxSimilarityJoin over document token sets — the off-the-shelf
    alternative to operators/dedup.py's hand-built banding (SURVEY §7.2).

    Deliberately fixed-size: the slice is the 500 SMALLEST doc_ids —
    the whole corpus at sf<=0.01 (results there are unchanged) and a
    deterministic slice at sf0.1+, keeping the LIBRARY path — whose
    OR-amplified candidate join has no hot-bucket cap — inside the
    sweep budget at every SF. Derived from the data rather than a
    ``doc_id < 500`` literal (ADVICE r12): a regenerated corpus with
    offset or hashed ids gets the same-sized slice instead of a
    silently empty parity pin. On the current dense-0-based fixtures
    the two are identical, so hashes are unchanged. The exported index
    table carries the same cut, so the oracle mirrors it with no SQL
    change.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    from ..exports import export_table

    all_docs = load_table(spark, "documents", sf_dir)
    slice_ids = all_docs.select("doc_id").orderBy("doc_id").limit(500)
    docs = all_docs.join(F.broadcast(slice_ids), "doc_id", "left_semi")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    feats = tf.transform(toks)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feats)
    # exported oracle index: the 8 min-hash values per doc (each hash
    # table emits a 1-element vector) + the distinct HashingTF feature
    # indices (Catalyst's F.hash IS HashingTF's murmur3(seed=42); pmod
    # mirrors its nonNegativeMod)
    export_table(
        model.transform(feats).select(
            "doc_id",
            F.array(
                *[
                    vector_to_array(F.col("hashes")[i]).getItem(0).cast("long")
                    for i in range(8)
                ]
            ).alias("hs"),
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        "tokens", lambda t: F.pmod(F.hash(t), F.lit(1 << 16))
                    )
                )
            ).alias("idx"),
        ),
        "ml_minhash_tables",
    )
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


@query(
    "similarity_ml_brp_neighbors",
    # the fitted random projections can't be re-derived in SQL, but the
    # per-vector bucket ids (floor(proj/bucketLength), one per hash
    # table) are exported: candidates agree on >= 1 bucket, distances
    # are exact euclidean over the raw embeddings (same sequential
    # index-order sum as ML's Vectors.sqdist), ranked on the rounded
    # distance with the neighbor-id tiebreak — hash-checked
    oracle=f"""
WITH t AS (SELECT * FROM {export_sql('ml_brp_buckets')}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM t q JOIN t b ON q.vec_id <> b.vec_id
  WHERE q.vec_id < {_NQUERY}
    AND len(list_filter(generate_series(1, len(q.hs)),
                        i -> q.hs[i] = b.hs[i])) > 0
)
SELECT cand.query_id, cand.neighbor_id,
       round(sqrt(list_sum(list_transform(
           generate_series(1, len(qe.e)),
           i -> (qe.e[i] - ce.e[i]) * (qe.e[i] - ce.e[i])))), 6)
         AS euclid_dist
FROM cand JOIN c qe ON qe.vec_id = cand.query_id
          JOIN c ce ON ce.vec_id = cand.neighbor_id
QUALIFY row_number() OVER (PARTITION BY cand.query_id
                           ORDER BY euclid_dist ASC, cand.neighbor_id) <= {_K}
""",
    description="pyspark.ml BucketedRandomProjectionLSH ANN (euclidean); "
    "hash-checked via the exported per-table bucket ids",
)
def similarity_ml_brp_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library-backed ANN: one distributed BucketedRandomProjectionLSH
    ``approxSimilarityJoin`` (all queries vs the corpus, bucket-joined
    executor-side) + a per-query window top-k. Single plan, no
    ``.collect()`` of query vectors, no driver loop — the shape that
    holds when the query set is itself a big DataFrame.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=42,
    )
    model = brp.fit(emb)
    # exported oracle index: each table's bucket id for every vector
    # (floor(projection / bucketLength) — exact in doubles, lossless as
    # a long)
    from ..exports import export_table

    export_table(
        model.transform(emb).select(
            "vec_id",
            F.array(
                *[
                    vector_to_array(F.col("hashes")[i]).getItem(0).cast("long")
                    for i in range(4)
                ]
            ).alias("hs"),
        ),
        "ml_brp_buckets",
    )
    queries = emb.where(F.col("vec_id") < _NQUERY)
    # threshold bounds the candidate set; fixture pairwise distances are
    # well under this, so every true neighbor is a candidate
    joined = model.approxSimilarityJoin(
        queries, emb, threshold=1e6, distCol="distCol"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("euclid_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.where(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("distCol", 6).alias("euclid_dist"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= _K)
        .drop("__rn")
    )


@query(
    "embedding_norms",
    oracle="""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id, label,
       CAST(len(e) AS INTEGER) AS dims,
       round(sqrt(list_dot_product(e, e)), 6) AS l2_norm
FROM c
""",
    description="per-vector L2 norm + dimensionality (array arithmetic surface)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dims"),
        F.round(l2_norm(e), 6).alias("l2_norm"),
    )


@query(
    "embedding_label_stats",
    oracle="""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT label, count(*) AS n_vectors,
       round(avg(sqrt(list_dot_product(e, e))), 6) AS avg_norm,
       round(min(sqrt(list_dot_product(e, e))), 6) AS min_norm,
       round(max(sqrt(list_dot_product(e, e))), 6) AS max_norm
FROM c
GROUP BY label
""",
    description="per-label embedding statistics (agg over vector-derived scalars)",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    e = F.col("embedding").cast("array<double>")
    norm = l2_norm(e)
    return (
        emb.select("label", norm.alias("__n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("__n"), 6).alias("avg_norm"),
            F.round(F.min("__n"), 6).alias("min_norm"),
            F.round(F.max("__n"), 6).alias("max_norm"),
        )
    )


@query(
    "similarity_ivf_topk",
    # the hash-seeded centroids have no SQL mirror, but the (id, cell)
    # assignment and the (query_id, cell) probe table are exported — the
    # candidate set is fully determined by them, so DuckDB re-runs the
    # probe join + exact cosine + ranked cut and must hash-match.
    # Recall@k vs brute force stays pinned in tests/test_similarity_ivf.py
    oracle=f"""
WITH asg AS (SELECT * FROM {export_sql('similarity_ivf_assign')}),
pr AS (SELECT * FROM {export_sql('similarity_ivf_probes')}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (
  SELECT pr.query_id, asg.id AS neighbor_id
  FROM pr JOIN asg USING (cell)
  WHERE pr.query_id <> asg.id
)
SELECT cand.query_id, cand.neighbor_id,
       round(list_dot_product(qc.e, cc.e) /
             (sqrt(list_dot_product(qc.e, qc.e)) *
              sqrt(list_dot_product(cc.e, cc.e))), 6) AS cos_sim
FROM cand JOIN c qc ON qc.vec_id = cand.query_id
          JOIN c cc ON cc.vec_id = cand.neighbor_id
QUALIFY row_number() OVER (
  PARTITION BY cand.query_id
  ORDER BY cos_sim DESC, cand.neighbor_id) <= {_K}
""",
    description="IVF approximate cosine top-k: coarse quantizer with "
    "per-query nprobe cell probing (the large-query-set scale path — no "
    "corpus-wide broadcast compare). Benched at lloyd_iters=0: measured "
    "recall@10 on the fixture is identical with and without one Lloyd "
    "pass (0.78 at nprobe=2, 1.0 at nprobe=4), so the refinement's extra "
    "assign+means round is not worth its bench cost here; callers whose "
    "corpora have real cluster structure opt in via lloyd_iters. "
    "BENCH-NUMBER PROVENANCE (the r6 2.41->3.08 s 'regression', settled "
    "by tools/ab_similarity.py the way ab_prefix_join settled the "
    "prefix-join number): the r6 exports are NOT the cost — isolated "
    "min-of-5 measured 2.85 s WITH exports vs 3.02 s without (the "
    "parquet round trip is repaid by its lineage truncation); the delta "
    "is bench-session context (+0.65 s when the grown r6 HEADLINE "
    "prefix runs first — broadcast/shuffle residue and GC pressure that "
    "clearCache+System.gc between queries does not fully return) plus "
    "cross-session host variance (~±20% between same-code sessions)",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import ivf_assign, ivf_probes, ivf_topk_from

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    # dims is a property of the embedding model (fixture: 64) — passing it
    # skips the one-row probe job
    assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    assign = export_table(assign, "similarity_ivf_assign")
    probes = export_table(
        ivf_probes(queries, cents, nprobe=2), "similarity_ivf_probes"
    )
    return ivf_topk_from(emb, queries, assign, probes, k=_K)


@query(
    "similarity_ivf_recall",
    # the ANN family's accuracy gate, driver-hash-checked: DuckDB
    # re-derives BOTH rankings (IVF candidates from the exported
    # assign/probe tables, ground truth by exact cosine over the
    # fixture) and recomputes recall@k — upgrading the recall number
    # from a test-pinned claim to a hash-verified artifact
    oracle=f"""
WITH asg AS (SELECT * FROM {export_sql('ivf_recall_assign')}),
pr AS (SELECT * FROM {export_sql('ivf_recall_probes')}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (
  SELECT pr.query_id, asg.id AS neighbor_id
  FROM pr JOIN asg USING (cell)
  WHERE pr.query_id <> asg.id
),
ivf AS (
  SELECT cand.query_id, cand.neighbor_id
  FROM cand JOIN c qc ON qc.vec_id = cand.query_id
            JOIN c cc ON cc.vec_id = cand.neighbor_id
  QUALIFY row_number() OVER (
    PARTITION BY cand.query_id
    ORDER BY round(list_dot_product(qc.e, cc.e) /
                   (sqrt(list_dot_product(qc.e, qc.e)) *
                    sqrt(list_dot_product(cc.e, cc.e))), 6) DESC,
             cand.neighbor_id) <= {_K}
),
q AS (SELECT * FROM c WHERE vec_id < {_NQUERY}),
bf AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM q JOIN c ON q.vec_id <> c.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(list_dot_product(q.e, c.e) /
                   (sqrt(list_dot_product(q.e, q.e)) *
                    sqrt(list_dot_product(c.e, c.e))), 6) DESC,
             neighbor_id) <= {_K}
),
nc AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
  FROM cand GROUP BY query_id
),
hits AS (
  SELECT ivf.query_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM ivf JOIN bf USING (query_id, neighbor_id)
  GROUP BY ivf.query_id
)
SELECT nc.query_id, nc.n_candidates,
       coalesce(hits.n_hits, 0) AS n_hits,
       round(coalesce(hits.n_hits, 0) / {float(_K)!r}, 4) AS recall
FROM nc LEFT JOIN hits USING (query_id)
""",
    description="recall@k gate for the IVF index, hash-verified end to "
    "end: per query, the IVF top-k (candidates restricted to the probed "
    "cells — the scale path) is intersected with the exact brute-force "
    "top-k ground truth; the report carries the probed candidate count "
    "(the work bound the index bought) next to the recall it cost. At "
    "100 TB this is the index-quality monitor you run on a sampled "
    "query set after every index rebuild — ground truth costs one "
    "broadcast compare of the SAMPLE, never a corpus cross join",
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import ivf_assign, ivf_probes, ivf_topk_from

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    assign = export_table(assign, "ivf_recall_assign")
    probes = export_table(
        ivf_probes(queries, cents, nprobe=2), "ivf_recall_probes"
    )
    ivf = ivf_topk_from(emb, queries, assign, probes, k=_K).select(
        "query_id", "neighbor_id"
    )
    bf = brute_force_topk(emb, queries, k=_K).select(
        "query_id", "neighbor_id"
    )
    n_cand = (
        probes.join(assign, "cell")
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    hits = (
        ivf.join(bf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        n_cand.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_candidates",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(_K)), 4
            ).alias("recall"),
        )
    )


@query(
    "embedding_neardup_lsh",
    # the multi-table (id, t, sig) index is exported; DuckDB re-runs
    # bucket_cap, the any-table collision join, and the exact cosine
    # verify — hash-checked (containment vs the exact pair set stays
    # pinned in tests/test_oracle_parity.py)
    oracle=f"""
WITH bk AS (SELECT * FROM {export_sql('embedding_neardup_banded')}),
hot AS (SELECT t, sig FROM bk GROUP BY t, sig HAVING count(*) > 1000),
bkf AS (SELECT bk.* FROM bk ANTI JOIN hot USING (t, sig)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bkf a JOIN bkf b ON a.t = b.t AND a.sig = b.sig AND a.id < b.id
),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT cand.id_a, cand.id_b,
       round(list_dot_product(x.e, y.e) /
             (sqrt(list_dot_product(x.e, x.e)) *
              sqrt(list_dot_product(y.e, y.e))), 6) AS cos_sim
FROM cand JOIN c x ON x.vec_id = cand.id_a
          JOIN c y ON y.vec_id = cand.id_b
WHERE list_dot_product(x.e, y.e) /
      (sqrt(list_dot_product(x.e, x.e)) *
       sqrt(list_dot_product(y.e, y.e))) >= 0.4
""",
    description="embedding near-dup pairs, multi-table hyperplane LSH "
    "bucketed (the scale path for embedding_neardup_cosine: candidates "
    "collide in >= 1 of 8 signature tables, then verify exactly; recall "
    "-> 1 as similarity rises); hash-checked via the exported index",
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import cosine_neardup_lsh, multitable_sig_table

    emb = load_table(spark, "embeddings", sf_dir)
    banded = export_table(multitable_sig_table(emb), "embedding_neardup_banded")
    # 0.4 sits inside the fixture's similarity range (see
    # embedding_neardup_cosine); production near-dup runs 0.9+
    return cosine_neardup_lsh(emb, threshold=0.4, banded=banded)


@query(
    "embedding_neardup_resolve",
    oracle="""
WITH RECURSIVE c AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM c a JOIN c b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e) /
        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.4
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
SELECT v.vec_id, v.label, coalesce(c2.component, v.vec_id) AS component
FROM embeddings v LEFT JOIN comp c2 ON v.vec_id = c2.id
QUALIFY row_number() OVER (PARTITION BY coalesce(c2.component, v.vec_id)
                           ORDER BY v.vec_id) = 1
""",
    description="SemDeDup-shaped embedding dedup end to end: exact "
    "cosine-threshold pairs -> connected components -> min-id "
    "representative per semantic cluster (singletons survive); the "
    "LSH-bucketed pair path (embedding_neardup_lsh) swaps in as the "
    "candidate generator at 100 TB",
)
def embedding_neardup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import resolve_neardups

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    pre = emb.withColumn("n", l2_norm(F.col("e")))
    a, b = pre.alias("a"), pre.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n"))
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.4)
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
    )
    return resolve_neardups(
        emb.select("vec_id", "label"), pairs, id_col="vec_id"
    )


# shared int8-quantization SQL fragments: symmetric max-abs scale with
# explicit floor(x + 0.5) half-up rounding (round() half-even vs
# half-away differs across engines; floor(x + 0.5) is identical)
_Q8_CTES = """
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
m AS (SELECT vec_id AS id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM c),
q8 AS (SELECT id, e, scale,
              list_transform(e, x -> CASE WHEN scale > 0
                  THEN CAST(floor(x / scale + 0.5) AS BIGINT)
                  ELSE 0 END) AS cd
       FROM m)
"""


@query(
    "embedding_quantize_int8",
    oracle=f"""
WITH {_Q8_CTES}
SELECT id, CAST(len(e) AS INTEGER) AS n_dims, round(scale, 6) AS scale,
       CAST(list_sum(cd) AS BIGINT) AS sum_codes,
       round(list_max(list_transform(
           generate_series(1, len(e)),
           i -> abs(e[i] - CAST(cd[i] AS DOUBLE) * scale))), 6) AS max_abs_err
FROM q8
""",
    description="int8 scalar-quantization audit: per-vector max-abs scale, "
    "code mass, worst reconstruction error (<= scale/2 by construction) — "
    "the go/no-go report before switching the ANN index to 4x-smaller codes",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantize_int8_stats

    emb = load_table(spark, "embeddings", sf_dir)
    return quantize_int8_stats(emb)


_REFINE = 3


@query(
    "similarity_quantized_topk",
    oracle=f"""
WITH {_Q8_CTES},
qs AS (SELECT * FROM q8 WHERE id < {_NQUERY}),
pair AS (
  SELECT qs.id AS query_id, c2.id AS neighbor_id, qs.e AS qe, c2.e AS ce,
         list_dot_product(CAST(qs.cd AS DOUBLE[]), CAST(c2.cd AS DOUBLE[])) AS dab,
         list_dot_product(CAST(qs.cd AS DOUBLE[]), CAST(qs.cd AS DOUBLE[])) AS daa,
         list_dot_product(CAST(c2.cd AS DOUBLE[]), CAST(c2.cd AS DOUBLE[])) AS dbb
  FROM qs JOIN q8 c2 ON qs.id <> c2.id
  WHERE len(list_filter(qs.cd, x -> x <> 0)) > 0
    AND len(list_filter(c2.cd, x -> x <> 0)) > 0
),
short AS (
  SELECT query_id, neighbor_id, qe, ce FROM pair
  QUALIFY row_number() OVER (
    PARTITION BY query_id
    ORDER BY dab / (sqrt(daa) * sqrt(dbb)) DESC, neighbor_id
  ) <= {_REFINE * _K}
)
SELECT query_id, neighbor_id,
       round(list_dot_product(qe, ce) /
             (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))),
             6) AS cos_sim
FROM short
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_sim DESC, neighbor_id) <= {_K}
""",
    description="compressed-index ANN: candidates ranked by the cosine of "
    "int8 codes (scales cancel, so the scan reads 4x-smaller integer codes "
    "and ranking is bit-exact across engines), top refine*k rescored with "
    "exact double cosine — the scan-dominated 100 TB path where the float "
    "column is only read for the shortlist. BENCH-NUMBER PROVENANCE "
    "(commit b522268's '2.6 s' vs BENCH_r06's 3.34 s, measured by "
    "tools/ab_similarity.py): both numbers are real — the controlled "
    "comparison is ISOLATED min-of-reps in one session (the commit's "
    "method; 3.86 s in the A/B session), and running inside the bench "
    "HEADLINE sequence adds ~+0.25-0.7 s of session residue on top; "
    "cross-session host variance between same-code sessions is ~±20%, "
    "larger than either effect, so only same-session A/Bs are compared",
)
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import quantized_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    return quantized_topk(emb, queries, k=_K, refine=_REFINE)


_KMEANS_K = 8


@query(
    "embedding_kmeans_assign",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id AS seed_id, e AS se FROM c ORDER BY vec_id LIMIT {_KMEANS_K}),
d AS (SELECT c.vec_id AS vid, s.seed_id,
             list_dot_product(c.e, c.e)
               - 2.0 * list_dot_product(c.e, s.se)
               + list_dot_product(s.se, s.se) AS sqdist
      FROM c CROSS JOIN s),
a AS (SELECT vid, seed_id, sqdist FROM d
      QUALIFY row_number() OVER (PARTITION BY vid
                                 ORDER BY sqdist, seed_id) = 1)
SELECT seed_id AS cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       round(avg(sqdist), 6) AS avg_sqdist
FROM a GROUP BY seed_id
""",
    description="fixed-centroid k-means assignment report: k lowest-id "
    "seeds broadcast, argmin via a min_by aggregate whose partial completes "
    "map-side (one narrow row per vector shuffled, no Window node), "
    "per-cluster membership + inertia — the cluster-balance / "
    "drift monitor a curation pipeline runs between snapshots",
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_assign_report

    emb = load_table(spark, "embeddings", sf_dir)
    return kmeans_assign_report(emb, k=_KMEANS_K)


_PQ_M, _PQ_K, _PQ_REFINE = 16, 16, 8
_PQ_SD = 4  # 64 dims / 16 subspaces


def _pq_oracle_tail(cb_export: str, cd_export: str, extra_ctes: str, adc_cte: str) -> str:
    """Shared ADC-oracle SQL for the PQ family (same float discipline
    everywhere: 6-dp rounding before ranking, id tiebreaks). The two
    batch entries differ only in their export-table names and the
    candidate restriction, so the LUT/recon/shortlist/rescore tail
    lives in exactly one string — a change to the discipline or the
    ``_PQ_SD`` indexing cannot drift between them."""
    return f"""
WITH cb AS (SELECT * FROM {export_sql(cb_export)}),
cd AS (SELECT * FROM {export_sql(cd_export)}),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < {_NQUERY}),
{extra_ctes}lut AS (
  SELECT q.qid, cb.m, cb.c, sum(q.e[cb.m * {_PQ_SD} + cb.j + 1] * cb.w) AS dot
  FROM q CROSS JOIN cb
  GROUP BY q.qid, cb.m, cb.c
),
nrm AS (SELECT m, c, sum(w * w) AS n2 FROM cb GROUP BY m, c),
recon AS (SELECT cd.id, sum(nrm.n2) AS recon2
          FROM cd JOIN nrm ON nrm.m = cd.m AND nrm.c = cd.code
          GROUP BY cd.id HAVING sum(nrm.n2) > 0),
ql AS (SELECT qid, sqrt(list_dot_product(e, e)) AS ql2
       FROM q WHERE list_dot_product(e, e) > 0),
adc AS ({adc_cte}),
cand AS (SELECT adc.qid AS query_id, adc.id AS neighbor_id,
                round(adot / (ql.ql2 * sqrt(recon.recon2)), 6) AS cos_adc
         FROM adc JOIN recon ON recon.id = adc.id
                  JOIN ql ON ql.qid = adc.qid),
short AS (
  SELECT query_id, neighbor_id FROM cand
  QUALIFY row_number() OVER (
    PARTITION BY query_id ORDER BY cos_adc DESC, neighbor_id
  ) <= {_PQ_REFINE * _K}
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT s.query_id, s.neighbor_id,
       round(list_dot_product(qv.e, cv.e) /
             (sqrt(list_dot_product(qv.e, qv.e)) *
              sqrt(list_dot_product(cv.e, cv.e))), 6) AS cos_sim
FROM short s JOIN v qv ON qv.vec_id = s.query_id
             JOIN v cv ON cv.vec_id = s.neighbor_id
QUALIFY row_number() OVER (
  PARTITION BY s.query_id ORDER BY cos_sim DESC, s.neighbor_id
) <= {_K}
"""


@query(
    "similarity_pq_topk",
    # the learned per-subspace codebooks and the code table are
    # exported; everything downstream of codebook learning — the
    # per-query LUT, reconstruction norms, ADC scores, 6-dp-rounded
    # shortlist ranking, exact rescore, final cut — is recomputed by
    # DuckDB and must hash-match (same float discipline as
    # embedding_kmeans_assign: small sums, rounded before ranking).
    # Recall vs brute force pinned in tests/test_similarity_pq.py.
    oracle=_pq_oracle_tail(
        "similarity_pq_codebook",
        "similarity_pq_codes",
        extra_ctes="",
        adc_cte="""SELECT lut.qid, cd.id, sum(lut.dot) AS adot
        FROM cd JOIN lut ON lut.m = cd.m AND lut.c = cd.code
        WHERE lut.qid <> cd.id
        GROUP BY lut.qid, cd.id""",
    ),
    description="product-quantization ANN (Jégou et al., TPAMI 2011): "
    "16 per-subspace 16-centroid codebooks compress each 64-dim vector "
    "to 16 codes; queries score the corpus via a broadcast lookup table "
    "joined on (subspace, code) — table lookups + adds over the "
    "compressed index, never the float column — then exact-rescore the "
    "refine*k shortlist. The compressed-scan path past int8 scalar "
    "quantization; hash-checked via the exported codebook + code table",
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import pq_codebook, pq_codes, pq_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    cb = export_table(
        pq_codebook(emb, m_sub=_PQ_M, k_codes=_PQ_K, dims=64),
        "similarity_pq_codebook",
    )
    codes = export_table(
        pq_codes(emb, cb, m_sub=_PQ_M, dims=64), "similarity_pq_codes"
    )
    return pq_topk(
        emb,
        queries,
        k=_K,
        m_sub=_PQ_M,
        k_codes=_PQ_K,
        refine=_PQ_REFINE,
        dims=64,
        codebook=cb,
        codes=codes,
    )


@query(
    "similarity_ivfpq_topk",
    # all four index tables are exported — (id, cell) assignment,
    # (query_id, cell) probes, PQ codebook, PQ codes — so DuckDB
    # re-derives the inverted-list candidates, the candidate-restricted
    # ADC scores, the 6-dp-rounded shortlist ranking and the exact
    # rescore; hash-checked downstream of the hash-seeded models.
    oracle=_pq_oracle_tail(
        "ivfpq_codebook",
        "ivfpq_codes",
        extra_ctes=f"""asg AS (SELECT * FROM {export_sql('ivfpq_assign')}),
pr AS (SELECT * FROM {export_sql('ivfpq_probes')}),
candi AS (
  SELECT pr.query_id AS qid, asg.id
  FROM pr JOIN asg USING (cell)
  WHERE pr.query_id <> asg.id
),
""",
        adc_cte="""SELECT candi.qid, candi.id, sum(lut.dot) AS adot
        FROM candi JOIN cd ON cd.id = candi.id
                   JOIN lut ON lut.qid = candi.qid
                          AND lut.m = cd.m AND lut.c = cd.code
        GROUP BY candi.qid, candi.id""",
    ),
    description="IVF-PQ composition (FAISS IVFADC; Jégou et al. §V): "
    "coarse cells prune candidates to the probed inverted lists, PQ/ADC "
    "scores them via broadcast LUT lookups over 16-byte codes, exact "
    "rescore on the shortlist — the full 100 TB ANN shape (cell-pruned "
    "compressed scan, float column only for refine*k rows); "
    "hash-checked via the four exported index tables",
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import (
        ivf_assign,
        ivf_probes,
        ivfpq_topk,
        pq_codebook,
        pq_codes,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    a, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    assign = export_table(a, "ivfpq_assign")
    probes = export_table(ivf_probes(queries, cents, nprobe=2), "ivfpq_probes")
    cb = export_table(
        pq_codebook(emb, m_sub=_PQ_M, k_codes=_PQ_K, dims=64), "ivfpq_codebook"
    )
    codes = export_table(pq_codes(emb, cb, m_sub=_PQ_M, dims=64), "ivfpq_codes")
    return ivfpq_topk(
        emb,
        queries,
        k=_K,
        nprobe=2,
        m_sub=_PQ_M,
        k_codes=_PQ_K,
        refine=_PQ_REFINE,
        dims=64,
        assign=assign,
        probes=probes,
        codebook=cb,
        codes=codes,
    )


@query(
    "similarity_incremental_pq",
    # Stronger than the batch PQ oracle: the exported table here is only
    # the FROZEN codebook — DuckDB re-derives the delta's code
    # ASSIGNMENT itself (argmin-as-argmax with the same score and
    # smallest-c tiebreak _pq_assign uses; float-argmin parity
    # precedent: embedding_kmeans_assign) and must hash-match the
    # engine's encoder output row for row.
    oracle=f"""
WITH cb AS (SELECT * FROM {export_sql('incr_pq_codebook')}),
d AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id % 13 = 0),
hn AS (SELECT m, c, sum(w * w) / 2.0 AS half_cn FROM cb GROUP BY m, c),
sc AS (
  SELECT d.id, cb.m, cb.c,
         sum(d.e[cb.m * {_PQ_SD} + cb.j + 1] * cb.w) AS dp
  FROM d CROSS JOIN cb
  GROUP BY d.id, cb.m, cb.c
)
SELECT sc.id, sc.m, sc.c AS code
FROM sc JOIN hn ON hn.m = sc.m AND hn.c = sc.c
QUALIFY row_number() OVER (
  PARTITION BY sc.id, sc.m ORDER BY sc.dp - hn.half_cn DESC, sc.c
) = 1
""",
    description="O(delta) PQ index maintenance: new vectors (every 13th "
    "stands in for an ingest batch) are encoded against the FROZEN "
    "codebook learned on the existing corpus — one pass over the delta, "
    "append to the persisted code table, no re-encode of the corpus "
    "(equivalence to full re-encode pinned in tests). The oracle "
    "re-derives the encoder's argmin assignment from the exported "
    "codebook alone",
)
def similarity_incremental_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import pq_codebook, pq_codes

    emb = load_table(spark, "embeddings", sf_dir)
    base = emb.where(F.col("vec_id") % 13 != 0)
    delta = emb.where(F.col("vec_id") % 13 == 0)
    # the codebook is a model artifact of the EXISTING corpus: learned
    # once on base, persisted, reused verbatim for every ingest batch
    cb = export_table(
        pq_codebook(base, m_sub=_PQ_M, k_codes=_PQ_K, dims=64),
        "incr_pq_codebook",
    )
    return pq_codes(delta, cb, m_sub=_PQ_M, dims=64)


_BITEXT_KNN = 4


@query(
    "bitext_margin_pairs",
    # fully SQL-expressible: DuckDB reproduces the whole pipeline —
    # exact pair cosines, each side's top-k_nn neighborhood averages,
    # the ratio margin, forward best-per-source mining, threshold gate —
    # with the shared float discipline (6-dp rounding before every
    # ranking, id tiebreaks).
    # integer micro-unit discipline (see operators/bitext.py): cos_u =
    # floor(cos*1e6 + 0.5) is engine-identical, neighborhoods carry
    # exact (sum_u, count), and the margin is one double division of
    # exact integers — no float average whose summation order can flip
    # a rounding edge (the r11 sf0.1 sweep caught exactly that).
    oracle=f"""
WITH a AS (SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS av
           FROM embeddings WHERE label = 0),
b AS (SELECT vec_id AS b_id, CAST(embedding AS DOUBLE[]) AS bv
      FROM embeddings WHERE label = 1),
p AS (SELECT a_id, b_id,
             CAST(floor(list_dot_product(av, bv) /
                   (sqrt(list_dot_product(av, av)) *
                    sqrt(list_dot_product(bv, bv))) * 1000000 + 0.5)
                  AS BIGINT) AS cos_u
      FROM b CROSS JOIN a),
na AS (SELECT a_id, CAST(sum(cos_u) AS BIGINT) AS sa,
              CAST(count(*) AS BIGINT) AS ca FROM (
         SELECT a_id, cos_u FROM p
         QUALIFY row_number() OVER (
           PARTITION BY a_id ORDER BY cos_u DESC, b_id
         ) <= {_BITEXT_KNN})
       GROUP BY a_id),
nb AS (SELECT b_id, CAST(sum(cos_u) AS BIGINT) AS sb,
              CAST(count(*) AS BIGINT) AS cb FROM (
         SELECT b_id, cos_u FROM p
         QUALIFY row_number() OVER (
           PARTITION BY b_id ORDER BY cos_u DESC, a_id
         ) <= {_BITEXT_KNN})
       GROUP BY b_id),
s AS (SELECT p.a_id, p.b_id, p.cos_u / 1000000.0 AS cos_sim,
             floor(CAST(2 * ca * cb * p.cos_u AS DOUBLE)
                   / CAST(sa * cb + sb * ca AS DOUBLE)
                   * 1000000 + 0.5) / 1000000.0 AS margin
      FROM p JOIN na USING (a_id) JOIN nb USING (b_id))
SELECT a_id, b_id, cos_sim, margin FROM (
  SELECT * FROM s
  QUALIFY row_number() OVER (
    PARTITION BY a_id ORDER BY margin DESC, b_id
  ) = 1
) WHERE margin >= 1.0
""",
    description="margin-based parallel-pair mining (Artetxe & Schwenk, "
    "ACL 2019; the CCMatrix/LASER recipe): label-0 vs label-1 vectors "
    "stand in for two unaligned corpora in a shared embedding space; "
    "each pair's cosine is normalized by the mean of both sides' "
    "k-NN neighborhood similarities (hubness correction), mined forward "
    "best-per-source above margin 1.0. Default kernel broadcasts one "
    "side against one scan of the other; a `pairs` parameter injects "
    "ANN candidates for two-large-sides mining",
)
def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bitext import margin_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    return margin_pairs(
        emb.where(F.col("label") == 0),
        emb.where(F.col("label") == 1),
        k_nn=_BITEXT_KNN,
        threshold=1.0,
    )


@query(
    "embedding_kcenter_coreset",
    # the greedy trace verifies inductively: the oracle re-derives the
    # seed independently (min id) and recomputes every later step's
    # argmax-of-min-distance from the exported PREFIX of centers — a
    # wrong row i would fail its own recomputation, so hash equality
    # proves the whole selection satisfies the greedy invariant.
    oracle=f"""
WITH ctr AS (SELECT * FROM {export_sql('kcenter_centers')}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
steps AS (SELECT step FROM ctr WHERE step > 0),
mind AS (
  SELECT s.step, x.vec_id,
         min(round(1.0 - list_dot_product(x.v, c.v) /
                   (sqrt(list_dot_product(x.v, x.v)) *
                    sqrt(list_dot_product(c.v, c.v))), 6)) AS d
  FROM steps s
  JOIN ctr p ON p.step < s.step
  JOIN e c ON c.vec_id = p.center_id
  CROSS JOIN e x
  WHERE x.vec_id NOT IN (
    SELECT p2.center_id FROM ctr p2 WHERE p2.step < s.step
  )
  GROUP BY s.step, x.vec_id
)
SELECT CAST(0 AS INT) AS step,
       (SELECT min(vec_id) FROM e) AS center_id,
       CAST(NULL AS DOUBLE) AS dist
UNION ALL
SELECT CAST(step AS INT) AS step, vec_id AS center_id, d AS dist FROM (
  SELECT step, vec_id, d FROM mind
  QUALIFY row_number() OVER (PARTITION BY step ORDER BY d DESC, vec_id) = 1
)
""",
    description="greedy k-center (farthest-point-first) coreset "
    "selection (Gonzalez 1985): 8 maximally-diverse vectors by cosine "
    "distance, the active-learning/coverage-pruning diverse-subset "
    "picker with a 2-approximation guarantee. k sequential corpus "
    "scans against broadcast centers, one max_by aggregate and one "
    "single-row collect per step; the oracle recomputes every step's "
    "argmax from the exported prefix, verifying the greedy invariant "
    "row by row",
)
def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.curation import kcenter_select

    emb = load_table(spark, "embeddings", sf_dir)
    return export_table(kcenter_select(emb, k=8), "kcenter_centers")


_SEMDEDUP_K, _SEMDEDUP_T = 16, 0.4


@query(
    "semdedup_cluster_prune",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id AS seed_id, e AS se FROM c ORDER BY vec_id LIMIT {_SEMDEDUP_K}),
d AS (SELECT c.vec_id AS vid, s.seed_id,
             list_dot_product(c.e, c.e)
               - 2.0 * list_dot_product(c.e, s.se)
               + list_dot_product(s.se, s.se) AS sqdist
      FROM c CROSS JOIN s),
a AS (SELECT vid, seed_id AS cluster_id FROM d
      QUALIFY row_number() OVER (PARTITION BY vid
                                 ORDER BY sqdist, seed_id) = 1),
sides AS (SELECT a.vid, a.cluster_id, c.e,
                 sqrt(list_dot_product(c.e, c.e)) AS n
          FROM a JOIN c ON c.vec_id = a.vid),
dups AS (SELECT DISTINCT rb.vid
         FROM sides ra JOIN sides rb
           ON ra.cluster_id = rb.cluster_id AND ra.vid < rb.vid
         WHERE list_dot_product(ra.e, rb.e) / (ra.n * rb.n)
               >= {_SEMDEDUP_T})
SELECT a.vid AS vec_id, a.cluster_id,
       (dups.vid IS NOT NULL) AS pruned
FROM a LEFT JOIN dups ON dups.vid = a.vid
""",
    description="SemDeDup semantic dedup (Abbas et al. 2023): "
    "deterministic nearest-seed clustering, then within-cluster exact "
    "cosine pruning at 0.4 keeping the lowest id — the pair join is "
    "equi-keyed on the cluster so pair work is bounded by cluster size "
    "(k grows with N in production), never corpus-quadratic; per-side "
    "norms precomputed before the join",
)
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup_prune

    emb = load_table(spark, "embeddings", sf_dir)
    return semdedup_prune(emb, k=_SEMDEDUP_K, threshold=_SEMDEDUP_T)


_PI_DIMS, _PI_ITERS = 64, 8


def _pi_iter_sql(prev: str, k: int) -> str:
    # AS MATERIALIZED: without it DuckDB inlines each iteration's CTEs
    # into their consumers and the 8-step chain re-expands exponentially
    return f"""s{k} AS MATERIALIZED (
  SELECT vec_id, list_dot_product(ec, (SELECT vl FROM {prev})) AS s
  FROM cc
),
w{k} AS MATERIALIZED (
  SELECT t.i AS i, sum(cc.ec[t.i] * s{k}.s) AS w
  FROM cc JOIN s{k} USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, {_PI_DIMS})) AS i) t
  GROUP BY t.i
),
n{k} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w{k}),
v{k} AS MATERIALIZED (SELECT list(round(w / nrm, 8) ORDER BY i) AS vl
         FROM w{k} CROSS JOIN n{k})"""


_PI_SQL = (
    f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
mean AS (
  SELECT t.i AS i, round(sum(c.e[t.i]) / count(*), 8) AS m
  FROM c CROSS JOIN (SELECT unnest(generate_series(1, {_PI_DIMS})) AS i) t
  GROUP BY t.i
),
ml AS (SELECT list(m ORDER BY i) AS ml FROM mean),
cc AS MATERIALIZED (
  SELECT vec_id,
         list_transform(generate_series(1, {_PI_DIMS}),
                        i -> e[i] - ml.ml[i]) AS ec
  FROM c CROSS JOIN ml
),
v0 AS (SELECT list_transform(generate_series(1, {_PI_DIMS}),
                             i -> 0.125) AS vl),
"""
    + ",\n".join(_pi_iter_sql(f"v{k - 1}", k) for k in range(1, _PI_ITERS + 1))
    + f""",
fin AS (
  SELECT t.i AS i,
         (SELECT vl FROM v{_PI_ITERS})[t.i] AS loading,
         round((SELECT nrm FROM n{_PI_ITERS}), 4) AS eigenvalue
  FROM (SELECT unnest(generate_series(1, {_PI_DIMS})) AS i) t
),
sgn AS (
  SELECT CASE WHEN loading < 0 THEN -1.0 ELSE 1.0 END AS sg
  FROM fin ORDER BY abs(loading) DESC, i LIMIT 1
)
SELECT CAST(i AS INTEGER) AS dim, loading * sg AS loading, eigenvalue
FROM fin CROSS JOIN sgn
"""
)


@query(
    "embedding_power_iteration",
    oracle=_PI_SQL,
    description="top principal component by distributed power iteration "
    "(the numeric core of all-but-the-top embedding debias, Mu & "
    "Viswanath ICLR 2018): per-iteration matvec = broadcast 1-row "
    "component x corpus fold (no shuffle) + posexplode per-dimension "
    "sums (dims groups, map-combined — the exchange carries "
    "O(dims x partitions) partials, never vectors); component stays a "
    "1-row frame, no driver collect in the loop; per-iteration 8-dp "
    "rounding makes the FP sums engine/partitioning-deterministic, "
    "sign canonicalized to the largest-|loading| dimension",
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import power_iteration_top_component

    emb = load_table(spark, "embeddings", sf_dir)
    return power_iteration_top_component(
        emb, dims=_PI_DIMS, iterations=_PI_ITERS
    )


@query(
    "embedding_gram_pca",
    # the components (dim, m, c1, c2) are exported; the oracle
    # re-derives EVERY projection from the exported loadings and the
    # raw embeddings — the eigendecomposition itself is pinned by
    # tests/test_linalg.py (orthonormality + Gram residual), the same
    # split as the PQ/IVF entries (codebook exported, scoring re-derived)
    oracle=f"""
SELECT e.vec_id,
       round(sum((CAST(e.embedding[t.dim] AS DOUBLE) - t.m) * t.c1), 6)
         AS p1,
       round(sum((CAST(e.embedding[t.dim] AS DOUBLE) - t.m) * t.c2), 6)
         AS p2
FROM embeddings e CROSS JOIN {export_sql('gram_pca_components')} t
GROUP BY e.vec_id
""",
    description="tall-skinny PCA via the distributed Gram matrix: one "
    "numpy GEMM per Arrow batch (mapInPandas), d^2 partial sums in one "
    "map-combined exchange (the corpus never shuffles, ONE scan total), "
    "local eigh of the 64x64 Gram on the driver (O(d^2) bounded state), "
    "8-dp sign-canonicalized loadings broadcast back for a narrow "
    "no-shuffle projection — the k>1 companion to "
    "embedding_power_iteration",
)
def embedding_gram_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.linalg import (
        gram_pca_components,
        project_onto_components,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    comps = gram_pca_components(emb, dims=64, k=2)
    exported = export_table(comps, "gram_pca_components")
    return project_onto_components(emb, exported, k=2)


@query(
    "embedding_silhouette_centroids",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id AS seed_id, e AS se FROM c ORDER BY vec_id LIMIT {_KMEANS_K}),
d AS (SELECT c.vec_id AS vid, s.seed_id,
             list_dot_product(c.e, c.e)
               - 2.0 * list_dot_product(c.e, s.se)
               + list_dot_product(s.se, s.se) AS sqdist
      FROM c CROSS JOIN s),
r AS (SELECT vid, seed_id, sqdist,
             row_number() OVER (PARTITION BY vid
                                ORDER BY sqdist, seed_id) AS rn
      FROM d),
ab AS (
  SELECT vid,
         min(CASE WHEN rn = 1 THEN seed_id END) AS cluster_id,
         sqrt(min(CASE WHEN rn = 1 THEN sqdist END)) AS a_d,
         sqrt(min(CASE WHEN rn = 2 THEN sqdist END)) AS b_d
  FROM r WHERE rn <= 2 GROUP BY vid
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       round(avg(CASE WHEN greatest(a_d, b_d) = 0 THEN 0
                      ELSE (b_d - a_d) / greatest(a_d, b_d) END), 6)
         AS avg_silhouette
FROM ab GROUP BY cluster_id
""",
    description="simplified (centroid-based) silhouette per cluster: "
    "s = (b - a)/max(a, b) from each vector's nearest and second-"
    "nearest centroid distances — the O(n*k) clustering-quality score "
    "that survives at corpus scale where the O(n^2) pairwise classic "
    "cannot; the drift alarm a curation pipeline reads between "
    "snapshot re-clusterings "
    "(operators/similarity.py:centroid_silhouette_report)",
)
def embedding_silhouette_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import centroid_silhouette_report

    emb = load_table(spark, "embeddings", sf_dir)
    return centroid_silhouette_report(emb, k=_KMEANS_K)


# ideal DCG for rel = K..1 at ranks 1..K — a closed-form constant,
# computed once in Python and shared with the SQL mirror
import math as _math

_NDCG_IDCG = sum(
    (_K - i + 1) / _math.log2(i + 1) for i in range(1, _K + 1)
)


@query(
    "similarity_ivf_ndcg",
    # rank-AWARE companion to similarity_ivf_recall: recall@k says how
    # many true neighbors the index returned; NDCG@k says whether it
    # put them in the right ORDER (graded relevance = K..1 by exact
    # rank). Same exported-index pattern — DuckDB re-derives both
    # rankings and the score
    oracle=f"""
WITH asg AS (SELECT * FROM {{a}}),
pr AS (SELECT * FROM {{p}}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cand AS (
  SELECT pr.query_id, asg.id AS neighbor_id
  FROM pr JOIN asg USING (cell)
  WHERE pr.query_id <> asg.id
),
ivf AS (
  SELECT cand.query_id, cand.neighbor_id,
         row_number() OVER (
           PARTITION BY cand.query_id
           ORDER BY round(list_dot_product(qc.e, cc.e) /
                          (sqrt(list_dot_product(qc.e, qc.e)) *
                           sqrt(list_dot_product(cc.e, cc.e))), 6) DESC,
                    cand.neighbor_id) AS sys_rank
  FROM cand JOIN c qc ON qc.vec_id = cand.query_id
            JOIN c cc ON cc.vec_id = cand.neighbor_id
  QUALIFY sys_rank <= {{k}}
),
q AS (SELECT * FROM c WHERE vec_id < {{nq}}),
bf AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(list_dot_product(q.e, c.e) /
                          (sqrt(list_dot_product(q.e, q.e)) *
                           sqrt(list_dot_product(c.e, c.e))), 6) DESC,
                    neighbor_id) AS ex_rank
  FROM q JOIN c ON q.vec_id <> c.vec_id
  QUALIFY ex_rank <= {{k}}
),
rel AS (SELECT query_id, neighbor_id, {{k}} - ex_rank + 1 AS rel FROM bf),
d AS (
  SELECT ivf.query_id,
         sum(COALESCE(rel.rel, 0) / log2(ivf.sys_rank + 1)) AS dcg
  FROM ivf LEFT JOIN rel USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT query_id, round(dcg, 6) AS dcg,
       round(dcg / {{idcg}}, 6) AS ndcg
FROM d
""".format(
        a=export_sql("ivf_ndcg_assign"),
        p=export_sql("ivf_ndcg_probes"),
        k=_K,
        nq=_NQUERY,
        idcg=repr(_NDCG_IDCG),
    ),
    description="NDCG@k for the IVF index — the rank-AWARE companion "
    "to similarity_ivf_recall (recall counts true neighbors returned; "
    "NDCG scores whether the index put them in the right ORDER): "
    "graded relevance K..1 from the exact ranking, DCG over the IVF "
    "ranking's positions, ideal DCG as a shared closed-form literal; "
    "same exported assign/probe tables, ground truth costs one "
    "broadcast compare of the query SAMPLE",
)
def similarity_ivf_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..exports import export_table
    from ..operators.similarity import ivf_assign, ivf_probes, ivf_topk_from

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    assign = export_table(assign, "ivf_ndcg_assign")
    probes = export_table(
        ivf_probes(queries, cents, nprobe=2), "ivf_ndcg_probes"
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    ivf = (
        ivf_topk_from(emb, queries, assign, probes, k=_K)
        .withColumn("sys_rank", F.row_number().over(wq))
    )
    bf = (
        brute_force_topk(emb, queries, k=_K)
        .withColumn("ex_rank", F.row_number().over(wq))
        .select(
            "query_id",
            "neighbor_id",
            (F.lit(_K) - F.col("ex_rank") + 1).alias("rel"),
        )
    )
    d = (
        ivf.join(bf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.coalesce("rel", F.lit(0))
                / F.log2(F.col("sys_rank") + 1)
            ).alias("__dcg")
        )
    )
    return d.select(
        "query_id",
        F.round("__dcg", 6).alias("dcg"),
        F.round(F.col("__dcg") / F.lit(_NDCG_IDCG), 6).alias("ndcg"),
    )


@query(
    "embedding_centroid_drift",
    oracle="""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
oldd AS (SELECT label, unnest(generate_series(1, len(e))) AS i,
                unnest(e) AS v
         FROM c WHERE vec_id % 5 <> 0),
newd AS (SELECT label, unnest(generate_series(1, len(e))) AS i,
                unnest(e) AS v
         FROM c WHERE vec_id % 5 = 0),
oc AS (SELECT label, list(cv ORDER BY i) AS ce
       FROM (SELECT label, i, avg(v) AS cv FROM oldd GROUP BY 1, 2)
       GROUP BY label),
nc AS (SELECT label, list(cv ORDER BY i) AS ce
       FROM (SELECT label, i, avg(v) AS cv FROM newd GROUP BY 1, 2)
       GROUP BY label),
cnt AS (
  SELECT label,
         CAST(sum(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_old,
         CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new
  FROM c GROUP BY label
)
SELECT cnt.label, cnt.n_old, cnt.n_new,
       round(list_dot_product(oc.ce, nc.ce) /
             (sqrt(list_dot_product(oc.ce, oc.ce)) *
              sqrt(list_dot_product(nc.ce, nc.ce))), 6) AS cos_drift,
       round(sqrt(list_dot_product(nc.ce, nc.ce)) /
             sqrt(list_dot_product(oc.ce, oc.ce)), 6) AS norm_ratio
FROM cnt JOIN oc USING (label) JOIN nc USING (label)
""",
    description="per-label embedding drift between snapshots: cosine "
    "between the old and new class centroids (cos_drift ~ 1 = stable "
    "embedding space, falling = encoder/class drift — re-cluster and "
    "re-index triggers) plus the centroid norm ratio; two O(labels x "
    "dims) centroid aggregates, the comparison itself is O(labels) "
    "(operators/curation.py:label_centroids on each snapshot)",
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import label_centroids
    from ..operators.similarity import dot

    emb = load_table(spark, "embeddings", sf_dir)
    old = emb.where(F.col("vec_id") % 5 != 0)
    new = emb.where(F.col("vec_id") % 5 == 0)
    oc = label_centroids(old).withColumnRenamed("centroid", "__oc")
    nc = label_centroids(new).withColumnRenamed("centroid", "__nc")
    cnt = emb.groupBy("label").agg(
        F.sum((F.col("vec_id") % 5 != 0).cast("long")).alias("n_old"),
        F.sum((F.col("vec_id") % 5 == 0).cast("long")).alias("n_new"),
    )
    o, n = F.col("__oc"), F.col("__nc")
    return (
        cnt.join(oc, "label")
        .join(nc, "label")
        .select(
            "label",
            "n_old",
            "n_new",
            F.round(
                dot(o, n) / (F.sqrt(dot(o, o)) * F.sqrt(dot(n, n))), 6
            ).alias("cos_drift"),
            F.round(F.sqrt(dot(n, n)) / F.sqrt(dot(o, o)), 6).alias(
                "norm_ratio"
            ),
        )
    )


_KNN_K = 5


@query(
    "embedding_knn_accuracy",
    # the eval harness is definitionally a sample-vs-index compare: the
    # test split (vec_id % 5 == 0) broadcasts against the train side;
    # cosine is ROUNDED to 6 dp BEFORE ranking so the neighbor sets are
    # engine-identical (unrounded last-ulp fold differences could flip
    # a rank), with vec_id then label-ascending tiebreaks pinning both
    # the neighbor list and the majority vote
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
           FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id % 5 = 0),
t AS (SELECT * FROM c WHERE vec_id % 5 <> 0),
nn AS (
  SELECT q.vec_id AS qid, q.label AS true_label, t.label AS nb_label
  FROM q JOIN t ON true
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY round({_COS_SQL.replace('c.e', 't.e')}, 6) DESC, t.vec_id
  ) <= {_KNN_K}
),
votes AS (
  SELECT qid, true_label, nb_label, count(*) AS v
  FROM nn GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, true_label, nb_label AS pred_label
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY qid
                             ORDER BY v DESC, nb_label) = 1
)
SELECT true_label AS label,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0
                      END) AS DOUBLE) / count(*), 6) AS accuracy
FROM pred GROUP BY 1
""",
    description="k-NN classification accuracy of the embedding space "
    "(5-NN majority vote, leave-out split vec_id % 5): per true label "
    "the held-out count and the vote accuracy — the label-coherence "
    "eval that tells you whether an embedding index is worth building "
    "before any ANN work; cosine rounded 6 dp BEFORE ranking with "
    "id/label tiebreaks so neighbor sets and votes are engine-exact; "
    "the test split broadcasts against the train side (eval-on-sample "
    "by construction — the production-scale analogue probes the IVF "
    "index instead of brute force)",
)
def embedding_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        "label",
    )
    emb = emb.withColumn("__n", l2_norm(F.col("e")))
    q = emb.where(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("__n").alias("qn"),
        F.col("label").alias("true_label"),
    )
    t = emb.where(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("tid"),
        F.col("e").alias("te"),
        F.col("__n").alias("tn"),
        F.col("label").alias("nb_label"),
    )
    cos = F.round(
        dot(F.col("qe"), F.col("te")) / (F.col("qn") * F.col("tn")), 6
    )
    w_nn = Window.partitionBy("qid").orderBy(
        F.desc("__cos"), F.asc("tid")
    )
    nn = (
        F.broadcast(q)
        .join(t)
        .select("qid", "true_label", "nb_label", "tid", cos.alias("__cos"))
        .withColumn("__rk", F.row_number().over(w_nn))
        .where(F.col("__rk") <= _KNN_K)
    )
    votes = nn.groupBy("qid", "true_label", "nb_label").agg(
        F.count(F.lit(1)).alias("__v")
    )
    w_vote = Window.partitionBy("qid").orderBy(
        F.desc("__v"), F.asc("nb_label")
    )
    pred = (
        votes.withColumn("__pk", F.row_number().over(w_vote))
        .where(F.col("__pk") == 1)
        .select("qid", "true_label", F.col("nb_label").alias("pred_label"))
    )
    correct = (F.col("pred_label") == F.col("true_label")).cast("long")
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(correct).alias("n_correct"),
        F.round(
            F.sum(correct).cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )


# mutual-kNN index width: 16 tables measures 0.90/0.93 true-3-NN
# candidate recall at sf0.001/sf0.1 (pin floor 0.85,
# tests/test_plan_shapes.py). The r13 verdict asked whether fewer
# tables buys headroom now that scoring is kernel-cheap: the r14 A/B
# (tools/ab_knn_tables.py) measured tables=12 at 0.822 (sf0.001) /
# 0.835 (sf0.01) / 0.861 (sf0.1) recall for 10.8 -> 9.0 s at sf0.1 —
# BELOW the pin floor on the pin's own fixture, so 16 stays
# (tables=10: 0.813 at sf0.1, strictly worse).
_MUTUAL_KNN_TABLES = 16


def mutual_knn_edges(emb: DataFrame, k: int = 3) -> DataFrame:
    """Mutual-kNN edges (id_a < id_b) over LSH-injected candidates.

    The kNN stage of ``embedding_mutual_knn_clusters``: every join an
    equi-join (candidates come from the exported multi-table
    hyperplane index, never from an all-pairs theta-join);
    ``tests/test_plan_shapes.py`` pins the pre-checkpoint plan via
    ``_mutual_knn_nn``. ``emb`` carries (vec_id, e: array<double>,
    label).

    The index is SELF-SIZING: planes = max(4, ceil(log2(n/128))) keeps
    the expected bucket near 128 vectors at any corpus size, so
    per-node candidates stay ~tables x 128 (constant) and the pair
    space is LINEAR in n — a fixed plane count would make bucket
    occupancy (and the pair space) grow linearly until the hot-bucket
    cap silently dropped everything. The default near-dup tuning (8x8)
    measured only 0.13-0.16 recall of the true 3-NN here: the
    fixture's nearest neighbors sit at cosine ~0.3-0.6, not the >=0.9
    regime 8-bit signatures target. Measured true-3-NN candidate
    recall with this sizing: 0.91 at sf0.001/sf0.01 (n=500, planes=4),
    0.93 at sf0.1 (n=2000, planes=4), pinned in
    tests/test_plan_shapes.py. The count() for n is model state (the
    same class as Lloyd seeds); the oracle consumes the exported
    (id, t, sig) table, so its SQL is sizing-independent.
    """
    # checkpoint the ranked kNN before the mutuality semi-join: both
    # semi-join sides are projections of nn, and without the barrier
    # the candidate+cosine+rank plan (the expensive stage) executes
    # once per side (measured 2x at sf0.1)
    nn = _mutual_knn_nn(emb, k).localCheckpoint(eager=True)
    rev = nn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        nn.join(rev, ["src", "dst"], "left_semi")
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )


def _mutual_knn_scored(emb: DataFrame) -> DataFrame:
    """UNORDERED scored candidate pairs (src < dst, 6-dp cosine),
    PRE-checkpoint — the plan ``tests/test_plan_shapes.py`` pins: the
    expensive stage, every join an equi-join, no all-pairs theta-join.
    Cosine is symmetric, so each pair is scored ONCE per (pair, table)
    collision and deduped by ``.distinct()`` (duplicate emissions are
    bit-identical by construction).

    Scoring runs in ``bucket_cosine_pairs``' Arrow per-bucket kernel —
    per-DIMENSION sequential accumulation vectorized over the pair
    axis, bit-identical IEEE to the old JVM ``F.aggregate`` fold (and
    to the oracle's list_dot_product) but ~4x faster end to end at
    sf0.1 (the Catalyst higher-order path allocated a zipped 64-array
    per pair and folded it element-by-element over 1.28M candidate
    pairs)."""
    import math

    from ..exports import export_table
    from ..operators.similarity import bucket_cosine_pairs, multitable_sig_table

    n = emb.count()
    planes = max(4, math.ceil(math.log2(max(n, 1) / 128)))
    banded = export_table(
        multitable_sig_table(
            emb, planes=planes, tables=_MUTUAL_KNN_TABLES, vec_col="e"
        ),
        "mutual_knn_banded",
    )
    # any-table collision, hot-bucket cap COUNT-FIRST (the
    # cosine_neardup_lsh / minhash_lsh_pairs shape, and the exact shape
    # the oracle uses: hot AS (... HAVING count(*) > 1000) then ANTI
    # JOIN): a degenerate mega-bucket is dropped by a partial-agg count
    # + broadcast anti-join BEFORE the vectors are attached or any
    # bucket group is materialized, so no task ever holds an uncapped
    # bucket
    hot = (
        banded.groupBy("t", "sig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1000)
        .select("t", "sig")
    )
    kept = banded.join(F.broadcast(hot), ["t", "sig"], "left_anti")
    with_vec = kept.join(
        emb.select(F.col("vec_id").alias("id"), F.col("e").alias("v")), "id"
    )
    scored = bucket_cosine_pairs(with_vec, ["t", "sig"]).distinct()
    return scored.select("src", "dst", F.round("__cos", 6).alias("__cos"))


def _mutual_knn_nn(emb: DataFrame, k: int = 3) -> DataFrame:
    """Directional k-NN: mirror the once-scored unordered pairs, rank
    per source. The scored frame is materialized once — the union's
    two branches are different projections, so exchange reuse would
    NOT dedupe the expensive join+cosine subplan across them."""
    from pyspark.sql import Window

    scored = _mutual_knn_scored(emb).localCheckpoint(eager=True)
    directional = scored.unionByName(
        scored.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            "__cos",
        )
    )
    w_nn = Window.partitionBy("src").orderBy(
        F.desc("__cos"), F.asc("dst")
    )
    return (
        directional.withColumn("__rk", F.row_number().over(w_nn))
        .where(F.col("__rk") <= k)
        .select("src", "dst")
    )


@query(
    "embedding_mutual_knn_clusters",
    # ANN-candidate-injected mutual kNN (VERDICT r11 item 1): the
    # exported multi-table hyperplane LSH index bounds the pair space —
    # 3-NN is ranked WITHIN each node's LSH candidate set by
    # 6-dp-rounded cosine (engine-identical ranking, id tiebreak), then
    # MUTUAL-kNN edges (the standard density trick: a one-way neighbor
    # of a hub is not a cluster bond), components via the definitional
    # recursive-CTE closure in the oracle vs the two-star contraction
    # engine in Spark — same exact min-id labels. No all-pairs join on
    # either side: the former src != dst theta-join computed n^2
    # cosines, the textbook scale-killer.
    oracle=f"""
WITH RECURSIVE
bk AS MATERIALIZED (SELECT * FROM {export_sql('mutual_knn_banded')}),
hot AS (SELECT t, sig FROM bk GROUP BY t, sig HAVING count(*) > 1000),
bkf AS MATERIALIZED (SELECT bk.* FROM bk ANTI JOIN hot USING (t, sig)),
cand AS MATERIALIZED (
  SELECT DISTINCT a.id AS src, b.id AS dst
  FROM bkf a JOIN bkf b ON a.t = b.t AND a.sig = b.sig
                        AND a.id <> b.id
),
c AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
      FROM embeddings),
nn AS MATERIALIZED (
  SELECT cand.src, cand.dst
  FROM cand JOIN c a ON a.vec_id = cand.src
            JOIN c b ON b.vec_id = cand.dst
  QUALIFY row_number() OVER (
    PARTITION BY cand.src
    ORDER BY round({_COS_SQL.replace('q.e', 'a.e').replace('c.e', 'b.e')}, 6)
             DESC, cand.dst
  ) <= 3
),
mut AS MATERIALIZED (
  SELECT n1.src AS x, n1.dst AS y FROM nn n1
  SEMI JOIN nn n2 ON n2.src = n1.dst AND n2.dst = n1.src
  WHERE n1.src < n1.dst
),
e AS (SELECT x, y FROM mut UNION ALL SELECT y, x FROM mut),
n AS (SELECT DISTINCT x AS node FROM e),
w(node, lbl) AS (
  SELECT node, node FROM n
  UNION
  SELECT e.y, w.lbl FROM w JOIN e ON e.x = w.node
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM w GROUP BY node),
lab AS (
  SELECT c.vec_id, c.label,
         COALESCE(comp.cluster_id, c.vec_id) AS cluster_id
  FROM c LEFT JOIN comp ON c.vec_id = comp.node
)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
       min(label) AS min_label
FROM lab GROUP BY 1 HAVING count(*) > 1
""",
    description="mutual-kNN clustering of the embedding space, ANN-"
    "candidate-bounded: a SELF-SIZING multi-table hyperplane LSH index "
    "(planes = log2(n/128), 16 tables, exported — expected bucket "
    "~128 at any corpus size, so the pair space is linear in n) "
    "generates each node's candidates with measured true-3-NN recall "
    "0.91-0.93 across the fixtures (recall pinned in tests), 3-NN "
    "ranked within candidates by 6-dp-rounded cosine (engine-exact "
    "ranking, id tiebreaks), edges kept only when BOTH endpoints "
    "nominate each other (the mutuality filter that stops hub vectors "
    "fusing unrelated clusters), connected components via the "
    "two-star contraction engine (O(log n) rounds), multi-member "
    "clusters reported with label purity — the unsupervised structure "
    "check against the stored labels; candidates are capped "
    "equi-joins (no all-pairs theta-join on either engine), the "
    "oracle re-derives candidate generation + ranking + a "
    "recursive-CTE closure from the exported index "
    "(operators/dedup.py:connected_components_twostar)",
)
def embedding_mutual_knn_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import connected_components_twostar

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        "label",
    )
    mut = mutual_knn_edges(emb)
    comp = connected_components_twostar(mut)
    lab = (
        emb.select("vec_id", "label")
        .join(comp, emb["vec_id"] == comp["id"], "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("component", "vec_id").alias("cluster_id"),
        )
    )
    return (
        lab.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("label").alias("n_labels"),
            F.min("label").alias("min_label"),
        )
        .where(F.col("n_members") > 1)
    )


_PQ_SUBD = 64 // _PQ_M


@query(
    "similarity_pq_distortion",
    # quantization-error audit from the exported codebook + code table:
    # DuckDB reconstructs every sub-vector's codeword and recomputes the
    # per-subspace MSE / variance from the raw embeddings — the eval
    # that says whether the compressed index is usable BEFORE recall
    # numbers (high distortion_share in one subspace = that slice of
    # the vector is effectively noise after compression)
    oracle=f"""
WITH cb AS (SELECT * FROM {export_sql('pq_distortion_codebook')}),
cd AS (SELECT * FROM {export_sql('pq_distortion_codes')}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sub AS (
  SELECT cd.id, cd.m, cb.j, cb.w,
         c.e[cd.m * {_PQ_SUBD} + cb.j + 1] AS x
  FROM cd JOIN cb ON cb.m = cd.m AND cb.c = cd.code
          JOIN c ON c.vec_id = cd.id
)
SELECT m, CAST(count(DISTINCT id) AS BIGINT) AS n_vectors,
       round(avg((x - w) * (x - w)), 6) AS mse,
       round(avg(x * x) - avg(x) * avg(x), 6) AS var_x,
       round(avg((x - w) * (x - w))
             / (avg(x * x) - avg(x) * avg(x)), 6) AS distortion_share
FROM sub GROUP BY m
""",
    description="product-quantization distortion audit: per subspace "
    "the reconstruction MSE of the learned codewords against the raw "
    "sub-vectors, the subspace variance, and their ratio (1 = the "
    "subspace is pure noise after compression, near 0 = faithfully "
    "coded) — the 'measure, don't guess' companion to "
    "similarity_pq_topk that justifies (m_sub, k_codes) before any "
    "recall run; one broadcast codebook join + one map-combined "
    "per-subspace aggregate over the code table, the float column read "
    "once (operators/similarity.py:pq_codebook, pq_codes)",
)
def similarity_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..exports import export_table
    from ..operators.similarity import pq_codebook, pq_codes

    emb = load_table(spark, "embeddings", sf_dir)
    cb = export_table(
        pq_codebook(emb, m_sub=_PQ_M, k_codes=_PQ_K, dims=64),
        "pq_distortion_codebook",
    )
    codes = export_table(
        pq_codes(emb, cb, m_sub=_PQ_M, dims=64), "pq_distortion_codes"
    )
    e = load_table(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    sub = (
        codes.join(
            F.broadcast(
                cb.select(
                    "m", F.col("c").alias("code"), "j", "w"
                )
            ),
            ["m", "code"],
        )
        .join(e, "id")
        .select(
            "id",
            "m",
            "w",
            F.element_at(
                "e",
                (
                    F.col("m") * _PQ_SUBD + F.col("j") + 1
                ).cast("int"),
            ).alias("x"),
        )
    )
    err = (F.col("x") - F.col("w")) * (F.col("x") - F.col("w"))
    var_x = F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")
    return sub.groupBy("m").agg(
        F.count_distinct("id").alias("n_vectors"),
        F.round(F.avg(err), 6).alias("mse"),
        F.round(var_x, 6).alias("var_x"),
        F.round(F.avg(err) / var_x, 6).alias("distortion_share"),
    )


_CURVE_PROBES = (1, 2, 4)


def _ivf_curve_block(p: int) -> str:
    return f"""
cand_{p} AS (
  SELECT pr.query_id, asg.id AS neighbor_id
  FROM (SELECT * FROM {export_sql(f'ivf_curve_probes_{p}')}) pr
  JOIN asg USING (cell)
  WHERE pr.query_id <> asg.id
),
ivf_{p} AS (
  SELECT cand_{p}.query_id, cand_{p}.neighbor_id
  FROM cand_{p} JOIN c qc ON qc.vec_id = cand_{p}.query_id
                JOIN c cc ON cc.vec_id = cand_{p}.neighbor_id
  QUALIFY row_number() OVER (
    PARTITION BY cand_{p}.query_id
    ORDER BY round(list_dot_product(qc.e, cc.e) /
                   (sqrt(list_dot_product(qc.e, qc.e)) *
                    sqrt(list_dot_product(cc.e, cc.e))), 6) DESC,
             cand_{p}.neighbor_id) <= {_K}
),
nc_{p} AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
           FROM cand_{p} GROUP BY query_id),
h_{p} AS (SELECT ivf_{p}.query_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM ivf_{p} JOIN bf USING (query_id, neighbor_id)
          GROUP BY ivf_{p}.query_id),
r_{p} AS (
  SELECT CAST({p} AS INTEGER) AS nprobe,
         CAST(count(*) AS BIGINT) AS n_queries,
         round(avg(CAST(n_candidates AS DOUBLE)), 4) AS avg_candidates,
         round(avg(CAST(coalesce(n_hits, 0) AS DOUBLE) / {_K}), 4)
           AS avg_recall
  FROM nc_{p} LEFT JOIN h_{p} USING (query_id)
)"""


@query(
    "similarity_ivf_recall_curve",
    # the TUNING curve, hash-verified: one shared cell assignment, one
    # probe table per nprobe, recall@k and probed-candidate cost per
    # setting — DuckDB re-derives every ranking from the exports
    oracle="WITH asg AS (SELECT * FROM "
    + export_sql("ivf_curve_assign")
    + "),\nc AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e "
    "FROM embeddings),\n"
    + f"""q AS (SELECT * FROM c WHERE vec_id < {_NQUERY}),
bf AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM q JOIN c ON q.vec_id <> c.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY query_id
    ORDER BY round(list_dot_product(q.e, c.e) /
                   (sqrt(list_dot_product(q.e, q.e)) *
                    sqrt(list_dot_product(c.e, c.e))), 6) DESC,
             neighbor_id) <= {_K}
),"""
    + ",".join(_ivf_curve_block(p) for p in _CURVE_PROBES)
    + "\n"
    + "\nUNION ALL\n".join(f"SELECT * FROM r_{p}" for p in _CURVE_PROBES),
    description="recall-vs-nprobe tuning curve for the IVF index: one "
    "shared cell assignment, probe tables at nprobe = 1/2/4, and per "
    "setting the mean probed-candidate count (the work the setting "
    "costs) next to the mean recall@k it buys — the artifact that "
    "PICKS the production nprobe instead of guessing it; ground truth "
    "is the brute-force top-k of the 5-query sample, every ranking "
    "re-derived by DuckDB from the exported index tables "
    "(operators/similarity.py:ivf_assign, ivf_probes, ivf_topk_from)",
)
def similarity_ivf_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import functools

    from ..exports import export_table
    from ..operators.similarity import ivf_assign, ivf_probes, ivf_topk_from

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < _NQUERY)
    assign, cents = ivf_assign(emb, n_cells=8, dims=64, lloyd_iters=0)
    assign = export_table(assign, "ivf_curve_assign")
    bf = brute_force_topk(emb, queries, k=_K).select(
        "query_id", "neighbor_id"
    )
    rows = []
    for p in _CURVE_PROBES:
        probes = export_table(
            ivf_probes(queries, cents, nprobe=p), f"ivf_curve_probes_{p}"
        )
        ivf = ivf_topk_from(emb, queries, assign, probes, k=_K).select(
            "query_id", "neighbor_id"
        )
        nc = (
            probes.join(assign, "cell")
            .where(F.col("query_id") != F.col("id"))
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_candidates"))
        )
        h = ivf.join(bf, ["query_id", "neighbor_id"]).groupBy(
            "query_id"
        ).agg(F.count(F.lit(1)).alias("n_hits"))
        rows.append(
            nc.join(h, "query_id", "left").agg(
                F.lit(p).cast("int").alias("nprobe"),
                F.count(F.lit(1)).alias("n_queries"),
                F.round(
                    F.avg(F.col("n_candidates").cast("double")), 4
                ).alias("avg_candidates"),
                F.round(
                    F.avg(
                        F.coalesce(F.col("n_hits"), F.lit(0)).cast(
                            "double"
                        )
                        / _K
                    ),
                    4,
                ).alias("avg_recall"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), rows)


# --- Rank-biased overlap between the exact and compressed rankings ----
#
# RBO (Webber, Moffat & Zobel, TOIS 2010), truncated at depth k with
# persistence p: sum over depths d of p^(d-1) * |A_d intersect B_d| / d.
# A common item with ranks (ra, rb) enters every depth d >= max(ra, rb),
# so its total contribution is coef[m] = sum_{d=m..k} p^(d-1)/d — fixed
# at import time as INTEGER pico-units shared verbatim by both engines
# (the periodogram basis-pinning move), making per-query RBO an exact
# BIGINT sum normalized by one final division.
_RBO_P = 0.9


def _rbo_coef_u() -> list[int]:
    w = [round(_RBO_P ** (d - 1) / d * 1e12) for d in range(1, _K + 1)]
    return [sum(w[m - 1:]) for m in range(1, _K + 1)]


_RBO_COEF_U = _rbo_coef_u()
_RBO_NORM_U = sum(_RBO_COEF_U)
_RBO_COEF_SQL = ", ".join(str(c) for c in _RBO_COEF_U)

_RBO_SQL = f"""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id % 5 = 0),
corp AS (SELECT * FROM c WHERE vec_id % 5 <> 0),
a AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY round({_COS_SQL}, 6) DESC, c.vec_id)
           AS ra
  FROM q JOIN corp c ON true
  QUALIFY ra <= {_K}
),
m8 AS (SELECT vec_id, e,
              list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
       FROM c),
q8 AS (SELECT vec_id, CAST(list_transform(e, x -> CASE WHEN scale > 0
                  THEN CAST(floor(x / scale + 0.5) AS BIGINT)
                  ELSE 0 END) AS DOUBLE[]) AS cd
       FROM m8),
b AS (
  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY qq.vec_id
           ORDER BY list_dot_product(qq.cd, cc.cd)
                    / (sqrt(list_dot_product(qq.cd, qq.cd))
                       * sqrt(list_dot_product(cc.cd, cc.cd))) DESC,
                    cc.vec_id) AS rb
  FROM q8 qq JOIN q8 cc
    ON qq.vec_id % 5 = 0 AND cc.vec_id % 5 <> 0
  WHERE list_dot_product(qq.cd, qq.cd) > 0
    AND list_dot_product(cc.cd, cc.cd) > 0
  QUALIFY rb <= {_K}
),
per AS (
  SELECT a.query_id,
         CAST(sum(([{_RBO_COEF_SQL}])[greatest(a.ra, b.rb)]) AS BIGINT)
           AS rbo_u
  FROM a JOIN b USING (query_id, neighbor_id)
  GROUP BY 1
),
pq AS (
  SELECT q.vec_id AS query_id, q.label,
         coalesce(per.rbo_u, 0) AS rbo_u
  FROM q LEFT JOIN per ON per.query_id = q.vec_id
)
SELECT label,
       CAST(count(*) AS INTEGER) AS n_queries,
       round(CAST(sum(rbo_u) AS BIGINT)
             / (count(*) * {_RBO_NORM_U}.0), 6) AS mean_rbo,
       round(min(rbo_u) / {_RBO_NORM_U}.0, 6) AS min_rbo
FROM pq GROUP BY 1
"""


@query(
    "similarity_rbo_quantized",
    oracle=_RBO_SQL,
    description="rank-biased overlap (Webber-Moffat-Zobel RBO, p=0.9, "
    "truncated at k=10) between the exact cosine ranking and the "
    "int8-compressed ranking, per label over a 1/5 query split — the "
    "top-weighted agreement metric recall@k can't give (recall treats "
    "rank 1 and rank 10 the same; RBO decays geometrically, which is "
    "what matters when only the first few neighbors are ever shown): "
    "the go/no-go number for serving the 4x-smaller compressed index "
    "without rescoring; per-item contributions are pinned integer "
    "pico-unit coefficients (the periodogram basis move) so per-query "
    "RBO is an exact BIGINT sum, and the compressed ranking orders "
    "exact integer code dots (bit-identical across engines)",
)
def similarity_rbo_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import quantized_rank_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") % 5 == 0)
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    a = brute_force_topk(corpus, queries, k=_K)
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    a = a.select(
        "query_id", "neighbor_id", F.row_number().over(wa).alias("ra")
    )
    b = quantized_rank_topk(corpus, queries, k=_K).withColumnRenamed(
        "approx_rank", "rb"
    )
    coef = F.array(*[F.lit(c) for c in _RBO_COEF_U])
    per = (
        a.join(b, ["query_id", "neighbor_id"])
        .select(
            "query_id",
            F.element_at(
                coef, F.greatest(F.col("ra"), F.col("rb")).cast("int")
            ).alias("c_u"),
        )
        .groupBy("query_id")
        .agg(F.sum("c_u").alias("rbo_u"))
    )
    pq = (
        queries.select(F.col("vec_id").alias("query_id"), "label")
        .join(per, "query_id", "left")
        .select(
            "label",
            F.coalesce(F.col("rbo_u"), F.lit(0).cast("long")).alias("rbo_u"),
        )
    )
    n = F.count(F.lit(1))
    return pq.groupBy("label").agg(
        n.cast("int").alias("n_queries"),
        F.round(F.sum("rbo_u") / (n * F.lit(float(_RBO_NORM_U))), 6).alias(
            "mean_rbo"
        ),
        F.round(F.min("rbo_u") / F.lit(float(_RBO_NORM_U)), 6).alias(
            "min_rbo"
        ),
    )
