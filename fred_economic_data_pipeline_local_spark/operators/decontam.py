"""Test-set decontamination: flag training docs that overlap a benchmark.

The standard pre-training hygiene pass (GPT-3 §5 / PaLM-style n-gram
decontamination): any training document sharing at least one k-gram with
an evaluation benchmark is flagged (and typically dropped) so benchmark
scores measure generalization, not memorization.

Scale design: both sides reduce to hashed k-gram sets (``shingle_df`` —
codegen'd xxhash64 longs, never strings), the benchmark side is tiny by
construction (eval sets are thousands of docs, the corpus is billions),
so candidate generation is a BROADCAST semi/inner join on the 8-byte
shingle hash. The corpus never shuffles; cost is one scan + map-side
join, which is the only shape that survives a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_df


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
) -> DataFrame:
    """(id, n_hits): corpus docs sharing >= 1 k-gram with the benchmark,
    with the count of distinct shared k-grams as evidence strength.

    The benchmark shingle set is deduplicated then broadcast; the corpus
    explodes its shingles once and map-side joins. Docs with zero overlap
    do not appear (callers left-anti against this to keep the clean set).
    """
    corpus_sh = shingle_df(corpus, text_col, id_col, shingle_k)
    bench_sh = (
        shingle_df(benchmark, text_col, id_col, shingle_k)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    ex = corpus_sh.select("id", F.explode("sh").alias("s"))
    return (
        ex.join(F.broadcast(bench_sh), "s")
        .groupBy("id")
        .agg(F.count_distinct("s").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    min_hits: int = 1,
) -> DataFrame:
    """The clean corpus: drop docs with >= min_hits shared k-grams.

    ``min_hits`` > 1 tolerates incidental single-n-gram collisions
    (common with small k); the flagged set is computed once and
    broadcast-anti-joined back onto the corpus rows.
    """
    flagged = contamination_hits(
        corpus, benchmark, text_col, id_col, shingle_k
    ).where(F.col("n_hits") >= min_hits)
    return corpus.join(
        F.broadcast(flagged.select(F.col("id").alias(id_col))),
        id_col,
        "left_anti",
    )


def lsh_contamination_candidates(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    planes: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = 1000,
    corpus_sig: DataFrame | None = None,
    bench_sig: DataFrame | None = None,
) -> DataFrame:
    """(id, bench_id) candidate pairs for the semantic screen when the
    benchmark outgrows broadcast: multi-table hyperplane signatures on
    BOTH sides (same data-independent xxhash64 planes, so signatures
    computed in separate passes collide consistently), equi-joined on
    (t, sig) — a narrow-key shuffle join instead of the broadcast
    nested-loop the exact path uses. Approximate by construction: a
    pair colliding in no table is missed, with the same recall curve as
    ``similarity.cosine_neardup_lsh`` (-> 1 as similarity rises).

    ``bucket_cap`` drops degenerate BENCH buckets (e.g. the all-zero
    signature) by (t, sig) count — the bench index is eval-set-sized so
    the hot-bucket list broadcasts. ``corpus_sig``/``bench_sig`` inject
    precomputed/persisted (id, t, sig) tables (the oracle-export and
    production persisted-index hook).
    """
    from .similarity import multitable_sig_table

    if corpus_sig is None:
        corpus_sig = multitable_sig_table(corpus_emb, planes, tables, id_col, vec_col)
    if bench_sig is None:
        bench_sig = multitable_sig_table(bench_emb, planes, tables, id_col, vec_col)
    b = bench_sig.select(F.col("id").alias("bench_id"), "t", "sig")
    if bucket_cap is not None:
        hot = (
            b.groupBy("t", "sig")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > bucket_cap)
            .select("t", "sig")
        )
        b = b.join(F.broadcast(hot), ["t", "sig"], "left_anti")
    return corpus_sig.join(b, ["t", "sig"]).select("id", "bench_id").distinct()


def embedding_contamination_hits(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Semantic decontamination: per-corpus-vector count of benchmark
    vectors above a cosine threshold, plus the worst (max) similarity.

    The embedding-space counterpart of ``contamination_hits``: n-gram
    overlap misses paraphrased test-set leakage (same content, rewritten
    surface), which is precisely what embedding similarity catches — the
    screen modern eval-hygiene pipelines run alongside the GPT-3-style
    n-gram check. Returns (id, n_bench_hits, max_cos) for contaminated
    vectors only; the caller anti-joins to drop them.

    Scale shape: the benchmark side is small by construction (an eval
    set), so it broadcasts and the corpus streams through one scan —
    no shuffle of corpus vectors; the output aggregate shuffles one
    narrow row per CONTAMINATED vector only. When the benchmark
    outgrows broadcast, pass ``candidates`` — an (id, bench_id) pair
    frame from ``lsh_contamination_candidates`` (or any persisted
    candidate index): the nested-loop join is then replaced by plain
    equi-joins hydrating the candidate pairs with their vectors, and no
    side needs to broadcast (hit sets are contained in the exact
    screen's, pinned in tests/test_curation.py).
    """
    from .similarity import dot, l2_norm, _as_double

    # each side's norm is computed ONCE per row before the pair join
    # (same association as the oracle's sqrt(list_dot_product(x, x)),
    # so dot/(|a|·|b|) is value-identical to cosine()) — the NL-join
    # condition then evaluates one dot per pair instead of three folds,
    # a measured 2.5x on the exact screen. (Measured dead end: a static
    # element_at chain for the pair dot is SLOWER here — the NL-join
    # condition runs interpreted Expression.eval, where a 127-node tree
    # costs more per pair than the fold.)
    c = corpus_emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    b = bench_emb.select(
        F.col(id_col).alias("__bid"), _as_double(F.col(vec_col)).alias("__bv")
    ).withColumn("__bn", l2_norm(F.col("__bv")))
    cos = dot(F.col("__cv"), F.col("__bv")) / (F.col("__cn") * F.col("__bn"))
    if candidates is None:
        pairs = c.join(F.broadcast(b), cos >= F.lit(threshold))
    else:
        cand = candidates.select("id", F.col("bench_id").alias("__bid"))
        pairs = (
            cand.join(c, "id").join(b, "__bid").where(cos >= F.lit(threshold))
        )
    return pairs.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.round(F.max(cos), 6).alias("max_cos"),
    )
