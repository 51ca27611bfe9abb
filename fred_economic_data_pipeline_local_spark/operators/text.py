"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Catalyst built-ins (split/filter/transform/
aggregate lambdas run JVM-side inside codegen) — zero Python UDFs, so these
scale linearly with input and never leave the executor JVM. Each operator
is a narrow projection: no shuffle at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny deterministic marker-word sets for the language-ID heuristic.
# Chosen for stability, not linguistic completeness; the point is a
# deterministic, oracle-checkable argmax over per-language evidence.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "des", "est", "dans", "pour", "une", "sur"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "it", "on", "for", "as", "are"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword token count: word-and-punctuation pieces.

    A BPE-flavored regex split (letters runs / digit runs / single
    punctuation) — a cheap, deterministic proxy for tokenizer cost used to
    size training corpora.
    """
    pieces = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(pieces)


def _marker_hits(toks: Column, words: list[str]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, ratios, stopword density.

    The standard pre-training quality gates (Gopher/C4-style length and
    symbol ratios) expressed as pure column arithmetic.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}]", ""))
    stop_hits = _marker_hits(toks, STOPWORDS_EN)
    mean_tok_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(n_tok.cast("double"), F.lit(1.0))
    return df.select(
        "*",
        n_char.alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        F.round(mean_tok_len, 6).alias("q_mean_token_len"),
        F.round(punct.cast("double") / F.greatest(n_char.cast("double"), F.lit(1.0)), 6).alias(
            "q_punct_ratio"
        ),
        F.round(
            stop_hits.cast("double") / F.greatest(n_tok.cast("double"), F.lit(1.0)), 6
        ).alias("q_stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language evidence counts.

    Deterministic tie policy: higher count wins; ties broken by language
    code order en < es < de < fr via strictly-greater comparison chain;
    zero evidence -> 'und'.
    """
    toks = tokens(F.lower(F.col(text_col)))
    scores = {lang: _marker_hits(toks, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # first language (in declaration order) achieving the max wins
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    out = df.select("*", *[c.alias(f"score_{lang}") for lang, c in scores.items()])
    return out.withColumn("lang_pred", pred)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text.

    Stable content address for exact-dup detection across formatting noise.
    """
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


# Gopher-style rule thresholds (Rae et al. 2021, table A1), scaled to the
# fixture corpus: the word-count floor is lowered from 50 to 20 so the rule
# discriminates on the word-soup documents (lengths 1..~120 tokens) instead
# of rejecting everything.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher-style quality rules as boolean columns + keep flag.

    The classic pre-training quality gate (Gopher §A1.1 / C4): each rule is
    an independent boolean so downstream curation can report per-rule
    rejection rates, and ``q_keep`` is their conjunction. Pure column
    arithmetic over one projection — zero shuffle, whole-stage codegen'd,
    so at 100 TB this is scan-bound. Rules:

    - ``r_word_count``: token count within [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS]
    - ``r_mean_word_len``: mean token length within [3, 10]
    - ``r_symbol_ratio``: '#'/'...' symbol-to-token ratio <= 0.1
    - ``r_alpha_words``: >= 80% of tokens contain an alphabetic character
    - ``r_stopwords``: >= 2 English stopword hits (the Gopher "has common
      words" screen)
    """
    t = F.col(text_col)
    toks = tokens(F.lower(t))
    n_tok = F.size(toks).cast("double")
    safe_n = F.greatest(n_tok, F.lit(1.0))
    mean_len = F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x)) / safe_n
    n_symbols = (
        F.size(F.regexp_extract_all(t, F.lit(r"(#|\.\.\.)"), 1)).cast("double")
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
    stop_hits = _marker_hits(toks, STOPWORDS_EN)
    rules = {
        "r_word_count": (n_tok >= GOPHER_MIN_WORDS) & (n_tok <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (mean_len >= GOPHER_MEAN_WORD_LEN[0])
        & (mean_len <= GOPHER_MEAN_WORD_LEN[1]),
        "r_symbol_ratio": (n_symbols / safe_n) <= GOPHER_MAX_SYMBOL_RATIO,
        "r_alpha_words": (n_alpha / safe_n) >= GOPHER_MIN_ALPHA_WORD_RATIO,
        "r_stopwords": stop_hits >= GOPHER_MIN_STOPWORD_HITS,
    }
    out = df.select("*", *[c.alias(name) for name, c in rules.items()])
    keep = rules["r_word_count"]
    for name in list(rules)[1:]:
        keep = keep & rules[name]
    return out.withColumn("q_keep", keep)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    oov_logprob: float | None = None,
) -> DataFrame:
    """Mean per-token corpus-unigram log-probability — a perplexity proxy.

    The cheap LM-quality screen used when a real KenLM pass is too
    expensive: score_i = mean_t log(count(t)/N) over doc i's tokens, where
    counts come from the whole corpus, or from a supplied ``vocab``
    DataFrame with columns ``tok`` (token) and ``n`` (count) — e.g.
    computed on a reference corpus. With an external vocab, tokens
    outside it score ``oov_logprob`` (default: the add-one floor
    log(1/(N+1))) rather than being dropped — OOV tokens are exactly the
    gibberish signal this screen exists to catch, so an inner join that
    silently excluded them (and dropped all-OOV docs entirely) would
    invert the ranking. Outlier-low scores mark gibberish/rare-token
    documents; outlier-high mark boilerplate.

    Plan shape: explode tokens -> groupBy(token) count (map-side partial
    agg shrinks the shuffle to |vocab| rows) -> join the exploded tokens
    back to the vocab -> per-doc avg. The vocab side of the join is
    Zipf-bounded (vocab grows ~sublinearly with corpus size) and the join
    key is the token itself, so at 100 TB this is two narrow-key shuffles;
    no window, no driver state. Returns (id, n_tokens, logprob) with
    logprob rounded to 6 dp.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    if vocab is None:
        vocab = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # rename the vocab side: it shares lineage with ex (self-referential
    # aggregate), so joining on bare column names would be ambiguous
    vocab = vocab.select(F.col("tok").alias("__vtok"), F.col("n").alias("__vn"))
    total = vocab.agg(F.sum("__vn").alias("__N"))
    oov = (
        F.lit(float(oov_logprob))
        if oov_logprob is not None
        else F.log(F.lit(1.0) / (F.col("__N") + 1))
    )
    # left join keeps OOV tokens (impossible with the default corpus
    # vocab, the screen's whole point with an external one); 1-row total
    # joined via broadcast keeps everything one codegen pass
    scored = (
        ex.join(vocab, F.col("tok") == F.col("__vtok"), "left")
        .join(F.broadcast(total))
        .select(
            "id",
            F.when(F.col("__vn").isNull(), oov)
            .otherwise(F.log(F.col("__vn") / F.col("__N")))
            .alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token windows (training chunking).

    Standard pre-training document chunking: windows of ``window`` tokens
    every ``stride`` tokens, the final partial window kept iff it starts
    before the text ends (so every token lands in >= 1 chunk and chunk 0
    always exists). Implemented as sequence+explode+slice — all codegen,
    fan-out happens executor-side, and the output inherits the input's
    partitioning (no shuffle). Returns (id, chunk_id, chunk_text,
    n_chunk_tokens).
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # chunk starts: 1, 1+stride, ... while start <= n (1-based slice)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("__tk"), starts.alias("__st")
    )
    ex = base.select(
        "id", "__tk", F.posexplode("__st").alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("__tk"), F.col("start"), F.lit(window))
    return ex.select(
        "id",
        "chunk_id",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
    )


def score_linear(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """fastText-style linear quality score: sigmoid(bias + mean token weight).

    The CCNet/LLaMA-pipeline quality-classifier shape — a bag-of-words
    linear model applied corpus-wide — expressed as pure Catalyst: the
    weight table is a literal map (model sizes are KBs; at 100 TB the
    model broadcasts, the corpus never shuffles), tokens outside the
    vocabulary contribute 0, and the per-doc reduction is a codegen'd
    aggregate over the token array — no explode, no join, no Python.
    Mean (not sum) keeps the logit length-invariant, matching fastText's
    average-of-embeddings reduction. Returns (id, n_tokens, score) with
    score rounded to 6 dp (the raw logit is deliberately not emitted —
    see the comment below).
    """
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    if weights:
        kv = []
        for tok, wt in sorted(weights.items()):
            kv.extend([F.lit(tok), F.lit(float(wt))])
        wmap = F.create_map(*kv)
        total = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(wmap[x], F.lit(0.0)),
        )
    else:  # empty model: every token is OOV
        total = F.lit(0.0)
    logit = F.lit(float(bias)) + total / F.greatest(n.cast("double"), F.lit(1.0))
    # Only the sigmoid is emitted, rounded to 6 dp. The raw logit is
    # cross-engine-hostile BOTH ways: unrounded, engines' summation
    # orders differ in the last ulp; rounded, lattice-valued weight sums
    # (w/10n) land exactly on .5e-6 boundaries where round() direction
    # legitimately differs. The sigmoid's exp() output is off-lattice, so
    # 6-dp rounding is stable (boundary hits are measure-zero).
    return df.select(
        F.col(id_col).alias("id"),
        n.cast("int").alias("n_tokens"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )


# --- winnowing fingerprints (MOSS-style rolling-hash spans) ------------------

def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowed k-gram fingerprints per document: (id, fp).

    Schleimer/Wilkerson/Aiken winnowing (SIGMOD'03, the MOSS algorithm):
    hash every k-token gram, slide a w-gram window over the hash
    sequence, keep each window's MINIMUM — the classic guarantee follows
    that any shared token run of length >= k + w - 1 between two
    documents shares at least one selected fingerprint. That makes this
    the span-level complement to set-based Jaccard: a short document
    pasted INSIDE a long one has tiny Jaccard (union dominates) but
    still collides on every fingerprint of the copied span.

    Engine-portable hashing: gram hash = first 60 bits of md5, which
    DuckDB computes bit-identically (same pattern as the md5 split
    buckets), so min-selection — which depends on hash VALUES, not just
    set membership — mirrors exactly in the oracle; xxhash64 would be
    faster but unprovable there.

    Plan shape (100 TB): posexplode -> one hash-partition exchange on
    the doc id -> ONE sort (id, pos) shared by both window passes (gram
    assembly via lead(), winnow via min() over a following frame) ->
    per-doc distinct. No self-joins, no skew beyond the longest single
    document; cost is linear in tokens. Docs shorter than k tokens
    contribute no fingerprints (no complete gram), and windows shorter
    than w (doc tail) are skipped per the algorithm.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    wo = Window.partitionBy("id").orderBy("pos")
    gram_parts = [F.col("tok")] + [F.lead("tok", j).over(wo) for j in range(1, k)]
    grams = (
        tok.withColumn("__last", F.lead("tok", k - 1).over(wo))
        .withColumn("g", F.concat_ws(" ", *gram_parts))
        .where(F.col("__last").isNotNull())
        .select(
            "id",
            "pos",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    fw = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(fw))
        .withColumn("__w", F.count(F.lit(1)).over(fw))
        .where(F.col("__w") == w)
        .select("id", "fp")
        .distinct()
    )


def span_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    fp_cap: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowed fingerprints:
    (id_a, id_b, n_shared, containment) — span-level near-dup and
    containment candidates. ``containment`` = n_shared / min(|fp_A|,
    |fp_B|): the fraction of the SMALLER document's fingerprints found
    in the pair, i.e. the asymmetric overlap measure winnowing exists
    for — a short doc pasted verbatim inside a long one scores ~1.0
    here while its Jaccard stays near zero (union dominates). Under
    ``fp_cap`` both the numerator and the per-doc counts exclude capped
    (boilerplate) fingerprints, so the score stays consistent.

    The fingerprint table is tiny relative to the corpus (~2/(w+1) of
    the gram count per doc, deduplicated), and the pair generation is a
    narrow equi-join on the 8-byte fingerprint — the same inverted-index
    shape as the posting-based Jaccard join, with winnowing doing the
    density reduction up front.

    Density reduction is not skew immunity: a boilerplate span present
    in d documents ("all rights reserved…") still puts ONE shared
    fingerprint in d posting rows and costs d² candidate pairs in the
    equi-join, exactly the hot-shingle failure mode of the Jaccard path.
    ``fp_cap`` drops fingerprints whose corpus document frequency
    exceeds the cap before the join — same shape as ``df_cap`` there:
    hot-fp set via partial-aggregated groupBy (one row per distinct fp
    shuffles, not per posting) then a broadcast anti-join, bounding the
    join at Σ_fp min(d_fp, fp_cap)². A dropped fingerprint cannot count
    toward ``n_shared``, so overlap is UNDERcounted for pairs sharing a
    capped (i.e. ubiquitous-boilerplate) span — possible false
    negatives, never false positives. Default None: exact, matching the
    DuckDB oracle; 100 TB callers opt in explicitly.
    """
    # checkpoint BEFORE deriving the hot set so the winnowing subtree is
    # computed once, not once per consumer (hot aggregate + both join sides)
    fps = winnow_fingerprints(df, text_col, id_col, k, w).localCheckpoint()
    if fp_cap is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > fp_cap)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), ["fp"], "left_anti")
    counts = fps.groupBy("id").agg(F.count(F.lit(1)).alias("__nfp"))
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .join(counts.select(F.col("id").alias("id_a"), F.col("__nfp").alias("__na")), "id_a")
        .join(counts.select(F.col("id").alias("id_b"), F.col("__nfp").alias("__nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("__na", "__nb").cast("double"), 6
            ).alias("containment"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k terms by tf-idf — the classic keyword extractor.

    tfidf(d, t) = tf(d, t) * ln(N / df(t)) with raw counts (no smoothing:
    a term in every document scores exactly 0, which is the behavior the
    screen wants — boilerplate terms vanish from every doc's keyword
    list). Ties broken by term ascending, so the result is deterministic.

    Plan shape: explode tokens -> groupBy(id, term) count (tf) ->
    groupBy(term) count of the tf rows (df — each (id, term) row is one
    distinct doc, so no countDistinct shuffle) -> join tf to the
    Zipf-bounded df table on the term -> per-doc row_number top-k. At
    100 TB: the exploded projection carries only (id, term); both
    aggregations map-side combine; the df-side of the join grows with
    vocabulary (~sublinear), not corpus; the final window partitions by
    doc id, which is the same key tf was already shuffled on.
    Returns (id, term, tf, tfidf) with tfidf rounded to 6 dp.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).where(F.col("term") != "")
    tf = ex.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.agg(F.count_distinct(F.col(id_col)).alias("__N"))
    scored = (
        tf.join(dfreq.withColumnRenamed("term", "__dt"), tf.term == F.col("__dt"))
        .join(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log(F.col("__N") / F.col("__df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def topk_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k word n-grams by frequency.

    The corpus-statistics primitive behind boilerplate mining and
    contamination screening: which n-token sequences dominate the corpus.
    N-grams are built JVM-side with transform over an index sequence
    (element_at is 1-based), so a doc with fewer than ``n`` tokens
    contributes nothing and no Python runs anywhere.

    Plan shape: per-row n-gram array -> explode -> groupBy(ngram) count
    -> global top-k. The single shuffle is on the n-gram string with
    map-side partial aggregation, so executors ship one row per distinct
    n-gram per partition, not one per occurrence; the final top-k is a
    TakeOrderedAndProject on the already-aggregated (Zipf-bounded)
    distinct set. Ties broken by n-gram ascending. Returns (ngram, freq).
    """
    toks = tokens(F.lower(F.col(text_col)))
    # n-gram build via arrays_zip of n shifted slices — the shingle_df
    # shape: slice/arrays_zip/concat_ws all run inside whole-stage
    # codegen, where a transform+element_at build runs interpreted per
    # gram (measured 6.96 s -> sub-second at sf0.1 for this query).
    # Docs shorter than n produce zero-length slices -> empty zip ->
    # nothing explodes, no branch needed.
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(n)])
    counts = (
        df.select(F.explode(zipped).alias("z"))
        .select(
            F.concat_ws(" ", *[F.col("z")[str(j)] for j in range(n)]).alias(
                "ngram"
            )
        )
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return counts.orderBy(F.desc("freq"), F.asc("ngram")).limit(k)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib-compressibility quality signal: ratio = deflated / raw bytes.

    The cheap information-density gate from the RefinedWeb/FineWeb
    family: near-zero ratios flag repetitive boilerplate (a compressor
    is the ultimate duplicate-span detector), ratios near or above 1
    flag high-entropy gibberish; natural prose sits in between. zlib at
    a fixed level is deterministic, so the signal is reproducible —
    but it is a C library call, not SQL, so this runs at the codec edge
    as Arrow-batched ``mapInPandas`` (the same slow-path contract as
    the PNG/PGM codecs: Python touches each row once, everything before
    and after stays JVM-side; no per-row Python UDF, no driver collect).
    Scale shape: embarrassingly parallel scan, zero shuffles; at 100 TB
    the cost is the deflate itself, amortized across executors.
    Returns (id, n_bytes, n_deflate, ratio) with ratio rounded to 6 dp;
    empty/null docs get ratio NULL (no bytes to measure, not 0/0).
    """
    from typing import Iterator

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("id", LongType(), True),
            StructField("n_bytes", IntegerType(), True),
            StructField("n_deflate", IntegerType(), True),
            StructField("ratio", DoubleType(), True),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("__t")
    )

    def _deflate(batches: Iterator) -> Iterator:
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                None if t is None else t.encode("utf-8") for t in pdf["__t"]
            ]
            n_bytes = [None if b is None else len(b) for b in raw]
            n_defl = [
                None if b is None else len(zlib.compress(b, level)) for b in raw
            ]
            ratio = [
                round(d / n, 6) if n else None
                for n, d in zip(n_bytes, n_defl)
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pd.array(n_bytes, dtype="Int32"),
                    "n_deflate": pd.array(n_defl, dtype="Int32"),
                    "ratio": pd.array(ratio, dtype="Float64"),
                }
            )

    return src.mapInPandas(_deflate, out_schema)


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-k vocabulary with cumulative corpus coverage — the Zipf curve
    a tokenizer-vocab decision reads ("the top N tokens cover X% of the
    corpus").

    Plan shape: explode -> one map-combined count shuffle on the token
    (the same single-exchange scan ``topk_ngrams`` does) -> TakeOrdered
    cuts to k rows BEFORE any window, so the running-sum window runs
    over k rows, not the vocabulary — a global sort of the full vocab
    never happens. The corpus-total token count joins as a 1-row
    broadcast. Ties broken by token ascending everywhere.
    Returns (rank, token, freq, share, cum_share) — doubles 6 dp.
    """
    ex = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    counts = (
        ex.where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("__N"))
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.join(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "freq",
            F.round(F.col("freq") / F.col("__N"), 6).alias("share"),
            F.round(F.sum("freq").over(wsum) / F.col("__N"), 6).alias(
                "cum_share"
            ),
        )
    )


def _java_regex_quote(s: str) -> str:
    """Escape a literal for Java regex (pattern position)."""
    return "".join(ch if ch.isalnum() else "\\" + ch for ch in s)


def _java_repl_quote(s: str) -> str:
    """Escape a literal for Java regex replacement position ($ and backslash)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
):
    """Learn the top-``n_merges`` BPE merges over the corpus.

    Byte-pair-encoding vocabulary induction as iterative Spark jobs --
    the real construction behind "train a tokenizer on the corpus". The
    loop state is the DISTINCT-WORD table (word, frequency, symbols):
    Zipf-bounded, so each round's pair count aggregates a
    vocabulary-sized table no matter how large the corpus is -- the
    corpus is scanned exactly once, up front. Per round:

    1. count adjacent symbol pairs weighted by word frequency
       (explode -> one map-combined shuffle on the (a, b) pair);
    2. pick the argmax (ties broken by (a, b) ascending -- the
       deterministic tie policy a reproducible tokenizer needs); the
       single-row collect is a model/control-flow decision like the
       Lloyd-iteration centroid state, not a data-path collect;
    3. apply the merge to every word via one regexp_replace (greedy
       non-overlapping left-to-right -- Java regex and the classic BPE
       scan agree, pinned against a pure-Python reference in
       ``tests/test_text_ops.py``), then localCheckpoint the small
       vocab table so round k+1 does not replay rounds 1..k.

    Stops early when the best pair's frequency drops below
    ``min_freq``. Returns (merges, vocab): ``merges`` a list of
    (left, right, freq) in rank order, ``vocab`` the final symbolized
    distinct-word DataFrame (w, wf, sym).
    """
    if n_merges < 0 or min_freq < 1:
        raise ValueError(
            f"need n_merges >= 0 and min_freq >= 1, got {n_merges}, {min_freq}"
        )
    words = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # "hello" -> "h e l l o": split into chars, join with single spaces
    vocab = words.withColumn(
        "sym", F.array_join(F.split(F.col("w"), ""), " ")
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms = F.split(F.col("sym"), " ")
        n = F.size(syms)
        pairs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.struct(
                    F.element_at(syms, i.cast("int")).alias("a"),
                    F.element_at(syms, (i + 1).cast("int")).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            vocab.select(F.explode(pairs).alias("p"), "wf")
            .groupBy("p")
            .agg(F.sum("wf").alias("n"))
            .orderBy(F.desc("n"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_freq:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b, int(top[0]["n"])))
        pat = (
            "(?<=^|\\s)" + _java_regex_quote(a) + " "
            + _java_regex_quote(b) + "(?=\\s|$)"
        )
        vocab = vocab.withColumn(
            "sym", F.regexp_replace("sym", pat, _java_repl_quote(a + b))
        ).localCheckpoint()
    return merges, vocab


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge list: (id, n_words, n_bpe_tokens).

    Applying k merges is k chained regexp_replace expressions over the
    spaced-symbol form of each word -- one projection, no loop state,
    no Python: the merge list is baked into the plan the way the
    quality-classifier weights are. Token count = symbols remaining
    after all merges; merges never cross word boundaries because each
    word is symbolized independently.
    """

    def apply_merges(sym: Column) -> Column:
        out = sym
        for a, b, _ in merges:
            pat = (
                "(?<=^|\\s)" + _java_regex_quote(a) + " "
                + _java_regex_quote(b) + "(?=\\s|$)"
            )
            out = F.regexp_replace(out, F.lit(pat), F.lit(_java_repl_quote(a + b)))
        return out

    word_syms = F.transform(
        tokens(F.lower(F.col(text_col))),
        lambda w: F.array_join(F.split(w, ""), " "),
    )
    n_bpe = F.aggregate(
        F.transform(word_syms, lambda s: F.size(F.split(apply_merges(s), " "))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
    )



def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram-LM mean log-probability per doc.

    The step up from ``unigram_logprob`` when the unigram screen is too
    blunt: score_i = mean_t ln( lam*P(cur|prev) + (1-lam)*P(cur) ) with
    corpus-estimated counts; a document's first token (no prev) scores
    pure unigram. Word-salad documents share the unigram distribution
    with clean prose but not the bigram transitions, which is exactly
    the gap this screen measures.

    Plan shape: (prev, cur) pairs are built JVM-side with a transform
    over the token array (no window, no per-doc sort), then exploded;
    the three count tables (bigram, unigram-as-prev, unigram) are
    Zipf-bounded aggregates of that same exploded projection, joined
    back on the token strings; N enters as a 1-row broadcast. At
    100 TB: one explode-shuffle per count table, vocabulary-sized join
    sides, per-doc avg on the id — the same narrow-key discipline as
    tf-idf. Returns (id, n_tokens, logprob 6dp).
    """
    toks = tokens(F.lower(F.col(text_col)))
    # (prev, cur) via arrays_zip of the null-prepended shift — arrays_zip/
    # slice/concat all codegen, where a transform+element_at build runs
    # interpreted per token (measured 13 s -> 1.5 s at sf0.1 across this
    # operator's four consumers before the rewrite); arrays_zip pads the
    # shorter side with null, so the one extra tail entry (cur IS NULL)
    # filters out and the first real entry carries prev IS NULL
    shifted = F.concat(F.array(F.lit(None).cast("string")), toks)
    ex = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.arrays_zip(shifted, toks)).alias("p"),
        )
        .select("id", F.col("p.0").alias("prev"), F.col("p.1").alias("cur"))
        .where(F.col("cur").isNotNull())
    )
    # one fan-out point, four consumers (uni / prev / bigram counts and
    # the probe side): checkpoint the narrow (id, prev, cur) projection
    # so the explode runs once, the minhash_banded pattern
    ex = ex.localCheckpoint()
    uni = ex.groupBy("cur").agg(F.count(F.lit(1)).alias("cn")).select(
        F.col("cur").alias("__u"), F.col("cn").alias("__cn")
    )
    prevn = ex.where(F.col("prev").isNotNull()).groupBy("prev").agg(
        F.count(F.lit(1)).alias("pn")
    ).select(F.col("prev").alias("__pw"), F.col("pn").alias("__pn"))
    bi = ex.where(F.col("prev").isNotNull()).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("bn")
    ).select(
        F.col("prev").alias("__bp"), F.col("cur").alias("__bc"),
        F.col("bn").alias("__bn"),
    )
    total = uni.agg(F.sum("__cn").alias("__N"))
    scored = (
        ex.join(uni, ex.cur == F.col("__u"))
        .join(prevn, ex.prev == F.col("__pw"), "left")
        .join(
            bi,
            (ex.prev == F.col("__bp")) & (ex.cur == F.col("__bc")),
            "left",
        )
        .join(F.broadcast(total))
    )
    p_uni = F.col("__cn") / F.col("__N")
    p_bi = F.coalesce(F.col("__bn") / F.col("__pn"), F.lit(0.0))
    lp = F.when(
        F.col("prev").isNull(), F.log(p_uni)
    ).otherwise(F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni))
    return scored.select("id", lp.alias("__lp")).groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.round(F.avg("__lp"), 6).alias("logprob"),
    )


def unigram_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    top_n: int = 25,
) -> DataFrame:
    """Token-distribution drift between corpus snapshots: per-token
    contributions to KL(new ‖ old) over add-alpha-smoothed unigram
    distributions, top ``top_n`` tokens by |contribution|.

    ``profile_drift`` alerts on column-level shape (null rates,
    cardinalities); this is the CONTENT-level monitor — a quiet change
    in corpus composition (a new boilerplate phrase, a source switching
    language, a scraper echoing markup) moves probability mass between
    tokens and surfaces here long before aggregate counts move.
    Smoothing puts both distributions on the union vocabulary so
    appearing/vanishing tokens contribute finite mass instead of
    infinities.

    Output: (token, p_new, p_old, contribution), ranked by
    |contribution| desc with token tiebreak; contribution > 0 marks
    tokens over-represented in the new snapshot. Values rounded to 6 dp
    before ranking (the ln discipline ``bigram_logprob`` pinned).

    Scale shape: two Zipf-bounded token-count aggregates, one
    full-outer equi-join on token, three broadcast scalars (totals and
    vocabulary size), a top-n. Nothing scales with document size but
    the token explode; nothing is all-pairs.
    """
    from pyspark.sql.functions import broadcast

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
            )
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias(out))
        )

    c_old = counts(old, "cn_old")
    c_new = counts(new, "cn_new")
    vocab = c_old.join(c_new, "token", "full_outer").select(
        "token",
        F.coalesce("cn_old", F.lit(0)).alias("cn_old"),
        F.coalesce("cn_new", F.lit(0)).alias("cn_new"),
    )
    totals = vocab.agg(
        F.sum("cn_old").alias("n_old"),
        F.sum("cn_new").alias("n_new"),
        F.count("*").alias("v"),
    )
    p_new = (F.col("cn_new") + alpha) / (F.col("n_new") + alpha * F.col("v"))
    p_old = (F.col("cn_old") + alpha) / (F.col("n_old") + alpha * F.col("v"))
    scored = vocab.crossJoin(broadcast(totals)).select(
        "token",
        F.round(p_new, 6).alias("p_new"),
        F.round(p_old, 6).alias("p_old"),
        F.round(p_new * F.log(p_new / p_old), 6).alias("contribution"),
    )
    # top-n as TakeOrderedAndProject: the old row_number() OVER
    # (ORDER BY ...) filter pushed the whole Zipf-bounded vocabulary
    # through one WindowExec task — orderBy().limit() plans a
    # per-partition heap + driver merge, identical row set
    return scored.orderBy(
        F.desc(F.abs(F.col("contribution"))), F.asc("token")
    ).limit(top_n)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a term query under BM25 (Lucene's variant).

    The retrieval primitive behind corpus search and RAG candidate
    generation: score(d) = sum over query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
    with the Robertson idf ln(1 + (N - df + 0.5) / (df + 0.5)) that is
    always positive (Lucene's BM25Similarity). Parity with the
    reference's retrieval semantics is N/A (the reference has no search
    operator); this is a training-data-pipeline extension.

    Plan shape (the inverted-index shape, so it scales with the POSTING
    LISTS of the query terms, not with the corpus):
    - explode tokens, keep only query terms (an 8-entry broadcast array
      filter applied before any shuffle — at 100 TB this is the posting
      scan: only rows for queried terms survive the projection);
    - tf per (doc, term) via one map-combined shuffle on (doc, term);
    - df per term from the tf rows (|terms| rows — broadcast);
    - dl (doc token count) is a narrow projection joined on the doc id;
      avgdl is an exact integer-sum aggregate broadcast as one row;
    - per-doc score sum reuses the doc-id shuffle; TakeOrdered top-k.

    Per-term contributions are rounded to 10 dp before the per-doc sum
    and the summed score to 6 dp, so partial-aggregation order cannot
    leak into the hash; ties break by doc id ascending.
    """
    qset = F.array(*[F.lit(t) for t in query_terms])
    toks = df.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col))).alias("__tk"),
    ).select("id", F.filter("__tk", lambda t: t != "").alias("__tk"))
    # posting scan: only query-term occurrences survive the projection
    ex = toks.select(
        "id",
        F.size("__tk").alias("dl"),
        F.explode(F.filter("__tk", lambda t: F.array_contains(qset, t))).alias(
            "term"
        ),
    )
    tf = ex.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # exact integer sums -> avgdl identical across engines
    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__tk")).alias("sum_dl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(corpus))
        .select("id", F.round(contrib, 10).alias("__c"))
        .groupBy("id")
        .agg(F.round(F.sum("__c"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


# ln(2) computed once in Python and shared as a literal with any SQL
# mirror — no cross-engine libm divergence on the constant (the Benford/
# Fellegi-Sunter shared-literal discipline).
LN2: float = 0.6931471805599453


def js_divergence_by_group(
    df: DataFrame, group: str, text_col: str = "text"
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each ``group``'s unigram
    distribution p and the CORPUS distribution q — the
    distribution-level drift/outlier screen for source mixing (symmetric
    and bounded by ln 2, unlike KL, so sources are comparable).

    The missing-token mass is closed-form: tokens absent from a source
    have p = 0 and contribute 0.5·q·ln 2 each, so

        JSD = sum over tokens IN the source of
                0.5 p ln(2p/(p+q)) + 0.5 q ln(2q/(p+q))
              + 0.5 ln 2 · (1 - coverage),
        coverage = sum over tokens IN the source of q

    — no outer join against the corpus vocabulary, ever. Plan shape:
    one (group, token) count exchange; corpus token totals re-aggregate
    that frame (never a second scan) and join back keyed by token; one
    per-group rollup. p and q are ratios of exact integer counts; ln is
    libm-rounded identically enough that the 6 dp output rounding
    absorbs it (the entropy-family precedent); ln 2 is a shared literal.

    Returns one row per group:
    (group, n_tokens, vocab, coverage, jsd_nats).
    """
    cnt = (
        df.select(
            F.col(group),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "tok"
            ),
        )
        .groupBy(group, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_g = cnt.groupBy(group).agg(F.sum("c").alias("__ng"))
    corpus = cnt.groupBy("tok").agg(F.sum("c").alias("__ct"))
    tot = corpus.agg(F.sum("__ct").alias("__n_all"))
    j = (
        cnt.join(corpus, "tok")
        .join(F.broadcast(n_g), group)
        .join(F.broadcast(tot))
    )
    p = F.col("c").cast("double") / F.col("__ng")
    q = F.col("__ct").cast("double") / F.col("__n_all")
    term = F.lit(0.5) * p * F.log(2 * p / (p + q)) + F.lit(0.5) * q * F.log(
        2 * q / (p + q)
    )
    return (
        j.groupBy(group)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(q).alias("__cov"),
            F.sum(term).alias("__jin"),
        )
        .select(
            group,
            "n_tokens",
            "vocab",
            F.round(F.col("__cov"), 6).alias("coverage"),
            F.round(
                F.col("__jin")
                + F.lit(0.5) * F.lit(LN2) * (1 - F.col("__cov")),
                6,
            ).alias("jsd_nats"),
        )
    )


def readability_scores(
    df: DataFrame,
    group: str,
    text_col: str = "text",
    long_len: int = 7,
) -> DataFrame:
    """Per-``group`` readability profile built on the LIX index
    (Björnsson 1968 — language-agnostic, syllable-free, so it is exactly
    computable from deterministic counts):

        LIX = words / sentences + 100 · long_words / words

    with sentences = runs of ``[.!?]`` (min 1) and long words = tokens
    of ``long_len``+ chars. The boilerplate/complexity screen a quality
    gate reads next to the Gopher flags: very low = fragmentary/listy
    text, very high = run-on machine text.

    All per-document quantities are exact integers from one narrow
    projection (regexp + split built-ins, JVM-side); per-group averages
    of their exact ratios round 6 dp. Returns one row per group:
    (group, n_docs, avg_words_per_sentence, long_word_share, avg_lix).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        F.lit(1),
    )
    n_words = F.greatest(F.size(toks), F.lit(1))
    n_long = F.size(
        F.filter(toks, lambda x: F.length(x) >= F.lit(long_len))
    )
    per_doc = df.select(
        F.col(group),
        n_words.alias("__w"),
        n_sent.alias("__s"),
        n_long.alias("__l"),
    )
    wps = F.col("__w").cast("double") / F.col("__s")
    lix = wps + 100 * F.col("__l").cast("double") / F.col("__w")
    return per_doc.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(wps), 6).alias("avg_words_per_sentence"),
        F.round(
            F.sum("__l").cast("double") / F.sum("__w"), 6
        ).alias("long_word_share"),
        F.round(F.avg(lix), 6).alias("avg_lix"),
    )
