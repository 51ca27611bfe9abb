"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Catalyst built-ins (split/filter/transform/
aggregate lambdas run JVM-side inside codegen) — zero Python UDFs, so these
scale linearly with input and never leave the executor JVM. Each operator
is a narrow projection: no shuffle at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
