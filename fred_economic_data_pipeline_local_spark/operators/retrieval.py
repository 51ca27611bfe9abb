"""Hybrid-retrieval rank fusion.

Training-data curation pipelines retrieve with BOTH a lexical leg
(BM25 over an inverted index) and a semantic leg (ANN over an
embedding index), then fuse the two rankings — reciprocal-rank fusion
(Cormack, Clarke & Buettcher 2009) is the standard parameter-free
fuser: score(d) = sum over legs of 1 / (k0 + rank_leg(d)), ranks from
each leg's top-L list, documents absent from a leg contribute 0.

The reference (a linear pandas ETL) has no retrieval surface; this is
a scale extension composing the existing ``bm25_topk`` (operators/
text.py) and ``brute_force_topk`` / IVF family (operators/similarity
.py). RRF needs only each leg's (id, rank) pairs — integer ranks from
deterministically rounded-and-tiebroken scores — so the fused score is
a short sum of exact-input divisions: cross-engine deterministic at
6 dp without any of the legs' score scales having to be comparable
(the property that makes RRF the production fuser).

Scale: each leg's list is top-L (L ~ 100s), so the fusion joins are
O(L) broadcast joins — the expensive work is inside the legs, which
keep their own scale paths (posting-list pruning, IVF cells).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_of(
    scored: DataFrame, id_col: str, score_col: str, limit: int
) -> DataFrame:
    """Integer ranks (1-based) from a scored list: order by (score
    DESC, id ASC) — the id tiebreak plus the caller's score rounding
    make the ranking engine-deterministic. The input is already a
    top-L list (O(L) rows), so the single-partition window is a
    driver-sized sort, not a corpus sort."""
    w = F.row_number().over(
        Window.orderBy(F.desc(score_col), F.asc(id_col))
    )
    return (
        scored.select(F.col(id_col).alias("id"), F.col(score_col))
        .withColumn("rank", w)
        .where(F.col("rank") <= limit)
        .select("id", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame], k0: int = 60, k: int = 10, round_dp: int = 6
) -> DataFrame:
    """Fuse (id, rank) lists by reciprocal-rank fusion. Returns the
    top-``k`` rows (id, rank_1..rank_n nullable, rrf_score) ordered by
    (rrf_score DESC, id). The contribution terms are summed in leg
    order via explicit coalesce addition (never a float aggregate), so
    any IEEE engine reproduces the score bit-for-bit."""
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranking required")
    legs = [
        r.select(F.col("id"), F.col("rank").alias(f"rank_{i + 1}"))
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), legs)
    contrib = [
        F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"rank_{i + 1}")), F.lit(0.0)
        )
        for i in range(len(legs))
    ]
    score = reduce(lambda a, b: a + b, contrib)
    return (
        joined.withColumn("rrf_score", F.round(score, round_dp))
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(k)
    )
