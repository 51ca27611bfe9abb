"""Probabilistic record linkage (Fellegi & Sunter, JASA 1969).

Entity resolution over a single master table (dedup flavor) or two
tables (linkage flavor): candidate pairs come from equi-join BLOCKING,
each pair is compared on a set of agree/disagree features, and the
match score is the sum of per-feature log-odds weights
``ln(m/u)`` (agreement) / ``ln((1-m)/(1-u))`` (disagreement), where
``m`` is the feature's agreement probability among true matches and
``u`` among non-matches. Pairs are classified by two thresholds into
match / possible / non-match — the classic three-way FS decision rule.

Scale shape: the pair generator is an equi-join on the blocking key
(never a cross join), so work is sum over blocks of O(n_b^2) — the
standard blocking bound; at 100 TB the blocking key is the lever
(sorted-neighborhood windows or LSH buckets swap in as ``block_col``
without touching the scorer). Features are plain column predicates
evaluated inside whole-stage codegen; weights are Python-computed
double literals so an external SQL engine re-deriving the score adds
the exact same IEEE doubles.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FSFeature:
    """One comparison feature: ``agree(left, right)`` is a boolean
    Column over the pair; ``m``/``u`` are the FS conditional agreement
    probabilities (0 < u < m < 1)."""

    name: str
    agree: Callable[[Callable[[str], Column], Callable[[str], Column]], Column]
    m: float
    u: float

    @property
    def w_agree(self) -> float:
        return math.log(self.m / self.u)

    @property
    def w_disagree(self) -> float:
        return math.log((1.0 - self.m) / (1.0 - self.u))


def fs_score_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    features: list[FSFeature],
    match_threshold: float,
    possible_threshold: float,
) -> DataFrame:
    """Score all within-block pairs (id_a < id_b) of ``df``.

    Returns (block, id_a, id_b, <feature flags>, score, decision) with
    ``decision`` in {'match', 'possible', 'non_match'}. The join is
    equi-keyed on ``block_col`` only; feature predicates are residual
    conditions so Catalyst keeps the sort-merge/shuffled-hash plan.
    """
    left = df.select([F.col(c).alias(f"__l_{c}") for c in df.columns])
    right = df.select([F.col(c).alias(f"__r_{c}") for c in df.columns])
    lc = lambda c: F.col(f"__l_{c}")  # noqa: E731
    rc = lambda c: F.col(f"__r_{c}")  # noqa: E731
    pairs = left.join(
        right,
        (lc(block_col) == rc(block_col)) & (lc(id_col) < rc(id_col)),
    )
    score = F.lit(0.0)
    flags = []
    for f in features:
        flag = f.agree(lc, rc)
        flags.append(flag.alias(f"agree_{f.name}"))
        score = score + F.when(flag, F.lit(f.w_agree)).otherwise(
            F.lit(f.w_disagree)
        )
    scored = pairs.select(
        lc(block_col).alias("block"),
        lc(id_col).alias("id_a"),
        rc(id_col).alias("id_b"),
        *flags,
        score.alias("score"),
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("score") >= match_threshold, F.lit("match"))
        .when(F.col("score") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_by: list[str],
    window: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo,
    SIGMOD 1995) — the other classic blocking scheme: within each block,
    sort by a fuzzy key and pair every record with its ``window``
    nearest neighbors in sort order. Where equi-blocking misses matches
    that straddle a block boundary value, SNM catches anything CLOSE in
    the sort key; pair count is exactly O(n * window), never O(n_b^2).

    Plan shape: one per-block sort assigns ranks; each record then
    explodes into ``window`` (rank + offset) probe keys and candidate
    pairs come from a pure EQUI-join on (block, rank) — no range join,
    no self-join with inequality residuals, so the plan stays
    sort-merge/shuffled-hash friendly at any scale. Returns one row per
    candidate pair: (block, id_a, id_b, rank_gap, <carry>_a, <carry>_b).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from pyspark.sql import Window as W

    carry = carry or []
    rn = F.row_number().over(
        W.partitionBy(block_col).orderBy(*order_by, id_col)
    )
    ranked = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("__id"),
        *[F.col(c).alias(f"__c_{c}") for c in carry],
        rn.alias("__rn"),
    )
    probes = ranked.select(
        "block",
        F.col("__id").alias("id_a"),
        *[F.col(f"__c_{c}").alias(f"{c}_a") for c in carry],
        F.col("__rn").alias("__rn_a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, window + 1)])
        ).alias("__off"),
    ).withColumn("__rn", F.col("__rn_a") + F.col("__off"))
    right = ranked.select(
        "block",
        F.col("__id").alias("id_b"),
        *[F.col(f"__c_{c}").alias(f"{c}_b") for c in carry],
        "__rn",
    )
    return probes.join(right, ["block", "__rn"]).select(
        "block",
        "id_a",
        "id_b",
        F.col("__off").cast("int").alias("rank_gap"),
        *[f"{c}_a" for c in carry],
        *[f"{c}_b" for c in carry],
    )
