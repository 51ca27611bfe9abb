"""Declarative data-quality expectations (Delta Live Tables' expect/
expect_or_drop reduced to core, the Great Expectations contract shape).

The reference validates implicitly (drops null/"." observations,
transform_fred_data.py:60-75); a production ingest wants the contract
DECLARED: named boolean rules evaluated in one scan, a violations
report for monitoring, and a quarantine split so bad rows land in a
dead-letter table instead of silently vanishing.

Rules are SQL boolean expressions over the row (evaluated with
``F.expr`` — Catalyst-compiled, codegen'd, never Python). Referential
rules (key exists in a dimension) are expressed by the caller as a
broadcast semi-join flag column before validation — see the catalog
query — keeping this module single-scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _flags(df: DataFrame, rules: dict[str, str]) -> tuple[DataFrame, list]:
    if not rules:
        raise ValueError("expectations need at least one rule")
    cols = []
    flagged = df
    for i, (name, expr) in enumerate(rules.items()):
        c = f"__ok_{i}"
        # a rule that cannot evaluate (null comparison) counts as a
        # violation — unknown is not a pass in a quality gate
        flagged = flagged.withColumn(
            c, F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        )
        cols.append((name, c))
    return flagged, cols


def expectations_report(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_frac).

    Single scan, one aggregate row exploded to long form (the
    ``profile_columns`` plan shape) — no per-rule passes, no shuffle of
    the data."""
    flagged, cols = _flags(df, rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for _, c in cols:
        aggs.append(F.sum((~F.col(c)).cast("long")).alias(f"__v_{c}"))
    wide = flagged.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{c}").alias("n_violations"),
                F.round(F.col(f"__v_{c}") / F.col("__n"), 6).alias(
                    "violation_frac"
                ),
            )
            for name, c in cols
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def quarantine(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (passing, quarantined): a row fails if ANY rule
    fails; quarantined rows carry ``violated`` — the sorted rule-name
    array — so the dead-letter table is self-describing. Both sides are
    projections of one flagged frame (single scan when both are
    consumed in one action; otherwise each side scans once — still no
    shuffle)."""
    flagged, cols = _flags(df, rules)
    violated = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~F.col(c), F.lit(name)).otherwise(F.lit(None))
                    for name, c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    with_v = flagged.withColumn("violated", violated).drop(
        *[c for _, c in cols]
    )
    good = with_v.where(F.size("violated") == 0).drop("violated")
    bad = with_v.where(F.size("violated") > 0)
    return good, bad
