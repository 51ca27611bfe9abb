"""Incremental view maintenance for distributive aggregates.

The classic IVM result (Gupta & Mumick's delta rules, reduced to the
SUM/COUNT case): a grouped aggregate over a table can be maintained
from a change feed alone — each feed row contributes its values
positively (insert, update post-image) or negatively (delete, update
pre-image), the per-group deltas fold into the materialized aggregate,
and groups whose row count reaches zero drop out. At 100 TB this is
the difference between re-aggregating the corpus per ingest and
touching O(|delta| + touched groups) rows.

Requires the feed form ``ManifestLakeTable.changes(...,
update_preimages=True)`` (Delta CDF's row contract): subtracting an
updated row's OLD contribution needs the old values.

Only distributive aggregates maintain this way (COUNT, SUM — and
AVG = SUM/COUNT at read time); MIN/MAX are not incrementally
maintainable under deletes without auxiliary state, and are refused
rather than silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("insert", "update_postimage")
_NEG = ("delete", "update_preimage")


def incremental_agg_delta(
    feed: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group contribution delta of a pre-image change feed:
    (group_cols..., d_count, d_sum_<c>...). One partial+final aggregate
    over the feed — the corpus never enters.

    A feed produced without ``update_preimages=True`` is detected
    (plain 'update' rows) and refused: applying post-images without
    subtracting pre-images silently double-counts.
    """
    ct = F.col("_change_type")
    sign = (
        F.when(ct.isin(*_POS), F.lit(1))
        .when(ct.isin(*_NEG), F.lit(-1))
        .otherwise(F.lit(None))
    )
    aggs = [F.sum(F.col("__sign")).alias("d_count")]
    for c in sum_cols:
        aggs.append(
            F.sum(F.col("__sign") * F.coalesce(F.col(c), F.lit(0.0))).alias(
                f"d_sum_{c}"
            )
        )
    signed = feed.withColumn("__sign", sign)
    # fail loudly on a post-image-only feed (cheap driver check on the
    # distinct types — a handful of rows)
    bad = [
        r[0]
        for r in signed.where(F.col("__sign").isNull())
        .select("_change_type")
        .distinct()
        .collect()
    ]
    if bad:
        raise ValueError(
            f"feed carries non-maintainable change types {sorted(bad)}; "
            "produce it with changes(..., update_preimages=True)"
        )
    return signed.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    agg: DataFrame, delta: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Fold a delta into a materialized aggregate
    (group_cols..., n_rows, sum_<c>...): counts and sums add null-safely
    on the group keys, brand-new groups enter, groups whose maintained
    row count reaches zero leave. Both sides are #groups-sized — the
    fold never touches base data."""
    d = delta.select(
        *[F.col(k).alias(f"__g_{k}") for k in group_cols],
        "d_count",
        *[F.col(f"d_sum_{c}") for c in sum_cols],
    )
    cond = [F.col(k).eqNullSafe(F.col(f"__g_{k}")) for k in group_cols]
    j = agg.join(d, cond, "full_outer")
    n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
        F.col("d_count"), F.lit(0)
    )
    out_cols = [
        F.coalesce(F.col(k), F.col(f"__g_{k}")).alias(k) for k in group_cols
    ] + [n.alias("n_rows")]
    for c in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0.0))
            ).alias(f"sum_{c}")
        )
    return j.select(*out_cols).where(F.col("n_rows") > 0)


def materialize_agg(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """The bootstrap aggregate in the shape ``apply_agg_delta``
    maintains: (group_cols..., n_rows, sum_<c>...)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(F.coalesce(F.col(c), F.lit(0.0))).alias(f"sum_{c}"))
    return df.groupBy(*group_cols).agg(*aggs)
