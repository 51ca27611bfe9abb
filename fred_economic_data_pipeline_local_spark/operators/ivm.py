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
AVG = SUM/COUNT at read time) from the feed ALONE. MIN/MAX need more:
an insert folds into the extreme monotonically, but deleting the
current extreme invalidates it. ``apply_minmax_delta`` implements the
standard recompute-on-invalidation form — groups whose feed deletes
never touch the current extreme maintain in O(|delta|); only the
groups where a delete hits the recorded min/max re-aggregate, and only
their rows of the (post-change) base are read. The reference's silver
layer keeps exactly such a maintained extreme
(``max(ingested_at)`` per series — transform_fred_data.py:124-128).
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
    aggs = [F.sum(F.col("__sign")).alias("d_count")]
    for c in sum_cols:
        aggs.append(
            F.sum(F.col("__sign") * F.coalesce(F.col(c), F.lit(0.0))).alias(
                f"d_sum_{c}"
            )
        )
    return _signed(feed).groupBy(*group_cols).agg(*aggs)


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


def materialize_minmax(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """Bootstrap extreme aggregate in the shape ``apply_minmax_delta``
    maintains: (group_cols..., n_rows, min_<col>, max_<col>). min/max
    skip nulls (SQL semantics); n_rows counts every row."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
    )


def _signed(feed: DataFrame) -> DataFrame:
    """Attach +1/-1 signs; refuse post-image-only feeds (shared by the
    SUM/COUNT and MIN/MAX paths).

    The signed feed is PERSISTED before the validation collect: the
    r14 form ran the validation as a separate uncached pass, so the
    whole change-feed diff (two bucket-slice reads + the keyed diff
    join) executed once for the ValueError check and again per
    downstream consumer — the minmax path alone reads the feed three
    more times (delta aggregate, fast branch, recompute gate). Now the
    validation pass fills the cache and every consumer reads it: one
    diff execution total, same build-time ValueError. (An embedded
    raise_error was tried instead — its non-determinism blocks subtree
    reuse and pushdown, and the minmax fold re-executed the diff per
    branch: 7.3 s -> 54 s at sf0.1. Feeds are delta-sized by
    construction, so the cache is bounded; the session's cache
    clearing releases it.)"""
    ct = F.col("_change_type")
    sign = (
        F.when(ct.isin(*_POS), F.lit(1))
        .when(ct.isin(*_NEG), F.lit(-1))
        .otherwise(F.lit(None))
    )
    signed = feed.withColumn("__sign", sign).persist()
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
    return signed


def apply_minmax_delta(
    agg: DataFrame,
    feed: DataFrame,
    base: DataFrame,
    group_cols: list[str],
    col: str,
) -> DataFrame:
    """Maintain (group_cols..., n_rows, min_<col>, max_<col>) through a
    pre-image change feed, the recompute-on-invalidation form:

    - inserts/update-postimages fold monotonically —
      ``least(cur_min, ins_min)`` / ``greatest(cur_max, ins_max)``;
    - a delete/update-preimage whose value ties the group's CURRENT
      recorded extreme invalidates it: those groups (and only those)
      re-aggregate from ``base``, the post-change table state. The
      affected-group keys are a tiny frame joined against base — at
      scale a broadcast semi-join, so the recompute reads the touched
      groups' rows, never the corpus. Feed groups unknown to ``agg``
      that carry deletes also recompute (defensive: such a feed is
      out-of-sync with the materialized state).

    O(|delta| + touched groups) when no extreme is hit;
    O(rows of invalidated groups) when one is — the auxiliary-state
    alternative (count-per-value sketch) trades that recompute for
    per-group state proportional to value cardinality; at lake scale
    the recompute path is the standard choice (extremes are deleted
    rarely; the sketch is paid always).
    """
    g = group_cols
    # the incoming state is referenced by three consumers (the fold
    # join feeds the fast branch, the invalidation gate, and the
    # recompute keys) — persist it so a CHAINED fold (hop N's state is
    # hop N-1's whole plan) doesn't re-execute the prior hops per
    # consumer. #groups-sized by construction.
    agg = agg.persist()
    signed = _signed(feed)
    v = F.col(col)
    fd = signed.groupBy(*g).agg(
        F.sum("__sign").alias("d_count"),
        F.min(F.when(F.col("__sign") == 1, v)).alias("__ins_min"),
        F.max(F.when(F.col("__sign") == 1, v)).alias("__ins_max"),
        F.min(F.when(F.col("__sign") == -1, v)).alias("__del_min"),
        F.max(F.when(F.col("__sign") == -1, v)).alias("__del_max"),
        F.max(F.when(F.col("__sign") == -1, F.lit(1))).alias("__has_neg"),
    )
    d = fd.select(
        *[F.col(k).alias(f"__g_{k}") for k in g],
        "d_count", "__ins_min", "__ins_max",
        "__del_min", "__del_max", "__has_neg",
    )
    cond = [F.col(k).eqNullSafe(F.col(f"__g_{k}")) for k in g]
    j = agg.join(d, cond, "full_outer")
    mn, mx = F.col(f"min_{col}"), F.col(f"max_{col}")
    invalidated = (F.col("__has_neg") == 1) & (
        F.col("n_rows").isNull()  # delete for a group agg doesn't know
        | F.col("__del_min").eqNullSafe(mn)
        | F.col("__del_max").eqNullSafe(mx)
    )
    keys_out = [
        F.coalesce(F.col(k), F.col(f"__g_{k}")).alias(k) for k in g
    ]
    recompute_keys = j.where(invalidated).select(*keys_out)
    n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
        F.col("d_count"), F.lit(0)
    )
    fast = (
        j.where(~F.coalesce(invalidated, F.lit(False)))
        .select(
            *keys_out,
            n.alias("n_rows"),
            F.least(mn, F.col("__ins_min")).alias(f"min_{col}"),
            F.greatest(mx, F.col("__ins_max")).alias(f"max_{col}"),
        )
        .where(F.col("n_rows") > 0)
    )
    rcond = [F.col(k).eqNullSafe(F.col(f"__r_{k}")) for k in g]
    rkeys = recompute_keys.select(
        *[F.col(k).alias(f"__r_{k}") for k in g]
    )
    recomputed = materialize_minmax(
        base.join(F.broadcast(rkeys), rcond, "left_semi"), g, col
    )
    return fast.unionByName(recomputed)


def materialize_topk(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
) -> DataFrame:
    """Bootstrap the top-k materialized view ``apply_topk_delta``
    maintains: the k rows with the largest ``order_col`` (key-column
    ascending tiebreaks), carried as (key_cols..., order_col)."""
    return (
        df.select(*key_cols, order_col)
        .orderBy(F.desc(order_col), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def apply_topk_delta(
    state: DataFrame,
    feed: DataFrame,
    base: DataFrame,
    key_cols: list[str],
    order_col: str,
    k: int,
) -> DataFrame:
    """Maintain a global top-k view through a pre-image change feed —
    the recompute-on-invalidation rule specialized to ranking state:

    - inserts / update-postimages FOLD: new rows merge with the current
      k rows and the union re-cuts at k — O(k + |delta|), the corpus is
      never touched (a new row either displaces the cut or doesn't);
    - a delete / update-preimage whose KEY sits in the current top-k
      invalidates the view: rows below the old cut may now qualify, and
      that information exists only in the base — so (and only then) the
      top-k recomputes from the post-change base as one
      TakeOrderedAndProject. Deletes below the cut are ignored: they
      cannot change membership.

    The invalidation probe is an O(k) semi-join + ``isEmpty`` (limit-1
    action) — the same touched-state gate ``apply_minmax_delta`` runs
    per group, degenerate here because a global top-k is one group.
    Like MIN/MAX, top-k is NOT maintainable from the feed alone under
    deletes (Gupta-Mumick); the bounded auxiliary state (k rows) buys
    the O(k + |delta|) common case.
    """
    # k-row state, consumed by the invalidation probe (an ACTION) and
    # the fold union — persist so the probe doesn't re-run the prior
    # hops' lineage that produced it
    state = state.persist()
    signed = _signed(feed)
    pre_keys = (
        signed.where(F.col("__sign") == -1).select(*key_cols).distinct()
    )
    invalidated = not pre_keys.join(
        state, key_cols, "left_semi"
    ).isEmpty()
    if invalidated:
        return materialize_topk(base, key_cols, order_col, k)
    ins = signed.where(F.col("__sign") == 1).select(*key_cols, order_col)
    # non-invalidated path: every insert key is NEW (an update of a
    # state key would have carried a matching preimage), so the union
    # is duplicate-free by the feed contract
    return materialize_topk(
        state.select(*key_cols, order_col).unionByName(ins),
        key_cols,
        order_col,
        k,
    )
