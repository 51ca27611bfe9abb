"""Scale-safe exact global ranks, prefix sums, and ntile.

The textbook forms — ``row_number()/ntile(k) OVER (ORDER BY ...)`` and
``sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` with an empty
(or low-cardinality) PARTITION BY — funnel every row of the domain
through one WindowExec task: the single-task killer at 100 TB, and the
exact shape this repo's own plan pins refuse elsewhere
(``customer_rfm_segments``, ``kruskal_wallis_qty_flag``). This module
is the reusable two-pass replacement, the global-order generalization
of the per-block rank in ``operators/linkage.py:_block_rank_plan``:

  1. ``repartitionByRange(block, order)`` — the distributed sort; each
     (block-contiguous run of the) total order occupies a contiguous
     run of partitions.
  2. ``row_number()/sum() OVER (PARTITION BY (spark_partition_id,
     block) ORDER BY order)`` — local ranks / local prefix sums; every
     task touches only its own slice.
  3. per-(partition, block) (count, sum) totals -> exclusive running
     offsets per block over the O(n_partitions + n_blocks)-row side
     frame, broadcast-joined back: ``global = local + offset``.

No task ever sees more than one partition's rows; the only
single-partition window runs over the offsets frame (a cluster
constant + block count, not a data size).

Determinism contract: callers must pass a STRICT total order within
each block (include a unique tiebreak column) — then the global rank
is independent of where the sampled range boundaries fall.
``spark_partition_id`` is frozen as data via an eager
``localCheckpoint`` before fan-out (two physical executions of the
range exchange need not coalesce identically under AQE — the same
~8%-inflation failure ``linkage.py:_block_rank_plan`` documents).
Prefix-summed columns should be integer-typed: integer addition is
associative, so the (local-sum + offset) regrouping is EXACTLY the
sequential fold; float sums would see reassociated adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _sort_cols(order_by: list[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]


def ordered_prefix_plan(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    carry: list[str],
    sums: list[str] = (),
    block: list[str] = (),
    n_partitions: int | None = None,
    _freeze: bool = True,
) -> DataFrame:
    """Lazy plan for :func:`ordered_prefix` (``_freeze=False`` exists
    ONLY so tests can pin the pre-checkpoint plan shape)."""
    keep: list[str] = []
    for c in [*block, *carry, *sums, *[c for c, _ in order_by]]:
        if c not in keep:
            keep.append(c)
    n_parts = n_partitions or max(
        2, df.sparkSession.sparkContext.defaultParallelism
    )
    ranged = df.select(*keep).repartitionByRange(
        n_parts, *[F.col(b) for b in block], *_sort_cols(order_by)
    ).withColumn("__pid", F.spark_partition_id())
    if _freeze:
        ranged = ranged.localCheckpoint(eager=True)
    part = ["__pid", *block]
    w_local = W.partitionBy(*part).orderBy(*_sort_cols(order_by))
    w_lcum = w_local.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = ranged.select(
        *keep,
        "__pid",
        F.row_number().over(w_local).alias("__lrn"),
        *[F.sum(c).over(w_lcum).alias(f"__lsum_{c}") for c in sums],
    )
    counts = ranged.groupBy(*part).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sums],
    )
    w_prior = (
        W.partitionBy(*block) if block else W.partitionBy()
    ).orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        *part,
        F.coalesce(F.sum("__n").over(w_prior), F.lit(0)).alias("__off"),
        *[
            F.coalesce(F.sum(f"__s_{c}").over(w_prior), F.lit(0)).alias(
                f"__soff_{c}"
            )
            for c in sums
        ],
    )
    out_cols: list[str] = []
    for c in [*block, *carry]:
        if c not in out_cols:
            out_cols.append(c)
    return local.join(F.broadcast(offsets), part).select(
        *out_cols,
        (F.col("__off") + F.col("__lrn")).cast("long").alias("__rn"),
        *[
            (F.col(f"__soff_{c}") + F.col(f"__lsum_{c}")).alias(
                f"__cum_{c}"
            )
            for c in sums
        ],
    )


def ordered_prefix(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    carry: list[str],
    sums: list[str] = (),
    block: list[str] = (),
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based rank (and optional inclusive prefix sums) under
    ``order_by`` — ``[(col, ascending)]``, which must be a strict total
    order within each block — with parallelism independent of both data
    size and block cardinality. With ``block`` columns the rank restarts
    per block (``... OVER (PARTITION BY block ORDER BY ...)``); without,
    it is global.

    Returns ``block... , carry... , __rn long`` plus ``__cum_<c>`` for
    each ``c`` in ``sums`` (inclusive running sum in rank order) —
    exactly the single-partition window semantics, never through a
    single-partition WindowExec.
    """
    return ordered_prefix_plan(
        df, order_by, carry=carry, sums=sums, block=block,
        n_partitions=n_partitions,
    )


def _ntile_from_rank(
    ranked: DataFrame,
    k: int,
    n_col: str,
    carry: list[str],
    tile_col: str,
) -> DataFrame:
    """SQL-standard ntile from an exact rank + group-size column:
    with q = n div k and rem = n mod k, the first rem buckets hold
    q+1 rows — ``tile = (r-1) div (q+1) + 1`` while r-1 < rem*(q+1),
    else ``rem + ((r-1) - rem*(q+1)) div q + 1``. Integer ``div``
    throughout (float division would mis-floor near 2^53); CASE WHEN
    evaluates lazily per row, so the q = 0 (n < k) case never reaches
    the else-branch's div-by-zero."""
    r = (
        ranked.withColumn("__r0", F.col("__rn") - 1)
        .withColumn("__rem", F.col(n_col) % k)
        .withColumn("__big", F.expr(f"({n_col} div {k}) + 1"))
        .withColumn("__head", F.col("__rem") * F.col("__big"))
    )
    tile = F.when(
        F.col("__r0") < F.col("__head"),
        F.expr("(__r0 div __big) + 1"),
    ).otherwise(
        F.expr("__rem + ((__r0 - __head) div (__big - 1)) + 1")
    )
    return r.select(*carry, tile.cast("long").alias(tile_col))


def exact_ntile(
    df: DataFrame,
    k: int,
    order_by: list[tuple[str, bool]],
    carry: list[str],
    block: list[str] = (),
    tile_col: str = "__tile",
) -> DataFrame:
    """``ntile(k) OVER ([PARTITION BY block] ORDER BY ...)`` —
    SQL-standard equal-count buckets (first ``n mod k`` buckets one row
    larger) — computed from the two-pass exact rank, so no
    single-partition (or single-block-task) sort of the data. Returns
    ``block..., carry... , <tile_col> long``; bit-identical bucket
    assignment to the built-in ntile for any strict total order."""
    k = int(k)
    assert k >= 1
    r = ordered_prefix(df, order_by, carry=carry, block=block)
    if block:
        n = r.groupBy(*block).agg(F.count(F.lit(1)).alias("__ntile_n"))
        r = r.join(F.broadcast(n), list(block))
    else:
        n = r.agg(F.count(F.lit(1)).alias("__ntile_n"))
        r = r.join(F.broadcast(n))
    out: list[str] = []
    for c in [*block, *carry]:
        if c not in out:
            out.append(c)
    return _ntile_from_rank(r, k, "__ntile_n", out, tile_col)
