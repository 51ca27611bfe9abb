"""Scale-safe exact global ranks, prefix sums, and ntile.

The textbook forms — ``row_number()/ntile(k) OVER (ORDER BY ...)`` and
``sum(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` with an empty
(or low-cardinality) PARTITION BY — funnel every row of the domain
through one WindowExec task: the single-task killer at 100 TB, and the
exact shape this repo's own plan pins refuse elsewhere
(``customer_rfm_segments``, ``kruskal_wallis_qty_flag``).

This module is the two-pass replacement. The r14 form derived its
bucket id from ``repartitionByRange`` + ``spark_partition_id()``, which
is only stable within one physical execution — the offsets join reads
the bucketed frame twice, so the frame had to be frozen with an eager
``localCheckpoint`` (~0.3-0.8 s fixed cost per call at sf0.1, and at
100 TB an O(data) executor-storage materialization that also truncates
lineage, killing mid-query fault tolerance). The r15 form replaces the
physical partition id with a bucket id computed FROM THE DATA:

    __pid = µkey(first order column)

where ``µkey`` is a deterministic, monotone log-scale quantization
(~256 buckets per e-fold of magnitude, with sentinel keys for NULL,
NaN and ±inf at the ends Spark's own sort order puts them). Because
``µkey`` is a pure function of the value — Spark's ``log`` is
``java.lang.StrictMath.log`` in both the interpreted and codegen paths
(verified against the 4.1.2 catalyst jar), the scale factor is a power
of two (exact multiply), and ``floor``/IEEE casts are monotone — every
re-execution of any subtree reproduces identical buckets, so there is
NOTHING TO FREEZE: no checkpoint, no materialization, full lineage.

Monotonicity (why the rank is exact): ``a < b`` implies ``µkey(a) <=
µkey(b)``, so rows that tie on the first order column share a bucket
(ordered inside it by the remaining order columns), and rows in
earlier buckets order strictly before rows in later ones — the same
contiguity ``repartitionByRange`` gave, without its sampling pass,
its exchange, or its physical-execution dependence.

Three stages, none of which concentrates data on one task:

  1. local ranks / local running sums per ``(__pid, block)`` window —
     ONE hash exchange of the data; distinct µkeys per block number in
     the hundreds-to-thousands (value-range-bounded), 20-100x the
     shuffle partition count, so the exchange spreads well (guide
     §2.5) and each task sees one value-band slice.
  2. per-(__pid, block) (count, sums) totals — a map-combined
     aggregate whose exchange carries O(µkeys x blocks) rows.
  3. exclusive running offsets over that bounded side frame (the only
     unpartitioned-per-block window, value-range-bounded, never
     data-sized), broadcast-joined back: ``global = local + offset``.

Contracts (unchanged from r14): callers pass a STRICT total order
within each block (include a unique tiebreak column); prefix-summed
columns must be integer-typed (integer addition is associative, so
(local sum + offset) is EXACTLY the sequential fold). New contract:
the FIRST order column must be numeric (the µkey quantization domain)
— every catalog caller orders first on a count/price/score/logprob.

Skew note: a single first-column value whose tie group dominates the
frame cannot be split across buckets (µkey is a function of the
value); catalog callers rank DISTINCT support tuples or per-entity
totals, where that degenerate mass cannot arise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

# µkey constants. _MU_SCALE is a power of two (exact multiply keeps
# the quantization monotone); 256 buckets per e-fold bounds distinct
# finite µkeys by 256·ln(max/min) per sign — a few thousand for real
# data, independent of row count.
_MU_SCALE = 256.0
_MU_CLAMP = 1 << 30   # only ±inf reach it (finite |log·scale| < 2e5)
_MU_POS_BASE = 1 << 31
_MU_NULL = -(1 << 62)  # Spark: nulls first (asc) / last (desc) — the
_MU_NAN = 1 << 62      # lowest key serves both; NaN sorts greatest


def _mu_key(col: str) -> Column:
    """Deterministic monotone (non-strict) long quantization of a
    numeric column: null < -inf < negatives < 0 < positives < +inf
    < NaN, ~256 distinct keys per e-fold of magnitude."""
    d = F.col(col).cast("double")
    pos = F.lit(_MU_POS_BASE) + F.least(
        F.floor(F.log(d) * _MU_SCALE).cast("long"), F.lit(_MU_CLAMP)
    )
    neg = F.lit(-_MU_POS_BASE) - F.least(
        F.floor(F.log(-d) * _MU_SCALE).cast("long"), F.lit(_MU_CLAMP)
    )
    return (
        F.when(F.col(col).isNull(), F.lit(_MU_NULL))
        .when(F.isnan(d), F.lit(_MU_NAN))
        .when(d > 0.0, pos)
        .when(d < 0.0, neg)
        .otherwise(F.lit(0))
    )


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _sort_cols(order_by: list[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by
    ]


def ordered_prefix(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    carry: list[str],
    sums: list[str] = (),
    block: list[str] = (),
    block_total_col: str | None = None,
    reuse_input: bool | None = None,
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
    single-partition WindowExec over data. ``block_total_col``
    additionally emits the per-block row count (rides the same offsets
    frame — saves consumers a count aggregate + join). ``reuse_input``
    persists the projected input so its upstream work executes once
    (None = auto: persist when the input carries aggregates/joins; a
    bare column-pruned parquet scan is cheaper to re-scan than to
    cache)."""
    c0, asc0 = order_by[0]
    t0 = df.schema[c0].dataType
    if not isinstance(t0, _NUMERIC_TYPES):
        raise TypeError(
            f"ordered_prefix: first order column {c0!r} must be numeric "
            f"(got {t0}) — the deterministic bucket quantization domain"
        )
    for c in sums:
        if not isinstance(df.schema[c].dataType, _INTEGRAL_TYPES):
            raise TypeError(
                f"ordered_prefix: prefix-summed column {c!r} must be "
                f"integer-typed (got {df.schema[c].dataType}) — integer "
                "addition is associative, so (local sum + offset) is "
                "exactly the sequential fold"
            )
    keep: list[str] = []
    for c in [*block, *carry, *sums, *[c for c, _ in order_by]]:
        if c not in keep:
            keep.append(c)
    base = df.select(*keep)
    # The local-rank window and the offsets aggregate both consume the
    # input. Correctness never depends on sharing one execution (µkey
    # is a pure deterministic function — that is the whole point), but
    # when the input carries real upstream work, persist it so that
    # work runs once (in-session A/B: spearman 4.2 -> 3.7 s at sf0.1).
    # MEMORY_AND_DISK keeps lineage: an executor loss recomputes lost
    # blocks — the fault tolerance the r14 eager checkpoint gave up.
    if reuse_input is None:
        opt = base._jdf.queryExecution().optimizedPlan().toString()
        reuse_input = any(
            m in opt
            for m in ("Aggregate", "Join", "Window", "Expand", "Generate")
        )
    if reuse_input:
        base = base.persist()
    tagged = base.withColumn("__pid", _mu_key(c0))
    part = ["__pid", *block]
    w_local = W.partitionBy(*part).orderBy(*_sort_cols(order_by))
    w_lcum = w_local.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = tagged.select(
        *keep,
        "__pid",
        F.row_number().over(w_local).alias("__lrn"),
        *[F.sum(c).over(w_lcum).alias(f"__lsum_{c}") for c in sums],
    )
    counts = tagged.groupBy(*part).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sums],
    )
    w_block = W.partitionBy(*block) if block else W.partitionBy()
    w_prior = w_block.orderBy(
        F.col("__pid").asc() if asc0 else F.col("__pid").desc()
    ).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        *part,
        F.coalesce(F.sum("__n").over(w_prior), F.lit(0)).alias("__off"),
        *[
            F.coalesce(F.sum(f"__s_{c}").over(w_prior), F.lit(0)).alias(
                f"__soff_{c}"
            )
            for c in sums
        ],
        *(
            [F.sum("__n").over(w_block).alias("__bn")]
            if block_total_col
            else []
        ),
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
        *(
            [F.col("__bn").alias(block_total_col)]
            if block_total_col
            else []
        ),
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
    assignment to the built-in ntile for any strict total order.

    The per-block row count rides the rank's offsets frame, so no
    extra count aggregate or join runs — one data shuffle total."""
    k = int(k)
    assert k >= 1
    r = ordered_prefix(
        df, order_by, carry=carry, block=block,
        block_total_col="__ntile_n",
    )
    out: list[str] = []
    for c in [*block, *carry]:
        if c not in out:
            out.append(c)
    return _ntile_from_rank(r, k, "__ntile_n", out, tile_col)
