"""Statistical screening operators: rank AUC, chi-squared independence,
Benford first-digit conformance, Gini concentration, Spearman rank
correlation.

The reference's analytics stop at plain means over the gold layer
(``transform_fred_data.py:124-128``); a curation pipeline that feeds
model training needs distribution-level screens — "does this quality
score actually separate the classes?" (AUC), "are these two categorical
columns independent?" (chi-squared), "do these amounts look organic or
fabricated?" (Benford), "how concentrated is the corpus on a few
producers?" (Gini). Every operator here is a composition of built-in
aggregates and windows: no UDFs, no driver loops, no collects.

Determinism discipline (the oracle contract): statistics are computed
from integer counts and exact integer ranks wherever possible; average
tie-ranks are exact multiples of 0.5 (binary-representable, so their
sums are order-independent); irrational constants (Benford's
log10(1 + 1/d)) are computed ONCE in Python and shared as literals with
the SQL mirror — the same no-libm-divergence discipline as the
Fellegi-Sunter weights in operators/linkage.py.

Scale notes. The rank statistics never put an O(rows-per-group) domain
through a per-group WindowExec task (group cardinality here is tiny —
languages, return flags, market segments — so a partitioned built-in
window would be a handful of single-task sorts of the whole corpus):
AUC and Spearman collapse the fact table to its per-(group, value)
SUPPORT first (one map-combined exchange; midranks depend only on the
tie group) and take exact tie-count prefix sums through the blocked
two-pass rank (``operators/rank.py:ordered_prefix``); Gini ranks
per-entity totals the same two-pass way. Chi-squared reduces the fact
table to O(|A| x |B|) cells in one map-combined exchange; Benford
reduces to 9 rows.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def rank_auc(
    df: DataFrame, group: str, score: str, label: Column
) -> DataFrame:
    """Per-``group`` area under the ROC curve of ``score`` predicting the
    boolean ``label`` column expression, by the rank (Mann-Whitney U)
    formulation with midrank tie correction:

        AUC = (sum of positive midranks - n_pos*(n_pos+1)/2)
              / (n_pos * n_neg)

    Midranks are ``rank() + (|ties| - 1)/2`` — exact multiples of 0.5,
    so the positive-midrank sum is an order-independent double and the
    whole statistic is engine-deterministic without rounding tricks.

    Plan shape: the midrank depends only on the (group, score) TIE
    GROUP, and the statistic only needs the midrank-weighted positive
    count per tie group — so the fact table collapses to its
    per-(group, score) support (one map-combined exchange: tie count +
    positive count per cell) and min-ranks come from exact tie-count
    prefix sums through the blocked two-pass rank
    (``operators/rank.py:ordered_prefix``), never a per-group
    WindowExec over O(rows-per-group) (group cardinality is tiny here
    — a handful of sources/languages — so the old partitioned rank
    window was a few single-task sorts of the whole corpus). Each
    midrank*pos_count term is an exact multiple of 0.5 times an
    integer, so the sum stays order-independent under the extra
    regrouping. Groups with an empty class are dropped (AUC
    undefined). Returns one row per group: (group, n_pos, n_neg, auc).
    """
    from .rank import ordered_prefix

    support = df.groupBy(F.col(group), F.col(score).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(label.cast("long")).alias("__posc"),
    )
    pref = ordered_prefix(
        support,
        [("__v", True)],
        carry=["__cnt", "__posc"],
        sums=["__cnt"],
        block=[group],
    )
    # rank() of a tie group = inclusive cumulative count - tie count + 1
    midrank = (
        F.col("__cum___cnt").cast("double")
        - F.col("__cnt")
        + F.lit(1)
        + (F.col("__cnt") - F.lit(1)) / F.lit(2.0)
    )
    n_pos = F.sum("__posc")
    n_neg = F.sum(F.col("__cnt") - F.col("__posc"))
    return (
        pref.groupBy(group)
        .agg(
            n_pos.alias("n_pos"),
            n_neg.alias("n_neg"),
            F.sum(midrank * F.col("__posc")).alias("__rank_pos"),
        )
        .where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            group,
            "n_pos",
            "n_neg",
            F.round(
                (
                    F.col("__rank_pos")
                    - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0)
                )
                / (F.col("n_pos") * F.col("n_neg")).cast("double"),
                6,
            ).alias("auc"),
        )
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: per-cell observed counts vs ``expected = row_total *
    col_total / N``, with the cell contribution ``(obs - exp)^2 / exp``,
    the table-wide statistic, and the degrees of freedom
    ``(|A| - 1)(|B| - 1)`` repeated on every row.

    ``chi2_total`` uses the identity ``sum over ALL cells of
    (o - e)^2 / e = sum over OBSERVED cells of o^2 / e - N`` (empty
    cells have o = 0), so it is the full-table Pearson statistic even
    when the contingency table is sparse — a sum of observed-cell
    ``contrib`` values alone would silently drop the empty-cell mass
    (each contributes ``e``), understating the statistic.

    Plan shape: ONE map-combined exchange collapses the fact table to
    the O(|A| x |B|) contingency cells; the row/column marginals and the
    grand total are O(|A|) / O(|B|) / 1-row re-aggregations of the cell
    frame (never a second fact scan) and broadcast back. Everything
    downstream of the counts is exact integer arithmetic divided once —
    deterministic across engines. Rows with a NULL in either
    categorical are excluded up front: groupBy would keep NULL as a
    real contingency cell while count_distinct excludes it, so with
    NULLs present the dof denominator would understate (a NULL
    "category" isn't a category; callers who want it as one should
    coalesce to an explicit label first). Returns one row per observed
    cell: (col_a, col_b, n_obs, expected, contrib, chi2_total, dof).
    """
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("n_obs"))
    row_m = cells.groupBy(col_a).agg(F.sum("n_obs").alias("__rt"))
    col_m = cells.groupBy(col_b).agg(F.sum("n_obs").alias("__ct"))
    tot = cells.agg(
        F.sum("n_obs").alias("__n"),
        F.count_distinct(col_a).alias("__ka"),
        F.count_distinct(col_b).alias("__kb"),
    )
    e = (F.col("__rt") * F.col("__ct")).cast("double") / F.col("__n")
    contrib = (F.col("n_obs") - e) * (F.col("n_obs") - e) / e
    scored = (
        cells.join(broadcast(row_m), col_a)
        .join(broadcast(col_m), col_b)
        .join(broadcast(tot))
        .select(
            col_a,
            col_b,
            "n_obs",
            F.round(e, 6).alias("expected"),
            F.round(contrib, 6).alias("contrib"),
            (F.col("n_obs").cast("double") * F.col("n_obs") / e).alias(
                "__o2e"
            ),
            F.col("__n").alias("__n_all"),
            ((F.col("__ka") - 1) * (F.col("__kb") - 1))
            .cast("int")
            .alias("dof"),
        )
    )
    total = scored.agg(
        F.round(F.sum("__o2e") - F.max("__n_all"), 6).alias("chi2_total")
    )
    return scored.join(broadcast(total)).select(
        col_a, col_b, "n_obs", "expected", "contrib", "chi2_total", "dof"
    )


# Benford's-law expected first-digit shares log10(1 + 1/d), computed
# once in Python and shared as full-precision literals with any SQL
# mirror (no cross-engine libm log10 in the query path).
BENFORD_SHARES: dict[int, float] = {
    d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_first_digit(df: DataFrame, value: str) -> DataFrame:
    """Benford's-law conformance screen over a positive numeric column:
    the observed first-significant-digit distribution vs the expected
    ``log10(1 + 1/d)`` shares, with per-digit chi-squared contributions
    ``N * (obs_share - exp_share)^2 / exp_share``.

    The first digit is taken from the DECIMAL RENDERING of
    ``floor(value)`` as a BIGINT — string-of-integer is rendered
    identically by every engine, where ``floor(log10(x))`` exponent
    arithmetic can disagree by 1 ulp at power-of-ten boundaries.
    Requires ``value >= 1`` (rows below are filtered; amounts in the
    fixtures and in FRED-style economic series satisfy it).

    Plan shape: one map-combined exchange to 9 digit rows; the 1-row
    total broadcast back. Returns one row per digit:
    (digit, n_obs, obs_share, exp_share, contrib).
    """
    digit = F.substring(
        F.floor(F.col(value)).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.where(F.col(value) >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = counts.agg(F.sum("n_obs").alias("__n"))
    exp_share = F.lit(None).cast("double")
    for d, s in sorted(BENFORD_SHARES.items()):
        exp_share = F.when(F.col("digit") == d, F.lit(s)).otherwise(
            exp_share
        )
    obs_share = F.col("n_obs").cast("double") / F.col("__n")
    return counts.join(broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("exp_share"),
        F.round(
            F.col("__n")
            * (obs_share - exp_share)
            * (obs_share - exp_share)
            / exp_share,
            6,
        ).alias("contrib"),
    )


def gini_by_group(
    df: DataFrame, group: str, entity: str, value: str
) -> DataFrame:
    """Per-``group`` Gini concentration coefficient of ``value`` summed
    per ``entity`` (e.g. spend per customer within a market segment), by
    the rank formula over ascending entity totals:

        G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n

    Entity totals are rounded to 2 dp BEFORE ranking (house float-sum
    discipline: the raw double sum's last ulp is partial-order
    dependent; the rounded total is the cross-engine value), and the
    rank orders by (total, entity) so ties break deterministically.

    Plan shape: one map-combined exchange to per-entity totals (the big
    reduction), then the blocked two-pass rank
    (``operators/rank.py:ordered_prefix``) over the entity frame — the
    entity domain is O(customers), which still grows with the corpus,
    and group cardinality is tiny (segments), so the old per-group
    built-in window was a few single-task sorts of ALL entities — and
    one final per-group aggregate. Returns one row per group:
    (group, n_entities, total_value, gini).
    """
    from .rank import ordered_prefix

    totals = df.groupBy(group, entity).agg(
        F.round(F.sum(value), 2).alias("__x")
    )
    ranked = ordered_prefix(
        totals,
        [("__x", True), (entity, True)],
        carry=["__x"],
        block=[group],
    ).withColumnRenamed("__rn", "__i")
    n = F.count(F.lit(1))
    return ranked.groupBy(group).agg(
        n.alias("n_entities"),
        F.round(F.sum("__x"), 2).alias("total_value"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("__i") * F.col("__x"))
            / (n * F.sum("__x"))
            - (n + F.lit(1)).cast("double") / n,
            6,
        ).alias("gini"),
    )


def spearman_corr(
    df: DataFrame, group: str, col_x: str, col_y: str
) -> DataFrame:
    """Per-``group`` Spearman rank correlation between two numeric
    columns: Pearson correlation of the midrank-transformed values
    (``rank() + (|ties| - 1)/2`` — the tie-corrected form, identical to
    scipy's ``spearmanr``). Midranks are exact multiples of 0.5, so the
    only cross-engine float risk is the final Pearson reduction, rounded
    to 6 dp in both engines.

    Plan shape: midranks depend only on the (group, value) TIE GROUP,
    so each axis collapses to its per-(group, value) support (one
    map-combined exchange each; O(distinct values) rows, not
    O(corpus)), min-ranks come from exact tie-count prefix sums
    through the blocked two-pass rank
    (``operators/rank.py:ordered_prefix``), and the per-value midranks
    equi-join back onto the fact rows for the corr aggregate — never a
    per-group WindowExec over O(rows-per-group) (group cardinality is
    tiny here — return flags — so the old partitioned rank window was
    a few single-task sorts of the whole fact table). Join keys must
    be non-null (rank columns here are NOT NULL fact columns).
    Returns one row per group: (group, n, spearman_rho).
    """
    from .rank import ordered_prefix

    ranked = df.select(group, col_x, col_y)
    for col, out in ((col_x, "__rx"), (col_y, "__ry")):
        support = df.groupBy(F.col(group), F.col(col)).agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        pref = ordered_prefix(
            support,
            [(col, True)],
            carry=[col, "__cnt"],
            sums=["__cnt"],
            block=[group],
        )
        midrank = (
            F.col("__cum___cnt").cast("double")
            - F.col("__cnt")
            + F.lit(1)
            + (F.col("__cnt") - F.lit(1)) / F.lit(2.0)
        )
        ranked = ranked.join(
            pref.select(group, col, midrank.alias(out)), [group, col]
        )
    return ranked.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("__rx", "__ry"), 6).alias("spearman_rho"),
    )


def km_survival(
    df: DataFrame, duration: str, censored: str
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator over per-entity
    ``duration`` with right-censoring flags: at each distinct EVENT
    time t_i (a duration where at least one uncensored entity exits),

        S(t_i) = prod_{j <= i} (1 - d_j / n_j)

    with d_j = uncensored exits at t_j and n_j = entities still at
    risk (duration >= t_j, censored or not). The retention-curve
    estimator that a naive "fraction still alive" gets WRONG whenever
    observation windows differ (censored entities leave the risk set
    without counting as exits).

    Determinism: d and n are exact integers from one map-combined
    aggregate; the cumulative product runs as exp(sum(ln(1 - d/n)))
    with the d == n endpoint (survival exactly 0) handled by a flag,
    never ln(0); the result rounds to 6 dp in both engines.

    Plan shape: one exchange collapses entities to per-duration (d,
    at-that-duration) counts; the risk set and the product-limit walk
    are cumulative windows over the O(|distinct durations|) frame — the
    same bounded-domain single-partition justification as the KS ECDF
    (durations collapse; the corpus never enters a global window).
    Returns one row per event time: (t, n_at_risk, d_events, survival).
    """
    cens = F.col(censored)
    per_t = df.groupBy(F.col(duration).alias("t")).agg(
        F.sum((~cens).cast("long")).alias("d_events"),
        F.count(F.lit(1)).alias("__m"),
    )
    total = per_t.agg(F.sum("__m").alias("__total"))
    w_prior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = per_t.join(broadcast(total)).select(
        "t",
        "d_events",
        (
            F.col("__total")
            - F.coalesce(F.sum("__m").over(w_prior), F.lit(0))
        ).alias("n_at_risk"),
    )
    events = at_risk.where(F.col("d_events") > 0)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    frac = F.col("d_events").cast("double") / F.col("n_at_risk")
    term = F.when(F.col("d_events") < F.col("n_at_risk"), F.log(1 - frac))
    dead = F.max(
        (F.col("d_events") == F.col("n_at_risk")).cast("int")
    ).over(w_cum)
    return events.select(
        "t",
        "n_at_risk",
        "d_events",
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(term).over(w_cum)), 6))
        .alias("survival"),
    )


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Two-dimensional skyline (Pareto frontier), maximizing both ``x``
    and ``y``: rows no other row dominates, where r' dominates r iff
    ``x' >= x AND y' >= y`` with at least one strict. Equal (x, y)
    duplicates dominate neither and all survive.

    2-D dominance has a sort identity: after collapsing to (x,
    max-y-at-x), a point is on the frontier iff its y strictly exceeds
    the running max-y over all STRICTLY HIGHER x. The naive check is
    the O(n^2) dominance self-join; this plan is the distributed
    sort-prune form:

      1. local prune — the identity applied WITHIN each input
         partition (window over spark_partition_id(), no shuffle): any
         point dominated locally is dominated globally, and for
         non-adversarial data the per-partition frontier is tiny
         (O(log n) expected for independent dimensions);
      2. global pass — the same window over the pruned survivors, a
         frame already reduced by orders of magnitude, so the
         single-partition sort the identity needs runs on the SMALL
         remainder, never the corpus.

    Returns the surviving (x, y) pairs; callers join back on (x, y)
    equality to recover full rows (ties included).
    """

    def _frontier(pts: DataFrame, part: list[str]) -> DataFrame:
        gmax = pts.groupBy(*part, x).agg(F.max(y).alias(y))
        w = (
            Window.partitionBy(*part)
            .orderBy(F.desc(x))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max(y).over(w)
        return gmax.select(*part, x, y, prev.alias("__prev")).where(
            F.col("__prev").isNull() | (F.col(y) > F.col("__prev"))
        ).drop("__prev")

    local = _frontier(
        df.select(x, y).withColumn("__pid", F.spark_partition_id()),
        ["__pid"],
    ).drop("__pid")
    return _frontier(local, [])


def kruskal_wallis(df: DataFrame, group: str, value: str) -> DataFrame:
    """Kruskal-Wallis H test (one-way ANOVA on ranks) of ``value``
    across the ``group`` classes, with the standard tie correction:

        H = 12 / (N (N+1)) * sum_g R_g^2 / n_g  -  3 (N+1)
        C = 1 - sum_t (t^3 - t) / (N^3 - N);   H_adj = H / C

    Rank-based by design: the raw-value ANOVA F needs sums of squares
    whose catastrophic cancellation amplifies partial-sum-order ulp
    noise past any rounding guard; midranks are exact multiples of 0.5
    (order-independent double sums), so the statistic is
    engine-deterministic.

    Scale contract: ``value`` must have a BOUNDED DOMAIN (quantities,
    scores, bucketed measures). The fact table collapses to
    O(|domain| x |groups|) cells in one map-combined exchange; global
    midranks come from a cumulative window over the O(|domain|)
    distinct-value frame — the same bounded-domain single-partition
    justification as the KS ECDF — and are broadcast-joined back onto
    the cells. The corpus never enters a global sort.

    Returns one row per group: (group, n, mean_rank) with the
    table-wide (h_stat, h_adj, dof) repeated on every row (the chi2
    convention).
    """
    cells = df.groupBy(value, group).agg(F.count(F.lit(1)).alias("__c"))
    per_v = cells.groupBy(value).agg(F.sum("__c").alias("__t"))
    w_prior = Window.orderBy(value).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # midrank of v = (# strictly below) + (ties + 1) / 2 — exact halves
    mid = per_v.select(
        value,
        "__t",
        (
            F.coalesce(F.sum("__t").over(w_prior), F.lit(0))
            + (F.col("__t") + 1) / F.lit(2.0)
        ).alias("__mid"),
    )
    scored = cells.join(broadcast(mid.select(value, "__mid")), value)
    per_g = scored.groupBy(group).agg(
        F.sum("__c").alias("n"),
        F.sum(F.col("__c") * F.col("__mid")).alias("__rsum"),
    )
    tot = mid.agg(
        F.sum("__t").alias("__n_all"),
        F.sum(
            F.col("__t").cast("double") * F.col("__t") * F.col("__t")
            - F.col("__t")
        ).alias("__tie3"),
        F.count(F.lit(1)).alias("__k_vals"),
    )
    k = per_g.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum(F.col("__rsum") * F.col("__rsum") / F.col("n")).alias(
            "__hsum"
        ),
    )
    joined = per_g.join(broadcast(tot)).join(broadcast(k))
    n_all = F.col("__n_all").cast("double")
    h = (
        F.lit(12.0) / (n_all * (n_all + 1)) * F.col("__hsum")
        - 3 * (n_all + 1)
    )
    c_tie = F.lit(1.0) - F.col("__tie3") / (n_all * n_all * n_all - n_all)
    return joined.select(
        group,
        "n",
        F.round(F.col("__rsum") / F.col("n"), 6).alias("mean_rank"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / c_tie, 6).alias("h_adj"),
        (F.col("__k") - 1).cast("int").alias("dof"),
    )


def cramers_v(df: DataFrame, col_a: str, col_b: str, label: str) -> DataFrame:
    """Cramér's V association strength between two categorical columns:
    ``V = sqrt(chi2 / (N * min(ka - 1, kb - 1)))`` — the [0, 1]-scaled
    effect size the raw chi-squared statistic hides (chi2 grows with N;
    V doesn't). Same cell/marginal plan as ``chi2_independence``: one
    map-combined exchange to O(|A| x |B|) cells, marginals re-aggregated
    from the cell frame and broadcast back, exact integer counts divided
    once. chi2 uses the full-table identity ``sum o^2 / e - N`` over the
    observed cells, so empty contingency cells (whose (0 - e)^2 / e mass
    an observed-cells-only sum drops) are included — without them V
    loses its <= 1 bound. Rows with a NULL in either categorical are
    excluded up front (groupBy would keep NULL as a cell while
    count_distinct excludes it, understating min(ka-1, kb-1) and
    letting V exceed 1 on nullable inputs). Returns ONE row:
    (pair, n, ka, kb, chi2, cramers_v) with ``pair = label`` so
    per-pair results union into a report.
    """
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("n_obs"))
    row_m = cells.groupBy(col_a).agg(F.sum("n_obs").alias("__rt"))
    col_m = cells.groupBy(col_b).agg(F.sum("n_obs").alias("__ct"))
    tot = cells.agg(
        F.sum("n_obs").alias("__n"),
        F.count_distinct(col_a).alias("__ka"),
        F.count_distinct(col_b).alias("__kb"),
    )
    e = (F.col("__rt") * F.col("__ct")).cast("double") / F.col("__n_all")
    scored = (
        cells.join(broadcast(row_m), col_a)
        .join(broadcast(col_m), col_b)
        .join(broadcast(tot.select(F.col("__n").alias("__n_all"))))
        .select(
            (F.col("n_obs").cast("double") * F.col("n_obs") / e).alias(
                "__o2e"
            ),
            "__n_all",
        )
    )
    chi2 = scored.agg(
        (F.sum("__o2e") - F.max("__n_all")).alias("__chi2")
    )
    mind = F.least(F.col("__ka") - 1, F.col("__kb") - 1)
    return (
        broadcast(tot)
        .join(broadcast(chi2))
        .select(
            F.lit(label).alias("pair"),
            F.col("__n").alias("n"),
            F.col("__ka").cast("int").alias("ka"),
            F.col("__kb").cast("int").alias("kb"),
            F.round(F.col("__chi2"), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("__chi2") / (F.col("__n") * mind.cast("double"))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def two_proportion_ztest(
    df: DataFrame, entity: str, cohort: Column, success: Column
) -> DataFrame:
    """Two-proportion pooled z-test between cohort 0 and cohort 1:
    entities are deduplicated first (one trial per ``entity``), a trial
    succeeds if ANY of its rows satisfies ``success``, and

        z = (p1 - p0) / sqrt( p (1-p) (1/n0 + 1/n1) )

    with p the pooled success share. The A/B readout every conversion
    experiment ships; with deterministic cohorting (id parity, hash
    buckets) the whole statistic derives from four exact integer counts
    — one map-combined exchange to per-entity flags, one 4-counter
    aggregate, zero joins. Returns ONE row:
    (n_0, n_1, conv_0, conv_1, p_0, p_1, z_score).
    """
    per_e = df.groupBy(F.col(entity)).agg(
        F.max(cohort.cast("int")).alias("__g"),
        F.max(success.cast("int")).alias("__s"),
    )
    counts = per_e.agg(
        F.sum((F.col("__g") == 0).cast("long")).alias("n_0"),
        F.sum((F.col("__g") == 1).cast("long")).alias("n_1"),
        F.sum(
            ((F.col("__g") == 0) & (F.col("__s") == 1)).cast("long")
        ).alias("conv_0"),
        F.sum(
            ((F.col("__g") == 1) & (F.col("__s") == 1)).cast("long")
        ).alias("conv_1"),
    )
    p0 = F.col("conv_0").cast("double") / F.col("n_0")
    p1 = F.col("conv_1").cast("double") / F.col("n_1")
    pool = (F.col("conv_0") + F.col("conv_1")).cast("double") / (
        F.col("n_0") + F.col("n_1")
    )
    se = F.sqrt(
        pool
        * (1 - pool)
        * (1.0 / F.col("n_0") + 1.0 / F.col("n_1"))
    )
    return counts.select(
        "n_0",
        "n_1",
        "conv_0",
        "conv_1",
        F.round(p0, 6).alias("p_0"),
        F.round(p1, 6).alias("p_1"),
        F.round((p1 - p0) / se, 6).alias("z_score"),
    )
