"""Statistical-screen catalog entries: AUC, chi-squared, Benford, Gini,
Spearman (operators/stats.py), mirrored in DuckDB SQL for the driver's
hash gate.

Oracle conventions (registry module docstring): identical aliases in
both engines, integer counts CAST to BIGINT (never HUGEINT — see
tests/test_oracle_dtypes.py), doubles rounded 6 dp, irrational
constants embedded as shared Python-computed literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.stats import BENFORD_SHARES
from .registry import query


@query(
    "auc_doc_length_lang",
    oracle="""
WITH r AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         rank() OVER (PARTITION BY source ORDER BY n_chars)
           + (count(*) OVER (PARTITION BY source, n_chars) - 1) / 2.0
           AS midrank
  FROM documents
)
SELECT source,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(1 - pos) AS BIGINT) AS n_neg,
       round((sum(midrank * pos)
              - CAST(sum(pos) AS BIGINT)
                * (CAST(sum(pos) AS BIGINT) + 1) / 2.0)
             / (CAST(sum(pos) AS BIGINT) * CAST(sum(1 - pos) AS BIGINT)),
             6) AS auc
FROM r
GROUP BY source
HAVING sum(pos) > 0 AND sum(1 - pos) > 0
""",
    description="rank-based (Mann-Whitney) AUC with midrank tie "
    "correction: per source, how well document length separates "
    "English from non-English docs — the screen that tells a curation "
    "pipeline whether a candidate quality feature carries signal; the "
    "corpus collapses to its per-(source, length) tie-group support "
    "and min-ranks come from tie-count prefix sums through the "
    "blocked two-pass rank (r14 — the old per-group rank window was a "
    "few single-task sorts of the whole corpus), midranks are exact "
    "halves so the statistic is engine-deterministic "
    "(operators/stats.py:rank_auc)",
)
def auc_doc_length_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import rank_auc

    docs = load_table(spark, "documents", sf_dir)
    return rank_auc(docs, "source", "n_chars", F.col("lang") == "en")


@query(
    "chi2_priority_status",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_obs
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
  GROUP BY 1, 2
),
rm AS (SELECT o_orderpriority, CAST(sum(n_obs) AS BIGINT) AS rt
       FROM cells GROUP BY 1),
cm AS (SELECT o_orderstatus, CAST(sum(n_obs) AS BIGINT) AS ct
       FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n,
               count(DISTINCT o_orderpriority) AS ka,
               count(DISTINCT o_orderstatus) AS kb
        FROM cells),
scored AS (
  SELECT cells.o_orderpriority, cells.o_orderstatus, cells.n_obs,
         CAST(rm.rt * cm.ct AS DOUBLE) / tot.n AS e,
         tot.n AS n_all,
         CAST((tot.ka - 1) * (tot.kb - 1) AS INTEGER) AS dof
  FROM cells
  JOIN rm USING (o_orderpriority)
  JOIN cm USING (o_orderstatus)
  CROSS JOIN tot
)
SELECT o_orderpriority, o_orderstatus, n_obs,
       round(e, 6) AS expected,
       round((n_obs - e) * (n_obs - e) / e, 6) AS contrib,
       (SELECT round(sum(CAST(n_obs AS DOUBLE) * n_obs / e)
                     - max(n_all), 6) FROM scored)
         AS chi2_total,
       dof
FROM scored
""",
    description="Pearson chi-squared test of independence between "
    "order priority and order status: per-cell observed vs expected "
    "counts, cell contributions, the table statistic, and dof — the "
    "fact table collapses to O(|A| x |B|) cells in one map-combined "
    "exchange; marginals re-aggregate the cell frame and broadcast "
    "back (operators/stats.py:chi2_independence)",
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import chi2_independence

    orders = load_table(spark, "orders", sf_dir)
    return chi2_independence(orders, "o_orderpriority", "o_orderstatus")


# CAST to DOUBLE: DuckDB types bare decimal literals as DECIMAL, whose
# pandas rendering drifts from Spark's float64 on the driver hash path
_BENFORD_CASE = "CAST(CASE digit " + " ".join(
    f"WHEN {d} THEN {s!r}" for d, s in sorted(BENFORD_SHARES.items())
) + " END AS DOUBLE)"


@query(
    "benford_order_prices",
    oracle=f"""
WITH c AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS digit,
         count(*) AS n_obs
  FROM orders WHERE o_totalprice >= 1 GROUP BY 1
),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM c)
SELECT digit, n_obs,
       round(CAST(n_obs AS DOUBLE) / n, 6) AS obs_share,
       round({_BENFORD_CASE}, 6) AS exp_share,
       round(n * (CAST(n_obs AS DOUBLE) / n - {_BENFORD_CASE})
               * (CAST(n_obs AS DOUBLE) / n - {_BENFORD_CASE})
               / {_BENFORD_CASE}, 6) AS contrib
FROM c CROSS JOIN t
""",
    description="Benford's-law first-digit conformance of order "
    "amounts (the fraud/fabrication screen for ingested economic "
    "series): observed vs expected log10(1+1/d) shares with chi-squared "
    "contributions; the first digit comes from the BIGINT decimal "
    "rendering (engine-identical) not log10 exponent arithmetic, and "
    "the expected shares are shared Python-computed literals "
    "(operators/stats.py:benford_first_digit)",
)
def benford_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import benford_first_digit

    orders = load_table(spark, "orders", sf_dir)
    return benford_first_digit(orders, "o_totalprice")


@query(
    "gini_customer_spend",
    oracle="""
WITH totals AS (
  SELECT c.c_mktsegment, o.o_custkey, round(sum(o.o_totalprice), 2) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_mktsegment, x,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY x, o_custkey) AS i
  FROM totals
)
SELECT c_mktsegment,
       count(*) AS n_entities,
       round(sum(x), 2) AS total_value,
       round(2.0 * sum(i * x) / (count(*) * sum(x))
             - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
FROM ranked GROUP BY 1
""",
    description="Gini concentration of customer spend within each "
    "market segment (rank formula over ascending per-customer totals) "
    "— the corpus-concentration screen a source-mixing policy reads; "
    "the fact table reduces to per-customer totals FIRST (one "
    "map-combined exchange), the rank is the blocked two-pass form "
    "over the entity frame (r14 — O(customers) under ~5 segments made "
    "the old per-group window a few single-task sorts of ALL "
    "entities), totals rounded 2 dp before ranking per the house "
    "float-sum discipline (operators/stats.py:gini_by_group)",
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import gini_by_group

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = orders.join(cust, "o_custkey")
    return gini_by_group(joined, "c_mktsegment", "o_custkey", "o_totalprice")


@query(
    "spearman_quantity_price",
    oracle="""
WITH r AS (
  SELECT l_returnflag,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
             / 2.0 AS rx,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
              - 1) / 2.0 AS ry
  FROM lineitem
)
SELECT l_returnflag,
       count(*) AS n,
       round(corr(rx, ry), 6) AS spearman_rho
FROM r GROUP BY 1
""",
    description="Spearman rank correlation (midrank tie correction, "
    "scipy-equivalent) between quantity and extended price per return "
    "flag: each axis collapses to its per-(flag, value) tie-group "
    "support, min-ranks come from tie-count prefix sums through the "
    "blocked two-pass rank, and the midranks equi-join back for the "
    "map-combined corr aggregate (r14 — the old per-flag rank windows "
    "single-task-sorted the whole fact table under 3 flags); "
    "monotone-association screen that Pearson-on-values misses under "
    "nonlinearity (operators/stats.py:spearman_corr)",
)
def spearman_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import spearman_corr

    li = load_table(spark, "lineitem", sf_dir)
    return spearman_corr(li, "l_returnflag", "l_quantity", "l_extendedprice")


@query(
    "skyline_orders_price_date",
    # oracle: dominance re-derived ALGEBRAICALLY from per-price-group
    # date maxima — p is dominated iff a strictly-higher price level's
    # running max date reaches p's date (A) or p's own price level has
    # a later date (B); (A or B) is exactly the "(>=, >=, one strict)"
    # dominance definition split on the price comparison. O(n log n)
    # in DuckDB where the old NOT-EXISTS mark join was O(n^2) (blew
    # the 240 s sf0.1 sweep budget, VERDICT r11 item 2/3); verified
    # row-identical to the quadratic definition at sf0.01, and still
    # INDEPENDENT of the engine's distributed sort-prune plan
    oracle="""
WITH pg AS (
  SELECT o_totalprice AS price, max(o_orderdate) AS mxd
  FROM orders GROUP BY 1
),
run AS (
  SELECT price, mxd,
         max(mxd) OVER (ORDER BY price DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS mxd_above
  FROM pg
)
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate
FROM orders o JOIN run r ON r.price = o.o_totalprice
WHERE (r.mxd_above IS NULL OR r.mxd_above < o.o_orderdate)
  AND r.mxd <= o.o_orderdate
""",
    description="2-D skyline: orders no other order beats on BOTH "
    "total price and recency (Pareto frontier, ties kept) — local "
    "per-partition sort-prune then a global pass over the tiny "
    "survivor set, never an O(n^2) dominance self-join; the oracle "
    "re-derives dominance from per-price-group date maxima (a "
    "different algebra than the engine's sort-prune, pinned "
    "row-identical to the quadratic definition) "
    "(operators/stats.py:pareto_frontier_2d)",
)
def skyline_orders_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import pareto_frontier_2d

    orders = load_table(spark, "orders", sf_dir)
    frontier = pareto_frontier_2d(orders, "o_totalprice", "o_orderdate")
    return (
        orders.join(frontier, ["o_totalprice", "o_orderdate"])
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "odate"
            ),
        )
    )


@query(
    "survival_user_lifetime",
    oracle="""
WITH u AS (
  SELECT user_id, min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
  FROM events GROUP BY user_id
),
c AS (SELECT max(mx) AS cmax, min(mn) AS cmin FROM u),
l AS (
  SELECT (u.mx - u.mn) / CAST(1000000 AS DOUBLE) AS t,
         u.mx > c.cmax - ((c.cmax - c.cmin) // 5) AS censored
  FROM u CROSS JOIN c
),
per_t AS (
  SELECT t,
         CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
           AS d_events,
         CAST(count(*) AS BIGINT) AS m
  FROM l GROUP BY t
),
tot AS (SELECT CAST(sum(m) AS BIGINT) AS total FROM per_t),
risk AS (
  SELECT t, d_events,
         CAST(total - COALESCE(sum(m) OVER (
                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
  FROM per_t CROSS JOIN tot
),
ev AS (SELECT * FROM risk WHERE d_events > 0)
SELECT t, n_at_risk, d_events,
       CASE WHEN max(CASE WHEN d_events = n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
            THEN CAST(0 AS DOUBLE)
            ELSE round(exp(sum(CASE WHEN d_events < n_at_risk
                                    THEN ln(1 - CAST(d_events AS DOUBLE)
                                            / n_at_risk)
                               END) OVER (
                         ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
       END AS survival
FROM ev
""",
    description="Kaplan-Meier survival curve of user lifetime (first to "
    "last event, seconds), right-censoring users whose last event falls "
    "in the final fifth of the corpus span (still active — they leave "
    "the risk set without counting as exits, the correction a naive "
    "fraction-alive retention curve gets wrong); exact integer risk/"
    "exit counts, product-limit walk as exp(sum(ln(1 - d/n))) over the "
    "O(|distinct durations|) frame with the d = n endpoint flagged to "
    "exact 0, never ln(0) (operators/stats.py:km_survival)",
)
def survival_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import km_survival

    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros("ts")
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("__mn"), F.max(us).alias("__mx")
    )
    c = u.agg(F.max("__mx").alias("__cmax"), F.min("__mn").alias("__cmin"))
    cutoff = F.col("__cmax") - F.expr("(__cmax - __cmin) div 5")
    l = u.join(F.broadcast(c)).select(
        ((F.col("__mx") - F.col("__mn")) / F.lit(1000000.0)).alias("dur"),
        (F.col("__mx") > cutoff).alias("cens"),
    )
    return km_survival(l, "dur", "cens")


@query(
    "weighted_median_price",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt,
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_quantity
                               ROWS UNBOUNDED PRECEDING) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows_at_or_after,
       round(min(v), 2) AS weighted_median,
       round(any_value(tw), 2) AS total_weight
FROM c WHERE cw >= tw / 2
GROUP BY l_returnflag
""",
    description="quantity-weighted median price per return flag (lower "
    "weighted median: smallest value whose cumulative weight crosses "
    "half the total) — the robust center a plain median misses when "
    "rows carry unequal mass; the fact table collapses to its "
    "per-(flag, price, quantity) tie-group support and the cumulative "
    "weight comes from exact long prefix sums through the blocked "
    "two-pass rank (r14 — the old per-flag running-sum window pushed "
    "the whole fact table through 3 single-task sorts); within a tie "
    "group of m identical (price, quantity=q) rows the j-th row's "
    "cumulative weight is base + j*q, so the at-or-after ROW count is "
    "recovered exactly with integer ceil-division — bit-identical to "
    "the row-level window definition the oracle keeps",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import ordered_prefix

    li = load_table(spark, "lineitem", sf_dir)
    sup = (
        li.groupBy(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
        .withColumn("gw", F.col("q") * F.col("m"))
    )
    pref = ordered_prefix(
        sup,
        [("v", True), ("q", True)],
        carry=["v", "q", "m", "gw"],
        sums=["gw"],
        block=["l_returnflag"],
    )
    tot = sup.groupBy("l_returnflag").agg(F.sum("gw").alias("tw"))
    j = (
        pref.join(F.broadcast(tot), "l_returnflag")
        # 2*cw_j >= tw with cw_j = base + j*q (all exact longs):
        # smallest such j is ceil((tw - 2*base) / (2*q))
        .withColumn("__num", F.col("tw") - 2 * (F.col("__cum_gw") - F.col("gw")))
        .withColumn(
            "__jmin",
            F.when(F.col("__num") <= 0, F.lit(0)).otherwise(
                F.expr("(__num + 2*q - 1) div (2*q)")
            ),
        )
        .withColumn(
            "__cnt",
            F.col("m")
            - F.least(F.greatest(F.col("__jmin") - 1, F.lit(0)), F.col("m")),
        )
        .where(F.col("__cnt") > 0)
    )
    return j.groupBy("l_returnflag").agg(
        F.sum("__cnt").alias("n_rows_at_or_after"),
        F.round(F.min("v"), 2).alias("weighted_median"),
        F.round(F.first(F.col("tw").cast("double")), 2).alias("total_weight"),
    )


@query(
    "sampling_effective_size",
    oracle="""
SELECT source,
       count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_w,
       round(CAST(sum(n_chars) AS DOUBLE) * sum(n_chars)
             / sum(CAST(n_chars AS DOUBLE) * n_chars), 4) AS ess,
       round(CAST(sum(n_chars) AS DOUBLE) * sum(n_chars)
             / sum(CAST(n_chars AS DOUBLE) * n_chars) / count(*), 6)
         AS ess_ratio
FROM documents GROUP BY source
""",
    description="Kish effective sample size (sum w)^2 / sum(w^2) per "
    "source under length-proportional importance weights — how many "
    "equal-weight documents the weighted sample is actually worth "
    "(ess_ratio ~ 1 = uniform, -> 1/n = one doc dominates); exact "
    "integer weight sums, one map-combined exchange",
)
def sampling_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = F.col("n_chars")
    sw = F.sum(w)
    sw2 = F.sum(w.cast("double") * w)
    ess = sw.cast("double") * sw / sw2
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        sw.alias("sum_w"),
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.count(F.lit(1)), 6).alias("ess_ratio"),
    )


@query(
    "calibration_length_deciles",
    oracle="""
WITH d AS (
  SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_score,
       round(CAST(sum(pos) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
         AS pos_rate
FROM d GROUP BY decile
""",
    description="calibration / reliability table for the length-as-"
    "quality feature: equal-count score deciles (ntile with a unique "
    "tiebreak, engine-deterministic) vs the observed English rate per "
    "decile — the companion readout to auc_doc_length_lang that shows "
    "WHERE the feature separates, not just whether",
)
def calibration_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equal-count deciles WITHOUT the textbook global ntile, which
    # funnels every corpus row through one WindowExec task (the shape
    # customer_rfm_segments' pin refuses): exact_ntile range-partitions
    # on (n_chars, doc_id), ranks locally per partition slice, and
    # lifts to global ranks via a broadcast O(n_partitions) offset
    # frame — bit-identical bucket assignment, no single-task sort
    from ..operators.rank import exact_ntile

    docs = load_table(spark, "documents", sf_dir)
    d = exact_ntile(
        docs.select(
            "n_chars",
            "doc_id",
            (F.col("lang") == "en").cast("long").alias("pos"),
        ),
        10,
        [("n_chars", True), ("doc_id", True)],
        carry=["n_chars", "pos"],
        tile_col="decile",
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_score"),
        F.round(
            F.sum("pos") / F.count(F.lit(1)).cast("double"), 6
        ).alias("pos_rate"),
    )


@query(
    "source_ucb_scores",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_reward
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM s)
SELECT source, n, n_reward,
       round(CAST(n_reward AS DOUBLE) / n, 6) AS mean_reward,
       round(CAST(n_reward AS DOUBLE) / n
             + sqrt(2.0 * ln(CAST(total AS DOUBLE)) / n), 6) AS ucb
FROM s CROSS JOIN t
""",
    description="UCB1 source-selection scores (mean reward + "
    "sqrt(2 ln N / n) exploration bonus) with English-rate as the "
    "reward signal — the bandit policy a dynamic source-mixing "
    "curator runs to balance exploiting known-good sources against "
    "exploring under-sampled ones; exact integer counts, one "
    "map-combined exchange, 1-row total broadcast",
)
def source_ucb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lang") == "en").cast("long")).alias("n_reward"),
    )
    t = s.agg(F.sum("n").alias("__total"))
    mean_r = F.col("n_reward").cast("double") / F.col("n")
    return s.join(F.broadcast(t)).select(
        "source",
        "n",
        "n_reward",
        F.round(mean_r, 6).alias("mean_reward"),
        F.round(
            mean_r
            + F.sqrt(
                F.lit(2.0)
                * F.log(F.col("__total").cast("double"))
                / F.col("n")
            ),
            6,
        ).alias("ucb"),
    )


_PSI_EPS = 1e-6  # shared clamp literal: an empty bucket's share


@query(
    "profile_psi_lengths",
    oracle=f"""
WITH old AS (SELECT n_chars FROM documents WHERE doc_id % 5 <> 0),
new AS (SELECT n_chars FROM documents WHERE doc_id % 5 = 0),
e AS (
  SELECT quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS q
  FROM old
),
ob AS (
  SELECT 1 + len(list_filter(e.q, x -> old.n_chars > x)) AS bucket
  FROM old CROSS JOIN e
),
nb AS (
  SELECT 1 + len(list_filter(e.q, x -> new.n_chars > x)) AS bucket
  FROM new CROSS JOIN e
),
oc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_old FROM ob GROUP BY 1),
nc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new FROM nb GROUP BY 1),
ot AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old FROM oc),
nt AS (SELECT CAST(sum(n_new) AS BIGINT) AS t_new FROM nc),
b AS (
  SELECT oc.bucket,
         COALESCE(oc.n_old, 0) AS n_old,
         COALESCE(nc.n_new, 0) AS n_new,
         greatest(COALESCE(oc.n_old, 0) / CAST(ot.t_old AS DOUBLE),
                  {_PSI_EPS!r}) AS po,
         greatest(COALESCE(nc.n_new, 0) / CAST(nt.t_new AS DOUBLE),
                  {_PSI_EPS!r}) AS pn
  FROM oc LEFT JOIN nc USING (bucket)
  CROSS JOIN ot CROSS JOIN nt
)
SELECT CAST(bucket AS INTEGER) AS bucket, n_old, n_new,
       round(po, 6) AS p_old,
       round(pn, 6) AS p_new,
       round((pn - po) * ln(pn / po), 6) AS psi_term
FROM b
""",
    description="population stability index of the document-length "
    "distribution, arriving snapshot vs existing corpus: buckets are "
    "the OLD corpus's exact deciles (so p_old ~ 0.1 by construction), "
    "per-bucket (p_new - p_old) ln(p_new/p_old) terms with a shared "
    "epsilon clamp for empty buckets — the standard drift gate "
    "(total < 0.1 stable, > 0.25 act) a profiling pipeline runs on "
    "every feature; bucket index by counting broadcast edges below "
    "the value, engine-identical given exact quantile edges",
)
def profile_psi_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    old = docs.where(F.col("doc_id") % 5 != 0).select("n_chars")
    new = docs.where(F.col("doc_id") % 5 == 0).select("n_chars")
    qs = [i / 10.0 for i in range(1, 10)]
    edges = old.agg(F.percentile("n_chars", qs).alias("__q"))

    def buckets(df):
        b = F.lit(1)
        for k in range(9):
            b = b + (F.col("n_chars") > F.col("__q")[k]).cast("int")
        return (
            df.join(F.broadcast(edges))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    oc = buckets(old).withColumnRenamed("n", "n_old")
    nc = buckets(new).withColumnRenamed("n", "n_new")
    ot = oc.agg(F.sum("n_old").alias("__to"))
    nt = nc.agg(F.sum("n_new").alias("__tn"))
    j = (
        oc.join(nc, "bucket", "left")
        .join(F.broadcast(ot))
        .join(F.broadcast(nt))
        .select(
            "bucket",
            F.col("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.greatest(
                F.col("n_old") / F.col("__to").cast("double"),
                F.lit(_PSI_EPS),
            ).alias("__po"),
            F.greatest(
                F.coalesce("n_new", F.lit(0)) / F.col("__tn").cast("double"),
                F.lit(_PSI_EPS),
            ).alias("__pn"),
        )
    )
    return j.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_old",
        "n_new",
        F.round("__po", 6).alias("p_old"),
        F.round("__pn", 6).alias("p_new"),
        F.round(
            (F.col("__pn") - F.col("__po"))
            * F.log(F.col("__pn") / F.col("__po")),
            6,
        ).alias("psi_term"),
    )


@query(
    "kruskal_wallis_qty_flag",
    oracle="""
WITH cells AS (
  SELECT l_quantity AS v, l_returnflag, count(*) AS c
  FROM lineitem GROUP BY 1, 2
),
pv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
mid AS (
  SELECT v, t,
         COALESCE(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0)
           + (t + 1) / 2.0 AS midrank
  FROM pv
),
pg AS (
  SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
         sum(c * midrank) AS rsum
  FROM cells JOIN mid USING (v) GROUP BY 1
),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS n_all,
               sum(CAST(t AS DOUBLE) * t * t - t) AS tie3 FROM mid),
kk AS (SELECT count(*) AS k, sum(rsum * rsum / n) AS hsum FROM pg),
hh AS (
  SELECT 12.0 / (CAST(n_all AS DOUBLE) * (CAST(n_all AS DOUBLE) + 1))
           * hsum - 3 * (CAST(n_all AS DOUBLE) + 1) AS h,
         1.0 - tie3 / (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE)
                       * CAST(n_all AS DOUBLE) - CAST(n_all AS DOUBLE))
           AS ctie,
         CAST(k - 1 AS INTEGER) AS dof
  FROM tot CROSS JOIN kk
)
SELECT l_returnflag, n, round(rsum / n, 6) AS mean_rank,
       round(h, 6) AS h_stat, round(h / ctie, 6) AS h_adj, dof
FROM pg CROSS JOIN hh
""",
    description="Kruskal-Wallis H test (ANOVA on ranks, tie-corrected) "
    "of line-item quantity across return flags: rank-based BY DESIGN — "
    "the raw-value F statistic's sum-of-squares cancellation amplifies "
    "partial-sum-order ulp noise, midranks are exact halves; the fact "
    "table collapses to O(|domain| x |groups|) cells, global midranks "
    "come from a cumulative window over the 50-value quantity DOMAIN "
    "(the KS bounded-domain justification) and broadcast back — the "
    "corpus never enters a global sort "
    "(operators/stats.py:kruskal_wallis)",
)
def kruskal_wallis_qty_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import kruskal_wallis

    li = load_table(spark, "lineitem", sf_dir)
    return kruskal_wallis(li, "l_returnflag", "l_quantity")


def _cramers_ctes(tag: str, table: str, a: str, b: str) -> str:
    return f"""
c_{tag} AS (SELECT {a} AS va, {b} AS vb, count(*) AS n_obs
            FROM {table}
            WHERE {a} IS NOT NULL AND {b} IS NOT NULL GROUP BY 1, 2),
rm_{tag} AS (SELECT va, CAST(sum(n_obs) AS BIGINT) AS rt
             FROM c_{tag} GROUP BY 1),
cm_{tag} AS (SELECT vb, CAST(sum(n_obs) AS BIGINT) AS ct
             FROM c_{tag} GROUP BY 1),
t_{tag} AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n,
                   count(DISTINCT va) AS ka, count(DISTINCT vb) AS kb
            FROM c_{tag}),
x_{tag} AS (
  SELECT sum(CAST(n_obs AS DOUBLE) * n_obs
             / (CAST(rt * ct AS DOUBLE) / t.n)) - max(t.n) AS chi2
  FROM c_{tag} JOIN rm_{tag} USING (va) JOIN cm_{tag} USING (vb)
  CROSS JOIN t_{tag} t
)"""


def _cramers_select(tag: str, label: str) -> str:
    return f"""
SELECT '{label}' AS pair, t.n,
       CAST(t.ka AS INTEGER) AS ka, CAST(t.kb AS INTEGER) AS kb,
       round(x.chi2, 6) AS chi2,
       round(sqrt(x.chi2 / (t.n * CAST(least(t.ka - 1, t.kb - 1)
                                       AS DOUBLE))), 6) AS cramers_v
FROM t_{tag} t CROSS JOIN x_{tag} x
"""


_CRAMERS_PAIRS = [
    ("p1", "orders", "o_orderpriority", "o_orderstatus",
     "priority_status"),
    ("p2", "lineitem", "l_returnflag", "l_linestatus",
     "returnflag_linestatus"),
    ("p3", "documents", "lang", "source", "lang_source"),
]


@query(
    "cramers_v_pairs",
    oracle="WITH "
    + ",".join(_cramers_ctes(t, tb, a, b) for t, tb, a, b, _ in _CRAMERS_PAIRS)
    + " UNION ALL ".join(
        _cramers_select(t, lbl) for t, _, _, _, lbl in _CRAMERS_PAIRS
    ),
    description="Cramér's V association strength for three categorical "
    "pairs (order priority x status, return flag x line status, doc "
    "lang x source): the [0,1] effect size raw chi-squared hides — the "
    "feature-redundancy screen a curation pipeline runs before keeping "
    "two correlated quality signals; same O(|A| x |B|) cell plan as the "
    "chi2 entry per pair, three tiny reports unioned "
    "(operators/stats.py:cramers_v)",
)
def cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import cramers_v

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    return (
        cramers_v(orders, "o_orderpriority", "o_orderstatus",
                  "priority_status")
        .unionByName(
            cramers_v(li, "l_returnflag", "l_linestatus",
                      "returnflag_linestatus")
        )
        .unionByName(cramers_v(docs, "lang", "source", "lang_source"))
    )


@query(
    "abtest_conversion_ztest",
    oracle="""
WITH pe AS (
  SELECT user_id, CAST(max(user_id % 2) AS INTEGER) AS g,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
  FROM events GROUP BY 1
),
c AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
         CAST(sum(CASE WHEN g = 0 AND s = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS conv_0,
         CAST(sum(CASE WHEN g = 1 AND s = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS conv_1
  FROM pe
)
SELECT n_0, n_1, conv_0, conv_1,
       round(CAST(conv_0 AS DOUBLE) / n_0, 6) AS p_0,
       round(CAST(conv_1 AS DOUBLE) / n_1, 6) AS p_1,
       round((CAST(conv_1 AS DOUBLE) / n_1 - CAST(conv_0 AS DOUBLE) / n_0)
             / sqrt((CAST(conv_0 + conv_1 AS DOUBLE) / (n_0 + n_1))
                    * (1 - CAST(conv_0 + conv_1 AS DOUBLE) / (n_0 + n_1))
                    * (1.0 / n_0 + 1.0 / n_1)), 6) AS z_score
FROM c
""",
    description="two-proportion pooled z-test of purchase conversion "
    "between the even/odd user-id cohorts (the deterministic-cohort A/B "
    "readout): one map-combined exchange to per-user (cohort, "
    "converted) flags, one 4-counter aggregate, z from exact integer "
    "counts — no joins, no windows; swap the parity split for a hash "
    "bucket and this is the experiment scorecard at any scale "
    "(operators/stats.py:two_proportion_ztest)",
)
def abtest_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import two_proportion_ztest

    ev = load_table(spark, "events", sf_dir)
    return two_proportion_ztest(
        ev,
        "user_id",
        F.col("user_id") % 2,
        F.col("event_type") == "purchase",
    )


_HILL_K = 100


@query(
    "tail_index_hill_prices",
    oracle=f"""
WITH r AS (
  SELECT o_totalprice AS x,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS rn
  FROM orders
),
thr AS (SELECT x AS x_thr FROM r WHERE rn = {_HILL_K} + 1),
top AS (SELECT x FROM r WHERE rn <= {_HILL_K})
SELECT CAST({_HILL_K} AS BIGINT) AS k,
       round((SELECT x_thr FROM thr), 2) AS threshold,
       round(avg(ln(x / (SELECT x_thr FROM thr))), 6) AS hill_gamma,
       round(1.0 / avg(ln(x / (SELECT x_thr FROM thr))), 6) AS tail_alpha
FROM top
""",
    description="Hill estimator of the price distribution's tail index "
    "(gamma = mean log-excess over the k+1-th order statistic, alpha = "
    "1/gamma): alpha <= 2 means infinite variance — means/CIs over "
    "such amounts are lies, and a 100 TB aggregate wants to know "
    "BEFORE averaging; the k+1 top order statistics come from one "
    "TakeOrdered (never a global sort), ties pinned by order key, "
    "ln-ratios of identical doubles round 6",
)
def tail_index_hill_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    topk1 = (
        orders.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.desc("x"), F.asc("o_orderkey"))
        .limit(_HILL_K + 1)
    )
    w = Window.orderBy(F.desc("x"), F.asc("o_orderkey"))
    ranked = topk1.select(
        "x", F.row_number().over(w).alias("__rn")
    )
    thr = ranked.where(F.col("__rn") == _HILL_K + 1).select(
        F.col("x").alias("__thr")
    )
    top = ranked.where(F.col("__rn") <= _HILL_K)
    g = F.avg(F.log(F.col("x") / F.col("__thr")))
    return (
        top.join(F.broadcast(thr))
        .agg(
            F.lit(_HILL_K).cast("long").alias("k"),
            F.round(F.min("__thr"), 2).alias("threshold"),
            F.round(g, 6).alias("hill_gamma"),
            F.round(F.lit(1.0) / g, 6).alias("tail_alpha"),
        )
    )


@query(
    "ols_price_on_size_by_brand",
    oracle="""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n,
       round(covar_samp(p_size, p_retailprice)
             / var_samp(p_size), 6) AS slope,
       round(avg(p_retailprice) - covar_samp(p_size, p_retailprice)
             / var_samp(p_size) * avg(p_size), 6) AS intercept,
       round(corr(p_size, p_retailprice)
             * corr(p_size, p_retailprice), 6) AS r_squared
FROM part GROUP BY 1
""",
    description="per-brand OLS regression of retail price on part size "
    "(slope = cov/var, intercept from the means, r-squared = corr^2): "
    "the classic cross-sectional fit the robust family (Theil-Sen, "
    "Mann-Kendall) is compared against — one map-combined "
    "covariance/variance aggregate per brand, no residual pass, no "
    "driver math; engine covar/var/corr over identical doubles, "
    "6 dp rounding absorbing co-moment order",
)
def ols_price_on_size_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    x = F.col("p_size").cast("double")
    y = F.col("p_retailprice")
    slope = F.covar_samp(x, y) / F.var_samp(x)
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg(y) - slope * F.avg(x), 6).alias("intercept"),
        F.round(F.corr(x, y) * F.corr(x, y), 6).alias("r_squared"),
    )
