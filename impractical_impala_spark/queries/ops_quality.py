"""Round-9 wave 13: operational quality — fairness completion,
revenue cohorts, feed freshness.

- ``fairness_equalized_odds``: per-slice TPR/FPR parity of the
  standing synthetic operating-point task (value-bin threshold
  predicts purchase) across 4-way day slices — the equalized-odds companion
  to fairness_accuracy_parity's four-fifths accuracy test. Exact
  integer confusion counts; rates and gaps in integer ppm.
- ``orders_cohort_ltv``: cumulative-revenue LTV curves by first-order
  month cohort over a bounded month-offset horizon — the
  revenue-side companion to events_cohort_retention. Dense offset
  spine (cohorts x horizon — model-size), exact cents.
- ``dq_freshness_sla``: per-feed staleness audit — lag of each event
  type's newest event behind the global watermark, SLA verdict, and
  last-day volume vs the feed's daily average (a dying feed shows up
  here before it shows up as drift). Exact integer microseconds /
  ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .calibration_ops import _ORACLE_BINNED, _binned_events

# --------------------------------------------- equalized-odds audit
EO_BINS = 256
EO_THRESH_BIN = 192  # predict positive when bin >= this (top quarter)


def fairness_equalized_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalized-odds audit: the threshold classifier
    (value bin >= EO_THRESH_BIN predicts 'purchase') must have similar
    true-positive AND false-positive rates across 4-way day slices. Confusion
    counts are exact integers off the shared 256-bin spine; TPR/FPR
    and the pooled rates are integer ppm; the equalized-odds gap is
    |tpr - pooled_tpr| + |fpr - pooled_fpr|. One fact shuffle into
    (daypart x bin); everything after is model-size."""
    binned = _binned_events(spark, sf_dir, EO_BINS)
    by_dp = (binned
             .withColumn("day_slice", F.expr("cast(day % 4 as int)"))
             .withColumn("pred",
                         (F.col("bin") >= EO_THRESH_BIN).cast("int"))
             .groupBy("day_slice")
             .agg(F.sum(F.expr("pos * pred")).alias("tp"),
                  F.sum(F.expr("(1 - pos) * pred")).alias("fp"),
                  F.sum(F.expr("pos * (1 - pred)")).alias("fn"),
                  F.sum(F.expr("(1 - pos) * (1 - pred)")).alias("tn")))
    pooled = by_dp.agg(
        F.expr("sum(tp) * 1000000 div (sum(tp) + sum(fn))")
        .alias("pooled_tpr_ppm"),
        F.expr("sum(fp) * 1000000 div (sum(fp) + sum(tn))")
        .alias("pooled_fpr_ppm"))
    return (by_dp.crossJoin(F.broadcast(pooled))
            .select("day_slice",
                    F.expr("tp + fp + fn + tn").alias("n"),
                    F.expr("case when tp + fn = 0 then null else"
                           " tp * 1000000 div (tp + fn) end")
                    .alias("tpr_ppm"),
                    F.expr("case when fp + tn = 0 then null else"
                           " fp * 1000000 div (fp + tn) end")
                    .alias("fpr_ppm"),
                    "pooled_tpr_ppm", "pooled_fpr_ppm",
                    F.expr("case when tp + fn = 0 or fp + tn = 0 then null"
                           " else abs(tp * 1000000 div (tp + fn)"
                           " - pooled_tpr_ppm)"
                           " + abs(fp * 1000000 div (fp + tn)"
                           " - pooled_fpr_ppm) end").alias("eo_gap_ppm"))
            .orderBy("day_slice"))


register("fairness_equalized_odds", fairness_equalized_odds, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=EO_BINS, pos='purchase')}),
by_dp AS (
    SELECT CAST(day % 4 AS INTEGER) AS day_slice,
           CAST(SUM(pos * p) AS BIGINT) AS tp,
           CAST(SUM((1 - pos) * p) AS BIGINT) AS fp,
           CAST(SUM(pos * (1 - p)) AS BIGINT) AS fn,
           CAST(SUM((1 - pos) * (1 - p)) AS BIGINT) AS tn
    FROM (SELECT *, CASE WHEN bin >= {EO_THRESH_BIN} THEN 1 ELSE 0 END
                        AS p
          FROM binned)
    GROUP BY 1
), pooled AS (
    SELECT SUM(tp) * 1000000 // (SUM(tp) + SUM(fn)) AS pooled_tpr_ppm,
           SUM(fp) * 1000000 // (SUM(fp) + SUM(tn)) AS pooled_fpr_ppm
    FROM by_dp
)
SELECT day_slice,
       CAST(tp + fp + fn + tn AS BIGINT) AS n,
       CAST(CASE WHEN tp + fn = 0 THEN NULL
            ELSE tp * 1000000 // (tp + fn) END AS BIGINT) AS tpr_ppm,
       CAST(CASE WHEN fp + tn = 0 THEN NULL
            ELSE fp * 1000000 // (fp + tn) END AS BIGINT) AS fpr_ppm,
       CAST(pooled_tpr_ppm AS BIGINT) AS pooled_tpr_ppm,
       CAST(pooled_fpr_ppm AS BIGINT) AS pooled_fpr_ppm,
       CAST(CASE WHEN tp + fn = 0 OR fp + tn = 0 THEN NULL
            ELSE ABS(tp * 1000000 // (tp + fn) - pooled_tpr_ppm)
                 + ABS(fp * 1000000 // (fp + tn) - pooled_fpr_ppm) END
            AS BIGINT) AS eo_gap_ppm
FROM by_dp CROSS JOIN pooled
ORDER BY day_slice
""", "equalized-odds (TPR/FPR parity) audit across 4-way day slices")


# ------------------------------------------------------- cohort LTV
LTV_HORIZON = 6  # month offsets 0..5


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-revenue LTV curves: customers cohorted by first
    order month; per cohort and month-offset k (0..LTV_HORIZON-1) the
    cumulative revenue cents of the cohort's first k+1 months and the
    per-customer average (integer division — the documented
    quantization). The offset spine is dense (a cohort with a quiet
    month still gets the row), built by exploding the bounded horizon
    over the cohort dimension. Shuffle keys: custkey, then
    cohort-month — never wider than the fact scan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .alias("m"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    rev = (orders.join(first, "o_custkey")
           .withColumn("k", F.col("m") - F.col("cohort_m"))
           .filter(F.col("k") < LTV_HORIZON)
           .groupBy("cohort_m", "k")
           .agg(F.sum("cents").alias("rev_cents")))
    cohorts = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("n_customers"))
    spine = cohorts.select(
        "cohort_m", "n_customers",
        F.explode(F.expr(f"sequence(0, {LTV_HORIZON - 1})")).alias("k"))
    wk = (Window.partitionBy("cohort_m").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, 0))
    return (spine.join(rev, ["cohort_m", "k"], "left")
            .withColumn("rev_cents", F.coalesce("rev_cents", F.lit(0)))
            .withColumn("cum_cents", F.sum("rev_cents").over(wk))
            .select("cohort_m", "k", "n_customers", "cum_cents",
                    F.expr("cum_cents div n_customers")
                    .alias("avg_cum_cents"))
            .orderBy("cohort_m", "k"))


register("orders_cohort_ltv", orders_cohort_ltv, f"""
WITH ord AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER)
               AS m,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), first_m AS (
    SELECT o_custkey, MIN(m) AS cohort_m FROM ord GROUP BY 1
), rev AS (
    SELECT f.cohort_m, o.m - f.cohort_m AS k,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM ord o JOIN first_m f USING (o_custkey)
    WHERE o.m - f.cohort_m < {LTV_HORIZON}
    GROUP BY 1, 2
), cohorts AS (
    SELECT cohort_m, COUNT(*) AS n_customers FROM first_m GROUP BY 1
), spine AS (
    SELECT cohort_m, n_customers, UNNEST(range(0, {LTV_HORIZON})) AS k
    FROM cohorts
), dense AS (
    SELECT s.cohort_m, s.k, s.n_customers,
           COALESCE(r.rev_cents, 0) AS rev_cents
    FROM spine s LEFT JOIN rev r
      ON s.cohort_m = r.cohort_m AND s.k = r.k
)
SELECT cohort_m, CAST(k AS INTEGER) AS k,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY k
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT)
           AS cum_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m ORDER BY k
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
            // n_customers AS BIGINT) AS avg_cum_cents
FROM dense
ORDER BY cohort_m, k
""", "first-order-month cohort cumulative-revenue (LTV) curves")


# ----------------------------------------------------- feed freshness
SLA_LAG_US = 6 * 3600 * 1_000_000  # 6 hours behind the watermark
DAY_US = 86_400_000_000


def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness audit: each event type's newest event lag
    behind the global watermark (max ts over all feeds), an SLA
    verdict at 6 h, and last-day volume vs the feed's own daily
    average in ppm (a feed can be fresh AND dying — the volume ratio
    catches the second failure mode). Exact integer microseconds and
    ppm; two key-sized aggregates over one scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("ts_ns div 1000").alias("ts_us"))
    wm = ev.agg(F.max("ts_us").alias("wm_us"))
    per = (ev.crossJoin(F.broadcast(wm))
           .groupBy("event_type")
           .agg(F.max("ts_us").alias("last_us"),
                F.min("ts_us").alias("first_us"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr(
                    f"case when ts_us > wm_us - {DAY_US}"
                    " then 1 else 0 end")).alias("last_day_events"),
                F.max("wm_us").alias("wm_us")))
    return (per.select(
        "event_type", "n_events",
        F.expr("wm_us - last_us").alias("lag_us"),
        F.expr(f"cast(wm_us - last_us > {SLA_LAG_US} as int)")
        .alias("sla_breach"),
        "last_day_events",
        # daily average over the feed's own active span (>= 1 day)
        F.expr(f"case when last_us - first_us < {DAY_US}"
               f" then n_events else greatest(1, n_events * {DAY_US}"
               f" div (last_us - first_us)) end").alias("daily_avg"),
        F.expr(f"case when last_us - first_us < {DAY_US}"
               " then 1000000 else last_day_events * 1000000 div"
               f" greatest(1, n_events * {DAY_US}"
               " div (last_us - first_us)) end")
        .alias("last_day_vs_avg_ppm"))
        .orderBy("event_type"))


register("dq_freshness_sla", dq_freshness_sla, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events
), wm AS (
    SELECT MAX(ts_us) AS wm_us FROM ev
), per AS (
    SELECT event_type, MAX(ts_us) AS last_us, MIN(ts_us) AS first_us,
           COUNT(*) AS n_events,
           SUM(CASE WHEN ts_us > (SELECT wm_us FROM wm) - {DAY_US}
               THEN 1 ELSE 0 END) AS last_day_events,
           (SELECT wm_us FROM wm) AS wm_us
    FROM ev GROUP BY 1
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(wm_us - last_us AS BIGINT) AS lag_us,
       CAST(CASE WHEN wm_us - last_us > {SLA_LAG_US}
            THEN 1 ELSE 0 END AS INTEGER) AS sla_breach,
       CAST(last_day_events AS BIGINT) AS last_day_events,
       CAST(CASE WHEN last_us - first_us < {DAY_US} THEN n_events
            ELSE n_events * {DAY_US} // (last_us - first_us) END
            AS BIGINT) AS daily_avg,
       CAST(CASE WHEN last_us - first_us < {DAY_US} THEN 1000000
            ELSE last_day_events * 1000000
                 // (n_events * {DAY_US} // (last_us - first_us)) END
            AS BIGINT) AS last_day_vs_avg_ppm
FROM per
ORDER BY event_type
""", "per-feed freshness lag, SLA verdict, and volume-decay ratio")


# ---------------------------------------------------- SPC p-chart
from .monitor_eval import _ha_sql as _pc_ha  # noqa: E402


def lineitem_pchart_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart over the monthly return fraction — statistical
    process control with VARIABLE subgroup sizes: the centerline p-bar
    comes from the global counts, each ship-month's 3-sigma limits are
    p-bar +/- 3*sqrt(p-bar*(1-p-bar)/n_i), and the out-of-control flag
    compares the month's exact fraction against them. Counts are
    exact integers; the one float expression per month (the sqrt) has
    exact-integer inputs and quantizes to ppm with shared half-away
    rounding, so flags are bit-identical cross-engine. Two key-sized
    aggregates over one scan — the SPC complement to
    events_ewma_hourly's smoothed chart and the CUSUM family."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        F.expr("cast(l_returnflag = 'R' as int)").alias("r"))
    per_m = li.groupBy("m").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("r").alias("nr"))
    tot = per_m.agg(F.sum("n").alias("gn"), F.sum("nr").alias("gr"))
    sig = ("sqrt((cast(gr as double) / gn) * (1.0 - cast(gr as double) / gn)"
           " / n)")
    ucl = _pc_ha(f"(cast(gr as double) / gn + 3.0 * {sig}) * 1e6")
    lcl = _pc_ha(f"greatest(cast(gr as double) / gn - 3.0 * {sig}, 0.0)"
                 " * 1e6")
    return (per_m.crossJoin(F.broadcast(tot))
            .withColumn("p_ppm", F.expr("nr * 1000000 div n"))
            .withColumn("pbar_ppm", F.expr("gr * 1000000 div gn"))
            .withColumn("ucl_ppm", F.expr(ucl))
            .withColumn("lcl_ppm", F.expr(lcl))
            .withColumn("ooc", F.expr(
                "cast(p_ppm > ucl_ppm or p_ppm < lcl_ppm as int)"))
            .select("m", "n", "nr", "p_ppm", "pbar_ppm",
                    "ucl_ppm", "lcl_ppm", "ooc")
            .orderBy("m"))


register("lineitem_pchart_returns", lineitem_pchart_returns, f"""
WITH li AS (
    SELECT year(l_shipdate) * 12 + month(l_shipdate) AS m,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
    FROM lineitem
), per_m AS (
    SELECT m, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS nr
    FROM li GROUP BY m
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS gn, CAST(SUM(nr) AS BIGINT) AS gr
    FROM per_m
)
SELECT CAST(m AS INT) AS m, n, nr,
       CAST(nr * 1000000 // n AS BIGINT) AS p_ppm,
       CAST(gr * 1000000 // gn AS BIGINT) AS pbar_ppm,
       {_pc_ha(
           "(CAST(gr AS DOUBLE) / gn + 3.0 *"
           " sqrt((CAST(gr AS DOUBLE) / gn)"
           " * (1.0 - CAST(gr AS DOUBLE) / gn) / n)) * 1e6")} AS ucl_ppm,
       {_pc_ha(
           "GREATEST(CAST(gr AS DOUBLE) / gn - 3.0 *"
           " sqrt((CAST(gr AS DOUBLE) / gn)"
           " * (1.0 - CAST(gr AS DOUBLE) / gn) / n), 0.0) * 1e6")}
           AS lcl_ppm,
       CAST(CASE WHEN nr * 1000000 // n >
                 {_pc_ha(
                     "(CAST(gr AS DOUBLE) / gn + 3.0 *"
                     " sqrt((CAST(gr AS DOUBLE) / gn)"
                     " * (1.0 - CAST(gr AS DOUBLE) / gn) / n)) * 1e6")}
                 OR nr * 1000000 // n <
                 {_pc_ha(
                     "GREATEST(CAST(gr AS DOUBLE) / gn - 3.0 *"
                     " sqrt((CAST(gr AS DOUBLE) / gn)"
                     " * (1.0 - CAST(gr AS DOUBLE) / gn) / n), 0.0)"
                     " * 1e6")}
            THEN 1 ELSE 0 END AS INT) AS ooc
FROM per_m CROSS JOIN tot ORDER BY m
""", "Shewhart p-chart: monthly return fraction vs 3-sigma limits")
