"""Classical statistical tests, distribution-free and parametric, in
scale-correct decompositions — the round-7 rigor wave extending the
drift family (KS / Mann-Whitney / chi-square / CUSUM) with the tests a
data-quality review actually asks for next:

- Welch's t (parametric mean-shift complement to Mann-Whitney): exact
  integer sufficient statistics (n, sum, sum-of-squares on the
  centi-quantized value), one float evaluation at the end.
- Kruskal-Wallis H (k-group generalization of Mann-Whitney): midranks
  from the shared 256-bin quantized domain, doubled-integer rank sums,
  tie-corrected.
- Mann-Kendall trend test (the significance companion to the
  Theil-Sen slope): pairwise sign aggregation over the CALENDAR-
  bounded daily series, never over facts; tie-corrected variance in
  exact integers.
- Kendall's tau-b: concordant/discordant pair counts from 2D prefix
  sums over the DENSE bounded joint histogram (256 price bins x the
  discrete quantity domain) — the pair space collapses to grid cells.
- Jensen-Shannon divergence (bounded, symmetric drift measure —
  complements the unbounded PSI and the sup-norm KS).
- Kaplan-Meier survival with right-censoring: the survival-curve
  completion of user_churn_hazard (which emits the uncensored hazard
  table and deliberately leaves the product to the consumer).

Every operator reduces the fact table ONCE to a bounded-domain
aggregate (bins x groups, calendar days, lifetime days); all pairwise
or cumulative work happens on that bounded domain. Integer overflow
ladders are documented per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import N_KS_BINS, clip_bin

DAY_NS = 86_400_000_000_000


# ------------------------------------------------ Welch's t-test
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between the early and late half of
    each event type's value stream — the parametric mean-shift
    companion to events_mw_rank_drift (same global midpoint split).
    Values quantize to integer centi-units (floor(value*100)), so the
    sufficient statistics (n, sum, sum of squares) accumulate EXACTLY
    and order-free; t and the Welch-Satterthwaite df are one float
    evaluation on those integers. Overflow ladder: sum(centi^2) <=
    n * 2.5e9 holds int64 to ~3.7e9 rows per (type, half) — same
    class as the MW u2 bound; past that, pre-shard and sum partials
    as DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_ns",
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    stats = ev.agg(F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    halves = (ev.crossJoin(F.broadcast(stats))
              .withColumn("early", F.expr(
                  "CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END")))
    suff = halves.groupBy("event_type").agg(
        F.sum("early").alias("na"),
        F.sum(F.lit(1) - F.col("early")).alias("nb"),
        F.sum(F.col("early") * F.col("centi")).alias("sa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")).alias("sb"),
        F.sum(F.col("early") * F.col("centi") * F.col("centi")).alias("qa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")
              * F.col("centi")).alias("qb"))
    # float evaluation on exact integers, identical on both engines
    va = "((cast(na as double)*qa - cast(sa as double)*sa)/(cast(na as double)*(na-1)))"
    vb = "((cast(nb as double)*qb - cast(sb as double)*sb)/(cast(nb as double)*(nb-1)))"
    se2 = f"({va}/na + {vb}/nb)"
    t = (f"((cast(sa as double)/na - cast(sb as double)/nb)"
         f" / sqrt({se2}))")
    df = (f"({se2}*{se2} / (({va}/na)*({va}/na)/(na-1)"
          f" + ({vb}/nb)*({vb}/nb)/(nb-1)))")
    return (suff.select(
        "event_type", F.col("na").alias("n_early"),
        F.col("nb").alias("n_late"),
        F.expr("sa div na").alias("mean_early_centi"),
        F.expr("sb div nb").alias("mean_late_centi"),
        (F.round(F.expr(t), 4) + 0.0).alias("t_stat"),
        (F.round(F.expr(df), 2) + 0.0).alias("df_welch"))
        .orderBy("event_type"))


register("events_welch_ttest", events_welch_ttest, """
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events
), stats AS (
    SELECT (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns FROM ev
), suff AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 0 ELSE 1 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN centi ELSE 0 END) AS BIGINT) AS sa,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 0 ELSE centi END) AS BIGINT) AS sb,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN centi*centi ELSE 0 END) AS BIGINT) AS qa,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 0 ELSE centi*centi END) AS BIGINT) AS qb
    FROM ev CROSS JOIN stats GROUP BY event_type
)
SELECT event_type, na AS n_early, nb AS n_late,
       sa // na AS mean_early_centi,
       sb // nb AS mean_late_centi,
       ROUND((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)
             / SQRT(((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)/(CAST(na AS DOUBLE)*(na-1)))/na
                    + ((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)/(CAST(nb AS DOUBLE)*(nb-1)))/nb), 4)
           + 0.0 AS t_stat,
       ROUND((((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)/(CAST(na AS DOUBLE)*(na-1)))/na
              + ((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)/(CAST(nb AS DOUBLE)*(nb-1)))/nb)
             * (((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)/(CAST(na AS DOUBLE)*(na-1)))/na
                + ((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)/(CAST(nb AS DOUBLE)*(nb-1)))/nb)
             / ((((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)/(CAST(na AS DOUBLE)*(na-1)))/na)
                * (((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)/(CAST(na AS DOUBLE)*(na-1)))/na)/(na-1)
                + (((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)/(CAST(nb AS DOUBLE)*(nb-1)))/nb)
                * (((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)/(CAST(nb AS DOUBLE)*(nb-1)))/nb)/(nb-1)), 2)
           + 0.0 AS df_welch
FROM suff ORDER BY event_type
""", "Welch unequal-variance t-test, early vs late half per event type")


# --------------------------------------- Jensen-Shannon divergence
def events_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the early/late halves of each
    event type's value distribution over the shared 256-bin quantized
    domain — the BOUNDED (<= ln 2), symmetric drift measure that
    complements the sup-norm KS (events_value_ks_drift) and the
    unbounded PSI (doc_length_drift_psi). Histogram counts are exact
    integers off one fact scan; the JSD sum runs over <= types x 256
    cells with term-wise zero handling (a bin absent from one half
    contributes only the other half's m-term), one rounded float."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_ns", "value")
    stats = ev.agg(F.min("value").alias("mn_v"), F.max("value").alias("mx_v"),
                   F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        clip_bin(F.col("value"), F.col("mn_v"), F.col("mx_v"),
                 N_KS_BINS).alias("bin"),
        F.expr("CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END").alias("early"))
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum("early").alias("ca"),
        F.sum(F.lit(1) - F.col("early")).alias("cb"))
    tot = per_bin.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    terms = (per_bin.join(F.broadcast(tot), "event_type")
             .withColumn("p", F.col("ca") / F.col("na"))
             .withColumn("q", F.col("cb") / F.col("nb"))
             .withColumn("m", (F.col("p") + F.col("q")) / 2)
             .withColumn("term",
                         F.when(F.col("ca") > 0,
                                F.col("p") * F.log(F.col("p") / F.col("m")))
                         .otherwise(F.lit(0.0)) / 2
                         + F.when(F.col("cb") > 0,
                                  F.col("q") * F.log(F.col("q") / F.col("m")))
                         .otherwise(F.lit(0.0)) / 2))
    return (terms.groupBy("event_type")
            .agg(F.max("na").alias("n_early"),
                 F.max("nb").alias("n_late"),
                 (F.round(F.sum("term"), 6) + 0.0).alias("jsd_nats"))
            .orderBy("event_type"))


register("events_jsd_drift", events_jsd_drift, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns, value
    FROM events
), stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v,
           (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns
    FROM ev
), binned AS (
    SELECT event_type,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_KS_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_KS_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin,
           CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END AS early
    FROM ev CROSS JOIN stats
), per_bin AS (
    SELECT event_type, bin,
           CAST(SUM(early) AS BIGINT) AS ca,
           CAST(SUM(1 - early) AS BIGINT) AS cb
    FROM binned GROUP BY 1, 2
), tot AS (
    SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
           CAST(SUM(cb) AS BIGINT) AS nb
    FROM per_bin GROUP BY 1
), terms AS (
    SELECT p.event_type, t.na, t.nb,
           (CASE WHEN p.ca > 0 THEN (p.ca / CAST(t.na AS DOUBLE))
                 * LN((p.ca / CAST(t.na AS DOUBLE))
                      / ((p.ca / CAST(t.na AS DOUBLE)
                          + p.cb / CAST(t.nb AS DOUBLE)) / 2))
                 ELSE 0.0 END) / 2
           + (CASE WHEN p.cb > 0 THEN (p.cb / CAST(t.nb AS DOUBLE))
                   * LN((p.cb / CAST(t.nb AS DOUBLE))
                        / ((p.ca / CAST(t.na AS DOUBLE)
                            + p.cb / CAST(t.nb AS DOUBLE)) / 2))
                   ELSE 0.0 END) / 2 AS term
    FROM per_bin p JOIN tot t ON p.event_type = t.event_type
)
SELECT event_type, MAX(na) AS n_early, MAX(nb) AS n_late,
       ROUND(SUM(term), 6) + 0.0 AS jsd_nats
FROM terms GROUP BY event_type ORDER BY event_type
""", "Jensen-Shannon drift, early vs late half per event type")


# ------------------------------------------------ Kruskal-Wallis H
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types at once — the k-group
    generalization of the pairwise Mann-Whitney drift test: do the
    type-conditional value distributions share a location? Midranks
    come from the GLOBAL 256-bin quantized histogram (doubled-integer
    midranks m2 = 2*cum_below + c + 1, so no fact total-order and no
    halves); per-group doubled rank sums R2_g = sum_bins c_gb * m2_b
    are exact integers (R2 <= n_g * (2N+1): int64 to ~2e9 rows at 2e9
    corpus — past that accumulate DECIMAL partials). H and the
    tie-corrected H' (divisor 1 - sum(c^3-c)/(N^3-N)) are one float
    evaluation; epsilon^2 = (H - k + 1)/(N - k) is the effect size."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.agg(F.min("value").alias("mn_v"), F.max("value").alias("mx_v"))
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        clip_bin(F.col("value"), F.col("mn_v"), F.col("mx_v"),
                 N_KS_BINS).alias("bin"))
    joint = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c_gb"))
    glob = joint.groupBy("bin").agg(F.sum("c_gb").alias("c_b"))
    wcum = Window.orderBy("bin")
    mids = (glob.withColumn(
        "m2", 2 * (F.sum("c_b").over(wcum) - F.col("c_b"))
        + F.col("c_b") + 1))
    grp = (joint.join(F.broadcast(mids.select("bin", "m2")), "bin")
           .groupBy("event_type")
           .agg(F.sum("c_gb").alias("n_g"),
                F.sum(F.col("c_gb") * F.col("m2")).alias("r2_g")))
    ties = glob.agg(
        F.sum(F.col("c_b") * F.col("c_b") * F.col("c_b") - F.col("c_b"))
        .alias("tie3"))
    agg = (grp.agg(
        F.sum("n_g").alias("n_total"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.expr("cast(r2_g as double) * r2_g / (4.0 * n_g)"))
        .alias("sum_r2_over_n"))
        .crossJoin(F.broadcast(ties)))
    h = ("(12.0 * sum_r2_over_n / (cast(n_total as double) * (n_total + 1))"
         " - 3.0 * (n_total + 1))")
    corr = ("(1.0 - cast(tie3 as double) / (cast(n_total as double)"
            " * n_total * n_total - n_total))")
    return agg.select(
        "n_total", "n_groups",
        (F.round(F.expr(h), 6) + 0.0).alias("h_stat"),
        (F.round(F.expr(f"{h} / {corr}"), 6) + 0.0).alias("h_tie_corrected"),
        (F.round(F.expr(f"({h} - n_groups + 1)"
                        f" / (cast(n_total as double) - n_groups)"), 6)
         + 0.0).alias("epsilon_sq"))


register("events_kruskal_wallis", events_kruskal_wallis, f"""
WITH stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v FROM events
), binned AS (
    SELECT event_type,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_KS_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_KS_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin
    FROM events CROSS JOIN stats
), joint AS (
    SELECT event_type, bin, COUNT(*) AS c_gb FROM binned GROUP BY 1, 2
), gbin AS (
    SELECT bin, CAST(SUM(c_gb) AS BIGINT) AS c_b FROM joint GROUP BY bin
), mids AS (
    SELECT bin, 2 * (CAST(SUM(c_b) OVER (ORDER BY bin) AS BIGINT) - c_b)
                + c_b + 1 AS m2
    FROM gbin
), grp AS (
    SELECT event_type, CAST(SUM(c_gb) AS BIGINT) AS n_g,
           CAST(SUM(c_gb * m2) AS BIGINT) AS r2_g
    FROM joint JOIN mids USING (bin) GROUP BY event_type
), ties AS (
    SELECT CAST(SUM(c_b * c_b * c_b - c_b) AS BIGINT) AS tie3 FROM gbin
), agg AS (
    SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           SUM(CAST(r2_g AS DOUBLE) * r2_g / (4.0 * n_g)) AS sum_r2_over_n
    FROM grp
)
SELECT n_total, n_groups,
       ROUND(12.0 * sum_r2_over_n / (CAST(n_total AS DOUBLE) * (n_total + 1))
             - 3.0 * (n_total + 1), 6) + 0.0 AS h_stat,
       ROUND((12.0 * sum_r2_over_n / (CAST(n_total AS DOUBLE) * (n_total + 1))
              - 3.0 * (n_total + 1))
             / (1.0 - CAST(tie3 AS DOUBLE)
                / (CAST(n_total AS DOUBLE) * n_total * n_total - n_total)),
             6) + 0.0 AS h_tie_corrected,
       ROUND((12.0 * sum_r2_over_n / (CAST(n_total AS DOUBLE) * (n_total + 1))
              - 3.0 * (n_total + 1) - n_groups + 1)
             / (CAST(n_total AS DOUBLE) - n_groups), 6) + 0.0 AS epsilon_sq
FROM agg CROSS JOIN ties
""", "tie-corrected Kruskal-Wallis H across event types")


# ------------------------------------------------ Mann-Kendall trend
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on each event type's DAILY revenue
    series — the significance companion to nation_theilsen_trend's
    slope: S = sum over day pairs of sign(c_j - c_i), with the exact
    tie-corrected variance var18 = n(n-1)(2n+5) - sum t(t-1)(2t+5)
    (emitted as the x18 integer numerator) and the continuity-
    corrected z. The fact table reduces ONCE to the (type x calendar
    day) cents aggregate; the pairwise sign sum runs over that
    calendar-BOUNDED series (days^2 pairs per type — 13M at a 10-year
    window, independent of corpus size), never over facts. Everything
    but z is exact integer arithmetic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    daily = ev.groupBy("event_type", "d").agg(F.sum("centi").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.d") < F.col("b.d")))
         .groupBy(F.col("a.event_type").alias("event_type"))
         .agg(F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
              .alias("s_stat")))
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (daily.groupBy("event_type", "c")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
                 .alias("tie18")))
    out = (n.join(s, "event_type").join(ties, "event_type")
           .withColumn("var18",
                       F.col("n_days") * (F.col("n_days") - 1)
                       * (2 * F.col("n_days") + 5) - F.col("tie18")))
    z = ("CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var18 / 18.0) "
         "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var18 / 18.0) "
         "ELSE 0.0 END")
    return (out.select("event_type", "n_days", "s_stat", "var18",
                       (F.round(F.expr(z), 4) + 0.0).alias("z_mk"))
            .orderBy("event_type"))


register("events_mann_kendall", events_mann_kendall, f"""
WITH daily AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), s AS (
    SELECT a.event_type,
           CAST(SUM(CASE WHEN b.c > a.c THEN 1
                         WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.d < b.d
    GROUP BY a.event_type
), n AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1
), ties AS (
    SELECT event_type,
           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
    FROM (SELECT event_type, c, COUNT(*) AS t
          FROM daily GROUP BY 1, 2) tt
    GROUP BY event_type
)
SELECT n.event_type, n.n_days, s.s_stat,
       n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie18 AS var18,
       ROUND(CASE WHEN s.s_stat > 0
                  THEN (s.s_stat - 1) / SQRT((n.n_days * (n.n_days - 1)
                       * (2 * n.n_days + 5) - ties.tie18) / 18.0)
                  WHEN s.s_stat < 0
                  THEN (s.s_stat + 1) / SQRT((n.n_days * (n.n_days - 1)
                       * (2 * n.n_days + 5) - ties.tie18) / 18.0)
                  ELSE 0.0 END, 4) + 0.0 AS z_mk
FROM n JOIN s ON n.event_type = s.event_type
JOIN ties ON n.event_type = ties.event_type
ORDER BY n.event_type
""", "tie-corrected Mann-Kendall trend test on daily revenue per type")


# ------------------------------------------------ Kendall's tau-b
N_KT_BINS = 256


def lineitem_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between extended price and quantity per return
    flag — the concordance companion to lineitem_spearman_corr. The
    O(n^2) pair space collapses onto the DENSE bounded joint histogram
    (256 price bins x the discrete per-flag quantity range): with 2D
    prefix sums P over the grid, concordant pairs C = sum G(i,j) *
    P(i-1,j-1) (each concordant pair counted once at its dominating
    cell) and discordant D = sum G(i,j) * (CR(i-1) - P(i-1,j)) — the
    grid is types x 256 x ~50 cells regardless of corpus size, built
    by exploding per-flag min/max aggregates (no cross join). Ties use
    the marginal row/col totals (tau-b denominators as doubled
    integers). Pair counts <= N^2/2 hold int64 to ~4e9 rows; past
    that, accumulate C/D as DECIMAL(38,0). Bin-width ties are part of
    the quantization contract, mirrored in the oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("qv"))
    fstats = li.groupBy("flag").agg(
        F.min("cents").alias("mn_c"), F.max("cents").alias("mx_c"),
        F.min("qv").alias("mn_q"), F.max("qv").alias("mx_q"))
    binned = li.join(F.broadcast(fstats), "flag").select(
        "flag", "qv",
        clip_bin(F.col("cents"), F.col("mn_c"), F.col("mx_c"),
                 N_KT_BINS).alias("pbin"))
    joint = binned.groupBy("flag", "pbin", "qv").agg(
        F.count(F.lit(1)).alias("g"))
    spine = (fstats
             .select("flag", "mn_q", "mx_q",
                     F.explode(F.expr(f"sequence(0, {N_KT_BINS - 1})"))
                     .alias("pbin"))
             .select("flag", "pbin",
                     F.explode(F.expr("sequence(mn_q, mx_q)")).alias("qv")))
    dense = (spine.join(joint, ["flag", "pbin", "qv"], "left")
             .withColumn("g", F.coalesce("g", F.lit(0))))
    w_row = Window.partitionBy("flag", "pbin").orderBy("qv")
    w_colcum = Window.partitionBy("flag", "qv").orderBy("pbin")
    grid = (dense
            .withColumn("cq", F.sum("g").over(w_row))
            .withColumn("p", F.sum("cq").over(w_colcum))
            .withColumn("p_i1", F.lag("p", 1, 0).over(w_colcum)))
    grid = grid.withColumn("a", F.lag("p_i1", 1, 0).over(w_row))
    rowtot = (dense.groupBy("flag", "pbin").agg(F.sum("g").alias("r"))
              .withColumn("cr", F.sum("r")
                          .over(Window.partitionBy("flag").orderBy("pbin")))
              .withColumn("cr_1", F.lag("cr", 1, 0)
                          .over(Window.partitionBy("flag").orderBy("pbin"))))
    grid = grid.join(rowtot.select("flag", "pbin", "cr_1"), ["flag", "pbin"])
    cd = (grid.withColumn("b", F.col("cr_1") - F.col("p_i1"))
          .groupBy("flag")
          .agg(F.sum(F.col("g") * F.col("a")).alias("concordant"),
               F.sum(F.col("g") * F.col("b")).alias("discordant"),
               F.sum("g").alias("n")))
    t_row = (dense.groupBy("flag", "pbin").agg(F.sum("g").alias("r"))
             .groupBy("flag")
             .agg(F.sum(F.col("r") * (F.col("r") - 1)).alias("n1x2")))
    t_col = (dense.groupBy("flag", "qv").agg(F.sum("g").alias("cc"))
             .groupBy("flag")
             .agg(F.sum(F.col("cc") * (F.col("cc") - 1)).alias("n2x2")))
    tau = ("(concordant - cast(discordant as double))"
           " / sqrt(((cast(n as double) * (n - 1) - n1x2) / 2)"
           " * ((cast(n as double) * (n - 1) - n2x2) / 2))")
    return (cd.join(t_row, "flag").join(t_col, "flag")
            .select(F.col("flag").alias("l_returnflag"), "n",
                    "concordant", "discordant",
                    (F.round(F.expr(tau), 6) + 0.0).alias("tau_b"))
            .orderBy("l_returnflag"))


register("lineitem_kendall_tau", lineitem_kendall_tau, f"""
WITH li AS (
    SELECT l_returnflag AS flag,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qv
    FROM lineitem
), fstats AS (
    SELECT flag, MIN(cents) AS mn_c, MAX(cents) AS mx_c,
           MIN(qv) AS mn_q, MAX(qv) AS mx_q
    FROM li GROUP BY flag
), binned AS (
    SELECT li.flag, li.qv,
           CASE WHEN f.mx_c = f.mn_c THEN 0 ELSE
                LEAST({N_KT_BINS - 1},
                      CAST(FLOOR((li.cents - f.mn_c) * {N_KT_BINS}
                                 / CAST(f.mx_c - f.mn_c AS DOUBLE))
                           AS BIGINT)) END AS pbin
    FROM li JOIN fstats f ON li.flag = f.flag
), joint AS (
    SELECT flag, pbin, qv, CAST(COUNT(*) AS BIGINT) AS g
    FROM binned GROUP BY 1, 2, 3
), spine AS (
    -- span generated per flag directly (no fixed cap: a quantity span
    -- wider than any hardcoded bound still yields the full grid)
    SELECT f.flag, pb.pbin, UNNEST(range(f.mn_q, f.mx_q + 1)) AS qv
    FROM fstats f
    CROSS JOIN (SELECT UNNEST(range(0, {N_KT_BINS})) AS pbin) pb
), dense AS (
    SELECT s.flag, s.pbin, s.qv, COALESCE(j.g, 0) AS g
    FROM spine s LEFT JOIN joint j USING (flag, pbin, qv)
), cqg AS (
    SELECT flag, pbin, qv, g,
           CAST(SUM(g) OVER (PARTITION BY flag, pbin ORDER BY qv)
                AS BIGINT) AS cq
    FROM dense
), grid AS (
    SELECT flag, pbin, qv, g,
           CAST(SUM(cq) OVER (PARTITION BY flag, qv ORDER BY pbin)
                AS BIGINT) AS p
    FROM cqg
), grid2 AS (
    SELECT flag, pbin, qv, g,
           COALESCE(LAG(p) OVER (PARTITION BY flag, qv ORDER BY pbin), 0)
               AS p_i1
    FROM grid
), grid3 AS (
    SELECT flag, pbin, qv, g, p_i1,
           COALESCE(LAG(p_i1) OVER (PARTITION BY flag, pbin ORDER BY qv), 0)
               AS a
    FROM grid2
), rowtot AS (
    SELECT flag, pbin, CAST(SUM(g) AS BIGINT) AS r,
           COALESCE(CAST(SUM(SUM(g)) OVER (PARTITION BY flag ORDER BY pbin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cr_1
    FROM dense GROUP BY flag, pbin
), cd AS (
    SELECT g3.flag,
           CAST(SUM(g3.g * g3.a) AS BIGINT) AS concordant,
           CAST(SUM(g3.g * (rt.cr_1 - g3.p_i1)) AS BIGINT) AS discordant,
           CAST(SUM(g3.g) AS BIGINT) AS n
    FROM grid3 g3 JOIN rowtot rt ON g3.flag = rt.flag AND g3.pbin = rt.pbin
    GROUP BY g3.flag
), t_row AS (
    SELECT flag, CAST(SUM(r * (r - 1)) AS BIGINT) AS n1x2
    FROM (SELECT flag, pbin, SUM(g) AS r FROM dense GROUP BY 1, 2) x
    GROUP BY flag
), t_col AS (
    SELECT flag, CAST(SUM(cc * (cc - 1)) AS BIGINT) AS n2x2
    FROM (SELECT flag, qv, SUM(g) AS cc FROM dense GROUP BY 1, 2) x
    GROUP BY flag
)
SELECT cd.flag AS l_returnflag, cd.n, cd.concordant, cd.discordant,
       ROUND((cd.concordant - CAST(cd.discordant AS DOUBLE))
             / SQRT(((CAST(cd.n AS DOUBLE) * (cd.n - 1) - t_row.n1x2) / 2)
                    * ((CAST(cd.n AS DOUBLE) * (cd.n - 1) - t_col.n2x2) / 2)),
             6) + 0.0 AS tau_b
FROM cd JOIN t_row ON cd.flag = t_row.flag
JOIN t_col ON cd.flag = t_col.flag
ORDER BY l_returnflag
""", "Kendall tau-b from 2D prefix sums over the bounded joint histogram")


# ------------------------------------- Kaplan-Meier with censoring
KM_CENSOR_DAYS = 7


def users_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival over user lifetimes with
    RIGHT-CENSORING — the survival-curve completion of
    user_churn_hazard (which emits the uncensored hazard table and
    leaves the product to the consumer): users whose last activity
    falls within KM_CENSOR_DAYS of the corpus end are censored (still
    alive at the observation boundary), not churned. Per lifetime day:
    at-risk (everyone not yet churned or censored), churned, censored,
    and S(t) = prod_{{u<=t}} (1 - d_u/n_u), evaluated as
    exp(cum-sum of ln terms) over the BOUNDED lifetime-day spine in a
    deterministic day order — identical double sequences on both
    engines. The fact table reduces once to per-user (first, last)
    day; everything after is lifetime-day cardinality."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_ns")
    life = ev.groupBy("user_id").agg(
        F.expr(f"min(ts_ns) div {DAY_NS}").alias("first_d"),
        F.expr(f"max(ts_ns) div {DAY_NS}").alias("last_d"))
    gmax = life.agg(F.max("last_d").alias("g_max"))
    marked = (life.crossJoin(F.broadcast(gmax))
              .select((F.col("last_d") - F.col("first_d")).alias("t"),
                      F.expr(f"CASE WHEN last_d > g_max - {KM_CENSOR_DAYS}"
                             " THEN 1 ELSE 0 END").alias("censored")))
    per_day = marked.groupBy("t").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"))
    tot = per_day.agg(F.sum(F.col("d") + F.col("c")).alias("n_users"))
    wday = Window.orderBy("t")
    curve = (per_day.crossJoin(F.broadcast(tot))
             .withColumn("left_before",
                         F.coalesce(F.sum(F.col("d") + F.col("c"))
                                    .over(wday.rowsBetween(
                                        Window.unboundedPreceding, -1)),
                                    F.lit(0)))
             .withColumn("n_risk", F.col("n_users") - F.col("left_before"))
             .withColumn("ln_term",
                         F.when(F.col("d") < F.col("n_risk"),
                                F.log((F.col("n_risk") - F.col("d"))
                                      / F.col("n_risk")))
                         .otherwise(F.lit(None)))
             .withColumn("dead_flag",
                         F.max(F.when(F.col("d") >= F.col("n_risk"), 1)
                               .otherwise(0)).over(wday))
             .withColumn("cum_ln", F.sum("ln_term").over(wday)))
    return (curve.select(
        F.col("t").alias("lifetime_d"), "n_risk",
        F.col("d").alias("n_churned"), F.col("c").alias("n_censored"),
        F.when(F.col("dead_flag") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("cum_ln"), 6) + 0.0).alias("survival"))
        .orderBy("lifetime_d"))


register("users_kaplan_meier", users_kaplan_meier, f"""
WITH life AS (
    SELECT user_id,
           MIN(CAST(epoch_us(ts) AS BIGINT)) * 1000 // {DAY_NS} AS first_d,
           MAX(CAST(epoch_us(ts) AS BIGINT)) * 1000 // {DAY_NS} AS last_d
    FROM events GROUP BY user_id
), gmax AS (SELECT MAX(last_d) AS g_max FROM life),
marked AS (
    SELECT last_d - first_d AS t,
           CASE WHEN last_d > g_max - {KM_CENSOR_DAYS} THEN 1 ELSE 0 END
               AS censored
    FROM life CROSS JOIN gmax
), per_day AS (
    SELECT t, CAST(SUM(1 - censored) AS BIGINT) AS d,
           CAST(SUM(censored) AS BIGINT) AS c
    FROM marked GROUP BY t
), tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n_users FROM per_day),
curve AS (
    SELECT t, d, c,
           n_users - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS n_risk
    FROM per_day CROSS JOIN tot
), lns AS (
    SELECT t, d, c, n_risk,
           CASE WHEN d < n_risk
                THEN LN((n_risk - d) / CAST(n_risk AS DOUBLE)) END AS ln_term,
           MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t) AS dead_flag
    FROM curve
)
SELECT t AS lifetime_d, n_risk, d AS n_churned, c AS n_censored,
       CASE WHEN dead_flag = 1 THEN 0.0
            ELSE ROUND(EXP(SUM(ln_term) OVER (ORDER BY t)), 6) + 0.0 END
           AS survival
FROM lns ORDER BY lifetime_d
""", "right-censored Kaplan-Meier survival over user lifetimes")


# --------------------------------- multivariate OLS (normal equations)
def lineitem_price_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS with intercept per return flag — price_cents ~
    quantity + discount_bp — solved EXACTLY from the integer normal
    equations: one fact scan accumulates the 9 sufficient sums (X'X,
    X'y and sum y^2) as DECIMAL(38,0) on Spark / HUGEINT on DuckDB,
    the 3x3 system solves by Cramer's rule on those exact integers
    (determinant terms stay < 1e38 to ~1e9 rows per flag), and only
    the final beta ratios and R^2 are floats. The multivariate
    extension of o23's quadratic-detrend Cramer oracle, applied to a
    fact table instead of a 60-point series: the model is model-size
    no matter the corpus, the distributed work is ONE aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    d = lambda e: F.expr(e).cast("decimal(38,0)")  # noqa: E731
    suff = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x1")).alias("s1"), F.sum(d("x2")).alias("s2"),
        F.sum(d("x1") * d("x1")).alias("s11"),
        F.sum(d("x1") * d("x2")).alias("s12"),
        F.sum(d("x2") * d("x2")).alias("s22"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x1") * d("y")).alias("s1y"),
        F.sum(d("x2") * d("y")).alias("s2y"),
        F.sum(d("y") * d("y")).alias("syy"))
    det = ("(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
           " + s2*(s1*s12 - s11*s2))")
    d0 = ("(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)"
          " + s2*(s1y*s12 - s11*s2y))")
    d1 = ("(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)"
          " + s2*(s1*s2y - s1y*s2))")
    d2 = ("(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)"
          " + sy*(s1*s12 - s11*s2))")
    b0 = f"(cast({d0} as double) / cast({det} as double))"
    b1 = f"(cast({d1} as double) / cast({det} as double))"
    b2 = f"(cast({d2} as double) / cast({det} as double))"
    sst = "(cast(syy as double) - cast(sy as double)*cast(sy as double)/cast(n as double))"
    ssr = (f"({b0}*cast(sy as double) + {b1}*cast(s1y as double)"
           f" + {b2}*cast(s2y as double)"
           f" - cast(sy as double)*cast(sy as double)/cast(n as double))")
    return (suff.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        (F.round(F.expr(b0), 2) + 0.0).alias("beta_intercept_cents"),
        (F.round(F.expr(b1), 4) + 0.0).alias("beta_per_qty_cents"),
        (F.round(F.expr(b2), 4) + 0.0).alias("beta_per_disc_bp_cents"),
        (F.round(F.expr(f"{ssr} / {sst}"), 6) + 0.0).alias("r2"))
        .orderBy("l_returnflag"))


_OLS_DET = ("(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
            " + s2*(s1*s12 - s11*s2))")
_OLS_D0 = ("(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)"
           " + s2*(s1y*s12 - s11*s2y))")
_OLS_D1 = ("(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)"
           " + s2*(s1*s2y - s1y*s2))")
_OLS_D2 = ("(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)"
           " + sy*(s1*s12 - s11*s2))")
_OLS_B0 = f"(CAST({_OLS_D0} AS DOUBLE) / CAST({_OLS_DET} AS DOUBLE))"
_OLS_B1 = f"(CAST({_OLS_D1} AS DOUBLE) / CAST({_OLS_DET} AS DOUBLE))"
_OLS_B2 = f"(CAST({_OLS_D2} AS DOUBLE) / CAST({_OLS_DET} AS DOUBLE))"
_OLS_SST = ("(CAST(syy AS DOUBLE)"
            " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))")
_OLS_SSR = (f"({_OLS_B0}*CAST(sy AS DOUBLE) + {_OLS_B1}*CAST(s1y AS DOUBLE)"
            f" + {_OLS_B2}*CAST(s2y AS DOUBLE)"
            " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))")

register("lineitem_price_ols", lineitem_price_ols, f"""
WITH li AS (
    SELECT l_returnflag AS flag,
           CAST(l_quantity AS HUGEINT) AS x1,
           CAST(ROUND(l_discount * 10000) AS HUGEINT) AS x2,
           CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) AS y
    FROM lineitem
), suff AS (
    SELECT flag, CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(x1) AS s1, SUM(x2) AS s2,
           SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
           SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y,
           SUM(y*y) AS syy
    FROM li GROUP BY flag
)
SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND({_OLS_B0}, 2) + 0.0 AS beta_intercept_cents,
       ROUND({_OLS_B1}, 4) + 0.0 AS beta_per_qty_cents,
       ROUND({_OLS_B2}, 4) + 0.0 AS beta_per_disc_bp_cents,
       ROUND({_OLS_SSR} / {_OLS_SST}, 6) + 0.0 AS r2
FROM suff ORDER BY l_returnflag
""", "two-feature OLS per flag via exact integer normal equations")


# ------------------------------- Nelson-Aalen cumulative hazard
def users_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard twin of users_kaplan_meier —
    same right-censored per-user lifetime reduction (one fact scan to
    (first, last) day, KM_CENSOR_DAYS censoring at the corpus end),
    but the estimator is the SUM form H(t) = sum_{u<=t} d_u/n_u with
    Aalen's variance sum d_u/n_u^2. Both accumulate as EXACT integers
    (ppm for H, 1e12-scale for the variance; d <= users so 1e12*d
    fits int64), so the running sums are bit-identical across engines
    — no float product chain at all. Everything after the per-user
    reduce is lifetime-day cardinality (bounded spine)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_ns")
    life = ev.groupBy("user_id").agg(
        F.expr(f"min(ts_ns) div {DAY_NS}").alias("first_d"),
        F.expr(f"max(ts_ns) div {DAY_NS}").alias("last_d"))
    gmax = life.agg(F.max("last_d").alias("g_max"))
    marked = (life.crossJoin(F.broadcast(gmax))
              .select((F.col("last_d") - F.col("first_d")).alias("t"),
                      F.expr(f"CASE WHEN last_d > g_max - {KM_CENSOR_DAYS}"
                             " THEN 1 ELSE 0 END").alias("censored")))
    per_day = marked.groupBy("t").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.sum("censored").alias("c"))
    tot = per_day.agg(F.sum(F.col("d") + F.col("c")).alias("n_users"))
    wday = Window.orderBy("t")
    curve = (per_day.crossJoin(F.broadcast(tot))
             .withColumn("left_before",
                         F.coalesce(F.sum(F.col("d") + F.col("c"))
                                    .over(wday.rowsBetween(
                                        Window.unboundedPreceding, -1)),
                                    F.lit(0)))
             .withColumn("n_risk", F.col("n_users") - F.col("left_before"))
             .withColumn("h_term",
                         F.expr("d * 1000000 div n_risk"))
             .withColumn("v_term",
                         F.expr("d * 1000000000000 div (n_risk * n_risk)")))
    return (curve.select(
        F.col("t").alias("lifetime_d"), "n_risk",
        F.col("d").alias("n_churned"), F.col("c").alias("n_censored"),
        F.sum("h_term").over(wday).alias("na_cumhaz_ppm"),
        F.sum("v_term").over(wday).alias("na_var_e12"))
        .orderBy("lifetime_d"))


register("users_nelson_aalen", users_nelson_aalen, f"""
WITH life AS (
    SELECT user_id,
           MIN(CAST(epoch_us(ts) AS BIGINT)) * 1000 // {DAY_NS} AS first_d,
           MAX(CAST(epoch_us(ts) AS BIGINT)) * 1000 // {DAY_NS} AS last_d
    FROM events GROUP BY user_id
), gmax AS (SELECT MAX(last_d) AS g_max FROM life),
marked AS (
    SELECT last_d - first_d AS t,
           CASE WHEN last_d > g_max - {KM_CENSOR_DAYS} THEN 1 ELSE 0 END
               AS censored
    FROM life CROSS JOIN gmax
), per_day AS (
    SELECT t, CAST(SUM(1 - censored) AS BIGINT) AS d,
           CAST(SUM(censored) AS BIGINT) AS c
    FROM marked GROUP BY t
), tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n_users FROM per_day),
curve AS (
    SELECT t, d, c,
           n_users - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS n_risk
    FROM per_day CROSS JOIN tot
)
SELECT t AS lifetime_d, n_risk, d AS n_churned, c AS n_censored,
       CAST(SUM(d * 1000000 // n_risk) OVER (ORDER BY t) AS BIGINT)
           AS na_cumhaz_ppm,
       CAST(SUM(d * 1000000000000 // (n_risk * n_risk)) OVER (ORDER BY t)
            AS BIGINT) AS na_var_e12
FROM curve ORDER BY lifetime_d
""", "Nelson-Aalen cumulative hazard (exact integer ppm sums)")


# ------------------------------------------ TOST equivalence test
from .monitor_eval import _ha_sql as _tost_ha  # noqa: E402

TOST_DELTA_CENTI = 450     # equivalence margin: 4.50 value units
TOST_ZCRIT_MICRO = 1_644_854  # one-sided z at alpha = 0.05, micro


def events_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) equivalence between the early and
    late half of each type's value stream: where events_welch_ttest
    asks "did the mean move?", TOST asks the release-gate question
    "is the mean provably WITHIN +/-delta?" — absence of evidence is
    not equivalence, so this is the right direction for a no-regression
    check. Same exact integer sufficient statistics as Welch (centi
    quantization, order-free sums); the two z statistics quantize to
    micro with shared half-away rounding and compare against a
    pre-quantized critical constant — both engines decide with integer
    compares."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_ns",
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    stats = ev.agg(F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    halves = (ev.crossJoin(F.broadcast(stats))
              .withColumn("early", F.expr(
                  "CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END")))
    suff = halves.groupBy("event_type").agg(
        F.sum("early").alias("na"),
        F.sum(F.lit(1) - F.col("early")).alias("nb"),
        F.sum(F.col("early") * F.col("centi")).alias("sa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")).alias("sb"),
        F.sum(F.col("early") * F.col("centi") * F.col("centi")).alias("qa"),
        F.sum((F.lit(1) - F.col("early")) * F.col("centi")
              * F.col("centi")).alias("qb"))
    va = ("((cast(na as double)*qa - cast(sa as double)*sa)"
          "/(cast(na as double)*(na-1)))")
    vb = ("((cast(nb as double)*qb - cast(sb as double)*sb)"
          "/(cast(nb as double)*(nb-1)))")
    se = f"sqrt({va}/na + {vb}/nb)"
    diff = "(cast(sa as double)/na - cast(sb as double)/nb)"
    t_lo = _tost_ha(f"(({diff}) + {TOST_DELTA_CENTI}) / ({se}) * 1e6")
    t_hi = _tost_ha(f"({TOST_DELTA_CENTI} - ({diff})) / ({se}) * 1e6")
    return (suff
            .withColumn("t_lower_micro", F.expr(t_lo))
            .withColumn("t_upper_micro", F.expr(t_hi))
            .select(
                "event_type", F.col("na").alias("n_early"),
                F.col("nb").alias("n_late"),
                F.expr("sa div na").alias("mean_early_centi"),
                F.expr("sb div nb").alias("mean_late_centi"),
                "t_lower_micro", "t_upper_micro",
                F.expr(f"cast(t_lower_micro > {TOST_ZCRIT_MICRO}"
                       f" and t_upper_micro > {TOST_ZCRIT_MICRO} as int)")
                .alias("equivalent"))
            .orderBy("event_type"))


register("events_tost_equivalence", events_tost_equivalence, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events
), stats AS (
    SELECT (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns FROM ev
), halves AS (
    SELECT event_type, centi,
           CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END AS early
    FROM ev CROSS JOIN stats
), suff AS (
    SELECT event_type,
           CAST(SUM(early) AS BIGINT) AS na,
           CAST(SUM(1 - early) AS BIGINT) AS nb,
           CAST(SUM(early * centi) AS BIGINT) AS sa,
           CAST(SUM((1 - early) * centi) AS BIGINT) AS sb,
           CAST(SUM(early * centi * centi) AS BIGINT) AS qa,
           CAST(SUM((1 - early) * centi * centi) AS BIGINT) AS qb
    FROM halves GROUP BY 1
), scored AS (
    SELECT event_type, na, nb, sa, sb,
           {_tost_ha(
               "(((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb))"
               f" + {TOST_DELTA_CENTI})"
               " / (sqrt(((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)"
               "/(CAST(na AS DOUBLE)*(na-1)))/na"
               " + ((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)"
               "/(CAST(nb AS DOUBLE)*(nb-1)))/nb)) * 1e6")} AS t_lower_micro,
           {_tost_ha(
               f"({TOST_DELTA_CENTI}"
               " - ((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)))"
               " / (sqrt(((CAST(na AS DOUBLE)*qa - CAST(sa AS DOUBLE)*sa)"
               "/(CAST(na AS DOUBLE)*(na-1)))/na"
               " + ((CAST(nb AS DOUBLE)*qb - CAST(sb AS DOUBLE)*sb)"
               "/(CAST(nb AS DOUBLE)*(nb-1)))/nb)) * 1e6")} AS t_upper_micro
    FROM suff
)
SELECT event_type, na AS n_early, nb AS n_late,
       CAST(sa // na AS BIGINT) AS mean_early_centi,
       CAST(sb // nb AS BIGINT) AS mean_late_centi,
       t_lower_micro, t_upper_micro,
       CAST(CASE WHEN t_lower_micro > {TOST_ZCRIT_MICRO}
                 AND t_upper_micro > {TOST_ZCRIT_MICRO}
            THEN 1 ELSE 0 END AS INT) AS equivalent
FROM scored ORDER BY event_type
""", "TOST equivalence gate on early-vs-late value means (micro z)")


# ------------------------------------------------ Pettitt change point
from .monitor_eval import _ha_sql as _pt_ha  # noqa: E402

PT_SIG_MICRO = 50_000  # alpha = 0.05 in micro units


def events_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank change-point test on each type's zero-filled daily
    count series — the nonparametric single-break locator that
    complements events_cusum_changepoint (mean-shift CUSUM) and
    events_mann_kendall (monotone trend): WHERE does the distribution
    split, with a distribution-free p-value. The statistic uses the
    midrank identity U_t = sum_{i<=t} r2_i - t(n+1) with DOUBLED
    midranks r2 = 2*c_less + c_eq + 1 (the Kruskal-Wallis integer-rank
    discipline), so every U_t is an exact integer off two bounded
    windows (value-histogram cumulative for ranks, day cumulative for
    prefixes); ties contribute zero exactly as in the sgn formulation.
    K = max|U_t| over t < n with the earliest-day tiebreak;
    p ~ 2*exp(-6K^2/(n^3+n^2)) is the standard approximation, one
    float, micro-quantized. Everything after the per-(type, day)
    count is day-spine cardinality."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    return pettitt_from_daily(cnt)


def pettitt_from_daily(cnt: DataFrame) -> DataFrame:
    """Core of events_pettitt_test over any (event_type, d, c)
    daily-count frame (the type set and day range derive from the
    counts — identical to the raw-event versions). Shared with the
    streaming twin's finalizer (streaming/pettitt.py): the
    hourly-count state folds hr div 24 with exact integer sums, so the
    streamed change-point panel is bit-equal to the batch one by
    construction. Fresh-exprId same-name aliases guard every
    re-referenced lineage (the memory-sink gotcha; no-op Projects in
    the batch plan)."""
    rng = (cnt.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
           .select(F.col("dmin").alias("dmin"),
                   F.col("dmax").alias("dmax")))
    types = (cnt.select(F.col("event_type").alias("event_type"))
             .distinct())
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type", "dmin", "dmax",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type", "dmin", "dmax", "d",
                      F.coalesce("c", F.lit(0)).alias("x")))
    vals = (filled.groupBy("event_type", "x")
            .agg(F.count(F.lit(1)).alias("ceq")))
    wv = (Window.partitionBy("event_type").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1))
    ranked = (vals.withColumn(
        "cless", F.coalesce(F.sum("ceq").over(wv), F.lit(0)))
        .withColumn("r2", F.expr("2 * cless + ceq + 1"))
        .select(F.col("event_type").alias("event_type"),
                F.col("x").alias("x"), F.col("ceq").alias("ceq"),
                F.col("cless").alias("cless"), F.col("r2").alias("r2")))
    wd = Window.partitionBy("event_type").orderBy("d")
    seq = (filled.join(ranked, ["event_type", "x"])
           .withColumn("t", F.expr("d - dmin + 1"))
           .withColumn("n", F.expr("dmax - dmin + 1"))
           .withColumn("s_t", F.sum("r2").over(
               wd.rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("u_t", F.expr("s_t - t * (n + 1)"))
           .filter(F.col("t") < F.col("n")))
    flagged = seq.withColumn(
        "kmax", F.max(F.abs("u_t")).over(Window.partitionBy("event_type")))
    agg = (flagged.groupBy("event_type")
           .agg(F.max("n").alias("n"),
                F.max("kmax").alias("k_stat"),
                F.min(F.when(F.abs(F.col("u_t")) == F.col("kmax"),
                             F.col("t"))).alias("t_star")))
    p = ("(2.0 * exp(-6.0 * cast(k_stat as double) * k_stat"
         " / (cast(n as double) * n * n + cast(n as double) * n)))")
    return (agg.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.col("k_stat").cast("long").alias("k_stat"),
        F.col("t_star").cast("long").alias("t_star"),
        F.expr(_pt_ha(f"({p}) * 1e6")).alias("p_micro"))
        .withColumn("significant", F.expr(
            f"cast(p_micro <= {PT_SIG_MICRO} as int)"))
        .orderBy("event_type"))


_PT_P = ("(2.0 * EXP(-6.0 * CAST(k_stat AS DOUBLE) * k_stat"
         " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)))")

register("events_pettitt_test", events_pettitt_test, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT t.event_type, r.dmin, r.dmax, s.d
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN rng r
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
), filled AS (
    SELECT spine.event_type, spine.dmin, spine.dmax, spine.d,
           COALESCE(cnt.c, 0) AS x
    FROM spine LEFT JOIN cnt
      ON spine.event_type = cnt.event_type AND spine.d = cnt.d
), ranked AS (
    SELECT event_type, x,
           2 * COALESCE(SUM(ceq) OVER (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + ceq + 1 AS r2
    FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS ceq
          FROM filled GROUP BY 1, 2)
), seq AS (
    SELECT f.event_type, f.d - f.dmin + 1 AS t,
           f.dmax - f.dmin + 1 AS n,
           SUM(r.r2) OVER (PARTITION BY f.event_type ORDER BY f.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (f.d - f.dmin + 1) * (f.dmax - f.dmin + 2) AS u_t
    FROM filled f JOIN ranked r
      ON f.event_type = r.event_type AND f.x = r.x
), pruned AS (SELECT * FROM seq WHERE t < n),
flagged AS (
    SELECT *, MAX(ABS(u_t)) OVER (PARTITION BY event_type) AS kmax
    FROM pruned
), agg AS (
    SELECT event_type, MAX(n) AS n, MAX(kmax) AS k_stat,
           MIN(CASE WHEN ABS(u_t) = kmax THEN t END) AS t_star
    FROM flagged GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(k_stat AS BIGINT) AS k_stat,
       CAST(t_star AS BIGINT) AS t_star,
       {_pt_ha(f"({_PT_P}) * 1e6")} AS p_micro,
       CAST({_pt_ha(f"({_PT_P}) * 1e6")} <= {PT_SIG_MICRO} AS INT)
           AS significant
FROM agg ORDER BY event_type
""", "Pettitt rank change-point per type (integer midrank identity)")


# ------------------------------------------------ Wald-Wolfowitz runs
RUNS_Z_CRIT_MICRO = 1_959_964


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGNS of day-over-day count
    changes per event type — the randomness gate that catches
    oscillation or stickiness the trend tests cannot (Mann-Kendall
    sees monotone drift; runs sees too-few or too-many alternations).
    Zero diffs drop (the standard reduction); runs count via one lag
    over the surviving sign sequence; E[R] and Var[R] are the classic
    closed forms on exact integer (n_plus, n_minus); one float z,
    micro-quantized. NULL z when either sign class is empty. Day
    spine -> diffs -> bounded aggregates; nothing fact-sized after
    the first reduction."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    rng = ev.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    types = ev.select("event_type").distinct()
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type", "d",
                      F.coalesce("c", F.lit(0)).alias("x")))
    wd = Window.partitionBy("event_type").orderBy("d")
    signs = (filled
             .withColumn("s", F.expr(
                 "cast(sign(x - lag(x) over (partition by event_type"
                 " order by d)) as int)"))
             .filter(F.col("s").isNotNull() & (F.col("s") != 0)))
    runs = (signs
            .withColumn("brk", F.expr(
                "case when lag(s) over (partition by event_type"
                " order by d) is null then 1"
                " when s != lag(s) over (partition by event_type"
                " order by d) then 1 else 0 end"))
            .groupBy("event_type")
            .agg(F.sum("brk").alias("n_runs"),
                 F.sum(F.expr("cast(s = 1 as int)")).alias("n1"),
                 F.sum(F.expr("cast(s = -1 as int)")).alias("n2")))
    e_r = ("(1.0 + 2.0 * cast(n1 as double) * n2"
           " / (cast(n1 as double) + n2))")
    v_r = ("((2.0 * cast(n1 as double) * n2"
           " * (2.0 * cast(n1 as double) * n2 - n1 - n2))"
           " / ((cast(n1 as double) + n2) * (cast(n1 as double) + n2)"
           " * (cast(n1 as double) + n2 - 1)))")
    z = (f"case when n1 = 0 or n2 = 0 or n1 + n2 < 2 then null"
         f" else (cast(n_runs as double) - {e_r}) / sqrt({v_r}) end")
    return (runs.select(
        "event_type", F.col("n1").cast("long").alias("n_plus"),
        F.col("n2").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.expr(_pt_ha(f"({z}) * 1e6")).alias("z_micro"))
        .withColumn("looks_random", F.expr(
            f"cast(abs(z_micro) <= {RUNS_Z_CRIT_MICRO} as int)"))
        .orderBy("event_type"))


_RT_E = ("(1.0 + 2.0 * CAST(n1 AS DOUBLE) * n2"
         " / (CAST(n1 AS DOUBLE) + n2))")
_RT_V = ("((2.0 * CAST(n1 AS DOUBLE) * n2"
         " * (2.0 * CAST(n1 AS DOUBLE) * n2 - n1 - n2))"
         " / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)"
         " * (CAST(n1 AS DOUBLE) + n2 - 1)))")
_RT_Z = (f"CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 THEN NULL"
         f" ELSE (CAST(n_runs AS DOUBLE) - {_RT_E}) / SQRT({_RT_V}) END")

register("events_runs_test", events_runs_test, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
filled AS (
    SELECT t.event_type, s.d, COALESCE(cnt.c, 0) AS x
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN cnt ON t.event_type = cnt.event_type AND s.d = cnt.d
), signs AS (
    SELECT event_type, d, s FROM (
        SELECT event_type, d,
               CAST(SIGN(x - LAG(x) OVER (PARTITION BY event_type
                   ORDER BY d)) AS INT) AS s
        FROM filled)
    WHERE s IS NOT NULL AND s != 0
), runs AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN prev IS NULL OR s != prev THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs,
           CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM (SELECT event_type, s,
                 LAG(s) OVER (PARTITION BY event_type ORDER BY d) AS prev
          FROM signs)
    GROUP BY event_type
)
SELECT event_type, n1 AS n_plus, n2 AS n_minus, n_runs,
       {_pt_ha(f"({_RT_Z}) * 1e6")} AS z_micro,
       CAST(ABS({_pt_ha(f"({_RT_Z}) * 1e6")}) <= {RUNS_Z_CRIT_MICRO}
            AS INT) AS looks_random
FROM runs ORDER BY event_type
""", "Wald-Wolfowitz runs test on day-over-day count change signs")


# ------------------------------------------------ mean excess (POT)
ME_PCTS = (80, 90, 95)


def events_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold mean excess of the centi-quantized value
    at the 80/90/95% thresholds — the tail diagnostic that picks the
    GPD threshold before a Hill/Gumbel fit (a linearly growing mean
    excess = heavy tail; flat = exponential): e(u) = E[X-u | X>u].
    Thresholds are exact first-crossing order statistics off the
    distinct-value census (a value-keyed aggregate with a cumulative
    window — the census is bounded by the distinct centi domain); the
    excess sums are exact integers from the same census joined to the
    3-row threshold frame. No approximate percentile anywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    census = ev.groupBy("centi").agg(F.count(F.lit(1)).alias("nd"))
    tot = census.agg(F.sum("nd").alias("nn"))
    wc = Window.orderBy("centi").rowsBetween(Window.unboundedPreceding, 0)
    cum = (census.withColumn("cum", F.sum("nd").over(wc))
           .crossJoin(F.broadcast(tot)))
    ps = ", ".join(str(p) for p in ME_PCTS)
    fan = (cum.withColumn("p_pct", F.explode(F.expr(f"array({ps})")))
           .filter(F.expr("cum * 100 >= p_pct * nn")))
    thr = fan.groupBy("p_pct").agg(F.min("cum").alias("cum_at"))
    u = (thr.join(fan.select("p_pct", F.col("cum").alias("cum_at"),
                             F.col("centi").alias("u")),
                  ["p_pct", "cum_at"]))
    # the non-equi (> threshold) join must build on the 3-row
    # threshold frame — the estimator would otherwise pick the
    # distinct-value census, which is data-sized
    exceed = (census.join(F.broadcast(u), census.centi > u.u)
              .groupBy("p_pct", "u").agg(
                  F.sum("nd").alias("n_exceed"),
                  F.sum(F.expr("nd * (centi - u)")).alias("excess_sum")))
    return (u.join(exceed, ["p_pct", "u"], "left")
            .select(F.col("p_pct").cast("int").alias("p_pct"),
                    F.col("u").cast("long").alias("u_centi"),
                    F.coalesce("n_exceed", F.lit(0)).alias("n_exceed"),
                    F.expr("case when n_exceed > 0 then"
                           " excess_sum * 1000 div n_exceed end")
                    .alias("mean_excess_milli"))
            .orderBy("p_pct"))


register("events_mean_excess", events_mean_excess, f"""
WITH ev AS (
    SELECT CAST(FLOOR(value * 100) AS BIGINT) AS centi FROM events
), census AS (
    SELECT centi, CAST(COUNT(*) AS BIGINT) AS nd FROM ev GROUP BY 1
), tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS nn FROM census),
cum AS (
    SELECT centi, nd,
           SUM(nd) OVER (ORDER BY centi
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           t.nn
    FROM census CROSS JOIN tot t
), fan AS (
    SELECT p.p_pct, cum.centi, cum.cum
    FROM cum, (SELECT UNNEST([{", ".join(str(p) for p in ME_PCTS)}])
               AS p_pct) p
    WHERE cum.cum * 100 >= p.p_pct * cum.nn
), thr AS (
    SELECT f.p_pct, MIN(f.cum) AS cum_at FROM fan f GROUP BY 1
), u AS (
    SELECT t.p_pct, fan.centi AS u
    FROM thr t JOIN fan ON fan.p_pct = t.p_pct AND fan.cum = t.cum_at
), exceed AS (
    SELECT u.p_pct, u.u, CAST(SUM(c.nd) AS BIGINT) AS n_exceed,
           CAST(SUM(c.nd * (c.centi - u.u)) AS BIGINT) AS excess_sum
    FROM u JOIN census c ON c.centi > u.u
    GROUP BY 1, 2
)
SELECT CAST(u.p_pct AS INT) AS p_pct, u.u AS u_centi,
       COALESCE(e.n_exceed, 0) AS n_exceed,
       CASE WHEN e.n_exceed > 0 THEN
           e.excess_sum * 1000 // e.n_exceed END AS mean_excess_milli
FROM u LEFT JOIN exceed e ON u.p_pct = e.p_pct AND u.u = e.u
ORDER BY p_pct
""", "POT mean excess at exact 80/90/95% thresholds (census-based)")


# ------------------------------------------------ Chow break test
CHOW_F_CRIT_MICRO = 2_995_732  # F(2, inf) at alpha = 0.05, micro


def orders_chow_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test of the daily order-volume trend at
    the sample midpoint: fit y ~ a + b*t on each half and pooled,
    F = ((RSS_p - RSS_1 - RSS_2)/2) / ((RSS_1 + RSS_2)/(n - 4)) —
    did the business change regime, as one number (the parametric
    complement to events_pettitt_test's nonparametric locator). Each
    segment's RSS comes from exact integer sufficient sums on the
    zero-filled orderdate spine via TSS - ESS in closed form (the
    Granger/Cramer discipline); one float evaluation, micro-quantized
    against the fixed F(2, inf) critical value."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("datediff(cast(o_orderdate as date),"
               " date'1970-01-01')").alias("dd"))
    cnt = o.groupBy("dd").agg(F.count(F.lit(1)).alias("c"))
    rng = o.agg(F.min("dd").alias("d0"), F.max("dd").alias("d1"))
    spine = (rng.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("dd"), "d0", "d1")
        .join(cnt, "dd", "left")
        .select(F.expr("dd - d0").alias("t"),
                F.expr("d1 - d0 + 1").alias("n"),
                F.coalesce("c", F.lit(0)).alias("y"))
        .withColumn("seg", F.expr("cast(t < n div 2 as int)")))

    def suff(prefix, cond):
        return [
            F.sum(F.expr(f"case when {cond} then 1 else 0 end"))
            .alias(f"{prefix}n"),
            F.sum(F.expr(f"case when {cond} then t else 0 end"))
            .alias(f"{prefix}sx"),
            F.sum(F.expr(f"case when {cond} then t * t else 0 end"))
            .alias(f"{prefix}sxx"),
            F.sum(F.expr(f"case when {cond} then y else 0 end"))
            .alias(f"{prefix}sy"),
            F.sum(F.expr(f"case when {cond} then t * y else 0 end"))
            .alias(f"{prefix}sxy"),
            F.sum(F.expr(f"case when {cond} then y * y else 0 end"))
            .alias(f"{prefix}syy")]

    agg = spine.agg(*(suff("p_", "true") + suff("a_", "seg = 1")
                      + suff("b_", "seg = 0")))
    f_stat = _chow_f()
    return agg.select(
        F.col("p_n").cast("long").alias("n_days"),
        F.expr(_pt_ha(f"({f_stat}) * 1e6")).alias("f_micro"),
        F.expr(f"cast({_pt_ha(f'({f_stat}) * 1e6')}"
               f" > {CHOW_F_CRIT_MICRO} as int)").alias("break_detected"))


def _rss(p: str) -> str:
    """RSS = TSS - ESS from the integer sufficient sums with prefix p
    (engine-agnostic; one float expression)."""
    n, sx, sxx, sy, sxy, syy = (f"{p}n", f"{p}sx", f"{p}sxx",
                                f"{p}sy", f"{p}sxy", f"{p}syy")
    tss = f"(cast({syy} as double) - cast({sy} as double) * {sy} / {n})"
    ess = (f"((cast({n} as double) * {sxy}"
           f" - cast({sx} as double) * {sy})"
           f" * (cast({n} as double) * {sxy}"
           f" - cast({sx} as double) * {sy})"
           f" / (cast({n} as double)"
           f" * (cast({n} as double) * {sxx}"
           f" - cast({sx} as double) * {sx})))")
    return f"({tss} - {ess})"


def _chow_f() -> str:
    rss_p, rss_a, rss_b = _rss("p_"), _rss("a_"), _rss("b_")
    return (f"((({rss_p} - {rss_a} - {rss_b}) / 2.0)"
            f" / (({rss_a} + {rss_b}) / (p_n - 4.0)))")


def _chow_oracle() -> str:
    def suff_sql(prefix, cond):
        return (
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {prefix}n,\n"
            f"CAST(SUM(CASE WHEN {cond} THEN t ELSE 0 END) AS BIGINT)"
            f" AS {prefix}sx,\n"
            f"CAST(SUM(CASE WHEN {cond} THEN t * t ELSE 0 END) AS BIGINT)"
            f" AS {prefix}sxx,\n"
            f"CAST(SUM(CASE WHEN {cond} THEN y ELSE 0 END) AS BIGINT)"
            f" AS {prefix}sy,\n"
            f"CAST(SUM(CASE WHEN {cond} THEN t * y ELSE 0 END) AS BIGINT)"
            f" AS {prefix}sxy,\n"
            f"CAST(SUM(CASE WHEN {cond} THEN y * y ELSE 0 END) AS BIGINT)"
            f" AS {prefix}syy")
    f_stat = _chow_f()
    return f"""
WITH o AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS dd
    FROM orders
), cnt AS (SELECT dd, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1),
rng AS (SELECT MIN(dd) AS d0, MAX(dd) AS d1 FROM o),
spine AS (
    SELECT s.dd - r.d0 AS t, r.d1 - r.d0 + 1 AS n,
           COALESCE(cnt.c, 0) AS y,
           CASE WHEN s.dd - r.d0 < (r.d1 - r.d0 + 1) // 2
                THEN 1 ELSE 0 END AS seg
    FROM rng r,
         (SELECT UNNEST(range((SELECT d0 FROM rng),
                              (SELECT d1 FROM rng) + 1)) AS dd) s
    LEFT JOIN cnt ON s.dd = cnt.dd
), agg AS (
    SELECT {suff_sql("p_", "TRUE")},
           {suff_sql("a_", "seg = 1")},
           {suff_sql("b_", "seg = 0")}
    FROM spine
)
SELECT p_n AS n_days,
       {_pt_ha(f"({f_stat}) * 1e6")} AS f_micro,
       CAST({_pt_ha(f"({f_stat}) * 1e6")} > {CHOW_F_CRIT_MICRO} AS INT)
           AS break_detected
FROM agg
"""


register("orders_chow_break", orders_chow_break, _chow_oracle(),
         "Chow structural-break F-test on the daily order-volume trend")


# ------------------------------------------- Weibull interarrival fit
def events_weibull_interarrival(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Weibull-plot fit of per-type interarrival gaps: regress
    y = ln(-ln(1-F)) on x = ln(gap_seconds) over the distinct-gap
    census — shape k < 1 means bursty arrivals (heavy waiting-time
    tail), k = 1 Poisson, k > 1 regularized; the generative companion
    to events_fano_burstiness's count dispersion. F uses the
    n+1 plotting rule (cum/(n+1)) so F < 1 everywhere and no
    exclusion row is needed; zero gaps (sub-second co-arrivals) drop
    before the log. Each census point's (x, y) pair is half-away-
    quantized to micro BEFORE the integer OLS sums, so the fit is
    order-free; the census is keyed on distinct gap seconds, never
    the event stream. Scale = exp(-intercept/shape), reported in
    milli-seconds of gap."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_ns", "event_id")
    w = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    gaps = (ev.withColumn("prev", F.lag("ts_ns").over(w))
            .filter(F.col("prev").isNotNull())
            .select("event_type",
                    F.expr("(ts_ns - prev) div 1000000000").alias("g"))
            .filter(F.col("g") > 0))
    census = gaps.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).alias("nd"))
    tot = census.groupBy("event_type").agg(F.sum("nd").alias("n"))
    wc = (Window.partitionBy("event_type").orderBy("g")
          .rowsBetween(Window.unboundedPreceding, 0))
    pts = (census.withColumn("cum", F.sum("nd").over(wc))
           .join(tot, "event_type")
           .withColumn("x", F.expr(_pt_ha(
               "1e6 * ln(cast(g as double))")))
           .withColumn("yv", F.expr(_pt_ha(
               "1e6 * ln(-ln(1.0 - cast(cum as double) / (n + 1)))"))))
    suff = pts.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.count(F.lit(1)).alias("np"),
        F.sum("x").alias("sx"), F.sum("yv").alias("sy"),
        F.sum(F.expr("x * yv")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"))
    shape = ("((cast(np as double) * sxy - cast(sx as double) * sy)"
             " / (cast(np as double) * sxx - cast(sx as double) * sx))")
    intercept = (f"(cast(sy as double) / np / 1e6"
                 f" - {shape} * (cast(sx as double) / np / 1e6))")
    scale = f"exp(-({intercept}) / {shape})"
    return (suff.select(
        "event_type", F.col("n_gaps").cast("long").alias("n_gaps"),
        F.expr(_pt_ha(f"({shape}) * 1e3")).alias("shape_milli"),
        F.expr(_pt_ha(f"({scale}) * 1e3")).alias("scale_sec_milli"))
        .withColumn("bursty", F.expr(
            "cast(shape_milli < 1000 as int)"))
        .orderBy("event_type"))


_WB_SHAPE = ("((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))")
_WB_INTERCEPT = (f"(CAST(sy AS DOUBLE) / np / 1e6"
                 f" - {_WB_SHAPE} * (CAST(sx AS DOUBLE) / np / 1e6))")
_WB_SCALE = f"EXP(-({_WB_INTERCEPT}) / {_WB_SHAPE})"

register("events_weibull_interarrival", events_weibull_interarrival, f"""
WITH gaps AS (
    SELECT event_type, (ts_ns - prev) // 1000000000 AS g
    FROM (SELECT event_type,
                 CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns,
                 LAG(CAST(epoch_us(ts) AS BIGINT) * 1000) OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(epoch_us(ts) AS BIGINT) * 1000,
                              event_id) AS prev
          FROM events)
    WHERE prev IS NOT NULL AND (ts_ns - prev) // 1000000000 > 0
), census AS (
    SELECT event_type, g, CAST(COUNT(*) AS BIGINT) AS nd
    FROM gaps GROUP BY 1, 2
), tot AS (
    SELECT event_type, CAST(SUM(nd) AS BIGINT) AS n
    FROM census GROUP BY 1
), pts AS (
    SELECT c.event_type, t.n,
           {_pt_ha("1e6 * LN(CAST(c.g AS DOUBLE))")} AS x,
           {_pt_ha("1e6 * LN(-LN(1.0 - CAST(SUM(c.nd) OVER ("
                   "PARTITION BY c.event_type ORDER BY c.g"
                   " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                   " AS DOUBLE) / (t.n + 1)))")} AS yv
    FROM census c JOIN tot t ON c.event_type = t.event_type
), suff AS (
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yv) AS BIGINT) AS sy,
           CAST(SUM(x * yv) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts GROUP BY 1
)
SELECT event_type, n_gaps,
       {_pt_ha(f"({_WB_SHAPE}) * 1e3")} AS shape_milli,
       {_pt_ha(f"({_WB_SCALE}) * 1e3")} AS scale_sec_milli,
       CAST({_pt_ha(f"({_WB_SHAPE}) * 1e3")} < 1000 AS INT) AS bursty
FROM suff ORDER BY event_type
""", "Weibull-plot interarrival fit per type (shape<1 = bursty)")
