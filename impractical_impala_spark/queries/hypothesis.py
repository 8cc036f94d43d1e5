"""Hypothesis-testing completion wave (round-9 wave 23): the
multiple-testing and homogeneity diagnostics a data-quality review
reaches for after the pairwise tests (Welch / Mann-Whitney / TOST)
are in place:

- One-way ANOVA F across ALL event types at once (the k-group
  parametric complement to events_kruskal_wallis), with eta-squared
  effect size.
- A day-block permutation test per event type (early vs late mean
  shift) with deterministic md5 permutations, feeding a
  Benjamini-Hochberg FDR step-up over the per-type p-values — the
  p-values are exact rationals (1+c)/(K+1), so BH becomes pure
  integer comparisons: no normal CDF anywhere.
- Ljung-Box white-noise Q on each type's zero-filled daily count
  series (the portmanteau companion to events_pacf / events_hourly
  autocorrelations).
- Bartlett's variance-homogeneity test across lineitem return flags
  (the k-group variance complement to the ANOVA mean test).

Scale shape: every operator reduces the fact table ONCE to a bounded
aggregate (event types x calendar days, or k return-flag groups); the
permutation explode is days x K on that day-level aggregate, never on
facts. Sum-order hazards are closed the house way — any per-group
float term that would be summed across groups is half-away-quantized
to an integer FIRST, so the cross-group sum is order-free and both
engines see identical integers. Overflow ladders are documented per
operator; products that pass int64 ride DECIMAL(19/38,0).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .monitor_eval import _ha_sql as _ha
from .monitor_eval import _ha_wide_sql as _haw

DAY_NS = 86_400_000_000_000

# Upper-0.95 chi-square quantiles (standard table, df 1..8). Fixed
# PUBLIC constants, pre-quantized once here so both engines compare
# against the same integers; F(df1, inf) = chi2(df1)/df1.
CHI2_95 = {1: 3.841458821, 2: 5.991464547, 3: 7.814727903,
           4: 9.487729037, 5: 11.070497693, 6: 12.591587244,
           7: 14.067140449, 8: 15.507313056}


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def _f_crit_case(df1_expr: str) -> str:
    """CASE expression mapping df1 -> micro-quantized F(df1, inf)
    critical value at alpha=0.05; engine-agnostic SQL."""
    arms = " ".join(
        f"WHEN {df} THEN {_half_away(q / df * 1e6)}"
        for df, q in CHI2_95.items())
    return f"CASE {df1_expr} {arms} END"


def _chi2_crit_case(df_expr: str) -> str:
    arms = " ".join(
        f"WHEN {df} THEN {_half_away(q * 1e6)}"
        for df, q in CHI2_95.items())
    return f"CASE {df_expr} {arms} END"


# ------------------------------------------------ one-way ANOVA F
# Engine-agnostic stat expressions over the per-type sufficient
# integers (n, s, q = count, sum centi, sum centi^2). The per-group
# between-term is quantized to MILLI centi^2 before the cross-group
# sum (order-free); milli, not micro, keeps 1e3*q inside int64:
# q <= n * 49_002^2 ~ 2.4e14 at sf0.1, *1e3 = 2.4e17 < 9.2e18 (holds
# to ~3.8e9 rows; past that, accumulate q as DECIMAL(38,0)).
# x1e3 between-terms ride 128-bit registers (DECIMAL(38,0) here,
# HUGEINT in the oracles): t_milli ~ n_group * v^2 * 1e3 passes int64
# at ~335x the sf0.1 operating point (SCALE.md's r15 carve-out, now
# closed in code) — below 9e18 the widened rounding is bit-identical
# to the old BIGINT path, so every green hash stands.
_ANOVA_TERM = _haw("cast(s as double) * cast(s as double) * 1e3 / n")


def events_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across event types on the centi-quantized
    value: F = (SSB/(k-1)) / (SSW/(N-k)) with eta^2 = SSB/SST, all
    from exact per-type integer sufficient statistics (one fact
    scan, k rows after). Each group's s^2/n between-term is
    half-away-quantized to integer milli-centi^2 BEFORE the
    cross-group sum, so the only cross-group reductions are integer
    sums — order-free on any partitioning, identical in DuckDB.
    The verdict compares the micro F against the pre-quantized
    F(k-1, inf) 5% critical value (k <= 8 by CASE; more groups ->
    extend CHI2_95)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("centi").alias("s"),
        F.sum(F.expr("centi * centi")).alias("q"))
    suff = per.select(
        "n", "s", "q", F.expr(_ANOVA_TERM).alias("t_milli"))
    agg = suff.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"), F.sum("s").alias("ss"),
        F.sum("q").alias("qq"), F.sum("t_milli").alias("b_milli"))
    ha_tot = _haw("cast(ss as double) * cast(ss as double) * 1e3 / nn")
    ssb = f"(b_milli - {ha_tot})"
    ssw = "(cast(qq as decimal(38,0)) * 1000 - b_milli)"
    f_stat = (f"((cast({ssb} as double) / (k - 1))"
              f" / (cast({ssw} as double) / (nn - k)))")
    eta2 = (f"(cast({ssb} as double)"
            f" / (cast({ssb} as double) + cast({ssw} as double)))")
    return agg.select(
        F.col("k").cast("int").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        F.expr(_ha(f"({f_stat}) * 1e6")).alias("f_micro"),
        F.expr(_ha(f"({eta2}) * 1e6")).alias("eta2_ppm"),
        F.expr(f"cast({_ha(f'({f_stat}) * 1e6')}"
               f" > {_f_crit_case('k - 1')} as int)")
        .alias("significant"))


_ANOVA_HA_TOT = _haw("CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) * 1e3 / nn",
                     "HUGEINT")
_ANOVA_SSB = f"(b_milli - {_ANOVA_HA_TOT})"
_ANOVA_SSW = "(CAST(qq AS HUGEINT) * 1000 - b_milli)"
_ANOVA_F = (f"((CAST({_ANOVA_SSB} AS DOUBLE) / (k - 1))"
            f" / (CAST({_ANOVA_SSW} AS DOUBLE) / (nn - k)))")
_ANOVA_ETA = (f"(CAST({_ANOVA_SSB} AS DOUBLE)"
              f" / (CAST({_ANOVA_SSB} AS DOUBLE)"
              f" + CAST({_ANOVA_SSW} AS DOUBLE)))")

register("events_anova_f", events_anova_f, f"""
WITH per AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
                    * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY 1
), suff AS (
    SELECT n, s, q,
           {_haw("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                 "HUGEINT")}
               AS t_milli
    FROM per
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff
)
SELECT CAST(k AS INT) AS k_groups, nn AS n_total,
       {_ha(f"({_ANOVA_F}) * 1e6")} AS f_micro,
       {_ha(f"({_ANOVA_ETA}) * 1e6")} AS eta2_ppm,
       CAST({_ha(f"({_ANOVA_F}) * 1e6")} > {_f_crit_case('k - 1')}
            AS INT) AS significant
FROM agg
""", "one-way ANOVA F + eta-squared across event types (centi values)")


# ------------------------- day-block permutation test + BH step-up
PERM_K = 200       # deterministic md5 permutations per type
PERM_ALPHA = (1, 20)  # alpha = 1/20 = 0.05 as an exact rational


def events_perm_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type day-block permutation test of the early-vs-late mean
    value shift, with Benjamini-Hochberg FDR control across types.
    Day blocks (not row permutations) respect within-day
    autocorrelation; each of the PERM_K permutations reassigns every
    (type, day) partial to a pseudo-half by an md5 bit of
    (type, day, k) — reproducible bit-for-bit in both engines, no RNG
    state. The test statistic |mean_a - mean_b| is compared as the
    exact cross-multiplied integer inequality
        |sa'*nb' - sb'*na'| * (na*nb)  >=  |sa*nb - sb*na| * (na'*nb')
    ridden through DECIMAL(19)x(19)->38 (|s*n| <= ~2e13 at sf0.1,
    cross products <= ~2e21 < 1e38), so no float ever enters the
    exceedance count. p = (1+c)/(K+1) is an exact rational and the BH
    step-up p_(i) <= alpha*i/m becomes the integer comparison
    20*m*(1+c_i) <= i*(K+1). A permutation that empties either
    pseudo-half counts as an exceedance (conservative). Scale: the
    explode is (types x days x K) on the day-level aggregate —
    calendar-bounded, never fact-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts_ns",
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    daily = (ev.withColumn("d", F.expr(f"ts_ns div {DAY_NS}"))
             .groupBy("event_type", "d")
             .agg(F.count(F.lit(1)).alias("c"), F.sum("centi").alias("s")))
    rng = ev.agg(F.expr(f"(min(ts_ns div {DAY_NS})"
                        f" + max(ts_ns div {DAY_NS})) div 2").alias("dmid"))
    dd = daily.crossJoin(F.broadcast(rng))
    obs = dd.groupBy("event_type").agg(
        F.sum(F.expr("case when d <= dmid then c else 0 end")).alias("na"),
        F.sum(F.expr("case when d <= dmid then s else 0 end")).alias("sa"),
        F.sum(F.expr("case when d > dmid then c else 0 end")).alias("nb"),
        F.sum(F.expr("case when d > dmid then s else 0 end")).alias("sb"))
    bit = ("pmod(cast(conv(substring(md5(concat(event_type, '_',"
           " cast(d as string), '_', cast(k as string))), 1, 7),"
           " 16, 10) as bigint), 2)")
    perm = (daily
            .select("*", F.explode(F.sequence(
                F.lit(0), F.lit(PERM_K - 1))).alias("k"))
            .withColumn("side", F.expr(bit))
            .groupBy("event_type", "k").agg(
                F.sum(F.expr("case when side = 0 then c else 0 end"))
                .alias("pna"),
                F.sum(F.expr("case when side = 0 then s else 0 end"))
                .alias("psa"),
                F.sum(F.expr("case when side = 1 then c else 0 end"))
                .alias("pnb"),
                F.sum(F.expr("case when side = 1 then s else 0 end"))
                .alias("psb")))
    d_obs = "abs(sa * nb - sb * na)"
    d_perm = "abs(psa * pnb - psb * pna)"
    exceed = (f"case when pna = 0 or pnb = 0 then 1"
              f" when cast({d_perm} as decimal(19,0))"
              f" * cast(na * nb as decimal(19,0))"
              f" >= cast({d_obs} as decimal(19,0))"
              f" * cast(pna * pnb as decimal(19,0))"
              f" then 1 else 0 end")
    counted = (perm.join(obs, "event_type")
               .groupBy("event_type").agg(
                   F.max("na").alias("na"), F.max("nb").alias("nb"),
                   F.sum(F.expr(exceed)).alias("c_exceed")))
    from pyspark.sql import Window as W
    w_all = W.partitionBy()
    w_rank = W.partitionBy().orderBy("c_exceed", "event_type")
    a_num, a_den = PERM_ALPHA
    ranked = (counted
              .withColumn("m", F.count(F.lit(1)).over(w_all))
              .withColumn("i", F.row_number().over(w_rank))
              .withColumn("cond", F.expr(
                  f"case when {a_den} * m * (1 + c_exceed)"
                  f" <= {a_num} * i * {PERM_K + 1} then i else 0 end"))
              .withColumn("i_max", F.max("cond").over(w_all)))
    return (ranked.select(
        "event_type", F.col("na").alias("n_early"),
        F.col("nb").alias("n_late"),
        F.col("c_exceed").cast("long").alias("c_exceed"),
        F.expr(_ha(f"1e3 * (1 + c_exceed) / {PERM_K + 1}"))
        .alias("p_milli"),
        F.expr("cast(i <= i_max as int)").alias("bh_reject"))
        .orderBy("event_type"))


register("events_perm_bh_fdr", events_perm_bh_fdr, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events
), daily AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(centi) AS BIGINT) AS s
    FROM ev GROUP BY 1, 2
), rng AS (
    SELECT (MIN(d) + MAX(d)) // 2 AS dmid FROM ev
), obs AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN d <= dmid THEN c ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN d <= dmid THEN s ELSE 0 END) AS BIGINT) AS sa,
           CAST(SUM(CASE WHEN d > dmid THEN c ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN d > dmid THEN s ELSE 0 END) AS BIGINT) AS sb
    FROM daily CROSS JOIN rng GROUP BY event_type
), perm AS (
    SELECT event_type, k,
           CAST(SUM(CASE WHEN side = 0 THEN c ELSE 0 END) AS BIGINT) AS pna,
           CAST(SUM(CASE WHEN side = 0 THEN s ELSE 0 END) AS BIGINT) AS psa,
           CAST(SUM(CASE WHEN side = 1 THEN c ELSE 0 END) AS BIGINT) AS pnb,
           CAST(SUM(CASE WHEN side = 1 THEN s ELSE 0 END) AS BIGINT) AS psb
    FROM (SELECT daily.*, ks.k,
                 CAST(('0x' || substr(md5(event_type || '_'
                      || CAST(d AS VARCHAR) || '_'
                      || CAST(k AS VARCHAR)), 1, 7)) AS BIGINT) % 2 AS side
          FROM daily, (SELECT UNNEST(range(0, {PERM_K})) AS k) ks)
    GROUP BY 1, 2
), counted AS (
    SELECT p.event_type, MAX(o.na) AS na, MAX(o.nb) AS nb,
           CAST(SUM(CASE WHEN p.pna = 0 OR p.pnb = 0 THEN 1
                    WHEN CAST(ABS(p.psa * p.pnb - p.psb * p.pna)
                              AS DECIMAL(19,0))
                         * CAST(o.na * o.nb AS DECIMAL(19,0))
                      >= CAST(ABS(o.sa * o.nb - o.sb * o.na)
                              AS DECIMAL(19,0))
                         * CAST(p.pna * p.pnb AS DECIMAL(19,0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS c_exceed
    FROM perm p JOIN obs o USING (event_type)
    GROUP BY 1
), ranked AS (
    SELECT *, COUNT(*) OVER () AS m,
           ROW_NUMBER() OVER (ORDER BY c_exceed, event_type) AS i
    FROM counted
), flagged AS (
    SELECT *, MAX(CASE WHEN {PERM_ALPHA[1]} * m * (1 + c_exceed)
                       <= {PERM_ALPHA[0]} * i * {PERM_K + 1}
                  THEN i ELSE 0 END) OVER () AS i_max
    FROM ranked
)
SELECT event_type, na AS n_early, nb AS n_late, c_exceed,
       {_ha(f"1e3 * (1 + c_exceed) / {PERM_K + 1}")} AS p_milli,
       CAST(i <= i_max AS INT) AS bh_reject
FROM flagged ORDER BY event_type
""", "day-block permutation p-values + Benjamini-Hochberg FDR per type")


# ------------------------------------------------ Ljung-Box white noise
LB_LAGS = 7


def _lb_q_expr(wide_regs: bool = False, huge: bool = False) -> str:
    """Engine-agnostic Q expression over the per-type integer
    sufficient columns (n, s, q, a{k}, t1{k}, t2{k} for k=1..LB_LAGS):
    rho_k in exact-rational form scaled by n^2, Q as one float
    fold in FIXED textual order (identical left-to-right evaluation
    in both engines). Denominator guard: a constant series
    (n*q = s*s) yields NULL rather than a division blowup.
    ``wide_regs``: the only INTEGER products in the expression are the
    guard and the denominator core n*q - s*s, which pass int64 at
    value scale (q ~ n*v^2 puts n*q near 3e19 when the daily
    whole-unit value v reaches ~1.5e7 — the 1000x operating point);
    the wide form rides them through 128-bit registers (DECIMAL(38,0)
    on Spark, HUGEINT when ``huge`` for the DuckDB oracle) with the
    identical double cast after, so values are bit-equal wherever the
    narrow form was valid. The default keeps the count path's
    expression text byte-for-byte."""
    if wide_regs:
        reg = "HUGEINT" if huge else "decimal(38,0)"
        core = (f"cast(cast(n as {reg}) * q"
                f" - cast(s as {reg}) * s as double)")
        den = f"(cast(n as double) * {core})"
        guard = f"cast(n as {reg}) * q = cast(s as {reg}) * s"
    else:
        den = "(cast(n as double) * (n * q - s * s))"
        guard = "n * q = s * s"
    terms = []
    for k in range(1, LB_LAGS + 1):
        num = (f"(cast(n as double) * n * a{k}"
               f" - cast(n as double) * s * (t1{k} + t2{k})"
               f" + cast(n - {k} as double) * s * s)")
        terms.append(f"(({num} / {den}) * ({num} / {den}) / (n - {k}))")
    q_sum = " + ".join(terms)
    return (f"case when {guard} then null else"
            f" cast(n as double) * (n + 2) * ({q_sum}) end")


def ljung_box_from_daily(cnt: DataFrame,
                         wide_regs: bool = False) -> DataFrame:
    """Core of events_ljung_box over any (event_type, d, c) daily
    frame — the lag-k autocorrelation kept exact by scaling through
    n^2: n^2*sum((x_t-xbar)(x_{t-k}-xbar)) = n^2*A_k - n*S*(T1_k+T2_k)
    + (n-k)*S^2 with A/T1/T2/S/Q exact integers off the day spine; Q
    folds the LB_LAGS terms in fixed textual order and quantizes to
    micro vs the pre-quantized chi2 critical value. Day range and
    type set derive from the COUNTS (identical values, fact-free
    helper — the r12 fleet seam rule), so the streaming twin
    (streaming/ljung_box.py) finalizes the shared hourly state
    through the IDENTICAL arithmetic. ``wide_regs`` widens the two
    integer products that pass int64 at value scale (see
    _lb_q_expr); the count path keeps the narrow text byte-for-byte."""
    rng = (cnt.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
           .select(F.col("dmin").alias("dmin"),
                   F.col("dmax").alias("dmax")))
    types = (cnt.select(F.col("event_type").alias("event_type"))
             .distinct())
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type", "d",
                      F.coalesce("c", F.lit(0)).alias("x")))
    from pyspark.sql import Window as W
    w = W.partitionBy("event_type").orderBy("d")
    lagged = filled
    for k in range(1, LB_LAGS + 1):
        lagged = lagged.withColumn(f"x{k}", F.lag("x", k).over(w))
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
            F.sum(F.expr("x * x")).alias("q")]
    for k in range(1, LB_LAGS + 1):
        aggs += [
            F.sum(F.expr(f"case when x{k} is not null"
                         f" then x * x{k} else 0 end")).alias(f"a{k}"),
            F.sum(F.expr(f"case when x{k} is not null"
                         f" then x else 0 end")).alias(f"t1{k}"),
            F.sum(F.coalesce(F.col(f"x{k}"), F.lit(0))).alias(f"t2{k}")]
    suff = lagged.groupBy("event_type").agg(*aggs)
    q_expr = _lb_q_expr(wide_regs)
    return (suff.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.expr(_ha(f"({q_expr}) * 1e6")).alias("q_micro"),
        F.expr(f"cast({_ha(f'({q_expr}) * 1e6')}"
               f" <= {_half_away(CHI2_95[LB_LAGS] * 1e6)} as int)")
        .alias("white_noise"))
        .orderBy("event_type"))


def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau Q over lags 1..LB_LAGS on each event
    type's ZERO-FILLED daily count series — the white-noise gate that
    complements events_pacf (is there any autocorrelation at all?).
    See ljung_box_from_daily for the exact-integer scaling
    (n^2*A_k <= 900 * 30 * 670^2 ~ 1.2e10 at sf0.1 — int64 holds to
    ~1e7-row days). One fact scan -> (type x day) counts; the spine
    join and LB_LAGS lag windows run on calendar-bounded rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    return ljung_box_from_daily(cnt)


def _lb_oracle() -> str:
    lag_cols = ",\n           ".join(
        f"LAG(x, {k}) OVER (PARTITION BY event_type ORDER BY d) AS x{k}"
        for k in range(1, LB_LAGS + 1))
    lag_aggs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x * x{k} ELSE 0 END)"
        f" AS BIGINT) AS a{k},\n           "
        f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x ELSE 0 END)"
        f" AS BIGINT) AS t1{k},\n           "
        f"CAST(SUM(COALESCE(x{k}, 0)) AS BIGINT) AS t2{k}"
        for k in range(1, LB_LAGS + 1))
    q_expr = _lb_q_expr()
    return f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT t.event_type, s.d
    FROM (SELECT DISTINCT event_type FROM ev) t,
         (SELECT UNNEST(range(dmin, dmax + 1)) AS d FROM rng) s
), filled AS (
    SELECT spine.event_type, spine.d, COALESCE(cnt.c, 0) AS x
    FROM spine LEFT JOIN cnt
      ON spine.event_type = cnt.event_type AND spine.d = cnt.d
), lagged AS (
    SELECT event_type, x,
           {lag_cols}
    FROM filled
), suff AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS q,
           {lag_aggs}
    FROM lagged GROUP BY event_type
)
SELECT event_type, n AS n_days,
       {_ha(f"({q_expr}) * 1e6")} AS q_micro,
       CAST({_ha(f"({q_expr}) * 1e6")}
            <= {_half_away(CHI2_95[LB_LAGS] * 1e6)} AS INT) AS white_noise
FROM suff ORDER BY event_type
"""


register("events_ljung_box", events_ljung_box, _lb_oracle(),
         f"Ljung-Box Q (lags 1..{LB_LAGS}) on zero-filled daily counts")


# --------------------------------------- Bartlett variance homogeneity
def lineitem_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test of variance homogeneity across lineitem return
    flags on exact integer cents — the k-group variance complement to
    the ANOVA mean test. Sufficient statistics ride DECIMAL(38,0)
    (sum of cents^2 <= 6e5 * 1.1e14 ~ 6.6e19 passes int64 at sf0.1);
    each group's n*q - s^2 is computed EXACTLY in DECIMAL(38,0)
    (<= ~4e25), and the three cross-group float reductions —
    sum((n_i-1)*ln v_i), the pooled sum((n_i-1)*v_i), and
    sum(1/(n_i-1)) — are half-away-quantized per group to integer
    micro / unit-cents^2 / pico BEFORE summing, so every cross-group
    sum is order-free integer arithmetic. chi2_B quantizes to micro
    and compares against the pre-quantized chi2(k-1) 5% critical
    value (k <= 9 by CASE)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(19,0)")).alias("s"),
        F.sum(F.col("cents").cast("decimal(19,0)")
              * F.col("cents").cast("decimal(19,0)")).alias("q"))
    # DECIMAL sums are exact; the n*q - s^2 core would need width 57,
    # so each factor converts to double FIRST (correctly rounded in
    # both engines) — a DECIMAL(19)x(38) product would silently cap at
    # precision 38 in Spark (the documented decimal-collapse trap) and
    # width-error in DuckDB. The ~1e-14 relative cancellation error is
    # identical on both sides, which is what parity needs.
    core = ("(cast(n as double) * cast(q as double)"
            " - cast(s as double) * cast(s as double))")
    v_i = f"({core} / (cast(n as double) * (n - 1)))"
    terms = per.select(
        "n",
        F.expr(_ha(f"1e6 * (n - 1) * ln({v_i})")).alias("lnterm_micro"),
        F.expr(_ha(f"{core} / n")).alias("w_cents2"),
        F.expr(_ha("1e12 / (n - 1)")).alias("inv_pico"))
    agg = terms.agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("nn"),
        F.sum("lnterm_micro").alias("lnsum_micro"),
        F.sum("w_cents2").alias("w_total"),
        F.sum("inv_pico").alias("inv_sum_pico"))
    vp = "(cast(w_total as double) / (nn - k))"
    c_corr = (f"(1.0 + (cast(inv_sum_pico as double) / 1e12"
              f" - 1.0 / (nn - k)) / (3.0 * (k - 1)))")
    chi2 = (f"(((nn - k) * ln({vp})"
            f" - cast(lnsum_micro as double) / 1e6) / {c_corr})")
    return agg.select(
        F.col("k").cast("int").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        F.expr(_ha(f"({chi2}) * 1e6")).alias("chi2_micro"),
        F.expr(f"cast({_ha(f'({chi2}) * 1e6')}"
               f" <= {_chi2_crit_case('k - 1')} as int)")
        .alias("homogeneous"))


_BL_CORE = ("(CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))")
_BL_V = f"({_BL_CORE} / (CAST(n AS DOUBLE) * (n - 1)))"
_BL_VP = "(CAST(w_total AS DOUBLE) / (nn - k))"
_BL_C = ("(1.0 + (CAST(inv_sum_pico AS DOUBLE) / 1e12"
         " - 1.0 / (nn - k)) / (3.0 * (k - 1)))")
_BL_CHI2 = (f"(((nn - k) * LN({_BL_VP})"
            f" - CAST(lnsum_micro AS DOUBLE) / 1e6) / {_BL_C})")

register("lineitem_bartlett_test", lineitem_bartlett_test, f"""
WITH per AS (
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s,
           CAST(SUM(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(19,0))
                    * CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS q
    FROM lineitem GROUP BY 1
), terms AS (
    SELECT n,
           {_ha(f"1e6 * (n - 1) * LN({_BL_V})")} AS lnterm_micro,
           {_ha(f"{_BL_CORE} / n")} AS w_cents2,
           {_ha("1e12 / (n - 1)")} AS inv_pico
    FROM per
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(lnterm_micro) AS BIGINT) AS lnsum_micro,
           CAST(SUM(w_cents2) AS BIGINT) AS w_total,
           CAST(SUM(inv_pico) AS BIGINT) AS inv_sum_pico
    FROM terms
)
SELECT CAST(k AS INT) AS k_groups, nn AS n_total,
       {_ha(f"({_BL_CHI2}) * 1e6")} AS chi2_micro,
       CAST({_ha(f"({_BL_CHI2}) * 1e6")} <= {_chi2_crit_case('k - 1')}
            AS INT) AS homogeneous
FROM agg
""", "Bartlett variance-homogeneity test across return flags (cents)")


# --------------------------------------- effective sample size (ESS)
def events_effective_sample_size(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Integrated autocorrelation time and effective sample size of
    each type's zero-filled daily count series: tau = 1 + 2*sum
    rho_k over lags 1..LB_LAGS and ESS = n/tau — the "how many
    independent days do we really have" number that calibrates every
    i.i.d.-assuming interval on daily aggregates (a Ljung-Box
    companion: LB says WHETHER autocorrelation exists, tau says how
    much it costs). The rho_k reuse the exact n²-scaled integer
    decomposition of events_ljung_box, summed in fixed textual order;
    tau can dip below 1 under oscillation (ESS > n — documented, not
    clamped). NULL for a constant series."""
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
    from pyspark.sql import Window as W
    w = W.partitionBy("event_type").orderBy("d")
    lagged = filled
    for k in range(1, LB_LAGS + 1):
        lagged = lagged.withColumn(f"x{k}", F.lag("x", k).over(w))
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
            F.sum(F.expr("x * x")).alias("q")]
    for k in range(1, LB_LAGS + 1):
        aggs += [
            F.sum(F.expr(f"case when x{k} is not null"
                         f" then x * x{k} else 0 end")).alias(f"a{k}"),
            F.sum(F.expr(f"case when x{k} is not null"
                         f" then x else 0 end")).alias(f"t1{k}"),
            F.sum(F.coalesce(F.col(f"x{k}"), F.lit(0))).alias(f"t2{k}")]
    suff = lagged.groupBy("event_type").agg(*aggs)
    tau = _ess_tau_expr()
    return (suff.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.expr(_ha(f"({tau}) * 1e6")).alias("tau_micro"),
        F.expr(_ha(f"case when ({tau}) is null then null else"
                   f" cast(n as double) / ({tau}) * 1e3 end"))
        .alias("ess_milli"))
        .orderBy("event_type"))


def _ess_tau_expr() -> str:
    den = "(cast(n as double) * (n * q - s * s))"
    rhos = []
    for k in range(1, LB_LAGS + 1):
        num = (f"(cast(n as double) * n * a{k}"
               f" - cast(n as double) * s * (t1{k} + t2{k})"
               f" + cast(n - {k} as double) * s * s)")
        rhos.append(f"({num} / {den})")
    rho_sum = " + ".join(rhos)
    return (f"case when n * q = s * s then null else"
            f" 1.0 + 2.0 * ({rho_sum}) end")


def _ess_oracle() -> str:
    lag_cols = ",\n           ".join(
        f"LAG(x, {k}) OVER (PARTITION BY event_type ORDER BY d) AS x{k}"
        for k in range(1, LB_LAGS + 1))
    lag_aggs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x * x{k} ELSE 0 END)"
        f" AS BIGINT) AS a{k},\n           "
        f"CAST(SUM(CASE WHEN x{k} IS NOT NULL THEN x ELSE 0 END)"
        f" AS BIGINT) AS t1{k},\n           "
        f"CAST(SUM(COALESCE(x{k}, 0)) AS BIGINT) AS t2{k}"
        for k in range(1, LB_LAGS + 1))
    tau = _ess_tau_expr()
    return f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT t.event_type, s.d
    FROM (SELECT DISTINCT event_type FROM ev) t,
         (SELECT UNNEST(range(dmin, dmax + 1)) AS d FROM rng) s
), filled AS (
    SELECT spine.event_type, spine.d, COALESCE(cnt.c, 0) AS x
    FROM spine LEFT JOIN cnt
      ON spine.event_type = cnt.event_type AND spine.d = cnt.d
), lagged AS (
    SELECT event_type, x,
           {lag_cols}
    FROM filled
), suff AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS q,
           {lag_aggs}
    FROM lagged GROUP BY event_type
)
SELECT event_type, n AS n_days,
       {_ha(f"({tau}) * 1e6")} AS tau_micro,
       {_ha(f"CASE WHEN ({tau}) IS NULL THEN NULL ELSE"
            f" CAST(n AS DOUBLE) / ({tau}) * 1e3 END")} AS ess_milli
FROM suff ORDER BY event_type
"""


register("events_effective_sample_size", events_effective_sample_size,
         _ess_oracle(),
         f"integrated autocorrelation time (lags 1..{LB_LAGS}) + ESS")


# --------------------------------------------- day-of-week ANOVA
def events_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect test per event type: one-way ANOVA of the
    zero-filled daily counts across the 7 weekday groups — the
    SIGNIFICANCE companion to events_weekday_decompose (which reports
    the seasonal means without saying whether they beat noise).
    Weekday is absolute integer arithmetic ((epoch_day + 4) mod 7,
    1970-01-01 being a Thursday) — no timezone or locale enters.
    Same order-free milli-quantized group terms as events_anova_f;
    df1 = 6 fixed by the calendar, so the critical value is a single
    constant, not a CASE."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    return dow_anova_from_daily(cnt)


def dow_anova_from_daily(cnt: DataFrame) -> DataFrame:
    """Core of events_dow_anova over any (event_type, d, c) daily-count
    frame (the type set and day range derive from the counts —
    identical to the raw-event versions). Shared with the streaming
    twin's finalizer (streaming/dow_anova.py): the hourly-count state
    folds hr div 24 with exact integer sums, so the streamed F panel
    is bit-equal to the batch one by construction. Fresh-exprId
    same-name aliases guard every re-referenced lineage (the
    memory-sink gotcha; no-op Projects in the batch plan)."""
    rng = (cnt.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
           .select(F.col("dmin").alias("dmin"),
                   F.col("dmax").alias("dmax")))
    types = (cnt.select(F.col("event_type").alias("event_type"))
             .distinct())
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type",
                      F.expr("pmod(d + 4, 7)").alias("dow"),
                      F.coalesce("c", F.lit(0)).alias("x")))
    per = filled.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
        F.sum(F.expr("x * x")).alias("q"))
    suff = per.select(
        "event_type", "n", "s", "q",
        F.expr(_haw("cast(s as double) * cast(s as double) * 1e3 / n"))
        .alias("t_milli"))
    agg = suff.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("nn"),
        F.sum("s").alias("ss"), F.sum("q").alias("qq"),
        F.sum("t_milli").alias("b_milli"))
    ha_tot = _haw("cast(ss as double) * cast(ss as double) * 1e3 / nn")
    ssb = f"(b_milli - {ha_tot})"
    ssw = "(cast(qq as decimal(38,0)) * 1000 - b_milli)"
    f_stat = (f"((cast({ssb} as double) / (k - 1))"
              f" / (cast({ssw} as double) / (nn - k)))")
    crit = _half_away(CHI2_95[6] / 6 * 1e6)
    return (agg.select(
        "event_type", F.col("nn").cast("long").alias("n_days"),
        F.expr(_ha(f"({f_stat}) * 1e6")).alias("f_micro"),
        F.expr(f"cast({_ha(f'({f_stat}) * 1e6')} > {crit} as int)")
        .alias("dow_effect"))
        .orderBy("event_type"))


_DOW_HA_TOT = _haw("CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) * 1e3 / nn",
                   "HUGEINT")
_DOW_SSB = f"(b_milli - {_DOW_HA_TOT})"
_DOW_SSW = "(CAST(qq AS HUGEINT) * 1000 - b_milli)"
_DOW_F = (f"((CAST({_DOW_SSB} AS DOUBLE) / (k - 1))"
          f" / (CAST({_DOW_SSW} AS DOUBLE) / (nn - k)))")

register("events_dow_anova", events_dow_anova, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
filled AS (
    SELECT t.event_type, (s.d + 4) % 7 AS dow, COALESCE(cnt.c, 0) AS x
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN cnt ON t.event_type = cnt.event_type AND s.d = cnt.d
), per AS (
    SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS q
    FROM filled GROUP BY 1, 2
), suff AS (
    SELECT event_type, n, s, q,
           {_haw("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                 "HUGEINT")}
               AS t_milli
    FROM per
), agg AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
           CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff GROUP BY 1
)
SELECT event_type, nn AS n_days,
       {_ha(f"({_DOW_F}) * 1e6")} AS f_micro,
       CAST({_ha(f"({_DOW_F}) * 1e6")}
            > {_half_away(CHI2_95[6] / 6 * 1e6)} AS INT) AS dow_effect
FROM agg ORDER BY event_type
""", "day-of-week ANOVA per event type on zero-filled daily counts")


# ------------------------------------------------ Poisson GOF
def events_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness-of-fit on each type's zero-filled daily
    counts: the index-of-dispersion chi-square D = sum (x - m)^2 / m
    over n days, with the large-sample variance-ratio verdict
    z = (D/(n-1) - 1) * sqrt((n-1)/2) — overdispersion means a
    Poisson rate model (and every Poisson-assuming alert threshold)
    understates tail risk. chi2 multiplies out exactly through n:
    sum (n*x - S)^2 / (n*S) is a ratio of exact integers
    ((n*x-S)^2 <= (30*670)^2 ~ 4e8 per day at sf0.1 — int64 to ~1e9-
    row days); one sqrt for the verdict. Complements
    events_fano_burstiness (same moment, formal gate) and
    events_weibull_interarrival (the interarrival view)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    rng = ev.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    types = ev.select("event_type").distinct()
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type", F.coalesce("c", F.lit(0)).alias("x")))
    suff = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"),
        F.sum(F.expr("x * x")).alias("q"))
    # sum (n*x - S)^2 = n^2*Q - 2nS*S + n*S^2 = n*(n*Q - S^2)
    chi2 = ("(cast(n as double) * (n * q - s * s)"
            " / (cast(n as double) * s))")
    disp = f"({chi2} / (n - 1))"
    z = f"(({disp} - 1.0) * sqrt((n - 1) / 2.0))"
    return (suff.select(
        "event_type", F.col("n").cast("long").alias("n_days"),
        F.expr(_ha(f"({chi2}) * 1e6")).alias("chi2_micro"),
        F.expr(_ha(f"({disp}) * 1e6")).alias("dispersion_micro"),
        F.expr(_ha(f"({z}) * 1e6")).alias("z_micro"))
        .withColumn("overdispersed", F.expr(
            "cast(z_micro > 1959964 as int)"))
        .orderBy("event_type"))


_PG_CHI2 = ("(CAST(n AS DOUBLE) * (n * q - s * s)"
            " / (CAST(n AS DOUBLE) * s))")
_PG_DISP = f"({_PG_CHI2} / (n - 1))"
_PG_Z = f"(({_PG_DISP} - 1.0) * SQRT((n - 1) / 2.0))"

register("events_poisson_gof", events_poisson_gof, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
filled AS (
    SELECT t.event_type, COALESCE(cnt.c, 0) AS x
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN cnt ON t.event_type = cnt.event_type AND s.d = cnt.d
), suff AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(x * x) AS BIGINT) AS q
    FROM filled GROUP BY 1
)
SELECT event_type, n AS n_days,
       {_ha(f"({_PG_CHI2}) * 1e6")} AS chi2_micro,
       {_ha(f"({_PG_DISP}) * 1e6")} AS dispersion_micro,
       {_ha(f"({_PG_Z}) * 1e6")} AS z_micro,
       CAST({_ha(f"({_PG_Z}) * 1e6")} > 1959964 AS INT) AS overdispersed
FROM suff ORDER BY event_type
""", "Poisson dispersion chi-square + variance-ratio verdict per type")


# ------------------------------------------------ day-cluster ICC
def events_day_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation of event values within days, per type —
    ICC(1) from the one-way days-as-groups ANOVA, with the design
    effect 1 + (n0 - 1)*ICC that says how much day-clustering
    inflates the variance of any day-sampled estimate (the sampling-
    design companion to the dispersion tests: Fano asks about counts,
    ICC asks about values). Group sufficient statistics are the usual
    exact integers; the ANOVA average group size
    n0 = (N - sum n_i^2 / N)/(k - 1) and both mean squares come from
    order-free milli-quantized terms. ICC can be negative (values
    MORE homogeneous across days than within); reported micro-signed."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    per = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("centi").alias("s"),
        F.sum(F.expr("centi * centi")).alias("q"))
    suff = per.select(
        "event_type", "n", "s", "q",
        F.expr(_haw("cast(s as double) * cast(s as double) * 1e3 / n"))
        .alias("t_milli"))
    agg = suff.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("nn"),
        F.sum(F.expr("n * n")).alias("n2"), F.sum("s").alias("ss"),
        F.sum("q").alias("qq"), F.sum("t_milli").alias("b_milli"))
    ha_tot = _haw("cast(ss as double) * cast(ss as double) * 1e3 / nn")
    ssb = f"(b_milli - {ha_tot})"
    ssw = "(cast(qq as decimal(38,0)) * 1000 - b_milli)"
    msb = f"(cast({ssb} as double) / (k - 1))"
    msw = f"(cast({ssw} as double) / (nn - k))"
    n0 = ("((cast(nn as double) - cast(n2 as double) / nn) / (k - 1))")
    icc = f"(({msb} - {msw}) / ({msb} + ({n0} - 1.0) * {msw}))"
    deff = f"(1.0 + ({n0} - 1.0) * {icc})"
    return (agg.select(
        "event_type", F.col("k").cast("long").alias("k_days"),
        F.col("nn").cast("long").alias("n_events"),
        F.expr(_ha(f"({n0}) * 1e3")).alias("n0_milli"),
        F.expr(_ha(f"({icc}) * 1e6")).alias("icc_micro"),
        F.expr(_ha(f"({deff}) * 1e3")).alias("design_effect_milli"))
        .orderBy("event_type"))


_ICC_HA_TOT = _haw("CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) * 1e3 / nn",
                   "HUGEINT")
_ICC_SSB = f"(b_milli - {_ICC_HA_TOT})"
_ICC_SSW = "(CAST(qq AS HUGEINT) * 1000 - b_milli)"
_ICC_MSB = f"(CAST({_ICC_SSB} AS DOUBLE) / (k - 1))"
_ICC_MSW = f"(CAST({_ICC_SSW} AS DOUBLE) / (nn - k))"
_ICC_N0 = "((CAST(nn AS DOUBLE) - CAST(n2 AS DOUBLE) / nn) / (k - 1))"
_ICC = (f"(({_ICC_MSB} - {_ICC_MSW})"
        f" / ({_ICC_MSB} + ({_ICC_N0} - 1.0) * {_ICC_MSW}))")
_ICC_DEFF = f"(1.0 + ({_ICC_N0} - 1.0) * {_ICC})"

register("events_day_icc", events_day_icc, f"""
WITH per AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)
                    * CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS q
    FROM events GROUP BY 1, 2
), suff AS (
    SELECT event_type, n, s, q,
           {_haw("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                 "HUGEINT")}
               AS t_milli
    FROM per
), agg AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(n * n) AS BIGINT) AS n2,
           CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff GROUP BY 1
)
SELECT event_type, k AS k_days, nn AS n_events,
       {_ha(f"({_ICC_N0}) * 1e3")} AS n0_milli,
       {_ha(f"({_ICC}) * 1e6")} AS icc_micro,
       {_ha(f"({_ICC_DEFF}) * 1e3")} AS design_effect_milli
FROM agg ORDER BY event_type
""", "ICC(1) + design effect of event values clustered by day")
