"""Value-weighted daily monitors (VERDICT r13 ask #4).

The five daily time-series monitors — transfer entropy, Granger
causality, day-of-week ANOVA, Hurst exponent, Pettitt change-point —
re-run over the daily VALUE series instead of the daily count series:
"does above-average click REVENUE predict above-average purchase
revenue", "is there a weekday effect in spend", "does throughput value
persist or average out", "where did the spend level break". Each one
REUSES the count monitor's shared ``*_from_daily`` helper verbatim —
only the daily frame differs — so the statistics' arithmetic is
identical, the streaming twins are the same finalizer seam
(``streaming/value_daily.py`` over the shared hourly state's micro
value sums), and streamed == batch stays bit-equal by construction.

The daily value series is WHOLE currency units:
``v_d = (sum of floor(value * VALUE_MICRO) over the day) div
VALUE_MICRO`` — exact integer derivation from the same micro quanta the
state row accumulates. Whole units, not micro, because every one of
these monitors SQUARES its series (Granger's s11/syy, ANOVA's q,
Hurst's block s*s): micro-scale daily sums (~1.5e8 at sf0.1) would put
sum-of-squares near 1.5e19 — past int64 — while whole units (~1.5e4)
keep every sufficient statistic below ~1e12 with 1e6 headroom at a
1000x scale-up (SCALE.md). The one convention boundary: Spark ``div``
truncates where DuckDB ``//`` floors — identical for the fixtures'
non-negative value sums, the standing dailyfold convention.

Scale shape (all five): the fact table reduces ONCE to (type, day)
integer cells; everything downstream is day-spine cardinality,
independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..quantum import HOUR_NS, VALUE_MICRO
from ..registry import register
from ..sources import load_table

from .dynamics import TE_PAIRS, te_from_daily
from .hypothesis import CHI2_95, _half_away, dow_anova_from_daily
from .monitor_eval import (_SPRT_LA, _SPRT_LB, _SPRT_W0, _SPRT_W1,
                           sprt_from_per_day)
from .monitor_eval import _ha_sql as _ha
from .monitor_eval import _ha_wide_sql as _haw
from .spectral_info import (GC_F_CRIT_MICRO, GC_PAIRS, HURST_LNM_MICRO,
                            HURST_MS, _GC_B0_SQL, _GC_B1_SQL, _GC_B2_SQL,
                            granger_from_daily, hurst_from_daily)
from .stat_tests import PT_SIG_MICRO, pettitt_from_daily

DAY_NS = 24 * HOUR_NS
DAY_US = DAY_NS // 1000

# the shared oracle head: exact micro quanta per event, whole-unit
# daily sums per (type, day) / per day — the SQL twin of
# _daily_values_by_type / _daily_values_global below
_EV_CTE = f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), daily AS (
    SELECT event_type, d,
           CAST(SUM(m) // {VALUE_MICRO} AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev)
"""


def _daily_values_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, event_type, c) whole-unit daily value sums — the batch twin
    of streaming/dailyfold.py::daily_values_by_type (sum micro quanta,
    ONE truncating div per day cell; associativity + trunc-div
    composition make the two routes bit-equal)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    return (ev.groupBy("d", "event_type")
            .agg(F.expr(f"sum(m) div {VALUE_MICRO}").alias("c")))


def _daily_values_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (d, c) whole-unit daily value sums — sums micro across
    ALL types BEFORE the one div (NOT the sum of per-type whole units,
    whose per-type truncations would differ); twin of
    daily_values_global."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    return ev.groupBy("d").agg(
        F.expr(f"sum(m) div {VALUE_MICRO}").alias("c"))


# ------------------------------------------- transfer entropy (value)
def events_te_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer entropy TE(X->Y) between mean-binarized daily VALUE
    series, both directions — does above-average click revenue carry
    information about tomorrow's purchase revenue beyond its own
    history? Identical arithmetic to events_transfer_entropy
    (te_from_daily), fed whole-unit daily value sums."""
    return te_from_daily(_daily_values_by_type(spark, sf_dir))


def _te_value_oracle() -> str:
    term = _ha("1e9 * (CAST(c AS DOUBLE) / nn)"
               " * LN(CAST(c AS DOUBLE) * c_yp"
               " / (CAST(c_ypxp AS DOUBLE) * c_ytyp))")
    parts = []
    for x_t, y_t in TE_PAIRS:
        parts.append(f"""
SELECT '{x_t}->{y_t}' AS direction,
       CAST(MAX(nn) AS BIGINT) AS n_steps,
       CAST(SUM({term}) // 1000 AS BIGINT) AS te_micro
FROM (
    SELECT c, SUM(c) OVER () AS nn,
           SUM(c) OVER (PARTITION BY byp) AS c_yp,
           SUM(c) OVER (PARTITION BY byp, bxp) AS c_ypxp,
           SUM(c) OVER (PARTITION BY by_t, byp) AS c_ytyp
    FROM (
        SELECT by_t, byp, bxp, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT by_t, LAG(by_t) OVER (ORDER BY d) AS byp,
                   LAG(bx) OVER (ORDER BY d) AS bxp
            FROM (
                SELECT s.d,
                       CASE WHEN COALESCE(y.c, 0) * t.n > t.sy
                            THEN 1 ELSE 0 END AS by_t,
                       CASE WHEN COALESCE(x.c, 0) * t.n > t.sx
                            THEN 1 ELSE 0 END AS bx
                FROM (SELECT UNNEST(range((SELECT dmin FROM rng),
                                          (SELECT dmax FROM rng) + 1))
                             AS d) s
                LEFT JOIN (SELECT d, c FROM daily
                           WHERE event_type = '{x_t}') x ON s.d = x.d
                LEFT JOIN (SELECT d, c FROM daily
                           WHERE event_type = '{y_t}') y ON s.d = y.d
                CROSS JOIN (
                    SELECT (SELECT dmax - dmin + 1 FROM rng) AS n,
                           (SELECT COALESCE(SUM(c), 0) FROM daily
                            WHERE event_type = '{x_t}') AS sx,
                           (SELECT COALESCE(SUM(c), 0) FROM daily
                            WHERE event_type = '{y_t}') AS sy
                ) t
            )
        ) WHERE byp IS NOT NULL
        GROUP BY 1, 2, 3
    )
)""")
    return _EV_CTE + "\nUNION ALL\n".join(parts) + "\nORDER BY direction"


register("events_te_value", events_te_value, _te_value_oracle(),
         "transfer entropy on mean-binarized daily VALUE series")


# ------------------------------------------ Granger causality (value)
def events_granger_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger F-test between the click and purchase daily VALUE
    series, both directions: does yesterday's spend on X improve
    today's spend prediction on Y beyond Y's own lag? Same
    normal-equation route as events_granger_causality
    (granger_from_daily), fed whole-unit daily value sums — with the
    sufficient statistics cast to double before the Cramer products
    (suff_as_double: value-scale s11*s22 sits near 2e22, past int64 on
    both engines; the sums themselves accumulate exactly in integer
    first, and the one float expression is identical text on both
    engines)."""
    return granger_from_daily(_daily_values_by_type(spark, sf_dir),
                              suff_as_double=True)


def _granger_value_oracle() -> str:
    sst = ("(CAST(syy AS DOUBLE)"
           " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)")
    ess_u = (f"({_GC_B0_SQL}*CAST(sy AS DOUBLE)"
             f" + {_GC_B1_SQL}*CAST(s1y AS DOUBLE)"
             f" + {_GC_B2_SQL}*CAST(s2y AS DOUBLE)"
             " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)")
    ess_r = ("((CAST(n AS DOUBLE)*s1y - CAST(s1 AS DOUBLE)*sy)"
             " * (CAST(n AS DOUBLE)*s1y - CAST(s1 AS DOUBLE)*sy)"
             " / (CAST(n AS DOUBLE)"
             " * (CAST(n AS DOUBLE)*s11 - CAST(s1 AS DOUBLE)*s1)))")
    f_stat = (f"((({ess_u}) - ({ess_r})) * (n - 3.0))"
              f" / (({sst}) - ({ess_u}))")
    parts = []
    for x_t, y_t in GC_PAIRS:
        parts.append(f"""
SELECT '{x_t}->{y_t}' AS direction,
       CAST(n AS BIGINT) AS n_days,
       {_ha(f"{f_stat} * 1e6")} AS f_micro,
       CAST(CASE WHEN {_ha(f"{f_stat} * 1e6")} > {GC_F_CRIT_MICRO}
            THEN 1 ELSE 0 END AS INT) AS causal
FROM (
    -- integer accumulation (each product stays below ~1.5e11), then
    -- DOUBLE before the Cramer determinants — the suff_as_double twin
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
           CAST(SUM(x1*x1) AS DOUBLE) AS s11,
           CAST(SUM(x1*x2) AS DOUBLE) AS s12,
           CAST(SUM(x2*x2) AS DOUBLE) AS s22,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(x1*y) AS DOUBLE) AS s1y,
           CAST(SUM(x2*y) AS DOUBLE) AS s2y,
           CAST(SUM(y*y) AS DOUBLE) AS syy
    FROM (
        SELECT yc AS y,
               LAG(yc) OVER (ORDER BY d) AS x1,
               LAG(xc) OVER (ORDER BY d) AS x2
        FROM (
            SELECT s.d,
                   COALESCE(x.c, 0) AS xc, COALESCE(y.c, 0) AS yc
            FROM (SELECT UNNEST(range((SELECT dmin FROM rng),
                                      (SELECT dmax FROM rng) + 1)) AS d) s
            LEFT JOIN (SELECT d, c FROM daily
                       WHERE event_type = '{x_t}') x ON s.d = x.d
            LEFT JOIN (SELECT d, c FROM daily
                       WHERE event_type = '{y_t}') y ON s.d = y.d))
    WHERE x1 IS NOT NULL)""")
    return _EV_CTE + "\nUNION ALL\n".join(parts) + "\nORDER BY direction"


register("events_granger_value", events_granger_value,
         _granger_value_oracle(),
         "two-direction Granger F-test on daily click/purchase value")


# ---------------------------------------- day-of-week ANOVA (value)
def events_dow_anova_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week effect test on each type's zero-filled daily VALUE
    series — is there a weekday pattern in spend, and does it beat
    noise? Identical milli-quantized one-way ANOVA to events_dow_anova
    (dow_anova_from_daily), fed whole-unit daily value sums."""
    return dow_anova_from_daily(_daily_values_by_type(spark, sf_dir))


_DVA_HA_TOT = _haw("CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) * 1e3 / nn",
                   "HUGEINT")
_DVA_SSB = f"(b_milli - {_DVA_HA_TOT})"
_DVA_SSW = "(CAST(qq AS HUGEINT) * 1000 - b_milli)"
_DVA_F = (f"((CAST({_DVA_SSB} AS DOUBLE) / (k - 1))"
          f" / (CAST({_DVA_SSW} AS DOUBLE) / (nn - k)))")

register("events_dow_anova_value", events_dow_anova_value, _EV_CTE + f""",
filled AS (
    SELECT t.event_type, (s.d + 4) % 7 AS dow, COALESCE(daily.c, 0) AS x
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN daily ON t.event_type = daily.event_type AND s.d = daily.d
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
       {_ha(f"({_DVA_F}) * 1e6")} AS f_micro,
       CAST({_ha(f"({_DVA_F}) * 1e6")}
            > {_half_away(CHI2_95[6] / 6 * 1e6)} AS INT) AS dow_effect
FROM agg ORDER BY event_type
""", "day-of-week ANOVA per event type on zero-filled daily value")


# --------------------------------------------- Hurst exponent (value)
def events_hurst_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily TOTAL VALUE series by the
    aggregated-variance method — does revenue throughput average out
    (H=0.5) or persist (H>0.5, so capacity/cash planning must not
    assume sqrt-n smoothing)? Identical exact block-sum arithmetic to
    events_hurst_exponent (hurst_from_daily), fed the global
    whole-unit daily value series."""
    return hurst_from_daily(_daily_values_global(spark, sf_dir))


def _hurst_value_oracle() -> str:
    lx_case = ("CASE " + " ".join(
        f"WHEN m = {m} THEN {HURST_LNM_MICRO[m]}" for m in HURST_MS)
        + " END")
    v = ("((CAST(k AS DOUBLE) * qq - CAST(ss AS DOUBLE) * ss)"
         " / (CAST(k AS DOUBLE) * (k - 1))"
         " / (CAST(m AS DOUBLE) * m))")
    slope = ("((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))")
    ms = ", ".join(str(m) for m in HURST_MS)
    return f"""
WITH ev AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), dv AS (
    SELECT d, CAST(SUM(m) // {VALUE_MICRO} AS BIGINT) AS c
    FROM ev GROUP BY 1
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT s.d - r.dmin AS i, r.dmax - r.dmin + 1 AS n,
           COALESCE(dv.c, 0) AS x
    FROM rng r,
         (SELECT UNNEST(range((SELECT dmin FROM rng),
                              (SELECT dmax FROM rng) + 1)) AS d) s
    LEFT JOIN dv ON s.d = dv.d
), blocks AS (
    SELECT mm.m, i // mm.m AS b, CAST(SUM(x) AS BIGINT) AS s,
           MAX(n) AS n
    FROM spine, (SELECT UNNEST([{ms}]) AS m) mm
    WHERE i < (n // mm.m) * mm.m
    GROUP BY 1, 2
), per_m AS (
    SELECT m, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(s) AS BIGINT) AS ss,
           CAST(SUM(s * s) AS BIGINT) AS qq
    FROM blocks GROUP BY 1
), pts AS (
    SELECT m, k, CAST({lx_case} AS BIGINT) AS lx,
           {_ha(f"1e6 * LN({v})")} AS ly
    FROM per_m
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
           CAST(SUM(lx * ly) AS BIGINT) AS sxy,
           CAST(SUM(lx * lx) AS BIGINT) AS sxx,
           CAST(MAX(CASE WHEN m = 1 THEN k END) AS BIGINT) AS n_days
    FROM pts
)
SELECT n_days,
       {_ha(f"({slope}) * 1e6")} AS slope_micro,
       {_ha(f"(1.0 + ({slope}) / 2) * 1e6")} AS hurst_micro
FROM agg
"""


register("events_hurst_value", events_hurst_value, _hurst_value_oracle(),
         "Hurst exponent (aggregated-variance method) of daily value")


# ------------------------------------------ Pettitt change-point (value)
def events_pettitt_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank change-point test on each type's zero-filled daily
    VALUE series — WHERE does the spend distribution split, with a
    distribution-free p-value? Identical doubled-midrank integer
    arithmetic to events_pettitt_test (pettitt_from_daily), fed
    whole-unit daily value sums."""
    return pettitt_from_daily(_daily_values_by_type(spark, sf_dir))


# ------------------------------------------ Wald SPRT (value)
def sprt_value_per_day(daily: DataFrame) -> DataFrame:
    """(d, x, n) frame for the value SPRT from any (d, event_type, c)
    whole-unit daily value frame: x = the day's purchase value, n =
    purchase + click value (each currency unit one Bernoulli trial).
    Shared verbatim by the batch query and the streaming finalizer
    (streaming/value_daily.py::sprt), so the streamed walk is bit-equal
    to batch by construction. Days appear iff they saw >= 1 purchase
    or click event — the same day set as the count SPRT's census; a
    day whose value truncates to zero units contributes an exact zero
    increment."""
    f = daily.filter(F.col("event_type").isin("purchase", "click"))
    return (f.groupBy("d").agg(
        F.sum(F.expr("case when event_type = 'purchase'"
                     " then c else 0L end")).alias("x"),
        F.sum(F.col("c")).alias("n")))


def events_sprt_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over the daily purchase SHARE OF VALUE among
    purchase+click spend — the value-weighted sixth member of the
    daily monitor family (the count SPRT watches the event-share;
    this watches where the money goes): each whole currency unit is
    one Bernoulli trial, so the walk adds x*ln(p1/p0) +
    (n-x)*ln(q1/q0) per day with the SAME pre-quantized micro-nat
    constants and Wald boundaries as events_sprt_sequential
    (sprt_from_per_day, shared verbatim). Units within one event are
    not independent trials, so the nominal alpha/beta are an
    idealization — the walk is a monitoring statistic with fixed,
    documented boundaries, not a certified test (the same caveat every
    value-weighted monitor carries). Scale shape: one corpus reduce to
    (type, day) integer cells, then day-spine arithmetic."""
    return sprt_from_per_day(
        sprt_value_per_day(_daily_values_by_type(spark, sf_dir)))


register("events_sprt_value", events_sprt_value, _EV_CTE + f""",
pc AS (
    SELECT d,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN c ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(c) AS BIGINT) AS n
    FROM daily WHERE event_type IN ('purchase', 'click') GROUP BY d
), prng AS (SELECT MIN(d) AS d0 FROM pc),
walk AS (
    SELECT d - d0 AS d_idx, x, n,
           SUM(x * {_SPRT_W1} + (n - x) * {_SPRT_W0})
               OVER (ORDER BY d) AS llr_micro
    FROM pc CROSS JOIN prng
), flagged AS (
    SELECT d_idx, x, n, CAST(llr_micro AS BIGINT) AS llr_micro,
           CASE WHEN llr_micro >= {_SPRT_LA} THEN 1 ELSE 0 END
               AS hit_upper,
           CASE WHEN llr_micro <= {_SPRT_LB} THEN 1 ELSE 0 END
               AS hit_lower
    FROM walk
)
SELECT d_idx, x, n, llr_micro,
       CAST(hit_upper AS INT) AS hit_upper,
       CAST(hit_lower AS INT) AS hit_lower,
       CASE WHEN MAX(CASE WHEN hit_upper = 1 OR hit_lower = 1
                          THEN 1 ELSE 0 END)
                 OVER (ORDER BY d_idx) = 0 THEN 'continue'
            WHEN hit_upper = 1 THEN 'accept_h1'
            WHEN hit_lower = 1 THEN 'accept_h0'
            ELSE 'decided_earlier' END AS state
FROM flagged ORDER BY d_idx
""", "Wald SPRT walk over the daily purchase share of VALUE")


_PV_P = ("(2.0 * EXP(-6.0 * CAST(k_stat AS DOUBLE) * k_stat"
         " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)))")

register("events_pettitt_value", events_pettitt_value, _EV_CTE + f""",
spine AS (
    SELECT t.event_type, r.dmin, r.dmax, s.d
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN rng r
    CROSS JOIN (SELECT UNNEST(range((SELECT dmin FROM rng),
                                    (SELECT dmax FROM rng) + 1)) AS d) s
), filled AS (
    SELECT spine.event_type, spine.dmin, spine.dmax, spine.d,
           COALESCE(daily.c, 0) AS x
    FROM spine LEFT JOIN daily
      ON spine.event_type = daily.event_type AND spine.d = daily.d
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
       {_ha(f"({_PV_P}) * 1e6")} AS p_micro,
       CAST({_ha(f"({_PV_P}) * 1e6")} <= {PT_SIG_MICRO} AS INT)
           AS significant
FROM agg ORDER BY event_type
""", "Pettitt rank change-point on zero-filled daily value per type")


# ------------------------------------------- Ljung-Box white noise (value)
from .hypothesis import LB_LAGS, _lb_q_expr, ljung_box_from_daily  # noqa: E402


def events_ljung_box_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is daily SPEND white noise, or does it carry autocorrelation a
    forecaster should model? Identical Ljung-Box arithmetic to
    events_ljung_box (ljung_box_from_daily), fed whole-unit daily
    value sums — with wide_regs: at value scale n*q ~ n^2*v^2 and s^2
    pass int64 around v ~ 1.5e7 (the 1000x operating point), so the
    guard and denominator core ride DECIMAL(38,0)/HUGEINT with the
    identical double cast after (values bit-equal wherever the narrow
    registers were valid)."""
    return ljung_box_from_daily(_daily_values_by_type(spark, sf_dir),
                                wide_regs=True)


def _lb_value_oracle() -> str:
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
    q_expr = _lb_q_expr(wide_regs=True, huge=True)
    return _EV_CTE + f""", spine AS (
    SELECT t.event_type, s.d
    FROM (SELECT DISTINCT event_type FROM ev) t,
         (SELECT UNNEST(range(dmin, dmax + 1)) AS d FROM rng) s
), filled AS (
    SELECT spine.event_type, spine.d, COALESCE(daily.c, 0) AS x
    FROM spine LEFT JOIN daily
      ON spine.event_type = daily.event_type AND spine.d = daily.d
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


register("events_ljung_box_value", events_ljung_box_value,
         _lb_value_oracle(),
         f"Ljung-Box Q (lags 1..{LB_LAGS}) on zero-filled daily value")
