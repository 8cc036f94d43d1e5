"""Exact integer fixed-point forecasting kernels.

Holt-Winters (additive level + trend + weekly seasonality) is the
classic iterative smoother an analytics engine is asked for right
after EWMA — and the reason engines usually punt on it is the
recursion: floating-point state makes the result depend on evaluation
order. Here the recursion runs in EXACT truncating integer arithmetic
with power-of-two smoothing constants (alpha=1/2, beta=gamma=1/4), so
every step is a deterministic integer expression both engines compute
bit-identically:

    l_t = (y_t - s_{t-7}  +  l_{t-1} + b_{t-1})        div 2
    b_t = (l_t - l_{t-1}  +  3 * b_{t-1})              div 4
    s_t = (y_t - l_t      +  3 * s_{t-7})              div 4

(div = truncation toward zero — Spark ``div`` / DuckDB ``//``; the
Python kernel uses an explicit trunc helper because Python ``//``
floors). Initialization contract: the first 7 days seed the seasonal
state (s_i = y_i - m, m = 7-day mean, trunc), l_6 = m, b_6 = 0; rows
emit from t = 7 on.

Scale shape: the corpus reduces ONCE to the per-type DENSE daily
spine (missing day = real zero — the EWMA spine discipline); the
recursion runs inside an Arrow ``applyInPandas`` kernel whose group is
one type's CALENDAR-BOUNDED series (<= years x 365 points regardless
of corpus size — the HP-filter kernel contract, reference
dtrendandstat_HP100.R:5-291 for the per-group-kernel pattern). The
DuckDB oracle is a RECURSIVE CTE carrying (l, b, s-list-of-7) state —
linear recursion, one successor per row, terminating in day-span
depth (the q_recursive_streaks precedent).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import oracle_sql_of, register
from ..sources import load_table

DAY_NS = 86_400_000_000_000
HW_SEASON = 7


def _trunc_div(a: int, b: int) -> int:
    """Truncation-toward-zero integer division (Spark div, DuckDB //).
    Python's // floors, which differs on negative numerators."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def hw_fit(ys: list[int],
           m: int = HW_SEASON) -> list[tuple[int, int, int, int, int]]:
    """Pure-Python Holt-Winters fold over one integer series with
    season length ``m``. Returns (t, level, trend, season, fitted) for
    t >= m. Exposed for the independent kernel test."""
    if len(ys) <= m:
        return []
    mean7 = _trunc_div(sum(ys[:m]), m)
    s = [ys[i] - mean7 for i in range(m)]  # s[t % m] = s_{t'}, latest
    lvl, b = mean7, 0
    out = []
    for t in range(m, len(ys)):
        s_lag = s[t % m]
        fitted = lvl + b + s_lag
        new_l = _trunc_div(ys[t] - s_lag + lvl + b, 2)
        new_b = _trunc_div(new_l - lvl + 3 * b, 4)
        new_s = _trunc_div(ys[t] - new_l + 3 * s_lag, 4)
        lvl, b = new_l, new_b
        s[t % m] = new_s
        out.append((t, lvl, b, new_s, fitted))
    return out


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters over each event type's daily revenue (see
    module docstring for the exact integer recursion and its scale
    shape). Emits one row per (type, day index >= 7): the observed
    cents, the smoothed level/trend/seasonal state and the one-step-
    ahead fitted value — the residual y - fitted is the anomaly signal
    a monitoring pipeline thresholds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    daily = ev.groupBy("event_type", "d").agg(F.sum("centi").alias("c"))
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        "event_type", "d0", F.explode(F.expr("sequence(d0, d1)")).alias("d"))
    dense = (spine.join(daily, ["event_type", "d"], "left")
             .select("event_type", (F.col("d") - F.col("d0")).alias("t"),
                     F.coalesce("c", F.lit(0)).alias("y")))

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("t")
        et = g["event_type"].iloc[0]
        ys = [int(v) for v in g["y"]]
        rows = hw_fit(ys)
        return pd.DataFrame({
            "event_type": et,
            "t": [r[0] for r in rows],
            "y_centi": [ys[r[0]] for r in rows],
            "level_centi": [r[1] for r in rows],
            "trend_centi": [r[2] for r in rows],
            "season_centi": [r[3] for r in rows],
            "fitted_centi": [r[4] for r in rows],
        })

    schema = ("event_type string, t long, y_centi long, level_centi long,"
              " trend_centi long, season_centi long, fitted_centi long")
    # applyInPandas (NOT mapInPandas): the recursion needs the WHOLE
    # calendar-bounded series in one call — grouped-map guarantees it,
    # while mapInPandas would split the series across Arrow batches
    return (dense.groupBy("event_type").applyInPandas(fit_group, schema)
            .orderBy("event_type", "t"))


register("events_holt_winters", events_holt_winters, f"""
WITH RECURSIVE ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events
), daily AS (
    SELECT event_type, d, CAST(SUM(centi) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
), spine AS (
    SELECT b.event_type, b.d0, UNNEST(range(b.d0, b.d1 + 1)) AS d
    FROM bounds b
), dense AS (
    SELECT s.event_type, s.d - s.d0 AS t, COALESCE(dd.c, 0) AS y
    FROM spine s LEFT JOIN daily dd
      ON s.event_type = dd.event_type AND s.d = dd.d
), seed AS (
    SELECT event_type,
           CAST(SUM(y) AS BIGINT) // {HW_SEASON} AS mean7,
           list_transform(list(y ORDER BY t),
                          x -> x - CAST(SUM(y) AS BIGINT) // {HW_SEASON})
               AS sw
    FROM dense WHERE t < {HW_SEASON} GROUP BY event_type
), rec AS (
    SELECT event_type, CAST({HW_SEASON} - 1 AS BIGINT) AS t,
           CAST(0 AS BIGINT) AS y, mean7 AS l, CAST(0 AS BIGINT) AS b,
           sw, CAST(0 AS BIGINT) AS fitted, CAST(0 AS BIGINT) AS s_t
    FROM seed
    UNION ALL
    SELECT d.event_type, d.t, d.y,
           (d.y - r.sw[1] + r.l + r.b) // 2 AS l,
           (((d.y - r.sw[1] + r.l + r.b) // 2) - r.l + 3 * r.b) // 4 AS b,
           list_concat(
               r.sw[2:{HW_SEASON}],
               [(d.y - ((d.y - r.sw[1] + r.l + r.b) // 2)
                 + 3 * r.sw[1]) // 4]) AS sw,
           r.l + r.b + r.sw[1] AS fitted,
           (d.y - ((d.y - r.sw[1] + r.l + r.b) // 2) + 3 * r.sw[1]) // 4
               AS s_t
    FROM rec r JOIN dense d
      ON d.event_type = r.event_type AND d.t = r.t + 1
)
SELECT event_type, t, y AS y_centi, l AS level_centi, b AS trend_centi,
       s_t AS season_centi, fitted AS fitted_centi
FROM rec WHERE t >= {HW_SEASON}
ORDER BY event_type, t
""", "exact fixed-point additive Holt-Winters over daily revenue")


# ------------------------------------- grouped Holt-Winters (nations)
HW_WEEKS = 52  # annual seasonality on the weekly grain


def _nation_weekly_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-nation weekly revenue series (n_name, t, y): the fact
    table reduces once to (nation, week) integer cents, then each
    nation's calendar-bounded spine fills gaps with real zeros — shared
    by the grouped Holt-Winters fit and its backtest so both score the
    SAME series (week = epoch-day div 7; both dims broadcast-size)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(cast(o_orderdate as date), DATE '1970-01-01')"
               " div 7").alias("wk"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("centi"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    weekly = (orders
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(nation, cust.c_nationkey == nation.n_nationkey)
              .groupBy("n_name", "wk").agg(F.sum("centi").alias("c")))
    bounds = weekly.groupBy("n_name").agg(
        F.min("wk").alias("w0"), F.max("wk").alias("w1"))
    spine = bounds.select(
        "n_name", "w0", F.explode(F.expr("sequence(w0, w1)")).alias("wk"))
    return (spine.join(weekly, ["n_name", "wk"], "left")
            .select("n_name", (F.col("wk") - F.col("w0")).alias("t"),
                    F.coalesce("c", F.lit(0)).alias("y")))


def orders_holt_winters_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Holt-Winters — the forecast family's second member
    (VERDICT r12 ask #4): the same exact integer recursion as
    events_holt_winters, run per NATION over weekly order revenue with
    ANNUAL seasonality (season length 52 on the week grain; week =
    epoch-day div 7). The grouping column comes from a dimension join
    (orders → customer → nation, both broadcast-size) rather than a
    fact column — the shape a fleet of per-market forecasts takes.

    Scale shape: the fact table reduces ONCE to the per-(nation, week)
    integer cents frame; the dense weekly spine and the recursion are
    dimension x calendar cardinality (25 nations x ~340 weeks here,
    #groups x weeks-elapsed at any scale). The applyInPandas group is
    one nation's calendar-bounded series — the events_holt_winters /
    HP-filter kernel contract.
    """
    dense = _nation_weekly_dense(spark, sf_dir)

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("t")
        nm = g["n_name"].iloc[0]
        ys = [int(v) for v in g["y"]]
        rows = hw_fit(ys, m=HW_WEEKS)
        return pd.DataFrame({
            "n_name": nm,
            "t": [r[0] for r in rows],
            "y_centi": [ys[r[0]] for r in rows],
            "level_centi": [r[1] for r in rows],
            "trend_centi": [r[2] for r in rows],
            "season_centi": [r[3] for r in rows],
            "fitted_centi": [r[4] for r in rows],
        })

    schema = ("n_name string, t long, y_centi long, level_centi long,"
              " trend_centi long, season_centi long, fitted_centi long")
    return (dense.groupBy("n_name").applyInPandas(fit_group, schema)
            .orderBy("n_name", "t"))


register("orders_holt_winters_nation", orders_holt_winters_nation, f"""
WITH RECURSIVE weekly AS (
    SELECT n.n_name,
           (CAST(o.o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS c
    FROM orders o
    JOIN customer cu ON o.o_custkey = cu.c_custkey
    JOIN nation n ON cu.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
), bounds AS (
    SELECT n_name, MIN(wk) AS w0, MAX(wk) AS w1 FROM weekly GROUP BY 1
), spine AS (
    SELECT b.n_name, b.w0, UNNEST(range(b.w0, b.w1 + 1)) AS wk
    FROM bounds b
), dense AS (
    SELECT s.n_name, s.wk - s.w0 AS t, COALESCE(w.c, 0) AS y
    FROM spine s LEFT JOIN weekly w
      ON s.n_name = w.n_name AND s.wk = w.wk
), seed AS (
    SELECT n_name,
           CAST(SUM(y) AS BIGINT) // {HW_WEEKS} AS mean0,
           list_transform(list(y ORDER BY t),
                          x -> x - CAST(SUM(y) AS BIGINT) // {HW_WEEKS})
               AS sw
    FROM dense WHERE t < {HW_WEEKS} GROUP BY n_name
), rec AS (
    SELECT n_name, CAST({HW_WEEKS} - 1 AS BIGINT) AS t,
           CAST(0 AS BIGINT) AS y, mean0 AS l, CAST(0 AS BIGINT) AS b,
           sw, CAST(0 AS BIGINT) AS fitted, CAST(0 AS BIGINT) AS s_t
    FROM seed
    UNION ALL
    SELECT d.n_name, d.t, d.y,
           (d.y - r.sw[1] + r.l + r.b) // 2 AS l,
           (((d.y - r.sw[1] + r.l + r.b) // 2) - r.l + 3 * r.b) // 4 AS b,
           list_concat(
               r.sw[2:{HW_WEEKS}],
               [(d.y - ((d.y - r.sw[1] + r.l + r.b) // 2)
                 + 3 * r.sw[1]) // 4]) AS sw,
           r.l + r.b + r.sw[1] AS fitted,
           (d.y - ((d.y - r.sw[1] + r.l + r.b) // 2) + 3 * r.sw[1]) // 4
               AS s_t
    FROM rec r JOIN dense d
      ON d.n_name = r.n_name AND d.t = r.t + 1
)
SELECT n_name, t, y AS y_centi, l AS level_centi, b AS trend_centi,
       s_t AS season_centi, fitted AS fitted_centi
FROM rec WHERE t >= {HW_WEEKS}
ORDER BY n_name, t
""", "grouped (per-nation) Holt-Winters, weekly grain, annual season")


# ------------------------------- per-nation HW forecast intervals
def orders_hw_band_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation one-step-ahead Holt-Winters FORECAST with residual-sd
    bands — the interval layer over orders_holt_winters_nation (ROADMAP
    r14 candidate surface): the point forecast for week T+1 is
    l_T + b_T + s_{T+1-52} (the level/trend at the last observed week
    plus the seasonal state set 52 weeks before the target), and the
    band is +-2 residual standard deviations, where the residuals are
    the in-sample one-step errors y_t - fitted_t for t >= 52.

    Exactness: residuals are exact centi integers from the fixed-point
    recursion, so the sd comes from exact integer sufficient statistics
    — n, sum(r) (int64), sum(r^2) accumulated in DECIMAL(38,0) /
    HUGEINT (r^2 alone can pass 2^63 at scale: weekly national revenue
    of ~1e9 centi gives r^2 ~ 1e18) — then ONE double conversion and
    the identical variance expression text on both engines, so the
    rounded sd and the integer band edges are bit-equal. max_by picks
    the last level/trend (t is unique per nation); the seasonal state
    for T+1 joins the emitted row at t = T-51, present whenever a
    nation spans >= 104 weeks (all fixtures; a shorter series emits
    null forecast/band on both engines alike).

    Scale shape: everything past the HW query itself is model-size —
    one aggregate over #nations x #weeks rows, one self-join on
    (nation, week)."""
    hw = orders_holt_winters_nation(spark, sf_dir)
    r = hw.select(
        "n_name", "t", "level_centi", "trend_centi",
        (F.col("y_centi") - F.col("fitted_centi")).alias("r"))
    stats = (r.groupBy("n_name")
             .agg(F.count(F.lit(1)).alias("n_resid"),
                  F.sum("r").alias("resid_sum_centi"),
                  F.sum(F.col("r").cast("decimal(19,0)")
                        * F.col("r").cast("decimal(19,0)"))
                  .cast("double").alias("s2"),
                  F.max("t").alias("tmax"),
                  F.max_by("level_centi", "t").alias("last_level"),
                  F.max_by("trend_centi", "t").alias("last_trend")))
    season = hw.select(F.col("n_name").alias("s_name"),
                       F.col("t").alias("s_t"),
                       F.col("season_centi").alias("s_next"))
    sd_raw = F.sqrt(
        (F.col("s2")
         - F.col("resid_sum_centi").cast("double")
         * F.col("resid_sum_centi") / F.col("n_resid"))
        / (F.col("n_resid") - 1))
    half = F.round(F.lit(2) * sd_raw).cast("long")
    fc = F.col("last_level") + F.col("last_trend") + F.col("s_next")
    return (stats
            .join(season, (F.col("n_name") == F.col("s_name"))
                  & (F.col("s_t") == F.col("tmax") - (HW_WEEKS - 1)),
                  "left")
            .select("n_name", "n_resid", "resid_sum_centi",
                    F.round(sd_raw, 4).alias("resid_sd_centi"),
                    fc.alias("forecast_centi"),
                    (fc - half).alias("band_lo_centi"),
                    (fc + half).alias("band_hi_centi"))
            .orderBy("n_name"))


register("orders_hw_band_nation", orders_hw_band_nation, f"""
WITH hw AS (SELECT * FROM ({{hw_sql}}) h0),
stats AS (
    SELECT n_name, COUNT(*) AS n_resid,
           CAST(SUM(y_centi - fitted_centi) AS BIGINT) AS resid_sum_centi,
           CAST(SUM(CAST(y_centi - fitted_centi AS HUGEINT)
                    * (y_centi - fitted_centi)) AS DOUBLE) AS s2,
           MAX(t) AS tmax,
           max_by(level_centi, t) AS last_level,
           max_by(trend_centi, t) AS last_trend
    FROM hw GROUP BY n_name
),
enriched AS (
    SELECT s.*, h.season_centi AS s_next,
           SQRT((s.s2 - CAST(s.resid_sum_centi AS DOUBLE)
                 * s.resid_sum_centi / s.n_resid)
                / (s.n_resid - 1)) AS sd_raw
    FROM stats s LEFT JOIN hw h
      ON h.n_name = s.n_name AND h.t = s.tmax - {HW_WEEKS - 1}
)
SELECT n_name, n_resid, resid_sum_centi,
       ROUND(sd_raw, 4) AS resid_sd_centi,
       last_level + last_trend + s_next AS forecast_centi,
       last_level + last_trend + s_next
           - CAST(ROUND(2 * sd_raw) AS BIGINT) AS band_lo_centi,
       last_level + last_trend + s_next
           + CAST(ROUND(2 * sd_raw) AS BIGINT) AS band_hi_centi
FROM enriched ORDER BY n_name
""".format(hw_sql=oracle_sql_of("orders_holt_winters_nation")),
    "per-nation HW one-step forecast with +-2 residual-sd bands")


# ------------------------------- per-nation HW vs naive skill score
def orders_hw_backtest_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample one-step backtest of the grouped Holt-Winters against
    the two standard reference forecasters, per nation: over the scored
    span (t >= 52) compare |y_t - fitted_t| with the naive (y_{t-1})
    and seasonal-naive (y_{t-52}) errors on the SAME dense weekly
    series (the shared _nation_weekly_dense frame, so the comparison is
    apples-to-apples by construction). hw_skill_ppm = HW error as ppm
    of the seasonal-naive error — the MASE-style "is the model worth
    running per market" read-off; < 1e6 means HW beats the seasonal
    benchmark for that nation. All error sums are exact centi integers
    (|err| ~ 1e8 x ~300 weeks << 2^63); the ratios are integer ppm/
    milli divisions, guarded for the zero-denominator corner so both
    engines emit the same NULL instead of one erroring.

    Scale shape: one fact reduce (shared), one lag window and one
    (nation, week) equi join on the model-size weekly frame, then a
    #nations-row aggregate."""
    dense = _nation_weekly_dense(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy("t")
    preds = dense.select(
        "n_name", "t", "y",
        F.lag("y", 1).over(w).alias("p_naive"),
        F.lag("y", HW_WEEKS).over(w).alias("p_snaive"))
    fitted = orders_holt_winters_nation(spark, sf_dir).select(
        F.col("n_name").alias("h_name"), F.col("t").alias("h_t"),
        "fitted_centi")
    j = preds.join(fitted, (F.col("n_name") == F.col("h_name"))
                   & (F.col("t") == F.col("h_t")))
    agg = j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum(F.abs(F.col("y") - F.col("fitted_centi"))).alias("hw_err"),
        F.sum(F.abs(F.col("y") - F.col("p_naive"))).alias("naive_err"),
        F.sum(F.abs(F.col("y") - F.col("p_snaive"))).alias("snaive_err"))
    return (agg.select(
        "n_name", "n_weeks",
        F.expr("hw_err * 1000 div n_weeks").alias("hw_mae_milli"),
        F.expr("naive_err * 1000 div n_weeks").alias("naive_mae_milli"),
        F.expr("snaive_err * 1000 div n_weeks").alias("snaive_mae_milli"),
        F.expr("case when snaive_err = 0 then null"
               " else hw_err * 1000000 div snaive_err end")
        .alias("hw_skill_ppm"))
        .orderBy("n_name"))


register("orders_hw_backtest_nation", orders_hw_backtest_nation, f"""
WITH hw AS (SELECT * FROM ({{hw_sql}}) h0),
weekly AS (
    SELECT n.n_name,
           (CAST(o.o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS wk,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS c
    FROM orders o
    JOIN customer cu ON o.o_custkey = cu.c_custkey
    JOIN nation n ON cu.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
), bounds AS (
    SELECT n_name, MIN(wk) AS w0, MAX(wk) AS w1 FROM weekly GROUP BY 1
), spine AS (
    SELECT b.n_name, b.w0, UNNEST(range(b.w0, b.w1 + 1)) AS wk
    FROM bounds b
), dense AS (
    SELECT s.n_name, s.wk - s.w0 AS t, COALESCE(w.c, 0) AS y
    FROM spine s LEFT JOIN weekly w
      ON s.n_name = w.n_name AND s.wk = w.wk
), preds AS (
    SELECT n_name, t, y,
           LAG(y, 1) OVER (PARTITION BY n_name ORDER BY t) AS p_naive,
           LAG(y, {HW_WEEKS}) OVER (PARTITION BY n_name ORDER BY t)
               AS p_snaive
    FROM dense
), agg AS (
    SELECT p.n_name, COUNT(*) AS n_weeks,
           CAST(SUM(ABS(p.y - h.fitted_centi)) AS BIGINT) AS hw_err,
           CAST(SUM(ABS(p.y - p.p_naive)) AS BIGINT) AS naive_err,
           CAST(SUM(ABS(p.y - p.p_snaive)) AS BIGINT) AS snaive_err
    FROM preds p JOIN hw h ON p.n_name = h.n_name AND p.t = h.t
    GROUP BY p.n_name
)
SELECT n_name, n_weeks,
       CAST(hw_err * 1000 // n_weeks AS BIGINT) AS hw_mae_milli,
       CAST(naive_err * 1000 // n_weeks AS BIGINT) AS naive_mae_milli,
       CAST(snaive_err * 1000 // n_weeks AS BIGINT) AS snaive_mae_milli,
       CASE WHEN snaive_err = 0 THEN NULL
            ELSE CAST(hw_err * 1000000 // snaive_err AS BIGINT) END
           AS hw_skill_ppm
FROM agg ORDER BY n_name
""".format(hw_sql=oracle_sql_of("orders_holt_winters_nation")),
    "per-nation HW vs naive/seasonal-naive one-step backtest (MASE-style)")


# ---------------------------------------------- SAX symbolic series
from .monitor_eval import _ha_sql as _sax_ha  # noqa: E402

SAX_W = 8                    # PAA windows per series
SAX_BP_MICRO = 674_500       # N(0,1) quartile breakpoint, micro units


def events_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (symbolic aggregate approximation) of each event type's
    daily-count series: the zero-filled day spine folds into SAX_W
    PAA windows, each window's mean z-scores against the type's own
    day-level mean/sd, and quartile breakpoints of N(0,1) map z to a
    4-letter alphabet — the standard discretization behind motif
    mining and whole-series indexing. All inputs to the one
    float expression are exact integers (window sums, day counts,
    moment sums), the z quantizes to micro units with shared
    half-away rounding, and breakpoint compares are integer — so the
    symbol strings are bit-identical cross-engine. Everything after
    the per-(type, day) count is bounded-spine cardinality."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    cnt = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    rng = ev.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    types = ev.select("event_type").distinct()
    spine = (types.crossJoin(F.broadcast(rng))
             .select("event_type", "dmin", "dmax",
                     F.explode(F.expr("sequence(dmin, dmax)")).alias("d")))
    filled = (spine.join(cnt, ["event_type", "d"], "left")
              .select("event_type", "dmin", "dmax", "d",
                      F.coalesce("c", F.lit(0)).alias("c")))
    stats = filled.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.sum(F.expr("c * c")).alias("ss"),
        F.count(F.lit(1)).alias("n"))
    paa = (filled
           .withColumn("w", F.expr(
               f"(d - dmin) * {SAX_W} div (dmax - dmin + 1)"))
           .groupBy("event_type", "w")
           .agg(F.sum("c").alias("pn"), F.count(F.lit(1)).alias("pd")))
    var_num = "n * ss - s * s"
    z_micro = _sax_ha(
        f"case when ({var_num}) <= 0 then 0.0 else"
        " ((pn * n - s * pd) / (cast(pd as double) * n))"
        f" / sqrt(({var_num}) / (n * (n - 1.0))) * 1e6 end")
    sym = (f"case when z_micro < -{SAX_BP_MICRO} then 'a'"
           " when z_micro < 0 then 'b'"
           f" when z_micro < {SAX_BP_MICRO} then 'c' else 'd' end")
    symbols = (paa.join(stats, "event_type")
               .withColumn("z_micro", F.expr(z_micro))
               .withColumn("sym", F.expr(sym)))
    return (symbols.groupBy("event_type")
            .agg(F.expr("concat_ws('', transform(sort_array("
                        "collect_list(struct(w, sym))), x -> x.sym))")
                 .alias("sax_word"),
                 F.max("n").alias("n_days"),
                 F.sum(F.expr("cast(sym = 'a' as int)")).alias("n_a"),
                 F.sum(F.expr("cast(sym = 'b' as int)")).alias("n_b"),
                 F.sum(F.expr("cast(sym = 'c' as int)")).alias("n_c"),
                 F.sum(F.expr("cast(sym = 'd' as int)")).alias("n_d"))
            .orderBy("event_type"))


register("events_sax_symbolic", events_sax_symbolic, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), cnt AS (
    SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY 1, 2
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
types AS (SELECT DISTINCT event_type FROM ev),
spine AS (
    SELECT event_type, dmin, dmax, UNNEST(range(dmin, dmax + 1)) AS d
    FROM types CROSS JOIN rng
), filled AS (
    SELECT s.event_type, s.dmin, s.dmax, s.d,
           COALESCE(c.c, 0) AS c
    FROM spine s LEFT JOIN cnt c USING (event_type, d)
), stats AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS ss,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM filled GROUP BY 1
), paa AS (
    SELECT event_type, (d - dmin) * {SAX_W} // (dmax - dmin + 1) AS w,
           CAST(SUM(c) AS BIGINT) AS pn, CAST(COUNT(*) AS BIGINT) AS pd
    FROM filled GROUP BY 1, 2
), symbols AS (
    SELECT p.event_type, p.w,
           {_sax_ha(
               "CASE WHEN (n * ss - s * s) <= 0 THEN 0.0 ELSE"
               " ((pn * n - s * pd) / (CAST(pd AS DOUBLE) * n))"
               " / sqrt((n * ss - s * s) / (n * (n - 1.0))) * 1e6 END"
           )} AS z_micro,
           st.n
    FROM paa p JOIN stats st USING (event_type)
), lettered AS (
    SELECT event_type, w, n,
           CASE WHEN z_micro < -{SAX_BP_MICRO} THEN 'a'
                WHEN z_micro < 0 THEN 'b'
                WHEN z_micro < {SAX_BP_MICRO} THEN 'c'
                ELSE 'd' END AS sym
    FROM symbols
)
SELECT event_type,
       STRING_AGG(sym, '' ORDER BY w) AS sax_word,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(SUM(CASE WHEN sym = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       CAST(SUM(CASE WHEN sym = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       CAST(SUM(CASE WHEN sym = 'c' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       CAST(SUM(CASE WHEN sym = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_d
FROM lettered GROUP BY event_type ORDER BY event_type
""", "SAX symbolic aggregate approximation of daily series per type")


# ------------------------------------------- rolling-origin backtest
BT_ORIGINS = 12   # backtest the trailing year
BT_SEASON = 12    # seasonal-naive lag (months)


def orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest over the monthly order-count
    series: for each of the trailing BT_ORIGINS months, score the
    naive (last value) and seasonal-naive (same month last year)
    forecasters, reporting MAE (milli-units) and MASE — the scaled
    error whose denominator is the in-sample seasonal-naive MAE over
    the pre-backtest training span, the standard way to compare
    forecasters across series scales. Counts and errors are exact
    integers end to end (MASE is a ppm ratio of integer sums), and
    everything beyond the one per-month count runs on the bounded
    month spine."""
    m = (load_table(spark, sf_dir, "orders")
         .select((F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                 .alias("mi"))
         .groupBy("mi").agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("mi")
    lagged = (m.withColumn("p_naive", F.lag("c", 1).over(w))
              .withColumn("p_snaive", F.lag("c", BT_SEASON).over(w)))
    rng = lagged.agg(F.max("mi").alias("mx"))
    base = lagged.crossJoin(F.broadcast(rng))
    den = (base.filter(F.expr(
        f"mi <= mx - {BT_ORIGINS} and p_snaive is not null"))
        .agg(F.sum(F.expr("abs(c - p_snaive)")).alias("den_sum"),
             F.count(F.lit(1)).alias("den_n")))
    orig = base.filter(F.expr(f"mi > mx - {BT_ORIGINS}"))
    out = None
    for model, pred in (("naive", "p_naive"),
                        ("seasonal_naive", "p_snaive")):
        part = (orig.agg(
            F.sum(F.expr(f"abs(c - {pred})")).alias("err_sum"),
            F.count(F.lit(1)).alias("n_orig"))
            .crossJoin(F.broadcast(den))
            .select(F.lit(model).alias("model"), "n_orig", "err_sum",
                    F.expr("err_sum * 1000 div n_orig").alias("mae_milli"),
                    F.expr("err_sum * den_n * 1000000"
                           " div (n_orig * den_sum)").alias("mase_ppm")))
        out = part if out is None else out.unionByName(part)
    return out.orderBy("model")


register("orders_forecast_backtest", orders_forecast_backtest, f"""
WITH m AS (
    SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
), lagged AS (
    SELECT mi, c,
           LAG(c, 1) OVER (ORDER BY mi) AS p_naive,
           LAG(c, {BT_SEASON}) OVER (ORDER BY mi) AS p_snaive
    FROM m
), rng AS (SELECT MAX(mi) AS mx FROM lagged),
den AS (
    SELECT CAST(SUM(ABS(c - p_snaive)) AS BIGINT) AS den_sum,
           CAST(COUNT(*) AS BIGINT) AS den_n
    FROM lagged CROSS JOIN rng
    WHERE mi <= mx - {BT_ORIGINS} AND p_snaive IS NOT NULL
), orig AS (
    SELECT * FROM lagged CROSS JOIN rng WHERE mi > mx - {BT_ORIGINS}
), scored AS (
    SELECT 'naive' AS model,
           CAST(COUNT(*) AS BIGINT) AS n_orig,
           CAST(SUM(ABS(c - p_naive)) AS BIGINT) AS err_sum
    FROM orig
    UNION ALL
    SELECT 'seasonal_naive' AS model,
           CAST(COUNT(*) AS BIGINT) AS n_orig,
           CAST(SUM(ABS(c - p_snaive)) AS BIGINT) AS err_sum
    FROM orig
)
SELECT model, n_orig, err_sum,
       CAST(err_sum * 1000 // n_orig AS BIGINT) AS mae_milli,
       CAST(err_sum * den_n * 1000000 // (n_orig * den_sum) AS BIGINT)
           AS mase_ppm
FROM scored CROSS JOIN den ORDER BY model
""", "rolling-origin naive/seasonal-naive backtest: MAE + MASE ppm")


# ---------------------------------------------- Bass diffusion fit
from .stat_tests import (  # noqa: E402
    _OLS_B0 as _BASS_B0, _OLS_B1 as _BASS_B1, _OLS_B2 as _BASS_B2,
    _OLS_SSR as _BASS_SSR, _OLS_SST as _BASS_SST)


def users_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Bass diffusion fit over user adoption: regress daily
    new-adopter counts on (1, N(t-1), N(t-1)^2) by EXACT integer
    normal equations (the lineitem_price_ols Cramer machinery — sums
    accumulate DECIMAL(38)/HUGEINT because N^4 leaves int64 fast) and
    report both the raw coefficients and the implied innovation /
    imitation / market-size parameters (a = pM, b = q - p, c = -q/M,
    so M is the positive root of cM^2 + bM + a). The fact table
    reduces once to per-user first-activity day; everything after is
    day-spine cardinality. Implied parameters are half-away-quantized
    doubles over exact integer determinant ratios — deterministic
    cross-engine; degenerate fits (c >= 0 or negative discriminant)
    yield NULL implied columns on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_ns div {DAY_NS}").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("fd"))
    rng = ev.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    adopts = first.groupBy("fd").agg(F.count(F.lit(1)).alias("y"))
    spine = (rng.select(F.explode(
        F.expr("sequence(dmin, dmax)")).alias("d")))
    daily = (spine.join(adopts, spine.d == adopts.fd, "left")
             .select("d", F.coalesce("y", F.lit(0)).alias("y")))
    w = Window.orderBy("d")
    pts = (daily
           .withColumn("cum", F.sum("y").over(w))
           .withColumn("nprev", F.coalesce(
               F.lag("cum").over(w), F.lit(0)))
           .select(F.col("y").cast("decimal(38,0)").alias("yy"),
                   F.col("nprev").cast("decimal(38,0)").alias("x1")))
    suff = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum(F.expr("x1 * x1")).alias("s2"),
        F.sum(F.expr("x1 * x1")).alias("s11"),
        F.sum(F.expr("x1 * x1 * x1")).alias("s12"),
        F.sum(F.expr("x1 * x1 * x1 * x1")).alias("s22"),
        F.sum("yy").alias("sy"),
        F.sum(F.expr("x1 * yy")).alias("s1y"),
        F.sum(F.expr("x1 * x1 * yy")).alias("s2y"),
        F.sum(F.expr("yy * yy")).alias("syy"))
    ha = _sax_ha
    det_ok = ("(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
              " + s2*(s1*s12 - s11*s2)) != 0")

    # Layer the Cramer ratios / root through NAMED columns instead of
    # textual macro expansion: the one-row projection is value-identical
    # (same IEEE ops in the same order — the oracle below still spells
    # the macros textually and hash-matches), but the flat form expanded
    # each B-ratio dozens of times (ha() alone triples its argument) and
    # blew janino's 64 KB method limit, kicking the projection to
    # interpreted fallback. Catalyst's CollapseProject keeps the layers:
    # it refuses to re-inline non-cheap aliases referenced repeatedly.
    layered = suff.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(det_ok).alias("det_ok"),
        F.expr(_BASS_B0).alias("b0"),
        F.expr(_BASS_B1).alias("b1"),
        F.expr(_BASS_B2).alias("b2"),
        F.expr(f"{_BASS_SSR} / {_BASS_SST}").alias("rr"))
    m_expr = ("case when b2 < 0 and b1*b1 - 4.0*b2*b0 >= 0"
              " then (-b1 - sqrt(b1*b1 - 4.0*b2*b0)) / (2.0*b2) end")
    withm = layered.select("*", F.expr(m_expr).alias("m"))

    def _g(expr):
        return f"case when det_ok then {expr} end"

    return (withm.select(
        "n_days",
        F.expr(_g(ha("b0 * 1e3"))).alias("a_milli"),
        F.expr(_g(ha("b1 * 1e6"))).alias("b_micro"),
        F.expr(_g(ha("b2 * 1e9"))).alias("c_nano"),
        F.expr(_g(f"case when m is not null then {ha('(m)')} end"))
        .alias("m_hat"),
        F.expr(_g(f"case when m is not null and m > 0"
                  f" then {ha('b0 / (m) * 1e6')} end")).alias("p_micro"),
        F.expr(_g(f"case when m is not null then"
                  f" {ha('-b2 * (m) * 1e6')} end")).alias("q_micro"),
        F.expr(_g("round(rr, 6) + 0.0")).alias("r2")))


def _bass_oracle() -> str:
    det_ok = ("(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
              " + s2*(s1*s12 - s11*s2)) != 0")
    m_expr = (f"CASE WHEN {_BASS_B2} < 0 AND"
              f" {_BASS_B1}*{_BASS_B1} - 4.0*{_BASS_B2}*{_BASS_B0} >= 0"
              f" THEN (-{_BASS_B1} - sqrt({_BASS_B1}*{_BASS_B1}"
              f" - 4.0*{_BASS_B2}*{_BASS_B0})) / (2.0*{_BASS_B2}) END")
    ha = _sax_ha
    return f"""
WITH ev AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d
    FROM events
), first_d AS (
    SELECT user_id, MIN(d) AS fd FROM ev GROUP BY user_id
), rng AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM ev),
spine AS (
    SELECT UNNEST(range(dmin, dmax + 1)) AS d FROM rng
), adopts AS (
    SELECT fd, CAST(COUNT(*) AS BIGINT) AS y FROM first_d GROUP BY fd
), daily AS (
    SELECT s.d, COALESCE(a.y, 0) AS y
    FROM spine s LEFT JOIN adopts a ON s.d = a.fd
), pts AS (
    SELECT CAST(y AS HUGEINT) AS yy,
           CAST(COALESCE(SUM(y) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS HUGEINT) AS x1
    FROM daily
), suff AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n,
           SUM(x1) AS s1, SUM(x1*x1) AS s2,
           SUM(x1*x1) AS s11, SUM(x1*x1*x1) AS s12,
           SUM(x1*x1*x1*x1) AS s22,
           SUM(yy) AS sy, SUM(x1*yy) AS s1y, SUM(x1*x1*yy) AS s2y,
           SUM(yy*yy) AS syy
    FROM pts
)
SELECT CAST(n AS BIGINT) AS n_days,
       CASE WHEN {det_ok} THEN {ha(f"{_BASS_B0} * 1e3")} END AS a_milli,
       CASE WHEN {det_ok} THEN {ha(f"{_BASS_B1} * 1e6")} END AS b_micro,
       CASE WHEN {det_ok} THEN {ha(f"{_BASS_B2} * 1e9")} END AS c_nano,
       CASE WHEN {det_ok} AND ({m_expr}) IS NOT NULL THEN
            {ha(f"({m_expr})")} END AS m_hat,
       CASE WHEN {det_ok} AND ({m_expr}) IS NOT NULL
            AND ({m_expr}) > 0 THEN
            {ha(f"{_BASS_B0} / ({m_expr}) * 1e6")} END AS p_micro,
       CASE WHEN {det_ok} AND ({m_expr}) IS NOT NULL THEN
            {ha(f"-{_BASS_B2} * ({m_expr}) * 1e6")} END AS q_micro,
       CASE WHEN {det_ok}
            THEN ROUND({_BASS_SSR} / {_BASS_SST}, 6) + 0.0 END AS r2
FROM suff
"""


register("users_bass_diffusion", users_bass_diffusion, _bass_oracle(),
         "discrete Bass diffusion fit via exact integer normal equations")
