"""Product-analytics and timeseries operators over the ``events``
table: cumulative distinct users, cohort retention, funnel conversion,
gap-fill, and time-weighted averaging.

These are the classic "analytics engine" shapes (think growth
dashboards and timeseries stores) whose naive forms do NOT scale — a
running COUNT(DISTINCT) is quadratic, retention is a self-join,
funnels are per-user sequence scans, calendars get built driver-side.
Each query here is the *decomposed* form that survives 100 TB:

- cumulative distinct = first-touch reduction (one shuffle on user_id)
  + model-size running sum over #days rows;
- retention = bounded per-(user, week) distinct + one user-keyed join;
- funnel = staged min-timestamp joins, never a per-user event sort;
- gap-fill = executor-side spine (sequence+explode) + one LOCF window;
- time-weighted avg = lead() segments + per-series agg, integer-µs
  weights.

Reference has no analytics surface (SURVEY.md §1.3 — batch econometrics
only); this is extension surface per §7/M6, same ``events`` fixture the
streaming twins use. All time arithmetic is integer epoch-day/µs on
both engines, so hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..quantum import HOUR_NS, VALUE_MICRO
from ..registry import register
from ..sources import load_table

EPOCH0 = "2024-01-01"  # testdata events start here; week index anchor


def _with_day(ev: DataFrame) -> DataFrame:
    return ev.withColumn("day", F.to_date("ts"))


# ------------------------------------------------- cumulative distinct
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: new users (first ever seen that day) and the running
    total of distinct users to date.

    Scale shape: a naive ``COUNT(DISTINCT user) WHERE ts <= d`` per day
    rescans the corpus per day (quadratic). Decomposition: cumulative
    distinct count == running sum of first-touch counts, so one
    user-keyed shuffle reduces 100 TB of events to one row per user,
    a day-keyed agg reduces that to #days rows, and only the #days-row
    frame (model-size: bounded by calendar, not corpus) crosses the
    single-partition running-sum window.
    """
    ev = _with_day(load_table(spark, sf_dir, "events"))
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


register("events_cumulative_users", events_cumulative_users, """
WITH first_seen AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), per_day AS (
    SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_users
FROM per_day
""", "daily new + cumulative distinct users via first-touch decomposition")


# --------------------------------------------------- cohort retention
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen week
    (cohort), counted distinct in each later week, reported as the
    offset from their cohort week.

    Scale shape: activity is first reduced to distinct (user, week)
    pairs — bounded by users × #weeks, far smaller than the event
    corpus — then one user-keyed join attaches the cohort week (itself
    a one-row-per-user reduction), and the final agg groups by
    (cohort_week, offset): #weeks² cells. No self-join of events
    against events at any point. Weeks are explicit integer floor
    division (epoch-day div 7) on both engines — DuckDB's
    CAST(double AS INT) rounds where Spark's truncates, so a bare
    /7-then-cast puts boundary days in different weeks.
    """
    ev = _with_day(load_table(spark, sf_dir, "events"))
    wk = ev.select(
        "user_id",
        F.expr(f"CAST(datediff(day, DATE '{EPOCH0}') div 7 AS INT)")
        .alias("week"))
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = wk.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week",
                 (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


register("events_cohort_retention", events_cohort_retention, f"""
WITH wk AS (
    SELECT user_id,
           CAST(DATEDIFF('day', DATE '{EPOCH0}', CAST(ts AS DATE)) // 7
                AS INTEGER) AS week
    FROM events
), cohort AS (
    SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, week FROM wk
)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY c.cohort_week, week_offset
""", "weekly cohort retention counts (distinct-pair reduce + one join)")


# ------------------------------------------------------ funnel stages
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase conversion funnel: users with a
    view, users with a click at-or-after their first view, users with a
    purchase at-or-after that click.

    Scale shape: each stage is a filtered min-timestamp aggregate
    (one row per surviving user) joined to the next stage's filtered
    events on user_id — per-stage state is one timestamp per user, and
    no stage ever sorts a user's full event history. The three 1-row
    stage counts combine by cross join (3 model-size frames).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us"))
    viewed = (ev.filter(F.col("event_type") == "view")
              .groupBy("user_id").agg(F.min("ts_us").alias("view_us")))
    clicked = (
        ev.filter(F.col("event_type") == "click")
        .join(viewed, "user_id")
        .filter(F.col("ts_us") >= F.col("view_us"))
        .groupBy("user_id").agg(F.min("ts_us").alias("click_us")))
    purchased = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicked, "user_id")
        .filter(F.col("ts_us") >= F.col("click_us"))
        .groupBy("user_id").agg(F.min("ts_us").alias("purchase_us")))
    return (
        viewed.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(clicked.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(purchased.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


# -------------------------------------------------- gap-fill + LOCF
def gapfill_from_hourly(hourly: DataFrame) -> DataFrame:
    """Dense-spine LOCF from a per-(type, hour) frame carrying the
    event count ``cnt`` and the micro-quantized value sum ``s`` (sum of
    floor(value * 10000) per event). Shared verbatim by the batch query
    below and the streaming twin (``streaming/gapfill.py``), so the
    streamed fill is bit-equal to batch by construction — the
    *_from_hourly fleet seam (r12 pattern)."""
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(F.col("event_type").alias("event_type"),
                F.explode(F.sequence("h0", "h1")).alias("hr")))
    w = (Window.partitionBy("event_type").orderBy("hr")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        spine.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type", "hr",
            F.coalesce("cnt", F.lit(0).cast("long")).alias("n_events"),
            (F.last("s", ignorenulls=True).over(w) / float(VALUE_MICRO))
            .alias("sum_value_locf"),
            F.col("cnt").isNull().cast("int").alias("is_gap"),
        )
    )


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup per event_type on a *dense* hour spine: hours with
    no events appear with n_events=0 and the last observed hourly sum
    carried forward (LOCF) — the timeseries-store "gap fill" shape.

    Scale shape: observations first reduce to one row per (series,
    hour) — corpus-independent after the rollup — and the spine is
    generated distributively (sequence + explode per series, never a
    driver-side calendar). The LOCF window shuffles once on the series
    key; a single pathologically-hot series would need the
    range-chunked two-pass used by q_global_rank, noted here but not
    warranted: spine cardinality is #series × #hours, bounded by
    calendar time. The spine starts at each series' first observed
    hour, so no partition has leading nulls and the fill is total.

    Hourly value sums are EXACT fixed-point integers (sum of
    floor(value * 10000) per event — one IEEE multiply + floor each,
    identical on both engines; integer addition is associative), then a
    single division converts the carried value back to a double. This
    is what lets the streaming twin accumulate the same sum over ANY
    chunking of the input (r13: the value-weighted hourly state) —
    a float running sum would be arrival-order-dependent.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
                  F.floor(F.col("value") * VALUE_MICRO).cast("long")
                  .alias("m"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("m").alias("s")))
    return gapfill_from_hourly(hourly)


register("events_gapfill_locf", events_gapfill_locf, f"""
WITH obs AS (
    SELECT event_type, epoch_us(ts) // {HOUR_NS // 1000} AS hr,
           COUNT(*) AS n_obs,
           CAST(SUM(CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT)) AS BIGINT)
               AS s
    FROM events GROUP BY event_type, hr
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM obs
    GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
)
SELECT s.event_type, s.hr,
       COALESCE(o.n_obs, 0) AS n_events,
       LAST_VALUE(o.s IGNORE NULLS)
           OVER (PARTITION BY s.event_type ORDER BY s.hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / {VALUE_MICRO}.0
           AS sum_value_locf,
       CAST(o.hr IS NULL AS INTEGER) AS is_gap
FROM spine s LEFT JOIN obs o ON s.event_type = o.event_type AND s.hr = o.hr
""", "dense hourly spine per series with LOCF fill (timeseries gap-fill)")


register("events_funnel", events_funnel, """
WITH viewed AS (
    SELECT user_id, MIN(epoch_us(ts)) AS view_us FROM events
    WHERE event_type = 'view' GROUP BY user_id
), clicked AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
    FROM events e JOIN viewed v USING (user_id)
    WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.view_us
    GROUP BY e.user_id
), purchased AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
    FROM events e JOIN clicked c USING (user_id)
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.click_us
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM viewed) AS n_viewed,
       (SELECT COUNT(*) FROM clicked) AS n_clicked,
       (SELECT COUNT(*) FROM purchased) AS n_purchased
""", "view->click->purchase funnel via staged min-timestamp joins")


# ------------------------------------------- time-weighted average
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per event_type over irregular
    samples (LOCF segments): each observation holds until the next one,
    so its weight is the microseconds until the series' next event —
    the timeseries-store `time_weight` shape, where a plain AVG
    over-counts bursts and under-counts sparse-but-long-held values.

    Scale shape: one shuffle on the series key for the lead() window,
    then a per-series agg; weights are integer microseconds end-to-end
    so only the final division is floating point. The last observation
    of each series has no segment and drops out (open-ended holds have
    no duration). A single hot series would partition by (series,
    time-bucket) with per-bucket partial sums instead — same
    note as events_anomaly_zscore.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    seg = ev.withColumn("w_us", F.lead("ts_us").over(w) - F.col("ts_us"))
    return (
        seg.filter(F.col("w_us").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.sum(F.col("value") * F.col("w_us"))
                     / F.sum("w_us"), 6).alias("twa_value"),
             F.count(F.lit(1)).alias("n_segments"))
        .orderBy("event_type")
    )


register("events_time_weighted_avg", events_time_weighted_avg, """
WITH seg AS (
    SELECT event_type, value,
           LEAD(epoch_us(ts)) OVER (PARTITION BY event_type
                                    ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS w_us
    FROM events
)
SELECT event_type,
       ROUND(SUM(value * w_us) / SUM(w_us), 6) AS twa_value,
       COUNT(*) AS n_segments
FROM seg WHERE w_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
""", "time-weighted average per series (LOCF-segment weights)")


# --------------------------------------------- rolling active users
WAU_DAYS = 7


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: distinct users active in the trailing 7 days (WAU) —
    the rolling-distinct growth metric a sliding COUNT(DISTINCT)
    window cannot express (distinct doesn't decompose over frames).

    Scale shape: the corpus reduces once to distinct (user, day) pairs
    — bounded by users × days — then each pair fans out to the 7
    as-of days it keeps the user active for (a ×7 expansion of the
    REDUCED frame, never of the corpus), a second distinct collapses
    overlaps, and the count per as-of day is a tiny-key agg. Day
    arithmetic stays integer epoch-days end-to-end; the trailing
    window is clipped to the observed span via a 1-row max cross join
    (no driver-side calendar, no single-partition window anywhere).
    Early days report their partial trailing window, matching the
    usual dashboard convention.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("d"))
    ud = ev.distinct()
    mx = ud.agg(F.max("d").alias("mxd"))
    expanded = (
        ud.select("user_id",
                  F.explode(F.expr(f"sequence(d, d + {WAU_DAYS - 1})"))
                  .alias("day_idx"))
        .distinct()
    )
    return (
        expanded.crossJoin(mx)
        .filter(F.col("day_idx") <= F.col("mxd"))
        .groupBy("day_idx")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


register("events_rolling_active_users", events_rolling_active_users, f"""
WITH ud AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
), mx AS (
    SELECT MAX(d) AS mxd FROM ud
), expanded AS (
    SELECT DISTINCT user_id, d + off.o AS day_idx
    FROM ud CROSS JOIN (SELECT unnest(range(0, {WAU_DAYS})) AS o) off
)
SELECT day_idx, COUNT(*) AS wau
FROM expanded, mx
WHERE day_idx <= mxd
GROUP BY day_idx
""", "trailing-7-day distinct active users (reduced-frame fan-out)")


# ---------------------------------------- time-bounded funnel
FUNNEL_MAX_DELAY_US = 24 * 3600 * 1_000_000  # conversion window: 24h


def events_funnel_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_funnel with a CONVERSION WINDOW: a click only counts
    within 24h of the user's first view, a purchase within 24h of that
    click — the form every product-analytics funnel actually ships
    (unbounded funnels over-credit; see events_funnel for the baseline).
    Same scale shape as the unbounded twin — per-stage state is ONE
    timestamp per user, stages chain by user-keyed joins with an extra
    integer-µs upper bound, and no per-user event sort ever happens."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us"))
    viewed = (ev.filter(F.col("event_type") == "view")
              .groupBy("user_id").agg(F.min("ts_us").alias("view_us")))
    clicked = (
        ev.filter(F.col("event_type") == "click")
        .join(viewed, "user_id")
        .filter((F.col("ts_us") >= F.col("view_us"))
                & (F.col("ts_us") <= F.col("view_us") + FUNNEL_MAX_DELAY_US))
        .groupBy("user_id").agg(F.min("ts_us").alias("click_us")))
    purchased = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicked, "user_id")
        .filter((F.col("ts_us") >= F.col("click_us"))
                & (F.col("ts_us") <= F.col("click_us") + FUNNEL_MAX_DELAY_US))
        .groupBy("user_id").agg(F.min("ts_us").alias("purchase_us")))
    return (
        viewed.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(clicked.agg(F.count(F.lit(1)).alias("n_clicked_24h")))
        .crossJoin(purchased.agg(F.count(F.lit(1)).alias("n_purchased_24h")))
    )


register("events_funnel_bounded", events_funnel_bounded, f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), viewed AS (
    SELECT user_id, MIN(ts_us) AS view_us FROM ev
    WHERE event_type = 'view' GROUP BY user_id
), clicked AS (
    SELECT e.user_id, MIN(e.ts_us) AS click_us
    FROM ev e JOIN viewed v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts_us >= v.view_us
      AND e.ts_us <= v.view_us + {FUNNEL_MAX_DELAY_US}
    GROUP BY e.user_id
), purchased AS (
    SELECT e.user_id, MIN(e.ts_us) AS purchase_us
    FROM ev e JOIN clicked c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts_us >= c.click_us
      AND e.ts_us <= c.click_us + {FUNNEL_MAX_DELAY_US}
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM viewed) AS n_viewed,
       (SELECT COUNT(*) FROM clicked) AS n_clicked_24h,
       (SELECT COUNT(*) FROM purchased) AS n_purchased_24h
""", "conversion funnel with a 24h per-stage conversion window")


# --------------------------------------------------- ABC inventory classes
from .monitor_eval import _ha_sql as _abc_ha  # noqa: E402

ABC_BINS = 4096  # equi-width revenue histogram cells (model-size)


def part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts (A ~ first 80% of revenue,
    B ~ next 15%, C ~ tail) WITHOUT any total order over the part
    aggregate — the customer_pareto cutpoint mechanism applied to
    revenue-cumulative (not count-cumulative) boundaries: per-part
    cents revenue buckets into a broadcast ABC_BINS-cell equi-width
    histogram (bin 0 = richest), the PREVIOUS cumulative revenue of
    richer bins assigns each BIN its class by exact integer
    cross-multiplication (cprev*5 < 4*total -> A; cprev*20 <
    19*total -> B; else C), and a bin never splits — the documented
    bucket-granularity quantization that keeps both engines
    bit-identical with no interpolated cutpoints. One fact shuffle to
    per-part revenue; every later frame is histogram-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.floor(F.col("l_extendedprice") * 100)
        .cast("long").alias("cents"))
    per_part = li.groupBy("l_partkey").agg(F.sum("cents").alias("rev"))
    rng = per_part.agg(F.min("rev").alias("mn"), F.max("rev").alias("mx"),
                       F.sum("rev").alias("total"))
    binned = (per_part.crossJoin(F.broadcast(rng))
              .withColumn("bin", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(ABC_BINS - 1),
                          F.expr(f"((mx - rev) * {ABC_BINS})"
                                 f" div (mx - mn + 1)")))))
    hist = binned.groupBy("bin").agg(F.sum("rev").alias("brev"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    classed = (hist.withColumn(
        "cprev", F.coalesce(F.sum("brev").over(wb), F.lit(0)))
        .crossJoin(F.broadcast(rng.select("total")))
        .select("bin", F.expr(
            "case when cprev * 5 < 4 * total then 'A'"
            " when cprev * 20 < 19 * total then 'B'"
            " else 'C' end").alias("abc_class")))
    return (binned.join(F.broadcast(classed), "bin")
            .groupBy("abc_class")
            .agg(F.count(F.lit(1)).alias("n_parts"),
                 F.sum("rev").alias("revenue_cents"),
                 F.expr("sum(rev) * 1000000 div first(total)")
                 .alias("share_ppm"))
            .orderBy("abc_class"))


register("part_abc_classes", part_abc_classes, f"""
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS rev
    FROM lineitem GROUP BY 1
), rng AS (
    SELECT MIN(rev) AS mn, MAX(rev) AS mx, SUM(rev) AS total
    FROM per_part
), binned AS (
    SELECT rev, total,
           CASE WHEN mx = mn THEN 0
                ELSE LEAST({ABC_BINS - 1},
                           ((mx - rev) * {ABC_BINS}) // (mx - mn + 1))
           END AS bin
    FROM per_part CROSS JOIN rng
), hist AS (
    SELECT bin, SUM(rev) AS brev FROM binned GROUP BY bin
), classed AS (
    SELECT bin,
           CASE WHEN COALESCE(SUM(brev) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 5 < 4 * r.total THEN 'A'
                WHEN COALESCE(SUM(brev) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 20 < 19 * r.total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM hist CROSS JOIN (SELECT total FROM rng) r
)
SELECT c.abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(b.rev) AS BIGINT) AS revenue_cents,
       CAST(SUM(b.rev) * 1000000 // ANY_VALUE(b.total) AS BIGINT)
           AS share_ppm
FROM binned b JOIN classed c USING (bin)
GROUP BY c.abc_class ORDER BY c.abc_class
""", "ABC revenue classes via integer histogram cutpoints (no total order)")


# --------------------------------------------------- Balassa RCA matrix
def supplier_balassa_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa revealed-comparative-advantage matrix of supplier
    nations over part types: RCA(n, t) = (x_nt/X_n)/(X_t/X) — which
    nation is DISPROPORTIONATELY good at which product line, the
    trade-economics view of the supplier base. Revenue cells are
    exact integer cents off one fact scan through the broadcast
    supplier->nation and part->type dims; the nation/type margins are
    model-size re-aggregations of the 25x6 cell frame. RCA evaluates
    as (x/X_n)*(X/X_t) — two exact-integer divisions and one product,
    all correctly-rounded IEEE so both engines agree bit-for-bit —
    and quantizes to ppm (> 1e6 = specialized)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cells = (li.join(F.broadcast(supp),
                     F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(nation),
                   F.col("s_nationkey") == F.col("n_nationkey"))
             .join(F.broadcast(part),
                   F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("n_name", "p_type")
             .agg(F.sum("cents").alias("x")))
    by_n = cells.groupBy("n_name").agg(F.sum("x").alias("xn"))
    by_t = cells.groupBy("p_type").agg(F.sum("x").alias("xt"))
    tot = cells.agg(F.sum("x").alias("xx"))
    rca = ("((cast(x as double) / xn) * (cast(xx as double) / xt))")
    return (cells.join(F.broadcast(by_n), "n_name")
            .join(F.broadcast(by_t), "p_type")
            .crossJoin(F.broadcast(tot))
            .select("n_name", "p_type",
                    F.col("x").cast("long").alias("revenue_cents"),
                    F.expr(_abc_ha(f"({rca}) * 1e6")).alias("rca_ppm"))
            .withColumn("specialized", F.expr(
                "cast(rca_ppm > 1000000 as int)"))
            .orderBy("n_name", "p_type"))


_RCA = "((CAST(x AS DOUBLE) / xn) * (CAST(xx AS DOUBLE) / xt))"

register("supplier_balassa_rca", supplier_balassa_rca, f"""
WITH cells AS (
    SELECT n.n_name, p.p_type,
           SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS x
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
), by_n AS (SELECT n_name, SUM(x) AS xn FROM cells GROUP BY 1),
by_t AS (SELECT p_type, SUM(x) AS xt FROM cells GROUP BY 1),
tot AS (SELECT SUM(x) AS xx FROM cells)
SELECT c.n_name, c.p_type, CAST(c.x AS BIGINT) AS revenue_cents,
       {_abc_ha(f"({_RCA}) * 1e6")} AS rca_ppm,
       CAST({_abc_ha(f"({_RCA}) * 1e6")} > 1000000 AS INT) AS specialized
FROM cells c
JOIN by_n ON c.n_name = by_n.n_name
JOIN by_t ON c.p_type = by_t.p_type
CROSS JOIN tot
ORDER BY c.n_name, c.p_type
""", "Balassa RCA matrix: nation x part-type revenue specialization")


# --------------------------------------------- customer tier migration
TIER_CASE = ("case when NX = 0 then 0 when NX <= 2 then 1"
             " when NX <= 5 then 2 else 3 end")


def customer_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer activity-tier migration matrix between the early and
    late half of the order history: tiers 0 (dormant) / 1 (1-2
    orders) / 2 (3-5) / 3 (6+), assigned per half from exact order
    counts over ALL customers (the dimension table anchors the
    population, so dormant->dormant is a real cell) — the lifecycle
    view behind churn/upsell reporting, as one <=16-row matrix with
    exact ppm shares. One fact scan splits on the integer midpoint
    day; the matrix is two broadcast-joined count frames keyed on
    customer."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(cast(o_orderdate as date),"
               " date'1970-01-01')").alias("d"))
    rng = o.agg(F.expr("(min(d) + max(d)) div 2").alias("dmid"))
    split = (o.crossJoin(F.broadcast(rng))
             .groupBy("o_custkey")
             .agg(F.sum(F.expr("case when d <= dmid then 1 else 0 end"))
                  .alias("ne"),
                  F.sum(F.expr("case when d > dmid then 1 else 0 end"))
                  .alias("nl")))
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"))
    tiers = (cust.join(split, "o_custkey", "left")
             .select(
                 F.expr(TIER_CASE.replace("NX", "coalesce(ne, 0)"))
                 .alias("tier_early"),
                 F.expr(TIER_CASE.replace("NX", "coalesce(nl, 0)"))
                 .alias("tier_late")))
    tot = tiers.agg(F.count(F.lit(1)).alias("nn"))
    return (tiers.groupBy("tier_early", "tier_late")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .crossJoin(F.broadcast(tot))
            .select(F.col("tier_early").cast("int").alias("tier_early"),
                    F.col("tier_late").cast("int").alias("tier_late"),
                    "n_customers",
                    F.expr("n_customers * 1000000 div nn")
                    .alias("share_ppm"))
            .orderBy("tier_early", "tier_late"))


_TM_TIER_E = TIER_CASE.replace("NX", "COALESCE(ne, 0)")
_TM_TIER_L = TIER_CASE.replace("NX", "COALESCE(nl, 0)")

register("customer_tier_migration", customer_tier_migration, f"""
WITH o AS (
    SELECT o_custkey,
           datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS d
    FROM orders
), rng AS (SELECT (MIN(d) + MAX(d)) // 2 AS dmid FROM o),
split AS (
    SELECT o_custkey,
           CAST(SUM(CASE WHEN d <= dmid THEN 1 ELSE 0 END) AS BIGINT)
               AS ne,
           CAST(SUM(CASE WHEN d > dmid THEN 1 ELSE 0 END) AS BIGINT)
               AS nl
    FROM o CROSS JOIN rng GROUP BY 1
), tiers AS (
    SELECT CAST({_TM_TIER_E} AS INT) AS tier_early,
           CAST({_TM_TIER_L} AS INT) AS tier_late
    FROM customer c LEFT JOIN split ON c.c_custkey = split.o_custkey
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM tiers)
SELECT tier_early, tier_late,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) * 1000000 // ANY_VALUE(nn) AS BIGINT) AS share_ppm
FROM tiers CROSS JOIN tot
GROUP BY 1, 2 ORDER BY 1, 2
""", "activity-tier migration matrix (early vs late half, all customers)")


# --------------------------------------------- CR4/CR8/HHI by part type
from .monitor_eval import _ha_sql as _cr_ha  # noqa: E402


def supplier_cr4_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration panel per part type: CR4 / CR8 (top-4 /
    top-8 supplier revenue share) and the Herfindahl-Hirschman index
    — the antitrust-style triple that says whether a product line
    depends on a handful of suppliers. Revenue cells are exact cents
    per (type, supplier); ranks come from a window over those cells
    (bounded by the supplier dimension); CR shares are exact integer
    ppm, and each supplier's HHI term (share^2 in points^2) is
    half-away-quantized BEFORE the per-type sum so HHI is an
    order-free integer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cells = (li.join(F.broadcast(part),
                     F.col("l_partkey") == F.col("p_partkey"))
             .groupBy("p_type", "l_suppkey")
             .agg(F.sum("cents").alias("x")))
    tot = cells.groupBy("p_type").agg(
        F.sum("x").alias("xt"), F.count(F.lit(1)).alias("n_suppliers"))
    wr = Window.partitionBy("p_type").orderBy(
        F.col("x").desc(), "l_suppkey")
    # share^2 in basis points squared: (x*1e4/xt)^2, quantized per cell
    hhi_term = _cr_ha("1e8 * (cast(x as double) / xt)"
                      " * (cast(x as double) / xt)")
    ranked = (cells.join(tot, "p_type")
              .withColumn("rk", F.row_number().over(wr))
              .withColumn("hhi_t", F.expr(hhi_term)))
    return (ranked.groupBy("p_type")
            .agg(F.max("n_suppliers").alias("n_suppliers"),
                 F.expr("sum(case when rk <= 4 then x else 0 end)"
                        " * 1000000 div max(xt)").alias("cr4_ppm"),
                 F.expr("sum(case when rk <= 8 then x else 0 end)"
                        " * 1000000 div max(xt)").alias("cr8_ppm"),
                 F.sum("hhi_t").alias("hhi_points"))
            .orderBy("p_type"))


_CR_HHI_TERM = _cr_ha("1e8 * (CAST(x AS DOUBLE) / xt)"
                      " * (CAST(x AS DOUBLE) / xt)")

register("supplier_cr4_by_type", supplier_cr4_by_type, f"""
WITH cells AS (
    SELECT p.p_type, l.l_suppkey,
           SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS x
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
), tot AS (
    SELECT p_type, CAST(SUM(x) AS BIGINT) AS xt,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM cells GROUP BY 1
), ranked AS (
    SELECT c.p_type, c.x, t.xt, t.n_suppliers,
           ROW_NUMBER() OVER (PARTITION BY c.p_type
                              ORDER BY c.x DESC, c.l_suppkey) AS rk,
           {_CR_HHI_TERM} AS hhi_t
    FROM cells c JOIN tot t ON c.p_type = t.p_type
)
SELECT p_type, MAX(n_suppliers) AS n_suppliers,
       CAST(SUM(CASE WHEN rk <= 4 THEN x ELSE 0 END) * 1000000
            // MAX(xt) AS BIGINT) AS cr4_ppm,
       CAST(SUM(CASE WHEN rk <= 8 THEN x ELSE 0 END) * 1000000
            // MAX(xt) AS BIGINT) AS cr8_ppm,
       CAST(SUM(hhi_t) AS BIGINT) AS hhi_points
FROM ranked GROUP BY p_type ORDER BY p_type
""", "CR4/CR8/HHI supplier concentration per part type (exact cents)")


# --------------------------------------------- new vs returning mix
def events_new_returning_mix(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Daily audience composition: active users, first-ever-seen (new)
    users, and the new share — the acquisition-vs-retention mix that
    complements events_cumulative_users (which totals the new side
    only). Both sides are first-touch/distinct reductions (one
    user-keyed shuffle each); the day frame is calendar-bounded. All
    ratios exact integer ppm; days render as strings (the driver
    hash contract forbids temporal types)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("d"))
    active = (ev.distinct().groupBy("d")
              .agg(F.count(F.lit(1)).alias("n_active")))
    first = (ev.groupBy("user_id").agg(F.min("d").alias("d"))
             .groupBy("d").agg(F.count(F.lit(1)).alias("n_new")))
    return (active.join(first, "d", "left")
            .select(F.col("d").cast("long").alias("epoch_day"),
                    "n_active",
                    F.coalesce("n_new", F.lit(0)).alias("n_new"),
                    F.expr("coalesce(n_new, 0) * 1000000 div n_active")
                    .alias("new_share_ppm"))
            .orderBy("epoch_day"))


register("events_new_returning_mix", events_new_returning_mix, """
WITH ev AS (
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS d
    FROM events
), active AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM (SELECT DISTINCT user_id, d FROM ev) GROUP BY 1
), first_t AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new
    FROM (SELECT user_id, MIN(d) AS d FROM ev GROUP BY 1) GROUP BY 1
)
SELECT a.d AS epoch_day, a.n_active, COALESCE(f.n_new, 0) AS n_new,
       COALESCE(f.n_new, 0) * 1000000 // a.n_active AS new_share_ppm
FROM active a LEFT JOIN first_t f ON a.d = f.d
ORDER BY epoch_day
""", "daily new vs returning audience mix (first-touch decomposition)")


# --------------------------------------------- price dispersion (QCD)
def part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile coefficient of dispersion of part retail prices per
    brand: (Q3 - Q1)/(Q3 + Q1) — the outlier-robust pricing-spread
    gate (a brand with high QCD mixes price tiers; flat QCD = uniform
    positioning). Quartiles are exact first-crossing order statistics
    off the per-brand distinct-cents census (the events_mean_excess
    mechanism, partitioned by brand) — no approximate percentile. All
    integer cents/ppm."""
    part = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"))
    census = part.groupBy("p_brand", "cents").agg(
        F.count(F.lit(1)).alias("nd"))
    tot = census.groupBy("p_brand").agg(F.sum("nd").alias("n"))
    wc = (Window.partitionBy("p_brand").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (census.withColumn("cum", F.sum("nd").over(wc))
           .join(tot, "p_brand"))
    q1 = (cum.filter(F.expr("cum * 4 >= n"))
          .groupBy("p_brand").agg(F.min("cents").alias("q1")))
    q3 = (cum.filter(F.expr("cum * 4 >= 3 * n"))
          .groupBy("p_brand").agg(F.min("cents").alias("q3")))
    return (tot.join(q1, "p_brand").join(q3, "p_brand")
            .select("p_brand", F.col("n").cast("long").alias("n_parts"),
                    F.col("q1").cast("long").alias("q1_cents"),
                    F.col("q3").cast("long").alias("q3_cents"),
                    F.expr("(q3 - q1) * 1000000 div (q3 + q1)")
                    .alias("qcd_ppm"))
            .orderBy("p_brand"))


register("part_price_dispersion", part_price_dispersion, """
WITH census AS (
    SELECT p_brand, CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS nd
    FROM part GROUP BY 1, 2
), tot AS (
    SELECT p_brand, CAST(SUM(nd) AS BIGINT) AS n FROM census GROUP BY 1
), cum AS (
    SELECT c.p_brand, c.cents, t.n,
           SUM(c.nd) OVER (PARTITION BY c.p_brand ORDER BY c.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM census c JOIN tot t ON c.p_brand = t.p_brand
), q1 AS (
    SELECT p_brand, MIN(cents) AS q1 FROM cum
    WHERE cum * 4 >= n GROUP BY 1
), q3 AS (
    SELECT p_brand, MIN(cents) AS q3 FROM cum
    WHERE cum * 4 >= 3 * n GROUP BY 1
)
SELECT t.p_brand, t.n AS n_parts, q1.q1 AS q1_cents, q3.q3 AS q3_cents,
       (q3.q3 - q1.q1) * 1000000 // (q3.q3 + q1.q1) AS qcd_ppm
FROM tot t JOIN q1 ON t.p_brand = q1.p_brand
JOIN q3 ON t.p_brand = q3.p_brand
ORDER BY t.p_brand
""", "quartile coefficient of price dispersion per brand (exact census)")


# --------------------------------------------- retention half-life
HL_MIN_POINTS = 3


def events_retention_half_life(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Retention half-life per weekly cohort: fit ln(retained share)
    against week offset >= 1 by OLS and report ln2 / (-slope) in
    milli-weeks — the one number per cohort that product reviews
    extract from the retention triangle by hand. Reuses the
    events_cohort_retention reduction (distinct (user, week) pairs +
    one cohort join); each cohort's log points are micro-quantized
    before the integer OLS sums (order-free); cohorts with fewer
    than HL_MIN_POINTS nonzero offsets, or a non-negative slope,
    report NULL."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"CAST(datediff(to_date(ts), DATE '{EPOCH0}') div 7"
               " AS INT)").alias("week"))
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cw"))
    active = ev.distinct()
    ret = (active.join(cohort, "user_id")
           .groupBy("cw", (F.col("week") - F.col("cw")).alias("off"))
           .agg(F.count(F.lit(1)).alias("n_users")))
    base = (ret.filter(F.col("off") == 0)
            .select("cw", F.col("n_users").alias("n0")))
    pts = (ret.filter(F.col("off") >= 1).join(base, "cw")
           .withColumn("yv", F.expr(_abc_ha(
               "1e6 * ln(cast(n_users as double) / n0)"))))
    suff = pts.groupBy("cw").agg(
        F.max("n0").alias("cohort_size"),
        F.count(F.lit(1)).alias("np"),
        F.sum("off").alias("sx"), F.sum("yv").alias("sy"),
        F.sum(F.expr("off * yv")).alias("sxy"),
        F.sum(F.expr("off * off")).alias("sxx"))
    slope = ("((cast(np as double) * sxy - cast(sx as double) * sy)"
             " / (cast(np as double) * sxx - cast(sx as double) * sx)"
             " / 1e6)")
    hl = (f"case when np >= {HL_MIN_POINTS} and {slope} < 0"
          f" then ln(2.0) / (-({slope})) end")
    return (suff.select(
        F.col("cw").cast("int").alias("cohort_week"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.col("np").cast("long").alias("n_points"),
        F.expr(_abc_ha(f"({hl}) * 1e3")).alias("half_life_milliweeks"))
        .orderBy("cohort_week"))


_HL_SLOPE = ("((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
             " / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
             " / 1e6)")
_HL = (f"CASE WHEN np >= {HL_MIN_POINTS} AND {_HL_SLOPE} < 0"
       f" THEN LN(2.0) / (-({_HL_SLOPE})) END")

register("events_retention_half_life", events_retention_half_life, f"""
WITH wk AS (
    SELECT user_id,
           CAST(DATEDIFF('day', DATE '{EPOCH0}', CAST(ts AS DATE)) // 7
                AS INTEGER) AS week
    FROM events
), cohort AS (
    SELECT user_id, MIN(week) AS cw FROM wk GROUP BY 1
), active AS (SELECT DISTINCT user_id, week FROM wk),
ret AS (
    SELECT c.cw, a.week - c.cw AS off,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
), base AS (
    SELECT cw, n_users AS n0 FROM ret WHERE off = 0
), pts AS (
    SELECT r.cw, r.off, b.n0,
           {_abc_ha("1e6 * LN(CAST(r.n_users AS DOUBLE) / b.n0)")} AS yv
    FROM ret r JOIN base b ON r.cw = b.cw
    WHERE r.off >= 1
), suff AS (
    SELECT cw, CAST(MAX(n0) AS BIGINT) AS cohort_size,
           CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(off) AS BIGINT) AS sx,
           CAST(SUM(yv) AS BIGINT) AS sy,
           CAST(SUM(off * yv) AS BIGINT) AS sxy,
           CAST(SUM(off * off) AS BIGINT) AS sxx
    FROM pts GROUP BY 1
)
SELECT CAST(cw AS INT) AS cohort_week, cohort_size,
       np AS n_points,
       {_abc_ha(f"({_HL}) * 1e3")} AS half_life_milliweeks
FROM suff ORDER BY cohort_week
""", "exponential retention half-life per weekly cohort (log-OLS)")


# ----------------------------------------------- ABC-XYZ matrix
XYZ_X_MILLI = 500    # CV < 0.5 -> X (stable demand)
XYZ_Y_MILLI = 1000   # CV < 1.0 -> Y; else Z (erratic)


def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory segmentation matrix: revenue importance
    (the wave-28 histogram-cutpoint ABC classes) crossed with demand
    VARIABILITY classes from the coefficient of variation of monthly
    shipped quantity (X stable / Y variable / Z erratic at the
    standard 0.5 / 1.0 cuts) — the planning matrix that decides
    forecast-driven vs buffer-driven replenishment per cell. Monthly
    demand uses the closed-form zero-month identity (months without
    demand contribute nothing to S or Q; the common month horizon
    enters as the closed-form count M); the CV is one float from
    exact integer sums, milli-quantized per part BEFORE
    classification. Output: <= 9 cells with part counts and exact
    revenue-share ppm."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.expr("year(l_shipdate) * 12 + month(l_shipdate)").alias("m"))
    mrng = li.agg(F.expr("max(m) - min(m) + 1").alias("mm"))
    per_month = (li.groupBy("l_partkey", "m")
                 .agg(F.sum(F.expr("cast(l_quantity as bigint)"))
                      .alias("q")))
    per_part = (per_month.groupBy("l_partkey")
                .agg(F.sum("q").alias("s"),
                     F.sum(F.expr("q * q")).alias("qq")))
    rev = li.groupBy("l_partkey").agg(F.sum("cents").alias("rev"))
    rrng = rev.agg(F.min("rev").alias("mn"), F.max("rev").alias("mx"),
                   F.sum("rev").alias("total"))
    binned = (rev.crossJoin(F.broadcast(rrng))
              .withColumn("bin", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(ABC_BINS - 1),
                          F.expr(f"((mx - rev) * {ABC_BINS})"
                                 f" div (mx - mn + 1)")))))
    hist = binned.groupBy("bin").agg(F.sum("rev").alias("brev"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    classed = (hist.withColumn(
        "cprev", F.coalesce(F.sum("brev").over(wb), F.lit(0)))
        .crossJoin(F.broadcast(rrng.select("total")))
        .select("bin", F.expr(
            "case when cprev * 5 < 4 * total then 'A'"
            " when cprev * 20 < 19 * total then 'B'"
            " else 'C' end").alias("abc")))
    # CV over the common M-month horizon with implicit zero months:
    # var = (M*Q - S^2) / (M*(M-1)), mean = S/M -> cv = sd*M/S
    cv = ("(sqrt((cast(mm as double) * qq - cast(s as double) * s)"
          " / (cast(mm as double) * (mm - 1)))"
          " * mm / cast(s as double))")
    xyz = (per_part.crossJoin(F.broadcast(mrng))
           .withColumn("cv_milli", F.expr(_abc_ha(f"({cv}) * 1e3")))
           .select("l_partkey", F.expr(
               f"case when cv_milli < {XYZ_X_MILLI} then 'X'"
               f" when cv_milli < {XYZ_Y_MILLI} then 'Y'"
               f" else 'Z' end").alias("xyz")))
    cells = (binned.join(F.broadcast(classed), "bin")
             .join(xyz, "l_partkey")
             .groupBy("abc", "xyz")
             .agg(F.count(F.lit(1)).alias("n_parts"),
                  F.sum("rev").alias("rev_cents"),
                  F.max("total").alias("total")))
    return (cells.select(
        F.col("abc").alias("abc_class"), F.col("xyz").alias("xyz_class"),
        "n_parts", F.col("rev_cents").cast("long").alias("revenue_cents"),
        F.expr("rev_cents * 1000000 div total").alias("share_ppm"))
        .orderBy("abc_class", "xyz_class"))


_XYZ_CV = ("(SQRT((CAST(mm AS DOUBLE) * qq - CAST(s AS DOUBLE) * s)"
           " / (CAST(mm AS DOUBLE) * (mm - 1)))"
           " * mm / CAST(s AS DOUBLE))")

register("part_abc_xyz_matrix", part_abc_xyz_matrix, f"""
WITH li AS (
    SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
           year(l_shipdate) * 12 + month(l_shipdate) AS m
    FROM lineitem
), mrng AS (SELECT MAX(m) - MIN(m) + 1 AS mm FROM li),
per_month AS (
    SELECT l_partkey, m, CAST(SUM(qty) AS BIGINT) AS q
    FROM li GROUP BY 1, 2
), per_part AS (
    SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS s,
           CAST(SUM(q * q) AS BIGINT) AS qq
    FROM per_month GROUP BY 1
), rev AS (
    SELECT l_partkey, CAST(SUM(cents) AS BIGINT) AS rev
    FROM li GROUP BY 1
), rrng AS (
    SELECT MIN(rev) AS mn, MAX(rev) AS mx, SUM(rev) AS total FROM rev
), binned AS (
    SELECT l_partkey, rev, total,
           CASE WHEN mx = mn THEN 0
                ELSE LEAST({ABC_BINS - 1},
                           ((mx - rev) * {ABC_BINS}) // (mx - mn + 1))
           END AS bin
    FROM rev CROSS JOIN rrng
), hist AS (SELECT bin, SUM(rev) AS brev FROM binned GROUP BY bin),
classed AS (
    SELECT bin,
           CASE WHEN COALESCE(SUM(brev) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 5 < 4 * r.total THEN 'A'
                WHEN COALESCE(SUM(brev) OVER (ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 20 < 19 * r.total THEN 'B'
                ELSE 'C' END AS abc
    FROM hist CROSS JOIN (SELECT total FROM rrng) r
), xyz AS (
    SELECT p.l_partkey,
           CASE WHEN {_abc_ha(f"({_XYZ_CV}) * 1e3")} < {XYZ_X_MILLI}
                THEN 'X'
                WHEN {_abc_ha(f"({_XYZ_CV}) * 1e3")} < {XYZ_Y_MILLI}
                THEN 'Y' ELSE 'Z' END AS xyz
    FROM per_part p CROSS JOIN mrng
)
SELECT c.abc AS abc_class, x.xyz AS xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(b.rev) AS BIGINT) AS revenue_cents,
       CAST(SUM(b.rev) * 1000000 // ANY_VALUE(b.total) AS BIGINT)
           AS share_ppm
FROM binned b
JOIN classed c USING (bin)
JOIN xyz x ON b.l_partkey = x.l_partkey
GROUP BY 1, 2 ORDER BY 1, 2
""", "ABC-XYZ planning matrix (revenue cutpoints x monthly-demand CV)")


# --------------------------------------------------- L7 stickiness
def users_stickiness_l7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU(7) stickiness per day WITHOUT a distinct-over-
    sliding-window scan: a user counts toward WAU(d) iff they were
    active in (d-6 .. d), i.e. iff d falls in the union of
    [activity_day, activity_day + 6] intervals — so merge each
    user's intervals into gap-separated runs (gaps-and-islands, one
    user-keyed window) and explode only the MERGED covered days
    (bounded by the calendar per user, with no double counting by
    construction). The naive form re-scans 7 days of user sets per
    day; this shuffles user-day pairs twice. The engagement ratio
    every growth dashboard tracks, exact to the ppm."""
    ud = (load_table(spark, sf_dir, "events")
          .select("user_id", F.expr("ts_ns div 86400000000000").alias("d"))
          .distinct())
    rng = ud.agg(F.max("d").alias("dmax"))
    w = Window.partitionBy("user_id").orderBy("d")
    runs = (ud.withColumn("prev", F.lag("d").over(w))
            .withColumn("brk", F.expr(
                "case when prev is null or d - prev > 6 then 1"
                " else 0 end"))
            .withColumn("run", F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "run")
            .agg(F.min("d").alias("s"), F.expr("max(d) + 6").alias("e")))
    covered = (runs.crossJoin(F.broadcast(rng))
               .select("user_id", F.explode(F.expr(
                   "sequence(s, least(e, dmax))")).alias("d")))
    wau = covered.groupBy("d").agg(F.count(F.lit(1)).alias("wau7"))
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (dau.join(wau, "d")
            .select(F.col("d").cast("long").alias("epoch_day"),
                    "dau", "wau7",
                    F.expr("dau * 1000000 div wau7")
                    .alias("stickiness_ppm"))
            .orderBy("epoch_day"))


register("users_stickiness_l7", users_stickiness_l7, """
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS d
    FROM events
), rng AS (SELECT MAX(d) AS dmax FROM ud),
runs AS (
    SELECT user_id, run, MIN(d) AS s, MAX(d) + 6 AS e
    FROM (SELECT user_id, d,
                 SUM(CASE WHEN prev IS NULL OR d - prev > 6 THEN 1
                     ELSE 0 END) OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS run
          FROM (SELECT user_id, d,
                       LAG(d) OVER (PARTITION BY user_id ORDER BY d)
                           AS prev
                FROM ud))
    GROUP BY 1, 2
), covered AS (
    SELECT r.user_id, UNNEST(range(r.s, LEAST(r.e, g.dmax) + 1)) AS d
    FROM runs r CROSS JOIN rng g
), wau AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS wau7 FROM covered GROUP BY 1
), dau AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
)
SELECT dau.d AS epoch_day, dau.dau, wau.wau7,
       dau.dau * 1000000 // wau.wau7 AS stickiness_ppm
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY epoch_day
""", "DAU/WAU(7) stickiness via merged per-user coverage intervals")


# --------------------------------------------------- bounce rate
BOUNCE_GAP_US = 30 * 60 * 1_000_000  # events_sessionized convention


def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session ENTRY event type: the share of
    30-min-gap sessions (the events_sessionized convention) that
    contain exactly one event, grouped by what the session STARTED
    with — the landing-quality cut a funnel review wants next after
    raw session counts. Gaps-and-islands on the integer microsecond
    epoch (one user-keyed window), entry event by deterministic
    (ts_us, event_id) order; exact ppm rates and a milli mean
    session depth per entry type."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = (ev.withColumn("prev", F.lag("ts_us").over(w))
               .withColumn("brk", F.expr(
                   f"case when prev is null or ts_us - prev"
                   f" > {BOUNCE_GAP_US} then 1 else 0 end"))
               .withColumn("sid", F.sum("brk").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "sid").orderBy(
        "ts_us", "event_id")
    sess = (flagged
            .withColumn("rn", F.row_number().over(ws))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n_ev"),
                 F.max(F.when(F.col("rn") == 1, F.col("event_type")))
                 .alias("entry")))
    return (sess.groupBy("entry")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum(F.expr("cast(n_ev = 1 as int)")).alias("n_bounce"),
                 F.sum("n_ev").alias("n_events"))
            .select(F.col("entry").alias("entry_type"),
                    "n_sessions", "n_bounce",
                    F.expr("n_bounce * 1000000 div n_sessions")
                    .alias("bounce_ppm"),
                    F.expr("n_events * 1000 div n_sessions")
                    .alias("mean_depth_milli"))
            .orderBy("entry_type"))


register("events_bounce_rate", events_bounce_rate, f"""
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > {BOUNCE_GAP_US}
                   THEN 1 ELSE 0 END AS brk
    FROM (SELECT ev.*, LAG(ts_us) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS prev
          FROM ev)
), sessioned AS (
    SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sid
    FROM flagged
), sess AS (
    SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
           MAX(CASE WHEN rn = 1 THEN event_type END) AS entry
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
              ORDER BY ts_us, event_id) AS rn
          FROM sessioned)
    GROUP BY 1, 2
)
SELECT entry AS entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce,
       CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS bounce_ppm,
       CAST(SUM(n_ev) * 1000 // COUNT(*) AS BIGINT) AS mean_depth_milli
FROM sess GROUP BY entry ORDER BY entry
""", "bounce rate and mean depth by session entry type (30-min gaps)")


# --------------------------------------------- Cramér's V association
def part_brand_type_cramers_v(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Association between part brand and part type: chi-square over
    the (brands x types) contingency table plus Cramér's V — the
    dimension-modeling gate that says whether two categorical
    attributes are redundant (V near 1: one column determines the
    other; near 0: independent, keep both as separate dimensions).
    Cell terms (o - e)^2/e quantize to micro before the bounded sum,
    and the unobserved (zero) cells' mass enters in CLOSED FORM —
    their chi-square contribution is exactly their expected count, so
    sum_zero e = N - sum_observed e and no zero cell ever
    materializes; the table stays the product of two dimension
    cardinalities, never fact-sized."""
    part = load_table(spark, sf_dir, "part").select("p_brand", "p_type")
    cells = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("o"))
    rb = cells.groupBy("p_brand").agg(F.sum("o").alias("nr"))
    ct = cells.groupBy("p_type").agg(F.sum("o").alias("nc"))
    tot = cells.agg(F.sum("o").alias("nn"),
                    F.countDistinct("p_brand").alias("r"),
                    F.countDistinct("p_type").alias("c"))
    term = _abc_ha(
        "1e6 * pow(o - cast(nr as double) * nc / nn, 2)"
        " / (cast(nr as double) * nc / nn)")
    e_term = _abc_ha("1e6 * cast(nr as double) * nc / nn")
    scored = (cells.join(rb, "p_brand").join(ct, "p_type")
              .crossJoin(F.broadcast(tot))
              .select(F.expr(term).alias("t_micro"),
                      F.expr(e_term).alias("e_micro"), "nn", "r", "c"))
    agg = (scored.groupBy("nn", "r", "c")
           .agg(F.sum("t_micro").alias("obs_micro"),
                F.sum("e_micro").alias("sum_e_micro"))
           .withColumn("chi2_micro", F.expr(
               "obs_micro + (nn * 1000000 - sum_e_micro)")))
    v = ("sqrt(cast(chi2_micro as double) / 1e6"
         " / (cast(nn as double) * (least(r, c) - 1)))")
    return agg.select(
        F.col("nn").cast("long").alias("n_parts"),
        F.col("r").cast("int").alias("n_brands"),
        F.col("c").cast("int").alias("n_types"),
        F.col("chi2_micro").cast("long").alias("chi2_micro"),
        F.expr(_abc_ha(f"({v}) * 1e3")).alias("cramers_v_milli"))


_CV_TERM = _abc_ha(
    "1e6 * POW(o - CAST(nr AS DOUBLE) * nc / nn, 2)"
    " / (CAST(nr AS DOUBLE) * nc / nn)")
_CV_E = _abc_ha("1e6 * CAST(nr AS DOUBLE) * nc / nn")
_CV_V = ("SQRT(CAST(chi2_micro AS DOUBLE) / 1e6"
         " / (CAST(nn AS DOUBLE) * (LEAST(r, c) - 1)))")

register("part_brand_type_cramers_v", part_brand_type_cramers_v, f"""
WITH cells AS (
    SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS o
    FROM part GROUP BY 1, 2
), rb AS (SELECT p_brand, CAST(SUM(o) AS BIGINT) AS nr
          FROM cells GROUP BY 1),
ct AS (SELECT p_type, CAST(SUM(o) AS BIGINT) AS nc
       FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS nn,
               CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT p_type) AS BIGINT) AS c
        FROM cells),
agg AS (
    SELECT t.nn, t.r, t.c,
           CAST(SUM({_CV_TERM}) AS BIGINT)
           + (t.nn * 1000000
              - CAST(SUM({_CV_E}) AS BIGINT)) AS chi2_micro
    FROM cells
    JOIN rb USING (p_brand)
    JOIN ct USING (p_type)
    CROSS JOIN tot t
    GROUP BY 1, 2, 3
)
SELECT nn AS n_parts, CAST(r AS INT) AS n_brands,
       CAST(c AS INT) AS n_types, chi2_micro,
       {_abc_ha(f"({_CV_V}) * 1e3")} AS cramers_v_milli
FROM agg
""", "chi-square + Cramér's V association of part brand vs type")
