"""Warehouse/table-maintenance extras: cascade time rollups,
incremental-view-maintenance state merging, deterministic array
aggregation, referential-integrity auditing, and inverted-index
statistics.

Reference scope note: the reference ships none of these (SURVEY.md
§1.3 — batch econometrics only); this is §7/M6 extension surface over
the shared fixtures, each query the decomposition that survives 100 TB:

- time rollup: hour/day/week grains computed as a CASCADE — one corpus
  pass to the finest grain, then model-size re-aggregations — instead
  of GROUPING SETS' Expand, which fans every corpus row out ×grains
  BEFORE the shuffle;
- IVM merge: combine partial aggregation states (n/sum/min/max) of a
  base snapshot and a delta batch without touching base rows — the
  oracle asserts the merged state equals a full recompute, which is
  the incremental-view-maintenance correctness statement itself;
- sorted collect: collect_set is unordered by contract; array_sort
  before join makes the aggregate deterministic and hash-checkable —
  the only safe way to emit set-valued columns across engines;
- FK audit: referential orphans via anti joins — each check shuffles
  on its own key with AQE free to broadcast the smaller side;
- inverted index: explode → (token) agg with exact per-token distinct
  doc counts; at 100 TB the COUNT(DISTINCT) swaps for HLL++
  (queries/sketches.py) with the same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..quantum import HOUR_NS, VALUE_MICRO
from ..registry import register
from ..sources import load_table

from .lakehouse import CUT_US

# the oracle buckets over microseconds (DuckDB epoch_us); same hour
HOUR_US = HOUR_NS // 1000


# ------------------------------------------------- cascade time rollup
def time_rollup_from_hourly(hour: DataFrame) -> DataFrame:
    """Hour → day → week cascade from a per-(type, hour) frame carrying
    the event count ``n`` and the micro-quantized value sum ``s`` (sum
    of floor(value * 10000) per event). Integer sums all the way up —
    exact and associative, so the streaming twin
    (``streaming/time_rollup.py``) folds the SAME cascade from the
    shared hourly-count state bit-equally over any chunking; one final
    division renders each grain's double. The day and week folds are
    truncating div, which composes with the hourly spine's truncating
    div for either sign (the dailyfold proof). Caches the hour frame:
    it is model-size (#types × #hours) and all three branches read it —
    without the cache the union re-expands the upstream subtree per
    grain (measured on the batch query: 3 parquet scans in the plan,
    only one recovered by runtime exchange reuse)."""
    hour = hour.cache()
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    week = (day.withColumn("wk", F.expr("d div 7"))
            .groupBy("event_type", "wk")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))

    def out(df, grain, bucket):
        return df.select(
            F.lit(grain).alias("grain"), "event_type",
            F.col(bucket).cast("long").alias("bucket"),
            F.col("n").cast("long").alias("n_events"),
            (F.col("s") / float(VALUE_MICRO)).alias("sum_value"))

    return (
        out(hour, "hour", "hr")
        .unionByName(out(day, "day", "d"))
        .unionByName(out(week, "week", "wk"))
    )


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour → day → week rollup of event counts and value sums in one
    corpus pass: the day grain re-aggregates the hour frame, the week
    grain the day frame (both model-size). GROUPING SETS would Expand
    every corpus row ×3 before its shuffle; the cascade shuffles the
    corpus once at the finest grain only. Value sums are exact
    fixed-point integers at every grain (see time_rollup_from_hourly),
    which is what lets the weekly rollup streaming twin reuse the
    dailyfold exact-integer-sum argument one level up (VERDICT r12
    ask #6)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    return time_rollup_from_hourly(hour)


register("events_time_rollup", events_time_rollup, f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
)
SELECT 'hour' AS grain, event_type, hr AS bucket,
       COUNT(*) AS n_events,
       CAST(SUM(m) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM ev GROUP BY event_type, hr
UNION ALL
SELECT 'day', event_type, hr // 24,
       COUNT(*), CAST(SUM(m) AS BIGINT) / {VALUE_MICRO}.0
FROM ev GROUP BY event_type, hr // 24
UNION ALL
SELECT 'week', event_type, (hr // 24) // 7,
       COUNT(*), CAST(SUM(m) AS BIGINT) / {VALUE_MICRO}.0
FROM ev GROUP BY event_type, (hr // 24) // 7
""", "hour/day/week rollup as a cascade (one corpus shuffle, no Expand)")


# --------------------------------------------- calendar-month rollup
def monthly_rollup_from_hourly(hour: DataFrame) -> DataFrame:
    """CALENDAR-month rollup from a per-(type, hour) frame carrying the
    event count ``n`` and the micro-quantized value sum ``s`` — the
    day-spine extension one grain past the week fold (ROADMAP r14
    candidate surface): hr → day is truncating div (composes with the
    hourly spine's truncating div — the dailyfold proof), and day →
    month maps the day index through real Gregorian date arithmetic
    (``date_add(DATE '1970-01-01', d)`` then 'yyyy-MM'), which both
    engines compute identically for the proleptic Gregorian calendar —
    months are NOT a fixed divisor, so this is the grain the div
    cascade cannot express. Integer sums all the way up (exact,
    associative), so the streaming twin (``streaming/monthly.py``)
    folds the SAME cascade from the shared hourly state bit-equally
    over any chunking; one final division renders the double.
    ``n_active_days`` counts spine days with >= 1 event — exact from
    the day frame, since hour/state rows exist only for hours that saw
    an event. Day and month frames are model-size (#types x calendar),
    so the two re-aggregations after the hourly reduce are free at any
    corpus scale."""
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    return (day
            .withColumn("month", F.date_format(
                F.expr("date_add(DATE '1970-01-01', cast(d as int))"),
                "yyyy-MM"))
            .groupBy("event_type", "month")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.count(F.lit(1)).alias("n_active_days"),
                 (F.sum("s") / float(VALUE_MICRO)).alias("sum_value"))
            .orderBy("event_type", "month"))


def events_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup of event counts and exact fixed-point
    value sums: the warehouse grain GROUPING SETS and the div cascade
    both miss — month lengths vary, so the bucket is real date
    arithmetic over the day spine, not a divisor. One corpus shuffle at
    the hourly grain, then model-size folds (see
    monthly_rollup_from_hourly); 18th finalizer seam for the shared
    hourly-state streaming fleet."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    return monthly_rollup_from_hourly(hour)


register("events_monthly_rollup", events_monthly_rollup, f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), hour AS (
    SELECT event_type, hr, CAST(SUM(m) AS BIGINT) AS s, COUNT(*) AS n
    FROM ev GROUP BY event_type, hr
), day AS (
    SELECT event_type, hr // 24 AS d,
           CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
    FROM hour GROUP BY event_type, hr // 24
)
SELECT event_type,
       strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m') AS month,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_days,
       CAST(SUM(s) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM day GROUP BY event_type, strftime(DATE '1970-01-01' + CAST(d AS INTEGER), '%Y-%m')
ORDER BY event_type, month
""", "calendar-month rollup via the day spine (exact micro value sums)")


# --------------------------------------------- calendar-quarter rollup
def quarterly_rollup_from_hourly(hour: DataFrame) -> DataFrame:
    """CALENDAR-quarter rollup from a per-(type, hour) frame carrying
    the event count ``n`` and the micro-quantized value sum ``s`` — the
    fiscal-calendar grain one step past the month fold (VERDICT r13
    ask #6): hr → day is truncating div (the dailyfold composition
    proof), and day → quarter maps the day index through real Gregorian
    date arithmetic (``date_add(DATE '1970-01-01', d)`` then year +
    quarter), which both engines compute identically for the proleptic
    Gregorian calendar — quarters, like months, are not a fixed
    divisor. Integer sums all the way up (exact, associative), so the
    streaming twin (``streaming/quarterly.py``) folds the SAME cascade
    from the shared hourly state bit-equally over any chunking; one
    final division renders the double. ``n_active_days`` counts spine
    days with >= 1 event, exact from the day frame. Day and quarter
    frames are model-size (#types x calendar), so everything after the
    hourly reduce is free at any corpus scale."""
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    dt = F.expr("date_add(DATE '1970-01-01', cast(d as int))")
    return (day
            .withColumn("quarter", F.concat(
                F.year(dt).cast("string"), F.lit("-Q"),
                F.quarter(dt).cast("string")))
            .groupBy("event_type", "quarter")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.count(F.lit(1)).alias("n_active_days"),
                 (F.sum("s") / float(VALUE_MICRO)).alias("sum_value"))
            .orderBy("event_type", "quarter"))


def events_quarterly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-quarter rollup of event counts and exact fixed-point
    value sums — the planning/fiscal grain: quarter boundaries are real
    date arithmetic over the day spine (quarters span 90-92 days, no
    divisor expresses them). One corpus shuffle at the hourly grain,
    then model-size folds (see quarterly_rollup_from_hourly); the next
    finalizer seam for the shared hourly-state streaming fleet."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    return quarterly_rollup_from_hourly(hour)


register("events_quarterly_rollup", events_quarterly_rollup, f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), hour AS (
    SELECT event_type, hr, CAST(SUM(m) AS BIGINT) AS s, COUNT(*) AS n
    FROM ev GROUP BY event_type, hr
), day AS (
    SELECT event_type, hr // 24 AS d,
           CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
    FROM hour GROUP BY event_type, hr // 24
)
SELECT event_type,
       CAST(YEAR(DATE '1970-01-01' + CAST(d AS INTEGER)) AS VARCHAR)
           || '-Q' ||
       CAST(QUARTER(DATE '1970-01-01' + CAST(d AS INTEGER)) AS VARCHAR)
           AS quarter,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_days,
       CAST(SUM(s) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM day
GROUP BY event_type,
         CAST(YEAR(DATE '1970-01-01' + CAST(d AS INTEGER)) AS VARCHAR)
             || '-Q' ||
         CAST(QUARTER(DATE '1970-01-01' + CAST(d AS INTEGER)) AS VARCHAR)
ORDER BY event_type, quarter
""", "calendar-quarter rollup via the day spine (exact micro value sums)")


# --------------------------------------------------------- IVM merge
def ivm_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view maintenance: merge the partial aggregation
    states (n, sum, min, max) of a base snapshot and a delta batch into
    the updated view WITHOUT re-reading base rows. The oracle computes
    the view from scratch over all events — the semantic contract that
    merged partials equal a full recompute."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.expr("ts_ns div 1000").alias("ts_us"))

    def state(pred):
        return (ev.filter(pred).groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
                     F.min("value").alias("mn"), F.max("value").alias("mx")))

    base = state(F.col("ts_us") < CUT_US)
    delta = state(F.col("ts_us") >= CUT_US)
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, F.col("b.event_type") == F.col("d.event_type"),
               "full_outer")
        .select(
            F.coalesce(F.col("b.event_type"), F.col("d.event_type"))
            .alias("event_type"),
            (F.coalesce(F.col("b.n"), F.lit(0))
             + F.coalesce(F.col("d.n"), F.lit(0))).alias("n_events"),
            F.round(F.coalesce(F.col("b.s"), F.lit(0.0))
                    + F.coalesce(F.col("d.s"), F.lit(0.0)), 4)
            .alias("sum_value"),
            F.round(F.least(F.coalesce(F.col("b.mn"), F.col("d.mn")),
                            F.coalesce(F.col("d.mn"), F.col("b.mn"))), 4)
            .alias("min_value"),
            F.round(F.greatest(F.coalesce(F.col("b.mx"), F.col("d.mx")),
                               F.coalesce(F.col("d.mx"), F.col("b.mx"))), 4)
            .alias("max_value"))
        .orderBy("event_type")
    )


register("ivm_merge_counts", ivm_merge_counts, """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
""", "merge base+delta partial agg states == full recompute (IVM contract)")


# ----------------------------------------------------- sorted collect
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sorted distinct event-type roster as a joined string.
    collect_set's order is execution-dependent; array_sort makes the
    set-valued output deterministic — the only hash-safe way to ship
    array aggregates across engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return (
        ev.groupBy("user_id")
        .agg(F.array_join(F.array_sort(F.collect_set("event_type")), ",")
             .alias("types"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


register("q_collect_sorted", q_collect_sorted, """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
       COUNT(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
""", "deterministic (sorted) set-valued aggregation per key")


# ------------------------------------------------------- FK audit
_FK_CHECKS = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every declared
    FK edge of the star schema, as one result frame. Each check is an
    anti join on its own key (AQE broadcasts the dimension side when it
    fits); the counts are 1-row frames combined by union — at 100 TB
    each edge is an independent co-partitioned pass, never a multi-way
    join."""
    out = None
    for name, child, ck, parent, pk in _FK_CHECKS:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        row = (c.join(p, "k", "left_anti")
               .agg(F.count(F.lit(1)).alias("n_orphans"))
               .select(F.lit(name).alias("fk_check"), "n_orphans"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_check")


register("fk_integrity_audit", fk_integrity_audit, """
SELECT 'lineitem_orders' AS fk_check, COUNT(*) AS n_orphans FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_customer', COUNT(*) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_part', COUNT(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem_supplier', COUNT(*) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
ORDER BY fk_check
""", "orphan counts for every FK edge of the star schema")


# -------------------------------------------------- inverted index
IDX_TOP = 30


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics for the corpus vocabulary: per token,
    document frequency (exact distinct) and total term frequency; top
    30 by tf. The explode fans out corpus×tokens rows but they collapse
    through partial aggregation before the single token-keyed shuffle;
    at 100 TB the exact COUNT(DISTINCT doc) (which shuffles (token,
    doc) pairs) swaps for approx_count_distinct with the same plan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != ""))
    return (
        toks.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"),
             F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.desc("df"), "tok")
        .limit(IDX_TOP)
    )


register("text_inverted_index", text_inverted_index, f"""
WITH toks AS (
    SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '\\s+')) AS tok
    FROM documents
)
SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY tf DESC, df DESC, tok LIMIT {IDX_TOP}
""", "vocabulary posting-list stats (df/tf), exact distinct at test scale")


# ------------------------------------------------- Little's law audit
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit (L = lambda * W) over the order fulfilment
    queue: arrival rate lambda = orders per spine day, W = mean
    order-to-last-ship lag, and L measured INDEPENDENTLY by sampling
    the number of open orders at every day boundary (each order's
    open interval explodes onto its covered days — gap-bounded spans,
    the events_interval_overlap mechanism). With clean data the two
    sides agree exactly; the ppm residual surfaces whatever breaks
    the identity — here the fixture's ship-before-order rows, whose
    negative lags enter W but can never appear as open days (the
    explode guard drops inverted spans) — the queueing sanity check
    a fulfilment dashboard runs. All quantities are milli-scaled
    exact integers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("cast(l_shipdate as date)").alias("sd"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("cast(o_orderdate as date)").alias("od"))
    spans = (li.groupBy("l_orderkey")
             .agg(F.max("sd").alias("ship_d"))
             .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .select(F.expr("datediff(ship_d, od)").alias("lag_d"),
                     "od", "ship_d"))
    rng = spans.agg(F.min("od").alias("d0"), F.max("ship_d").alias("d1"))
    base = spans.crossJoin(F.broadcast(rng)).select(
        "lag_d",
        F.expr("datediff(od, d0)").alias("a"),
        F.expr("datediff(ship_d, d0)").alias("b"),
        F.expr("datediff(d1, d0) + 1").alias("n_days"))
    # open at day-start d iff a < d <= b  <=>  d in [a+1, b]
    open_days = base.select(
        "n_days",
        F.explode(F.expr(
            "case when b >= a + 1 then sequence(a + 1, b)"
            " else array() end")).alias("d"))
    l_sum = open_days.agg(F.count(F.lit(1)).alias("open_order_days"),
                          F.max("n_days").alias("n_days"))
    w_sum = base.agg(F.count(F.lit(1)).alias("n_orders"),
                     F.sum("lag_d").alias("lag_sum"))
    return (l_sum.crossJoin(F.broadcast(w_sum))
            .select(
                "n_days", "n_orders",
                F.expr("open_order_days * 1000 div n_days")
                .alias("l_milli"),
                F.expr("n_orders * 1000 div n_days").alias("lambda_milli"),
                F.expr("lag_sum * 1000 div n_orders").alias("w_milli"),
                F.expr("lag_sum * 1000 div n_days").alias("lw_milli"),
                F.expr("(open_order_days - lag_sum) * 1000000"
                       " div greatest(lag_sum, 1)").alias("residual_ppm")))


register("orders_littles_law", orders_littles_law, """
WITH spans AS (
    SELECT CAST(o.o_orderdate AS DATE) AS od,
           CAST(s.ship_d AS DATE) AS ship_d,
           datediff('day', CAST(o.o_orderdate AS DATE),
                    CAST(s.ship_d AS DATE)) AS lag_d
    FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship_d
          FROM lineitem GROUP BY l_orderkey) s
    JOIN orders o ON s.l_orderkey = o.o_orderkey
), rng AS (SELECT MIN(od) AS d0, MAX(ship_d) AS d1 FROM spans),
base AS (
    SELECT lag_d,
           datediff('day', d0, od) AS a,
           datediff('day', d0, ship_d) AS b,
           datediff('day', d0, d1) + 1 AS n_days
    FROM spans CROSS JOIN rng
), open_days AS (
    SELECT n_days, UNNEST(range(a + 1, b + 1)) AS d FROM base
), l_sum AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS open_order_days,
           CAST(MAX(n_days) AS BIGINT) AS n_days
    FROM open_days
), w_sum AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(lag_d) AS BIGINT) AS lag_sum
    FROM base
)
SELECT n_days, n_orders,
       CAST(open_order_days * 1000 // n_days AS BIGINT) AS l_milli,
       CAST(n_orders * 1000 // n_days AS BIGINT) AS lambda_milli,
       CAST(lag_sum * 1000 // n_orders AS BIGINT) AS w_milli,
       CAST(lag_sum * 1000 // n_days AS BIGINT) AS lw_milli,
       CAST((open_order_days - lag_sum) * 1000000
            // GREATEST(lag_sum, 1) AS BIGINT) AS residual_ppm
FROM l_sum CROSS JOIN w_sum
""", "Little's law audit: sampled WIP vs arrival-rate x lead-time")


# ------------------------------------------- Kingman (VUT) wait sweep
from .monitor_eval import _ha_sql as _kg_ha  # noqa: E402

KINGMAN_UTILS = (70, 80, 90, 95)  # utilization sweep, percent


def orders_kingman_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kingman (VUT) heavy-traffic wait estimate for the order
    fulfilment queue at a sweep of hypothetical utilizations:
    Wq ≈ (u/(1-u)) * ((ca² + cs²)/2) * τ — the factory-physics
    what-if that turns two dispersion numbers into "how much queueing
    pain at 90% load". Variability inputs are measured exactly:
    ca² is the index of dispersion of daily arrival counts on the
    zero-filled orderdate spine (the renewal-process stand-in for the
    interarrival CV²), cs² the squared CV of the order-to-last-ship
    lag, τ its mean — all from integer sufficient sums (days·Q - S²
    ladders as in events_ljung_box); the fixture's negative
    ship-before-order lags enter the service moments unchanged, the
    orders_littles_law convention. The utilization sweep is a 4-row
    literal explode; one float evaluation per row, milli/micro
    quantized with shared half-away rounding."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("cast(o_orderdate as date)").alias("od"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("cast(l_shipdate as date)").alias("sd"))
    rng = o.agg(F.min("od").alias("d0"), F.max("od").alias("d1"))
    daily = (o.groupBy("od").agg(F.count(F.lit(1)).alias("c"))
             .crossJoin(F.broadcast(rng))
             .select(F.expr("datediff(od, d0)").alias("d"), "c",
                     F.expr("datediff(d1, d0) + 1").alias("days")))
    arr = daily.agg(
        F.max("days").alias("days"), F.sum("c").alias("s"),
        F.sum(F.expr("c * c")).alias("q"))
    # zero days contribute 0 to S and Q, so the spine enters through
    # the closed-form count `days` alone — no fill join needed
    lag = (li.groupBy("l_orderkey").agg(F.max("sd").alias("ship_d"))
           .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .select(F.expr("datediff(ship_d, od)").alias("lag_d")))
    srv = lag.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("lag_d").alias("sl"),
                  F.sum(F.expr("cast(lag_d as bigint) * lag_d"))
                  .alias("ql"))
    ca2 = ("((cast(days as double) * q - cast(s as double) * s)"
           " / ((cast(days as double) - 1) * s))")
    cs2 = ("((cast(n as double) * (cast(n as double) * ql"
           " - cast(sl as double) * sl))"
           " / ((cast(n as double) - 1)"
           " * (cast(sl as double) * sl)))")
    tau = "(cast(sl as double) / n)"
    us = ", ".join(str(u) for u in KINGMAN_UTILS)
    fan = (arr.crossJoin(F.broadcast(srv))
           .select("*", F.explode(F.expr(f"array({us})")).alias("u_pct")))
    wq = (f"((cast(u_pct as double) / (100 - u_pct))"
          f" * (({ca2} + {cs2}) / 2) * {tau})")
    return fan.select(
        "u_pct",
        F.expr(_kg_ha(f"({ca2}) * 1e6")).alias("ca2_micro"),
        F.expr(_kg_ha(f"({cs2}) * 1e6")).alias("cs2_micro"),
        F.expr(_kg_ha(f"({tau}) * 1e3")).alias("tau_milli_days"),
        F.expr(_kg_ha(f"({wq}) * 1e3")).alias("wq_milli_days"),
    ).orderBy("u_pct")


_KG_CA2 = ("((CAST(days AS DOUBLE) * q - CAST(s AS DOUBLE) * s)"
           " / ((CAST(days AS DOUBLE) - 1) * s))")
_KG_CS2 = ("((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * ql"
           " - CAST(sl AS DOUBLE) * sl))"
           " / ((CAST(n AS DOUBLE) - 1)"
           " * (CAST(sl AS DOUBLE) * sl)))")
_KG_TAU = "(CAST(sl AS DOUBLE) / n)"
_KG_WQ = (f"((CAST(u_pct AS DOUBLE) / (100 - u_pct))"
          f" * (({_KG_CA2} + {_KG_CS2}) / 2) * {_KG_TAU})")

register("orders_kingman_wait", orders_kingman_wait, """
WITH o AS (
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
), rng AS (SELECT MIN(od) AS d0, MAX(od) AS d1 FROM o),
arr AS (
    SELECT MAX(datediff('day', d0, d1) + 1) AS days,
           CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS q
    FROM (SELECT od, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1)
    CROSS JOIN rng
), srv AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(lag_d) AS BIGINT) AS sl,
           CAST(SUM(lag_d * lag_d) AS BIGINT) AS ql
    FROM (SELECT datediff('day', o.od, s.ship_d) AS lag_d
          FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship_d
                FROM lineitem GROUP BY 1) s
          JOIN o ON s.l_orderkey = o.o_orderkey)
), fan AS (
    SELECT arr.*, srv.*, u.u_pct
    FROM arr CROSS JOIN srv
    CROSS JOIN (SELECT UNNEST([{us_list}]) AS u_pct) u
)
SELECT u_pct,
       {ca2_ha} AS ca2_micro,
       {cs2_ha} AS cs2_micro,
       {tau_ha} AS tau_milli_days,
       {wq_ha} AS wq_milli_days
FROM fan ORDER BY u_pct
""".format(ca2_ha=_kg_ha(f"({_KG_CA2}) * 1e6"),
           cs2_ha=_kg_ha(f"({_KG_CS2}) * 1e6"),
           tau_ha=_kg_ha(f"({_KG_TAU}) * 1e3"),
           wq_ha=_kg_ha(f"({_KG_WQ}) * 1e3"),
           us_list=", ".join(str(u) for u in KINGMAN_UTILS)),
         "Kingman VUT wait sweep from exact dispersion statistics")


# --------------------------------------------- newsvendor fractiles
NV_FRACTILES = (50, 80, 90, 95)  # critical fractiles, percent


def orders_newsvendor_quantile(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Newsvendor stocking targets: the critical-fractile demand
    quantiles of DAILY order volume (smallest x with
    P(demand <= x) >= f) at the standard cost-ratio sweep — the
    inventory/provisioning question the Kingman sweep's variability
    numbers feed. Demand is the zero-filled day spine's order count;
    days with NO orders enter as an arithmetic zero ROW in the value
    histogram (spine length minus active days) rather than a fill
    join — the no-fill identity, but as an emittable level: with a
    zero-heavy demand distribution the 50% fractile IS zero, so zero
    must be a real histogram value. The quantile is a
    first-crossing on the bounded demand-value histogram (cumulative
    window over distinct demand values, integer cross-multiplied
    compare), so every target is an exactly attained demand level.
    Attainment ppm reports the actual coverage at the target."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("cast(o_orderdate as date)").alias("od"))
    rng = o.agg(F.expr("datediff(max(od), min(od)) + 1").alias("n_days"))
    daily = o.groupBy("od").agg(F.count(F.lit(1)).alias("c"))
    active = daily.agg(F.count(F.lit(1)).alias("n_active"))
    zrow = (rng.crossJoin(F.broadcast(active))
            .select(F.lit(0).cast("long").alias("c"),
                    F.expr("n_days - n_active").alias("nd"), "n_days")
            .filter(F.col("nd") > 0))
    hist = (daily.groupBy("c").agg(F.count(F.lit(1)).alias("nd"))
            .crossJoin(F.broadcast(rng))
            .select("c", "nd", "n_days")
            .unionByName(zrow))
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("nd").over(wc))
    fs = ", ".join(str(f) for f in NV_FRACTILES)
    fan = (cum.withColumn("f_pct", F.explode(F.expr(f"array({fs})")))
           .filter(F.expr("cum * 100 >= f_pct * n_days")))
    first = fan.groupBy("f_pct").agg(F.min("cum").alias("cum_at"))
    return (first.join(fan.select("f_pct", F.col("cum").alias("cum_at"),
                                  "c", "n_days"), ["f_pct", "cum_at"])
            .select(F.col("f_pct").cast("int").alias("fractile_pct"),
                    F.col("c").cast("long").alias("target_units"),
                    F.expr("cum_at * 1000000 div n_days")
                    .alias("attained_ppm"))
            .orderBy("fractile_pct"))


register("orders_newsvendor_quantile", orders_newsvendor_quantile, f"""
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders),
rng AS (SELECT datediff('day', MIN(od), MAX(od)) + 1 AS n_days FROM o),
daily AS (SELECT od, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1),
hist AS (
    SELECT h.c, h.nd, r.n_days
    FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS nd
          FROM daily GROUP BY 1) h
    CROSS JOIN rng r
    UNION ALL
    SELECT CAST(0 AS BIGINT) AS c,
           r.n_days - (SELECT COUNT(*) FROM daily) AS nd, r.n_days
    FROM rng r
    WHERE r.n_days - (SELECT COUNT(*) FROM daily) > 0
), cum AS (
    SELECT c, n_days,
           SUM(nd) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM hist
), fan AS (
    SELECT f.f_pct, cum.c, cum.cum, cum.n_days
    FROM cum, (SELECT UNNEST([{", ".join(str(f) for f in NV_FRACTILES)}])
               AS f_pct) f
    WHERE cum.cum * 100 >= f.f_pct * cum.n_days
), first AS (
    SELECT f_pct, MIN(cum) AS cum_at FROM fan GROUP BY 1
)
SELECT CAST(f.f_pct AS INT) AS fractile_pct,
       CAST(fan.c AS BIGINT) AS target_units,
       CAST(f.cum_at * 1000000 // fan.n_days AS BIGINT) AS attained_ppm
FROM first f
JOIN fan ON fan.f_pct = f.f_pct AND fan.cum = f.cum_at
ORDER BY fractile_pct
""", "newsvendor critical-fractile demand targets (first-crossing)")


# ------------------------------------------------------- 2-D skyline
SKY_BINS = 4096
SKY_TOPK = 50


def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) operator over parts: minimize retail
    price, maximize size — the classic multi-criteria shortlist query
    engines ship as a dedicated operator because the naive form is an
    all-pairs dominance join. Scale decomposition: a part survives
    iff its size strictly beats the max size of every strictly
    cheaper part — computed as greatest(bucket-prefix max, in-bucket
    range-frame max), where the 4096-cell price-bucket prefix runs on
    a MODEL-SIZE frame and the in-bucket RANGE window (excluding
    equal prices) is partitioned by bucket. Equal-price points keep
    only the per-price max size (ties keep all maxima) — exactly the
    classic NOT-EXISTS dominance semantics, which the oracle states
    directly. Output caps at the SKY_TOPK cheapest skyline points."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("cents"))
    rng = part.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    binned = (part.crossJoin(F.broadcast(rng))
              .withColumn("b", F.when(
                  F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                  F.least(F.lit(SKY_BINS - 1),
                          F.expr(f"((cents - mn) * {SKY_BINS})"
                                 f" div (mx - mn + 1)")))))
    bmax = binned.groupBy("b").agg(F.max("p_size").alias("bm"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bprev = bmax.withColumn(
        "prev_bm", F.coalesce(F.max("bm").over(wb), F.lit(-1)))
    w_in = (Window.partitionBy("b").orderBy("cents")
            .rangeBetween(Window.unboundedPreceding, -1))
    w_eq = Window.partitionBy("b", "cents")
    scored = (binned.join(F.broadcast(bprev.select("b", "prev_bm")), "b")
              .withColumn("in_max", F.coalesce(
                  F.max("p_size").over(w_in), F.lit(-1)))
              .withColumn("eq_max", F.max("p_size").over(w_eq))
              .withColumn("thresh", F.greatest("prev_bm", "in_max")))
    return (scored.filter((F.col("p_size") > F.col("thresh"))
                          & (F.col("p_size") == F.col("eq_max")))
            .select("p_partkey", "cents",
                    F.col("p_size").cast("int").alias("p_size"))
            .orderBy("cents", "p_partkey").limit(SKY_TOPK))


register("q_skyline_2d", q_skyline_2d, f"""
WITH part_c AS (
    SELECT p_partkey, CAST(p_size AS INT) AS p_size,
           CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS cents
    FROM part
)
SELECT a.p_partkey, a.cents, a.p_size
FROM part_c a
WHERE NOT EXISTS (
    SELECT 1 FROM part_c b
    WHERE b.cents <= a.cents AND b.p_size >= a.p_size
      AND (b.cents < a.cents OR b.p_size > a.p_size)
)
ORDER BY a.cents, a.p_partkey LIMIT {SKY_TOPK}
""", "2-D skyline (min price, max size) via bucket-prefix decomposition")


# ------------------------------------ 4-5-4 retail-calendar quarters
def _r454_anchor(y: str) -> str:
    """Day index of the 4-5-4 fiscal year start for calendar year ``y``:
    the first Sunday ON/AFTER Feb 1 (the convention pinned here — the
    NRF variant anchored to the Sunday nearest Jan 31 differs by at
    most one week and would be the same arithmetic with a different
    offset). Pure integer date math both engines compute identically:
    1970-01-01 is a Thursday, so day index d falls on a Sunday iff
    (d + 4) % 7 == 0."""
    feb1 = f"datediff(make_date({y}, 2, 1), DATE '1970-01-01')"
    return f"({feb1} + (7 - (({feb1} + 4) % 7)) % 7)"


def retail454_rollup_from_hourly(hour: DataFrame) -> DataFrame:
    """4-5-4 RETAIL-calendar fiscal-quarter rollup from a per-(type,
    hour) frame carrying the event count ``n`` and the micro-quantized
    value sum ``s`` (VERDICT r14 ask #6 — the offset-fiscal-year grain
    past calendar quarters): hr → day is truncating div (the dailyfold
    composition proof), and day → fiscal quarter is real Gregorian
    date arithmetic — the fiscal year starts on the first Sunday
    on/after Feb 1, quarters are the 4-5-4 week groups (13 weeks
    each), and the year's leftover week 53 belongs to Q4 (the
    LEAST(week div 13, 3) clamp). No divisor expresses any of this.
    Integer sums all the way up (exact, associative), so the streaming
    twin (``streaming/retail454.py``) folds the SAME cascade from the
    shared hourly state bit-equally over any chunking. Day and quarter
    frames are model-size (#types x calendar), so everything after the
    hourly reduce is free at any corpus scale."""
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    return (day
            .withColumn("yy", F.expr(
                "year(date_add(DATE '1970-01-01', cast(d as int)))"))
            .withColumn("a1", F.expr(_r454_anchor("yy")))
            .withColumn("a0", F.expr(_r454_anchor("(yy - 1)")))
            .withColumn("fy", F.expr(
                "case when d >= a1 then yy else yy - 1 end"))
            .withColumn("astart", F.expr(
                "case when d >= a1 then a1 else a0 end"))
            .withColumn("fq", F.expr(
                "concat('FY', cast(fy as string), '-Q',"
                " cast(least((d - astart) div 7 div 13, 3) + 1"
                " as string))"))
            .groupBy("event_type", "fq")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.count(F.lit(1)).alias("n_active_days"),
                 (F.sum("s") / float(VALUE_MICRO)).alias("sum_value"))
            .orderBy("event_type", "fq"))


def events_retail454_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-5-4 retail-calendar fiscal-quarter rollup of event counts and
    exact fixed-point value sums — the merchandising/fiscal grain:
    week-aligned quarters in a year that starts near Feb 1, so neither
    calendar quarters nor any day-index divisor reproduce it. One
    corpus shuffle at the hourly grain, then model-size folds (see
    retail454_rollup_from_hourly); 27th finalizer seam for the shared
    hourly-state streaming fleet. Cross-law vs the calendar rollup
    (same universe of days): per-type totals of n_events /
    n_active_days / micro value equal events_quarterly_rollup's
    (tests/test_r15_wave.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    return retail454_rollup_from_hourly(hour)


def _r454_anchor_sql(y: str) -> str:
    feb1 = f"datediff('day', DATE '1970-01-01', make_date({y}, 2, 1))"
    return f"({feb1} + (7 - (({feb1} + 4) % 7)) % 7)"


register("events_retail454_rollup", events_retail454_rollup, f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), hour AS (
    SELECT event_type, hr, CAST(SUM(m) AS BIGINT) AS s, COUNT(*) AS n
    FROM ev GROUP BY event_type, hr
), day AS (
    SELECT event_type, hr // 24 AS d,
           CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
    FROM hour GROUP BY event_type, hr // 24
), fyd AS (
    SELECT event_type, d, s, n,
           YEAR(DATE '1970-01-01' + CAST(d AS INTEGER)) AS yy
    FROM day
), anch AS (
    SELECT event_type, d, s, n, yy,
           {_r454_anchor_sql('yy')} AS a1,
           {_r454_anchor_sql('(yy - 1)')} AS a0
    FROM fyd
)
SELECT event_type,
       'FY' || CAST(CASE WHEN d >= a1 THEN yy ELSE yy - 1 END AS VARCHAR)
            || '-Q'
            || CAST(LEAST((d - CASE WHEN d >= a1 THEN a1 ELSE a0 END)
                          // 7 // 13, 3) + 1 AS VARCHAR) AS fq,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_days,
       CAST(SUM(s) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM anch
GROUP BY 1, 2
ORDER BY event_type, fq
""", "4-5-4 retail fiscal-quarter rollup via the day spine")


# ------------------------------------ 4-5-4 retail-calendar months
def retail454_months_from_hourly(hour: DataFrame) -> DataFrame:
    """4-5-4 retail fiscal-MONTH rollup — the week-grouping grain
    below retail454_rollup_from_hourly's quarters: within each 13-week
    quarter the months are the 4/5/4-week blocks (week-in-quarter
    w: month 1 for w < 4, month 2 for w < 9, month 3 otherwise), and
    the year's leftover week 53 extends the 12th month (the same Q4
    clamp one level down). Month index = quarter*3 + block, rendered
    FYyyyy-Mmm with a zero-padded month so lexicographic order equals
    calendar order (the driver sorts output rows by string value).
    Integer sums all the way up; the streaming twin
    (``streaming/retail454_month.py``) folds the SAME cascade from the
    shared hourly state bit-equally. Cross-laws in
    tests/test_r15_wave.py: summing month rows reproduces
    events_retail454_rollup's quarter rows exactly, months span
    28/35 days (except month 12: 28-35)."""
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    return (day
            .withColumn("yy", F.expr(
                "year(date_add(DATE '1970-01-01', cast(d as int)))"))
            .withColumn("a1", F.expr(_r454_anchor("yy")))
            .withColumn("a0", F.expr(_r454_anchor("(yy - 1)")))
            .withColumn("fy", F.expr(
                "case when d >= a1 then yy else yy - 1 end"))
            .withColumn("astart", F.expr(
                "case when d >= a1 then a1 else a0 end"))
            .withColumn("wk", F.expr(
                "least((d - astart) div 7, 52)"))
            .withColumn("wq", F.expr("least(wk div 13, 3)"))
            .withColumn("wiq", F.expr("wk - wq * 13"))
            .withColumn("fm", F.expr(
                "concat('FY', cast(fy as string), '-M', lpad(cast("
                "wq * 3 + (case when wiq < 4 then 1 when wiq < 9 then 2"
                " else 3 end) as string), 2, '0'))"))
            .groupBy("event_type", "fm")
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.count(F.lit(1)).alias("n_active_days"),
                 (F.sum("s") / float(VALUE_MICRO)).alias("sum_value"))
            .orderBy("event_type", "fm"))


def events_retail454_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-5-4 retail fiscal-month rollup of event counts and exact
    fixed-point value sums — the merchandising comp-month grain
    (months are 4-or-5 whole weeks, so month-over-month comparisons
    hold weekday mix constant; no calendar-month divisor reproduces
    it). One corpus shuffle at the hourly grain, then model-size folds
    (retail454_months_from_hourly); 28th finalizer seam for the shared
    hourly-state streaming fleet."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    return retail454_months_from_hourly(hour)


register("events_retail454_months", events_retail454_months, f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), hour AS (
    SELECT event_type, hr, CAST(SUM(m) AS BIGINT) AS s, COUNT(*) AS n
    FROM ev GROUP BY event_type, hr
), day AS (
    SELECT event_type, hr // 24 AS d,
           CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
    FROM hour GROUP BY event_type, hr // 24
), fyd AS (
    SELECT event_type, d, s, n,
           YEAR(DATE '1970-01-01' + CAST(d AS INTEGER)) AS yy
    FROM day
), anch AS (
    SELECT event_type, d, s, n, yy,
           {_r454_anchor_sql('yy')} AS a1,
           {_r454_anchor_sql('(yy - 1)')} AS a0
    FROM fyd
), wks AS (
    SELECT event_type, d, s, n,
           CASE WHEN d >= a1 THEN yy ELSE yy - 1 END AS fy,
           LEAST((d - CASE WHEN d >= a1 THEN a1 ELSE a0 END) // 7, 52)
               AS wk
    FROM anch
)
SELECT event_type,
       'FY' || CAST(fy AS VARCHAR) || '-M'
            || lpad(CAST((wk // 13) * 3
                    + (CASE WHEN wk - (wk // 13) * 13 < 4 THEN 1
                            WHEN wk - (wk // 13) * 13 < 9 THEN 2
                            ELSE 3 END) AS VARCHAR), 2, '0') AS fm,
       CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_days,
       CAST(SUM(s) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM wks
GROUP BY 1, 2
ORDER BY event_type, fm
""", "4-5-4 retail fiscal-month rollup via the day spine")


# --------------------------- retail-calendar month-pattern variants
# (variant, first-block weeks, second-block boundary): month 1 ends at
# b1 weeks into the quarter, month 2 at b2, month 3 at week 13.
RETAIL_VARIANTS = (("4-5-4", 4, 9), ("4-4-5", 4, 8), ("5-4-4", 5, 9))


def events_retail_calendar_months(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """All three retail month conventions — 4-5-4, 4-4-5, 5-4-4 — in
    ONE pass over the day spine (the r16-candidate generalization of
    events_retail454_months): the fiscal year anchor and the 13-week
    quarters are IDENTICAL across variants (same anchor arithmetic as
    retail454_rollup_from_hourly), only the week boundaries that split
    a quarter into months differ, so the model-size day frame explodes
    x3 against the variant literals and re-aggregates — still
    calendar-cardinality work after the one corpus shuffle. Cross-laws
    (tests/test_r15_wave2.py): the 4-5-4 slice EQUALS
    events_retail454_months row-for-row, and every variant rolls up to
    the SAME events_retail454_rollup quarter rows (quarters don't
    depend on the month pattern)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hour = (ev.groupBy("event_type", "hr")
            .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n")))
    day = (hour.withColumn("d", F.expr("hr div 24"))
           .groupBy("event_type", "d")
           .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))
    pats = ", ".join(
        f"named_struct('variant', '{v}', 'b1', {b1}, 'b2', {b2})"
        for v, b1, b2 in RETAIL_VARIANTS)
    return (day
            .withColumn("yy", F.expr(
                "year(date_add(DATE '1970-01-01', cast(d as int)))"))
            .withColumn("a1", F.expr(_r454_anchor("yy")))
            .withColumn("a0", F.expr(_r454_anchor("(yy - 1)")))
            .withColumn("fy", F.expr(
                "case when d >= a1 then yy else yy - 1 end"))
            .withColumn("astart", F.expr(
                "case when d >= a1 then a1 else a0 end"))
            .withColumn("wk", F.expr(
                "least((d - astart) div 7, 52)"))
            .withColumn("p", F.expr(f"explode(array({pats}))"))
            .withColumn("fm", F.expr(
                "concat('FY', cast(fy as string), '-M', lpad(cast("
                "(wk div 13) * 3 + (case when wk - (wk div 13) * 13 < p.b1"
                " then 1 when wk - (wk div 13) * 13 < p.b2 then 2"
                " else 3 end) as string), 2, '0'))"))
            .groupBy(F.col("p.variant").alias("variant"),
                     F.col("event_type"), F.col("fm"))
            .agg(F.sum("n").cast("long").alias("n_events"),
                 F.count(F.lit(1)).alias("n_active_days"),
                 (F.sum("s") / float(VALUE_MICRO)).alias("sum_value"))
            .orderBy("variant", "event_type", "fm"))


def _retail_variants_oracle() -> str:
    pats = " UNION ALL ".join(
        f"SELECT '{v}' AS variant, {b1} AS b1, {b2} AS b2"
        for v, b1, b2 in RETAIL_VARIANTS)
    return f"""
WITH ev AS (
    SELECT event_type, epoch_us(ts) // {HOUR_US} AS hr,
           CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT) AS m
    FROM events
), hour AS (
    SELECT event_type, hr, CAST(SUM(m) AS BIGINT) AS s, COUNT(*) AS n
    FROM ev GROUP BY event_type, hr
), day AS (
    SELECT event_type, hr // 24 AS d,
           CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
    FROM hour GROUP BY event_type, hr // 24
), fyd AS (
    SELECT event_type, d, s, n,
           YEAR(DATE '1970-01-01' + CAST(d AS INTEGER)) AS yy
    FROM day
), anch AS (
    SELECT event_type, d, s, n, yy,
           {_r454_anchor_sql('yy')} AS a1,
           {_r454_anchor_sql('(yy - 1)')} AS a0
    FROM fyd
), wks AS (
    SELECT event_type, d, s, n,
           CASE WHEN d >= a1 THEN yy ELSE yy - 1 END AS fy,
           LEAST((d - CASE WHEN d >= a1 THEN a1 ELSE a0 END) // 7, 52)
               AS wk
    FROM anch
), pats AS ({pats})
SELECT p.variant AS variant, w.event_type AS event_type,
       'FY' || CAST(w.fy AS VARCHAR) || '-M'
            || lpad(CAST((w.wk // 13) * 3
                    + (CASE WHEN w.wk - (w.wk // 13) * 13 < p.b1 THEN 1
                            WHEN w.wk - (w.wk // 13) * 13 < p.b2 THEN 2
                            ELSE 3 END) AS VARCHAR), 2, '0') AS fm,
       CAST(SUM(w.n) AS BIGINT) AS n_events,
       COUNT(*) AS n_active_days,
       CAST(SUM(w.s) AS BIGINT) / {VALUE_MICRO}.0 AS sum_value
FROM wks w CROSS JOIN pats p
GROUP BY 1, 2, 3
ORDER BY variant, event_type, fm
"""


register("events_retail_calendar_months", events_retail_calendar_months,
         _retail_variants_oracle(),
         "4-5-4 / 4-4-5 / 5-4-4 retail month rollups in one day-spine pass")
