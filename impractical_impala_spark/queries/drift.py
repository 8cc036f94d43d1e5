"""Distribution-drift detection and statistical QA operators.

The monitoring family a training-data pipeline runs between snapshot
ingests: "did this week's data shift?" (KS test, chi-square), "how
concentrated is the load?" (Gini), "what is the smoothed trend?"
(EWMA), "how deep is the backlog?" (interval sweep-line). Each is built
in its scale-correct decomposition:

- KS drift: the two-sample Kolmogorov-Smirnov statistic over a
  QUANTIZED value domain (256 bins from a broadcast 1-row min/max), so
  the ECDF window runs over bounded cardinality (<= types x 256 rows)
  instead of a total order over every distinct double. The D statistic
  numerator max|cumA*nB - cumB*nA| is exact INTEGER arithmetic; one
  rounded division at the end.
- backlog sweep-line: intervals collapse to +1/-1 deltas per calendar
  day FIRST (fact-size shuffle to a ~few-thousand-row delta table),
  then the running sum runs over day cardinality — bounded by the
  calendar, not the data volume.
- Gini: per-supplier cents-exact revenue ranked WITHIN nation
  partitions; numerator 2*sum(rk*rev) - (n+1)*sum(rev) stays integer.
  Ranks run over the supplier AGGREGATE (dimension-sized), never the
  fact table.
- EWMA: alpha=1/2 exponential smoothing as a 16-term lag polynomial
  with power-of-two weights — sum(cnt_k * 2^(15-k)) is an exact
  integer on both engines, and the emitted value is an integer
  fixed-point division (x1000), so there is NO floating-point
  accumulation anywhere. Partition cardinality is (event_type x hour):
  grows with time span, not data volume.
- chi-square: the contingency table is (event_type x daypart) — model
  size — so row/column totals attach via broadcast 1-row/`k`-row
  aggregates and the float work happens once per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..quantum import HOUR_NS, VALUE_MICRO
from ..registry import register
from ..sources import load_table

N_KS_BINS = 256
HOUR_US = HOUR_NS // 1000


def clip_bin(value_col, mn_col, mx_col, n_bins: int):
    """Broadcast-range equi-width clip binning — the ONE quantized-
    domain contract shared by ks_drift_frame (256 bins),
    weighted_median_frame (1024 bins) and, in numpy form,
    streaming/drift.py::value_histogram. Change resolution or clamping
    here (and in the SQL oracles), nowhere else.

    Degenerate range (mx == mn, an all-equal column) maps every row to
    bin 0 explicitly: without the guard the 0/0 division yields NaN,
    where Spark floors to NULL-ish NaN and DuckDB errors on the CAST —
    the two engines would disagree on single-valued input."""
    return F.when(mx_col == mn_col, F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1),
                F.floor((value_col - mn_col) * n_bins
                        / (mx_col - mn_col))))


# ------------------------------------------- two-sample KS drift test
def ks_drift_frame(ev: DataFrame) -> DataFrame:
    """Core of events_value_ks_drift over any (event_type, ts_ns, value)
    frame — exposed so the replica scale-up test can inject an inflated
    corpus through the identical plan."""
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
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    w = Window.partitionBy("event_type").orderBy("bin")
    # per-side ppm ECDF before differencing: |cumA/nA - cumB/nB| in
    # integer parts-per-million. cum*1e6 stays inside int64 up to ~9e12
    # rows per side, where cumA*nB would overflow at any billion-row
    # split; the <=1ppm quantization is part of the operator contract.
    gaps = (per_bin
            .withColumn("cum_a", F.sum("ca").over(w))
            .withColumn("cum_b", F.sum("cb").over(w))
            .join(F.broadcast(tot), "event_type")
            .select("event_type", "n_a", "n_b",
                    F.abs(F.expr("cum_a * 1000000 div n_a")
                          - F.expr("cum_b * 1000000 div n_b")).alias("gap")))
    return (gaps.groupBy("event_type")
            .agg(F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"),
                 F.max("gap").alias("ks_ppm"))
            .select("event_type", "n_a", "n_b", "ks_ppm",
                    (F.round(F.col("ks_ppm") / 1000000.0, 6) + 0.0)
                    .alias("ks_d"))
            .orderBy("event_type"))


def events_value_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the two-sample KS statistic between the early and
    late half of the time range (split at the midpoint timestamp — a
    1-row broadcast, never a driver round-trip). Values quantize into
    256 equi-width bins from the broadcast global min/max, so the ECDF
    window is bounded at types x 256 rows no matter the corpus size.
    D's numerator stays integer; the only float op is the final rounded
    division (plus an integer ppm twin)."""
    return ks_drift_frame(load_table(spark, sf_dir, "events")
                          .select("event_type", "ts_ns", "value"))


register("events_value_ks_drift", events_value_ks_drift, f"""
WITH stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v,
           (MIN(CAST(epoch_us(ts) AS BIGINT)) * 1000
            + MAX(CAST(epoch_us(ts) AS BIGINT)) * 1000) // 2 AS mid_ns
    FROM events
), binned AS (
    SELECT event_type,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_KS_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_KS_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin,
           CASE WHEN CAST(epoch_us(ts) AS BIGINT) * 1000 <= mid_ns
                THEN 1 ELSE 0 END AS early
    FROM events CROSS JOIN stats
), per_bin AS (
    SELECT event_type, bin,
           CAST(SUM(early) AS BIGINT) AS ca,
           CAST(SUM(1 - early) AS BIGINT) AS cb
    FROM binned GROUP BY 1, 2
), tot AS (
    SELECT event_type, CAST(SUM(ca) AS BIGINT) AS n_a,
           CAST(SUM(cb) AS BIGINT) AS n_b
    FROM per_bin GROUP BY event_type
), gaps AS (
    SELECT p.event_type, t.n_a, t.n_b,
           ABS(CAST(SUM(p.ca) OVER (PARTITION BY p.event_type
                                    ORDER BY p.bin) AS BIGINT)
                   * 1000000 // t.n_a
               - CAST(SUM(p.cb) OVER (PARTITION BY p.event_type
                                      ORDER BY p.bin) AS BIGINT)
                   * 1000000 // t.n_b) AS gap
    FROM per_bin p JOIN tot t ON p.event_type = t.event_type
)
SELECT event_type, n_a, n_b,
       CAST(MAX(gap) AS BIGINT) AS ks_ppm,
       ROUND(CAST(MAX(gap) AS DOUBLE) / 1000000.0, 6) + 0.0 AS ks_d
FROM gaps GROUP BY event_type, n_a, n_b ORDER BY event_type
""", "two-sample KS drift test over a quantized 256-bin ECDF")


# --------------------------------------- interval sweep-line backlog
def orders_backlog_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open orders per year via the sweep-line
    decomposition: each order's fulfillment interval [o_orderdate,
    max(l_shipdate)] becomes a +1 delta at the start day and a -1 the
    day after the end, deltas aggregate per calendar day (the ONLY
    fact-size shuffle), and the running sum runs over day cardinality —
    bounded by the calendar span, not data volume. The running value is
    a step function that changes only at delta days, so a year's true
    peak is max(carry-in at the year boundary, within-year delta-day
    values); the carry-in is the previous emitted year's last running
    value (no deltas occur in between), folded in via a lag over the
    year-cardinality aggregate. Years with no order activity at all are
    not emitted — that is the operator contract (delta_days is part of
    the output)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("s_day"))
    ship = (load_table(spark, sf_dir, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.expr("datediff(max(l_shipdate), DATE '1970-01-01')")
                 .alias("e_day")))
    iv = orders.join(ship, orders.o_orderkey == ship.l_orderkey)
    deltas = (iv.select(F.col("s_day").alias("day"), F.lit(1).alias("d"))
              .unionAll(iv.select((F.col("e_day") + 1).alias("day"),
                                  F.lit(-1).alias("d")))
              .groupBy("day").agg(F.sum("d").alias("delta")))
    running = deltas.withColumn(
        "open_orders", F.sum("delta").over(Window.orderBy("day")))
    per_year = (running
                .select(F.year(F.expr("date_add(DATE '1970-01-01', "
                                      "cast(day AS int))")).alias("yr"),
                        "day", "open_orders")
                .groupBy("yr")
                .agg(F.max("open_orders").alias("within_peak"),
                     F.max_by("open_orders", "day").alias("last_open"),
                     F.count(F.lit(1)).alias("delta_days")))
    carry = F.coalesce(
        F.lag("last_open").over(Window.orderBy("yr")), F.lit(0))
    return (per_year
            .select("yr",
                    F.greatest("within_peak", carry).alias("peak_open"),
                    "delta_days")
            .orderBy("yr"))


register("orders_backlog_profile", orders_backlog_profile, """
WITH iv AS (
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS s_day,
           MAX(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01') AS e_day
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
), deltas AS (
    SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM (
        SELECT s_day AS day, 1 AS d FROM iv
        UNION ALL
        SELECT e_day + 1 AS day, -1 AS d FROM iv
    ) GROUP BY day
), running AS (
    SELECT day, SUM(delta) OVER (ORDER BY day) AS open_orders
    FROM deltas
), per_year AS (
    SELECT CAST(EXTRACT(year FROM DATE '1970-01-01' + CAST(day AS INT))
                AS INT) AS yr,
           CAST(MAX(open_orders) AS BIGINT) AS within_peak,
           CAST(ARG_MAX(open_orders, day) AS BIGINT) AS last_open,
           COUNT(*) AS delta_days
    FROM running GROUP BY 1
)
SELECT yr,
       CAST(GREATEST(within_peak,
                     COALESCE(LAG(last_open) OVER (ORDER BY yr), 0))
            AS BIGINT) AS peak_open,
       delta_days
FROM per_year ORDER BY yr
""", "sweep-line peak concurrent open orders per year")


# ----------------------------------------- Gini concentration index
def supplier_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini per nation: cents-exact per-supplier
    revenue, ascending rank within the nation partition (supplier
    aggregate — dimension-sized, the same documented bound as
    customer_pareto), and the classic 2*sum(rk*x) identity whose
    numerator stays integer until one rounded division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("cents"))
    per_supp = li.groupBy("l_suppkey").agg(F.sum("cents").alias("rev"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    ranked = (per_supp
              .join(F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey)
              .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
              .withColumn("rk", F.row_number().over(
                  Window.partitionBy("n_name")
                  .orderBy("rev", "l_suppkey"))))
    return (ranked.groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.sum("rev").alias("total_cents"),
                 F.sum(F.col("rk") * F.col("rev")).alias("srw"))
            .select("n_name", "n_suppliers", "total_cents",
                    (F.round((2 * F.col("srw")
                              - (F.col("n_suppliers") + 1)
                              * F.col("total_cents"))
                             / (F.col("n_suppliers") * F.col("total_cents")),
                             6) + 0.0).alias("gini"))
            .orderBy("n_name"))


register("supplier_gini_by_nation", supplier_gini_by_nation, """
WITH per_supp AS (
    SELECT l_suppkey,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS rev
    FROM lineitem GROUP BY l_suppkey
), ranked AS (
    SELECT n_name, rev,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY rev, l_suppkey) AS rk
    FROM per_supp
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       ROUND(CAST(2 * SUM(rk * rev) - (COUNT(*) + 1) * SUM(rev) AS DOUBLE)
             / (COUNT(*) * SUM(rev)), 6) + 0.0 AS gini
FROM ranked GROUP BY n_name ORDER BY n_name
""", "cents-exact within-nation Gini revenue concentration")


# ------------------------------------- integer-exact EWMA smoothing
EWMA_TERMS = 16


def _ewma_terms_sql() -> tuple[str, str]:
    """The 16-term lag polynomial, shared verbatim by the Spark plan
    (via F.expr — Spark SQL accepts inline OVER clauses) and the DuckDB
    oracle: same text, same integer arithmetic, bit-identical result."""
    over = "OVER (PARTITION BY event_type ORDER BY hr)"
    scaled = [f"cnt * {1 << (EWMA_TERMS - 1)}"]
    norm = [str(1 << (EWMA_TERMS - 1))]
    for k in range(1, EWMA_TERMS):
        weight = 1 << (EWMA_TERMS - 1 - k)
        scaled.append(f"COALESCE(LAG(cnt, {k}) {over}, 0) * {weight}")
        norm.append(f"CASE WHEN LAG(cnt, {k}) {over} IS NULL"
                    f" THEN 0 ELSE {weight} END")
    return " + ".join(scaled), " + ".join(norm)


_SCALED_SQL, _NORM_SQL = _ewma_terms_sql()


def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=1/2 EWMA of hourly event counts per event type, as a
    16-term lag polynomial with power-of-two weights: scaled =
    sum(cnt_{t-k} * 2^(15-k)) is exact INTEGER arithmetic, and the
    emitted smoothed value is the fixed-point integer scaled*1000 div
    norm — no floating-point accumulation anywhere, so both engines
    agree bit-for-bit. Counts first land on a DENSE per-type hourly
    spine (events_gapfill_locf's pattern) so the lag steps are true
    HOURS — a 23-hour gap decays the EWMA by 2^-23, it doesn't get
    skipped as one row. Spine and window cardinality grow with the
    time span, not the data volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return ewma_from_hourly(hourly)


def ewma_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_ewma_hourly over any (event_type, hr, cnt)
    hourly-count frame — shared with the streaming twin's finalizer
    (streaming/ewma.py), the fano/cusum/autocorr discipline, so the
    streamed EWMA series is bit-equal to the batch one by
    construction. Fresh-exprId same-name aliases on the spine-join's
    right side (the memory-sink gotcha; no-op Project in the batch
    plan)."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    return (dense
            .select("event_type", "hr", F.col("cnt").alias("n_events"),
                    F.expr(f"CAST(({_SCALED_SQL}) * 1000"
                           f" div ({_NORM_SQL}) AS BIGINT)")
                    .alias("ewma_milli"))
            .orderBy("event_type", "hr"))

register("events_ewma_hourly", events_ewma_hourly, f"""
WITH hourly AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // {HOUR_US} AS hr,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly
    GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
)
SELECT event_type, hr, cnt AS n_events,
       CAST(({_SCALED_SQL}) * 1000 // ({_NORM_SQL}) AS BIGINT)
           AS ewma_milli
FROM dense ORDER BY event_type, hr
""", "integer-exact alpha=1/2 EWMA on a dense hourly spine (2^-k lags)")


# -------------------------- value-weighted integer-exact EWMA
def value_ewma_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_value_ewma_hourly over any (event_type, hr, s)
    frame where ``s`` is the hour's micro-quantized value sum (sum of
    floor(value * 10000) per event) — the VALUE-weighted sibling of
    ewma_from_hourly, shared with the streaming twin's finalizer
    (streaming/value_ewma.py) so the streamed series is bit-equal to
    batch by construction. The identical 16-term power-of-two lag
    polynomial runs over the micro sums: scaled = sum(s_{t-k} *
    2^(15-k)) stays exact int64 while the per-hour micro sum is below
    ~1.4e11 (value sums of ~1.4e7 per type-hour — far past any fixture;
    at 100 TB rescale the quantum before this bound, the same dial as
    the state row's). Emitted vewma_milli is the fixed-point integer
    scaled*1000 div norm — milli-micro units, i.e. value*1e7. The lag
    polynomial's column is named ``cnt`` because _SCALED_SQL/_NORM_SQL
    are shared verbatim with the count EWMA (same text on both
    engines); here it carries the micro sum. One convention boundary
    the count EWMA cannot hit: counts are structurally >= 0, while a
    NEGATIVE per-hour value sum would make the final division diverge
    between Spark's truncating ``div`` and the oracle's flooring ``//``
    — the standing batch-vs-oracle convention (dailyfold note), moot on
    the fixtures (value >= 0) and irrelevant to the streaming twin,
    which runs this exact helper on both sides."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("s").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    return (dense
            .select("event_type", "hr", F.col("cnt").alias("value_micro"),
                    F.expr(f"CAST(({_SCALED_SQL}) * 1000"
                           f" div ({_NORM_SQL}) AS BIGINT)")
                    .alias("vewma_milli"))
            .orderBy("event_type", "hr"))


def events_value_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=1/2 EWMA of hourly VALUE throughput per event type — the
    value-weighted member of the EWMA family (ROADMAP r14 candidate
    surface): where events_ewma_hourly smooths the event count, this
    smooths the per-hour micro-quantized value sum, in the same exact
    integer arithmetic (power-of-two weights, one truncating division),
    so both engines agree bit-for-bit and the streaming twin can fold
    the identical series from the shared value-weighted hourly state.
    Dense spine discipline as the count EWMA: a 23-hour gap decays the
    smoothed throughput by 2^-23 instead of being skipped."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"),
        F.floor(F.col("value") * VALUE_MICRO).cast("long").alias("m"))
    hourly = ev.groupBy("event_type", "hr").agg(F.sum("m").alias("s"))
    return value_ewma_from_hourly(hourly)


register("events_value_ewma_hourly", events_value_ewma_hourly, f"""
WITH hourly AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) // {HOUR_US} AS hr,
           CAST(SUM(CAST(FLOOR(value * {VALUE_MICRO}) AS BIGINT)) AS BIGINT) AS s
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly
    GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.s, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
)
SELECT event_type, hr, cnt AS value_micro,
       CAST(({_SCALED_SQL}) * 1000 // ({_NORM_SQL}) AS BIGINT)
           AS vewma_milli
FROM dense ORDER BY event_type, hr
""", "integer-exact alpha=1/2 EWMA of hourly value throughput (micro sums)")


# --------------------------------- chi-square independence test
def events_chi2_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence scan of event_type x daypart (6-hour
    buckets of the hour-of-day): observed integer counts, expected
    row_total*col_total/N, per-cell contribution. The contingency table
    is model-sized (types x 4), so the marginals attach via broadcast
    k-row aggregates and every float op runs once per cell."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"((ts_ns div {HOUR_NS}) % 24) div 6").alias("daypart"))
    obs = ev.groupBy("event_type", "daypart").agg(
        F.count(F.lit(1)).alias("obs"))
    row_t = obs.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    col_t = obs.groupBy("daypart").agg(F.sum("obs").alias("ct"))
    n_tot = obs.agg(F.sum("obs").alias("n"))
    # rt cast to double BEFORE the multiply: bigint rt*ct would wrap past
    # int64 at ~3e9 rows per marginal (non-ANSI Spark wraps silently), and
    # the double-first association matches the oracle's CAST(rt AS DOUBLE)
    # so both engines round identically past 2^53.
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    return (obs
            .join(F.broadcast(row_t), "event_type")
            .join(F.broadcast(col_t), "daypart")
            .crossJoin(F.broadcast(n_tot))
            .select("event_type", "daypart", "obs",
                    (F.round(exp, 4) + 0.0).alias("expected"),
                    (F.round((F.col("obs") - exp) * (F.col("obs") - exp)
                             / exp, 6) + 0.0).alias("chi2_part"))
            .orderBy("event_type", "daypart"))


register("events_chi2_daypart", events_chi2_daypart, f"""
WITH ev AS (
    SELECT event_type,
           ((CAST(epoch_us(ts) AS BIGINT) // {HOUR_US}) % 24) // 6
               AS daypart
    FROM events
), obs AS (
    SELECT event_type, daypart, COUNT(*) AS obs FROM ev GROUP BY 1, 2
), row_t AS (
    SELECT event_type, CAST(SUM(obs) AS BIGINT) AS rt
    FROM obs GROUP BY event_type
), col_t AS (
    SELECT daypart, CAST(SUM(obs) AS BIGINT) AS ct FROM obs GROUP BY daypart
), n_tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM obs)
SELECT o.event_type, o.daypart, o.obs,
       ROUND(CAST(rt AS DOUBLE) * ct / n, 4) + 0.0 AS expected,
       ROUND((o.obs - CAST(rt AS DOUBLE) * ct / n)
             * (o.obs - CAST(rt AS DOUBLE) * ct / n)
             / (CAST(rt AS DOUBLE) * ct / n), 6) + 0.0 AS chi2_part
FROM obs o
JOIN row_t USING (event_type)
JOIN col_t USING (daypart)
CROSS JOIN n_tot
ORDER BY o.event_type, o.daypart
""", "chi-square independence contributions over a model-size table")


# --------------------------- population stability index (PSI) drift
N_PSI_BINS = 64
PSI_SMOOTH_K = 4096  # smoothing scale: pseudo-mass = NB/(n*K + NB)


def doc_length_psi_frame(docs: DataFrame) -> DataFrame:
    """Core of doc_length_drift_psi over any (source, n_chars) frame —
    exposed for the replica scale-up test. Per-source length
    distribution vs the whole-corpus distribution over N_PSI_BINS
    equi-width bins (broadcast min/max, clip_bin contract). Zero bins
    are smoothed with a SCALED Laplace term, p = (c*K + 1)/(n*K + NB)
    with K = 4096: plain +1 smoothing injects NB pseudo-counts, which
    dominates any source smaller than ~NB docs and makes the statistic
    drift under corpus replication; the scaled form keeps the
    pseudo-mass at NB/(n*K + NB) (~0.06% even at 25 docs) so PSI
    measures the distribution, not the smoother. All inputs stay
    integer; each non-negative (pa-pb)*ln(pa/pb) term is quantized to
    nano units BEFORE summing (the bigram-surprisal convention), so the
    cross-partition sum is pure integer — no float accumulation order
    anywhere. Work after the per-bin aggregate is sources x 64 rows."""
    stats = docs.agg(F.min("n_chars").alias("mn"),
                     F.max("n_chars").alias("mx"))
    binned = (docs.crossJoin(F.broadcast(stats))
              .select("source",
                      clip_bin(F.col("n_chars").cast("double"),
                               F.col("mn").cast("double"),
                               F.col("mx").cast("double"),
                               N_PSI_BINS).alias("bin")))
    src_bin = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("ca"))
    corpus_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cb"))
    src_tot = src_bin.groupBy("source").agg(F.sum("ca").alias("na"))
    n_tot = corpus_bin.agg(F.sum("cb").alias("n"))
    # dense (source x bin) spine: missing bins must contribute their
    # smoothed mass, and the spine is model-sized (sources x 64)
    spine = (src_tot.select("source", "na")
             .crossJoin(F.broadcast(
                 corpus_bin.crossJoin(F.broadcast(n_tot)))))
    pa = (F.coalesce(F.col("ca"), F.lit(0)) * PSI_SMOOTH_K + 1) \
        / (F.col("na") * PSI_SMOOTH_K + F.lit(N_PSI_BINS)).cast("double")
    pb = (F.col("cb") * PSI_SMOOTH_K + 1) \
        / (F.col("n") * PSI_SMOOTH_K + F.lit(N_PSI_BINS)).cast("double")
    part_nano = F.floor((pa - pb) * F.log(pa / pb) * 1e9).cast("long")
    return (spine.join(src_bin, ["source", "bin"], "left")
            .select("source", "na", part_nano.alias("part_nano"))
            .groupBy("source")
            .agg(F.first("na").alias("n_docs"),
                 F.sum("part_nano").alias("psi_nano"))
            .select("source", "n_docs", "psi_nano",
                    (F.round(F.col("psi_nano") / 1e9, 6) + 0.0).alias("psi"))
            .orderBy("source"))


def doc_length_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole corpus — the standard production
    drift gate next to the KS test (PSI > 0.25 conventionally blocks a
    snapshot). See doc_length_psi_frame for the decomposition."""
    return doc_length_psi_frame(
        load_table(spark, sf_dir, "documents").select("source", "n_chars"))


register("doc_length_drift_psi", doc_length_drift_psi, f"""
WITH stats AS (
    SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents
), binned AS (
    SELECT source,
           CASE WHEN mx = mn THEN 0 ELSE
                LEAST({N_PSI_BINS - 1},
                      CAST(FLOOR((CAST(n_chars AS DOUBLE) - mn)
                                 * {N_PSI_BINS} / (mx - mn))
                           AS BIGINT)) END AS bin
    FROM documents CROSS JOIN stats
), src_bin AS (
    SELECT source, bin, COUNT(*) AS ca FROM binned GROUP BY 1, 2
), corpus_bin AS (
    SELECT bin, COUNT(*) AS cb FROM binned GROUP BY bin
), src_tot AS (
    SELECT source, CAST(SUM(ca) AS BIGINT) AS na FROM src_bin
    GROUP BY source
), n_tot AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM corpus_bin),
spine AS (
    SELECT s.source, s.na, c.bin, c.cb, t.n
    FROM src_tot s CROSS JOIN corpus_bin c CROSS JOIN n_tot t
), terms AS (
    SELECT source, na,
           CAST(FLOOR(
               ((COALESCE(sb.ca, 0) * {PSI_SMOOTH_K} + 1)
                    / CAST(na * {PSI_SMOOTH_K} + {N_PSI_BINS} AS DOUBLE)
                - (cb * {PSI_SMOOTH_K} + 1)
                    / CAST(n * {PSI_SMOOTH_K} + {N_PSI_BINS} AS DOUBLE))
               * LN(((COALESCE(sb.ca, 0) * {PSI_SMOOTH_K} + 1)
                     / CAST(na * {PSI_SMOOTH_K} + {N_PSI_BINS} AS DOUBLE))
                    / ((cb * {PSI_SMOOTH_K} + 1)
                       / CAST(n * {PSI_SMOOTH_K} + {N_PSI_BINS} AS DOUBLE)))
               * 1e9) AS BIGINT) AS part_nano
    FROM spine LEFT JOIN src_bin sb USING (source, bin)
)
SELECT source, ANY_VALUE(na) AS n_docs,
       CAST(SUM(part_nano) AS BIGINT) AS psi_nano,
       ROUND(CAST(SUM(part_nano) AS DOUBLE) / 1e9, 6) + 0.0 AS psi
FROM terms GROUP BY source ORDER BY source
""", "per-source PSI length-distribution drift vs the corpus")


# ------------------------- ratio-to-moving-average seasonal index
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of monthly order revenue: the
    ratio-to-moving-average index per calendar month. Monthly cents
    land on a DENSE month spine (the EWMA spine discipline — a missing
    month is a real zero, not a skipped lag), each month's ratio is the
    exact integer cents*12e6 div trailing-12-month-sum (emitted only
    with full history), and the per-calendar-month index is the integer
    mean of those ratios. Spine and window cardinality are calendar-
    bounded; the fact table is touched once for the monthly aggregate.
    Zero floating point anywhere."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
        .alias("mkey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    monthly = orders.groupBy("mkey").agg(F.sum("cents").alias("cents"))
    bounds = monthly.agg(F.min("mkey").alias("m0"), F.max("mkey").alias("m1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(m0, m1)")).alias("mkey"))
    dense = (spine.join(monthly, "mkey", "left")
             .withColumn("cents", F.coalesce(F.col("cents"), F.lit(0))))
    w12 = Window.orderBy("mkey").rowsBetween(-11, 0)
    ratios = (dense
              .withColumn("sum12", F.sum("cents").over(w12))
              .withColumn("n12", F.count(F.lit(1)).over(w12))
              .filter((F.col("n12") == 12) & (F.col("sum12") > 0))
              .select((F.col("mkey") % 12 + 1).alias("month_of_year"),
                      F.expr("cents * 12000000 div sum12").alias("ratio_ppm")))
    return (ratios.groupBy("month_of_year")
            .agg(F.count(F.lit(1)).alias("n_months"),
                 F.expr("sum(ratio_ppm) div count(1)")
                 .alias("seasonal_index_ppm"))
            .orderBy("month_of_year"))


register("orders_seasonal_index", orders_seasonal_index, """
WITH monthly AS (
    SELECT EXTRACT(year FROM o_orderdate) * 12
           + EXTRACT(month FROM o_orderdate) - 1 AS mkey,
           SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
), bounds AS (
    SELECT MIN(mkey) AS m0, MAX(mkey) AS m1 FROM monthly
), spine AS (
    SELECT UNNEST(range(m0, m1 + 1)) AS mkey FROM bounds
), dense AS (
    SELECT s.mkey, COALESCE(m.cents, 0) AS cents
    FROM spine s LEFT JOIN monthly m ON s.mkey = m.mkey
), ratios AS (
    SELECT CAST(mkey % 12 + 1 AS BIGINT) AS month_of_year,
           cents * 12000000
           // SUM(cents) OVER (ORDER BY mkey
                               ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
               AS ratio_ppm,
           COUNT(*) OVER (ORDER BY mkey
                          ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS n12,
           SUM(cents) OVER (ORDER BY mkey
                            ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
               AS sum12
    FROM dense
)
SELECT month_of_year, COUNT(*) AS n_months,
       CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS seasonal_index_ppm
FROM ratios WHERE n12 = 12 AND sum12 > 0
GROUP BY month_of_year ORDER BY month_of_year
""", "integer ratio-to-moving-average monthly seasonal index")


# ----------------------- inter-arrival gap order statistics
N_GAP_BINS = 256


def interarrival_frame(ev: DataFrame) -> DataFrame:
    """Core of events_interarrival_profile over any (event_type, ts_ns,
    event_id) frame — exposed for the replica scale-up test. Gaps come
    from one lag per type (the sessionization shuffle — key-partitioned,
    no total order); their median and p90 use the quantized first-
    crossing scan over per-TYPE 256-bin histograms (per-type min/max
    attach via a type-dimension broadcast), so the order-statistic
    windows run over types x 256 rows while the integer bin bounds and
    counts hash exactly."""
    wlag = Window.partitionBy("event_type").orderBy("ts_ns", "event_id")
    gaps = (ev
            .withColumn("gap", F.col("ts_ns")
                        - F.lag("ts_ns").over(wlag))
            .filter(F.col("gap").isNotNull())
            .select("event_type", "gap"))
    stats = gaps.groupBy("event_type").agg(
        F.min("gap").alias("mn"), F.max("gap").alias("mx"))
    binned = (gaps.join(F.broadcast(stats), "event_type")
              .select("event_type", "mn", "mx",
                      clip_bin(F.col("gap").cast("double"),
                               F.col("mn").cast("double"),
                               F.col("mx").cast("double"),
                               N_GAP_BINS).alias("bin")))
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("mn").alias("mn"), F.first("mx").alias("mx"))
    wcum = Window.partitionBy("event_type").orderBy("bin")
    tot = per_bin.groupBy("event_type").agg(F.sum("c").alias("n_gaps"))
    cum = (per_bin.withColumn("cum", F.sum("c").over(wcum))
           .join(F.broadcast(tot), "event_type"))
    med = (cum.filter(F.col("cum") * 2 >= F.col("n_gaps"))
           .groupBy("event_type").agg(F.min("bin").alias("med_bin")))
    p90 = (cum.filter(F.col("cum") * 10 >= F.col("n_gaps") * 9)
           .groupBy("event_type").agg(F.min("bin").alias("p90_bin")))
    return (tot
            .join(F.broadcast(stats), "event_type")
            .join(F.broadcast(med), "event_type")
            .join(F.broadcast(p90), "event_type")
            .select("event_type", "n_gaps",
                    F.col("mn").alias("mn_gap_ns"),
                    F.col("mx").alias("mx_gap_ns"),
                    "med_bin", "p90_bin")
            .orderBy("event_type"))


def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type: gap count, exact
    min/max gap, and quantized median / p90 gap bins (bin resolution is
    the operator contract, the events_value_ks_drift trade). The lag
    runs key-partitioned per type; everything after the per-bin
    aggregate is bounded at types x 256 rows."""
    return interarrival_frame(
        load_table(spark, sf_dir, "events").select(
            "event_type", "ts_ns", "event_id"))


register("events_interarrival_profile", events_interarrival_profile, f"""
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns,
           event_id
    FROM events
), gaps AS (
    SELECT event_type,
           ts_ns - LAG(ts_ns) OVER (PARTITION BY event_type
                                    ORDER BY ts_ns, event_id) AS gap
    FROM ev
), g AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL),
stats AS (
    SELECT event_type, MIN(gap) AS mn, MAX(gap) AS mx
    FROM g GROUP BY event_type
), binned AS (
    SELECT g.event_type,
           CASE WHEN mx = mn THEN 0 ELSE
                LEAST({N_GAP_BINS - 1},
                      CAST(FLOOR((CAST(gap AS DOUBLE) - mn) * {N_GAP_BINS}
                                 / (mx - mn)) AS BIGINT)) END AS bin
    FROM g JOIN stats ON g.event_type = stats.event_type
), per_bin AS (
    SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
), tot AS (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_gaps FROM per_bin
    GROUP BY event_type
), cum AS (
    SELECT p.event_type, p.bin,
           CAST(SUM(p.c) OVER (PARTITION BY p.event_type ORDER BY p.bin)
                AS BIGINT) AS cum,
           t.n_gaps
    FROM per_bin p JOIN tot t ON p.event_type = t.event_type
), med AS (
    SELECT event_type, MIN(bin) AS med_bin FROM cum
    WHERE cum * 2 >= n_gaps GROUP BY event_type
), p90 AS (
    SELECT event_type, MIN(bin) AS p90_bin FROM cum
    WHERE cum * 10 >= n_gaps * 9 GROUP BY event_type
)
SELECT t.event_type, t.n_gaps, s.mn AS mn_gap_ns, s.mx AS mx_gap_ns,
       m.med_bin, p.p90_bin
FROM tot t
JOIN stats s ON t.event_type = s.event_type
JOIN med m ON t.event_type = m.event_type
JOIN p90 p ON t.event_type = p.event_type
ORDER BY t.event_type
""", "per-type inter-arrival gap profile: quantized median/p90 bins")


# --------------------------------- burstiness (index of dispersion)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, population var/mean) of hourly
    event counts per type — the burstiness gauge that separates Poisson
    arrival (~1000 milli) from bursty traffic (>>1000). Counts land on
    the dense hourly spine (events_ewma_hourly's discipline — silent
    hours are real zeros), then the statistic is three integer sums
    (n, S1 = sum c, S2 = sum c^2) and ONE integer fixed-point division:
    fano_milli = (n*S2 - S1^2) * 1000 div (n * S1). n*S2 and S1^2 stay
    inside int64 while S1 < ~3e9 events per type; past that the named
    fallback is double-typed sufficient statistics (the
    audience_overlap_matrix documented-bound convention)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return fano_from_hourly(hourly)


def fano_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_fano_burstiness over any (event_type, hr, cnt)
    hourly-count frame — shared with the streaming twin's finalizer
    (streaming/fano.py), the autocorr24_from_hourly / cusum_frame
    discipline, so the streamed Fano factor is bit-equal to the batch
    one by construction. Fresh-exprId same-name aliases on the
    spine-join's right side (the memory-sink gotcha; no-op Project in
    the batch plan)."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    return (dense.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_hours"),
                 F.sum("cnt").alias("n_events"),
                 F.sum(F.col("cnt") * F.col("cnt")).alias("s2"))
            .select("event_type", "n_hours", "n_events",
                    F.expr("(n_hours * s2 - n_events * n_events) * 1000"
                           " div (n_hours * n_events)").alias("fano_milli"))
            .orderBy("event_type"))


register("events_fano_burstiness", events_fano_burstiness, f"""
WITH hourly AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // {HOUR_US} AS hr,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly
    GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
)
SELECT event_type, COUNT(*) AS n_hours,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST((COUNT(*) * SUM(cnt * cnt) - SUM(cnt) * SUM(cnt)) * 1000
            // (COUNT(*) * SUM(cnt)) AS BIGINT) AS fano_milli
FROM dense GROUP BY event_type ORDER BY event_type
""", "integer Fano-factor burstiness of hourly counts per type")


# ------------------------- daily-seasonality lag-24 autocorrelation
def autocorr24_from_hourly(hourly: DataFrame) -> DataFrame:
    """Lag-24 Pearson from a sparse (event_type, hr, cnt) hourly table:
    dense spine, one lag, five integer sufficient statistics (the
    o26_corr formula). Shared verbatim by the batch query below and the
    streaming twin's finalize (streaming/autocorr.py) so the two are
    bit-equal by construction — the freshness-twin pattern."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    # COLUMN-level aliases mint fresh exprIds for the self-join's right
    # side: spine derives from `hourly`, and when `hourly` is read from
    # a streaming memory sink the shared plan object otherwise hits
    # "Conflicting attributes" (the recorded memory-sink gotcha).
    # Collapses to a no-op Project in the batch plan — values and node
    # counts unchanged.
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    wl = Window.partitionBy("event_type").orderBy("hr")
    lagged = (dense
              .withColumn("prev", F.lag("cnt", 24).over(wl))
              .filter(F.col("prev").isNotNull()))
    stats = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"), F.sum("prev").alias("sy"),
        F.sum(F.col("cnt") * F.col("prev")).alias("sxy"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sx2"),
        F.sum(F.col("prev") * F.col("prev")).alias("sy2"))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
                 .cast("double")
                 * (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy"))
                 .cast("double"))
    return (stats.select("event_type", "n",
                         (F.round(num.cast("double") / den, 6) + 0.0)
                         .alias("r24"))
            .orderBy("event_type"))


def events_hourly_autocorr24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 Pearson autocorrelation of hourly counts per event type —
    the daily-seasonality detector (high r24 = strong diurnal cycle).
    Dense hourly spine, one lag, then Pearson from five integer
    sufficient statistics (the o26_corr formula); the only float work
    is the final covariance/stddev division, rounded. Window
    cardinality is the hourly spine — time-span-bounded."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return autocorr24_from_hourly(hourly)


register("events_hourly_autocorr24", events_hourly_autocorr24, f"""
WITH hourly AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // {HOUR_US} AS hr,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly
    GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), lagged AS (
    SELECT event_type, cnt,
           LAG(cnt, 24) OVER (PARTITION BY event_type ORDER BY hr) AS prev
    FROM dense
), l AS (SELECT * FROM lagged WHERE prev IS NOT NULL),
stats AS (
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(cnt) AS BIGINT) AS sx, CAST(SUM(prev) AS BIGINT) AS sy,
           CAST(SUM(cnt * prev) AS BIGINT) AS sxy,
           CAST(SUM(cnt * cnt) AS BIGINT) AS sx2,
           CAST(SUM(prev * prev) AS BIGINT) AS sy2
    FROM l GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sx2 - sx * sx AS DOUBLE)
                    * CAST(n * sy2 - sy * sy AS DOUBLE)), 6) + 0.0 AS r24
FROM stats ORDER BY event_type
""", "lag-24 autocorrelation of hourly counts (diurnal-cycle detector)")


# ------------------------------------------- CUSUM change-point scan
def cusum_frame(hourly: DataFrame) -> DataFrame:
    """Core of events_cusum_changepoint over any (event_type, hr, cnt)
    hourly-count frame — exposed so the replica scale-up test can push
    a scaled corpus through the identical plan."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    # fresh-exprId aliases on the self-join's right side (the
    # memory-sink gotcha; no-op in the batch plan) — required now that
    # the streaming CUSUM twin finalizes through this same helper
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    w = Window.partitionBy("event_type").orderBy("hr")
    # the tot/peak join-backs re-reference the dense/scan lineage —
    # same memory-sink hazard as above, same no-op fresh-exprId fix
    tot = (dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("cnt").alias("total"))
        .select(F.col("event_type").alias("event_type"),
                F.col("n_hours").alias("n_hours"),
                F.col("total").alias("total")))
    scan = (dense
            .withColumn("cum", F.sum("cnt").over(w))
            .withColumn("t", F.row_number().over(w))
            .join(F.broadcast(tot), "event_type")
            .select("event_type", "hr", "n_hours", "total",
                    F.abs(F.col("n_hours") * F.col("cum")
                          - F.col("t") * F.col("total")).alias("s_abs")))
    peak = (scan.groupBy("event_type").agg(
        F.max("s_abs").alias("cusum_scaled"))
        .select(F.col("event_type").alias("event_type"),
                F.col("cusum_scaled").alias("cusum_scaled")))
    return (scan.join(F.broadcast(peak), "event_type")
            .filter(F.col("s_abs") == F.col("cusum_scaled"))
            .groupBy("event_type")
            .agg(F.first("n_hours").alias("n_hours"),
                 F.first("total").alias("total_events"),
                 F.first("cusum_scaled").alias("cusum_scaled"),
                 F.min("hr").alias("cp_hr"))
            .orderBy("event_type"))


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detector over hourly event counts per type:
    S_t = sum_{k<=t}(cnt_k - mean), the classic level-shift statistic
    (Page 1954) whose peak |S_t| marks the most likely change hour.
    Counts land on the DENSE per-type hourly spine first (the
    events_ewma_hourly convention) so quiet hours pull the statistic
    down instead of being skipped. The mean is fractional, so the
    emitted statistic is the n-SCALED form n*S_t = n*cum_t - t*total —
    exact INTEGER arithmetic end to end (|n*S| <= n_hours * total; at
    1e5 hours x 1e12 events that is 1e17, inside int64 — past that you
    shard the spine by year before scanning). The argmax hour
    tie-breaks to the EARLIEST hour (MIN over hours attaining the max),
    making the answer deterministic on both engines. Window/spine
    cardinality is (event_type x hours): grows with the time span,
    never the data volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    return cusum_frame(ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt")))


register("events_cusum_changepoint", events_cusum_changepoint, f"""
WITH hourly AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS hr,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
    FROM hourly GROUP BY event_type
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), tot AS (
    SELECT event_type, COUNT(*) AS n_hours, CAST(SUM(cnt) AS BIGINT) AS total
    FROM dense GROUP BY event_type
), scan AS (
    SELECT d.event_type, d.hr, t.n_hours, t.total,
           ABS(t.n_hours * CAST(SUM(d.cnt) OVER (PARTITION BY d.event_type
                                                 ORDER BY d.hr) AS BIGINT)
               - CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                                         ORDER BY d.hr) AS BIGINT)
                 * t.total) AS s_abs
    FROM dense d JOIN tot t ON d.event_type = t.event_type
), peak AS (
    SELECT event_type, MAX(s_abs) AS cusum_scaled FROM scan GROUP BY event_type
)
SELECT s.event_type, ANY_VALUE(s.n_hours) AS n_hours,
       ANY_VALUE(s.total) AS total_events,
       ANY_VALUE(p.cusum_scaled) AS cusum_scaled,
       MIN(s.hr) AS cp_hr
FROM scan s JOIN peak p
  ON s.event_type = p.event_type AND s.s_abs = p.cusum_scaled
GROUP BY s.event_type ORDER BY s.event_type
""", "CUSUM level-shift change-point over dense hourly counts")


# --------------------------------- Mann-Whitney U / rank-sum drift test
def mw_rank_frame(ev: DataFrame) -> DataFrame:
    """Core of events_mw_rank_drift over any (event_type, ts_ns, value)
    frame — exposed for the replica scale-up test."""
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
    w = Window.partitionBy("event_type").orderBy("bin")
    terms = (per_bin
             .withColumn("cum_ca", F.sum("ca").over(w))
             .select("event_type", "ca", "cb",
                     (F.col("cb") * (2 * (F.col("cum_ca") - F.col("ca"))
                                     + F.col("ca"))).alias("u2_term")))
    return (terms.groupBy("event_type")
            .agg(F.sum("ca").alias("n_early"),
                 F.sum("cb").alias("n_late"),
                 F.sum("u2_term").alias("u2"))
            .select("event_type", "n_early", "n_late", "u2",
                    (F.round(F.col("u2") / (2.0 * F.col("n_early")
                                            * F.col("n_late")), 6) + 0.0)
                    .alias("auc_late_gt_early"))
            .orderBy("event_type"))


def events_mw_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) drift test between the early and late
    half of each event type's value stream — the effect-size companion
    to events_value_ks_drift: U/(nA*nB) is exactly P(late > early)
    (the AUC), robust to outliers where a mean-shift test is not.
    Values quantize into the shared 256-bin domain (clip_bin), so ranks
    never total-order the fact table: with per-bin early/late counts
    ca/cb, the tie-corrected doubled statistic is
        u2 = sum_bins cb * (2 * cum_ca_below + ca)     (exact integer)
    i.e. each LATE row counts 2 per early row strictly below its bin
    and 1 per tied one. |u2| <= 2*nA*nB, so int64 holds to ~2.1e9 rows per side
    per type; past that you pre-shard the halves and sum u2 partials.
    The emitted AUC is one rounded float division on exact integers."""
    return mw_rank_frame(load_table(spark, sf_dir, "events")
                         .select("event_type", "ts_ns", "value"))


register("events_mw_rank_drift", events_mw_rank_drift, f"""
WITH stats AS (
    SELECT MIN(value) AS mn_v, MAX(value) AS mx_v,
           (MIN(CAST(epoch_us(ts) AS BIGINT)) * 1000
            + MAX(CAST(epoch_us(ts) AS BIGINT)) * 1000) // 2 AS mid_ns
    FROM events
), binned AS (
    SELECT event_type,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                LEAST({N_KS_BINS - 1},
                      CAST(FLOOR((value - mn_v) * {N_KS_BINS}
                                 / (mx_v - mn_v)) AS BIGINT)) END AS bin,
           CASE WHEN CAST(epoch_us(ts) AS BIGINT) * 1000 <= mid_ns
                THEN 1 ELSE 0 END AS early
    FROM events CROSS JOIN stats
), per_bin AS (
    SELECT event_type, bin,
           CAST(SUM(early) AS BIGINT) AS ca,
           CAST(SUM(1 - early) AS BIGINT) AS cb
    FROM binned GROUP BY 1, 2
), terms AS (
    SELECT event_type, ca, cb,
           cb * (2 * (CAST(SUM(ca) OVER (PARTITION BY event_type
                                         ORDER BY bin) AS BIGINT) - ca)
                 + ca) AS u2_term
    FROM per_bin
)
SELECT event_type,
       CAST(SUM(ca) AS BIGINT) AS n_early,
       CAST(SUM(cb) AS BIGINT) AS n_late,
       CAST(SUM(u2_term) AS BIGINT) AS u2,
       ROUND(CAST(SUM(u2_term) AS DOUBLE)
             / (2.0 * SUM(ca) * SUM(cb)), 6) + 0.0 AS auc_late_gt_early
FROM terms GROUP BY event_type ORDER BY event_type
""", "tie-corrected Mann-Whitney U / AUC drift over the quantized bins")


# --------------- frozen-reference drift monitor (streaming batch twin)
def events_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/drift.py::value_drift_monitor — the
    frozen-reference KS drift semantics, driver-checkable: per event
    type the FIRST calendar day's value histogram is the frozen
    reference, and every day (micro-batch) reports the integer-ppm KS
    distance against it. Shares the stream's operator constants
    (DRIFT_BINS=64 fixed clip range [DRIFT_LO, DRIFT_HI]) — a stream
    cannot know the global min/max, so the batch twin uses the same
    CONFIGURED range, not the broadcast-range binning of
    events_value_ks_drift; that is the documented semantic difference
    between the two drift queries. Scale shape: one fact-size shuffle
    into the (type x day x 64-bin) histogram — bounded by the calendar,
    not data volume — then every window/join runs on the dense bin
    spine (types x days x 64 rows). KS numerators are exact integer
    ppm ECDF differences (cum * 1e6 div n, n <= 1e12 rows/day keeps
    the product inside int64); the reference day reports ks_ppm = 0 by
    construction, mirroring the stream's is_reference row."""
    from ..streaming.drift import DRIFT_BINS, DRIFT_HI, DRIFT_LO

    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select(
              "event_type",
              F.date_format("ts", "yyyy-MM-dd").alias("day"),
              F.least(F.lit(DRIFT_BINS - 1), F.greatest(F.lit(0), F.floor(
                  (F.col("value") - F.lit(DRIFT_LO)) * DRIFT_BINS
                  / (DRIFT_HI - DRIFT_LO)))).alias("bin")))
    hist = (ev.groupBy("event_type", "day", "bin")
            .agg(F.count(F.lit(1)).alias("cnt")))
    days = hist.select("event_type", "day").distinct()
    spine = days.select(
        "event_type", "day",
        F.explode(F.expr(f"sequence(0, {DRIFT_BINS - 1})")).alias("bin"))
    dense = (spine.join(hist, ["event_type", "day", "bin"], "left")
             .withColumn("cnt", F.coalesce("cnt", F.lit(0))))
    wc = Window.partitionBy("event_type", "day").orderBy("bin")
    wn = Window.partitionBy("event_type", "day")
    cum = (dense.withColumn("cum", F.sum("cnt").over(wc))
           .withColumn("n", F.sum("cnt").over(wn)))
    ref_day = days.groupBy("event_type").agg(F.min("day").alias("ref_day"))
    ref = (cum.join(F.broadcast(ref_day), "event_type")
           .filter(F.col("day") == F.col("ref_day"))
           .select("event_type", "bin", F.col("cum").alias("cum_r"),
                   F.col("n").alias("n_ref")))
    gaps = (cum.join(ref, ["event_type", "bin"])
            .withColumn("gap", F.abs(
                F.expr("cum * 1000000 div n")
                - F.expr("cum_r * 1000000 div n_ref"))))
    return (gaps.groupBy("event_type", "day")
            .agg(F.max("n_ref").alias("n_ref"),
                 F.max("n").alias("n_batch"),
                 F.max("gap").alias("ks_ppm"))
            .join(F.broadcast(ref_day), "event_type")
            .select("event_type", "day", "n_ref", "n_batch", "ks_ppm",
                    (F.col("day") == F.col("ref_day")).cast("long")
                    .alias("is_reference"))
            .orderBy("event_type", "day"))


from ..streaming.drift import (DRIFT_BINS as _DB, DRIFT_HI as _DH,
                               DRIFT_LO as _DL)

register("events_drift_monitor", events_drift_monitor, f"""
WITH binned AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           LEAST({_DB - 1}, GREATEST(0, CAST(FLOOR(
               (value - {_DL}) * {_DB} / ({_DH} - {_DL})) AS BIGINT)))
               AS bin
    FROM events WHERE value IS NOT NULL
), hist AS (
    SELECT event_type, day, bin, COUNT(*) AS cnt
    FROM binned GROUP BY 1, 2, 3
), days AS (SELECT DISTINCT event_type, day FROM hist),
spine AS (
    SELECT d.event_type, d.day, b.bin
    FROM days d CROSS JOIN (SELECT UNNEST(range(0, {_DB})) AS bin) b
), dense AS (
    SELECT s.event_type, s.day, s.bin, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hist h USING (event_type, day, bin)
), cum AS (
    SELECT event_type, day, bin,
           CAST(SUM(cnt) OVER (PARTITION BY event_type, day
                               ORDER BY bin) AS BIGINT) AS cum,
           CAST(SUM(cnt) OVER (PARTITION BY event_type, day)
                AS BIGINT) AS n
    FROM dense
), refd AS (SELECT event_type, MIN(day) AS ref_day FROM days GROUP BY 1),
ref AS (
    SELECT c.event_type, c.bin, c.cum AS cum_r, c.n AS n_ref
    FROM cum c JOIN refd r
      ON c.event_type = r.event_type AND c.day = r.ref_day
), gaps AS (
    SELECT c.event_type, c.day, c.n, f.n_ref,
           ABS(c.cum * 1000000 // c.n - f.cum_r * 1000000 // f.n_ref)
               AS gap
    FROM cum c JOIN ref f
      ON c.event_type = f.event_type AND c.bin = f.bin
)
SELECT g.event_type, g.day,
       CAST(MAX(g.n_ref) AS BIGINT) AS n_ref,
       CAST(MAX(g.n) AS BIGINT) AS n_batch,
       CAST(MAX(g.gap) AS BIGINT) AS ks_ppm,
       CAST(MAX(CASE WHEN g.day = r.ref_day THEN 1 ELSE 0 END)
            AS BIGINT) AS is_reference
FROM gaps g JOIN refd r ON g.event_type = r.event_type
GROUP BY g.event_type, g.day
ORDER BY g.event_type, g.day
""", "frozen-first-day-reference KS drift (streaming monitor batch twin)")


# --------------------- binary-segmentation change points (2 levels)
def events_cusum_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-level binary segmentation over hourly event counts per
    type: the level-1 CUSUM change point (events_cusum_changepoint's
    statistic) splits each type's dense hourly spine, then the SAME
    n-scaled integer CUSUM runs inside each half to localize the
    secondary shifts — the standard multiple-change-point recursion,
    unrolled two levels so the whole thing stays one declarative plan
    (no driver-side loop). Emits 3 rows per type: (level 1, the full
    spine) and (level 2, each segment), each with the segment bounds,
    totals, the exact integer peak statistic and the earliest-tie
    argmax hour. All arithmetic is the n-scaled integer form
    (|n*S| <= seg_hours * seg_total — the events_cusum_changepoint
    ladder); windows run over the calendar-bounded spine partitioned
    by (type, segment)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return binseg_from_hourly(hourly)


def binseg_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_cusum_binseg over any (event_type, hr, cnt)
    hourly-count frame — shared with the streaming twin's finalizer
    (streaming/binseg.py), the fano/cusum/autocorr discipline, so the
    streamed segmentation is bit-equal to the batch one by
    construction. Fresh-exprId same-name aliases guard every
    re-referenced lineage (dense-join right side, the scan's tot/peak
    join-backs — the memory-sink gotcha; no-op Projects in the batch
    plan)."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
             .cache())

    def scan(df, part_cols):
        w = Window.partitionBy(*part_cols).orderBy("hr")
        tot = (df.groupBy(*part_cols).agg(
            F.count(F.lit(1)).alias("n_seg"), F.sum("cnt").alias("tot_seg"),
            F.min("hr").alias("seg_start_hr"))
            .select(*[F.col(c).alias(c) for c in part_cols],
                    F.col("n_seg").alias("n_seg"),
                    F.col("tot_seg").alias("tot_seg"),
                    F.col("seg_start_hr").alias("seg_start_hr")))
        scanned = (df.withColumn("cum", F.sum("cnt").over(w))
                   .withColumn("t", F.row_number().over(w))
                   .join(F.broadcast(tot), list(part_cols))
                   .withColumn("s_abs", F.abs(
                       F.col("n_seg") * F.col("cum")
                       - F.col("t") * F.col("tot_seg"))))
        peak = (scanned.groupBy(*part_cols).agg(
            F.max("s_abs").alias("cusum_scaled"))
            .select(*[F.col(c).alias(c) for c in part_cols],
                    F.col("cusum_scaled").alias("cusum_scaled")))
        return (scanned.join(F.broadcast(peak), list(part_cols))
                .filter(F.col("s_abs") == F.col("cusum_scaled"))
                .groupBy(*part_cols)
                .agg(F.first("seg_start_hr").alias("seg_start_hr"),
                     F.first("n_seg").alias("seg_n_hours"),
                     F.first("tot_seg").alias("seg_total"),
                     F.first("cusum_scaled").alias("cusum_scaled"),
                     F.min("hr").alias("cp_hr")))

    lvl1 = scan(dense, ("event_type",))
    seg = (dense.join(F.broadcast(lvl1.select(
        F.col("event_type").alias("event_type"),
        F.col("cp_hr").alias("cp1"))), "event_type")
        .withColumn("seg_id", F.expr(
            "CASE WHEN hr <= cp1 THEN 0 ELSE 1 END")))
    lvl2 = scan(seg.select("event_type", "seg_id", "hr", "cnt"),
                ("event_type", "seg_id"))
    out1 = lvl1.select(
        "event_type", F.lit(1).alias("level"), F.lit(0).alias("seg_id"),
        "seg_start_hr", "seg_n_hours", "seg_total", "cusum_scaled",
        "cp_hr")
    out2 = lvl2.select(
        "event_type", F.lit(2).alias("level"), "seg_id",
        "seg_start_hr", "seg_n_hours", "seg_total", "cusum_scaled",
        "cp_hr")
    return (out1.unionByName(out2)
            .orderBy("event_type", "level", "seg_id"))


register("events_cusum_binseg", events_cusum_binseg, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS hr
    FROM events
), hourly AS (
    SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly GROUP BY 1
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), scan1 AS (
    SELECT event_type, hr,
           ABS(CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               * CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY hr)
                      AS BIGINT)
               - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY hr) AS BIGINT)
               * CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT))
               AS s_abs,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_seg,
           CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
               AS tot_seg,
           MIN(hr) OVER (PARTITION BY event_type) AS seg_start_hr
    FROM dense
), lvl1 AS (
    SELECT event_type,
           ANY_VALUE(seg_start_hr) AS seg_start_hr,
           ANY_VALUE(n_seg) AS seg_n_hours,
           ANY_VALUE(tot_seg) AS seg_total,
           MAX(s_abs) AS cusum_scaled,
           MIN(CASE WHEN s_abs = m THEN hr END) AS cp_hr
    FROM (SELECT *, MAX(s_abs) OVER (PARTITION BY event_type) AS m
          FROM scan1) x
    GROUP BY event_type
), seg AS (
    SELECT d.event_type, d.hr, d.cnt,
           CASE WHEN d.hr <= l.cp_hr THEN 0 ELSE 1 END AS seg_id
    FROM dense d JOIN lvl1 l ON d.event_type = l.event_type
), scan2 AS (
    SELECT event_type, seg_id, hr,
           ABS(CAST(COUNT(*) OVER (PARTITION BY event_type, seg_id)
                    AS BIGINT)
               * CAST(SUM(cnt) OVER (PARTITION BY event_type, seg_id
                                     ORDER BY hr) AS BIGINT)
               - CAST(ROW_NUMBER() OVER (PARTITION BY event_type, seg_id
                                         ORDER BY hr) AS BIGINT)
               * CAST(SUM(cnt) OVER (PARTITION BY event_type, seg_id)
                      AS BIGINT)) AS s_abs,
           CAST(COUNT(*) OVER (PARTITION BY event_type, seg_id)
                AS BIGINT) AS n_seg,
           CAST(SUM(cnt) OVER (PARTITION BY event_type, seg_id)
                AS BIGINT) AS tot_seg,
           MIN(hr) OVER (PARTITION BY event_type, seg_id) AS seg_start_hr
    FROM seg
), lvl2 AS (
    SELECT event_type, seg_id,
           ANY_VALUE(seg_start_hr) AS seg_start_hr,
           ANY_VALUE(n_seg) AS seg_n_hours,
           ANY_VALUE(tot_seg) AS seg_total,
           MAX(s_abs) AS cusum_scaled,
           MIN(CASE WHEN s_abs = m THEN hr END) AS cp_hr
    FROM (SELECT *, MAX(s_abs) OVER (PARTITION BY event_type, seg_id)
                        AS m
          FROM scan2) x
    GROUP BY event_type, seg_id
)
SELECT event_type, 1 AS level, 0 AS seg_id, seg_start_hr, seg_n_hours,
       seg_total, cusum_scaled, cp_hr
FROM lvl1
UNION ALL
SELECT event_type, 2 AS level, seg_id, seg_start_hr, seg_n_hours,
       seg_total, cusum_scaled, cp_hr
FROM lvl2
ORDER BY event_type, level, seg_id
""", "two-level binary-segmentation CUSUM change points per type")
