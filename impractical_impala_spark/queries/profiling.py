"""Warehouse diagnostics and revenue-concentration analytics: dynamic
equi-width histograms, hot-key skew profiling, Pareto concentration,
and year-over-year growth.

The engine-ops family (what ANALYZE TABLE / a skew advisor / a revenue
dashboard run all day), each in its scale-correct decomposition:

- histogram: the value range comes from a ONE-ROW global aggregate
  broadcast back over the scan (never a driver-side collect-then-
  filter loop); binning is a codegen'd expression, counts are exact
  integers.
- skew profile: per-key counts + the global totals attach via a 1-row
  broadcast — the diagnosis that decides when q_salted_agg's salting
  is warranted.
- Pareto: revenue quantized to integer cents (floor(x*100): identical
  double arithmetic on both engines) so distributed sums have ONE
  exact value; deciles come from a total-ordered ntile, never a
  driver-side sort.
- YoY: two-key agg + LAG over the model-size (nation, year) frame.

All outputs are integer or explicitly rounded, so driver hashes are
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_BINS = 16


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 16-bin histogram of o_totalprice with a DYNAMIC range:
    stats (min, max) are a one-row aggregate broadcast-joined back over
    the scan, so the whole plan is two passes over the column and zero
    driver round-trips. Bin membership is the same IEEE expression on
    both engines -> exact integer counts."""
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    stats = orders.agg(F.min("o_totalprice").alias("mn"),
                       F.max("o_totalprice").alias("mx"))
    binned = orders.crossJoin(F.broadcast(stats)).select(
        F.least(F.lit(N_BINS - 1),
                F.floor((F.col("o_totalprice") - F.col("mn")) * N_BINS
                        / (F.col("mx") - F.col("mn")))).alias("bin"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").alias("revenue_cents"))
            .orderBy("bin"))


register("price_histogram", price_histogram, f"""
WITH stats AS (
    SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT LEAST({N_BINS - 1},
             CAST(FLOOR((o_totalprice - mn) * {N_BINS} / (mx - mn)) AS BIGINT))
           AS bin,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders CROSS JOIN stats
GROUP BY 1 ORDER BY 1
""", "dynamic-range equi-width histogram via broadcast 1-row stats")


TOP_KEYS = 20


def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis over events.user_id: the top 20 keys with
    integer parts-per-million share and the skew factor vs a uniform
    spread (count * n_keys / total). This is the profiling step that
    tells an operator whether a key needs q_salted_agg's salting or
    AQE skew handling; totals attach via a 1-row broadcast. Top-20
    selection is orderBy+limit — Spark compiles it to a distributed
    TakeOrdered (per-partition top-k, then a 20-row merge), never a
    single-partition global window over the key aggregate."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(F.sum("n").alias("total"),
                      F.count(F.lit(1)).alias("n_keys"))
    return (per_key
            .orderBy(F.col("n").desc(), "user_id").limit(TOP_KEYS)
            .crossJoin(F.broadcast(tot))
            .select("user_id", "n",
                    F.expr("n * 1000000 div total").alias("share_ppm"),
                    (F.round(F.col("n") * F.col("n_keys") / F.col("total"), 4)
                     + 0.0).alias("skew_factor"))
            .orderBy(F.col("n").desc(), "user_id"))


register("skew_key_profile", skew_key_profile, f"""
WITH per_key AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), tot AS (
    SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM per_key
), ranked AS (
    SELECT user_id, n, total, n_keys,
           ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
    FROM per_key CROSS JOIN tot
)
SELECT user_id, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
       ROUND(CAST(n * n_keys AS DOUBLE) / total, 4) + 0.0 AS skew_factor
FROM ranked WHERE rk <= {TOP_KEYS} ORDER BY n DESC, user_id
""", "hot-key share and skew-factor diagnosis (salting decision input)")


N_DECILES = 10


def customer_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration ("do the top 10% of customers carry 40% of
    revenue?"): per-customer cents-exact revenue, total-ordered deciles
    via ntile, per-decile share against the broadcast grand total. The
    ntile runs over the customer AGGREGATE (dimension-sized), never the
    orders fact; exact equal-count deciles are inherently a total
    order, so past dimension scale you'd swap in the broadcast
    percentile-cutpoint buckets of curriculum_buckets (documented
    trade: cutpoint deciles are equal-width-in-value, not
    equal-count)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice") * 100)
        .cast("long").alias("cents"))
    per_cust = orders.groupBy("o_custkey").agg(F.sum("cents").alias("rev"))
    tot = per_cust.agg(F.sum("rev").alias("total"))
    w = Window.orderBy(F.col("rev").desc(), "o_custkey")
    return (per_cust.withColumn("decile", F.ntile(N_DECILES).over(w))
            .crossJoin(F.broadcast(tot))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("rev").alias("revenue_cents"),
                 (F.round((F.sum("rev") / F.first("total")) * 100, 6)
                  + 0.0).alias("revenue_share_pct"))
            .orderBy("decile"))


register("customer_pareto", customer_pareto, f"""
WITH per_cust AS (
    SELECT o_custkey,
           SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS rev
    FROM orders GROUP BY o_custkey
), tot AS (SELECT SUM(rev) AS total FROM per_cust),
deciled AS (
    SELECT o_custkey, rev, total,
           NTILE({N_DECILES}) OVER (ORDER BY rev DESC, o_custkey) AS decile
    FROM per_cust CROSS JOIN tot
)
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       ROUND(CAST(SUM(rev) AS DOUBLE) / ANY_VALUE(total) * 100, 6) + 0.0
           AS revenue_share_pct
FROM deciled GROUP BY decile ORDER BY decile
""", "cents-exact Pareto revenue concentration by customer decile")


def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: orders joined through
    the broadcast customer->nation dims, cents-exact yearly sums, LAG
    growth over the model-size (nation, year) frame. The fact scan
    shuffles once on the grouping key; the window never touches it."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    yearly = (orders
              .join(F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(nation),
                    cust.c_nationkey == nation.n_nationkey)
              .groupBy("n_name", "yr")
              .agg(F.sum("cents").alias("revenue_cents")))
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue_cents").over(w)
    return (yearly
            .select("n_name", "yr", "revenue_cents",
                    (F.round((F.col("revenue_cents") - prev) / prev * 100, 4)
                     + 0.0).alias("yoy_pct"))
            .orderBy("n_name", "yr"))


register("nation_revenue_yoy", nation_revenue_yoy, """
WITH yearly AS (
    SELECT n_name, EXTRACT(year FROM o_orderdate) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT n_name, CAST(yr AS INT) AS yr, revenue_cents,
       ROUND(CAST(revenue_cents
                  - LAG(revenue_cents) OVER (PARTITION BY n_name ORDER BY yr)
              AS DOUBLE)
             / LAG(revenue_cents) OVER (PARTITION BY n_name ORDER BY yr)
             * 100, 4) + 0.0 AS yoy_pct
FROM yearly ORDER BY n_name, yr
""", "cents-exact yearly revenue with LAG year-over-year growth")
