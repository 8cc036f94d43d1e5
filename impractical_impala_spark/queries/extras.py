"""Completeness operators beyond the reference's surface: exact
percentiles, set operations, CUBE, window value functions, date
functions. Each is standard OLAP table stakes a reference user would
expect from the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). At 100 TB you'd use approx_percentile for
    a single-pass sketch; the exact form is the correctness baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        )
    )


register("q_percentiles", q_percentiles, """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
""", "exact grouped percentiles")


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: big-ticket purchasers who also click big,
    minus users with severe errors (distinct set semantics on both
    engines)."""
    ev = load_table(spark, sf_dir, "events")
    big_buy = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 200)) \
        .select("user_id")
    big_click = ev.filter((F.col("event_type") == "click") & (F.col("value") > 200)) \
        .select("user_id")
    severe_err = ev.filter((F.col("event_type") == "error") & (F.col("value") > 400)) \
        .select("user_id")
    return big_buy.intersect(big_click).exceptAll(severe_err.distinct()) \
        .select("user_id")


register("q_set_ops", q_set_ops, """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click' AND value > 200
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 400
""", "intersect/except set operations")


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (partial aggregation still applies)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("total_price"),
        )
    )


register("q_cube_revenue", q_cube_revenue, """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 4) AS total_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""", "CUBE grouping sets")


def w5_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / lead over a bounded frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ws = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.first_value("o_totalprice").over(w).alias("first_spend"),
        F.last_value("o_totalprice").over(w).alias("last_spend"),
        F.lead("o_totalprice").over(ws).alias("next_spend"),
    )


register("w5_value_windows", w5_value_windows, """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_totalprice) OVER w_full AS first_spend,
       LAST_VALUE(o_totalprice)  OVER w_full AS last_spend,
       LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_spend
FROM orders
WINDOW w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""", "first/last/lead value windows")


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: month/quarter/dow extraction + monthly agg
    (temporal outputs as strings/ints per the parity rule)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.quarter("o_orderdate").alias("quarter"),
            F.dayofweek("o_orderdate").alias("dow"),
            "o_totalprice",
        )
        .groupBy("month", "quarter", "dow")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


register("q_date_functions", q_date_functions, """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS quarter,
       CAST(EXTRACT(dow FROM o_orderdate) + 1 AS INT) AS dow,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
FROM orders
GROUP BY 1, 2, 3
""", "date extraction + monthly aggregation")


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation (operators/skew.py): the 5
    hot event_type keys are sprayed over 16 salts, partially aggregated,
    then combined — algebraically identical to the direct GROUP BY the
    oracle runs, which is exactly the point."""
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(ev.select("event_type", "value"), ["event_type"], {
        "n": (F.count(F.lit(1)), F.sum("n")),
        # round only at the FINAL phase — partials must stay exact
        "total": (F.sum("value"), F.round(F.sum("total"), 4)),
        "mx": (F.max("value"), F.max("mx")),
        "mn": (F.min("value"), F.min("mn")),
    }, n_salts=16)
    return out


register("q_salted_agg", q_salted_agg, """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total,
       MAX(value) AS mx, MIN(value) AS mn
FROM events GROUP BY event_type
""", "salted two-phase aggregation == direct GROUP BY")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling per stratum (every 10th event
    of each type in event_id order) — the reproducible train/eval split
    primitive; unlike rand()-based sampling it is engine-portable and
    stable across reruns."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") % 10) == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


register("q_stratified_sample", q_stratified_sample, """
SELECT event_id, user_id, event_type, value FROM (
    SELECT event_id, user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
    FROM events
) WHERE rn % 10 = 1
""", "systematic stratified sample (deterministic 1-in-10 per stratum)")


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling summary of lineitem's measure columns
    (count/nulls/min/max/mean) — the quality gate a training pipeline
    runs before consuming a new drop."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    rows = None
    for c in cols:
        agg = li.agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("n_present"),
            F.min(c).alias("min_val"),
            F.max(c).alias("max_val"),
            F.round(F.avg(c), 6).alias("mean_val"),
        )
        rows = agg if rows is None else rows.unionByName(agg)
    return rows


register("q_profile_table", q_profile_table, """
SELECT 'l_quantity' AS column, COUNT(*) AS n_rows, COUNT(l_quantity) AS n_present,
       MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val,
       ROUND(AVG(l_quantity), 6) AS mean_val FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
       MIN(l_extendedprice), MAX(l_extendedprice),
       ROUND(AVG(l_extendedprice), 6) FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(l_discount), MIN(l_discount),
       MAX(l_discount), ROUND(AVG(l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_tax', COUNT(*), COUNT(l_tax), MIN(l_tax), MAX(l_tax),
       ROUND(AVG(l_tax), 6) FROM lineitem
""", "single-pass column profiling (count/nulls/min/max/mean)")


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority, status), (priority), ()) in a
    single pass — the general form behind rollup/cube; Catalyst expands
    the sets into one aggregate, so partial (map-side) aggregation
    still applies at any scale. NULL grouping keys are rendered 'ALL'
    so the output never collides with real key values."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders", "total_price")
    )


register("q_grouping_sets", q_grouping_sets, """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
""", "explicit GROUPING SETS aggregation with coalesced levels")


def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total-order row numbering at scale: rank every order by
    (o_totalprice DESC, o_orderkey) WITHOUT the empty-partition-spec
    window that funnels the table through one task. Decomposition in
    operators/ranking.py: range partitions -> per-range local
    row_number -> model-size prefix-sum offsets broadcast back."""
    from ..operators.ranking import global_row_number

    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_totalprice")
    return global_row_number(
        orders, F.col("o_totalprice").desc(), F.col("o_orderkey"),
    ).select("o_orderkey", "o_totalprice", "rnk")


register("q_global_rank", q_global_rank, """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
FROM orders
""", "scalable global row numbering (range partitions + offset join)")


def q_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause conditional aggregation: several differently-
    filtered aggregates in ONE pass over the fact table (the idiom that
    replaces N self-joins or N CASE-WHEN pyramids; Catalyst plans one
    scan + one two-phase aggregate). Revenue quantized to integer cents
    pre-sum so the filtered sums are distribution-order exact."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_fa")
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_quantity < 10) AS n_small_qty,
               SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                   FILTER (WHERE l_tax = 0) AS taxfree_cents
        FROM li_fa
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """)


register("q_filtered_aggs", q_filtered_aggs, """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       COUNT(*) FILTER (WHERE l_quantity < 10) AS n_small_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
            FILTER (WHERE l_tax = 0) AS BIGINT) AS taxfree_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""", "single-pass FILTER-clause conditional aggregation")


def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (the 'suppliers who cover ALL/most parts of
    a brand' textbook operator) in its count-match decomposition: both
    sides reduce to distinct key sets, coverage is an integer count
    compare — never a per-divisor-row loop. Output per brand: part
    count, supplier count, the best supplier's coverage in ppm, and how
    many suppliers clear quarter coverage. All integers — hash-exact."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey",
                                                      "l_partkey")
    sp = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select("l_suppkey", "p_brand", "l_partkey").distinct())
    bp = part.groupBy("p_brand").agg(
        F.countDistinct("p_partkey").alias("n_parts"))
    cov = sp.groupBy("p_brand", "l_suppkey").agg(
        F.countDistinct("l_partkey").alias("k"))
    return (cov.join(F.broadcast(bp), "p_brand")
            .groupBy("p_brand", "n_parts")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.expr("max(k * 1000000 div n_parts)")
                 .alias("best_coverage_ppm"),
                 F.sum(F.expr("CASE WHEN 4 * k >= n_parts THEN 1 ELSE 0 END"))
                 .alias("n_quarter_coverage"))
            .orderBy("p_brand"))


register("q_relational_division", q_relational_division, """
WITH sp AS (
    SELECT DISTINCT l_suppkey, p_brand, l_partkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
), bp AS (
    SELECT p_brand, COUNT(DISTINCT p_partkey) AS n_parts
    FROM part GROUP BY p_brand
), cov AS (
    SELECT p_brand, l_suppkey, COUNT(DISTINCT l_partkey) AS k
    FROM sp GROUP BY 1, 2
)
SELECT cov.p_brand, ANY_VALUE(bp.n_parts) AS n_parts,
       COUNT(*) AS n_suppliers,
       CAST(MAX(k * 1000000 // bp.n_parts) AS BIGINT)
           AS best_coverage_ppm,
       CAST(SUM(CASE WHEN 4 * k >= bp.n_parts THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quarter_coverage
FROM cov JOIN bp USING (p_brand)
GROUP BY cov.p_brand ORDER BY cov.p_brand
""", "relational division via count-match (brand part-coverage matrix)")
