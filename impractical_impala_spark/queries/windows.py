"""Window-function and additional TPC-H-shape queries (extension surface
beyond the reference's own operator set; SURVEY.md §7 M6).

Window functions shuffle once on the partition key and then pipeline —
the frame logic never re-shuffles. Running sums use the deterministic
row order (unique tie-break) so results are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def w1_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend over their order history."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("cum_spend"),
    )


register("w1_running_sum", w1_running_sum, """
SELECT o_orderkey, o_custkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 4) AS cum_spend
FROM orders
""", "running sum window")


def w2_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over a per-customer ordering."""
    o = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    by_price_ties = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc()
    )
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.row_number().over(by_price).alias("rn"),
        F.rank().over(by_price_ties).alias("rnk"),
        F.dense_rank().over(by_price_ties).alias("drnk"),
    )


register("w2_rank_orders", w2_rank_orders, """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
FROM orders
""", "ranking windows")


def w3_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest order per customer — the row_number()=1 idiom (no
    self-join; one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


register("w3_top1_per_group", w3_top1_per_group, """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn = 1
""", "top-1 per group")


def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of event values per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id", "user_id",
        F.round(F.avg("value").over(w), 6).alias("ma7"),
    )


register("w4_moving_avg", w4_moving_avg, """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM events
""", "moving average window")


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight range predicates + single aggregate; the
    filters push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
             .alias("revenue_delta"))
    )


register("q6_revenue_delta", q6_revenue_delta, """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""", "TPC-H Q6 shape")


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region/nation — grouping-set aggregation (beyond the
    reference's surface; standard OLAP completeness)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # Broadcast only the fixed-size dims (nation/region); orders and
    # customer scale with the facts, so those joins shuffle and AQE
    # promotes them to broadcast only when runtime stats say they fit.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


register("q_rollup_revenue", q_rollup_revenue, """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""", "rollup grouping sets")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no finished ('F') order —
    set-difference completeness; the reference has only semi-join."""
    cust = load_table(spark, sf_dir, "customer")
    fin = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(fin, cust.c_custkey == fin.o_custkey, "left_anti") \
        .select("c_custkey", "c_name")


register("q_anti_join", q_anti_join, """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""", "anti join")


def q_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least
    one late-shipped lineitem (semi-join into an aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


register("q_exists_priority", q_exists_priority, """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1998-06-01')
GROUP BY o_orderpriority
""", "TPC-H Q4 shape (EXISTS)")
