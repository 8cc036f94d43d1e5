"""Second TPC-H wave: outer joins, correlated subqueries, HAVING over
subqueries — and the ``spark.sql`` entry path (temp views + SQL text),
proving the engine's SQL surface, not just the DataFrame API."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join so zero-order customers count,
    then the distribution of order counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


register("q13_order_count_distribution", q13_order_count_distribution, """
SELECT c_count, COUNT(*) AS custdist FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus <> 'P'
    GROUP BY c_custkey
)
GROUP BY c_count
""", "TPC-H Q13 shape (left outer + count distribution)")


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold (HAVING subquery), joined back to customers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


register("q18_large_volume_customers", q18_large_volume_customers, """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
    SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""", "TPC-H Q18 shape (HAVING subquery + join back)")


def q_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via the spark.sql ENTRY PATH (temp
    views + SQL text): each customer's orders that hit their personal
    maximum price. Catalyst decorrelates this into the same aggregate
    + join plan the DataFrame API would build."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM v_orders o
        WHERE o_totalprice = (
            SELECT MAX(i.o_totalprice) FROM v_orders i
            WHERE i.o_custkey = o.o_custkey
        )
    """)


register("q_correlated_max", q_correlated_max, """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (
    SELECT MAX(i.o_totalprice) FROM orders i
    WHERE i.o_custkey = o.o_custkey
)
""", "correlated scalar subquery via spark.sql")
