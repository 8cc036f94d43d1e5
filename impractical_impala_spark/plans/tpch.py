"""TPC-H-style analytical plans over the driver testdata.

The reference repo's own query surface is the WDI pipeline (plans/wdi.py);
these queries exercise the same relational algebra (scan, filter, join,
two-phase hash agg, window, top-k) on the star schema the driver benches,
written the way you would for a 100 TB fact table:

- Only true fixed-size dimensions (`region`, `nation`, and *filtered*
  slices of `part`/`supplier`/`customer` whose size is bounded by the
  predicate) pin an `F.broadcast` hint. Tables that grow with the fact
  data (`orders`, unfiltered `customer`) join via shuffle — AQE promotes
  them to broadcast at small SF from runtime stats, and they stay
  shuffles at 100 TB instead of OOMing on a pinned hint.
- Aggregations go through Spark's partial (map-side) + final hash agg;
  group keys are low-cardinality so the shuffle is tiny regardless of
  fact size.
- Filters sit directly on the scan so Catalyst pushes them into parquet
  (`PushedFilters` in explain) and prunes columns (`ReadSchema`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted to the testdata lineitem schema: grouped pricing
    summary with derived revenue/charge expressions. Pure built-ins —
    whole-stage codegen end-to-end, map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                                            AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                                       AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                    AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)      AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                            AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                       AS avg_price,
       ROUND(AVG(l_discount), 4)                                            AS avg_disc,
       COUNT(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter on the customer dim (broadcast),
    join to orders and lineitem, revenue agg, top-10.

    Scale shape: only the filtered *customer* side pins a broadcast hint —
    customers-per-segment is bounded and small relative to facts. The
    lineitem ⋈ orders join is fact ⋈ fact, so it shuffles on the order
    key; AQE may still promote it to broadcast at small SF from runtime
    stats, which is exactly the adaptivity we want instead of a pinned
    hint that OOMs at 100 TB."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders.join(F.broadcast(cust),
                            orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            # string, not date: temporal types round-trip differently
            # through Spark vs DuckDB result fetch; the driver hashes values
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


Q3_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: full star join lineitem > orders > customer >
    nation > region, revenue per nation.

    Scale shape: nation and region are true fixed-size dimensions and
    pin broadcast hints. Orders and customer grow with the fact table,
    so those joins shuffle on their keys — at small SF, AQE promotes
    them to broadcast from runtime stats; at 100 TB they stay shuffles
    instead of OOMing the executors with a pinned hint."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver smoke query: the star-join revenue rollup — it touches
    scan, shuffle joins on the fact keys, broadcast joins for the two
    dims (nation, region), derived expression, partial+final agg, sort."""
    return q5_revenue_by_nation(spark, sf_dir)
