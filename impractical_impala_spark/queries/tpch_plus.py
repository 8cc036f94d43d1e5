"""Third TPC-H wave: the remaining classic shapes expressible on the
driver's trimmed star schema (no partsupp table; no shipmode/commit/
receipt columns — queries adapt the predicate, never the plan shape).

Scale discipline matches plans/tpch.py: broadcast hints pin ONLY
fixed-size dims (nation, region); anything that grows with the fact
data (orders, customer, part, supplier — even filtered slices, which
scale proportionally) joins via shuffle and lets AQE promote to
broadcast at small SF from runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one late
    lineitem (EXISTS -> left-semi join with an inequality on both
    sides), counted by priority. Adapted lateness predicate: shipped
    more than 30 days after the order date (no commit/receipt dates in
    this schema)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register("q4_order_priority", q4_order_priority, """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""", "TPC-H Q4 shape (EXISTS with inequality, priority counts)")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations —
    supplier nation from lineitem⋈supplier, customer nation from
    lineitem⋈orders⋈customer, symmetric pair filter, grouped by both
    nations and ship year. Only the 25-row nation dim broadcasts."""
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nationkey"),
                                  F.col("n_name").alias("cust_nation"))),
        "c_nationkey",
    )
    orders = load_table(spark, sf_dir, "orders")
    pair = (
        ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_0"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register("q7_volume_shipping", q7_volume_shipping, """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((ns.n_name = 'NATION_0' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_0'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""", "TPC-H Q7 shape (bilateral nation trade by year)")


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue into
    one region, per year — conditional-sum ratio over a 5-table join.
    nation/region broadcast; part/customer/orders shuffle (their
    filtered slices still scale with the fact data)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(
            nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .select(F.col("n_nationkey").alias("c_nationkey"))
        ),
        "c_nationkey",
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                  F.col("n_name").alias("supp_nation"))),
        "s_nationkey",
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol)
                      .otherwise(F.lit(0.0))) / F.sum(vol), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


register("q8_market_share", q8_market_share, """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                      ELSE CAST(0.0 AS DOUBLE) END) / SUM(volume), 6)
           AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           ns.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region ON nc.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
)
GROUP BY o_year
ORDER BY o_year
""", "TPC-H Q8 shape (national market share by year)")


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter, top 20. Customer joins via shuffle (it scales);
    nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


register("q10_returned_items", q10_returned_items, """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""", "TPC-H Q10 shape (returned-item revenue, top 20 customers)")


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts by shipping-delay
    class (adapted from shipmode, absent here): for LATE (>60 days
    after order) vs ONTIME lineitems, how many belong to high- vs
    low-priority orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay_class = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, "LATE"
    ).otherwise("ONTIME")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(delay_class.alias("delay_class"),
                high.cast("long").alias("is_high"))
        .groupBy("delay_class")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


register("q12_ship_delay", q12_ship_delay, """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
            THEN 'LATE' ELSE 'ONTIME' END AS delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
""", "TPC-H Q12 shape (priority counts by delay class)")


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' percentage of one month's revenue
    — a conditional-sum ratio collapsing to a single row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol)
                        .otherwise(F.lit(0.0)))
                / F.sum(vol), 6
            ).alias("promo_revenue")
        )
    )


register("q14_promo_effect", q14_promo_effect, """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE CAST(0.0 AS DOUBLE) END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""", "TPC-H Q14 shape (promo revenue share)")


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually small orders of one
    brand's parts — each lineitem filtered against the per-part average
    quantity (correlated scalar subquery -> window avg partitioned by
    part, no second scan of lineitem)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 4)
             .alias("avg_yearly"))
    )


register("q17_small_quantity_revenue", q17_small_quantity_revenue, """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = lineitem.l_partkey
  )
""", "TPC-H Q17 shape (small-quantity revenue, correlated avg)")


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunctions — the classic disjunctive-pushdown stress (Catalyst
    extracts the common l_partkey = p_partkey equi-condition so the
    join stays hash, not nested-loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    c1 = ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
          & (F.col("l_quantity").between(1, 11)))
    c2 = ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
          & (F.col("l_quantity").between(10, 20)))
    c3 = ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
          & (F.col("l_quantity").between(20, 30)))
    return (
        j.filter(c1 | c2 | c3)
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


register("q19_disjunctive_predicates", q19_disjunctive_predicates, """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""", "TPC-H Q19 shape (disjunctive predicate revenue)")


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-dormant customers — account balance
    above the positive-balance average (scalar subquery, broadcast as a
    1-row frame) and no orders since 2000 (anti join against the
    filtered fact), grouped by segment. Adapted keys: market segment
    instead of the absent phone prefix, and recency-dormant instead of
    never-ordered (this dense corpus gives every customer ~7 orders)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD"))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


register("q22_dormant_customers", q22_dormant_customers, """
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 4) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
  AND c_acctbal > (
      SELECT AVG(c_acctbal) FROM customer
      WHERE c_acctbal > 0
        AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""", "TPC-H Q22 shape (scalar subquery + anti join by segment)")
