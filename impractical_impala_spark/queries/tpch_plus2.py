"""Fourth TPC-H wave: the planner-stressing subquery shapes still
uncovered after waves 1-3 — global-max filters (Q15), NOT IN null-aware
exclusion with count-distinct (Q16), nested IN over a HAVING subquery
(Q20), the multi-supplier latest-ship pattern (Q21, EXISTS/NOT-EXISTS
pair in the oracle, a single window pass in Spark), and derived-profit
aggregation (Q9, cost proxied by p_retailprice — no partsupp table).

Broadcast discipline unchanged: nation pins, everything fact-scaled
shuffles with AQE promotion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers whose quarterly revenue equals the
    global maximum. The max is a 1-row full aggregate of the ALREADY
    AGGREGATED per-supplier frame, broadcast-joined back as an equality
    filter — no ``Window.partitionBy()`` funnel of every supplier row
    through a single task (rows = #suppliers: fine at sf0.1, millions
    at 100 TB), and no second scan of lineitem (the per-supplier
    aggregate is computed once and reused by both sides)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4)
             .alias("total_revenue"))
        .cache()  # reused by the max agg and the equality filter
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev),
                 F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


register("q15_top_supplier", q15_top_supplier, """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""", "TPC-H Q15 shape (global-max revenue supplier)")


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, size) for
    non-PROMO parts, EXCLUDING a supplier blocklist (NOT IN — the
    null-aware anti-join shape; keys are non-null here so a left-anti
    join is semantics-identical). part-supplier pairs come from
    lineitem (this schema has no partsupp)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO"))
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


register("q16_supplier_count", q16_supplier_count, """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
""", "TPC-H Q16 shape (NOT IN blocklist + distinct supplier counts)")


def q20_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers IN a nested subquery — those who
    moved more than 400 units of SMALL-type parts in 1996 — joined to
    their nation. Spark form: HAVING-filtered aggregate, then a
    left-semi join; only the 25-row nation dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    movers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


register("q20_small_part_suppliers", q20_small_part_suppliers, """
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'SMALL'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING ROUND(SUM(l_quantity), 4) > 400
)
ORDER BY s_suppkey
""", "TPC-H Q20 shape (nested IN over HAVING aggregate)")


def q21_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in multi-supplier orders, which supplier shipped
    LAST (ties: all tied suppliers count)? The oracle states it as an
    EXISTS (another supplier in the order) + NOT-EXISTS (nobody shipped
    later) pair; Spark computes both predicates in ONE window pass over
    the order — no self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    # DISTINCT aggregates aren't allowed in windows: min != max is the
    # constant-memory equivalent of countDistinct > 1
    flagged = li.select(
        "l_orderkey", "l_suppkey",
        (F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w))
        .alias("multi"),
        (F.col("l_shipdate") == F.max("l_shipdate").over(w)).alias("is_last"),
    )
    return (
        flagged.filter(F.col("multi") & F.col("is_last"))
        .select("l_orderkey", "l_suppkey").distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "l_suppkey")
    )


register("q21_latest_shipper", q21_latest_shipper, """
SELECT l_suppkey, COUNT(*) AS numwait
FROM (
    SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
    FROM lineitem l1
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_shipdate > l1.l_shipdate
    )
)
GROUP BY l_suppkey
ORDER BY numwait DESC, l_suppkey
""", "TPC-H Q21 shape (EXISTS/NOT-EXISTS pair as one window pass)")


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year for 'widget'
    parts; cost proxied by 60% of p_retailprice (no partsupp in this
    schema). Row-level profit arithmetic stays unrounded (IEEE-identical
    across engines); only the aggregate rounds."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget"))
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


register("q9_product_profit", q9_product_profit, """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
""", "TPC-H Q9 shape (derived profit by nation-year)")
