"""Final TPC-H wave: Q2 and Q11 — the last two of the 22 TPC-H query
shapes (waves 1-4 cover the other 20). The reference schema has no
partsupp table, so both proxy the part-supplier relation from lineitem:
supply cost = the best (minimum) observed unit price a supplier ever
charged for a part; stock value = total extended price moved.

Scale notes (the round-2 verdict's q15 lesson applied from the start):
- Q2's per-part minimum is a window KEYED on p_partkey — one shuffle
  that both computes the min and filters, with millions of part keys
  to parallelize over (the q15 anti-pattern was an EMPTY partition
  spec, which funnels everything through one task; a keyed window is
  the scalable shape). A groupBy-min joined back would read the whole
  euro subtree twice.
- Q11's corpus-wide threshold is a 1-row aggregate broadcast back.
- Both restrict suppliers via the nation/region dims, which broadcast;
  everything fact-scaled shuffles with AQE promotion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# lineitem-derived part-supplier "catalog": min unit price per pair.
# Division is IEEE-deterministic and MIN is selection (not summation),
# so the unrounded value is bit-identical across engines and safe to
# join on by equality.
_SUPPLY_SQL = """
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS supplycost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every LARGE-type part, the EUROPE supplier(s)
    offering it at the minimum supply cost (correlated-min subquery).
    The min is a window keyed on p_partkey over the region-restricted
    catalog — ties keep all suppliers, exactly like the SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
             .alias("supplycost"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    euro = (
        supply.join(supp, supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(part, supply.l_partkey == part.p_partkey)
    )
    best = F.min("supplycost").over(Window.partitionBy("p_partkey"))
    return (
        euro.withColumn("best_cost", best)
        .filter(F.col("supplycost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.round("supplycost", 4).alias("supplycost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


register("q2_min_cost_supplier", q2_min_cost_supplier, f"""
WITH supply AS ({_SUPPLY_SQL}),
euro AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
    FROM supply
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ROUND(supplycost, 4) AS supplycost
FROM euro e
WHERE supplycost = (SELECT MIN(supplycost) FROM euro
                    WHERE p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""", "TPC-H Q2 shape (correlated min-cost supplier per part)")


Q11_NATIONS = ("NATION_7", "NATION_8")
# TPC-H scales Q11's share threshold by 1/SF because a FIXED fraction
# empties as the part count grows (max per-part share here: 1.6% at
# sf0.001, 0.03% at sf0.1). A multiple of the AVERAGE part value is the
# scale-free equivalent: "parts moving > 2x the mean value" is
# meaningful at any corpus size.
Q11_AVG_MULT = 2.0


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total traded value through the
    target nations' suppliers exceeds a multiple of the nation-average
    (scalar subquery over the same restricted frame). The restricted
    per-part frame is computed once and cached; the global threshold is
    a 1-row aggregate broadcast back — no second lineitem scan, no
    global window."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*Q11_NATIONS))
    restricted = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 4)
             .alias("part_value"))
        .cache()  # reused by the total and the filter
    )
    total = restricted.agg(
        F.round(F.avg("part_value") * F.lit(Q11_AVG_MULT), 4)
        .alias("threshold"))
    return (
        restricted.join(F.broadcast(total),
                        F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


register("q11_important_stock", q11_important_stock, f"""
WITH restricted AS (
    SELECT l_partkey,
           ROUND(SUM(l_extendedprice * l_quantity), 4) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name IN {Q11_NATIONS!r}
    GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM restricted
WHERE part_value > (SELECT ROUND(AVG(part_value) * {Q11_AVG_MULT}, 4)
                    FROM restricted)
ORDER BY part_value DESC, l_partkey
""", "TPC-H Q11 shape (value-share filter via scalar subquery)")
