"""SURVEY.md §2 operator inventory (O1-O21) as driver-checkable queries.

Each query exercises exactly one reference operator, re-targeted from the
WDI panel onto the driver's testdata tables so the DuckDB oracle can run
on the pre-registered views. The WDI-shaped originals (same builders) run
in plans/wdi.py against the reference's own CSVs and goldens.

Oracle-parity rules used throughout this package:
- no temporal types in outputs (format to 'yyyy-MM-dd' strings);
- float results of arithmetic are ROUND()ed to a fixed scale on both
  sides; raw pass-through doubles are left untouched (bit-identical);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.reshape import pivot_counts, unpivot
from ..operators.runlength import (clean_runs, with_run_id, with_run_length,
                                   with_validity)
from ..registry import register
from ..sources import load_table


# --- O1 + O5: scan with projection (column pruning reaches the scan) ----
def o01_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O5 (dtrendandstat_HP100.R:5-7, :59-64): source scan + narrow
    projection. Parquet ReadSchema prunes to the 3 selected columns."""
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")


register("o01_scan_projection", o01_scan_projection,
         "SELECT p_partkey, p_name, p_brand FROM part",
         "O1/O5 scan + projection")


# --- O2: recode via CASE --------------------------------------------------
def o02_recode_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 (dtrendandstat_dlog.R:14-21): case_when recode of a code column
    into a semantic label, unmatched -> NULL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_type").isin("purchase", "signup"), F.lit("conversion"))
        .when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .otherwise(F.lit(None).cast("string"))
        .alias("category"),
    )


register("o02_recode_case", o02_recode_case, """
SELECT event_id, event_type,
       CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
            WHEN event_type IN ('click','view')      THEN 'engagement'
            ELSE NULL END AS category
FROM events
""", "O2 CASE recode")


# --- O3: unpivot ----------------------------------------------------------
def o03_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (dtrendandstat_dlog.R:22-26): wide -> long melt of measure
    columns, ids preserved."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return unpivot(li, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_discount", "l_tax"],
                   var_col="metric", value_col="value")


register("o03_unpivot", o03_unpivot, """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
""", "O3 unpivot/melt")


# --- O4: cast -------------------------------------------------------------
def o04_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 (dtrendandstat_dlog.R:27): type casts in projection — string
    year extraction and int->string key cast."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("orderkey_str"),
        F.year("o_orderdate").alias("order_year"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
    )


register("o04_cast", o04_cast, """
SELECT CAST(o_orderkey AS VARCHAR) AS orderkey_str,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
FROM orders
""", "O4 casts")


# --- O6: union all --------------------------------------------------------
def o06_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (dtrendandstat_dlog.R:31-35): by-name union of homogeneous
    blocks from different sources."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("party_name"),
        F.lit("customer").alias("kind"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("party_name"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp)


register("o06_union_all", o06_union_all, """
SELECT c_custkey AS party_id, c_name AS party_name, 'customer' AS kind FROM customer
UNION ALL
SELECT s_suppkey, s_name, 'supplier' FROM supplier
""", "O6 union all")


# --- O7: IN-list filter -----------------------------------------------------
def o07_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 (dtrendandstat_dlog.R:36): IN-list predicate, pushed into the
    parquet scan (check PushedFilters)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("purchase", "signup")) \
        .select("event_id", "user_id", "event_type")


register("o07_in_filter", o07_in_filter, """
SELECT event_id, user_id, event_type FROM events
WHERE event_type IN ('purchase','signup')
""", "O7 IN-list filter")


# --- O8: sort + deterministic top-k ---------------------------------------
def o08_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 (dtrendandstat_dlog.R:43) generalized to the useful-at-scale
    form: global ordered top-k (Spark TakeOrderedAndProject — no full
    sort, each partition keeps k then the driver merges)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    )


register("o08_sort_topk", o08_sort_topk, """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""", "O8 sort/top-k")


# --- O9-O12: validity flag / run id / run length / run filter ---------------
_RUNS_ORACLE_CTE = """
WITH flagged AS (
    SELECT event_id, user_id,
           CASE WHEN value IS NOT NULL AND value > 50 THEN 1 ELSE 0 END AS valid
    FROM events
), started AS (
    SELECT *,
           CASE WHEN valid = 1 AND COALESCE(LAG(valid) OVER
                   (PARTITION BY user_id ORDER BY event_id), 0) = 0
                THEN 1 ELSE 0 END AS is_start
    FROM flagged
), runs AS (
    SELECT event_id, user_id, valid,
           CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
    FROM started
), sized AS (
    SELECT *, COUNT(*) OVER (PARTITION BY user_id, run_id, valid) AS run_length
    FROM runs
)
"""


def _flagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return with_validity(ev, "value",
                         predicate=F.col("value").isNotNull() & (F.col("value") > 50))


def o09_validity_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 (dtrendandstat_dlog.R:46): boolean->int validity flag."""
    return _flagged_events(spark, sf_dir).select("event_id", "user_id", "valid")


register("o09_validity_flag", o09_validity_flag, """
SELECT event_id, user_id,
       CASE WHEN value IS NOT NULL AND value > 50 THEN 1 ELSE 0 END AS valid
FROM events
""", "O9 validity flag")


def o10_run_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 (dtrendandstat_dlog.R:47-48): run ids via lag+cumsum, the
    gaps-and-islands sessionization primitive."""
    df = with_run_id(_flagged_events(spark, sf_dir), ["user_id"], "event_id")
    return df.select("event_id", "user_id", "valid", "run_id")


register("o10_run_id", o10_run_id,
         _RUNS_ORACLE_CTE + "SELECT event_id, user_id, valid, run_id FROM runs",
         "O10 run-id lag+cumsum")


def o11_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 (dtrendandstat_dlog.R:50-51): windowed group size without row
    reduction."""
    df = with_run_id(_flagged_events(spark, sf_dir), ["user_id"], "event_id")
    df = with_run_length(df, ["user_id"])
    return df.select("event_id", "user_id", "valid", "run_id", "run_length")


register("o11_run_length", o11_run_length,
         _RUNS_ORACLE_CTE +
         "SELECT event_id, user_id, valid, run_id, run_length FROM sized",
         "O11 windowed run length")


def o12_run_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 (dtrendandstat_dlog.R:53): keep valid runs with length >= 3;
    every qualifying run survives (not only the longest)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    df = clean_runs(ev, ["user_id"], "event_id", "value", min_len=3,
                    predicate=F.col("value").isNotNull() & (F.col("value") > 50))
    return df.select("event_id", "user_id", "run_id", "run_length")


register("o12_run_filter", o12_run_filter,
         _RUNS_ORACLE_CTE +
         """SELECT event_id, user_id, run_id, run_length
FROM sized WHERE valid = 1 AND run_length >= 3""",
         "O12 min-run-length filter")


# --- O13: distinct ----------------------------------------------------------
def o13_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 (dtrendandstat_dlog.R:57): distinct over a key pair (partial
    aggregation makes this a small shuffle at any scale)."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


register("o13_distinct", o13_distinct,
         "SELECT DISTINCT user_id, event_type FROM events", "O13 distinct")


# --- O14: count-by-key + HAVING --------------------------------------------
def o14_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14 (dtrendandstat_dlog.R:58-59): entities with the full set of
    categories — countDistinct + HAVING n == 5."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .filter(F.col("n_types") == 5)
    )


register("o14_having", o14_having, """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 5
""", "O14 having")


# --- O15: semi-join ----------------------------------------------------------
def o15_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15 (dtrendandstat_dlog.R:60-63): left-semi join — customers that
    placed at least one open order. Broadcast the key set."""
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(open_orders, cust.c_custkey == open_orders.o_custkey,
                     "left_semi").select("c_custkey", "c_name", "c_mktsegment")


register("o15_semi_join", o15_semi_join, """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""", "O15 left-semi join")


# --- O16: pivot wider ---------------------------------------------------------
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def o16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16 (dtrendandstat_dlog.R:68-69): long -> wide pivot with an
    EXPLICIT value list (no discovery pass over the fact table)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return pivot_counts(ev, ["user_id"], "event_type", EVENT_TYPES)


register("o16_pivot", o16_pivot, """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error
FROM events GROUP BY user_id
""", "O16 pivot wider")


# --- O17: arithmetic projections ----------------------------------------------
def o17_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17 (dtrendandstat_dlog.R:70-75): null-propagating arithmetic
    derivations (revenue/charge/discounted ratio)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # No rounding: single-row IEEE arithmetic with the same association
    # is bit-identical across engines; ROUND() near exact .5 boundaries
    # (common for terminating-decimal quotients) is NOT.
    return li.select(
        "l_orderkey", "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


register("o17_arithmetic", o17_arithmetic, """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       l_extendedprice / l_quantity AS unit_price
FROM lineitem
""", "O17 arithmetic projections")


# --- O18: dimension lookup join -------------------------------------------------
def o18_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18 (dtrendandstat_dlog.R:76): enrich rows from a small dimension
    — broadcast join, fact never shuffles."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


register("o18_lookup_join", o18_lookup_join, """
SELECT s_suppkey, s_name, n_name, r_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""", "O18 dimension lookup join")


# --- O19: guarded log --------------------------------------------------------
def o19_guarded_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19 (dtrendandstat_HP100.R:154-156): log() only where defined,
    NULL elsewhere."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(
            F.when(F.col("value").isNotNull() & (F.col("value") > 0),
                   F.log(F.col("value"))),
            6,
        ).alias("log_value"),
    )


register("o19_guarded_log", o19_guarded_log, """
SELECT event_id,
       ROUND(CASE WHEN value IS NOT NULL AND value > 0 THEN LN(value) END, 6)
           AS log_value
FROM events
""", "O19 guarded log")


# --- O20: first difference of logs over an ordered partition --------------------
def o20_dlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O20 (dtrendandstat_dlog.R:83-92): dlog = log(x) - log(lag(x)) per
    entity in order. Reference quirk preserved: the lag is the previous
    SURVIVING row, so differences span gaps."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id").orderBy("event_id")
    guarded = F.when(F.col("value") > 0, F.log("value"))
    return ev.select(
        "event_id", "user_id",
        F.round(guarded - F.lag(guarded).over(w), 6).alias("dlog_value"),
    )


register("o20_dlog", o20_dlog, """
SELECT event_id, user_id,
       ROUND(
         (CASE WHEN value > 0 THEN LN(value) END)
         - LAG(CASE WHEN value > 0 THEN LN(value) END)
             OVER (PARTITION BY user_id ORDER BY event_id),
         6) AS dlog_value
FROM events
""", "O20 dlog via lag")


# --- O21: per-group time index ----------------------------------------------
def o21_time_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O21 (detrendandstat_quad.R:151): t = year - min(year per group) + 1."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey", "o_custkey",
        (yr - F.min(yr).over(w) + 1).alias("t"),
    )


register("o21_time_index", o21_time_index, """
SELECT o_orderkey, o_custkey,
       CAST(EXTRACT(year FROM o_orderdate)
            - MIN(EXTRACT(year FROM o_orderdate)) OVER (PARTITION BY o_custkey)
            + 1 AS INT) AS t
FROM orders
""", "O21 per-group time index")
