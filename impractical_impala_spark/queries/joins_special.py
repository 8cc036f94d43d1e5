"""Special join operators: as-of join (purchase->last-click
attribution) and range join (value banding). The reference has neither;
both are named custom-operator targets (SURVEY.md §7 / BASELINE.json
north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..registry import register
from ..sources import load_table


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event attributed to the user's most
    recent click AT OR BEFORE it (classic last-touch attribution).
    Spark composition: union + LOCF window (operators/asof.py) — one
    shuffle. DuckDB oracle: native ASOF JOIN over a click set
    pre-deduplicated on (user_id, ts): asof_join breaks exact-time ties
    by max carry struct (= max click_id), and DuckDB ASOF's tie pick is
    arbitrary, so the oracle keeps only the max click_id per tied
    instant — identical output, deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts_us").alias("click_ts"),
    )
    return asof_join(
        purchases, clicks, on=["user_id"],
        probe_time="purchase_ts_us", ref_time="click_ts",
        ref_cols={"event_id": "click_id", "click_ts": "click_ts_us"},
    )


register("q_asof_attribution", q_asof_attribution, """
SELECT p.purchase_id, p.user_id, p.purchase_ts_us,
       c.click_id, c.click_ts_us
FROM (
    SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_ts_us
    FROM events WHERE event_type = 'purchase'
) p
ASOF LEFT JOIN (
    SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
    FROM events WHERE event_type = 'click'
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                               ORDER BY event_id DESC) = 1
) c ON p.user_id = c.user_id AND p.purchase_ts_us >= c.click_ts_us
""", "as-of join: last-click attribution (union+LOCF vs native ASOF)")


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: classify each order into a literal price
    band via a non-equi join against a tiny band dimension — broadcast
    nested-loop on 4 rows, i.e. free; at scale the band side stays
    broadcast and the fact never shuffles."""
    bands = spark.createDataFrame(
        [("micro", 0.0, 50_000.0), ("small", 50_000.0, 150_000.0),
         ("mid", 150_000.0, 300_000.0), ("large", 300_000.0, 1e12)],
        ["band", "lo", "hi"],
    )
    o = load_table(spark, sf_dir, "orders")
    joined = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("band_total"),
        )
    )


register("q_range_band_join", q_range_band_join, """
WITH bands(band, lo, hi) AS (
    VALUES ('micro', 0.0, 50000.0), ('small', 50000.0, 150000.0),
           ('mid', 150000.0, 300000.0), ('large', 300000.0, 1e12)
)
SELECT band, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS band_total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""", "range join: price banding via non-equi broadcast join")


# ------------------------------------------------- fuzzy string match
FUZZY_OFFSET = 100_000
FUZZY_MAXDIST = 4
FUZZY_BLOCK_CAP = 256  # deterministic per-block roster cap


def fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over part names: Levenshtein
    distance is quadratic per pair and all-pairs is quadratic in rows,
    so candidates are confined to equal (p_brand, p_size, length-band)
    blocks, and every block roster is capped at FUZZY_BLOCK_CAP rows by
    deterministic p_partkey order (the graph_triangles discipline —
    mirrored in the oracle, so the truncation is part of the operator's
    semantics). Every 5th part is augmented with a vowel-mutated copy
    ('u'->'x'), so true near-matches exist at every scale factor; the
    edit distance <= 4 keeps random-name collisions out. Levenshtein
    runs JVM-side (built-in), only on the bounded block pairs."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size")
    aug = part.unionByName(
        part.filter(F.col("p_partkey") % 5 == 0).select(
            (F.col("p_partkey") + FUZZY_OFFSET).alias("p_partkey"),
            F.expr("replace(p_name, 'u', 'x')").alias("p_name"),
            "p_brand", "p_size"))
    blocked = aug.withColumn("len_band", F.expr("length(p_name) div 8"))
    wb = Window.partitionBy("p_brand", "p_size", "len_band") \
        .orderBy("p_partkey")
    blocked = (blocked.withColumn("rk", F.row_number().over(wb))
               .filter(F.col("rk") <= FUZZY_BLOCK_CAP).drop("rk"))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
                   & (F.col("a.p_size") == F.col("b.p_size"))
                   & (F.col("a.len_band") == F.col("b.len_band"))
                   & (F.col("a.p_partkey") < F.col("b.p_partkey")))
    return (pairs.select(
                F.col("a.p_partkey").alias("part_a"),
                F.col("b.p_partkey").alias("part_b"),
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
                .alias("edit_dist"))
            .filter(F.col("edit_dist") <= FUZZY_MAXDIST)
            .orderBy("part_a", "part_b"))


register("fuzzy_part_match", fuzzy_part_match, f"""
WITH aug AS (
    SELECT p_partkey, p_name, p_brand, p_size FROM part
    UNION ALL
    SELECT p_partkey + {FUZZY_OFFSET}, replace(p_name, 'u', 'x'),
           p_brand, p_size
    FROM part WHERE p_partkey % 5 = 0
), blocked AS (
    SELECT * FROM (
        SELECT p_partkey, p_name, p_brand, p_size,
               length(p_name) // 8 AS len_band,
               ROW_NUMBER() OVER (PARTITION BY p_brand, p_size,
                                               length(p_name) // 8
                                  ORDER BY p_partkey) AS rk
        FROM aug)
    WHERE rk <= {FUZZY_BLOCK_CAP}
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM blocked a JOIN blocked b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.len_band = b.len_band AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAXDIST}
ORDER BY part_a, part_b
""", "blocked+capped Levenshtein fuzzy match over augmented part names")
