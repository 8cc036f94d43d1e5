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


# ------------------------------------------- interval-overlap join
OV_GAP_US = 30 * 60 * 1_000_000   # the corpus-wide session gap
OV_HOUR_US = 3_600 * 1_000_000    # join-bucket width


def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join + stabbing max: sessionize each user
    (30-min gap), then (a) count cross-USER session pairs whose
    [lo, hi] intervals intersect, with total and max overlap duration,
    and (b) the maximum number of concurrently open sessions — the two
    classic interval queries (overlap join, stabbing count) missing
    between q_range_band_join's literal bands and pit_state_join's
    as-of semantics. Scale shape: NEVER the naive theta join — each
    interval explodes onto its covered hour buckets (bounded: sessions
    are gap-bounded), pairs join on the bucket key, and a pair is
    counted only in the FIRST bucket both share (greatest(lo_a, lo_b)
    falls in it), so no dedup shuffle is needed. The concurrency sweep
    is a boundary cumsum over session-cardinality rows (+1 at lo, -1
    at hi+1, grouped per instant so closed-interval ties resolve
    exactly). One summary row, exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us"))
    wu = Window.partitionBy("user_id").orderBy("ts_us")
    iv = (ev.withColumn("prev", F.lag("ts_us").over(wu))
          .withColumn("brk", F.expr(
              f"case when prev is null or ts_us - prev > {OV_GAP_US}"
              " then 1 else 0 end"))
          .withColumn("sid", F.sum("brk").over(
              wu.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")))
    nsess = iv.agg(F.count(F.lit(1)).alias("n_sessions"))
    bucketed = iv.select(
        "user_id", "sid", "lo", "hi",
        F.explode(F.expr(
            f"sequence(lo div {OV_HOUR_US}, hi div {OV_HOUR_US})"))
        .alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.user_id") < F.col("b.user_id"))
                    & (F.expr("greatest(a.lo, b.lo) <= least(a.hi, b.hi)"))
                    & (F.expr(f"greatest(a.lo, b.lo) div {OV_HOUR_US}"
                              " = a.bucket")))
             .select(F.expr("least(a.hi, b.hi) - greatest(a.lo, b.lo)")
                     .alias("ov_us")))
    pair_agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum("ov_us"), F.lit(0)).alias("tot_overlap_us"),
        F.coalesce(F.max("ov_us"), F.lit(0)).alias("max_overlap_us"))
    bounds = (iv.select(F.col("lo").alias("t"), F.lit(1).alias("delta"))
              .unionByName(iv.select((F.col("hi") + 1).alias("t"),
                                     F.lit(-1).alias("delta"))))
    per_t = bounds.groupBy("t").agg(F.sum("delta").alias("d"))
    conc = (per_t.withColumn(
        "active", F.sum("d").over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)))
        .agg(F.max("active").alias("max_concurrent")))
    return (nsess.crossJoin(pair_agg).crossJoin(conc)
            .select("n_sessions", "n_pairs", "tot_overlap_us",
                    "max_overlap_us", "max_concurrent"))


register("events_interval_overlap", events_interval_overlap, f"""
WITH ev AS (
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events
), marked AS (
    SELECT user_id, ts_us,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                     OR ts_us - LAG(ts_us) OVER w > {OV_GAP_US}
                THEN 1 ELSE 0 END AS brk
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), sess AS (
    SELECT user_id, ts_us,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us) AS sid
    FROM marked
), iv AS (
    SELECT user_id, sid, MIN(ts_us) AS lo, MAX(ts_us) AS hi
    FROM sess GROUP BY 1, 2
), pair_agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(LEAST(a.hi, b.hi)
                             - GREATEST(a.lo, b.lo)), 0) AS BIGINT)
               AS tot_overlap_us,
           CAST(COALESCE(MAX(LEAST(a.hi, b.hi)
                             - GREATEST(a.lo, b.lo)), 0) AS BIGINT)
               AS max_overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND GREATEST(a.lo, b.lo) <= LEAST(a.hi, b.hi)
), bounds AS (
    SELECT lo AS t, 1 AS delta FROM iv
    UNION ALL
    SELECT hi + 1 AS t, -1 AS delta FROM iv
), per_t AS (
    SELECT t, SUM(delta) AS d FROM bounds GROUP BY t
), conc AS (
    SELECT CAST(MAX(active) AS BIGINT) AS max_concurrent FROM (
        SELECT SUM(d) OVER (ORDER BY t) AS active FROM per_t)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM iv) AS n_sessions,
       n_pairs, tot_overlap_us, max_overlap_us, max_concurrent
FROM pair_agg CROSS JOIN conc
""", "bucketed interval-overlap join + max-concurrency sweep")
