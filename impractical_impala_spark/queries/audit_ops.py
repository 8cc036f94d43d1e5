"""Corpus / warehouse audit operators and temporal allocation — the
round-7 curation wave:

- PK uniqueness audit across every fixture table in ONE result (the
  pre-ingest gate next to dq_column_profile and fk_integrity_audit).
- Train/test split leakage audit: deterministic hash split + content-
  fingerprint collision across the split boundary — the eval-
  contamination check a training pipeline runs before every export.
- Cross-source content overlap: which sources copy from each other,
  via prefix fingerprints and the sorted-pair-explode decomposition
  (bounded by the source dimension, never pairing documents).
- Order-to-ship lag order statistics: exact p50/p90/p99 over the
  naturally bounded lag-day domain (first-crossing scan, no binning).
- Weekday seasonal decomposition: centered-7-day-MA detrend on the
  dense per-type daily spine, integer seasonal indices per weekday.
- Degree assortativity of the customer-supplier co-purchase graph:
  Pearson over edge endpoint degrees from integer sufficient sums.
- Session-to-hour interval allocation: gap-sessionized intervals
  spread onto the clock-hour grid (the interval->grid allocation
  operator), aggregated to hour-of-day.

Scale decompositions as in the drift family: one fact-scan reduction
to a bounded domain per operator, exact integer accumulation, one
float evaluation at the end where a float is emitted at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .dedup import COPY_OFFSET

DAY_NS = 86_400_000_000_000
HOUR_NS = 3_600_000_000_000
SESS_GAP_NS = 30 * 60 * 1_000_000_000


# ------------------------------------------- PK uniqueness audit
_PK = [
    ("customer", ["c_custkey"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
    ("events", ["event_id"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("nation", ["n_nationkey"]),
    ("orders", ["o_orderkey"]),
    ("part", ["p_partkey"]),
    ("region", ["r_regionkey"]),
    ("supplier", ["s_suppkey"]),
]


def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit over every table in one result:
    rows, distinct keys, surplus (duplicate) rows and the worst key
    multiplicity. Composite keys concatenate with a separator (both
    engines' concat_ws skips NULLs identically). Each branch is one
    scan into a key-grouped count then a 1-row aggregate — the whole
    audit is a union of dimension-sized results; no branch ever sorts
    or collects. The third leg of the DQ gate next to
    dq_column_profile (value ranges) and fk_integrity_audit (FKs)."""
    outs = []
    for table, keys in _PK:
        df = load_table(spark, sf_dir, table)
        k = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
        per = (df.select(k.alias("k"))
               .groupBy("k").agg(F.count(F.lit(1)).alias("m")))
        outs.append(per.agg(
            F.sum("m").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            (F.sum("m") - F.count(F.lit(1))).alias("n_dup_rows"),
            F.max("m").alias("max_multiplicity"))
            .select(F.lit(table).alias("table_name"), "n_rows", "n_keys",
                    "n_dup_rows", "max_multiplicity"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("table_name")


_PK_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name,
       CAST(SUM(m) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(m) - COUNT(*) AS BIGINT) AS n_dup_rows,
       CAST(MAX(m) AS BIGINT) AS max_multiplicity
FROM (SELECT concat_ws('|', {", ".join(f"CAST({c} AS VARCHAR)" for c in ks)})
          AS k, COUNT(*) AS m
      FROM {t} GROUP BY 1) u{t}"""
    for t, ks in _PK)

register("dq_uniqueness_audit", dq_uniqueness_audit,
         f"SELECT * FROM (\n{_PK_SQL}\n) ORDER BY table_name",
         "primary-key uniqueness audit across all tables")


# --------------------------------------- split leakage audit
TRAIN_PCT = 90


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage audit: the corpus (augmented with the
    dedup fixture's every-5th-doc exact copies, so duplicate groups
    exist) splits 90/10 by a deterministic doc_id hash, and the audit
    counts test rows whose EXACT content fingerprint also appears in
    train — eval contamination through duplicated documents, the
    failure hash-splitting on document id cannot prevent (copies get
    different ids and land on both sides). One shuffle on md5(text);
    the verdict is a 1-row integer summary. At 100 TB this is the same
    plan: fingerprint-grouped flags, aggregate-only output."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(COPY_OFFSET))
    allr = docs.unionByName(copies)
    marked = allr.select(
        F.md5("text").alias("fp"),
        F.expr(f"CASE WHEN cast(conv(substring(md5(cast(doc_id as string)),"
               f" 1, 7), 16, 10) as bigint) % 100 < {TRAIN_PCT}"
               " THEN 1 ELSE 0 END").alias("train"))
    per_fp = marked.groupBy("fp").agg(
        F.max("train").alias("has_train"),
        F.max(F.lit(1) - F.col("train")).alias("has_test"),
        F.sum("train").alias("n_train_rows"),
        F.sum(F.lit(1) - F.col("train")).alias("n_test_rows"))
    return per_fp.agg(
        F.sum("n_train_rows").alias("n_train"),
        F.sum("n_test_rows").alias("n_test"),
        F.sum(F.col("has_train") * F.col("has_test")).alias("n_fp_shared"),
        F.sum(F.col("has_train") * F.col("n_test_rows"))
        .alias("n_test_leaked")
    ).select(
        "n_train", "n_test", "n_fp_shared", "n_test_leaked",
        F.expr("n_test_leaked * 1000000 div n_test").alias("leak_ppm"))


register("split_leakage_audit", split_leakage_audit, f"""
WITH alldocs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {COPY_OFFSET}, text FROM documents WHERE doc_id % 5 = 0
), marked AS (
    SELECT md5(text) AS fp,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 7)) AS BIGINT)
                     % 100 < {TRAIN_PCT}
                THEN 1 ELSE 0 END AS train
    FROM alldocs
), per_fp AS (
    SELECT fp, MAX(train) AS has_train, MAX(1 - train) AS has_test,
           SUM(train) AS n_train_rows, SUM(1 - train) AS n_test_rows
    FROM marked GROUP BY fp
)
SELECT CAST(SUM(n_train_rows) AS BIGINT) AS n_train,
       CAST(SUM(n_test_rows) AS BIGINT) AS n_test,
       CAST(SUM(has_train * has_test) AS BIGINT) AS n_fp_shared,
       CAST(SUM(has_train * n_test_rows) AS BIGINT) AS n_test_leaked,
       CAST(SUM(has_train * n_test_rows) * 1000000
            // SUM(n_test_rows) AS BIGINT) AS leak_ppm
FROM per_fp
""", "hash-split eval-contamination audit via content fingerprints")


# ------------------------------------ cross-source content overlap
FP_PREFIX = 64


def source_content_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources copy from each other: per source pair, the count
    of shared 64-char-prefix content fingerprints and the fingerprint-
    set Jaccard. Each fingerprint reduces to its SORTED source set
    (bounded by the source dimension), pairs explode from the array
    with the index-offset lambda (audience_overlap_wide's shape) —
    documents are never paired with documents, and the shuffle key is
    the fingerprint. Per-source fingerprint counts attach via one
    broadcast of the source-dimension aggregate."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.md5(F.expr(f"substring(text, 1, {FP_PREFIX})")).alias("fp"),
        "source")
    sf = docs.distinct()
    sets = (sf.groupBy("fp")
            .agg(F.array_sort(F.collect_set("source")).alias("srcs")))
    pairs = (sets.select(F.explode(F.expr(
        "flatten(transform(srcs, (x, i) ->"
        " transform(slice(srcs, i + 2, size(srcs)),"
        " y -> struct(x AS src_a, y AS src_b))))")).alias("p"))
        .select("p.src_a", "p.src_b"))
    n_both = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_shared_fp"))
    per_src = sf.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    return (n_both
            .join(F.broadcast(per_src.select(
                F.col("source").alias("src_a"), F.col("n_fp").alias("n_a"))),
                "src_a")
            .join(F.broadcast(per_src.select(
                F.col("source").alias("src_b"), F.col("n_fp").alias("n_b"))),
                "src_b")
            .select("src_a", "src_b", "n_a", "n_b", "n_shared_fp",
                    F.expr("n_shared_fp * 1000000"
                           " div (n_a + n_b - n_shared_fp)")
                    .alias("jaccard_ppm"))
            .orderBy("src_a", "src_b"))


register("source_content_overlap", source_content_overlap, f"""
WITH sf AS (
    SELECT DISTINCT md5(substr(text, 1, {FP_PREFIX})) AS fp, source
    FROM documents
), per_src AS (
    SELECT source, COUNT(*) AS n_fp FROM sf GROUP BY source
), ab AS (
    SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared_fp
    FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(pa.n_fp AS BIGINT) AS n_a, CAST(pb.n_fp AS BIGINT) AS n_b,
       CAST(n_shared_fp AS BIGINT) AS n_shared_fp,
       CAST(n_shared_fp * 1000000 // (pa.n_fp + pb.n_fp - n_shared_fp)
            AS BIGINT) AS jaccard_ppm
FROM ab
JOIN per_src pa ON src_a = pa.source
JOIN per_src pb ON src_b = pb.source
ORDER BY src_a, src_b
""", "cross-source duplicate-content overlap via prefix fingerprints")


# --------------------------------- order-to-ship lag order statistics
def order_ship_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of the order-to-ship lag (days between
    o_orderdate and l_shipdate) per order priority — fulfillment SLA
    order statistics. The lag domain is NATURALLY bounded (0..~122
    days by the TPC-H generator contract), so no binning is needed:
    one fact join + one shuffle into (priority x lag-day) counts, then
    the first-crossing scan over that bounded domain (the
    events_interarrival_profile idiom) yields exact day quantiles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    lag = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .select("o_orderpriority",
                   F.datediff("l_shipdate", "o_orderdate").cast("long")
                   .alias("lag_d")))
    per = lag.groupBy("o_orderpriority", "lag_d").agg(
        F.count(F.lit(1)).alias("c"))
    tot = per.groupBy("o_orderpriority").agg(F.sum("c").alias("n"))
    wcum = Window.partitionBy("o_orderpriority").orderBy("lag_d")
    cum = (per.withColumn("cum", F.sum("c").over(wcum))
           .join(F.broadcast(tot), "o_orderpriority"))
    p50 = (cum.filter(F.col("cum") * 2 >= F.col("n"))
           .groupBy("o_orderpriority").agg(F.min("lag_d").alias("p50_d")))
    p90 = (cum.filter(F.col("cum") * 10 >= F.col("n") * 9)
           .groupBy("o_orderpriority").agg(F.min("lag_d").alias("p90_d")))
    p99 = (cum.filter(F.col("cum") * 100 >= F.col("n") * 99)
           .groupBy("o_orderpriority").agg(F.min("lag_d").alias("p99_d")))
    return (tot.join(F.broadcast(p50), "o_orderpriority")
            .join(F.broadcast(p90), "o_orderpriority")
            .join(F.broadcast(p99), "o_orderpriority")
            .orderBy("o_orderpriority"))


register("order_ship_lag_quantiles", order_ship_lag_quantiles, """
WITH lag AS (
    SELECT o_orderpriority,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
               AS lag_d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per AS (
    SELECT o_orderpriority, lag_d, COUNT(*) AS c FROM lag GROUP BY 1, 2
), cum AS (
    SELECT o_orderpriority, lag_d,
           CAST(SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lag_d)
                AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
    FROM per
)
SELECT o_orderpriority, MAX(n) AS n,
       MIN(CASE WHEN cum * 2 >= n THEN lag_d END) AS p50_d,
       MIN(CASE WHEN cum * 10 >= n * 9 THEN lag_d END) AS p90_d,
       MIN(CASE WHEN cum * 100 >= n * 99 THEN lag_d END) AS p99_d
FROM cum GROUP BY o_orderpriority ORDER BY o_orderpriority
""", "exact fulfillment-lag day quantiles per order priority")


# ------------------------------------- weekday seasonal decomposition
def events_weekday_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive weekday seasonality: per event type, daily revenue on
    the DENSE day spine (missing day = real zero) detrends against a
    centered 7-day moving average (full windows only — the MA and the
    weekday mean are exact integer divisions), and the per-weekday
    seasonal index is the mean detrended value. Spine cardinality is
    the calendar, the MA window runs over it, and the single fact scan
    produces the daily cents aggregate. dow is the epoch-day mod-7
    index shifted so 0 = Sunday ((d + 4) % 7) — pure integer, no
    calendar functions to disagree on."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {DAY_NS}").alias("d"),
        F.floor(F.col("value") * 100).cast("long").alias("centi"))
    daily = ev.groupBy("event_type", "d").agg(F.sum("centi").alias("c"))
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(d0, d1)")).alias("d"))
    dense = (spine.join(daily, ["event_type", "d"], "left")
             .withColumn("c", F.coalesce("c", F.lit(0))))
    w7 = (Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-3, 3))
    detr = (dense
            .withColumn("n7", F.count(F.lit(1)).over(w7))
            .withColumn("sum7", F.sum("c").over(w7))
            .filter(F.col("n7") == 7)
            .select("event_type", ((F.col("d") + 4) % 7).alias("dow"),
                    (F.col("c") - F.expr("sum7 div 7")).alias("detr")))
    return (detr.groupBy("event_type", "dow")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.expr("sum(detr) div count(1)").alias("seasonal_centi"))
            .orderBy("event_type", "dow"))


register("events_weekday_decompose", events_weekday_decompose, f"""
WITH daily AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS d,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1
), spine AS (
    SELECT event_type, UNNEST(range(d0, d1 + 1)) AS d FROM bounds
), dense AS (
    SELECT s.event_type, s.d, COALESCE(dd.c, 0) AS c
    FROM spine s LEFT JOIN daily dd
      ON s.event_type = dd.event_type AND s.d = dd.d
), detr AS (
    SELECT event_type, (d + 4) % 7 AS dow,
           c - CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) // 7
               AS detr,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
    FROM dense
)
SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(detr) // COUNT(*) AS BIGINT) AS seasonal_centi
FROM detr WHERE n7 = 7
GROUP BY event_type, dow ORDER BY event_type, dow
""", "7-day-MA-detrended integer weekday seasonal index per type")


# --------------------------------------- degree assortativity
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-supplier co-purchase
    graph: Pearson correlation between endpoint degrees over the
    DISTINCT edge set (do high-degree customers buy from high-degree
    suppliers?). Edges dedup with one (cust, supp) shuffle; degrees
    are groupBys of that edge table (dimension-sized); the correlation
    reduces to six integer sufficient sums joined back through two
    broadcast-able degree tables. deg products stay inside int64 to
    ~1e5-degree hubs at 1e9 edges (sum <= E * deg_c * deg_s); past
    that accumulate DECIMAL(38,0) partials."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    edges = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select("o_custkey", "l_suppkey").distinct())
    deg_c = edges.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("dc"))
    deg_s = edges.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("ds"))
    suff = (edges.join(deg_c, "o_custkey").join(F.broadcast(deg_s),
                                                "l_suppkey")
            .agg(F.count(F.lit(1)).alias("n_edges"),
                 F.sum("dc").alias("sx"), F.sum("ds").alias("sy"),
                 F.sum(F.col("dc") * F.col("ds")).alias("sxy"),
                 F.sum(F.col("dc") * F.col("dc")).alias("sxx"),
                 F.sum(F.col("ds") * F.col("ds")).alias("syy")))
    nc = deg_c.agg(F.count(F.lit(1)).alias("n_customers"))
    ns = deg_s.agg(F.count(F.lit(1)).alias("n_suppliers"))
    r = ("(cast(n_edges as double) * sxy - cast(sx as double) * sy)"
         " / sqrt((cast(n_edges as double) * sxx - cast(sx as double) * sx)"
         " * (cast(n_edges as double) * syy - cast(sy as double) * sy))")
    return (suff.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(ns))
            .select("n_edges", "n_customers", "n_suppliers",
                    (F.round(F.expr(r), 6) + 0.0).alias("assortativity")))


register("graph_degree_assortativity", graph_degree_assortativity, """
WITH edges AS (
    SELECT DISTINCT o_custkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), deg_c AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS dc
    FROM edges GROUP BY 1
), deg_s AS (
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS ds
    FROM edges GROUP BY 1
), suff AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(dc) AS BIGINT) AS sx, CAST(SUM(ds) AS BIGINT) AS sy,
           CAST(SUM(dc * ds) AS BIGINT) AS sxy,
           CAST(SUM(dc * dc) AS BIGINT) AS sxx,
           CAST(SUM(ds * ds) AS BIGINT) AS syy
    FROM edges JOIN deg_c USING (o_custkey) JOIN deg_s USING (l_suppkey)
)
SELECT n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg_c) AS n_customers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg_s) AS n_suppliers,
       ROUND((CAST(n_edges AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n_edges AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n_edges AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6) + 0.0
           AS assortativity
FROM suff
""", "degree assortativity of the customer-supplier co-purchase graph")


# --------------------------------------- session-to-hour allocation
def session_hour_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-to-grid allocation: gap-sessionized user intervals
    (30-min inactivity closes a session, the events_sessionized
    contract) spread their duration onto the clock-hour grid — each
    session contributes its exact overlap seconds to every hour bucket
    it crosses — aggregated to hour-of-day. The explode factor per
    session is its hour span (bounded by the session-gap rule, not by
    data volume); sessionization itself is the one per-user
    lag+cumsum shuffle. Integer nanosecond arithmetic end to end."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_ns")
    wlag = Window.partitionBy("user_id").orderBy("ts_ns")
    sess = (ev
            .withColumn("new_s", F.when(
                (F.col("ts_ns") - F.lag("ts_ns").over(wlag))
                > SESS_GAP_NS, 1).otherwise(0))
            .withColumn("sid", F.sum("new_s").over(
                wlag.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("user_id", "sid")
            .agg(F.min("ts_ns").alias("s_ns"), F.max("ts_ns").alias("e_ns")))
    alloc = (sess
             .select("s_ns", "e_ns",
                     F.explode(F.expr(
                         f"sequence(s_ns div {HOUR_NS}, e_ns div {HOUR_NS})"))
                     .alias("h"))
             .withColumn("ov_ns",
                         F.least(F.col("e_ns"), (F.col("h") + 1) * HOUR_NS)
                         - F.greatest(F.col("s_ns"), F.col("h") * HOUR_NS))
             .select(
                 (F.col("h") % 24).alias("hour_of_day"),
                 F.expr("ov_ns div 1000000000").alias("sec")))
    return (alloc.groupBy("hour_of_day")
            .agg(F.count(F.lit(1)).alias("n_session_hours"),
                 F.sum("sec").alias("total_seconds"))
            .orderBy("hour_of_day"))


register("session_hour_allocation", session_hour_allocation, f"""
WITH ev AS (
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns
    FROM events
), flagged AS (
    SELECT user_id, ts_ns,
           CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id
                                              ORDER BY ts_ns)
                     > {SESS_GAP_NS} THEN 1 ELSE 0 END AS new_s
    FROM ev
), sess AS (
    SELECT user_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ns
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
           ts_ns
    FROM flagged
), iv AS (
    SELECT MIN(ts_ns) AS s_ns, MAX(ts_ns) AS e_ns
    FROM sess GROUP BY user_id, sid
), alloc AS (
    SELECT hh.h % 24 AS hour_of_day,
           (LEAST(e_ns, (hh.h + 1) * {HOUR_NS})
            - GREATEST(s_ns, hh.h * {HOUR_NS})) // 1000000000 AS sec
    FROM iv, UNNEST(range(s_ns // {HOUR_NS},
                          e_ns // {HOUR_NS} + 1)) AS hh(h)
)
SELECT hour_of_day, CAST(COUNT(*) AS BIGINT) AS n_session_hours,
       CAST(SUM(sec) AS BIGINT) AS total_seconds
FROM alloc GROUP BY hour_of_day ORDER BY hour_of_day
""", "gap-session intervals allocated onto the clock-hour grid")
