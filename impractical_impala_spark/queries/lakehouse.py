"""Lakehouse / warehouse-maintenance operators: SCD2 history build,
CDC latest-state upsert view, snapshot diffing, and bucket-co-located
joins.

The reference is a one-shot batch pipeline (SURVEY.md §1.3) with no
table-maintenance surface; these are the operations a 100 TB lake needs
the day it stops being append-only:

- SCD2 (slowly-changing-dimension type 2): turn an event log into
  versioned validity intervals. The naive form sorts each key's full
  history; the shape here is one shuffle on the key, change-row
  filtering BEFORE the second (versioning) window, so the version
  numbering runs over the reduced change set, not the corpus.
- CDC latest-state: the classic "current snapshot from the changelog"
  upsert view. Decomposed as ``max(struct(ordering, payload))`` — a
  map-side-combinable aggregate (one shuffle, no per-key sort, no
  window) rather than the textbook ROW_NUMBER()=1 which sorts every
  key's history.
- Snapshot diff: full-outer join of two per-key reductions — each side
  reduces BEFORE the join, so the join carries one row per key per
  side, never event×event.
- Bucketed join: both fact tables written bucketed on the join key;
  the join then reads co-located buckets with NO exchange on either
  side — at 100 TB this is the difference between a full-corpus
  shuffle per join and zero (verified by tests/test_plans.py with
  broadcasting force-disabled).

All timestamps are integer epoch-microsecond arithmetic on both
engines, so hashes are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# 2024-01-01 is epoch day 19723; the events fixture spans 30 days from
# there. Day 15 splits it into two non-trivial "snapshots".
CUT_US = (19723 + 15) * 86_400_000_000

# keep SCD2 output bounded: every 10th user (15 of 150 at sf0.01)
SCD2_USER_MOD = 10


def _ev_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts_ns div 1000").alias("ts_us"))


# ------------------------------------------------------------- SCD2
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each user's event_type "state": one row per
    state change carrying [valid_from_us, valid_to_us) and a version
    number; the open current version reports valid_to_us = -1.

    Scale shape: one shuffle on user_id serves both windows (same
    partitioning + ordering, Catalyst runs them off one sort). The
    change filter runs between them, so versioning and validity-end
    computation see only change rows — per-key state is one previous
    value, never the key's full history materialized at once.
    """
    ev = _ev_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        changes.filter(F.col("user_id") % SCD2_USER_MOD == 0)
        .select(
            "user_id",
            F.row_number().over(wc).cast("long").alias("version_n"),
            F.col("event_type").alias("state"),
            F.col("ts_us").alias("valid_from_us"),
            F.coalesce(F.lead("ts_us").over(wc), F.lit(-1).cast("long"))
            .alias("valid_to_us"),
        )
    )


register("scd2_user_state", scd2_user_state, f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
), chg AS (
    SELECT user_id, event_type, ts_us, event_id FROM (
        SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id) AS prev_type
        FROM ev
    ) WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS version_n,
       event_type AS state,
       ts_us AS valid_from_us,
       COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id), -1)
           AS valid_to_us
FROM chg WHERE user_id % {SCD2_USER_MOD} = 0
""", "SCD2 validity intervals from the event log (change-row windows)")


# ------------------------------------------------- CDC latest state
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot view of the changelog: each user's latest event
    decides their state, summarized per state.

    Scale shape: ``max(struct(ts_us, event_id, payload))`` is an
    ordinary algebraic aggregate — partial max per partition map-side,
    one shuffled row per user — where the textbook ROW_NUMBER()=1 form
    (kept as the oracle spec) sorts every user's full history. The
    (ts_us, event_id) prefix is unique per user, so the struct max is
    deterministic and the payload fields never decide the order.
    """
    ev = _ev_us(spark, sf_dir)
    latest = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts_us", "event_id", "event_type", "value"))
             .alias("s"))
        .select("user_id",
                F.col("s.event_type").alias("last_type"),
                F.col("s.value").alias("last_value"))
    )
    return (
        latest.groupBy("last_type")
        .agg(F.count(F.lit(1)).alias("n_users"),
             F.round(F.avg("last_value"), 6).alias("avg_last_value"))
        .orderBy("last_type")
    )


register("cdc_latest_state", cdc_latest_state, """
WITH latest AS (
    SELECT user_id, event_type AS last_type, value AS last_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts) DESC,
                                              event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
)
SELECT last_type, COUNT(*) AS n_users,
       ROUND(AVG(last_value), 6) AS avg_last_value
FROM latest GROUP BY last_type ORDER BY last_type
""", "changelog -> current snapshot via map-side-combinable struct max")


# ---------------------------------------------------- snapshot diff
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two snapshots of per-user activity (events before vs after
    the fixture midpoint): how many keys appeared, disappeared, or
    changed, and the net value delta per status.

    Scale shape: each snapshot reduces to one row per key BEFORE the
    full-outer join, so the join is key-vs-key (co-partitioned —
    Catalyst reuses the aggregation's hash partitioning), and the
    corpus is scanned once per side with the time predicate pushed to
    the parquet scan. The key is (user_id, hour-of-day): fine enough
    that keys genuinely appear/disappear between halves, so all four
    statuses exercise.
    """
    # integer div, not float-divide-and-cast: exact on both engines
    ev = _ev_us(spark, sf_dir).withColumn(
        "hr24", F.expr("(ts_us div 3600000000) % 24"))

    def snap(pred):
        return (ev.filter(pred).groupBy("user_id", "hr24")
                .agg(F.round(F.sum("value"), 4).alias("v"),
                     F.count(F.lit(1)).alias("n")))

    before = snap(F.col("ts_us") < CUT_US)
    after = snap(F.col("ts_us") >= CUT_US)
    joined = (
        before.withColumnRenamed("v", "v0").withColumnRenamed("n", "n0")
        .join(after.withColumnRenamed("v", "v1").withColumnRenamed("n", "n1"),
              ["user_id", "hr24"], "full_outer")
    )
    status = (
        F.when(F.col("n0").isNull(), F.lit("added"))
        .when(F.col("n1").isNull(), F.lit("removed"))
        .when(F.col("v0") != F.col("v1"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        joined.select(
            status.alias("status"),
            (F.coalesce("v1", F.lit(0.0)) - F.coalesce("v0", F.lit(0.0)))
            .alias("delta"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"),
             F.round(F.sum("delta"), 4).alias("net_delta"))
        .orderBy("status")
    )


register("snapshot_diff", snapshot_diff, f"""
WITH before AS (
    SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hr24,
           ROUND(SUM(value), 4) AS v0, COUNT(*) AS n0 FROM events
    WHERE epoch_us(ts) < {CUT_US} GROUP BY user_id, hr24
), after AS (
    SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hr24,
           ROUND(SUM(value), 4) AS v1, COUNT(*) AS n1 FROM events
    WHERE epoch_us(ts) >= {CUT_US} GROUP BY user_id, hr24
), joined AS (
    SELECT CASE WHEN b.n0 IS NULL THEN 'added'
                WHEN a.n1 IS NULL THEN 'removed'
                WHEN b.v0 <> a.v1 THEN 'changed'
                ELSE 'same' END AS status,
           COALESCE(a.v1, 0.0) - COALESCE(b.v0, 0.0) AS delta
    FROM before b FULL OUTER JOIN after a USING (user_id, hr24)
)
SELECT status, COUNT(*) AS n_keys, ROUND(SUM(delta), 4) AS net_delta
FROM joined GROUP BY status ORDER BY status
""", "full-outer diff of two per-key snapshot reductions")


# ---------------------------------------------------- bucketed join
N_BUCKETS = 8


def _bucket_tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")


def bucketed_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders and customer bucketed on the join key, then join the
    bucketed tables and aggregate revenue per market segment.

    Scale shape: bucketing IS the point — both sides land on disk
    hash-partitioned by custkey into the same bucket count, so the join
    reads co-located buckets with no Exchange on either side (asserted
    by tests/test_plans.py with broadcast force-disabled). At 100 TB
    this converts every subsequent custkey join from a full-corpus
    shuffle into a local merge, amortizing one write-time shuffle
    across every downstream query. Bucket count is 8 at test scale;
    on a cluster it is sized so each bucket file is O(128 MB).
    """
    tag = _bucket_tag(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    ot, ct = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    # the in-memory catalog is session-scoped but managed-table
    # locations persist on disk: clear both so a fresh session's
    # overwrite never trips LOCATION_ALREADY_EXISTS
    import shutil
    from urllib.parse import urlparse
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (ot, ct):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (orders.write.bucketBy(N_BUCKETS, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").format("parquet").saveAsTable(ot))
    (customer.write.bucketBy(N_BUCKETS, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").format("parquet").saveAsTable(ct))
    o, c = spark.table(ot), spark.table(ct)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("revenue"))
        .orderBy("c_mktsegment")
    )


register("bucketed_join_segments", bucketed_join_segments, """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""", "shuffle-free join of bucket-co-located tables under the hash gate")


# ------------------------------------------------------ MERGE upsert
INS_OFFSET = 20_000_000


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics composed from one full-outer join: a CDC
    batch of updates (matched -> new price), inserts (not matched ->
    new row) and deletes (matched -> drop) applies to orders in a
    single co-partitioned pass — the row-level mutation primitive of a
    lakehouse table format, without rewriting unmatched rows' content.
    Summarized per order status; the oracle recomputes the merged
    state with the same CASE rules."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    upd = (orders.filter(F.col("o_orderkey") % 97 == 0)
           .select("o_orderkey",
                   (F.col("o_totalprice") * 1.1).alias("c_price"))
           .withColumn("op", F.lit("U"))
           .withColumn("c_status", F.lit(None).cast("string")))
    ins = (orders.filter(F.col("o_orderkey") % 101 == 0)
           .select((F.col("o_orderkey") + INS_OFFSET).alias("o_orderkey"),
                   F.col("o_totalprice").alias("c_price"))
           .withColumn("op", F.lit("I"))
           .withColumn("c_status", F.lit("N")))
    dele = (orders.filter(F.col("o_orderkey") % 103 == 0)
            .select("o_orderkey")
            .withColumn("c_price", F.lit(None).cast("double"))
            .withColumn("op", F.lit("D"))
            .withColumn("c_status", F.lit(None).cast("string")))
    changes = upd.unionByName(ins).unionByName(dele)
    merged = (
        orders.join(changes, "o_orderkey", "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce("c_status", "o_orderstatus").alias("status"),
            F.coalesce("c_price", "o_totalprice").alias("price"))
    )
    return (
        merged.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("price"), 4).alias("total_price"))
        .orderBy("status")
    )


register("merge_upsert_orders", merge_upsert_orders, f"""
WITH changes AS (
    SELECT o_orderkey, o_totalprice * 1.1 AS c_price, 'U' AS op,
           CAST(NULL AS VARCHAR) AS c_status
    FROM orders WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT o_orderkey + {INS_OFFSET}, o_totalprice, 'I', 'N'
    FROM orders WHERE o_orderkey % 101 = 0
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE), 'D', CAST(NULL AS VARCHAR)
    FROM orders WHERE o_orderkey % 103 = 0
), merged AS (
    SELECT COALESCE(c.c_status, o.o_orderstatus) AS status,
           COALESCE(c.c_price, o.o_totalprice) AS price
    FROM orders o FULL OUTER JOIN changes c USING (o_orderkey)
    WHERE COALESCE(c.op, '') <> 'D'
)
SELECT status, COUNT(*) AS n_orders,
       ROUND(SUM(price), 4) AS total_price
FROM merged GROUP BY status ORDER BY status
""", "MERGE (update/insert/delete) as one full-outer co-partitioned pass")
