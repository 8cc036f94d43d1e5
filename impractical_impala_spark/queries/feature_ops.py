"""Feature-store operators: point-in-time (PIT) correctness joins and
deterministic contrastive negative sampling.

The classic training-data bugs these prevent:

- PIT leakage: joining a fact to the CURRENT dimension value leaks the
  future into training features. The correct join attaches the state
  valid STRICTLY BEFORE the fact's timestamp. Implemented on the
  as-of operator (operators/asof.py): one shuffle + a LOCF window —
  never the naive inequality join's per-key cross product.
- Nondeterministic negatives: rand()-based negative sampling is
  unreproducible across runs/engines. Negatives here are md5-derived
  ("hash randomness"), so the sample is a pure function of
  (doc_id, k) — the same trick the dedup family uses for
  engine-portable hashing — and collision-with-positive cases are
  excluded by content hash, not id, so exact duplicates of the anchor
  can never appear as its negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..registry import register
from ..sources import load_table


# ----------------------------------------------------- PIT state join
def pit_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, attach the user's SCD2 state valid
    strictly before the purchase (the feature value a model could have
    known at that moment), summarized per prior state. First-ever
    purchases have no prior state and land in 'none' — the NULL path a
    PIT join must handle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", "ts_us", F.col("event_type").alias("state"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("user_id", "event_id", "ts_us")
    pit = asof_join(purchases, changes, on=["user_id"],
                    probe_time="ts_us", ref_time="ts_us",
                    ref_cols={"state": "prior_state"}, strict=True)
    return (
        pit.select(F.coalesce("prior_state", F.lit("none"))
                   .alias("prior_state"), "user_id")
        .groupBy("prior_state")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("prior_state")
    )


register("pit_state_join", pit_state_join, """
WITH ev AS (
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM events
), chg AS (
    SELECT user_id, ts_us, event_type AS state FROM (
        SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id) AS prev_type
        FROM ev
    ) WHERE prev_type IS NULL OR prev_type <> event_type
), pur AS (
    SELECT user_id, event_id, ts_us FROM ev WHERE event_type = 'purchase'
), pit AS (
    SELECT p.user_id,
           (SELECT c.state FROM chg c
            WHERE c.user_id = p.user_id AND c.ts_us < p.ts_us
            ORDER BY c.ts_us DESC, c.state DESC LIMIT 1) AS prior_state
    FROM pur p
)
SELECT COALESCE(prior_state, 'none') AS prior_state,
       COUNT(*) AS n_purchases, COUNT(DISTINCT user_id) AS n_users
FROM pit GROUP BY 1 ORDER BY 1
""", "leakage-free point-in-time join of facts to SCD2 state (strict as-of)")


# ------------------------------------------- contrastive negatives
NEG_K = 4
ANCHOR_MOD = 50  # every 50th doc is an anchor


def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K deterministic negatives per anchor document: candidate ids are
    md5-derived from (anchor, k) — reproducible across engines and runs
    — and any candidate whose CONTENT equals the anchor's is dropped
    (id inequality alone would let exact duplicates through). One
    model-size count broadcast + two id-keyed joins; no rand()
    anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = docs.select("doc_id", F.md5("text").alias("h"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = (
        docs.filter(F.col("doc_id") % ANCHOR_MOD == 0).select("doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "n_docs",
                F.explode(F.expr(f"sequence(0, {NEG_K - 1})")).alias("k"))
    )
    neg_id = F.expr(
        "pmod(cast(conv(substring(md5(concat(cast(doc_id as string), '_',"
        " cast(k as string))), 1, 7), 16, 10) as bigint), n_docs)")
    cand = anchors.withColumn("neg_doc_id", neg_id) \
                  .filter(F.col("neg_doc_id") != F.col("doc_id"))
    ah = hashes.select(F.col("doc_id"), F.col("h").alias("anchor_h"))
    nh = hashes.select(F.col("doc_id").alias("neg_doc_id"),
                       F.col("h").alias("neg_h"))
    return (
        cand.join(ah, "doc_id").join(nh, "neg_doc_id")
        .filter(F.col("anchor_h") != F.col("neg_h"))
        .select("doc_id", "k", "neg_doc_id")
        .orderBy("doc_id", "k")
    )


register("contrastive_negatives", contrastive_negatives, f"""
WITH n AS (
    SELECT COUNT(*) AS n_docs FROM documents
), anchors AS (
    SELECT d.doc_id, n.n_docs, ks.k
    FROM documents d, n, (SELECT UNNEST(range(0, {NEG_K})) AS k) ks
    WHERE d.doc_id % {ANCHOR_MOD} = 0
), cand AS (
    SELECT doc_id, k,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                 || CAST(k AS VARCHAR)), 1, 7)) AS BIGINT) % n_docs
               AS neg_doc_id
    FROM anchors
)
SELECT c.doc_id, c.k, c.neg_doc_id
FROM cand c
JOIN documents a ON a.doc_id = c.doc_id
JOIN documents x ON x.doc_id = c.neg_doc_id
WHERE c.neg_doc_id <> c.doc_id AND md5(a.text) <> md5(x.text)
ORDER BY c.doc_id, c.k
""", "reproducible hash-derived negative sampling, content-exclusion safe")


# --------------------------------------- per-user feature materialization
DAY_NS = 86_400_000_000_000


def user_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store materialization pass: one scan of the event
    stream folds to a per-user feature row — event volume, type
    diversity, active-day count, recency against the corpus max day (a
    broadcast 1-row aggregate, never a driver round-trip), cents-exact
    value stats, and an integer events-per-active-day rate. Every
    feature is an integer (cents / milli fixed-point), so the matrix
    hashes exactly; the single shuffle is the user-key aggregate. At
    the lake this is the daily feature-refresh job the PIT join
    (pit_state_join) consumes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr(f"ts_ns div {DAY_NS}").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    corpus_max = ev.agg(F.max("day").alias("max_day"))
    feats = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.countDistinct("event_type").alias("n_types"),
                  F.countDistinct("day").alias("active_days"),
                  F.max("day").alias("last_day"),
                  F.sum("cents").alias("value_cents")))
    return (feats.crossJoin(F.broadcast(corpus_max))
            .select("user_id", "n_events", "n_types", "active_days",
                    (F.col("max_day") - F.col("last_day"))
                    .alias("recency_days"),
                    "value_cents",
                    F.expr("value_cents * 10 div n_events")
                    .alias("avg_value_milli"),
                    F.expr("n_events * 1000 div active_days")
                    .alias("events_per_day_milli"))
            .orderBy("user_id"))


register("user_feature_matrix", user_feature_matrix, f"""
WITH ev AS (
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {DAY_NS} AS day,
           CAST(FLOOR(value * 100) AS BIGINT) AS cents
    FROM events
), corpus_max AS (SELECT MAX(day) AS max_day FROM ev),
feats AS (
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(DISTINCT day) AS active_days,
           MAX(day) AS last_day,
           CAST(SUM(cents) AS BIGINT) AS value_cents
    FROM ev GROUP BY user_id
)
SELECT user_id, n_events, n_types, active_days,
       max_day - last_day AS recency_days,
       value_cents,
       CAST(value_cents * 10 // n_events AS BIGINT) AS avg_value_milli,
       CAST(n_events * 1000 // active_days AS BIGINT)
           AS events_per_day_milli
FROM feats CROSS JOIN corpus_max
ORDER BY user_id
""", "one-scan integer per-user feature matrix (feature-store refresh)")
