"""Round-8 wave 7: sequential-analysis drift detection, clustering
quality, and sequence predictability — completing the monitoring
battery (KS/CvM/PSI/JSD/CUSUM/binseg + Page-Hinkley) and the
embedding-eval battery (cohesion/outliers/purity + silhouette).

- Page-Hinkley: the classic sequential mean-shift detector — running
  deviation from the running mean, alarmed when the excursion depth
  exceeds lambda. Unlike CUSUM-vs-fixed-reference, PH self-calibrates
  to the series' own running mean, catching slow drifts the frozen
  window misses. Fully declarative: two window cumsums and a running
  min on the hourly spine, ppm-exact integers.
- Simplified silhouette: per-label clustering quality from distances
  to label centroids (a = own-centroid distance, b = nearest other
  centroid) — the O(n²) pairwise silhouette collapsed to n·L centroid
  distances (L = #labels, model-size).
- Entropy rate: per-state conditional entropy of the next event type
  given the current one — the sequence-predictability measure that
  says whether user journeys are deterministic funnels or random
  walks; weighted terms sum to the Markov-chain entropy rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import HOUR_NS

PH_DELTA_PPM = 500_000      # delta = 0.5 counts, in ppm units
PH_LAMBDA_PPM = 10_000_000  # lambda = 10 count-hours of excess


def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-INCREASE detector on the hourly count series
    per event type: term_t = x_t - mean_{1..t} - delta (ppm-exact:
    x_t*1e6 - cum_t*1e6 div t - DELTA), m_t its cumsum, depth_t =
    m_t - min_{s<=t} m_s; alarm where depth > LAMBDA. Self-calibrating
    (running mean), so slow drifts that never leave a frozen
    reference's bins still alarm. The whole detector is two window
    cumsums + a running min on the time-span-bounded dense spine —
    no state kernel, no iteration. Output one row per type: hours,
    max depth, first alarm hour index (-1 = none), alarm-hour count.
    int64: |m_t| <= n*max_cnt*1e6 — 9e18 holds to ~1e8 count-hours·1e6;
    past that the ppm terms accumulate DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    dense = (spine.join(hourly, ["event_type", "hr"], "left")
             .withColumn("cnt", F.coalesce("cnt", F.lit(0))))
    wo = Window.partitionBy("event_type").orderBy("hr")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    ph = (dense
          .withColumn("t", F.row_number().over(wo).cast("long"))
          .withColumn("cum", F.sum("cnt").over(wc))
          .withColumn("term",
                      F.expr("cnt * 1000000 - cum * 1000000 div t"
                             f" - {PH_DELTA_PPM}"))
          .withColumn("m", F.sum("term").over(wc))
          .withColumn("mn", F.min("m").over(wc))
          .withColumn("depth", F.col("m") - F.col("mn")))
    return (ph.groupBy("event_type")
            .agg(F.max("t").alias("n_hours"),
                 F.max("depth").alias("max_depth_ppm"),
                 F.coalesce(
                     F.min(F.when(F.col("depth") > PH_LAMBDA_PPM,
                                  F.col("t"))),
                     F.lit(-1)).alias("first_alarm_t"),
                 F.sum(F.when(F.col("depth") > PH_LAMBDA_PPM, 1)
                       .otherwise(0)).alias("n_alarm_hours"))
            .orderBy("event_type"))


register("events_page_hinkley", events_page_hinkley, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS hr
    FROM events
), hourly AS (
    SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
    FROM hourly GROUP BY 1
), spine AS (
    SELECT event_type, UNNEST(range(h0, h1 + 1)) AS hr FROM bounds
), dense AS (
    SELECT s.event_type, s.hr, COALESCE(h.cnt, 0) AS cnt
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), ph AS (
    SELECT event_type,
           CAST(ROW_NUMBER() OVER wo AS BIGINT) AS t,
           cnt * 1000000
             - CAST(SUM(cnt) OVER wc AS BIGINT) * 1000000
               // CAST(ROW_NUMBER() OVER wo AS BIGINT)
             - {PH_DELTA_PPM} AS term
    FROM dense
    WINDOW wo AS (PARTITION BY event_type ORDER BY hr),
           wc AS (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), msum AS (
    SELECT event_type, t,
           CAST(SUM(term) OVER (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS m
    FROM ph
), depths AS (
    SELECT event_type, t,
           m - CAST(MIN(m) OVER (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS depth
    FROM msum
)
SELECT event_type, CAST(MAX(t) AS BIGINT) AS n_hours,
       CAST(MAX(depth) AS BIGINT) AS max_depth_ppm,
       CAST(COALESCE(MIN(CASE WHEN depth > {PH_LAMBDA_PPM} THEN t END),
                     -1) AS BIGINT) AS first_alarm_t,
       CAST(SUM(CASE WHEN depth > {PH_LAMBDA_PPM} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarm_hours
FROM depths GROUP BY 1 ORDER BY event_type
""", "Page-Hinkley self-calibrating mean-shift detector per type")

SIL_MICRO = 1_000_000
SIL_NANO = 1_000_000_000


def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: a(i) = distance
    to own label centroid, b(i) = min distance to any OTHER label
    centroid, s(i) = (b-a)/max(a,b); report each label's mean s. The
    O(n²) pairwise silhouette collapses to n·L centroid distances:
    components micro-quantize, per-(label,pos) centroid sums are exact
    integers, and each vector joins ALL L centroids per position (the
    explode is L× the corpus — L is model-size, documented). Distances
    n_l-scale to avoid division (the emb_centroid_outliers trick); the
    per-vector distance-to-centroid-l rounds to an integer micro-dist,
    so a/b comparisons are exact; s quantizes to nano before the
    order-free per-label mean. DECIMAL(38,0) squared-residual sums."""
    ex = (load_table(spark, sf_dir, "embeddings")
          .select("vec_id", "label",
                  F.posexplode("embedding").alias("pos", "v"))
          .select("vec_id", "label", "pos",
                  F.floor(F.col("v").cast("double") * SIL_MICRO)
                  .cast("long").alias("vm")))
    cent = (ex.groupBy(F.col("label").alias("clabel"), "pos")
            .agg(F.sum("vm").alias("sm"), F.count(F.lit(1)).alias("n")))
    d2 = (ex.join(F.broadcast(cent), "pos")
          .withColumn("dv", F.col("vm") * F.col("n") - F.col("sm"))
          .groupBy("vec_id", "label", "clabel")
          .agg(F.sum((F.col("dv").cast("decimal(38,0)")
                      * F.col("dv").cast("decimal(38,0)"))
                     .cast("decimal(38,0)")).alias("q"),
               F.max("n").alias("n")))
    dm = d2.select(
        "vec_id", "label", "clabel",
        F.expr("cast(round(sqrt(cast(q as double)) / n) as bigint)")
        .alias("dmic"))
    ab = (dm.groupBy("vec_id", "label")
          .agg(F.max(F.when(F.col("clabel") == F.col("label"),
                            F.col("dmic"))).alias("a"),
               F.min(F.when(F.col("clabel") != F.col("label"),
                            F.col("dmic"))).alias("b")))
    s_nano = (f"cast(round({SIL_NANO} * (cast(b as double) - a)"
              " / greatest(a, b)) as bigint)")
    return (ab.filter(F.col("b").isNotNull() & (F.greatest("a", "b") > 0))
            .withColumn("sn", F.expr(s_nano))
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("sn").alias("sn_sum"))
            .select("label", "n_vecs",
                    (F.round(F.col("sn_sum") / F.col("n_vecs")
                             / SIL_NANO, 6) + 0.0)
                    .alias("mean_silhouette"))
            .orderBy("label"))


register("emb_silhouette", emb_silhouette, f"""
WITH ex AS (
    SELECT vec_id, label,
           CAST(UNNEST(range(len(embedding))) AS BIGINT) AS pos,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * {SIL_MICRO})
                AS BIGINT) AS vm
    FROM embeddings
), cent AS (
    SELECT label AS clabel, pos, CAST(SUM(vm) AS BIGINT) AS sm,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY 1, 2
), d2 AS (
    SELECT vec_id, ex.label, c.clabel,
           SUM(CAST(ex.vm * c.n - c.sm AS HUGEINT)
               * (ex.vm * c.n - c.sm)) AS q,
           MAX(c.n) AS n
    FROM ex JOIN cent c ON ex.pos = c.pos
    GROUP BY 1, 2, 3
), dm AS (
    SELECT vec_id, label, clabel,
           CAST(ROUND(SQRT(CAST(q AS DOUBLE)) / n) AS BIGINT) AS dmic
    FROM d2
), ab AS (
    SELECT vec_id, label,
           MAX(CASE WHEN clabel = label THEN dmic END) AS a,
           MIN(CASE WHEN clabel <> label THEN dmic END) AS b
    FROM dm GROUP BY 1, 2
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(CAST(SUM(CAST(ROUND({SIL_NANO}
             * (CAST(b AS DOUBLE) - a) / greatest(a, b)) AS BIGINT))
             AS BIGINT) / COUNT(*) / {SIL_NANO}, 6) + 0.0
       AS mean_silhouette
FROM ab
WHERE b IS NOT NULL AND greatest(a, b) > 0
GROUP BY 1 ORDER BY label
""", "simplified (centroid) silhouette per embedding label")


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence predictability: per current event type, the conditional
    entropy of the NEXT type, H(next|cur=i) = -Σ_j (c_ij/c_i)
    ln(c_ij/c_i), its stationary weight c_i/N, and the weighted
    contribution — the contributions sum to the empirical Markov-chain
    entropy rate (0 = deterministic funnel, ln(k) = random walk).
    ONE corpus pass (user-keyed lead window) reduces to the #types²
    count matrix; entropy terms nano-quantize per cell so the per-state
    sum is order-free exact (the MI pattern)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (ev.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull())
             .groupBy(F.col("event_type").alias("cur"), "nxt")
             .agg(F.count(F.lit(1)).alias("c")))
    cur_t = pairs.groupBy("cur").agg(F.sum("c").alias("ci"))
    tot = cur_t.agg(F.sum("ci").alias("nn"))
    term = ("cast(round(1e9 * (cast(c as double) / ci)"
            " * ln(cast(ci as double) / c)) as bigint)")
    ent = (pairs.join(F.broadcast(cur_t), "cur")
           .groupBy("cur")
           .agg(F.max("ci").alias("n_pairs"),
                F.sum(F.expr(term)).alias("h_nano")))
    return (ent.crossJoin(F.broadcast(tot))
            .select("cur", "n_pairs",
                    (F.round(F.col("h_nano") / 1e9, 6) + 0.0)
                    .alias("cond_entropy"),
                    F.expr("n_pairs * 1000000 div nn").alias("weight_ppm"),
                    (F.round(F.col("h_nano") / 1e9
                             * F.col("n_pairs")
                             / F.col("nn"), 6) + 0.0)
                    .alias("rate_contribution"))
            .orderBy("cur"))


register("events_entropy_rate", events_entropy_rate, """
WITH ev AS (
    SELECT user_id, event_type, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
), pairs AS (
    SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS nxt
        FROM ev
    ) WHERE nxt IS NOT NULL
    GROUP BY 1, 2
), cur_t AS (
    SELECT cur, CAST(SUM(c) AS BIGINT) AS ci FROM pairs GROUP BY 1
), tot AS (
    SELECT CAST(SUM(ci) AS BIGINT) AS nn FROM cur_t
), ent AS (
    SELECT cur, MAX(ci) AS n_pairs,
           CAST(SUM(CAST(ROUND(1e9 * (CAST(c AS DOUBLE) / ci)
                * ln(CAST(ci AS DOUBLE) / c)) AS BIGINT)) AS BIGINT)
           AS h_nano
    FROM pairs JOIN cur_t USING (cur)
    GROUP BY 1
)
SELECT cur, n_pairs,
       ROUND(h_nano / 1e9, 6) + 0.0 AS cond_entropy,
       n_pairs * 1000000 // nn AS weight_ppm,
       ROUND(h_nano / 1e9 * n_pairs / nn, 6) + 0.0
       AS rate_contribution
FROM ent CROSS JOIN tot
ORDER BY cur
""", "Markov entropy rate: next-type conditional entropy per state")
