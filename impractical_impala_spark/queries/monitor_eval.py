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

import math

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

# ---------------------------------------------- Viterbi burst detection
BURST_MULT = 2          # burst state emits at 2x the base rate
BURST_MICRO = 1_000_000  # cost quantization (micro-nats)


def _half_away(x: float) -> int:
    """Half-away-from-zero rounding — the ONE rule both engines use.
    Python round() is half-to-even while SQL ROUND is half-away, so an
    exact .5 micro-nat boundary would split the two Viterbi DPs; both
    sides now share floor(x + 0.5) mirrored around zero (the oracle
    uses the literal CASE/FLOOR twin of this expression)."""
    import math

    return (int(math.floor(x + 0.5)) if x >= 0
            else -int(math.floor(-x + 0.5)))


def _ha_sql(expr: str) -> str:
    """SQL twin of ``_half_away``: half-away-from-zero as explicit
    CASE/FLOOR so the oracle shares Python's exact rounding rule
    instead of relying on the engine's ROUND tie behavior."""
    return (f"CAST(CASE WHEN ({expr}) >= 0 THEN FLOOR(({expr}) + 0.5) "
            f"ELSE -FLOOR(-({expr}) + 0.5) END AS BIGINT)")


def _ha_wide_sql(expr: str, target: str = "DECIMAL(38,0)") -> str:
    """128-bit-register twin of ``_ha_sql`` for quantized terms whose
    magnitude can pass int64 at scale (the x1e3 ANOVA/ICC between-
    terms — SCALE.md's r15 carve-out). Below 9e18 it is EXACTLY the
    narrow rounding (bit-identical values wherever BIGINT was valid).
    At or beyond, a double is already an exact integer (>= 2^53), and
    the wide register must receive THAT integer identically on both
    engines — a direct double->DECIMAL cast will not do (Spark's goes
    through the shortest decimal string and lands on a DIFFERENT
    integer than DuckDB's exact-binary double->HUGEINT for the same
    double), so the value is rebuilt from two exact BIGINT pieces:
    p = x/2^20 is a power-of-two divide (exact), hi = floor(p) and
    lo = (p - floor(p))*2^20 are exact whenever |x| < 2^73 (hi stays
    below 2^53, Sterbenz subtraction, power-of-two multiply), giving
    x = hi*2^20 + lo in pure integer arithmetic. Contract: |expr| <
    2^73 ~ 9.4e21 — ~28,000x the sf0.1 ANOVA operating point; past
    that the VALUE_MICRO quantization dial is required (SCALE.md).
    Spark side targets DECIMAL(38,0); DuckDB oracles pass
    target='HUGEINT' (the established DECIMAL(38)/HUGEINT pairing of
    the HW residual registers)."""
    p = f"(({expr}) / 1048576.0)"
    hi = f"CAST(FLOOR({p}) AS BIGINT)"
    lo = f"CAST(({p} - FLOOR({p})) * 1048576.0 AS BIGINT)"
    return (f"CASE WHEN ABS({expr}) < 9.0e18 "
            f"THEN CAST({_ha_sql(expr)} AS {target}) "
            f"ELSE CAST({hi} AS {target}) * 1048576 + {lo} END")


def _trunc_burst_constants(n: int, total: int) -> tuple[int, int, int, int, int]:
    """Per-series integer cost constants (micro-nat fixed point):
    rate_j = half_away(1e6 * N * mult_j / n) (exact integer div), lr_j =
    half_away(1e6 * ln(N * mult_j / n)), gamma = half_away(1e6 * ln(n)).
    The only float work is three ln calls on exact integer ratios; at
    1e6 quantization a 1-ulp libm difference (~4e-16 abs) moves the
    rounding argument by ~4e-10, and the rounding RULE itself is now
    identical across engines (_half_away), so no .5 boundary can split
    them; everything downstream is exact integer DP."""
    import math

    r0 = (total * BURST_MICRO) // n
    r1 = (total * BURST_MULT * BURST_MICRO) // n
    lr0 = _half_away(BURST_MICRO * math.log(total / n))
    lr1 = _half_away(BURST_MICRO * math.log(total * BURST_MULT / n))
    gamma = _half_away(BURST_MICRO * math.log(n))
    return r0, r1, lr0, lr1, gamma


def burst_viterbi(ys: list[int]) -> list[tuple[int, int, int, int]]:
    """Pure-Python online Viterbi fold over one integer count series:
    2-state Kleinberg-style burst model, Poisson emission costs
    e_j(x) = rate_j - x*ln(rate_j) in micro-nats (the x!-term is
    state-independent and drops), transition 0->1 costs gamma =
    ln(n), 1->0 free. Returns (t, y, state, margin) where state is
    the ONLINE argmin (no backtrack — the streaming-compatible
    semantic, documented) and margin = c1 - c0 in micro-nats.
    Exposed for the independent kernel test."""
    n = len(ys)
    total = sum(ys)
    if n == 0 or total == 0:
        return []
    r0, r1, lr0, lr1, gamma = _trunc_burst_constants(n, total)
    out = []
    c0 = r0 - ys[0] * lr0
    c1 = gamma + r1 - ys[0] * lr1
    out.append((0, ys[0], 0 if c0 <= c1 else 1, c1 - c0))
    for t in range(1, n):
        e0 = r0 - ys[t] * lr0
        e1 = r1 - ys[t] * lr1
        nc0 = min(c0, c1) + e0
        nc1 = min(c0 + gamma, c1) + e1
        c0, c1 = nc0, nc1
        out.append((t, ys[t], 0 if c0 <= c1 else 1, c1 - c0))
    return out


def events_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style 2-state burst detection on the hourly count
    series per event type — the operator Spark has no built-in for,
    done the o22/Holt-Winters way: the inherently-sequential Viterbi
    cost recursion runs in EXACT integer micro-nat fixed point inside
    an Arrow ``applyInPandas`` kernel whose group is one type's
    CALENDAR-BOUNDED series, and the DuckDB oracle is a recursive CTE
    carrying the (c0, c1) cost registers — both engines fold the
    identical integer recursion, so rows hash-match. State is the
    online argmin (streaming-compatible; a backtracked MAP path would
    need the full trellis). Emits (type, t, y, state, margin): margin
    crossings localize burst onsets. int64 ladder: |c| <=
    n·(rate + x·|lr|)·1e6 — safe to ~1e5 hours at 1e6 events/hour;
    past that the registers widen to DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
    hourly = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("cnt"))
    return burst_viterbi_from_hourly(hourly)


def burst_viterbi_from_hourly(hourly: DataFrame) -> DataFrame:
    """Core of events_burst_viterbi over any (event_type, hr, cnt)
    hourly-count frame — shared with the streaming twin's finalizer
    (streaming/burst.py), the fano/cusum/autocorr discipline, so the
    streamed burst trellis is bit-equal to the batch one by
    construction. Fresh-exprId same-name aliases on the spine-join's
    right side (the memory-sink gotcha; no-op Project in the batch
    plan)."""
    import pandas as pd

    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "event_type", "h0",
        F.explode(F.expr("sequence(h0, h1)")).alias("hr"))
    right = hourly.select(F.col("event_type").alias("event_type"),
                          F.col("hr").alias("hr"),
                          F.col("cnt").alias("cnt"))
    dense = (spine.join(right, ["event_type", "hr"], "left")
             .select("event_type", (F.col("hr") - F.col("h0")).alias("t"),
                     F.coalesce("cnt", F.lit(0)).alias("y")))

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("t")
        et = g["event_type"].iloc[0]
        rows = burst_viterbi([int(v) for v in g["y"]])
        return pd.DataFrame({
            "event_type": et,
            "t": [r[0] for r in rows],
            "y": [r[1] for r in rows],
            "state": [r[2] for r in rows],
            "margin_micro": [r[3] for r in rows],
        })

    schema = ("event_type string, t long, y long, state int,"
              " margin_micro long")
    # applyInPandas: the DP needs the whole bounded series in one call
    return (dense.groupBy("event_type").applyInPandas(fold_group, schema)
            .orderBy("event_type", "t"))


register("events_burst_viterbi", events_burst_viterbi, f"""
WITH RECURSIVE ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {HOUR_NS} AS hr
    FROM events
), hourly AS (
    SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly GROUP BY 1
), spine AS (
    SELECT b.event_type, b.h0, UNNEST(range(b.h0, b.h1 + 1)) AS hr
    FROM bounds b
), dense AS (
    SELECT s.event_type, s.hr - s.h0 AS t, COALESCE(h.cnt, 0) AS y
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
), consts AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS total,
           CAST(SUM(y) AS BIGINT) * {BURST_MICRO} // COUNT(*) AS r0,
           CAST(SUM(y) AS BIGINT) * {BURST_MULT} * {BURST_MICRO}
               // COUNT(*) AS r1,
           {_ha_sql(f"{BURST_MICRO} * ln(CAST(SUM(y) AS DOUBLE)"
                    " / COUNT(*))")} AS lr0,
           {_ha_sql(f"{BURST_MICRO} * ln(CAST(SUM(y) AS DOUBLE)"
                    f" * {BURST_MULT} / COUNT(*))")} AS lr1,
           {_ha_sql(f"{BURST_MICRO} * ln(CAST(COUNT(*) AS DOUBLE))")}
                AS gamma
    FROM dense GROUP BY 1 HAVING SUM(y) > 0
), rec AS (
    SELECT d.event_type, d.t, d.y,
           c.r0 - d.y * c.lr0 AS c0,
           c.gamma + c.r1 - d.y * c.lr1 AS c1,
           c.r0, c.r1, c.lr0, c.lr1, c.gamma
    FROM dense d JOIN consts c ON d.event_type = c.event_type
    WHERE d.t = 0
    UNION ALL
    SELECT d.event_type, d.t, d.y,
           least(r.c0, r.c1) + r.r0 - d.y * r.lr0 AS c0,
           least(r.c0 + r.gamma, r.c1) + r.r1 - d.y * r.lr1 AS c1,
           r.r0, r.r1, r.lr0, r.lr1, r.gamma
    FROM rec r JOIN dense d
      ON d.event_type = r.event_type AND d.t = r.t + 1
)
SELECT event_type, t, y,
       CAST(CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS INTEGER) AS state,
       CAST(c1 - c0 AS BIGINT) AS margin_micro
FROM rec
ORDER BY event_type, t
""", "Kleinberg 2-state Viterbi burst detection, exact micro-nat DP")


# ------------------------------------------------ SPRT sequential test
# H0: purchase share among purchase+click = SPRT_P0; H1: = SPRT_P1.
# Boundaries at alpha = beta = 0.05: ln((1-b)/a) = ln 19, ln(b/(1-a)).
SPRT_P0, SPRT_P1 = 0.18, 0.22
SPRT_DAY_NS = 86_400_000_000_000
_SPRT_LA = _half_away(math.log(19.0) * 1e6)       # upper: accept H1
_SPRT_LB = _half_away(math.log(1.0 / 19.0) * 1e6)  # lower: accept H0
_SPRT_W1 = _half_away(math.log(SPRT_P1 / SPRT_P0) * 1e6)
_SPRT_W0 = _half_away(math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e6)


def events_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT over the daily purchase-vs-click share — the
    sequential experiment monitor that completes the family
    (events_share_ztest is the fixed-horizon test, events_mde_power
    the planning step, Page-Hinkley/CUSUM the nonparametric drift
    side): each day adds x*ln(p1/p0) + (n-x)*ln(q1/q0) to the
    log-likelihood-ratio walk; the walk and both Wald boundaries
    live in micro-nat integers (per-word constants quantized ONCE in
    Python with the house half-away rule, so each engine only does
    exact integer multiply-adds — no runtime float at all). Output:
    the bounded day spine with the walk, boundary-crossing flags,
    and the sequential decision state."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_ns div {SPRT_DAY_NS}").alias("d"))
    per_day = (ev.filter(F.col("event_type").isin("purchase", "click"))
               .groupBy("d")
               .agg(F.sum(F.expr("cast(event_type = 'purchase' as int)"))
                    .alias("x"),
                    F.count(F.lit(1)).alias("n")))
    return sprt_from_per_day(per_day)


def sprt_from_per_day(per_day: DataFrame) -> DataFrame:
    """Core of events_sprt_sequential over any (d, x, n) per-day frame
    (x = successes, n = trials; days with zero trials are absent, as
    in the batch census). The walk arithmetic is shared with the
    streaming twin's finalizer (streaming/sprt.py), which derives the
    same per-day frame from the hourly-count state (hr div 24 exact
    integer sums), so the streamed LLR walk is bit-equal to the batch
    one by construction. The batch query keeps its original
    one-aggregation plan — only the arithmetic PAST the census is
    shared, so the strategy-time fingerprint is unchanged.
    Fresh-exprId same-name aliases guard the re-referenced per-day
    lineage (the memory-sink gotcha; no-op Projects in the batch
    plan)."""
    rng = (per_day.agg(F.min("d").alias("d0"))
           .select(F.col("d0").alias("d0")))
    w = Window.orderBy("d_idx")
    walk = (per_day.crossJoin(F.broadcast(rng))
            .select((F.col("d") - F.col("d0")).alias("d_idx"), "x", "n",
                    F.expr(f"x * {_SPRT_W1}L + (n - x) * {_SPRT_W0}L")
                    .alias("inc"))
            .withColumn("llr_micro", F.sum("inc").over(w))
            .withColumn("hit_upper", F.expr(
                f"cast(llr_micro >= {_SPRT_LA} as int)"))
            .withColumn("hit_lower", F.expr(
                f"cast(llr_micro <= {_SPRT_LB} as int)"))
            .withColumn("decided", F.max(
                F.expr("cast(hit_upper = 1 or hit_lower = 1 as int)"))
                .over(w))
            .withColumn("state", F.expr(
                "case when decided = 0 then 'continue'"
                " when hit_upper = 1 then 'accept_h1'"
                " when hit_lower = 1 then 'accept_h0'"
                " else 'decided_earlier' end")))
    return (walk.select("d_idx", "x", "n", "llr_micro",
                        "hit_upper", "hit_lower", "state")
            .orderBy("d_idx"))


register("events_sprt_sequential", events_sprt_sequential, f"""
WITH ev AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // {SPRT_DAY_NS} AS d
    FROM events
    WHERE event_type IN ('purchase', 'click')
), per_day AS (
    SELECT d,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ev GROUP BY d
), rng AS (SELECT MIN(d) AS d0 FROM per_day),
walk AS (
    SELECT d - d0 AS d_idx, x, n,
           SUM(x * {_SPRT_W1} + (n - x) * {_SPRT_W0})
               OVER (ORDER BY d) AS llr_micro
    FROM per_day CROSS JOIN rng
), flagged AS (
    SELECT d_idx, x, n, CAST(llr_micro AS BIGINT) AS llr_micro,
           CASE WHEN llr_micro >= {_SPRT_LA} THEN 1 ELSE 0 END
               AS hit_upper,
           CASE WHEN llr_micro <= {_SPRT_LB} THEN 1 ELSE 0 END
               AS hit_lower
    FROM walk
)
SELECT d_idx, x, n, llr_micro,
       CAST(hit_upper AS INT) AS hit_upper,
       CAST(hit_lower AS INT) AS hit_lower,
       CASE WHEN MAX(CASE WHEN hit_upper = 1 OR hit_lower = 1
                          THEN 1 ELSE 0 END)
                 OVER (ORDER BY d_idx) = 0 THEN 'continue'
            WHEN hit_upper = 1 THEN 'accept_h1'
            WHEN hit_lower = 1 THEN 'accept_h0'
            ELSE 'decided_earlier' END AS state
FROM flagged ORDER BY d_idx
""", "Wald SPRT walk over daily purchase share (integer micro-nats)")
