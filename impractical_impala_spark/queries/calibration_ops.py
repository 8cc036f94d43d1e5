"""Round-8 wave 5: model-evaluation calibration and cross-domain
harmonization — the scoring-side companions to the drift/split wave.

- ROC-AUC: exact tie-corrected AUC of "does event value predict a
  purchase" from the shared 256-bin histogram — pair counting over
  bins (the Mann-Whitney identity), never over rows; plus Gini and
  the KS-ppm separation statistic from the same cumulative sums.
- Isotonic calibration: the PAVA fit of P(purchase | value-bin) via
  the minimax identity iso_i = max_{j<=i} min_{k>=i} avg(y[j..k]) —
  the inherently-sequential pool-adjacent-violators loop becomes ONE
  declarative plan over the bounded (i,j,k) bin triple (<= 64^3/2
  cells), with per-range ppm quantization making max/min exact
  integer comparisons. Monotone BY CONSTRUCTION for any input
  (feasible-j grows and feasible-k shrinks with i).
- l-diversity: the release-audit companion to k-anonymity — per
  (nation, segment) quasi-identifier group, the distinct-l and
  entropy-l diversity of the sensitive order-status attribute.
- Covariate-shift importance weights: Laplace-smoothed test/train
  density ratio per (type, 64-bin) over the embargoed temporal split,
  with the effective-sample-size ratio that tells you whether
  reweighting left any usable data.
- Quantile normalization: per-source doc-length distributions mapped
  onto the pooled distribution at 16 exact type-1 quantiles (the
  batch-effect removal standard) — first-crossing order statistics on
  value-keyed cumulative counts, no global row sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import clip_bin
from .linkage_splits import EMBARGO_DAYS, TRAIN_FRAC_PCT

ROC_BINS = 256
ISO_BINS = 64
POS_TYPE = "purchase"


def _binned_events(spark, sf_dir, n_bins):
    """events with value quantized into the shared n_bins equi-width
    domain over the broadcast global [min, max] (the stat_tests
    convention), plus the binary purchase label."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type", "value",
                  F.expr("ts_ns div 86400000000000").alias("day")))
    mm = ev.agg(F.min("value").alias("mn_v"), F.max("value").alias("mx_v"))
    return (ev.crossJoin(F.broadcast(mm))
            .select("event_type", "day",
                    clip_bin(F.col("value"), F.col("mn_v"),
                             F.col("mx_v"), n_bins).alias("bin"),
                    F.when(F.col("event_type") == POS_TYPE, 1)
                    .otherwise(0).alias("pos")))


_ORACLE_BINNED = """
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS day,
           CASE WHEN mx_v = mn_v THEN 0 ELSE
                least({nb} - 1, greatest(0, CAST(floor(
                    (value - mn_v) * {nb} / (mx_v - mn_v)) AS BIGINT)))
           END AS bin,
           CASE WHEN event_type = '{pos}' THEN 1 ELSE 0 END AS pos
    FROM events
    CROSS JOIN (SELECT MIN(value) AS mn_v, MAX(value) AS mx_v
                FROM events WHERE value IS NOT NULL)
    WHERE value IS NOT NULL
"""


def events_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of value as a purchase score (see module doc):
    U2 = Σ_b pos_b·(2·neg_below_b + neg_b) exact integer, AUC =
    U2/(2PN); Gini = 2·AUC−1; ks_ppm = max_b |cumpos·1e6/P −
    cumneg·1e6/N| with integer div. One fact shuffle into 256 cells;
    the cumulative window runs on the bin spine. int64: U2 <= 2PN
    holds to ~3e9 rows/side, then DECIMAL(38,0)."""
    binned = _binned_events(spark, sf_dir, ROC_BINS)
    hist = (binned.groupBy("bin")
            .agg(F.sum("pos").alias("p"),
                 F.sum(F.lit(1) - F.col("pos")).alias("ng")))
    tot = hist.agg(F.sum("p").alias("tp"), F.sum("ng").alias("tn"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("bin")
    cum = (hist
           .withColumn("neg_below",
                       F.coalesce(F.sum("ng").over(w), F.lit(0)))
           .withColumn("cp", F.sum("p").over(wc))
           .withColumn("cn", F.sum("ng").over(wc))
           .crossJoin(F.broadcast(tot)))
    agg = cum.agg(
        F.max("tp").alias("n_pos"), F.max("tn").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("neg_below") + F.col("ng")))
        .alias("u2"),
        F.max(F.abs(F.expr("cp * 1000000 div tp - cn * 1000000 div tn")))
        .alias("ks_ppm"))
    return agg.select(
        "n_pos", "n_neg", "ks_ppm",
        (F.round(F.expr("cast(u2 as double)"
                        " / (2.0 * n_pos * n_neg)"), 6) + 0.0)
        .alias("auc"),
        (F.round(F.expr("cast(u2 as double) / (n_pos * cast(n_neg"
                        " as double)) - 1.0"), 6) + 0.0).alias("gini"))


register("events_roc_auc", events_roc_auc, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=ROC_BINS, pos=POS_TYPE)}),
hist AS (
    SELECT bin, CAST(SUM(pos) AS BIGINT) AS p,
           CAST(SUM(1 - pos) AS BIGINT) AS ng
    FROM binned GROUP BY 1
), cum AS (
    SELECT bin, p, ng,
           CAST(COALESCE(SUM(ng) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS neg_below,
           CAST(SUM(p) OVER (ORDER BY bin) AS BIGINT) AS cp,
           CAST(SUM(ng) OVER (ORDER BY bin) AS BIGINT) AS cn
    FROM hist
), tot AS (
    SELECT CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(ng) AS BIGINT) AS tn
    FROM hist
), agg AS (
    SELECT MAX(tp) AS n_pos, MAX(tn) AS n_neg,
           CAST(SUM(p * (2 * neg_below + ng)) AS BIGINT) AS u2,
           CAST(MAX(ABS(cp * 1000000 // tp - cn * 1000000 // tn))
                AS BIGINT) AS ks_ppm
    FROM cum CROSS JOIN tot
)
SELECT n_pos, n_neg, ks_ppm,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) + 0.0
       AS auc,
       ROUND(CAST(u2 AS DOUBLE) / (n_pos * CAST(n_neg AS DOUBLE))
             - 1.0, 6) + 0.0 AS gini
FROM agg
""", "exact tie-corrected ROC-AUC / Gini / KS from the 256-bin domain")


def events_isotonic_calibration(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of P(purchase | value-bin) over the
    64-bin score domain via the minimax identity — the sequential
    pool-adjacent-violators loop as ONE declarative plan. Nonempty
    bins index by row_number; range averages quantize to exact ppm
    integers per (j,k) prefix-sum pair; then iso_i = max_{j<=i}
    min_{k>=i} avg_ppm(j,k) over the <= 64³/2 (i,j,k) triples — a
    bounded-domain join, monotone by construction for ANY input
    because the j-set grows and the k-set shrinks with i. The fact
    table reduces ONCE to the 64-cell histogram; everything after is
    model-size."""
    binned = _binned_events(spark, sf_dir, ISO_BINS)
    hist = (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("w"), F.sum("pos").alias("y")))
    wc = Window.orderBy("bin")
    pre = (hist.withColumn("idx", F.row_number().over(wc))
           .withColumn("cy", F.sum("y").over(wc))
           .withColumn("cw", F.sum("w").over(wc)))
    a = pre.select(F.col("idx").alias("j"),
                   (F.col("cy") - F.col("y")).alias("cy0"),
                   (F.col("cw") - F.col("w")).alias("cw0"))
    b = pre.select(F.col("idx").alias("k"), "cy", "cw")
    pairs = (a.join(b, F.col("j") <= F.col("k"))
             .select("j", "k",
                     F.expr("(cy - cy0) * 1000000 div (cw - cw0)")
                     .alias("avg_ppm")))
    spine = pre.select(F.col("idx").alias("i"))
    inner = (spine.join(pairs, (F.col("j") <= F.col("i"))
                        & (F.col("k") >= F.col("i")))
             .groupBy("i", "j").agg(F.min("avg_ppm").alias("m")))
    iso = inner.groupBy("i").agg(F.max("m").alias("iso_ppm"))
    return (pre.join(iso, pre.idx == iso.i)
            .select("bin", F.col("w").alias("n"),
                    F.col("y").alias("n_pos"),
                    F.expr("y * 1000000 div w").alias("rate_ppm"),
                    "iso_ppm")
            .orderBy("bin"))


register("events_isotonic_calibration", events_isotonic_calibration, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=ISO_BINS, pos=POS_TYPE)}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS w,
           CAST(SUM(pos) AS BIGINT) AS y
    FROM binned GROUP BY 1
), pre AS (
    SELECT bin, w, y,
           CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS idx,
           CAST(SUM(y) OVER (ORDER BY bin) AS BIGINT) AS cy,
           CAST(SUM(w) OVER (ORDER BY bin) AS BIGINT) AS cw
    FROM hist
), pairs AS (
    SELECT a.idx AS j, b.idx AS k,
           (b.cy - (a.cy - a.y)) * 1000000
           // (b.cw - (a.cw - a.w)) AS avg_ppm
    FROM pre a JOIN pre b ON a.idx <= b.idx
), inner_min AS (
    SELECT s.idx AS i, p.j, CAST(MIN(p.avg_ppm) AS BIGINT) AS m
    FROM pre s JOIN pairs p ON p.j <= s.idx AND p.k >= s.idx
    GROUP BY 1, 2
), iso AS (
    SELECT i, CAST(MAX(m) AS BIGINT) AS iso_ppm
    FROM inner_min GROUP BY 1
)
SELECT bin, w AS n, y AS n_pos,
       y * 1000000 // w AS rate_ppm, iso_ppm
FROM pre JOIN iso ON pre.idx = iso.i
ORDER BY bin
""", "PAVA isotonic calibration via the declarative minimax identity")


def privacy_ldiversity_audit(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """l-diversity audit of the (nation, market segment) quasi-
    identifier against the sensitive order-status attribute: per QI
    group, the row count, distinct-l (how many statuses appear), and
    entropy-l = exp(H) (the effective number of statuses — the
    stronger guarantee k-anonymity misses: a group can be large yet
    reveal everyone's status if one value dominates). Facts reduce
    once to (QI x status) cells (bounded: nations x segments x
    statuses); entropy terms nano-quantize per cell so the group sum
    is order-free exact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    cells = (orders.join(cust, orders.o_custkey == cust.c_custkey)
             .join(F.broadcast(nation),
                   F.col("c_nationkey") == F.col("n_nationkey"))
             .groupBy("n_name", "c_mktsegment", "o_orderstatus")
             .agg(F.count(F.lit(1)).alias("c")))
    grp = (cells.groupBy("n_name", "c_mktsegment")
           .agg(F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("l_distinct")))
    term = ("cast(round(1e9 * (cast(c as double) / n_rows)"
            " * ln(cast(n_rows as double) / c)) as bigint)")
    ent = (cells.join(grp, ["n_name", "c_mktsegment"])
           .groupBy("n_name", "c_mktsegment")
           .agg(F.max("n_rows").alias("n_rows"),
                F.max("l_distinct").alias("l_distinct"),
                F.sum(F.expr(term)).alias("h_nano")))
    return (ent.select(
                "n_name", "c_mktsegment", "n_rows", "l_distinct",
                (F.round(F.exp(F.col("h_nano") / 1e9), 4) + 0.0)
                .alias("entropy_l"))
            .orderBy("n_name", "c_mktsegment"))


register("privacy_ldiversity_audit", privacy_ldiversity_audit, """
WITH cells AS (
    SELECT n_name, c_mktsegment, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2, 3
), grp AS (
    SELECT n_name, c_mktsegment, CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS l_distinct
    FROM cells GROUP BY 1, 2
)
SELECT n_name, c_mktsegment, n_rows, l_distinct,
       ROUND(EXP(CAST(SUM(CAST(ROUND(1e9 * (CAST(c AS DOUBLE) / n_rows)
             * ln(CAST(n_rows AS DOUBLE) / c)) AS BIGINT)) AS BIGINT)
             / 1e9), 4) + 0.0 AS entropy_l
FROM cells JOIN grp USING (n_name, c_mktsegment)
GROUP BY n_name, c_mktsegment, n_rows, l_distinct
ORDER BY n_name, c_mktsegment
""", "distinct-l / entropy-l diversity per (nation, segment) QI group")

CSW_BINS = 64


def covariate_shift_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Importance weights for the embargoed temporal split: per
    (event_type, 64-value-bin), the Laplace-smoothed test/train
    density ratio w_b = ((test_b+1)/(n_test+B)) / ((train_b+1)/
    (n_train+B)) as an exact integer ppm, plus the per-type
    effective-sample-size ratio ESS/n = (Σ t_b·w_b)² / (n_train ·
    Σ t_b·w_b²) that says how much train data survives reweighting.
    Embargo rows belong to neither side. Facts reduce once to the
    (type x bin x split) histogram; weights and ESS are spine-sized.
    Wide-arithmetic ladder: the w_ppm ratio itself runs in
    DECIMAL(38,0)/HUGEINT (its int64 numerator wraps at ~7e6
    events/type) and the w and w² ESS sums accumulate wide from the
    first multiply."""
    binned = _binned_events(spark, sf_dir, CSW_BINS)
    bounds = binned.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cut = bounds.select(
        (F.col("d0")
         + F.expr(f"(d1 - d0) * {TRAIN_FRAC_PCT} div 100")).alias("cut"))
    tagged = (binned.crossJoin(F.broadcast(cut))
              .withColumn("split",
                          F.when(F.col("day") < F.col("cut"), "train")
                          .when(F.col("day") >= F.col("cut")
                                + EMBARGO_DAYS, "test")
                          .otherwise("embargo"))
              .filter(F.col("split") != "embargo"))
    hist = (tagged.groupBy("event_type", "bin")
            .agg(F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
                 .alias("tr"),
                 F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
                 .alias("te")))
    types = hist.groupBy("event_type").agg(
        F.sum("tr").alias("n_train"), F.sum("te").alias("n_test"))
    spine = types.select(
        "event_type", "n_train", "n_test",
        F.explode(F.expr(
            f"sequence(cast(0 as bigint), cast({CSW_BINS - 1} as bigint))"))
        .alias("bin"))
    dense = (spine.join(hist, ["event_type", "bin"], "left")
             .select("event_type", "bin", "n_train", "n_test",
                     F.coalesce("tr", F.lit(0)).alias("tr"),
                     F.coalesce("te", F.lit(0)).alias("te")))
    # (te+1)*(n_train+B)*1e6 wraps int64 at ~7e6 events/type — the
    # ratio runs in DECIMAL(38,0) and narrows back to bigint
    wppm = (f"cast((cast(te + 1 as decimal(38,0))"
            f" * (n_train + {CSW_BINS}) * 1000000)"
            f" div (cast(tr + 1 as decimal(38,0))"
            f" * (n_test + {CSW_BINS})) as bigint)")
    weighted = dense.withColumn("w_ppm", F.expr(wppm))
    ess = (weighted.groupBy("event_type")
           .agg(F.sum(F.col("tr").cast("decimal(38,0)") * F.col("w_ppm"))
                .alias("sw"),
                F.sum(F.col("tr").cast("decimal(38,0)") * F.col("w_ppm")
                      * F.col("w_ppm")).alias("sw2"),
                F.max("n_train").alias("nt"))
           .select("event_type",
                   (F.round(F.expr(
                       "cast(sw as double) * cast(sw as double)"
                       " / (cast(nt as double)"
                       " * cast(sw2 as double))"), 6) + 0.0)
                   .alias("ess_ratio")))
    return (weighted.join(F.broadcast(ess), "event_type")
            .select("event_type", "bin", "tr", "te", "w_ppm", "ess_ratio")
            .orderBy("event_type", "bin"))


register("covariate_shift_weights", covariate_shift_weights, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=CSW_BINS, pos=POS_TYPE)}),
cut AS (
    SELECT MIN(day) + (MAX(day) - MIN(day)) * {TRAIN_FRAC_PCT} // 100
           AS cut
    FROM binned
), tagged AS (
    SELECT event_type, bin,
           CASE WHEN day < cut THEN 'train'
                WHEN day >= cut + {EMBARGO_DAYS} THEN 'test'
                ELSE 'embargo' END AS split
    FROM binned CROSS JOIN cut
), hist AS (
    SELECT event_type, bin,
           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                AS BIGINT) AS tr,
           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                AS BIGINT) AS te
    FROM tagged WHERE split <> 'embargo'
    GROUP BY 1, 2
), types AS (
    SELECT event_type, CAST(SUM(tr) AS BIGINT) AS n_train,
           CAST(SUM(te) AS BIGINT) AS n_test
    FROM hist GROUP BY 1
), spine AS (
    SELECT event_type, n_train, n_test,
           UNNEST(range(0, {CSW_BINS})) AS bin
    FROM types
), dense AS (
    SELECT s.event_type, s.bin, s.n_train, s.n_test,
           COALESCE(h.tr, 0) AS tr, COALESCE(h.te, 0) AS te
    FROM spine s LEFT JOIN hist h
      ON s.event_type = h.event_type AND s.bin = h.bin
), weighted AS (
    SELECT event_type, bin, tr, te, n_train,
           CAST((CAST(te + 1 AS HUGEINT) * (n_train + {CSW_BINS})
                 * 1000000)
                // (CAST(tr + 1 AS HUGEINT) * (n_test + {CSW_BINS}))
                AS BIGINT) AS w_ppm
    FROM dense
), ess AS (
    SELECT event_type,
           ROUND(CAST(SUM(CAST(tr AS HUGEINT) * w_ppm) AS DOUBLE)
                 * CAST(SUM(CAST(tr AS HUGEINT) * w_ppm) AS DOUBLE)
                 / (CAST(MAX(n_train) AS DOUBLE)
                    * CAST(SUM(CAST(tr AS HUGEINT) * w_ppm * w_ppm) AS DOUBLE)), 6)
           + 0.0 AS ess_ratio
    FROM weighted GROUP BY 1
)
SELECT w.event_type, w.bin, w.tr, w.te, w.w_ppm, e.ess_ratio
FROM weighted w JOIN ess e USING (event_type)
ORDER BY w.event_type, w.bin
""", "Laplace-smoothed test/train density-ratio weights + ESS ratio")

QN_BUCKETS = 16


def source_quantile_normalize(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source doc-length distributions
    onto the pooled distribution (the cross-source batch-effect
    removal standard): at each of 16 exact type-1 quantiles q, map
    the source's length value to the pooled value at the same q.
    Lengths reduce to (source, value)-keyed counts with a window
    cumsum; the quantile is the FIRST value whose cumulative count
    reaches ceil(q·n/16) — a first-crossing order statistic (the
    lineitem_weighted_median pattern), never a global row sort. All
    arithmetic is integer-exact."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars")
    counts = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c"))
    wsrc = (Window.partitionBy("source").orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, 0))
    cums = counts.withColumn("cum", F.sum("c").over(wsrc))
    ns = counts.groupBy("source").agg(F.sum("c").alias("n_s"))
    qs = ns.select(
        "source", "n_s",
        F.explode(F.expr(
            f"sequence(cast(1 as bigint), cast({QN_BUCKETS} as bigint))"))
        .alias("q"))
    src_q = (qs.join(cums, "source")
             .filter(F.col("cum")
                     >= F.expr(f"(q * n_s + {QN_BUCKETS - 1})"
                               f" div {QN_BUCKETS}"))
             .groupBy("source", "q")
             .agg(F.min("n_chars").alias("src_value")))
    pcounts = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    wp = (Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, 0))
    pcums = pcounts.withColumn("cum", F.sum("c").over(wp))
    pn = pcounts.agg(F.sum("c").alias("n_p"))
    # constant 16-row literal spine: a OneRowRelation-rooted build side
    # the hygiene sweep can PROVE bounded (deriving it from qs would
    # drag a corpus scan into the broadcast subtree)
    q_spine = spark.sql(
        f"SELECT explode(sequence(cast(1 as bigint),"
        f" cast({QN_BUCKETS} as bigint))) AS q")
    pool_q = (pcums.crossJoin(F.broadcast(pn))
              .crossJoin(F.broadcast(q_spine))
              .filter(F.col("cum")
                      >= F.expr(f"(q * n_p + {QN_BUCKETS - 1})"
                                f" div {QN_BUCKETS}"))
              .groupBy("q")
              .agg(F.min("n_chars").alias("pooled_value")))
    return (src_q.join(F.broadcast(pool_q), "q")
            .select("source", "q", "src_value", "pooled_value")
            .orderBy("source", "q"))


register("source_quantile_normalize", source_quantile_normalize, f"""
WITH counts AS (
    SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2
), cums AS (
    SELECT source, n_chars, c,
           CAST(SUM(c) OVER (PARTITION BY source ORDER BY n_chars)
                AS BIGINT) AS cum
    FROM counts
), ns AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM counts GROUP BY 1
), qs AS (
    SELECT source, n_s, UNNEST(range(1, {QN_BUCKETS + 1})) AS q FROM ns
), src_q AS (
    SELECT qs.source, q, MIN(n_chars) AS src_value
    FROM qs JOIN cums ON qs.source = cums.source
    WHERE cum >= (q * n_s + {QN_BUCKETS - 1}) // {QN_BUCKETS}
    GROUP BY 1, 2
), pcums AS (
    SELECT n_chars,
           CAST(SUM(c) OVER (ORDER BY n_chars) AS BIGINT) AS cum
    FROM (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY 1)
), pn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_p FROM documents
), pool_q AS (
    SELECT q, MIN(n_chars) AS pooled_value
    FROM pcums CROSS JOIN pn
    CROSS JOIN (SELECT UNNEST(range(1, {QN_BUCKETS + 1})) AS q)
    WHERE cum >= (q * n_p + {QN_BUCKETS - 1}) // {QN_BUCKETS}
    GROUP BY 1
)
SELECT source, q, src_value, pooled_value
FROM src_q JOIN pool_q USING (q)
ORDER BY source, q
""", "16-quantile normalization of source lengths onto the pool")
