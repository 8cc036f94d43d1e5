"""Round-8 wave 8: corpus-richness estimation, chance-corrected
agreement, conformal calibration, tail-index estimation, forecast-skill
decomposition, and TF-IDF cosine linkage — the remaining classics of a
corpus-curation / model-evaluation loop.

- Chao1 + Good-Turing: how much vocabulary the crawl has NOT seen yet,
  per source — the coverage question behind "is more data from this
  source worth fetching". Both estimators need only the (f1, f2)
  abundance counts of the per-source token histogram, so the whole
  plan is two vocabulary-keyed aggregations.
- Cohen's kappa + macro-F1: the chance-corrected upgrade of
  langid_confusion_matrix's raw recall shares; kappa's n^2-sized
  numerators run in DECIMAL(38,0)/HUGEINT, per-class F1 quantizes to
  exact integer ppm before the model-size macro average (no float
  summation-order dependence between engines).
- Split conformal calibration: the distribution-free prediction-bound
  recipe — per event type, the ceil((n+1)(1-alpha)) calibration order
  statistic becomes the threshold, and the held-out half reports
  empirical coverage. The order statistic is a first-crossing on the
  value-keyed centi histogram (the source_quantile_normalize
  discipline), never a per-group row sort.
- Hill tail index: the peaks-over-threshold complement to
  events_gumbel_maxima's block maxima — alpha from the top-K order
  statistics via the two-phase salted top-K (weighted_reservoir
  discipline), with per-row ln values quantized to integer micro-nats
  so the K-term sum is exact integer arithmetic in both engines.
- Murphy decomposition of the Brier score: reliability - resolution +
  uncertainty over the shared 64-bin forecast domain, all three terms
  exact-integer ppm^2 numerators over one fact-table shuffle into 64
  cells (the events_roc_auc histogram shape).
- TF-IDF cosine near-dup: rare-shingle-blocked pairwise cosine over
  word-bigram vectors — the IR-weighted sibling of dedup_ngram_jaccard.
  Posting lists with 2 <= df <= DF_CAP generate candidates (bounded
  fan-out per shingle, vocabulary-keyed), full-vector norms attach by
  doc-keyed joins, and the score is an exact integral cos^2 ppm from
  integer centi-IDF weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .calibration_ops import _ORACLE_BINNED, _binned_events
from .text import _DUCK_WORDS, _SPARK_WORDS, _langid_oracle, text_langid

# ------------------------------------------- vocabulary richness
def vocab_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness: observed vocabulary V, token
    mass N, hapax/dis-legomena counts (f1, f2), the bias-corrected
    Chao1 asymptotic richness V + f1(f1-1)/(2(f2+1)), and the
    Good-Turing unseen-mass estimate f1/N in integer ppm. Scale shape:
    one explode pass over the corpus (spread-before-explode), then two
    aggregations keyed on (source x vocabulary) and (source) — the
    shuffle domain is content diversity, never the row count. f1(f1-1)
    evaluates in DOUBLE inside the Chao1 ratio (f1 can reach vocabulary
    scale, whose square would pass int64 near ~3e9 distinct hapaxes);
    the integer ppm path stays exact (f1 * 1e6 <= 1e15 at f1 ~ 1e9)."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("source", F.expr(_SPARK_WORDS).alias("w"))
            .repartition(spark.sparkContext.defaultParallelism)
            .select("source", F.explode("w").alias("t")))
    tc = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return (tc.groupBy("source").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"))
        .select(
            "source", "v", "n", "f1", "f2",
            (F.round(F.expr(
                "v + f1 * (f1 - 1.0D) / (2.0D * (f2 + 1))"), 4) + 0.0)
            .alias("chao1_r"),
            F.expr("f1 * 1000000 div n").alias("unseen_ppm"))
        .orderBy("source"))


register("vocab_chao1_richness", vocab_chao1_richness, """
WITH toks AS (
    SELECT source, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), tc AS (
    SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks GROUP BY 1, 2
), rich AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS v,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS f1,
           CAST(COUNT(*) FILTER (c = 2) AS BIGINT) AS f2
    FROM tc GROUP BY source
)
SELECT source, v, n, f1, f2,
       ROUND(v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1)), 4) + 0.0 AS chao1_r,
       CAST(f1 * 1000000 // n AS BIGINT) AS unseen_ppm
FROM rich ORDER BY source
""", "Chao1 + Good-Turing unseen-mass vocabulary richness per source")


# ------------------------------------------- agreement statistics
def langid_kappa_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa and macro-F1 of the langid predictions against the
    stored labels — the chance-corrected summary the raw confusion
    matrix (langid_confusion_matrix) cannot give. Composes the
    registered text_langid plan unchanged; everything past the corpus
    scan is the model-size contingency table (|langs|^2 cells), so the
    class joins broadcast. Exactness: kappa = (n*po - pe)/(n^2 - pe)
    with pe = sum_k row_k * col_k runs in DECIMAL(38,0) (n^2 passes
    int64 past ~3e9 docs); per-class F1 = 2*tp_k/(row_k + col_k)
    quantizes to integer ppm BEFORE the macro average, so the model-
    size mean is integer division — no cross-engine float summation
    order. The synthetic corpus makes agreement chance-level; the
    operator under test is the evaluation plan."""
    preds = text_langid(spark, sf_dir).select("lang", "pred_lang")
    cells = preds.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("c"))
    rows = cells.groupBy("lang").agg(F.sum("c").alias("rt"))
    cols = (cells.groupBy("pred_lang").agg(F.sum("c").alias("ct"))
            .withColumnRenamed("pred_lang", "lang"))
    diag = (cells.filter(F.col("lang") == F.col("pred_lang"))
            .select("lang", F.col("c").alias("tp")))
    per_cls = (rows.join(cols, "lang", "full_outer")
               .join(diag, "lang", "left")
               .select("lang",
                       F.coalesce("rt", F.lit(0)).alias("rt"),
                       F.coalesce("ct", F.lit(0)).alias("ct"),
                       F.coalesce("tp", F.lit(0)).alias("tp")))
    tot = per_cls.agg(
        F.sum("rt").alias("n"),
        F.sum("tp").alias("po"),
        F.sum(F.expr("cast(rt as decimal(38,0)) * ct")).alias("pe"),
        F.sum(F.when(F.col("rt") > 0, 1).otherwise(0)).alias("n_classes"),
        F.sum(F.when(F.col("rt") > 0,
                     F.expr("2 * tp * 1000000 div (rt + ct)"))
              .otherwise(0)).alias("f1_ppm_sum"))
    return tot.select(
        "n", "n_classes",
        F.expr("po * 1000000 div n").alias("acc_ppm"),
        (F.round(F.expr(
            "cast(cast(n as decimal(38,0)) * po - pe as double)"
            " / cast(cast(n as decimal(38,0)) * n - pe as double)"), 6)
         + 0.0).alias("kappa_r"),
        F.expr("f1_ppm_sum div n_classes").alias("macro_f1_ppm"))


register("langid_kappa_f1", langid_kappa_f1, f"""
WITH preds AS (
    SELECT lang, pred_lang FROM ({_langid_oracle().strip()})
), cells AS (
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
    FROM preds GROUP BY 1, 2
), rws AS (
    SELECT lang, CAST(SUM(c) AS BIGINT) AS rt FROM cells GROUP BY lang
), cls AS (
    SELECT pred_lang AS lang, CAST(SUM(c) AS BIGINT) AS ct
    FROM cells GROUP BY pred_lang
), diag AS (
    SELECT lang, c AS tp FROM cells WHERE lang = pred_lang
), per_cls AS (
    SELECT COALESCE(r.lang, cl.lang) AS lang,
           COALESCE(rt, 0) AS rt, COALESCE(ct, 0) AS ct,
           COALESCE(tp, 0) AS tp
    FROM rws r FULL OUTER JOIN cls cl ON r.lang = cl.lang
    LEFT JOIN diag d ON COALESCE(r.lang, cl.lang) = d.lang
), tot AS (
    SELECT CAST(SUM(rt) AS BIGINT) AS n,
           CAST(SUM(tp) AS BIGINT) AS po,
           SUM(CAST(rt AS HUGEINT) * ct) AS pe,
           CAST(COUNT(*) FILTER (rt > 0) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN rt > 0
                         THEN 2 * tp * 1000000 // (rt + ct)
                         ELSE 0 END) AS BIGINT) AS f1_ppm_sum
    FROM per_cls
)
SELECT n, n_classes,
       CAST(po * 1000000 // n AS BIGINT) AS acc_ppm,
       ROUND(CAST(CAST(n AS HUGEINT) * po - pe AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n - pe AS DOUBLE), 6) + 0.0
           AS kappa_r,
       CAST(f1_ppm_sum // n_classes AS BIGINT) AS macro_f1_ppm
FROM tot
""", "Cohen's kappa + ppm macro-F1 over the langid contingency table")


# ------------------------------------------- conformal calibration
CONF_ALPHA_PCT = 10  # 90% target coverage


def events_conformal_calibration(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Split-conformal calibration per event type: a deterministic
    md5 half-split of the events, the ceil((n_cal+1)(1-alpha))-th
    smallest calibration score (score = centi-quantized value, the
    operator's documented quantization) as the conformal threshold,
    and the empirical coverage of that threshold on the held-out half.
    The order statistic is a FIRST CROSSING over the value-keyed centi
    histogram's cumulative counts — the shuffle domain is the score
    domain, and no per-type row sort exists. When the rank exceeds
    n_cal (tiny groups) the conformal set is the whole line: threshold
    NULL, coverage 1e6 ppm by contract. int64: k and the ppm
    numerators stay under 1e15 to ~1e9 rows/type."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type",
                  F.floor(F.col("value") * 100).cast("long").alias("centi"),
                  F.expr("pmod(cast(conv(substring(md5(cast(event_id as"
                         " string)), 1, 7), 16, 10) as bigint), 2)")
                  .alias("fold")))
    hist = (ev.filter(F.col("fold") == 0)
            .groupBy("event_type", "centi")
            .agg(F.count(F.lit(1)).alias("c")))
    wc = Window.partitionBy("event_type").orderBy("centi")
    wt = Window.partitionBy("event_type")
    ranked = (hist.withColumn("cum", F.sum("c").over(wc))
              .withColumn("n_cal", F.sum("c").over(wt))
              .withColumn("k_rank", F.expr(
                  f"(({100 - CONF_ALPHA_PCT}) * (n_cal + 1) + 99) div 100")))
    thr = (ranked.filter(F.col("cum") >= F.col("k_rank"))
           .groupBy("event_type", "n_cal", "k_rank")
           .agg(F.min("centi").alias("thr_centi"))
           .unionByName(  # k_rank > n_cal: threshold is +inf (NULL)
        ranked.groupBy("event_type", "n_cal", "k_rank")
        .agg(F.max("cum").alias("mx"))
        .filter(F.col("k_rank") > F.col("mx"))
        .select("event_type", "n_cal", "k_rank",
                F.lit(None).cast("long").alias("thr_centi"))))
    test = ev.filter(F.col("fold") == 1).drop("fold")
    cov = (test.join(F.broadcast(thr), "event_type")
           .groupBy("event_type", "n_cal", "k_rank", "thr_centi")
           .agg(F.count(F.lit(1)).alias("n_test"),
                F.sum(F.when(F.col("thr_centi").isNull()
                             | (F.col("centi") <= F.col("thr_centi")), 1)
                      .otherwise(0)).alias("covered")))
    return (cov.select(
        "event_type", "n_cal", "k_rank", "thr_centi", "n_test",
        F.expr("covered * 1000000 div n_test").alias("coverage_ppm"))
        .orderBy("event_type"))


register("events_conformal_calibration", events_conformal_calibration, f"""
WITH ev AS (
    SELECT event_type,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))
                AS BIGINT) % 2 AS fold
    FROM events WHERE value IS NOT NULL
), hist AS (
    SELECT event_type, centi, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev WHERE fold = 0 GROUP BY 1, 2
), ranked AS (
    SELECT event_type, centi, c,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY centi)
                AS BIGINT) AS cum,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
    FROM hist
), keyed AS (
    SELECT *, ({100 - CONF_ALPHA_PCT} * (n_cal + 1) + 99) // 100 AS k_rank
    FROM ranked
), thr AS (
    SELECT event_type, n_cal, k_rank, MIN(centi) AS thr_centi
    FROM keyed WHERE cum >= k_rank GROUP BY 1, 2, 3
    UNION ALL
    SELECT event_type, n_cal, k_rank, NULL AS thr_centi
    FROM keyed GROUP BY 1, 2, 3
    HAVING k_rank > MAX(cum)
), cov AS (
    SELECT t.event_type, t.n_cal, t.k_rank, t.thr_centi,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.thr_centi IS NULL
                              OR e.centi <= t.thr_centi
                         THEN 1 ELSE 0 END) AS BIGINT) AS covered
    FROM ev e JOIN thr t ON e.event_type = t.event_type
    WHERE e.fold = 1
    GROUP BY 1, 2, 3, 4
)
SELECT event_type, n_cal, CAST(k_rank AS BIGINT) AS k_rank, thr_centi,
       n_test, CAST(covered * 1000000 // n_test AS BIGINT) AS coverage_ppm
FROM cov ORDER BY event_type
""", "split-conformal threshold + held-out coverage per event type")


# ------------------------------------------- Hill tail index
HILL_K = 100
HILL_SALTS = 64


def events_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the value tail index per event type from the
    top-(K+1) order statistics: alpha = K / sum_{i<=K} (ln x_(i) -
    ln x_(K+1)). The peaks-over-threshold complement to the Gumbel
    block-maxima fit. Scale shape: TWO-PHASE salted top-(K+1) (the
    weighted_reservoir discipline — each partial window sorts a 64th
    of a type, the final pass ranks <= salts*(K+1) survivors), so no
    type group is ever sorted whole. Exactness: each row's ln(centi)
    quantizes to integer micro-nats (one deterministic double op per
    row, both engines), so the K-term sum is exact integer arithmetic
    and the single final division is the only float. Types with fewer
    than K+1 positive rows drop (no tail to estimate); a degenerate
    tail (all top-K equal to x_(K+1)) yields NULL alpha."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value") > 0)
          .select("event_type", "event_id",
                  F.floor(F.col("value") * 100).cast("long").alias("centi"))
          .filter(F.col("centi") >= 1))
    keyed = ev.withColumn("salt", F.expr(f"pmod(event_id, {HILL_SALTS})"))
    w1 = Window.partitionBy("event_type", "salt").orderBy(
        F.col("centi").desc(), "event_id")
    partial = (keyed.withColumn("rn", F.row_number().over(w1))
               .filter(F.col("rn") <= HILL_K + 1).drop("rn", "salt"))
    w2 = Window.partitionBy("event_type").orderBy(
        F.col("centi").desc(), "event_id")
    top = (partial.withColumn("rn", F.row_number().over(w2))
           .filter(F.col("rn") <= HILL_K + 1)
           .withColumn("lnq", F.expr(
               "cast(round(ln(cast(centi as double)) * 1000000, 0)"
               " as bigint)")))
    agg = (top.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_top"),
        F.sum(F.when(F.col("rn") <= HILL_K, F.col("lnq"))
              .otherwise(0)).alias("sum_lnq"),
        F.max(F.when(F.col("rn") == HILL_K + 1, F.col("lnq"))).alias("lnq_k"),
        F.max(F.when(F.col("rn") == HILL_K + 1, F.col("centi")))
        .alias("xk_centi"))
        .filter(F.col("n_top") == HILL_K + 1))
    return (agg.select(
        "event_type", F.lit(HILL_K).alias("k"), "xk_centi",
        F.expr(f"(sum_lnq - {HILL_K} * lnq_k) div {HILL_K}")
        .alias("excess_micro"),
        (F.round(F.expr(
            f"case when sum_lnq - {HILL_K} * lnq_k = 0 then null else"
            f" {HILL_K} * 1000000.0D / (sum_lnq - {HILL_K} * lnq_k) end"),
            6) + 0.0).alias("hill_alpha_r"))
        .orderBy("event_type"))


register("events_hill_tail", events_hill_tail, f"""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(FLOOR(value * 100) AS BIGINT) AS centi
    FROM events WHERE value > 0 AND FLOOR(value * 100) >= 1
), ranked AS (
    SELECT event_type, centi,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY centi DESC, event_id) AS rn
    FROM ev
), top AS (
    SELECT event_type, centi, rn,
           CAST(ROUND(ln(CAST(centi AS DOUBLE)) * 1000000, 0) AS BIGINT)
               AS lnq
    FROM ranked WHERE rn <= {HILL_K + 1}
), agg AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_top,
           CAST(SUM(CASE WHEN rn <= {HILL_K} THEN lnq ELSE 0 END)
                AS BIGINT) AS sum_lnq,
           MAX(CASE WHEN rn = {HILL_K + 1} THEN lnq END) AS lnq_k,
           MAX(CASE WHEN rn = {HILL_K + 1} THEN centi END) AS xk_centi
    FROM top GROUP BY event_type
)
SELECT event_type, CAST({HILL_K} AS INTEGER) AS k, xk_centi,
       CAST((sum_lnq - {HILL_K} * lnq_k) // {HILL_K} AS BIGINT)
           AS excess_micro,
       ROUND(CASE WHEN sum_lnq - {HILL_K} * lnq_k = 0 THEN NULL
                  ELSE {HILL_K} * 1000000.0
                       / (sum_lnq - {HILL_K} * lnq_k) END, 6) + 0.0
           AS hill_alpha_r
FROM agg WHERE n_top = {HILL_K + 1} ORDER BY event_type
""", "Hill tail-index from salted top-K order statistics per type")


# ------------------------------------------- Brier decomposition
BRIER_BINS = 64


def events_brier_decomposition(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Murphy decomposition of the Brier score for 'value-bin predicts
    a purchase': reliability - resolution + uncertainty, where the
    forecast in bin b is the bin's normalized position p_b = b/(B-1)
    and the outcome is the binary purchase label. One fact shuffle
    into the shared 64-bin histogram (the events_roc_auc shape); the
    three terms reduce over 64 cells. Exactness: p_b, the per-bin
    outcome rate, and the base rate all quantize to integer ppm
    (integer division, the operator contract), so the squared-error
    numerators are exact integers — DECIMAL(38,0)/HUGEINT, since
    sum_b n_b * ppm^2 reaches n * 1e12 (past int64 at ~9e6 rows).
    The only floats are the three final divisions."""
    binned = _binned_events(spark, sf_dir, BRIER_BINS)
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    tot = hist.agg(F.sum("nb").alias("n"), F.sum("pb").alias("p"))
    terms = (hist.crossJoin(F.broadcast(tot))
             .withColumn("p_ppm", F.expr(
                 f"bin * 1000000 div {BRIER_BINS - 1}"))
             .withColumn("yb_ppm", F.expr("pb * 1000000 div nb"))
             .withColumn("ybar_ppm", F.expr("p * 1000000 div n")))
    agg = terms.groupBy("n", "p").agg(
        F.sum(F.expr("cast(nb as decimal(38,0))"
                     " * (p_ppm - yb_ppm) * (p_ppm - yb_ppm)"))
        .alias("rel_num"),
        F.sum(F.expr("cast(nb as decimal(38,0))"
                     " * (yb_ppm - ybar_ppm) * (yb_ppm - ybar_ppm)"))
        .alias("res_num"))
    e12 = "1000000000000.0D"
    return agg.select(
        "n", F.col("p").alias("n_pos"),
        (F.round(F.expr(f"cast(rel_num as double) / n / {e12}"), 6) + 0.0)
        .alias("reliability_r"),
        (F.round(F.expr(f"cast(res_num as double) / n / {e12}"), 6) + 0.0)
        .alias("resolution_r"),
        (F.round(F.expr(
            "cast(cast(p as decimal(38,0)) * (n - p) as double)"
            " / (cast(n as double) * n)"), 6) + 0.0)
        .alias("uncertainty_r"),
        (F.round(F.expr(
            f"cast(rel_num - res_num as double) / n / {e12}"
            " + cast(cast(p as decimal(38,0)) * (n - p) as double)"
            " / (cast(n as double) * n)"), 6) + 0.0).alias("brier_r"))


register("events_brier_decomposition", events_brier_decomposition, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=BRIER_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(pos) AS BIGINT) AS pb
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(pb) AS BIGINT) AS p
    FROM hist
), terms AS (
    SELECT h.nb, h.pb, t.n, t.p,
           h.bin * 1000000 // {BRIER_BINS - 1} AS p_ppm,
           h.pb * 1000000 // h.nb AS yb_ppm,
           t.p * 1000000 // t.n AS ybar_ppm
    FROM hist h CROSS JOIN tot t
), agg AS (
    SELECT n, p,
           SUM(CAST(nb AS HUGEINT) * (p_ppm - yb_ppm) * (p_ppm - yb_ppm))
               AS rel_num,
           SUM(CAST(nb AS HUGEINT)
               * (yb_ppm - ybar_ppm) * (yb_ppm - ybar_ppm)) AS res_num
    FROM terms GROUP BY n, p
)
SELECT n, p AS n_pos,
       ROUND(CAST(rel_num AS DOUBLE) / n / 1000000000000.0, 6) + 0.0
           AS reliability_r,
       ROUND(CAST(res_num AS DOUBLE) / n / 1000000000000.0, 6) + 0.0
           AS resolution_r,
       ROUND(CAST(CAST(p AS HUGEINT) * (n - p) AS DOUBLE)
             / (CAST(n AS DOUBLE) * n), 6) + 0.0 AS uncertainty_r,
       ROUND(CAST(rel_num - res_num AS DOUBLE) / n / 1000000000000.0
             + CAST(CAST(p AS HUGEINT) * (n - p) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n), 6) + 0.0 AS brier_r
FROM agg
""", "Murphy reliability/resolution/uncertainty Brier decomposition")


# ------------------------------------------- TF-IDF cosine linkage
TFIDF_DF_CAP = 16
TFIDF_TOP_K = 50


def tfidf_doc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-shingle-blocked TF-IDF cosine near-duplicate evidence over
    word-BIGRAM vectors: the IR-weighted sibling of dedup_ngram_jaccard
    (bigram shingles, because a unigram vocabulary saturates — every
    word of a finite lexicon appears in nearly every long document,
    while shingle df keeps a discriminative tail at any corpus size).
    Candidate pairs come ONLY from inverted-index posting lists with
    2 <= df <= DF_CAP (bounded <= C(DF_CAP,2) fan-out per shingle,
    keyed on shingle vocabulary); full-vector norms attach by doc-keyed
    joins, so the reported score cos^2 = dot_rare^2/(|a|^2 |b|^2) is a
    LOWER BOUND on true cosine similarity concentrated on rare evidence
    — the documented operator contract (common shingles contribute
    norm mass but never candidate mass, the contamination-blocking
    standard). Exactness: IDF quantizes to integer centi-nats (one
    deterministic double op per SHINGLE), weights w = tf * idf_centi
    are int64, dot and norms accumulate in DECIMAL(38,0)/HUGEINT, and
    cos^2 ppm is one integral division. Overflow ladder: with tf <=
    1e3 and idf_centi <= 2.4e3 (ln 2.5e10), w <= 2.4e6, per-doc norm
    <= L * w^2 ~ 6e15, dot^2 * 1e6 <= ~4e37 — inside DECIMAL(38,0);
    past that the weights re-quantize to deci-nats. Top-K by score is
    TakeOrdered — no global sort survives the limit."""
    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.expr(_SPARK_WORDS).alias("w"))
            .repartition(spark.sparkContext.defaultParallelism))
    # size >= 2 guard: Spark's sequence(1, 0) DESCENDS instead of
    # returning empty (the PMI precedent)
    tf = (docs.filter(F.expr("size(w) >= 2"))
          .select("doc_id", F.explode(F.expr(
              "transform(sequence(1, size(w) - 1),"
              " i -> concat(w[i-1], ' ', w[i]))")).alias("t"))
          .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf")))
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    widf = (tf.join(df, "t").crossJoin(F.broadcast(nd))
            .withColumn("idf_centi", F.expr(
                "cast(round((ln(cast(nd as double))"
                " - ln(cast(df as double))) * 100, 0) as bigint)"))
            .withColumn("wgt", F.expr("tf * idf_centi")))
    norms = widf.groupBy("doc_id").agg(
        F.sum(F.expr("cast(wgt as decimal(38,0)) * wgt")).alias("nrm2"))
    rare = (widf.filter((F.col("df") >= 2) & (F.col("df") <= TFIDF_DF_CAP))
            .select("t", "doc_id", "wgt"))
    a, b = rare.alias("a"), rare.alias("b")
    dots = (a.join(b, (F.col("a.t") == F.col("b.t"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.sum(F.expr("cast(a.wgt as decimal(38,0)) * b.wgt"))
                 .alias("dot"),
                 F.count(F.lit(1)).alias("shared_terms")))
    scored = (dots
              .join(norms.select(F.col("doc_id").alias("doc_a"),
                                 F.col("nrm2").alias("na")), "doc_a")
              .join(norms.select(F.col("doc_id").alias("doc_b"),
                                 F.col("nrm2").alias("nb")), "doc_b")
              .select("doc_a", "doc_b", "shared_terms",
                      F.expr("cast((dot * dot * 1000000) div (na * nb)"
                             " as bigint)").alias("cos2_ppm")))
    return (scored.orderBy(F.col("cos2_ppm").desc(), "doc_a", "doc_b")
            .limit(TFIDF_TOP_K))


register("tfidf_doc_neardup", tfidf_doc_neardup, f"""
WITH docs AS (
    SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
), tf AS (
    SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, w[i] || ' ' || w[i + 1] AS t
          FROM docs, UNNEST(range(1, len(w))) AS u(i)) GROUP BY 1, 2
), nd AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM docs
), df AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t
), widf AS (
    SELECT tf.doc_id, tf.t, df.df,
           tf.tf * CAST(ROUND((ln(CAST(nd.nd AS DOUBLE))
                               - ln(CAST(df.df AS DOUBLE))) * 100, 0)
                        AS BIGINT) AS wgt
    FROM tf JOIN df ON tf.t = df.t CROSS JOIN nd
), norms AS (
    SELECT doc_id, SUM(CAST(wgt AS HUGEINT) * wgt) AS nrm2
    FROM widf GROUP BY doc_id
), rare AS (
    SELECT t, doc_id, wgt FROM widf WHERE df BETWEEN 2 AND {TFIDF_DF_CAP}
), dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           SUM(CAST(a.wgt AS HUGEINT) * b.wgt) AS dot,
           CAST(COUNT(*) AS BIGINT) AS shared_terms
    FROM rare a JOIN rare b ON a.t = b.t AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b, d.shared_terms,
       CAST((d.dot * d.dot * 1000000) // (na.nrm2 * nb.nrm2) AS BIGINT)
           AS cos2_ppm
FROM dots d
JOIN norms na ON d.doc_a = na.doc_id
JOIN norms nb ON d.doc_b = nb.doc_id
ORDER BY cos2_ppm DESC, doc_a, doc_b
LIMIT {TFIDF_TOP_K}
""", "rare-shingle-blocked TF-IDF cosine^2 near-duplicate top-K pairs")
