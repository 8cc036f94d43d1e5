"""Round-8 wave 9: scoring operating-point selection and group
fairness — the decision-layer companions to the ROC/isotonic/Brier
evaluation stack.

- PR-AUC (average precision): the imbalance-robust summary ROC-AUC is
  not — step-wise AP over the descending 256-bin score sweep, plus
  precision at the 50%-recall operating point. Everything reduces to
  the shared histogram; AP's weighted precision sum runs in
  DECIMAL(38,0)/HUGEINT (sum of dtp*ppm reaches P*1e6 per term).
- Expected / maximum calibration error: the one-number calibration
  gates (companions to the Murphy decomposition's reliability term)
  — exact integer ppm over the 64-bin forecast domain.
- Threshold selection: the Youden-J and F1-optimal operating points
  over the 256 threshold candidates, each with its full confusion
  quadruple — argmax on the model-size threshold spine with a
  deterministic highest-threshold tiebreak.
- Accuracy-parity fairness audit: per-source langid accuracy vs the
  pooled rate with the four-fifths disparate-impact rule — the bias
  gate an LLM-corpus evaluation harness runs per slice before
  trusting a model-derived label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .calibration_ops import _ORACLE_BINNED, _binned_events
from .text import _langid_oracle, text_langid

PR_BINS = 256
ECE_BINS = 64


def events_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of 'value-bin predicts a purchase'
    over the descending 256-bin score sweep: AP = sum_b dtp_b *
    precision_b / P with precision quantized to exact integer ppm (the
    operator contract), plus the MAX precision over thresholds whose
    recall is >= 50% (precision is not monotone along the sweep, so
    this is deliberately NOT first-crossing precision — max is the
    order-free form both engines aggregate identically). One fact shuffle into the shared histogram;
    the sweep is a cumulative window on the 256-cell spine. The
    dtp*ppm products sum in DECIMAL(38,0)/HUGEINT (each term reaches
    P*1e6, past int64 when P*1e6*terms ~ P*1e9 exceeds ~9e18 at
    P ~ 1e10)."""
    binned = _binned_events(spark, sf_dir, PR_BINS)
    hist = binned.groupBy("bin").agg(
        F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("ng"))
    tot = hist.agg(F.sum("p").alias("tp_all"), F.sum("ng").alias("tn_all"))
    wd = Window.orderBy(F.col("bin").desc())
    sweep = (hist.withColumn("tp", F.sum("p").over(wd))
             .withColumn("fp", F.sum("ng").over(wd))
             .crossJoin(F.broadcast(tot))
             .withColumn("prec_ppm",
                         F.expr("tp * 1000000 div (tp + fp)"))
             .withColumn("rec_ppm", F.expr("tp * 1000000 div tp_all")))
    agg = sweep.agg(
        F.max("tp_all").alias("n_pos"), F.max("tn_all").alias("n_neg"),
        F.sum(F.expr("cast(p as decimal(38,0)) * prec_ppm")).alias("apn"),
        F.max(F.when(F.col("rec_ppm") >= 500000, F.col("prec_ppm")))
        .alias("prec_at_r50_ppm"))
    return agg.select(
        "n_pos", "n_neg",
        F.expr("cast(apn div n_pos as bigint)").alias("ap_ppm"),
        "prec_at_r50_ppm")


register("events_pr_auc", events_pr_auc, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=PR_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(SUM(pos) AS BIGINT) AS p,
           CAST(SUM(1 - pos) AS BIGINT) AS ng
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(p) AS BIGINT) AS tp_all,
           CAST(SUM(ng) AS BIGINT) AS tn_all
    FROM hist
), sweep AS (
    SELECT h.p,
           CAST(SUM(h.p) OVER (ORDER BY h.bin DESC) AS BIGINT) AS tp,
           CAST(SUM(h.ng) OVER (ORDER BY h.bin DESC) AS BIGINT) AS fp,
           t.tp_all, t.tn_all
    FROM hist h CROSS JOIN tot t
), scored AS (
    SELECT p, tp_all, tn_all,
           tp * 1000000 // (tp + fp) AS prec_ppm,
           tp * 1000000 // tp_all AS rec_ppm
    FROM sweep
)
SELECT MAX(tp_all) AS n_pos, MAX(tn_all) AS n_neg,
       CAST(SUM(CAST(p AS HUGEINT) * prec_ppm) // MAX(tp_all) AS BIGINT)
           AS ap_ppm,
       CAST(MAX(CASE WHEN rec_ppm >= 500000 THEN prec_ppm END) AS BIGINT)
           AS prec_at_r50_ppm
FROM scored
""", "average precision + precision@recall50 from the 256-bin sweep")


def events_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error of the bin-position
    forecast (the Brier decomposition's reliability term as the
    standard one-number gates): ECE = sum_b n_b |p_b - ybar_b| / n and
    MCE = max_b |p_b - ybar_b|, with the forecast and per-bin outcome
    rate quantized to exact integer ppm. One fact shuffle into the
    64-bin histogram; sum_b n_b*|dppm| <= n*1e6 stays in int64 to
    ~9e12 rows and the plan still carries it in DECIMAL(38,0)."""
    binned = _binned_events(spark, sf_dir, ECE_BINS)
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    tot = hist.agg(F.sum("nb").alias("n"))
    terms = (hist.crossJoin(F.broadcast(tot))
             .withColumn("gap_ppm", F.abs(
                 F.expr(f"bin * 1000000 div {ECE_BINS - 1}"
                        " - pb * 1000000 div nb"))))
    agg = terms.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.expr("cast(nb as decimal(38,0)) * gap_ppm")).alias("en"),
        F.max("gap_ppm").alias("mce_ppm"))
    return agg.select(
        "n", "n_bins",
        F.expr("cast(en div n as bigint)").alias("ece_ppm"), "mce_ppm")


register("events_calibration_error", events_calibration_error, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=ECE_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(pos) AS BIGINT) AS pb
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(nb) AS BIGINT) AS n FROM hist
), terms AS (
    SELECT t.n, h.nb,
           ABS(h.bin * 1000000 // {ECE_BINS - 1}
               - h.pb * 1000000 // h.nb) AS gap_ppm
    FROM hist h CROSS JOIN tot t
)
SELECT n, CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(CAST(nb AS HUGEINT) * gap_ppm) // n AS BIGINT) AS ece_ppm,
       CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm
FROM terms GROUP BY n
""", "expected / maximum calibration error ppm over the 64-bin domain")


def events_threshold_selection(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Operating-point selection: the Youden-J-optimal and F1-optimal
    decision thresholds over the 256 bin-boundary candidates, each
    with its full confusion quadruple. J = sens + spec - 1 and F1 =
    2tp/(2tp+fp+fn) quantize to exact integer ppm; the argmax runs on
    the model-size threshold spine with a deterministic tiebreak
    (highest threshold wins a score tie — the conservative operating
    point). The fact table reduces ONCE to the shared histogram."""
    binned = _binned_events(spark, sf_dir, PR_BINS)
    hist = binned.groupBy("bin").agg(
        F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("ng"))
    tot = hist.agg(F.sum("p").alias("pp"), F.sum("ng").alias("nn"))
    wd = Window.orderBy(F.col("bin").desc())
    stats = (hist.withColumn("tp", F.sum("p").over(wd))
             .withColumn("fp", F.sum("ng").over(wd))
             .crossJoin(F.broadcast(tot))
             .select(F.col("bin").alias("thr_bin"), "tp", "fp",
                     F.expr("pp - tp").alias("fn"),
                     F.expr("nn - fp").alias("tn"),
                     F.expr("tp * 1000000 div pp - fp * 1000000 div nn")
                     .alias("youden_ppm"),
                     F.expr("2 * tp * 1000000 div (2 * tp + fp + (pp - tp))")
                     .alias("f1_ppm")))
    picks = []
    for crit, col in (("f1", "f1_ppm"), ("youden", "youden_ppm")):
        w = Window.orderBy(F.col(col).desc(), F.col("thr_bin").desc())
        picks.append(
            stats.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.lit(crit).alias("criterion"), "thr_bin",
                    "tp", "fp", "fn", "tn",
                    F.col(col).alias("score_ppm")))
    return picks[0].unionByName(picks[1]).orderBy("criterion")


register("events_threshold_selection", events_threshold_selection, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=PR_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(SUM(pos) AS BIGINT) AS p,
           CAST(SUM(1 - pos) AS BIGINT) AS ng
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(p) AS BIGINT) AS pp, CAST(SUM(ng) AS BIGINT) AS nn
    FROM hist
), stats AS (
    SELECT h.bin AS thr_bin,
           CAST(SUM(h.p) OVER (ORDER BY h.bin DESC) AS BIGINT) AS tp,
           CAST(SUM(h.ng) OVER (ORDER BY h.bin DESC) AS BIGINT) AS fp,
           t.pp, t.nn
    FROM hist h CROSS JOIN tot t
), scored AS (
    SELECT thr_bin, tp, fp, pp - tp AS fn, nn - fp AS tn,
           tp * 1000000 // pp - fp * 1000000 // nn AS youden_ppm,
           2 * tp * 1000000 // (2 * tp + fp + (pp - tp)) AS f1_ppm
    FROM stats
), f1pick AS (
    SELECT 'f1' AS criterion, thr_bin, tp, fp, fn, tn,
           f1_ppm AS score_ppm
    FROM scored ORDER BY f1_ppm DESC, thr_bin DESC LIMIT 1
), jpick AS (
    SELECT 'youden' AS criterion, thr_bin, tp, fp, fn, tn,
           youden_ppm AS score_ppm
    FROM scored ORDER BY youden_ppm DESC, thr_bin DESC LIMIT 1
)
SELECT * FROM f1pick UNION ALL SELECT * FROM jpick ORDER BY criterion
""", "Youden-J and F1 optimal thresholds with confusion quadruples")


def fairness_accuracy_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a model-derived label: per-source
    langid accuracy vs the pooled rate, with the four-fifths
    disparate-impact verdict (parity = group accuracy / pooled
    accuracy >= 80%). Composes the registered text_langid plan
    unchanged; the source attaches by a doc-keyed equi join and the
    audit table is source-dimension-sized. All rates are exact
    integer ppm; the parity ratio is ppm-of-ppm (integer division by
    the pooled rate — the documented quantization). The synthetic
    corpus scores at chance, uniformly across sources; the operator
    under test is the per-slice evaluation plan."""
    preds = (text_langid(spark, sf_dir)
             .select("doc_id",
                     F.when(F.col("lang") == F.col("pred_lang"), 1)
                     .otherwise(0).alias("ok")))
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per = (preds.join(src, "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("correct")))
    pooled = per.agg(
        F.expr("sum(correct) * 1000000 div sum(n)").alias("pooled_ppm"))
    return (per.crossJoin(F.broadcast(pooled))
            .select("source", "n",
                    F.expr("correct * 1000000 div n").alias("acc_ppm"),
                    "pooled_ppm",
                    F.expr("(correct * 1000000 div n) * 1000000"
                           " div pooled_ppm").alias("parity_ppm"),
                    F.expr("cast((correct * 1000000 div n) * 1000000"
                           " div pooled_ppm >= 800000 as int)")
                    .alias("passes_fourfifths"))
            .orderBy("source"))


register("fairness_accuracy_parity", fairness_accuracy_parity, f"""
WITH preds AS (
    SELECT doc_id,
           CASE WHEN lang = pred_lang THEN 1 ELSE 0 END AS ok
    FROM ({_langid_oracle().strip()})
), per AS (
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p.ok) AS BIGINT) AS correct
    FROM preds p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.source
), pooled AS (
    SELECT CAST(SUM(correct) * 1000000 // SUM(n) AS BIGINT) AS pooled_ppm
    FROM per
)
SELECT source, n,
       CAST(correct * 1000000 // n AS BIGINT) AS acc_ppm,
       pooled_ppm,
       CAST((correct * 1000000 // n) * 1000000 // pooled_ppm AS BIGINT)
           AS parity_ppm,
       CAST(CASE WHEN (correct * 1000000 // n) * 1000000 // pooled_ppm
                      >= 800000 THEN 1 ELSE 0 END AS INTEGER)
           AS passes_fourfifths
FROM per CROSS JOIN pooled ORDER BY source
""", "per-source accuracy parity with the four-fifths verdict")


# --------------------------------------------- Spiegelhalter's Z
# Forecast convention shared with events_calibration_error: the
# 64-bin position forecast p_b = b/(ECE_BINS-1). Scaling the Z
# numerator by 63^2 and the variance by 63^4 makes every per-bin
# term an exact integer, and sqrt(63^4) = 63^2 cancels — Z is one
# integer ratio through a single correctly-rounded sqrt.
SPIEG_D = ECE_BINS - 1  # 63
Z_CRIT_MICRO = 1_959_964  # two-sided 5% normal critical value, micro


def events_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spiegelhalter's calibration Z test on the bin-position
    forecast: Z = sum (y-p)(1-2p) / sqrt(sum p(1-p)(1-2p)^2). With
    p = b/63 every term multiplies out to integers:
    NUM = sum_b (63*P_b - n_b*b)(63 - 2b), DEN = sum_b n_b * b *
    (63-b) * (63-2b)^2, and Z = NUM / sqrt(DEN) exactly (the 63^2
    scale factors cancel through the sqrt). The one-number
    significance gate that complements ECE/MCE magnitudes — ECE says
    how far off, Z says whether it is explainable by chance. One
    fact shuffle into the 64-bin histogram; int64 holds DEN to
    ~3e11 rows (then DECIMAL(38,0))."""
    binned = _binned_events(spark, sf_dir, ECE_BINS)
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    agg = hist.agg(
        F.sum("nb").alias("n"),
        F.sum(F.expr(f"({SPIEG_D} * pb - nb * bin)"
                     f" * ({SPIEG_D} - 2 * bin)")).alias("num"),
        F.sum(F.expr(f"nb * bin * ({SPIEG_D} - bin)"
                     f" * ({SPIEG_D} - 2 * bin)"
                     f" * ({SPIEG_D} - 2 * bin)")).alias("den"))
    z = "(cast(num as double) / sqrt(cast(den as double)))"
    from .monitor_eval import _ha_sql as _ha
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("num").cast("long").alias("z_num"),
        F.col("den").cast("long").alias("z_den"),
        F.expr(_ha(f"({z}) * 1e6")).alias("z_micro"),
        F.expr(f"cast(abs({_ha(f'({z}) * 1e6')})"
               f" <= {Z_CRIT_MICRO} as int)").alias("well_calibrated"))


from .monitor_eval import _ha_sql as _op_ha  # noqa: E402

_SPIEG_Z = "(CAST(num AS DOUBLE) / SQRT(CAST(den AS DOUBLE)))"

register("events_spiegelhalter_z", events_spiegelhalter_z, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=ECE_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(pos) AS BIGINT) AS pb
    FROM binned GROUP BY 1
), agg AS (
    SELECT CAST(SUM(nb) AS BIGINT) AS n,
           CAST(SUM(({SPIEG_D} * pb - nb * bin)
                    * ({SPIEG_D} - 2 * bin)) AS BIGINT) AS num,
           CAST(SUM(nb * bin * ({SPIEG_D} - bin)
                    * ({SPIEG_D} - 2 * bin)
                    * ({SPIEG_D} - 2 * bin)) AS BIGINT) AS den
    FROM hist
)
SELECT n, num AS z_num, den AS z_den,
       {_op_ha(f"({_SPIEG_Z}) * 1e6")} AS z_micro,
       CAST(ABS({_op_ha(f"({_SPIEG_Z}) * 1e6")}) <= {Z_CRIT_MICRO}
            AS INT) AS well_calibrated
FROM agg
""", "Spiegelhalter calibration Z over the 64-bin forecast domain")


# --------------------------------------------- calibration slope/intercept
def events_calibration_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-probability calibration line: OLS of the binary outcome
    on the bin-position forecast (slope 1 / intercept 0 = perfectly
    calibrated; slope < 1 = overconfident spread). Regressing on the
    INTEGER bin index keeps every sufficient statistic exact
    (Sx = sum n_b*b, Sxx = sum n_b*b^2, Sxy = sum P_b*b); the
    probability-scale slope is the bin slope times 63. Closed-form
    Cramer solution — no iterative fit, one float evaluation per
    coefficient. Companion to events_spiegelhalter_z (significance)
    and events_calibration_error (magnitude): the slope says in which
    DIRECTION the forecast is misscaled."""
    binned = _binned_events(spark, sf_dir, ECE_BINS)
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    agg = hist.agg(
        F.sum("nb").alias("n"),
        F.sum(F.expr("nb * bin")).alias("sx"),
        F.sum(F.expr("nb * bin * bin")).alias("sxx"),
        F.sum("pb").alias("sy"),
        F.sum(F.expr("pb * bin")).alias("sxy"))
    slope_bin = ("((cast(n as double) * sxy - cast(sx as double) * sy)"
                 " / (cast(n as double) * sxx"
                 " - cast(sx as double) * sx))")
    slope = f"({slope_bin} * {SPIEG_D})"
    intercept = (f"(cast(sy as double) / n"
                 f" - {slope_bin} * (cast(sx as double) / n))")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.expr(_op_ha(f"({slope}) * 1e6")).alias("slope_micro"),
        F.expr(_op_ha(f"({intercept}) * 1e6")).alias("intercept_micro"))


_CS_SLOPE_BIN = ("((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
                 " / (CAST(n AS DOUBLE) * sxx"
                 " - CAST(sx AS DOUBLE) * sx))")
_CS_SLOPE = f"({_CS_SLOPE_BIN} * {SPIEG_D})"
_CS_INTERCEPT = (f"(CAST(sy AS DOUBLE) / n"
                 f" - {_CS_SLOPE_BIN} * (CAST(sx AS DOUBLE) / n))")

register("events_calibration_slope", events_calibration_slope, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=ECE_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(pos) AS BIGINT) AS pb
    FROM binned GROUP BY 1
), agg AS (
    SELECT CAST(SUM(nb) AS BIGINT) AS n,
           CAST(SUM(nb * bin) AS BIGINT) AS sx,
           CAST(SUM(nb * bin * bin) AS BIGINT) AS sxx,
           CAST(SUM(pb) AS BIGINT) AS sy,
           CAST(SUM(pb * bin) AS BIGINT) AS sxy
    FROM hist
)
SELECT n,
       {_op_ha(f"({_CS_SLOPE}) * 1e6")} AS slope_micro,
       {_op_ha(f"({_CS_INTERCEPT}) * 1e6")} AS intercept_micro
FROM agg
""", "calibration slope/intercept (OLS of outcome on bin forecast)")


# ------------------------------------------------------- lift at k%
LIFT_KS = (5, 10, 20, 50)


def events_lift_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift at the top k% of the score sweep: walk the 256-bin
    histogram from the highest score bin, take the FIRST prefix whose
    cumulative count crosses k% of the population, and report
    lift = (tp_k/n_k) / (P/N) in exact integer ppm — the campaign-
    targeting complement to events_cumulative_gain's fixed deciles
    (first-crossing prefixes, not interpolated ones, so every number
    is a real achievable operating point). The prefix cumulative is
    strictly increasing across non-empty bins, so the crossing row is
    unique and the k-explode (4 rows per bin) stays on the model-size
    spine. int64: tp*N*1e6 holds to ~3e6-row positives x 3e6
    population products; past that ride DECIMAL(38,0) as in
    events_pr_auc."""
    binned = _binned_events(spark, sf_dir, PR_BINS)
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    tot = hist.agg(F.sum("nb").alias("nn"), F.sum("pb").alias("pp"))
    wd = Window.orderBy(F.col("bin").desc())
    sweep = (hist.withColumn("cum_n", F.sum("nb").over(wd))
             .withColumn("cum_p", F.sum("pb").over(wd))
             .crossJoin(F.broadcast(tot)))
    ks = ", ".join(str(k) for k in LIFT_KS)
    fan = (sweep.withColumn("k_pct", F.explode(F.expr(f"array({ks})")))
           .filter(F.expr("cum_n * 100 >= k_pct * nn")))
    first = fan.groupBy("k_pct").agg(F.min("cum_n").alias("n_taken"))
    return (first.join(fan.select("k_pct", F.col("cum_n").alias("n_taken"),
                                  "cum_p", "nn", "pp"),
                       ["k_pct", "n_taken"])
            .select("k_pct", "n_taken",
                    F.col("cum_p").alias("tp_taken"),
                    F.expr("cum_p * nn * 1000000 div (n_taken * pp)")
                    .alias("lift_ppm"))
            .orderBy("k_pct"))


register("events_lift_at_k", events_lift_at_k, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=PR_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(pos) AS BIGINT) AS pb
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(nb) AS BIGINT) AS nn, CAST(SUM(pb) AS BIGINT) AS pp
    FROM hist
), sweep AS (
    SELECT bin,
           CAST(SUM(nb) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_n,
           CAST(SUM(pb) OVER (ORDER BY bin DESC) AS BIGINT) AS cum_p
    FROM hist
), fan AS (
    SELECT k.k_pct, s.cum_n, s.cum_p, t.nn, t.pp
    FROM sweep s
    CROSS JOIN (SELECT UNNEST([{", ".join(str(k) for k in LIFT_KS)}])
                AS k_pct) k
    CROSS JOIN tot t
    WHERE s.cum_n * 100 >= k.k_pct * t.nn
), first AS (
    SELECT k_pct, MIN(cum_n) AS n_taken FROM fan GROUP BY 1
)
SELECT f.k_pct AS k_pct, CAST(f.n_taken AS BIGINT) AS n_taken,
       CAST(fan.cum_p AS BIGINT) AS tp_taken,
       CAST(fan.cum_p * fan.nn * 1000000 // (f.n_taken * fan.pp)
            AS BIGINT) AS lift_ppm
FROM first f
JOIN fan ON fan.k_pct = f.k_pct AND fan.cum_n = f.n_taken
ORDER BY f.k_pct
""", "lift at first-crossing top-k% prefixes of the 256-bin sweep")
