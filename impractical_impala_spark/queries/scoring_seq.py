"""Round-8 wave 6: scoring diagnostics, sequence mining, leading
indicators, tail risk, and the SNM recall audit — closing the loop on
the wave-4/5 calibration surface.

- WOE / information value: the credit-scoring feature diagnostic —
  per score bin, the weight of evidence ln((pos share)/(neg share))
  with half-count smoothing, and its IV contribution; Σ IV says
  whether the feature separates at all.
- Cumulative-gain / lift table: the ranking-eval companion to ROC —
  bins ranked by descending score group into deciles at bin
  granularity; cumulative positive capture and lift per decile.
- Session pattern mining: SUPPORT-counted ordered event-type trigrams
  inside 30-minute sessions (a pattern counts once per session — the
  sequence-mining semantic, not the n-gram frequency semantic).
- Cross-correlation function: daily view counts vs daily purchase
  counts at lags -3..+3 — the leading-indicator diagnostic, exact
  n²-scaled integer Pearson per lag on the shared day spine.
- Gumbel block-maxima fit: method-of-moments extreme-value fit to
  daily maxima per event type (location, scale, 30-block return
  level) from exact centi-unit sufficient sums.
- SNM recall audit: the sorted-neighborhood window's known failure
  mode measured — recall of planted exact-duplicate pairs vs the
  hash-dedup ground truth, as one integer-exact summary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .calibration_ops import _ORACLE_BINNED, _binned_events
from .dedup import COPY_OFFSET
from .linkage_splits import snm_candidate_pairs
from .paths_stats import SESSION_GAP_US

WOE_BINS = 64


def events_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value table for the purchase
    label over the 64-bin score domain: woe_b = ln(((pos_b+0.5)/P) /
    ((neg_b+0.5)/N)) with half-count smoothing, iv_b = ((pos_b/P) -
    (neg_b/N))·woe_b. One fact shuffle into 64 cells; totals broadcast
    back over the NONEMPTY bins (an empty bin has no row — both
    engines agree; densify upstream if a consumer needs the smoothed
    prior for absent bins). The ln runs once per bin on exact
    integers; outputs round to 6 so the single-expression float work
    is engine-identical."""
    binned = _binned_events(spark, sf_dir, WOE_BINS)
    hist = (binned.groupBy("bin")
            .agg(F.sum("pos").alias("p"),
                 F.sum(F.lit(1) - F.col("pos")).alias("ng")))
    tot = hist.agg(F.sum("p").alias("tp"), F.sum("ng").alias("tn"))
    # 0.5D: bare 0.5 parses as DECIMAL in Spark SQL and the
    # division drops to lossy decimal arithmetic (~1e-7 error);
    # the D suffix pins every operand to double like the oracle
    woe = ("ln(((p + 0.5D) / tp) / ((ng + 0.5D) / tn))")
    iv = (f"((cast(p as double) / tp) - (cast(ng as double) / tn))"
          f" * {woe}")
    return (hist.crossJoin(F.broadcast(tot))
            .select("bin", F.col("p").alias("n_pos"),
                    F.col("ng").alias("n_neg"),
                    (F.round(F.expr(woe), 6) + 0.0).alias("woe"),
                    (F.round(F.expr(iv), 6) + 0.0).alias("iv_term"))
            .orderBy("bin"))


register("events_woe_iv", events_woe_iv, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=WOE_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(SUM(pos) AS BIGINT) AS p,
           CAST(SUM(1 - pos) AS BIGINT) AS ng
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(ng) AS BIGINT) AS tn
    FROM hist
)
SELECT bin, p AS n_pos, ng AS n_neg,
       ROUND(ln(((p + 0.5) / tp) / ((ng + 0.5) / tn)), 6) + 0.0 AS woe,
       ROUND(((CAST(p AS DOUBLE) / tp) - (CAST(ng AS DOUBLE) / tn))
             * ln(((p + 0.5) / tp) / ((ng + 0.5) / tn)), 6) + 0.0
       AS iv_term
FROM hist CROSS JOIN tot
ORDER BY bin
""", "weight-of-evidence + IV per score bin (half-count smoothing)")

GAIN_BINS = 256
GAIN_DECILES = 10


def events_cumulative_gain(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Cumulative-gain (lift) table: bins of the 256-bin score domain
    rank by DESCENDING score; each bin lands in the decile of its
    first row (decile = cum_before·10 div n — deterministic at bin
    granularity, documented); per decile the row count, positive
    count, cumulative positive capture (ppm of all positives), and
    lift vs the base rate (ppm). Everything after the one fact-size
    histogram shuffle runs on the 256-cell spine with exact integer
    div arithmetic."""
    binned = _binned_events(spark, sf_dir, GAIN_BINS)
    hist = (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")))
    w = Window.orderBy(F.desc("bin")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    tot = hist.agg(F.sum("n").alias("nt"), F.sum("p").alias("pt"))
    dec = (hist
           .withColumn("cum_before",
                       F.coalesce(F.sum("n").over(w), F.lit(0)))
           .crossJoin(F.broadcast(tot))
           .withColumn("decile",
                       F.least(F.lit(GAIN_DECILES - 1),
                               F.expr(f"cum_before * {GAIN_DECILES}"
                                      " div nt"))))
    by_dec = (dec.groupBy("decile")
              .agg(F.sum("n").alias("n_rows"), F.sum("p").alias("n_pos"),
                   F.max("nt").alias("nt"), F.max("pt").alias("pt")))
    wd = Window.orderBy("decile") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (by_dec
            .withColumn("cum_pos", F.sum("n_pos").over(wd))
            .withColumn("cum_rows", F.sum("n_rows").over(wd))
            .select("decile", "n_rows", "n_pos",
                    F.expr("cum_pos * 1000000 div pt")
                    .alias("capture_ppm"),
                    # cum_pos*nt*1e6 wraps int64 at ~1e7 rows — the
                    # ratio runs in DECIMAL(38,0) and narrows after
                    F.expr("cast((cast(cum_pos as decimal(38,0)) * nt"
                           " * 1000000) div (cast(cum_rows as"
                           " decimal(38,0)) * pt) as bigint)")
                    .alias("lift_ppm"))
            .orderBy("decile"))


register("events_cumulative_gain", events_cumulative_gain, f"""
WITH binned AS ({_ORACLE_BINNED.format(nb=GAIN_BINS, pos='purchase')}),
hist AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS p
    FROM binned GROUP BY 1
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(p) AS BIGINT) AS pt
    FROM hist
), dec AS (
    SELECT bin, n, p, nt, pt,
           LEAST({GAIN_DECILES} - 1,
                 CAST(COALESCE(SUM(n) OVER (ORDER BY bin DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) * {GAIN_DECILES} // nt) AS decile
    FROM hist CROSS JOIN tot
), by_dec AS (
    SELECT decile, CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           MAX(nt) AS nt, MAX(pt) AS pt
    FROM dec GROUP BY 1
)
SELECT decile, n_rows, n_pos,
       CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) * 1000000
       // pt AS capture_ppm,
       CAST((CAST(SUM(n_pos) OVER (ORDER BY decile) AS HUGEINT)
             * nt * 1000000)
            // (CAST(SUM(n_rows) OVER (ORDER BY decile) AS HUGEINT) * pt)
            AS BIGINT) AS lift_ppm
FROM by_dec ORDER BY decile
""", "descending-score decile gain/lift table from the 256-bin domain")

SPM_TOPK = 20


def session_pattern_mining(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Support-counted ordered event-type trigrams within 30-minute
    sessions: a pattern counts ONCE per session (the sequence-mining
    support semantic — an n-gram frequency count would let one hot
    session dominate). Sessionize by gaps-and-islands on the exact
    microsecond epoch (the events_sessionized discipline), slide a
    lead-window trigram over each session, DISTINCT per (session,
    pattern), count sessions per pattern, top-SPM_TOPK deterministic.
    Shuffle keys: user (window), then pattern vocabulary (<= types³) —
    never corpus-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (ev
            .withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
            .withColumn("new_s", (F.col("gap").isNull()
                                  | (F.col("gap") > SESSION_GAP_US))
                        .cast("int"))
            .withColumn("sess_n", F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "sess_n") \
        .orderBy("ts_us", "event_id")
    # concat (NOT concat_ws): concat_ws silently skips NULL components,
    # so a NULL event_type would emit a 2-part pattern the oracle's
    # NULL-propagating || drops — concat + the pattern filter keeps the
    # two engines' NULL rule identical.
    tri = (sess
           .withColumn("t2", F.lead("event_type", 1).over(ws))
           .withColumn("t3", F.lead("event_type", 2).over(ws))
           .select("user_id", "sess_n",
                   F.concat("event_type", F.lit(">"), "t2",
                            F.lit(">"), "t3").alias("pattern"))
           .filter(F.col("pattern").isNotNull()))
    return (tri.distinct()
            .groupBy("pattern")
            .agg(F.count(F.lit(1)).alias("support"))
            .orderBy(F.desc("support"), "pattern")
            .limit(SPM_TOPK))


register("session_pattern_mining", session_pattern_mining, f"""
WITH ev AS (
    SELECT user_id, event_type, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
), gaps AS (
    SELECT *, CASE WHEN ts_us - lag(ts_us) OVER win
                        > {SESSION_GAP_US}
                   OR lag(ts_us) OVER win IS NULL
              THEN 1 ELSE 0 END AS new_s
    FROM ev
    WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
    SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS BIGINT) AS sess_n
    FROM gaps
), tri AS (
    SELECT DISTINCT user_id, sess_n,
           event_type || '>' || lead(event_type, 1) OVER ws
                      || '>' || lead(event_type, 2) OVER ws AS pattern
    FROM sess
    WINDOW ws AS (PARTITION BY user_id, sess_n ORDER BY ts_us, event_id)
)
SELECT pattern, CAST(COUNT(*) AS BIGINT) AS support
FROM tri WHERE pattern IS NOT NULL
GROUP BY 1 ORDER BY support DESC, pattern LIMIT {SPM_TOPK}
""", "support-counted session trigram patterns (once per session)")

CCF_MAX_LAG = 3
CCF_X_TYPE = "view"
CCF_Y_TYPE = "purchase"


def events_type_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily 'view' counts vs daily 'purchase'
    counts at lags -3..+3 (does browsing lead buying?): both series
    come from ONE events scan pivoted into (day, view_cnt,
    purchase_cnt) on the shared day spine, then each lag joins the
    spine against itself shifted by the lag and reduces to the
    n²-scaled exact-integer Pearson (the events_pacf machinery,
    cross-series). The lag spine is a 7-row OneRowRelation explode;
    sufficient sums run over the calendar-bounded day spine, never the
    fact table. Positive lag pairs views at day d with purchases at
    day d+lag, so ccf at lag>0 measures views LEADING purchases."""
    sparse = (load_table(spark, sf_dir, "events")
              .filter(F.col("event_type").isin(CCF_X_TYPE, CCF_Y_TYPE))
              .select(F.expr("ts_ns div 86400000000000").alias("day"),
                      "event_type")
              .groupBy("day")
              .agg(F.sum(F.when(F.col("event_type") == CCF_X_TYPE, 1)
                         .otherwise(0)).alias("xc"),
                   F.sum(F.when(F.col("event_type") == CCF_Y_TYPE, 1)
                         .otherwise(0)).alias("yc")))
    # dense day spine: a day with no view/purchase events is a REAL
    # zero observation, not a missing row (the PACF/PH/burst spine
    # discipline) — dropping it would bias every lagged pair
    bounds = sparse.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day"))
    days = (spine.join(sparse, "day", "left")
            .select("day", F.coalesce("xc", F.lit(0)).alias("xc"),
                    F.coalesce("yc", F.lit(0)).alias("yc")))
    lags = spark.sql(
        f"SELECT explode(sequence(cast(-{CCF_MAX_LAG} as bigint),"
        f" cast({CCF_MAX_LAG} as bigint))) AS lag")
    # compute the shifted key on the x side BEFORE joining: `xday +
    # lag = day` referencing both sides is a non-equi condition that
    # plans as a BNLJ; a single-side `jday` column makes it an
    # ordinary equi-join on the calendar spine
    x = (days.select(F.col("day").alias("xday"), "xc")
         .crossJoin(F.broadcast(lags))
         .withColumn("jday", F.col("xday") + F.col("lag")))
    paired = (days.select("day", "yc")
              .join(x, F.col("day") == F.col("jday"))
              .select("lag", "xc", "yc"))
    suff = (paired.groupBy("lag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("xc").alias("sx"), F.sum("yc").alias("sy"),
                 F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
                 F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
                 F.sum(F.col("yc") * F.col("yc")).alias("syy")))
    r = ("(cast(n as double) * sxy - cast(sx as double) * sy)"
         " / sqrt((cast(n as double) * sxx - cast(sx as double) * sx)"
         " * (cast(n as double) * syy - cast(sy as double) * sy))")
    return (suff.select("lag", "n",
                        (F.round(F.expr(r), 6) + 0.0).alias("ccf"))
            .orderBy("lag"))


register("events_type_ccf", events_type_ccf, f"""
WITH sparse AS (
    SELECT CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS day,
           CAST(SUM(CASE WHEN event_type = '{CCF_X_TYPE}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS xc,
           CAST(SUM(CASE WHEN event_type = '{CCF_Y_TYPE}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS yc
    FROM events
    WHERE event_type IN ('{CCF_X_TYPE}', '{CCF_Y_TYPE}')
    GROUP BY 1
), spine AS (
    SELECT UNNEST(range(MIN(day), MAX(day) + 1)) AS day FROM sparse
), days AS (
    SELECT sp.day, COALESCE(s.xc, 0) AS xc, COALESCE(s.yc, 0) AS yc
    FROM spine sp LEFT JOIN sparse s ON sp.day = s.day
), lags AS (
    SELECT UNNEST(range(-{CCF_MAX_LAG}, {CCF_MAX_LAG + 1})) AS lag
), paired AS (
    SELECT lag, x.xc, y.yc
    FROM days y CROSS JOIN lags
    JOIN days x ON x.day + lag = y.day
), suff AS (
    SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
           CAST(SUM(xc * yc) AS BIGINT) AS sxy,
           CAST(SUM(xc * xc) AS BIGINT) AS sxx,
           CAST(SUM(yc * yc) AS BIGINT) AS syy
    FROM paired GROUP BY 1
)
SELECT lag, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy)), 6) + 0.0 AS ccf
FROM suff ORDER BY lag
""", "view-vs-purchase daily cross-correlation at lags -3..+3")

EULER_GAMMA_MICRO = 577_216  # Euler-Mascheroni * 1e6
GUMBEL_RETURN_BLOCKS = 30


def events_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit to daily block maxima of event value
    per type (the tail-risk monitor): method of moments on exact
    centi-unit maxima — scale beta = sd·sqrt(6)/pi, location mu =
    mean − gamma·beta, and the 30-block return level mu −
    beta·ln(−ln(1 − 1/30)). Two bounded reductions: fact → (type,
    day) maxima (calendar-sized), then maxima → n/sum/sum-of-squares
    sufficient integers per type. sd uses n−1. All float work is one
    closed-form expression on exact integers, rounded to 4."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type",
                  F.expr("ts_ns div 86400000000000").alias("day"),
                  F.expr("cast(floor(value * 100) as bigint)")
                  .alias("centi")))
    maxima = (ev.groupBy("event_type", "day")
              .agg(F.max("centi").alias("m")))
    suff = (maxima.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_blocks"),
                 F.sum("m").alias("s"),
                 F.sum(F.col("m") * F.col("m")).alias("q")))
    mean = "(cast(s as double) / n_blocks / 100.0D)"
    sd = ("sqrt((cast(q as double) - cast(s as double) * s / n_blocks)"
          " / (n_blocks - 1)) / 100.0D")
    beta = f"({sd} * sqrt(6.0D) / pi())"
    mu = f"({mean} - {EULER_GAMMA_MICRO} * 1e-6 * {beta})"
    rl = (f"({mu} - {beta} * ln(-ln(1.0D - 1.0D"
          f" / {GUMBEL_RETURN_BLOCKS})))")
    return (suff.filter(F.col("n_blocks") >= 2)
            .select("event_type", "n_blocks",
                    (F.round(F.expr(mu), 4) + 0.0).alias("gumbel_mu"),
                    (F.round(F.expr(beta), 4) + 0.0).alias("gumbel_beta"),
                    (F.round(F.expr(rl), 4) + 0.0).alias("return_level_30"))
            .orderBy("event_type"))


_G_MEAN = "(CAST(s AS DOUBLE) / n_blocks / 100.0)"
_G_SD = ("sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_blocks)"
         " / (n_blocks - 1)) / 100.0")
_G_BETA = f"({_G_SD} * sqrt(6.0) / pi())"
_G_MU = f"({_G_MEAN} - {EULER_GAMMA_MICRO} * 1e-6 * {_G_BETA})"
_G_RL = (f"({_G_MU} - {_G_BETA} * ln(-ln(1.0 - 1.0"
         f" / {GUMBEL_RETURN_BLOCKS})))")

register("events_gumbel_maxima", events_gumbel_maxima, f"""
WITH maxima AS (
    SELECT event_type,
           CAST(epoch_us(ts) AS BIGINT) * 1000 // 86400000000000 AS day,
           CAST(MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS m
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
), suff AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(m) AS BIGINT) AS s,
           CAST(SUM(m * m) AS BIGINT) AS q
    FROM maxima GROUP BY 1
)
SELECT event_type, n_blocks,
       ROUND({_G_MU}, 4) + 0.0 AS gumbel_mu,
       ROUND({_G_BETA}, 4) + 0.0 AS gumbel_beta,
       ROUND({_G_RL}, 4) + 0.0 AS return_level_30
FROM suff WHERE n_blocks >= 2
ORDER BY event_type
""", "Gumbel block-maxima fit + 30-block return level per type")


def snm_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the sorted-neighborhood window against planted exact
    duplicates: augment documents with exact copies of every 5th doc
    (the dedup_exact ground truth), run the SNM candidate core, and
    measure what fraction of the planted (id, id+OFFSET) pairs appear
    as distance-0 candidates — the known SNM failure mode (more than
    w-1 same-key docs between a pair) made measurable. One summary
    row: planted pairs, SNM distance-0 pairs, hits, recall ppm. The
    pair join runs on the candidate set (corpus-linear), never
    all-pairs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(COPY_OFFSET))
    aug = docs.unionByName(copies)
    planted = (docs.filter(F.col("doc_id") % 5 == 0)
               .select(F.col("doc_id").alias("doc_a"),
                       (F.col("doc_id") + COPY_OFFSET).alias("doc_b")))
    zero = (snm_candidate_pairs(aug)
            .filter(F.col("edit_dist") == 0)
            .select(F.least("doc_a", "doc_b").alias("doc_a"),
                    F.greatest("doc_a", "doc_b").alias("doc_b"))
            .distinct())
    j = (planted.join(zero.withColumn("hit", F.lit(1)),
                      ["doc_a", "doc_b"], "left"))
    hits = j.agg(F.count(F.lit(1)).alias("n_planted"),
                 F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    totals = zero.agg(F.count(F.lit(1)).alias("n_zero_pairs"))
    return (hits.crossJoin(F.broadcast(totals))
            .select("n_planted", "n_zero_pairs", "n_hit",
                    F.expr("n_hit * 1000000 div n_planted")
                    .alias("recall_ppm")))


register("snm_recall_audit", snm_recall_audit, f"""
WITH aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {COPY_OFFSET}, text FROM documents
    WHERE doc_id % 5 = 0
), keyed AS (
    SELECT doc_id,
           substr(regexp_replace(lower(substr(text, 1, 256)),
                  '[^a-z0-9]', '', 'g'), 1, 40) AS k,
           substr(regexp_replace(lower(substr(text, 1, 256)),
                  '[^a-z0-9]', '', 'g'), 1, 64) AS sig,
           substr(regexp_replace(lower(substr(text, 1, 256)),
                  '[^a-z0-9]', '', 'g'), 1, 8) AS blk
    FROM aug
), nb AS (
    SELECT doc_id, sig,
           lead(doc_id, 1) OVER win AS d1, lead(sig, 1) OVER win AS s1,
           lead(doc_id, 2) OVER win AS d2, lead(sig, 2) OVER win AS s2
    FROM keyed
    WINDOW win AS (PARTITION BY blk ORDER BY k, doc_id)
), zero AS (
    SELECT DISTINCT least(doc_a, doc_b) AS doc_a,
           greatest(doc_a, doc_b) AS doc_b
    FROM (
        SELECT doc_id AS doc_a, d1 AS doc_b FROM nb
        WHERE d1 IS NOT NULL AND levenshtein(sig, s1) = 0
        UNION ALL
        SELECT doc_id, d2 FROM nb
        WHERE d2 IS NOT NULL AND levenshtein(sig, s2) = 0
    )
), planted AS (
    SELECT doc_id AS doc_a, doc_id + {COPY_OFFSET} AS doc_b
    FROM documents WHERE doc_id % 5 = 0
), hits AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           CAST(SUM(CASE WHEN z.doc_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit
    FROM planted p LEFT JOIN zero z
      ON p.doc_a = z.doc_a AND p.doc_b = z.doc_b
), totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_zero_pairs FROM zero
)
SELECT n_planted, n_zero_pairs, n_hit,
       n_hit * 1000000 // n_planted AS recall_ppm
FROM hits CROSS JOIN totals
""", "SNM window recall vs planted exact-duplicate ground truth")


# ---------------------------------------------- Shapley attribution
SHAP_CHANNELS = ("click", "error", "signup", "view")  # bit order
SHAP_N = len(SHAP_CHANNELS)
# s!(n-1-s)! in units of 1/n! = 1/24 for n = 4
SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}


def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution: the characteristic
    function v(S) counts converted users whose touched-channel set is
    a SUBSET of S (the standard coalition game for marketing
    attribution), and each channel's value is the exact Shapley sum
    over all 2^{SHAP_N} coalitions with factorial weights kept in
    integer 1/24ths — the axiomatically fair split that position-based
    and last-touch rules approximate. Scale shape: the fact table
    reduces once to per-user (mask, converted); everything after runs
    on the 16-row mask table and a 32-row literal coalition frame —
    pure model-size joins. Efficiency axiom (sum phi = v(N) - v(empty))
    is pinned by the wave test."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    bits = " + ".join(
        f"(cast(max(case when event_type = '{ch}' then 1 else 0 end)"
        f" as int) * {1 << i})"
        for i, ch in enumerate(SHAP_CHANNELS))
    users = ev.groupBy("user_id").agg(
        F.expr(bits).alias("mask"),
        F.max(F.expr("cast(event_type = 'purchase' as int)"))
        .alias("converted"))
    conv = (users.filter(F.col("converted") == 1)
            .groupBy("mask").agg(F.count(F.lit(1)).alias("c")))
    # v(S) = sum over T subset of S of conv(T): 16x16 model-size join
    smasks = spark.range(1 << SHAP_N).select(
        F.col("id").cast("int").alias("s_mask"))
    # v is 16 rows but read three times (two coalition joins + the
    # gain row) — cache it or each use re-runs the fact scan
    v = (F.broadcast(smasks)
         .join(conv, F.expr("(mask & ~s_mask) = 0"), "left")
         .groupBy("s_mask")
         .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))).cache()
    rows = []
    for i, ch in enumerate(SHAP_CHANNELS):
        for s in range(1 << SHAP_N):
            if not (s >> i) & 1:
                rows.append((ch, s, s | (1 << i),
                             SHAP_W24[bin(s).count("1")]))
    coal = spark.createDataFrame(
        rows, "channel string, s_mask int, si_mask int, w24 int")
    vs = v.select(F.col("s_mask").alias("m"), F.col("v").alias("vv"))
    phi = (coal
           .join(F.broadcast(vs), F.col("s_mask") == F.col("m"))
           .drop("m").withColumnRenamed("vv", "v_s")
           .join(F.broadcast(vs), F.col("si_mask") == F.col("m"))
           .drop("m").withColumnRenamed("vv", "v_si")
           .groupBy("channel")
           .agg(F.sum(F.expr("w24 * (v_si - v_s)")).alias("phi_x24")))
    gain = v.agg(
        (F.max(F.when(F.col("s_mask") == (1 << SHAP_N) - 1, F.col("v")))
         - F.max(F.when(F.col("s_mask") == 0, F.col("v"))))
        .alias("total_gain"))
    return (phi.crossJoin(F.broadcast(gain))
            .select("channel", "phi_x24",
                    F.expr("case when total_gain > 0 then"
                           " phi_x24 * 1000000 div (24 * total_gain)"
                           " end").alias("share_ppm"))
            .orderBy("channel"))


def _shapley_oracle() -> str:
    bits = " + ".join(
        f"(MAX(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END)"
        f" * {1 << i})"
        for i, ch in enumerate(SHAP_CHANNELS))
    coal_rows = ", ".join(
        f"('{ch}', {s}, {s | (1 << i)}, {SHAP_W24[bin(s).count('1')]})"
        for i, ch in enumerate(SHAP_CHANNELS)
        for s in range(1 << SHAP_N) if not (s >> i) & 1)
    return f"""
WITH users AS (
    SELECT user_id, {bits} AS mask,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
), conv AS (
    SELECT mask, CAST(COUNT(*) AS BIGINT) AS c
    FROM users WHERE converted = 1 GROUP BY mask
), smasks AS (
    SELECT CAST(UNNEST(range(0, {1 << SHAP_N})) AS INT) AS s_mask
), v AS (
    SELECT s_mask, CAST(COALESCE(SUM(c), 0) AS BIGINT) AS v
    FROM smasks LEFT JOIN conv ON (mask & ~s_mask) = 0
    GROUP BY s_mask
), coal(channel, s_mask, si_mask, w24) AS (
    VALUES {coal_rows}
), phi AS (
    SELECT channel,
           CAST(SUM(w24 * (vsi.v - vs.v)) AS BIGINT) AS phi_x24
    FROM coal
    JOIN v vs ON vs.s_mask = coal.s_mask
    JOIN v vsi ON vsi.s_mask = coal.si_mask
    GROUP BY channel
), gain AS (
    SELECT MAX(CASE WHEN s_mask = {(1 << SHAP_N) - 1} THEN v END)
           - MAX(CASE WHEN s_mask = 0 THEN v END) AS total_gain
    FROM v
)
SELECT channel, phi_x24,
       CAST(CASE WHEN total_gain > 0 THEN
            phi_x24 * 1000000 // (24 * total_gain) END AS BIGINT)
           AS share_ppm
FROM phi CROSS JOIN gain ORDER BY channel
"""


register("attribution_shapley", attribution_shapley, _shapley_oracle(),
         "exact Shapley-value channel attribution (integer 1/24 units)")
