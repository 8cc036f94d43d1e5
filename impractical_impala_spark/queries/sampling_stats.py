"""Round-7 second wave: sampling, collocation mining, sequence audits
and L-moment robust statistics.

- PMI collocations: the classic NLP collocation miner (pointwise
  mutual information over adjacent word pairs) — shuffle keys are the
  vocabulary and bigram-vocabulary, never the corpus row space.
- Two-proportion z: the share-drift significance test (multinomial
  type shares, early vs late half) from exact integer counts.
- Sequence-gap audit: id-space completeness without a global fact
  sort — ids fold into 4096-wide blocks (bounded per-block windows),
  block summaries carry boundary gaps.
- Weighted reservoir sample (Efraimidis-Spirakis): deterministic
  hash-uniform u, key u^(1/w), TWO-PHASE per-group top-K (salted
  partial top-K, then final top-K over <= salts x K rows) so no group
  is ever globally sorted.
- L-moments: L-CV and L-skewness per return flag from exact
  Faulhaber range-sums over the quantized bin histogram — the
  outlier-robust complement to classical moment ratios, never a fact
  total-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .drift import clip_bin

# ------------------------------------------------ PMI collocations
PMI_MIN_SUPPORT = 5
PMI_TOP_K = 50


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K collocations by pointwise mutual information: adjacent
    word pairs scoring ln((c_ab/B) / ((c_a/N)(c_b/N))) with a minimum
    support cut. Bigrams explode once per document (token-linear);
    both count shuffles key on the (bigram-)vocabulary, so the
    aggregate domain is content diversity, not corpus size. Unigram
    counts attach to the bigram aggregate via two vocabulary-keyed
    joins; ranking is top-K on the ROUNDED score with a deterministic
    (a, b) tiebreak — TakeOrdered, no global sort survives the limit.
    The doc rows repartition BEFORE the token fan-out (spread-before-
    explode): the input is doc-count-sized — cheap to move — while the
    exploded token stream is ~50x larger and must already be spread;
    locally this also defeats the single-file-one-task collapse
    (measured 9.0 s -> 2.4 s at sf0.1)."""
    docs = (load_table(spark, sf_dir, "documents")
            .select(F.expr("split(lower(text), ' ')").alias("w"))
            .repartition(spark.sparkContext.defaultParallelism))
    uni = (docs.select(F.explode("w").alias("t"))
           .groupBy("t").agg(F.count(F.lit(1)).alias("c")))
    n_tok = uni.agg(F.sum("c").alias("n"))
    # size >= 2 guard: Spark's sequence(1, 0) DESCENDS instead of
    # returning empty, which would pair w[0] with a NULL on a
    # single-token document
    bi = (docs.filter(F.expr("size(w) >= 2"))
          .select(F.explode(F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> struct(w[i-1] AS a, w[i] AS b))")).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_SUPPORT))
    n_bi = bi.agg(F.sum("c_ab").alias("nb"))
    scored = (bi
              .join(uni.select(F.col("t").alias("a"),
                               F.col("c").alias("c_a")), "a")
              .join(uni.select(F.col("t").alias("b"),
                               F.col("c").alias("c_b")), "b")
              .crossJoin(F.broadcast(n_tok))
              .crossJoin(F.broadcast(n_bi))
              .select("a", "b", "c_ab", "c_a", "c_b",
                      (F.round(F.log(
                          (F.col("c_ab") / F.col("nb"))
                          / ((F.col("c_a") / F.col("n"))
                             * (F.col("c_b") / F.col("n")))), 6) + 0.0)
                      .alias("pmi")))
    return (scored.orderBy(F.col("pmi").desc(), "a", "b")
            .limit(PMI_TOP_K))


register("text_pmi_collocations", text_pmi_collocations, f"""
WITH words AS (
    SELECT string_split(lower(text), ' ') AS w FROM documents
), uni AS (
    SELECT t, COUNT(*) AS c
    FROM (SELECT UNNEST(w) AS t FROM words) u GROUP BY t
), n_tok AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bi AS (
    SELECT a, b, COUNT(*) AS c_ab
    FROM (SELECT w[i] AS a, w[i + 1] AS b
          FROM words, UNNEST(range(1, len(w))) AS g(i)
          WHERE len(w) >= 2) p
    GROUP BY a, b HAVING COUNT(*) >= {PMI_MIN_SUPPORT}
), n_bi AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS nb FROM bi)
SELECT bi.a, bi.b, CAST(bi.c_ab AS BIGINT) AS c_ab,
       CAST(ua.c AS BIGINT) AS c_a, CAST(ub.c AS BIGINT) AS c_b,
       ROUND(LN((bi.c_ab / CAST(nb AS DOUBLE))
                / ((ua.c / CAST(n AS DOUBLE))
                   * (ub.c / CAST(n AS DOUBLE)))), 6) + 0.0 AS pmi
FROM bi
JOIN uni ua ON bi.a = ua.t
JOIN uni ub ON bi.b = ub.t
CROSS JOIN n_tok CROSS JOIN n_bi
ORDER BY pmi DESC, bi.a, bi.b
LIMIT {PMI_TOP_K}
""", "top-K adjacent-word collocations by PMI with support cut")


# --------------------------------------- two-proportion share z-test
def events_share_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on each event type's SHARE of traffic,
    early vs late half (global midpoint split): the significance
    companion to the chi-square daypart test, per type — did 'click'
    grow from 19% to 21% of events, and is that shift real? Pooled
    p-hat, one float expression over five exact integers per type."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts_ns")
    stats = ev.agg(F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid_ns"))
    marked = (ev.crossJoin(F.broadcast(stats))
              .withColumn("early", F.expr(
                  "CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END")))
    per_type = marked.groupBy("event_type").agg(
        F.sum("early").alias("x1"),
        F.sum(F.lit(1) - F.col("early")).alias("x2"))
    tot = per_type.agg(F.sum("x1").alias("n1"), F.sum("x2").alias("n2"))
    z = ("((cast(x1 as double)/n1 - cast(x2 as double)/n2)"
         " / sqrt((cast(x1 + x2 as double)/(n1 + n2))"
         " * (1.0 - cast(x1 + x2 as double)/(n1 + n2))"
         " * (1.0/n1 + 1.0/n2)))")
    return (per_type.crossJoin(F.broadcast(tot))
            .select("event_type", "x1", "n1", "x2", "n2",
                    F.expr("x1 * 1000000 div n1").alias("share_early_ppm"),
                    F.expr("x2 * 1000000 div n2").alias("share_late_ppm"),
                    (F.round(F.expr(z), 4) + 0.0).alias("z_share"))
            .orderBy("event_type"))


register("events_share_ztest", events_share_ztest, """
WITH ev AS (
    SELECT event_type, CAST(epoch_us(ts) AS BIGINT) * 1000 AS ts_ns
    FROM events
), stats AS (
    SELECT (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid_ns FROM ev
), per_type AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 1 ELSE 0 END)
                AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN ts_ns <= mid_ns THEN 0 ELSE 1 END)
                AS BIGINT) AS x2
    FROM ev CROSS JOIN stats GROUP BY event_type
), tot AS (
    SELECT CAST(SUM(x1) AS BIGINT) AS n1, CAST(SUM(x2) AS BIGINT) AS n2
    FROM per_type
)
SELECT event_type, x1, n1, x2, n2,
       x1 * 1000000 // n1 AS share_early_ppm,
       x2 * 1000000 // n2 AS share_late_ppm,
       ROUND((CAST(x1 AS DOUBLE)/n1 - CAST(x2 AS DOUBLE)/n2)
             / SQRT((CAST(x1 + x2 AS DOUBLE)/(n1 + n2))
                    * (1.0 - CAST(x1 + x2 AS DOUBLE)/(n1 + n2))
                    * (1.0/n1 + 1.0/n2)), 4) + 0.0 AS z_share
FROM per_type CROSS JOIN tot ORDER BY event_type
""", "two-proportion z-test on type share, early vs late half")


# ------------------------------------------------ sequence-gap audit
GAP_BLOCK = 4096


def sequence_gap_frame(ids: DataFrame) -> DataFrame:
    """Core of dq_sequence_gaps over any single-column (event_id)
    frame — exposed for the synthetic-gap kernel test."""
    blocked = ids.withColumn("blk", F.expr(f"event_id div {GAP_BLOCK}"))
    wb = Window.partitionBy("blk").orderBy("event_id")
    intra = (blocked
             .withColumn("gap", F.col("event_id")
                         - F.lag("event_id").over(wb) - 1)
             .filter(F.col("gap") > 0)
             .agg(F.coalesce(F.sum("gap"), F.lit(0)).alias("intra_missing"),
                  F.coalesce(F.max("gap"), F.lit(0)).alias("intra_max"),
                  F.count(F.lit(1)).alias("intra_runs")))
    summ = blocked.groupBy("blk").agg(
        F.min("event_id").alias("mn"), F.max("event_id").alias("mx"),
        F.count(F.lit(1)).alias("c"))
    wblk = Window.orderBy("blk")
    inter = (summ
             .withColumn("gap", F.col("mn") - F.lag("mx").over(wblk) - 1)
             .filter(F.col("gap") > 0)
             .agg(F.coalesce(F.sum("gap"), F.lit(0)).alias("inter_missing"),
                  F.coalesce(F.max("gap"), F.lit(0)).alias("inter_max"),
                  F.count(F.lit(1)).alias("inter_runs")))
    glob = ids.agg(F.count(F.lit(1)).alias("n_ids"),
                   F.min("event_id").alias("id_min"),
                   F.max("event_id").alias("id_max"))
    return (glob.crossJoin(F.broadcast(intra))
            .crossJoin(F.broadcast(inter))
            .select("n_ids", "id_min", "id_max",
                    (F.col("id_max") - F.col("id_min") + 1
                     - F.col("n_ids")).alias("n_missing"),
                    F.greatest("intra_max", "inter_max").alias("max_gap"),
                    (F.col("intra_runs") + F.col("inter_runs"))
                    .alias("n_gap_runs")))


def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id-space completeness audit for the events sequence WITHOUT a
    global fact sort: ids fold into 4096-wide blocks — gap runs inside
    a block come from a lag over that block's <= 4096 rows, and gaps
    that cross block boundaries come from a lag over the block
    SUMMARIES (a 4096x-reduced frame; the only global window, and it
    runs over aggregates). One integer summary row: total ids, span,
    missing count, the largest gap anywhere, and how many distinct gap
    runs exist — the ingestion-loss signature (one big gap = a lost
    batch; many small ones = sampling). A synthetic-gap kernel test
    pins the machinery against a hand count."""
    return sequence_gap_frame(
        load_table(spark, sf_dir, "events").select("event_id"))


register("dq_sequence_gaps", dq_sequence_gaps, f"""
WITH blocked AS (
    SELECT event_id, event_id // {GAP_BLOCK} AS blk FROM events
), intra_g AS (
    SELECT event_id - LAG(event_id) OVER (PARTITION BY blk
                                          ORDER BY event_id) - 1 AS gap
    FROM blocked
), intra AS (
    SELECT COALESCE(CAST(SUM(gap) AS BIGINT), 0) AS intra_missing,
           COALESCE(CAST(MAX(gap) AS BIGINT), 0) AS intra_max,
           CAST(COUNT(*) AS BIGINT) AS intra_runs
    FROM intra_g WHERE gap > 0
), summ AS (
    SELECT blk, MIN(event_id) AS mn, MAX(event_id) AS mx
    FROM blocked GROUP BY blk
), inter_g AS (
    SELECT mn - LAG(mx) OVER (ORDER BY blk) - 1 AS gap FROM summ
), inter AS (
    SELECT COALESCE(CAST(SUM(gap) AS BIGINT), 0) AS inter_missing,
           COALESCE(CAST(MAX(gap) AS BIGINT), 0) AS inter_max,
           CAST(COUNT(*) AS BIGINT) AS inter_runs
    FROM inter_g WHERE gap > 0
), gsum AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ids,
           MIN(event_id) AS id_min, MAX(event_id) AS id_max
    FROM events
)
SELECT n_ids, id_min, id_max,
       id_max - id_min + 1 - n_ids AS n_missing,
       GREATEST(intra_max, inter_max) AS max_gap,
       intra_runs + inter_runs AS n_gap_runs
FROM gsum CROSS JOIN intra CROSS JOIN inter
""", "blocked id-sequence completeness audit (no global fact sort)")


# ------------------------------ weighted reservoir sample (A-ES)
WRS_K = 20
WRS_SALTS = 64


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis-Spirakis weighted sampling: top-K
    documents per language by key u^(1/w) (w = n_chars, u a
    deterministic md5-prefix uniform in (0,1)) — longer documents are
    proportionally likelier, and the whole draw replays bit-identically
    on both engines. Scale shape: TWO-PHASE top-K — partial top-K per
    (lang, salt) bucket (64 salts, each window sorts a 64th of the
    group), then the final top-K over <= salts x K survivors — so no
    language group is ever sorted whole. The ranking key is a
    deterministic double; doc_id breaks exact ties."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    keyed = docs.select(
        "doc_id", "lang", "n_chars",
        F.expr(f"pmod(doc_id, {WRS_SALTS})").alias("salt"),
        F.expr("power((cast(conv(substring(md5(cast(doc_id as string)),"
               " 1, 7), 16, 10) as bigint) % 268435455 + 1) / 268435456.0,"
               " 1.0 / n_chars)").alias("key"))
    w1 = Window.partitionBy("lang", "salt").orderBy(
        F.col("key").desc(), "doc_id")
    partial = (keyed.withColumn("rn", F.row_number().over(w1))
               .filter(F.col("rn") <= WRS_K).drop("rn", "salt"))
    w2 = Window.partitionBy("lang").orderBy(F.col("key").desc(), "doc_id")
    return (partial.withColumn("sample_rank", F.row_number().over(w2))
            .filter(F.col("sample_rank") <= WRS_K)
            .select("lang", "sample_rank", "doc_id", "n_chars",
                    (F.round("key", 9) + 0.0).alias("key_r"))
            .orderBy("lang", "sample_rank"))


register("weighted_reservoir_sample", weighted_reservoir_sample, f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           POWER((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                       AS BIGINT) % 268435455 + 1) / 268435456.0,
                 1.0 / n_chars) AS key
    FROM documents
), ranked AS (
    SELECT lang, doc_id, n_chars, key,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY key DESC, doc_id) AS sample_rank
    FROM keyed
)
SELECT lang, CAST(sample_rank AS INTEGER) AS sample_rank, doc_id, n_chars,
       ROUND(key, 9) + 0.0 AS key_r
FROM ranked WHERE sample_rank <= {WRS_K}
ORDER BY lang, sample_rank
""", "deterministic Efraimidis-Spirakis weighted top-K sample per lang")


# ------------------------------------------------ L-moments
N_LM_BINS = 1024


def lineitem_lmoments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample L-moments of extended price per return flag over the
    1024-bin quantized domain: L-CV (lambda2/lambda1) and L-skewness
    (tau3 = lambda3/lambda2) — the outlier-robust shape statistics
    (linear in the order statistics, so a single corrupt extreme moves
    them O(1/n), unlike classical skewness). The order-statistic sums
    b_r = sum x_(i) * C(i-1, r) collapse onto the bin histogram with
    EXACT Faulhaber range-sums over each bin's rank interval — no fact
    total-order. The /2 and /3 of the Faulhaber forms fold into the
    final float denominators so the integer path is DIVISION-FREE,
    and all accumulation is DECIMAL(38,0) on Spark / HUGEINT on
    DuckDB (b2 terms reach n^3, past int64 at ~2e6 rows per flag —
    exact here to ~4e12).
    x is the integer bin index: the <= bin-width quantization is the
    operator contract, mirrored exactly in the oracle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    fstats = li.groupBy("flag").agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    binned = (li.join(F.broadcast(fstats), "flag")
              .select("flag", clip_bin(F.col("cents"), F.col("mn"),
                                       F.col("mx"), N_LM_BINS).alias("x")))
    hist = binned.groupBy("flag", "x").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("flag").orderBy("x")
    # a = ranks before this bin; ranks in bin are a+1 .. a+c. The run
    # sums stay DIVISION-FREE integers (the /2 and /3 of the Faulhaber
    # forms fold into the final float denominators):
    # s1x2 = 2 * sum (i-1)      over the run = c * (2a + c - 1)
    # s2x3 = 3 * sum (i-1)(i-2) over the run = g(a+c) - g(a),
    #        g(m) = m(m-1)(m-2)   (= 3 * sum of j(j-1) for j < m)
    runs = (hist
            .withColumn("a", F.sum("c").over(wc) - F.col("c"))
            .withColumn("xd", F.col("x").cast("decimal(38,0)"))
            .withColumn("ad", F.col("a").cast("decimal(38,0)"))
            .withColumn("cd", F.col("c").cast("decimal(38,0)"))
            .withColumn("s1x2", F.expr("cd * (2 * ad + cd - 1)"))
            .withColumn("s2x3", F.expr(
                "(ad + cd) * (ad + cd - 1) * (ad + cd - 2)"
                " - ad * (ad - 1) * (ad - 2)")))
    suff = runs.groupBy("flag").agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("xd * cd")).alias("b0n"),
        F.sum(F.expr("xd * s1x2")).alias("b1n2"),
        F.sum(F.expr("xd * s2x3")).alias("b2n3"))
    # b0 = b0n/n; b1 = b1n2/(2 n(n-1)); b2 = b2n3/(3 n(n-1)(n-2))
    # lambda1 = b0; lambda2 = 2b1 - b0; lambda3 = 6b2 - 6b1 + b0
    l1 = "(cast(b0n as double) / n)"
    l2 = f"(cast(b1n2 as double) / (cast(n as double) * (n-1)) - {l1})"
    l3 = (f"(2.0 * cast(b2n3 as double)"
          f" / (cast(n as double) * (n-1) * (n-2))"
          f" - 3.0 * cast(b1n2 as double) / (cast(n as double) * (n-1))"
          f" + {l1})")
    return (suff.select(
        F.col("flag").alias("l_returnflag"), "n",
        (F.round(F.expr(l1), 4) + 0.0).alias("l1_bin"),
        (F.round(F.expr(l2), 4) + 0.0).alias("l2_bin"),
        (F.round(F.expr(f"{l2} / {l1}"), 6) + 0.0).alias("l_cv"),
        (F.round(F.expr(f"{l3} / {l2}"), 6) + 0.0).alias("l_skew"))
        .orderBy("l_returnflag"))


register("lineitem_lmoments", lineitem_lmoments, f"""
WITH li AS (
    SELECT l_returnflag AS flag,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
), fstats AS (
    SELECT flag, MIN(cents) AS mn, MAX(cents) AS mx FROM li GROUP BY flag
), binned AS (
    SELECT li.flag,
           CASE WHEN f.mx = f.mn THEN 0 ELSE
                LEAST({N_LM_BINS - 1},
                      CAST(FLOOR((li.cents - f.mn) * {N_LM_BINS}
                                 / CAST(f.mx - f.mn AS DOUBLE))
                           AS BIGINT)) END AS x
    FROM li JOIN fstats f ON li.flag = f.flag
), hist AS (
    SELECT flag, x, CAST(COUNT(*) AS BIGINT) AS c
    FROM binned GROUP BY 1, 2
), runs AS (
    SELECT flag, CAST(x AS HUGEINT) AS xd, CAST(c AS HUGEINT) AS cd,
           CAST(CAST(SUM(c) OVER (PARTITION BY flag ORDER BY x) AS BIGINT)
                - c AS HUGEINT) AS ad
    FROM hist
), terms AS (
    SELECT flag, xd, cd, ad,
           cd * (2 * ad + cd - 1) AS s1x2,
           (ad + cd) * (ad + cd - 1) * (ad + cd - 2)
               - ad * (ad - 1) * (ad - 2) AS s2x3
    FROM runs
), suff AS (
    SELECT flag, CAST(SUM(cd) AS BIGINT) AS n,
           SUM(xd * cd) AS b0n, SUM(xd * s1x2) AS b1n2,
           SUM(xd * s2x3) AS b2n3
    FROM terms GROUP BY flag
)
SELECT flag AS l_returnflag, n,
       ROUND(CAST(b0n AS DOUBLE) / n, 4) + 0.0 AS l1_bin,
       ROUND(CAST(b1n2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n-1))
             - CAST(b0n AS DOUBLE) / n, 4) + 0.0 AS l2_bin,
       ROUND((CAST(b1n2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n-1))
              - CAST(b0n AS DOUBLE) / n)
             / (CAST(b0n AS DOUBLE) / n), 6) + 0.0 AS l_cv,
       ROUND((2.0 * CAST(b2n3 AS DOUBLE)
              / (CAST(n AS DOUBLE) * (n-1) * (n-2))
              - 3.0 * CAST(b1n2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n-1))
              + CAST(b0n AS DOUBLE) / n)
             / (CAST(b1n2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n-1))
                - CAST(b0n AS DOUBLE) / n), 6) + 0.0 AS l_skew
FROM suff ORDER BY l_returnflag
""", "L-CV / L-skewness from Faulhaber range-sums over the bin histogram")
