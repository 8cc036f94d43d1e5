"""Round-8 wave 10: experiment design & agreement — the operators an
evaluation harness runs BEFORE and BETWEEN model comparisons.

- Rank-biased overlap (RBO@10, p=0.9): do two term-importance rankings
  (TF-IDF vs raw frequency) agree per source? The top-weighted set
  comparison ROC/kappa can't give — exact rational arithmetic via a
  shared-denominator integer scaling (no floats until the final
  report column).
- McNemar's paired test: two classifiers on the SAME documents — the
  correct significance test for "is langid-B better than langid-A"
  (independent-sample tests are wrong on paired predictions).
- Minimum detectable effect / required sample size: the pre-experiment
  power analysis for a two-proportion A/B on each event type's traffic
  share (alpha=5% two-sided, power 80%).
- Linear CKA between the two halves of the embedding space: the
  representation-redundancy audit (near-1 alignment means half the
  dimensions carry the same geometry — a pruning signal). Exact
  integer sufficient statistics via the fixed-point Gram discipline.
- Neyman allocation: the optimal split of a fixed labeling/sampling
  budget across sources (allocate proportional to stratum size x
  stratum sd) — the standard design for "which sources do we hand-audit".

Reference parity: the reference pipelines (dtrendandstat_*.R) carry no
experiment-design stage; these extend the engine's corpus-evaluation
surface for LLM-pipeline use (SURVEY.md "beyond the reference" scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .ml_more import DIM, Q_SCALE
from .text import _DUCK_H, _DUCK_WORDS, _SPARK_H, _SPARK_WORDS, LANGS

# ------------------------------------------------------------ RBO@10
RBO_K = 10
# RBO@K = (1-p) * sum_d p^(d-1) * overlap_d / d at p = 9/10, exact:
# term_d = 9^(d-1) * ov_d / (10^d * d). Scaling every term by
# 2520 * 10^10 (2520 = lcm(1..10)) makes each coefficient an integer:
# coef_d = (2520/d) * 9^(d-1) * 10^(10-d). Perfect agreement
# (ov_d = d) sums to RBO_FULL, so the ppm normalization is an exact
# integer division; max sum ~5.9e13 is int64-safe with 10^5 headroom.
RBO_COEF = [(2520 // d) * 9 ** (d - 1) * 10 ** (10 - d)
            for d in range(1, RBO_K + 1)]
RBO_FULL = sum(c * d for c, d in zip(RBO_COEF, range(1, RBO_K + 1)))


def text_rbo_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO@10 (p=0.9) between each source's top-10 terms ranked by
    TF-IDF (tf x centi-quantized IDF, integer) and by raw frequency.
    One vocabulary-keyed shuffle builds (source, term, tf); document
    frequency attaches by a term-keyed join (vocabulary-sized — at web
    scale a shuffle join on the uniform term key); the two rankings
    are per-source windows over source-local vocabularies, and all
    RBO arithmetic runs on the model-size (source x depth) grid in
    exact integers. A term common to both top-10s contributes to every
    depth d >= max(rank_a, rank_b) via a bounded explode (<= 10 rows
    per common term)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-side scalar (text_tfidf precedent)
    terms = (docs.select("source", "doc_id",
                         F.explode(F.expr(_SPARK_WORDS)).alias("term"))
             .filter(F.length("term") > 0))
    tf = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_ = (terms.select("doc_id", "term").distinct()
           .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    scored = tf.join(df_, "term").select(
        "source", "term", "tf",
        (F.col("tf") * F.expr(
            f"cast(round((ln(cast({n_docs} as double))"
            " - ln(cast(df as double))) * 100, 0) as bigint)"))
        .alias("score_a"))
    wa = Window.partitionBy("source").orderBy(
        F.col("score_a").desc(), "term")
    wb = Window.partitionBy("source").orderBy(F.col("tf").desc(), "term")
    a = (scored.withColumn("ra", F.row_number().over(wa))
         .filter(F.col("ra") <= RBO_K).select("source", "term", "ra"))
    b = (scored.withColumn("rb", F.row_number().over(wb))
         .filter(F.col("rb") <= RBO_K).select("source", "term", "rb"))
    contrib = (a.join(b, ["source", "term"])
               .select("source", F.explode(F.sequence(
                   F.greatest("ra", "rb"), F.lit(RBO_K))).alias("d")))
    ov = contrib.groupBy("source", "d").agg(F.count(F.lit(1)).alias("ov"))
    spine = (docs.select("source").distinct()
             .select("source", F.explode(F.sequence(
                 F.lit(1), F.lit(RBO_K))).alias("d")))
    coefs = ", ".join(str(c) for c in RBO_COEF)
    grid = (spine.join(ov, ["source", "d"], "left")
            .withColumn("ov", F.coalesce("ov", F.lit(0))))
    agg = grid.groupBy("source").agg(
        F.sum(F.expr(f"element_at(array({coefs}), d) * ov"))
        .alias("rbo_scaled"),
        F.max(F.when(F.col("d") == RBO_K, F.col("ov"))).alias("n_common"))
    return (agg.select(
        "source", "n_common",
        F.col("rbo_scaled").cast("bigint").alias("rbo_scaled"),
        # rbo_scaled * 1e6 reaches ~6e19 — past int64, so the ppm
        # normalization runs in DECIMAL(38) (DuckDB widens to HUGEINT)
        F.expr(f"cast(cast(rbo_scaled as decimal(38,0)) * 1000000"
               f" div {RBO_FULL} as bigint)").alias("rbo_ppm"))
        .orderBy("source"))


register("text_rbo_agreement", text_rbo_agreement, f"""
WITH terms AS (
    SELECT source, doc_id, t.term
    FROM documents, UNNEST({_DUCK_WORDS}) AS t(term)
    WHERE length(t.term) > 0
), tf AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms GROUP BY source, term
), df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term
), scored AS (
    SELECT tf.source, tf.term, tf.tf,
           tf.tf * CAST(ROUND((ln(CAST(
               (SELECT COUNT(*) FROM documents) AS DOUBLE))
               - ln(CAST(df.df AS DOUBLE))) * 100, 0) AS BIGINT) AS score_a
    FROM tf JOIN df USING (term)
), a AS (
    SELECT source, term, ra FROM (
        SELECT source, term, ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY score_a DESC, term) AS ra FROM scored)
    WHERE ra <= {RBO_K}
), b AS (
    SELECT source, term, rb FROM (
        SELECT source, term, ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY tf DESC, term) AS rb FROM scored)
    WHERE rb <= {RBO_K}
), contrib AS (
    SELECT a.source, u.d
    FROM a JOIN b ON a.source = b.source AND a.term = b.term,
         UNNEST(range(greatest(a.ra, b.rb), {RBO_K} + 1)) AS u(d)
), ov AS (
    SELECT source, d, CAST(COUNT(*) AS BIGINT) AS ov
    FROM contrib GROUP BY source, d
), spine AS (
    SELECT s.source, u.d
    FROM (SELECT DISTINCT source FROM documents) s,
         UNNEST(range(1, {RBO_K} + 1)) AS u(d)
), grid AS (
    SELECT sp.source, sp.d, COALESCE(ov.ov, 0) AS ov
    FROM spine sp LEFT JOIN ov ON sp.source = ov.source AND sp.d = ov.d
)
SELECT source,
       CAST(MAX(CASE WHEN d = {RBO_K} THEN ov END) AS BIGINT) AS n_common,
       CAST(SUM([{", ".join(str(c) for c in RBO_COEF)}][d] * ov)
           AS BIGINT) AS rbo_scaled,
       CAST(SUM([{", ".join(str(c) for c in RBO_COEF)}][d] * ov)
           * 1000000 // {RBO_FULL} AS BIGINT) AS rbo_ppm
FROM grid GROUP BY source ORDER BY source
""", "RBO@10 between TF-IDF and raw-frequency term rankings per source")


# ------------------------------------------------------ McNemar pairing
def langid_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between two deterministic langid
    heuristics on the SAME documents: classifier A votes by the hash
    of each word (text_langid's rule), classifier B by the hash of the
    REVERSED word — an independent same-marginal variant. The test
    statistic uses only the discordant counts b (A right, B wrong) and
    c (A wrong, B right): chi2 = (b-c)^2/(b+c). One corpus scan, one
    1-row aggregate — no shuffle carries corpus rows. The synthetic
    corpus scores at chance for both, so the expected verdict is 'no
    difference'; the operator under test is the paired-evaluation
    plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = _SPARK_WORDS
    ha = _SPARK_H.format(t="w")
    hb = _SPARK_H.format(t="reverse(w)")
    cols = []
    for tag, h in (("a", ha), ("b", hb)):
        for i, lang in enumerate(LANGS):
            cols.append(F.expr(
                f"size(filter({words}, w -> ({h}) % {len(LANGS)} = {i}))")
                .alias(f"v{tag}_{lang}"))
    df = docs.select("doc_id", "lang", *cols)
    oks = []
    for tag in ("a", "b"):
        best = F.greatest(*[F.col(f"v{tag}_{lang}") for lang in LANGS])
        pred = F.lit(None).cast("string")
        for lang in reversed(LANGS):
            pred = F.when(F.col(f"v{tag}_{lang}") == best,
                          F.lit(lang)).otherwise(pred)
        oks.append(F.when(pred == F.col("lang"), 1).otherwise(0)
                   .alias(f"ok_{tag}"))
    paired = df.select("lang", *oks)
    agg = paired.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ok_a").alias("n_a_ok"), F.sum("ok_b").alias("n_b_ok"),
        F.sum(F.expr("ok_a * ok_b")).alias("n_both"),
        F.sum(F.expr("ok_a * (1 - ok_b)")).alias("n_a_only"),
        F.sum(F.expr("(1 - ok_a) * ok_b")).alias("n_b_only"))
    return agg.select(
        "n_docs",
        F.expr("n_a_ok * 1000000 div n_docs").alias("acc_a_ppm"),
        F.expr("n_b_ok * 1000000 div n_docs").alias("acc_b_ppm"),
        "n_both", "n_a_only", "n_b_only",
        F.expr("n_docs - n_both - n_a_only - n_b_only").alias("n_neither"),
        F.expr("round(cast((n_a_only - n_b_only) * (n_a_only - n_b_only)"
               " as double) / nullif(n_a_only + n_b_only, 0), 4) + 0.0")
        .alias("mcnemar_chi2"))


def _mcnemar_oracle() -> str:
    ha = _DUCK_H.format(t="w")
    hb = _DUCK_H.format(t="reverse(w)")
    votes = []
    for tag, h in (("a", ha), ("b", hb)):
        for i, lang in enumerate(LANGS):
            votes.append(
                f"len(list_filter({_DUCK_WORDS}, "
                f"w -> ({h}) % {len(LANGS)} = {i})) AS v{tag}_{lang}")
    preds = []
    for tag in ("a", "b"):
        g = ", ".join(f"v{tag}_{x}" for x in LANGS)
        case = "CASE "
        for lang in LANGS:
            case += (f"WHEN v{tag}_{lang} = greatest({g})"
                     f" THEN '{lang}' ")
        case += "END"
        preds.append(f"CASE WHEN ({case}) = lang THEN 1 ELSE 0 END"
                     f" AS ok_{tag}")
    return f"""
WITH votes AS (
    SELECT doc_id, lang,
           {", ".join(votes)}
    FROM documents
), paired AS (
    SELECT {", ".join(preds)} FROM votes
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ok_a) AS BIGINT) AS n_a_ok,
           CAST(SUM(ok_b) AS BIGINT) AS n_b_ok,
           CAST(SUM(ok_a * ok_b) AS BIGINT) AS n_both,
           CAST(SUM(ok_a * (1 - ok_b)) AS BIGINT) AS n_a_only,
           CAST(SUM((1 - ok_a) * ok_b) AS BIGINT) AS n_b_only
    FROM paired
)
SELECT n_docs,
       n_a_ok * 1000000 // n_docs AS acc_a_ppm,
       n_b_ok * 1000000 // n_docs AS acc_b_ppm,
       n_both, n_a_only, n_b_only,
       n_docs - n_both - n_a_only - n_b_only AS n_neither,
       ROUND(CAST((n_a_only - n_b_only) * (n_a_only - n_b_only) AS DOUBLE)
             / NULLIF(n_a_only + n_b_only, 0), 4) + 0.0 AS mcnemar_chi2
FROM agg
"""


register("langid_mcnemar", langid_mcnemar, _mcnemar_oracle(),
         "McNemar paired test between two langid heuristics")


# --------------------------------------------------- MDE / power analysis
def events_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment power analysis per event type: with the observed
    traffic share p as the baseline and the observed volume split
    50/50 into two arms, the minimum detectable absolute effect at
    alpha=5% two-sided / 80% power, and the per-arm sample size needed
    to detect a 5% RELATIVE lift. Closed-form normal approximation:
    mde = (z_a + z_b) * sqrt(2 p (1-p) / n_arm). The only corpus work
    is one count-by-type; the z constants are double literals summed
    identically on both engines (double-literal house rule), and the
    final columns quantize through one deterministic ROUND each."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("x"))
    tot = per.agg(F.sum("x").alias("n"))
    zsum = "(1.959964D + 0.841621D)"
    p = "(cast(x as double) / n)"
    return (per.crossJoin(F.broadcast(tot))
            .select(
                "event_type", "x", "n",
                F.expr("x * 1000000 div n").alias("share_ppm"),
                F.expr(f"cast(round({zsum} * sqrt(2.0D * {p} * (1.0D - {p})"
                       " / (n div 2)) * 1000000.0D, 0) as bigint)")
                .alias("mde_abs_ppm"),
                F.expr(f"cast(ceil(2.0D * (1.0D - {p}) / {p}"
                       f" * {zsum} * {zsum} / 0.0025D) as bigint)")
                .alias("n_req_rel5"))
            .orderBy("event_type"))


register("events_mde_power", events_mde_power, """
WITH per AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY event_type
), tot AS (
    SELECT CAST(SUM(x) AS BIGINT) AS n FROM per
)
SELECT event_type, x, n,
       x * 1000000 // n AS share_ppm,
       CAST(ROUND((1.959964e0 + 0.841621e0)
            * SQRT(2.0e0 * (CAST(x AS DOUBLE) / n)
                   * (1.0e0 - CAST(x AS DOUBLE) / n) / (n // 2))
            * 1000000.0e0, 0) AS BIGINT) AS mde_abs_ppm,
       CAST(CEIL(2.0e0 * (1.0e0 - CAST(x AS DOUBLE) / n)
            / (CAST(x AS DOUBLE) / n)
            * (1.959964e0 + 0.841621e0) * (1.959964e0 + 0.841621e0)
            / 0.0025e0) AS BIGINT) AS n_req_rel5
FROM per CROSS JOIN tot ORDER BY event_type
""", "minimum detectable effect + required n per arm, per event type")


# ------------------------------------------------------- linear CKA
HALF = DIM // 2


def emb_cka_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA between the first and second halves of the embedding
    space — the representation-redundancy audit: CKA near 1 means the
    two halves encode the same geometry (dimensionality is wasted),
    near 0 means they are complementary. CKA(A,B) = ||C_AB||_F^2 /
    (||C_AA||_F ||C_BB||_F) over centered cross-moments. Sufficient
    statistics are the emb_covariance discipline exactly: integer Gram
    partials over floor(x * 1024) (power-of-two, exact), so the
    centered numerators nc_ij = n * s_ij - s_i * s_j and all three
    Frobenius sums are EXACT integers (DECIMAL(38)/HUGEINT); only the
    final ratio is floating point, one identical expression tree on
    both engines. The n^2 and Q^4 scale factors cancel in the ratio.
    Shuffle traffic is d^2 bigint partials per Arrow batch; the cell
    grid (2,080 rows) is model-size. Overflow ladder: nc^2 <= (n^2 *
    d * (0.5 * Q_SCALE)^2)^2 stays inside DECIMAL(38) to n ~ 3e7 rows;
    past that re-quantize the Gram to deci-bits (SCALE.md)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        iu = np.triu_indices(DIM)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xq = np.floor(x * Q_SCALE).astype(np.int64)
            g = xq.T @ xq
            yield pd.DataFrame({
                "i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                "s": g[iu]})

    gram = (emb.mapInPandas(gram_partials, "i int, j int, s long")
            .groupBy("i", "j").agg(F.sum("s").alias("s_ij")))
    xq = F.floor(F.col("x").cast("double") * Q_SCALE).cast("long")
    stats = (emb.select(F.posexplode("embedding").alias("i", "x"))
             .groupBy("i")
             .agg(F.sum(xq).alias("s"), F.count(F.lit(1)).alias("n")))
    sa = stats.select("i", F.col("s").alias("s_i"), "n")
    sb = stats.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    cells = (gram.join(F.broadcast(sa), "i").join(F.broadcast(sb), "j")
             .withColumn("nc", F.expr(
                 "cast(n as decimal(38,0)) * s_ij"
                 " - cast(s_i as decimal(38,0)) * s_j"))
             .withColumn("w", F.when(F.col("i") == F.col("j"), 1)
                         .otherwise(2))
             .withColumn("blk", F.when(F.col("j") < HALF, "aa")
                         .when(F.col("i") >= HALF, "bb")
                         .otherwise("ab")))
    # triu covers each off-diagonal cell of the symmetric AA/BB blocks
    # once (weight 2 restores the full F-norm); every AB rectangle
    # cell has i < HALF <= j, so it appears exactly once (weight 1).
    agg = cells.agg(
        F.max("n").alias("n"), F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.expr("case when blk = 'ab' then nc * nc"
                     " else cast(0 as decimal(38,0)) end")).alias("fab"),
        F.sum(F.expr("case when blk = 'aa' then w * nc * nc"
                     " else cast(0 as decimal(38,0)) end")).alias("faa"),
        F.sum(F.expr("case when blk = 'bb' then w * nc * nc"
                     " else cast(0 as decimal(38,0)) end")).alias("fbb"))
    return agg.select(
        "n", "n_cells",
        F.expr("round(cast(fab as double)"
               " / sqrt(cast(faa as double) * cast(fbb as double)), 6)"
               " + 0.0").alias("cka"))


register("emb_cka_alignment", emb_cka_alignment, f"""
WITH idx AS (
    SELECT UNNEST(range(1, {DIM} + 1)) AS k
), ex AS (
    SELECT vec_id, k - 1 AS i,
           CAST(FLOOR(CAST(embedding[k] AS DOUBLE) * {Q_SCALE}) AS BIGINT)
               AS xq
    FROM embeddings CROSS JOIN idx
), gram AS (
    SELECT a.i AS i, b.i AS j, SUM(a.xq * b.xq) AS s_ij
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
), stats AS (
    SELECT i, SUM(xq) AS s, COUNT(*) AS n FROM ex GROUP BY i
), cells AS (
    SELECT g.i, g.j,
           CAST(sa.n AS HUGEINT) * g.s_ij
               - CAST(sa.s AS HUGEINT) * sb.s AS nc,
           CASE WHEN g.i = g.j THEN 1 ELSE 2 END AS w,
           CASE WHEN g.j < {HALF} THEN 'aa'
                WHEN g.i >= {HALF} THEN 'bb'
                ELSE 'ab' END AS blk,
           sa.n AS n
    FROM gram g JOIN stats sa ON g.i = sa.i JOIN stats sb ON g.j = sb.i
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(CASE WHEN blk = 'ab' THEN nc * nc
                           ELSE CAST(0 AS HUGEINT) END) AS DOUBLE)
             / SQRT(CAST(SUM(CASE WHEN blk = 'aa' THEN w * nc * nc
                                  ELSE CAST(0 AS HUGEINT) END) AS DOUBLE)
                    * CAST(SUM(CASE WHEN blk = 'bb' THEN w * nc * nc
                                    ELSE CAST(0 AS HUGEINT) END)
                           AS DOUBLE)), 6) + 0.0 AS cka
FROM cells
""", "linear CKA alignment between the two embedding-space halves")


# ------------------------------------------------- Neyman allocation
NEYMAN_BUDGET = 10_000


def source_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman) allocation of a fixed audit/labeling budget of
    {budget} documents across sources: n_h proportional to N_h * S_h,
    with S_h the per-source sample sd of document token counts — the
    design that minimizes the variance of the corpus-mean estimate at
    fixed budget. Exact integer sufficient statistics (n, sum x,
    sum x^2) per source; each stratum weight quantizes through ONE
    deterministic round (centi-weight), after which the allocation is
    exact integer arithmetic — the share denominator is a sum of
    integers, not floats, so partition order cannot move a value. One
    corpus scan, dimension-size everything after."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.expr(f"size({_SPARK_WORDS})")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).alias("sx"),
        F.sum(nt * nt).alias("sxx"))
    sd = ("sqrt((cast(n_docs as double) * sxx - cast(sx as double) * sx)"
          " / (cast(n_docs as double) * (n_docs - 1)))")
    wc = per.withColumn("w_centi", F.expr(
        f"cast(round(n_docs * {sd} * 100.0D, 0) as bigint)"))
    tot = wc.agg(F.sum("w_centi").alias("w_tot"))
    return (wc.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    F.col("sx").alias("total_tokens"),
                    (F.round(F.expr(sd), 4) + 0.0).alias("sd_tokens"),
                    "w_centi",
                    F.expr("w_centi * 1000000 div w_tot").alias("alloc_ppm"),
                    F.expr(f"{NEYMAN_BUDGET} * w_centi div w_tot")
                    .alias("alloc_docs"))
            .orderBy("source"))


source_neyman_allocation.__doc__ = source_neyman_allocation.__doc__.format(
    budget=NEYMAN_BUDGET)


register("source_neyman_allocation", source_neyman_allocation, f"""
WITH per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_DUCK_WORDS})) AS BIGINT) AS sx,
           CAST(SUM(len({_DUCK_WORDS}) * len({_DUCK_WORDS})) AS BIGINT)
               AS sxx
    FROM documents GROUP BY source
), wc AS (
    SELECT *,
           CAST(ROUND(n_docs * SQRT((CAST(n_docs AS DOUBLE) * sxx
                    - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n_docs AS DOUBLE) * (n_docs - 1)))
                * 100.0e0, 0) AS BIGINT) AS w_centi
    FROM per
), tot AS (
    SELECT CAST(SUM(w_centi) AS BIGINT) AS w_tot FROM wc
)
SELECT source, n_docs, sx AS total_tokens,
       ROUND(SQRT((CAST(n_docs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             / (CAST(n_docs AS DOUBLE) * (n_docs - 1))), 4) + 0.0
           AS sd_tokens,
       w_centi,
       w_centi * 1000000 // w_tot AS alloc_ppm,
       {NEYMAN_BUDGET} * w_centi // w_tot AS alloc_docs
FROM wc CROSS JOIN tot ORDER BY source
""", "Neyman-optimal audit-budget allocation across sources")


# --------------------------------------- difference-in-differences
from .monitor_eval import _ha_sql as _did_ha  # noqa: E402

DID_ZCRIT_MICRO = 1_959_964  # two-sided z at alpha = 0.05, micro


def orders_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the workhorse causal
    design for before/after x treated/control panels: treated =
    urgent/high-priority orders, the period split is the date-range
    midpoint, outcome is order value in exact integer cents. The
    estimate is (T_post - T_pre) - (C_post - C_pre) on cell means,
    its large-sample SE is sqrt(sum var_g/n_g) over the four cells,
    and the z decision compares a micro-quantized statistic against a
    pre-quantized critical constant. One scan reduces the fact table
    to four cells of exact (n, sum, sum-of-squares); everything after
    is constant-size arithmetic."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("cast(o_orderpriority in ('1-URGENT', '2-HIGH') as int)")
        .alias("treated"),
        F.expr("cast(unix_micros(cast(o_orderdate as timestamp))"
               " as bigint)").alias("us"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    rng = o.agg(F.expr("(min(us) + max(us)) div 2").alias("mid"))
    cells = (o.crossJoin(F.broadcast(rng))
             .withColumn("post", F.expr("cast(us > mid as int)"))
             .groupBy("treated", "post")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("cents").alias("s"),
                  F.sum(F.expr("cents * cents")).alias("q")))
    picks = []
    for t in (0, 1):
        for p in (0, 1):
            for col in ("n", "s", "q"):
                picks.append(F.max(F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col(col))).alias(f"{col}{t}{p}"))
    wide = cells.agg(*picks)
    mean = {f"{t}{p}": f"(cast(s{t}{p} as double) / n{t}{p})"
            for t in (0, 1) for p in (0, 1)}
    var_over_n = " + ".join(
        f"((cast(n{t}{p} as double) * q{t}{p}"
        f" - cast(s{t}{p} as double) * s{t}{p})"
        f" / (cast(n{t}{p} as double) * (n{t}{p} - 1.0) * n{t}{p}))"
        for t in (0, 1) for p in (0, 1))
    did = (f"(({mean['11']} - {mean['10']})"
           f" - ({mean['01']} - {mean['00']}))")
    z = f"({did}) / sqrt({var_over_n}) * 1e6"
    return (wide.select(
        *[F.col(f"n{t}{p}") for t in (0, 1) for p in (0, 1)],
        F.expr(_did_ha(f"{did} * 10")).alias("did_milli_cents"),
        F.expr(_did_ha(f"sqrt({var_over_n}) * 10"))
        .alias("se_milli_cents"),
        F.expr(_did_ha(z)).alias("z_micro"),
        F.expr(f"cast(abs({_did_ha(z)}) > {DID_ZCRIT_MICRO} as int)")
        .alias("significant")))


def _did_oracle() -> str:
    mean = {f"{t}{p}": f"(CAST(s{t}{p} AS DOUBLE) / n{t}{p})"
            for t in (0, 1) for p in (0, 1)}
    var_over_n = " + ".join(
        f"((CAST(n{t}{p} AS DOUBLE) * q{t}{p}"
        f" - CAST(s{t}{p} AS DOUBLE) * s{t}{p})"
        f" / (CAST(n{t}{p} AS DOUBLE) * (n{t}{p} - 1.0) * n{t}{p}))"
        for t in (0, 1) for p in (0, 1))
    did = (f"(({mean['11']} - {mean['10']})"
           f" - ({mean['01']} - {mean['00']}))")
    z = f"({did}) / sqrt({var_over_n}) * 1e6"
    picks = ", ".join(
        f"CAST(MAX(CASE WHEN treated = {t} AND post = {p}"
        f" THEN {col} END) AS BIGINT) AS {col}{t}{p}"
        for t in (0, 1) for p in (0, 1) for col in ("n", "s", "q"))
    ncols = ", ".join(f"n{t}{p}" for t in (0, 1) for p in (0, 1))
    return f"""
WITH o AS (
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END AS treated,
           CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
               AS us,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
), rng AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM o),
cells AS (
    SELECT treated, CASE WHEN us > mid THEN 1 ELSE 0 END AS post,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS s,
           CAST(SUM(cents * cents) AS BIGINT) AS q
    FROM o CROSS JOIN rng GROUP BY 1, 2
), wide AS (
    SELECT {picks} FROM cells
)
SELECT {ncols},
       {_did_ha(f"{did} * 10")} AS did_milli_cents,
       {_did_ha(f"sqrt({var_over_n}) * 10")} AS se_milli_cents,
       {_did_ha(z)} AS z_micro,
       CAST(CASE WHEN ABS({_did_ha(z)}) > {DID_ZCRIT_MICRO}
            THEN 1 ELSE 0 END AS INT) AS significant
FROM wide
"""


register("orders_diff_in_diff", orders_diff_in_diff, _did_oracle(),
         "difference-in-differences on priority/period order values")
