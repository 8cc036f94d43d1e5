"""Round-8 wave 2: IR scoring and corpus-linguistics operators over
the documents table — the retrieval / tokenizer-training / split-audit
layer of an LLM data pipeline.

- BM25 top-k: Okapi BM25 relevance for a fixed query-term set. The
  per-term postings join is keyed on the (3-term) query vocabulary and
  corpus statistics attach as broadcast 1-row aggregates; per-doc term
  scores quantize to nano-units so the <=3-term per-doc sum is exact.
- BPE merge candidates: the inner loop of byte-pair-encoding tokenizer
  training — corpus-weighted adjacent character-pair counts. Pair
  explosion runs over the DISTINCT word vocabulary (weighted by word
  frequency), so the fan-out is vocabulary-sized, not corpus-sized —
  exactly how you'd run one BPE merge round at 100 TB.
- Unigram cross-entropy: train/validation split by doc id residue,
  add-one-smoothed unigram LM fit on train, exact nano-quantized
  cross-entropy + OOV ppm per validation source — the cheap perplexity
  proxy for corpus-quality comparisons between sources.
- Heaps' law fit: vocabulary-growth exponent via first-occurrence
  counting. Each token's first document comes from a vocabulary-keyed
  MIN; documents fold into 64 id-range buckets so the cumulative
  (tokens, types) curve and its log-log OLS run on a 64-row bounded
  domain — no per-document total order anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# ------------------------------------------------------- BM25 top-k
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "hash", "vector")
BM25_TOP_K = 20


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for the fixed query {join, hash,
    vector}: idf_t = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)), per-doc
    term score idf * tf(k1+1)/(tf + k1(1-b+b*dl/avgdl)). tf/dl/df/N
    are exact integers off one token explode (the tf aggregate is
    pre-filtered to the query vocabulary, so its domain is docs-with-
    hits x 3); avgdl and the score are float evaluations on those
    integers, nano-quantized per term so the per-doc sum is order-free.
    Ranking is top-K on the rounded score — TakeOrdered, no global
    sort at any scale."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.expr("split(lower(text), ' ')").alias("w")))
    dl = toks.select("doc_id", F.expr("size(w)").alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("n_toks"))
    hits = (toks.select("doc_id", F.explode("w").alias("t"))
            .filter(F.col("t").isin(*BM25_TERMS))
            .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf")))
    df_t = hits.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = ("ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))")
    term_nano = (f"cast(round({idf} * tf * ({BM25_K1} + 1.0)"
                 f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
                 f" + {BM25_B} * dl * cast(n_docs as double) / n_toks))"
                 " * 1e9) as bigint)")
    scored = (hits.join(F.broadcast(df_t), "t")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .groupBy("doc_id")
              .agg(F.sum(F.expr(term_nano)).alias("score_nano"),
                   F.count(F.lit(1)).alias("n_terms"),
                   F.sum("tf").alias("tf_total")))
    return (scored.select("doc_id", "n_terms", "tf_total",
                          (F.round(F.col("score_nano") / 1e9, 6) + 0.0)
                          .alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(BM25_TOP_K))


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

register("text_bm25_topk", text_bm25_topk, f"""
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), dl AS (
    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks
), corpus AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl
), hits AS (
    SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, UNNEST(w) AS t FROM toks) u
    WHERE t IN ({_TERMS_SQL})
    GROUP BY doc_id, t
), df_t AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY t
), scored AS (
    SELECT h.doc_id,
           CAST(SUM(CAST(ROUND(
               LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ({BM25_K1} + 1.0)
               / (tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * d.dl * CAST(n_docs AS DOUBLE) / n_toks))
               * 1e9) AS BIGINT)) AS BIGINT) AS score_nano,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS tf_total
    FROM hits h JOIN df_t USING (t) JOIN dl d ON h.doc_id = d.doc_id
    CROSS JOIN corpus
    GROUP BY h.doc_id
)
SELECT doc_id, n_terms, tf_total,
       ROUND(score_nano / 1e9, 6) + 0.0 AS bm25
FROM scored ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
""", "Okapi BM25 top-k for a fixed query term set")


# ------------------------------------------- BPE merge candidates
BPE_TOP_K = 30


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of BPE tokenizer-training pair counting: the top-30
    adjacent character pairs by corpus-weighted frequency. The corpus
    reduces ONCE to (word, count) — a vocabulary-keyed aggregate —
    and the character-pair fan-out explodes only the DISTINCT words,
    each pair carrying the word's corpus count; at 100 TB the explode
    input is the vocabulary (millions of rows), not the token stream
    (trillions). Pure built-in expressions; top-K with a deterministic
    pair tiebreak."""
    vocab = (load_table(spark, sf_dir, "documents")
             .select(F.explode(F.expr("split(lower(text), ' ')"))
                     .alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("c")))
    pairs = (vocab.filter(F.length("word") >= 2)
             .select("c", F.explode(F.expr(
                 "transform(sequence(1, length(word) - 1),"
                 " i -> substring(word, i, 2))")).alias("pair"))
             .groupBy("pair").agg(F.sum("c").alias("cnt")))
    return pairs.orderBy(F.col("cnt").desc(), "pair").limit(BPE_TOP_K)


register("bpe_merge_candidates", bpe_merge_candidates, f"""
WITH vocab AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS word
          FROM documents) u
    GROUP BY word
), pairs AS (
    SELECT substr(word, CAST(i AS INT), 2) AS pair,
           CAST(SUM(c) AS BIGINT) AS cnt
    FROM vocab, UNNEST(range(1, length(word))) AS g(i)
    WHERE length(word) >= 2
    GROUP BY 1
)
SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair LIMIT {BPE_TOP_K}
""", "corpus-weighted adjacent char-pair counts (one BPE merge round)")


# ------------------------------------- unigram cross-entropy by split
# the SAME multiplicative-hash fold as fold_balance_audit — imported,
# not re-declared, so the balance audit always audits THIS split
from .spectral_info import FOLD_MOD as XENT_MOD  # noqa: E402
from .spectral_info import FOLD_MULT as XENT_MULT  # noqa: E402
from .spectral_info import N_FOLDS as XENT_FOLDS  # noqa: E402
# validation = hash-fold 0. A plain doc_id % 5 residue split CORRELATES
# with the fixture's id-derived source assignment (only 4 of 20 sources
# would ever reach validation) — the exact split bug fold_balance_audit
# exists to catch; the multiplicative hash decorrelates it.
_XENT_FOLD = f"(doc_id * {XENT_MULT}) % {XENT_MOD} % {XENT_FOLDS}"


def unigram_crossentropy_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed unigram LM cross-entropy of each validation
    source against the training split (id-hash fold != 0): the cheap
    perplexity proxy for ranking sources by distributional fit.
    p(t) = (c_t + 1)/(N + V + 1), unseen tokens get 1/(N + V + 1).
    Token aggregates are vocabulary-keyed; the LM attaches to the
    validation vocabulary by a vocab-vocab left join; ln p quantizes
    to nano-units per DISTINCT token before multiplying by the exact
    validation count, so the per-source sum is exact integer
    arithmetic. Output: tokens, OOV ppm, cross-entropy (nats/token)
    per source."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.explode(F.expr("split(lower(text), ' ')")).alias("t")))
    train = toks.filter(F.expr(f"{_XENT_FOLD} != 0"))
    val = toks.filter(F.expr(f"{_XENT_FOLD} = 0"))
    lm = train.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    lm_tot = lm.agg(F.sum("c").alias("n_train"),
                    F.count(F.lit(1)).alias("v_train"))
    vc = val.groupBy("source", "t").agg(F.count(F.lit(1)).alias("cnt"))
    lp = ("cast(round(ln((coalesce(c, 0) + 1.0) / (n_train + v_train + 1.0))"
          " * 1e9) as bigint)")
    per_src = (vc.join(lm, "t", "left")
               .crossJoin(F.broadcast(lm_tot))
               .groupBy("source")
               .agg(F.sum("cnt").alias("n_tokens"),
                    F.sum(F.when(F.col("c").isNull(), F.col("cnt"))
                          .otherwise(F.lit(0))).alias("n_oov"),
                    F.sum(F.expr(lp) * F.col("cnt")).alias("lp_nano")))
    return (per_src.select(
        "source", "n_tokens",
        F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        (F.round(-F.col("lp_nano") / (F.lit(1e9) * F.col("n_tokens")), 6)
         + 0.0).alias("xent_nats"))
        .orderBy("source"))


register("unigram_crossentropy_split", unigram_crossentropy_split, f"""
WITH toks AS (
    SELECT doc_id, source, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), lm AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks WHERE {_XENT_FOLD} != 0 GROUP BY t
), lm_tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS v_train FROM lm
), vc AS (
    SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks WHERE {_XENT_FOLD} = 0 GROUP BY 1, 2
), per_src AS (
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN lm.c IS NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CAST(ROUND(LN((COALESCE(lm.c, 0) + 1.0)
                    / (n_train + v_train + 1.0)) * 1e9) AS BIGINT) * cnt)
           AS BIGINT) AS lp_nano
    FROM vc LEFT JOIN lm USING (t) CROSS JOIN lm_tot
    GROUP BY source
)
SELECT source, n_tokens,
       n_oov * 1000000 // n_tokens AS oov_ppm,
       ROUND(-lp_nano / (1e9 * n_tokens), 6) + 0.0 AS xent_nats
FROM per_src ORDER BY source
""", "add-one unigram LM cross-entropy + OOV ppm per validation source")


# ------------------------------------------------- Heaps' law fit
HEAPS_BUCKETS = 64


def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law exponent (V ~ k N^beta) for the corpus: each token's
    FIRST document comes from a vocabulary-keyed MIN (no corpus-order
    scan); documents fold into 64 id-range buckets (broadcast min/max,
    integer bucketing), so the cumulative (tokens, types) growth curve
    is 64 points and the log-log OLS runs on that bounded domain. The
    log points quantize to nano-units and the normal-equation sums
    accumulate as DECIMAL(38,0)/HUGEINT (x_nano ~ 2e10 -> xy ~ 4e20
    overflows int64 immediately — the accumulator is sized for it);
    slope/intercept are one float finish. Output: one row with the
    fitted beta, ln k, and the corpus totals."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.explode(F.expr("split(lower(text), ' ')"))
                    .alias("t")))
    rng = toks.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
    bucket = F.expr(f"((doc_id - mn) * {HEAPS_BUCKETS}) div (mx - mn + 1)")
    wt = toks.crossJoin(F.broadcast(rng))
    toks_b = (wt.groupBy(bucket.alias("b"))
              .agg(F.count(F.lit(1)).alias("toks")))
    first = (wt.groupBy("t")
             .agg(F.min(bucket).alias("b")))
    types_b = first.groupBy("b").agg(F.count(F.lit(1)).alias("types"))
    w = (Window.orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pts = (toks_b.join(types_b, "b", "left")
           .select("b", F.sum("toks").over(w).alias("cum_toks"),
                   F.sum(F.coalesce(F.col("types"), F.lit(0))).over(w)
                   .alias("cum_types"))
           .select(
               F.expr("cast(round(ln(cum_toks) * 1e9) as bigint)").alias("x"),
               F.expr("cast(round(ln(cum_types) * 1e9) as bigint)").alias("y"),
               "cum_toks", "cum_types"))
    suff = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x").cast("decimal(38,0)")
               * F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)"))
        .alias("sxy"),
        F.sum((F.col("x").cast("decimal(38,0)")
               * F.col("x").cast("decimal(38,0)")).cast("decimal(38,0)"))
        .alias("sxx"),
        F.max("cum_toks").alias("total_tokens"),
        F.max("cum_types").alias("total_types"))
    beta = ("(cast(n as double) * cast(sxy as double)"
            " - cast(sx as double) * cast(sy as double))"
            " / (cast(n as double) * cast(sxx as double)"
            " - cast(sx as double) * cast(sx as double))")
    return suff.select(
        F.col("n").alias("n_buckets"), "total_tokens", "total_types",
        (F.round(F.expr(beta), 6) + 0.0).alias("heaps_beta"),
        (F.round(F.expr(f"(cast(sy as double) - ({beta})"
                        f" * cast(sx as double)) / n") / 1e9, 6) + 0.0)
        .alias("heaps_ln_k"))


register("heaps_law_fit", heaps_law_fit, f"""
WITH toks AS (
    SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), rng AS (
    SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM toks
), wt AS (
    SELECT ((doc_id - mn) * {HEAPS_BUCKETS}) // (mx - mn + 1) AS b, t
    FROM toks CROSS JOIN rng
), toks_b AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS toks FROM wt GROUP BY b
), first AS (
    SELECT t, MIN(b) AS b FROM wt GROUP BY t
), types_b AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS types FROM first GROUP BY b
), pts AS (
    SELECT CAST(ROUND(LN(SUM(toks) OVER (ORDER BY tb.b)) * 1e9) AS BIGINT)
               AS x,
           CAST(ROUND(LN(SUM(COALESCE(types, 0)) OVER (ORDER BY tb.b))
                      * 1e9) AS BIGINT) AS y,
           SUM(toks) OVER (ORDER BY tb.b) AS cum_toks,
           SUM(COALESCE(types, 0)) OVER (ORDER BY tb.b) AS cum_types
    FROM toks_b tb LEFT JOIN types_b ty ON tb.b = ty.b
), suff AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           CAST(MAX(cum_toks) AS BIGINT) AS total_tokens,
           CAST(MAX(cum_types) AS BIGINT) AS total_types
    FROM pts
)
SELECT n AS n_buckets, total_tokens, total_types,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
           AS heaps_beta,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / n / 1e9, 6) + 0.0 AS heaps_ln_k
FROM suff
""", "Heaps' law vocabulary-growth exponent over 64 id-range buckets")


# ---------------------------------------- per-doc perplexity filter
# keep docs at or below this add-one unigram cross-entropy (nats,
# nano-quantized); sits just above the fixture median so both outcomes
# occur at every scale factor
PPL_XENT_MAX_NANO = 3_402_000_000


def doc_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering audit: score every document
    under the corpus's own add-one-smoothed unigram LM (the cheap
    stand-in for an external 5-gram LM), keep docs whose per-token
    cross-entropy is at or below PPL_XENT_MAX_NANO, and report the
    keep rate and kept-vs-dropped entropy means per source. ln p
    quantizes to nano-units per DISTINCT vocabulary token (one LM
    row per type, not per occurrence), the per-doc sum is exact
    integer, and the per-doc entropy is an integer division — so the
    filter decision is bit-identical cross-engine. Shuffle keys are
    vocabulary then doc_id; sources aggregate at the end."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.explode(F.expr("split(lower(text), ' ')")).alias("t")))
    lm = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    lm_tot = lm.agg(F.sum("c").alias("n_corpus"),
                    F.count(F.lit(1)).alias("v_corpus"))
    dc = toks.groupBy("doc_id", "source", "t").agg(
        F.count(F.lit(1)).alias("cnt"))
    lp = ("cast(round(ln((c + 1.0) / (n_corpus + v_corpus + 1.0))"
          " * 1e9) as bigint)")
    per_doc = (dc.join(lm, "t")
               .crossJoin(F.broadcast(lm_tot))
               .groupBy("doc_id", "source")
               .agg(F.sum("cnt").alias("n_tok"),
                    F.sum(F.expr(lp) * F.col("cnt")).alias("lp_nano"))
               .withColumn("xent_nano", F.expr("-lp_nano div n_tok"))
               .withColumn("keep", F.expr(
                   f"case when xent_nano <= {PPL_XENT_MAX_NANO}"
                   " then 1 else 0 end")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("keep").alias("n_kept"),
                 F.sum(F.expr("case when keep = 1 then xent_nano end"))
                 .alias("_kept_nano"),
                 F.sum(F.expr("case when keep = 0 then xent_nano end"))
                 .alias("_drop_nano"))
            .select(
                "source", "n_docs", "n_kept",
                F.expr("n_kept * 1000000 div n_docs").alias("kept_ppm"),
                F.expr("case when n_kept > 0 then _kept_nano div n_kept end")
                .alias("kept_mean_xent_nano"),
                F.expr("case when n_docs > n_kept then"
                       " _drop_nano div (n_docs - n_kept) end")
                .alias("drop_mean_xent_nano"))
            .orderBy("source"))


register("doc_perplexity_filter", doc_perplexity_filter, f"""
WITH toks AS (
    SELECT doc_id, source, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), lm AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY t
), lm_tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n_corpus,
           CAST(COUNT(*) AS BIGINT) AS v_corpus FROM lm
), dc AS (
    SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY 1, 2, 3
), per_doc AS (
    SELECT doc_id, source,
           CAST(SUM(cnt) AS BIGINT) AS n_tok,
           CAST(SUM(CAST(ROUND(LN((lm.c + 1.0)
                / (n_corpus + v_corpus + 1.0)) * 1e9) AS BIGINT) * cnt)
            AS BIGINT) AS lp_nano
    FROM dc JOIN lm USING (t) CROSS JOIN lm_tot
    GROUP BY 1, 2
), flagged AS (
    SELECT source, -lp_nano // n_tok AS xent_nano,
           CASE WHEN -lp_nano // n_tok <= {PPL_XENT_MAX_NANO}
                THEN 1 ELSE 0 END AS keep
    FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(keep) * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm,
       CAST(CASE WHEN SUM(keep) > 0 THEN
            SUM(CASE WHEN keep = 1 THEN xent_nano END) // SUM(keep) END
           AS BIGINT) AS kept_mean_xent_nano,
       CAST(CASE WHEN COUNT(*) > SUM(keep) THEN
            SUM(CASE WHEN keep = 0 THEN xent_nano END)
            // (COUNT(*) - SUM(keep)) END
           AS BIGINT) AS drop_mean_xent_nano
FROM flagged GROUP BY source ORDER BY source
""", "per-doc unigram-LM perplexity filter with keep-rate audit")


# ---------------------------------------------- RAKE keyword extract
from .text import STOPWORDS as RAKE_STOPS  # noqa: E402

RAKE_MAXLEN = 4   # drop runaway phrases (docs with no stopwords)
RAKE_TOPK = 3


def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (rapid automatic keyword extraction) per source: candidate
    phrases are maximal stopword-free token runs (capped at
    RAKE_MAXLEN — the cap is part of the operator, mirrored in the
    oracle), each word scores degree/freq over all phrase occurrences
    (degree = sum of lengths of phrases it appears in), and a phrase
    scores the sum of its member word scores; top-RAKE_TOPK phrases
    per source. Scale shape: phrase ids come from a per-doc cumsum
    (doc-local window), word stats shuffle on the vocabulary, and the
    final rank is per-source top-k over deduplicated phrase text.
    Scores are integer ppm (degree * 1e6 div freq), so ranking ties
    break identically cross-engine."""
    stop_list = ", ".join(f"'{w}'" for w in RAKE_STOPS)
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.posexplode(F.expr("split(lower(text), ' ')"))
                    .alias("pos", "t")))
    marked = toks.withColumn(
        "is_stop", F.expr(f"cast(t in ({stop_list}) as int)"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    ph = (marked.withColumn("phrase_id", F.sum("is_stop").over(wdoc))
          .filter(F.col("is_stop") == 0)
          .select("doc_id", "source", "phrase_id", "pos", "t"))
    plen = ph.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("plen"))
    members = (ph.join(plen, ["doc_id", "phrase_id"])
               .filter(F.col("plen") <= RAKE_MAXLEN))
    wstats = (members.groupBy("t")
              .agg(F.count(F.lit(1)).alias("freq"),
                   F.sum("plen").alias("degree"))
              .withColumn("wscore_ppm",
                          F.expr("degree * 1000000 div freq")))
    phrases = (members.join(wstats.select("t", "wscore_ppm"), "t")
               .groupBy("doc_id", "source", "phrase_id")
               .agg(F.expr("concat_ws(' ', transform(sort_array("
                           "collect_list(struct(pos, t))), x -> x.t))")
                    .alias("phrase"),
                    F.sum("wscore_ppm").alias("score_ppm")))
    per = phrases.groupBy("source", "phrase").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.max("score_ppm").alias("score_ppm"))
    wr = Window.partitionBy("source").orderBy(
        F.col("score_ppm").desc(), "phrase")
    return (per.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= RAKE_TOPK)
            .select("source", "rank", "phrase", "score_ppm", "n_occ")
            .orderBy("source", "rank"))


register("text_keyword_rake", text_keyword_rake, f"""
WITH toks AS (
    SELECT doc_id, source, UNNEST(string_split(lower(text), ' ')) AS t,
           UNNEST(range(len(string_split(lower(text), ' ')))) AS pos
    FROM documents
), marked AS (
    SELECT *, CASE WHEN t IN ({", ".join(f"'{w}'" for w in RAKE_STOPS)})
                   THEN 1 ELSE 0 END AS is_stop
    FROM toks
), ph AS (
    SELECT doc_id, source,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
               AS phrase_id,
           pos, t
    FROM marked QUALIFY is_stop = 0
), plen AS (
    SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen
    FROM ph GROUP BY 1, 2
), members AS (
    SELECT ph.*, plen.plen FROM ph JOIN plen USING (doc_id, phrase_id)
    WHERE plen <= {RAKE_MAXLEN}
), wstats AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(plen) AS BIGINT) AS degree
    FROM members GROUP BY t
), phrases AS (
    SELECT m.doc_id, m.source, m.phrase_id,
           STRING_AGG(m.t, ' ' ORDER BY m.pos) AS phrase,
           CAST(SUM(w.degree * 1000000 // w.freq) AS BIGINT) AS score_ppm
    FROM members m JOIN wstats w USING (t)
    GROUP BY 1, 2, 3
), per AS (
    SELECT source, phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MAX(score_ppm) AS BIGINT) AS score_ppm
    FROM phrases GROUP BY 1, 2
)
SELECT source, CAST(rank AS INT) AS rank, phrase, score_ppm, n_occ
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY score_ppm DESC, phrase) AS rank FROM per)
WHERE rank <= {RAKE_TOPK} ORDER BY source, rank
""", "RAKE keyword extraction: top stopword-free phrases per source")


# ------------------------------------------ Kneser-Ney bigram LM
from .monitor_eval import _ha_sql as _kn_ha  # noqa: E402

# D = 0.75 is exactly representable in binary, so the discount adds no
# rounding asymmetry between engines.


def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM over the corpus, scored per
    source — the real next step after unigram_crossentropy_split's
    add-one model: p(w2|w1) = (c12 - D)/c1 + (D * N1+(w1,.)/c1) *
    (N1+(.,w2)/n_bigram_types), the continuation-count formulation
    that fixes add-k's overestimate of frequent-but-unpromiscuous
    words. Every count (bigram, left-context, both continuation
    counts, type total) is an exact vocabulary-keyed integer; each
    DISTINCT bigram's ln p quantizes to nano once and per-source
    sums weight by exact occurrence counts. Shuffles key on the
    bigram vocabulary, never the corpus."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.expr("split(lower(text), ' ')").alias("w")))
    bi = toks.select(
        "source",
        F.explode(F.expr(
            "transform(slice(w, 1, size(w) - 1),"
            " (x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"))
        .alias("b")).select("source", "b.w1", "b.w2")
    sbc = bi.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt"))
    c12 = sbc.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"),
                               F.count(F.lit(1)).alias("n1f"))
    n1b = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    nb = c12.agg(F.count(F.lit(1)).alias("nb"))
    lp = _kn_ha(
        "ln((cast(c12 as double) - 0.75D) / c1"
        " + (0.75D * n1f / cast(c1 as double))"
        " * (n1b / cast(nb as double))) * 1e9")
    scored = (c12.join(c1, "w1").join(n1b, "w2")
              .crossJoin(F.broadcast(nb))
              .select("w1", "w2", F.expr(lp).alias("lp_nano")))
    per_src = (sbc.join(scored, ["w1", "w2"])
               .groupBy("source")
               .agg(F.sum("cnt").alias("n_bigrams"),
                    F.sum(F.col("lp_nano") * F.col("cnt"))
                    .alias("lp_sum")))
    return (per_src.select(
        "source", "n_bigrams",
        (F.round(-F.col("lp_sum") / (F.lit(1e9) * F.col("n_bigrams")), 6)
         + 0.0).alias("kn_xent_nats"))
        .orderBy("source"))


register("text_bigram_kneser_ney", text_bigram_kneser_ney, f"""
WITH toks AS (
    SELECT doc_id, source, string_split(lower(text), ' ') AS w
    FROM documents
), bi AS (
    SELECT source, w[i] AS w1, w[i + 1] AS w2
    FROM toks, UNNEST(range(1, len(w))) AS u(i)
), sbc AS (
    SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bi GROUP BY 1, 2, 3
), c12t AS (
    SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c12
    FROM sbc GROUP BY 1, 2
), c1t AS (
    SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n1f
    FROM c12t GROUP BY 1
), n1bt AS (
    SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c12t GROUP BY 1
), nbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM c12t),
scored AS (
    SELECT w1, w2, {_kn_ha(
        "ln((CAST(c12 AS DOUBLE) - CAST(0.75 AS DOUBLE)) / c1"
        " + (CAST(0.75 AS DOUBLE) * n1f / CAST(c1 AS DOUBLE))"
        " * (n1b / CAST(nb AS DOUBLE))) * 1e9")} AS lp_nano
    FROM c12t JOIN c1t USING (w1) JOIN n1bt USING (w2) CROSS JOIN nbt
), per_src AS (
    SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp_nano * cnt) AS BIGINT) AS lp_sum
    FROM sbc JOIN scored USING (w1, w2)
    GROUP BY source
)
SELECT source, n_bigrams,
       ROUND(-lp_sum / (1e9 * n_bigrams), 6) + 0.0 AS kn_xent_nats
FROM per_src ORDER BY source
""", "interpolated Kneser-Ney bigram LM cross-entropy per source")


# ------------------------------------------- Burrows' Delta stylometry
BD_PANEL = 50   # most-frequent-word panel
BD_TOPK = 5     # closest source pairs reported


def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta authorship/stylometry distance between sources:
    relative frequencies of the corpus's top-{BD_PANEL} words,
    z-scored ACROSS sources per word, Delta(a, b) = mean |z_a - z_b|
    over the panel; the {BD_TOPK} closest pairs are the
    style-duplicate candidates (same generator/template feeding two
    feeds — the provenance cousin of content near-dup). Exactness:
    relative frequencies are ppb integers, per-word mean/sd come from
    the SOURCE-cardinality spine (variance via n*Σx²-(Σx)² exact
    ints), each z quantizes to micro with shared half-away rounding,
    and Delta is an exact integer mean of |Δz|. Pairs are
    (sources²x panel) — model-size; the corpus is touched once."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("source",
                    F.explode(F.expr("split(lower(text), ' ')")).alias("t")))
    src_tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_tok"))
    panel = (toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.col("c").desc(), "t").limit(BD_PANEL)
             .select("t"))
    stc = (toks.join(F.broadcast(panel), "t")
           .groupBy("source", "t").agg(F.count(F.lit(1)).alias("c")))
    # dense (source x panel) spine so absent words count as freq 0
    spine = (src_tot.crossJoin(F.broadcast(panel))
             .join(stc, ["source", "t"], "left")
             .select("source", "t", "n_tok",
                     F.coalesce("c", F.lit(0)).alias("c"))
             .withColumn("f_ppb", F.expr("c * 1000000000 div n_tok")))
    wstats = spine.groupBy("t").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("f_ppb").alias("s"),
        F.sum(F.expr("f_ppb * f_ppb")).alias("ss"))
    z = _kn_ha(
        "case when ns * ss - s * s <= 0 then 0.0 else"
        " (f_ppb * ns - s)"
        " / (cast(ns as double)"
        " * sqrt((ns * ss - s * s) / (ns * (ns - 1.0)))) * 1e6 end")
    zs = (spine.join(F.broadcast(wstats), "t")
          .select("source", "t", F.expr(z).alias("z_micro")))
    a, b = zs.alias("a"), zs.alias("b")
    delta = (a.join(b, (F.col("a.t") == F.col("b.t"))
                    & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("src_a"),
                      F.col("b.source").alias("src_b"))
             .agg(F.count(F.lit(1)).alias("n_words"),
                  F.sum(F.expr("abs(a.z_micro - b.z_micro)"))
                  .alias("abs_sum"))
             .withColumn("delta_micro",
                         F.expr("abs_sum div n_words")))
    w = Window.orderBy("delta_micro", "src_a", "src_b")
    return (delta.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= BD_TOPK)
            .select("rank", "src_a", "src_b", "n_words", "delta_micro")
            .orderBy("rank"))


register("text_burrows_delta", text_burrows_delta, f"""
WITH toks AS (
    SELECT source, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), src_tot AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM toks GROUP BY source
), panel AS (
    SELECT t FROM (SELECT t, COUNT(*) AS c FROM toks GROUP BY t
                   ORDER BY c DESC, t LIMIT {BD_PANEL})
), stc AS (
    SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks JOIN panel USING (t) GROUP BY 1, 2
), spine AS (
    SELECT s.source, p.t, s.n_tok,
           COALESCE(stc.c, 0) * 1000000000 // s.n_tok AS f_ppb
    FROM src_tot s CROSS JOIN panel p
    LEFT JOIN stc ON stc.source = s.source AND stc.t = p.t
), wstats AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS ns,
           CAST(SUM(f_ppb) AS BIGINT) AS s,
           CAST(SUM(f_ppb * f_ppb) AS BIGINT) AS ss
    FROM spine GROUP BY t
), zs AS (
    SELECT source, spine.t, {_kn_ha(
        "CASE WHEN ns * ss - s * s <= 0 THEN 0.0 ELSE"
        " (f_ppb * ns - s)"
        " / (CAST(ns AS DOUBLE)"
        " * sqrt((ns * ss - s * s) / (ns * (ns - 1.0)))) * 1e6 END"
    )} AS z_micro
    FROM spine JOIN wstats ON spine.t = wstats.t
), delta AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(ABS(a.z_micro - b.z_micro)) AS BIGINT) AS abs_sum
    FROM zs a JOIN zs b ON a.t = b.t AND a.source < b.source
    GROUP BY 1, 2
)
SELECT CAST(rank AS INT) AS rank, src_a, src_b, n_words,
       CAST(abs_sum // n_words AS BIGINT) AS delta_micro
FROM (SELECT *, abs_sum // n_words AS delta_micro,
             ROW_NUMBER() OVER (ORDER BY abs_sum // n_words,
                                src_a, src_b) AS rank
      FROM delta)
WHERE rank <= {BD_TOPK} ORDER BY rank
""", "Burrows' Delta stylometry: closest source pairs by z-score gap")


# ----------------------------------------- moving-average TTR (MATTR)
MATTR_W = 25  # window length in tokens (fixture docs run 10-99 tokens)


def text_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (MATTR, Covington & McFall):
    the length-robust lexical-diversity standard — plain TTR decays
    with document length, MATTR averages TTR over every length-W
    token window. Computed in CLOSED FORM without materializing
    windows: token j is distinct-in-window-i iff its previous
    occurrence is before i, so its total contribution over all
    windows is the exact integer interval overlap
        max(0, min(j, n-W) - max(0, j-W+1, prev_j+1) + 1)
    and MATTR = sum(contrib) / ((n-W+1)*W) — per-token work O(1)
    after one lag window over (doc, token) by position, fact-sized
    shuffle only on the tokens themselves. Docs shorter than W are
    excluded (MATTR undefined); per-source mean is an integer ppm
    division of exact sums."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.posexplode(F.split(F.lower("text"), " "))
                    .alias("pos", "tok")))
    w_tok = Window.partitionBy("doc_id", "tok").orderBy("pos")
    w_doc = Window.partitionBy("doc_id")
    per_tok = (toks
               .withColumn("prev", F.lag("pos").over(w_tok))
               .withColumn("n", F.count(F.lit(1)).over(w_doc))
               .filter(F.col("n") >= MATTR_W)
               .withColumn("contrib", F.expr(
                   f"greatest(0, least(pos, n - {MATTR_W})"
                   f" - greatest(0, pos - {MATTR_W} + 1,"
                   f" coalesce(prev, -1) + 1) + 1)")))
    per_doc = (per_tok.groupBy("doc_id", "source")
               .agg(F.max("n").alias("n"),
                    F.sum("contrib").alias("distinct_total"))
               .withColumn("mattr_ppm", F.expr(
                   f"distinct_total * 1000000"
                   f" div ((n - {MATTR_W} + 1) * {MATTR_W})")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.expr("sum(mattr_ppm) div count(1)")
                 .alias("mean_mattr_ppm"),
                 F.min("mattr_ppm").alias("min_mattr_ppm"),
                 F.max("mattr_ppm").alias("max_mattr_ppm"))
            .orderBy("source"))


register("text_mattr", text_mattr, f"""
WITH toks AS (
    SELECT doc_id, source,
           generate_subscripts(string_split(lower(text), ' '), 1) - 1
               AS pos,
           unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
), per_tok AS (
    SELECT doc_id, source, pos, tok,
           LAG(pos) OVER (PARTITION BY doc_id, tok ORDER BY pos) AS prev,
           COUNT(*) OVER (PARTITION BY doc_id) AS n
    FROM toks
), contribs AS (
    SELECT doc_id, source, n,
           GREATEST(0, LEAST(pos, n - {MATTR_W})
                    - GREATEST(0, pos - {MATTR_W} + 1,
                               COALESCE(prev, -1) + 1) + 1) AS contrib
    FROM per_tok WHERE n >= {MATTR_W}
), per_doc AS (
    SELECT doc_id, source, MAX(n) AS n,
           CAST(SUM(contrib) AS BIGINT) AS distinct_total
    FROM contribs GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(distinct_total * 1000000
                // ((n - {MATTR_W} + 1) * {MATTR_W}))
            // COUNT(*) AS BIGINT) AS mean_mattr_ppm,
       CAST(MIN(distinct_total * 1000000
                // ((n - {MATTR_W} + 1) * {MATTR_W})) AS BIGINT)
           AS min_mattr_ppm,
       CAST(MAX(distinct_total * 1000000
                // ((n - {MATTR_W} + 1) * {MATTR_W})) AS BIGINT)
           AS max_mattr_ppm
FROM per_doc GROUP BY source ORDER BY source
""", f"closed-form MATTR (window {MATTR_W}) lexical diversity per source")


# --------------------------------------------- Simpson lexical diversity
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson lexical diversity per document, aggregated by source:
    1 - D with D = sum c_t(c_t - 1) / (N(N - 1)) the probability two
    sampled tokens coincide — the repeat-probability complement to
    MATTR's coverage view (MATTR asks "how many types per window", 
    Simpson asks "how often does the same type repeat"). Exact
    integer ppm per document off the per-(doc, token) counts; the
    per-source mean divides exact integer sums. One token explode,
    vocabulary-keyed aggregation — the text_zipf_fit shuffle shape."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "source",
                    F.explode(F.split(F.lower("text"), " ")).alias("tok")))
    cnt = (toks.groupBy("doc_id", "source", "tok")
           .agg(F.count(F.lit(1)).alias("c")))
    per_doc = (cnt.groupBy("doc_id", "source")
               .agg(F.sum("c").alias("n"),
                    F.sum(F.expr("c * (c - 1)")).alias("rep"))
               .filter(F.col("n") >= 2)
               .withColumn("simpson_ppm", F.expr(
                   "1000000 - rep * 1000000 div (n * (n - 1))")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.expr("sum(simpson_ppm) div count(1)")
                 .alias("mean_simpson_ppm"),
                 F.min("simpson_ppm").alias("min_simpson_ppm"))
            .orderBy("source"))


register("text_simpson_diversity", text_simpson_diversity, """
WITH cnt AS (
    SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT doc_id, source,
                 unnest(string_split(lower(text), ' ')) AS tok
          FROM documents)
    GROUP BY 1, 2, 3
), per_doc AS (
    SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(c * (c - 1)) AS BIGINT) AS rep
    FROM cnt GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(1000000 - rep * 1000000 // (n * (n - 1)))
            // COUNT(*) AS BIGINT) AS mean_simpson_ppm,
       CAST(MIN(1000000 - rep * 1000000 // (n * (n - 1))) AS BIGINT)
           AS min_simpson_ppm
FROM per_doc WHERE n >= 2 GROUP BY source ORDER BY source
""", "Simpson lexical diversity (1 - repeat probability) per source")
