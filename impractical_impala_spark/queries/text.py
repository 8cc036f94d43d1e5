"""Text-analysis operators over ``documents``: token stats, quality
scoring, language-ID, document fingerprinting.

All deterministic and integer/ratio-based so the DuckDB oracle is exact;
everything is JVM-side expression work (split + higher-order functions),
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

P = 2147483647
LANGS = ["en", "fr", "es", "zh", "de"]
STOPWORDS = ("the", "a", "of", "to", "and")

_SPARK_WORDS = "split(lower(text), ' ')"
_DUCK_WORDS = "string_split(lower(text), ' ')"
_SPARK_H = "cast(conv(substring(md5({t}), 1, 7), 16, 10) as bigint)"
_DUCK_H = "CAST(('0x' || substr(md5({t}), 1, 7)) AS BIGINT)"


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct-token count + chars-per-token.
    (BPE-ish subword estimate: ceil(chars/4) — the standard quick token
    budget heuristic.)"""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"size({_SPARK_WORDS})").alias("n_tokens"),
        F.expr(f"size(array_distinct({_SPARK_WORDS}))").alias("n_distinct"),
        F.ceil(F.length("text") / 4).cast("bigint").alias("subword_est"),
        (F.length("text").cast("double") / F.expr(f"size({_SPARK_WORDS})"))
        .alias("chars_per_token"),
    )


register("text_token_count", text_token_count, f"""
SELECT doc_id,
       len({_DUCK_WORDS}) AS n_tokens,
       len(list_distinct({_DUCK_WORDS})) AS n_distinct,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS subword_est,
       CAST(length(text) AS DOUBLE) / len({_DUCK_WORDS}) AS chars_per_token
FROM documents
""", "token counting (whitespace + subword estimate)")


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality heuristics: stopword ratio, lexical
    diversity, mean token length, length band — combined score."""
    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = _SPARK_WORDS
    n = f"size({words})"
    stop_ratio = (
        f"cast(size(filter({words}, w -> w in ({stop_list}))) as double) / {n}"
    )
    diversity = f"cast(size(array_distinct({words})) as double) / {n}"
    mean_len = (
        f"aggregate({words}, cast(0.0 as double), (acc, w) -> acc + length(w)) / {n}"
    )
    len_ok = "CASE WHEN n_chars BETWEEN 100 AND 2000 THEN cast(1.0 as double) ELSE cast(0.0 as double) END"
    return docs.select(
        "doc_id",
        F.expr(stop_ratio).alias("stop_ratio"),
        F.expr(diversity).alias("lexical_diversity"),
        F.expr(mean_len).alias("mean_token_len"),
        F.expr(len_ok).alias("len_ok"),
    ).withColumn(
        # unrounded: the weighted sum is left-associated IEEE arithmetic,
        # bit-identical across engines; ROUND(x, 6) hit an exact .5
        # boundary on real data (terminating-decimal rationals) and the
        # two engines rounded opposite ways
        "quality",
        0.25 * (1 - F.col("stop_ratio"))
        + 0.35 * F.col("lexical_diversity")
        + 0.15 * F.least(F.col("mean_token_len") / 8, F.lit(1.0))
        + 0.25 * F.col("len_ok"),
    ).select("doc_id", "quality", "stop_ratio", "lexical_diversity",
             "mean_token_len", "len_ok")


def _quality_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    words = _DUCK_WORDS
    n = f"len({words})"
    return f"""
WITH feat AS (
    SELECT doc_id,
           CAST(len(list_filter({words}, w -> w IN ({stop_list}))) AS DOUBLE)
               / {n} AS stop_ratio,
           CAST(len(list_distinct({words})) AS DOUBLE) / {n} AS lexical_diversity,
           list_sum(list_transform({words}, w -> length(w))) * 1.0 / {n}
               AS mean_token_len,
           CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1.0 ELSE 0.0 END AS len_ok
    FROM documents
)
SELECT doc_id,
       0.25 * (1 - stop_ratio) + 0.35 * lexical_diversity
       + 0.15 * least(mean_token_len / 8, 1.0) + 0.25 * len_ok
           AS quality,
       stop_ratio, lexical_diversity, mean_token_len, len_ok
FROM feat
""";


register("text_quality_score", text_quality_score, _quality_oracle(),
         "document quality heuristics")


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID: each vocabulary word deterministically
    'belongs' to one language (hash bucket); predicted language = argmax
    token vote, ties broken by language order. The corpus is synthetic
    word soup, so accuracy vs the lang column is chance — the operator
    under test is the deterministic scoring plan, which at scale is one
    scan + argmax, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    words = _SPARK_WORDS
    h = _SPARK_H.format(t="w")
    votes = [
        F.expr(f"size(filter({words}, w -> ({h}) % {len(LANGS)} = {i}))")
        .alias(f"v_{lang}")
        for i, lang in enumerate(LANGS)
    ]
    df = docs.select("doc_id", "lang", *votes)
    best = F.greatest(*[F.col(f"v_{lang}") for lang in LANGS])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANGS):
        pred = F.when(F.col(f"v_{lang}") == best, F.lit(lang)).otherwise(pred)
    return df.select(
        "doc_id", "lang",
        pred.alias("pred_lang"),
        *[F.col(f"v_{lang}") for lang in LANGS],
    )


def _langid_oracle() -> str:
    h = _DUCK_H.format(t="w")
    votes = ",\n           ".join(
        f"len(list_filter({_DUCK_WORDS}, w -> ({h}) % {len(LANGS)} = {i}))"
        f" AS v_{lang}"
        for i, lang in enumerate(LANGS)
    )
    pred = "CASE "
    for lang in LANGS:
        pred += (f"WHEN v_{lang} = greatest("
                 + ", ".join(f"v_{x}" for x in LANGS) + f") THEN '{lang}' ")
    pred += "END"
    return f"""
WITH votes AS (
    SELECT doc_id, lang,
           {votes}
    FROM documents
)
SELECT doc_id, lang, {pred} AS pred_lang,
       v_en, v_fr, v_es, v_zh, v_de
FROM votes
"""


register("text_langid", text_langid, _langid_oracle(),
         "hash-bucket n-gram language ID vote")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: polynomial fold of
    the token hash sequence mod 2^31-1 — content-defined identity for
    shard-stable dedup keys."""
    docs = load_table(spark, sf_dir, "documents")
    h = _SPARK_H.format(t="t")
    hs = f"transform({_SPARK_WORDS}, t -> {h})"
    fp = (
        f"aggregate(slice({hs}, 2, size({hs}) - 1), element_at({hs}, 1),"
        f" (acc, x) -> (acc * 31 + x) % {P})"
    )
    return docs.select(
        "doc_id",
        F.expr(fp).alias("fingerprint"),
        F.expr(f"size({_SPARK_WORDS})").alias("n_tokens"),
    )


def _fingerprint_oracle() -> str:
    h = _DUCK_H.format(t="t")
    hs = f"list_transform({_DUCK_WORDS}, t -> {h})"
    return f"""
SELECT doc_id,
       list_reduce({hs}, (acc, x) -> (acc * 31 + x) % {P}) AS fingerprint,
       len({_DUCK_WORDS}) AS n_tokens
FROM documents
"""


register("text_fingerprint", text_fingerprint, _fingerprint_oracle(),
         "rolling-hash document fingerprint")


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the inverted-index aggregation
    pattern: explode -> term counts -> document frequency -> join ->
    rank. The df side is tiny here and broadcasts; at web scale it's a
    shuffle join on the term key (uniform by construction)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-side scalar; one cheap count job
    terms = docs.select(
        "doc_id", F.explode(F.expr(_SPARK_WORDS)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.select("doc_id", "term").distinct() \
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id", "term", "tf", "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


def _tfidf_oracle() -> str:
    return f"""
WITH terms AS (
    SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
    GROUP BY term
), scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           ROUND(tf.tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / df.df), 6)
               AS tfidf
    FROM tf JOIN df USING (term)
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS rk
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
"""


register("text_tfidf_top_terms", text_tfidf_top_terms, _tfidf_oracle(),
         "TF-IDF top-3 terms per document (inverted-index pattern)")


# ------------------------------------------------------------ Zipf fit
ZIPF_TOP = 100
ZIPF_SCALE = 1 << 20  # fixed-point log quantum; cancels in the slope


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-linguistics QA: the Zipf exponent — the OLS slope of
    ln(frequency) against ln(rank) over the top-100 tokens. A healthy
    natural-language corpus sits near -1; a pipeline bug (boilerplate
    flood, template spam) shows up as a flat or cliff-shaped curve.
    Determinism: both logs are floor-quantized to integers
    (emb_covariance discipline), so the OLS sufficient sums are exact
    whatever the 100-row frame's physical order; the ZIPF_SCALE factor
    cancels in the slope ratio. Top-100 selection is a distributed
    TakeOrdered; everything after runs on a model-size frame."""
    from pyspark.sql import Window

    toks = (load_table(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
            .filter(F.length("tok") > 0)
            .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    top = toks.orderBy(F.col("c").desc(), "tok").limit(ZIPF_TOP)
    Wr = Window.orderBy(F.col("c").desc(), "tok")
    pts = (top.withColumn("r", F.row_number().over(Wr))
           .select(F.expr(f"cast(floor(ln(r) * {ZIPF_SCALE}) as bigint)")
                   .alias("x"),
                   F.expr(f"cast(floor(ln(c) * {ZIPF_SCALE}) as bigint)")
                   .alias("y")))
    return (pts.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                    F.sum(F.col("x") * F.col("y")).alias("sxy"),
                    F.sum(F.col("x") * F.col("x")).alias("sxx"))
            .select("n",
                    (F.round((F.col("n") * F.col("sxy")
                              - F.col("sx") * F.col("sy")).cast("double")
                             / (F.col("n") * F.col("sxx")
                                - F.col("sx") * F.col("sx")).cast("double"),
                             6) + 0.0).alias("zipf_slope")))


register("text_zipf_fit", text_zipf_fit, f"""
WITH toks AS (
    SELECT t.tok, COUNT(*) AS c
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS tok
          FROM documents) t
    WHERE length(t.tok) > 0
    GROUP BY t.tok
), top AS (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
    FROM toks ORDER BY c DESC, tok LIMIT {ZIPF_TOP}
), pts AS (
    SELECT CAST(FLOOR(ln(r) * {ZIPF_SCALE}) AS BIGINT) AS x,
           CAST(FLOOR(ln(c) * {ZIPF_SCALE}) AS BIGINT) AS y
    FROM top
), s AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts
)
SELECT n, ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS zipf_slope
FROM s
""", "Zipf-exponent corpus QA via integer-quantized log-log OLS")


# ------------------------------------------------- bigram surprisal
SURP_SCALE = 1 << 20


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-free perplexity proxy (the KenLM-style quality
    signal): per language, the corpus-average bigram surprisal
    -ln P(w2|w1) under the corpus's own bigram MLE. Template-flooded or
    degenerate text scores near 0; diverse text scores high — the
    standard cheap filter before an expensive model-based quality pass.

    Shape: one corpus scan explodes bigrams; counts aggregate per
    (lang, w1, w2) and per (lang, w1); the conditional join is co-keyed
    on (lang, w1) — never a broadcast of a corpus-sized vocabulary.
    Each occurrence's surprisal is floor-quantized to an integer
    (emb_covariance discipline), so the per-language averages are exact
    integer ratios until the single final rounded division."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    # split once per row; the pair lambda only indexes the materialized
    # array instead of re-splitting the text three times per row
    bi = (docs.select("lang", F.expr(_SPARK_WORDS).alias("w"))
          .select(
              "lang",
              F.explode(F.expr(
                  "transform(sequence(1, greatest(size(w) - 1, 0)),"
                  " i -> struct(w[i-1] AS w1, w[i] AS w2))")).alias("b"))
          .select("lang", "b.w1", "b.w2"))
    c12 = bi.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (c12.join(c1, ["lang", "w1"])
              .select("lang", "c12",
                      F.expr(f"cast(floor(-ln(c12 / c1) * {SURP_SCALE})"
                             f" as bigint)").alias("sq")))
    return (scored.groupBy("lang")
            .agg(F.sum("c12").alias("n_bigrams"),
                 F.sum(F.col("sq") * F.col("c12")).alias("sq_sum"))
            .select("lang", "n_bigrams",
                    (F.round(F.col("sq_sum")
                             / (F.col("n_bigrams") * float(SURP_SCALE)), 6)
                     + 0.0).alias("avg_surprisal"))
            .orderBy("lang"))


register("text_bigram_surprisal", text_bigram_surprisal, f"""
WITH bi AS (
    SELECT lang, w[i] AS w1, w[i + 1] AS w2
    FROM (SELECT lang, string_split(lower(text), ' ') AS w FROM documents),
         UNNEST(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)
), c12 AS (
    SELECT lang, w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2, 3
), c1 AS (
    SELECT lang, w1, COUNT(*) AS c1 FROM bi GROUP BY 1, 2
), scored AS (
    SELECT c12.lang, c12.c12,
           CAST(FLOOR(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1) * {SURP_SCALE})
                AS BIGINT) AS sq
    FROM c12 JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
)
SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(sq * c12) AS DOUBLE)
             / (SUM(c12) * {float(SURP_SCALE)}), 6) + 0.0 AS avg_surprisal
FROM scored GROUP BY lang ORDER BY lang
""", "corpus-MLE bigram surprisal per language (perplexity-proxy QA)")


# ------------------------------------- token-distribution entropy
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution — the
    classic corpus-health metric (a collapsing or template-spammed
    source shows as an entropy drop before any dedup pass finds it).
    One explode pass gives per-(source, token) integer counts (the
    TF-IDF shuffle shape, vocabulary-bounded after the aggregate);
    each -p*log2(p) term is computed once per distinct token from
    exact integers and quantized to nano-bits BEFORE the sum (the
    bigram-surprisal convention), so the accumulation is pure integer
    and both engines agree bit-for-bit. Normalized entropy divides by
    log2(vocab) — one final rounded float op."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source", F.explode(F.expr(_SPARK_WORDS)).alias("tok"))
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    term_nano = F.floor(-p * F.log2(p) * 1e9).cast("long")
    return (counts.join(F.broadcast(tot), "source")
            .select("source", "n", term_nano.alias("tn"))
            .groupBy("source")
            .agg(F.first("n").alias("n_tokens"),
                 F.count(F.lit(1)).alias("vocab"),
                 F.sum("tn").alias("entropy_nano"))
            .select("source", "n_tokens", "vocab", "entropy_nano",
                    (F.round(F.col("entropy_nano") / 1e9
                             / F.log2(F.col("vocab").cast("double")), 6)
                     + 0.0).alias("norm_entropy"))
            .orderBy("source"))


register("source_token_entropy", source_token_entropy, f"""
WITH toks AS (
    SELECT source, UNNEST({_DUCK_WORDS}) AS tok FROM documents
), counts AS (
    SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
), tot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source
), terms AS (
    SELECT counts.source, t.n,
           CAST(FLOOR(-(c / CAST(n AS DOUBLE))
                      * LOG2(c / CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS tn
    FROM counts JOIN tot t ON counts.source = t.source
)
SELECT source, ANY_VALUE(n) AS n_tokens, COUNT(*) AS vocab,
       CAST(SUM(tn) AS BIGINT) AS entropy_nano,
       ROUND(CAST(SUM(tn) AS DOUBLE) / 1e9
             / LOG2(CAST(COUNT(*) AS DOUBLE)), 6) + 0.0 AS norm_entropy
FROM terms GROUP BY source ORDER BY source
""", "integer-quantized Shannon entropy of each source's token mix")


# ------------------------------- language-ID evaluation harness
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation harness over the langid predictions: the
    (labeled lang x predicted lang) confusion matrix with per-cell
    counts and integer recall shares. Composes the registered
    text_langid plan unchanged (the dedup_lsh_audit composition
    pattern); the confusion table is model-sized (|langs|^2), so the
    row totals attach via a broadcast and the corpus is scanned once.
    The synthetic corpus makes accuracy chance-level — the operator
    under test is the evaluation plan, not the model."""
    preds = text_langid(spark, sf_dir).select("lang", "pred_lang")
    cells = preds.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n"))
    row_tot = cells.groupBy("lang").agg(F.sum("n").alias("rt"))
    return (cells.join(F.broadcast(row_tot), "lang")
            .select("lang", "pred_lang", "n",
                    F.expr("n * 1000000 div rt").alias("recall_ppm"))
            .orderBy("lang", "pred_lang"))


register("langid_confusion_matrix", langid_confusion_matrix, f"""
WITH preds AS (
    SELECT lang, pred_lang FROM ({_langid_oracle().strip()})
), cells AS (
    SELECT lang, pred_lang, COUNT(*) AS n FROM preds GROUP BY 1, 2
), row_tot AS (
    SELECT lang, CAST(SUM(n) AS BIGINT) AS rt FROM cells GROUP BY lang
)
SELECT c.lang, c.pred_lang, c.n,
       CAST(c.n * 1000000 // r.rt AS BIGINT) AS recall_ppm
FROM cells c JOIN row_tot r ON c.lang = r.lang
ORDER BY c.lang, c.pred_lang
""", "labeled-vs-predicted language confusion matrix with recall ppm")


# ------------------------------- tokenizer vocabulary OOV coverage
VOCAB_K = 256


def vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-health gate: build the top-VOCAB_K corpus vocabulary
    (count desc, token asc — fully deterministic) and measure each
    language's out-of-vocabulary token rate. The vocabulary ranking
    runs over the token AGGREGATE (vocabulary-sized, one window), the
    K-row vocab broadcasts, and coverage is a map-side membership flag
    folded per language — the corpus token stream shuffles once for
    the count and once per (lang, token) for coverage, never by row."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    toks = docs.select(
        "lang", F.explode(F.expr(_SPARK_WORDS)).alias("tok")).cache()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy(F.col("c").desc(), "tok")
    vocab = (freq.withColumn("rk", F.row_number().over(wv))
             .filter(F.col("rk") <= VOCAB_K)
             .select("tok", F.lit(1).alias("in_vocab")))
    per_lang_tok = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    return (per_lang_tok.join(F.broadcast(vocab), "tok", "left")
            .groupBy("lang")
            .agg(F.sum("c").alias("n_tokens"),
                 F.sum(F.when(F.col("in_vocab").isNull(), F.col("c"))
                       .otherwise(0)).alias("n_oov"))
            .select("lang", "n_tokens", "n_oov",
                    F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"))
            .orderBy("lang"))


register("vocab_oov_coverage", vocab_oov_coverage, f"""
WITH toks AS (
    SELECT lang, UNNEST({_DUCK_WORDS}) AS tok FROM documents
), freq AS (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), vocab AS (
    SELECT tok FROM freq
    QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, tok) <= {VOCAB_K}
), per_lang_tok AS (
    SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) * 1000000
            // SUM(c) AS BIGINT) AS oov_ppm
FROM per_lang_tok p LEFT JOIN vocab v ON p.tok = v.tok
GROUP BY lang ORDER BY lang
""", "top-K vocabulary OOV rate per language (tokenizer health gate)")


# word-bigram shingles (the dedup.py k=2 convention; a 1-word doc
# yields its single word)
_SPARK_SH = ("transform(sequence(1, greatest(size({w}) - 1, 1)),"
             " i -> concat_ws(' ', slice({w}, i, 2)))")
_DUCK_SH = ("list_transform(range(1, greatest(len({w}) - 1, 1) + 1),"
            " i -> array_to_string(list_slice({w}, i, i + 1), ' '))")


def novelty_frame(docs: DataFrame) -> DataFrame:
    """Core of text_ngram_novelty over any (doc_id, source, text) frame
    — exposed for the corpus-duplication scale test."""
    sh = docs.select(
        "doc_id", "source",
        F.explode(F.expr(
            "array_distinct(" + _SPARK_SH.format(w=_SPARK_WORDS) + ")"))
        .alias("sh"))
    df_counts = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("df"))
    per_doc = (sh.join(df_counts, "sh")
               .groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).alias("n_sh"),
                    F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                    .alias("n_uniq"))
               .withColumn("nov_ppm", F.expr("n_uniq * 1000000 div n_sh")))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_sh").alias("total_shingles"),
                 F.sum("n_uniq").alias("unique_shingles"),
                 F.expr("sum(nov_ppm) div count(1)")
                 .alias("mean_novelty_ppm"))
            .orderBy("source"))


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: what fraction of each document's
    distinct word-bigram shingles appear NOWHERE else in the corpus
    (global document frequency 1)? The intra-corpus complement of
    text_ngram_contamination (which checks against an external probe
    set) — low novelty flags a source as templated/boilerplate before
    any pairwise dedup runs. One explode of per-doc DISTINCT shingles,
    a shingle-key count with map-side combine (the inverted-index
    shuffle shape — keys are the shingle vocabulary, not the corpus),
    then two bounded aggregates. Per-doc novelty is integer ppm
    (floor-quantized, the contract); the per-source mean is the exact
    integer div of summed ppms."""
    return novelty_frame(load_table(spark, sf_dir, "documents")
                         .select("doc_id", "source", "text"))


register("text_ngram_novelty", text_ngram_novelty, f"""
WITH sh AS (
    SELECT doc_id, source,
           UNNEST(list_distinct({_DUCK_SH.format(w=_DUCK_WORDS)})) AS sh
    FROM documents
), df_counts AS (
    SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
), per_doc AS (
    SELECT s.doc_id, s.source, COUNT(*) AS n_sh,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_uniq
    FROM sh s JOIN df_counts d ON s.sh = d.sh
    GROUP BY s.doc_id, s.source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
       CAST(SUM(n_uniq) AS BIGINT) AS unique_shingles,
       CAST(SUM(n_uniq * 1000000 // n_sh) AS BIGINT) // COUNT(*)
           AS mean_novelty_ppm
FROM per_doc GROUP BY source ORDER BY source
""", "per-source fraction of corpus-unique word-bigram shingles")


# ------------------------------------------- tokenizer fertility
TF_VOCAB = 256  # top-V global word vocabulary (the "merged" tokens)


def tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: simulate a trained
    fixed-vocabulary tokenizer by taking the corpus's top-{TF_VOCAB}
    words as single tokens and splitting every out-of-vocabulary word
    into ceil(len/4) subword pieces — fertility (pieces per word) is
    THE metric that shows how a vocabulary trained on a mixed corpus
    taxes low-resource languages. The vocabulary is a model-size
    broadcast (count desc, word tiebreak — deterministic cut); all
    ratios are integer ppm. One token explode, vocabulary-keyed count,
    language-keyed reduce."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("lang",
                    F.explode(F.expr("split(lower(text), ' ')")).alias("t")))
    vocab = (toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.col("c").desc(), "t").limit(TF_VOCAB)
             .select("t", F.lit(1).alias("in_vocab")))
    scored = (toks.join(F.broadcast(vocab), "t", "left")
              .select("lang",
                      F.expr("case when in_vocab = 1 then 1"
                             " else cast(ceil(length(t) / 4.0D) as bigint)"
                             " end").alias("pieces"),
                      F.expr("cast(in_vocab is null as int)").alias("oov")))
    return (scored.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("oov").alias("n_oov"),
                 F.sum("pieces").alias("n_pieces"))
            .select("lang", "n_words", "n_oov", "n_pieces",
                    F.expr("n_pieces * 1000000 div n_words")
                    .alias("fertility_ppm"),
                    F.expr("n_oov * 1000000 div n_words").alias("oov_ppm"))
            .orderBy("lang"))


register("tokenizer_fertility_audit", tokenizer_fertility_audit, f"""
WITH toks AS (
    SELECT lang, UNNEST(string_split(lower(text), ' ')) AS t
    FROM documents
), vocab AS (
    SELECT t, 1 AS in_vocab FROM (
        SELECT t, COUNT(*) AS c FROM toks GROUP BY t
        ORDER BY c DESC, t LIMIT {TF_VOCAB})
), scored AS (
    SELECT lang,
           CASE WHEN v.in_vocab = 1 THEN 1
                ELSE CAST(ceil(length(t) / 4.0) AS BIGINT) END AS pieces,
           CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END AS oov
    FROM toks LEFT JOIN vocab v USING (t)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(SUM(pieces) AS BIGINT) AS n_pieces,
       CAST(SUM(pieces) * 1000000 // COUNT(*) AS BIGINT)
           AS fertility_ppm,
       CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
FROM scored GROUP BY lang ORDER BY lang
""", "tokenizer fertility per language (top-V vocab, ceil-split OOV)")


# ------------------------------------------------ vocabulary coverage@k
from .monitor_eval import _ha_sql as _vc_ha  # noqa: E402

VC_KS = (100, 1_000, 10_000)
VC_KMAX = max(VC_KS)


def vocab_coverage_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary truncation advisor: what fraction of the corpus
    token mass do the top-k types cover, at k = 100 / 1k / 10k — the
    number a tokenizer-vocab or stopword-list decision actually needs.
    The type census is vocabulary-keyed (map-side combined); the
    top-VC_KMAX cut is a distributed TakeOrdered with the
    (count desc, token) total order, so the capped frame is
    model-size BY CONSTRUCTION and the rank window runs on it, never
    on the full vocabulary. Coverage sums are exact integer ppm; a k
    larger than the vocabulary covers the full mass. The literal
    k-spine guarantees all three rows exist on any corpus."""
    toks = (load_table(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.lower("text"), " ")).alias("tok")))
    census = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = census.agg(F.sum("c").alias("n_tokens"),
                     F.count(F.lit(1)).alias("n_types"))
    top = (census.orderBy(F.col("c").desc(), "tok").limit(VC_KMAX)
           .withColumn("r", F.row_number().over(
               Window.orderBy(F.col("c").desc(), "tok"))))
    ks = ", ".join(str(k) for k in VC_KS)
    spine = spark.range(1).select(
        F.explode(F.expr(f"array({ks})")).alias("k"))
    cov = (top.join(spine, top.r <= spine.k)
           .groupBy("k").agg(F.sum("c").alias("covered")))
    return (spine.join(cov, "k", "left")
            .crossJoin(F.broadcast(tot))
            .select(F.col("k").cast("long").alias("k"),
                    "n_types", "n_tokens",
                    F.expr("coalesce(covered, 0) * 1000000 div n_tokens")
                    .alias("covered_ppm"))
            .orderBy("k"))


register("vocab_coverage_at_k", vocab_coverage_at_k, f"""
WITH census AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS tok
          FROM documents)
    GROUP BY 1
), tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM census
), top AS (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
    FROM (SELECT * FROM census ORDER BY c DESC, tok LIMIT {VC_KMAX})
), cov AS (
    SELECT k.k, CAST(SUM(top.c) AS BIGINT) AS covered
    FROM top JOIN (SELECT UNNEST([{", ".join(str(k) for k in VC_KS)}])
                   AS k) k
      ON top.r <= k.k
    GROUP BY 1
)
SELECT CAST(s.k AS BIGINT) AS k, t.n_types, t.n_tokens,
       COALESCE(cov.covered, 0) * 1000000 // t.n_tokens AS covered_ppm
FROM (SELECT UNNEST([{", ".join(str(k) for k in VC_KS)}]) AS k) s
LEFT JOIN cov ON s.k = cov.k
CROSS JOIN tot t
ORDER BY s.k
""", "token-mass coverage of the top-k vocabulary types (truncation advisor)")


# ------------------------------------------------------- hapax ratio
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis legomena profile per source: the share of vocabulary
    types seen exactly once (hapax) and twice (dis), and the hapax
    share of the TOKEN mass — the corpus-health triple behind
    Heaps/Good-Turing (a hapax-heavy source is still growing
    vocabulary: unseen-mass estimates and tokenizer vocab cuts both
    key off it). One vocabulary-keyed census per source; all ratios
    exact integer ppm."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("source",
                    F.explode(F.split(F.lower("text"), " ")).alias("tok")))
    census = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    return (census.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_types"),
                 F.sum("c").alias("n_tokens"),
                 F.sum(F.expr("cast(c = 1 as int)")).alias("n_hapax"),
                 F.sum(F.expr("cast(c = 2 as int)")).alias("n_dis"))
            .select("source", "n_types", "n_tokens", "n_hapax", "n_dis",
                    F.expr("n_hapax * 1000000 div n_types")
                    .alias("hapax_vocab_ppm"),
                    F.expr("n_hapax * 1000000 div n_tokens")
                    .alias("hapax_mass_ppm"),
                    F.expr("n_dis * 1000000 div n_types")
                    .alias("dis_vocab_ppm"))
            .orderBy("source"))


register("text_hapax_ratio", text_hapax_ratio, """
WITH census AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT source, UNNEST(string_split(lower(text), ' ')) AS tok
          FROM documents)
    GROUP BY 1, 2
), agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dis
    FROM census GROUP BY 1
)
SELECT source, n_types, n_tokens, n_hapax, n_dis,
       n_hapax * 1000000 // n_types AS hapax_vocab_ppm,
       n_hapax * 1000000 // n_tokens AS hapax_mass_ppm,
       n_dis * 1000000 // n_types AS dis_vocab_ppm
FROM agg ORDER BY source
""", "hapax/dis legomena vocabulary and mass shares per source")
