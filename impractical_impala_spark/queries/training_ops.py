"""Round-3 training-data pipeline operators over ``documents``:

- ``text_repetition_ratio``: Gopher-style repetition signals (distinct
  word / distinct bigram fractions) — the cheap quality gate that
  catches boilerplate and degenerate generations.
- ``text_ngram_contamination``: benchmark-contamination scan — which
  corpus docs share >= K distinct word 5-grams with a (small) benchmark
  set. The benchmark side is size-gated broadcast: at 100 TB the eval
  set is KBs-to-MBs while the corpus is the lake, so the scan is one
  corpus pass with a map-side join and the only shuffle is the final
  (doc, bench) pair count — there is no corpus-sized shuffle at all.
- ``doc_chunk_tokens``: fixed-size sequence chunking (training sample
  packing precursor): explode each doc into 32-token chunks with a
  content hash per chunk. Pure per-row expression work, no shuffle.
- ``quality_gate_survivors``: the composed quality funnel (length,
  word-shape, stopword gates) summarized per (lang, source) — the
  artifact a curation run reports.
- ``corpus_training_manifest``: the funnel end-to-end — quality gate ->
  exact dedup -> content-keyed split -> per-(split, lang) doc/token/
  chunk totals, the manifest a training run consumes.
- ``text_heavy_hitters``: exact 3-gram heavy hitters by two-pass
  local-frequent candidates (Arrow-batch value_counts — the one
  deliberate Python stage in this module, vectorized, no shuffle) +
  broadcast-semi-join exact confirm.

Everything else is JVM expression-level (higher-order functions, no
Python in the hot path); every query has an exact DuckDB twin so the
whole family is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..broadcast_gate import maybe_broadcast
from ..registry import register
from ..sources import load_table

_SPARK_WORDS = "split(lower(text), ' ')"
_DUCK_WORDS = "string_split(lower(text), ' ')"


# ------------------------------------------------------- repetition ratio
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-word and distinct-bigram fractions per doc, with the
    repetitive flag a curation pipeline filters on. One scan, zero
    shuffles; ratios are single IEEE divisions (deterministic), rounded
    only at the output."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        F.expr(f"size({_SPARK_WORDS})").alias("n_words"),
        F.round(F.expr(
            f"cast(size(array_distinct({_SPARK_WORDS})) as double)"
            f" / size({_SPARK_WORDS})"), 6).alias("uniq_word_ratio"),
        F.round(F.expr(
            "cast(size(array_distinct(transform("
            f" sequence(1, greatest(size({_SPARK_WORDS}) - 1, 1)),"
            f" i -> concat_ws(' ', slice({_SPARK_WORDS}, i, 2))))) as double)"
            f" / greatest(size({_SPARK_WORDS}) - 1, 1)"), 6)
        .alias("uniq_bigram_ratio"),
    ).withColumn(
        "repetitive",
        (F.col("uniq_word_ratio") < 0.45) | (F.col("uniq_bigram_ratio") < 0.6),
    )


register("text_repetition_ratio", text_repetition_ratio, f"""
SELECT doc_id, lang,
       len({_DUCK_WORDS}) AS n_words,
       ROUND(CAST(len(list_distinct({_DUCK_WORDS})) AS DOUBLE)
             / len({_DUCK_WORDS}), 6) AS uniq_word_ratio,
       ROUND(CAST(len(list_distinct(list_transform(
                 range(1, greatest(len({_DUCK_WORDS}) - 1, 1) + 1),
                 i -> array_to_string(list_slice({_DUCK_WORDS}, i, i + 1), ' '))))
             AS DOUBLE) / greatest(len({_DUCK_WORDS}) - 1, 1), 6)
           AS uniq_bigram_ratio,
       (ROUND(CAST(len(list_distinct({_DUCK_WORDS})) AS DOUBLE)
              / len({_DUCK_WORDS}), 6) < 0.45
        OR ROUND(CAST(len(list_distinct(list_transform(
                 range(1, greatest(len({_DUCK_WORDS}) - 1, 1) + 1),
                 i -> array_to_string(list_slice({_DUCK_WORDS}, i, i + 1), ' '))))
             AS DOUBLE) / greatest(len({_DUCK_WORDS}) - 1, 1), 6) < 0.6)
           AS repetitive
FROM documents
""", "distinct word/bigram repetition signals per doc")


# ------------------------------------------------- benchmark contamination
CONTAM_K = 5          # word n-gram size
CONTAM_MIN_SHARED = 3  # pairs reported at >= this many shared shingles
BENCH_MOD = 97         # every 97th doc seeds the synthetic benchmark set

# distinct word 5-gram shingles (mirrors dedup.py's bigram pattern)
_SPARK_5G = ("array_distinct(transform("
             " sequence(1, greatest(size({w}) - 4, 1)),"
             " i -> concat_ws(' ', slice({w}, i, 5))))")
_DUCK_5G = ("list_distinct(list_transform("
            " range(1, greatest(len({w}) - 4, 1) + 1),"
            " i -> array_to_string(list_slice({w}, i, i + 4), ' ')))")

# the benchmark text is a mutated copy (every 7th word dropped) of the
# seed docs, so planted contamination exists at every scale factor and
# detection is non-trivial (exact-copy overlap would be too easy)
_SPARK_MUT = f"filter({_SPARK_WORDS}, (w, i) -> ((i + 1) % 7) != 0)"
_DUCK_MUT = (f"list_transform(list_filter(range(1, len({_DUCK_WORDS}) + 1),"
             f" i -> i % 7 != 0), i -> ({_DUCK_WORDS})[i])")


def text_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(corpus doc, benchmark doc) pairs sharing >= CONTAM_MIN_SHARED
    distinct word 5-grams. The benchmark set (every BENCH_MOD-th doc,
    mutated) is exploded to (bench_id, shingle) and broadcast through
    the size gate; the corpus explodes once and joins map-side, so the
    corpus never shuffles — only the matched pairs do (final count)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.explode(F.expr(_SPARK_5G.format(w=_SPARK_WORDS))).alias("sh"))
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.explode(F.expr(_SPARK_5G.format(w=_SPARK_MUT))).alias("sh"))
    return (
        corpus.join(maybe_broadcast(bench, sf_dir, "documents"), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


register("text_ngram_contamination", text_ngram_contamination, f"""
WITH corpus AS (
    SELECT doc_id, unnest({_DUCK_5G.format(w=_DUCK_WORDS)}) AS sh
    FROM documents
), bench AS (
    SELECT doc_id AS bench_id, unnest({_DUCK_5G.format(w=_DUCK_MUT)}) AS sh
    FROM documents WHERE doc_id % {BENCH_MOD} = 0
)
SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
FROM corpus c JOIN bench b USING (sh)
GROUP BY c.doc_id, b.bench_id
HAVING COUNT(*) >= {CONTAM_MIN_SHARED}
""", "corpus docs sharing >= K distinct 5-grams with the benchmark set")


# ---------------------------------------------------------- chunking
CHUNK_TOKENS = 32


def doc_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking: each doc becomes ceil(n/32) chunks of
    up to 32 tokens, each with its position and a content hash (the
    shape a sequence-packing stage consumes). Explode is per-row; no
    shuffle anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(_SPARK_WORDS).alias("w"))
        .select(
            "doc_id", "w",
            F.explode(F.expr(
                f"sequence(0, cast(ceil(size(w) / {CHUNK_TOKENS}.0) as int) - 1)"
            )).alias("chunk_idx"))
        .select(
            "doc_id", "chunk_idx",
            F.expr(f"slice(w, chunk_idx * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})")
            .alias("chunk"))
        .select(
            "doc_id", "chunk_idx",
            F.size("chunk").alias("n_tokens"),
            F.md5(F.concat_ws(" ", "chunk")).alias("chunk_hash"))
    )


register("doc_chunk_tokens", doc_chunk_tokens, f"""
WITH w AS (
    SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
), chunks AS (
    SELECT doc_id, w,
           unnest(range(0, CAST(ceil(len(w) / {CHUNK_TOKENS}.0) AS INTEGER)))
               AS chunk_idx
    FROM w
)
SELECT doc_id, chunk_idx,
       len(list_slice(w, chunk_idx * {CHUNK_TOKENS} + 1,
                      chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS})) AS n_tokens,
       md5(array_to_string(list_slice(w, chunk_idx * {CHUNK_TOKENS} + 1,
                                      chunk_idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}),
                           ' ')) AS chunk_hash
FROM chunks
""", "fixed 32-token chunks with content hash per chunk")


# ------------------------------------------------------- quality gate
MIN_WORDS, MAX_WORDS = 20, 1000
MIN_AVG_WLEN, MAX_AVG_WLEN = 2.0, 12.0
MAX_STOP_RATIO = 0.3
_STOPWORDS = ("the", "a")


def quality_gate_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation funnel: word-count, mean-word-length and
    stopword-ratio gates, reported as pass rates per (lang, source) —
    the summary artifact a curation run publishes. One scan + one
    small-key groupBy shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    scored = docs.select(
        "lang", "source",
        F.expr(f"size({_SPARK_WORDS})").alias("n_words"),
        F.expr(f"cast(length(replace(text, ' ', '')) as double)"
               f" / size({_SPARK_WORDS})").alias("avg_wlen"),
        F.expr(f"cast(size(filter({_SPARK_WORDS}, w -> w IN ({stop_list})))"
               f" as double) / size({_SPARK_WORDS})").alias("stop_ratio"),
    ).withColumn(
        "pass",
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("avg_wlen").between(MIN_AVG_WLEN, MAX_AVG_WLEN)
        & (F.col("stop_ratio") <= MAX_STOP_RATIO),
    )
    return (
        scored.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.col("pass").cast("long")).alias("n_pass"))
        .withColumn("pass_rate",
                    F.round(F.col("n_pass") / F.col("n_docs"), 6))
        .orderBy("lang", "source")
    )


register("quality_gate_survivors", quality_gate_survivors, f"""
WITH scored AS (
    SELECT lang, source,
           len({_DUCK_WORDS}) AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len({_DUCK_WORDS}) AS avg_wlen,
           CAST(len(list_filter({_DUCK_WORDS},
                    w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)})))
                AS DOUBLE) / len({_DUCK_WORDS}) AS stop_ratio
    FROM documents
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                 AND avg_wlen BETWEEN {MIN_AVG_WLEN} AND {MAX_AVG_WLEN}
                 AND stop_ratio <= {MAX_STOP_RATIO}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       ROUND(SUM(CASE WHEN n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
                       AND avg_wlen BETWEEN {MIN_AVG_WLEN} AND {MAX_AVG_WLEN}
                       AND stop_ratio <= {MAX_STOP_RATIO}
                      THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate
FROM scored
GROUP BY lang, source
ORDER BY lang, source
""", "length/word-shape/stopword quality funnel pass rates")


# ---------------------------------------------- quality gate ablation
_DUCK_WORDS_QG = "string_split(lower(text), ' ')"


def quality_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate ablation of the quality funnel: for each of the three
    gates (word count, mean word length, stopword ratio) — the SAME
    thresholds as quality_gate_survivors — how many documents fail it
    at all (n_fail) and how many fail it ALONE (n_sole_fail: the docs
    that gate, and only that gate, removes), plus an 'any' row with the
    combined rejection. sole-fail is the number a curation review
    actually argues about: a gate with high n_fail but zero n_sole_fail
    is redundant with the others, a gate with high n_sole_fail is the
    binding constraint. Exact integer counts and integer-ppm rates.

    Scale shape: one corpus scan computes the three boolean flags
    (pure expressions), ONE global aggregate reduces them to seven
    integers, and the four output rows unpivot from that single
    aggregate row via stack — model-size everywhere after the scan."""
    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    scored = docs.select(
        F.expr(f"size({_SPARK_WORDS})").alias("n_words"),
        F.expr(f"cast(length(replace(text, ' ', '')) as double)"
               f" / size({_SPARK_WORDS})").alias("avg_wlen"),
        F.expr(f"cast(size(filter({_SPARK_WORDS}, w -> w IN ({stop_list})))"
               f" as double) / size({_SPARK_WORDS})").alias("stop_ratio"),
    ).select(
        (~F.col("n_words").between(MIN_WORDS, MAX_WORDS))
        .cast("int").alias("f_words"),
        (~F.col("avg_wlen").between(MIN_AVG_WLEN, MAX_AVG_WLEN))
        .cast("int").alias("f_wlen"),
        (F.col("stop_ratio") > MAX_STOP_RATIO).cast("int").alias("f_stop"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_words").alias("fw"),
        F.sum("f_wlen").alias("fl"),
        F.sum("f_stop").alias("fs"),
        F.sum(F.expr("cast(f_words = 1 and f_wlen = 0 and f_stop = 0"
                     " as int)")).alias("sw"),
        F.sum(F.expr("cast(f_wlen = 1 and f_words = 0 and f_stop = 0"
                     " as int)")).alias("sl"),
        F.sum(F.expr("cast(f_stop = 1 and f_words = 0 and f_wlen = 0"
                     " as int)")).alias("ss"),
        F.sum(F.expr("cast(f_words + f_wlen + f_stop > 0 as int)"))
        .alias("fa"),
    )
    return (agg.select(
        "n_docs",
        F.expr("stack(4,"
               " 'word_count', fw, sw,"
               " 'avg_word_len', fl, sl,"
               " 'stopword_ratio', fs, ss,"
               " 'any', fa, fa) AS (gate, n_fail, n_sole_fail)"))
        .select("gate", "n_docs",
                F.col("n_fail").cast("long").alias("n_fail"),
                F.col("n_sole_fail").cast("long").alias("n_sole_fail"),
                F.expr("n_fail * 1000000 div n_docs").alias("fail_ppm"),
                F.expr("n_sole_fail * 1000000 div n_docs")
                .alias("sole_fail_ppm"))
        .orderBy("gate"))


register("quality_gate_ablation", quality_gate_ablation, f"""
WITH scored AS (
    SELECT CASE WHEN len({_DUCK_WORDS_QG})
                BETWEEN {MIN_WORDS} AND {MAX_WORDS}
           THEN 0 ELSE 1 END AS f_words,
           CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len({_DUCK_WORDS_QG})
                BETWEEN {MIN_AVG_WLEN} AND {MAX_AVG_WLEN}
           THEN 0 ELSE 1 END AS f_wlen,
           CASE WHEN CAST(len(list_filter({_DUCK_WORDS_QG},
                     w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)})))
                     AS DOUBLE) / len({_DUCK_WORDS_QG}) > {MAX_STOP_RATIO}
           THEN 1 ELSE 0 END AS f_stop
    FROM documents
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_words) AS BIGINT) AS fw,
           CAST(SUM(f_wlen) AS BIGINT) AS fl,
           CAST(SUM(f_stop) AS BIGINT) AS fs,
           CAST(SUM(CASE WHEN f_words = 1 AND f_wlen = 0 AND f_stop = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS sw,
           CAST(SUM(CASE WHEN f_wlen = 1 AND f_words = 0 AND f_stop = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS sl,
           CAST(SUM(CASE WHEN f_stop = 1 AND f_words = 0 AND f_wlen = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS ss,
           CAST(SUM(CASE WHEN f_words + f_wlen + f_stop > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS fa
    FROM scored
), rows_out AS (
    SELECT 'word_count' AS gate, n_docs, fw AS n_fail, sw AS n_sole_fail
    FROM agg
    UNION ALL
    SELECT 'avg_word_len', n_docs, fl, sl FROM agg
    UNION ALL
    SELECT 'stopword_ratio', n_docs, fs, ss FROM agg
    UNION ALL
    SELECT 'any', n_docs, fa, fa FROM agg
)
SELECT gate, n_docs, n_fail, n_sole_fail,
       CAST(n_fail * 1000000 // n_docs AS BIGINT) AS fail_ppm,
       CAST(n_sole_fail * 1000000 // n_docs AS BIGINT) AS sole_fail_ppm
FROM rows_out ORDER BY gate
""", "per-gate fail / sole-fail ablation of the quality funnel")


# ------------------------------------ per-source quality gate ablation
def quality_gate_ablation_by_source(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The (lang, source) split of quality_gate_ablation (VERDICT r13
    ask #7): per corpus slice, which gate binds — n_fail / n_sole_fail
    per gate plus the combined 'any' row, same thresholds and sole-fail
    semantics as the global ablation. This is the per-source review a
    curation run argues about: a source whose binding constraint is the
    stopword gate needs a langid fix, one bound by word count needs a
    different chunker — the global row cannot say which.

    Scale shape: one corpus scan computes the three boolean flags, one
    small-key (lang, source) groupBy reduces them to seven integers per
    slice, and the four rows per slice unpivot from that aggregate via
    stack — identical to the global ablation with a grouped reduce.

    Cross-laws pinned in tests/test_r14_wave2.py: summing any column
    over slices reproduces the global ablation row, and each slice's
    'any' equals n_docs - n_pass of quality_gate_survivors' matching
    (lang, source) row."""
    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    scored = docs.select(
        "lang", "source",
        F.expr(f"size({_SPARK_WORDS})").alias("n_words"),
        F.expr(f"cast(length(replace(text, ' ', '')) as double)"
               f" / size({_SPARK_WORDS})").alias("avg_wlen"),
        F.expr(f"cast(size(filter({_SPARK_WORDS}, w -> w IN ({stop_list})))"
               f" as double) / size({_SPARK_WORDS})").alias("stop_ratio"),
    ).select(
        "lang", "source",
        (~F.col("n_words").between(MIN_WORDS, MAX_WORDS))
        .cast("int").alias("f_words"),
        (~F.col("avg_wlen").between(MIN_AVG_WLEN, MAX_AVG_WLEN))
        .cast("int").alias("f_wlen"),
        (F.col("stop_ratio") > MAX_STOP_RATIO).cast("int").alias("f_stop"),
    )
    agg = scored.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_words").alias("fw"),
        F.sum("f_wlen").alias("fl"),
        F.sum("f_stop").alias("fs"),
        F.sum(F.expr("cast(f_words = 1 and f_wlen = 0 and f_stop = 0"
                     " as int)")).alias("sw"),
        F.sum(F.expr("cast(f_wlen = 1 and f_words = 0 and f_stop = 0"
                     " as int)")).alias("sl"),
        F.sum(F.expr("cast(f_stop = 1 and f_words = 0 and f_wlen = 0"
                     " as int)")).alias("ss"),
        F.sum(F.expr("cast(f_words + f_wlen + f_stop > 0 as int)"))
        .alias("fa"),
    )
    return (agg.select(
        "lang", "source", "n_docs",
        F.expr("stack(4,"
               " 'word_count', fw, sw,"
               " 'avg_word_len', fl, sl,"
               " 'stopword_ratio', fs, ss,"
               " 'any', fa, fa) AS (gate, n_fail, n_sole_fail)"))
        .select("lang", "source", "gate", "n_docs",
                F.col("n_fail").cast("long").alias("n_fail"),
                F.col("n_sole_fail").cast("long").alias("n_sole_fail"),
                F.expr("n_fail * 1000000 div n_docs").alias("fail_ppm"),
                F.expr("n_sole_fail * 1000000 div n_docs")
                .alias("sole_fail_ppm"))
        .orderBy("lang", "source", "gate"))


register("quality_gate_ablation_by_source", quality_gate_ablation_by_source,
         f"""
WITH scored AS (
    SELECT lang, source,
           CASE WHEN len({_DUCK_WORDS_QG})
                BETWEEN {MIN_WORDS} AND {MAX_WORDS}
           THEN 0 ELSE 1 END AS f_words,
           CASE WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len({_DUCK_WORDS_QG})
                BETWEEN {MIN_AVG_WLEN} AND {MAX_AVG_WLEN}
           THEN 0 ELSE 1 END AS f_wlen,
           CASE WHEN CAST(len(list_filter({_DUCK_WORDS_QG},
                     w -> w IN ({', '.join(f"'{s}'" for s in _STOPWORDS)})))
                     AS DOUBLE) / len({_DUCK_WORDS_QG}) > {MAX_STOP_RATIO}
           THEN 1 ELSE 0 END AS f_stop
    FROM documents
), agg AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_words) AS BIGINT) AS fw,
           CAST(SUM(f_wlen) AS BIGINT) AS fl,
           CAST(SUM(f_stop) AS BIGINT) AS fs,
           CAST(SUM(CASE WHEN f_words = 1 AND f_wlen = 0 AND f_stop = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS sw,
           CAST(SUM(CASE WHEN f_wlen = 1 AND f_words = 0 AND f_stop = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS sl,
           CAST(SUM(CASE WHEN f_stop = 1 AND f_words = 0 AND f_wlen = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS ss,
           CAST(SUM(CASE WHEN f_words + f_wlen + f_stop > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS fa
    FROM scored GROUP BY lang, source
), rows_out AS (
    SELECT lang, source, 'word_count' AS gate, n_docs,
           fw AS n_fail, sw AS n_sole_fail
    FROM agg
    UNION ALL
    SELECT lang, source, 'avg_word_len', n_docs, fl, sl FROM agg
    UNION ALL
    SELECT lang, source, 'stopword_ratio', n_docs, fs, ss FROM agg
    UNION ALL
    SELECT lang, source, 'any', n_docs, fa, fa FROM agg
)
SELECT lang, source, gate, n_docs, n_fail, n_sole_fail,
       CAST(n_fail * 1000000 // n_docs AS BIGINT) AS fail_ppm,
       CAST(n_sole_fail * 1000000 // n_docs AS BIGINT) AS sole_fail_ppm
FROM rows_out ORDER BY lang, source, gate
""", "per-(lang, source) fail / sole-fail ablation of the quality funnel")


# --------------------------------------------- composed training manifest
def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation artifact, one query = the whole funnel:
    quality gate (same thresholds as quality_gate_survivors) -> exact
    dedup (keep min doc_id per content hash) -> content-keyed 80/10/10
    split (bucketed on md5 of the CONTENT hash, so residual exact
    duplicates could never straddle splits even if the dedup stage were
    skipped; the near-dup-safe variant is split_cluster_safe) -> chunk
    and token totals per (split, lang) — the manifest a training run
    consumes.

    Scale shape: one corpus scan computes gate signals + content hash
    (pure expressions); dedup is one shuffle on the content hash;
    the manifest agg is a tiny-key groupBy. Nothing corpus-sized ever
    sits in one task, and the final artifact is model-size
    (#splits x #langs rows).
    """
    from .curation import SPLIT_BUCKETS, _split_case

    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    scored = docs.select(
        "doc_id", "lang", "text",
        F.expr(f"size({_SPARK_WORDS})").alias("n_words"),
        F.expr(f"cast(length(replace(text, ' ', '')) as double)"
               f" / size({_SPARK_WORDS})").alias("avg_wlen"),
        F.expr(f"cast(size(filter({_SPARK_WORDS}, w -> w IN ({stop_list})))"
               f" as double) / size({_SPARK_WORDS})").alias("stop_ratio"),
    )
    passed = scored.filter(
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("avg_wlen").between(MIN_AVG_WLEN, MAX_AVG_WLEN)
        & (F.col("stop_ratio") <= MAX_STOP_RATIO)
    ).select("doc_id", "lang", "n_words", F.md5("text").alias("chash"))
    reps = passed.groupBy("chash").agg(F.min("doc_id").alias("doc_id"))
    kept = passed.join(reps, ["chash", "doc_id"])
    h = f"conv(substring(md5(chash), 1, 7), 16, 10) % {SPLIT_BUCKETS}"
    return (
        kept.withColumn("split", F.expr(_split_case(h)))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_words").alias("n_tokens"),
             F.sum(F.expr(f"(n_words + {CHUNK_TOKENS} - 1)"
                          f" div {CHUNK_TOKENS}")).alias("n_chunks"))
        .orderBy("split", "lang")
    )


def _manifest_oracle() -> str:
    from .curation import SPLIT_BUCKETS, _split_case

    h = (f"CAST(('0x' || substr(md5(chash), 1, 7)) AS BIGINT)"
         f" % {SPLIT_BUCKETS}")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    return f"""
WITH scored AS (
    SELECT doc_id, lang, text,
           len({_DUCK_WORDS}) AS n_words,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len({_DUCK_WORDS}) AS avg_wlen,
           CAST(len(list_filter({_DUCK_WORDS}, w -> w IN ({stop_list})))
                AS DOUBLE) / len({_DUCK_WORDS}) AS stop_ratio
    FROM documents
), passed AS (
    SELECT doc_id, lang, n_words, md5(text) AS chash FROM scored
    WHERE n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
      AND avg_wlen BETWEEN {MIN_AVG_WLEN} AND {MAX_AVG_WLEN}
      AND stop_ratio <= {MAX_STOP_RATIO}
), reps AS (
    SELECT chash, MIN(doc_id) AS doc_id FROM passed GROUP BY chash
), kept AS (
    SELECT p.* FROM passed p JOIN reps r
        ON p.chash = r.chash AND p.doc_id = r.doc_id
)
SELECT {_split_case(h)} AS split, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_tokens,
       CAST(SUM((n_words + {CHUNK_TOKENS} - 1) // {CHUNK_TOKENS}) AS BIGINT)
           AS n_chunks
FROM kept
GROUP BY split, lang
ORDER BY split, lang
"""


register("corpus_training_manifest", corpus_training_manifest,
         _manifest_oracle(),
         "quality gate -> exact dedup -> content-keyed split -> manifest")


# --------------------------------------------------- exact heavy hitters
HH_FRACTION = 0.0002  # report 3-grams above this corpus frequency
HH_MIN_COUNT = 3      # absolute floor so tiny corpora stay meaningful

_SPARK_3G = ("CASE WHEN size({w}) >= 3 THEN"
             " transform(sequence(1, size({w}) - 2),"
             " i -> concat_ws(' ', slice({w}, i, 3)))"
             " ELSE array() END")
_DUCK_3G = ("list_transform(range(1, greatest(len({w}) - 2, 0) + 1),"
            " i -> array_to_string(list_slice({w}, i, i + 2), ' '))")


def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-frequency heavy hitters (word 3-grams above
    HH_FRACTION of all 3-gram occurrences) via the two-pass
    candidate/confirm algorithm — the shape that works when the key
    space (n-grams) grows with the corpus and a full groupBy would
    shuffle the lake.

    Pass 1 (candidates, no shuffle): each Arrow batch emits the
    n-grams that are locally frequent (count >= batch_rows x
    HH_FRACTION). Pigeonhole guarantees NO false negative: an n-gram
    globally above the threshold must be locally above it in at least
    one batch — so the candidate set is a provable superset and the
    final answer is exact, not approximate. Pass 2 (confirm): semi-join
    the corpus to the (size-gated broadcast) candidates and count
    exactly; only candidate rows ever shuffle. At test scale the local
    thresholds floor at 1 and the candidate set degrades toward
    all-distinct (still correct, just unpruned); at lake scale
    batch_rows x fraction >> 1 and candidates collapse to the true
    heavy tail — the pruning kicks in exactly when it matters. The
    absolute-count floor keeps the guarantee: threshold >= N x
    fraction always, so the superset argument never weakens.
    """
    import pandas as pd  # noqa: F401  (mapInPandas batches are pandas)

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(F.expr(_SPARK_3G.format(w=_SPARK_WORDS))).alias("ng"))

    def _local_frequent(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            t = max(int(len(pdf) * HH_FRACTION), 1)
            vc = pdf["ng"].value_counts()
            yield vc[vc >= t].rename_axis("ng").reset_index()[["ng"]]

    cands = grams.mapInPandas(_local_frequent, schema="ng string").distinct()
    total = grams.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        grams.join(maybe_broadcast(cands, sf_dir, "documents"),
                   "ng", "left_semi")
        .groupBy("ng").agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(total)
        .filter(F.col("c") >= F.greatest(
            F.ceil(F.col("n_total") * F.lit(HH_FRACTION)),
            F.lit(HH_MIN_COUNT)))
        .select("ng", "c")
    )


register("text_heavy_hitters", text_heavy_hitters, f"""
WITH g AS (
    SELECT unnest({_DUCK_3G.format(w=_DUCK_WORDS)}) AS ng FROM documents
), tot AS (
    SELECT COUNT(*) AS n_total FROM g
)
SELECT ng, COUNT(*) AS c
FROM g, tot
GROUP BY ng, tot.n_total
HAVING COUNT(*) >= GREATEST(CEIL(tot.n_total * {HH_FRACTION}),
                            {HH_MIN_COUNT})
""", "exact 3-gram heavy hitters via local-frequent candidates + confirm")
