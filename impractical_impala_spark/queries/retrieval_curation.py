"""Round-9 wave 11: retrieval & curation completion.

Six operators a production retrieval / training-data stack still
needed, each exactly-oracle-checkable:

- ``emb_mmr_diversify``: greedy maximal-marginal-relevance top-k — the
  standard diversity re-ranker for retrieval-augmented sampling.
  Unrolled MMR_K greedy steps; similarity scalars are exact integer
  dot products pushed through single correctly-rounded IEEE ops
  (sqrt, *, /), so both engines compute bit-identical doubles — the
  trained-IVF determinism argument applied to re-ranking.
- ``bloom_filter_audit``: runtime-filter (Bloom) pushdown audit — the
  semi-join pre-filter every distributed engine applies to selective
  joins, with measured false-positive rate. The bit set is a DISTINCT
  position table bounded by BLOOM_M (model-size broadcast); membership
  is three broadcast semi-joins, no shuffle of the probe side.
- ``dedup_edit_distance_confirm``: blocked candidate pairs + prefix
  levenshtein confirm — the character-level confirm stage the
  token-level dedup family (jaccard/containment) lacks. Stop-block
  rule caps block size, prefix cap bounds the O(L^2) distance cost.
- ``retrieval_rrf_fusion``: reciprocal-rank fusion of the BM25 and a
  log-TF-IDF ranking over the shared query terms — the standard
  hybrid-retrieval combiner. Ranks are exact integers (nano-quantized
  scores); the RRF sum is two IEEE divisions in fixed order.
- ``text_charclass_profile``: per-source character-class census
  (letters/digits/whitespace/punct/non-ASCII) — the mojibake /
  charset-drift audit a corpus intake runs. Pure regexp counts,
  exact integers.
- ``attribution_position_based``: U-shaped (40/20/40) multi-touch
  attribution over gap-sessionized journeys, in exact integer
  micro-credits with deterministic remainder assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vecfold
from ..registry import register
from ..sources import load_table
from .monitor_eval import _ha_sql
from .paths_stats import SESSION_GAP_US
from .similarity import Q_SCALE
from .text_ir import BM25_B, BM25_K1, BM25_TERMS

# ------------------------------------------------- MMR diversification
MMR_QUERIES = 5   # query panel: vec_id < MMR_QUERIES
MMR_POOL = 20     # relevance pool per query (top by cosine)
MMR_K = 5         # diversified picks per query
# The SAME double literals on both engines (1 - 0.7 in doubles is NOT
# 0.3; spelling both constants avoids the engines disagreeing).
_LAM = "cast(0.7 as double)"
_ONE_MINUS_LAM = "cast(0.3 as double)"

_VQ_SPARK = (f"transform(embedding, x -> "
             f"cast(floor(cast(x as double) * {Q_SCALE}) as bigint))")
# pool-scale sims (panel x corpus is 5 x n; pool pairs are 20^2 per
# query): the fold stays — the unroll's per-instance plan bloat costs
# more than these row counts (vecfold.fold_dot docstring)
_IDOT = vecfold.fold_dot("q.vq", "c.vq", zero=vecfold.L_ZERO)


def emb_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR re-ranking: for each query, pick MMR_K results from
    its MMR_POOL-candidate pool maximizing
    lambda*sim(q,d) - (1-lambda)*max_{s in selected} sim(d,s);
    the first pick is pure relevance. Determinism: sims are exact
    int64 micro-dot products divided by sqrt's of exact integer ssq —
    every float op is a single correctly-rounded IEEE operation, so
    scores are bit-identical across engines and partitionings; ties
    break on vec_id. Scale shape: the pool is top-MMR_POOL per query
    (row_number cutoff), pairwise sims are pool-local (MMR_POOL^2 per
    query), and the greedy runs on the DRIVER over the collected pool
    — MMR_QUERIES x MMR_POOL = 100 rows BY CONSTRUCTION at any corpus
    size (model-size; audited in the hygiene allowlist). The corpus is
    touched once, by the distributed pool scan."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.expr(_VQ_SPARK).alias("vq"))
           .withColumn("ssq", F.expr(
               vecfold.fold_self_dot("vq", zero=vecfold.L_ZERO)))
           .cache())
    q = emb.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vq").alias("qvq"),
        F.col("ssq").alias("qssq"))
    c = emb.select(F.col("vec_id").alias("cand_id"), "vq", "ssq")
    sim = (f"cast({vecfold.fold_dot('qvq', 'vq', zero=vecfold.L_ZERO)}"
           " as double)"
           " / (sqrt(cast(qssq as double)) * sqrt(cast(ssq as double)))")
    # query panel is predicate-bounded -> it is the broadcast side
    scored = (F.broadcast(q).join(
        c, F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "vq", "ssq",
                F.expr(sim).alias("s")))
    wq = Window.partitionBy("query_id").orderBy(F.col("s").desc(),
                                                "cand_id")
    pool = (scored.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= MMR_POOL)
            .select("query_id", "cand_id", "vq", "ssq", "s"))
    # Optimization r15 (guide §1.2): the greedy itself runs on the
    # DRIVER over the collected pool. The pool is MMR_QUERIES x
    # MMR_POOL = 100 rows BY CONSTRUCTION at any corpus size (the
    # row_number cutoff above), i.e. model-size — the same class as
    # the k-centroid fetches the hygiene allowlist audits. The old
    # unrolled in-plan greedy cost MMR_K-1 join+window rounds (~40
    # stages) to re-rank 100 rows; the corpus is still touched exactly
    # once, by the distributed pool scan above.
    #
    # Bit-identity: pool-pair sims are cast(int64 dot as double) /
    # (sqrt(double ssq) * sqrt(double ssq)) — Python ints are exact,
    # float() of an int < 2^53 is exact, math.sqrt / * / / are the
    # same correctly-rounded IEEE-754 ops Spark executes; the MMR
    # score is 0.7*s - 0.3*mps with the identical double literals in
    # the identical op order. max()/sort tie-breaks replicate Spark's
    # total order (NaN greatest) via the isnan sort key.
    import math

    rows = pool.collect()  # <= MMR_QUERIES * MMR_POOL rows: model-size
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)

    def nan_hi(v: float) -> tuple:
        # NaN sorts greatest (Spark's total order), mapped to a FIXED
        # sentinel pair: two distinct NaN floats never compare equal in
        # Python, so a raw (isnan, v) key would freeze max() at
        # iteration order between two NaN-scored rows instead of
        # falling through to the cand_id tiebreak (ADVICE r15).
        return (1, 0.0) if math.isnan(v) else (0, v)

    out_rows = []
    for qid in sorted(by_q):
        cands = {r.cand_id: r for r in by_q[qid]}
        vq = {c: list(r.vq) for c, r in cands.items()}
        ssq = {c: float(r.ssq) for c, r in cands.items()}

        def ps(a: int, b: int) -> float:
            d = sum(x * y for x, y in zip(vq[a], vq[b]))  # exact int64
            return float(d) / (math.sqrt(ssq[a]) * math.sqrt(ssq[b]))

        first = max(cands.values(),
                    key=lambda r: (*nan_hi(r.s), -r.cand_id))
        selected = [first.cand_id]
        out_rows.append((qid, 1, first.cand_id, float(first.s)))
        for step in range(2, MMR_K + 1):
            rem = [r for r in cands.values()
                   if r.cand_id not in selected]
            if not rem:
                break
            scored_rem = []
            for r in rem:
                mps = max((ps(r.cand_id, b) for b in selected),
                          key=nan_hi)
                scored_rem.append((0.7 * r.s - 0.3 * mps, r.cand_id))
            score, cid = max(scored_rem,
                             key=lambda t: (*nan_hi(t[0]), -t[1]))
            selected.append(cid)
            out_rows.append((qid, step, cid, score))
    sel = spark.createDataFrame(
        out_rows, "query_id long, rnk int, cand_id long, score double")
    return (sel.select("query_id", "rnk",
                       F.col("cand_id").alias("neighbor_id"),
                       (F.round("score", 6) + 0.0).alias("mmr"))
            .orderBy("query_id", "rnk"))


def _mmr_oracle() -> str:
    vq = (f"list_transform(embedding, x -> "
          f"CAST(FLOOR(CAST(x AS DOUBLE) * {Q_SCALE}) AS DOUBLE))")
    parts = [f"""
WITH embq AS (
    SELECT vec_id, {vq} AS vq FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.vq,
           list_dot_product(q.vq, c.vq)
           / (sqrt(list_dot_product(q.vq, q.vq))
              * sqrt(list_dot_product(c.vq, c.vq))) AS s
    FROM embq q JOIN embq c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {MMR_QUERIES}
), pool AS (
    SELECT query_id, cand_id, vq, s
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, cand_id) AS rn
          FROM scored)
    WHERE rn <= {MMR_POOL}
), pairs AS (
    SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
           list_dot_product(a.vq, b.vq)
           / (sqrt(list_dot_product(a.vq, a.vq))
              * sqrt(list_dot_product(b.vq, b.vq))) AS ps
    FROM pool a JOIN pool b
      ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
), sel1 AS (
    SELECT query_id, cand_id, 1 AS rnk, s AS score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, cand_id) AS rn
          FROM pool)
    WHERE rn = 1
)"""]
    for i in range(2, MMR_K + 1):
        parts.append(f""", mx{i} AS (
    SELECT p.query_id, p.cand_id, p.s, MAX(pr.ps) AS mps
    FROM pool p
    JOIN pairs pr ON pr.query_id = p.query_id AND pr.a = p.cand_id
    JOIN sel{i - 1} s ON s.query_id = pr.query_id AND s.cand_id = pr.b
    WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} z
                      WHERE z.query_id = p.query_id
                        AND z.cand_id = p.cand_id)
    GROUP BY 1, 2, 3
), pick{i} AS (
    SELECT query_id, cand_id, {i} AS rnk, score
    FROM (SELECT query_id, cand_id,
                 {_LAM} * s - {_ONE_MINUS_LAM} * mps AS score,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY {_LAM} * s - {_ONE_MINUS_LAM} * mps DESC,
                              cand_id) AS rn
          FROM mx{i})
    WHERE rn = 1
), sel{i} AS (
    SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i}
)""")
    parts.append(f"""
SELECT query_id, rnk, cand_id AS neighbor_id,
       ROUND(score, 6) + 0.0 AS mmr
FROM sel{MMR_K}
ORDER BY query_id, rnk
""")
    return "".join(parts)


register("emb_mmr_diversify", emb_mmr_diversify, _mmr_oracle(),
         "greedy MMR diversity re-ranking (exact integer similarity)")


# ---------------------------------------------------- Bloom-filter audit
BLOOM_M = 8192           # bit positions
BLOOM_P = 2_147_483_647  # Mersenne prime 2^31-1
# (multiplier, offset) per hash — fixed constants both engines share
BLOOM_HASHES = ((2_654_435_761, 104_729),
                (2_246_822_519, 224_737),
                (3_266_489_917, 350_377))
BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(col: str, a: int, b: int) -> str:
    return f"(({col} * {a} + {b}) % {BLOOM_P}) % {BLOOM_M}"


def bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter audit: build a BLOOM_M-bit, 3-hash Bloom filter
    over the custkeys of one market segment (the dimension side of a
    selective join) and probe every order, reporting pass/true/false
    counts and the false-positive rate in ppm. The bit set is a
    DISTINCT position table (<= BLOOM_M rows — model-size) broadcast
    into three semi-joins, so the probe side never shuffles — exactly
    the plan shape engines use for runtime filter pushdown. All hash
    arithmetic is int64-exact ((key * a + b) mod p mod m; products
    < 2^62 for keys < 2^31), identical in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    build = (cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
             .select(F.col("c_custkey").alias("k")).cache())
    bits = None
    for a, b in BLOOM_HASHES:
        part = build.select(F.expr(_bloom_pos("k", a, b)).alias("pos"))
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct().cache()
    probe = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("k"))
    passed = probe
    for i, (a, b) in enumerate(BLOOM_HASHES):
        passed = passed.withColumn(f"h{i}", F.expr(_bloom_pos("k", a, b)))
    for i in range(len(BLOOM_HASHES)):
        passed = passed.join(
            F.broadcast(bits.withColumnRenamed("pos", f"h{i}")),
            f"h{i}", "left_semi")
    n_probe = probe.agg(F.count(F.lit(1)).alias("n_probe"))
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_pass"))
    true_m = probe.join(F.broadcast(build), "k", "left_semi").agg(
        F.count(F.lit(1)).alias("n_true"))
    return (n_probe.crossJoin(n_pass).crossJoin(true_m)
            .select("n_probe", "n_pass", "n_true",
                    (F.col("n_pass") - F.col("n_true"))
                    .alias("n_false_pos"),
                    F.expr("case when n_probe = n_true then 0 else "
                           "(n_pass - n_true) * 1000000"
                           " div (n_probe - n_true) end")
                    .alias("fp_ppm")))


_BLOOM_BITS_SQL = " UNION ".join(
    f"SELECT {_bloom_pos('c_custkey', a, b)} AS pos FROM customer "
    f"WHERE c_mktsegment = '{BLOOM_SEGMENT}'"
    for a, b in BLOOM_HASHES)

register("bloom_filter_audit", bloom_filter_audit, f"""
WITH bits AS (
    {_BLOOM_BITS_SQL}
), build AS (
    SELECT c_custkey AS k FROM customer
    WHERE c_mktsegment = '{BLOOM_SEGMENT}'
), probe AS (
    SELECT o_orderkey, o_custkey AS k FROM orders
), passed AS (
    SELECT * FROM probe
    WHERE {_bloom_pos('k', *BLOOM_HASHES[0])} IN (SELECT pos FROM bits)
      AND {_bloom_pos('k', *BLOOM_HASHES[1])} IN (SELECT pos FROM bits)
      AND {_bloom_pos('k', *BLOOM_HASHES[2])} IN (SELECT pos FROM bits)
), agg AS (
    SELECT (SELECT COUNT(*) FROM probe) AS n_probe,
           (SELECT COUNT(*) FROM passed) AS n_pass,
           (SELECT COUNT(*) FROM probe
            WHERE k IN (SELECT k FROM build)) AS n_true
)
SELECT CAST(n_probe AS BIGINT) AS n_probe,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
       CAST(CASE WHEN n_probe = n_true THEN 0 ELSE
            (n_pass - n_true) * 1000000 // (n_probe - n_true) END
            AS BIGINT) AS fp_ppm
FROM agg
""", "Bloom runtime-filter pushdown audit with measured FP rate")


# ----------------------------------------- edit-distance dedup confirm
ED_PFX_BLOCK = 8    # blocking prefix chars
ED_LEN_DIV = 16     # length-bucket width
ED_BLOCK_CAP = 16   # stop-block rule: skip blocks bigger than this
ED_PREFIX = 48      # levenshtein cost bound: compare 48-char prefixes
ED_MAX_DIST = 12    # confirm threshold


def dedup_edit_distance_confirm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup confirm: block documents on
    (length bucket, 8-char lowercase prefix), drop blocks larger than
    ED_BLOCK_CAP (the dedup family's stop-block discipline — a hot
    prefix would otherwise go quadratic), and confirm candidate pairs
    whose ED_PREFIX-char-prefix levenshtein distance is <= ED_MAX_DIST.
    The prefix cap bounds the O(L^2) DP per pair regardless of
    document length. Output: the confirmed pair list (exact integer
    distances), the evidence a survivorship pass consumes."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t"), "n_chars")
    blk = d.select(
        "doc_id", "t",
        F.expr(f"n_chars div {ED_LEN_DIV}").alias("lenb"),
        F.expr(f"substring(t, 1, {ED_PFX_BLOCK})").alias("pfx"))
    wb = Window.partitionBy("lenb", "pfx")
    keep = (blk.withColumn("bn", F.count(F.lit(1)).over(wb))
            .filter((F.col("bn") >= 2) & (F.col("bn") <= ED_BLOCK_CAP))
            .select("doc_id", "t", "lenb", "pfx"))
    a = keep.select("lenb", "pfx", F.col("doc_id").alias("doc_a"),
                    F.col("t").alias("ta"))
    b = keep.select("lenb", "pfx", F.col("doc_id").alias("doc_b"),
                    F.col("t").alias("tb"))
    return (a.join(b, ["lenb", "pfx"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", F.levenshtein(
                F.expr(f"substring(ta, 1, {ED_PREFIX})"),
                F.expr(f"substring(tb, 1, {ED_PREFIX})")).alias("dist"))
            .filter(F.col("dist") <= ED_MAX_DIST)
            .orderBy("dist", "doc_a", "doc_b"))


register("dedup_edit_distance_confirm", dedup_edit_distance_confirm, f"""
WITH d AS (
    SELECT doc_id, lower(text) AS t, n_chars FROM documents
), blk AS (
    SELECT doc_id, t, n_chars // {ED_LEN_DIV} AS lenb,
           substring(t, 1, {ED_PFX_BLOCK}) AS pfx
    FROM d
), sizes AS (
    SELECT lenb, pfx, COUNT(*) AS bn FROM blk GROUP BY 1, 2
), keep AS (
    SELECT b.doc_id, b.t, b.lenb, b.pfx
    FROM blk b JOIN sizes s USING (lenb, pfx)
    WHERE s.bn BETWEEN 2 AND {ED_BLOCK_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substring(a.t, 1, {ED_PREFIX}),
                        substring(b.t, 1, {ED_PREFIX})) AS INTEGER)
           AS dist
FROM keep a JOIN keep b
  ON a.lenb = b.lenb AND a.pfx = b.pfx AND a.doc_id < b.doc_id
WHERE levenshtein(substring(a.t, 1, {ED_PREFIX}),
                  substring(b.t, 1, {ED_PREFIX})) <= {ED_MAX_DIST}
ORDER BY dist, doc_a, doc_b
""", "blocked prefix-levenshtein near-dup confirmation pairs")


# ------------------------------------------------------- RRF fusion
RRF_K = 60
RRF_TOP = 10


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion: BM25 and log-TF-IDF rankings over
    the shared query terms, combined by reciprocal-rank fusion
    rrf = 1/(K+r1) + 1/(K+r2). Both rankings cover exactly the docs
    with >= 1 query-term hit, scored in nano-quantized integers
    (half-away rounding shared with the oracle), so ranks are exact
    integers; the fusion sum is two IEEE divisions in fixed order —
    deterministic. Scale: the ranked domain is the postings of
    |BM25_TERMS| terms, not the corpus; at larger scale the global
    row_number becomes top-R per ranker first (same cutoff)."""
    toks = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.expr("split(lower(text), ' ')").alias("w")))
    dl = toks.select("doc_id", F.expr("size(w)").alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("n_toks"))
    hits = (toks.select("doc_id", F.explode("w").alias("t"))
            .filter(F.col("t").isin(*BM25_TERMS))
            .groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf")))
    df_t = hits.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # literal spelling mirrors the hash-proven text_bm25_topk exactly —
    # the decimal literals promote to double on contact with ln()
    idf_bm = "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    bm_nano = _ha_sql(
        f"{idf_bm} * tf * ({BM25_K1} + 1.0)"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * dl * cast(n_docs as double) / n_toks)) * 1e9")
    tfidf_nano = _ha_sql(
        "ln(1.0 + tf) * ln(cast(n_docs as double) / df) * 1e9")
    scored = (hits.join(F.broadcast(df_t), "t")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus))
              .groupBy("doc_id")
              .agg(F.sum(F.expr(bm_nano)).alias("bm_nano"),
                   F.sum(F.expr(tfidf_nano)).alias("tfidf_nano")))
    ranked = (scored
              .withColumn("r_bm25", F.row_number().over(
                  Window.orderBy(F.col("bm_nano").desc(), "doc_id")))
              .withColumn("r_tfidf", F.row_number().over(
                  Window.orderBy(F.col("tfidf_nano").desc(), "doc_id"))))
    rrf = ("cast(1 as double) / (60 + r_bm25)"
           " + cast(1 as double) / (60 + r_tfidf)")
    return (ranked.select("doc_id", "r_bm25", "r_tfidf",
                          (F.round(F.expr(rrf), 6) + 0.0).alias("rrf"))
            .orderBy(F.expr(rrf).desc(), "doc_id")
            .limit(RRF_TOP))


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

register("retrieval_rrf_fusion", retrieval_rrf_fusion, f"""
WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), dl AS (
    SELECT doc_id, len(w) AS dl FROM toks
), corpus AS (
    SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl
), hits AS (
    SELECT doc_id, t, COUNT(*) AS tf
    FROM (SELECT doc_id, UNNEST(w) AS t FROM toks)
    WHERE t IN ({_TERMS_SQL})
    GROUP BY 1, 2
), df_t AS (
    SELECT t, COUNT(*) AS df FROM hits GROUP BY 1
), scored AS (
    SELECT h.doc_id,
           CAST(SUM({_ha_sql(
               f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf"
               f" * ({BM25_K1} + 1.0)"
               f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
               f" + {BM25_B} * dl * CAST(n_docs AS DOUBLE) / n_toks))"
               f" * 1e9")}) AS BIGINT) AS bm_nano,
           CAST(SUM({_ha_sql(
               "ln(1.0 + tf) * ln(CAST(n_docs AS DOUBLE) / df) * 1e9"
           )}) AS BIGINT) AS tfidf_nano
    FROM hits h
    JOIN df_t USING (t) JOIN dl USING (doc_id) CROSS JOIN corpus
    GROUP BY 1
), ranked AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY bm_nano DESC, doc_id) AS r_bm25,
           ROW_NUMBER() OVER (ORDER BY tfidf_nano DESC, doc_id)
               AS r_tfidf
    FROM scored
)
SELECT doc_id, CAST(r_bm25 AS INTEGER) AS r_bm25,
       CAST(r_tfidf AS INTEGER) AS r_tfidf,
       ROUND(CAST(1 AS DOUBLE) / (60 + r_bm25)
             + CAST(1 AS DOUBLE) / (60 + r_tfidf), 6) + 0.0 AS rrf
FROM ranked
ORDER BY CAST(1 AS DOUBLE) / (60 + r_bm25)
         + CAST(1 AS DOUBLE) / (60 + r_tfidf) DESC, doc_id
LIMIT {RRF_TOP}
""", "reciprocal-rank fusion of BM25 + log-TF-IDF rankings")


# ------------------------------------------------ charclass profile
_PUNCT = "!-/:-@\\[-`{-~"  # the four ASCII punctuation ranges


def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class census: letters, digits, whitespace,
    ASCII punctuation, non-ASCII, other — the charset-drift / mojibake
    audit a corpus intake runs per feed. Counts come from
    regexp_replace deletions (identical RE2/Java semantics for these
    explicit ASCII classes), summed as exact integers; letter share is
    integer ppm."""
    d = load_table(spark, sf_dir, "documents")

    def cnt(keep_class: str) -> F.Column:
        return F.length(F.regexp_replace(
            F.col("text"), f"[^{keep_class}]", ""))

    per_doc = d.select(
        "source",
        F.length("text").alias("total"),
        cnt("A-Za-z").alias("letters"),
        cnt("0-9").alias("digits"),
        cnt(" \\t\\n\\r").alias("spaces"),
        cnt(_PUNCT).alias("punct"),
        (F.length("text") - F.length(F.regexp_replace(
            F.col("text"), "[^\\x00-\\x7F]", ""))).alias("non_ascii"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("total").alias("n_chars"),
                 F.sum("letters").alias("letters"),
                 F.sum("digits").alias("digits"),
                 F.sum("spaces").alias("spaces"),
                 F.sum("punct").alias("punct"),
                 F.sum("non_ascii").alias("non_ascii"))
            .withColumn("other", F.expr(
                "n_chars - letters - digits - spaces - punct - non_ascii"))
            .withColumn("letter_ppm", F.expr(
                "case when n_chars = 0 then 0"
                " else letters * 1000000 div n_chars end"))
            .orderBy("source"))


register("text_charclass_profile", text_charclass_profile, f"""
WITH per_doc AS (
    SELECT source,
           length(text) AS total,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters,
           length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
           length(regexp_replace(text, '[^ \\t\\n\\r]', '', 'g'))
               AS spaces,
           length(regexp_replace(text, '[^{_PUNCT}]', '', 'g')) AS punct,
           length(text)
               - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
               AS non_ascii
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(total) AS BIGINT) AS n_chars,
       CAST(SUM(letters) AS BIGINT) AS letters,
       CAST(SUM(digits) AS BIGINT) AS digits,
       CAST(SUM(spaces) AS BIGINT) AS spaces,
       CAST(SUM(punct) AS BIGINT) AS punct,
       CAST(SUM(non_ascii) AS BIGINT) AS non_ascii,
       CAST(SUM(total) - SUM(letters) - SUM(digits) - SUM(spaces)
            - SUM(punct) - SUM(non_ascii) AS BIGINT) AS other,
       CAST(CASE WHEN SUM(total) = 0 THEN 0
            ELSE SUM(letters) * 1000000 // SUM(total) END AS BIGINT)
           AS letter_ppm
FROM per_doc
GROUP BY source
ORDER BY source
""", "per-source character-class census (charset-drift audit)")


# ----------------------------------------- position-based attribution
ATTR_CONVERT = "purchase"
ATTR_EDGE_MICRO = 400_000    # first / last touch credit
ATTR_MID_MICRO = 200_000     # shared by the middle touches


def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (40/20/40) multi-touch attribution: sessionize by
    30-minute gaps, find each session's FIRST conversion event, and
    split one unit of credit over the touches strictly before it —
    40% first, 40% last, 20% across the middles (1 touch -> 100%,
    2 touches -> 50/50). Credit is exact integer micro-units; the
    middle share uses integer division with the remainder assigned to
    the EARLIEST middles, so the split sums to exactly 1,000,000 and
    both engines agree bit-for-bit. Output: per event_type touch
    counts and total credit."""
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
    ws = Window.partitionBy("user_id", "sess_n").orderBy("ts_us",
                                                         "event_id")
    wsa = Window.partitionBy("user_id", "sess_n")
    ranked = (sess.withColumn("rn", F.row_number().over(ws))
              .withColumn("conv_rn", F.min(F.when(
                  F.col("event_type") == ATTR_CONVERT,
                  F.col("rn"))).over(wsa))
              .filter(F.col("conv_rn").isNotNull()
                      & (F.col("rn") < F.col("conv_rn")))
              .withColumn("n", F.col("conv_rn") - 1))
    credit = F.expr(f"""
        CASE WHEN n = 1 THEN 1000000
             WHEN n = 2 THEN 500000
             WHEN rn = 1 OR rn = n THEN {ATTR_EDGE_MICRO}
             ELSE {ATTR_MID_MICRO} div (n - 2)
                  + (CASE WHEN rn - 1 <= {ATTR_MID_MICRO} % (n - 2)
                          THEN 1 ELSE 0 END)
        END""")
    return (ranked.select("event_type", credit.alias("credit_micro"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_touches"),
                 F.sum("credit_micro").alias("credit_micro"))
            .orderBy("event_type"))


register("attribution_position_based", attribution_position_based, f"""
WITH ev AS (
    SELECT user_id, event_type, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
), gaps AS (
    SELECT *, CASE WHEN ts_us - lag(ts_us) OVER win > {SESSION_GAP_US}
                   OR lag(ts_us) OVER win IS NULL
              THEN 1 ELSE 0 END AS new_s
    FROM ev
    WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sess AS (
    SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS BIGINT) AS sess_n
    FROM gaps
), rnk AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sess_n
                                 ORDER BY ts_us, event_id) AS rn
    FROM sess
), ranked AS (
    SELECT *, MIN(CASE WHEN event_type = '{ATTR_CONVERT}'
                       THEN rn END)
                  OVER (PARTITION BY user_id, sess_n) AS conv_rn
    FROM rnk
), touches AS (
    SELECT event_type, rn, conv_rn - 1 AS n
    FROM ranked
    WHERE conv_rn IS NOT NULL AND rn < conv_rn
)
SELECT event_type,
       COUNT(*) AS n_touches,
       CAST(SUM(CASE WHEN n = 1 THEN 1000000
                     WHEN n = 2 THEN 500000
                     WHEN rn = 1 OR rn = n THEN {ATTR_EDGE_MICRO}
                     ELSE {ATTR_MID_MICRO} // (n - 2)
                          + (CASE WHEN rn - 1 <= {ATTR_MID_MICRO} % (n - 2)
                                  THEN 1 ELSE 0 END)
                END) AS BIGINT) AS credit_micro
FROM touches
GROUP BY event_type
ORDER BY event_type
""", "U-shaped (40/20/40) multi-touch attribution in exact micro-credits")
