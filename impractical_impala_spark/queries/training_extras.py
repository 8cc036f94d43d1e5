"""Round-2 training-pipeline additions: embedding quantization and
corpus length profiling — the storage/QA steps a 100 TB embedding +
document lake runs constantly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vecfold
from ..registry import register
from ..sources import load_table


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5) (floor-form, NOT round(): engines
    disagree on .5-boundary rounding modes, floor+0.5 is identical
    IEEE arithmetic on both). Emits the scale and the max absolute
    reconstruction error — pure expression work over the array column,
    one scan, no shuffle; the 4x storage cut is what makes brute-force
    rescoring affordable at lake scale."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    return (
        emb.withColumn(
            "scale",
            F.expr("aggregate(v, cast(0.0 as double),"
                   " (acc, x) -> greatest(acc, abs(x))) / 127.0"))
        .withColumn("q", F.expr(
            "transform(v, x -> cast(floor(x / scale + cast(0.5 as double))"
            " as int))"))
        .withColumn("max_abs_err", F.expr(
            "aggregate(zip_with(v, q, (x, qi) -> abs(x - qi * scale)),"
            " cast(0.0 as double), (acc, e) -> greatest(acc, e))"))
        .select("vec_id", "scale", "max_abs_err",
                F.expr("aggregate(q, 0L, (acc, qi) -> acc + abs(qi))")
                .alias("l1_quantized"))
    )


register("emb_quantize_int8", emb_quantize_int8, """
WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), scaled AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
    FROM emb
), quant AS (
    SELECT vec_id, v, scale,
           list_transform(v, x -> CAST(floor(x / scale + CAST(0.5 AS DOUBLE))
                                       AS INTEGER)) AS q
    FROM scaled
)
SELECT vec_id, scale,
       list_max(list_transform(list_zip(v, q),
                p -> abs(p[1] - p[2] * scale))) AS max_abs_err,
       CAST(list_sum(list_transform(q, qi -> abs(qi))) AS BIGINT)
           AS l1_quantized
FROM quant
""", "symmetric int8 embedding quantization with error bound")


def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length QA: whitespace-token-count histogram in buckets of
    25 tokens (capped at bucket 20) — scan + one tiny shuffle on the
    bucket id; the distribution a pipeline watches for truncation and
    boilerplate drift."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    return (
        docs.withColumn(
            "bucket",
            F.least(F.floor(F.col("n_tokens") / 25), F.lit(20)).cast("bigint"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("n_tokens").alias("min_tokens"),
             F.max("n_tokens").alias("max_tokens"))
        .orderBy("bucket")
    )


register("text_length_histogram", text_length_histogram, """
WITH toks AS (
    SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT LEAST(CAST(floor(n_tokens / 25.0) AS BIGINT), 20) AS bucket,
       COUNT(*) AS n_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM toks
GROUP BY 1
ORDER BY 1
""", "token-count histogram for corpus length QA")


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (training pipelines run this on every doc):
    regex email redaction with a match count and a content hash of the
    scrubbed text. The corpus is synthetic word soup, so every 4th doc
    is augmented with a deterministic doc_id-derived address — giving
    true positives at every scale factor. The pattern uses only
    character classes + quantifiers, which Java regex (Spark) and RE2
    (DuckDB) treat identically."""
    pat = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    augmented = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("text"), F.lit(" contact_"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com")))
        .otherwise(F.col("text")))
    return augmented.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))
        .cast("bigint").alias("n_emails"),
        F.md5(F.regexp_replace("text", pat, "[EMAIL]")).alias("redacted_md5"),
    )


register("text_redact_pii", text_redact_pii, r"""
WITH augmented AS (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN text || ' contact_' || CAST(doc_id AS VARCHAR)
                     || '@example.com'
                ELSE text END AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+'))
            AS BIGINT) AS n_emails,
       md5(regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+',
                          '[EMAIL]', 'g')) AS redacted_md5
FROM augmented
""", "regex email redaction with match counts (PII scrubbing pass)")


# -------------------------------------------------- product quantization
# PQ: split the 64-dim vector into M=4 contiguous 16-dim subspaces, code
# each subvector as its nearest entry in a per-subspace K=16 codebook.
# Like ann_ivf_probe, the codebook is seeded from the first K vectors so
# both engines derive the identical model (the trained variant of this
# idea is ann_ivf_trained's Lloyd loop, which applies unchanged per
# subspace). 4 bytes/vector instead of 256 — the memory ratio that makes
# billion-vector rescoring fit an executor.
PQ_M, PQ_SUB, PQ_K = 4, 16, 16


def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ codes + reconstruction distance. The subspace
    explode is a row-local flatMap (no shuffle); the codebook join is a
    64-row broadcast; the only shuffle is the final per-vector regroup.
    Distances are computed as an index-ordered left fold on BOTH
    engines, so argmin ties and sums are bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    sub = emb.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("m"),
                     F.expr(f"slice(v, {m * PQ_SUB + 1}, {PQ_SUB})")
                     .alias("sv"))
            for m in range(PQ_M)])).alias("e"),
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    codebook = sub.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code"), "m", F.col("sv").alias("cv"))
    # unrolled codegen sq-dist — bit-identical to the zip_with fold
    # (vecfold module docstring has the op-order argument)
    dist = F.expr(vecfold.sq_dist("sv", "cv", PQ_SUB))
    scored = sub.join(F.broadcast(codebook), "m").withColumn("dist", dist)
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "code")
    best = scored.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1)
    picks = [F.sum(F.when(F.col("m") == m, F.col("code"))).alias(f"code_{m}")
             for m in range(PQ_M)]
    dists = [F.sum(F.when(F.col("m") == m, F.col("dist"))).alias(f"_d{m}")
             for m in range(PQ_M)]
    agg = best.groupBy("vec_id").agg(*picks, *dists)
    # fixed-order sum of the 4 subspace distances (groupBy SUM over m
    # would add in partition order — not reproducible across engines)
    total = "+".join(f"_d{m}" for m in range(PQ_M))
    return agg.withColumn("recon_dist", F.round(F.expr(f"sqrt({total})"), 6)) \
        .select("vec_id", *[f"code_{m}" for m in range(PQ_M)], "recon_dist")


def _pq_oracle() -> str:
    slices = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m,"
        f" list_slice(v, {m * PQ_SUB + 1}, {(m + 1) * PQ_SUB}) AS sv FROM emb"
        for m in range(PQ_M))
    picks = ", ".join(
        f"CAST(SUM(CASE WHEN m = {m} THEN code END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M))
    dists = ", ".join(
        f"SUM(CASE WHEN m = {m} THEN dist END) AS _d{m}" for m in range(PQ_M))
    total = "+".join(f"_d{m}" for m in range(PQ_M))
    return f"""
WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), sub AS ({slices}),
codebook AS (
    SELECT vec_id AS code, m, sv AS cv FROM sub WHERE vec_id < {PQ_K}
), scored AS (
    SELECT s.vec_id, s.m, c.code,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, {PQ_SUB} + 1),
                       i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),
               (acc, d) -> acc + d) AS dist
    FROM sub s JOIN codebook c USING (m)
), best AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                 ORDER BY dist, code) AS rn
    FROM scored
), agg AS (
    SELECT vec_id, {picks}, {dists} FROM best WHERE rn = 1 GROUP BY vec_id
)
SELECT vec_id, {', '.join(f'code_{m}' for m in range(PQ_M))},
       ROUND(sqrt({total}), 6) AS recon_dist
FROM agg
"""


register("emb_pq_codes", emb_pq_codes, _pq_oracle(),
         "product-quantization codes with seed codebooks per subspace")


# ---------------------------------------------------- label centroids
def emb_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes), one row per
    (label, dimension) — the reduce behind nearest-centroid
    classification, per-class drift monitors, and IVF-style seeding
    from labeled data.

    Scale shape: posexplode multiplies rows by dim *before* the
    shuffle, but the hash aggregate's map-side combine collapses each
    task's output to ≤ labels × dim rows, so shuffle volume is
    #partitions × #labels × dim — model-size, independent of corpus
    row count. Output granularity (label, pos) keeps scalar columns
    only: array-valued outputs hash differently across engines,
    exploded rows are exact.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("c"),
             F.count(F.lit(1)).alias("n_vecs"))
    )


register("emb_label_centroid", emb_label_centroid, """
WITH ex AS (
    SELECT label, unnest(embedding) AS v,
           unnest(range(len(embedding))) AS pos
    FROM embeddings
)
SELECT label, pos, ROUND(AVG(v), 6) AS c, COUNT(*) AS n_vecs
FROM ex GROUP BY label, pos
""", "per-label mean embedding (class prototypes), exploded granularity")


# -------------------------------------- PQ asymmetric-distance top-k
ADC_NQ = 10    # query panel: vec_id < 10 (the similarity.py convention)
ADC_TOPK = 5


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search over PQ-COMPRESSED codes by asymmetric distance
    computation (ADC) — the memory-side half of an IVF-PQ index: each
    database vector is represented only by its {PQ_M} codebook codes
    (emb_pq_codes' assignment, seed codebooks = first {PQ_K} vectors),
    each query precomputes a {PQ_M}x{PQ_K} lookup table of exact
    subspace distances, and a vector's score is the sum of {PQ_M} LUT
    entries — the raw embedding is never touched at scan time. Scale
    shape: the LUT (queries x {PQ_M} x {PQ_K} rows) and codebook are
    broadcasts; the scan is one pass over the code table with a
    model-size top-k per query. Distances fold in index order and the
    {PQ_M} subspace terms add in fixed order, so doubles are
    bit-identical cross-engine; ADC quality is auditable against
    ann_cosine_topk's exact ranking."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    sub = emb.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("m"),
                     F.expr(f"slice(v, {m * PQ_SUB + 1}, {PQ_SUB})")
                     .alias("sv"))
            for m in range(PQ_M)])).alias("e"),
    ).select("vec_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    codebook = sub.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code"), "m", F.col("sv").alias("cv"))
    dist = F.expr(vecfold.sq_dist("sv", "cv", PQ_SUB))
    db_sub = sub.filter(F.col("vec_id") >= ADC_NQ)
    scored = db_sub.join(F.broadcast(codebook), "m").withColumn("dist", dist)
    w = Window.partitionBy("vec_id", "m").orderBy("dist", "code")
    codes = (scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).select("vec_id", "m", "code"))
    q_sub = sub.filter(F.col("vec_id") < ADC_NQ).select(
        F.col("vec_id").alias("query_id"), "m", "sv")
    lut = (q_sub.join(F.broadcast(codebook), "m")
           .withColumn("ld", dist)
           .select("query_id", "m", "code", "ld"))
    paired = codes.join(F.broadcast(lut), ["m", "code"])
    dists = [F.sum(F.when(F.col("m") == m, F.col("ld"))).alias(f"_d{m}")
             for m in range(PQ_M)]
    agg = paired.groupBy("query_id", "vec_id").agg(*dists)
    total = "+".join(f"_d{m}" for m in range(PQ_M))
    adc = agg.withColumn("adc_r6", F.round(F.expr(total), 6))
    wq = Window.partitionBy("query_id").orderBy("adc_r6", "vec_id")
    return (adc.withColumn("rank", F.row_number().over(wq))
            .filter(F.col("rank") <= ADC_TOPK)
            .select("query_id", "rank", "vec_id", "adc_r6")
            .orderBy("query_id", "rank"))


def _adc_oracle() -> str:
    slices = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m,"
        f" list_slice(v, {m * PQ_SUB + 1}, {(m + 1) * PQ_SUB}) AS sv FROM emb"
        for m in range(PQ_M))
    dist = (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform(range(1, {PQ_SUB} + 1),"
            " i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))),"
            " (acc, d) -> acc + d)")
    qdist = dist.replace("s.sv", "q.sv")
    dists = ", ".join(
        f"SUM(CASE WHEN m = {m} THEN ld END) AS _d{m}" for m in range(PQ_M))
    total = "+".join(f"_d{m}" for m in range(PQ_M))
    return f"""
WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), sub AS ({slices}),
codebook AS (
    SELECT vec_id AS code, m, sv AS cv FROM sub WHERE vec_id < {PQ_K}
), db_scored AS (
    SELECT s.vec_id, s.m, c.code, {dist} AS dist
    FROM (SELECT * FROM sub WHERE vec_id >= {ADC_NQ}) s
    JOIN codebook c USING (m)
), codes AS (
    SELECT vec_id, m, code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                     ORDER BY dist, code) AS rn
        FROM db_scored) WHERE rn = 1
), lut AS (
    SELECT q.vec_id AS query_id, q.m, c.code, {qdist} AS ld
    FROM (SELECT * FROM sub WHERE vec_id < {ADC_NQ}) q
    JOIN codebook c USING (m)
), agg AS (
    SELECT l.query_id, k.vec_id, {dists}
    FROM codes k JOIN lut l USING (m, code)
    GROUP BY 1, 2
), ranked AS (
    SELECT query_id, vec_id, ROUND({total}, 6) AS adc_r6,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ROUND({total}, 6), vec_id) AS rank
    FROM agg
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id, adc_r6
FROM ranked WHERE rank <= {ADC_TOPK} ORDER BY query_id, rank
"""


register("ann_pq_adc_topk", ann_pq_adc_topk, _adc_oracle(),
         "PQ asymmetric-distance (ADC) top-k over compressed codes")
