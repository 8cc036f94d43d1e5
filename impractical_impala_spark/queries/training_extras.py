"""Round-2 training-pipeline additions: embedding quantization and
corpus length profiling — the storage/QA steps a 100 TB embedding +
document lake runs constantly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
