"""Driver-checkable query over the multimodal plumbing: the mapInPandas
byte-stats path must agree with a pure-SQL oracle (ASCII payloads make
char and byte counts coincide)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..multimodal.blobs import documents_as_blobs, extract_features
from ..registry import register
from ..sources import load_table


def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level stats via the Arrow-batched kernel (features column
    dropped for the oracle compare — the fake featurizer is kernel-only
    by design)."""
    blobs = documents_as_blobs(spark, sf_dir)
    return extract_features(blobs).select(
        "blob_id", "n_bytes", "first_byte", "last_byte"
    )


register("multimodal_blob_stats", multimodal_blob_stats, """
SELECT doc_id AS blob_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CAST(ascii(left(text, 1)) AS INT) AS first_byte,
       CAST(ascii(right(text, 1)) AS INT) AS last_byte
FROM documents
""", "mapInPandas blob stats vs SQL oracle")


def multimodal_resized_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing under the hash gate: fake-resize every payload
    to 32 bytes (nearest-neighbor byte sampling — deterministic stand-in
    for a codec resize), then emit the resized length + byte-sum
    checksum. The oracle recomputes the identical sampling positions in
    SQL, so the kernel's Arrow round-trip, sampling arithmetic, and
    binary output column are all pinned."""
    from ..multimodal.blobs import documents_as_blobs, resize_blobs

    resized = resize_blobs(documents_as_blobs(spark, sf_dir))
    return resized.select(
        "blob_id",
        F.expr("cast(length(resized) as bigint)").alias("out_len"),
        F.expr("cast(aggregate(transform(sequence(1, length(resized)),"
               " i -> ascii(substring(cast(resized as string), i, 1))),"
               " 0L, (acc, x) -> acc + x) as bigint)").alias("checksum"),
    )


register("multimodal_resized_checksum", multimodal_resized_checksum, f"""
SELECT doc_id AS blob_id,
       CAST({32} AS BIGINT) AS out_len,
       CAST(list_sum(list_transform(range(0, {32}),
            i -> ascii(substr(text, CAST((i * length(text)) // {32} AS INT) + 1,
                              1)))) AS BIGINT) AS checksum
FROM documents
""", "mapInPandas fake-resize (nearest-neighbor byte sampling) vs SQL oracle")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: payload split into 64-byte fake frames,
    every 2nd frame emitted as its own row (1-row-in/N-rows-out kernel
    shape). Scalar per-frame metadata compared against a
    generate-series SQL twin."""
    from ..multimodal.blobs import documents_as_blobs, sample_frames

    frames = sample_frames(documents_as_blobs(spark, sf_dir))
    return frames.select("blob_id", "frame_idx", "frame_len",
                         "first_byte", "last_byte")


register("multimodal_frame_sample", multimodal_frame_sample, """
SELECT doc_id AS blob_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(least(64, length(text) - f * 64) AS BIGINT) AS frame_len,
       CAST(ascii(substr(text, f * 64 + 1, 1)) AS INT) AS first_byte,
       CAST(ascii(substr(text, f * 64 + least(64, length(text) - f * 64), 1))
            AS INT) AS last_byte
FROM documents,
     UNNEST(range(0, (length(text) + 63) // 64)) AS t(f)
WHERE f % 2 = 0
""", "mapInPandas frame sampler (1->N row kernel) vs generate-series oracle")


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed-energy kernel under the hash gate: integer byte² sums
    per 64-sample window keep the numpy path bit-identical to the SQL
    oracle (no float accumulation anywhere)."""
    from ..multimodal.blobs import audio_energy, documents_as_blobs

    return audio_energy(documents_as_blobs(spark, sf_dir))


# COALESCE(...,0) on the list folds: the kernel returns (0,0,0,0) for an
# empty payload while DuckDB's list_sum/list_max over an empty list give
# NULL — the guard makes the empty-document contract explicit instead of
# relying on the fixture staying non-empty. The byte-vs-char length
# equivalence (kernel counts bytes, oracle counts chars) is pinned by the
# ASCII fixture invariant in tests/test_query_invariants.py.
register("multimodal_audio_energy", multimodal_audio_energy, """
SELECT doc_id AS blob_id,
       CAST(length(text) AS BIGINT) AS n_samples,
       CAST((length(text) + 63) // 64 AS BIGINT) AS n_windows,
       CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
            i -> ascii(substr(text, i, 1)) * ascii(substr(text, i, 1)))), 0)
            AS BIGINT) AS total_energy,
       CAST(COALESCE(
            list_max(list_transform(range(0, (length(text) + 63) // 64),
            w -> list_sum(list_transform(
                 range(w * 64 + 1, least((w + 1) * 64, length(text)) + 1),
                 i -> ascii(substr(text, i, 1)) * ascii(substr(text, i, 1)))))),
            0) AS BIGINT) AS max_window_energy
FROM documents
""", "windowed PCM energy kernel (integer-exact) vs nested-list oracle")


# ------------------------------------- perceptual-hash near-dup join
PH_COPY_OFFSET = 9_000_000
PH_MUT_OFFSET = 9_500_000
PH_BLOCK_SHIFT = 40          # block on the top 16 of the 56 hash bits
PH_HAMMING_T = 6


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-style near-duplicate detection over binary payloads: the
    aHash kernel (multimodal/blobs.py::ahash_blobs, Arrow mapInPandas)
    fingerprints every blob to one int64, candidates block on the top
    16 hash bits (the simhash-prefix pattern — block cardinality grows
    with content diversity, so blocks stay bounded at scale), and
    survivors confirm with bit_count Hamming distance <= 6. The corpus
    is seeded in ONE scan with exact copies (every 7th doc -> Hamming
    0, always recalled) and first-byte mutations (every 11th doc ->
    near-dup recalled iff its block bits survive the mean shift, the
    documented LSH-style recall trade). No pair of payloads ever meets:
    only (id, 8-byte hash) rows cross the candidate shuffle."""
    from ..multimodal.blobs import ahash_blobs
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = F.expr(
        f"CASE WHEN doc_id % 7 = 0 THEN array("
        f" named_struct('doc_id', doc_id, 'text', text),"
        f" named_struct('doc_id', doc_id + {PH_COPY_OFFSET}, 'text', text))"
        f" WHEN doc_id % 11 = 0 THEN array("
        f" named_struct('doc_id', doc_id, 'text', text),"
        f" named_struct('doc_id', doc_id + {PH_MUT_OFFSET},"
        f"              'text', concat('Z', substring(text, 2))))"
        f" ELSE array(named_struct('doc_id', doc_id, 'text', text)) END")
    corpus = (docs.select(F.explode(variants).alias("v"))
              .select(F.col("v.doc_id").alias("blob_id"),
                      F.col("v.text").cast("binary").alias("payload")))
    # cache before deriving the a/b sides (dedup.py band-join
    # convention): the self-join would otherwise run the Arrow aHash
    # kernel — and the corpus explode feeding it — twice per query
    hashed = ahash_blobs(corpus).withColumn(
        "blk", F.expr(f"ahash >> {PH_BLOCK_SHIFT}")).cache()
    a = hashed.select(F.col("blob_id").alias("doc_a"),
                      F.col("ahash").alias("ha"), "blk")
    b = hashed.select(F.col("blob_id").alias("doc_b"),
                      F.col("ahash").alias("hb"), "blk")
    return (a.join(b, ["blk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming",
                        F.expr("bit_count(ha ^ hb)").cast("int"))
            .filter(F.col("hamming") <= PH_HAMMING_T)
            .select("doc_a", "doc_b", "hamming")
            .orderBy("doc_a", "doc_b"))


from ..multimodal.blobs import AHASH_CELLS  # noqa: E402

register("multimodal_phash_neardup", multimodal_phash_neardup, f"""
WITH corpus AS (
    SELECT doc_id AS blob_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PH_COPY_OFFSET}, text FROM documents
    WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + {PH_MUT_OFFSET}, 'Z' || substr(text, 2)
    FROM documents WHERE doc_id % 11 = 0 AND doc_id % 7 != 0
), cells AS (
    SELECT blob_id,
           list_transform(range(0, {AHASH_CELLS}),
               i -> ascii(substr(text,
                    CAST((i * length(text)) // {AHASH_CELLS} AS INT) + 1,
                    1))) AS c
    FROM corpus
), hashed AS (
    SELECT blob_id,
           CAST(list_sum(list_transform(range(0, {AHASH_CELLS}),
               i -> CASE WHEN c[i + 1] * {AHASH_CELLS} > list_sum(c)
                    THEN 1::BIGINT << i ELSE 0::BIGINT END)) AS BIGINT)
               AS ahash
    FROM cells
)
SELECT a.blob_id AS doc_a, b.blob_id AS doc_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM hashed a JOIN hashed b
  ON (a.ahash >> {PH_BLOCK_SHIFT}) = (b.ahash >> {PH_BLOCK_SHIFT})
 AND a.blob_id < b.blob_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {PH_HAMMING_T}
ORDER BY doc_a, doc_b
""", "aHash fingerprint -> prefix-blocked Hamming near-dup pairs")


# -------------------------------------------- chunk-level blob dedup
CHUNK_BYTES = 64


def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layer chunk deduplication audit over the blob payloads
    (fixed {CHUNK_BYTES}-byte blocks — the content-addressable-store
    mechanism behind every dedup filesystem; content-defined chunking
    swaps in a rolling-hash boundary but the census shape is
    identical): per source, block count, distinct block count (by
    md5) and the dedup win in ppm. The payload never shuffles — only
    (source, block-hash) pairs do, and the distinct is keyed on the
    hash space. Exact integers throughout."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("text").alias("payload"))
    chunks = docs.select(
        "source",
        F.explode(F.expr(
            f"transform(sequence(0, cast(ceil(length(payload)"
            f" / cast({CHUNK_BYTES} as double)) as int) - 1),"
            f" i -> md5(substring(payload, i * {CHUNK_BYTES} + 1,"
            f" {CHUNK_BYTES})))")).alias("h"))
    return (chunks.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.countDistinct("h").alias("n_unique"))
            .select("source", "n_chunks", "n_unique",
                    F.expr("(n_chunks - n_unique) * 1000000"
                           " div n_chunks").alias("dedup_ppm"))
            .orderBy("source"))


register("multimodal_chunk_dedup", multimodal_chunk_dedup, f"""
WITH chunks AS (
    SELECT source,
           md5(substr(text, i * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS h
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text)
               / CAST({CHUNK_BYTES} AS DOUBLE)) AS BIGINT))) AS u(i)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       CAST((COUNT(*) - COUNT(DISTINCT h)) * 1000000 // COUNT(*)
            AS BIGINT) AS dedup_ppm
FROM chunks GROUP BY source ORDER BY source
""", "fixed-block chunk-dedup census over blob payloads (md5 blocks)")


# ---------------------------------------------- fake-audio VAD runs
VAD_THRESH = 110  # byte-energy threshold ('n' — splits ASCII text)


def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection plumbing over the fake-audio payloads:
    treat each byte as an energy sample, threshold at VAD_THRESH, and
    extract the per-blob voiced segmentation — segment count, longest
    run, voiced fraction — with the reference run-length mechanics
    (lag + cumsum run ids) applied INSIDE blobs. Per-source
    aggregates keep the output model-size; byte explode happens once
    and the per-blob window is blob-local (no cross-blob state). The
    real VAD kernel would swap the threshold for a codec energy — the
    Spark-side shape (explode, blob-keyed windows, reduce) is what is
    being pinned."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("text").alias("payload"))
    bytes_ = docs.select(
        "doc_id", "source",
        F.posexplode(F.expr(
            "transform(sequence(1, length(payload)),"
            " i -> ascii(substring(payload, i, 1)))")).alias("pos", "v"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (bytes_
            .withColumn("voiced", F.expr(
                f"cast(v >= {VAD_THRESH} as int)"))
            .withColumn("prev", F.lag("voiced").over(w))
            .withColumn("start", F.expr(
                "cast(voiced = 1 and (prev is null or prev = 0) as int)"))
            .withColumn("run_id", F.sum("start").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    per_run = (runs.filter(F.col("voiced") == 1)
               .groupBy("doc_id", "source", "run_id")
               .agg(F.count(F.lit(1)).alias("run_len")))
    per_blob = (runs.groupBy("doc_id", "source")
                .agg(F.count(F.lit(1)).alias("n_bytes"),
                     F.sum("voiced").alias("n_voiced"))
                .join(per_run.groupBy("doc_id")
                      .agg(F.count(F.lit(1)).alias("n_segments"),
                           F.max("run_len").alias("max_run")),
                      "doc_id", "left")
                .select("source", "n_bytes", "n_voiced",
                        F.coalesce("n_segments", F.lit(0))
                        .alias("n_segments"),
                        F.coalesce("max_run", F.lit(0)).alias("max_run")))
    return (per_blob.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_blobs"),
                 F.sum("n_voiced").alias("voiced_bytes"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.sum("n_segments").alias("n_segments"),
                 F.max("max_run").alias("max_run"))
            .withColumn("voiced_ppm", F.expr(
                "voiced_bytes * 1000000 div total_bytes"))
            .select("source", "n_blobs", "n_segments", "max_run",
                    "voiced_ppm")
            .orderBy("source"))


register("multimodal_vad_segments", multimodal_vad_segments, f"""
WITH bytes_ AS (
    SELECT doc_id, source, u.i AS pos,
           ascii(substr(text, CAST(u.i AS INT), 1)) AS v
    FROM documents, UNNEST(range(1, length(text) + 1)) AS u(i)
), marked AS (
    SELECT doc_id, source, pos,
           CASE WHEN v >= {VAD_THRESH} THEN 1 ELSE 0 END AS voiced
    FROM bytes_
), started AS (
    SELECT *, CASE WHEN voiced = 1 AND COALESCE(LAG(voiced)
                   OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
              THEN 1 ELSE 0 END AS start
    FROM marked
), runs AS (
    SELECT doc_id, source, voiced,
           SUM(start) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
    FROM started
), per_run AS (
    SELECT doc_id, source, run_id, COUNT(*) AS run_len
    FROM runs WHERE voiced = 1 GROUP BY 1, 2, 3
), per_blob AS (
    SELECT r.doc_id, r.source,
           COUNT(*) AS n_bytes, SUM(r.voiced) AS n_voiced,
           COALESCE(MAX(pr.n_segments), 0) AS n_segments,
           COALESCE(MAX(pr.max_run), 0) AS max_run
    FROM runs r
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_segments,
                      MAX(run_len) AS max_run
               FROM per_run GROUP BY doc_id) pr
      ON r.doc_id = pr.doc_id
    GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_blobs,
       CAST(SUM(n_segments) AS BIGINT) AS n_segments,
       CAST(MAX(max_run) AS BIGINT) AS max_run,
       CAST(SUM(n_voiced) * 1000000 // SUM(n_bytes) AS BIGINT)
           AS voiced_ppm
FROM per_blob GROUP BY source ORDER BY source
""", "fake-audio VAD run extraction per blob, per-source census")
