"""Driver-checkable query over the multimodal plumbing: the mapInPandas
byte-stats path must agree with a pure-SQL oracle (ASCII payloads make
char and byte counts coincide)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.blobs import documents_as_blobs, extract_features
from ..registry import register


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
