"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata;
processing happens in Arrow-batched ``mapInPandas`` kernels so bytes
never round-trip through Python row objects. Image decode is REAL for
baseline PNG via the self-contained stdlib-zlib codec (``png.py`` —
closes the r12–r14 real-codec ask in-container); pillow, where
importable, is the preferred path and extends coverage to other
formats. Non-PNG payloads without pillow raise ``NotImplementedError``
behind the deterministic fake — the Spark-side plumbing (schema,
batching, partitioning) is real and tested either way.

Scale notes: binary payloads dominate row size — ``mapInPandas``
streams Arrow batches (bounded by spark.sql.execution.arrow.
maxRecordsPerBatch) so executor memory stays flat; derived features are
small, so the expensive payload column should be projected away
immediately after extraction (done in ``extract_features``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("last_byte", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


try:  # optional real codec path — pillow is NOT in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - the in-container branch
    _PILImage = None


def decode_image(blob: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWx3 uint8 RGB array.

    Three tiers: pillow where importable (all formats); otherwise the
    built-in baseline-PNG codec (``png.py``, stdlib zlib — real and
    tested IN this container, closing the r12–r14 real-codec ask);
    otherwise NotImplementedError for formats needing external codecs
    (JPEG etc.). Registered (hash-checked) queries deliberately stay on
    ``fake_features`` in every tier, so driver hashes are identical
    with or without pillow."""
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("RGB"))
    from . import png

    if blob[:8] == png.SIGNATURE:
        return png.to_rgb(png.decode_png(blob))
    raise NotImplementedError(
        "non-PNG image codecs unavailable in this environment (pip "
        "install pillow to enable); baseline PNG decodes via the "
        "built-in codec; use fake_features() for deterministic "
        "pipeline tests"
    )


def fake_features(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in featurizer: mean of each of ``dim`` byte
    stripes, scaled to [0, 1]. Stable across runs and engines."""
    if len(blob) == 0:
        return [0.0] * dim
    arr = np.frombuffer(blob, dtype=np.uint8)
    stripes = np.array_split(arr, dim)
    return [float(s.mean()) / 255.0 if len(s) else 0.0 for s in stripes]


def extract_features(df: DataFrame, id_col: str = "blob_id",
                     blob_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, derive byte
    stats + fake features and DROP the payload (the wide column never
    crosses another shuffle)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame({
                "blob_id": pdf[id_col].astype("int64"),
                "n_bytes": blobs.str.len().astype("int64"),
                "first_byte": blobs.map(lambda b: int(b[0]) if len(b) else -1),
                "last_byte": blobs.map(lambda b: int(b[-1]) if len(b) else -1),
                "features": blobs.map(fake_features),
            })

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def documents_as_blobs(spark, sf_dir: str) -> DataFrame:
    """Demo binary table: document text as an opaque payload (the
    testdata ships no true binary column; ASCII text cast to binary
    exercises identical plumbing)."""
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.col("text").cast("binary").alias("payload"),
    )


# ------------------------------------------------------------- resize (stub)
RESIZE_OUT = 32  # bytes in the fake-resized payload

RESIZE_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_blobs(df: DataFrame, id_col: str = "blob_id",
                 blob_col: str = "payload") -> DataFrame:
    """Image-resize plumbing with the codec stubbed: nearest-neighbor
    downsample of the BYTE stream to RESIZE_OUT bytes (position i reads
    source byte floor(i*n/out) — deterministic, engine-portable). A
    real deployment swaps the sampler for a codec resize; the Spark
    side (Arrow batches in, binary payload out, payload-in/payload-out
    schema) is exactly what that kernel needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[blob_col]:
                n = len(blob)
                if n == 0:
                    out.append(b"")
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                idx = (np.arange(RESIZE_OUT, dtype=np.int64) * n) // RESIZE_OUT
                out.append(arr[idx].tobytes())
            yield pd.DataFrame({
                "blob_id": pdf[id_col].astype("int64"),
                "resized": out,
            })

    return df.mapInPandas(fn, RESIZE_SCHEMA)


# ---------------------------------------------------------- frame sampling
FRAME_BYTES = 64   # fake fixed-size frame
FRAME_STRIDE = 2   # keep every 2nd frame

FRAME_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_len", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("last_byte", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, id_col: str = "blob_id",
                  blob_col: str = "payload") -> DataFrame:
    """Video frame-sampling plumbing with the codec stubbed: the
    payload is treated as a sequence of FRAME_BYTES-byte frames and
    every FRAME_STRIDE-th frame is emitted as its OWN output row — the
    1-row-in/N-rows-out Arrow batch shape a real frame sampler has
    (mapInPandas output cardinality is free). Payload bytes never leave
    the kernel except as the (small) sampled frames."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, firsts, lasts, frames = [], [], [], [], [], []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                n = len(blob)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n_frames, FRAME_STRIDE):
                    fr = blob[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    ids.append(int(bid))
                    idxs.append(f)
                    lens.append(len(fr))
                    firsts.append(fr[0] if fr else -1)
                    lasts.append(fr[-1] if fr else -1)
                    frames.append(fr)
            yield pd.DataFrame({
                "blob_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_len": pd.Series(lens, dtype="int64"),
                "first_byte": pd.Series(firsts, dtype="int32"),
                "last_byte": pd.Series(lasts, dtype="int32"),
                "frame": frames,
            })

    return df.mapInPandas(fn, FRAME_SCHEMA)


# audio-style windowed energy over PCM-interpreted payload bytes
PCM_WIN = 64

ENERGY_SCHEMA = (
    "blob_id long, n_samples long, n_windows long, "
    "total_energy long, max_window_energy long"
)


def audio_energy(df: DataFrame, id_col: str = "blob_id",
                 blob_col: str = "payload") -> DataFrame:
    """Audio feature extraction with the codec stubbed: payload bytes
    are the PCM samples (a real decoder would produce int16 frames the
    same way), and the kernel computes windowed energy — the vectorized
    numpy inner loop a real DSP featurizer has. All arithmetic is
    integer (byte² sums), so the result is hash-exact against the SQL
    oracle with no float-order caveats."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                x = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                n = len(x)
                n_win = (n + PCM_WIN - 1) // PCM_WIN
                sq = x * x
                wins = [int(sq[w * PCM_WIN:(w + 1) * PCM_WIN].sum())
                        for w in range(n_win)]
                rows.append((int(bid), n, n_win, int(sq.sum()),
                             max(wins) if wins else 0))
            yield pd.DataFrame(rows, columns=[
                "blob_id", "n_samples", "n_windows",
                "total_energy", "max_window_energy"])

    return df.mapInPandas(fn, ENERGY_SCHEMA)


# ---------------------------------------------------- perceptual hash
AHASH_CELLS = 56   # fake 7x8 grid -> bits 0..55 (sign bit never set)

AHASH_SCHEMA = T.StructType([
    T.StructField("blob_id", T.LongType()),
    T.StructField("ahash", T.LongType()),
])


def ahash_blobs(df: DataFrame, id_col: str = "blob_id",
                blob_col: str = "payload") -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint with the codec
    stubbed: nearest-neighbor sample AHASH_CELLS bytes as the fake
    decoded grid, set bit i iff cell_i is above the grid mean. The
    mean compare is the INTEGER inequality 56*cell > sum(cells) — no
    float ever, so engines agree bit-for-bit. A real deployment decodes
    and downsamples pixels instead of bytes; the Spark side (Arrow
    batches in, one int64 fingerprint out, payload projected away) is
    exactly what that kernel needs. 56 cells, not 64: bit 63 would be
    the int64 sign bit, which DuckDB's BIGINT shift rejects."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(AHASH_CELLS, dtype=np.uint64)
        for pdf in batches:
            out = []
            for blob in pdf[blob_col]:
                n = len(blob)
                if n == 0:
                    out.append(0)
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                idx = (np.arange(AHASH_CELLS, dtype=np.int64) * n) \
                    // AHASH_CELLS
                cells = arr[idx].astype(np.int64)
                bits = (cells * AHASH_CELLS > cells.sum()).astype(np.uint64)
                out.append(int((bits << shifts).sum()))
            yield pd.DataFrame({
                "blob_id": pdf[id_col].astype("int64"),
                "ahash": pd.Series(out, dtype="int64"),
            })

    return df.mapInPandas(fn, AHASH_SCHEMA)
