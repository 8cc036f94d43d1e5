"""Multimodal plumbing: schema, batching, determinism, stubbed decode."""

import numpy as np
import pytest

from impractical_impala_spark.multimodal import blobs as B


def test_decode_raises_for_non_png_without_codec_lib():
    """PNG now decodes for real in-container (tests/test_png_codec.py);
    formats that genuinely need an external codec (JPEG) still raise."""
    if B._PILImage is not None:
        pytest.skip("pillow installed — real decode path covered below")
    with pytest.raises(NotImplementedError):
        B.decode_image(b"\xff\xd8\xff\xe0...jpeg...")


def test_decode_real_path_with_pillow():
    """OPTIONAL extra coverage where pillow is importable (not this
    container — installs are disallowed here, so the built-in baseline
    PNG codec in multimodal/png.py carries the in-container real-decode
    coverage; see tests/test_png_codec.py): decode a pillow-generated
    2x2 PNG and check shape/values through the pillow tier."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    arr = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr).save(buf, format="PNG")
    got = B.decode_image(buf.getvalue())
    assert got.shape == (2, 2, 3)
    assert (got == arr).all()


def test_fake_features_deterministic_and_bounded():
    payload = bytes(range(256)) * 3
    f1, f2 = B.fake_features(payload), B.fake_features(payload)
    assert f1 == f2
    assert len(f1) == B.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in f1)
    assert B.fake_features(b"") == [0.0] * B.FEATURE_DIM


def test_extract_features_pipeline(spark, sf_small):
    df = B.extract_features(B.documents_as_blobs(spark, sf_small))
    rows = df.limit(20).collect()
    assert rows and df.schema == B.FEATURE_SCHEMA
    for r in rows:
        assert r.n_bytes > 0
        assert len(r.features) == B.FEATURE_DIM
        # features recomputable from the kernel's own definition
        assert 0.0 <= min(r.features) and max(r.features) <= 1.0


def test_feature_values_match_local_kernel(spark, sf_small):
    from impractical_impala_spark.sources import load_table

    doc = load_table(spark, sf_small, "documents").limit(5).collect()
    feats = {
        r.blob_id: r.features
        for r in B.extract_features(B.documents_as_blobs(spark, sf_small))
        .limit(500).collect()
    }
    for d in doc:
        want = B.fake_features(d.text.encode())
        np.testing.assert_allclose(feats[d.doc_id], want, atol=1e-12)


def test_resize_kernel_shape_and_determinism(spark, sf_small):
    df = B.resize_blobs(B.documents_as_blobs(spark, sf_small))
    rows = df.collect()
    assert rows and df.schema == B.RESIZE_SCHEMA
    for r in rows:
        assert len(r.resized) == B.RESIZE_OUT
    # positions are pure integer arithmetic: re-running is bit-identical
    again = {r.blob_id: bytes(r.resized) for r in df.collect()}
    assert all(bytes(r.resized) == again[r.blob_id] for r in rows)


def test_frame_sampler_emits_one_row_per_sampled_frame(spark, sf_small):
    from impractical_impala_spark.sources import load_table

    docs = {r.doc_id: r.text.encode()
            for r in load_table(spark, sf_small, "documents").collect()}
    out = B.sample_frames(B.documents_as_blobs(spark, sf_small)).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.blob_id, []).append(r)
    assert set(by_blob) == set(docs)
    for bid, rows in by_blob.items():
        n = len(docs[bid])
        n_frames = (n + B.FRAME_BYTES - 1) // B.FRAME_BYTES
        want_idx = list(range(0, n_frames, B.FRAME_STRIDE))
        assert sorted(r.frame_idx for r in rows) == want_idx
        for r in rows:
            fr = docs[bid][r.frame_idx * B.FRAME_BYTES:
                           (r.frame_idx + 1) * B.FRAME_BYTES]
            assert bytes(r.frame) == fr and r.frame_len == len(fr)


def test_ahash_matches_local_kernel(spark, sf_small):
    """The distributed aHash must equal a straight numpy reimplementation
    per blob (Arrow batching and the integer mean-compare leave no room
    for drift)."""
    import numpy as np

    from impractical_impala_spark.sources import load_table

    docs = {r.doc_id: r.text.encode()
            for r in load_table(spark, sf_small, "documents").collect()}
    got = {r.blob_id: r.ahash
           for r in B.ahash_blobs(B.documents_as_blobs(spark, sf_small))
           .collect()}
    assert set(got) == set(docs)
    for bid, blob in docs.items():
        arr = np.frombuffer(blob, dtype=np.uint8)
        idx = (np.arange(B.AHASH_CELLS, dtype=np.int64) * len(blob)) \
            // B.AHASH_CELLS
        cells = arr[idx].astype(np.int64)
        want = sum(1 << i for i, c in enumerate(cells)
                   if c * B.AHASH_CELLS > cells.sum())
        assert got[bid] == want, bid
        assert 0 <= got[bid] < (1 << B.AHASH_CELLS)  # sign bit never set


def test_phash_neardup_recalls_every_exact_copy(spark, sf_small):
    """Exact copies share the hash, so every 7th doc MUST appear as a
    hamming-0 pair with its offset copy — the recall floor of the
    blocked join. Mutated (every 11th, not 7th) docs are recalled iff
    their block bits survive the mean shift; assert a nonzero count so
    the near (not just exact) path is exercised."""
    from impractical_impala_spark.queries.multimodal import (
        PH_COPY_OFFSET, PH_MUT_OFFSET, multimodal_phash_neardup)
    from impractical_impala_spark.sources import load_table

    ids = [r.doc_id for r in
           load_table(spark, sf_small, "documents").select("doc_id")
           .collect()]
    rows = multimodal_phash_neardup(spark, sf_small).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for did in ids:
        if did % 7 == 0:
            assert pairs.get((did, did + PH_COPY_OFFSET)) == 0, did
    n_mut = sum(1 for (a, b) in pairs if b >= PH_MUT_OFFSET)
    assert n_mut > 0
