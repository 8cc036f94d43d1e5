"""Round-8 kernel references: independent checks for the round-8
numerical additions — engine parity alone proves both engines run the
same arithmetic, not that the arithmetic is RIGHT."""

import numpy as np
import pytest

from impractical_impala_spark.functions.detrend import (
    HP_FX_SCALE, hp_cycle_fixedpoint, hp_filter_cycle, _trunc_div)


def test_trunc_div_matches_duckdb_semantics():
    """Spark ``div`` / DuckDB ``//`` truncate toward zero; the helper
    must match on every sign combination (Python // floors)."""
    import duckdb
    con = duckdb.connect()
    for a in (-7, -6, -1, 0, 1, 6, 7, 10 ** 20, -(10 ** 20) - 3):
        for b in (-3, -2, 2, 3, 101):
            got = _trunc_div(a, b)
            want = con.sql(
                f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
            ).fetchone()[0]
            assert got == int(want), (a, b, got, want)


@pytest.mark.parametrize("T", [3, 4, 10, 49, 86, 300])
def test_hp_fixedpoint_tracks_float_kernel(T):
    """The fixed-point cycle must track the float LDL'/dense solve to
    within a few centi units on realistic magnitudes — the documented
    quantization error of scale-1e6 truncating arithmetic, NOT an
    unbounded drift. Also pins the T<=128 dense path vs the integer
    banded path agreeing through two different factorizations."""
    rng = np.random.default_rng(T)
    vals = rng.uniform(0.01, 490.0, T)
    centi = [int(np.floor(v * 100)) for v in vals]
    fx = np.array(hp_cycle_fixedpoint(centi, lam=100), dtype=np.float64)
    fl = hp_filter_cycle(np.array(centi, dtype=np.float64), 100.0)
    assert np.abs(fx - fl).max() <= 5.0  # centi units, |cycle| ~ 3e4


def test_hp_fixedpoint_zero_series_and_constant():
    """A constant series has tau ~ y, cycle ~ 0 (within quantization);
    an all-zero series is exactly zero — no truncation-noise floor."""
    assert hp_cycle_fixedpoint([0] * 40) == [0] * 40
    const = hp_cycle_fixedpoint([12345] * 40)
    assert max(abs(c) for c in const) <= 2


def test_hp_fixedpoint_short_series_contract():
    """T < 3: K is empty, cycle defined as zero (float kernel
    contract, functions/detrend.py::hp_filter_cycle)."""
    assert hp_cycle_fixedpoint([5, -7]) == [0, 0]


def test_pca_topk_matches_eigh_spectrum():
    """Independent numpy reference for emb_pca_topk: the three fixed-
    point Rayleigh quotients must be MONOTONE decreasing and match the
    top numpy-eigh eigenvalues of the same quantized second-moment
    matrix within the spectral-gap convergence envelope (gap ~0.985 at
    sf0.01 -> gap^(2*128) ~ 0.02 residual mixing of adjacent
    eigenvalues); each iterate must live almost entirely in the top
    eigh subspace (contamination beyond rank 8 decays as
    (l9/l3)^128 ~ 1e-14)."""
    import pyarrow.parquet as pq

    from impractical_impala_spark.queries.ml_more import (
        PCA_SNORM, PCA_TOPK, Q_SCALE)

    x = np.stack(pq.read_table(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).to_pandas()["embedding"].to_numpy()).astype(np.float64)
    xq = np.floor(x * Q_SCALE).astype(np.int64)
    S = (xq.T @ xq).astype(np.float64)
    smax = np.abs(S).max()
    evals, evecs = np.linalg.eigh(S / smax)
    evals, evecs = evals[::-1], evecs[:, ::-1]

    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                "'/root/testdata/sf0.01/embeddings.parquet'")
    from impractical_impala_spark.queries.ml_more import _pca_topk_oracle
    out = con.execute(_pca_topk_oracle()).fetchdf()

    rays = (out.groupby("component").rayleigh_ppm.first()
            .to_numpy() / 1e6)
    assert (np.diff(rays) < 0).all(), f"non-monotone spectrum: {rays}"
    # Rayleigh_k within the gap envelope of eigh lambda_k
    for k in range(PCA_TOPK):
        assert abs(rays[k] - evals[k]) <= 0.01 * evals[k], (
            k, rays[k], evals[k])
    # subspace mass: each iterate ~entirely inside the top-8 subspace
    for k in range(1, PCA_TOPK + 1):
        v = (out[out.component == k].sort_values("dim_idx")
             .loading_q.to_numpy().astype(np.float64))
        v = v / np.linalg.norm(v)
        mass = np.linalg.norm(evecs[:, :8].T @ v)
        assert mass >= 0.999, (k, mass)


def test_hp_fixedpoint_overflow_headroom():
    """The documented overflow ladder: extreme centi magnitudes at the
    1e9 bound stay inside Python int exactly and produce cycles whose
    products remain far below HUGEINT's 1.7e38 ceiling."""
    rng = np.random.default_rng(7)
    centi = [int(v) for v in rng.integers(-(10 ** 9), 10 ** 9, 200)]
    cyc = hp_cycle_fixedpoint(centi, lam=100)
    # |l1*z| style intermediates bounded by ~T*max|y|*S*S
    assert max(abs(c) for c in cyc) < 200 * 10 ** 9
