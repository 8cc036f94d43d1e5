"""Property tests for the numeric detrend kernels (SURVEY.md §5.4)."""

import numpy as np
import pytest

from impractical_impala_spark.functions.detrend import (hp_cycle,
                                                        hp_filter_cycle,
                                                        quad_detrend)

rng = np.random.default_rng(7)


def test_hp_lambda_zero_is_identity_trend():
    y = rng.normal(size=40).cumsum()
    cyc = hp_filter_cycle(y, 0.0)
    np.testing.assert_allclose(cyc, 0.0, atol=1e-12)


def test_hp_large_lambda_approaches_linear_trend():
    t = np.arange(50.0)
    y = 2.0 + 0.3 * t + rng.normal(scale=0.1, size=50)
    cyc = hp_filter_cycle(y, 1e8)
    ols = y - np.polyval(np.polyfit(t, y, 1), t)
    np.testing.assert_allclose(cyc, ols, atol=2e-3)


def test_hp_cycle_preserves_na_positions_and_compacts():
    y = rng.normal(size=45).cumsum() + 10
    x = np.concatenate([y[:20], [np.nan, np.nan], y[20:]])
    out = hp_cycle(x, 100.0, min_t=30)
    assert np.isnan(out[20]) and np.isnan(out[21])
    # gap-adjacent observations treated as consecutive (SURVEY §2.3.2)
    np.testing.assert_allclose(
        out[np.isfinite(x)], hp_filter_cycle(y, 100.0), atol=1e-12
    )


def test_hp_cycle_below_min_t_is_all_nan():
    out = hp_cycle(rng.normal(size=20), 100.0, min_t=30)
    assert np.isnan(out).all()


def test_quad_residuals_orthogonal_to_design():
    t = np.arange(1.0, 61.0)
    y = 1.0 + 0.05 * t - 0.001 * t**2 + rng.normal(scale=0.2, size=60)
    res = quad_detrend(y, t)
    for basis in (np.ones_like(t), t, t * t):
        assert abs(np.dot(res, basis)) < 1e-7 * np.linalg.norm(basis) * np.linalg.norm(y)


def test_quad_scatters_back_and_gates_min_t():
    t = np.arange(1.0, 41.0)
    y = t * 0.1
    y[5] = np.nan
    res = quad_detrend(y, t, min_t=30)
    assert np.isnan(res[5]) and np.isfinite(np.delete(res, 5)).all()
    assert np.isnan(quad_detrend(y[:20], t[:20], min_t=30)).all()


@pytest.mark.parametrize("lam", [6.25, 100.0, 1600.0])
@pytest.mark.parametrize("t", [129, 400, 2000])
def test_hp_banded_matches_dense(lam, t):
    """The O(T) pentadiagonal path (used above _DENSE_MAX_T) must agree
    with the dense solve to near machine precision."""
    from impractical_impala_spark.functions.detrend import _hp_trend_banded

    y = rng.normal(size=t).cumsum() + 50
    kmat = np.zeros((t - 2, t))
    for i in range(t - 2):
        kmat[i, i], kmat[i, i + 1], kmat[i, i + 2] = 1, -2, 1
    dense_tau = np.linalg.solve(np.eye(t) + lam * kmat.T @ kmat, y)
    banded_tau = _hp_trend_banded(y, lam)
    np.testing.assert_allclose(banded_tau, dense_tau, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("lam", [6.25, 100.0])
def test_hp_matches_penalty_normal_equations(lam):
    """cycle = y - tau with (I + lam K'K) tau = y: check the optimality
    condition K'K tau = (y - tau)/lam directly."""
    y = rng.normal(size=35).cumsum()
    cyc = hp_filter_cycle(y, lam)
    tau = y - cyc
    d2 = np.diff(tau, 2)
    k = np.zeros((33, 35))
    for i in range(33):
        k[i, i], k[i, i + 1], k[i, i + 2] = 1, -2, 1
    np.testing.assert_allclose(lam * (k.T @ d2), cyc, atol=1e-9)
