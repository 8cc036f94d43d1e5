"""Numeric detrending kernels (pure numpy, no Spark).

These are the only two operations in the reference Spark cannot express
with built-ins (SURVEY.md O22/O23). Both run per entity on short series
(<=60 points), so a dense solve is exact and trivially fast; they are
wrapped in Arrow-batched ``applyInPandas`` by operators/detrend.py.

Reference semantics preserved (validated against the 28 goldens):
- the filter runs on the NA-COMPACTED series — finite observations are
  treated as consecutive even across gaps (dtrendandstat_HP100.R:141-143,
  detrendandstat_quad.R:136-138);
- fewer than ``min_t`` finite observations -> all-NaN output
  (dtrendandstat_HP100.R:139, detrendandstat_quad.R:135);
- results are scattered back to the finite positions, NaN elsewhere.
"""

from __future__ import annotations

import numpy as np


_DENSE_MAX_T = 128  # above this, the O(T) banded solver takes over


def hp_filter_cycle(y: np.ndarray, lam: float) -> np.ndarray:
    """Hodrick-Prescott cycle of a fully-finite 1-D series: solve
    ``(I + lam * K'K) tau = y`` with K the (T-2)xT second-difference
    operator; cycle = y - tau. Matches mFilter::hpfilter(type='lambda')
    (dtrendandstat_HP100.R:141) to ~1e-12 on T<=60.

    Dense solve for short series; pentadiagonal LDL' (O(T)) beyond
    _DENSE_MAX_T — at scale, per-entity series can be arbitrarily long
    and O(T^3) would be the kernel's cliff."""
    y = np.asarray(y, dtype=np.float64)
    t = y.shape[0]
    if t < 3:
        return np.zeros_like(y)  # K is empty -> tau = y would need t>=3
    if t > _DENSE_MAX_T:
        return y - _hp_trend_banded(y, lam)
    k = np.zeros((t - 2, t))
    for i in range(t - 2):
        k[i, i] = 1.0
        k[i, i + 1] = -2.0
        k[i, i + 2] = 1.0
    a = np.eye(t) + lam * (k.T @ k)
    trend = np.linalg.solve(a, y)
    return y - trend


def _hp_trend_banded(y: np.ndarray, lam: float) -> np.ndarray:
    """O(T) pentadiagonal LDL' solve of (I + lam*K'K) tau = y.

    K'K has the classic [1, -4, 6, -4, 1] band with boundary rows
    [1, 5] / [-2, -4]; A is SPD so LDL' needs no pivoting."""
    t = y.shape[0]
    d0 = np.full(t, 6.0)
    d0[0] = d0[-1] = 1.0
    d0[1] = d0[-2] = 5.0
    a0 = 1.0 + lam * d0                       # main diagonal
    a1 = lam * np.full(t - 1, -4.0)
    a1[0] = a1[-1] = lam * -2.0               # first sub-diagonal
    a2 = lam * np.full(t - 2, 1.0)            # second sub-diagonal

    d = np.empty(t)
    l1 = np.zeros(t - 1)
    l2 = np.zeros(t - 2)
    for i in range(t):
        d[i] = a0[i]
        if i >= 1:
            d[i] -= l1[i - 1] ** 2 * d[i - 1]
        if i >= 2:
            d[i] -= l2[i - 2] ** 2 * d[i - 2]
        if i < t - 1:
            num = a1[i]
            if i >= 1:
                num -= l2[i - 1] * l1[i - 1] * d[i - 1]
            l1[i] = num / d[i]
        if i < t - 2:
            l2[i] = a2[i] / d[i]

    # forward: L z = y
    z = np.empty(t)
    z[0] = y[0]
    z[1] = y[1] - l1[0] * z[0]
    for i in range(2, t):
        z[i] = y[i] - l1[i - 1] * z[i - 1] - l2[i - 2] * z[i - 2]
    # diagonal
    w = z / d
    # backward: L' tau = w
    tau = np.empty(t)
    tau[-1] = w[-1]
    tau[-2] = w[-2] - l1[-1] * tau[-1]
    for i in range(t - 3, -1, -1):
        tau[i] = w[i] - l1[i] * tau[i + 1] - l2[i] * tau[i + 2]
    return tau


def hp_cycle(x: np.ndarray, lam: float, min_t: int = 30) -> np.ndarray:
    """O22 (dtrendandstat_HP100.R:136-145): NA-aware wrapper — compact,
    filter, scatter; all-NaN when fewer than min_t finite obs."""
    x = np.asarray(x, dtype=np.float64)
    out = np.full_like(x, np.nan)
    ok = np.isfinite(x)
    if ok.sum() >= min_t:
        out[ok] = hp_filter_cycle(x[ok], lam)
    return out


def quad_detrend(y: np.ndarray, t: np.ndarray, min_t: int = 30) -> np.ndarray:
    """O23 (detrendandstat_quad.R:132-140): residuals of OLS
    ``y ~ 1 + t + t^2`` over the finite observations, scattered back;
    all-NaN when fewer than min_t."""
    y = np.asarray(y, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    out = np.full_like(y, np.nan)
    ok = np.isfinite(y) & np.isfinite(t)
    if ok.sum() >= min_t:
        tt = t[ok]
        design = np.column_stack([np.ones_like(tt), tt, tt * tt])
        coef, *_ = np.linalg.lstsq(design, y[ok], rcond=None)
        out[ok] = y[ok] - design @ coef
    return out
