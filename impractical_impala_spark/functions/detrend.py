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


HP_FX_SCALE = 10 ** 6  # fixed-point scale of the exact-integer HP twin


def _trunc_div(a: int, b: int) -> int:
    """Truncation-toward-zero integer division (Spark ``div``, DuckDB
    ``//``). Python's ``//`` floors, which differs on negative
    numerators — every division in the fixed-point recursion goes
    through this helper so both engines compute bit-identical state."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def hp_cycle_fixedpoint(centi: list[int], lam: int = 100) -> list[int]:
    """EXACT-integer twin of ``hp_filter_cycle``: the same pentadiagonal
    LDL' forward/backsolve of (I + lam*K'K) tau = y, run entirely in
    truncating fixed point at scale ``HP_FX_SCALE`` on an integer
    (centi-quantized) series, so a DuckDB recursive-CTE oracle can
    replay every step bit-identically (the events_holt_winters proof
    pattern applied to O22, dtrendandstat_HP100.R:136-145 semantics).

    Returns the centi-unit cycle ``trunc((y - tau) / S)`` per position.
    Quantization contract (documented, deterministic): input floor'd to
    centi, state at S=1e6, every division truncates toward zero.
    Overflow ladder (SCALE.md): with |centi| <= 1e9 and T <= 1e5 the
    largest intermediate (l1*z products) stays < 1e2 * 1e9*S * S ~ 1e26
    — inside both Python ints and DuckDB HUGEINT (1.7e38)."""
    s = HP_FX_SCALE
    s2 = s * s
    t = len(centi)
    y = [int(c) * s for c in centi]
    if t < 3:
        return [0] * t
    # band coefficients of A = I + lam*K'K, scaled by S. The diagonal
    # is the column-wise sum of squares of K's [1, -2, 1] stencil —
    # the indicator form is exact for ALL t (at t=3 the middle entry
    # is 4, which the usual [1, 5, 6, ..., 6, 5, 1] shorthand misses)
    a0 = [0] * t
    for i in range(t):
        c = ((1 if 2 <= i <= t - 1 else 0)
             + (4 if 1 <= i <= t - 2 else 0)
             + (1 if i <= t - 3 else 0))
        a0[i] = (1 + lam * c) * s
    a1 = [(-2 if i in (0, t - 2) else -4) * lam * s for i in range(t - 1)]
    a2v = lam * s
    # LDL' factorization
    d = [0] * t
    l1 = [0] * (t - 1)
    l2 = [0] * (t - 2)
    for i in range(t):
        di = a0[i]
        if i >= 1:
            di -= _trunc_div(l1[i - 1] * l1[i - 1] * d[i - 1], s2)
        if i >= 2:
            di -= _trunc_div(l2[i - 2] * l2[i - 2] * d[i - 2], s2)
        d[i] = di
        if i < t - 1:
            num = a1[i]
            if i >= 1:
                num -= _trunc_div(l2[i - 1] * l1[i - 1] * d[i - 1], s2)
            l1[i] = _trunc_div(num * s, di)
        if i < t - 2:
            l2[i] = _trunc_div(a2v * s, di)
    # forward: L z = y
    z = [0] * t
    z[0] = y[0]
    z[1] = y[1] - _trunc_div(l1[0] * z[0], s)
    for i in range(2, t):
        z[i] = (y[i] - _trunc_div(l1[i - 1] * z[i - 1], s)
                - _trunc_div(l2[i - 2] * z[i - 2], s))
    # diagonal: w = z / d (kept at scale S)
    w = [_trunc_div(z[i] * s, d[i]) for i in range(t)]
    # backward: L' tau = w
    tau = [0] * t
    tau[t - 1] = w[t - 1]
    tau[t - 2] = w[t - 2] - _trunc_div(l1[t - 2] * tau[t - 1], s)
    for i in range(t - 3, -1, -1):
        tau[i] = (w[i] - _trunc_div(l1[i] * tau[i + 1], s)
                  - _trunc_div(l2[i] * tau[i + 2], s))
    return [_trunc_div(y[i] - tau[i], s) for i in range(t)]


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
