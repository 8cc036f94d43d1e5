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


def hp_filter_cycle(y: np.ndarray, lam: float) -> np.ndarray:
    """Hodrick-Prescott cycle of a fully-finite 1-D series: solve
    ``(I + lam * K'K) tau = y`` with K the (T-2)xT second-difference
    operator; cycle = y - tau. Matches mFilter::hpfilter(type='lambda')
    (dtrendandstat_HP100.R:141) to ~1e-12 on T<=60."""
    y = np.asarray(y, dtype=np.float64)
    t = y.shape[0]
    if t < 3:
        return np.zeros_like(y)  # K is empty -> tau = y would need t>=3
    k = np.zeros((t - 2, t))
    for i in range(t - 2):
        k[i, i] = 1.0
        k[i, i + 1] = -2.0
        k[i, i + 2] = 1.0
    a = np.eye(t) + lam * (k.T @ k)
    trend = np.linalg.solve(a, y)
    return y - trend


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
