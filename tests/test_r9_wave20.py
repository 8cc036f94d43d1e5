"""Round-9 wave 20 kernels: independent references for Shapley
attribution (brute-force permutation enumeration — the DEFINITION,
not the coalition-sum formula the plan uses) and the Bass diffusion
fit (numpy least squares), plus the Shapley efficiency axiom."""

import itertools
import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.scoring_seq import (
    SHAP_CHANNELS, SHAP_N)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _user_masks(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    masks, conv = {}, set()
    for _, r in ev.iterrows():
        u = int(r["user_id"])
        if r["event_type"] == "purchase":
            conv.add(u)
        elif r["event_type"] in SHAP_CHANNELS:
            i = SHAP_CHANNELS.index(r["event_type"])
            masks[u] = masks.get(u, 0) | (1 << i)
        masks.setdefault(u, masks.get(u, 0))
    return masks, conv


def test_shapley_matches_permutation_definition(spark, sf_small):
    masks, conv = _user_masks(sf_small)
    conv_by_mask = Counter(masks[u] for u in conv)

    def v(s_mask):
        return sum(c for m, c in conv_by_mask.items()
                   if (m & ~s_mask) == 0)

    # Shapley by DEFINITION: average marginal contribution over all
    # n! channel orderings, kept exact in units of 1/n! = 1/24
    phi24 = Counter()
    for perm in itertools.permutations(range(SHAP_N)):
        s = 0
        for i in perm:
            phi24[i] += v(s | (1 << i)) - v(s)
            s |= (1 << i)
    got = {r["channel"]: r for r in
           _Q["attribution_shapley"].build(spark, sf_small).collect()}
    total_gain = v((1 << SHAP_N) - 1) - v(0)
    for i, ch in enumerate(SHAP_CHANNELS):
        assert got[ch]["phi_x24"] == phi24[i]
        if total_gain > 0:
            assert got[ch]["share_ppm"] == (
                phi24[i] * 1_000_000 // (24 * total_gain))
    # efficiency axiom: the 1/24-unit values sum to 24 * total gain
    assert sum(r["phi_x24"] for r in got.values()) == 24 * total_gain


def test_bass_matches_numpy_lstsq(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // 86_400_000_000_000)
    ev = ev.assign(d=d)
    fd = ev.groupby("user_id")["d"].min()
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    y = np.array([int((fd == dd).sum()) for dd in days], dtype=float)
    nprev = np.concatenate([[0.0], np.cumsum(y)[:-1]])
    X = np.stack([np.ones_like(nprev), nprev, nprev ** 2], axis=1)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    row = _Q["users_bass_diffusion"].build(spark, sf_small).collect()[0]
    assert row["n_days"] == len(days)
    if row["a_milli"] is None:
        # degenerate design (cumulative adoption takes < 3 distinct
        # levels at tiny SF) — the query NULLs every coefficient
        assert np.linalg.matrix_rank(X) < 3
        return
    assert math.isclose(row["a_milli"] / 1e3, beta[0],
                        rel_tol=1e-6, abs_tol=2e-3)
    assert math.isclose(row["b_micro"] / 1e6, beta[1],
                        rel_tol=1e-6, abs_tol=2e-6)
    assert math.isclose(row["c_nano"] / 1e9, beta[2],
                        rel_tol=1e-6, abs_tol=2e-9)
    if row["m_hat"] is not None and beta[2] < 0:
        disc = beta[1] ** 2 - 4 * beta[2] * beta[0]
        m = (-beta[1] - math.sqrt(disc)) / (2 * beta[2])
        assert math.isclose(row["m_hat"], m, rel_tol=1e-5, abs_tol=1.0)
