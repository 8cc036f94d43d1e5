"""Round-9 wave 25 kernels: independent references for the
calibration decision layer — Spiegelhalter's Z, the calibration
slope/intercept OLS, and first-crossing lift@k — replayed in
numpy/pandas from the raw events parquet with the same 64/256-bin
forecast convention."""

import math

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.calibration_ops import POS_TYPE
from impractical_impala_spark.queries.operating_point import (
    ECE_BINS, LIFT_KS, PR_BINS, SPIEG_D, Z_CRIT_MICRO)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _binned(sf_dir, n_bins):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["value"].notna()]
    mn, mx = ev["value"].min(), ev["value"].max()
    if mx == mn:
        b = np.zeros(len(ev), dtype=int)
    else:
        b = np.clip(np.floor((ev["value"] - mn) * n_bins / (mx - mn))
                    .astype(int), 0, n_bins - 1)
    y = (ev["event_type"] == POS_TYPE).astype(int).to_numpy()
    return b.to_numpy() if hasattr(b, "to_numpy") else b, y


def test_spiegelhalter_matches_numpy(spark, sf_small):
    b, y = _binned(sf_small, ECE_BINS)
    p = b / SPIEG_D
    num = ((y - p) * (1 - 2 * p)).sum()
    den = (p * (1 - p) * (1 - 2 * p) ** 2).sum()
    z = num / math.sqrt(den)
    row = _Q["events_spiegelhalter_z"].build(spark, sf_small).collect()[0]
    assert row["n"] == len(y)
    assert math.isclose(row["z_micro"] / 1e6, z, rel_tol=1e-6,
                        abs_tol=1e-5)
    assert row["well_calibrated"] == int(abs(row["z_micro"])
                                         <= Z_CRIT_MICRO)


def test_calibration_slope_matches_numpy(spark, sf_small):
    b, y = _binned(sf_small, ECE_BINS)
    slope_bin, intercept = np.polyfit(b.astype(float), y.astype(float), 1)
    row = _Q["events_calibration_slope"].build(spark, sf_small).collect()[0]
    assert row["n"] == len(y)
    assert math.isclose(row["slope_micro"] / 1e6, slope_bin * SPIEG_D,
                        rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(row["intercept_micro"] / 1e6, intercept,
                        rel_tol=1e-6, abs_tol=1e-5)


def test_lift_at_k_matches_pandas(spark, sf_small):
    b, y = _binned(sf_small, PR_BINS)
    df = pd.DataFrame({"bin": b, "y": y})
    hist = (df.groupby("bin").agg(nb=("y", "size"), pb=("y", "sum"))
            .sort_index(ascending=False))
    cum_n = hist["nb"].cumsum()
    cum_p = hist["pb"].cumsum()
    nn, pp = int(hist["nb"].sum()), int(hist["pb"].sum())
    got = {r["k_pct"]: r for r in
           _Q["events_lift_at_k"].build(spark, sf_small).collect()}
    for k in LIFT_KS:
        qual = cum_n[cum_n * 100 >= k * nn]
        n_taken = int(qual.min())
        tp = int(cum_p[cum_n == n_taken].iloc[0])
        r = got[k]
        assert r["n_taken"] == n_taken
        assert r["tp_taken"] == tp
        assert r["lift_ppm"] == tp * nn * 1_000_000 // (n_taken * pp)
        # the first-crossing prefix is a real operating point: the
        # smallest prefix covering at least k% of the population
        assert n_taken * 100 >= k * nn
