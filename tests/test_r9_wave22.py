"""Round-9 wave 22 kernels: independent references for Granger
causality (numpy OLS F-test), Little's law (pandas interval
counting), and VAD run extraction (pure-python runs)."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.multimodal import VAD_THRESH
from impractical_impala_spark.queries.spectral_info import (
    GC_F_CRIT_MICRO, GC_PAIRS)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def test_granger_matches_numpy_ftest(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // 86_400_000_000_000)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    series = {}
    for t in {x for p in GC_PAIRS for x in p}:
        c = ev[ev["event_type"] == t].groupby("d").size()
        series[t] = np.array([int(c.get(dd, 0)) for dd in days],
                             dtype=float)
    got = {r["direction"]: r for r in
           _Q["events_granger_causality"].build(spark, sf_small).collect()}
    for x_t, y_t in GC_PAIRS:
        y = series[y_t][1:]
        x1 = series[y_t][:-1]
        x2 = series[x_t][:-1]
        n = len(y)
        Xu = np.stack([np.ones(n), x1, x2], axis=1)
        Xr = np.stack([np.ones(n), x1], axis=1)
        bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
        br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
        rss_u = float(np.sum((y - Xu @ bu) ** 2))
        rss_r = float(np.sum((y - Xr @ br) ** 2))
        f = (rss_r - rss_u) * (n - 3) / rss_u
        r = got[f"{x_t}->{y_t}"]
        assert r["n_days"] == n
        assert math.isclose(r["f_micro"] / 1e6, f,
                            rel_tol=1e-6, abs_tol=2e-6)
        assert r["causal"] == int(r["f_micro"] > GC_F_CRIT_MICRO)


def test_littles_law_matches_pandas(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    ship = li.groupby("l_orderkey")["l_shipdate"].max()
    od = o.set_index("o_orderkey")["o_orderdate"]
    ship_d = pd.to_datetime(ship).dt.normalize()
    ord_d = pd.to_datetime(od).dt.normalize()
    joined = pd.DataFrame({"ship": ship_d}).join(
        pd.DataFrame({"ord": ord_d}), how="inner")
    lag = (joined["ship"] - joined["ord"]).dt.days
    d0, d1 = joined["ord"].min(), joined["ship"].max()
    n_days = (d1 - d0).days + 1
    # the sampled-L side only counts POSITIVE open spans (the fixture
    # contains ship-before-order rows), while W averages raw lags —
    # exactly the data-quality gap the residual surfaces
    open_days = int(lag.clip(lower=0).sum())
    lag_sum = int(lag.sum())
    row = _Q["orders_littles_law"].build(spark, sf_small).collect()[0]
    assert row["n_days"] == n_days
    assert row["n_orders"] == len(joined)
    assert row["l_milli"] == open_days * 1000 // n_days
    assert row["w_milli"] == lag_sum * 1000 // len(joined)
    assert row["lambda_milli"] == len(joined) * 1000 // n_days
    assert row["residual_ppm"] == (
        (open_days - lag_sum) * 1_000_000 // max(lag_sum, 1))


def test_vad_matches_python_runs(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for _, r in docs.iterrows():
        voiced = [1 if ord(ch) >= VAD_THRESH else 0 for ch in r["text"]]
        runs, cur, mx = 0, 0, 0
        for v in voiced:
            if v:
                cur += 1
                mx = max(mx, cur)
                if cur == 1:
                    runs += 1
            else:
                cur = 0
        a = agg[r["source"]]
        a[0] += 1
        a[1] += runs
        a[2] = max(a[2], mx)
        a[3] += sum(voiced)
        a[4] += len(voiced)
    got = {r["source"]: r for r in
           _Q["multimodal_vad_segments"].build(spark, sf_small).collect()}
    for src, (nb, nseg, mx, nv, ntot) in agg.items():
        r = got[src]
        assert (r["n_blobs"], r["n_segments"], r["max_run"]) == (
            nb, nseg, mx)
        assert r["voiced_ppm"] == nv * 1_000_000 // ntot
