"""Round-9 wave 23 kernels: independent references for one-way ANOVA
(numpy group moments), the day-block permutation + BH step-up
(hashlib md5 + exact integer replay), Ljung-Box (numpy centered
autocorrelations), and Bartlett (float formula replay)."""

import hashlib
import math

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.hypothesis import (
    CHI2_95, LB_LAGS, PERM_K, _half_away)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def _events(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ts_ns = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    return ev.assign(d=ts_ns // DAY_NS,
                     centi=np.floor(ev["value"] * 100).astype("int64"))


def test_anova_matches_numpy(spark, sf_small):
    ev = _events(sf_small)
    groups = [g["centi"].to_numpy(dtype=float)
              for _, g in ev.groupby("event_type")]
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = _Q["events_anova_f"].build(spark, sf_small).collect()[0]
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert math.isclose(row["f_micro"] / 1e6, f, rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(row["eta2_ppm"] / 1e6, ssb / (ssb + ssw),
                        rel_tol=1e-6, abs_tol=1e-5)
    crit = CHI2_95[k - 1] / (k - 1)
    assert row["significant"] == int(row["f_micro"] > _half_away(crit * 1e6))


def test_perm_bh_matches_hashlib_replay(spark, sf_small):
    ev = _events(sf_small)
    daily = (ev.groupby(["event_type", "d"])
             .agg(c=("centi", "size"), s=("centi", "sum")).reset_index())
    dmid = (int(ev["d"].min()) + int(ev["d"].max())) // 2
    got = {r["event_type"]: r for r in
           _Q["events_perm_bh_fdr"].build(spark, sf_small).collect()}
    stats = {}
    for t, g in daily.groupby("event_type"):
        ea = g[g["d"] <= dmid]
        lb = g[g["d"] > dmid]
        na, sa = int(ea["c"].sum()), int(ea["s"].sum())
        nb, sb = int(lb["c"].sum()), int(lb["s"].sum())
        d_obs = abs(sa * nb - sb * na)
        c_exceed = 0
        for k in range(PERM_K):
            pna = psa = pnb = psb = 0
            for _, r in g.iterrows():
                key = f"{t}_{int(r['d'])}_{k}".encode()
                bit = int(hashlib.md5(key).hexdigest()[:7], 16) % 2
                if bit == 0:
                    pna += int(r["c"])
                    psa += int(r["s"])
                else:
                    pnb += int(r["c"])
                    psb += int(r["s"])
            if pna == 0 or pnb == 0:
                c_exceed += 1
            elif abs(psa * pnb - psb * pna) * (na * nb) >= \
                    d_obs * (pna * pnb):
                c_exceed += 1
        stats[t] = (na, nb, c_exceed)
        r = got[t]
        assert (r["n_early"], r["n_late"]) == (na, nb)
        assert r["c_exceed"] == c_exceed
        assert r["p_milli"] == _half_away(
            1e3 * (1 + c_exceed) / (PERM_K + 1))
    # BH step-up replay over the exact rational p-values
    m = len(stats)
    order = sorted(stats, key=lambda t: (stats[t][2], t))
    i_max = 0
    for i, t in enumerate(order, start=1):
        if 20 * m * (1 + stats[t][2]) <= i * (PERM_K + 1):
            i_max = i
    for i, t in enumerate(order, start=1):
        assert got[t]["bh_reject"] == int(i <= i_max), t


def test_ljung_box_matches_numpy(spark, sf_small):
    ev = _events(sf_small)
    dmin, dmax = int(ev["d"].min()), int(ev["d"].max())
    days = np.arange(dmin, dmax + 1)
    got = {r["event_type"]: r for r in
           _Q["events_ljung_box"].build(spark, sf_small).collect()}
    for t, g in ev.groupby("event_type"):
        c = g.groupby("d").size()
        x = np.array([int(c.get(d, 0)) for d in days], dtype=float)
        n = len(x)
        xc = x - x.mean()
        den = (xc ** 2).sum()
        q = 0.0
        for k in range(1, LB_LAGS + 1):
            rho = (xc[k:] * xc[:-k]).sum() / den
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        r = got[t]
        assert r["n_days"] == n
        assert math.isclose(r["q_micro"] / 1e6, q,
                            rel_tol=1e-6, abs_tol=1e-5)
        assert r["white_noise"] == int(
            r["q_micro"] <= _half_away(CHI2_95[LB_LAGS] * 1e6))


def test_bartlett_matches_float_replay(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100).astype("int64")
    groups = [cents[(li["l_returnflag"] == f).to_numpy()].astype(float)
              for f in sorted(li["l_returnflag"].unique())]
    k = len(groups)
    n = sum(len(g) for g in groups)
    vs = [g.var(ddof=1) for g in groups]
    vp = sum((len(g) - 1) * v for g, v in zip(groups, vs)) / (n - k)
    num = (n - k) * math.log(vp) - sum(
        (len(g) - 1) * math.log(v) for g, v in zip(groups, vs))
    c = 1 + (sum(1 / (len(g) - 1) for g in groups) - 1 / (n - k)) \
        / (3 * (k - 1))
    chi2 = num / c
    row = _Q["lineitem_bartlett_test"].build(spark, sf_small).collect()[0]
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert math.isclose(row["chi2_micro"] / 1e6, chi2,
                        rel_tol=1e-5, abs_tol=1e-4)
    assert row["homogeneous"] == int(
        row["chi2_micro"] <= _half_away(CHI2_95[k - 1] * 1e6))
