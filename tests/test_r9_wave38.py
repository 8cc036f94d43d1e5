"""Round-9 wave 38 kernels: independent references — numpy Poisson
dispersion, a numpy log-OLS retention half-life, and a Counter-based
CSN power-law MLE on the same backbone degrees."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.analytics import (
    EPOCH0, HL_MIN_POINTS)
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.paths_stats import (
    PL_DMIN, cohort_edges)
from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_poisson_gof_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    got = {r["event_type"]: r for r in
           _Q["events_poisson_gof"].build(spark, sf_small).collect()}
    for t, g in ev.groupby("event_type"):
        c = g.groupby("d").size()
        x = np.array([int(c.get(dd, 0)) for dd in days], dtype=float)
        n = len(x)
        m = x.mean()
        chi2 = (((x - m) ** 2) / m).sum()
        disp = chi2 / (n - 1)
        z = (disp - 1) * math.sqrt((n - 1) / 2)
        r = got[t]
        assert r["n_days"] == n
        assert math.isclose(r["chi2_micro"] / 1e6, chi2,
                            rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(r["z_micro"] / 1e6, z,
                            rel_tol=1e-6, abs_tol=1e-4)
        assert r["overdispersed"] == int(r["z_micro"] > 1_959_964)


def test_retention_half_life_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts"])
    week = ((pd.to_datetime(ev["ts"]).dt.normalize()
             - pd.Timestamp(EPOCH0)).dt.days // 7).astype(int)
    ev = ev.assign(week=week)
    cohort = ev.groupby("user_id")["week"].min()
    active = ev.drop_duplicates(["user_id", "week"])
    active = active.assign(cw=active["user_id"].map(cohort))
    ret = (active.assign(off=active["week"] - active["cw"])
           .groupby(["cw", "off"]).size())
    got = {r["cohort_week"]: r for r in
           _Q["events_retention_half_life"].build(spark, sf_small)
           .collect()}
    for cw in sorted({c for c, _ in ret.index}):
        n0 = int(ret.get((cw, 0), 0))
        pts = [(off, _half_away(1e6 * math.log(int(ret[(c, off)]) / n0)))
               for (c, off) in ret.index if c == cw and off >= 1]
        if not pts:
            assert cw not in got
            continue
        r = got[cw]
        assert r["cohort_size"] == n0
        assert r["n_points"] == len(pts)
        if len(pts) >= HL_MIN_POINTS:
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts], dtype=float)
            npts = len(pts)
            slope = ((npts * (xs * ys).sum() - xs.sum() * ys.sum())
                     / (npts * (xs * xs).sum() - xs.sum() ** 2)) / 1e6
            if slope < 0:
                hl = math.log(2) / (-slope)
                assert math.isclose(r["half_life_milliweeks"] / 1e3, hl,
                                    rel_tol=1e-6, abs_tol=1e-2)
            else:
                assert r["half_life_milliweeks"] is None
        else:
            assert r["half_life_milliweeks"] is None


def test_degree_powerlaw_matches_counter(spark, sf_small):
    rows = cohort_edges(load_table(spark, sf_small, "events")).collect()
    deg = Counter()
    for r in rows:
        deg[r["a"]] += 1
        deg[r["b"]] += 1
    tail = [d for d in deg.values() if d >= PL_DMIN]
    lnsum = sum(
        _half_away(1e6 * math.log(dv / (PL_DMIN - 0.5))) * cnt
        for dv, cnt in Counter(tail).items())
    alpha = 1 + len(tail) * 1e6 / lnsum
    row = _Q["graph_degree_powerlaw"].build(spark, sf_small).collect()[0]
    assert row["n_tail_nodes"] == len(tail)
    assert row["d_min"] == PL_DMIN
    assert row["alpha_milli"] == _half_away(alpha * 1e3)
