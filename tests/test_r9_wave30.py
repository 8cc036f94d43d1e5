"""Round-9 wave 30 kernels: independent references — a numpy
eigenvector check plus an exact fixed-point replay for the Markov
stationary distribution, a Counter-based transfer entropy, and a
pure-python modularity replay on the same backbone."""

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.dynamics import (
    MS_ITERS, MS_SCALE, TE_PAIRS)
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.paths_stats import cohort_edges
from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def _transitions(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])
    ev["ts_us"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                   .astype("int64") // 1000)
    cnt = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts_us", "event_id"])["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    return cnt, ev


def test_markov_stationary_matches_fixed_point_and_eigen(spark, sf_small):
    cnt, ev = _transitions(sf_small)
    types = sorted({a for a, _ in cnt} | {b for _, b in cnt})
    row = {t: sum(v for (a, _), v in cnt.items() if a == t)
           for t in types}
    # exact fixed-point replay
    v = {t: MS_SCALE // len(types) for t in types}
    for _ in range(MS_ITERS):
        nv = defaultdict(int)
        for (a, b), c in cnt.items():
            nv[b] += _half_away(v[a] * c / row[a])
        v = dict(nv)
    got = {r["event_type"]: r for r in
           _Q["events_markov_stationary"].build(spark, sf_small).collect()}
    for t in types:
        assert got[t]["stationary_ppm"] == v[t] // 1000
    # and the fixed point is the true eigenvector to float tolerance
    p = np.zeros((len(types), len(types)))
    for i, a in enumerate(types):
        for j, b in enumerate(types):
            p[i, j] = cnt.get((a, b), 0) / row[a]
    evals, evecs = np.linalg.eig(p.T)
    pi = np.real(evecs[:, np.argmax(np.real(evals))])
    pi = pi / pi.sum()
    for i, t in enumerate(types):
        assert abs(got[t]["stationary_ppm"] / 1e6 - pi[i]) < 1e-3
    emp = ev["event_type"].value_counts()
    n = len(ev)
    for t in types:
        assert got[t]["empirical_ppm"] == int(emp[t]) * 1_000_000 // n


def test_transfer_entropy_matches_counter(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    n = len(days)
    series = {}
    for t in {x for p in TE_PAIRS for x in p}:
        c = ev[ev["event_type"] == t].groupby("d").size()
        series[t] = np.array([int(c.get(dd, 0)) for dd in days])
    got = {r["direction"]: r for r in
           _Q["events_transfer_entropy"].build(spark, sf_small).collect()}
    for x_t, y_t in TE_PAIRS:
        sx, sy = int(series[x_t].sum()), int(series[y_t].sum())
        bx = (series[x_t] * n > sx).astype(int)
        by = (series[y_t] * n > sy).astype(int)
        cells = Counter(zip(by[1:], by[:-1], bx[:-1]))
        nn = sum(cells.values())
        c_yp = Counter()
        c_ypxp = Counter()
        c_ytyp = Counter()
        for (yt, yp, xp), c in cells.items():
            c_yp[yp] += c
            c_ypxp[(yp, xp)] += c
            c_ytyp[(yt, yp)] += c
        nano = sum(
            _half_away(1e9 * (c / nn)
                       * math.log(c * c_yp[yp]
                                  / (c_ypxp[(yp, xp)] * c_ytyp[(yt, yp)])))
            for (yt, yp, xp), c in cells.items())
        r = got[f"{x_t}->{y_t}"]
        assert r["n_steps"] == nn
        assert r["te_micro"] == nano // 1000
        # plug-in TE is a conditional MI: non-negative up to
        # quantization dust
        assert r["te_micro"] >= -1


def test_modularity_matches_python(spark, sf_small):
    rows = cohort_edges(load_table(spark, sf_small, "events")).collect()
    edges = [(r["a"], r["b"]) for r in rows]
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_type"])
    cnt = (ev.groupby(["user_id", "event_type"]).size()
           .reset_index(name="n"))
    grp = {}
    for uid, g in cnt.groupby("user_id"):
        g = g.sort_values(["n", "event_type"],
                          ascending=[False, True])
        grp[uid] = g.iloc[0]["event_type"]
    m = len(edges)
    m_in = Counter()
    dg = Counter()
    nodes = defaultdict(set)
    for a, b in edges:
        ga, gb = grp[a], grp[b]
        if ga == gb:
            m_in[ga] += 1
        dg[ga] += 1
        dg[gb] += 1
        nodes[ga].add(a)
        nodes[gb].add(b)
    got = {r["dominant_type"]: r for r in
           _Q["graph_modularity_by_type"].build(spark, sf_small).collect()}
    total_nano = 0
    for g in dg:
        contrib = _half_away(
            1e9 * (m_in[g] / m - (dg[g] / (2 * m)) ** 2))
        total_nano += contrib
        r = got[g]
        assert r["n_nodes"] == len(nodes[g])
        assert r["internal_edges"] == m_in[g]
        assert r["degree_sum"] == dg[g]
        assert r["q_contrib_nano"] == contrib
    # engine integer division truncates toward zero (Q is negative
    # here); Python // floors — use trunc
    for r in got.values():
        assert r["q_total_micro"] == math.trunc(total_nano / 1000)
