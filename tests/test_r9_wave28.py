"""Round-9 wave 28 kernels: independent references — a brute-force
pairwise-sgn Pettitt (checking the midrank identity itself), a
pure-python runs count, an exact-sort ABC replay at bucket
granularity, and a pandas Balassa RCA matrix."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.analytics import ABC_BINS
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.stat_tests import (
    PT_SIG_MICRO, RUNS_Z_CRIT_MICRO)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    out = {}
    for t, g in ev.groupby("event_type"):
        c = g.groupby("d").size()
        out[t] = np.array([int(c.get(dd, 0)) for dd in days], dtype=int)
    return out


def test_pettitt_matches_pairwise_sgn(spark, sf_small):
    series = _daily(sf_small)
    got = {r["event_type"]: r for r in
           _Q["events_pettitt_test"].build(spark, sf_small).collect()}
    for t, x in series.items():
        n = len(x)
        # brute-force sgn double sum — independent of the midrank
        # identity the query uses
        u = []
        for tt in range(1, n):
            s = 0
            for i in range(tt):
                for j in range(tt, n):
                    s += int(np.sign(x[i] - x[j]))
            u.append(s)
        k = max(abs(v) for v in u)
        t_star = min(i + 1 for i, v in enumerate(u) if abs(v) == k)
        p = 2 * math.exp(-6 * k * k / (n ** 3 + n ** 2))
        r = got[t]
        assert r["n_days"] == n
        assert r["k_stat"] == k
        assert r["t_star"] == t_star
        assert math.isclose(r["p_micro"] / 1e6, p,
                            rel_tol=1e-6, abs_tol=2e-6)
        assert r["significant"] == int(r["p_micro"] <= PT_SIG_MICRO)


def test_runs_test_matches_python(spark, sf_small):
    series = _daily(sf_small)
    got = {r["event_type"]: r for r in
           _Q["events_runs_test"].build(spark, sf_small).collect()}
    for t, x in series.items():
        signs = [int(np.sign(b - a)) for a, b in zip(x, x[1:])]
        signs = [s for s in signs if s != 0]
        n1 = sum(1 for s in signs if s == 1)
        n2 = sum(1 for s in signs if s == -1)
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        r = got[t]
        assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (n1, n2, runs)
        if n1 and n2:
            e = 1 + 2 * n1 * n2 / (n1 + n2)
            v = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                 / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
            z = (runs - e) / math.sqrt(v)
            assert math.isclose(r["z_micro"] / 1e6, z,
                                rel_tol=1e-6, abs_tol=2e-6)
            assert r["looks_random"] == int(
                abs(r["z_micro"]) <= RUNS_Z_CRIT_MICRO)


def test_abc_matches_bucket_replay(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100).astype("int64")
    rev = pd.Series(cents).groupby(li["l_partkey"].to_numpy()).sum()
    mn, mx, total = int(rev.min()), int(rev.max()), int(rev.sum())
    want = defaultdict(lambda: [0, 0])
    bins = ((mx - rev) * ABC_BINS // (mx - mn + 1)).clip(upper=ABC_BINS - 1)
    brev = rev.groupby(bins).sum().sort_index()
    cprev = brev.cumsum().shift(fill_value=0)
    klass = {}
    for b in brev.index:
        cp = int(cprev[b])
        klass[b] = ("A" if cp * 5 < 4 * total
                    else "B" if cp * 20 < 19 * total else "C")
    for pk, r in rev.items():
        k = klass[int(bins[pk])]
        want[k][0] += 1
        want[k][1] += int(r)
    got = {r["abc_class"]: r for r in
           _Q["part_abc_classes"].build(spark, sf_small).collect()}
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k]["n_parts"] == n
        assert got[k]["revenue_cents"] == s
        assert got[k]["share_ppm"] == s * 1_000_000 // total
    # A bins lead, and the A boundary honors the 80% contract at
    # bucket granularity: everything strictly before the A/B edge
    # is under 80% of revenue
    a_rev = want["A"][1]
    assert a_rev * 5 >= 4 * total or "B" not in want


def test_balassa_rca_matches_pandas(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey",
                                  "l_extendedprice"])
    supp = pd.read_parquet(f"{sf_small}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    nation = pd.read_parquet(f"{sf_small}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    part = pd.read_parquet(f"{sf_small}/part.parquet",
                           columns=["p_partkey", "p_type"])
    df = (li.assign(cents=np.floor(li["l_extendedprice"] * 100)
                    .astype("int64"))
          .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
          .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
          .merge(part, left_on="l_partkey", right_on="p_partkey"))
    cells = df.groupby(["n_name", "p_type"])["cents"].sum()
    xn = cells.groupby("n_name").sum()
    xt = cells.groupby("p_type").sum()
    xx = int(cells.sum())
    got = {(r["n_name"], r["p_type"]): r for r in
           _Q["supplier_balassa_rca"].build(spark, sf_small).collect()}
    assert len(got) == len(cells)
    for (n, t), x in cells.items():
        rca = (int(x) / int(xn[n])) * (xx / int(xt[t]))
        r = got[(n, t)]
        assert r["revenue_cents"] == int(x)
        assert r["rca_ppm"] == _half_away(rca * 1e6)
        assert r["specialized"] == int(r["rca_ppm"] > 1_000_000)
