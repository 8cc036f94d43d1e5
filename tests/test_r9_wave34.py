"""Round-9 wave 34 kernels: independent references — a numpy
day-of-week ANOVA, a pandas CR4/CR8/HHI replay, and Counter-based
order-1 entropy rates."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.hypothesis import (
    CHI2_95, _half_away)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_dow_anova_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    got = {r["event_type"]: r for r in
           _Q["events_dow_anova"].build(spark, sf_small).collect()}
    for t, g in ev.groupby("event_type"):
        c = g.groupby("d").size()
        x = np.array([int(c.get(dd, 0)) for dd in days], dtype=float)
        dows = (days + 4) % 7
        groups = [x[dows == w] for w in range(7) if (dows == w).any()]
        k = len(groups)
        n = len(x)
        grand = x.mean()
        ssb = sum(len(gr) * (gr.mean() - grand) ** 2 for gr in groups)
        ssw = sum(((gr - gr.mean()) ** 2).sum() for gr in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        r = got[t]
        assert r["n_days"] == n
        assert math.isclose(r["f_micro"] / 1e6, f,
                            rel_tol=1e-5, abs_tol=1e-4)
        crit = _half_away(CHI2_95[6] / 6 * 1e6)
        assert r["dow_effect"] == int(r["f_micro"] > crit)


def test_cr4_matches_pandas(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])
    part = pd.read_parquet(f"{sf_small}/part.parquet",
                           columns=["p_partkey", "p_type"])
    df = (li.assign(cents=np.floor(li["l_extendedprice"] * 100)
                    .astype("int64"))
          .merge(part, left_on="l_partkey", right_on="p_partkey"))
    got = {r["p_type"]: r for r in
           _Q["supplier_cr4_by_type"].build(spark, sf_small).collect()}
    for pt, g in df.groupby("p_type"):
        cells = (g.groupby("l_suppkey")["cents"].sum()
                 .reset_index().sort_values(["cents", "l_suppkey"],
                                            ascending=[False, True]))
        xt = int(cells["cents"].sum())
        xs = cells["cents"].to_numpy()
        hhi = sum(_half_away(1e8 * (int(x) / xt) ** 2) for x in xs)
        r = got[pt]
        assert r["n_suppliers"] == len(cells)
        assert r["cr4_ppm"] == int(xs[:4].sum()) * 1_000_000 // xt
        assert r["cr8_ppm"] == int(xs[:8].sum()) * 1_000_000 // xt
        assert r["hhi_points"] == hhi


def test_entropy_rate_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    got = {r["source"]: r for r in
           _Q["source_char_entropy_rate"].build(spark, sf_small).collect()}
    for src, g in docs.groupby("source"):
        c1, c2 = Counter(), Counter()
        for t in g["text"]:
            c1.update(t)
            c2.update(t[i:i + 2] for i in range(len(t) - 1))
        def h_nano(cnt):
            n = sum(cnt.values())
            return sum(_half_away(1e9 * (k / n) * math.log2(n / k))
                       for k in cnt.values())
        h1, h2 = h_nano(c1), h_nano(c2)
        r = got[src]
        assert r["h1_millibits"] == h1 // 1_000_000
        assert r["h2_millibits"] == h2 // 1_000_000
        assert r["rate_millibits"] == (h2 - h1) // 1_000_000
        assert r["redundancy_ppm"] == (h1 - (h2 - h1)) * 1_000_000 // h1
        # conditioning can only reduce the rate
        assert r["rate_millibits"] <= r["h1_millibits"] + 1
