"""Round-9 wave 43 kernels: independent references — a Counter-based
24-bin profile JSD and a numpy peak/p95 load replay."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

HOUR_NS = 3_600_000_000_000


def test_hourly_profile_jsd_matches_counter(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    h = ((pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
          .astype("int64") // HOUR_NS) % 24)
    ev = ev.assign(h=h)
    profiles = {}
    for t, g in ev.groupby("event_type"):
        c = Counter(g["h"])
        profiles[t] = np.array([c.get(hh, 0) for hh in range(24)],
                               dtype=float)
    types = sorted(profiles)
    got = {(r["t1"], r["t2"]): r["jsd_micro"] for r in
           _Q["events_hourly_profile_jsd"].build(spark, sf_small)
           .collect()}
    for i, t1 in enumerate(types):
        for t2 in types[i + 1:]:
            p = profiles[t1] / profiles[t1].sum()
            q = profiles[t2] / profiles[t2].sum()
            nano = 0
            for hh in range(24):
                term = 0.0
                m = (p[hh] + q[hh])
                if p[hh] > 0:
                    term += 0.5 * p[hh] * math.log(2 * p[hh] / m)
                if q[hh] > 0:
                    term += 0.5 * q[hh] * math.log(2 * q[hh] / m)
                nano += _half_away(1e9 * term)
            assert got[(t1, t2)] == nano // 1000


def test_peak_load_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    t = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // HOUR_NS)
    ev = ev.assign(t=t)
    hh = int(t.max() - t.min() + 1)
    got = {r["event_type"]: r for r in
           _Q["events_peak_load_ratio"].build(spark, sf_small).collect()}
    for et, g in ev.groupby("event_type"):
        c = g.groupby("t").size()
        loads = np.zeros(hh, dtype=int)
        for tt, k in c.items():
            loads[int(tt - t.min())] = k
        loads.sort()
        s = int(loads.sum())
        p95 = int(loads[math.ceil(0.95 * hh) - 1])
        r = got[et]
        assert r["n_hours"] == hh
        assert r["mean_milli"] == s * 1000 // hh
        assert r["p95_load"] == p95
        assert r["max_load"] == int(loads.max())
        assert r["par_ppm"] == int(loads.max()) * hh * 1_000_000 // s
        assert r["p95_ratio_ppm"] == p95 * hh * 1_000_000 // s
