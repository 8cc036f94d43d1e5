"""Round-9 wave 31 kernels: independent references — numpy
aggregated-variance Hurst, an exact pandas newsvendor quantile
replay, and a pure-python rich-club on the same backbone."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.paths_stats import (
    RC_KS, cohort_edges)
from impractical_impala_spark.queries.spectral_info import HURST_MS
from impractical_impala_spark.queries.warehouse_extras import NV_FRACTILES
from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_hurst_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    c = d.value_counts()
    x = np.array([int(c.get(dd, 0)) for dd in days], dtype=float)
    n = len(x)
    lxs, lys = [], []
    for m in HURST_MS:
        k = n // m
        sums = x[:k * m].reshape(k, m).sum(axis=1)
        v = sums.var(ddof=1) / m ** 2
        lxs.append(math.log(m))
        lys.append(math.log(v))
    slope, _ = np.polyfit(lxs, lys, 1)
    row = _Q["events_hurst_exponent"].build(spark, sf_small).collect()[0]
    assert row["n_days"] == n
    assert math.isclose(row["slope_micro"] / 1e6, slope,
                        rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(row["hurst_micro"] / 1e6, 1 + slope / 2,
                        rel_tol=1e-4, abs_tol=1e-4)


def test_newsvendor_matches_pandas(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderdate"])
    od = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    n_days = (od.max() - od.min()).days + 1
    daily = od.value_counts()
    counts = sorted(daily.values)
    zero_days = n_days - len(counts)
    demand = [0] * zero_days + counts
    got = {r["fractile_pct"]: r for r in
           _Q["orders_newsvendor_quantile"].build(spark, sf_small)
           .collect()}
    assert set(got) == set(NV_FRACTILES)
    for f in NV_FRACTILES:
        target = next(x for i, x in enumerate(demand, start=1)
                      if i * 100 >= f * n_days)
        cum = sum(1 for x in demand if x <= target)
        r = got[f]
        assert r["target_units"] == target
        assert r["attained_ppm"] == cum * 1_000_000 // n_days
        assert cum * 100 >= f * n_days


def test_rich_club_matches_python(spark, sf_small):
    rows = cohort_edges(load_table(spark, sf_small, "events")).collect()
    edges = [(r["a"], r["b"]) for r in rows]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r["k"]: r for r in
           _Q["graph_rich_club"].build(spark, sf_small).collect()}
    assert set(got) == set(RC_KS)
    for k in RC_KS:
        nodes = {u for u, dd in deg.items() if dd > k}
        ek = sum(1 for a, b in edges if a in nodes and b in nodes)
        r = got[k]
        assert r["n_nodes"] == len(nodes)
        assert r["n_edges"] == ek
        if len(nodes) >= 2:
            assert r["phi_ppm"] == ek * 2_000_000 // (
                len(nodes) * (len(nodes) - 1))
        else:
            assert r["phi_ppm"] is None
