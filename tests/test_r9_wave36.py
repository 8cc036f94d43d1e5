"""Round-9 wave 36 kernels: independent references — a numpy
Weibull-plot fit replay (same plotting rule, float trig), a pandas
new/returning audience mix, and an exact quartile-dispersion replay."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_weibull_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "event_id"])
    ts_ns = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
             .astype("int64"))
    ev = ev.assign(ts_ns=ts_ns)
    got = {r["event_type"]: r for r in
           _Q["events_weibull_interarrival"].build(spark, sf_small)
           .collect()}
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["ts_ns", "event_id"])
        gaps = (g["ts_ns"].diff().dropna() // 1_000_000_000).astype(int)
        gaps = gaps[gaps > 0]
        n = len(gaps)
        census = Counter(gaps)
        xs, ys = [], []
        cum = 0
        for gv in sorted(census):
            cum += census[gv]
            xs.append(math.log(gv))
            ys.append(math.log(-math.log(1 - cum / (n + 1))))
        slope, intercept = np.polyfit(xs, ys, 1)
        scale = math.exp(-intercept / slope)
        r = got[t]
        assert r["n_gaps"] == n
        assert math.isclose(r["shape_milli"] / 1e3, slope,
                            rel_tol=1e-3, abs_tol=2e-3)
        assert math.isclose(r["scale_sec_milli"] / 1e3, scale,
                            rel_tol=1e-3, abs_tol=1e-1)
        assert r["bursty"] == int(r["shape_milli"] < 1000)


def test_new_returning_matches_pandas(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    active = ev.drop_duplicates(["user_id", "d"]).groupby("d").size()
    first = ev.groupby("user_id")["d"].min().value_counts()
    got = {r["epoch_day"]: r for r in
           _Q["events_new_returning_mix"].build(spark, sf_small)
           .collect()}
    assert set(got) == set(active.index)
    for day, n_act in active.items():
        r = got[day]
        n_new = int(first.get(day, 0))
        assert r["n_active"] == n_act
        assert r["n_new"] == n_new
        assert r["new_share_ppm"] == n_new * 1_000_000 // n_act


def test_price_dispersion_matches_exact(spark, sf_small):
    part = pd.read_parquet(f"{sf_small}/part.parquet",
                           columns=["p_brand", "p_retailprice"])
    part = part.assign(cents=np.floor(part["p_retailprice"] * 100)
                       .astype("int64"))
    got = {r["p_brand"]: r for r in
           _Q["part_price_dispersion"].build(spark, sf_small).collect()}
    for brand, g in part.groupby("p_brand"):
        cents = np.sort(g["cents"].to_numpy())
        n = len(cents)
        q1 = int(cents[math.ceil(n / 4) - 1])
        q3 = int(cents[math.ceil(3 * n / 4) - 1])
        r = got[brand]
        assert r["n_parts"] == n
        assert r["q1_cents"] == q1
        assert r["q3_cents"] == q3
        assert r["qcd_ppm"] == (q3 - q1) * 1_000_000 // (q3 + q1)
