"""Round-9 wave 35 kernels: independent references — a numpy circular
Rayleigh test (float trig, checking the fixed-point tables), a numpy
Chow test via two least-squares fits, and a Counter hapax census."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.spectral_info import (
    RAY_Z_CRIT_MICRO)
from impractical_impala_spark.queries.stat_tests import (
    CHOW_F_CRIT_MICRO)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

HOUR_NS = 3_600_000_000_000


def test_rayleigh_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    hrs = ((pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
            .astype("int64") // HOUR_NS) % 24)
    ev = ev.assign(h=hrs)
    got = {r["event_type"]: r for r in
           _Q["events_rayleigh_diurnal"].build(spark, sf_small).collect()}
    for t, g in ev.groupby("event_type"):
        theta = g["h"].to_numpy() * 2 * math.pi / 24
        n = len(theta)
        sc, ss = np.cos(theta).sum(), np.sin(theta).sum()
        r_bar = math.hypot(sc, ss) / n
        mean_h = (math.atan2(ss, sc) * 24 / (2 * math.pi) + 24) % 24
        z = n * r_bar ** 2
        r = got[t]
        assert r["n_events"] == n
        # the engine trig is micro fixed point; the float reference
        # agrees to the table's quantization error
        assert math.isclose(r["r_bar_ppm"] / 1e6, r_bar,
                            rel_tol=1e-4, abs_tol=2e-5)
        assert math.isclose(r["mean_hour_milli"] / 1e3, mean_h,
                            rel_tol=1e-3, abs_tol=2e-2)
        assert math.isclose(r["rayleigh_z_micro"] / 1e6, z,
                            rel_tol=1e-3, abs_tol=1e-2)
        assert r["diurnal"] == int(
            r["rayleigh_z_micro"] >= RAY_Z_CRIT_MICRO)


def test_chow_matches_numpy(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderdate"])
    dd = (pd.to_datetime(o["o_orderdate"]).dt.normalize()
          - pd.Timestamp("1970-01-01")).dt.days
    d0, d1 = int(dd.min()), int(dd.max())
    n = d1 - d0 + 1
    c = dd.value_counts()
    y = np.array([int(c.get(d, 0)) for d in range(d0, d1 + 1)],
                 dtype=float)
    t = np.arange(n, dtype=float)

    def rss(tt, yy):
        a = np.stack([np.ones(len(tt)), tt], axis=1)
        beta, *_ = np.linalg.lstsq(a, yy, rcond=None)
        return float(((yy - a @ beta) ** 2).sum())

    half = n // 2
    rss_p = rss(t, y)
    rss_1 = rss(t[:half], y[:half])
    rss_2 = rss(t[half:], y[half:])
    f = ((rss_p - rss_1 - rss_2) / 2) / ((rss_1 + rss_2) / (n - 4))
    row = _Q["orders_chow_break"].build(spark, sf_small).collect()[0]
    assert row["n_days"] == n
    assert math.isclose(row["f_micro"] / 1e6, f, rel_tol=1e-6,
                        abs_tol=1e-4)
    assert row["break_detected"] == int(
        row["f_micro"] > CHOW_F_CRIT_MICRO)


def test_hapax_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    got = {r["source"]: r for r in
           _Q["text_hapax_ratio"].build(spark, sf_small).collect()}
    for src, g in docs.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(t.lower().split(" "))
        v = len(c)
        n = sum(c.values())
        hapax = sum(1 for k in c.values() if k == 1)
        dis = sum(1 for k in c.values() if k == 2)
        r = got[src]
        assert (r["n_types"], r["n_tokens"]) == (v, n)
        assert (r["n_hapax"], r["n_dis"]) == (hapax, dis)
        assert r["hapax_vocab_ppm"] == hapax * 1_000_000 // v
        assert r["hapax_mass_ppm"] == hapax * 1_000_000 // n
        assert r["dis_vocab_ppm"] == dis * 1_000_000 // v
