"""Round-9 wave 42 kernels: independent references — a numpy one-way
ANOVA ICC(1) with design effect, and a pandas chi-square/Cramér's V."""

import math

import numpy as np
import pandas as pd

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_day_icc_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d, centi=np.floor(ev["value"] * 100).astype("int64"))
    got = {r["event_type"]: r for r in
           _Q["events_day_icc"].build(spark, sf_small).collect()}
    for t, g in ev.groupby("event_type"):
        groups = [gg["centi"].to_numpy(dtype=float)
                  for _, gg in g.groupby("d")]
        k = len(groups)
        n = sum(len(x) for x in groups)
        grand = sum(x.sum() for x in groups) / n
        ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in groups)
        ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
        msb, msw = ssb / (k - 1), ssw / (n - k)
        n0 = (n - sum(len(x) ** 2 for x in groups) / n) / (k - 1)
        icc = (msb - msw) / (msb + (n0 - 1) * msw)
        deff = 1 + (n0 - 1) * icc
        r = got[t]
        assert (r["k_days"], r["n_events"]) == (k, n)
        assert math.isclose(r["n0_milli"] / 1e3, n0,
                            rel_tol=1e-5, abs_tol=1e-2)
        assert math.isclose(r["icc_micro"] / 1e6, icc,
                            rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(r["design_effect_milli"] / 1e3, deff,
                            rel_tol=1e-5, abs_tol=1e-2)


def test_cramers_v_matches_pandas(spark, sf_small):
    part = pd.read_parquet(f"{sf_small}/part.parquet",
                           columns=["p_brand", "p_type"])
    tab = pd.crosstab(part["p_brand"], part["p_type"])
    o = tab.to_numpy(dtype=float)
    nr = o.sum(axis=1, keepdims=True)
    nc = o.sum(axis=0, keepdims=True)
    nn = o.sum()
    e = nr @ nc / nn
    chi2 = float(((o - e) ** 2 / e).sum())
    v = math.sqrt(chi2 / (nn * (min(o.shape) - 1)))
    row = _Q["part_brand_type_cramers_v"].build(spark,
                                                sf_small).collect()[0]
    assert row["n_parts"] == int(nn)
    assert (row["n_brands"], row["n_types"]) == o.shape
    assert math.isclose(row["chi2_micro"] / 1e6, chi2,
                        rel_tol=1e-5, abs_tol=1e-3)
    assert math.isclose(row["cramers_v_milli"] / 1e3, v,
                        rel_tol=1e-4, abs_tol=1e-3)
