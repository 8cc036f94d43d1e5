"""Round-9 wave 32 kernels: independent references — per-dimension
numpy ANOVA for the Fisher ratios, a pandas tier-migration replay,
and a numpy integrated-autocorrelation ESS."""

import math

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.emb_eval import FISHER_TOPK
from impractical_impala_spark.queries.hypothesis import LB_LAGS
from impractical_impala_spark.queries.ml_more import Q_SCALE
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_fisher_ratio_matches_numpy(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["embedding", "label"])
    x = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64)
                 * Q_SCALE)
    labels = emb["label"].to_numpy()
    uniq = np.unique(labels)
    k, n = len(uniq), len(labels)
    fs = []
    for d in range(x.shape[1]):
        col = x[:, d]
        grand = col.mean()
        ssb = sum(len(col[labels == u]) * (col[labels == u].mean()
                                           - grand) ** 2 for u in uniq)
        ssw = sum(((col[labels == u] - col[labels == u].mean()) ** 2).sum()
                  for u in uniq)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        fs.append((f, d, ssb / (ssb + ssw)))
    fs.sort(key=lambda t: (-t[0], t[1]))
    got = _Q["emb_fisher_ratio_dims"].build(spark, sf_small).collect()
    assert len(got) == FISHER_TOPK
    for row, (f, d, eta) in zip(got, fs[:FISHER_TOPK]):
        assert row["dim"] == d
        assert row["k_labels"] == k
        assert math.isclose(row["f_micro"] / 1e6, f,
                            rel_tol=1e-5, abs_tol=1e-4)
        assert math.isclose(row["eta2_ppm"] / 1e6, eta,
                            rel_tol=1e-5, abs_tol=1e-5)


def test_tier_migration_matches_pandas(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_custkey", "o_orderdate"])
    cust = pd.read_parquet(f"{sf_small}/customer.parquet",
                           columns=["c_custkey"])
    d = (pd.to_datetime(o["o_orderdate"]).dt.normalize()
         - pd.Timestamp("1970-01-01")).dt.days
    dmid = (int(d.min()) + int(d.max())) // 2
    ne = o[d <= dmid].groupby("o_custkey").size()
    nl = o[d > dmid].groupby("o_custkey").size()

    def tier(n):
        return 0 if n == 0 else 1 if n <= 2 else 2 if n <= 5 else 3

    cells = {}
    for ck in cust["c_custkey"]:
        key = (tier(int(ne.get(ck, 0))), tier(int(nl.get(ck, 0))))
        cells[key] = cells.get(key, 0) + 1
    nn = len(cust)
    got = {(r["tier_early"], r["tier_late"]): r for r in
           _Q["customer_tier_migration"].build(spark, sf_small).collect()}
    assert set(got) == set(cells)
    for key, n in cells.items():
        assert got[key]["n_customers"] == n
        assert got[key]["share_ppm"] == n * 1_000_000 // nn


def test_ess_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    got = {r["event_type"]: r for r in
           _Q["events_effective_sample_size"].build(spark, sf_small)
           .collect()}
    for t, g in ev.groupby("event_type"):
        c = g.groupby("d").size()
        x = np.array([int(c.get(dd, 0)) for dd in days], dtype=float)
        n = len(x)
        xc = x - x.mean()
        den = (xc ** 2).sum()
        tau = 1 + 2 * sum((xc[k:] * xc[:-k]).sum() / den
                          for k in range(1, LB_LAGS + 1))
        r = got[t]
        assert r["n_days"] == n
        assert math.isclose(r["tau_micro"] / 1e6, tau,
                            rel_tol=1e-6, abs_tol=2e-6)
        assert math.isclose(r["ess_milli"] / 1e3, n / tau,
                            rel_tol=1e-6, abs_tol=1e-2)
