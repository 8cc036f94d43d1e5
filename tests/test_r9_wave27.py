"""Round-9 wave 27 kernels: independent references — Counter-based
char entropy and bigram KL (replaying the nano quantization exactly),
and a numpy Kingman VUT sweep from raw parquet."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.warehouse_extras import KINGMAN_UTILS
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_compression_advisor_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    got = {r["source"]: r for r in
           _Q["compression_entropy_advisor"].build(spark, sf_small)
           .collect()}
    for src, g in docs.groupby("source"):
        c = Counter("".join(g["text"]))
        n = sum(c.values())
        nano = sum(_half_away(1e9 * (k / n) * math.log2(n / k))
                   for k in c.values())
        r = got[src]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == len(c)
        assert r["entropy_millibits"] == nano // 1_000_000
        assert r["est_ratio_ppm"] == nano // 8000


def test_bigram_kl_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    per_src = {}
    corpus = Counter()
    for src, g in docs.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(t[i:i + 2] for i in range(len(t) - 1))
        per_src[src] = c
        corpus.update(c)
    nn = sum(corpus.values())
    got = {r["source"]: r for r in
           _Q["source_bigram_kl"].build(spark, sf_small).collect()}
    for src, c in per_src.items():
        ns = sum(c.values())
        nano = sum(_half_away(1e9 * (k / ns)
                              * math.log((k / ns) / (corpus[bg] / nn)))
                   for bg, k in c.items())
        r = got[src]
        assert r["n_bigrams"] == ns
        assert r["kl_micro"] == nano // 1000


def test_kingman_matches_numpy(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    days = (od.max() - od.min()).days + 1
    counts = od.value_counts()
    c = np.zeros(days)
    for d, k in counts.items():
        c[(d - od.min()).days] = k
    ca2 = c.var(ddof=1) / c.mean()
    ship = pd.to_datetime(
        li.groupby("l_orderkey")["l_shipdate"].max()).dt.normalize()
    lag = (ship - o.set_index("o_orderkey")["o_orderdate"]
           .pipe(pd.to_datetime).dt.normalize()).dropna().dt.days
    tau = lag.mean()
    cs2 = lag.var(ddof=1) / tau ** 2
    got = {r["u_pct"]: r for r in
           _Q["orders_kingman_wait"].build(spark, sf_small).collect()}
    for u in KINGMAN_UTILS:
        r = got[u]
        assert math.isclose(r["ca2_micro"] / 1e6, ca2,
                            rel_tol=1e-6, abs_tol=1e-5)
        assert math.isclose(r["cs2_micro"] / 1e6, cs2,
                            rel_tol=1e-6, abs_tol=1e-5)
        assert math.isclose(r["tau_milli_days"] / 1e3, tau,
                            rel_tol=1e-6, abs_tol=1e-2)
        wq = (u / (100 - u)) * ((ca2 + cs2) / 2) * tau
        assert math.isclose(r["wq_milli_days"] / 1e3, wq,
                            rel_tol=1e-5, abs_tol=1e-2)
