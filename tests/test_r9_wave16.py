"""Round-9 wave 16 kernels: independent references for the forecast
backtest, BFS hop histogram, DP count release, DSIR importance
weights, and the IVF-PQ pipeline — each a from-scratch
pandas/numpy/hashlib route sharing nothing with the Spark plan or the
DuckDB oracle."""

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.curation import (
    DSIR_B, DSIR_TARGET_LANG)
from impractical_impala_spark.queries.forecast import BT_ORIGINS, BT_SEASON
from impractical_impala_spark.queries.paths_stats import (
    BFS_ROUNDS, EDGE_CAP, K_COHORT)
from impractical_impala_spark.queries.quality import (
    DP_MAG_SALT, DP_SIGN_SALT)
from impractical_impala_spark.queries.similarity import (
    N_CELLS, N_PROBE, N_QUERIES)
from impractical_impala_spark.queries.training_extras import (
    ADC_TOPK, PQ_K, PQ_M, PQ_SUB)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_forecast_backtest_matches_pandas(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderdate"])
    od = pd.to_datetime(o["o_orderdate"])
    mi = od.dt.year * 12 + od.dt.month
    c = mi.value_counts().sort_index()
    mx = int(c.index.max())
    got = {r["model"]: r for r in
           _Q["orders_forecast_backtest"].build(spark, sf_small).collect()}
    den_sum = den_n = 0
    for m in c.index:
        if m <= mx - BT_ORIGINS and (m - BT_SEASON) in c.index:
            den_sum += abs(int(c[m]) - int(c[m - BT_SEASON]))
            den_n += 1
    for model, lag in (("naive", 1), ("seasonal_naive", BT_SEASON)):
        err = n = 0
        for m in c.index:
            if m > mx - BT_ORIGINS:
                err += abs(int(c[m]) - int(c.get(m - lag, 0)))
                n += 1
        r = got[model]
        assert r["n_orig"] == n and r["err_sum"] == err
        assert r["mae_milli"] == err * 1000 // n
        assert r["mase_ppm"] == err * den_n * 1_000_000 // (n * den_sum)


def _backbone_edges(sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    hr = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
          .astype("int64") // 3_600_000_000_000)
    ev = ev.assign(hr=hr)
    act = (ev.groupby(["hr", "event_type", "user_id"]).size()
           .rename("n_ev").reset_index())
    act = act.sort_values(["hr", "event_type", "n_ev", "user_id"],
                          ascending=[True, True, False, True])
    act["rk"] = act.groupby(["hr", "event_type"]).cumcount() + 1
    ua = act[act["rk"] <= K_COHORT]
    support = Counter()
    for _, grp in ua.groupby(["hr", "event_type"]):
        us = sorted(grp["user_id"])
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                support[(us[i], us[j])] += 1
    ranked = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))
    return [e for e, _ in ranked[:EDGE_CAP]]


def test_bfs_hops_matches_python_bfs(spark, sf_small):
    edges = _backbone_edges(sf_small)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = set(adj)
    seed = min(nodes)
    dist = {seed: 0}
    frontier = {seed}
    for k in range(1, BFS_ROUNDS + 1):
        frontier = {v for u in frontier for v in adj[u] if v not in dist}
        for v in frontier:
            dist[v] = k
    hist = Counter(dist.get(u, -1) for u in nodes)
    got = {r["hop"]: r["n_users"] for r in
           _Q["graph_bfs_hops"].build(spark, sf_small).collect()}
    assert got == dict(hist)


def test_dp_release_matches_hashlib(spark, sf_small):
    got = _Q["privacy_dp_count_release"].build(spark, sf_small).collect()
    assert got, "no rows"
    for r in got:
        et = r["event_type"]
        hexs = hashlib.md5((DP_MAG_SALT + et).encode()).hexdigest()
        mag = 0
        for ch in hexs:
            if ch in "89abcdef":
                mag += 1
            else:
                break
        sgn_hex = hashlib.md5((DP_SIGN_SALT + et).encode()).hexdigest()
        sign = 1 if ord(sgn_hex[0]) < 56 else -1
        noise = sign * mag
        assert r["noise"] == noise
        assert r["n_released"] == max(0, r["n_true"] + noise)
        assert r["abs_err"] == abs(r["n_released"] - r["n_true"])


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def test_dsir_matches_python_reference(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "lang", "text"])
    rows = []
    for _, r in docs.iterrows():
        for t in r["text"].lower().split(" "):
            b = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % DSIR_B
            rows.append((r["source"], r["lang"], b))
    df = pd.DataFrame(rows, columns=["source", "lang", "b"])
    c_raw = df.groupby("b").size()
    c_tgt = df[df["lang"] == DSIR_TARGET_LANG].groupby("b").size()
    n_raw, n_tgt = int(c_raw.sum()), int(c_tgt.sum())
    lr = {b: _half_away(math.log(
        ((int(c_tgt.get(b, 0)) + 1.0) * (n_raw + DSIR_B))
        / ((int(c_raw[b]) + 1.0) * (n_tgt + DSIR_B))) * 1e9)
        for b in c_raw.index}
    per_src = defaultdict(lambda: [0, 0, 0])  # docs, sum_w, pos
    for _, r in docs.iterrows():
        w = sum(lr[int(hashlib.md5(t.encode()).hexdigest()[:7], 16)
                   % DSIR_B]
                for t in r["text"].lower().split(" "))
        a = per_src[r["source"]]
        a[0] += 1
        a[1] += w
        a[2] += int(w > 0)
    got = {r["source"]: r for r in
           _Q["doc_dsir_importance"].build(spark, sf_small).collect()}
    for src, (nd, sw, npos) in per_src.items():
        r = got[src]
        assert r["n_docs"] == nd and r["sum_w_nano"] == sw
        assert r["mean_w_nano"] == _half_away(sw / nd)
        assert r["pos_ppm"] == npos * 1_000_000 // nd


def test_ivf_pq_pipeline_matches_numpy(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    vecs = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
            for _, r in emb.iterrows()}
    sub = lambda v, m: v[m * PQ_SUB:(m + 1) * PQ_SUB]
    cents = {c: vecs[c] for c in range(N_CELLS)}

    def cells_ranked(v):
        scored = []
        for cid, cv in cents.items():
            cos = (float(v @ cv)
                   / (math.sqrt(float(v @ v)) * math.sqrt(float(cv @ cv))))
            scored.append((-cos, cid))
        scored.sort()
        return [cid for _, cid in scored]

    assign = {vid: cells_ranked(v)[0] for vid, v in vecs.items()
              if vid >= N_QUERIES}
    codes = {}
    for vid, v in vecs.items():
        if vid < N_QUERIES:
            continue
        cs = []
        for m in range(PQ_M):
            d = [(float(np.sum((sub(v, m) - sub(vecs[c], m)) ** 2)), c)
                 for c in range(PQ_K)]
            cs.append(min(d)[1])
        codes[vid] = cs
    got = defaultdict(list)
    for r in _Q["ann_ivf_pq_pipeline"].build(spark, sf_small).collect():
        got[r["query_id"]].append(r)
    for q in range(N_QUERIES):
        probe_cells = set(cells_ranked(vecs[q])[:N_PROBE])
        lut = {(m, c): float(np.sum(
            (sub(vecs[q], m) - sub(vecs[c], m)) ** 2))
            for m in range(PQ_M) for c in range(PQ_K)}
        cand = []
        for vid, cell in assign.items():
            if cell in probe_cells:
                adc = round(sum(lut[(m, codes[vid][m])]
                                for m in range(PQ_M)), 6)
                cand.append((adc, vid))
        cand.sort()
        want = cand[:ADC_TOPK]
        rows = sorted(got[q], key=lambda r: r["rank"])
        assert len(rows) == len(want)
        for (adc, vid), r in zip(want, rows):
            assert r["neighbor_id"] == vid
            assert math.isclose(r["adc_r6"], adc, rel_tol=0, abs_tol=2e-6)
