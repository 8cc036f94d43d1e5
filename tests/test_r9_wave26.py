"""Round-9 wave 26 kernels: independent references — brute-force
window TTR for the closed-form MATTR, Counter-based Simpson, numpy
eigenvalue participation ratio, and a numpy cosine top-k hubness
replay with the house tie-break."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.ml_more import Q_SCALE
from impractical_impala_spark.queries.similarity import N_QUERIES, TOP_K
from impractical_impala_spark.queries.text_ir import MATTR_W
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_mattr_matches_bruteforce_windows(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    per_source = {}
    for _, r in docs.iterrows():
        toks = r["text"].lower().split(" ")
        n = len(toks)
        if n < MATTR_W:
            continue
        total = sum(len(set(toks[i:i + MATTR_W]))
                    for i in range(n - MATTR_W + 1))
        ppm = total * 1_000_000 // ((n - MATTR_W + 1) * MATTR_W)
        per_source.setdefault(r["source"], []).append(ppm)
    got = {r["source"]: r for r in
           _Q["text_mattr"].build(spark, sf_small).collect()}
    assert set(got) == set(per_source)
    for src, ppms in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(ppms)
        assert r["mean_mattr_ppm"] == sum(ppms) // len(ppms)
        assert r["min_mattr_ppm"] == min(ppms)
        assert r["max_mattr_ppm"] == max(ppms)


def test_simpson_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    per_source = {}
    for _, r in docs.iterrows():
        c = Counter(r["text"].lower().split(" "))
        n = sum(c.values())
        if n < 2:
            continue
        rep = sum(v * (v - 1) for v in c.values())
        ppm = 1_000_000 - rep * 1_000_000 // (n * (n - 1))
        per_source.setdefault(r["source"], []).append(ppm)
    got = {r["source"]: r for r in
           _Q["text_simpson_diversity"].build(spark, sf_small).collect()}
    for src, ppms in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(ppms)
        assert r["mean_simpson_ppm"] == sum(ppms) // len(ppms)
        assert r["min_simpson_ppm"] == min(ppms)


def test_participation_ratio_matches_eigenvalues(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["embedding"])
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    xq = np.floor(x * Q_SCALE)
    c = np.cov(xq.T, bias=False)
    lam = np.linalg.eigvalsh(c)
    pr = lam.sum() ** 2 / (lam ** 2).sum()
    row = _Q["emb_participation_ratio"].build(spark, sf_small).collect()[0]
    assert row["n_vectors"] == len(x)
    assert math.isclose(row["pr_micro"] / 1e6, pr, rel_tol=1e-6,
                        abs_tol=1e-4)
    assert math.isclose(row["pr_over_d_ppm"] / 1e6, pr / x.shape[1],
                        rel_tol=1e-6, abs_tol=2e-6)


def test_hubness_matches_numpy_topk(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((x * x).sum(axis=1))
    occ = Counter()
    for qi in np.where(ids < N_QUERIES)[0]:
        cos = (x @ x[qi]) / (norms * norms[qi])
        order = sorted((i for i in range(len(ids)) if i != qi),
                       key=lambda i: (-cos[i], ids[i]))
        for i in order[:TOP_K]:
            occ[int(ids[i])] += 1
    counts = np.array([occ.get(int(v), 0) for v in ids], dtype=float)
    mean = counts.mean()
    m2 = ((counts - mean) ** 2).mean()
    m3 = ((counts - mean) ** 3).mean()
    skew = m3 / m2 ** 1.5
    row = _Q["emb_hubness_audit"].build(spark, sf_small).collect()[0]
    assert row["n_vectors"] == len(ids)
    assert row["total_occ"] == int(counts.sum())
    assert row["max_occ"] == int(counts.max())
    assert row["n_antihubs"] == int((counts == 0).sum())
    assert math.isclose(row["skew_micro"] / 1e6, skew, rel_tol=1e-6,
                        abs_tol=1e-5)
