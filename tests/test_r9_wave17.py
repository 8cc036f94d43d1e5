"""Round-9 wave 17 kernels: independent numpy/pandas references for
the trained IVF-PQ composition, the Matryoshka and binary-sign
retrieval audits, and the SPRT sequential test."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.emb_eval import (
    BSQ_K, MRL_DIMS, MRL_K)
from impractical_impala_spark.queries.monitor_eval import (
    _SPRT_LA, _SPRT_LB, _SPRT_W0, _SPRT_W1, SPRT_DAY_NS)
from impractical_impala_spark.queries.similarity import (
    N_PROBE, N_QUERIES)
from impractical_impala_spark.queries.training_extras import (
    ADC_TOPK, PQ_K, PQ_M, PQ_SUB)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _vecs(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
            for _, r in emb.iterrows()}


def test_matryoshka_matches_numpy(spark, sf_small):
    vecs = _vecs(sf_small)
    qs = {v: vecs[v] for v in vecs if v < N_QUERIES}
    db = {v: vecs[v] for v in vecs if v >= N_QUERIES}

    def topk(d):
        out = {}
        for q, qv in qs.items():
            scored = []
            for c, cv in db.items():
                a = qv if d is None else qv[:d]
                b = cv if d is None else cv[:d]
                cos = float(a @ b) / (math.sqrt(float(a @ a))
                                      * math.sqrt(float(b @ b)))
                scored.append((-cos, c))
            scored.sort()
            out[q] = [c for _, c in scored[:MRL_K]]
        return out

    full = topk(None)
    got = {r["dim"]: r for r in
           _Q["emb_matryoshka_audit"].build(spark, sf_small).collect()}
    for d in MRL_DIMS:
        trunc = topk(d)
        ov = sum(len(set(full[q]) & set(trunc[q])) for q in qs)
        t1 = sum(full[q][0] == trunc[q][0] for q in qs)
        r = got[d]
        assert r["n_queries"] == len(qs)
        assert r["overlap_ppm"] == ov * 1_000_000 // (len(qs) * MRL_K)
        assert r["top1_matches"] == t1


def test_binary_sign_matches_numpy(spark, sf_small):
    vecs = _vecs(sf_small)
    qs = {v: vecs[v] for v in vecs if v < N_QUERIES}
    db = {v: vecs[v] for v in vecs if v >= N_QUERIES}
    got = {r["query_id"]: r for r in
           _Q["emb_binary_sign_audit"].build(spark, sf_small).collect()}
    for q, qv in qs.items():
        cosr, hamr = [], []
        for c, cv in db.items():
            cos = float(qv @ cv) / (math.sqrt(float(qv @ qv))
                                    * math.sqrt(float(cv @ cv)))
            ham = int(np.sum((qv > 0) != (cv > 0)))
            cosr.append((-cos, c))
            hamr.append((ham, c))
        cosr.sort()
        hamr.sort()
        top_cos = {c for _, c in cosr[:BSQ_K]}
        top_ham = {c for _, c in hamr[:BSQ_K]}
        hmap = dict((c, h) for h, c in hamr)
        r = got[q]
        assert r["n_overlap"] == len(top_cos & top_ham)
        assert r["top1_match"] == int(cosr[0][1] == hamr[0][1])
        assert r["true_topk_hamming"] == sum(hmap[c] for c in top_cos)


def test_ivf_pq_trained_composes_trainer_and_adc(spark, sf_small):
    """Given the (independently tested) exact-fixed-point trainer's
    centroids, the search must equal numpy routing + ADC scoring —
    the composition check; the trainer itself is pinned by
    tests/test_similarity_training.py."""
    from impractical_impala_spark.queries.similarity import (
        _emb, ivf_training_sample, train_ivf_centroids)
    emb_df = _emb(spark, sf_small)
    cent_rows = train_ivf_centroids(
        spark, ivf_training_sample(emb_df)).collect()
    cents = {int(r["cell_id"]): np.array(r["cv"], dtype=np.float64)
             for r in cent_rows}
    vecs = _vecs(sf_small)
    sub = lambda v, m: v[m * PQ_SUB:(m + 1) * PQ_SUB]

    def cells_ranked(v):
        scored = []
        for cid, cv in cents.items():
            cos = (float(v @ cv)
                   / (math.sqrt(float(v @ v)) * math.sqrt(float(cv @ cv))))
            scored.append((-cos, cid))
        scored.sort()
        return [cid for _, cid in scored]

    codes = {}
    for vid, v in vecs.items():
        if vid < N_QUERIES:
            continue
        codes[vid] = [min((float(np.sum(
            (sub(v, m) - sub(vecs[c], m)) ** 2)), c)
            for c in range(PQ_K))[1] for m in range(PQ_M)]
    assign = {vid: cells_ranked(v)[0] for vid, v in vecs.items()
              if vid >= N_QUERIES}
    got = defaultdict(list)
    for r in _Q["ann_ivf_pq_trained"].build(spark, sf_small).collect():
        got[r["query_id"]].append(r)
    for q in range(N_QUERIES):
        probe_cells = set(cells_ranked(vecs[q])[:N_PROBE])
        lut = {(m, c): float(np.sum(
            (sub(vecs[q], m) - sub(vecs[c], m)) ** 2))
            for m in range(PQ_M) for c in range(PQ_K)}
        cand = sorted(
            (round(sum(lut[(m, codes[vid][m])] for m in range(PQ_M)), 6),
             vid)
            for vid, cell in assign.items() if cell in probe_cells)
        want = cand[:ADC_TOPK]
        rows = sorted(got[q], key=lambda r: r["rank"])
        assert len(rows) == len(want)
        for (adc, vid), r in zip(want, rows):
            assert r["neighbor_id"] == vid
            assert math.isclose(r["adc_r6"], adc, rel_tol=0, abs_tol=2e-6)


def test_sprt_matches_pandas_walk(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    ev = ev[ev["event_type"].isin(["purchase", "click"])]
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // SPRT_DAY_NS)
    ev = ev.assign(d=d)
    per = ev.groupby("d").agg(
        x=("event_type", lambda s: int((s == "purchase").sum())),
        n=("event_type", "size")).sort_index()
    d0 = int(per.index.min())
    got = {r["d_idx"]: r for r in
           _Q["events_sprt_sequential"].build(spark, sf_small).collect()}
    llr = 0
    decided = False
    for di, row in per.iterrows():
        x, n = int(row["x"]), int(row["n"])
        llr += x * _SPRT_W1 + (n - x) * _SPRT_W0
        hu, hl = int(llr >= _SPRT_LA), int(llr <= _SPRT_LB)
        state = ("continue" if not (decided or hu or hl)
                 else "accept_h1" if hu else "accept_h0" if hl
                 else "decided_earlier")
        decided = decided or hu or hl
        g = got[di - d0]
        assert (g["x"], g["n"], g["llr_micro"]) == (x, n, llr)
        assert (g["hit_upper"], g["hit_lower"]) == (hu, hl)
        assert g["state"] == state


@pytest.mark.parametrize("name", ["events_sprt_sequential"])
def test_wave17_timezone_invariance(spark, sf_small, name):
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
