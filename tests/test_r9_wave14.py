"""Round-9 wave 14 kernels: independent third-implementation
references (hashlib/numpy/pandas/brute-force) for the KMV sketch, the
sampled equi-depth histogram, PQ ADC search, per-source MRR, the
Nelson-Aalen hazard, and the interval-overlap join — the same
discipline as the r6-r8 kernel suites: every statistical operator is
checked by an arithmetic route that shares no code with the Spark
plan or the DuckDB oracle."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.engine_stats import (
    KMV_K, KMV_SPACE, NDV_MOD, SMP_BUCKETS)
from impractical_impala_spark.queries.joins_special import OV_GAP_US
from impractical_impala_spark.queries.training_extras import (
    ADC_NQ, ADC_TOPK, PQ_K, PQ_M, PQ_SUB)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _md5_28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def test_kmv_matches_hashlib_reference(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_returnflag", "l_partkey"])
    got = {r["l_returnflag"]: r for r in
           _Q["ndv_kmv_sketch"].build(spark, sf_small).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        keys = sorted(set(grp["l_partkey"]))
        hashes = sorted({_md5_28(str(k)) for k in keys})
        want = (len(hashes) if len(hashes) < KMV_K
                else (KMV_K - 1) * KMV_SPACE // max(hashes[KMV_K - 1], 1))
        assert got[flag]["d_true"] == len(keys)
        assert got[flag]["d_hashes"] == len(hashes)
        assert got[flag]["d_kmv"] == want


def test_kmv_error_within_sketch_bound(spark, sf_oracle):
    """KMV's relative standard error is ~1/sqrt(K-2); at K=64 that is
    ~12.6%. Require every group under 5 RSE — a loose bound that still
    catches an off-by-domain hash or a wrong pivot rank."""
    rows = _Q["ndv_kmv_sketch"].build(spark, sf_oracle).collect()
    for r in rows:
        if r["d_hashes"] >= KMV_K:
            assert abs(r["kmv_err_ppm"]) < 5 / math.sqrt(KMV_K - 2) * 1e6


def test_sampled_histogram_matches_pandas_reference(spark, sf_small):
    li = pd.read_parquet(
        f"{sf_small}/lineitem.parquet",
        columns=["l_extendedprice", "l_orderkey", "l_linenumber"])
    li["cents"] = np.floor(li["l_extendedprice"] * 100).astype("int64")
    ident = (li["l_orderkey"].astype(str) + "_"
             + li["l_linenumber"].astype(str))
    in_samp = ident.map(lambda s: _md5_28(s) % NDV_MOD == 0)
    samp = np.sort(li.loc[in_samp, "cents"].to_numpy())
    n_s = len(samp)
    cuts = sorted(samp[(j * n_s) // SMP_BUCKETS - 1]
                  for j in range(1, SMP_BUCKETS))
    # the operator counts cuts <= v (not '<'), so compare directly:
    buckets = np.sum(li["cents"].to_numpy()[:, None]
                     >= np.array(cuts)[None, :], axis=1)
    want = pd.Series(buckets).value_counts().to_dict()
    got = {r["bucket"]: r for r in
           _Q["stats_histogram_sampled"].build(spark, sf_small).collect()}
    assert sum(r["n_rows"] for r in got.values()) == len(li)
    for b, r in got.items():
        assert r["n_rows"] == want[b]
        if b >= 1:
            assert r["lo_cents"] == cuts[b - 1]


def test_adc_matches_numpy_reference(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    vecs = {int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
            for _, r in emb.iterrows()}
    code_vecs = {c: vecs[c] for c in range(PQ_K)}
    sub = lambda v, m: v[m * PQ_SUB:(m + 1) * PQ_SUB]

    def codes(v):
        out = []
        for m in range(PQ_M):
            d = [(float(np.sum((sub(v, m) - sub(code_vecs[c], m)) ** 2)), c)
                 for c in range(PQ_K)]
            out.append(min(d)[1])
        return out

    got = _Q["ann_pq_adc_topk"].build(spark, sf_small).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in range(ADC_NQ):
        lut = {(m, c): float(np.sum(
            (sub(vecs[q], m) - sub(code_vecs[c], m)) ** 2))
            for m in range(PQ_M) for c in range(PQ_K)}
        scored = []
        for vid, v in vecs.items():
            if vid < ADC_NQ:
                continue
            cs = codes(v)
            adc = round(sum(lut[(m, cs[m])] for m in range(PQ_M)), 6)
            scored.append((adc, vid))
        scored.sort()
        want = scored[:ADC_TOPK]
        rows = sorted(by_q[q], key=lambda r: r["rank"])
        for (adc, vid), r in zip(want, rows):
            assert r["vec_id"] == vid
            assert math.isclose(r["adc_r6"], adc, rel_tol=0, abs_tol=2e-6)


def test_mrr_reciprocal_rank_consistency(spark, sf_small):
    """Structural invariants that need no reimplementation of the
    scoring: rr_ppm is exactly 1e6 div first_rel_rank, hit flags are
    monotone (hit1 <= hit3 <= hit10), and ranks are within n_ranked."""
    rows = _Q["retrieval_mrr_hitk"].build(spark, sf_small).collect()
    assert rows, "no sources scored"
    for r in rows:
        assert 1 <= r["first_rel_rank"] <= r["n_ranked"]
        assert r["rr_ppm"] == 1_000_000 // r["first_rel_rank"]
        assert r["hit1"] <= r["hit3"] <= r["hit10"]
        assert r["hit1"] == (1 if r["first_rel_rank"] <= 1 else 0)
        assert r["hit10"] == (1 if r["first_rel_rank"] <= 10 else 0)


def test_nelson_aalen_vs_kaplan_meier_spine(spark, sf_small):
    """NA and KM run the same censored lifetime reduction, so their
    (n_risk, n_churned, n_censored) columns must agree row-for-row;
    the NA cumhaz must be non-decreasing and >= -ln(S_km) is NOT
    required (discrete-time), but H >= sum d/n at the first row is."""
    na = {r["lifetime_d"]: r for r in
          _Q["users_nelson_aalen"].build(spark, sf_small).collect()}
    km = {r["lifetime_d"]: r for r in
          _Q["users_kaplan_meier"].build(spark, sf_small).collect()}
    assert set(na) == set(km)
    prev = -1
    for t in sorted(na):
        for c in ("n_risk", "n_churned", "n_censored"):
            assert na[t][c] == km[t][c]
        assert na[t]["na_cumhaz_ppm"] >= prev
        prev = na[t]["na_cumhaz_ppm"]
        want_term = na[t]["n_churned"] * 1_000_000 // na[t]["n_risk"]
        if t == min(na):
            assert na[t]["na_cumhaz_ppm"] == want_term


def test_interval_overlap_matches_bruteforce(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts"])
    ev["ts_us"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                   .astype("int64") // 1000)
    ivs = []
    for uid, grp in ev.groupby("user_id"):
        ts = sorted(grp["ts_us"])
        lo = prev = ts[0]
        for t in ts[1:]:
            if t - prev > OV_GAP_US:
                ivs.append((uid, lo, prev))
                lo = t
            prev = t
        ivs.append((uid, lo, prev))
    n_pairs = tot = mx = 0
    for i in range(len(ivs)):
        for j in range(i + 1, len(ivs)):
            a, b = ivs[i], ivs[j]
            if a[0] == b[0]:
                continue
            lo, hi = max(a[1], b[1]), min(a[2], b[2])
            if lo <= hi:
                n_pairs += 1
                tot += hi - lo
                mx = max(mx, hi - lo)
    bounds = {}
    for _, lo, hi in ivs:
        bounds[lo] = bounds.get(lo, 0) + 1
        bounds[hi + 1] = bounds.get(hi + 1, 0) - 1
    active = peak = 0
    for t in sorted(bounds):
        active += bounds[t]
        peak = max(peak, active)
    row = _Q["events_interval_overlap"].build(spark, sf_small).collect()[0]
    assert row["n_sessions"] == len(ivs)
    assert row["n_pairs"] == n_pairs
    assert row["tot_overlap_us"] == tot
    assert row["max_overlap_us"] == mx
    assert row["max_concurrent"] == peak


WAVE14_TS = ["events_interval_overlap", "users_nelson_aalen"]


@pytest.mark.parametrize("name", WAVE14_TS)
def test_wave14_timezone_invariance(spark, sf_small, name):
    """Both ts-bearing wave-14 queries bin on the lossless ts_ns
    epoch; a hostile UTC+14 session zone must not move any value."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
