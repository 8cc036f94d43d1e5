"""Round-8 wave 5 — independent references and hostility sweeps for
the calibration/harmonization queries (queries/calibration_ops.py).

Third implementations (numpy/pandas/pure Python) of every kernel: a
true PAVA pool-adjacent-violators loop checks the declarative minimax
isotonic fit, AUC re-derives by brute-force pair counting, quantiles
by direct order statistics."""

import math

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.queries.calibration_ops import (
    CSW_BINS, ISO_BINS, POS_TYPE, QN_BUCKETS, ROC_BINS,
)
from impractical_impala_spark.queries.linkage_splits import (
    EMBARGO_DAYS, TRAIN_FRAC_PCT,
)

_Q = all_queries()

WAVE5 = [
    "events_roc_auc", "events_isotonic_calibration",
    "privacy_ldiversity_audit", "covariate_shift_weights",
    "source_quantile_normalize",
]


@pytest.mark.parametrize("name", WAVE5)
def test_wave5_partition_invariance(spark, sf_small, name):
    """Wave-5 determinism under hostile splits (r5-r8 contract)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    conf = [("spark.sql.files.maxPartitionBytes", "65536"),
            ("spark.sql.shuffle.partitions", "7"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "37")]
    old = {k: spark.conf.get(k) for k, _ in conf}
    try:
        for k, v in conf:
            spark.conf.set(k, v)
        skewed = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert base == skewed


@pytest.mark.parametrize("name", ["covariate_shift_weights"])
def test_wave5_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the split-tagged wave-5 query."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


# ------------------------------------------------------ references
def _binned(sf_dir, n_bins):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "ts"])
    ev = ev[ev["value"].notna()].copy()
    ns = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    ev["day"] = ns // 86_400_000_000_000
    mn, mx = ev["value"].min(), ev["value"].max()
    raw = np.floor((ev["value"] - mn) * n_bins / (mx - mn))
    ev["bin"] = np.clip(raw, 0, n_bins - 1).astype("int64")
    ev["pos"] = (ev["event_type"] == POS_TYPE).astype("int64")
    return ev


def test_roc_auc_matches_bruteforce(spark, sf_small):
    """AUC by direct concordant/tied pair counting over the binned
    scores — the O(B²) brute force the engines avoid."""
    ev = _binned(sf_small, ROC_BINS)
    hist = ev.groupby("bin").agg(p=("pos", "sum"),
                                 n=("pos", "size")).reset_index()
    hist["ng"] = hist["n"] - hist["p"]
    u2 = 0
    for _, r in hist.iterrows():
        below = hist.loc[hist["bin"] < r["bin"], "ng"].sum()
        u2 += int(r["p"]) * (2 * int(below) + int(r["ng"]))
    P, N = int(hist["p"].sum()), int(hist["ng"].sum())
    row = _Q["events_roc_auc"].build(spark, sf_small).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (P, N)
    assert math.isclose(row["auc"], u2 / (2 * P * N), abs_tol=1e-6)
    assert math.isclose(row["gini"], u2 / (P * N) - 1.0, abs_tol=1e-6)
    cp = cn = ks = 0
    for _, r in hist.sort_values("bin").iterrows():
        cp += int(r["p"])
        cn += int(r["ng"])
        ks = max(ks, abs(cp * 1_000_000 // P - cn * 1_000_000 // N))
    assert row["ks_ppm"] == ks


def _pava(y, w):
    """Classic pool-adjacent-violators on (value, weight) pairs."""
    blocks = [[yi * wi, wi] for yi, wi in zip(y, w)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand each block's pooled mean back over the positions it
    # absorbed (weights identify the positions uniquely in order)
    res = []
    pos = 0
    for s, wt in blocks:
        acc = 0
        cnt = 0
        while pos + cnt < len(w) and acc < wt:
            acc += w[pos + cnt]
            cnt += 1
        res.extend([s / wt] * cnt)
        pos += cnt
    return res


def test_isotonic_matches_pava(spark, sf_small):
    """The declarative minimax fit equals a classic sequential PAVA
    loop on the same histogram (ppm quantization tolerance), and is
    monotone non-decreasing."""
    ev = _binned(sf_small, ISO_BINS)
    hist = (ev.groupby("bin").agg(w=("pos", "size"), y=("pos", "sum"))
            .reset_index().sort_values("bin"))
    rates = (hist["y"] / hist["w"]).tolist()
    iso_ref = _pava(rates, hist["w"].tolist())
    got = _Q["events_isotonic_calibration"].build(spark, sf_small).collect()
    assert len(got) == len(hist)
    prev = -1
    for row, ref in zip(got, iso_ref):
        assert math.isclose(row["iso_ppm"] / 1e6, ref, abs_tol=3e-6), \
            (row["bin"], row["iso_ppm"], ref)
        assert row["iso_ppm"] >= prev, "isotonic fit must be monotone"
        prev = row["iso_ppm"]


def test_ldiversity_matches_pandas(spark, sf_small):
    orders = pd.read_parquet(f"{sf_small}/orders.parquet",
                             columns=["o_custkey", "o_orderstatus"])
    cust = pd.read_parquet(f"{sf_small}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_mktsegment"])
    nation = pd.read_parquet(f"{sf_small}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    j = (orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    got = {(r["n_name"], r["c_mktsegment"]): r for r in
           _Q["privacy_ldiversity_audit"].build(spark, sf_small).collect()}
    for (name, seg), g in j.groupby(["n_name", "c_mktsegment"]):
        c = g["o_orderstatus"].value_counts().to_numpy(dtype=float)
        n = c.sum()
        h = float(((c / n) * np.log(n / c)).sum())
        row = got[(name, seg)]
        assert row["n_rows"] == int(n)
        assert row["l_distinct"] == len(c)
        assert math.isclose(row["entropy_l"], math.exp(h), abs_tol=2e-4)


def test_shift_weights_match_pandas(spark, sf_small):
    ev = _binned(sf_small, CSW_BINS)
    d0, d1 = ev["day"].min(), ev["day"].max()
    cut = d0 + (d1 - d0) * TRAIN_FRAC_PCT // 100
    ev = ev[(ev["day"] < cut) | (ev["day"] >= cut + EMBARGO_DAYS)].copy()
    ev["is_tr"] = (ev["day"] < cut).astype(int)
    got = {(r["event_type"], r["bin"]): r for r in
           _Q["covariate_shift_weights"].build(spark, sf_small).collect()}
    assert len(got) > 0
    for etype, g in ev.groupby("event_type"):
        ntr = int(g["is_tr"].sum())
        nte = len(g) - ntr
        sw = sw2 = 0
        for b in range(CSW_BINS):
            gb = g[g["bin"] == b]
            tr = int(gb["is_tr"].sum())
            te = len(gb) - tr
            w = ((te + 1) * (ntr + CSW_BINS) * 1_000_000
                 // ((tr + 1) * (nte + CSW_BINS)))
            row = got[(etype, b)]
            assert (row["tr"], row["te"], row["w_ppm"]) == (tr, te, w)
            sw += tr * w
            sw2 += tr * w * w
        ess = (sw * sw) / (ntr * sw2)
        assert math.isclose(got[(etype, 0)]["ess_ratio"], ess,
                            abs_tol=2e-6)


def test_quantile_normalize_matches_numpy(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "n_chars"])
    got = {(r["source"], r["q"]): r for r in
           _Q["source_quantile_normalize"].build(spark, sf_small).collect()}
    pooled = np.sort(docs["n_chars"].to_numpy())
    for src, g in docs.groupby("source"):
        vals = np.sort(g["n_chars"].to_numpy())
        n = len(vals)
        for q in range(1, QN_BUCKETS + 1):
            rank = -(-q * n // QN_BUCKETS)  # ceil
            want_src = int(vals[rank - 1])
            prank = -(-q * len(pooled) // QN_BUCKETS)
            want_pool = int(pooled[prank - 1])
            row = got[(src, q)]
            assert row["src_value"] == want_src, (src, q)
            assert row["pooled_value"] == want_pool, (src, q)
