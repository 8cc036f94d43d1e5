"""Round-8 wave 6 — independent references and hostility sweeps for
the scoring/sequence/tail queries (queries/scoring_seq.py)."""

import math

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.queries.scoring_seq import (
    CCF_MAX_LAG, CCF_X_TYPE, CCF_Y_TYPE, GAIN_BINS, GAIN_DECILES,
    GUMBEL_RETURN_BLOCKS, SPM_TOPK, WOE_BINS,
)
from impractical_impala_spark.queries.paths_stats import SESSION_GAP_US

_Q = all_queries()

WAVE6 = [
    "events_woe_iv", "events_cumulative_gain", "session_pattern_mining",
    "events_type_ccf", "events_gumbel_maxima", "snm_recall_audit",
]


@pytest.mark.parametrize("name", WAVE6)
def test_wave6_partition_invariance(spark, sf_small, name):
    """Wave-6 determinism under hostile splits (r5-r8 contract)."""
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


@pytest.mark.parametrize("name", ["events_type_ccf",
                                  "events_gumbel_maxima",
                                  "session_pattern_mining"])
def test_wave6_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the timestamp-keyed wave-6 ops."""
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
def _events(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["ns"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                .astype("int64"))
    ev["day"] = ev["ns"] // 86_400_000_000_000
    return ev


def _binned(ev, n_bins):
    mn, mx = ev["value"].min(), ev["value"].max()
    raw = np.floor((ev["value"] - mn) * n_bins / (mx - mn))
    out = ev.copy()
    out["bin"] = np.clip(raw, 0, n_bins - 1).astype("int64")
    out["pos"] = (out["event_type"] == "purchase").astype("int64")
    return out


def test_woe_iv_matches_numpy(spark, sf_small):
    ev = _binned(_events(sf_small), WOE_BINS)
    hist = ev.groupby("bin").agg(p=("pos", "sum"),
                                 n=("pos", "size"))
    hist["ng"] = hist["n"] - hist["p"]
    tp, tn = int(hist["p"].sum()), int(hist["ng"].sum())
    got = {r["bin"]: r for r in
           _Q["events_woe_iv"].build(spark, sf_small).collect()}
    assert len(got) == len(hist)
    iv_total = 0.0
    for b, r in hist.iterrows():
        p, ng = int(r["p"]), int(r["ng"])
        woe = math.log(((p + 0.5) / tp) / ((ng + 0.5) / tn))
        iv = (p / tp - ng / tn) * woe
        row = got[b]
        assert (row["n_pos"], row["n_neg"]) == (p, ng)
        assert math.isclose(row["woe"], woe, abs_tol=2e-6)
        assert math.isclose(row["iv_term"], iv, abs_tol=2e-6)
        iv_total += iv
    assert iv_total >= 0  # IV is a sum of non-negative terms


def test_cumulative_gain_matches_reference(spark, sf_small):
    ev = _binned(_events(sf_small), GAIN_BINS)
    hist = (ev.groupby("bin").agg(n=("pos", "size"), p=("pos", "sum"))
            .reset_index().sort_values("bin", ascending=False))
    nt, pt = int(hist["n"].sum()), int(hist["p"].sum())
    cum_before = 0
    dec_rows = {}
    for _, r in hist.iterrows():
        d = min(GAIN_DECILES - 1, cum_before * GAIN_DECILES // nt)
        a = dec_rows.setdefault(d, [0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["p"])
        cum_before += int(r["n"])
    got = _Q["events_cumulative_gain"].build(spark, sf_small).collect()
    assert len(got) == len(dec_rows)
    cp = cr = 0
    for row in got:
        n, p = dec_rows[row["decile"]]
        assert (row["n_rows"], row["n_pos"]) == (n, p)
        cp += p
        cr += n
        assert row["capture_ppm"] == cp * 1_000_000 // pt
        assert row["lift_ppm"] == (cp * nt * 1_000_000) // (cr * pt)


def test_session_patterns_match_pandas(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_type", "event_id",
                                  "ts"])
    ev["us"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                .astype("int64") // 1000)
    ev = ev.sort_values(["user_id", "us", "event_id"])
    support = {}
    for uid, g in ev.groupby("user_id"):
        seqs = []
        cur = []
        last = None
        for r in g.itertuples():
            if last is not None and r.us - last > SESSION_GAP_US:
                seqs.append(cur)
                cur = []
            cur.append(r.event_type)
            last = r.us
        seqs.append(cur)
        for s in seqs:
            pats = {">".join(s[i:i + 3]) for i in range(len(s) - 2)}
            for pat in pats:
                support[pat] = support.get(pat, 0) + 1
    want = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))
    want = want[:SPM_TOPK]
    got = _Q["session_pattern_mining"].build(spark, sf_small).collect()
    assert [(r["pattern"], r["support"]) for r in got] == want


def test_type_ccf_matches_numpy(spark, sf_small):
    ev = _events(sf_small)
    days = (ev[ev["event_type"].isin([CCF_X_TYPE, CCF_Y_TYPE])]
            .groupby("day")["event_type"]
            .agg(xc=lambda s: (s == CCF_X_TYPE).sum(),
                 yc=lambda s: (s == CCF_Y_TYPE).sum()))
    # dense spine: absent days are real zero observations
    days = days.reindex(range(days.index.min(), days.index.max() + 1),
                        fill_value=0)
    got = {r["lag"]: r for r in
           _Q["events_type_ccf"].build(spark, sf_small).collect()}
    idx = days.index
    for lag in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        xs, ys = [], []
        for d in idx:
            if d - lag in idx:
                xs.append(days.loc[d - lag, "xc"])
                ys.append(days.loc[d, "yc"])
        x, y = np.array(xs, dtype=float), np.array(ys, dtype=float)
        r = np.corrcoef(x, y)[0, 1]
        row = got[lag]
        assert row["n"] == len(x)
        assert math.isclose(row["ccf"], r, abs_tol=2e-6), (lag, row["ccf"], r)


def test_gumbel_matches_moments(spark, sf_small):
    ev = _events(sf_small)
    ev["centi"] = np.floor(ev["value"] * 100).astype("int64")
    got = {r["event_type"]: r for r in
           _Q["events_gumbel_maxima"].build(spark, sf_small).collect()}
    for etype, g in ev.groupby("event_type"):
        m = g.groupby("day")["centi"].max().to_numpy(dtype=float)
        if len(m) < 2:
            continue
        mean = m.mean() / 100.0
        sd = m.std(ddof=1) / 100.0
        beta = sd * math.sqrt(6.0) / math.pi
        mu = mean - 0.577216 * beta
        rl = mu - beta * math.log(-math.log(1.0 - 1.0
                                            / GUMBEL_RETURN_BLOCKS))
        row = got[etype]
        assert row["n_blocks"] == len(m)
        assert math.isclose(row["gumbel_mu"], mu, abs_tol=2e-4)
        assert math.isclose(row["gumbel_beta"], beta, abs_tol=2e-4)
        assert math.isclose(row["return_level_30"], rl, abs_tol=2e-4)


def test_snm_recall_audit_contract(spark, sf_small):
    """The audit's own arithmetic holds and the planted-dup recall is
    substantial (exact copies share the full sort key, so only >w-1
    interleaved same-key docs can hide a pair)."""
    row = _Q["snm_recall_audit"].build(spark, sf_small).collect()[0]
    assert row["n_planted"] > 0
    assert 0 <= row["n_hit"] <= row["n_planted"]
    assert row["n_hit"] <= row["n_zero_pairs"]
    assert row["recall_ppm"] == (row["n_hit"] * 1_000_000
                                 // row["n_planted"])
    assert row["recall_ppm"] > 500_000, "majority of planted dups found"
