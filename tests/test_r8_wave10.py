"""Round-8 wave 10 (experiment): independent third-implementation
references for RBO agreement, McNemar pairing, MDE power analysis,
linear CKA, and Neyman allocation, plus the standing partition- and
TZ-invariance contracts."""

import math

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.experiment import (
    NEYMAN_BUDGET, RBO_COEF, RBO_FULL, RBO_K)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

WAVE10 = [
    "text_rbo_agreement", "langid_mcnemar", "events_mde_power",
    "emb_cka_alignment", "source_neyman_allocation",
]


def _rbo_exact(list_a, list_b):
    """Exact-fraction RBO@10 (p=0.9) from two ranked lists — an
    arithmetic route independent of the scaled-integer plan."""
    from fractions import Fraction
    p = Fraction(9, 10)
    s = Fraction(0)
    for d in range(1, RBO_K + 1):
        ov = len(set(list_a[:d]) & set(list_b[:d]))
        s += (1 - p) * p ** (d - 1) * Fraction(ov, d)
    return s


def test_rbo_matches_fraction_reference(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    rows = []
    for _, r in docs.iterrows():
        for t in r["text"].lower().split(" "):
            if t:
                rows.append((r["source"], r["doc_id"], t))
    tdf = pd.DataFrame(rows, columns=["source", "doc_id", "term"])
    n_docs = len(docs)
    df_ = (tdf.drop_duplicates(["doc_id", "term"])
           .groupby("term").size().to_dict())
    got = {r["source"]: r for r in
           _Q["text_rbo_agreement"].build(spark, sf_small).collect()}
    for src, grp in tdf.groupby("source"):
        tf = grp.groupby("term").size()
        score_a = {t: c * round(
            (math.log(n_docs) - math.log(df_[t])) * 100)
            for t, c in tf.items()}
        top_a = sorted(score_a, key=lambda t: (-score_a[t], t))[:RBO_K]
        top_b = sorted(tf.index, key=lambda t: (-tf[t], t))[:RBO_K]
        from fractions import Fraction
        frac = _rbo_exact(top_a, top_b)
        scaled = sum(
            RBO_COEF[d - 1] * len(set(top_a[:d]) & set(top_b[:d]))
            for d in range(1, RBO_K + 1))
        row = got[src]
        assert row["rbo_scaled"] == scaled
        assert row["rbo_ppm"] == scaled * 1_000_000 // RBO_FULL
        # the scaled integer IS the exact fraction times the raw
        # 2520 * 10^10 scale (RBO_FULL is the perfect-agreement sum)
        assert frac == Fraction(scaled, 2520 * 10 ** 10)
        assert row["n_common"] == len(set(top_a) & set(top_b))


def test_rbo_identical_rankings_hit_unity():
    """ov_d = d for all d must normalize to exactly 1,000,000 ppm —
    the scaled-integer construction is exact, not approximate."""
    scaled = sum(RBO_COEF[d - 1] * d for d in range(1, RBO_K + 1))
    assert scaled == RBO_FULL
    assert scaled * 1_000_000 // RBO_FULL == 1_000_000


def _md5_bucket(token, nlangs=5):
    import hashlib
    return int(hashlib.md5(token.encode()).hexdigest()[:7], 16) % nlangs


def test_mcnemar_matches_loop(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    langs = ["en", "fr", "es", "zh", "de"]
    n = b01 = c10 = both = a_ok = b_ok = 0
    for _, r in docs.iterrows():
        words = [w for w in r["text"].lower().split(" ")]
        preds = []
        for key in (lambda w: w, lambda w: w[::-1]):
            votes = [0] * 5
            for w in words:
                votes[_md5_bucket(key(w))] += 1
            best = max(votes)
            preds.append(langs[votes.index(best)])
        oka = preds[0] == r["lang"]
        okb = preds[1] == r["lang"]
        n += 1
        a_ok += oka
        b_ok += okb
        both += oka and okb
        b01 += oka and not okb
        c10 += (not oka) and okb
    row = _Q["langid_mcnemar"].build(spark, sf_small).collect()[0]
    assert row["n_docs"] == n
    assert row["acc_a_ppm"] == a_ok * 1_000_000 // n
    assert row["acc_b_ppm"] == b_ok * 1_000_000 // n
    assert (row["n_both"], row["n_a_only"], row["n_b_only"]) == (
        both, b01, c10)
    assert row["n_neither"] == n - both - b01 - c10
    if b01 + c10:
        assert row["mcnemar_chi2"] == round(
            (b01 - c10) ** 2 / (b01 + c10), 4)


def test_mde_matches_closed_form(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type"])
    per = ev.groupby("event_type").size()
    n = int(per.sum())
    zsum = 1.959964 + 0.841621
    got = {r["event_type"]: r for r in
           _Q["events_mde_power"].build(spark, sf_small).collect()}
    for et, x in per.items():
        p = x / n
        mde = zsum * math.sqrt(2 * p * (1 - p) / (n // 2))
        nreq = math.ceil(2 * (1 - p) / p * zsum * zsum / 0.0025)
        row = got[et]
        assert (row["x"], row["n"]) == (x, n)
        assert row["share_ppm"] == x * 1_000_000 // n
        assert row["mde_abs_ppm"] == round(mde * 1_000_000)
        assert row["n_req_rel5"] == nreq
        # rarer types need a larger absolute-share experiment? no:
        # absolute MDE grows with p(1-p); relative-n grows as p drops
    shares = sorted((per[et] / n, got[et]["n_req_rel5"]) for et in per.index)
    assert shares[0][1] >= shares[-1][1]  # rarest type needs most n


def test_cka_matches_numpy(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["embedding"])
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    xq = np.floor(x * 1024)
    xc = xq - xq.mean(axis=0)
    half = xq.shape[1] // 2
    a, b = xc[:, :half], xc[:, half:]
    fab = np.linalg.norm(a.T @ b, "fro") ** 2
    faa = np.linalg.norm(a.T @ a, "fro") ** 2
    fbb = np.linalg.norm(b.T @ b, "fro") ** 2
    want = fab / math.sqrt(faa * fbb)
    row = _Q["emb_cka_alignment"].build(spark, sf_small).collect()[0]
    assert row["n"] == len(emb)
    assert row["n_cells"] == 64 * 65 // 2
    assert abs(row["cka"] - want) < 1e-5
    assert 0.0 <= row["cka"] <= 1.0


def test_cka_detects_duplicated_halves():
    """Kernel-level: if the second half IS the first half, CKA = 1;
    independent random halves score near 0 — the audit the operator
    exists to run. Pure numpy (the operator's math, not its plan)."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(500, 32))
    dup = np.hstack([a, a])
    ind = np.hstack([a, rng.normal(size=(500, 32))])

    def cka(m):
        c = m - m.mean(axis=0)
        x, y = c[:, :32], c[:, 32:]
        return (np.linalg.norm(x.T @ y, "fro") ** 2
                / (np.linalg.norm(x.T @ x, "fro") ** 2
                   * np.linalg.norm(y.T @ y, "fro") ** 2) ** 0.5)

    assert cka(dup) > 0.999
    assert cka(ind) < 0.1


def test_neyman_matches_formula(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    docs["nt"] = docs["text"].str.lower().str.split(" ").map(len)
    w = {}
    per = {}
    for src, g in docs.groupby("source"):
        nd = len(g)
        sx = int(g["nt"].sum())
        sxx = int((g["nt"] * g["nt"]).sum())
        sd = math.sqrt((nd * sxx - sx * sx) / (nd * (nd - 1)))
        w[src] = round(nd * sd * 100)
        per[src] = (nd, sx, sd)
    wtot = sum(w.values())
    got = {r["source"]: r for r in
           _Q["source_neyman_allocation"].build(spark, sf_small).collect()}
    assert set(got) == set(w)
    for src, wc in w.items():
        row = got[src]
        nd, sx, sd = per[src]
        assert (row["n_docs"], row["total_tokens"]) == (nd, sx)
        assert row["w_centi"] == wc
        assert row["alloc_ppm"] == wc * 1_000_000 // wtot
        assert row["alloc_docs"] == NEYMAN_BUDGET * wc // wtot
        assert abs(row["sd_tokens"] - round(sd, 4)) < 1e-9
    # allocations must (under-)spend the budget, never overspend
    assert sum(r["alloc_docs"] for r in got.values()) <= NEYMAN_BUDGET


@pytest.mark.parametrize("name", WAVE10)
def test_wave10_partition_invariance(spark, sf_small, name):
    """Hostile scan/shuffle/Arrow-batch partitioning must not move a
    single output value."""
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


@pytest.mark.parametrize("name", ["events_mde_power"])
def test_wave10_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the one events-scanning query."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
