"""Round-8 wave 8 (corpus_eval): independent third-implementation
references for every kernel — Chao1/Good-Turing, Cohen's kappa +
macro-F1, split-conformal calibration, the Hill tail index, the Murphy
Brier decomposition, and bigram TF-IDF cosine linkage — plus the
standing partition-invariance and hostile-TZ contracts."""

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from impractical_impala_spark.queries.corpus_eval import (
    BRIER_BINS, CONF_ALPHA_PCT, HILL_K, TFIDF_DF_CAP, TFIDF_TOP_K)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

WAVE8 = [
    "vocab_chao1_richness", "langid_kappa_f1",
    "events_conformal_calibration", "events_hill_tail",
    "events_brier_decomposition", "tfidf_doc_neardup",
]


def _half_up(x: float) -> int:
    """round-half-up for positive x (Spark F.round / DuckDB ROUND)."""
    return int(math.floor(x + 0.5))


def _md5_7(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


# ------------------------------------------------------ references
def test_chao1_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    got = {r["source"]: r for r in
           _Q["vocab_chao1_richness"].build(spark, sf_small).collect()}
    assert set(got) == set(docs["source"].unique())
    for src, g in docs.groupby("source"):
        cnt = Counter(t for txt in g["text"]
                      for t in txt.lower().split(" "))
        v, n = len(cnt), sum(cnt.values())
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        row = got[src]
        assert (row["v"], row["n"], row["f1"], row["f2"]) == (v, n, f1, f2)
        chao1 = v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1))
        assert abs(row["chao1_r"] - round(chao1, 4)) < 1e-9
        assert row["unseen_ppm"] == f1 * 1_000_000 // n


def test_kappa_matches_contingency(spark, sf_small):
    """kappa/macro-F1 re-derived with a literal contingency-table
    loop from the SAME langid predictions (tests the aggregation
    plan, independent of the scorer)."""
    preds = (_Q["text_langid"].build(spark, sf_small)
             .select("lang", "pred_lang").toPandas())
    n = len(preds)
    cells = Counter(zip(preds["lang"], preds["pred_lang"]))
    rows = Counter(preds["lang"])
    cols = Counter(preds["pred_lang"])
    po = sum(c for (a, b), c in cells.items() if a == b)
    classes = set(rows) | set(cols)
    pe = sum(rows.get(k, 0) * cols.get(k, 0) for k in classes)
    kappa = (n * po - pe) / (n * n - pe)
    label_classes = sorted(k for k in classes if rows.get(k, 0) > 0)
    f1_ppm = [2 * cells.get((k, k), 0) * 1_000_000
              // (rows.get(k, 0) + cols.get(k, 0)) for k in label_classes]
    row = _Q["langid_kappa_f1"].build(spark, sf_small).collect()[0]
    assert row["n"] == n
    assert row["n_classes"] == len(label_classes)
    assert row["acc_ppm"] == po * 1_000_000 // n
    assert abs(row["kappa_r"] - round(kappa, 6)) < 1e-9
    assert row["macro_f1_ppm"] == sum(f1_ppm) // len(label_classes)
    assert -1.0 <= row["kappa_r"] <= 1.0


def test_conformal_matches_sorted_reference(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev = ev[ev["value"].notna()].copy()
    ev["centi"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    ev["fold"] = ev["event_id"].map(lambda i: _md5_7(str(i)) % 2)
    got = {r["event_type"]: r for r in
           _Q["events_conformal_calibration"].build(spark, sf_small)
           .collect()}
    for etype, g in ev.groupby("event_type"):
        cal = sorted(g.loc[g["fold"] == 0, "centi"])
        tst = list(g.loc[g["fold"] == 1, "centi"])
        n_cal = len(cal)
        k = ((100 - CONF_ALPHA_PCT) * (n_cal + 1) + 99) // 100
        thr = cal[k - 1] if k <= n_cal else None
        covered = (len(tst) if thr is None
                   else sum(1 for x in tst if x <= thr))
        row = got[etype]
        assert row["n_cal"] == n_cal and row["k_rank"] == k
        assert row["thr_centi"] == thr
        assert row["n_test"] == len(tst)
        assert row["coverage_ppm"] == covered * 1_000_000 // len(tst)
        # distribution-free guarantee: coverage ~ 90%; at sf0.001 each
        # type has only ~100 calibration rows, so the binomial slack is
        # ~3% per sigma — gate at ~3.5 sigma below target
        assert row["coverage_ppm"] >= 800_000


def test_hill_matches_sorted_reference(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    ev = ev[ev["value"] > 0].copy()
    ev["centi"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    ev = ev[ev["centi"] >= 1]
    got = {r["event_type"]: r for r in
           _Q["events_hill_tail"].build(spark, sf_small).collect()}
    for etype, g in ev.groupby("event_type"):
        if len(g) < HILL_K + 1:
            assert etype not in got
            continue
        top = g.sort_values(["centi", "event_id"],
                            ascending=[False, True]).head(HILL_K + 1)
        lnq = [_half_up(math.log(c) * 1e6) for c in top["centi"]]
        num = sum(lnq[:HILL_K]) - HILL_K * lnq[HILL_K]
        row = got[etype]
        assert row["xk_centi"] == int(top["centi"].iloc[HILL_K])
        assert row["excess_micro"] == num // HILL_K
        if num == 0:
            assert row["hill_alpha_r"] is None
        else:
            assert abs(row["hill_alpha_r"]
                       - round(HILL_K * 1e6 / num, 6)) < 1e-9
            assert row["hill_alpha_r"] > 0


def test_brier_matches_binned_reference(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["value"].notna()].copy()
    mn, mx = ev["value"].min(), ev["value"].max()
    nb = BRIER_BINS

    def binof(v):
        if mx == mn:
            return 0
        return min(nb - 1, max(0, math.floor((v - mn) * nb / (mx - mn))))

    ev["bin"] = ev["value"].map(binof)
    ev["pos"] = (ev["event_type"] == "purchase").astype(int)
    hist = ev.groupby("bin").agg(nbr=("pos", "size"), pb=("pos", "sum"))
    n, p = len(ev), int(ev["pos"].sum())
    ybar = p * 1_000_000 // n
    rel = res = 0
    for b, r in hist.iterrows():
        p_ppm = b * 1_000_000 // (nb - 1)
        yb = int(r["pb"]) * 1_000_000 // int(r["nbr"])
        rel += int(r["nbr"]) * (p_ppm - yb) ** 2
        res += int(r["nbr"]) * (yb - ybar) ** 2
    row = _Q["events_brier_decomposition"].build(spark, sf_small).collect()[0]
    assert (row["n"], row["n_pos"]) == (n, p)
    assert abs(row["reliability_r"] - round(rel / n / 1e12, 6)) < 1e-9
    assert abs(row["resolution_r"] - round(res / n / 1e12, 6)) < 1e-9
    unc = p * (n - p) / (n * n)
    assert abs(row["uncertainty_r"] - round(unc, 6)) < 1e-9
    assert abs(row["brier_r"]
               - round((rel - res) / n / 1e12 + unc, 6)) < 1e-9


def test_tfidf_neardup_matches_pandas(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "text"])
    nd = len(docs)
    tf: Counter = Counter()
    for did, txt in zip(docs["doc_id"], docs["text"]):
        w = txt.lower().split(" ")
        for i in range(len(w) - 1):
            tf[(did, f"{w[i]} {w[i + 1]}")] += 1
    df: Counter = Counter()
    for (_, t) in tf:
        df[t] += 1
    idf = {t: _half_up((math.log(nd) - math.log(c)) * 100)
           for t, c in df.items()}
    wgt = {(d, t): c * idf[t] for (d, t), c in tf.items()}
    norms: Counter = Counter()
    for (d, _), w in wgt.items():
        norms[d] += w * w
    posting: dict = {}
    for (d, t), w in wgt.items():
        if 2 <= df[t] <= TFIDF_DF_CAP:
            posting.setdefault(t, []).append((d, w))
    pairs: Counter = Counter()
    shared: Counter = Counter()
    for t, lst in posting.items():
        lst.sort()
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                (da, wa), (db, wb) = lst[i], lst[j]
                pairs[(da, db)] += wa * wb
                shared[(da, db)] += 1
    scored = sorted(
        ((dot * dot * 1_000_000 // (norms[a] * norms[b]),
          a, b, shared[(a, b)]) for (a, b), dot in pairs.items()),
        key=lambda x: (-x[0], x[1], x[2]))[:TFIDF_TOP_K]
    got = (_Q["tfidf_doc_neardup"].build(spark, sf_small).collect())
    assert len(got) == len(scored)
    for row, (cos2, a, b, sh) in zip(got, scored):
        assert (row["doc_a"], row["doc_b"]) == (a, b)
        assert row["shared_terms"] == sh
        assert row["cos2_ppm"] == cos2


# ------------------------------------------- standing invariants
@pytest.mark.parametrize("name", WAVE8)
def test_wave8_partition_invariance(spark, sf_small, name):
    """Hostile scan/shuffle/Arrow-batch partitioning must not move a
    single output value (the integer quantization is order-free)."""
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


@pytest.mark.parametrize("name", ["events_brier_decomposition",
                                  "events_conformal_calibration",
                                  "events_hill_tail"])
def test_wave8_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the events-reading wave-8 ops
    (value/event_id-keyed, but they scan the timestamp-bearing
    table through load_table's ts_ns path)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
