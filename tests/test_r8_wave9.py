"""Round-8 wave 9 (operating_point): independent references for
PR-AUC, calibration error, threshold selection and the accuracy-parity
fairness audit, plus the standing partition-invariance contract."""

import math

import pandas as pd
import pytest

from impractical_impala_spark.queries.operating_point import (
    ECE_BINS, PR_BINS)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

WAVE9 = [
    "events_pr_auc", "events_calibration_error",
    "events_threshold_selection", "fairness_accuracy_parity",
]


def _binned(sf_small, nb):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "value"])
    ev = ev[ev["value"].notna()].copy()
    mn, mx = ev["value"].min(), ev["value"].max()

    def binof(v):
        if mx == mn:
            return 0
        return min(nb - 1, max(0, math.floor((v - mn) * nb / (mx - mn))))

    ev["bin"] = ev["value"].map(binof)
    ev["pos"] = (ev["event_type"] == "purchase").astype(int)
    return ev


def _sweep(ev, nb):
    """descending-threshold cumulative (tp, fp) per nonempty bin."""
    hist = (ev.groupby("bin")
            .agg(p=("pos", "sum"), ng=("pos", lambda s: (1 - s).sum()))
            .sort_index(ascending=False))
    hist["tp"] = hist["p"].cumsum()
    hist["fp"] = hist["ng"].cumsum()
    return hist


def test_pr_auc_matches_sweep(spark, sf_small):
    ev = _binned(sf_small, PR_BINS)
    hist = _sweep(ev, PR_BINS)
    P = int(ev["pos"].sum())
    N = len(ev) - P
    apn = sum(int(r["p"]) * (int(r["tp"]) * 1_000_000
                             // (int(r["tp"]) + int(r["fp"])))
              for _, r in hist.iterrows())
    prec50 = max((int(r["tp"]) * 1_000_000 // (int(r["tp"]) + int(r["fp"]))
                  for _, r in hist.iterrows()
                  if int(r["tp"]) * 1_000_000 // P >= 500_000),
                 default=None)
    row = _Q["events_pr_auc"].build(spark, sf_small).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (P, N)
    assert row["ap_ppm"] == apn // P
    assert row["prec_at_r50_ppm"] == prec50
    # AP of a chance-level scorer ~ base rate; sanity bounds
    assert 0 <= row["ap_ppm"] <= 1_000_000


def test_calibration_error_matches_loop(spark, sf_small):
    ev = _binned(sf_small, ECE_BINS)
    n = len(ev)
    hist = ev.groupby("bin").agg(nb=("pos", "size"), pb=("pos", "sum"))
    gaps = {b: abs(b * 1_000_000 // (ECE_BINS - 1)
                   - int(r["pb"]) * 1_000_000 // int(r["nb"]))
            for b, r in hist.iterrows()}
    en = sum(int(hist.loc[b, "nb"]) * g for b, g in gaps.items())
    row = _Q["events_calibration_error"].build(spark, sf_small).collect()[0]
    assert row["n"] == n
    assert row["n_bins"] == len(hist)
    assert row["ece_ppm"] == en // n
    assert row["mce_ppm"] == max(gaps.values())
    assert row["ece_ppm"] <= row["mce_ppm"]


def test_threshold_selection_matches_argmax(spark, sf_small):
    ev = _binned(sf_small, PR_BINS)
    hist = _sweep(ev, PR_BINS)
    P = int(ev["pos"].sum())
    N = len(ev) - P
    cands = []
    for b, r in hist.iterrows():
        tp, fp = int(r["tp"]), int(r["fp"])
        fn, tn = P - tp, N - fp
        j = tp * 1_000_000 // P - fp * 1_000_000 // N
        f1 = 2 * tp * 1_000_000 // (2 * tp + fp + fn)
        cands.append((b, tp, fp, fn, tn, j, f1))
    jb = max(cands, key=lambda c: (c[5], c[0]))
    fb = max(cands, key=lambda c: (c[6], c[0]))
    got = {r["criterion"]: r for r in
           _Q["events_threshold_selection"].build(spark, sf_small).collect()}
    assert set(got) == {"youden", "f1"}
    for crit, ref, score_ix in (("youden", jb, 5), ("f1", fb, 6)):
        row = got[crit]
        assert (row["thr_bin"], row["tp"], row["fp"], row["fn"],
                row["tn"]) == ref[:5]
        assert row["score_ppm"] == ref[score_ix]


def test_fairness_parity_matches_groupby(spark, sf_small):
    preds = (_Q["text_langid"].build(spark, sf_small)
             .select("doc_id", "lang", "pred_lang").toPandas())
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source"])
    m = preds.merge(docs, on="doc_id")
    m["ok"] = (m["lang"] == m["pred_lang"]).astype(int)
    per = m.groupby("source").agg(n=("ok", "size"), correct=("ok", "sum"))
    pooled = int(per["correct"].sum()) * 1_000_000 // int(per["n"].sum())
    got = {r["source"]: r for r in
           _Q["fairness_accuracy_parity"].build(spark, sf_small).collect()}
    assert set(got) == set(per.index)
    for src, r in per.iterrows():
        acc = int(r["correct"]) * 1_000_000 // int(r["n"])
        parity = acc * 1_000_000 // pooled
        row = got[src]
        assert (row["n"], row["acc_ppm"], row["pooled_ppm"]) == (
            int(r["n"]), acc, pooled)
        assert row["parity_ppm"] == parity
        assert row["passes_fourfifths"] == int(parity >= 800_000)


@pytest.mark.parametrize("name", WAVE9)
def test_wave9_partition_invariance(spark, sf_small, name):
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


@pytest.mark.parametrize("name", ["events_pr_auc",
                                  "events_calibration_error",
                                  "events_threshold_selection"])
def test_wave9_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep (value-keyed, but the events scan goes
    through load_table's ts_ns path)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
