"""Round-9 wave 15 kernels: independent pandas/numpy/brute-force
references for the perplexity filter, RAKE keywords, Gopher quality
flags, SAX symbolization, and the p-chart — third implementations
that share no arithmetic route with the Spark plans or the DuckDB
oracles."""

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.queries.forecast import (
    DAY_NS, SAX_BP_MICRO, SAX_W)
from impractical_impala_spark.queries.quality import (
    GQ_MAX_WORDLEN, GQ_MAX_WORDS, GQ_MIN_WORDS, GQ_MWL_HI_X10,
    GQ_MWL_LO_X10, GQ_STOP_DEN, _GQ_STOPS)
from impractical_impala_spark.queries.text_ir import (
    PPL_XENT_MAX_NANO, RAKE_MAXLEN, RAKE_STOPS, RAKE_TOPK)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def _docs_tokens(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    return [(int(r["doc_id"]), r["source"], r["text"].lower().split(" "))
            for _, r in docs.iterrows()]


def test_perplexity_filter_matches_python_reference(spark, sf_small):
    toks = _docs_tokens(sf_small)
    lm = Counter(t for _, _, ws in toks for t in ws)
    n, v = sum(lm.values()), len(lm)
    per_src = defaultdict(lambda: [0, 0])
    for _, src, ws in toks:
        lp = sum(
            int(round(math.log((lm[t] + 1.0) / (n + v + 1.0)) * 1e9)) * c
            for t, c in Counter(ws).items())
        xent = -lp // len(ws)
        per_src[src][0] += 1
        per_src[src][1] += int(xent <= PPL_XENT_MAX_NANO)
    got = {r["source"]: r for r in
           _Q["doc_perplexity_filter"].build(spark, sf_small).collect()}
    assert set(got) == set(per_src)
    for src, (nd, nk) in per_src.items():
        assert got[src]["n_docs"] == nd
        assert got[src]["n_kept"] == nk
        assert got[src]["kept_ppm"] == nk * 1_000_000 // nd


def test_rake_matches_bruteforce(spark, sf_small):
    toks = _docs_tokens(sf_small)
    stops = set(RAKE_STOPS)
    phrases = []  # (source, tuple(words))
    for _, src, ws in toks:
        cur = []
        for t in ws:
            if t in stops:
                if cur:
                    phrases.append((src, tuple(cur)))
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append((src, tuple(cur)))
    phrases = [(s, p) for s, p in phrases if len(p) <= RAKE_MAXLEN]
    freq, degree = Counter(), Counter()
    for _, p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    wscore = {w: degree[w] * 1_000_000 // freq[w] for w in freq}
    scored = defaultdict(lambda: [0, 0])
    for s, p in phrases:
        key = (s, " ".join(p))
        scored[key][0] += 1
        scored[key][1] = sum(wscore[w] for w in p)
    top = defaultdict(list)
    for (s, text), (n_occ, sc) in scored.items():
        top[s].append((-sc, text, n_occ))
    got = _Q["text_keyword_rake"].build(spark, sf_small).collect()
    by_src = defaultdict(list)
    for r in got:
        by_src[r["source"]].append(r)
    for s, lst in top.items():
        lst.sort()
        want = lst[:RAKE_TOPK]
        rows = sorted(by_src[s], key=lambda r: r["rank"])
        assert len(rows) == min(RAKE_TOPK, len(lst))
        for (negsc, text, n_occ), r in zip(want, rows):
            assert r["phrase"] == text
            assert r["score_ppm"] == -negsc
            assert r["n_occ"] == n_occ


def test_gopher_flags_match_pandas_reference(spark, sf_small):
    toks = _docs_tokens(sf_small)
    stops = set(_GQ_STOPS)
    agg = defaultdict(lambda: np.zeros(6, dtype=int))
    for _, src, ws in toks:
        nw, chars = len(ws), sum(len(t) for t in ws)
        maxw, sw = max(len(t) for t in ws), sum(t in stops for t in ws)
        f = [GQ_MIN_WORDS <= nw <= GQ_MAX_WORDS,
             GQ_MWL_LO_X10 * nw <= chars * 10 <= GQ_MWL_HI_X10 * nw,
             sw * GQ_STOP_DEN >= nw,
             maxw <= GQ_MAX_WORDLEN]
        agg[src] += np.array([1, *map(int, f), int(all(f))])
    got = {r["source"]: r for r in
           _Q["doc_gopher_quality_flags"].build(spark, sf_small).collect()}
    for src, (nd, wc, mwl, st, mx, al) in agg.items():
        r = got[src]
        assert (r["n_docs"], r["pass_wordcount"], r["pass_meanwordlen"],
                r["pass_stopword"], r["pass_maxwordlen"],
                r["pass_all"]) == (nd, wc, mwl, st, mx, al)
        assert r["pass_all_ppm"] == al * 1_000_000 // nd


def test_sax_matches_numpy_reference(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ev = ev.assign(d=d)
    dmin, dmax = int(d.min()), int(d.max())
    n_days = dmax - dmin + 1
    got = {r["event_type"]: r for r in
           _Q["events_sax_symbolic"].build(spark, sf_small).collect()}
    for et, grp in ev.groupby("event_type"):
        counts = np.zeros(n_days, dtype=np.int64)
        for day, c in grp.groupby("d").size().items():
            counts[day - dmin] = c
        s, ss, n = counts.sum(), (counts ** 2).sum(), n_days
        var_num = n * ss - s * s
        word = ""
        for w in range(SAX_W):
            idx = [i for i in range(n_days) if i * SAX_W // n_days == w]
            pn, pdn = counts[idx].sum(), len(idx)
            if var_num <= 0:
                zm = 0
            else:
                z = ((int(pn) * n - int(s) * pdn) / (float(pdn) * n)
                     ) / math.sqrt(var_num / (n * (n - 1.0)))
                zm = _half_away(z * 1e6)
            word += ("a" if zm < -SAX_BP_MICRO else
                     "b" if zm < 0 else
                     "c" if zm < SAX_BP_MICRO else "d")
        assert got[et]["sax_word"] == word
        assert got[et]["n_days"] == n_days


def test_pchart_matches_numpy_reference(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_shipdate", "l_returnflag"])
    sd = pd.to_datetime(li["l_shipdate"])
    m = sd.dt.year * 12 + sd.dt.month
    r = (li["l_returnflag"] == "R").astype(int)
    per = pd.DataFrame({"m": m, "r": r}).groupby("m").agg(
        n=("r", "size"), nr=("r", "sum"))
    gn, gr = int(per["n"].sum()), int(per["nr"].sum())
    pbar = gr / gn
    got = {r2["m"]: r2 for r2 in
           _Q["lineitem_pchart_returns"].build(spark, sf_small).collect()}
    assert set(got) == set(int(x) for x in per.index)
    for mi, row in per.iterrows():
        n, nr = int(row["n"]), int(row["nr"])
        sig = math.sqrt(pbar * (1 - pbar) / n)
        ucl = _half_away((pbar + 3 * sig) * 1e6)
        lcl = _half_away(max(pbar - 3 * sig, 0.0) * 1e6)
        g = got[int(mi)]
        assert g["n"] == n and g["nr"] == nr
        assert g["ucl_ppm"] == ucl and g["lcl_ppm"] == lcl
        p_ppm = nr * 1_000_000 // n
        assert g["p_ppm"] == p_ppm
        assert g["ooc"] == int(p_ppm > ucl or p_ppm < lcl)


@pytest.mark.parametrize("name", ["events_sax_symbolic"])
def test_wave15_timezone_invariance(spark, sf_small, name):
    """The ts-bearing wave-15 query bins on the lossless ts_ns epoch;
    a hostile UTC+14 session zone must not move a symbol."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
