"""Round-9 wave 33 kernels: independent references — a Counter-based
boilerplate census, an exact numpy mean-excess replay, and an
exact-sort Gini checked against the histogram-cutpoint estimate."""

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.curation import (
    BP_MIN_CHARS, BP_MIN_DOCS)
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.stat_tests import ME_PCTS
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_boilerplate_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    frag_docs = defaultdict(set)
    doc_frags = defaultdict(list)
    for _, r in docs.iterrows():
        for frag in r["text"].split("."):
            frag = frag.strip()
            if len(frag) >= BP_MIN_CHARS:
                frag_docs[(r["source"], frag)].add(r["doc_id"])
                doc_frags[(r["doc_id"], r["source"])].append(frag)
    per_source = defaultdict(list)
    for (doc_id, src), frags in doc_frags.items():
        n_bp = sum(1 for f in frags
                   if len(frag_docs[(src, f)]) >= BP_MIN_DOCS)
        per_source[src].append(n_bp * 1_000_000 // len(frags))
    got = {r["source"]: r for r in
           _Q["doc_boilerplate_ratio"].build(spark, sf_small).collect()}
    assert set(got) == set(per_source)
    for src, ppms in per_source.items():
        r = got[src]
        assert r["n_docs"] == len(ppms)
        assert r["mean_bp_ppm"] == sum(ppms) // len(ppms)
        assert r["max_bp_ppm"] == max(ppms)


def test_mean_excess_matches_numpy(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["value"])
    centi = np.floor(ev["value"].to_numpy() * 100).astype("int64")
    centi.sort()
    n = len(centi)
    got = {r["p_pct"]: r for r in
           _Q["events_mean_excess"].build(spark, sf_small).collect()}
    assert set(got) == set(ME_PCTS)
    for p in ME_PCTS:
        # smallest value whose <=-rank crosses p% of the population
        idx = next(i for i in range(n) if (i + 1) * 100 >= p * n)
        u = int(centi[idx])
        # the first-crossing cum is at the LAST occurrence of u
        exceed = centi[centi > u]
        r = got[p]
        assert r["u_centi"] == u
        assert r["n_exceed"] == len(exceed)
        if len(exceed):
            assert r["mean_excess_milli"] == int(
                (exceed - u).sum()) * 1000 // len(exceed)
        else:
            assert r["mean_excess_milli"] is None


def test_gini_matches_exact_sort(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id"])
    counts = np.sort(ev.groupby("user_id").size().to_numpy())
    n = len(counts)
    s = int(counts.sum())
    # exact Gini from the full sort (the reference the histogram
    # estimator approximates at bin granularity)
    cum = np.cumsum(counts)
    exact_g = 1 - float((2 * cum - counts).sum()) / (n * s)
    row = _Q["user_activity_gini"].build(spark, sf_small).collect()[0]
    assert row["n_users"] == n
    assert row["mean_events_milli"] == s * 1000 // n
    # bin-granularity agreement: 4096 cells over the count range keep
    # the grouped estimator within a tight band of the exact Gini
    assert abs(row["gini_ppm"] / 1e6 - exact_g) < 2e-3
    # and replay the grouped estimator exactly
    mn, mx = int(counts.min()), int(counts.max())
    bins = (np.minimum((counts - mn) * 4096 // (mx - mn + 1), 4095)
            if mx > mn else np.zeros(n, dtype=int))
    nano = 0
    n_prev = s_prev = 0
    for b in sorted(set(bins.tolist())):
        nb = int((bins == b).sum())
        sb = int(counts[bins == b].sum())
        nano += _half_away(1e9 * nb * (2 * s_prev + sb) / (n * s))
        n_prev += nb
        s_prev += sb
    assert row["gini_ppm"] == (1_000_000_000 - nano) // 1000
