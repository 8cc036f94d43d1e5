"""Round-9 wave 19 kernels: independent references for the
capped-greedy mix allocator and the Kneser-Ney bigram LM, plus the
allocator's conservation/cap invariants."""

import math
from collections import Counter, defaultdict

import pandas as pd

from impractical_impala_spark.queries.curation import (
    MIX_BUDGET_DEN, MIX_BUDGET_NUM, MIX_CAP_DEN)
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def _source_tokens(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    out = defaultdict(lambda: [0, 0])
    stops = {"the", "a", "of", "to", "and"}
    for _, r in docs.iterrows():
        ws = r["text"].lower().split(" ")
        a = out[r["source"]]
        a[0] += len(ws)
        a[1] += sum(t in stops for t in ws)
    return out


def test_mix_allocation_matches_greedy_reference(spark, sf_small):
    src = _source_tokens(sf_small)
    scored = sorted(
        ((sw * 1_000_000 // nt, s, nt) for s, (nt, sw) in src.items()),
        key=lambda x: (-x[0], x[1]))
    total = sum(nt for nt, _ in src.values())
    budget = total * MIX_BUDGET_NUM // MIX_BUDGET_DEN
    cap = budget // MIX_CAP_DEN
    remaining = budget
    want = {}
    for q, s, nt in scored:
        take = max(0, min(nt, cap, remaining))
        want[s] = (q, nt, take)
        remaining -= min(nt, cap)
    got = {r["source"]: r for r in
           _Q["corpus_mix_allocation"].build(spark, sf_small).collect()}
    for s, (q, nt, take) in want.items():
        r = got[s]
        assert (r["quality_ppm"], r["tokens"], r["allocated"]) == (
            q, nt, take)
        assert r["budget_share_ppm"] == take * 1_000_000 // budget
    # conservation + cap invariants
    assert sum(r["allocated"] for r in got.values()) <= budget
    assert all(r["allocated"] <= cap for r in got.values())


def test_kneser_ney_matches_counter_reference(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    sbc = Counter()
    for _, r in docs.iterrows():
        ws = r["text"].lower().split(" ")
        for w1, w2 in zip(ws, ws[1:]):
            sbc[(r["source"], w1, w2)] += 1
    c12 = Counter()
    for (s, w1, w2), c in sbc.items():
        c12[(w1, w2)] += c
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    nb = len(c12)
    lp = {}
    for (w1, w2), c in c12.items():
        p = ((c - 0.75) / c1[w1]
             + (0.75 * n1f[w1] / c1[w1]) * (n1b[w2] / nb))
        lp[(w1, w2)] = _half_away(math.log(p) * 1e9)
    per_src = defaultdict(lambda: [0, 0])
    for (s, w1, w2), c in sbc.items():
        a = per_src[s]
        a[0] += c
        a[1] += lp[(w1, w2)] * c
    got = {r["source"]: r for r in
           _Q["text_bigram_kneser_ney"].build(spark, sf_small).collect()}
    for s, (n, lpsum) in per_src.items():
        r = got[s]
        assert r["n_bigrams"] == n
        want = round(-lpsum / (1e9 * n), 6)
        assert math.isclose(r["kn_xent_nats"], want, abs_tol=1e-9)
