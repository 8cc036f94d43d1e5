"""Round-9 wave 29 kernels: independent references — a Counter-based
vocabulary coverage curve, a numpy lognormal moment fit, and a
threshold-sweep consistency contract against the registered
single-threshold dedup query."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.dedup import JACCARD_T, SWEEP_T_PPM
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.text import VC_KS
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_vocab_coverage_matches_counter(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["text"])
    c = Counter()
    for t in docs["text"]:
        c.update(t.lower().split(" "))
    n_tokens = sum(c.values())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r["k"]: r for r in
           _Q["vocab_coverage_at_k"].build(spark, sf_small).collect()}
    assert set(got) == set(VC_KS)
    for k in VC_KS:
        covered = sum(v for _, v in ranked[:k])
        r = got[k]
        assert r["n_types"] == len(c)
        assert r["n_tokens"] == n_tokens
        assert r["covered_ppm"] == covered * 1_000_000 // n_tokens
    # monotone in k, and coverage@V = full mass
    ppms = [got[k]["covered_ppm"] for k in sorted(got)]
    assert ppms == sorted(ppms)


def test_lognormal_fit_matches_numpy(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["text"])
    n_tok = np.array([len(t.lower().split(" ")) for t in docs["text"]])
    n_tok = n_tok[n_tok >= 1]
    y = np.array([_half_away(1e6 * math.log(v)) for v in n_tok])
    n = len(y)
    mu = y.sum() / n / 1e6
    var = (n * (y.astype(object) ** 2).sum()
           - int(y.sum()) ** 2) / (n * (n - 1)) / 1e12
    pred = math.exp(mu + var / 2)
    act = n_tok.sum() / n
    row = _Q["doc_length_lognormal_fit"].build(spark, sf_small).collect()[0]
    assert row["n_docs"] == n
    assert row["mu_micro"] == _half_away(mu * 1e6)
    assert math.isclose(row["sigma_micro"] / 1e6, math.sqrt(var),
                        rel_tol=1e-6, abs_tol=2e-6)
    assert row["mean_actual_milli"] == int(n_tok.sum()) * 1000 // n
    assert math.isclose(row["mean_pred_milli"] / 1e3, pred,
                        rel_tol=1e-6, abs_tol=1e-2)
    assert math.isclose(row["ratio_ppm"] / 1e6, act / pred,
                        rel_tol=1e-6, abs_tol=1e-5)


def test_threshold_sweep_consistent_with_single_threshold(spark, sf_small):
    """The sweep at t = JACCARD_T*1e6 must count exactly the pairs the
    registered dedup_ngram_jaccard emits (same blocking, same Jaccard,
    modulo its float-vs-ppm compare at the boundary), and the curve
    must be monotone non-increasing in the threshold."""
    sweep = {r["t_ppm"]: r for r in
             _Q["dedup_threshold_sweep"].build(spark, sf_small).collect()}
    assert set(sweep) == set(SWEEP_T_PPM)
    pairs = [sweep[t]["n_pairs"] for t in sorted(sweep)]
    docs = [sweep[t]["n_docs"] for t in sorted(sweep)]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    t0 = int(JACCARD_T * 1_000_000)
    if t0 in sweep:
        single = (_Q["dedup_ngram_jaccard"].build(spark, sf_small)
                  .collect())
        # ppm floor-compare can only differ from the float compare for
        # pairs EXACTLY on the boundary; count both sides' boundary-free
        # agreement
        exact = sum(1 for r in single
                    if r["jaccard"] * 1_000_000 >= t0)
        assert sweep[t0]["n_pairs"] == exact
    for t in sorted(sweep):
        assert sweep[t]["n_docs"] <= 2 * sweep[t]["n_pairs"]
