"""Round-15 fourth wave: training-pipeline debuts — packing
efficiency and the mixture-temperature sweep.

- doc_pack_efficiency: full Python replay at sf0.001; per-lang token
  totals EQUAL pack_sequences' (different stream keys, same tokens —
  packing never creates or drops tokens); structural window laws
  (n_bins = ceil, tail fill derived exactly, in (0, 1e6]).
- source_mixture_temperature: alpha=1 reproduces natural ppm
  proportions exactly and alpha=0 is uniform with ESS = #domains
  exactly (both engine-independent integer identities); ESS is
  non-increasing in alpha (Chebyshev correlation argument: the
  n^2a-tilted mean of ln n dominates the n^a-tilted one); full
  Python replay of weights/shares/ESS at sf0.001.
"""

import math

import pandas as pd
import pyarrow.parquet as pq

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _collect(spark, name, sf):
    return _Q[name].build(spark, sf).toPandas()


def _half_away(x: float) -> int:
    return (int(math.floor(x + 0.5)) if x >= 0
            else -int(math.floor(-x + 0.5)))


def _docs(sf):
    return (pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text", "lang", "source"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


# ------------------------------------------------ doc_pack_efficiency
def test_pack_efficiency_python_replay(spark, sf_small):
    from impractical_impala_spark.queries.curation import (
        PACK_BUDGET, PACK_SHARDS)

    docs = _docs(sf_small)
    docs["tok"] = docs.text.map(lambda t: len(t.lower().split(" ")))
    docs["shard"] = docs.doc_id % PACK_SHARDS
    rows = []
    for (lang, shard), grp in docs.groupby(["lang", "shard"]):
        grp = grp.sort_values("doc_id")
        start, crossing, total = 0, 0, 0
        for tok in grp.tok:
            if tok > 0 and (start // PACK_BUDGET
                            != (start + tok - 1) // PACK_BUDGET):
                crossing += 1
            start += tok
            total += tok
        n_bins = (total + PACK_BUDGET - 1) // PACK_BUDGET
        tail = (total - (n_bins - 1) * PACK_BUDGET) * 1_000_000 \
            // PACK_BUDGET
        rows.append((lang, shard, len(grp), total, n_bins, crossing,
                     tail))
    want = (pd.DataFrame(rows, columns=[
        "lang", "shard", "n_docs", "total_tokens", "n_bins",
        "n_crossing", "tail_fill_ppm"])
        .sort_values(["lang", "shard"]).reset_index(drop=True))
    got = (_collect(spark, "doc_pack_efficiency", sf_small)
           .sort_values(["lang", "shard"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in want.columns if c != "lang"}),
        want.astype({c: "int64" for c in want.columns if c != "lang"}))


def test_pack_efficiency_totals_equal_pack_sequences(spark, sf_oracle):
    eff = (_collect(spark, "doc_pack_efficiency", sf_oracle)
           .groupby("lang").total_tokens.sum())
    seq = (_collect(spark, "pack_sequences", sf_oracle)
           .groupby("lang").n_tokens.sum())
    assert eff.to_dict() == seq.to_dict()


def test_pack_efficiency_window_laws(spark, sf_oracle):
    from impractical_impala_spark.queries.curation import PACK_BUDGET

    g = _collect(spark, "doc_pack_efficiency", sf_oracle)
    assert (g.n_bins == (g.total_tokens + PACK_BUDGET - 1)
            // PACK_BUDGET).all()
    tail = ((g.total_tokens - (g.n_bins - 1) * PACK_BUDGET)
            * 1_000_000 // PACK_BUDGET)
    assert (g.tail_fill_ppm == tail).all()
    assert ((g.tail_fill_ppm > 0) & (g.tail_fill_ppm <= 1_000_000)).all()
    assert (g.n_crossing <= g.n_docs).all()


# ------------------------------------------ source_mixture_temperature
def test_mixture_alpha1_is_natural_and_alpha0_uniform(spark, sf_oracle):
    g = _collect(spark, "source_mixture_temperature", sf_oracle)
    a10 = g[g.alpha_tenths == 10]
    n_total = int(a10.n_docs.sum())
    assert (a10.weight_micro == a10.n_docs * 1_000_000).all()
    assert (a10.share_ppm
            == a10.n_docs * 1_000_000 // n_total).all()
    a0 = g[g.alpha_tenths == 0]
    d = len(a0)
    assert (a0.weight_micro == 1_000_000).all()
    assert (a0.share_ppm == 1_000_000 // d).all()
    assert (a0.ess_milli == d * 1000).all()


def test_mixture_ess_non_increasing_in_alpha(spark, sf_oracle):
    g = _collect(spark, "source_mixture_temperature", sf_oracle)
    ess = g.groupby("alpha_tenths").ess_milli.first()
    vals = [int(ess.loc[a]) for a in sorted(ess.index)]
    assert vals == sorted(vals, reverse=True), vals
    # and each alpha's ess is constant across its rows (a summary
    # column, repeated by construction)
    assert (g.groupby("alpha_tenths").ess_milli.nunique() == 1).all()


def test_mixture_python_replay(spark, sf_small):
    from impractical_impala_spark.queries.curation import (
        MIX_ALPHA_TENTHS)

    docs = _docs(sf_small)
    dom = (docs.groupby(["lang", "source"]).size()
           .rename("n").reset_index())
    got = (_collect(spark, "source_mixture_temperature", sf_small)
           .sort_values(["alpha_tenths", "lang", "source"])
           .reset_index(drop=True))
    rows = []
    for a in MIX_ALPHA_TENTHS:
        wm = {(r.lang, r.source):
              _half_away(math.pow(float(r.n), float(a) / 10) * 1e6)
              for r in dom.itertuples()}
        s1 = sum(wm.values())
        s2 = sum(w * w for w in wm.values())
        ess = _half_away(float(s1) * float(s1) * 1e3 / float(s2))
        for r in dom.itertuples():
            w = wm[(r.lang, r.source)]
            rows.append((a, r.lang, r.source, r.n, w,
                         w * 1_000_000 // s1, ess))
    want = (pd.DataFrame(rows, columns=got.columns.tolist())
            .sort_values(["alpha_tenths", "lang", "source"])
            .reset_index(drop=True))
    ints = [c for c in got.columns if c not in ("lang", "source")]
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ints}),
        want.astype({c: "int64" for c in ints}))
