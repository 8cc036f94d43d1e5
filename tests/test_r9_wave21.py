"""Round-9 wave 21 kernels: independent pandas references for
Burrows' Delta and the difference-in-differences estimator."""

import math
from collections import Counter, defaultdict

import pandas as pd

from impractical_impala_spark.queries.experiment import DID_ZCRIT_MICRO
from impractical_impala_spark.queries.text_ir import BD_PANEL, BD_TOPK
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def test_burrows_delta_matches_pandas(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    toks = defaultdict(Counter)
    total = Counter()
    for _, r in docs.iterrows():
        for t in r["text"].lower().split(" "):
            toks[r["source"]][t] += 1
            total[t] += 1
    panel = [t for t, _ in sorted(total.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:BD_PANEL]]
    sources = sorted(toks)
    ns = len(sources)
    f_ppb = {(s, t): toks[s][t] * 1_000_000_000 // sum(toks[s].values())
             for s in sources for t in panel}
    z = {}
    for t in panel:
        vals = [f_ppb[(s, t)] for s in sources]
        sm, ssq = sum(vals), sum(v * v for v in vals)
        var_num = ns * ssq - sm * sm
        for s, v in zip(sources, vals):
            if var_num <= 0:
                z[(s, t)] = 0
            else:
                sd = math.sqrt(var_num / (ns * (ns - 1.0)))
                z[(s, t)] = _half_away((v * ns - sm) / (ns * sd) * 1e6)
    deltas = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            abs_sum = sum(abs(z[(a, t)] - z[(b, t)]) for t in panel)
            deltas.append((abs_sum // len(panel), a, b))
    deltas.sort()
    got = sorted(_Q["text_burrows_delta"].build(spark, sf_small).collect(),
                 key=lambda r: r["rank"])
    for (d, a, b), r in zip(deltas[:BD_TOPK], got):
        assert (r["src_a"], r["src_b"], r["delta_micro"]) == (a, b, d)
        assert r["n_words"] == len(panel)


def test_diff_in_diff_matches_pandas(spark, sf_small):
    o = pd.read_parquet(f"{sf_small}/orders.parquet",
                        columns=["o_orderpriority", "o_orderdate",
                                 "o_totalprice"])
    us = (pd.to_datetime(o["o_orderdate"]).astype("datetime64[ns]")
          .astype("int64") // 1000)
    mid = (int(us.min()) + int(us.max())) // 2
    o = o.assign(
        treated=o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        .astype(int),
        post=(us > mid).astype(int),
        cents=(o["o_totalprice"] * 100).apply(math.floor))
    stats = {}
    for (t, p), grp in o.groupby(["treated", "post"]):
        c = grp["cents"]
        stats[(t, p)] = (len(c), int(c.sum()), int((c ** 2).sum()))
    mean = {k: s / n for k, (n, s, _) in stats.items()}
    von = sum((n * q - s * s) / (n * (n - 1.0) * n)
              for n, s, q in stats.values())
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    z = _half_away(did / math.sqrt(von) * 1e6)
    row = _Q["orders_diff_in_diff"].build(spark, sf_small).collect()[0]
    for t in (0, 1):
        for p in (0, 1):
            assert row[f"n{t}{p}"] == stats[(t, p)][0]
    assert row["did_milli_cents"] == _half_away(did * 10)
    assert row["z_micro"] == z
    assert row["significant"] == int(abs(z) > DID_ZCRIT_MICRO)
