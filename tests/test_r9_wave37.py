"""Round-9 wave 37 kernels: independent references — a Counter-based
closed-form JSD (checked against a brute-force full-vocabulary JSD),
pure-python RLE run counts, and a bucket-local hamming histogram from
the registered simhash output."""

import math
from collections import Counter, defaultdict

import pandas as pd

from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.quality import _LN2_NANO, JSD_TOPK
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_jsd_matrix_matches_bruteforce(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    dists = {}
    for src, g in docs.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(t.lower().split(" "))
        dists[src] = (c, sum(c.values()))
    srcs = sorted(dists)
    got = _Q["source_jsd_matrix"].build(spark, sf_small).collect()
    # replay the engine's decomposition exactly (shared nano terms +
    # closed-form absent mass) AND check it against the brute-force
    # full-vocabulary JSD within quantization tolerance
    pairs = {}
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            c1, n1 = dists[s1]
            c2, n2 = dists[s2]
            nano = 0
            cov1 = cov2 = 0
            for tok in c1.keys() & c2.keys():
                p, q = c1[tok] / n1, c2[tok] / n2
                nano += _half_away(
                    1e9 * (0.5 * p * math.log(2 * p / (p + q))
                           + 0.5 * q * math.log(2 * q / (p + q))))
                cov1 += c1[tok]
                cov2 += c2[tok]
            nano += (_LN2_NANO - _LN2_NANO * cov1 // n1) // 2
            nano += (_LN2_NANO - _LN2_NANO * cov2 // n2) // 2
            pairs[(s1, s2)] = nano // 1000
            # brute force over the union vocabulary
            bf = 0.0
            for tok in c1.keys() | c2.keys():
                p, q = c1.get(tok, 0) / n1, c2.get(tok, 0) / n2
                m = (p + q) / 2
                if p:
                    bf += 0.5 * p * math.log(p / m)
                if q:
                    bf += 0.5 * q * math.log(q / m)
            assert abs(pairs[(s1, s2)] / 1e6 - bf) < 1e-4
    want = sorted(pairs.items(), key=lambda kv: (kv[1], kv[0]))[:JSD_TOPK]
    assert [(r["s1"], r["s2"], r["jsd_micro"]) for r in got] == \
        [(s1, s2, v) for (s1, s2), v in want]


def test_rle_advisor_matches_python(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])
    ev["ts_ns"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                   .astype("int64"))
    ev["hr"] = ev["ts_ns"] // 3_600_000_000_000

    def runs(part):
        total = 0
        for _, g in ev.groupby(part):
            seq = g.sort_values(["ts_ns", "event_id"])["event_type"]
            # the first row compares != NaN and counts as a run start
            total += int((seq != seq.shift()).sum())
        return total

    got = {r["sort_order"]: r for r in
           _Q["engine_rle_advisor"].build(spark, sf_small).collect()}
    assert got["by_hour_time"]["n_runs"] == runs("hr")
    assert got["by_user_time"]["n_runs"] == runs("user_id")
    for r in got.values():
        assert r["n_rows"] == len(ev)
        assert r["rle_ratio_ppm"] == r["n_runs"] * 1_000_000 // len(ev)
    # user clustering must compress event streams at least as well as
    # checking it is a DIFFERENT number proves the advisor reacts to
    # layout at all
    assert got["by_hour_time"]["n_runs"] != got["by_user_time"]["n_runs"]


def test_hamming_spectrum_matches_python(spark, sf_small):
    sh = {r["doc_id"]: (r["simhash"], r["bucket"]) for r in
          _Q["dedup_simhash"].build(spark, sf_small).collect()}
    buckets = defaultdict(list)
    for doc_id, (h, b) in sh.items():
        buckets[b].append((doc_id, h))
    hist = Counter()
    for b, rows in buckets.items():
        rows.sort()
        for i, (d1, h1) in enumerate(rows):
            for d2, h2 in rows[i + 1:]:
                hist[bin(h1 ^ h2).count("1")] += 1
    got = {r["hamming"]: r["n_pairs"] for r in
           _Q["dedup_hamming_spectrum"].build(spark, sf_small).collect()}
    assert got == dict(hist)
