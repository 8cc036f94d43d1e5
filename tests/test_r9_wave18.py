"""Round-9 wave 18 kernels: independent references for tokenizer
fertility, TOST equivalence, the engine tuning advisor, and the
chunk-dedup census."""

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from impractical_impala_spark.queries.engine_stats import (
    ETA_BROADCAST_BYTES, ETA_TARGET_PART_BYTES)
from impractical_impala_spark.queries.multimodal import CHUNK_BYTES
from impractical_impala_spark.queries.stat_tests import (
    TOST_DELTA_CENTI, TOST_ZCRIT_MICRO)
from impractical_impala_spark.queries.text import TF_VOCAB
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))


def test_fertility_matches_counter_reference(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["lang", "text"])
    words = [(r["lang"], t) for _, r in docs.iterrows()
             for t in r["text"].lower().split(" ")]
    freq = Counter(t for _, t in words)
    vocab = set(t for t, _ in sorted(
        freq.items(), key=lambda kv: (-kv[1], kv[0]))[:TF_VOCAB])
    agg = defaultdict(lambda: [0, 0, 0])
    for lang, t in words:
        a = agg[lang]
        a[0] += 1
        if t in vocab:
            a[2] += 1
        else:
            a[1] += 1
            a[2] += math.ceil(len(t) / 4)
    got = {r["lang"]: r for r in
           _Q["tokenizer_fertility_audit"].build(spark, sf_small).collect()}
    for lang, (nw, noov, npieces) in agg.items():
        r = got[lang]
        assert (r["n_words"], r["n_oov"], r["n_pieces"]) == (
            nw, noov, npieces)
        assert r["fertility_ppm"] == npieces * 1_000_000 // nw
        assert r["oov_ppm"] == noov * 1_000_000 // nw


def test_tost_matches_python_reference(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ns = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
          .astype("int64"))
    mid = (int(ns.min()) + int(ns.max())) // 2
    ev = ev.assign(ns=ns, centi=(ev["value"] * 100).apply(math.floor))
    got = {r["event_type"]: r for r in
           _Q["events_tost_equivalence"].build(spark, sf_small).collect()}
    for et, grp in ev.groupby("event_type"):
        a = grp[grp["ns"] <= mid]["centi"]
        b = grp[grp["ns"] > mid]["centi"]
        na, nb = len(a), len(b)
        sa, sb = int(a.sum()), int(b.sum())
        qa, qb = int((a ** 2).sum()), int((b ** 2).sum())
        va = (na * qa - sa * sa) / (na * (na - 1))
        vb = (nb * qb - sb * sb) / (nb * (nb - 1))
        se = math.sqrt(va / na + vb / nb)
        diff = sa / na - sb / nb
        t_lo = _half_away((diff + TOST_DELTA_CENTI) / se * 1e6)
        t_hi = _half_away((TOST_DELTA_CENTI - diff) / se * 1e6)
        r = got[et]
        assert (r["n_early"], r["n_late"]) == (na, nb)
        assert (r["t_lower_micro"], r["t_upper_micro"]) == (t_lo, t_hi)
        assert r["equivalent"] == int(t_lo > TOST_ZCRIT_MICRO
                                      and t_hi > TOST_ZCRIT_MICRO)


def test_tuning_advisor_matches_pandas_reference(spark, sf_small):
    got = {r["table_name"]: r for r in
           _Q["engine_tuning_advisor"].build(spark, sf_small).collect()}
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus"])
    est = int((li["l_returnflag"].str.len() + li["l_linestatus"].str.len()
               + 3 * 8 + 4 + 4 * 8 + 8).sum())
    r = got["lineitem"]
    assert r["n_rows"] == len(li) and r["est_bytes"] == est
    adv = max(1, est // ETA_TARGET_PART_BYTES)
    assert r["advised_partitions"] == adv
    pow2 = 1
    while pow2 < adv:
        pow2 *= 2
    assert r["advised_buckets"] == max(pow2, 1)
    assert r["broadcastable"] == int(est <= ETA_BROADCAST_BYTES)


def test_chunk_dedup_matches_hashlib(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    agg = defaultdict(lambda: [0, set()])
    for _, r in docs.iterrows():
        t = r["text"]
        for i in range(math.ceil(len(t) / CHUNK_BYTES)):
            h = hashlib.md5(
                t[i * CHUNK_BYTES:(i + 1) * CHUNK_BYTES].encode()
            ).hexdigest()
            a = agg[r["source"]]
            a[0] += 1
            a[1].add(h)
    got = {r["source"]: r for r in
           _Q["multimodal_chunk_dedup"].build(spark, sf_small).collect()}
    for src, (n, uniq) in agg.items():
        r = got[src]
        assert r["n_chunks"] == n and r["n_unique"] == len(uniq)
        assert r["dedup_ppm"] == (n - len(uniq)) * 1_000_000 // n


@pytest.mark.parametrize("name", ["events_tost_equivalence"])
def test_wave18_timezone_invariance(spark, sf_small, name):
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
