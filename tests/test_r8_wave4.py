"""Round-8 wave 4 — independent references and hostility sweeps for
the linkage/split/diagnostics queries (queries/linkage_splits.py).

Every statistical kernel is re-derived here with numpy/pandas/pure
Python from the raw parquet — a third implementation besides the Spark
plan and the DuckDB oracle, so a shared SQL-level misconception can't
hide (the test_r6_kernels discipline)."""

import math
import re

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.queries.linkage_splits import (
    AA_PART_CAP, AA_SCALE, EMBARGO_DAYS, SNM_MAXDIST, SNM_RAW_PREFIX,
    SNM_SIG_LEN, SNM_BLOCK_LEN, TRAIN_FRAC_PCT,
)

_Q = all_queries()

WAVE4 = [
    "dedup_sorted_neighborhood", "split_time_embargo", "events_pacf",
    "lineitem_corr_matrix", "text_readability", "graph_adamic_adar",
    "nation_theil_index",
]


# ------------------------------------------------------ hostility sweeps
@pytest.mark.parametrize("name", WAVE4)
def test_wave4_partition_invariance(spark, sf_small, name):
    """Wave-4 determinism under hostile splits, same contract as the
    r5-r8 sweeps: narrow scan partitions, prime shuffle width, small
    Arrow batches must not change a single output value."""
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


@pytest.mark.parametrize("name", ["split_time_embargo", "events_pacf"])
def test_wave4_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the timestamp-bearing wave-4
    queries (day/hour keys derive from the lossless ts_ns epoch)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


# ------------------------------------------------------ kernel references
def _events_pdf(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "ts"])
    # fixture generations vary between micro- and nano-precision ts;
    # normalize to epoch nanoseconds regardless of the stored unit
    ev["ns"] = pd.to_datetime(ev["ts"]).astype("datetime64[ns]") \
                 .astype("int64")
    return ev


def test_pacf_matches_numpy(spark, sf_small):
    """ACF + Durbin-Levinson re-derived in numpy from the raw hourly
    counts (float arithmetic, so tolerance; the engines' quantization
    is 1e-9 on r then 1e-6 on output)."""
    got = {r["event_type"]: r for r in
           _Q["events_pacf"].build(spark, sf_small).collect()}
    ev = _events_pdf(sf_small)
    ev["hr"] = ev["ns"] // 3_600_000_000_000
    for etype, g in ev.groupby("event_type"):
        cnt = g.groupby("hr").size()
        full = cnt.reindex(range(cnt.index.min(), cnt.index.max() + 1),
                           fill_value=0).to_numpy(dtype=float)
        n = len(full)
        xbar = full.mean()
        d = full - xbar
        den = float((d * d).sum())
        r = [float((d[:-k] * d[k:]).sum()) / den for k in (1, 2, 3)]
        r1, r2, r3 = r
        phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
        phi21 = r1 * (1 - phi22)
        phi33 = ((r3 - phi21 * r2 - phi22 * r1)
                 / (1 - phi21 * r1 - phi22 * r2))
        row = got[etype]
        assert row["n_hours"] == n
        for name, want in [("acf1", r1), ("acf2", r2), ("acf3", r3),
                           ("pacf1", r1), ("pacf2", phi22),
                           ("pacf3", phi33)]:
            assert math.isclose(row[name], want, abs_tol=2e-6), \
                (etype, name, row[name], want)


def test_corr_matrix_matches_numpy(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet")
    cols = {
        "qty": li["l_quantity"].astype("int64"),
        "price": np.floor(li["l_extendedprice"] * 100).astype("int64"),
        "disc": np.floor(li["l_discount"] * 100 + 0.5).astype("int64"),
        "tax": np.floor(li["l_tax"] * 100 + 0.5).astype("int64"),
    }
    got = _Q["lineitem_corr_matrix"].build(spark, sf_small).collect()
    assert len(got) == 6
    for row in got:
        want = np.corrcoef(cols[row["var_x"]], cols[row["var_y"]])[0, 1]
        assert math.isclose(row["corr"], want, abs_tol=2e-6), \
            (row["var_x"], row["var_y"], row["corr"], want)
        assert row["n_rows"] == len(li)


def test_theil_matches_numpy(spark, sf_small):
    orders = pd.read_parquet(f"{sf_small}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(f"{sf_small}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_small}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    orders["x"] = np.floor(orders["o_totalprice"] * 100).astype("int64")
    rev = orders.groupby("o_custkey")["x"].sum().reset_index()
    j = (rev.merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(nation, left_on="c_nationkey", right_on="n_nationkey"))
    xt, ntot = float(j["x"].sum()), len(j)
    got = {r["n_name"]: r for r in
           _Q["nation_theil_index"].build(spark, sf_small).collect()}
    for name, g in j.groupby("n_name"):
        x = g["x"].to_numpy(dtype=float)
        xg, ng = float(x.sum()), len(x)
        t_within = float(((x / xg) * np.log(x * ng / xg)).sum())
        between = (xg / xt) * math.log((xg / xt) / (ng / ntot))
        row = got[name]
        assert row["n_cust"] == ng
        assert math.isclose(row["theil_within"], t_within, abs_tol=2e-6)
        assert math.isclose(row["between_term"], between, abs_tol=2e-6)


def test_adamic_adar_matches_bruteforce(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    su = li.drop_duplicates()
    scores, commons = {}, {}
    for part, g in su.groupby("l_partkey"):
        supps = sorted(g["l_suppkey"])
        if not 2 <= len(supps) <= AA_PART_CAP:
            continue
        w = round(AA_SCALE / math.log(len(supps)))
        for i in range(len(supps)):
            for k in range(i + 1, len(supps)):
                key = (supps[i], supps[k])
                scores[key] = scores.get(key, 0) + w
                commons[key] = commons.get(key, 0) + 1
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = _Q["graph_adamic_adar"].build(spark, sf_small).collect()
    assert len(got) == min(100, len(want))
    for row, (key, micro) in zip(got, want):
        assert (row["supp_a"], row["supp_b"]) == key
        assert row["n_common_parts"] == commons[key]
        # round-half-away like both engines, via exact integer floor
        # (Python's round() is half-to-even and disagrees at *.x5)
        want_score = ((micro + 50) // 100) / 1e4
        assert math.isclose(row["aa_score"], want_score, abs_tol=1e-9)


def test_readability_matches_re(spark, sf_small):
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["source", "text"])
    word, sent, vowel = (re.compile(r"[A-Za-z]+"), re.compile(r"[.!?]+"),
                        re.compile(r"[aeiouy]+"))
    rows = {}
    for src, g in docs.groupby("source"):
        w = sum(len(word.findall(t)) for t in g["text"])
        s = sum(max(1, len(sent.findall(t))) for t in g["text"])
        v = sum(len(vowel.findall(t.lower())) for t in g["text"])
        rows[src] = (len(g), w, s, v)
    got = _Q["text_readability"].build(spark, sf_small).collect()
    assert len(got) == len(rows)
    for r in got:
        nd, w, s, v = rows[r["source"]]
        assert (r["n_docs"], r["n_words"], r["n_sentences"],
                r["n_vowel_groups"]) == (nd, w, s, v)
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (v / w)
        assert math.isclose(r["flesch"], round(flesch, 4), abs_tol=1e-9)


def test_split_time_embargo_matches_pandas(spark, sf_small):
    ev = _events_pdf(sf_small)
    ev["day"] = ev["ns"] // 86_400_000_000_000
    d0, d1 = ev["day"].min(), ev["day"].max()
    cut = d0 + (d1 - d0) * TRAIN_FRAC_PCT // 100
    ev["split"] = np.where(ev["day"] < cut, "train",
                           np.where(ev["day"] >= cut + EMBARGO_DAYS,
                                    "test", "embargo"))
    got = {r["event_type"]: r for r in
           _Q["split_time_embargo"].build(spark, sf_small).collect()}
    for etype, g in ev.groupby("event_type"):
        row = got[etype]
        counts = g["split"].value_counts()
        assert row["n_train"] == counts.get("train", 0)
        assert row["n_embargo"] == counts.get("embargo", 0)
        assert row["n_test"] == counts.get("test", 0)
        tr = set(g.loc[g["split"] == "train", "user_id"])
        te = set(g.loc[g["split"] == "test", "user_id"])
        assert row["train_users"] == len(tr)
        assert row["test_users"] == len(te)
        assert row["overlap_users"] == len(tr & te)
        assert row["overlap_ppm"] == (len(tr & te) * 1_000_000
                                      // min(len(tr), len(te)))


def test_snm_pair_contract(spark, sf_small):
    """Every emitted SNM pair respects the operator's own contract:
    distance within threshold, doc_a < neighbor ordering is NOT
    guaranteed (sort is by normalized key) but the pair must share the
    block prefix, and distance 0 pairs must have identical signatures."""
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "text"])
    norm = {
        r.doc_id: re.sub(r"[^a-z0-9]", "", r.text[:SNM_RAW_PREFIX].lower())
        for r in docs.itertuples()
    }
    got = _Q["dedup_sorted_neighborhood"].build(spark, sf_small).collect()
    assert len(got) > 0, "fixture contains exact dups; SNM must find pairs"
    for r in got:
        assert r["edit_dist"] <= SNM_MAXDIST
        na, nb = norm[r["doc_a"]], norm[r["doc_b"]]
        assert na[:SNM_BLOCK_LEN] == nb[:SNM_BLOCK_LEN]
        dist_zero = na[:SNM_SIG_LEN] == nb[:SNM_SIG_LEN]
        assert dist_zero == (r["edit_dist"] == 0)
