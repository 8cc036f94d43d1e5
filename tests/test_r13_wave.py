"""Round-13 determinism + independent-reference checks for the two new
queries (ann_lsh_multiprobe, orders_holt_winters_nation) and the two
micro-fixed-point refactors (events_gapfill_locf, events_time_rollup),
same contracts as the r5-r9 sweeps: hostile splits must not move a
value, session timezones must not move a bucket, and every new kernel
has a third implementation (numpy / plain Python) agreeing exactly."""

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

R13_CASES = [
    # all four emit integers or doubles produced by ONE division of
    # exact integers, so hostile splits must be bit-exact
    "ann_lsh_multiprobe",          # bucket-join candidates, micro sums
    "orders_holt_winters_nation",  # exact integer recursion per nation
    "events_gapfill_locf",         # micro value sums + integer LOCF
    "events_time_rollup",          # micro value sums, integer cascade
]


@pytest.mark.parametrize("name", R13_CASES)
def test_r13_partition_invariance(spark, sf_small, name):
    """Narrow scan partitions, prime shuffle width, small Arrow batches
    must not change a single output value. Note events_gapfill_locf and
    events_time_rollup are now in the EXACT class — the r13 micro
    refactor replaced their order-dependent float sums with associative
    integer sums, which is precisely what admits them to the streaming
    fleet."""
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


@pytest.mark.parametrize("name", ["orders_holt_winters_nation",
                                  "events_gapfill_locf",
                                  "events_time_rollup"])
def test_r13_timezone_invariance(spark, sf_small, name):
    """The time-bearing r13 queries bin on the lossless ts_ns epoch
    (events) or the NTZ o_orderdate (orders); a UTC+14 session zone
    must not move any bucket."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_multiprobe_numpy_reference(spark, sf_small):
    """Independent third implementation: recompute the 12-bit
    signatures, the 13-key probe sets, the candidate pairs, and the
    per-level top-1 aggregates with numpy + plain Python dicts, and
    require EXACT equality with the Spark query at sf0.001."""
    import numpy as np

    from impractical_impala_spark.queries.similarity import (
        MP_BITS, _plane_sign)

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb}
    planes = np.array([[_plane_sign(p, j) for j in range(len(
        next(iter(vecs.values()))))] for p in range(MP_BITS)],
        dtype=np.float64)
    sig = {}
    for vid, v in vecs.items():
        proj = planes @ v
        sig[vid] = sum((1 << r) for r in range(MP_BITS) if proj[r] > 0)
    by_sig = {}
    for vid, s in sig.items():
        by_sig.setdefault(s, []).append(vid)
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}

    def level_stats(max_rad):
        n_pairs = 0
        best = {}
        for vid, s in sig.items():
            keys = [(s, 0)]
            if max_rad >= 1:
                keys += [(s ^ (1 << r), 1) for r in range(MP_BITS)]
            for key, _rad in keys:
                for nid in by_sig.get(key, []):
                    if nid == vid:
                        continue
                    n_pairs += 1
                    cos = float(vecs[vid] @ vecs[nid]) / (
                        norms[vid] * norms[nid])
                    cur = best.get(vid)
                    # top-1 tie-break: cos DESC, neighbor_id ASC
                    if (cur is None or cos > cur[0]
                            or (cos == cur[0] and nid < cur[1])):
                        best[vid] = (cos, nid)
        micro = sum(int(np.floor(c * 1_000_000.0)) for c, _ in best.values())
        return n_pairs, len(best), micro

    got = {r.n_probes: (r.n_cand_pairs, r.matched_vectors,
                        r.sum_top1_cos_micro)
           for r in _Q["ann_lsh_multiprobe"].build(spark, sf_small).collect()}
    assert got[1] == level_stats(0)
    assert got[1 + MP_BITS] == level_stats(1)
    # the probe level must strictly widen the candidate space
    assert got[1 + MP_BITS][0] > got[1][0]
    assert got[1 + MP_BITS][1] >= got[1][1]


def test_grouped_hw_matches_independent_recompute(spark, sf_small):
    """Independent path: rebuild each nation's dense weekly cents
    series with pandas (straight from parquet, no Spark), run a FRESH
    inline Holt-Winters recursion (not hw_fit), and require exact
    equality with the Spark query's rows for every nation."""
    import pandas as pd

    M = 52
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    cust = pd.read_parquet(f"{sf_small}/customer.parquet")
    nation = pd.read_parquet(f"{sf_small}/nation.parquet")
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df = df.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    epoch_day = (df["o_orderdate"].values.astype("datetime64[D]")
                 .astype("int64"))
    df = df.assign(wk=epoch_day // 7,
                   centi=(df["o_totalprice"] * 100).map(
                       lambda x: int(__import__("math").floor(x))))

    def trunc(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    expect = {}
    for nm, g in df.groupby("n_name"):
        weekly = g.groupby("wk")["centi"].sum()
        w0, w1 = int(weekly.index.min()), int(weekly.index.max())
        ys = [int(weekly.get(w, 0)) for w in range(w0, w1 + 1)]
        if len(ys) <= M:
            continue
        mean0 = trunc(sum(ys[:M]), M)
        sw = [y - mean0 for y in ys[:M]]
        lvl, b = mean0, 0
        for t in range(M, len(ys)):
            slag = sw[t % M]
            fitted = lvl + b + slag
            nl = trunc(ys[t] - slag + lvl + b, 2)
            nb = trunc(nl - lvl + 3 * b, 4)
            ns = trunc(ys[t] - nl + 3 * slag, 4)
            lvl, b = nl, nb
            sw[t % M] = ns
            expect[(nm, t)] = (ys[t], nl, nb, ns, fitted)

    rows = _Q["orders_holt_winters_nation"].build(spark, sf_small).collect()
    assert rows, "grouped HW emitted nothing"
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[(r.n_name, r.t)] == (
            r.y_centi, r.level_centi, r.trend_centi, r.season_centi,
            r.fitted_centi), (r.n_name, r.t)


def test_time_rollup_grains_are_consistent(spark, sf_small):
    """Exact-integer cascade property: each grain's (n_events,
    sum_value) must equal the re-aggregation of the finer grain —
    an equality (not a tolerance) because the sums are fixed-point
    integers until the final division by the COMMON quantum."""
    rows = _Q["events_time_rollup"].build(spark, sf_small).collect()
    by = {}
    for r in rows:
        by.setdefault(r.grain, {})[(r.event_type, r.bucket)] = r
    for fine, coarse, fold in [("hour", "day", 24), ("day", "week", 7)]:
        agg = {}
        for (et, b), r in by[fine].items():
            key = (et, b // fold)  # buckets are non-negative here
            n, s = agg.get(key, (0, 0))
            agg[key] = (n + r.n_events,
                        s + round(r.sum_value * 10000))
        assert set(agg) == set(by[coarse])
        for key, (n, s) in agg.items():
            r = by[coarse][key]
            assert r.n_events == n
            assert round(r.sum_value * 10000) == s
