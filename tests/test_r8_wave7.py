"""Round-8 wave 7 — independent references and hostility sweeps for
the monitoring/eval queries (queries/monitor_eval.py)."""

import math

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.queries.monitor_eval import (
    PH_DELTA_PPM, PH_LAMBDA_PPM, SIL_MICRO,
)

_Q = all_queries()

WAVE7 = ["events_page_hinkley", "emb_silhouette", "events_entropy_rate"]


@pytest.mark.parametrize("name", WAVE7)
def test_wave7_partition_invariance(spark, sf_small, name):
    """Wave-7 determinism under hostile splits (r5-r8 contract)."""
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


@pytest.mark.parametrize("name", ["events_page_hinkley",
                                  "events_entropy_rate"])
def test_wave7_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the timestamp-keyed wave-7 ops."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_page_hinkley_matches_loop(spark, sf_small):
    """PH re-derived with the literal sequential detector loop in
    exact integer ppm arithmetic — same quantization contract."""
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    ev["hr"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                .astype("int64") // 3_600_000_000_000)
    got = {r["event_type"]: r for r in
           _Q["events_page_hinkley"].build(spark, sf_small).collect()}
    for etype, g in ev.groupby("event_type"):
        cnt = g.groupby("hr").size()
        xs = cnt.reindex(range(cnt.index.min(), cnt.index.max() + 1),
                         fill_value=0).tolist()
        cum = m = 0
        mn = 0
        max_depth = 0
        first_alarm = -1
        n_alarm = 0
        for t, x in enumerate(xs, start=1):
            cum += x
            term = x * 1_000_000 - cum * 1_000_000 // t - PH_DELTA_PPM
            m += term
            mn = min(mn, m)
            depth = m - mn
            max_depth = max(max_depth, depth)
            if depth > PH_LAMBDA_PPM:
                n_alarm += 1
                if first_alarm < 0:
                    first_alarm = t
        row = got[etype]
        assert row["n_hours"] == len(xs)
        assert row["max_depth_ppm"] == max_depth
        assert row["first_alarm_t"] == first_alarm
        assert row["n_alarm_hours"] == n_alarm


def test_page_hinkley_detects_planted_shift(spark, sf_small, tmp_path):
    """A planted mean shift (rate triples in the last third) must
    alarm, and must alarm AFTER the shift point."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_hours = 300
    rows = []
    eid = 0
    for h in range(n_hours):
        rate = 2 if h < 200 else 6
        for k in range(rate):
            eid += 1
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=h, minutes=k), 1,
                         "synthetic", 1.0, "{}"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    out = tmp_path / "events.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(out))
    row = _Q["events_page_hinkley"].build(
        spark, str(tmp_path)).collect()[0]
    assert row["first_alarm_t"] > 200, "alarm must come after the shift"
    assert row["n_alarm_hours"] > 0


def test_silhouette_matches_numpy(spark, sf_small):
    """Simplified silhouette re-derived in numpy with the identical
    quantization contract (micro components, n-scaled integer
    residuals, rounded micro distances, nano terms)."""
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet")
    vm = {}
    for r in emb.itertuples():
        vm[r.vec_id] = (r.label,
                        np.floor(np.array(r.embedding, dtype=np.float64)
                                 * SIL_MICRO).astype(np.int64))
    labels = sorted({lab for lab, _ in vm.values()})
    sums = {lab: None for lab in labels}
    counts = {lab: 0 for lab in labels}
    for lab, q in vm.values():
        sums[lab] = q.astype(object) if sums[lab] is None \
            else sums[lab] + q
        counts[lab] += 1
    per_label = {lab: [] for lab in labels}
    for vid, (lab, q) in vm.items():
        dm = {}
        for cl in labels:
            n = counts[cl]
            dv = q.astype(object) * n - sums[cl]
            ssq = int(sum(int(x) * int(x) for x in dv))
            dm[cl] = round(math.sqrt(ssq) / n)
        a = dm[lab]
        b = min(d for cl, d in dm.items() if cl != lab)
        if max(a, b) > 0:
            sn = round(1e9 * (b - a) / max(a, b))
            per_label[lab].append(sn)
    got = {r["label"]: r for r in
           _Q["emb_silhouette"].build(spark, sf_small).collect()}
    for lab in labels:
        terms = per_label[lab]
        row = got[lab]
        assert row["n_vecs"] == len(terms)
        want = round(sum(terms) / len(terms) / 1e9, 6)
        assert math.isclose(row["mean_silhouette"], want, abs_tol=1e-9)


def test_entropy_rate_matches_counter(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "event_type", "event_id",
                                  "ts"])
    ev["us"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                .astype("int64") // 1000)
    ev = ev.sort_values(["user_id", "us", "event_id"])
    pairs = {}
    for uid, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for cur, nxt in zip(types, types[1:]):
            pairs[(cur, nxt)] = pairs.get((cur, nxt), 0) + 1
    cur_tot = {}
    for (cur, _), c in pairs.items():
        cur_tot[cur] = cur_tot.get(cur, 0) + c
    nn = sum(cur_tot.values())
    got = {r["cur"]: r for r in
           _Q["events_entropy_rate"].build(spark, sf_small).collect()}
    total_rate = 0.0
    for cur, ci in cur_tot.items():
        h = sum((c / ci) * math.log(ci / c)
                for (cc, _), c in pairs.items() if cc == cur)
        row = got[cur]
        assert row["n_pairs"] == ci
        assert math.isclose(row["cond_entropy"], h, abs_tol=2e-6)
        assert row["weight_ppm"] == ci * 1_000_000 // nn
        total_rate += h * ci / nn
    # contributions reconstruct the chain entropy rate
    s = sum(r["rate_contribution"] for r in got.values())
    assert math.isclose(s, total_rate, abs_tol=1e-4)


# ------------------------------------------------------ burst viterbi
def test_burst_viterbi_in_sweeps(spark, sf_small):
    """Partition + TZ invariance for the Arrow-kernel burst detector
    (same contracts as the declarative wave-7 ops)."""
    name = "events_burst_viterbi"
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
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_burst_viterbi_kernel_reference(spark, sf_small):
    """The Spark kernel equals the pure-Python fold run directly on
    the pandas-derived hourly series (third implementation beside the
    Arrow kernel and the recursive-CTE oracle)."""
    from impractical_impala_spark.queries.monitor_eval import burst_viterbi

    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts"])
    ev["hr"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                .astype("int64") // 3_600_000_000_000)
    got = _Q["events_burst_viterbi"].build(spark, sf_small).toPandas()
    for etype, g in ev.groupby("event_type"):
        cnt = g.groupby("hr").size()
        ys = cnt.reindex(range(cnt.index.min(), cnt.index.max() + 1),
                         fill_value=0).tolist()
        want = burst_viterbi(ys)
        sub = (got[got["event_type"] == etype]
               .sort_values("t")[["t", "y", "state", "margin_micro"]])
        assert [tuple(r) for r in sub.itertuples(index=False)] == want


def test_burst_viterbi_detects_planted_burst(spark, tmp_path):
    """A planted 5x rate burst must flip the online state to 1 inside
    the burst window and back to 0 after it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for h in range(200):
        rate = 10 if 100 <= h < 130 else 2
        for k in range(rate):
            eid += 1
            rows.append((eid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(hours=h, minutes=k % 60), 1,
                         "synthetic", 1.0, "{}"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (_Q["events_burst_viterbi"].build(spark, str(tmp_path))
           .toPandas().sort_values("t"))
    in_burst = got[(got["t"] >= 105) & (got["t"] < 130)]["state"]
    after = got[got["t"] >= 140]["state"]
    assert (in_burst == 1).all(), "burst window must be in state 1"
    assert (after == 0).all(), "state must return to 0 after the burst"
