"""Round-14 wave 2: laws + independent references for the IVF-PQ probe
sweep, the calendar-quarter rollup, and the per-source quality-gate
ablation (VERDICT r13 asks #5/#6/#7)."""

import math
from collections import defaultdict

import pandas as pd
import pytest

from impractical_impala_spark.quantum import VALUE_MICRO
from impractical_impala_spark.queries.similarity import N_PROBE, PROBE_SWEEP
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


# ------------------------------------------------- IVF-PQ probe sweep
def test_pq_sweep_laws_and_trained_crosslaw(spark, sf_small):
    """Candidate NESTING survives compression, so n_answered is lawful
    monotone in nprobe; recall@1/regret are NOT (a wider set can
    surface a neighbor whose COMPRESSED distance beats the exact nn's
    — asserting their monotonicity would repeat the r13 ADVICE #1
    mistake). Per-query the ADC choice's true cosine never exceeds the
    exact top-1's, so the summed gap is bounded below by rounding dust
    only. The nprobe=N_PROBE point must agree with ann_ivf_pq_trained:
    same quantizer, same scorer, same probe count."""
    rows = sorted(_Q["ann_ivf_pq_sweep"].build(spark, sf_small).collect(),
                  key=lambda r: r.n_probe)
    assert [r.n_probe for r in rows] == sorted(PROBE_SWEEP)
    for a, b in zip(rows, rows[1:]):
        assert b.n_answered >= a.n_answered
    for r in rows:
        assert 0 <= r.n_hit1 <= r.n_answered <= r.n_queries
        assert r.recall1_ppm == r.n_hit1 * 1_000_000 // r.n_queries
        # exact top-1 dominates any choice in true cosine; each rounded
        # per-query term can dip at most 1 micro below zero
        assert r.cos_gap_micro >= -r.n_answered

    # cross-law vs the fixed-probe composition
    exact1 = {r.query_id: r.neighbor_id for r in
              _Q["ann_cosine_topk"].build(spark, sf_small).collect()
              if r.rn == 1}
    pq1 = {r.query_id: r.neighbor_id for r in
           _Q["ann_ivf_pq_trained"].build(spark, sf_small).collect()
           if r.rank == 1}
    at_p = {r.n_probe: r for r in rows}[N_PROBE]
    assert at_p.n_answered == len(pq1)
    assert at_p.n_hit1 == sum(
        1 for q, nn in pq1.items() if exact1.get(q) == nn)


# ---------------------------------------------- calendar-quarter grain
def test_quarterly_matches_pandas(spark, sf_small):
    """Independent third implementation: per-(type, quarter) event
    counts, active days and exact micro value sums recomputed from raw
    parquet with pandas real-date arithmetic — exact equality,
    including the one int-sum / 10000.0 double render."""
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ns = pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
    d = ns // DAY_NS
    m = (ev["value"] * VALUE_MICRO).apply(math.floor).astype("int64")
    df = pd.DataFrame({"t": ev["event_type"], "d": d, "m": m})
    day = (df.groupby(["t", "d"])
           .agg(s=("m", "sum"), n=("m", "size")).reset_index())
    dates = pd.to_datetime(day["d"], unit="D")
    day["q"] = (dates.dt.year.astype(str) + "-Q"
                + dates.dt.quarter.astype(str))
    want = {}
    for (t, q), g in day.groupby(["t", "q"]):
        want[(t, q)] = (int(g["n"].sum()), len(g),
                        int(g["s"].sum()) / 10000.0)
    rows = _Q["events_quarterly_rollup"].build(spark, sf_small).collect()
    assert len(rows) == len(want)
    for r in rows:
        n, a, s = want[(r.event_type, r.quarter)]
        assert (r.n_events, r.n_active_days) == (n, a)
        assert r.sum_value == s  # same int sum, same one division


def test_quarterly_aggregates_monthly(spark, sf_small):
    """Grain cross-law: quarter boundaries align with months, so
    re-aggregating the monthly rollup by quarter must reproduce the
    quarterly rollup exactly — counts and active days by integer sums,
    sum_value recomposed from micro (month doubles cannot be summed;
    both queries render value = exact_micro_total / 1e4)."""
    monthly = _Q["events_monthly_rollup"].build(spark, sf_small).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in monthly:
        y, mo = r.month.split("-")
        q = f"{y}-Q{(int(mo) - 1) // 3 + 1}"
        cell = agg[(r.event_type, q)]
        cell[0] += r.n_events
        cell[1] += r.n_active_days
        # recover the month's exact micro total from its double render
        cell[2] += round(r.sum_value * 10000)
    rows = _Q["events_quarterly_rollup"].build(spark, sf_small).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n, a, micro = agg[(r.event_type, r.quarter)]
        assert (r.n_events, r.n_active_days) == (n, a)
        assert r.sum_value == micro / 10000.0


# ------------------------------------ per-source gate ablation
def test_ablation_by_source_sums_to_global(spark, sf_small):
    """Partition law: the per-(lang, source) ablation's counts, summed
    over all slices, must reproduce the global ablation row for every
    gate — the flags are per-document, so slicing is a partition of the
    corpus."""
    glob = {r.gate: r for r in
            _Q["quality_gate_ablation"].build(spark, sf_small).collect()}
    per = _Q["quality_gate_ablation_by_source"].build(
        spark, sf_small).collect()
    sums = defaultdict(lambda: [0, 0, 0])
    slices = set()
    for r in per:
        slices.add((r.lang, r.source))
        cell = sums[r.gate]
        cell[0] += r.n_docs
        cell[1] += r.n_fail
        cell[2] += r.n_sole_fail
        assert r.fail_ppm == r.n_fail * 1_000_000 // r.n_docs
        assert r.sole_fail_ppm == r.n_sole_fail * 1_000_000 // r.n_docs
        assert 0 <= r.n_sole_fail <= r.n_fail <= r.n_docs
    assert len(per) == 4 * len(slices)
    for gate, g in glob.items():
        n_docs, n_fail, n_sole = sums[gate]
        # n_docs repeats per gate row, one per slice
        assert n_docs == g.n_docs
        assert n_fail == g.n_fail
        assert n_sole == g.n_sole_fail


def test_ablation_by_source_any_matches_survivors(spark, sf_small):
    """Cross-law vs quality_gate_survivors at the SLICE level: each
    (lang, source) 'any' row must equal that slice's n_docs - n_pass —
    the same law the global ablation satisfies, now per source."""
    surv = {(r.lang, r.source): r for r in
            _Q["quality_gate_survivors"].build(spark, sf_small).collect()}
    per = _Q["quality_gate_ablation_by_source"].build(
        spark, sf_small).collect()
    any_rows = [r for r in per if r.gate == "any"]
    assert len(any_rows) == len(surv)
    for r in any_rows:
        s = surv[(r.lang, r.source)]
        assert r.n_docs == s.n_docs
        assert r.n_fail == s.n_docs - s.n_pass
        assert r.n_sole_fail == r.n_fail


# ------------------------------------------------ shingle-size sweep
def test_shingle_sweep_matches_python(spark, sf_small):
    """Independent third implementation: shingle sets at every k, both
    pair panels, and all five output columns recomputed from raw
    parquet with plain Python md5 hashing — exact equality."""
    import hashlib

    from impractical_impala_spark.queries.dedup import (
        JACCARD_T, MUT_OFFSET, SHINGLE_SWEEP)

    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "text"])
    jt_ppm = round(JACCARD_T * 1_000_000)

    def hset(words, k):
        n = max(len(words) - k + 1, 1)
        sh = {" ".join(words[i:i + k]) for i in range(n)}
        return {int(hashlib.md5(t.encode()).hexdigest()[:7], 16)
                for t in sh}

    sets = {}
    for _, r in docs.iterrows():
        words = r["text"].lower().split(" ")
        sets[int(r["doc_id"])] = {k: hset(words, k) for k in SHINGLE_SWEEP}
        if r["doc_id"] % 3 == 0:
            mut = [w for i, w in enumerate(words) if (i + 1) % 7 != 0]
            sets[int(r["doc_id"]) + MUT_OFFSET] = {
                k: hset(mut, k) for k in SHINGLE_SWEEP}

    def jacc(a, b):
        i = len(a & b)
        return i * 1_000_000 // (len(a) + len(b) - i)

    planted = [(d, d + MUT_OFFSET) for d in sets
               if d % 3 == 0 and d < 1_000_000 and d + MUT_OFFSET in sets]
    neighbor = [(d, d + 1) for d in sets
                if d % 3 != 2 and d < 1_000_000 and d + 1 in sets]
    got = {r.k: r for r in
           _Q["dedup_shingle_sweep"].build(spark, sf_small).collect()}
    assert set(got) == set(SHINGLE_SWEEP)
    for k in SHINGLE_SWEEP:
        pj = [jacc(sets[a][k], sets[b][k]) for a, b in planted]
        nj = [jacc(sets[a][k], sets[b][k]) for a, b in neighbor]
        r = got[k]
        assert r.n_planted == len(planted)
        assert r.n_neighbor == len(neighbor)
        assert r.planted_mean_jacc_ppm == sum(pj) // len(pj)
        assert r.recall_ppm == (sum(1 for j in pj if j >= jt_ppm)
                                * 1_000_000 // len(pj))
        assert r.neighbor_mean_jacc_ppm == sum(nj) // len(nj)
        assert r.separation_ppm == sum(pj) // len(pj) - sum(nj) // len(nj)
        # the panels are ground truth vs unrelated docs: at every k the
        # planted mean must dominate the neighbor mean
        assert r.separation_ppm > 0


# ------------------------------------------------ value SPRT
def test_sprt_value_matches_python_walk(spark, sf_small):
    """Independent third implementation: per-day whole-unit purchase /
    purchase+click value in pandas, the LLR walk replayed with the
    SAME pre-quantized micro-nat constants in plain Python integers —
    exact equality on every column."""
    import math

    from impractical_impala_spark.quantum import VALUE_MICRO
    from impractical_impala_spark.queries.monitor_eval import (
        _SPRT_LA, _SPRT_LB, _SPRT_W0, _SPRT_W1)

    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ev = ev[ev["event_type"].isin(["purchase", "click"])]
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    m = (ev["value"] * VALUE_MICRO).apply(math.floor).astype("int64")
    df = pd.DataFrame({"t": ev["event_type"].values, "d": d.values,
                       "m": m.values})
    per = {}
    for (dd, t), g in df.groupby(["d", "t"]):
        per.setdefault(int(dd), {})[t] = int(g["m"].sum()) // VALUE_MICRO
    days = sorted(per)
    d0 = days[0]
    llr = 0
    want = []
    decided = False
    for dd in days:
        x = per[dd].get("purchase", 0)
        n = x + per[dd].get("click", 0)
        llr += x * _SPRT_W1 + (n - x) * _SPRT_W0
        up = int(llr >= _SPRT_LA)
        lo = int(llr <= _SPRT_LB)
        if not decided:
            state = ("continue" if not (up or lo)
                     else "accept_h1" if up else "accept_h0")
            decided = bool(up or lo)
        else:
            state = ("accept_h1" if up else "accept_h0" if lo
                     else "decided_earlier")
        want.append((dd - d0, x, n, llr, up, lo, state))
    got = [(r.d_idx, r.x, r.n, r.llr_micro, r.hit_upper, r.hit_lower,
            r.state) for r in
           _Q["events_sprt_value"].build(spark, sf_small).collect()]
    assert got == want


# --------------------------- standing invariance gates for the wave
R14W2_CASES = ["ann_ivf_pq_sweep", "events_quarterly_rollup",
               "quality_gate_ablation_by_source", "dedup_shingle_sweep",
               "events_sprt_value"]


@pytest.mark.parametrize("name", R14W2_CASES)
def test_r14w2_partition_invariance(spark, sf_small, name):
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


@pytest.mark.parametrize("name", ["events_quarterly_rollup",
                                  "events_sprt_value"])
def test_r14w2_timezone_invariance(spark, sf_small, name):
    """The wave's timestamp-bearing queries: buckets come from integer
    ts_ns div (+ proleptic-Gregorian date arithmetic on the day index
    for the quarterly grain), so a hostile session TZ must not move a
    bucket or verdict."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
