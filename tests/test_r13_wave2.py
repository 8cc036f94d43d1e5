"""Round-13 second growth wave: determinism + independent-reference
checks for events_monthly_rollup, events_value_ewma_hourly,
ann_ivf_trained_sweep and orders_hw_band_nation — the same contracts
as the first wave (tests/test_r13_wave.py): hostile splits must not
move a value, session timezones must not move a bucket, every new
kernel has an independent third implementation agreeing exactly, and
compositions obey their monotonicity/consistency laws."""

import math
from datetime import date, timedelta

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

R13W2_CASES = [
    # integer sums / integer fixed-point divisions / one final double
    # division of exact integers — hostile splits must be bit-exact
    "events_monthly_rollup",
    "events_value_ewma_hourly",
    "ann_ivf_trained_sweep",
    "orders_hw_band_nation",
]


@pytest.mark.parametrize("name", R13W2_CASES)
def test_r13w2_partition_invariance(spark, sf_small, name):
    """Narrow scan partitions, prime shuffle width, small Arrow batches
    must not change a single output value. All four are in the EXACT
    class: associative integer accumulation everywhere order can vary,
    then order-free scalar float ops."""
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


@pytest.mark.parametrize("name", ["events_monthly_rollup",
                                  "events_value_ewma_hourly",
                                  "orders_hw_band_nation"])
def test_r13w2_timezone_invariance(spark, sf_small, name):
    """The time-bearing queries bin on the lossless ts_ns epoch
    (events) or the NTZ o_orderdate (orders), and the month label is
    date arithmetic on an epoch-day integer — a UTC+14 session zone
    must not move any bucket or label."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_monthly_rollup_pandas_reference(spark, sf_small):
    """Independent third implementation: recompute the calendar-month
    rollup straight from parquet with pandas + Python date arithmetic
    (no Spark, no DuckDB) and require exact equality — counts, active
    days and micro sums."""
    import pandas as pd

    df = pd.read_parquet(f"{sf_small}/events.parquet")
    ts_ns = df["ts"].values.astype("datetime64[ns]").astype("int64")
    hr = ts_ns // 3_600_000_000_000
    d = hr // 24
    micro = [int(math.floor(v * 10000)) for v in df["value"]]
    month = [(date(1970, 1, 1) + timedelta(days=int(x))).strftime("%Y-%m")
             for x in d]
    g = pd.DataFrame({"event_type": df["event_type"], "d": d,
                      "month": month, "m": micro})
    day = g.groupby(["event_type", "d", "month"], as_index=False).agg(
        n=("m", "size"), s=("m", "sum"))
    mon = day.groupby(["event_type", "month"]).agg(
        n_events=("n", "sum"), n_active_days=("d", "nunique"),
        s=("s", "sum"))
    rows = _Q["events_monthly_rollup"].build(spark, sf_small).collect()
    assert len(rows) == len(mon)
    for r in rows:
        e = mon.loc[(r.event_type, r.month)]
        assert r.n_events == int(e["n_events"])
        assert r.n_active_days == int(e["n_active_days"])
        assert round(r.sum_value * 10000) == int(e["s"])


def test_monthly_vs_time_rollup_consistency(spark, sf_small):
    """Cross-query law: folding events_time_rollup's DAY grain through
    the same epoch-day → calendar-month map must reproduce
    events_monthly_rollup exactly (both cascades share the hourly
    reduce, so any divergence is in the month fold itself)."""
    days = [r for r in _Q["events_time_rollup"].build(
        spark, sf_small).collect() if r.grain == "day"]
    agg = {}
    for r in days:
        key = (r.event_type,
               (date(1970, 1, 1)
                + timedelta(days=int(r.bucket))).strftime("%Y-%m"))
        n, s, nd = agg.get(key, (0, 0, 0))
        agg[key] = (n + r.n_events, s + round(r.sum_value * 10000), nd + 1)
    rows = _Q["events_monthly_rollup"].build(spark, sf_small).collect()
    assert {(r.event_type, r.month) for r in rows} == set(agg)
    for r in rows:
        n, s, nd = agg[(r.event_type, r.month)]
        assert (r.n_events, round(r.sum_value * 10000),
                r.n_active_days) == (n, s, nd)


def test_value_ewma_python_reference(spark, sf_small):
    """Independent third implementation: dense per-type hourly micro
    sums rebuilt with pandas, then the 16-term power-of-two lag
    polynomial evaluated in plain Python integers — exact equality with
    the Spark query, including gap hours (cnt 0 contributes weight but
    no mass) and the <16-term warmup normalization."""
    import pandas as pd

    df = pd.read_parquet(f"{sf_small}/events.parquet")
    ts_ns = df["ts"].values.astype("datetime64[ns]").astype("int64")
    g = pd.DataFrame({
        "event_type": df["event_type"],
        "hr": ts_ns // 3_600_000_000_000,
        "m": [int(math.floor(v * 10000)) for v in df["value"]]})
    hourly = g.groupby(["event_type", "hr"])["m"].sum()
    expect = {}
    for et in sorted(set(g["event_type"])):
        sub = hourly.loc[et]
        h0, h1 = int(sub.index.min()), int(sub.index.max())
        ys = [int(sub.get(h, 0)) for h in range(h0, h1 + 1)]
        for i, hr in enumerate(range(h0, h1 + 1)):
            scaled = norm = 0
            for k in range(16):
                if i - k < 0:
                    break
                w = 1 << (15 - k)
                scaled += ys[i - k] * w
                norm += w
            expect[(et, hr)] = (ys[i], (scaled * 1000) // norm)
    rows = _Q["events_value_ewma_hourly"].build(spark, sf_small).collect()
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[(r.event_type, r.hr)] == (
            r.value_micro, r.vewma_milli), (r.event_type, r.hr)


def test_trained_sweep_monotone_in_nprobe(spark, sf_small):
    """Candidate sets grow with n_probe (probe keys are nested), so
    n_answered and recall@1 must be non-decreasing and the summed
    cosine regret non-increasing; and the n_probe=2 point must agree
    with what ann_ivf_trained's fixed probe-2 search would measure —
    here checked as regret >= 0 and recall bounded by answered."""
    rows = sorted(_Q["ann_ivf_trained_sweep"].build(
        spark, sf_small).collect(), key=lambda r: r.n_probe)
    assert [r.n_probe for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.n_answered >= a.n_answered
        assert b.n_hit1 >= a.n_hit1
        # Summed regret is only lawfully monotone between points that
        # answer the SAME query set: a larger candidate set can answer a
        # previously-unanswered query with a positive gap, adding a
        # >= 0 term (ADVICE r13 #1). Candidates nest, so equal
        # n_answered means equal answered sets, where per-query gaps
        # weakly improve and the sum is non-increasing.
        if b.n_answered == a.n_answered:
            assert b.cos_gap_micro <= a.cos_gap_micro
    for r in rows:
        assert 0 <= r.n_hit1 <= r.n_answered <= r.n_queries
        assert r.cos_gap_micro >= 0
        assert r.recall1_ppm == r.n_hit1 * 1_000_000 // r.n_queries


def test_hw_band_independent_recompute(spark, sf_small):
    """Independent third implementation: rebuild each nation's dense
    weekly cents series with pandas, run a FRESH inline Holt-Winters
    recursion (not hw_fit), derive the residual sufficient statistics,
    the T+1 point forecast and the +-2-sd band in plain Python, and
    require exact equality with the Spark query."""
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
                       lambda x: int(math.floor(x))))

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
        resid, seasons = [], {}
        for t in range(M, len(ys)):
            slag = sw[t % M]
            resid.append(ys[t] - (lvl + b + slag))
            nl = trunc(ys[t] - slag + lvl + b, 2)
            nb = trunc(nl - lvl + 3 * b, 4)
            ns = trunc(ys[t] - nl + 3 * slag, 4)
            lvl, b = nl, nb
            sw[t % M] = ns
            seasons[t] = ns
        tmax = len(ys) - 1
        n = len(resid)
        s1, s2 = sum(resid), sum(r * r for r in resid)
        sd = math.sqrt((float(s2) - float(s1) * s1 / n) / (n - 1))
        s_next = seasons.get(tmax - (M - 1))
        fc = lvl + b + s_next if s_next is not None else None
        half = int(round(2 * sd)) if fc is not None else None
        expect[nm] = (n, s1, round(sd, 4), fc,
                      None if fc is None else fc - half,
                      None if fc is None else fc + half)

    rows = _Q["orders_hw_band_nation"].build(spark, sf_small).collect()
    assert rows and len(rows) == len(expect)
    for r in rows:
        n, s1, sd4, fc, lo, hi = expect[r.n_name]
        assert (r.n_resid, r.resid_sum_centi) == (n, s1), r.n_name
        assert r.resid_sd_centi == pytest.approx(sd4, abs=0), r.n_name
        assert (r.forecast_centi, r.band_lo_centi, r.band_hi_centi) == (
            fc, lo, hi), r.n_name


# ---------------------------------------------------- wave 3 additions

@pytest.mark.parametrize("name", ["orders_hw_backtest_nation",
                                  "dedup_banding_sweep"])
def test_r13w3_partition_invariance(spark, sf_small, name):
    """Wave-3 queries are in the EXACT class too: integer error sums /
    pair counts, integer ppm divisions."""
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


def test_hw_backtest_timezone_invariance(spark, sf_small):
    base = sorted(map(tuple, _Q["orders_hw_backtest_nation"]
                      .build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple, _Q["orders_hw_backtest_nation"]
                             .build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_hw_backtest_independent_recompute(spark, sf_small):
    """Independent third implementation: the same fresh inline HW
    recursion as the band test, extended with naive / seasonal-naive
    one-step errors over the dense weekly series, all in plain Python
    integers — exact equality with the Spark query per nation."""
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
                       lambda x: int(math.floor(x))))

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
        hw_e = naive_e = snaive_e = n = 0
        for t in range(M, len(ys)):
            slag = sw[t % M]
            hw_e += abs(ys[t] - (lvl + b + slag))
            naive_e += abs(ys[t] - ys[t - 1])
            snaive_e += abs(ys[t] - ys[t - M])
            n += 1
            nl = trunc(ys[t] - slag + lvl + b, 2)
            nb = trunc(nl - lvl + 3 * b, 4)
            ns = trunc(ys[t] - nl + 3 * slag, 4)
            lvl, b = nl, nb
            sw[t % M] = ns
        expect[nm] = (
            n, trunc(hw_e * 1000, n), trunc(naive_e * 1000, n),
            trunc(snaive_e * 1000, n),
            None if snaive_e == 0 else trunc(hw_e * 1_000_000, snaive_e))

    rows = _Q["orders_hw_backtest_nation"].build(spark, sf_small).collect()
    assert rows and len(rows) == len(expect)
    for r in rows:
        assert expect[r.n_name] == (
            r.n_weeks, r.hw_mae_milli, r.naive_mae_milli,
            r.snaive_mae_milli, r.hw_skill_ppm), r.n_name


def test_banding_sweep_python_reference_and_nesting(spark, sf_small):
    """Independent recompute of the banding sweep from the Spark-side
    shingle-hash sets (the sweep's own input frame): pure-Python minhash
    perms, nested band keys, candidate/confirm/planted counts — exact
    equality on every column, plus the nesting law cand(2) ⊆ cand(4) ⊆
    cand(8) checked on the actual pair sets."""
    from impractical_impala_spark.queries.dedup import (
        BAND_SWEEP, JACCARD_T_PPM, MUT_OFFSET, NUM_PERM, P, PERMS,
        _spark_docsets)

    rows = {r.doc_id: list(r.dh)
            for r in _spark_docsets(spark, sf_small, mutated=True).collect()}
    sigs = {}
    for did, dh in rows.items():
        sigs[did] = [min((a * h + b) % P for h in dh) for a, b in PERMS]

    def cand_set(nb):
        rpb = NUM_PERM // nb
        buckets = {}
        for did, mh in sigs.items():
            for band in range(nb):
                key = (band, tuple(mh[band * rpb:(band + 1) * rpb]))
                buckets.setdefault(key, []).append(did)
        pairs = set()
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
        return pairs

    import pandas as pd
    n_planted = int((pd.read_parquet(
        f"{sf_small}/documents.parquet", columns=["doc_id"])["doc_id"]
        % 3 == 0).sum())

    got = {r.n_bands: r for r in
           _Q["dedup_banding_sweep"].build(spark, sf_small).collect()}
    prev = set()
    for nb in BAND_SWEEP:
        cand = cand_set(nb)
        assert prev <= cand, f"banding candidates not nested at b={nb}"
        prev = cand
        n_conf = n_hit = 0
        for da, db in cand:
            sa, sb = set(rows[da]), set(rows[db])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter * 1_000_000 // union >= JACCARD_T_PPM:
                n_conf += 1
            if db - da == MUT_OFFSET and da % 3 == 0:
                n_hit += 1
        r = got[nb]
        assert (r.rows_per_band, r.n_cand, r.n_confirmed,
                r.n_planted_hit, r.n_planted) == (
            NUM_PERM // nb, len(cand), n_conf, n_hit, n_planted), nb
        assert r.recall_ppm == n_hit * 1_000_000 // n_planted
        assert r.precision_ppm == (
            None if not cand else n_conf * 1_000_000 // len(cand))


def test_banding_sweep_b4_matches_minhash_lsh(spark, sf_small):
    """Cross-query law: the b=4 sweep point IS the registered
    dedup_minhash_lsh configuration, and the integer-ppm threshold
    compare is exactly equivalent to the double compare (floor(x) >= k
    ⟺ x >= k for integer k), so n_confirmed(b=4) must equal the
    pipeline's confirmed-pair count."""
    n_lsh = _Q["dedup_minhash_lsh"].build(spark, sf_small).count()
    r4 = [r for r in _Q["dedup_banding_sweep"].build(
        spark, sf_small).collect() if r.n_bands == 4][0]
    assert r4.n_confirmed == n_lsh


# ---------------------------------------------------- wave 4 additions

@pytest.mark.parametrize("name", ["quality_gate_ablation",
                                  "ann_lsh_tables_sweep"])
def test_r13w4_partition_invariance(spark, sf_small, name):
    """Wave-4 queries: exact integer counts and integer-ppm rates."""
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


def test_gate_ablation_cross_laws(spark, sf_small):
    """Cross-query law vs quality_gate_survivors: the ablation's 'any'
    row must equal total docs minus total passes, and sole-fail counts
    can never exceed fail counts nor their sum exceed 'any'."""
    surv = _Q["quality_gate_survivors"].build(spark, sf_small).collect()
    n_docs = sum(r.n_docs for r in surv)
    n_pass = sum(r.n_pass for r in surv)
    rows = {r.gate: r for r in
            _Q["quality_gate_ablation"].build(spark, sf_small).collect()}
    assert set(rows) == {"any", "word_count", "avg_word_len",
                         "stopword_ratio"}
    any_row = rows["any"]
    assert any_row.n_docs == n_docs
    assert any_row.n_fail == n_docs - n_pass
    assert any_row.n_sole_fail == any_row.n_fail
    gates = [rows[g] for g in ("word_count", "avg_word_len",
                               "stopword_ratio")]
    for g in gates:
        assert 0 <= g.n_sole_fail <= g.n_fail <= any_row.n_fail
        assert g.fail_ppm == g.n_fail * 1_000_000 // n_docs
    # sole-failures are disjoint doc sets, so they sum under 'any'
    assert sum(g.n_sole_fail for g in gates) <= any_row.n_fail
    # inclusion-exclusion upper bound: any <= sum of fails
    assert any_row.n_fail <= sum(g.n_fail for g in gates)


def test_gate_ablation_pandas_reference(spark, sf_small):
    """Independent third implementation: recompute all four ablation
    rows from parquet with pandas + plain Python and require exact
    equality."""
    import pandas as pd

    from impractical_impala_spark.queries.training_ops import (
        MAX_STOP_RATIO, MAX_WORDS, MAX_AVG_WLEN, MIN_AVG_WLEN, MIN_WORDS,
        _STOPWORDS)

    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["text"])
    fw = fl = fs = sw = sl = ss = fa = 0
    for text in docs["text"]:
        words = text.lower().split(" ")
        n = len(words)
        wlen = len(text.replace(" ", "")) / n
        stop = sum(1 for w in words if w in _STOPWORDS) / n
        f1 = not (MIN_WORDS <= n <= MAX_WORDS)
        f2 = not (MIN_AVG_WLEN <= wlen <= MAX_AVG_WLEN)
        f3 = stop > MAX_STOP_RATIO
        fw += f1; fl += f2; fs += f3
        sw += f1 and not f2 and not f3
        sl += f2 and not f1 and not f3
        ss += f3 and not f1 and not f2
        fa += f1 or f2 or f3
    n_docs = len(docs)
    want = {
        "word_count": (fw, sw), "avg_word_len": (fl, sl),
        "stopword_ratio": (fs, ss), "any": (fa, fa)}
    rows = _Q["quality_gate_ablation"].build(spark, sf_small).collect()
    assert len(rows) == 4
    for r in rows:
        f, s = want[r.gate]
        assert (r.n_docs, r.n_fail, r.n_sole_fail) == (n_docs, f, s), r.gate
        assert r.fail_ppm == f * 1_000_000 // n_docs
        assert r.sole_fail_ppm == s * 1_000_000 // n_docs


def test_tables_sweep_monotone_and_t3_matches_audit(spark, sf_small):
    """Nesting law: candidate unions grow with T, so volume, answered,
    recall are non-decreasing and regret non-increasing; and the T=3
    point IS ann_lsh_bucketed's configuration, so its n_hit1 must equal
    ann_recall_audit's."""
    rows = sorted(_Q["ann_lsh_tables_sweep"].build(
        spark, sf_small).collect(), key=lambda r: r.n_tables)
    assert [r.n_tables for r in rows] == [1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_cand_pairs >= a.n_cand_pairs
        assert b.n_answered >= a.n_answered
        assert b.n_hit1 >= a.n_hit1
        # gated on equal answered sets — same reasoning as the trained
        # nprobe sweep (ADVICE r13 #1): a newly-answered query adds a
        # >= 0 regret term, so the sum is only monotone between points
        # answering the same (nested => equal) query set
        if b.n_answered == a.n_answered:
            assert b.cos_gap_micro <= a.cos_gap_micro
    audit = _Q["ann_recall_audit"].build(spark, sf_small).collect()[0]
    t3 = rows[2]
    assert (t3.n_queries, t3.n_answered, t3.n_hit1) == (
        audit.n_queries, audit.n_answered, audit.n_hit1)
    assert t3.cos_gap_micro == audit.cos_gap_micro


def test_tables_sweep_numpy_reference(spark, sf_small):
    """Independent third implementation: signatures, per-table buckets,
    nested candidate unions, panel top-1 and all sweep columns
    recomputed with numpy + plain Python — exact equality."""
    import numpy as np

    from impractical_impala_spark.queries.similarity import (
        BITS_PER_TABLE, N_QUERIES, N_TABLES, TABLE_SWEEP, _plane_sign)

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb}
    dim = len(next(iter(vecs.values())))
    planes = np.array([[_plane_sign(p, j) for j in range(dim)]
                       for p in range(N_TABLES * BITS_PER_TABLE)],
                      dtype=np.float64)
    sig = {}
    for vid, v in vecs.items():
        proj = planes @ v
        sig[vid] = [sum((1 << r) for r in range(BITS_PER_TABLE)
                        if proj[t * BITS_PER_TABLE + r] > 0)
                    for t in range(N_TABLES)]
    norms = {vid: float(np.sqrt(v @ v)) for vid, v in vecs.items()}
    exact = {}
    for q in [v for v in vecs if v < N_QUERIES]:
        best = None
        for c in vecs:
            if c == q:
                continue
            cos = float(vecs[q] @ vecs[c]) / (norms[q] * norms[c])
            if (best is None or cos > best[0]
                    or (cos == best[0] and c < best[1])):
                best = (cos, c)
        exact[q] = best

    got = {r.n_tables: r for r in _Q["ann_lsh_tables_sweep"].build(
        spark, sf_small).collect()}
    for nt in TABLE_SWEEP:
        by_bucket = {}
        for vid, s in sig.items():
            for t in range(nt):
                by_bucket.setdefault((t, s[t]), []).append(vid)
        cand = set()
        for ids in by_bucket.values():
            for a in ids:
                for b in ids:
                    if a != b:
                        cand.add((a, b))
        n_pairs = sum(1 for a, b in cand if a < b)
        top1, gap = {}, 0
        for a, b in cand:
            if a >= N_QUERIES:
                continue
            cos = float(vecs[a] @ vecs[b]) / (norms[a] * norms[b])
            cur = top1.get(a)
            if cur is None or cos > cur[0] or (cos == cur[0] and b < cur[1]):
                top1[a] = (cos, b)
        n_hit1 = sum(1 for q, (c, n) in top1.items()
                     if n == exact[q][1])
        for q, (c, n) in top1.items():
            gap += int(np.round((round(exact[q][0], 6) - round(c, 6))
                                * 1_000_000))
        r = got[nt]
        assert (r.n_cand_pairs, r.n_answered, r.n_hit1) == (
            n_pairs, len(top1), n_hit1), nt
        assert r.cos_gap_micro == gap, nt
        assert r.recall1_ppm == n_hit1 * 1_000_000 // r.n_queries
