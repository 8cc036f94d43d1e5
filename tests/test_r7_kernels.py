"""Round-7 kernel references: independent (numpy / pure-Python)
checks for the round-7 numerical fixes and additions — engine parity
alone proves both engines run the same arithmetic, not that the
arithmetic is statistically/numerically RIGHT."""

import math
from pyspark.sql import functions as F
import statistics

import numpy as np
import pytest

KNUTH, M31 = 2654435761, 2147483648


def _boot_u(key: int, r: int) -> int:
    """Pure-Python twin of quality._SPARK_U / _DUCK_U (three Knuth
    multiplicative rounds with xorshift mixes)."""
    h1 = (key % M31) * KNUTH % M31
    m1 = h1 ^ (h1 >> 13)
    h2 = ((m1 + r) * KNUTH) % M31
    m2 = h2 ^ (h2 >> 7)
    h3 = (m2 * KNUTH) % M31
    return (h3 ^ (h3 >> 13)) % 1_000_000


def test_bootstrap_uniform_engine_identity(spark):
    """The Spark expression, the DuckDB expression and the pure-Python
    twin must agree bit-for-bit over a (key, r) grid that includes
    huge keys (the mod-2^31 reduction path)."""
    import duckdb

    from impractical_impala_spark.queries.quality import (
        _DUCK_U, _SPARK_U, BOOT_R)

    keys = [1, 2, 977, 123_456_789, 2**31 - 1, 2**41 + 17]
    rel = duckdb.sql(
        f"SELECT o_orderkey, r, {_DUCK_U} AS u FROM "
        f"(SELECT UNNEST({keys}) AS o_orderkey) "
        f"CROSS JOIN (SELECT UNNEST(range(0, {BOOT_R})) AS r)").fetchall()
    for k, r, u in rel:
        assert u == _boot_u(k, r), (k, r)

    sdf = spark.sql(
        f"SELECT o_orderkey, r, {_SPARK_U} AS u FROM "
        f"(SELECT explode(array({','.join(map(str, keys))})) AS o_orderkey) "
        f"LATERAL VIEW explode(sequence(0, {BOOT_R - 1})) t AS r")
    for row in sdf.collect():
        assert row.u == _boot_u(row.o_orderkey, row.r), row


def test_bootstrap_se_matches_true_poisson():
    """The deliverable check the ADVICE simulation failed on the old
    affine generator: on sequential key blocks with key-LINEAR values
    (the adversarial case — id-ordered amounts), the deterministic
    bootstrap SE must track a true numpy Poisson bootstrap within the
    SE-of-SE envelope, block-averaged. The old two-round affine
    generator measured ~0.75 here; lattice collapse reads ~0.2."""
    acc = 0.0
    for k in range(9):
        acc += math.exp(-1.0) / math.factorial(k)
    thr = np.array([round(sum(math.exp(-1.0) / math.factorial(j)
                              for j in range(i + 1)) * 1e6)
                    for i in range(9)])
    n, reps, blocks = 20_000, 64, 6
    ratios = []
    for blk in range(blocks):
        keys = np.arange(1 + blk * n, 1 + (blk + 1) * n)
        vals = np.arange(1, n + 1, dtype=float)
        means = []
        for r in range(reps):
            us = np.array([_boot_u(int(k), r) for k in keys])
            w = np.searchsorted(thr, us, side="right")
            means.append((w * vals).sum() / w.sum())
        se = statistics.stdev(means)
        true_ses = []
        for seed in range(3):
            rng = np.random.default_rng(seed + 100 * blk)
            m2 = [((w := rng.poisson(1.0, n)) * vals).sum() / w.sum()
                  for _ in range(reps)]
            true_ses.append(statistics.stdev(m2))
        ratios.append(se / np.mean(true_ses))
    mean_ratio = float(np.mean(ratios))
    # SE-of-SE at 64 reps is ~9% per block; over 6 blocks ~4%.
    assert 0.85 < mean_ratio < 1.15, ratios


def test_bootstrap_weight_marginal_is_poisson1():
    """Marginal weight frequencies over a large (key, r) panel must
    match Poisson(1) pmf (truncated at 9) within sampling error."""
    counts = np.zeros(10, dtype=np.int64)
    thr = np.array([round(sum(math.exp(-1.0) / math.factorial(j)
                              for j in range(i + 1)) * 1e6)
                    for i in range(9)])
    n = 50_000
    us = np.array([_boot_u(k, k % 64) for k in range(1, n + 1)])
    w = np.searchsorted(thr, us, side="right")
    for wi in w:
        counts[wi] += 1
    for k in range(5):
        p = math.exp(-1.0) / math.factorial(k)
        got = counts[k] / n
        assert abs(got - p) < 4 * math.sqrt(p * (1 - p) / n), (k, got, p)


def test_pca_normalization_overflow_guard():
    """The driver-side OverflowError must fire exactly when
    S * PCA_SNORM leaves int64 (numpy would wrap silently there)."""
    from impractical_impala_spark.queries.ml_more import PCA_SNORM

    bound = (1 << 63) // PCA_SNORM - 1  # PCA_SNORM divides 2^63 exactly
    assert bound * PCA_SNORM < 1 << 63
    assert (bound + 1) * PCA_SNORM >= 1 << 63
    # the guard in emb_pca_power uses exactly this predicate
    import inspect

    from impractical_impala_spark.queries.ml_more import emb_pca_power
    src = inspect.getsource(emb_pca_power)
    assert "smax * PCA_SNORM >= 1 << 63" in src
    assert "OverflowError" in src


def test_drift_monitor_batch_twin_equals_stream_fold(spark, sf_small):
    """The driver-checkable events_drift_monitor (first-day frozen
    reference) must equal the streaming monitor's reference fold
    applied to the same day-sliced micro-batches — the registered
    query IS the stream's semantics, not a lookalike."""
    import pandas as pd

    from impractical_impala_spark.queries.drift import events_drift_monitor
    from impractical_impala_spark.sources import load_table
    from impractical_impala_spark.streaming.drift import (
        batch_drift_reference)

    got = events_drift_monitor(spark, sf_small).toPandas()

    ev = (load_table(spark, sf_small, "events")
          .selectExpr("event_type", "date_format(ts, 'yyyy-MM-dd') AS day",
                      "value")
          .toPandas())
    # one micro-batch per calendar day, in day order (the stream's
    # arrival order); the fold freezes each type's first-seen batch
    batches = [g.drop(columns="day") for _, g in
               sorted(ev.groupby("day"), key=lambda kv: kv[0])]
    want = batch_drift_reference(batches)

    # align: the fold emits rows in arrival order without the day key;
    # re-key by (type, seq) == (type, day rank)
    got_s = got.sort_values(["event_type", "day"]).reset_index(drop=True)
    want["seq"] = want.groupby("event_type").cumcount()
    got_s["seq"] = got_s.groupby("event_type").cumcount()
    w = want.sort_values(["event_type", "seq"]).reset_index(drop=True)
    assert len(got_s) == len(w)
    assert (got_s["event_type"].values == w["event_type"].values).all()
    assert (got_s["n_ref"].values == w["n_ref"].values).all()
    assert (got_s["n_batch"].values == w["n_batch"].values).all()
    assert (got_s["ks_ppm"].values == w["ks_ppm"].values).all()
    assert (got_s["is_reference"].astype(bool).values
            == w["is_reference"].values).all()


# ---------------------------------------------------------------------
# Independent numpy references for the round-7 statistical operators.
# Each recomputes the statistic from the RAW fixture with a different
# algorithm (true ranks / brute-force pairs / direct folds) and checks
# the registered query's output against it at sf0.001.

def _duck(sf):
    import duckdb
    con = duckdb.connect()
    for t in ["orders", "lineitem", "events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con


def _midranks(binned):
    """True average ranks of a 1D integer-binned sample."""
    order = np.argsort(binned, kind="mergesort")
    ranks = np.empty(len(binned), dtype=np.float64)
    sorted_v = binned[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_kruskal_wallis_matches_true_ranks(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import (
        events_kruskal_wallis)

    got = events_kruskal_wallis(spark, sf_small).toPandas().iloc[0]
    ev = _duck(sf_small).execute(
        "SELECT event_type, value FROM events").fetchdf()
    mn, mx = ev.value.min(), ev.value.max()
    b = np.minimum(255, np.floor(
        (ev.value.values - mn) * 256 / (mx - mn))).astype(np.int64)
    ranks = _midranks(b)
    n = len(b)
    groups = ev.event_type.values
    h = 12.0 / (n * (n + 1)) * sum(
        ranks[groups == g].sum() ** 2 / (groups == g).sum()
        for g in np.unique(groups)) - 3.0 * (n + 1)
    _, counts = np.unique(b, return_counts=True)
    corr = 1.0 - (counts.astype(float) ** 3 - counts).sum() / (n**3 - n)
    assert abs(got.h_stat - h) < 1e-4, (got.h_stat, h)
    assert abs(got.h_tie_corrected - h / corr) < 1e-4


def test_kendall_tau_matches_brute_force(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import (
        N_KT_BINS, lineitem_kendall_tau)

    got = lineitem_kendall_tau(spark, sf_small).toPandas() \
        .set_index("l_returnflag")
    li = _duck(sf_small).execute(
        "SELECT l_returnflag f, CAST(FLOOR(l_extendedprice*100) AS BIGINT)"
        " cents, CAST(FLOOR(l_quantity) AS BIGINT) qv FROM lineitem"
    ).fetchdf()
    for flag, g in li.groupby("f"):
        mn, mx = g.cents.min(), g.cents.max()
        x = np.minimum(N_KT_BINS - 1, np.floor(
            (g.cents.values - mn) * N_KT_BINS / (mx - mn))).astype(np.int64)
        y = g.qv.values
        C = D = 0
        for i in range(len(x)):
            dx = np.sign(x[i + 1:] - x[i])
            dy = np.sign(y[i + 1:] - y[i])
            prod = dx * dy
            C += int((prod > 0).sum())
            D += int((prod < 0).sum())
        row = got.loc[flag]
        assert (row.concordant, row.discordant) == (C, D), flag
        n = len(x)
        from collections import Counter
        n1 = sum(t * (t - 1) // 2 for t in Counter(x).values())
        n2 = sum(t * (t - 1) // 2 for t in Counter(list(y)).values())
        n0 = n * (n - 1) // 2
        tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
        assert abs(row.tau_b - tau) < 1e-5, (flag, row.tau_b, tau)


def test_mann_kendall_matches_brute_force(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import (
        DAY_NS, events_mann_kendall)

    got = events_mann_kendall(spark, sf_small).toPandas() \
        .set_index("event_type")
    ev = _duck(sf_small).execute(
        f"SELECT event_type, CAST(epoch_us(ts) AS BIGINT)*1000 // {DAY_NS}"
        " AS d, CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS c"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2").fetchdf()
    for t, g in ev.groupby("event_type"):
        c = g.sort_values("d").c.values
        s = sum(int(np.sign(c[j] - c[i]))
                for i in range(len(c)) for j in range(i + 1, len(c)))
        n = len(c)
        from collections import Counter
        tie18 = sum(t0 * (t0 - 1) * (2 * t0 + 5)
                    for t0 in Counter(c).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        row = got.loc[t]
        assert (row.s_stat, row.var18) == (s, var18), t
        if s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        else:
            z = 0.0
        assert abs(row.z_mk - z) < 1e-3, t


def test_welch_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import (
        events_welch_ttest)

    got = events_welch_ttest(spark, sf_small).toPandas() \
        .set_index("event_type")
    ev = _duck(sf_small).execute(
        "SELECT event_type, CAST(epoch_us(ts) AS BIGINT)*1000 AS ts_ns,"
        " CAST(FLOOR(value*100) AS BIGINT) AS centi FROM events").fetchdf()
    mid = (ev.ts_ns.min() + ev.ts_ns.max()) // 2
    for t, g in ev.groupby("event_type"):
        a = g[g.ts_ns <= mid].centi.values.astype(float)
        b = g[g.ts_ns > mid].centi.values.astype(float)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        tt = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                         + (vb / len(b)) ** 2 / (len(b) - 1))
        row = got.loc[t]
        assert abs(row.t_stat - tt) < 1e-3, (t, row.t_stat, tt)
        assert abs(row.df_welch - df) < 0.05, (t, row.df_welch, df)


def test_jsd_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import events_jsd_drift

    got = events_jsd_drift(spark, sf_small).toPandas() \
        .set_index("event_type")
    ev = _duck(sf_small).execute(
        "SELECT event_type, CAST(epoch_us(ts) AS BIGINT)*1000 AS ts_ns,"
        " value FROM events").fetchdf()
    mn, mx = ev.value.min(), ev.value.max()
    mid = (ev.ts_ns.min() + ev.ts_ns.max()) // 2
    bins = np.minimum(255, np.floor(
        (ev.value.values - mn) * 256 / (mx - mn))).astype(np.int64)
    for t in got.index:
        sel = (ev.event_type == t).values
        ha = np.bincount(bins[sel & (ev.ts_ns <= mid).values],
                         minlength=256).astype(float)
        hb = np.bincount(bins[sel & (ev.ts_ns > mid).values],
                         minlength=256).astype(float)
        p, q = ha / ha.sum(), hb / hb.sum()
        m = (p + q) / 2
        jsd = 0.0
        for k in range(256):
            if p[k] > 0:
                jsd += p[k] * math.log(p[k] / m[k]) / 2
            if q[k] > 0:
                jsd += q[k] * math.log(q[k] / m[k]) / 2
        assert abs(got.loc[t].jsd_nats - jsd) < 1e-5, t
        assert -1e-12 <= jsd <= math.log(2) + 1e-12


def test_kaplan_meier_matches_hand_fold(spark, sf_small):
    from impractical_impala_spark.queries.stat_tests import (
        DAY_NS, KM_CENSOR_DAYS, users_kaplan_meier)

    got = users_kaplan_meier(spark, sf_small).toPandas()
    life = _duck(sf_small).execute(
        f"SELECT MIN(CAST(epoch_us(ts) AS BIGINT))*1000 // {DAY_NS} AS f,"
        f" MAX(CAST(epoch_us(ts) AS BIGINT))*1000 // {DAY_NS} AS l"
        " FROM events GROUP BY user_id").fetchdf()
    gmax = life.l.max()
    t = (life.l - life.f).values
    cens = (life.l > gmax - KM_CENSOR_DAYS).values
    surv, rows = 1.0, {}
    n_risk = len(t)
    for day in sorted(set(t)):
        d = int(((t == day) & ~cens).sum())
        c = int(((t == day) & cens).sum())
        if d < n_risk:
            surv *= (n_risk - d) / n_risk
        else:
            surv = 0.0
        rows[day] = (n_risk, d, c, surv)
        n_risk -= d + c
    for _, r in got.iterrows():
        nr, d, c, s = rows[r.lifetime_d]
        assert (r.n_risk, r.n_churned, r.n_censored) == (nr, d, c)
        assert abs(r.survival - s) < 1e-6, (r.lifetime_d, r.survival, s)
    # survival is monotone non-increasing
    sv = got.sort_values("lifetime_d").survival.values
    assert all(sv[i] >= sv[i + 1] - 1e-12 for i in range(len(sv) - 1))


def test_assortativity_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.audit_ops import (
        graph_degree_assortativity)

    got = graph_degree_assortativity(spark, sf_small).toPandas().iloc[0]
    edges = _duck(sf_small).execute(
        "SELECT DISTINCT o_custkey c, l_suppkey s FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey").fetchdf()
    dc = edges.groupby("c").size()
    ds = edges.groupby("s").size()
    x = edges.c.map(dc).values.astype(float)
    y = edges.s.map(ds).values.astype(float)
    r = np.corrcoef(x, y)[0, 1]
    assert got.n_edges == len(edges)
    assert abs(got.assortativity - r) < 1e-5, (got.assortativity, r)


def test_sequence_gap_frame_synthetic(spark):
    """Synthetic holes (an intra-block run, a block-boundary run, a
    single missing id) must be counted exactly — including the gap
    that CROSSES the 4096-block boundary, the case the blocked
    decomposition could plausibly get wrong."""
    from pyspark.sql import functions as F

    from impractical_impala_spark.queries.sampling_stats import (
        sequence_gap_frame)

    ids = spark.range(0, 20000).filter(
        ~F.col("id").isin(5, 6, 7, 4095, 4096, 12000)).select(
        F.col("id").alias("event_id"))
    out = sequence_gap_frame(ids).collect()[0]
    assert out.n_ids == 19994
    assert out.n_missing == 6
    assert out.max_gap == 3          # the 5,6,7 run
    assert out.n_gap_runs == 3       # {5,6,7}, {4095,4096}, {12000}


def test_lmoments_match_direct_order_stats(spark, sf_small):
    """L-CV / L-skew from the Faulhaber bin decomposition must equal
    the direct order-statistic estimator computed on the SORTED binned
    sample (same quantized domain, different algorithm)."""
    from impractical_impala_spark.queries.sampling_stats import (
        N_LM_BINS, lineitem_lmoments)

    got = lineitem_lmoments(spark, sf_small).toPandas() \
        .set_index("l_returnflag")
    li = _duck(sf_small).execute(
        "SELECT l_returnflag f,"
        " CAST(FLOOR(l_extendedprice*100) AS BIGINT) cents"
        " FROM lineitem").fetchdf()
    for flag, g in li.groupby("f"):
        mn, mx = g.cents.min(), g.cents.max()
        x = np.sort(np.minimum(N_LM_BINS - 1, np.floor(
            (g.cents.values - mn) * N_LM_BINS
            / float(mx - mn))).astype(np.int64)).astype(float)
        n = len(x)
        i = np.arange(1, n + 1, dtype=float)
        b0 = x.mean()
        b1 = (x * (i - 1)).sum() / (n * (n - 1))
        b2 = (x * (i - 1) * (i - 2)).sum() / (n * (n - 1) * (n - 2))
        l1, l2, l3 = b0, 2 * b1 - b0, 6 * b2 - 6 * b1 + b0
        row = got.loc[flag]
        assert abs(row.l_cv - l2 / l1) < 1e-5, flag
        assert abs(row.l_skew - l3 / l2) < 1e-4, flag


def test_weighted_reservoir_is_true_top_k(spark, sf_small):
    """The two-phase salted top-K must equal the single-phase global
    top-K per language (the partial pass can never evict a true
    winner), and inclusion must follow the Efraimidis-Spirakis keys
    recomputed independently."""
    from impractical_impala_spark.queries.sampling_stats import (
        WRS_K, weighted_reservoir_sample)

    got = weighted_reservoir_sample(spark, sf_small).toPandas()
    docs = _duck(sf_small).execute(
        "SELECT doc_id, lang, n_chars FROM documents").fetchdf()
    M31_7 = 268435455
    def key(doc_id, w):
        import hashlib
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16)
        return ((h % M31_7) + 1) / 268435456.0, w
    docs["key"] = [
        (( (u := key(d, w))[0]) ** (1.0 / u[1]))
        for d, w in zip(docs.doc_id, docs.n_chars)]
    for lang, g in docs.groupby("lang"):
        want = g.sort_values(["key", "doc_id"],
                             ascending=[False, True]).head(WRS_K)
        got_l = got[got.lang == lang].sort_values("sample_rank")
        assert list(got_l.doc_id) == list(want.doc_id), lang


def test_pmi_top_pair_is_plausible(spark, sf_small):
    """PMI ranking sanity on the fixture: every returned pair meets
    the support cut, PMI values are finite and descending, and a
    brute-force recount of the top pair's statistics matches."""
    from impractical_impala_spark.queries.sampling_stats import (
        PMI_MIN_SUPPORT, text_pmi_collocations)

    got = text_pmi_collocations(spark, sf_small).toPandas()
    assert (got.c_ab >= PMI_MIN_SUPPORT).all()
    assert got.pmi.is_monotonic_decreasing or len(got) <= 1
    docs = _duck(sf_small).execute(
        "SELECT lower(text) t FROM documents").fetchdf()
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in docs.t:
        w = t.split(" ")
        uni.update(w)
        bi.update(zip(w, w[1:]))
    top = got.iloc[0]
    n = sum(uni.values())
    nb = sum(c for c in bi.values() if c >= PMI_MIN_SUPPORT)
    assert bi[(top.a, top.b)] == top.c_ab
    assert uni[top.a] == top.c_a and uni[top.b] == top.c_b
    pmi = math.log((top.c_ab / nb) / ((top.c_a / n) * (top.c_b / n)))
    assert abs(top.pmi - pmi) < 1e-5


def test_price_ols_matches_numpy_lstsq(spark, sf_small):
    """The Cramer-rule integer normal equations must match numpy's
    QR-based lstsq (a completely different solve path) on betas and
    R^2 for every return flag."""
    from impractical_impala_spark.queries.stat_tests import (
        lineitem_price_ols)

    got = lineitem_price_ols(spark, sf_small).toPandas() \
        .set_index("l_returnflag")
    li = _duck(sf_small).execute(
        "SELECT l_returnflag f, CAST(l_quantity AS BIGINT) x1,"
        " CAST(ROUND(l_discount*10000) AS BIGINT) x2,"
        " CAST(FLOOR(l_extendedprice*100) AS BIGINT) y"
        " FROM lineitem").fetchdf()
    for flag, g in li.groupby("f"):
        X = np.column_stack(
            [np.ones(len(g)), g.x1, g.x2]).astype(float)
        y = g.y.values.astype(float)
        b, *_ = np.linalg.lstsq(X, y, rcond=None)
        yhat = X @ b
        r2 = 1 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        row = got.loc[flag]
        assert abs(row.beta_intercept_cents - b[0]) < max(1.0, 1e-6 * abs(b[0]))
        assert abs(row.beta_per_qty_cents - b[1]) < max(0.01, 1e-5 * abs(b[1]))
        assert abs(row.beta_per_disc_bp_cents - b[2]) < max(0.01, 1e-5 * abs(b[2]))
        assert abs(row.r2 - r2) < 1e-5, flag


def test_ivf_nprobe_discriminates_on_boundary_query(spark):
    """On a constructed corpus where the true nearest neighbor lives in
    the query's SECOND-closest cell, probe-1 must miss it and probe-2
    must find it — proving the sweep's recall axis actually moves (the
    fixture corpus saturates at recall 1.0 for every nprobe)."""
    import math as m

    from impractical_impala_spark.queries.similarity import (
        DIM, _ivf_search)

    def vec(a, b):
        v = [0.0] * DIM
        v[0], v[1] = a, b
        n = m.sqrt(a * a + b * b)
        return [x / n for x in v]

    # cells: c0 along e1, c1 along e2. query (vec_id 0 < N_QUERIES)
    # leans to c0 (cos .8 vs .6); its true NN x leans to c1; the only
    # cell-0 candidate y is a worse neighbor.
    rows = [
        (0, vec(0.8, 0.6)),       # query -> assigned cell 0
        (10, vec(0.55, 0.835)),   # true NN, assigned cell 1
        (11, vec(1.0, 0.05)),     # distractor in cell 0
    ]
    emb = (spark.createDataFrame(rows, ["vec_id", "v"])
           .withColumn("norm", F.expr(
               "sqrt(aggregate(v, cast(0.0 as double),"
               " (acc, x) -> acc + x * x))")))
    cent = spark.createDataFrame(
        [(0, vec(1.0, 0.0)), (1, vec(0.0, 1.0))], ["cell_id", "cv"]) \
        .withColumn("cnorm", F.expr(
            "sqrt(aggregate(cv, cast(0.0 as double),"
            " (acc, x) -> acc + x * x))"))
    one = {r.query_id: r.neighbor_id
           for r in _ivf_search(emb, cent, n_probe=1).collect()}
    two = {r.query_id: r.neighbor_id
           for r in _ivf_search(emb, cent, n_probe=2).collect()}
    assert one[0] == 11   # probe-1 sees only cell 0 -> the distractor
    assert two[0] == 10   # probe-2 reaches cell 1 -> the true NN


def test_holt_winters_tracks_float_reference(spark, sf_small):
    """The integer fixed-point Holt-Winters must track a FLOAT
    Holt-Winters (same alpha/beta/gamma, same init) within the
    truncation envelope (a few units per step, not drifting), and the
    registered query must equal the pure-Python fold exactly."""
    import duckdb

    from impractical_impala_spark.queries.forecast import (
        DAY_NS, HW_SEASON, events_holt_winters, hw_fit)

    got = events_holt_winters(spark, sf_small).toPandas()
    con = _duck(sf_small)
    daily = con.execute(
        f"SELECT event_type, CAST(epoch_us(ts) AS BIGINT)*1000 // {DAY_NS}"
        " AS d, CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS c"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2").fetchdf()
    for et, g in daily.groupby("event_type"):
        d0, d1 = g.d.min(), g.d.max()
        by_d = dict(zip(g.d, g.c))
        ys = [int(by_d.get(d, 0)) for d in range(d0, d1 + 1)]
        rows = hw_fit(ys)
        sub = got[got.event_type == et].sort_values("t")
        assert [tuple(r) for r in rows] == list(
            zip(sub.t, sub.level_centi, sub.trend_centi,
                sub.season_centi, sub.fitted_centi))
        # float reference with the same init
        m = HW_SEASON
        mean7 = sum(ys[:m]) / m
        s = [ys[i] - mean7 for i in range(m)]
        lvl, b = mean7, 0.0
        for (t, il, ib, is_, _fit) in rows:
            s_lag = s[t % m]
            new_l = (ys[t] - s_lag + lvl + b) / 2
            new_b = (new_l - lvl + 3 * b) / 4
            new_s = (ys[t] - new_l + 3 * s_lag) / 4
            lvl, b = new_l, new_b
            s[t % m] = new_s
            # truncation error accumulates sub-linearly; a loose but
            # meaningful envelope: within 50 centi-units of float state
            assert abs(il - lvl) < 50, (et, t, il, lvl)
            assert abs(ib - b) < 50
            assert abs(is_ - new_s) < 50


def test_kcore_matches_python_peel(spark):
    """The distributed peel must equal a hand peel on a constructed
    graph whose cores genuinely differ: a 4-clique (core 3) attached
    to a path (core 1) and a 3-cycle (core 2)."""
    from impractical_impala_spark.operators.graph import k_core_summary

    # 4-clique {0,1,2,3}; cycle {10,11,12}; path 3-20-21
    edges = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
             + [(10, 11), (11, 12), (10, 12), (3, 20), (20, 21)])
    e = spark.createDataFrame(edges, ["a", "b"])
    got = {r.k: (r.n_nodes, r.n_edges)
           for r in k_core_summary(e, ks=(2, 3, 4)).collect()}

    def peel(es, k):
        es = set(es)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {u for u, d in deg.items() if d >= k}
            nxt = {(a, b) for a, b in es if a in keep and b in keep}
            if nxt == es:
                nodes = {u for ab in es for u in ab}
                return (len(nodes) if es else 0, len(es))
            es = nxt

    for k in (2, 3, 4):
        assert got[k] == peel(edges, k), k
    # structure sanity: 2-core keeps clique+cycle, 3-core the clique only
    assert got[2] == (7, 9)
    assert got[3] == (4, 6)
    assert got[4] == (0, 0)


def test_kcore_degeneracy_on_constructed_graph(spark):
    """Binary-searched degeneracy must equal the known value (3 for a
    graph whose densest part is a 4-clique) with the right core."""
    from impractical_impala_spark.operators.graph import degeneracy_core

    edges = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
             + [(10, 11), (11, 12), (10, 12), (3, 20), (20, 21)])
    e = spark.createDataFrame(edges, ["a", "b"])
    got = {r.level: r for r in degeneracy_core(e).collect()}
    assert got["degeneracy"].k == 3
    assert (got["degeneracy"].n_nodes, got["degeneracy"].n_edges) == (4, 6)
    assert (got["2core"].n_nodes, got["2core"].n_edges) == (7, 9)


def test_kcore_backbone_profile(spark, sf_small):
    """On the fixture backbone the profile must be valid: the
    degeneracy core is contained in the 2-core and non-empty."""
    from impractical_impala_spark.registry import all_queries
    rows = {r.level: r for r in (all_queries()["graph_kcore_summary"]
                                 .build(spark, sf_small).collect())}
    assert set(rows) == {"2core", "degeneracy"}
    d, two = rows["degeneracy"], rows["2core"]
    assert d.k >= 2 and d.n_edges > 0
    assert d.n_nodes <= two.n_nodes and d.n_edges <= two.n_edges


def test_cusum_binseg_matches_brute_force(spark, sf_small):
    """Both levels must match a brute-force binseg: argmax over
    |n*cum_t - t*total| computed directly per segment, earliest tie."""
    from impractical_impala_spark.queries.drift import HOUR_NS
    from impractical_impala_spark.registry import all_queries

    got = (all_queries()["events_cusum_binseg"]
           .build(spark, sf_small).toPandas())
    hourly = _duck(sf_small).execute(
        f"SELECT event_type, CAST(epoch_us(ts) AS BIGINT)*1000 // {HOUR_NS}"
        " AS hr, COUNT(*) c FROM events GROUP BY 1, 2").fetchdf()

    def brute(cnts, hrs):
        n, tot = len(cnts), sum(cnts)
        cum, best, arg = 0, -1, None
        for t, (h, c) in enumerate(zip(hrs, cnts), start=1):
            cum += c
            s = abs(n * cum - t * tot)
            if s > best:
                best, arg = s, h
        return best, arg, n, tot

    for et, g in hourly.groupby("event_type"):
        h0, h1 = g.hr.min(), g.hr.max()
        by = dict(zip(g.hr, g.c))
        hrs = list(range(h0, h1 + 1))
        cnts = [int(by.get(h, 0)) for h in hrs]
        b1, cp1, n1, t1 = brute(cnts, hrs)
        r1 = got[(got.event_type == et) & (got.level == 1)].iloc[0]
        assert (r1.cusum_scaled, r1.cp_hr, r1.seg_n_hours,
                r1.seg_total) == (b1, cp1, n1, t1), et
        split = hrs.index(cp1)
        for sid, (hh, cc) in enumerate(
                [(hrs[:split + 1], cnts[:split + 1]),
                 (hrs[split + 1:], cnts[split + 1:])]):
            if not hh:
                continue
            b2, cp2, n2, t2 = brute(cc, hh)
            r2 = got[(got.event_type == et) & (got.level == 2)
                     & (got.seg_id == sid)].iloc[0]
            assert (r2.cusum_scaled, r2.cp_hr, r2.seg_n_hours,
                    r2.seg_total) == (b2, cp2, n2, t2), (et, sid)
