"""Independent numpy references for the round-6 statistical kernels.

The oracle-parity harness proves Spark == DuckDB; these tests prove the
shared formula itself is the TEXTBOOK statistic (a bug mirrored into
both engines would pass parity — this is the third, independent
implementation that catches it). Data is pulled once per kernel from
the sf0.001 fixture and recomputed with plain numpy/pandas.
"""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table


def test_autocorr24_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        HOUR_NS, events_hourly_autocorr24)
    got = {r.event_type: r.r24
           for r in events_hourly_autocorr24(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
          .toPandas())
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("hr").size()
        full = counts.reindex(
            range(int(counts.index.min()), int(counts.index.max()) + 1),
            fill_value=0).to_numpy(dtype=float)
        if len(full) <= 24:
            assert et not in got
            continue
        x, y = full[24:], full[:-24]
        ref = np.corrcoef(x, y)[0, 1]
        assert math.isclose(got[et], round(ref, 6), abs_tol=2e-6), (
            f"{et}: spark {got[et]} vs numpy {ref}")


def test_fano_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        HOUR_NS, events_fano_burstiness)
    got = {r.event_type: r for r in
           events_fano_burstiness(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
          .toPandas())
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("hr").size()
        full = counts.reindex(
            range(int(counts.index.min()), int(counts.index.max()) + 1),
            fill_value=0).to_numpy(dtype=float)
        ref = np.var(full) / np.mean(full)  # population variance
        # the query emits floor(ref * 1000) via exact integer sums
        assert abs(got[et].fano_milli - math.floor(ref * 1000)) <= 1, (
            f"{et}: spark {got[et].fano_milli} vs numpy {ref * 1000}")


def test_psi_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        N_PSI_BINS, PSI_SMOOTH_K, doc_length_drift_psi)
    got = {r.source: r.psi
           for r in doc_length_drift_psi(spark, sf_small).collect()}
    docs = (load_table(spark, sf_small, "documents")
            .select("source", "n_chars").toPandas())
    mn, mx = docs.n_chars.min(), docs.n_chars.max()
    bins = np.minimum(
        N_PSI_BINS - 1,
        np.floor((docs.n_chars.astype(float) - mn) * N_PSI_BINS
                 / (mx - mn))).astype(int)
    docs = docs.assign(bin=bins)
    corpus = docs.groupby("bin").size().reindex(
        range(N_PSI_BINS), fill_value=0).to_numpy()
    n = corpus.sum()
    K, B = PSI_SMOOTH_K, N_PSI_BINS
    for src, grp in docs.groupby("source"):
        ca = grp.groupby("bin").size().reindex(
            range(N_PSI_BINS), fill_value=0).to_numpy()
        na = ca.sum()
        pa = (ca * K + 1) / (na * K + B)
        pb = (corpus * K + 1) / (n * K + B)
        # the query floors each term to nano units before summing
        ref = np.floor((pa - pb) * np.log(pa / pb) * 1e9).sum() / 1e9
        assert math.isclose(got[src], round(ref, 6), abs_tol=2e-6), (
            f"{src}: spark {got[src]} vs numpy {ref}")


def test_entropy_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.text import source_token_entropy
    got = {r.source: r for r in
           source_token_entropy(spark, sf_small).collect()}
    docs = (load_table(spark, sf_small, "documents")
            .select("source", "text").toPandas())
    toks = docs.assign(tok=docs.text.str.lower().str.split(" ")) \
        .explode("tok")
    for src, grp in toks.groupby("source"):
        counts = grp.groupby("tok").size().to_numpy(dtype=float)
        p = counts / counts.sum()
        ref_nano = int(np.floor(-p * np.log2(p) * 1e9).sum())
        assert got[src].entropy_nano == ref_nano
        assert got[src].vocab == len(counts)


def test_seasonal_index_matches_pandas(spark, sf_small):
    from impractical_impala_spark.queries.drift import orders_seasonal_index
    got = {r.month_of_year: r for r in
           orders_seasonal_index(spark, sf_small).collect()}
    orders = (load_table(spark, sf_small, "orders")
              .select("o_orderdate", "o_totalprice").toPandas())
    orders["mkey"] = (orders.o_orderdate.dt.year * 12
                      + orders.o_orderdate.dt.month - 1)
    orders["cents"] = np.floor(orders.o_totalprice * 100).astype(np.int64)
    monthly = orders.groupby("mkey").cents.sum()
    dense = monthly.reindex(
        range(int(monthly.index.min()), int(monthly.index.max()) + 1),
        fill_value=0)
    sum12 = dense.rolling(12).sum()
    ref = {}
    for i, (mkey, c) in enumerate(dense.items()):
        if i < 11 or sum12.loc[mkey] <= 0:
            continue
        moy = mkey % 12 + 1
        ref.setdefault(moy, []).append(
            int(c) * 12_000_000 // int(sum12.loc[mkey]))
    for moy, ratios in ref.items():
        assert got[moy].n_months == len(ratios)
        assert got[moy].seasonal_index_ppm == sum(ratios) // len(ratios)


# ------------------------------------------------ wave-3/4 references


def test_cusum_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        HOUR_NS, events_cusum_changepoint)
    got = {r.event_type: r for r in
           events_cusum_changepoint(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
          .toPandas())
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("hr").size()
        full = counts.reindex(
            range(int(counts.index.min()), int(counts.index.max()) + 1),
            fill_value=0).to_numpy(dtype=np.int64)
        n = len(full)
        cum = np.cumsum(full)
        t = np.arange(1, n + 1, dtype=np.int64)
        s = np.abs(n * cum - t * int(full.sum()))
        assert got[et].cusum_scaled == int(s.max())
        # earliest argmax hour
        assert got[et].cp_hr == int(counts.index.min()) + int(np.argmax(s))


def test_mw_auc_matches_naive_numpy(spark, sf_small):
    """Independent O(nA*nB)-free reference: AUC over the QUANTIZED bin
    values computed with the naive per-value comparison counts (wins +
    half-ties), not the cum-bin identity the query uses."""
    from impractical_impala_spark.queries.drift import (
        N_KS_BINS, events_mw_rank_drift)
    got = {r.event_type: r for r in
           events_mw_rank_drift(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", "ts_ns", "value").toPandas())
    mn, mx = ev.value.min(), ev.value.max()
    mid = (int(ev.ts_ns.min()) + int(ev.ts_ns.max())) // 2
    bins = np.minimum(N_KS_BINS - 1, np.floor(
        (ev.value.to_numpy() - mn) * N_KS_BINS / (mx - mn))).astype(np.int64)
    ev = ev.assign(bin=bins, early=(ev.ts_ns <= mid))
    for et, grp in ev.groupby("event_type"):
        a = np.sort(grp[grp.early].bin.to_numpy())
        b = np.sort(grp[~grp.early].bin.to_numpy())
        # for each late value: #early strictly below + 0.5 * #early tied
        lo = np.searchsorted(a, b, side="left")
        hi = np.searchsorted(a, b, side="right")
        u2 = int((lo + hi).sum())  # = 2 * (wins + ties/2)
        assert got[et].u2 == u2, (et, got[et].u2, u2)
        ref = u2 / (2.0 * len(a) * len(b))
        assert math.isclose(got[et].auc_late_gt_early, round(ref, 6),
                            abs_tol=1e-9)


def test_benford_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.profiling import (
        benford_digit_profile)
    got = {r.digit: r for r in
           benford_digit_profile(spark, sf_small).collect()}
    o = load_table(spark, sf_small, "orders").select("o_totalprice") \
        .toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    cents = cents[cents > 0]
    digits = np.array([int(str(c)[0]) for c in cents])
    n = len(digits)
    for d in range(1, 10):
        k = int((digits == d).sum())
        if k == 0:
            assert d not in got
            continue
        assert got[d].n_orders == k
        assert got[d].obs_ppm == k * 1_000_000 // n
        assert got[d].exp_ppm == round(math.log10(1 + 1 / d) * 1_000_000)


def test_wilson_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.profiling import (
        part_return_rate_wilson)
    rows = part_return_rate_wilson(spark, sf_small).collect()
    assert rows
    for r in rows:
        k, n = r.n_returned, r.n_items
        ph, z2 = k / n, 3.8416
        ref = (ph + z2 / (2 * n)
               - 1.96 * math.sqrt((ph * (1 - ph) + z2 / (4 * n)) / n)) \
            / (1 + z2 / n)
        assert math.isclose(r.wilson_lb, round(ref, 6), abs_tol=1e-9)
        # the bound shrinks toward zero and never exceeds the naive rate
        assert r.wilson_lb <= k / n + 1e-12


def test_theilsen_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.profiling import (
        nation_theilsen_trend)
    got = {r.n_name: r for r in
           nation_theilsen_trend(spark, sf_small).collect()}
    orders = (load_table(spark, sf_small, "orders")
              .join(F.broadcast(load_table(spark, sf_small, "customer")
                                .select("c_custkey", "c_nationkey")),
                    F.col("o_custkey") == F.col("c_custkey"))
              .join(F.broadcast(load_table(spark, sf_small, "nation")
                                .select("n_nationkey", "n_name")),
                    F.col("c_nationkey") == F.col("n_nationkey"))
              .select("n_name", "o_orderdate", "o_totalprice").toPandas())
    orders["mkey"] = (pd.to_datetime(orders.o_orderdate).dt.year * 12
                      + pd.to_datetime(orders.o_orderdate).dt.month)
    orders["cents"] = np.floor(orders.o_totalprice * 100).astype(np.int64)
    for name, grp in orders.groupby("n_name"):
        m = grp.groupby("mkey").cents.sum().sort_index()
        keys, vals = m.index.to_numpy(), m.to_numpy()
        slopes = []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                num = int(vals[j] - vals[i]) * 1000
                den = int(keys[j] - keys[i])
                # Spark div / DuckDB // truncate toward zero
                slopes.append((int(num / den), keys[i], keys[j]))
        slopes.sort()
        lower_median = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert got[name].n_pairs == len(slopes)
        assert got[name].theilsen_slope_milli == lower_median, name


def test_spearman_matches_pandas_midranks(spark, sf_small):
    """Independent reference: pandas rank(method='average') supplies
    the midranks (vs the query's marginal-histogram identity), pushed
    through the same ppm quantization, then plain np.corrcoef."""
    from impractical_impala_spark.queries.quality import (
        N_SP_BINS, lineitem_spearman_corr)
    got = {r.l_returnflag: r for r in
           lineitem_spearman_corr(spark, sf_small).collect()}
    li = load_table(spark, sf_small, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity").toPandas()
    cents = np.floor(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    mn, mx = cents.min(), cents.max()
    li["pbin"] = np.minimum(N_SP_BINS - 1,
                            (cents - mn) * N_SP_BINS // (mx - mn))
    li["qv"] = np.floor(li.l_quantity).astype(np.int64)
    for flag, grp in li.groupby("l_returnflag"):
        n = len(grp)
        mx2 = (2 * grp.pbin.rank(method="average")).astype(np.int64)
        my2 = (2 * grp.qv.rank(method="average")).astype(np.int64)
        xp = mx2.to_numpy() * 500_000 // n
        yp = my2.to_numpy() * 500_000 // n
        ref = np.corrcoef(xp, yp)[0, 1]
        assert math.isclose(got[flag].spearman_rho, round(ref, 6),
                            abs_tol=2e-6), (flag, got[flag].spearman_rho, ref)


def test_bootstrap_matches_numpy(spark, sf_small):
    """Recompute the replicate means and SE in numpy from the same
    integer mix — independent accumulation path (python ints vs
    distributed partial aggregates)."""
    from impractical_impala_spark.queries.quality import (
        BOOT_R, _M31, _KNUTH, _pois_cum, orders_bootstrap_ci)
    got = {r.n_name: r for r in
           orders_bootstrap_ci(spark, sf_small).collect()}
    fact = (load_table(spark, sf_small, "orders")
            .join(F.broadcast(load_table(spark, sf_small, "customer")
                              .select("c_custkey", "c_nationkey")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(load_table(spark, sf_small, "nation")
                              .select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("o_orderkey", "n_name", "o_totalprice").toPandas())
    fact["cents"] = np.floor(fact.o_totalprice * 100).astype(np.int64)
    cuts = np.array(_pois_cum)
    for name, grp in fact.groupby("n_name"):
        keys = grp.o_orderkey.to_numpy(dtype=np.int64)
        cents = grp.cents.to_numpy(dtype=np.int64)
        means = []
        # numpy twin of the r7 xorshift-mixed generator (quality._SPARK_U)
        h1 = (keys % _M31) * _KNUTH % _M31
        m1 = h1 ^ (h1 >> 13)
        for r in range(BOOT_R):
            h2 = ((m1 + r) * _KNUTH) % _M31
            m2 = h2 ^ (h2 >> 7)
            h3 = (m2 * _KNUTH) % _M31
            u = (h3 ^ (h3 >> 13)) % 1_000_000
            w = np.searchsorted(cuts, u, side="right")
            sw = int(w.sum())
            if sw > 0:
                means.append(int((w * cents).sum()) // sw)
        m = np.array(means, dtype=np.int64)
        R = len(m)
        var = (R * int((m * m).sum()) - int(m.sum()) ** 2) / (R * (R - 1))
        assert got[name].n_replicates == R
        assert got[name].boot_se_cents == round(math.sqrt(var), 2), name


def test_kanon_matches_pandas(spark, sf_small):
    from impractical_impala_spark.queries.quality import (
        KANON_K, privacy_kanon_audit)
    got = privacy_kanon_audit(spark, sf_small).collect()[0]
    orders = (load_table(spark, sf_small, "orders")
              .join(F.broadcast(load_table(spark, sf_small, "customer")
                                .select("c_custkey", "c_nationkey")),
                    F.col("o_custkey") == F.col("c_custkey"))
              .select("c_nationkey", "o_orderdate", "o_orderpriority",
                      "o_orderstatus").toPandas())
    orders["yr"] = pd.to_datetime(orders.o_orderdate).dt.year
    g = orders.groupby(["c_nationkey", "yr", "o_orderpriority"])
    sizes = g.size()
    ldivs = g.o_orderstatus.nunique()
    assert got.n_rows == len(orders)
    assert got.n_classes == len(sizes)
    assert got.k_anonymity == int(sizes.min())
    assert got.l_diversity == int(ldivs.min())
    assert got.classes_below_k == int((sizes < KANON_K).sum())
    assert got.rows_below_k == int(sizes[sizes < KANON_K].sum())


def test_pca_power_matches_eigh(spark, sf_small):
    """The fixed-point iterate must align with numpy's true dominant
    eigenvector of the float second-moment matrix (|cos| > 0.999) and
    the integer Rayleigh quotient must sit within the quantization
    envelope of the true lambda_max / max|S| ratio — an independent
    check that the PCA_ITERS (128) integer iterations actually
    CONVERGE, not just that both engines run the same loop."""
    from impractical_impala_spark.queries.ml_more import (
        Q_SCALE, emb_pca_power)
    out = emb_pca_power(spark, sf_small).toPandas().sort_values("dim_idx")
    emb = load_table(spark, sf_small, "embeddings").select("embedding") \
        .toPandas()
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    xq = np.floor(x * Q_SCALE)
    S = xq.T @ xq
    vals, vecs = np.linalg.eigh(S)
    top = vecs[:, -1]
    v = out.loading_q.to_numpy(dtype=np.float64)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    ray_true = vals[-1] / np.abs(S).max()
    got_ray = out.rayleigh_ppm.iloc[0] / 1_000_000
    assert abs(got_ray - ray_true) < 0.01 * max(1.0, ray_true), (
        got_ray, ray_true)
