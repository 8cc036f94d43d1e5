"""Round-7 scale invariants: every statistic must behave as theory
predicts when the corpus is replicated k-fold (same distribution, k x
the rows). Exact invariants assert frame equality; statistical ones
assert the predicted scaling law. This is the strongest scale evidence
the sandbox allows: a kernel whose decomposition secretly depended on
row count (an int64 wrap, a non-scaling division, an order-dependent
float) fails these, while engine parity alone would not catch it."""

import math
import os

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table

_Q = all_queries()

K = 4
OFF = 10_000_000


@pytest.fixture(scope="module")
def sf_inflated(spark, sf_small, tmp_path_factory):
    """A K-fold replica of the sf0.001 fixture dir: events and
    lineitem rows duplicate with shifted ids (same ts/type/value
    distribution); the other tables copy through unchanged."""
    out = str(tmp_path_factory.mktemp("sf_inflated"))
    rep = F.explode(F.expr(f"sequence(0, {K - 1})")).alias("rep")

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    (ev.select("*", rep)
     .withColumn("event_id", F.col("event_id") + F.col("rep") * OFF)
     .withColumn("user_id", F.col("user_id") + F.col("rep") * OFF)
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    (li.select("*", rep).drop("rep")
     .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "documents", "embeddings"]:
        (spark.read.parquet(f"{sf_small}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    return out


def _rows(name, spark, d):
    return sorted(map(tuple, _Q[name].build(spark, d).collect()))


# ------------------------------------------------- exact invariants

def test_mann_kendall_exact_invariant(spark, sf_small, sf_inflated):
    """Sign pattern and tie pattern of K-scaled daily cents are
    identical — the whole output row is unchanged."""
    name = "events_mann_kendall"
    assert _rows(name, spark, sf_small) == _rows(name, spark, sf_inflated)


def test_drift_monitor_ks_exact_invariant(spark, sf_small, sf_inflated):
    """Integer ppm ECDFs: floor((K*cum*1e6)/(K*n)) == floor(cum*1e6/n),
    so every ks_ppm is bit-identical while the counts scale by K."""
    base = {(r.event_type, r.day): r for r in
            _Q["events_drift_monitor"].build(spark, sf_small).collect()}
    big = {(r.event_type, r.day): r for r in
           _Q["events_drift_monitor"].build(spark, sf_inflated).collect()}
    assert set(base) == set(big)
    for k, b in base.items():
        g = big[k]
        assert g.ks_ppm == b.ks_ppm, k
        assert g.is_reference == b.is_reference
        assert (g.n_ref, g.n_batch) == (K * b.n_ref, K * b.n_batch)


def test_lag_quantiles_exact_invariant(spark, sf_small, sf_inflated):
    """First-crossing quantiles compare K*cum against K*n — the scale
    cancels exactly; only n grows."""
    base = {r.o_orderpriority: r for r in
            _Q["order_ship_lag_quantiles"].build(spark, sf_small).collect()}
    big = {r.o_orderpriority: r for r in
           _Q["order_ship_lag_quantiles"].build(spark,
                                                sf_inflated).collect()}
    for p, b in base.items():
        g = big[p]
        assert g.n == K * b.n
        assert (g.p50_d, g.p90_d, g.p99_d) == (b.p50_d, b.p90_d, b.p99_d)


def test_kaplan_meier_invariant(spark, sf_small, sf_inflated):
    """Replicated users churn in proportion: at-risk/churned/censored
    scale exactly by K and survival is unchanged (to the 1e-6 round)."""
    base = {r.lifetime_d: r for r in
            _Q["users_kaplan_meier"].build(spark, sf_small).collect()}
    big = {r.lifetime_d: r for r in
           _Q["users_kaplan_meier"].build(spark, sf_inflated).collect()}
    assert set(base) == set(big)
    for t, b in base.items():
        g = big[t]
        assert (g.n_risk, g.n_churned, g.n_censored) == (
            K * b.n_risk, K * b.n_churned, K * b.n_censored)
        assert abs(g.survival - b.survival) <= 2e-6, t


def test_session_allocation_scales_exactly(spark, sf_small, sf_inflated):
    """K user replicas produce K identical session sets: per-hour
    counts and seconds scale exactly by K."""
    base = {r.hour_of_day: r for r in
            _Q["session_hour_allocation"].build(spark, sf_small).collect()}
    big = {r.hour_of_day: r for r in
           _Q["session_hour_allocation"].build(spark, sf_inflated).collect()}
    assert set(base) == set(big)
    for h, b in base.items():
        g = big[h]
        assert g.n_session_hours == K * b.n_session_hours
        assert g.total_seconds == K * b.total_seconds


# --------------------------------------------- statistical scalings

def test_welch_t_scales_sqrt_k(spark, sf_small, sf_inflated):
    """Same means, same variances, K x the samples: |t| grows ~sqrt(K)
    and the means are unchanged exactly (integer division of scaled
    sums)."""
    base = {r.event_type: r for r in
            _Q["events_welch_ttest"].build(spark, sf_small).collect()}
    big = {r.event_type: r for r in
           _Q["events_welch_ttest"].build(spark, sf_inflated).collect()}
    for t, b in base.items():
        g = big[t]
        assert g.n_early == K * b.n_early and g.n_late == K * b.n_late
        assert g.mean_early_centi == b.mean_early_centi
        assert g.mean_late_centi == b.mean_late_centi
        if abs(b.t_stat) > 0.2:
            ratio = g.t_stat / b.t_stat
            assert abs(ratio - math.sqrt(K)) < 0.03 * math.sqrt(K), (t, ratio)


def test_share_ztest_scales_sqrt_k(spark, sf_small, sf_inflated):
    base = {r.event_type: r for r in
            _Q["events_share_ztest"].build(spark, sf_small).collect()}
    big = {r.event_type: r for r in
           _Q["events_share_ztest"].build(spark, sf_inflated).collect()}
    for t, b in base.items():
        g = big[t]
        assert g.share_early_ppm == b.share_early_ppm
        assert g.share_late_ppm == b.share_late_ppm
        if abs(b.z_share) > 0.2:
            ratio = g.z_share / b.z_share
            assert abs(ratio - math.sqrt(K)) < 0.03 * math.sqrt(K), (t, ratio)


def test_jsd_invariant_under_replication(spark, sf_small, sf_inflated):
    """Histogram proportions are unchanged, so the divergence is."""
    base = {r.event_type: r.jsd_nats for r in
            _Q["events_jsd_drift"].build(spark, sf_small).collect()}
    big = {r.event_type: r.jsd_nats for r in
           _Q["events_jsd_drift"].build(spark, sf_inflated).collect()}
    for t in base:
        assert abs(base[t] - big[t]) <= 2e-6, t


def test_kendall_tau_invariant_under_replication(spark, sf_small,
                                                 sf_inflated):
    """Concordance proportions are preserved (C, D scale by K^2); the
    -1 terms in the tie denominators shift tau only O(1/n)."""
    base = {r.l_returnflag: r for r in
            _Q["lineitem_kendall_tau"].build(spark, sf_small).collect()}
    big = {r.l_returnflag: r for r in
           _Q["lineitem_kendall_tau"].build(spark, sf_inflated).collect()}
    for f, b in base.items():
        g = big[f]
        assert g.concordant == K * K * b.concordant
        assert g.discordant == K * K * b.discordant
        assert abs(g.tau_b - b.tau_b) < 2e-3, f


def test_lmoments_invariant_under_replication(spark, sf_small, sf_inflated):
    """L-moment ratios are distribution properties: K-fold replication
    moves them only O(1/n)."""
    base = {r.l_returnflag: r for r in
            _Q["lineitem_lmoments"].build(spark, sf_small).collect()}
    big = {r.l_returnflag: r for r in
           _Q["lineitem_lmoments"].build(spark, sf_inflated).collect()}
    for f, b in base.items():
        g = big[f]
        assert g.n == K * b.n
        assert abs(g.l_cv - b.l_cv) < 1e-3, f
        assert abs(g.l_skew - b.l_skew) < 2e-3, f


def test_ols_invariant_under_replication(spark, sf_small, sf_inflated):
    """The normal equations scale linearly (Cramer determinants by
    K^3), so betas and R^2 are replication-invariant."""
    base = {r.l_returnflag: r for r in
            _Q["lineitem_price_ols"].build(spark, sf_small).collect()}
    big = {r.l_returnflag: r for r in
           _Q["lineitem_price_ols"].build(spark, sf_inflated).collect()}
    for f, b in base.items():
        g = big[f]
        assert g.n == K * b.n
        assert abs(g.beta_per_qty_cents - b.beta_per_qty_cents) <= 0.01
        assert abs(g.beta_per_disc_bp_cents
                   - b.beta_per_disc_bp_cents) <= 0.01
        assert abs(g.r2 - b.r2) <= 2e-6, f


def test_assortativity_invariant_under_edge_duplication(spark, sf_small,
                                                        sf_inflated):
    """lineitem duplicates carry the SAME (cust, supp) pairs — the
    distinct edge set is unchanged, so the statistic is bit-stable."""
    b = _Q["graph_degree_assortativity"].build(spark, sf_small).collect()[0]
    g = _Q["graph_degree_assortativity"].build(spark,
                                               sf_inflated).collect()[0]
    assert (g.n_edges, g.n_customers, g.n_suppliers) == (
        b.n_edges, b.n_customers, b.n_suppliers)
    assert g.assortativity == b.assortativity
