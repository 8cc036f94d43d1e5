"""Replica scale-up invariants for the round-5 drift/quality kernels:
each statistic has an exact mathematical behavior under corpus
replication, and the SAME plan over the inflated frame must reproduce
it — the direct evidence that the decomposition survives growth instead
of silently changing answers.

- KS drift: replicating every event k-fold leaves both ECDFs (and so
  ks_ppm/ks_d) IDENTICAL while n_a/n_b scale by k.
- audience overlap: k-fold user replication (fresh ids, same type
  sets) scales n_a/n_b/n_both by k and leaves jaccard_ppm identical.
- churn hazard: same user replication scales n_churned/n_at_risk by k
  and leaves hazard_ppm identical.
- weighted median: k-fold row replication scales total_weight by k and
  leaves the median bin (and its bound) identical.
"""

from pyspark.sql import functions as F

from impractical_impala_spark.queries.drift import ks_drift_frame
from impractical_impala_spark.queries.quality import (
    hazard_frame, overlap_frame, weighted_median_frame)
from impractical_impala_spark.sources import load_table

K = 4
OFF = 10_000_000


def _replicate(df, k: int, bump=None):
    big = df.select(
        "*", F.explode(F.expr(f"sequence(0, {k - 1})")).alias("rep"))
    if bump:
        big = big.withColumn(bump, F.col(bump) + F.col("rep") * OFF)
    return big.drop("rep")


def test_ks_drift_invariant_under_replication(spark, sf_small):
    ev = load_table(spark, sf_small, "events").select(
        "event_type", "ts_ns", "value")
    base = {r.event_type: r for r in ks_drift_frame(ev).collect()}
    big = {r.event_type: r for r in
           ks_drift_frame(_replicate(ev, K)).collect()}
    assert set(base) == set(big)
    for et, b in base.items():
        g = big[et]
        assert (g.n_a, g.n_b) == (K * b.n_a, K * b.n_b)
        assert g.ks_ppm == b.ks_ppm and g.ks_d == b.ks_d


def test_overlap_counts_scale_jaccard_invariant(spark, sf_small):
    ev = load_table(spark, sf_small, "events").select(
        "user_id", "event_type")
    base = {(r.type_a, r.type_b): r for r in overlap_frame(ev).collect()}
    big = {(r.type_a, r.type_b): r for r in
           overlap_frame(_replicate(ev, K, bump="user_id")).collect()}
    assert set(base) == set(big)
    for key, b in base.items():
        g = big[key]
        assert (g.n_a, g.n_b, g.n_both) == \
            (K * b.n_a, K * b.n_b, K * b.n_both)
        assert g.jaccard_ppm == b.jaccard_ppm


def test_hazard_counts_scale_rate_invariant(spark, sf_small):
    ev = load_table(spark, sf_small, "events").select("user_id", "ts_ns")
    base = {r.lifetime_d: r for r in hazard_frame(ev).collect()}
    big = {r.lifetime_d: r for r in
           hazard_frame(_replicate(ev, K, bump="user_id")).collect()}
    assert set(base) == set(big)
    for d, b in base.items():
        g = big[d]
        assert (g.n_churned, g.n_at_risk) == \
            (K * b.n_churned, K * b.n_at_risk)
        assert g.hazard_ppm == b.hazard_ppm


def test_weighted_median_bin_invariant_under_replication(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_returnflag", "l_extendedprice",
        F.col("l_quantity").cast("long").alias("w"))
    base = {r.l_returnflag: r for r in
            weighted_median_frame(li).collect()}
    big = {r.l_returnflag: r for r in
           weighted_median_frame(_replicate(li, K)).collect()}
    assert set(base) == set(big)
    for flag, b in base.items():
        g = big[flag]
        assert g.total_weight == K * b.total_weight
        assert g.median_bin == b.median_bin
        assert g.median_lo_cents == b.median_lo_cents
