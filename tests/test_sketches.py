"""Sketch aggregates must honor their error bounds against the exact
values — the accuracy contract that replaces an oracle for
approximate operators. (These are library functions, not registered
driver queries: engine-specific sketch values cannot hash-match a
cross-engine oracle, and the driver records no_oracle as a FAIL —
their registry twins are the exact-sketch reformulations
ndv_kmv_sketch / stats_histogram_*.)"""

from pyspark.sql import functions as F

from impractical_impala_spark.queries.sketches import (
    q_approx_distinct, q_approx_percentile)
from impractical_impala_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, sf_oracle):
    got = {r.l_returnflag: (r.approx_orders, r.approx_parts)
           for r in q_approx_distinct(spark, sf_oracle).collect()}
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {r.l_returnflag: (r.o, r.p)
             for r in li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("o"),
                  F.countDistinct("l_partkey").alias("p")).collect()}
    for k, (ao, ap) in got.items():
        eo, ep = exact[k]
        assert abs(ao - eo) <= 0.05 * eo, (k, ao, eo)
        assert abs(ap - ep) <= 0.05 * ep, (k, ap, ep)


def test_approx_percentile_close_to_exact(spark, sf_oracle):
    got = {r.l_returnflag: (r.approx_p50, r.approx_p90, r.approx_p99)
           for r in q_approx_percentile(spark, sf_oracle).collect()}
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {r.l_returnflag: r.ps
             for r in li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
                  .alias("ps")).collect()}
    for k, approx in got.items():
        for a, e in zip(approx, exact[k]):
            assert abs(a - e) <= 0.02 * abs(e) + 1e-9, (k, a, e)
