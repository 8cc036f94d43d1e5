"""Adversarial skew stress: the scale risk the sf fixtures cannot show.

A deliberately skewed replica (one hot key holding ~50% of all rows)
is pushed through (a) the naive hash-shuffle layout and (b) the salted
two-phase aggregation (operators/skew.py) and the AQE skew-join path.
The assertions are MEASURED straggler ratios — max rows landing on one
reduce partition / ideal share — not plan-shape prose: the naive
layout must demonstrably concentrate (the test proves the fixture is
actually adversarial), the salted layout must bound the spread, and
both must agree on results exactly.
"""

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.operators.skew import salted_agg

N_ROWS = 200_000
N_KEYS = 1_000
HOT_SHARE = 0.5          # hot key holds half of all rows
SHUFFLE_PARTS = 32
N_SALTS = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """event-like frame: key 0 owns ~50% of rows, rest uniform."""
    df = (spark.range(N_ROWS)
          .select(
              F.when(F.col("id") % 2 == 0, F.lit(0))
              .otherwise((F.col("id") % (N_KEYS - 1)) + 1).alias("key"),
              (F.col("id") % 997).cast("double").alias("value"))
          .cache())
    df.count()
    return df


def _partition_shares(df, parts=SHUFFLE_PARTS):
    """Rows per reduce partition after a hash shuffle on `key` — the
    same partitioning a groupBy('key') shuffle uses."""
    sizes = (df.repartition(parts, "key")
             .groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.count(F.lit(1)).alias("n"))
             .collect())
    total = sum(r.n for r in sizes)
    return [r.n / total for r in sizes]


def test_fixture_is_adversarial_and_salting_bounds_straggler(skewed):
    """Naive hash layout concentrates ~the hot share on one partition;
    the salted pre-aggregation's (key, salt) layout must cut the max
    partition share by >= 4x (with 16 salts the hot key's rows spread
    over 16 sub-groups)."""
    naive = max(_partition_shares(skewed))
    assert naive >= HOT_SHARE * 0.9, (
        f"fixture not adversarial: max share {naive:.3f}")

    salted = skewed.withColumn(
        "__salt", F.abs(F.hash("key", "value")) % N_SALTS)
    sizes = (salted.repartition(SHUFFLE_PARTS, "key", "__salt")
             .groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.count(F.lit(1)).alias("n"))
             .collect())
    total = sum(r.n for r in sizes)
    salted_max = max(r.n / total for r in sizes)
    assert salted_max <= naive / 4, (naive, salted_max)
    # and the spread is near-uniform: no partition above 3x ideal
    assert salted_max <= 3.0 / SHUFFLE_PARTS, salted_max


def test_salted_agg_exact_on_skewed_replica(skewed):
    """salted_agg == direct groupBy on the adversarial replica, for a
    decomposable aggregate set (count/sum/min/max) — cents-exact."""
    want = {r.key: r for r in
            (skewed.groupBy("key")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.floor(F.col("value") * 100).cast("long"))
                  .alias("cents"),
                  F.min("value").alias("mn"),
                  F.max("value").alias("mx"))).collect()}
    got = {r.key: r for r in salted_agg(
        skewed.withColumn("cents_in",
                          F.floor(F.col("value") * 100).cast("long")),
        ["key"],
        {"n": (F.count(F.lit(1)), F.sum("n")),
         "cents": (F.sum("cents_in"), F.sum("cents")),
         "mn": (F.min("value"), F.min("mn")),
         "mx": (F.max("value"), F.max("mx"))},
        n_salts=N_SALTS).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert (g.n, g.cents, g.mn, g.mx) == (w.n, w.cents, w.mn, w.mx), k


def test_aqe_skew_join_splits_hot_partition(spark, skewed):
    """Join the skewed fact to a mid-size dim through the AQE skew-join
    path: with spark.sql.adaptive skewJoin forced aggressive, the hot
    key's shuffle partition must be split into multiple tasks.
    Proven by the FINAL adaptive plan reporting SortMergeJoin(skew=true)
    with a skewed AQEShuffleRead AND the join returning exact rows.
    The plan must be read from the SAME QueryExecution that ran —
    count() spawns a derived plan, so the action here is collect()."""
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("attr"))
    conf = spark.conf
    saved = {
        "spark.sql.adaptive.skewJoin.enabled": conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "true"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            conf.get("spark.sql.adaptive.skewJoin."
                     "skewedPartitionThresholdInBytes", "256MB"),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
    }
    try:
        # force the skew machinery to engage at toy sizes, and disable
        # broadcast so the join actually shuffles both sides
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = skewed.join(dim, "key")
        rows = joined.collect()
        assert len(rows) == N_ROWS  # every fact row matches one dim row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:300]
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            conf.set(k, v)
