"""Results must not depend on the physical partitioning: the same query
at 4 and at 64 shuffle partitions has to produce identical rows. This is
the determinism property that makes the engine's answers stable across
cluster sizes — any hidden dependence on partition order (nondeterministic
window ties, first()/last() without ordering) shows up here."""

import pytest

from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

# one representative per risk class: window ranking, floating-point agg,
# pair-generation self-join, LOCF as-of carry
CASES = ["w3_top1_per_group", "q5_revenue_by_nation",
         "dedup_minhash_lsh", "q_asof_attribution"]


def _value_hash(df):
    cols = sorted(df.columns)
    h = (df.select(F.xxhash64(*[F.col(c).cast("string") for c in cols])
                   .alias("h"))
         .agg(F.sum("h").alias("s")).collect()[0]["s"])
    return h, df.count()


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_to_shuffle_partitions(spark, sf_small, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = _value_hash(_Q[name].build(spark, sf_small))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = _value_hash(_Q[name].build(spark, sf_small))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.catalog.clearCache()
    assert a == b
