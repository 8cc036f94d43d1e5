"""Bucketed tables: co-located joins with no shuffle — the lever for
repeated large-fact joins at lake scale (pre-shuffle once at write
time, join forever without an Exchange)."""

import pytest

from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_small, tmp_path_factory):
    """Write orders and lineitem bucketed by the join key."""
    for name, key, n in [("orders", "o_orderkey", 8), ("lineitem", "l_orderkey", 8)]:
        (
            load_table(spark, sf_small, name)
            .write.mode("overwrite")
            .bucketBy(n, key).sortBy(key)
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    # disable auto-broadcast so the join would otherwise sort-merge+shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketing satisfies the join's distribution: no Exchange below the join
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, warehouse, sf_small):
    li_b = spark.table("b_lineitem")
    o_b = spark.table("b_orders")
    got = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderpriority").count().collect()
    )
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").count().collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
