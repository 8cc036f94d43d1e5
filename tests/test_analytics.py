"""Semantic invariants for the product-analytics operators
(queries/analytics.py) beyond oracle parity: monotonicity of the
funnel and the cumulative-user curve, and retention-triangle bounds.
"""

import os

from pyspark.sql import functions as F

from impractical_impala_spark.queries.analytics import (
    events_cohort_retention, events_cumulative_users, events_funnel,
    events_gapfill_locf)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_funnel_monotone(spark):
    row = events_funnel(spark, SF_DIR).collect()[0]
    assert row.n_viewed >= row.n_clicked >= row.n_purchased
    assert row.n_viewed > 0


def test_cumulative_users_monotone(spark):
    rows = events_cumulative_users(spark, SF_DIR).orderBy("day").collect()
    assert rows, "no days"
    assert all(r.new_users > 0 for r in rows)  # a day only appears via a first-touch
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    # running sum of new == cumulative, and the final point is the
    # total distinct-user count
    assert cums[-1] == sum(r.new_users for r in rows)


def test_gapfill_dense_spine_and_locf(spark):
    rows = events_gapfill_locf(spark, SF_DIR).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for typ, series in by_type.items():
        series.sort(key=lambda r: r.hr)
        hrs = [r.hr for r in series]
        assert hrs == list(range(hrs[0], hrs[-1] + 1)), f"{typ} spine has holes"
        last_obs = None
        for r in series:
            if r.is_gap:
                assert r.n_events == 0
                assert r.sum_value_locf == last_obs  # carried forward
            else:
                assert r.n_events > 0
                last_obs = r.sum_value_locf
        assert series[0].is_gap == 0  # spine starts at first observation


def test_cohort_retention_bounds(spark):
    rows = events_cohort_retention(spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0  # activity can't precede first touch
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    for cohort, offs in by_cohort.items():
        assert 0 in offs, f"cohort {cohort} missing its own week"
        # week-0 count is the cohort size; later weeks can't exceed it
        assert all(n <= offs[0] for n in offs.values())


def test_time_weighted_avg_bounded(spark):
    from impractical_impala_spark.queries.analytics import (
        events_time_weighted_avg)
    from impractical_impala_spark.sources import load_table
    rows = events_time_weighted_avg(spark, SF_DIR).collect()
    assert rows
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.event_type]
        # a convex combination of observed values stays inside them
        assert lo <= r.twa_value <= hi
        assert r.n_segments > 0


def test_heavy_hitters_batch_size_invariant(spark):
    """The candidate pass runs per Arrow batch; the pigeonhole superset
    guarantee means the FINAL answer must not depend on how the corpus
    is batched. Shrinking maxRecordsPerBatch 10000 -> 37 reshapes every
    local threshold; the confirmed output must be identical."""
    from impractical_impala_spark.queries.training_ops import (
        text_heavy_hitters)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    orig = spark.conf.get(key)
    a = sorted(map(tuple, text_heavy_hitters(spark, SF_DIR).collect()))
    try:
        spark.conf.set(key, "37")
        b = sorted(map(tuple, text_heavy_hitters(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, orig)
    assert a == b
    assert a  # fixture has heavy hitters


def test_rolling_active_users_bounds(spark):
    from impractical_impala_spark.queries.analytics import (
        events_rolling_active_users)
    from impractical_impala_spark.sources import load_table
    wau = {r.day_idx: r.wau for r in
           events_rolling_active_users(spark, SF_DIR).collect()}
    assert wau
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts_ns div 86400000000000").alias("d"))
    dau = {r.d: r.n for r in ev.distinct().groupBy("d")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    total_users = ev.select("user_id").distinct().count()
    for d, n in wau.items():
        # trailing-window distinct is sandwiched between the day's own
        # distinct count and the whole population
        assert dau.get(d, 0) <= n <= total_users
    # a 7-day window covering the full span must see every user
    assert max(wau.values()) <= total_users
