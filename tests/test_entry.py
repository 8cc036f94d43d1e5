"""Driver-contract smoke tests."""

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_queries_and_oracles_consistent():
    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs)
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_driver_window_holds_round5_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 5's window must lead with the eight late-r4 queries that have
    never had a driver row, then the stale re-proofs (q_approx_* and the
    resampled/rewritten ann_ivf_trained), then every round-5 addition —
    the rotation contract from queries/__init__.py."""
    from impractical_impala_spark.queries import (
        DRIFT_R5, LATE_R5, NEVER_CHECKED_R4, NEW_R5, STALE_REPROOF, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEVER_CHECKED_R4)] == NEVER_CHECKED_R4
    for name in (NEVER_CHECKED_R4 + STALE_REPROOF + NEW_R5 + LATE_R5
                 + DRIFT_R5):
        assert name in first50, f"{name} fell out of the driver window"
