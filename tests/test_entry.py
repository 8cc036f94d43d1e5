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


def test_driver_window_holds_round6_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 6's window must lead with the new first-exposure queries,
    then the two semantically-changed plans, then the 42 queries whose
    latest driver row was r1/r2-era — the rotation contract from
    queries/__init__.py."""
    from impractical_impala_spark.queries import (
        _EVICTED_TO_R7, CHANGED_R6, NEW_R6, NEW_R6B, STALE_R1R2, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEW_R6)] == NEW_R6
    for name in NEW_R6 + NEW_R6B + CHANGED_R6[:2]:
        assert name in first50, f"{name} fell out of the driver window"
    # every stale row not explicitly deferred to r7 gets its re-proof
    for name in STALE_R1R2:
        if name not in _EVICTED_TO_R7:
            assert name in first50, f"{name} fell out of the driver window"
