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


def test_driver_window_holds_round7_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 7's window must lead with the first-exposure queries, then
    the two changed plans (bootstrap PRNG values, neardup broadcast),
    then the 18 queries that close the r1/r2 rotation — the contract
    from queries/__init__.py."""
    from impractical_impala_spark.queries import (
        CHANGED_R7, FILL_R7, NEW_R7, STALE_R1R2_R7, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEW_R7)] == NEW_R7
    for name in NEW_R7 + CHANGED_R7 + STALE_R1R2_R7 + FILL_R7:
        assert name in first50, f"{name} fell out of the driver window"
