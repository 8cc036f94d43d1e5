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


def test_driver_window_holds_round8_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 8's window must lead with the 12 never-driver-checked
    queries (VERDICT r7 ask #1 + the two new r8 operators), then the
    four changed plans, then every mid-round-8 wave query (standing
    discipline: first exposure evicts re-proof slots), then the oldest
    r3-era re-proofs that still fit — the contract from
    queries/__init__.py."""
    from impractical_impala_spark.queries import (
        CHANGED_R8, NEVER_CHECKED_R8, NEW_R8_WAVES, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEVER_CHECKED_R8)] == NEVER_CHECKED_R8
    for name in NEVER_CHECKED_R8 + CHANGED_R8 + NEW_R8_WAVES:
        assert name in first50, f"{name} fell out of the driver window"
