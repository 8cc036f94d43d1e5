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


def test_driver_window_holds_round9_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 9's window must lead with the 15 never-driver-checked
    late-r8 registrations (VERDICT r8 ask #1), then the plans changed
    this round (graph_kcore_summary's first HASH row among them), then
    any new r9 queries (first exposure evicts re-proof slots), then
    the oldest-evidence re-proof queue — note the r8 waves filled all
    50 r8 slots, so the ENTIRE stale-r3 cohort waited for this fill.
    Contract from queries/__init__.py."""
    from impractical_impala_spark.queries import (
        CHANGED_R9, NEVER_CHECKED_R9, NEW_R9, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEVER_CHECKED_R9)] == NEVER_CHECKED_R9
    for name in NEVER_CHECKED_R9 + CHANGED_R9 + NEW_R9:
        assert name in first50, f"{name} fell out of the driver window"
