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
    Round 9's waves 11-20 made the first-exposure candidates exceed
    50 for the first time: the overflow tail rolls to
    NEVER_CHECKED_R10 (order preserved) instead of silently dropping.
    Contract from queries/__init__.py."""
    from impractical_impala_spark.queries import (
        CHANGED_R9, NEVER_CHECKED_R10, NEVER_CHECKED_R9, NEW_R9, WINDOW)

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW[:50]
    assert first50[:len(NEVER_CHECKED_R9)] == NEVER_CHECKED_R9
    for name in NEVER_CHECKED_R9 + CHANGED_R9:
        assert name in first50, f"{name} fell out of the driver window"
    for name in NEW_R9:
        assert name in first50 or name in NEVER_CHECKED_R10, (
            f"{name} neither in the r9 window nor the r10 overflow")
    # overflow preserves first-exposure order and covers exactly the
    # NEW_R9 tail that did not fit
    assert NEVER_CHECKED_R10 == [n for n in NEW_R9 if n not in first50]
