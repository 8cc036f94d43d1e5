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


def test_driver_window_is_the_computed_window():
    """The correctness driver checks the FIRST 50 entries of queries().
    Since round 11 the window is COMPUTED from the committed
    CORRECTNESS_r*.json history (never-driver-checked first, then
    latest-row-failed, then stalest-green) so an idle round can never
    re-spend slots on green rows — the r10 failure mode. The detailed
    ordering contract lives in tests/test_window_rotation.py; this
    smoke pins the entry shim to the same computed list."""
    from impractical_impala_spark.queries import WINDOW

    first50 = list(e.queries())[:50]
    assert first50 == WINDOW
    assert len(first50) == 50
