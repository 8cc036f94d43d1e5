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


def test_driver_window_holds_round3_targets():
    """The correctness driver checks the FIRST 50 entries of queries().
    Round 3's window must contain every query that has never had a
    driver CORRECTNESS row (the round-2 additions) plus everything
    changed or added in round 3 — the rotation contract from
    queries/__init__.py."""
    from impractical_impala_spark.queries import NEVER_CHECKED_R2, NEW_R3, WINDOW

    first50 = list(e.queries())[:50]
    assert len(WINDOW) == 50
    assert first50 == WINDOW
    for name in NEVER_CHECKED_R2 + NEW_R3 + ["dedup_ngram_jaccard"]:
        assert name in first50, f"{name} fell out of the driver window"
