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
