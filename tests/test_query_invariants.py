"""Global invariants over the registered query set: every query must
return rows at the driver's correctness scale (an accidentally-empty
result passes any order-insensitive compare and proves nothing)."""

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


@pytest.mark.parametrize("name", sorted(_Q))
def test_query_returns_rows(name, spark, sf_oracle):
    df = _Q[name].build(spark, sf_oracle)
    assert df.limit(1).count() > 0, f"{name} returned 0 rows at sf0.01"


def test_all_queries_have_unique_output_columns(spark, sf_oracle):
    for name, q in _Q.items():
        cols = q.build(spark, sf_oracle).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
