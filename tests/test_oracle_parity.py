"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

import pytest

from impractical_impala_spark.registry import all_queries

from .oracle_harness import assert_parity

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, sf_oracle):
    q = _QUERIES[name]
    df = q.build(spark, sf_oracle)
    if q.oracle is None:
        # rows-only contract: must run and be schema-stable
        assert df.columns
        df.limit(5).collect()
        return
    assert_parity(df, q.oracle, sf_oracle)
