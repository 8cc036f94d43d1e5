"""Unit semantics of the connected-components operator."""

import pytest

from impractical_impala_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    out = connected_components(df, "a", "b", **kw)
    return {r.node: r.component for r in out.collect()}


def test_two_components_and_a_chain(spark):
    # component {1,2,3,4} as a chain (diameter 3) + triangle {10,11,12}
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_direction_and_duplicate_edges_are_normalized(spark):
    got = _cc(spark, [(5, 9), (9, 5), (5, 9), (9, 7)])
    assert got == {5: 5, 7: 5, 9: 5}


def test_raises_rather_than_returning_unconverged(spark):
    chain = [(i, i + 1) for i in range(1, 12)]  # diameter 11
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, chain, max_iter=2)
    # and converges fine with the default budget
    got = _cc(spark, chain)
    assert set(got.values()) == {1}
