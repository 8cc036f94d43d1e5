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


def test_components_match_union_find_on_random_graphs(spark):
    """Property: agree with a driver-side union-find on random graphs
    (deterministic seeds). Covers shapes propagation can get subtly
    wrong: self-loops, multi-edges, stars, disconnected singleton-free
    node sets."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n, m = 60, 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({v for e in edges for v in e})
        want = {v: find(v) for v in touched}
        # union-find roots are path-compressed mins per component only if
        # we always hang the larger root under the smaller (done above)
        got = _cc(spark, [(int(a), int(b)) for a, b in edges])
        assert got == want, f"seed {seed}"
