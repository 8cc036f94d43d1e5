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


# ----------------------------------------------- triangle operator
def test_triangle_count_matches_bruteforce_on_known_graphs(spark):
    """Degree-oriented wedge join == itertools brute force, including a
    hub graph where the naive edge-e-e join's per-key fanout explodes."""
    import itertools

    from impractical_impala_spark.queries.paths_stats import triangle_count

    cases = [
        [(1, 2), (2, 3), (1, 3)],                                  # 1
        [(1, 2), (2, 3), (3, 4)],                                  # 0
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (1, 4)],  # 2
        # star hub 0 + a rim cycle: triangles = rim edges touching hub
        [(0, i) for i in range(1, 9)] + [(i, i % 8 + 1) for i in range(1, 9)],
    ]
    for edges in cases:
        nodes = sorted({u for e in edges for u in e})
        es = {tuple(sorted(e)) for e in edges}
        want = sum(
            (a, b) in es and (b, c) in es and (a, c) in es
            for a, b, c in itertools.combinations(nodes, 3))
        df = spark.createDataFrame(sorted(es), "a long, b long")
        got = triangle_count(df).collect()[0].n_triangles
        assert got == want, (edges, got, want)


def test_cohort_roster_cap_bounds_hot_cohorts(spark):
    """VERDICT r4 item 3: one hot (hour, event_type) cohort inflated
    ~8x past the cap must contribute at most cap*(cap-1)/2 pairs — the
    quadratic blowup is cut off at the documented truncation, and the
    kept users are the most-active ones."""
    from pyspark.sql import functions as F

    from impractical_impala_spark.queries.paths_stats import (
        K_COHORT, cohort_edges)

    hot_n = 8 * K_COHORT
    rows = []
    for u in range(hot_n):  # hot cohort: hour 0, one event type
        # activity gradient: user u logs (u % 7) + 1 events
        for i in range((u % 7) + 1):
            rows.append((u * 100 + i, 3_600_000_000_000 * 0 + u, u, "hot"))
    for u in range(5):      # control cohort, under the cap
        rows.append((90_000_000 + u, 3_600_000_000_000 + u,
                     10_000_000 + u, "cold"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts_ns long, user_id long, event_type string")
    edges = cohort_edges(ev).cache()
    hot_cap = K_COHORT * (K_COHORT - 1) // 2
    cold = 5 * 4 // 2
    assert edges.count() == hot_cap + cold
    # the cap keeps the most-active rosters: every kept hot user has
    # activity >= 6 (the top activity tiers of the gradient)
    kept = {r.u for r in
            edges.select(F.col("a").alias("u"))
            .unionByName(edges.select(F.col("b").alias("u")))
            .distinct().filter(F.col("u") < 10_000_000).collect()}
    assert len(kept) == K_COHORT
    assert all((u % 7) + 1 >= 6 for u in kept), sorted(kept)[:10]


def test_edge_cap_bounds_densified_graph(spark):
    """r5: the co-activity graph densifies as data grows; the backbone
    keeps only the edge_cap strongest-support edges, chosen by a total
    order — and below the cap the backbone is the full graph."""
    from impractical_impala_spark.queries.paths_stats import cohort_edges

    rows = []
    # 30 users all co-active in hour 0 -> C(30,2)=435 raw edges; pairs
    # of LOW ids co-occur again in later hours (higher support)
    for u in range(30):
        rows.append((u, 0, u, "t"))
    for h in range(1, 4):
        for u in range(10):
            rows.append((1000 * h + u, h * 3_600_000_000_000 + u, u, "t"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts_ns long, user_id long, event_type string")
    full = cohort_edges(ev)
    assert full.count() == 435
    top = cohort_edges(ev, edge_cap=45).collect()
    assert len(top) == 45
    # the C(10,2)=45 high-support pairs (ids 0-9, support 4) win the cut
    assert all(r.a < 10 and r.b < 10 for r in top)
