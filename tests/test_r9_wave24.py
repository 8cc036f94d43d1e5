"""Round-9 wave 24 kernels: pure-python graph references (BFS from a
seed set, Jaccard over non-adjacent pairs, local clustering
coefficients) replayed on the SAME co-activity backbone the queries
build, so the graph algebra is checked independently of Spark."""

from collections import defaultdict, deque

from impractical_impala_spark.queries.paths_stats import (
    BFS_ROUNDS, CC_BUCKETS, JC_PIVOT_CAP, JC_TOPK, MS_SEEDS, cohort_edges)
from impractical_impala_spark.registry import all_queries
from impractical_impala_spark.sources import load_table

_Q = all_queries()


def _backbone(spark, sf_dir):
    rows = cohort_edges(load_table(spark, sf_dir, "events")).collect()
    edges = {(r["a"], r["b"]) for r in rows}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return edges, adj


def test_multisource_bfs_matches_python(spark, sf_small):
    _edges, adj = _backbone(spark, sf_small)
    deg = {u: len(vs) for u, vs in adj.items()}
    seeds = sorted(deg, key=lambda u: (-deg[u], u))[:MS_SEEDS]
    dist = {u: (0 if u in seeds else None) for u in adj}
    frontier = deque(seeds)
    level = {u: 0 for u in seeds}
    while frontier:
        u = frontier.popleft()
        if level[u] >= BFS_ROUNDS:
            continue
        for v in adj[u]:
            if dist[v] is None:
                dist[v] = level[u] + 1
                level[v] = level[u] + 1
                frontier.append(v)
    hist = defaultdict(int)
    for u, d in dist.items():
        hist[-1 if d is None else d] += 1
    got = {r["hop"]: r["n_users"] for r in
           _Q["graph_bfs_multisource"].build(spark, sf_small).collect()}
    assert got == dict(hist)


def test_jaccard_linkpred_matches_python(spark, sf_small):
    edges, adj = _backbone(spark, sf_small)
    deg = {u: len(vs) for u, vs in adj.items()}
    cand = defaultdict(int)
    for u, vs in adj.items():
        if deg[u] > JC_PIVOT_CAP:
            continue
        vs_sorted = sorted(vs)
        for i, x in enumerate(vs_sorted):
            for y in vs_sorted[i + 1:]:
                cand[(x, y)] += 1
    scored = []
    for (x, y), common in cand.items():
        if (x, y) in edges:
            continue
        ppm = common * 1_000_000 // (deg[x] + deg[y] - common)
        scored.append((-ppm, x, y, common))
    scored.sort()
    want = [(x, y, common, deg[x], deg[y], -negppm)
            for negppm, x, y, common in scored[:JC_TOPK]]
    got = [(r["x"], r["y"], r["n_common"], r["dx"], r["dy"],
            r["jaccard_ppm"]) for r in
           _Q["graph_jaccard_linkpred"].build(spark, sf_small).collect()]
    assert got == want


def test_clustering_coeff_matches_python(spark, sf_small):
    edges, adj = _backbone(spark, sf_small)
    tri = defaultdict(int)
    seen = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            key = tuple(sorted((a, b, c)))
            if key not in seen:
                seen.add(key)
                for u in key:
                    tri[u] += 1
    buckets = defaultdict(lambda: [0, 0, 0])  # n, sum_coeff, has_coeff
    for u, vs in adj.items():
        d = len(vs)
        if d < 2:
            bucket = -1
            coeff = None
        else:
            coeff = 2_000_000 * tri.get(u, 0) // (d * (d - 1))
            bucket = min(CC_BUCKETS - 1, coeff * CC_BUCKETS // 1_000_000)
        slot = buckets[bucket]
        slot[0] += 1
        if coeff is not None:
            slot[1] += coeff
            slot[2] += 1
    got = {r["bucket"]: (r["n_nodes"], r["mean_coeff_ppm"]) for r in
           _Q["graph_clustering_coeff"].build(spark, sf_small).collect()}
    want = {b: (n, (s // n if has else None))
            for b, (n, s, has) in buckets.items()}
    assert got == want
