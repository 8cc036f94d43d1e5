"""Connected components — the cluster-formation step a dedup pipeline
runs after near-dup PAIR generation (keep one representative per
duplicate cluster). Spark has no builtin; this is the custom-operator
rule (a) composition: Pregel-style min-label propagation, one shuffle
per round.

Scale shape: each round is join(edges, labels) + groupBy-min — all
hash-partitioned on the node id, no driver-side data. Rounds needed =
component diameter, and near-dup clusters are shallow (a duplicate
cluster's diameter is small by construction — every member overlaps the
same content); the large-star/small-star variants that halve diameter
per round only pay off on deep web-graph-like components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _drop_checkpoint(df: DataFrame) -> None:
    """Best-effort eager release of a localCheckpoint'd DataFrame's
    blocks. The public API only frees them when the JVM Dataset is
    GC'd (ContextCleaner), so a long session running many component
    jobs would accumulate executor storage; a checkpointed Dataset's
    analyzed plan is a LogicalRDD whose rdd we can unpersist now."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # non-LogicalRDD plan or API drift: ContextCleaner handles it


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 15) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id reachable from it (= component id). Returns
    ``(node, component)``, one row per distinct node.

    Deterministic: labels are ids, propagation is min(), convergence is
    exact — no float or ordering sensitivity, so the result is
    hash-stable and oracle-checkable against a recursive-CTE transitive
    closure. Raises if ``max_iter`` rounds don't reach the fixpoint
    (diameter larger than max_iter) rather than returning a silently
    unconverged clustering.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .distinct().cache()
    # localCheckpoint (not cache): each round's plan references the
    # previous round's, so without truncating lineage the logical plan
    # grows exponentially with rounds and the DRIVER dies on plan
    # bookkeeping long before any executor breaks a sweat. On a real
    # cluster swap for a reliable checkpoint dir if executor loss
    # mid-algorithm must be survivable.
    labels = sym.select(F.col("a").alias("node")).distinct() \
        .withColumn("lbl", F.col("node")).localCheckpoint(eager=True)
    # try/finally: sym must not outlive the loop on ANY exit path, and
    # each superseded round's checkpoint blocks are dropped eagerly so a
    # long-lived session running many component jobs doesn't accumulate
    # executor storage until RDD GC gets around to it.
    try:
        for _ in range(max_iter):
            prop = (
                sym.join(labels, sym.a == labels.node)
                .select(F.col("b").alias("node"), "lbl")
            )
            new_labels = (
                prop.unionByName(labels.select("node", "lbl"))
                .groupBy("node").agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("lbl", "old"), "node")
                .filter(F.col("lbl") != F.col("old")).count()
            )
            prev, labels = labels, new_labels
            _drop_checkpoint(prev)
            if changed == 0:
                return labels.select("node", F.col("lbl").alias("component"))
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)")


def _peel(e0: DataFrame, k: int, max_iter: int, *,
          n_edges_in: int | None = None,
          keep_frame: bool = False) -> tuple:
    """Peel to the k-core fixpoint of the cached edge frame ``e0``.
    Returns (n_nodes, n_edges) of the surviving subgraph — plus the
    fixpoint edge frame (localCheckpointed; the CALLER owns its blocks)
    when ``keep_frame``.

    Optimization r15: the edge count of the current frame is carried
    FORWARD between rounds (round N's ``nxt.count()`` is round N+1's
    ``n_cur``) instead of re-counted, halving the non-checkpoint job
    count per round; ``n_edges_in`` lets a caller that already knows
    ``count(e0)`` (the nested-core binary search below) skip the
    initial count job too. Fixpoint detection is unchanged: nxt is a
    subset of cur by construction, so count equality still means set
    equality."""
    cur = e0.localCheckpoint(eager=True)
    n_cur = cur.count() if n_edges_in is None else n_edges_in
    # try/finally: the CURRENT round's checkpoint blocks are released on
    # every exit path — converged return AND the max_iter raise (which
    # previously leaked cur's blocks until RDD GC).
    try:
        for _ in range(max_iter):
            deg = (cur.select(F.col("a").alias("u"))
                   .unionByName(cur.select(F.col("b").alias("u")))
                   .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
            keep = deg.filter(F.col("d") >= k).select("u")
            nxt = (cur.join(keep.withColumnRenamed("u", "a"), "a", "left_semi")
                   .join(keep.withColumnRenamed("u", "b"), "b", "left_semi")
                   .select("a", "b").localCheckpoint(eager=True))
            n_nxt = nxt.count()
            _drop_checkpoint(cur)
            cur = nxt
            if n_nxt == n_cur:
                n_nodes = (cur.select(F.col("a").alias("u"))
                           .unionByName(cur.select(F.col("b").alias("u")))
                           .distinct().count())
                if keep_frame:
                    out, cur = cur, e0  # caller owns the fixpoint blocks
                    return n_nodes, n_nxt, out
                return n_nodes, n_nxt
            n_cur = n_nxt
    finally:
        if cur is not e0:
            _drop_checkpoint(cur)
    raise RuntimeError(
        f"k-core peel: k={k} did not stabilize in {max_iter} rounds")


def coreness(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """Core number of EVERY node of the undirected simple graph
    ``edges(a, b)`` (one row per edge, no self-loops — the cohort_edges
    contract) in ONE fixpoint, via the h-index iteration of Lü, Zhou,
    Zhang & Stanley, "The H-index of a network node and its relation
    to degree and coreness" (Nature Communications 7:10168, 2016):

        c_0(v)   = degree(v)
        c_t+1(v) = H({c_t(u) : u ~ v})   (H = largest h with >= h
                                          neighbor values >= h)

    c_t is pointwise non-increasing (H of n values <= n, and H is
    monotone in its inputs, so by induction from c_0 = degree) and
    converges exactly to the coreness. Every k-core statistic then
    reads off the fixpoint WITHOUT re-peeling: the k-core is the
    subgraph induced by {v : core(v) >= k}, so n_nodes(k) = #{core >=
    k} and n_edges(k) = #{(a,b) : min(core(a), core(b)) >= k}, and the
    degeneracy k* = max coreness (optimization r16 — replaces the
    per-k / binary-searched peel loops of r15, guide §1.2/§2.4: one
    iterative job chain instead of O(#ks) or O(log maxdeg) of them).

    Returns (node, core). Scale shape: each round is one join of the
    static symmetrized edge list against the current (node, core)
    frame plus one groupBy whose per-group state is O(max degree) —
    the same bound as the peel's degree aggregation; lineage truncates
    per round (localCheckpoint, the connected_components discipline),
    and the convergence scalar is sum(core), exact on int64 and
    strictly decreasing until the fixpoint (c is pointwise
    non-increasing, so sum equality <=> pointwise equality). Raises
    after ``max_iter`` rounds rather than returning a silently
    unconverged labeling. The h-index itself is pure codegen: sort the
    collected neighbor values descending, count prefix positions i
    (1-based) with value >= i."""
    e = edges.select("a", "b")
    sym = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(e.select(F.col("b").alias("u"),
                                 F.col("a").alias("v")))
           .localCheckpoint(eager=True))
    hidx = ("cast(size(filter(transform(sort_array(cs, false),"
            " (x, i) -> x >= i + 1), p -> p)) as bigint)")
    cores = (sym.groupBy(F.col("u").alias("node"))
             .agg(F.count(F.lit(1)).alias("c"))
             .localCheckpoint(eager=True))
    tot = cores.groupBy().sum("c").first()[0]
    try:
        for _ in range(max_iter):
            nxt = (sym.join(cores, sym.v == cores.node)
                   .groupBy(F.col("u").alias("node"))
                   .agg(F.collect_list("c").alias("cs"))
                   .select("node", F.expr(hidx).alias("c"))
                   .localCheckpoint(eager=True))
            ntot = nxt.groupBy().sum("c").first()[0]
            prev, cores = cores, nxt
            _drop_checkpoint(prev)
            if ntot == tot:  # sum fixpoint == pointwise fixpoint
                out, cores = cores, None
                return out
            tot = ntot
    finally:
        if cores is not None:
            _drop_checkpoint(cores)
        _drop_checkpoint(sym)
    raise RuntimeError(
        f"coreness: h-index iteration did not converge in {max_iter} "
        "rounds")


def _edge_min_core(edges: DataFrame, cores: DataFrame) -> DataFrame:
    """One row per distinct edge with m = min(core(a), core(b)) — the
    largest k whose k-core keeps the edge."""
    ca = cores.select(F.col("node").alias("a"), F.col("c").alias("ca"))
    cb = cores.select(F.col("node").alias("b"), F.col("c").alias("cb"))
    return (edges.join(ca, "a").join(cb, "b")
            .select(F.least("ca", "cb").alias("m")))


def k_core_summary(edges: DataFrame, ks: tuple[int, ...],
                   max_iter: int = 100) -> DataFrame:
    """k-core sizes of the undirected graph ``edges(a, b)``: for each
    k, iteratively peel nodes of degree < k until the fixpoint, then
    report the surviving subgraph's node and edge counts. One row per
    k: (k, n_nodes, n_edges).

    Scale shape: every round is degrees = groupBy(node).count over the
    CURRENT edge set followed by a semi-join filter — all
    hash-partitioned on node id, no driver-side data. The peel is
    inherently iterative, so this operator is rows-only for the oracle
    harness; the Python reference peel in the tests pins its semantics.

    Optimization r16 (replacing r15's chained ascending-k peels): ONE
    h-index coreness fixpoint (see ``coreness``) followed by one
    conditional-count aggregation over the node cores and one over the
    edge min-cores — every k's sizes in two jobs, however many ks are
    asked for. Value-identical to per-k peeling: the k-core is the
    subgraph induced by {core >= k}, and for k >= 1 every member has
    an incident core edge, so the peel's endpoint-distinct node count
    equals #{core >= k}. Pinned vs the Python reference peel and the
    old chained peels in tests/test_r16_opt.py."""
    e0 = edges.select(F.col("a"), F.col("b")).distinct().localCheckpoint(
        eager=True)
    try:
        cores = coreness(e0, max_iter)
        try:
            n_agg = cores.groupBy().agg(*[
                F.coalesce(F.sum(F.expr(f"cast(c >= {k} as long)")),
                           F.lit(0)).cast("long").alias(f"n_{i}")
                for i, k in enumerate(ks)])
            e_agg = _edge_min_core(e0, cores).groupBy().agg(*[
                F.coalesce(F.sum(F.expr(f"cast(m >= {k} as long)")),
                           F.lit(0)).cast("long").alias(f"e_{i}")
                for i, k in enumerate(ks)])
            stack = ", ".join(
                f"cast({k} as bigint), n_{i}, e_{i}"
                for i, k in enumerate(ks))
            out = (n_agg.crossJoin(e_agg)
                   .select(F.expr(f"stack({len(ks)}, {stack})"
                                  " AS (k, n_nodes, n_edges)")))
            # materialize before releasing the inputs' blocks: the
            # result is |ks| rows (model-size by construction)
            return out.localCheckpoint(eager=True)
        finally:
            _drop_checkpoint(cores)
    finally:
        _drop_checkpoint(e0)


def degeneracy_core(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """The graph's DEGENERACY (the largest k with a non-empty k-core)
    and that innermost core's size. Also reports the 2-core (the
    standard "remove the dangling fringe" level) so the output is
    informative at ANY density: a uniformly dense backbone has an
    empty core at median degree but a deep degeneracy; a sparse graph
    the reverse. Returns two rows: (level='2core', k=2, sizes) and
    (level='degeneracy', k=k*, sizes).

    Optimization r16 (replacing r15's binary search over nested
    peels): ONE h-index coreness fixpoint (see ``coreness``), then
    both rows read off it distributively — k* = max coreness (the
    innermost core is non-empty with min degree k*, so it contains an
    edge whose endpoints both have coreness k*; no edge's min-coreness
    can exceed the max), the k*-core sizes are #{core = k*} nodes /
    #{min-core = k*} edges, and the 2-core sizes are the same
    conditional counts at k = 2. The edgeless graph falls out of the
    coalesces: max over zero rows is NULL -> k = 0, all sizes 0 —
    byte-identical to the old special case. Value-equality to the
    peel-based rows is pinned in tests/test_r16_opt.py and by the
    standing DuckDB oracle. No driver-side materialization remains in
    this operator (the old 1-row max-degree collect is gone)."""
    e0 = edges.select(F.col("a"), F.col("b")).distinct().localCheckpoint(
        eager=True)
    try:
        cores = coreness(e0, max_iter)
        try:
            kf = cores.groupBy().agg(F.max("c").alias("kstar"))
            n_agg = (cores.crossJoin(F.broadcast(kf))
                     .groupBy().agg(
                         F.coalesce(F.sum(F.expr("cast(c >= 2 as long)")),
                                    F.lit(0)).cast("long").alias("n2"),
                         F.coalesce(F.sum(F.expr(
                             "cast(c >= kstar as long)")),
                             F.lit(0)).cast("long").alias("nk")))
            e_agg = (_edge_min_core(e0, cores).crossJoin(F.broadcast(kf))
                     .groupBy().agg(
                         F.coalesce(F.sum(F.expr("cast(m >= 2 as long)")),
                                    F.lit(0)).cast("long").alias("e2"),
                         F.coalesce(F.sum(F.expr(
                             "cast(m >= kstar as long)")),
                             F.lit(0)).cast("long").alias("ek")))
            out = (n_agg.crossJoin(e_agg).crossJoin(
                F.broadcast(kf.select(
                    F.coalesce(F.col("kstar"), F.lit(0)).cast("bigint")
                    .alias("kstar"))))
                .select(F.expr(
                    "stack(2, '2core', cast(2 as bigint), n2, e2,"
                    " 'degeneracy', kstar, nk, ek)"
                    " AS (level, k, n_nodes, n_edges)")))
            # materialize before releasing the inputs' blocks (2 rows)
            return out.localCheckpoint(eager=True)
        finally:
            _drop_checkpoint(cores)
    finally:
        _drop_checkpoint(e0)
