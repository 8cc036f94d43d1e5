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


def k_core_summary(edges: DataFrame, ks: tuple[int, ...],
                   max_iter: int = 30) -> DataFrame:
    """k-core sizes of the undirected graph ``edges(a, b)``: for each
    k, iteratively peel nodes of degree < k until the fixpoint, then
    report the surviving subgraph's node and edge counts. One row per
    k: (k, n_nodes, n_edges).

    Scale shape: every round is degrees = groupBy(node).count over the
    CURRENT edge set followed by a semi-join filter — all
    hash-partitioned on node id, no driver-side data; rounds needed is
    the peel depth. Lineage truncates per round (localCheckpoint — the
    connected_components discipline). The peel is inherently
    iterative, so this operator is rows-only for the oracle harness;
    the Python reference peel in the tests pins its semantics."""
    e0 = edges.select(F.col("a"), F.col("b")).distinct().cache()
    spark = e0.sparkSession
    # Optimization r15: k-cores are NESTED (core_{k'} of core_k equals
    # core_{k'} of the full graph for k' >= k — peeling is confluent),
    # so ascending k peels start from the previous fixpoint instead of
    # the full edge set; results are identical, rounds shrink with the
    # surviving subgraph. Output rows keep the caller's ks order.
    by_k: dict[int, tuple] = {}
    base, base_n = e0, None
    try:
        for k in sorted(set(ks)):
            n_nodes, n_edges, frame = _peel(base, k, max_iter,
                                            n_edges_in=base_n,
                                            keep_frame=True)
            by_k[k] = (n_nodes, n_edges)
            if base is not e0:
                _drop_checkpoint(base)
            base, base_n = frame, n_edges
    finally:
        if base is not e0:
            _drop_checkpoint(base)
        e0.unpersist()
    rows = [(k, *by_k[k]) for k in ks]
    return spark.createDataFrame(rows, ["k", "n_nodes", "n_edges"])


def degeneracy_core(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """The graph's DEGENERACY (the largest k with a non-empty k-core)
    and that innermost core's size, found by binary search over k —
    log2(max_degree) peel runs, each the k_core_summary shape. Also
    reports the 2-core (the standard "remove the dangling fringe"
    level) so the output is informative at ANY density: a uniformly
    dense backbone has an empty core at median degree but a deep
    degeneracy; a sparse graph the reverse. Returns two rows:
    (level='2core', k=2, sizes) and (level='degeneracy', k=k*, sizes).
    The one collect is the 1-row max-degree aggregate (model-size)."""
    e0 = edges.select(F.col("a"), F.col("b")).distinct().cache()
    spark = e0.sparkSession
    # Optimization r15 (OPTIMIZATION_r15.md): every binary-search probe
    # is for some k >= 2, and k-cores are nested (peeling is confluent:
    # core_k of core_j == core_k of the graph for j <= k), so probes
    # peel from the INNERMOST non-empty core found so far — initially
    # the 2-core — instead of the full edge set. Identical fixpoints,
    # far fewer rounds per probe (the base shrinks as lo rises); the
    # carried edge count also skips each probe's initial count job.
    base = None     # edge frame of core_lo (caller-owned checkpoint)
    base_n = None   # its edge count
    try:
        two_n, two_e, base = _peel(e0, 2, max_iter, keep_frame=True)
        two = (two_n, two_e)
        base_n = two_e
        maxdeg = (e0.select(F.col("a").alias("u"))
                  .unionByName(e0.select(F.col("b").alias("u")))
                  .groupBy("u").agg(F.count(F.lit(1)).alias("d"))
                  .agg(F.max("d").alias("m"))
                  .collect()[0].m or 0)  # 1-row model-size scalar
        if maxdeg == 0:  # edgeless graph: degeneracy is 0, not k=1
            return spark.createDataFrame(
                [("2core", 2, *two), ("degeneracy", 0, 0, 0)],
                ["level", "k", "n_nodes", "n_edges"])
        lo, lo_sizes = 1, None
        hi = maxdeg + 1
        while hi - lo > 1:
            mid = (lo + hi) // 2  # mid > lo >= 1, so mid >= 2: the
            # 2-core (and later the lo-core) is always a valid base
            n_nodes, n_edges, frame = _peel(base, mid, max_iter,
                                            n_edges_in=base_n,
                                            keep_frame=True)
            if n_edges > 0:
                lo, lo_sizes = mid, (n_nodes, n_edges)
                _drop_checkpoint(base)
                base, base_n = frame, n_edges
            else:
                hi = mid
                _drop_checkpoint(frame)
        if lo_sizes is None:  # degeneracy 1: the graph itself
            lo_sizes = _peel(e0, 1, max_iter)
    finally:
        if base is not None:
            _drop_checkpoint(base)
        e0.unpersist()
    return spark.createDataFrame(
        [("2core", 2, *two), ("degeneracy", lo, *lo_sizes)],
        ["level", "k", "n_nodes", "n_edges"])
