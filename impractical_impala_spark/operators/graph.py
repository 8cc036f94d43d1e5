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
