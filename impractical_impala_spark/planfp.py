"""Physical-plan fingerprinting (VERDICT r9/r10 ask #5).

A fingerprint is a compact, exprId-free shape summary of a query's
strategy-time physical plan: join-strategy node counts, exchange
counts, aggregate kinds, and Python-eval node classes. The committed
snapshot (``PLAN_FINGERPRINTS.json``, written by
``scripts/gen_plan_fingerprints.py``) is diffed against a fresh
generation in CI (``tests/test_plan_fingerprints.py``), so a plan-shape
regression — a broadcast silently demoting to sort-merge, a new
shuffle, an Arrow kernel degrading to row-at-a-time Python — fails like
a hash mismatch instead of waiting for a judge audit or a bench-time
anomaly.

Which plan: the AQE INITIAL plan — after join strategies AND
``EnsureRequirements`` (so every Exchange / BroadcastExchange / Sort
the plan will require is visible; the bare ``sparkPlan`` predates
exchange insertion and would count 0 shuffles), but BEFORE any runtime
re-optimization, so the snapshot is deterministic at planning time.
AQE can only IMPROVE on this shape at runtime (e.g. promote a
sort-merge to broadcast on observed sizes). Node counts only — no
expression strings — so the snapshot is invariant to exprIds,
parallelism, and paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Node classes worth pinning. Everything else (Project, Filter, scans,
# unions...) is either invariant noise or already implied: a fingerprint
# should fail on STRATEGY changes, not on a refactor that re-orders two
# projections.
INTERESTING = frozenset({
    # join strategies — the 100 TB decisions
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    # data movement
    "Exchange", "BroadcastExchange",
    # aggregate kinds (HashAggregate demoting to SortAggregate is a
    # spill-path change)
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    # python boundary: Arrow-batched kernels vs row-at-a-time
    "ArrowEvalPython", "BatchEvalPython", "BatchEvalPythonUDTF",
    "MapInPandas", "FlatMapGroupsInPandas", "FlatMapGroupsInPandasWithState",
    # fan-out / windowing / global ordering
    "Generate", "Window", "WindowGroupLimit", "Sort", "Expand",
    "TakeOrderedAndProject", "GlobalLimit",
    # a query's OWN cache boundaries (fingerprints are taken against a
    # cleared cache, so any InMemoryTableScan is self-created at build
    # time — a new one appearing means someone started materializing
    # mid-plan, worth a review)
    "InMemoryTableScan",
})


def _walk(node):
    yield node
    cs = node.children()
    for i in range(cs.size()):
        yield from _walk(cs.apply(i))
    # expression-embedded subquery plans (scalar subqueries / IN
    # subqueries) carry their own exchanges and joins — include them so
    # a subquery broadcast demotion is visible too
    try:
        sq = node.subqueries()
        it = sq.iterator()
        while it.hasNext():
            yield from _walk(it.next())
    except Exception:  # pragma: no cover - py4j surface drift
        pass


def fingerprint_query(spark, build, sf_dir: str) -> dict[str, int]:
    """Fingerprint of ``build(spark, sf_dir)`` against a CLEAN cache.

    Spark's cache manager substitutes ``InMemoryTableScan`` for any plan
    fragment a previously-built query ``.cache()``d in the same session
    (lookup is by canonicalized plan, ACROSS queries), which hides the
    replaced subtree's joins/exchanges from the fingerprint and makes it
    depend on session history — the autocorr24 spine join vanished
    whenever an earlier query had cached the dense hourly fragment.
    Clearing the cache before building pins the fingerprint to the
    query's own plan; queries that cache their OWN inputs re-create that
    cache during build, deterministically."""
    spark.catalog.clearCache()
    return plan_fingerprint(build(spark, sf_dir))


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Counts of INTERESTING node classes in the planning-time physical
    plan (the AQE initial plan when adaptive execution is on). For a
    session-history-independent result use ``fingerprint_query``."""
    root = df._jdf.queryExecution().executedPlan()
    if root.nodeName() == "AdaptiveSparkPlan":
        root = root.initialPlan()
    counts: dict[str, int] = {}
    for node in _walk(root):
        name = node.nodeName()
        if name in INTERESTING:
            counts[name] = counts.get(name, 0) + 1
    return dict(sorted(counts.items()))
