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

import hashlib
import re

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


def fingerprint_query(spark, build, sf_dir: str) -> dict:
    """Fingerprint of ``build(spark, sf_dir)`` against a CLEAN cache.

    Spark's cache manager substitutes ``InMemoryTableScan`` for any plan
    fragment a previously-built query ``.cache()``d in the same session
    (lookup is by canonicalized plan, ACROSS queries), which hides the
    replaced subtree's joins/exchanges from the fingerprint and makes it
    depend on session history — the autocorr24 spine join vanished
    whenever an earlier query had cached the dense hourly fragment.
    Clearing the cache before building pins the fingerprint to the
    query's own plan; queries that cache their OWN inputs re-create that
    cache during build, deterministically.

    Returns ``{"shape": {node-class counts}, "expr": sha256hex}`` —
    the shape counts pin physical STRATEGY (joins, exchanges, Python
    boundaries); the expression hash pins the optimized logical plan's
    EXPRESSIONS, so an undeclared semantics edit (``ROUND(x,4)`` →
    ``x``) trips CI even when the plan shape is unchanged (VERDICT r13
    ask #1: the r13 gapfill/time_rollup value rewrite changed query
    values without moving one byte of the shape snapshot)."""
    spark.catalog.clearCache()
    df = build(spark, sf_dir)
    return {"shape": plan_fingerprint(df),
            "expr": expression_fingerprint(df)}


# exprIds embedded in expression text. Plan canonicalization normalizes
# ATTRIBUTE ids (-> none#0L) but NOT NamedLambdaVariable ids (``lambda
# h#79L`` keeps the session-global counter value), so any id left in the
# text is session-order noise, not signal — strip them all. Column
# identity remains pinned by position inside each expression string and
# by the values-hash gate.
_EXPR_ID = re.compile(r"#\d+")

# RewriteDistinctAggregates assigns a group-id LITERAL to each distinct
# group (the ``FILTER (WHERE (gid = N))`` it synthesizes around every
# rewritten aggregate; the Expand projections carry the same literals).
# Which group gets gid 1 vs 2 is a HashMap iteration order over
# exprId-keyed expression sets — session-global-counter noise, observed
# swapping on user_feature_matrix's two countDistincts across sessions.
# Normalize the literal compared against the synthesized ``gid``
# attribute (its name is fixed by the rewrite rule); the Expand side
# needs nothing — its projections flatten into the node's sorted
# expression multiset, which is permutation-insensitive by
# construction. Applied AFTER the id strip, so the attribute reads
# ``gid#``.
_GID_FILTER = re.compile(r"\(gid# = \d+\)")


def _normalize_expr(s: str) -> str:
    return _GID_FILTER.sub("(gid# = #)", _EXPR_ID.sub("#", s))


def expression_fingerprint(df: DataFrame) -> str:
    """sha256 over the ANALYZED logical plan's expressions, one line
    per plan node in tree order: ``NodeName[sorted expression
    strings]``.

    Design notes (each clause earned by an observed nondeterminism):

    - ANALYZED plan, not optimized/physical/canonicalized: the analyzed
      plan is a pure function of the query SOURCE — which is exactly
      what this gate guards (an undeclared expression edit). Every
      later stage injects optimizer state that proved session- or
      JVM-dependent in testing: canonicalization rewrites commutative
      chains into ``MultiCommutativeOp`` ordered by a Class-identity
      hashCode (differs ACROSS JVMs while stable within one — 40
      queries flipped between regen JVMs); the optimizer's
      RewriteDistinctAggregates emits its filtered-aggregate list and
      assigns its gid literals in HashMap order (user_feature_matrix's
      two countDistincts swapped between sessions); heavy-expression
      queries (langid_mcnemar, doc_gopher_quality_flags) still flipped
      rarely on the optimized text. The analyzed plan also predates
      cache substitution, so it cannot be contaminated by earlier
      queries' .cache() fragments.
    - ``_EXPR_ID`` strip: attributes carry session-global exprIds
      (``cnt#123L``) — pure session noise; the NAMES stay (stable,
      they come from the query).
    - ``_GID_FILTER``: harmless on analyzed plans (the rewrite that
      produces gid literals runs later); kept so a future move of that
      rewrite cannot re-introduce the noise.
    - expressions SORTED within each node: defense in depth against
      any list whose order is bookkeeping rather than semantics.

    Node TREE order is kept (structure is semantic: join sides, input
    of an aggregate), and subquery plans are included via ``_walk``.
    """
    root = df._jdf.queryExecution().analyzed()
    lines = []
    for node in _walk(root):
        exprs = []
        seq = node.expressions()
        it = seq.iterator()
        while it.hasNext():
            exprs.append(_normalize_expr(it.next().toString()))
        lines.append(node.nodeName() + "[" + "|".join(sorted(exprs)) + "]")
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


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
