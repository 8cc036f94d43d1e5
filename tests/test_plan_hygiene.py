"""Registry-wide physical-plan hygiene sweep: every registered query's
plan — all of them, not a hand-picked list — must be free of the
anti-patterns that silently kill a plan at 100 TB:

- ``CartesianProduct``: an unconstrained pair blowup;
- ``BatchEvalPython``: a row-at-a-time Python UDF on the hot path
  (Arrow kernels show as ArrowEvalPython / MapInPandas and are fine);
- ``BroadcastNestedLoopJoin`` whose BUILD side is not provably
  model-size: 1-row stat attachments (ungrouped aggregates) and
  bounded limits are the only legitimate BNLJ inputs — a corpus-sized
  broadcast there is an OOM at scale, invisible at sf0.01.

The sweep also carries the source-level gate: ``collect()`` /
``toPandas()`` in product (non-test) source are frozen to an explicit
model-size allowlist, so a new driver-side materialization fails CI
rather than waiting for a judge audit.

The per-query plan-shape contracts live in test_plans.py; this sweep
is the backstop that keeps a NEW query from reintroducing any class.
"""

import contextlib
import io
import os
import re

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

# The deliberate Python-UDTF feature query (queries/modern_sql.py):
# UDTF fan-out IS the escape hatch under test there, and its plan node
# (BatchEvalPythonUDTF) shares the row-at-a-time prefix.
ROW_PYTHON_ALLOWED = {"udtf_char_chunks"}

# Build-side subtree markers that prove a BNLJ input is model-size:
# an ungrouped aggregate (exactly 1 row), an explicit bounded limit,
# or a literal local relation.
_MODEL_SIZE = re.compile(
    r"keys=\[\]|GlobalLimit|CollectLimit|LocalTableScan|OneRowRelation")

# Queries whose BNLJ build side is bounded by something the generic
# markers cannot see; each entry is a regex the build subtree MUST
# contain, proving the documented boundedness is actually the side
# that broadcasts (an audited, per-query contract — not an exemption):
#   ann_cosine_topk / ann_recall_audit: the vec_id < N_QUERIES panel
#     predicate (explicit broadcast hint on the panel);
#   audience_overlap_matrix: both crossJoin inputs are aggregates over
#     the bounded event-type dimension (<= T rows / <= 2^T mask rows);
#   q_range_band_join: a 4-row literal band table (Python local data
#     compiles to Scan ExistingRDD, not LocalTableScan).
from impractical_impala_spark.queries.retrieval_curation import MMR_QUERIES
from impractical_impala_spark.queries.similarity import N_QUERIES

_BNLJ_BOUNDED = {
    "ann_cosine_topk": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # the MMR query panel: vec_id < MMR_QUERIES predicate, hinted side
    "emb_mmr_diversify": re.compile(rf"vec_id#\d+L? < {MMR_QUERIES}"),
    "ann_recall_audit": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    "ann_ivf_nprobe_sweep": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # trained sweep: same exact-panel BNLJ (vec_id < N_QUERIES bound);
    # its trained-centroid cross joins are hinted k-row local models
    "ann_ivf_trained_sweep": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # r14 IVF-PQ probe sweep: the embedded exact panel's BNLJ (same
    # vec_id < N_QUERIES bound); the routing/codebook/LUT cross joins
    # are hinted model-size broadcasts
    "ann_ivf_pq_sweep": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # tables sweep: the ann_cosine_topk panel bound PLUS the 1-row
    # candidate-volume aggregate (keys=[]) that attaches by cross join
    "ann_lsh_tables_sweep": re.compile(
        rf"vec_id#\d+L? < {N_QUERIES}|keys=\[\]"),
    # r15 tables x probes grid: same exact-panel bound, plus the ONE
    # 12-cell volume aggregate (keys=[]) stacked to 6 rows and attached
    # by cross join
    "ann_lsh_grid": re.compile(
        rf"vec_id#\d+L? < {N_QUERIES}|keys=\[\]"),
    # r15 bits-per-table sweep: same exact-panel bound, plus the ONE
    # 3-cell volume aggregate (keys=[]) stacked and attached by cross
    # join (the ann_lsh_grid pattern on the budget-split axis)
    "ann_lsh_bits_sweep": re.compile(
        rf"vec_id#\d+L? < {N_QUERIES}|keys=\[\]"),
    # r15 PQ M sweep: the embedded exact panel's BNLJ plus the 1-row
    # per-M reconstruction aggregates (keys=[]); routing/codebook/LUT
    # cross joins are hinted model-size broadcasts
    "ann_pq_m_sweep": re.compile(
        rf"vec_id#\d+L? < {N_QUERIES}|keys=\[\]"),
    "emb_knn_label_purity": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    "audience_overlap_matrix": re.compile(
        r"keys=\[(event_type|mask)#|keys=\[\]"),
    "q_range_band_join": re.compile(r"Scan ExistingRDD|LocalTableScan"),
    # r15 residual-gain: both per-encoding corpus passes cross-join
    # the hinted trained-centroid local model (N_CELLS = 16 rows by
    # construction; local model data compiles to Scan ExistingRDD).
    # The searches hide the same join inside their cached routing
    # fragment — here it is visible and must be proven bounded.
    "ann_pq_residual_gain": re.compile(r"Scan ExistingRDD"),
    # wave-17 retrieval audits: the panel broadcast is the
    # vec_id < N_QUERIES predicate side, bounded at any corpus size
    "emb_matryoshka_audit": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    "emb_binary_sign_audit": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # wave-26 hubness audit composes ann_cosine_topk; same panel bound
    "emb_hubness_audit": re.compile(rf"vec_id#\d+L? < {N_QUERIES}"),
    # wave-39 JL audit: the panel-pair cross join builds on the
    # vec_id < N_QUERIES predicate side
    "emb_random_projection_audit": re.compile(
        rf"vec_id#\d+L? < {N_QUERIES}"),
    # the 16-row literal coalition-mask Range (bounded by construction)
    "attribution_shapley": re.compile(r"Range \(0, 16"),
    # the literal 24-hour spine Range (bounded by construction)
    "events_hourly_profile_jsd": re.compile(r"Range \(0, 24"),
    # the top-50 word panel: a TakeOrdered limit IS the bound
    "text_burrows_delta": re.compile(r"TakeOrderedAndProject\(limit=50"),
    # wave-29 coverage curve: the non-equi (rank <= k) join's build
    # side is the 3-element literal k-spine exploded over Range(0, 1)
    # two BNLJs: the literal k-spine (rank <= k) and the default
    # 1-row totals attach — the override must cover both
    "vocab_coverage_at_k": re.compile(
        r"explode\(\[100,1000,10000\]\)|keys=\[\]"),
}


def _walk(node):
    yield node
    cs = node.children()
    for i in range(cs.size()):
        yield from _walk(cs.apply(i))


@pytest.mark.parametrize("name", sorted(_Q))
def test_plan_hygiene(name, spark, sf_oracle):
    # Audit the query's OWN plan, not one with subtrees swapped for
    # InMemoryTableScan by fragments an earlier test cached (cache
    # lookup is by canonicalized plan, across queries) — a cached
    # subtree would hide the very nodes this sweep hunts.
    spark.catalog.clearCache()
    df = _Q[name].build(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ROW_PYTHON_ALLOWED:
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time UDF"

    if "BroadcastNestedLoopJoin" not in plan:
        return
    # Model-size discipline: walk the strategy-time physical plan (no
    # AQE wrapper yet) and prove each BNLJ's build side is bounded.
    root = df._jdf.queryExecution().sparkPlan()
    for node in _walk(root):
        if node.nodeName() != "BroadcastNestedLoopJoin":
            continue
        simple = node.simpleString(100)
        build_right = "BuildRight" in simple
        build = node.children().apply(1 if build_right else 0)
        subtree = build.toString()
        marker = _BNLJ_BOUNDED.get(name, _MODEL_SIZE)
        assert marker.search(subtree), (
            f"{name}: BNLJ build side is not provably model-size:\n"
            f"{subtree[:2000]}")


# --------------------------- source-level driver-materialization gate
_PKG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "impractical_impala_spark")

# path (relative to package) -> exact allowed count of collect/toPandas
# sites, each audited model-size at the call site:
#   layout.py      1x one-scalar max (partition-layout seed)
#   similarity.py  2x k-means centroid maps (<= IVF_CELLS rows)
#   ml_more.py     1x d(d+1)/2 = 2080 Gram cells
#   plans/wdi.py   1x golden-CSV emission of <=45-row stat tables
#                  (the default sink path is the distributed writer;
#                  the golden path raises past GOLDEN_MAX_ROWS, so the
#                  entry carries a provable size bound)
#   queries/retrieval_curation.py 1x the MMR pool — MMR_QUERIES x
#                  MMR_POOL = 100 rows BY CONSTRUCTION (row_number
#                  cutoff) at any corpus size; the driver-side greedy
#                  replaced ~40 stages of unrolled joins (r15
#                  optimization; OPTIMIZATION_r15.md)
_MATERIALIZE_ALLOW = {
    "queries/layout.py": 1,
    "queries/similarity.py": 2,
    "queries/ml_more.py": 1,
    "plans/wdi.py": 1,
    "queries/retrieval_curation.py": 1,
}

_CALL = re.compile(r"\.collect\(\)|\.toPandas\(\)|collectAsList")


def test_no_unaudited_driver_materialization():
    found: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(_PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, _PKG)
            with open(path, encoding="utf-8") as fh:
                n = sum(1 for line in fh
                        if _CALL.search(line.split("#", 1)[0]))
            if n:
                found[rel] = n
    assert found == _MATERIALIZE_ALLOW, (
        "driver-side materialization sites changed; audit the new site "
        f"for model-size and update the allowlist: {found}")
