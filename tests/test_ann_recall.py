"""ANN quality guards: the approximate variants are only useful if they
actually find the brute-force neighbors. Pin recall@1 against the exact
cosine baseline on the real testdata so an index change that silently
destroys recall fails CI (plan-shape tests alone can't catch that)."""

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _exact_top1(spark, sf):
    rows = _Q["ann_cosine_topk"].build(spark, sf).filter("rn = 1").collect()
    return {r.query_id: r.neighbor_id for r in rows}


def test_ivf_probe_recall_at_1(spark, sf_oracle):
    truth = _exact_top1(spark, sf_oracle)
    got = {r.query_id: r.neighbor_id
           for r in _Q["ann_ivf_probe"].build(spark, sf_oracle).collect()}
    hits = sum(got.get(q) == n for q, n in truth.items())
    assert hits >= 9, f"IVF probe-2 recall@1 {hits}/10"


def test_trained_ivf_recall_at_1(spark, sf_oracle):
    truth = _exact_top1(spark, sf_oracle)
    got = {r.query_id: r.neighbor_id
           for r in _Q["ann_ivf_trained"].build(spark, sf_oracle).collect()}
    hits = sum(got.get(q) == n for q, n in truth.items())
    # training must not LOSE recall vs the seed quantizer's floor
    assert hits >= 9, f"trained IVF recall@1 {hits}/10"


def test_lsh_candidates_include_true_neighbor_for_most_queries(spark, sf_oracle):
    """Multi-table hyperplane LSH on this (unclustered) corpus: its
    top-1 need not equal the exact top-1, but the reported neighbor's
    cosine must be close — pin the quality floor instead of identity."""
    exact = {r.query_id: r.cos
             for r in _Q["ann_cosine_topk"].build(spark, sf_oracle)
             .filter("rn = 1").collect()}
    lsh = {r.vec_id: r.cos
           for r in _Q["ann_lsh_bucketed"].build(spark, sf_oracle).collect()}
    checked = 0
    for q, best in exact.items():
        if q in lsh:
            checked += 1
            assert lsh[q] >= best - 0.25, (q, lsh[q], best)
    assert checked >= 8  # LSH must produce a neighbor for most queries
