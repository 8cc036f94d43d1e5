"""Round-9 wave 44 kernel: the cross-source matrix must exactly
re-aggregate the registered LSH pairs by source, and the planted
mutated clones must make the diagonal dominate."""

import pandas as pd

from impractical_impala_spark.queries.dedup import MUT_OFFSET
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_cross_source_matrix_matches_pair_reaggregation(spark, sf_small):
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             _Q["dedup_minhash_lsh"].build(spark, sf_small).collect()]
    docs = pd.read_parquet(f"{sf_small}/documents.parquet",
                           columns=["doc_id", "source"])
    src = dict(zip(docs["doc_id"], docs["source"]))
    for d, s in list(src.items()):
        if d % 3 == 0:
            src[d + MUT_OFFSET] = s
    cells = {}
    for a, b in pairs:
        key = tuple(sorted((src[a], src[b])))
        cells[key] = cells.get(key, 0) + 1
    nn = sum(cells.values())
    got = {(r["s1"], r["s2"]): r for r in
           _Q["dedup_cross_source_matrix"].build(spark, sf_small)
           .collect()}
    assert set(got) == set(cells)
    for key, n in cells.items():
        r = got[key]
        assert r["n_pairs"] == n
        assert r["within_source"] == int(key[0] == key[1])
        assert r["share_ppm"] == n * 1_000_000 // nn
    # the planted clones are same-source, so the within-source mass
    # must dominate the matrix
    within = sum(n for (a, b), n in cells.items() if a == b)
    assert within * 2 > nn
