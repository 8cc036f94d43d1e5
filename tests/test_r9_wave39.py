"""Round-9 wave 39 kernels: independent references — a brute-force
O(n²) dominance skyline, a pandas ABC-XYZ replay, and a hashlib
projection replay confirming the JL identity."""

import hashlib
import math
from collections import defaultdict

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.analytics import (
    ABC_BINS, XYZ_X_MILLI, XYZ_Y_MILLI)
from impractical_impala_spark.queries.emb_eval import RP_K
from impractical_impala_spark.queries.hypothesis import _half_away
from impractical_impala_spark.queries.ml_more import Q_SCALE
from impractical_impala_spark.queries.similarity import N_QUERIES
from impractical_impala_spark.queries.warehouse_extras import SKY_TOPK
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_skyline_matches_bruteforce(spark, sf_small):
    part = pd.read_parquet(f"{sf_small}/part.parquet",
                           columns=["p_partkey", "p_size",
                                    "p_retailprice"])
    pts = [(int(np.floor(r["p_retailprice"] * 100)), int(r["p_size"]),
            int(r["p_partkey"])) for _, r in part.iterrows()]
    sky = []
    for c, s, k in pts:
        dominated = any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s))
            for c2, s2, _ in pts)
        if not dominated:
            sky.append((c, k, s))
    sky.sort()
    want = [(k, c, s) for c, k, s in sky[:SKY_TOPK]]
    got = [(r["p_partkey"], r["cents"], r["p_size"]) for r in
           _Q["q_skyline_2d"].build(spark, sf_small).collect()]
    assert got == want
    # skyline sanity: strictly increasing size as price rises
    sizes = [s for _, _, s in got]
    assert sizes == sorted(sizes)


def test_abc_xyz_matches_pandas(spark, sf_small):
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_shipdate"])
    li["cents"] = np.floor(li["l_extendedprice"] * 100).astype("int64")
    sd = pd.to_datetime(li["l_shipdate"])
    li["m"] = sd.dt.year * 12 + sd.dt.month
    mm = int(li["m"].max() - li["m"].min() + 1)
    rev = li.groupby("l_partkey")["cents"].sum()
    mn, mx, total = int(rev.min()), int(rev.max()), int(rev.sum())
    bins = ((mx - rev) * ABC_BINS // (mx - mn + 1)).clip(
        upper=ABC_BINS - 1)
    brev = rev.groupby(bins).sum().sort_index()
    cprev = brev.cumsum().shift(fill_value=0)
    abc_of_bin = {b: ("A" if int(cprev[b]) * 5 < 4 * total
                      else "B" if int(cprev[b]) * 20 < 19 * total
                      else "C") for b in brev.index}
    monthly = (li.assign(q=li["l_quantity"].astype("int64"))
               .groupby(["l_partkey", "m"])["q"].sum())
    cells = defaultdict(lambda: [0, 0])
    for pk, r in rev.items():
        qs = monthly.xs(pk, level="l_partkey")
        s = int(qs.sum())
        qq = int((qs ** 2).sum())
        var = (mm * qq - s * s) / (mm * (mm - 1))
        cv_milli = _half_away(math.sqrt(var) * mm / s * 1e3)
        xyz = ("X" if cv_milli < XYZ_X_MILLI
               else "Y" if cv_milli < XYZ_Y_MILLI else "Z")
        abc = abc_of_bin[int(bins[pk])]
        cells[(abc, xyz)][0] += 1
        cells[(abc, xyz)][1] += int(r)
    got = {(r["abc_class"], r["xyz_class"]): r for r in
           _Q["part_abc_xyz_matrix"].build(spark, sf_small).collect()}
    assert set(got) == set(cells)
    for key, (n, s) in cells.items():
        assert got[key]["n_parts"] == n
        assert got[key]["revenue_cents"] == s
        assert got[key]["share_ppm"] == s * 1_000_000 // total


def test_jl_audit_matches_hashlib(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb[emb["vec_id"] < N_QUERIES].sort_values("vec_id")
    xq = {int(r["vec_id"]):
          np.floor(np.array(r["embedding"], dtype=float) * Q_SCALE)
          .astype("int64") for _, r in emb.iterrows()}
    dim = len(next(iter(xq.values())))
    signs = np.array(
        [[1 if int(hashlib.md5(f"{j}_{d}".encode())
                   .hexdigest()[:7], 16) % 2 == 0 else -1
          for d in range(dim)] for j in range(RP_K)], dtype="int64")
    proj = {v: signs @ x for v, x in xq.items()}
    ids = sorted(xq)
    ratios = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            o2 = int(((xq[a] - xq[b]) ** 2).sum())
            p2 = int(((proj[a] - proj[b]) ** 2).sum())
            ratios.append(_half_away(p2 / RP_K / o2 * 1e6))
    row = _Q["emb_random_projection_audit"].build(
        spark, sf_small).collect()[0]
    assert row["n_pairs"] == len(ratios)
    assert row["mean_distortion_ppm"] == sum(ratios) // len(ratios)
    assert row["min_distortion_ppm"] == min(ratios)
    assert row["max_distortion_ppm"] == max(ratios)
    # JL identity: mean distortion concentrates near 1
    assert 0.3 < row["mean_distortion_ppm"] / 1e6 < 3.0
