"""Round-9 wave 41 kernels: independent references — a pure-python
session scanner for bounce rates and a numpy half-centroid cosine."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from impractical_impala_spark.queries.analytics import BOUNCE_GAP_US
from impractical_impala_spark.queries.ml_more import Q_SCALE
from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def test_bounce_rate_matches_python(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])
    ev["ts_us"] = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
                   .astype("int64") // 1000)
    stats = defaultdict(lambda: [0, 0, 0])  # sessions, bounces, events
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        prev = None
        cur_n, cur_entry = 0, None
        sessions = []
        for _, r in g.iterrows():
            if prev is None or r["ts_us"] - prev > BOUNCE_GAP_US:
                if cur_n:
                    sessions.append((cur_entry, cur_n))
                cur_n, cur_entry = 0, r["event_type"]
            cur_n += 1
            prev = r["ts_us"]
        if cur_n:
            sessions.append((cur_entry, cur_n))
        for entry, n in sessions:
            s = stats[entry]
            s[0] += 1
            s[1] += int(n == 1)
            s[2] += n
    got = {r["entry_type"]: r for r in
           _Q["events_bounce_rate"].build(spark, sf_small).collect()}
    assert set(got) == set(stats)
    for entry, (ns, nb, ne) in stats.items():
        r = got[entry]
        assert (r["n_sessions"], r["n_bounce"]) == (ns, nb)
        assert r["bounce_ppm"] == nb * 1_000_000 // ns
        assert r["mean_depth_milli"] == ne * 1000 // ns


def test_centroid_drift_matches_numpy(spark, sf_small):
    emb = pd.read_parquet(f"{sf_small}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    mid = (int(emb["vec_id"].min()) + int(emb["vec_id"].max())) // 2
    got = {r["label"]: r for r in
           _Q["emb_centroid_drift"].build(spark, sf_small).collect()}
    for lbl, g in emb.groupby("label"):
        x = np.floor(np.stack(g["embedding"].to_numpy())
                     .astype(np.float64) * Q_SCALE)
        early = g["vec_id"].to_numpy() <= mid
        sa = x[early].sum(axis=0)
        sb = x[~early].sum(axis=0)
        cos = float(sa @ sb / (np.linalg.norm(sa) * np.linalg.norm(sb)))
        r = got[lbl]
        assert r["n_early"] == int(early.sum())
        assert r["n_late"] == int((~early).sum())
        assert math.isclose(r["centroid_cos_ppm"] / 1e6, cos,
                            rel_tol=1e-6, abs_tol=2e-6)
        assert r["drifted"] == int(r["centroid_cos_ppm"] < 950_000)
