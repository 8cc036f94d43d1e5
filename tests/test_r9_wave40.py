"""Round-9 wave 40 kernel: an independent brute-force trailing-window
distinct count pins the merged-interval WAU decomposition."""

import pandas as pd

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def test_stickiness_matches_bruteforce_window(spark, sf_small):
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["user_id", "ts"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    ud = set(zip(ev["user_id"], d))
    days = sorted({dd for _, dd in ud})
    by_day = {}
    for u, dd in ud:
        by_day.setdefault(dd, set()).add(u)
    got = {r["epoch_day"]: r for r in
           _Q["users_stickiness_l7"].build(spark, sf_small).collect()}
    assert set(got) == set(days)
    for dd in days:
        dau = len(by_day[dd])
        wau = len(set().union(*(by_day.get(x, set())
                                for x in range(dd - 6, dd + 1))))
        r = got[dd]
        assert r["dau"] == dau
        assert r["wau7"] == wau
        assert r["stickiness_ppm"] == dau * 1_000_000 // wau
        assert r["wau7"] >= r["dau"]
