"""Round-14 wave: independent third implementations for the five
value-weighted daily monitors (VERDICT r13 ask #4) — each statistic
recomputed from the raw parquet in pandas/numpy/plain Python, never
through the shared ``*_from_daily`` helpers — plus the count==value
seam law on a constant-value synthetic stream."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from impractical_impala_spark.quantum import VALUE_MICRO
from impractical_impala_spark.queries.dynamics import TE_PAIRS
from impractical_impala_spark.queries.hypothesis import CHI2_95, _half_away
from impractical_impala_spark.queries.spectral_info import (
    GC_F_CRIT_MICRO, GC_PAIRS, HURST_MS)
from impractical_impala_spark.queries.stat_tests import PT_SIG_MICRO
from impractical_impala_spark.registry import all_queries

_Q = all_queries()

DAY_NS = 86_400_000_000_000


def _daily_values(sf_small):
    """(days, per-type series, global series) of WHOLE-unit daily value
    sums — micro quanta floored per event, summed per day, ONE floor
    div (== trunc for the fixtures' non-negative sums)."""
    ev = pd.read_parquet(f"{sf_small}/events.parquet",
                         columns=["event_type", "ts", "value"])
    d = (pd.to_datetime(ev["ts"]).astype("datetime64[ns]")
         .astype("int64") // DAY_NS)
    m = np.floor(ev["value"].to_numpy() * VALUE_MICRO).astype("int64")
    ev = ev.assign(d=d, m=m)
    dmin, dmax = int(d.min()), int(d.max())
    days = np.arange(dmin, dmax + 1)
    series = {}
    for t, g in ev.groupby("event_type"):
        s = g.groupby("d")["m"].sum()
        series[t] = np.array(
            [int(s.get(dd, 0)) // VALUE_MICRO for dd in days], dtype=int)
    gm = ev.groupby("d")["m"].sum()
    glob = np.array(
        [int(gm.get(dd, 0)) // VALUE_MICRO for dd in days], dtype=int)
    return days, series, glob


def test_te_value_matches_counter(spark, sf_small):
    _, series, _ = _daily_values(sf_small)
    n = len(next(iter(series.values())))
    got = {r["direction"]: r for r in
           _Q["events_te_value"].build(spark, sf_small).collect()}
    for x_t, y_t in TE_PAIRS:
        sx, sy = int(series[x_t].sum()), int(series[y_t].sum())
        bx = (series[x_t] * n > sx).astype(int)
        by = (series[y_t] * n > sy).astype(int)
        cells = Counter(zip(by[1:], by[:-1], bx[:-1]))
        nn = sum(cells.values())
        c_yp, c_ypxp, c_ytyp = Counter(), Counter(), Counter()
        for (yt, yp, xp), c in cells.items():
            c_yp[yp] += c
            c_ypxp[(yp, xp)] += c
            c_ytyp[(yt, yp)] += c
        nano = sum(
            _half_away(1e9 * (c / nn)
                       * math.log(c * c_yp[yp]
                                  / (c_ypxp[(yp, xp)] * c_ytyp[(yt, yp)])))
            for (yt, yp, xp), c in cells.items())
        r = got[f"{x_t}->{y_t}"]
        assert r["n_steps"] == nn
        assert r["te_micro"] == nano // 1000
        assert r["te_micro"] >= -1  # plug-in TE >= 0 up to quant dust


def test_granger_value_matches_numpy_ftest(spark, sf_small):
    _, series, _ = _daily_values(sf_small)
    got = {r["direction"]: r for r in
           _Q["events_granger_value"].build(spark, sf_small).collect()}
    for x_t, y_t in GC_PAIRS:
        y = series[y_t][1:].astype(float)
        x1 = series[y_t][:-1].astype(float)
        x2 = series[x_t][:-1].astype(float)
        n = len(y)
        Xu = np.stack([np.ones(n), x1, x2], axis=1)
        Xr = np.stack([np.ones(n), x1], axis=1)
        bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
        br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
        rss_u = float(np.sum((y - Xu @ bu) ** 2))
        rss_r = float(np.sum((y - Xr @ br) ** 2))
        f = (rss_r - rss_u) * (n - 3) / rss_u
        r = got[f"{x_t}->{y_t}"]
        assert r["n_days"] == n
        # the engine route is Cramer determinants on double-cast exact
        # sums; lstsq is QR — agreement is float-method-level, not bit
        assert math.isclose(r["f_micro"] / 1e6, f,
                            rel_tol=1e-5, abs_tol=1e-4)
        assert r["causal"] == int(r["f_micro"] > GC_F_CRIT_MICRO)


def test_dow_anova_value_matches_numpy(spark, sf_small):
    days, series, _ = _daily_values(sf_small)
    got = {r["event_type"]: r for r in
           _Q["events_dow_anova_value"].build(spark, sf_small).collect()}
    assert set(got) == set(series)
    for t, xi in series.items():
        x = xi.astype(float)
        dows = (days + 4) % 7
        groups = [x[dows == w] for w in range(7) if (dows == w).any()]
        k = len(groups)
        n = len(x)
        grand = x.mean()
        ssb = sum(len(gr) * (gr.mean() - grand) ** 2 for gr in groups)
        ssw = sum(((gr - gr.mean()) ** 2).sum() for gr in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        r = got[t]
        assert r["n_days"] == n
        assert math.isclose(r["f_micro"] / 1e6, f,
                            rel_tol=1e-5, abs_tol=1e-4)
        crit = _half_away(CHI2_95[6] / 6 * 1e6)
        assert r["dow_effect"] == int(r["f_micro"] > crit)


def test_hurst_value_matches_numpy(spark, sf_small):
    _, _, glob = _daily_values(sf_small)
    x = glob.astype(float)
    n = len(x)
    lxs, lys = [], []
    for m in HURST_MS:
        k = n // m
        sums = x[:k * m].reshape(k, m).sum(axis=1)
        v = sums.var(ddof=1) / m ** 2
        lxs.append(math.log(m))
        lys.append(math.log(v))
    slope, _ = np.polyfit(lxs, lys, 1)
    row = _Q["events_hurst_value"].build(spark, sf_small).collect()[0]
    assert row["n_days"] == n
    assert math.isclose(row["slope_micro"] / 1e6, slope,
                        rel_tol=1e-4, abs_tol=1e-4)
    assert math.isclose(row["hurst_micro"] / 1e6, 1 + slope / 2,
                        rel_tol=1e-4, abs_tol=1e-4)


def test_pettitt_value_matches_pairwise_sgn(spark, sf_small):
    _, series, _ = _daily_values(sf_small)
    got = {r["event_type"]: r for r in
           _Q["events_pettitt_value"].build(spark, sf_small).collect()}
    for t, x in series.items():
        n = len(x)
        # brute-force sgn double sum — independent of the midrank
        # identity the query uses
        u = []
        for tt in range(1, n):
            s = 0
            for i in range(tt):
                for j in range(tt, n):
                    s += int(np.sign(x[i] - x[j]))
            u.append(s)
        k = max(abs(v) for v in u)
        t_star = min(i + 1 for i, v in enumerate(u) if abs(v) == k)
        p = 2 * math.exp(-6 * k * k / (n ** 3 + n ** 2))
        r = got[t]
        assert r["n_days"] == n
        assert r["k_stat"] == k
        assert r["t_star"] == t_star
        assert math.isclose(r["p_micro"] / 1e6, p,
                            rel_tol=1e-6, abs_tol=2e-6)
        assert r["significant"] == int(r["p_micro"] <= PT_SIG_MICRO)


R14_CASES = [
    # value-weighted daily monitors: exact micro accumulation, one
    # trunc div to whole units, then the count monitors' integer (or
    # shared-text double, for Granger) arithmetic
    "events_te_value",
    "events_granger_value",
    "events_dow_anova_value",
    "events_hurst_value",
    "events_pettitt_value",
]


@pytest.mark.parametrize("name", R14_CASES)
def test_r14_partition_invariance(spark, sf_small, name):
    """Narrow scan partitions, prime shuffle width, small Arrow batches
    must not change a single output value (the standing hostile-splits
    gate)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    conf = [("spark.sql.files.maxPartitionBytes", "65536"),
            ("spark.sql.shuffle.partitions", "7"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "37")]
    old = {k: spark.conf.get(k) for k, _ in conf}
    try:
        for k, v in conf:
            spark.conf.set(k, v)
        skewed = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert base == skewed


@pytest.mark.parametrize("name", R14_CASES)
def test_r14_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep (the standing gate for every new
    timestamp-bearing query): day keys come from integer ts_ns div,
    so a UTC+14 session zone must not move a bucket or verdict."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_value_fold_equals_count_fold_on_unit_values(spark):
    """Seam law: when every event's value is exactly 1.0, the
    whole-unit daily VALUE series equals the daily COUNT series, so
    the value folds must reproduce the count folds cell for cell —
    pins the micro quantum, the div placement, and the fold keys in
    one synthetic check (both signs of hour index included)."""
    from impractical_impala_spark.streaming.dailyfold import (
        daily_counts_by_type, daily_values_by_type,
        daily_counts_global, daily_values_global)

    HOUR_NS = 3_600_000_000_000
    hrs = [-49, -24, -1, 0, 1, 23, 24, 47]
    # state rows: c events in the hour, each value 1.0 -> s = c * micro
    state = spark.createDataFrame(
        [("a", h, 2 + (i % 3), (2 + (i % 3)) * VALUE_MICRO)
         for i, h in enumerate(hrs)]
        + [("b", h, 5, 5 * VALUE_MICRO) for h in hrs],
        "event_type string, hr long, c long, s long")
    got_t = (daily_values_by_type(state).toPandas()
             .sort_values(["d", "event_type"]).reset_index(drop=True))
    want_t = (daily_counts_by_type(state).toPandas()
              .sort_values(["d", "event_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got_t, want_t)
    got_g = (daily_values_global(state).toPandas()
             .sort_values("d").reset_index(drop=True))
    want_g = (daily_counts_global(state).toPandas()
              .sort_values("d").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_g, want_g)
