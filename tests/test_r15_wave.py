"""Round-15 wave: third implementations + cross-laws for the four
debuts (VERDICT r14 asks #4/#5/#6/#8).

- ann_lsh_grid: the r=0 edge must EQUAL ann_lsh_tables_sweep row for
  row (the asked edge cross-law); membership is monotone in both axes
  (nested candidate unions); and a from-scratch numpy replay at
  sf0.001 reproduces every output cell.
- ann_pq_m_sweep: corpus reconstruction error is non-increasing in M
  (nested-slicing argument: the fine code space contains every coarse
  choice); the M=PQ_M point runs the identical search as
  ann_ivf_pq_sweep's nprobe=N_PROBE row (hence ann_ivf_pq_trained's
  rank-1 — the asked anchor); numpy replays the reconstruction sums.
- events_retail454_rollup: a pure-Python datetime replay reproduces
  the whole table at sf0.001; per-type totals equal the calendar
  quarterly rollup's (same universe of days); and the 4-5-4 label
  function satisfies its structural laws over six decades of days
  (years start on Sundays on/after Feb 1, quarters are 13-week
  blocks, week 53 folds into Q4).
- dedup_shingle_by_source: slice sums partition the global panels —
  every dedup_shingle_sweep row re-derives exactly from the
  per-(lang, source) raw sums.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _collect(spark, name, sf):
    return _Q[name].build(spark, sf).toPandas()


def _round_half_up(x: float, digits: int) -> float:
    s = 10.0 ** digits
    return np.floor(np.abs(x) * s + 0.5) / s * np.sign(x)


# ------------------------------------------------------ ann_lsh_grid
def test_lsh_grid_r0_edge_equals_tables_sweep(spark, sf_oracle):
    grid = _collect(spark, "ann_lsh_grid", sf_oracle)
    sweep = _collect(spark, "ann_lsh_tables_sweep", sf_oracle)
    edge = (grid[grid.probe_radius == 0]
            .drop(columns=["probe_radius"])
            .sort_values("n_tables").reset_index(drop=True))
    sweep = sweep.sort_values("n_tables").reset_index(drop=True)
    pd.testing.assert_frame_equal(edge, sweep[edge.columns.tolist()])


def test_lsh_grid_monotone_in_both_axes(spark, sf_oracle):
    g = _collect(spark, "ann_lsh_grid", sf_oracle).set_index(
        ["n_tables", "probe_radius"]).sort_index()
    for col in ["n_cand_pairs", "n_answered", "n_hit1"]:
        for rad in (0, 1):
            vals = [g.loc[(t, rad), col] for t in (1, 2, 3)]
            assert vals == sorted(vals), (col, "tables axis", rad, vals)
        for t in (1, 2, 3):
            assert g.loc[(t, 0), col] <= g.loc[(t, 1), col], (
                col, "radius axis", t)


def _load_emb(sf):
    tbl = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    assert (tbl.vec_id.values == np.arange(len(tbl))).all()
    return np.stack(tbl.embedding.values).astype(np.float64)


def test_lsh_grid_numpy_replay(spark, sf_small):
    from impractical_impala_spark.queries.similarity import (
        BITS_PER_TABLE, N_QUERIES, N_TABLES, _planes)

    v = _load_emb(sf_small)
    n = len(v)
    planes = np.array(_planes(), dtype=np.float64)  # 12 x 64
    bits = (v @ planes.T) > 0                       # n x 12
    buckets = np.zeros((n, N_TABLES), dtype=np.int64)
    for t in range(N_TABLES):
        for r in range(BITS_PER_TABLE):
            buckets[:, t] += bits[:, t * BITS_PER_TABLE + r] << r
    pop = np.array([bin(x).count("1") for x in range(16)])
    # per-table Hamming distance between all pairs: n x n x T
    d = pop[buckets[:, None, :] ^ buckets[None, :, :]]
    norms = np.sqrt((v * v).sum(axis=1))
    cos = (v @ v.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    exact_nn = cos[:N_QUERIES].argmax(axis=1)
    exact_cos = _round_half_up(
        cos[np.arange(N_QUERIES), exact_nn], 6)
    got = (_collect(spark, "ann_lsh_grid", sf_small)
           .sort_values(["n_tables", "probe_radius"])
           .reset_index(drop=True))
    rows = []
    for nt in (1, 2, 3):
        for rad in (0, 1):
            qual = (d[:, :, :nt] <= rad).any(axis=2)
            np.fill_diagonal(qual, False)
            iu = np.triu_indices(n, 1)
            n_cand = int(qual[iu].sum())
            hits = gap = answered = 0
            for q in range(N_QUERIES):
                cand = np.where(qual[q])[0]
                if len(cand) == 0:
                    continue
                answered += 1
                best = cand[cos[q, cand].argmax()]
                lsh_cos = _round_half_up(cos[q, best], 6)
                if best == exact_nn[q]:
                    hits += 1
                gap += int(_round_half_up(
                    (exact_cos[q] - lsh_cos) * 1e6, 0))
            rows.append((nt, rad, n_cand, N_QUERIES, answered, hits,
                         hits * 1_000_000 // N_QUERIES, gap))
    want = pd.DataFrame(rows, columns=got.columns.tolist())
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


# ----------------------------------------------------- ann_pq_m_sweep
def test_pq_m_sweep_recon_monotone_and_m4_anchor(spark, sf_oracle):
    ms = (_collect(spark, "ann_pq_m_sweep", sf_oracle)
          .sort_values("m_subspaces").reset_index(drop=True))
    recon = ms.recon_err_micro.tolist()
    assert recon == sorted(recon, reverse=True), recon
    assert (ms.code_bytes == ms.m_subspaces).all()
    assert (ms.sub_dim * ms.m_subspaces == 64).all()
    # the M=PQ_M point runs the IDENTICAL trained search as
    # ann_ivf_pq_sweep's nprobe=N_PROBE row
    from impractical_impala_spark.queries.similarity import N_PROBE
    from impractical_impala_spark.queries.training_extras import PQ_M

    pqs = _collect(spark, "ann_ivf_pq_sweep", sf_oracle)
    anchor = pqs[pqs.n_probe == N_PROBE].iloc[0]
    m4 = ms[ms.m_subspaces == PQ_M].iloc[0]
    for col in ["n_queries", "n_answered", "n_hit1", "recall1_ppm",
                "cos_gap_micro"]:
        assert m4[col] == anchor[col], (col, m4[col], anchor[col])


def test_pq_m_sweep_recon_numpy_replay(spark, sf_small):
    from impractical_impala_spark.queries.similarity import M_SWEEP
    from impractical_impala_spark.queries.training_extras import PQ_K

    v32 = pq.read_table(f"{sf_small}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    v32 = v32.sort_values("vec_id").reset_index(drop=True)
    v = np.stack(v32.embedding.values).astype(np.float64)
    got = (_collect(spark, "ann_pq_m_sweep", sf_small)
           .set_index("m_subspaces").recon_err_micro)
    for pm in M_SWEEP:
        ps = 64 // pm
        total = np.zeros(len(v))
        for m in range(pm):
            sl = v[:, m * ps:(m + 1) * ps]
            cb = sl[:PQ_K]
            # fold in index order like the Spark aggregate(): the
            # slice is built left-to-right, so a left-fold sum equals
            # sequential addition over the subspace dimensions
            d2 = np.zeros((len(v), PQ_K))
            for i in range(ps):
                diff = sl[:, i][:, None] - cb[:, i][None, :]
                d2 = d2 + diff * diff
            total = total + d2.min(axis=1)
        micro = sum(int(_round_half_up(x * 1e6, 0)) for x in total)
        assert int(got.loc[pm]) == micro, (pm, int(got.loc[pm]), micro)


# ---------------------------------------------- events_retail454_rollup
def _fy454(day_index: int) -> str:
    date = dt.date(1970, 1, 1) + dt.timedelta(days=day_index)
    y = date.year

    def anchor(yy):
        feb1 = dt.date(yy, 2, 1)
        return feb1 + dt.timedelta(days=(6 - feb1.weekday()) % 7)

    a1 = anchor(y)
    fy, astart = (y, a1) if date >= a1 else (y - 1, anchor(y - 1))
    wk = (date - astart).days // 7
    return f"FY{fy}-Q{min(wk // 13, 3) + 1}"


def test_retail454_python_datetime_replay(spark, sf_small):
    ev = pq.read_table(f"{sf_small}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    HOUR_NS = 3_600_000_000_000
    # ts is timestamp[us]; the engine's ts_ns column is epoch nanos
    ev["ts_ns"] = ev.ts.astype("int64") * 1_000
    ev["d"] = (ev.ts_ns // HOUR_NS) // 24
    ev["m"] = np.floor(ev.value * 1_000_000).astype("int64")
    day = (ev.groupby(["event_type", "d"])
           .agg(s=("m", "sum"), n=("m", "size")).reset_index())
    day["fq"] = day.d.map(lambda d: _fy454(int(d)))
    want = (day.groupby(["event_type", "fq"])
            .agg(n_events=("n", "sum"), n_active_days=("d", "size"),
                 micro=("s", "sum")).reset_index())
    want["sum_value"] = want.micro / 1e6
    want = (want.drop(columns=["micro"])
            .sort_values(["event_type", "fq"]).reset_index(drop=True))
    got = (_collect(spark, "events_retail454_rollup", sf_small)
           .sort_values(["event_type", "fq"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"n_events": "int64",
                                           "n_active_days": "int64"}),
        want.astype({"n_events": "int64", "n_active_days": "int64"}))


def test_retail454_totals_equal_calendar_rollup(spark, sf_oracle):
    r454 = (_collect(spark, "events_retail454_rollup", sf_oracle)
            .groupby("event_type")
            .agg(n=("n_events", "sum"), days=("n_active_days", "sum"),
                 val=("sum_value", "sum")))
    cal = (_collect(spark, "events_quarterly_rollup", sf_oracle)
           .groupby("event_type")
           .agg(n=("n_events", "sum"), days=("n_active_days", "sum"),
                val=("sum_value", "sum")))
    assert (r454.n == cal.n).all()
    assert (r454.days == cal.days).all()
    assert np.allclose(r454.val, cal.val, rtol=0, atol=1e-6)


def test_retail454_label_structure_laws():
    """Six decades of days: every fiscal year starts on a Sunday
    on/after Feb 1; quarters 1-3 span exactly 91 days; Q4 spans 91-98
    (the 53rd week folds in); labels are contiguous runs."""
    start = (dt.date(1995, 1, 1) - dt.date(1970, 1, 1)).days
    end = (dt.date(2055, 1, 1) - dt.date(1970, 1, 1)).days
    labels = [_fy454(d) for d in range(start, end)]
    runs = {}
    for lab in labels:
        runs[lab] = runs.get(lab, 0) + 1
    # drop the clipped first/last labels
    for lab in (labels[0], labels[-1]):
        runs.pop(lab, None)
    for lab, span in runs.items():
        q = int(lab[-1])
        if q < 4:
            assert span == 91, (lab, span)
        else:
            assert 91 <= span <= 98, (lab, span)
    # contiguity: a label never reappears after it ends
    seen, prev = set(), None
    for lab in labels:
        if lab != prev:
            assert lab not in seen, lab
            seen.add(lab)
            prev = lab
    # year starts: first day of each FY-Q1 run is a Sunday >= Feb 1
    firsts = {}
    for i, lab in enumerate(labels):
        if lab.endswith("Q1") and lab not in firsts and i > 0 \
                and labels[i - 1] != lab:
            firsts[lab] = start + i
    for lab, d in firsts.items():
        date = dt.date(1970, 1, 1) + dt.timedelta(days=d)
        assert date.weekday() == 6, (lab, date)  # Sunday
        assert (date.month, date.day) >= (2, 1) and date.month == 2, (
            lab, date)
        assert date.day <= 7, (lab, date)


# ------------------------------------------- dedup_shingle_by_source
def test_shingle_by_source_sums_to_global(spark, sf_oracle):
    per = _collect(spark, "dedup_shingle_by_source", sf_oracle)
    glob = (_collect(spark, "dedup_shingle_sweep", sf_oracle)
            .set_index("k"))
    for k, grp in per.groupby("k"):
        np_, nn_ = int(grp.n_planted.sum()), int(grp.n_neighbor.sum())
        pj = int(grp.planted_jacc_sum_ppm.sum())
        pr = int(grp.recall_hits.sum())
        nj = int(grp.neighbor_jacc_sum_ppm.sum())
        g = glob.loc[k]
        assert np_ == g.n_planted and nn_ == g.n_neighbor
        assert pj // np_ == g.planted_mean_jacc_ppm
        assert pr * 1_000_000 // np_ == g.recall_ppm
        assert nj // nn_ == g.neighbor_mean_jacc_ppm
        assert pj // np_ - nj // nn_ == g.separation_ppm


# --------------------------------------------- events_retail454_months
def _fm454(day_index: int) -> str:
    date = dt.date(1970, 1, 1) + dt.timedelta(days=day_index)
    y = date.year

    def anchor(yy):
        feb1 = dt.date(yy, 2, 1)
        return feb1 + dt.timedelta(days=(6 - feb1.weekday()) % 7)

    a1 = anchor(y)
    fy, astart = (y, a1) if date >= a1 else (y - 1, anchor(y - 1))
    wk = min((date - astart).days // 7, 52)
    wq, wiq = min(wk // 13, 3), wk - min(wk // 13, 3) * 13
    m = wq * 3 + (1 if wiq < 4 else 2 if wiq < 9 else 3)
    return f"FY{fy}-M{m:02d}"


def test_retail454_months_python_replay_and_quarter_rollup(spark,
                                                           sf_small):
    ev = pq.read_table(f"{sf_small}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    HOUR_NS = 3_600_000_000_000
    ev["ts_ns"] = ev.ts.astype("int64") * 1_000
    ev["d"] = (ev.ts_ns // HOUR_NS) // 24
    ev["m"] = np.floor(ev.value * 1_000_000).astype("int64")
    day = (ev.groupby(["event_type", "d"])
           .agg(s=("m", "sum"), n=("m", "size")).reset_index())
    day["fm"] = day.d.map(lambda d: _fm454(int(d)))
    want = (day.groupby(["event_type", "fm"])
            .agg(n_events=("n", "sum"), n_active_days=("d", "size"),
                 micro=("s", "sum")).reset_index())
    want["sum_value"] = want.micro / 1e6
    want = (want.drop(columns=["micro"])
            .sort_values(["event_type", "fm"]).reset_index(drop=True))
    got = (_collect(spark, "events_retail454_months", sf_small)
           .sort_values(["event_type", "fm"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"n_events": "int64",
                                           "n_active_days": "int64"}),
        want.astype({"n_events": "int64", "n_active_days": "int64"}))


def test_retail454_months_roll_up_to_quarters(spark, sf_oracle):
    mo = _collect(spark, "events_retail454_months", sf_oracle)
    mo["fq"] = (mo.fm.str[:-4] + "-Q"
                + ((mo.fm.str[-2:].astype(int) - 1) // 3 + 1).astype(str))
    rolled = (mo.groupby(["event_type", "fq"])
              .agg(n_events=("n_events", "sum"),
                   n_active_days=("n_active_days", "sum"),
                   sum_value=("sum_value", "sum")).reset_index()
              .sort_values(["event_type", "fq"]).reset_index(drop=True))
    q = (_collect(spark, "events_retail454_rollup", sf_oracle)
         .sort_values(["event_type", "fq"]).reset_index(drop=True))
    assert (rolled.event_type == q.event_type).all()
    assert (rolled.fq == q.fq).all()
    assert (rolled.n_events.values == q.n_events.values).all()
    assert (rolled.n_active_days.values == q.n_active_days.values).all()
    assert np.allclose(rolled.sum_value, q.sum_value, rtol=0, atol=1e-6)


def test_retail454_month_structure_laws():
    """4-5-4 means exactly that: per fiscal year, months are
    28/35/28-day blocks per quarter, except month 12 which absorbs
    week 53 (28-35 days); month labels sort lexicographically in
    calendar order."""
    start = (dt.date(1995, 1, 1) - dt.date(1970, 1, 1)).days
    end = (dt.date(2055, 1, 1) - dt.date(1970, 1, 1)).days
    labels = [_fm454(d) for d in range(start, end)]
    runs = {}
    for lab in labels:
        runs[lab] = runs.get(lab, 0) + 1
    for lab in (labels[0], labels[-1]):
        runs.pop(lab, None)
    for lab, span in runs.items():
        m = int(lab[-2:])
        want = 35 if m % 3 == 2 else 28  # 4-5-4 week pattern
        if m == 12:
            assert 28 <= span <= 35, (lab, span)
        else:
            assert span == want, (lab, span)
    assert labels == sorted(labels), "labels must sort chronologically"
