"""Round-15 third wave: the widened x1e3 ANOVA/ICC milli registers
(SCALE.md's r15 carve-out, closed in code).

- `_ha_wide_sql` is the EXACT narrow `_ha_sql` below 9e18 (so every
  committed green hash stands — A/B-verified row-for-row at sf0.01 at
  change time) and an exact 128-bit cast at/past it, where a double is
  already an integer (>= 2^53). Pinned cross-engine on literals that
  straddle the branch, including the magnitudes where the OLD BIGINT
  path overflowed.
- The isolated suff->F arithmetic agrees Spark vs DuckDB vs a plain
  Python replay on per-group statistics whose t_milli passes int64 —
  the scenario the old registers could not represent (DuckDB raised,
  non-ANSI Spark wrapped).
- `dow_anova_from_daily` end-to-end on a synthetic huge-count daily
  frame reproduces the same Python replay through the real code path
  (which also moves the streaming dow finalizer, since it shares the
  helper).
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.queries.monitor_eval import (_ha_sql,
                                                           _ha_wide_sql)


def _half_away(x: float) -> int:
    return (int(math.floor(x + 0.5)) if x >= 0
            else -int(math.floor(-x + 0.5)))


def _ha_wide_py(x: float) -> int:
    # the Python twin of _ha_wide_sql: narrow rounding below 9e18,
    # exact int conversion of the (integer-valued) double past it
    return _half_away(x) if abs(x) < 9.0e18 else int(x)


# last literals sit near the helper's 2^73 exactness contract and at
# magnitudes where double ULP is ~2^10 (so a string-mediated decimal
# cast WOULD diverge from the exact-binary value — the Spark trap the
# hi/lo decomposition avoids)
BRANCH_LITERALS = [0.0, 2.5, -2.5, 1234.5, -1234.5, 8.9e18, -8.9e18,
                   9.1e18, -9.1e18, 1.23e19, -1.23e19, 7.7e20, -7.7e20,
                   5.0e21, -5.0e21]


def test_ha_wide_cross_engine_literals(spark):
    for x in BRANCH_LITERALS:
        want = _ha_wide_py(x)
        got_duck = duckdb.sql(
            f"SELECT {_ha_wide_sql(repr(x), 'HUGEINT')} AS r").fetchone()[0]
        got_spark = spark.sql(
            f"SELECT {_ha_wide_sql(repr(x) + 'D')} AS r").collect()[0].r
        assert int(got_duck) == want, (x, got_duck, want)
        assert int(got_spark) == want, (x, got_spark, want)


def test_ha_wide_equals_narrow_below_ceiling():
    for x in [0.0, 0.49, 0.5, -0.5, 7.5, 1e6 + 0.5, 3.14e12, -2.7e15,
              8.99e18, -8.99e18]:
        narrow, wide = duckdb.sql(
            f"SELECT {_ha_sql(repr(x))} AS a,"
            f" {_ha_wide_sql(repr(x), 'HUGEINT')} AS b").fetchone()
        assert int(narrow) == int(wide), (x, narrow, wide)


# Per-dow groups with counts big enough that t_milli = s^2*1e3/n and
# 1000*qq pass int64 (c ~ 2e8 -> t_milli ~ 8e19, 1000*qq ~ 5.6e20)
# while the RAW statistics s, q stay inside it (q ~ 5.6e17 — the
# regime the design guarantees): the exact scenario the old BIGINT
# milli registers could not hold.
_HUGE_DAILY = [
    # (event_type, d, c) — 14 consecutive days, two of each weekday
    ("big", d, 200_000_000 + d * 137) for d in range(100, 114)
] + [
    ("small", d, 10 + (d * 7) % 13) for d in range(100, 114)
]


def _dow_replay(rows):
    """Plain-Python replay of dow_anova_from_daily's arithmetic
    (zero-fill is a no-op here: the day range is dense)."""
    out = {}
    for et in sorted({r[0] for r in rows}):
        series = [(d, c) for (t, d, c) in rows if t == et]
        groups = {}
        for d, c in series:
            groups.setdefault((d + 4) % 7, []).append(c)
        k = len(groups)
        nn = sum(len(v) for v in groups.values())
        qq = sum(c * c for v in groups.values() for c in v)
        b = 0
        for dow in groups:
            n = len(groups[dow])
            s = sum(groups[dow])
            b += _ha_wide_py(float(s) * float(s) * 1e3 / n)
        ss = sum(c for v in groups.values() for c in v)
        ha_tot = _ha_wide_py(float(ss) * float(ss) * 1e3 / nn)
        ssb = b - ha_tot
        ssw = 1000 * qq - b
        f = (float(ssb) / (k - 1)) / (float(ssw) / (nn - k))
        out[et] = _half_away(f * 1e6)
    return out


def test_dow_anova_huge_counts_spark_matches_python_replay(spark):
    from impractical_impala_spark.queries.hypothesis import (
        dow_anova_from_daily)

    daily = spark.createDataFrame(_HUGE_DAILY, "event_type string,"
                                  " d long, c long")
    got = {r.event_type: r.f_micro
           for r in dow_anova_from_daily(daily).collect()}
    want = _dow_replay(_HUGE_DAILY)
    assert got == want, (got, want)
    # and the huge group really is past int64 in its between-term
    # (while the raw q = sum c^2 stays inside — the designed regime)
    s_big = sum(c for (t, d, c) in _HUGE_DAILY if t == "big") / 7
    q_big = sum(c * c for (t, d, c) in _HUGE_DAILY if t == "big")
    assert s_big * s_big * 1e3 / 2 > 2 ** 63
    assert 1000 * q_big > 2 ** 63 > q_big


def test_dow_anova_huge_counts_duckdb_agrees(spark):
    """The registered oracle text (suff->agg->F over HUGEINT) computes
    the same panel from the same per-group statistics."""
    from impractical_impala_spark.queries.hypothesis import (
        _DOW_F, dow_anova_from_daily)

    con = duckdb.connect()
    con.execute("CREATE TABLE daily(event_type VARCHAR, d BIGINT,"
                " c BIGINT)")
    con.executemany("INSERT INTO daily VALUES (?, ?, ?)", _HUGE_DAILY)
    sql = f"""
WITH per AS (
    SELECT event_type, (d + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS q
    FROM daily GROUP BY 1, 2
), suff AS (
    SELECT event_type, n, s, q,
           {_ha_wide_sql("CAST(s AS DOUBLE) * CAST(s AS DOUBLE) * 1e3 / n",
                         "HUGEINT")} AS t_milli
    FROM per
), agg AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
           CAST(SUM(q) AS BIGINT) AS qq,
           CAST(SUM(t_milli) AS HUGEINT) AS b_milli
    FROM suff GROUP BY 1
)
SELECT event_type, {_ha_sql(f"({_DOW_F}) * 1e6")} AS f_micro
FROM agg ORDER BY event_type
"""
    got_duck = dict(con.execute(sql).fetchall())
    daily_df = spark.createDataFrame(_HUGE_DAILY, "event_type string,"
                                     " d long, c long")
    got_spark = {r.event_type: r.f_micro
                 for r in dow_anova_from_daily(daily_df).collect()}
    assert {k: int(v) for k, v in got_duck.items()} == got_spark


# ------------------------------------------- residual IVF-PQ debuts
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from impractical_impala_spark.registry import all_queries

_Q = all_queries()


def _collect(spark, name, sf):
    return _Q[name].build(spark, sf).toPandas()


def _round_half_up(x, digits):
    s = 10.0 ** digits
    return np.floor(np.abs(x) * s + 0.5) / s * np.sign(x)


def _load_vecs(sf):
    tbl = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    tbl = tbl.sort_values("vec_id").reset_index(drop=True)
    assert (tbl.vec_id.values == np.arange(len(tbl))).all()
    return np.stack(tbl.embedding.values).astype(np.float64)


def _trained_centroids(spark, sf):
    """Fetch the exact Lloyd-trained centroid table the product code
    builds (the replay re-implements the SEARCH, not the training —
    training already has its own unrolled-oracle + replay coverage)."""
    from impractical_impala_spark.queries.similarity import (
        _emb, ivf_training_sample, train_ivf_centroids)

    cent = train_ivf_centroids(
        spark, ivf_training_sample(_emb(spark, sf))).toPandas()
    cent = cent.sort_values("cell_id").reset_index(drop=True)
    return np.stack(cent.cv.values).astype(np.float64)


def _seq_dot(a, b_mat):
    """Left-fold dot products in index order (Spark's aggregate())."""
    acc = np.zeros((a.shape[0], b_mat.shape[0]))
    for j in range(a.shape[1]):
        acc = acc + a[:, j][:, None] * b_mat[:, j][None, :]
    return acc


def _seq_sqdist(a, b_mat):
    """Left-fold squared distances in index order."""
    acc = np.zeros((a.shape[0], b_mat.shape[0]))
    for j in range(a.shape[1]):
        diff = a[:, j][:, None] - b_mat[:, j][None, :]
        acc = acc + diff * diff
    return acc


def _rpq_replay(v, cents, n_probe, pq_m, pq_k, n_queries, topk):
    n, dim = v.shape
    ps = dim // pq_m
    norms = np.sqrt(np.array([
        np.sum(v[i] * v[i]) for i in range(n)]))  # fold-order irrelev.
    cnorms = np.sqrt(np.array([
        np.sum(c * c) for c in cents]))
    ccos = _seq_dot(v, cents) / (norms[:, None] * cnorms[None, :])
    order = np.lexsort((np.arange(cents.shape[0])[None, :].repeat(n, 0),
                        -ccos))  # by ccos desc, cell asc per row
    assigned = order[:, 0]
    rv = v - cents[assigned]
    # codebook: residual slices of the first pq_k vectors
    codes = np.zeros((n, pq_m), dtype=np.int64)
    ld = {}
    for m in range(pq_m):
        sl = rv[:, m * ps:(m + 1) * ps]
        cb = sl[:pq_k]
        d2 = _seq_sqdist(sl, cb)
        codes[:, m] = d2.argmin(axis=1)  # first-min tie-break = code asc
        ld[m] = d2
    rows = []
    for q in range(n_queries):
        probe_cells = set(order[q, :n_probe].tolist())
        cand = [b for b in range(n_queries, n)
                if assigned[b] in probe_cells]
        scored = []
        for b in cand:
            # the LUT entry is the QUERY residual w.r.t. the db's
            # assigned cell (which the query must have probed)
            qr = v[q] - cents[assigned[b]]
            total = 0.0
            for m in range(pq_m):
                sl = qr[m * ps:(m + 1) * ps]
                cbv = (v[codes[b, m]]
                       - cents[assigned[codes[b, m]]])[m * ps:(m + 1) * ps]
                d = 0.0
                for j in range(ps):
                    d = d + (sl[j] - cbv[j]) * (sl[j] - cbv[j])
                total = total + d
            scored.append((float(_round_half_up(total, 6)), b))
        scored.sort()
        for rank, (adc, b) in enumerate(scored[:topk], start=1):
            rows.append((q, rank, b, adc))
    return pd.DataFrame(rows, columns=["query_id", "rank",
                                       "neighbor_id", "adc_r6"])


def test_residual_pq_numpy_replay(spark, sf_small):
    from impractical_impala_spark.queries.similarity import (
        N_PROBE, N_QUERIES)
    from impractical_impala_spark.queries.training_extras import (
        ADC_TOPK, PQ_K, PQ_M)

    v = _load_vecs(sf_small)
    cents = _trained_centroids(spark, sf_small)
    want = _rpq_replay(v, cents, N_PROBE, PQ_M, PQ_K, N_QUERIES,
                       ADC_TOPK)
    got = (_collect(spark, "ann_ivf_residual_pq", sf_small)
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "rank": "int64",
                    "neighbor_id": "int64"}),
        want.astype({"query_id": "int64", "rank": "int64",
                     "neighbor_id": "int64"}))


def test_residual_pq_routing_matches_plain(spark, sf_oracle):
    """Routing (trained centroids, probes, assignment) is shared with
    ann_ivf_pq_trained, so the SET of answered queries must match —
    only the compressed geometry (hence ranking) may differ."""
    res = _collect(spark, "ann_ivf_residual_pq", sf_oracle)
    plain = _collect(spark, "ann_ivf_pq_trained", sf_oracle)
    assert set(res.query_id) == set(plain.query_id)
    # both rank within the same candidate cells: per query the result
    # count matches (same candidate set, same top-k truncation)
    rc = res.groupby("query_id").size()
    pc = plain.groupby("query_id").size()
    assert rc.to_dict() == pc.to_dict()


def test_residual_gain_plain_equals_m_sweep(spark, sf_oracle):
    from impractical_impala_spark.queries.training_extras import PQ_M

    gain = _collect(spark, "ann_pq_residual_gain", sf_oracle)
    msweep = _collect(spark, "ann_pq_m_sweep", sf_oracle)
    plain_row = gain[gain.encoding == "plain"].iloc[0]
    anchor = msweep[msweep.m_subspaces == PQ_M].iloc[0]
    assert int(plain_row.recon_err_micro) == int(anchor.recon_err_micro)
    assert (gain.n_vectors == gain.n_vectors.iloc[0]).all()


def test_residual_gain_numpy_replay(spark, sf_small):
    from impractical_impala_spark.queries.training_extras import (
        PQ_K, PQ_M)

    v = _load_vecs(sf_small)
    cents = _trained_centroids(spark, sf_small)
    norms = np.sqrt(np.array([np.sum(x * x) for x in v]))
    cnorms = np.sqrt(np.array([np.sum(c * c) for c in cents]))
    ccos = _seq_dot(v, cents) / (norms[:, None] * cnorms[None, :])
    order = np.lexsort(
        (np.arange(cents.shape[0])[None, :].repeat(len(v), 0), -ccos))
    rv = v - cents[order[:, 0]]
    got = (_collect(spark, "ann_pq_residual_gain", sf_small)
           .set_index("encoding").recon_err_micro)
    ps = v.shape[1] // PQ_M
    for enc, mat in (("plain", v), ("residual", rv)):
        total = np.zeros(len(mat))
        for m in range(PQ_M):
            sl = mat[:, m * ps:(m + 1) * ps]
            d2 = _seq_sqdist(sl, sl[:PQ_K])
            total = total + d2.min(axis=1)
        micro = sum(int(_round_half_up(x * 1e6, 0)) for x in total)
        assert int(got.loc[enc]) == micro, (enc, int(got.loc[enc]), micro)


# --------------------------------------------- LSH bits-per-table
def test_bits_sweep_b4_equals_tables_sweep_t3(spark, sf_oracle):
    """B=4 splits the 12 planes exactly like ann_lsh_bucketed's three
    4-bit tables, so the row must equal the tables sweep's T=3 row."""
    bits = _collect(spark, "ann_lsh_bits_sweep", sf_oracle)
    sweep = _collect(spark, "ann_lsh_tables_sweep", sf_oracle)
    b4 = bits[bits.bits_per_table == 4].iloc[0]
    t3 = sweep[sweep.n_tables == 3].iloc[0]
    for col in ["n_cand_pairs", "n_queries", "n_answered", "n_hit1",
                "recall1_ppm", "cos_gap_micro"]:
        assert int(b4[col]) == int(t3[col]), (col, b4[col], t3[col])


def test_bits_sweep_b6_nested_in_both(spark, sf_oracle):
    """Each 6-bit table's plane set contains a whole 4-bit AND a whole
    3-bit table's ({0..5} >= {0..3} and {0..2}; {6..11} >= {8..11} and
    {9..11}), so B=6 candidates are a subset of both other splits —
    counts monotone. B=4 vs B=3 is intentionally NOT asserted (planes
    {4..7} contain no whole 3-bit table: not nested)."""
    g = _collect(spark, "ann_lsh_bits_sweep", sf_oracle).set_index(
        "bits_per_table")
    for col in ["n_cand_pairs", "n_answered", "n_hit1"]:
        assert g.loc[6, col] <= g.loc[4, col], (col, "6 vs 4")
        assert g.loc[6, col] <= g.loc[3, col], (col, "6 vs 3")
    assert (g.n_tables == [12 // b for b in g.index]).all()


def test_bits_sweep_numpy_replay(spark, sf_small):
    from impractical_impala_spark.queries.similarity import (
        BITS_SWEEP, N_PLANES, N_QUERIES, _planes)

    v = _load_vecs(sf_small)
    n = len(v)
    planes = np.array(_planes(), dtype=np.float64)
    bits12 = (_seq_dot(v, planes) > 0).astype(np.int64)
    norms = np.sqrt(np.array([np.sum(x * x) for x in v]))
    cos = (v @ v.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    exact_nn = cos[:N_QUERIES].argmax(axis=1)
    exact_cos = _round_half_up(cos[np.arange(N_QUERIES), exact_nn], 6)
    got = (_collect(spark, "ann_lsh_bits_sweep", sf_small)
           .sort_values("bits_per_table").reset_index(drop=True))
    rows = []
    for bb in BITS_SWEEP:
        nt = N_PLANES // bb
        buckets = np.zeros((n, nt), dtype=np.int64)
        for t in range(nt):
            for r in range(bb):
                buckets[:, t] += bits12[:, t * bb + r] << r
        qual = (buckets[:, None, :] == buckets[None, :, :]).any(axis=2)
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
            gap += int(_round_half_up((exact_cos[q] - lsh_cos) * 1e6, 0))
        rows.append((bb, nt, n_cand, N_QUERIES, answered, hits,
                     hits * 1_000_000 // N_QUERIES, gap))
    want = pd.DataFrame(rows, columns=got.columns.tolist())
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))
