"""Independent numpy references for the round-6 statistical kernels.

The oracle-parity harness proves Spark == DuckDB; these tests prove the
shared formula itself is the TEXTBOOK statistic (a bug mirrored into
both engines would pass parity — this is the third, independent
implementation that catches it). Data is pulled once per kernel from
the sf0.001 fixture and recomputed with plain numpy/pandas.
"""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from impractical_impala_spark.sources import load_table


def test_autocorr24_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        HOUR_NS, events_hourly_autocorr24)
    got = {r.event_type: r.r24
           for r in events_hourly_autocorr24(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
          .toPandas())
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("hr").size()
        full = counts.reindex(
            range(int(counts.index.min()), int(counts.index.max()) + 1),
            fill_value=0).to_numpy(dtype=float)
        if len(full) <= 24:
            assert et not in got
            continue
        x, y = full[24:], full[:-24]
        ref = np.corrcoef(x, y)[0, 1]
        assert math.isclose(got[et], round(ref, 6), abs_tol=2e-6), (
            f"{et}: spark {got[et]} vs numpy {ref}")


def test_fano_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        HOUR_NS, events_fano_burstiness)
    got = {r.event_type: r for r in
           events_fano_burstiness(spark, sf_small).collect()}
    ev = (load_table(spark, sf_small, "events")
          .select("event_type", F.expr(f"ts_ns div {HOUR_NS}").alias("hr"))
          .toPandas())
    for et, grp in ev.groupby("event_type"):
        counts = grp.groupby("hr").size()
        full = counts.reindex(
            range(int(counts.index.min()), int(counts.index.max()) + 1),
            fill_value=0).to_numpy(dtype=float)
        ref = np.var(full) / np.mean(full)  # population variance
        # the query emits floor(ref * 1000) via exact integer sums
        assert abs(got[et].fano_milli - math.floor(ref * 1000)) <= 1, (
            f"{et}: spark {got[et].fano_milli} vs numpy {ref * 1000}")


def test_psi_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.drift import (
        N_PSI_BINS, PSI_SMOOTH_K, doc_length_drift_psi)
    got = {r.source: r.psi
           for r in doc_length_drift_psi(spark, sf_small).collect()}
    docs = (load_table(spark, sf_small, "documents")
            .select("source", "n_chars").toPandas())
    mn, mx = docs.n_chars.min(), docs.n_chars.max()
    bins = np.minimum(
        N_PSI_BINS - 1,
        np.floor((docs.n_chars.astype(float) - mn) * N_PSI_BINS
                 / (mx - mn))).astype(int)
    docs = docs.assign(bin=bins)
    corpus = docs.groupby("bin").size().reindex(
        range(N_PSI_BINS), fill_value=0).to_numpy()
    n = corpus.sum()
    K, B = PSI_SMOOTH_K, N_PSI_BINS
    for src, grp in docs.groupby("source"):
        ca = grp.groupby("bin").size().reindex(
            range(N_PSI_BINS), fill_value=0).to_numpy()
        na = ca.sum()
        pa = (ca * K + 1) / (na * K + B)
        pb = (corpus * K + 1) / (n * K + B)
        # the query floors each term to nano units before summing
        ref = np.floor((pa - pb) * np.log(pa / pb) * 1e9).sum() / 1e9
        assert math.isclose(got[src], round(ref, 6), abs_tol=2e-6), (
            f"{src}: spark {got[src]} vs numpy {ref}")


def test_entropy_matches_numpy(spark, sf_small):
    from impractical_impala_spark.queries.text import source_token_entropy
    got = {r.source: r for r in
           source_token_entropy(spark, sf_small).collect()}
    docs = (load_table(spark, sf_small, "documents")
            .select("source", "text").toPandas())
    toks = docs.assign(tok=docs.text.str.lower().str.split(" ")) \
        .explode("tok")
    for src, grp in toks.groupby("source"):
        counts = grp.groupby("tok").size().to_numpy(dtype=float)
        p = counts / counts.sum()
        ref_nano = int(np.floor(-p * np.log2(p) * 1e9).sum())
        assert got[src].entropy_nano == ref_nano
        assert got[src].vocab == len(counts)


def test_seasonal_index_matches_pandas(spark, sf_small):
    from impractical_impala_spark.queries.drift import orders_seasonal_index
    got = {r.month_of_year: r for r in
           orders_seasonal_index(spark, sf_small).collect()}
    orders = (load_table(spark, sf_small, "orders")
              .select("o_orderdate", "o_totalprice").toPandas())
    orders["mkey"] = (orders.o_orderdate.dt.year * 12
                      + orders.o_orderdate.dt.month - 1)
    orders["cents"] = np.floor(orders.o_totalprice * 100).astype(np.int64)
    monthly = orders.groupby("mkey").cents.sum()
    dense = monthly.reindex(
        range(int(monthly.index.min()), int(monthly.index.max()) + 1),
        fill_value=0)
    sum12 = dense.rolling(12).sum()
    ref = {}
    for i, (mkey, c) in enumerate(dense.items()):
        if i < 11 or sum12.loc[mkey] <= 0:
            continue
        moy = mkey % 12 + 1
        ref.setdefault(moy, []).append(
            int(c) * 12_000_000 // int(sum12.loc[mkey]))
    for moy, ratios in ref.items():
        assert got[moy].n_months == len(ratios)
        assert got[moy].seasonal_index_ppm == sum(ratios) // len(ratios)
