"""Round-8 wave-2/3 checks: INDEPENDENT numpy/pandas references for
every new statistical kernel (engine-vs-oracle parity alone proves both
run the same arithmetic, not that the arithmetic is right), plus the
replication invariants the integer designs predict exactly."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    df = pd.read_parquet(f"{SF}/events.parquet")
    ts = df["ts"]
    if ts.dtype.kind == "i":          # TIMESTAMP(NANOS) as raw longs
        df["ts_ns"] = ts.astype("int64")
    else:
        df["ts_ns"] = ts.astype("datetime64[ns]").astype("int64")
    return df


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF}/documents.parquet")


# ------------------------------------------------- periodogram
def test_periodogram_matches_numpy(spark, events_pd):
    from impractical_impala_spark.queries.spectral_info import (
        HOUR_NS, TRIG_SCALE, _trig_rows)

    t = (events_pd["ts_ns"] // HOUR_NS).to_numpy()
    trig = {(p, r): (c, s) for p, r, c, s in _trig_rows()}
    got = {r.period: r for r in
           _Q["events_periodogram"].build(spark, SF).collect()}
    for p in (12, 24, 168):
        res = t % p
        sc = sum(int(c) * trig[(p, int(r))][0]
                 for r, c in Counter(res).items())
        ss = sum(int(c) * trig[(p, int(r))][1]
                 for r, c in Counter(res).items())
        amp = math.sqrt(sc * sc + ss * ss) / (len(t) * TRIG_SCALE)
        assert got[p].sc == sc and got[p].ss == ss
        assert abs(got[p].amp_ratio - amp) < 1e-6


# ------------------------------------------------- CvM drift
def _halves(events_pd):
    mid = (events_pd.ts_ns.min() + events_pd.ts_ns.max()) // 2
    return events_pd.assign(early=(events_pd.ts_ns <= mid).astype(int))


def test_cvm_matches_numpy(spark, events_pd):
    ev = _halves(events_pd)
    mn, mx = ev.value.min(), ev.value.max()
    bins = np.minimum(255, np.floor((ev.value - mn) * 256
                                    / (mx - mn)).astype(int))
    got = {r.event_type: r for r in
           _Q["events_cvm_drift"].build(spark, SF).collect()}
    for et, sub in ev.assign(b=bins).groupby("event_type"):
        ca = np.bincount(sub.b[sub.early == 1], minlength=256)
        cb = np.bincount(sub.b[sub.early == 0], minlength=256)
        na, nb = ca.sum(), cb.sum()
        # the engine's exact statistic: truncating ppm ECDF gaps
        d = (np.cumsum(ca) * 1_000_000 // na
             - np.cumsum(cb) * 1_000_000 // nb)
        mask = (ca + cb) > 0
        ssum = int(((ca + cb)[mask] * d[mask].astype(object) ** 2).sum())
        cvm = ssum / (1e12 * (na + nb))
        assert got[et].n_early == na and got[et].n_late == nb
        assert abs(got[et].cvm - cvm) < 2e-6, et


# ------------------------------------------------- effect sizes
def test_effect_sizes_match_numpy(spark, events_pd):
    ev = _halves(events_pd)
    ev = ev.assign(centi=np.floor(ev.value * 100).astype("int64"))
    mn, mx = ev.value.min(), ev.value.max()
    ev = ev.assign(b=np.minimum(255, np.floor(
        (ev.value - mn) * 256 / (mx - mn)).astype(int)))
    got = {r.event_type: r for r in
           _Q["events_effect_sizes"].build(spark, SF).collect()}
    for et, sub in ev.groupby("event_type"):
        a = sub.centi[sub.early == 1].to_numpy()
        b = sub.centi[sub.early == 0].to_numpy()
        sp = math.sqrt(((len(a) - 1) * a.var(ddof=1)
                        + (len(b) - 1) * b.var(ddof=1))
                       / (len(a) + len(b) - 2))
        d = (a.mean() - b.mean()) / sp
        ca = np.bincount(sub.b[sub.early == 1], minlength=256)
        cb = np.bincount(sub.b[sub.early == 0], minlength=256)
        cb_below = np.concatenate([[0], np.cumsum(cb)[:-1]])
        greater = int((ca * cb_below).sum())
        less = int((ca * (cb.sum() - cb_below - cb)).sum())
        delta = (greater - less) / (len(a) * len(b))
        assert abs(got[et].cohens_d - d) < 1e-3, et
        assert abs(got[et].cliffs_delta - delta) < 1e-3, et


# ------------------------------------------------- mutual information
def test_mutual_information_matches_numpy(spark, events_pd):
    from impractical_impala_spark.queries.spectral_info import HOUR_NS

    daypart = ((events_pd.ts_ns // HOUR_NS) % 24) // 6
    ct = pd.crosstab(events_pd.event_type, daypart).to_numpy().astype(float)
    n = ct.sum()
    px, py = ct.sum(1) / n, ct.sum(0) / n
    p = ct / n
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(p * np.log(p / np.outer(px, py)))
        hx = -(px * np.log(px)).sum()
        hy = -(py * np.log(py)).sum()
    row = _Q["events_mutual_information"].build(spark, SF).collect()[0]
    assert row.n_events == int(n)
    assert abs(row.mi_nats - mi) < 1e-5
    assert abs(row.h_type_nats - hx) < 1e-5
    assert abs(row.h_daypart_nats - hy) < 1e-5
    assert abs(row.nmi - mi / min(hx, hy)) < 1e-4


# ------------------------------------------------- fold balance
def test_fold_balance_matches_pandas(spark, docs_pd):
    from impractical_impala_spark.queries.spectral_info import (
        FOLD_MOD, FOLD_MULT, N_FOLDS)

    fold = (docs_pd.doc_id * FOLD_MULT) % FOLD_MOD % N_FOLDS
    ct = pd.crosstab(fold, docs_pd.source)
    n = ct.to_numpy().sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct.to_numpy() - exp) ** 2 / exp).sum(axis=1)
    got = {r.fold: r for r in
           _Q["fold_balance_audit"].build(spark, SF).collect()}
    assert set(got) == set(ct.index)
    for i, f in enumerate(ct.index):
        assert got[f].n_docs == int(ct.sum(1).iloc[i])
        assert abs(got[f].chi2_fold - chi2[i]) < 1e-3, f


# ------------------------------------------------- BM25
def test_bm25_matches_pandas(spark, docs_pd):
    from impractical_impala_spark.queries.text_ir import (
        BM25_B, BM25_K1, BM25_TERMS)

    words = docs_pd.text.str.lower().str.split(" ")
    dl = words.map(len)
    n_docs, avgdl = len(docs_pd), dl.sum() / len(docs_pd)
    tf = {}
    for doc, ws in zip(docs_pd.doc_id, words):
        c = Counter(w for w in ws if w in BM25_TERMS)
        if c:
            tf[doc] = c
    df_t = Counter(t for c in tf.values() for t in c)
    scores = {}
    for doc, c in tf.items():
        d = dl[docs_pd.doc_id.tolist().index(doc)]
        s = 0.0
        for t, f in c.items():
            idf = math.log(1 + (n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5))
            s += idf * f * (BM25_K1 + 1) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * d / avgdl))
        scores[doc] = s
    want = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    got = _Q["text_bm25_topk"].build(spark, SF).collect()
    for row, (doc, s) in zip(got, want[:len(got)]):
        assert row.doc_id == doc
        assert abs(row.bm25 - s) < 1e-5


# ------------------------------------------------- BPE pairs
def test_bpe_pairs_match_counter(spark, docs_pd):
    cnt = Counter()
    for ws in docs_pd.text.str.lower().str.split(" "):
        for w in ws:
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = _Q["bpe_merge_candidates"].build(spark, SF).collect()
    assert [(r.pair, r.cnt) for r in got] == want[:len(got)]


# ------------------------------------------------- cross-entropy
def test_xent_matches_python(spark, docs_pd):
    from impractical_impala_spark.queries.text_ir import (
        XENT_FOLDS, XENT_MOD, XENT_MULT)

    fold = (docs_pd.doc_id * XENT_MULT) % XENT_MOD % XENT_FOLDS
    words = docs_pd.text.str.lower().str.split(" ")
    lm = Counter(w for ws in words[fold != 0] for w in ws)
    n_train, v_train = sum(lm.values()), len(lm)
    got = {r.source: r for r in
           _Q["unigram_crossentropy_split"].build(spark, SF).collect()}
    val = docs_pd[fold == 0]
    for src, sub in val.groupby("source"):
        toks = [w for ws in sub.text.str.lower().str.split(" ") for w in ws]
        lp = sum(math.log((lm.get(t, 0) + 1) / (n_train + v_train + 1))
                 for t in toks)
        oov = sum(1 for t in toks if t not in lm)
        assert got[src].n_tokens == len(toks)
        assert got[src].oov_ppm == oov * 1_000_000 // len(toks)
        assert abs(got[src].xent_nats + lp / len(toks)) < 1e-5, src


# ------------------------------------------------- Heaps' law
def test_heaps_matches_numpy(spark, docs_pd):
    from impractical_impala_spark.queries.text_ir import HEAPS_BUCKETS

    mn, mx = docs_pd.doc_id.min(), docs_pd.doc_id.max()
    b = ((docs_pd.doc_id - mn) * HEAPS_BUCKETS) // (mx - mn + 1)
    toks_b, first = Counter(), {}
    for doc_b, ws in zip(b, docs_pd.text.str.lower().str.split(" ")):
        toks_b[doc_b] += len(ws)
        for w in ws:
            first[w] = min(first.get(w, doc_b), doc_b)
    types_b = Counter(first.values())
    cum_t = cum_y = 0
    xs, ys = [], []
    for bb in sorted(toks_b):
        cum_t += toks_b[bb]
        cum_y += types_b.get(bb, 0)
        xs.append(math.log(cum_t))
        ys.append(math.log(cum_y))
    beta, lnk = np.polyfit(xs, ys, 1)
    row = _Q["heaps_law_fit"].build(spark, SF).collect()[0]
    assert row.n_buckets == len(xs)
    assert row.total_tokens == cum_t and row.total_types == cum_y
    assert abs(row.heaps_beta - beta) < 1e-5
    assert abs(row.heaps_ln_k - lnk) < 1e-4
    # the synthetic fixture's vocabulary is CLOSED (~200 words), so it
    # saturates in the first bucket and beta ~ 0; a natural corpus sits
    # in (0, 1). Assert only the sublinear bound here.
    assert 0.0 <= row.heaps_beta < 1.0


# ------------------------------------------------- embedding evals
def test_centroid_outliers_match_numpy(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    xm = np.floor(x * 1_000_000).astype("int64")
    ratios = {}
    for lab, idx in emb.groupby("label").groups.items():
        sub = xm[emb.index.get_indexer(idx)]
        n = len(sub)
        d2 = ((sub * n - sub.sum(0)).astype(object) ** 2).sum(1)
        for vid, dd in zip(emb.vec_id.iloc[
                emb.index.get_indexer(idx)], d2):
            ratios[vid] = (float(dd) * n / float(d2.sum()), lab)
    got = _Q["emb_centroid_outliers"].build(spark, SF).collect()
    want = sorted(ratios.items(), key=lambda kv: (-round(kv[1][0], 6),
                                                  kv[0]))
    for row, (vid, (r, lab)) in zip(got, want[:len(got)]):
        assert row.vec_id == vid and row.label == lab
        assert abs(row.ratio - r) < 1e-5


def test_knn_purity_matches_numpy(spark):
    from impractical_impala_spark.queries.similarity import N_QUERIES

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = xn @ xn.T
    got = {r.query_id: r for r in
           _Q["emb_knn_label_purity"].build(spark, SF).collect()}
    ids, labs = emb.vec_id.to_numpy(), emb.label.to_numpy()
    for qi in range(len(emb)):
        if ids[qi] >= N_QUERIES:
            continue
        order = sorted((round(-cos[qi, j], 6), ids[j])
                       for j in range(len(emb)) if j != qi)
        top = [vid for _, vid in order[:10]]
        match = sum(labs[np.where(ids == v)[0][0]] == labs[qi]
                    for v in top)
        assert got[ids[qi]].n_match == match, ids[qi]


def test_pca_project_spectrum_properties(spark):
    """The projection scores must carry the spectrum: per-component
    variance decreasing (component 1 captures the most), and the
    cross-component score correlations ~0 (loadings orthogonal up to
    fixed-point truncation)."""
    from impractical_impala_spark.queries.ml_more import emb_pca_topk

    rows = _Q["emb_pca_project"].build(spark, SF).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append((r.vec_id, r.score))
    mats = []
    for c in sorted(by_comp):
        mats.append([s for _, s in sorted(by_comp[c])])
    m = np.array(mats)
    # the loadings are MAX-norm scaled (PCA_VNORM), not unit 2-norm, so
    # raw E[s^2] mixes the Rayleigh quotient with |v_c|^2; dividing by
    # each loading's 2-norm recovers the spectrum, which the power loops
    # guarantee monotone (uncentered Gram = x'x, so no centering here)
    load = emb_pca_topk(spark, SF).toPandas()
    vnorm = np.array([np.linalg.norm(
        load[load.component == c].sort_values("dim_idx")
        .loading_q.to_numpy().astype(float)) for c in sorted(by_comp)])
    ray = (m ** 2).mean(axis=1) / vnorm ** 2
    assert ray[0] >= ray[1] >= ray[2], ray
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    g = mn @ mn.T
    assert abs(g[0, 1]) < 0.1 and abs(g[0, 2]) < 0.1 \
        and abs(g[1, 2]) < 0.1, g


# ------------------------------------------------- replica invariants
K, OFF = 3, 50_000_000


@pytest.fixture(scope="module")
def sf_wave2_inflated(spark, tmp_path_factory):
    """K-fold replicas: events duplicate with shifted event/user ids
    (identical ts/value series -> identical DISTRIBUTIONS), documents
    copy through."""
    out = str(tmp_path_factory.mktemp("sf_w2_inflated"))
    rep = F.explode(F.expr(f"sequence(0, {K - 1})")).alias("rep")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    (ev.select("*", rep)
     .withColumn("event_id", F.col("event_id") + F.col("rep") * OFF)
     .withColumn("user_id", F.col("user_id") + F.col("rep") * OFF)
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        (spark.read.parquet(f"{SF}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    return out


def test_periodogram_amp_invariant_under_replication(spark,
                                                     sf_wave2_inflated):
    """Replicating every event K-fold scales sc/ss/n by exactly K, so
    the amplitude RATIO is bit-identical — a hidden absolute-count
    dependence would break this."""
    base = {r.period: r for r in
            _Q["events_periodogram"].build(spark, SF).collect()}
    big = {r.period: r for r in
           _Q["events_periodogram"].build(spark, sf_wave2_inflated)
           .collect()}
    for p, row in base.items():
        assert big[p].n == K * row.n
        assert big[p].sc == K * row.sc and big[p].ss == K * row.ss
        assert big[p].amp_ratio == row.amp_ratio


def test_mi_invariant_under_replication(spark, sf_wave2_inflated):
    """MI depends only on the joint DISTRIBUTION: K-fold replication
    leaves every probability unchanged, so MI/H/NMI are identical to
    the nano quantization."""
    base = _Q["events_mutual_information"].build(spark, SF).collect()[0]
    big = _Q["events_mutual_information"].build(
        spark, sf_wave2_inflated).collect()[0]
    assert big.n_events == K * base.n_events
    assert abs(big.mi_nats - base.mi_nats) < 1e-6
    assert abs(big.nmi - base.nmi) < 1e-6


def test_cvm_invariant_under_replication(spark, sf_wave2_inflated):
    """Both halves replicate identically, so the ppm ECDF gaps are
    unchanged and cvm (a per-N-normalized integral) is identical."""
    base = {r.event_type: r for r in
            _Q["events_cvm_drift"].build(spark, SF).collect()}
    big = {r.event_type: r for r in
           _Q["events_cvm_drift"].build(spark, sf_wave2_inflated)
           .collect()}
    for et, row in base.items():
        assert big[et].n_early == K * row.n_early
        assert abs(big[et].cvm - row.cvm) < 1e-6
