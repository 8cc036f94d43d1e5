"""Round-9 determinism + scale invariants for the wave-11 queries
(retrieval_curation.py), same contracts as the r5-r8 sweeps: hostile
splits must not move a value, session timezones must not move a
bucket, and replication must behave exactly as the integer arithmetic
predicts."""

import pytest
from pyspark.sql import functions as F

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

R9_CASES = [
    "emb_mmr_diversify",           # exact integer-dot greedy rerank
    "bloom_filter_audit",          # int64 hash positions, set algebra
    "dedup_edit_distance_confirm",  # blocked integer edit distances
    "retrieval_rrf_fusion",        # nano-quantized ranks, IEEE fusion
    "text_charclass_profile",      # regexp census, integer sums
    "attribution_position_based",  # integer micro-credit split
    # wave 12: engine statistics & governance
    "zonemap_skipping_audit",      # integer-cents zone maps
    "ndv_estimator_audit",         # md5-mod samples, integer GEE
    "stats_histogram_equidepth",   # bounded-spine cutpoints
    "join_cardinality_audit",      # per-key count products
    "privacy_tcloseness_audit",    # integer-ppm cumulative EMD
    "retrieval_ndcg",              # nano-quantized DCG terms
    # wave 13: operational quality
    "fairness_equalized_odds",     # integer confusion counts
    "orders_cohort_ltv",           # exact cents cumulative spine
    "dq_freshness_sla",            # integer lag/ppm audit
    # wave 14: sketch exactness, interval joins & survival
    "ndv_kmv_sketch",              # md5 order statistics, integer est
    "stats_histogram_sampled",     # md5 sample + exact sample ranks
    "retrieval_mrr_hitk",          # nano-quantized ranks, integer rr
    "ann_pq_adc_topk",             # index-ordered folds, fixed-order sum
    "events_interval_overlap",     # integer us intervals, bucket join
    "users_nelson_aalen",          # integer ppm hazard sums
    # wave 15: curation filters & symbolic series
    "doc_perplexity_filter",       # nano-quantized LM, integer filter
    "text_keyword_rake",           # integer ppm word/phrase scores
    "doc_gopher_quality_flags",    # integer cross-multiplied rules
    "events_sax_symbolic",         # micro-quantized z, integer compares
    "lineitem_pchart_returns",     # ppm limits, shared half-away
    # wave 16: forecast eval, graph reach, DP, DSIR, IVF-PQ
    "orders_forecast_backtest",    # integer month-spine errors
    "graph_bfs_hops",              # capped backbone, integer hops
    "privacy_dp_count_release",    # md5 hex-run noise, integer release
    "doc_dsir_importance",         # nano log-ratios, half-away mean
    "ann_ivf_pq_pipeline",         # index-ordered folds, integer codes
    # wave 17: quantized retrieval audits & sequential testing
    "ann_ivf_pq_trained",          # fixed-point Lloyd + integer codes
    "emb_matryoshka_audit",        # prefix-slice folds, integer overlap
    "emb_binary_sign_audit",       # integer hamming ranks
    "events_sprt_sequential",      # precomputed micro-nat constants
    # wave 18: tokenizer economics, release gates, engine advice
    "tokenizer_fertility_audit",   # deterministic top-V cut, ppm
    "events_tost_equivalence",     # integer suff stats, micro z
    "engine_tuning_advisor",       # integer byte estimates
    "multimodal_chunk_dedup",      # md5 block census
    # wave 19: data-mix allocation & Kneser-Ney LM
    "corpus_mix_allocation",       # integer greedy cumsum fill
    "text_bigram_kneser_ney",      # nano-quantized KN, exact counts
    # wave 20: game-theoretic attribution & diffusion modeling
    "attribution_shapley",         # integer 1/24-unit coalition sums
    "users_bass_diffusion",        # DECIMAL(38) Cramer, ha-quantized
    # wave 21: stylometry & causal inference
    "text_burrows_delta",          # ppb freqs, micro z, integer delta
    "orders_diff_in_diff",         # four exact cells, micro z
    # wave 22: econometric causality, queueing, multimodal runs
    "events_granger_causality",    # exact day-spine suff stats
    "orders_littles_law",          # integer open-day explode
    "multimodal_vad_segments",     # blob-local runlength, integers
    # wave 23: hypothesis-testing completion
    "events_anova_f",              # milli-quantized group terms
    "events_perm_bh_fdr",          # md5 day blocks, decimal compares
    "events_ljung_box",            # n^2-scaled integer autocovs
    "lineitem_bartlett_test",      # decimal suff stats, micro ln terms
    # wave 24: graph completion
    "graph_bfs_multisource",       # top-K seeds, bounded unroll
    "graph_jaccard_linkpred",      # capped pivots, integer ppm
    "graph_clustering_coeff",      # oriented wedges, integer buckets
    # wave 25: calibration decision layer
    "events_spiegelhalter_z",      # integer Z num/den, one sqrt
    "events_calibration_slope",    # integer Cramer suff stats
    "events_lift_at_k",            # first-crossing integer prefixes
    # wave 26: lexical diversity & embedding geometry
    "text_mattr",                  # closed-form integer overlaps
    "text_simpson_diversity",      # exact per-doc ppm
    "emb_participation_ratio",     # integer scatter, decimal squares
    "emb_hubness_audit",           # integer k-occurrence moments
    # wave 27: codec advice, stylometry, queueing what-if
    "compression_entropy_advisor",  # nano-quantized entropy terms
    "source_bigram_kl",            # nano-quantized KL cells
    "orders_kingman_wait",         # integer dispersion suff stats
    # wave 28: change-point & randomness gates, revenue structure
    "events_pettitt_test",         # integer midrank identity
    "events_runs_test",            # integer sign runs
    "part_abc_classes",            # integer histogram cutpoints
    "supplier_balassa_rca",        # exact cents cells, IEEE ratio
    # wave 29: curation decision curves
    "dedup_threshold_sweep",       # integer ppm jaccard, literal spine
    "vocab_coverage_at_k",         # TakeOrdered cut, integer ppm
    "doc_length_lognormal_fit",    # micro-quantized per-doc ln
    # wave 30: system dynamics
    "events_markov_stationary",    # nano fixed-point power iterations
    "events_transfer_entropy",     # integer joint cells, nano terms
    "graph_modularity_by_type",    # nano group contributions
    # wave 31: long-memory, stocking targets, hub structure
    "events_hurst_exponent",       # integer block sums, fixed ln(m)
    "orders_newsvendor_quantile",  # integer first-crossing quantiles
    "graph_rich_club",             # integer ppm at fixed thresholds
    # wave 32: discriminability, lifecycle, autocorrelation cost
    "emb_fisher_ratio_dims",       # milli-quantized per-label terms
    "customer_tier_migration",     # integer midpoint split, 16 cells
    "events_effective_sample_size",  # n^2-scaled integer rho sums
    # wave 33: boilerplate, tail thresholds, concentration
    "doc_boilerplate_ratio",       # md5 fragment census, integer ppm
    "events_mean_excess",          # exact census order statistics
    "user_activity_gini",          # nano-quantized Lorenz terms
    # wave 34: seasonality significance, market structure, order-1 rate
    "events_dow_anova",            # absolute integer weekday groups
    "supplier_cr4_by_type",        # exact cents ranks, nano HHI terms
    "source_char_entropy_rate",    # two censuses, nano-bit terms
    # wave 35: circular stats, regime breaks, corpus growth
    "events_rayleigh_diurnal",     # micro trig tables, integer sums
    "orders_chow_break",           # integer spine suff stats
    "text_hapax_ratio",            # vocabulary census, exact ppm
    # wave 36: arrival-process fit, audience mix, price spread
    "events_weibull_interarrival",  # micro-quantized plot points
    "events_new_returning_mix",    # first-touch integer ppm
    "part_price_dispersion",       # exact census quartiles
    # wave 37: source redundancy, layout encoding, separability
    "source_jsd_matrix",           # nano cell terms, closed absent mass
    "engine_rle_advisor",          # partitioned integer run counts
    "dedup_hamming_spectrum",      # bucket-local integer xor census
    # wave 38: rate-model adequacy, retention decay, degree tail
    "events_poisson_gof",          # n-scaled integer chi-square
    "events_retention_half_life",  # micro log points, integer OLS
    "graph_degree_powerlaw",       # micro ln census terms
    # wave 39: skyline operator, planning matrix, JL audit
    "q_skyline_2d",                # bucket-prefix dominance, integers
    "part_abc_xyz_matrix",         # cutpoint ABC x milli CV classes
    "emb_random_projection_audit",  # md5 sign matrix, exact ratios
    # wave 40: engagement stickiness
    "users_stickiness_l7",         # merged-interval integer coverage
    # wave 41: funnel entry quality, embedding refresh drift
    "events_bounce_rate",          # integer us gaps, exact ppm
    "emb_centroid_drift",          # n-scaled integer centroids
    # wave 42: clustered-sampling cost, dimension redundancy
    "events_day_icc",              # milli group terms, ANOVA n0
    "part_brand_type_cramers_v",   # micro cell terms + zero mass
    # wave 43: shared rhythms, capacity headroom
    "events_hourly_profile_jsd",   # 24-bin spine, nano cell terms
    "events_peak_load_ratio",      # census order stats, exact ppm
    # wave 44: near-dup provenance
    "dedup_cross_source_matrix",   # LSH pair re-aggregation, ppm
]


@pytest.mark.parametrize("name", R9_CASES)
def test_r9_partition_invariance(spark, sf_small, name):
    """Narrow scan partitions, prime shuffle width, small Arrow batches
    must not change a single output value."""
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


@pytest.mark.parametrize("name", ["attribution_position_based"])
def test_r9_timezone_invariance(spark, sf_small, name):
    """The one ts-bearing wave-11 query sessionizes on the lossless
    ts_ns epoch; a UTC+14 session zone must not move any credit."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile


def test_bloom_counts_scale_linearly_under_replication(spark, sf_small,
                                                       tmp_path):
    """Replicating every order K-fold (fresh orderkeys, same custkeys)
    must scale n_probe/n_pass/n_true/n_false_pos by exactly K and keep
    fp_ppm IDENTICAL — membership is a per-custkey property, so the
    Bloom pass set replicates with the rows. Pins that the audit
    measures the filter, not the data volume."""
    from impractical_impala_spark.queries.retrieval_curation import (
        bloom_filter_audit)

    K = 3
    out = str(tmp_path)
    rep = F.explode(F.expr(f"sequence(0, {K - 1})")).alias("rep")
    od = spark.read.parquet(f"{sf_small}/orders.parquet")
    (od.select("*", rep)
     .withColumn("o_orderkey",
                 F.col("o_orderkey") + F.col("rep") * 10_000_000)
     .drop("rep")
     .write.mode("overwrite").parquet(f"{out}/orders.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"]:
        (spark.read.parquet(f"{sf_small}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))

    base = bloom_filter_audit(spark, sf_small).collect()[0]
    big = bloom_filter_audit(spark, out).collect()[0]
    assert big.n_probe == K * base.n_probe
    assert big.n_pass == K * base.n_pass
    assert big.n_true == K * base.n_true
    assert big.n_false_pos == K * base.n_false_pos
    assert big.fp_ppm == base.fp_ppm


def test_attribution_credit_sums_to_unit_per_conversion(spark, sf_small):
    """The U-shaped split must conserve credit exactly: summed over
    event types, total micro-credit == 1,000,000 x (number of sessions
    with >= 1 touch before their first conversion) — the deterministic
    remainder assignment is what makes this an equality, not a bound."""
    from impractical_impala_spark.queries.retrieval_curation import (
        ATTR_CONVERT)
    from impractical_impala_spark.queries.paths_stats import (
        SESSION_GAP_US)
    from impractical_impala_spark.sources import load_table
    from pyspark.sql import Window

    total = (_Q["attribution_position_based"].build(spark, sf_small)
             .agg(F.sum("credit_micro").alias("c")).collect()[0].c)

    ev = load_table(spark, sf_small, "events").select(
        "user_id", "event_type", "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (ev.withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
            .withColumn("new_s", (F.col("gap").isNull()
                                  | (F.col("gap") > SESSION_GAP_US))
                        .cast("int"))
            .withColumn("sess_n", F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "sess_n").orderBy("ts_us",
                                                         "event_id")
    conv = (sess.withColumn("rn", F.row_number().over(ws))
            .filter(F.col("event_type") == ATTR_CONVERT)
            .groupBy("user_id", "sess_n")
            .agg(F.min("rn").alias("p"))
            .filter(F.col("p") > 1)
            .count())
    assert total == 1_000_000 * conv


def test_mmr_shape_and_first_pick(spark, sf_small):
    """Every query yields exactly ranks 1..MMR_K over distinct
    neighbors, and rank-1 equals the pure-relevance cosine argmax
    (the greedy base case) — cross-checked against an independent
    numpy computation of the quantized similarity."""
    import numpy as np

    from impractical_impala_spark.queries.retrieval_curation import (
        MMR_K, MMR_QUERIES)
    from impractical_impala_spark.queries.similarity import Q_SCALE
    from impractical_impala_spark.sources import load_table

    rows = _Q["emb_mmr_diversify"].build(spark, sf_small).collect()
    emb = {r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64)
                              * Q_SCALE)
           for r in load_table(spark, sf_small, "embeddings")
           .select("vec_id", "embedding").collect()}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == list(range(MMR_QUERIES))
    for q, rs in by_q.items():
        assert sorted(r.rnk for r in rs) == list(range(1, MMR_K + 1))
        ids = [r.neighbor_id for r in rs]
        assert len(set(ids)) == MMR_K
        qv = emb[q]
        best = max(
            ((c, float(qv @ v)
              / (np.sqrt(qv @ qv) * np.sqrt(v @ v)))
             for c, v in emb.items() if c != q),
            key=lambda t: (t[1], -t[0]))
        first = next(r for r in rs if r.rnk == 1)
        assert first.neighbor_id == best[0]


R9_TS_CASES = [
    # session waves 23-38: every query that derives day/hour/week keys
    # or event ordering from ts — a UTC+14 session zone must not move
    # a single bucket, rank, or verdict
    "events_perm_bh_fdr", "events_ljung_box",
    "events_effective_sample_size", "events_pettitt_test",
    "events_runs_test", "events_dow_anova", "events_poisson_gof",
    "events_transfer_entropy", "events_markov_stationary",
    "events_hurst_exponent", "events_rayleigh_diurnal",
    "events_weibull_interarrival", "events_new_returning_mix",
    "events_retention_half_life", "orders_kingman_wait",
    "orders_chow_break", "orders_newsvendor_quantile",
    "customer_tier_migration",
]


@pytest.mark.parametrize("name", R9_TS_CASES)
def test_r9_late_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the wave-23..38 timestamp-bearing
    queries (the standing round gate)."""
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
