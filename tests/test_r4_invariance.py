"""Partition-invariance for the round-4 kernels: the determinism
claims (integer-exact covariance partials, order-free aggregations)
must survive different input split sizes and shuffle widths — the
conditions that reorder distributed sums and Arrow batch boundaries."""

import pytest

from impractical_impala_spark.registry import all_queries

_Q = all_queries()

CASES = [
    "emb_covariance",            # integer Gram partials across batches
    "multimodal_audio_energy",   # integer windowed energy per batch
    "user_pagerank",             # float iterations, rounded output
    "events_markov_transitions",
    "scd2_user_state",
    "cdc_latest_state",
    "ivm_merge_counts",
    "contrastive_negatives",
    "pit_state_join",
    "events_rolling_slope",      # integer-exact sliding sufficient sums
    "session_paths",             # struct-sorted path assembly
    "graph_triangles",
]


@pytest.mark.parametrize("name", CASES)
def test_partition_invariance(spark, sf_small, name):
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


def test_scd2_replica_scaleup(spark, sf_small):
    """50x user-replicated events must produce each replica's SCD2
    history identically to the base run — no cross-user leakage in the
    windowed change detection (the test_wdi_scaleup pattern for the
    lakehouse family)."""
    from pyspark.sql import functions as F

    from impractical_impala_spark.queries.lakehouse import (
        SCD2_USER_MOD, scd2_user_state)
    from impractical_impala_spark.sources import load_table

    base = {tuple(r) for r in
            scd2_user_state(spark, sf_small).collect()}
    ev = load_table(spark, sf_small, "events")
    reps = 5
    OFF = 1_000_000  # multiple of SCD2_USER_MOD: replicas keep the filter
    assert OFF % SCD2_USER_MOD == 0
    big = ev.select(
        "*", F.explode(F.expr(f"sequence(0, {reps - 1})")).alias("rep")
    ).withColumn("user_id", F.col("user_id") + F.col("rep") * OFF) \
     .drop("rep")
    big.createOrReplaceTempView("scd2_big")

    # run the same plan over the replicated frame
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    evb = big.select("event_id", "user_id", "event_type",
                     F.expr("ts_ns div 1000").alias("ts_us"))
    changes = (evb.withColumn("prev", F.lag("event_type").over(w))
               .filter(F.col("prev").isNull()
                       | (F.col("prev") != F.col("event_type"))))
    out = changes.filter(F.col("user_id") % SCD2_USER_MOD == 0).select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version_n"),
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(F.lead("ts_us").over(w), F.lit(-1).cast("long"))
        .alias("valid_to_us"))
    got = out.collect()
    assert len(got) == reps * len(base)
    for r in got:
        t = (r.user_id % OFF, r.version_n, r.state,
             r.valid_from_us, r.valid_to_us)
        assert t in base, t


def test_markov_replica_scaleup(spark, sf_small):
    """Replicating every user k times must scale each transition count
    by exactly k and leave probabilities untouched."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from impractical_impala_spark.registry import all_queries
    from impractical_impala_spark.sources import load_table

    base = {(r.src, r.dst): (r.n, r.p) for r in
            all_queries()["events_markov_transitions"]
            .build(spark, sf_small).collect()}
    ev = load_table(spark, sf_small, "events")
    reps = 3
    big = ev.select(
        "*", F.explode(F.expr(f"sequence(0, {reps - 1})")).alias("rep")
    ).withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000_000)
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts_ns div 1000"), "event_id")
    tr = (big.withColumn("nxt", F.lead("event_type").over(w))
          .filter(F.col("nxt").isNotNull())
          .groupBy(F.col("event_type").alias("src"),
                   F.col("nxt").alias("dst"))
          .agg(F.count(F.lit(1)).alias("n")))
    for r in tr.collect():
        n0, _ = base[(r.src, r.dst)]
        assert r.n == reps * n0, (r.src, r.dst, r.n, n0)


R5_CASES = [
    "emb_intra_label_cohesion",  # integer sum-of-vectors partials
    "dedup_containment",         # anchor-bucketed pair generation
    "fuzzy_part_match",          # capped-block levenshtein pairs
    "basket_brand_lift",         # per-order array pair explode
    "customer_pareto",           # total-ordered ntile over aggregate
    "price_histogram",           # broadcast-range binning
    "skew_key_profile",          # distributed TakeOrdered top-k
    "orders_rfm_segments",       # integer-threshold scoring
    "nation_revenue_yoy",
    "dedup_lsh_audit",           # full-outer pair-set reconciliation
    "q_filtered_aggs",
    "events_diversity_profile",  # integer sum-of-squares
    "text_zipf_fit",             # quantized-log OLS sums
    "q_relational_division",     # count-match coverage
    "text_bigram_surprisal",     # quantized surprisal averaging
    "events_value_ks_drift",     # integer ppm ECDF gaps
    "orders_backlog_profile",    # integer sweep-line running sum
    "supplier_gini_by_nation",   # integer rank identity
    "events_ewma_hourly",        # integer 2^-k lag polynomial
    "events_chi2_daypart",       # model-size contingency floats
    "dq_column_profile",         # one-scan wide aggregate unpivot
    "audience_overlap_matrix",   # bitmask fold across splits
    "user_churn_hazard",         # bounded-domain cumulative window
    "dpp_partition_prune",       # pruned-scan aggregate
    "lineitem_weighted_median",  # quantized weighted order statistic
    "multimodal_phash_neardup",  # Arrow aHash fold + blocked pairs
    "lineitem_mad_outliers",     # chained bin-median first-crossings
]


@pytest.mark.parametrize("name", R5_CASES)
def test_r5_partition_invariance(spark, sf_small, name):
    """Round-5 determinism claims under hostile splits: narrow scan
    partitions, prime shuffle width, small Arrow batches must not
    change a single output value."""
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


R6_CASES = [
    "audience_overlap_wide",       # sorted-pair explode fold
    "source_token_entropy",        # nano-quantized entropy terms
    "doc_length_drift_psi",        # nano-quantized PSI terms
    "orders_seasonal_index",       # integer ratio-to-MA on dense spine
    "events_interarrival_profile", # per-type lag + quantized medians
    "dedup_embedding_neardup",     # bounded query panel vs corpus
]


@pytest.mark.parametrize("name", R6_CASES)
def test_r6_partition_invariance(spark, sf_small, name):
    """Round-6 determinism claims under hostile splits, same contract
    as the r5 sweep."""
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


R6B_CASES = [
    "langid_confusion_matrix",
    "vocab_oov_coverage",
    "events_fano_burstiness",
    "events_hourly_autocorr24",
    "supplier_hhi_by_nation",
    "user_feature_matrix",
    "dedup_rate_by_source",
    "minhash_calibration",
]


@pytest.mark.parametrize("name", R6B_CASES)
def test_r6b_partition_invariance(spark, sf_small, name):
    """Wave-2 determinism under hostile splits, same contract as r5/r6."""
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


R6C_CASES = [
    "events_cusum_changepoint",  # integer n-scaled CUSUM, earliest-tie
    "events_mw_rank_drift",      # integer tie-corrected U over bins
    "benford_digit_profile",     # decimal-string digit, integer ppm
    "orders_bootstrap_ci",       # integer-mix Poisson weights
    "text_ngram_novelty",        # global-df shingle uniqueness
    "ann_recall_audit",          # panel-sized pipeline composition
    "part_return_rate_wilson",   # per-row float on exact integers
    "nation_theilsen_trend",     # bounded pair space, lower median
    "lineitem_spearman_corr",    # decimal(38) exact accumulation
    "privacy_kanon_audit",       # model-size QI class aggregate
    "emb_pca_power",             # integer Gram partials + fixed iteration
]


@pytest.mark.parametrize("name", R6C_CASES)
def test_r6c_partition_invariance(spark, sf_small, name):
    """Wave-3 determinism under hostile splits, same contract as r5/r6."""
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


R7_CASES = [
    # wave 1: statistical tests + audits
    "events_drift_monitor",        # frozen-first-day KS, integer ppm
    "events_welch_ttest",          # exact integer sufficient stats
    "events_jsd_drift",            # bounded-histogram divergence
    "events_kruskal_wallis",       # doubled-integer midrank sums
    "events_mann_kendall",         # calendar-bounded pair signs
    "lineitem_kendall_tau",        # dense-grid 2D prefix sums
    "users_kaplan_meier",          # deterministic ln-sum product
    "dq_uniqueness_audit",         # per-table key aggregates
    "split_leakage_audit",         # fingerprint-grouped flags
    "source_content_overlap",      # sorted-pair explode over sources
    "order_ship_lag_quantiles",    # bounded lag-day first crossings
    "events_weekday_decompose",    # dense-spine integer MA detrend
    "graph_degree_assortativity",  # integer sufficient sums on edges
    "session_hour_allocation",     # interval->hour integer overlap
    # wave 2: sampling / collocations / robust stats
    "text_pmi_collocations",       # vocabulary-keyed counts + top-K
    "events_share_ztest",          # pooled-proportion z on integers
    "dq_sequence_gaps",            # blocked lags + summary lags
    "weighted_reservoir_sample",   # two-phase deterministic top-K
    "lineitem_lmoments",           # Faulhaber range-sums, DECIMAL
    "lineitem_price_ols",          # integer normal equations + Cramer
    "ann_ivf_nprobe_sweep",        # panel-sized recall sweep
    "events_holt_winters",         # exact integer HW recursion
    "graph_kcore_summary",         # deterministic iterative peel
    "events_cusum_binseg",         # integer binseg over the spine
]


@pytest.mark.parametrize("name", R7_CASES)
def test_r7_partition_invariance(spark, sf_small, name):
    """Round-7 determinism under hostile splits, same contract as
    r5/r6: narrow scan partitions, prime shuffle width, small Arrow
    batches must not change a single output value."""
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


R7_TS_CASES = [
    # every round-7 query that derives calendar/day/hour keys from ts
    "events_drift_monitor", "events_welch_ttest", "events_jsd_drift",
    "events_mann_kendall", "users_kaplan_meier",
    "events_weekday_decompose", "session_hour_allocation",
    "events_share_ztest", "order_ship_lag_quantiles",
    "events_holt_winters", "events_cusum_binseg",
]


@pytest.mark.parametrize("name", R7_TS_CASES)
def test_r7_timezone_invariance(spark, sf_small, name):
    """Hostile-session-TZ sweep for the round-7 timestamp-bearing
    queries: a UTC+14 session must not move any day/hour bucket (the
    engine pins timestamp arithmetic to the lossless ts_ns epoch and a
    UTC session zone at load time)."""
    base = sorted(map(tuple, _Q[name].build(spark, sf_small).collect()))
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        hostile = sorted(map(tuple,
                             _Q[name].build(spark, sf_small).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert base == hostile
