"""Query registration. Importing this package registers every query into
``impractical_impala_spark.registry``. One module per family.

The correctness driver checks the FIRST 50 entries of ``all_queries()``
each round. ``WINDOW`` below pins that window explicitly (see
``registry.set_window_order``): each round it holds exactly the queries
that most need a fresh driver CORRECTNESS row — never-driver-checked
ones first, then queries whose implementation changed this round, then
re-confirmations of families whose last row is oldest. History:

- r1 window: reference_ops + stats + tpch waves 1-2 + windows + streams
  + text (green in CORRECTNESS_r01... r02).
- r2 window: same families re-checked (green in CORRECTNESS_r02);
  dedup/similarity/joins/json/extras rows are from r01.
- r3 window (this list): the 23 round-2 additions that have NEVER had a
  driver row (TPC-H waves 3-4, dedup_clusters/survivors, streams_plus,
  training_extras, w6, ann_ivf_trained), the queries changed in round 3
  (dedup_ngram_jaccard's new blocking key, q15's de-funneled max,
  dedup_survivors, ann_ivf_trained), the brand-new round-3 queries, and
  r1-era families as fill — every slot earns a row.
- r4 rotation candidates, in priority order: the queries registered
  late in r3 after the window filled (corpus_training_manifest,
  events_time_weighted_avg, text_heavy_hitters,
  events_rolling_active_users — never checked), then the r1-green
  families rotated out this round (see the fill comment below), then
  re-confirmations of whatever r3 proves.
"""

from ..registry import set_window_order

from . import (reference_ops, stats_ops, tpch, tpch_more,  # noqa: F401
               windows, streams, text,
               dedup, similarity, joins_special, json_ops, extras,
               sketches, multimodal,
               tpch_plus, training_extras, windows_plus, tpch_plus2,
               streams_plus, tpch_final, pipelines, training_ops,
               curation, analytics, lakehouse, ml_more, warehouse_extras,
               layout, feature_ops, paths_stats, modern_sql)

# Queries whose r3 driver row FAILED: the fixture's events.ts physical
# type changed between rounds (TIMESTAMP(NANOS)->TIMESTAMP(MICROS) NTZ),
# breaking the Spark-side load of every events-family query
# (CORRECTNESS_r03 `DATATYPE_MISMATCH` rows). sources/readers.py is now
# schema-adaptive; these nine MUST re-prove first.
FAILED_R3 = [
    "events_stream_join", "events_sliding_avg", "events_dedup_counts",
    "events_anomaly_zscore", "events_cumulative_users",
    "events_cohort_retention", "events_funnel", "events_gapfill_locf",
    "q_asof_attribution",
]

# Registered late in r3 after the window filled — never driver-checked.
NEVER_CHECKED_R3 = [
    "corpus_training_manifest", "events_time_weighted_avg",
    "text_heavy_hitters", "events_rolling_active_users",
]

# New in round 4 — first driver exposure (appended as they are built).
NEW_R4 = [
    # lakehouse maintenance (queries/lakehouse.py)
    "scd2_user_state", "cdc_latest_state", "snapshot_diff",
    "bucketed_join_segments",
    # distributed-ML support (queries/ml_more.py)
    "emb_covariance", "user_pagerank", "text_winsorized_stats",
    "curriculum_buckets", "events_markov_transitions",
    # warehouse extras (queries/warehouse_extras.py)
    "events_time_rollup", "ivm_merge_counts", "q_collect_sorted",
    "fk_integrity_audit", "text_inverted_index",
    # physical layout (queries/layout.py)
    "zorder_layout_scan", "compact_small_files",
    # multimodal audio kernel (queries/multimodal.py)
    "multimodal_audio_energy",
    # feature-store ops (queries/feature_ops.py) + schema evolution
    "pit_state_join", "contrastive_negatives", "schema_evolution_read",
    # row-level MERGE (queries/lakehouse.py)
    "merge_upsert_orders",
]

# r1-era fill: rows from CORRECTNESS_r01 are now three rounds old; these
# are the fourteen rotated out of the r3 window plus the two held back
# (q_range_band_join, dedup_minhash_lsh) — oldest evidence first.
R1_REFRESH = [
    "dedup_minhash_lsh", "q_range_band_join", "q_stratified_sample",
    "json_extract_props", "q_percentiles", "q_cube_revenue",
    "w5_value_windows", "q_date_functions", "dedup_exact",
    "ann_cosine_topk", "dedup_simhash", "ann_ivf_probe",
    "multimodal_blob_stats", "dedup_embedding_neardup", "ann_lsh_bucketed",
    "q_salted_agg",
]

WINDOW = (
    FAILED_R3
    + NEVER_CHECKED_R3
    + NEW_R4
    + R1_REFRESH
    # remaining slots fall through to registration order: r1-era
    # reference_ops/stats/tpch-wave-1 rows, which are also the oldest
    # green evidence (r2's re-confirmation) — every slot earns a row.
)

set_window_order(WINDOW)
