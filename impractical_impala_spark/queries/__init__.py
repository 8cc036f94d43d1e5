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
               curation, analytics)

# Queries with NO driver CORRECTNESS row in any round — the non-negotiable
# core of the r3 window (round-2 verdict item #1).
NEVER_CHECKED_R2 = [
    # TPC-H wave 3
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q10_returned_items", "q12_ship_delay", "q14_promo_effect",
    "q17_small_quantity_revenue", "q19_disjunctive_predicates",
    "q22_dormant_customers",
    # TPC-H wave 4
    "q15_top_supplier", "q16_supplier_count", "q20_small_part_suppliers",
    "q21_latest_shipper", "q9_product_profit",
    # dedup pipeline artifacts
    "dedup_clusters", "dedup_survivors",
    # streaming batch twins
    "events_stream_join", "events_sliding_avg",
    # training extras
    "emb_quantize_int8", "text_length_histogram", "text_redact_pii",
    # windows
    "w6_distribution_ranks",
    # ANN (rows-only by contract)
    "ann_ivf_trained",
]

# New in round 3 — first driver exposure.
NEW_R3 = [
    "q2_min_cost_supplier", "q11_important_stock",
    "sink_roundtrip_partitioned", "ann_dedup_pipeline",
    "text_repetition_ratio", "text_ngram_contamination",
    "doc_chunk_tokens", "quality_gate_survivors",
    "events_dedup_counts",
    # round-3 session additions: curation/packing/PQ/anomaly surface
    "pack_sequences", "mix_weighted_sample", "dedup_incremental",
    "emb_pq_codes", "events_anomaly_zscore", "q_grouping_sets",
    # round-3 late additions: embedding-LSH scale path, leakage-safe
    # split, funnel-free global ranking, multimodal resize/frame-sample
    "dedup_embedding_lsh", "split_cluster_safe", "q_global_rank",
    "multimodal_resized_checksum", "multimodal_frame_sample",
    # product-analytics wave: first-touch cumulative distinct, cohort
    # retention, staged funnel, timeseries gap-fill (queries/analytics.py)
    "events_cumulative_users", "events_cohort_retention", "events_funnel",
    "events_gapfill_locf",
    # per-label embedding centroids (class prototypes)
    "emb_label_centroid",
]

WINDOW = (
    NEVER_CHECKED_R2
    + ["dedup_ngram_jaccard"]  # blocking key changed in r3 — re-prove
    + NEW_R3
    # fill: r1-era rows are the oldest; re-confirm the heaviest families
    # (fourteen r1-green fill slots rotated out for the fourteen session
    # additions: q_stratified_sample, json_extract_props, q_percentiles,
    # q_cube_revenue, w5_value_windows, q_date_functions, dedup_exact,
    # ann_cosine_topk, dedup_simhash, ann_ivf_probe,
    # multimodal_blob_stats, dedup_embedding_neardup, ann_lsh_bucketed,
    # q_salted_agg keep their r1 rows and return in a later window;
    # dedup_simhash's expression kernel is indirectly re-proven through
    # dedup_incremental + the ngram blocking key, the multimodal kernel
    # path by the two new resize/frame-sample rows, the all-pairs
    # embedding baseline + LSH re-fetch by dedup_embedding_lsh +
    # ann_dedup_pipeline, and the salted two-phase agg decomposition by
    # q_global_rank's range+offset variant of the same idea;
    # q_range_band_join also keeps its r1 row — the non-equi broadcast
    # shape reappears inside events_stream_join's interval condition;
    # dedup_minhash_lsh keeps its r1 row — its band-bucket plan is
    # unchanged since, and the whole minhash path re-runs inside the
    # driver-window dedup_clusters/dedup_survivors pipeline anyway)
    + ["q_asof_attribution"]
)

set_window_order(WINDOW)
