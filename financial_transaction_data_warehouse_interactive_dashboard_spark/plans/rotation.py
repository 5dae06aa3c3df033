"""Rotation ledger — the machine-readable driver-surface history.

The external driver caps its per-round correctness sweep at 50 queries,
so the registry (181+ entries, every one oracle-pinned locally by
tests/test_oracle_parity.py) rotates through the surface: each round a
batch of never-driver-checked entries is promoted (``driver=True``) in
place of siblings whose operator family already holds multiple green
CORRECTNESS rows. This module is the single source of truth for that
history (VERDICT r6 ask #8 — it used to live in the ``query()``
docstring); tests/test_rotation.py asserts every current driver entry is
either historically driver-green (a row in some committed
CORRECTNESS_r{N}.json) or a declared first-timer this round, and that
the surface holds exactly ``SURFACE_SIZE`` entries.

ROTATION.md at the repo root is the human-readable rendering of the
same ledger; keep both in sync (the test cross-checks the round
numbers).
"""

from __future__ import annotations

SURFACE_SIZE = 50

#: The round whose rotation is in flight (CORRECTNESS_r{CURRENT_ROUND}
#: does not exist yet when this round's code is committed).
CURRENT_ROUND = 7

#: Per-round promotions/demotions. Rounds 1-4 predate the protocol: the
#: surface was the initial 50 picks with ad-hoc swaps recorded only in
#: the CORRECTNESS files themselves.
ROTATION_HISTORY: dict[int, dict[str, tuple[str, ...]]] = {
    5: {
        "in": (
            "mm_blob_meta", "wh_expectations", "wh_table_profile",
            "tx_pii_scrub", "tx_decontaminate", "st_stream_stream_join",
            "sim_quantize_int8", "a22_brand_pagerank",
        ),
        "out": (
            "dd_simhash_pairs", "st_tumbling_hourly", "ev_props_extract",
            "j7_name_remap", "f4_contains", "c1_timestamp_roundtrip",
            "a8_rollup_region_nation", "w4_surrogate_keys",
        ),
    },
    6: {
        "in": (
            "a23_brand_triangles", "a24_revenue_gini",
            "ev_attribution_last_touch", "j8_fx_convert",
            "mm_wav_features", "wh_scd2_history", "tx_split_by_cluster",
            "wh_zorder_skipping",
        ),
        "out": (
            "q2_top_priorities_q4", "q3_quarter_ranking", "ev_rolling_7d",
            "ev_funnel_vcp", "dd_ngram_jaccard", "sim_topk_bruteforce",
            "mm_features_resize", "st_sessionize_stateful",
        ),
    },
    7: {
        # The evidence-backlog round (VERDICT r6 ask #1, taken to its
        # stated maximum: "retire every entry with >=2 green driver
        # rows"). 41 never-driver-checked promotions + 1 new entry
        # (a24_revenue_gini_scale_safe, the driver-gated two-phase-rank
        # plan claim); the surface keeps the 8 single-green r6
        # first-timers for their second row. Every promotion was
        # verified bit-exact against its oracle at BOTH sf0.01 and
        # sf0.1 from a fresh process this round before the flip.
        "in": (
            # wave 1
            "qa_ks_two_sample", "qa_psi_price_drift", "qa_wilson_ci",
            "dd_incremental_minhash", "dd_segment_dedup", "st_late_data",
            "ev_peak_concurrency", "ev_active_users_hll", "wh_bloom_prune",
            "wh_bucketed_join", "tx_curriculum_order",
            "a32_brand_cheapest_path", "tpch_q5_local_supplier_volume",
            "a24_revenue_gini_scale_safe",
            # wave 2 (maximal backlog burn-down)
            "qa_mann_whitney", "dd_incremental_dedup", "wh_time_travel",
            "wh_incremental_join", "st_daily_actives_hll",
            "ev_time_to_convert", "tx_span_corruption",
            "a34_brand_closeness", "tpch_q1_pricing_summary",
            "ev_cusum_daily", "dd_qgram_edit_join", "a33_segment_skyline",
            "qa_higher_moments", "ev_forecast_backtest", "qa_welch_t",
            "qa_chi_square_segment_status", "ev_autocorr_daily",
            "ev_trend_regression", "ev_seasonal_decompose",
            "a16_rfm_segmentation", "a17_pareto_customers",
            "a30_brand_ppr", "a31_brand_khop", "a26_brand_communities",
            "wh_schema_evolution", "wh_vacuum_retention",
            "wh_orphan_audit", "ev_wau_stickiness",
        ),
        "out": (
            # wave 1
            "a4_kpis", "a6_distinct_dims", "w1_quarter_trend",
            "j5_anti_join", "j6_topk_semi", "o4_group_total_order",
            "a11_pivot_quarter_status", "x2_union_intersect",
            "dd_exact_dedup", "dd_minhash_lsh",
            "dd_embedding_neardup_blocked", "sim_ann_signlsh",
            "tx_tfidf_top_terms", "ev_sliding_1h_15m",
            # wave 2
            "q1_top_segments", "j1_fact_build", "j3_gold_denorm",
            "a12_star_measures", "a13_percentile_sketch",
            "a14_grouping_sets", "dd_neardup_components",
            "sim_ann_ivf_kmeans_iter3", "dd_corpus_clean",
            "tx_hash_split", "w5_rank_functions",
            "a5_unique_customers_approx", "tx_text_profile",
            "ev_asof_purchase", "ev_range_views_before_purchase",
            "wh_gold_maintenance", "st_dedup", "st_sessionize",
            "mm_blob_meta", "st_foreach_batch_sink", "sk_salted_hot_join",
            "wh_table_profile", "wh_expectations", "sim_quantize_int8",
            "tx_decontaminate", "tx_pii_scrub", "st_stream_stream_join",
            "a22_brand_pagerank",
        ),
    },
}

#: Re-promotions: entries that already held a driver row but were
#: swapped back in because their IMPLEMENTATION changed enough that the
#: old evidence no longer covers them (name -> round of re-promotion).
RE_PROMOTED: dict[str, int] = {
    # r1 rows predate the real-BMP decoder; r5 re-promoted to gate the
    # new pure-Python pixel path under the driver hash.
    "mm_blob_meta": 5,
}

#: Never-driver-checked entries queued for the NEXT round's promotion,
#: strongest oracles first (one per operator family per round where the
#: surface allows). Kept here, not in docstrings, so the queue and the
#: history live together.
NEXT_QUEUE: tuple[str, ...] = (
    "sim_recall_at_k",          # ANN quality measured in-engine
    "sim_ann_pq_adc",           # product quantization + ADC
    "mm_bmp_pixels",            # real BMP decode + brightness stats
    "mm_avi_frames",            # real AVI container walk
    "st_cdc_apply",             # streaming microbatch CDC fold
    "st_stream_merge_rollup",   # kappa ingest upsert + rollup
    "tpch_q3_shipping_priority",  # TPC-H Q3
    "tpch_q4_late_orders",      # TPC-H Q4 EXISTS semi
    "a28_customer_kmeans",      # fixed-iteration Lloyd, exact centroids
    "a35_survival_km",          # Kaplan-Meier churn with censoring
    "ev_ewma_daily",            # bounded scatter-convolution EWMA
    "dd_passage_dupes",         # 16-gram duplicated-passage spans
    "tx_stratified_sample",     # per-language quota sampling
    "wh_incremental_rollup",    # materialized rollup maintenance
)
