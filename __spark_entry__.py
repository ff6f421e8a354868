"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB twins for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yuki_spark.queries import docs, events, sim, tpch


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Insertion order is gate order (the driver caps its sweep at 50 rows).
# Round-10 rotation (staleness rule: no key's driver row older than 2
# rounds): s22/s23 open the sweep — born in r9 AFTER that sweep
# closed (never driver-validated) AND their output changed this round
# (the descent now serves the refined graph_nnd2 deposit). Then the
# 42 keys whose most recent driver row is the r7 sweep (they sit
# exactly AT the staleness boundary and MUST all be stamped r10).
# The remaining slots: s21 (code changed this round — the converged
# early-stop now skips the round-2 BUILD; output unchanged, re-proven
# under the new path), s24 (born in r10 — the 3-level ladder), and
# four r8-stamped keys pre-stamped early (d13/d14/d15/d24) to shrink
# the r11 staleness wave (46 r8 keys would otherwise fill r11 to the
# brim). Below the cap: the remaining r8-stamped keys lead the r11
# rotation, r9-stamped keys freshest at the bottom.
_PRIORITY = [
    # --- slots 1..2: changed outputs + never driver-swept
    "s22_hnsw_ann",
    "s23_hnsw_beam_sweep",
    # --- slots 3..44: every key whose most recent driver row is r7
    "d37_span_scrub",
    "d38_threshold_sweep",
    "d39_cluster_sizes",
    "e26_funnel_latency",
    "s17_ivf_probe_sweep",
    "d40_classifier_filter",
    "d41_mix_planner",
    "d42_source_novelty",
    "d43_shard_balance",
    "e27_ab_lift",
    "e28_hll_users",
    "e25_interarrival",
    "e24_common_paths",
    "s14_mmr_rerank",
    "s15_label_drift",
    "s16_knn_centrality",
    "d36_cross_source_dups",
    "d34_rag_chunking",
    "d35_bigram_rarity",
    "d4_simhash_dups",
    "d2_ngram_jaccard_dups",
    "d11_dedup_clusters",
    "d20_dedup_apply",
    "d7_token_stats",
    "d8_fingerprint",
    "d10_winnow_fingerprint",
    "d12_subword_stats",
    "d16_repetition",
    "d17_contamination",
    "d19_tfidf_top_terms",
    "d21_corpus_split",
    "d22_dup_spans",
    "d23_gopher_filter",
    "s1_cosine_topk",
    "s6_ann_recall",
    "s2_label_centroids",
    "s5_quantize_error",
    "s9_kmeans_refine",
    "s10_cluster_balance",
    "d1_exact_dedup",
    "d5_lang_id",
    "d6_quality_score",
    # --- slots 45..46: changed/new in r10
    "s21_nn_descent_converge",
    "s24_hnsw_multilevel",
    # --- slots 47..50: r8-stamped keys pre-stamped to flatten the
    # r11 staleness wave
    "d13_hash_sample",
    "d14_stratified_sample",
    "d15_profile",
    "d24_weighted_sample",
    # --- 50-slot cap lands HERE: exactly 50 keys above (2 changed +
    # 42 r7-stamped + 1 changed + 1 new + 4 pre-stamped). Below the
    # cap: s25 + d49 FIRST (born late in r10 after the sweep slots
    # were spoken for — never driver-validated, so they must open the
    # r11 sweep; judge-verifiable now via tests/test_oracle_parity.py),
    # then the remaining r8-stamped keys (they hit the staleness
    # bound in r11), then the r9-stamped wave, freshest last.
    "s25_int8_recall",
    "d49_retraction_impact",
    "d26_quality_buckets",
    "d27_bloom_contamination",
    "d29_dsir_weights",
    "d31_token_surprisal",
    "d32_doc_entropy",
    "p1_pii_scan",
    "m1_multimodal_meta",
    "m2_resize_framesample",
    "m3_audio_windows",
    "q23_skyline_parts",
    "dq1_constraint_report",
    "e2_sessionization",
    "e3_hourly_rollup",
    "e4_user_asof_value",
    "e5_funnel",
    "e7_value_percentiles_approx",
    "e12_heavy_hitters",
    "e18_rolling_active_users",
    "e19_gap_fill",
    "e20_mad_outliers",
    "e21_cusum_drift",
    "e22_psi_drift",
    "e23_seasonal_anomaly",
    "distinct_users_daily",
    "d44_bpe_tokens",
    "s18_nn_descent",
    "s19_ivfpq_ann",
    "s20_pq_shortlist_sweep",
    "d46_tokenizer_fertility",
    "d47_decontaminate_apply",
    "e29_trending_events",
    "s3_lsh_ann",
    "s11_knn_graph",
    "s12_graph_recall",
    "d9_embedding_neardup",
    "d3_minhash_lsh_dups",
    "s7_semdedup",
    "s4_ivf_ann",
    "s8_pq_ann",
    "s13_matryoshka_recall",
    "d33_split_leakage",
    "d25_domain_mix",
    "e1_event_counts",
    # --- r9-stamped keys, freshest driver rows last
    "e6_value_percentiles",
    "e8_error_window_stats",
    "e9_json_props_stats",
    "e10_value_histogram",
    "e13_zscore_outliers",
    "e14_ewma_daily",
    "e15_retention_cohorts",
    "e16_event_transitions",
    "e17_session_window_stats",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_brand_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunct_filter",
    "q20_excess_shipments",
    "q21_waiting_suppliers",
    "q22_global_sales_opp",
    "w1_top_customers_per_nation",
    "w2_running_revenue",
    "w3_moving_avg_events",
    "w4_mom_growth",
    "w5_rank_distribution",
    "gsets_revenue",
    "pivot_returnflag",
    "rollup_revenue",
    "cube_revenue",
    "semi_anti_parts",
    "union_dedup_keys",
    "sql1_revenue_by_nation",
    "setops_customer_activity",
    "setops_multiset_except",
    "d18_sequence_packing",
    "d28_token_zipf",
    "d30_oov_rate",
    "d45_langid_model",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(tpch.QUERIES)
    merged.update(events.QUERIES)
    merged.update(docs.QUERIES)
    merged.update(sim.QUERIES)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    # docs'/sim's adaptive twins derive their parameters (pairwise
    # doc cap, LSH planes/bits) from the gate catalog: build them at
    # call time so YUKI_SPARK_TEST_SF is honored now, not at whatever
    # moment the module was first imported
    out.update(docs.build_oracle())
    out.update(sim.build_oracle())
    out.update(events.ORACLE)
    out.update(tpch.ORACLE)
    return out
