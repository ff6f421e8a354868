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
# Round-13 rotation (staleness rule: no key's driver row older than 2
# rounds — at r13 the valid stamps are r11/r12/r13, so the 50 keys
# whose latest row is r10 hit the bound and must re-sweep). The
# must-sweep set is 4 r12-born keys (zero CORRECTNESS rows — the hard
# constraint, they open the sweep per the r12 verdict) + 50
# r10-stamped = 54 > 50. Per the r12 verdict and the _R13_PRESTAMP
# note recorded at the r12 close, the LAST four r10-stamped keys
# (s2_label_centroids, s5_quantize_error, s6_ann_recall,
# s9_kmeans_refine — the cheapest, most-stable family tails) are the
# displaced handful: their evidence is two-scale fresh (full 154-key
# sf0.01 parity sweep in the r12 citest + manual sf0.1 bit-exact
# parity at the r12 close), so their driver row staying r10 until r14
# is covered. They move directly below the cap and MUST open r14.
_PRIORITY = [
    # --- slots 1..4: born r12 AFTER that round's rotation locked —
    # never driver-validated (judge-green in the full 154-key local
    # parity sweep at the r12 close); the r12 verdict orders them to
    # open the r13 sweep
    "s29_filtered_graph_ann",
    "s30_ivf_churn",
    "d53_video_phash_dups",
    "d54_perplexity_filter",
    # --- slots 5..50: the r10-stamped keys at the staleness bound,
    # in the order the r12 close recorded (46 of 50; the displaced
    # tail four sit below the cap with two-scale prestamp evidence)
    "d10_winnow_fingerprint",
    "d11_dedup_clusters",
    "d12_subword_stats",
    "d13_hash_sample",
    "d14_stratified_sample",
    "d15_profile",
    "d16_repetition",
    "d17_contamination",
    "d19_tfidf_top_terms",
    "d1_exact_dedup",
    "d20_dedup_apply",
    "d21_corpus_split",
    "d22_dup_spans",
    "d23_gopher_filter",
    "d24_weighted_sample",
    "d2_ngram_jaccard_dups",
    "d34_rag_chunking",
    "d35_bigram_rarity",
    "d36_cross_source_dups",
    "d37_span_scrub",
    "d38_threshold_sweep",
    "d39_cluster_sizes",
    "d40_classifier_filter",
    "d41_mix_planner",
    "d42_source_novelty",
    "d43_shard_balance",
    "d4_simhash_dups",
    "d5_lang_id",
    "d6_quality_score",
    "d7_token_stats",
    "d8_fingerprint",
    "e24_common_paths",
    "e25_interarrival",
    "e26_funnel_latency",
    "e27_ab_lift",
    "e28_hll_users",
    "s10_cluster_balance",
    "s14_mmr_rerank",
    "s15_label_drift",
    "s16_knn_centrality",
    "s17_ivf_probe_sweep",
    "s1_cosine_topk",
    "s21_nn_descent_converge",
    "s22_hnsw_ann",
    "s23_hnsw_beam_sweep",
    "s24_hnsw_multilevel",
    # --- 50-slot cap lands HERE: exactly 50 keys above (4 r12-born +
    # 46 r10-stamped). Below the cap: first the four DISPLACED
    # r10-stamped keys (driver row r10 + two-scale prestamps — they
    # MUST open the r14 sweep), then keys born in r13 (each with an
    # _R14_PRESTAMP-style note when the round closes), then the 50
    # r11-stamped keys (they hit the staleness bound at r14 and fill
    # r14's remaining slots), then the 50 r12-stamped keys freshest
    # at the bottom.
    # --- displaced r10-stamped tail (per _R13_PRESTAMP recorded at
    # the r12 close: full 154-key sf0.01 parity sweep + manual sf0.1
    # bit-exact parity, both at the r12 close — two-scale fresh):
    "s2_label_centroids",
    "s5_quantize_error",
    "s6_ann_recall",
    "s9_kmeans_refine",
    # --- born in r13 go HERE as they land (zero driver rows;
    # judge-green in the local parity gate; they MUST sweep in r14
    # alongside the displaced four):
    "s31_pq_churn",
    "d55_audio_fingerprint_dups",
    "d56_trigram_lm_perplexity",
    "s32_filtered_ann_auto",
    "d57_bpe_train",
    "d58_learned_bpe_budget",
    # _R14_PRESTAMP: r14's must-sweep set is the 4 displaced
    # r10-stamped keys above + the 6 r13-born keys + the 50
    # r11-stamped keys below = 60 > 50. The displaced four and the
    # r13-born six take slots 1..10 (oldest/zero evidence first); 40
    # of the 50 r11-stamped keys fill the rest, and the LAST TEN
    # r11-stamped keys in the order below (s12_graph_recall,
    # s13_matryoshka_recall, s18_nn_descent, s3_lsh_ann, s4_ivf_ann,
    # s7_semdedup, s8_pq_ann, s19_ivfpq_ann, s20_pq_shortlist_sweep,
    # d9_embedding_neardup — stable sim-family tails) become r14's
    # displaced handful. The r13 close-out runs the FULL local parity
    # gate (tests/test_oracle_parity.py, every key, sf0.01 vs DuckDB)
    # so the whole r11-stamped block is freshly judge-green locally;
    # the ten named keys get additional manual sf0.1 parity at the
    # r13 close, mirroring the two-scale discipline that covered this
    # round's displaced four. DONE at the r13 close: all ten compared
    # NONE-problems at sf0.1 (bit-exact vs DuckDB) on top of the full
    # sf0.01 sweep — two-scale prestamp evidence recorded.
    # --- r11-stamped (hit the bound at r14; ordered so r14's
    # displaced tail is the LAST ten):
    "s25_int8_recall",
    "d49_retraction_impact",
    "s26_hnsw_adaptive",
    "d50_image_phash_dups",
    "d51_html_extract",
    "s27_graph_churn",
    "s28_filtered_ann",
    "d25_domain_mix",
    "d26_quality_buckets",
    "d27_bloom_contamination",
    "d29_dsir_weights",
    "d31_token_surprisal",
    "d32_doc_entropy",
    "d33_split_leakage",
    "d3_minhash_lsh_dups",
    "d44_bpe_tokens",
    "d46_tokenizer_fertility",
    "d47_decontaminate_apply",
    "distinct_users_daily",
    "dq1_constraint_report",
    "e12_heavy_hitters",
    "e18_rolling_active_users",
    "e19_gap_fill",
    "e1_event_counts",
    "e20_mad_outliers",
    "e21_cusum_drift",
    "e22_psi_drift",
    "e23_seasonal_anomaly",
    "e29_trending_events",
    "e2_sessionization",
    "e3_hourly_rollup",
    "e4_user_asof_value",
    "e5_funnel",
    "e7_value_percentiles_approx",
    "m1_multimodal_meta",
    "m2_resize_framesample",
    "m3_audio_windows",
    "p1_pii_scan",
    "q23_skyline_parts",
    "s11_knn_graph",
    "s12_graph_recall",
    "s13_matryoshka_recall",
    "s18_nn_descent",
    "s3_lsh_ann",
    "s4_ivf_ann",
    "s7_semdedup",
    "s8_pq_ann",
    "s19_ivfpq_ann",
    "s20_pq_shortlist_sweep",
    "d9_embedding_neardup",
    # --- r12-stamped (freshest driver rows — swept last)
    "d52_bigram_lm_perplexity",
    "cube_revenue",
    "d18_sequence_packing",
    "d28_token_zipf",
    "d30_oov_rate",
    "d45_langid_model",
    "e10_value_histogram",
    "e13_zscore_outliers",
    "e14_ewma_daily",
    "e15_retention_cohorts",
    "e16_event_transitions",
    "e17_session_window_stats",
    "e6_value_percentiles",
    "e8_error_window_stats",
    "e9_json_props_stats",
    "gsets_revenue",
    "pivot_returnflag",
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
    "q1_pricing_summary",
    "q20_excess_shipments",
    "q21_waiting_suppliers",
    "q22_global_sales_opp",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "rollup_revenue",
    "semi_anti_parts",
    "setops_customer_activity",
    "setops_multiset_except",
    "sql1_revenue_by_nation",
    "union_dedup_keys",
    "w1_top_customers_per_nation",
    "w2_running_revenue",
    "w3_moving_avg_events",
    "w4_mom_growth",
    "w5_rank_distribution",
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
