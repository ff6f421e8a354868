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
# Round-5 rotation: keys whose machinery changed THIS round lead —
# the catalog-adaptive pairwise cap (d2/d3/d4, now full-corpus), the
# set-collapsed clustering (d11/d20), the libm-free A-Res scoring
# (d24), the real-codec multimodal decode (m1–m3), the skyline tree
# resolve (q23), and the skew-guard-touched ANN paths (s3/s11) — then
# the two keys whose last driver row is still r2 (s2/s5), then every
# remaining key, freshest last.
_PRIORITY = [
    # new this round (freshness rule: new keys lead the sweep)
    "d31_token_surprisal",
    "d32_doc_entropy",
    "e22_psi_drift",
    "d33_split_leakage",
    "e23_seasonal_anomaly",
    # changed this round
    "d24_weighted_sample",
    "d2_ngram_jaccard_dups",
    "d3_minhash_lsh_dups",
    "d4_simhash_dups",
    "d11_dedup_clusters",
    "d20_dedup_apply",
    "q23_skyline_parts",
    "m1_multimodal_meta",
    "m2_resize_framesample",
    "m3_audio_windows",
    "s3_lsh_ann",
    "s11_knn_graph",
    # last driver row r2, code unchanged — the two remaining stale keys
    "s2_label_centroids",
    "s5_quantize_error",
    # r4-new keys, one driver row so far
    "e21_cusum_drift",
    "d29_dsir_weights",
    "s10_cluster_balance",
    "dq1_constraint_report",
    "d30_oov_rate",
    "d9_embedding_neardup",
    "s4_ivf_ann",
    "s6_ann_recall",
    "e7_value_percentiles_approx",
    "e12_heavy_hitters",
    "d13_hash_sample",
    "d14_stratified_sample",
    "d15_profile",
    "p1_pii_scan",
    "d26_quality_buckets",
    "e18_rolling_active_users",
    "e19_gap_fill",
    "e20_mad_outliers",
    "d27_bloom_contamination",
    "s8_pq_ann",
    "s9_kmeans_refine",
    "d28_token_zipf",
    "s7_semdedup",
    # older green rows — refresh while slots allow
    "distinct_users_daily",
    "e2_sessionization",
    "e3_hourly_rollup",
    "e4_user_asof_value",
    "e5_funnel",
    "d1_exact_dedup",
    "d5_lang_id",
    "d6_quality_score",
    "d7_token_stats",
    "d8_fingerprint",
    "d10_winnow_fingerprint",
    "d12_subword_stats",
    "d16_repetition",
    "d17_contamination",
    "d18_sequence_packing",
    "d19_tfidf_top_terms",
    "d21_corpus_split",
    "d22_dup_spans",
    "d23_gopher_filter",
    "s1_cosine_topk",
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
