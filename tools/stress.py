"""Scale stress: blow the sf0.1 tables up K× (key-shifted copies) into
a temp catalog and time headline operators — the local proxy for "does
the plan survive a scale-up", catching super-linear cliffs that sf0.1
can't show.

Copies are *content-decorrelated* so overlap-shaped operators keep
realistic output growth (otherwise identical copies make dup pairs /
window matches grow K² — a harness artifact, not an operator flaw):
- documents: each copy appends a copy-tag token, so cross-copy texts
  are no longer byte-identical (intra-copy dup structure preserved);
- events: each copy shifts timestamps into its own decade, so
  time-range joins never match across copies;
- embeddings: each copy applies a fixed sign-flip pattern — flipping
  the SAME coordinates of both vectors preserves every intra-copy dot
  product exactly while decorrelating cross-copy cosines.

Usage: python tools/stress.py [K] [out_dir]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
KEYED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "supplier", "part"]  # dims stay dim-sized
SHIFT = 10_000_000


def build(spark, k: int, out: str) -> None:
    from pyspark.sql import functions as F

    from yuki_spark.catalog import load

    os.makedirs(out, exist_ok=True)
    for t in COPY:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in KEYED.items():
        df = load(spark, SRC, t)
        parts = []
        for i in range(k):
            p = df
            for key in keys:
                p = p.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            if i > 0 and t == "documents":
                p = p.withColumn("text", F.concat(F.col("text"), F.lit(f" qcopy{i}q")))
            if i > 0 and t == "events":
                # one decade per copy; ts may surface as TIMESTAMP or
                # as long nanos depending on the reader conf
                if dict(df.dtypes)["ts"] in ("bigint", "long"):
                    p = p.withColumn(
                        "ts", F.col("ts") + F.lit(i * 3650 * 86400 * 1_000_000_000)
                    )
                else:
                    p = p.withColumn(
                        "ts", F.col("ts") + F.expr(f"INTERVAL {i * 3650} DAYS")
                    )
            if i > 0 and t == "embeddings":
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when((j + F.lit(i)) % 7 < 3, -x).otherwise(x),
                    ),
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/stress_sf{k}x"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from yuki_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out}/lineitem.parquet"):
        t0 = time.perf_counter()
        build(spark, k, out)
        print(f"built {k}x catalog in {time.perf_counter()-t0:.1f}s -> {out}", file=sys.stderr)

    qs = entry.queries()
    names = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q9_product_profit",
        "q18_large_orders",
        "q21_waiting_suppliers",
        "w1_top_customers_per_nation",
        "e2_sessionization",
        "e4_user_asof_value",
        "d1_exact_dedup",
        "d3_minhash_lsh_dups",
        "d6_quality_score",
        "d9_embedding_neardup",
        "d10_winnow_fingerprint",
        "s1_cosine_topk",
        "e8_error_window_stats",
        "e9_json_props_stats",
        "e13_zscore_outliers",
        "d16_repetition",
        "d17_contamination",
        "d18_sequence_packing",
        "d19_tfidf_top_terms",
        "s5_quantize_error",
        "s7_semdedup",
        "q23_skyline_parts",
        "e17_session_window_stats",
        "d24_weighted_sample",
        "e19_gap_fill",
        "e20_mad_outliers",
        "d27_bloom_contamination",
        "s8_pq_ann",
        "s9_kmeans_refine",
        "e21_cusum_drift",
        "d29_dsir_weights",
        "s10_cluster_balance",
        "dq1_constraint_report",
        "d30_oov_rate",
        "s11_knn_graph",
        "d31_token_surprisal",
        "d32_doc_entropy",
        "e22_psi_drift",
        # round-6 additions: the deposit-backed near-dup family (d33
        # is the audit that was r5's cost spike; d11/d20 share its
        # deposits — the FIRST of the three pays the tokenize/PPJoin/
        # CC pass for the 10x corpus, the others read it) and the s12
        # graph-recall harness
        "d33_split_leakage",
        "d11_dedup_clusters",
        "d20_dedup_apply",
        "s12_graph_recall",
        # round-7 additions: the chunking/bigram map-agg queries, the
        # deposit-consuming cross-source audit, and the single-stage
        # MMR re-rank (pool + fold both scale with the corpus)
        "d34_rag_chunking",
        "d35_bigram_rarity",
        "d36_cross_source_dups",
        "s14_mmr_rerank",
        "s15_label_drift",
        "s16_knn_centrality",
        "e24_common_paths",
        # d37 re-runs d22's gram-agg profile plus the removable-span
        # position explode — the explode volume is the scale risk
        "d37_span_scrub",
        # deposit consumers (sweep/histogram) + the user-window gap
        # percentiles — cheap by design; stressed to prove it
        "d38_threshold_sweep",
        "d39_cluster_sizes",
        "e25_interarrival",
        # r7 late additions: funnel latency joins (e5-shaped) and the
        # IVF sweep (three deposit reads + tiny hit-joins)
        "e26_funnel_latency",
        "s17_ivf_probe_sweep",
        # classifier scoring: one explode + codegen hash arithmetic —
        # the token-volume linearity is the thing to watch at 10×
        "d40_classifier_filter",
        # mix planner (scan + two tiny exchanges), shingle novelty
        # (explode→distinct→spread join — vocabulary-bounded), and the
        # A/B rollup (one user-grain shuffle)
        "d41_mix_planner",
        "d42_source_novelty",
        "e27_ab_lift",
        # shard deal: the offset-table window must stay tiny (distinct
        # token counts) while the doc-side window distributes
        "d43_shard_balance",
        # HLL cardinality: the map-side-mergeable sketch agg that
        # replaces exact COUNT(DISTINCT) at scale
        "e28_hll_users",
        # round-8 additions: BPE at vocabulary grain (the corpus pass
        # must stay one explode + hash-agg; the Arrow stage is
        # vocab-sized), the char-trigram classifier (O(chars) explode —
        # the volume to watch), and the NN-descent round (k² self-join
        # over the deposited edge table + keyed re-rank joins)
        "d44_bpe_tokens",
        "d45_langid_model",
        "s18_nn_descent",
        # round-9: iterated NN-descent — two k² rounds + full-graph
        # edge anti-joins must stay bounded by the n·k edge volume
        "s21_nn_descent_converge",
        # round-9: layered descent — entry cross is |lvl2|-bounded and
        # every hop is an edge-deposit equi-join; must stay flat at 10×
        "s22_hnsw_ann",
        "s23_hnsw_beam_sweep",
        # round-10: the 3-level ladder — one more bounded per-level
        # block (graph_l2 deposit) on top of the same descent plan
        "s24_hnsw_multilevel",
        # round-10: int8-code brute force (s1's audited pattern over
        # quantized vectors) — linear in n, must track s1's ratio
        "s25_int8_recall",
        # round-10: retraction pricing — deposit-label joins + one
        # corpus tokenize pass; must stay deposit-cheap at 10×
        "d49_retraction_impact",
        # IVF-ADC: the probed-cells-only ADC scan must beat/track s8's
        # whole-corpus ADC as n grows; the sweep + fertility audit are
        # deposit/agg consumers stressed to prove they stay cheap
        "s19_ivfpq_ann",
        "s20_pq_shortlist_sweep",
        "d46_tokenizer_fertility",
        # decontamination apply (d17's broadcast membership + one keyed
        # join) and the trending leaderboard (one day×type hash-agg +
        # two windows over the aggregated grid)
        "d47_decontaminate_apply",
        "e29_trending_events",
        # round-11: the formula-derived ladder (depth GROWS with the
        # 10x corpus — the log(n) claim stressed, one more bounded
        # level block), the churn script (bounded <=256-member demo
        # grain by churn_modulus at ANY n — must stay flat), the
        # rep-grain perceptual-hash banding (d4's shape, narrower
        # chunk keys), and the linear HTML extraction
        "s26_hnsw_adaptive",
        "s27_graph_churn",
        # pre/post-filter ANN: the tenant predicate must keep riding
        # the probed-cell join as candidate volume grows
        "s28_filtered_ann",
        "d50_image_phash_dups",
        "d51_html_extract",
        # stupid-backoff bigram LM: bigram/context/unigram TYPE-grain
        # aggs + type-grain log2 chains — token-volume linearity and
        # type-grain boundedness are the things to watch at 10x
        "d52_bigram_lm_perplexity",
        # round-12: filtered graph ANN — 4 filtered descents + 3
        # shared unfiltered pools over the same two graph deposits;
        # every hop/pool stays nq-bounded, so the 10x cost must track
        # s23's (deposit build + bounded serving)
        "s29_filtered_graph_ann",
        # round-12: IVF churn maintenance — two broadcast-codebook
        # assignment passes + codebook-grain drift; must stay linear
        # (the broadcast side is the <=n_labels-row frozen codebook)
        "s30_ivf_churn",
        # round-13: PQ code-deposit churn — two per-vector encode
        # passes (no join) + two <=128-row codebook aggs + the
        # broadcast drift join; must stay linear like s30
        "s31_pq_churn",
        # round-12: video perceptual dedup — array-native chunk/hash
        # projection + four linear Arrow passes + the 2x28-bit
        # banding; token-volume linearity + candidate boundedness are
        # the things to watch at 10x
        "d53_video_phash_dups",
        # round-12: the perplexity APPLY — d52's type-grain chain + a
        # single-row percentile broadcast + one lang hash-agg; must
        # track d52's cost (shared chain), nothing super-linear
        "d54_perplexity_filter",
        # round-13: BPE training — one corpus explode + capped-vocab
        # iterations; the cap makes the loop cost corpus-INDEPENDENT,
        # so 10x must move only the corpus pass
        "d57_bpe_train",
        # round-13: learned-artifact application — d57's training +
        # full-vocab replace passes + the d44 broadcast-join shape;
        # vocab grain, so 10x must move only the corpus pass
        "d58_learned_bpe_budget",
        # round-13: policy-dispatched filtered ANN — a strict subset
        # of s29's audited chains (two exact truths, one pool, one
        # filtered descent, one IVF pre pass); 10x cost must track s29
        "s32_filtered_ann_auto",
        # round-13: order-3 LM — d52's type-grain shape with one more
        # explode+agg level (5 type-grain hash-aggs); token-volume
        # linearity is the thing to watch at 10x
        "d56_trigram_lm_perplexity",
        # round-13: audio perceptual dedup — one hash projection + two
        # linear Arrow passes (WAV encode, decode+window+hash) at clip
        # grain + the 2x28-bit banding; token-volume linearity +
        # candidate boundedness are the things to watch at 10x (d53's
        # shape on the third modality)
        "d55_audio_fingerprint_dups",
        # round-14: the composed curation DAG — runs the real chain
        # end-to-end (extract -> lang -> gopher -> dedup family ->
        # decontaminate -> split -> pack -> learned-BPE budget) and
        # deposits the report; at 10x the things to watch are the
        # extraction string algebra (linear), the funnel joins, and
        # that the dedup stage stays a keyed anti-join against the
        # family deposit rather than a re-cluster
        "pl1_curation_pipeline",
        # round-14: perceptron train + percentile-budget apply — the
        # feature build is one explode + (doc,bucket) hash-agg; each
        # training pass is a broadcast weight join + two hash-aggs;
        # token-volume linearity × CLF_TRAIN_ITERS is the 10x watch
        "d60_learned_classifier_filter",
        # round-14: shot-boundary detection — d53's linear front half
        # (tokenize + two Arrow passes at frame grain) + an equi step
        # join; frame-volume linearity is the 10x watch (no pair
        # stage anywhere)
        "m4_video_scene_cuts",
    ]
    qs["q1_pricing_summary"](spark, out).write.mode("overwrite").format("noop").save()
    timings = {}
    for n in names:
        t0 = time.perf_counter()
        qs[n](spark, out).write.mode("overwrite").format("noop").save()
        timings[n] = round(time.perf_counter() - t0, 2)
    audit, violations = lsh_population_audit(spark, out)
    skew = skew_join_audit(spark)
    domain = offset_domain_audit(spark, out)
    churn = churn_repair_audit(spark, SRC, out)
    # print BEFORE asserting: an audit failure must not discard the
    # timings this (long) run already paid for
    print(
        json.dumps(
            {
                "k": k,
                "queries": timings,
                "total": round(sum(timings.values()), 2),
                "lsh_audit": audit,
                "lsh_violations": violations,
                "skew_join": skew,
                "offset_domain": domain,
                "churn_repair": churn,
            }
        )
    )
    assert not violations, f"LSH population caps blown: {violations}"
    assert skew["skew_splits"] > 0, f"AQE skew-join split did not fire: {skew}"
    # LSH churn repair: per-touched candidate volume must stay ~flat
    # as n grows K× (adaptive planes absorb the growth; 4× headroom
    # for bucket skew). The exact-mode equivalent would grow by K.
    # A None ratio means ZERO candidate pairs at 1x — the baseline is
    # degenerate (audit corpus too small to populate any bucket twice),
    # which should never happen at the audited SFs: fail loud.
    assert churn["pairs_ratio"] is not None, f"degenerate 1x baseline: {churn}"
    assert churn["pairs_ratio"] <= 4, f"churn repair work grew: {churn}"
    # d43's offset table is the ONE remaining single-task window (over
    # DISTINCT n_tokens values). Pin that its domain stays both small
    # in absolute terms and ≪ the corpus, so a future data-model
    # change (e.g. n_tokens becoming corpus-unique) can't silently
    # recreate the corpus-grain window the r8 verdict flagged. d18's
    # bucket domain is bounded by construction (PACK_BUCKETS) and
    # audited here for the same reason.
    assert domain["distinct_n_tokens"] <= 10_000, domain
    assert domain["distinct_n_tokens"] * 10 <= domain["docs"], domain
    assert domain["d18_offset_rows"] <= domain["d18_offset_cap"], domain


def churn_repair_audit(spark, src: str, out: str) -> dict:
    """Per-batch churn-repair work must stay ~flat as the corpus
    grows (r12, closing the r11 verdict's O(touched·n) wart): in
    knn_graph_retract/ingest's ``repair="lsh"`` mode the exact scores
    a churn batch pays are the multi-probe bucket candidate pairs —
    O(touched · (planes+1) · expected-bucket ≤ ANN_TARGET_BUCKET) —
    not a broadcast against the full pool. Measured directly: the
    candidate-pair count for a fixed 32-vertex touched cohort at 1×
    vs K×. The adaptive plane width grows with log(n), so
    pairs-per-touched should move by at most a small skew factor
    while n grows 10×; the exact-mode equivalent would grow by
    exactly K. (Without a persisted bucket table each repair
    call also pays one linear no-shuffle sign-bucketing scan of the
    pool; the streaming loops persist exactly that table as a
    per-deposit "_buckets" sidecar at a frozen width and hand it to
    the operators' ``bucketed`` parameter — see knn_graph_retract.) The probe set comes from the SAME
    _multi_probes helper the operators use, so this audit cannot
    drift from the candidates the repair actually generates."""
    import time as _t

    from pyspark.sql import functions as F

    from yuki_spark.catalog import load, table_rows
    from yuki_spark.operators import similarity as S

    res: dict = {}
    for tag, d in (("1x", src), ("kx", out)):
        n = table_rows(d, "embeddings")
        planes = S.adaptive_planes(n)
        emb = load(spark, d, "embeddings")
        bucketed = S._sign_bucketed(emb, planes).localCheckpoint(eager=False)
        probes = S._multi_probes(planes)
        touched = bucketed.orderBy("vec_id").limit(32).select("vec_id")
        qb = bucketed.join(touched, "vec_id", "left_semi").select(
            F.col("vec_id").alias("qid"), F.explode(probes).alias("bucket")
        )
        cb = bucketed.select(F.col("vec_id").alias("cid"), "bucket")
        t0 = _t.perf_counter()
        pairs = (
            qb.join(cb, "bucket")
            .where(F.col("qid") != F.col("cid"))
            .select("qid", "cid")
            .distinct()
            .count()
        )
        res[tag] = {
            "n": n,
            "planes": planes,
            "touched": 32,
            "cand_pairs": pairs,
            "pairs_per_touched": round(pairs / 32, 1),
            "wall_s": round(_t.perf_counter() - t0, 2),
        }
    # ratio from the UNROUNDED counts (the display value rounds to one
    # decimal, which would both fabricate a zero baseline at 1 pair
    # and distort the <=4 growth gate on small baselines); guard only
    # against a truly ZERO baseline (ratio undefined, report None) —
    # clamping to 1.0 would silently rescale a sub-1.0 true baseline
    base = res["1x"]["cand_pairs"]
    res["pairs_ratio"] = (
        round(res["kx"]["cand_pairs"] / base, 2) if base > 0 else None
    )
    return res


def offset_domain_audit(spark, sf_dir: str) -> dict:
    """Cardinalities of the broadcast offset tables behind d43's and
    d18's distributed rank/prefix-sum decompositions."""
    from pyspark.sql import functions as F

    from yuki_spark.catalog import load
    from yuki_spark.operators import text
    from yuki_spark.queries.docs import PACK_BUCKETS

    t = text.with_tokens(load(spark, sf_dir, "documents"))
    row = t.agg(
        F.countDistinct("n_tokens").alias("nt"),
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("lang").alias("langs"),
    ).first()
    bounds = t.agg(
        F.min("doc_id").alias("lo"),
        F.expr(f"((max(doc_id) - min(doc_id)) div {PACK_BUCKETS}) + 1").alias("bw"),
    ).first()
    d18_rows = (
        t.select(
            "lang",
            F.expr(f"(doc_id - {bounds['lo']}) div {bounds['bw']}").alias("bkt"),
        )
        .distinct()
        .count()
    )
    return {
        "distinct_n_tokens": row["nt"],
        "docs": row["docs"],
        "d18_offset_rows": d18_rows,
        "d18_offset_cap": row["langs"] * PACK_BUCKETS,
    }


def skew_join_audit(spark) -> dict:
    """Demonstrate AQE skew-join resilience — the mechanism the 100 TB
    design leans on for hot keys (SURVEY §4). Builds a join whose left
    side puts 50% of rows on ONE key (the straggler shape: one shuffle
    partition ~n/2 while the median is tiny), runs it with the
    skew-join optimizer on and off, and verifies the optimizer split
    the oversized partition (``skew=true`` on the SortMergeJoin in the
    final adaptive plan — only present after an action; AQE finalizes
    lazily). Thresholds are lowered to local-mode data sizes; on a
    real cluster the 256 MB default plays the same role. Both (warm)
    wall-clocks are reported; at this local scale the split buys a
    modest edge — the hot partition is only seconds of work — while on
    a cluster the same mechanism removes an hours-long straggler."""
    import re

    from pyspark.sql import functions as F

    lowered = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        # local-mode shuffle stats are COMPRESSED sizes: the hot
        # partition's ~60 MB raw lands well under 1 MB after lz4 on
        # low-entropy data, so thresholds sit at 100k to keep the
        # detection honest at this data scale (cluster default 256 MB
        # plays the same role against real shuffle sizes)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    saved["spark.sql.adaptive.skewJoin.enabled"] = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", None
    )

    def run(enabled: bool) -> tuple[float, int]:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        n = 8_000_000
        left = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            # high-entropy payload: a repeated-literal payload lz4-compressed
            # ~40x in the shuffle, dropping the hot partition UNDER the skew
            # threshold — the audit then reported a false "did not fire"
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
            ).alias("pl"),
        )
        right = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = (
            left.join(right, "k")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("s"))
        )
        t0 = time.perf_counter()
        row = j.collect()[0]
        dt = time.perf_counter() - t0
        assert row["n_rows"] == n // 2 + 100_000, row  # same answer either mode
        plan = j._jdf.queryExecution().executedPlan().toString()
        return dt, len(re.findall(r"skew=true", plan))

    try:
        for key, val in lowered.items():
            spark.conf.set(key, val)
        run(False)  # warmup: codegen + shuffle paths; discard timing
        t_on, splits_on = run(True)
        t_off, splits_off = run(False)
    finally:
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
    return {
        "skew_splits": splits_on,
        "skew_splits_disabled": splits_off,
        "wall_s_skewjoin_on": round(t_on, 2),
        "wall_s_skewjoin_off": round(t_off, 2),
    }


def lsh_population_audit(spark, sf_dir: str) -> tuple[dict, list[str]]:
    """Assert the adaptive LSH parameters keep per-bucket / per-cell
    populations bounded as the corpus grows (the fixed-bucket-count
    quantization this replaces made bucket-local quadratic work grow
    O(n²/buckets)). Bounds are multiples of the design targets with
    skew headroom — a regression to fixed parameters blows them up by
    the data-growth factor and fails loudly."""
    from pyspark.sql import functions as F

    from yuki_spark.catalog import load, table_rows
    from yuki_spark.operators import similarity as S

    n = table_rows(sf_dir, "embeddings")
    bits, n_planes = S.adaptive_bits(n), S.adaptive_planes(n)
    emb = load(spark, sf_dir, "embeddings")
    sv = emb.select("vec_id", S.scaled("embedding").alias("sv"))

    sig = sv.withColumn(
        "buckets", S._nd_bucket_udf(S.lsh_planes(S.NEARDUP_BANDS * bits), S.NEARDUP_BANDS, bits)("sv")
    ).select(F.posexplode("buckets").alias("band", "bucket"))
    nd_max = (
        sig.groupBy("band", "bucket").count().agg(F.max("count")).first()[0]
    )

    # ANN bucket population: recompute the bucket column exactly as lsh_ann
    ann_planes = S.lsh_planes(n_planes)
    sign_bits = [
        F.when(S.int_dot(F.col("sv"), S._plane_lit(ann_planes, i)) >= 0, F.lit(1 << i))
        .otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    ann_max = (
        sv.select(sum(sign_bits[1:], sign_bits[0]).alias("bucket"))
        .groupBy("bucket")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )

    sem_sizes = (
        S.semdedup(emb).groupBy("cell", "subcell").count().agg(F.max("count")).first()[0]
    )

    out = {
        "n": n,
        "nd_bits": bits,
        "nd_max_bucket": nd_max,
        "ann_planes": n_planes,
        "ann_max_bucket": ann_max,
        "semdedup_max_group": sem_sizes,
    }
    # caps = design target × skew headroom; a regression to fixed
    # parameters blows them by the data-growth factor
    violations = []
    if nd_max > 32 * S.NEARDUP_TARGET_BUCKET:
        violations.append(f"near-dup bucket {nd_max}")
    if ann_max > 64 * S.ANN_TARGET_BUCKET:
        violations.append(f"ANN bucket {ann_max}")
    if sem_sizes > 8 * 256:
        violations.append(f"semdedup group {sem_sizes}")

    # adversarial CLUSTERED corpus: adaptive planes bound only the
    # EXPECTED population — a one-orthant cluster piles into a single
    # bucket regardless of plane count. The mean-centered skew guard
    # (max_bucket re-split) must hold max (bucket, sub) populations
    # near the cap and the guarded knn_graph must stay total.
    import numpy as np

    n_clu, cap = 4000, 128
    rng = np.random.RandomState(17)
    clu = rng.uniform(0.5, 1.0, size=(n_clu, 64)).astype("float32")
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in clu[i]], 0) for i in range(n_clu)],
        "vec_id long, embedding array<float>, label int",
    )
    bucketed = S._sign_bucketed(cdf, S.adaptive_planes(n_clu))
    raw_max = bucketed.groupBy("bucket").count().agg(F.max("count")).first()[0]
    stats = S._bucket_split_stats(bucketed, cap)
    guard_max = (
        S._with_subkey(bucketed, stats, "sv")
        .groupBy("bucket", "sub")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    graph_rows = S.knn_graph(cdf, k=2, max_bucket=cap).groupBy("qid").count()
    graph_q = graph_rows.count()
    out.update(
        {
            "clustered_n": n_clu,
            "clustered_raw_max_bucket": raw_max,
            "clustered_guard_cap": cap,
            "clustered_guard_max_group": guard_max,
            "clustered_knn_queries_with_neighbors": graph_q,
        }
    )
    if raw_max <= 2 * cap:
        violations.append(
            f"clustered corpus not skewed enough to test the guard ({raw_max})"
        )
    if guard_max > 4 * cap:
        violations.append(f"skew-guard group {guard_max} > 4×cap {cap}")
    if graph_q < n_clu:
        violations.append(
            f"guarded knn_graph lost queries ({graph_q}/{n_clu})"
        )

    # past-int32 stress (r8 LongType widening): at 33 bits/planes the
    # packed ids exceed 2^31 — they must stay positive int64s and the
    # bucket machinery must keep working (the old code refused here).
    wide = sv.limit(2000).withColumn(
        "buckets",
        S._nd_bucket_udf(S.lsh_planes(S.NEARDUP_BANDS * 33), S.NEARDUP_BANDS, 33)("sv"),
    ).select(F.posexplode("buckets").alias("band", "bucket"))
    wide_minmax = wide.agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    ).first()
    out.update(
        {"wide_bits": 33, "wide_min_bucket": wide_minmax["mn"], "wide_max_bucket": wide_minmax["mx"]}
    )
    if wide_minmax["mn"] < 0:
        violations.append(f"33-bit bucket went negative ({wide_minmax['mn']})")
    if wide_minmax["mx"] <= (1 << 31):
        violations.append(
            f"33-bit stress never exceeded int32 range ({wide_minmax['mx']})"
        )
    return out, violations


if __name__ == "__main__":
    main()
