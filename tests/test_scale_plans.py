"""Plan audits (SURVEY §5): the physical plans must have the shape we
designed for 100 TB — pushed filters, pruned scans, broadcast dims,
whole-stage codegen, and no accidental cartesian products.

Correctness says the numbers match; these tests say the *plan* would
survive a 1000-executor scale-up."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE


def fmt_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_q6_filter_pushdown(spark, qs):
    """q6 is scan+filter+sum: every predicate must reach the parquet
    reader as a PushedFilter, and the scan must read only the four
    referenced columns."""
    plan = fmt_plan(spark, qs["q6_forecast_revenue"](spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24" in plan
    # column pruning: ReadSchema carries only what the query touches
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_comment" not in read_schema


def test_q5_broadcasts_dimensions(spark, qs):
    """The 6-way join must broadcast the dimension tables, leaving at
    most one shuffle join (orders ⋈ lineitem)."""
    plan = fmt_plan(spark, qs["q5_local_supplier"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark, qs):
    """groupBy must plan a map-side partial aggregate before the
    shuffle (two HashAggregate nodes around one Exchange)."""
    df = qs["q1_pricing_summary"](spark, SF_SMOKE)
    plan = fmt_plan(spark, df)
    assert plan.count("HashAggregate") >= 2
    # codegen ids only attach to the AQE-final plan, so execute first
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in executed  # whole-stage-codegen stage markers


@pytest.mark.parametrize(
    "name",
    [
        "q3_shipping_priority",
        "q5_local_supplier",
        "q7_volume_shipping",
        "q9_product_profit",
        "q10_returned_items",
        "q18_large_orders",
        "e4_user_asof_value",
        "e5_funnel",
        "d2_ngram_jaccard_dups",
        "d3_minhash_lsh_dups",
        "d9_embedding_neardup",
        "s1_cosine_topk",
    ],
)
def test_no_cartesian_products(spark, qs, name):
    """No query may degenerate into a cartesian/broadcast-nested-loop
    join with a non-trivial build side (s1/d2 pair generation is the
    deliberate exception: bounded candidate join, not a full cross)."""
    plan = fmt_plan(spark, qs[name](spark, SF_SMOKE))
    if name == "s1_cosine_topk":
        return  # documented bounded pair-join; audited separately below
    assert "CartesianProduct" not in plan


def test_relational_suite_stays_jvm_side(spark, qs):
    """No Python row-at-a-time UDF (BatchEvalPython) may appear in the
    relational/events suite — everything stays in codegen'd JVM ops.
    (ArrowEvalPython/FlatMapGroupsInPandas are allowed only in the
    minhash/simhash/multimodal operators, by design.)"""
    for name in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q9_product_profit",
        "w1_top_customers_per_nation",
        "e2_sessionization",
        "e4_user_asof_value",
        "e5_funnel",
        "d1_exact_dedup",
        "d5_lang_id",
        "d6_quality_score",
        "d7_token_stats",
        "s1_cosine_topk",
        "s2_label_centroids",
    ):
        plan = fmt_plan(spark, qs[name](spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, name


def test_broadcast_threshold_respected_for_facts(spark, qs):
    """orders ⋈ lineitem in q18 at real scale is fact-fact: ensure the
    plan hashes on the join key (shuffle or AQE-chosen broadcast at
    test scale is fine) and the aggregation is keyed on l_orderkey —
    i.e. no lineitem-side re-shuffle on an unrelated key."""
    plan = fmt_plan(spark, qs["q18_large_orders"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "Exchange" in plan  # keyed repartition exists somewhere


def test_sessionization_single_shuffle(spark, qs):
    """Gap sessionization = window(lag) + window(sum) + groupBy all on
    user_id: one hash-partition exchange on user_id must be reused by
    every downstream operator (no second shuffle)."""
    plan = fmt_plan(spark, qs["e2_sessionization"](spark, SF_SMOKE))
    n_user_exchanges = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("Arguments: hashpartitioning(user_id")
    )
    assert n_user_exchanges == 1, plan


def test_d17_contamination_broadcasts_bench_set(spark, qs):
    """The eval n-gram membership join must be a broadcast (the eval
    split is orders smaller than the corpus) — a shuffle here would
    move the whole exploded corpus at 100 TB."""
    plan = fmt_plan(spark, qs["d17_contamination"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_d19_tfidf_broadcasts_term_frequencies(spark, qs):
    """The doc-frequency side (distinct terms) broadcasts onto the
    per-source tf aggregate; no row-at-a-time Python anywhere."""
    plan = fmt_plan(spark, qs["d19_tfidf_top_terms"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_e13_zscore_broadcasts_stats(spark, qs):
    """Per-type moments (5 rows) must broadcast back onto the events
    scan — re-shuffling the fact table to join 5 rows is the classic
    scale mistake."""
    plan = fmt_plan(spark, qs["e13_zscore_outliers"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_d16_and_d18_partial_aggregate(spark, qs):
    """The exploded-bigram and packing aggregations must partial-agg
    map-side (HashAggregate pairs), and stay Python-free."""
    for name in ("d16_repetition", "d18_sequence_packing"):
        plan = fmt_plan(spark, qs[name](spark, SF_SMOKE))
        assert plan.count("HashAggregate") >= 2, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_s5_quantize_single_shuffle(spark, qs):
    """Quantization error: all per-vector math is map-side; the only
    shuffle is the 4-long-per-vector label aggregation (plus the
    final sort)."""
    plan = fmt_plan(spark, qs["s5_quantize_error"](spark, SF_SMOKE))
    # formatted output lists each node twice (tree + details):
    # count tree occurrences only
    assert plan.count("+- Exchange") <= 2
    assert "BatchEvalPython" not in plan


def test_e12_probe_stays_in_plan(spark, qs):
    """The CM candidate probe must ride the plan (broadcast table +
    pandas UDF): no nested-loop join and no cartesian — the r2 shape
    (driver collect + createDataFrame + scalar cross-join) is gone."""
    df = qs["e12_heavy_hitters"](spark, SF_SMOKE)
    plan = fmt_plan(spark, df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" in plan  # the executor-side probe UDF


def test_d24_weighted_sample_is_pure_topn(spark, qs):
    """A-Res sampling must stay a map + distributed top-n: no shuffle
    exchange, no Python stage — the whole score rides codegen."""
    plan = fmt_plan(spark, qs["d24_weighted_sample"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# The only queries allowed a BroadcastNestedLoopJoin: each broadcasts
# a SINGLE-ROW scalar aggregate (q11/q22 scalar subquery, e5's two
# per-stage count scalars, s1's bounded query-set build side, d26's
# tercile-cutoff row) — a constant-size build at any corpus scale,
# not an O(n) cross join.
ALLOWED_BNLJ = {
    "e5_funnel": 2,
    "q11_important_stock": 1,
    "q22_global_sales_opp": 1,
    "s1_cosine_topk": 1,
    # s25 is s1's audited brute-force pattern over the int8 codes:
    # the ONE non-equi join has the bounded nq=20 query cohort
    # broadcast (the exact-truth baseline; the scale path is the
    # LSH/IVF/graph ladder over the same codes)
    "s25_int8_recall": 1,
    # s27's churn script: exact member-graph build + retract-repair
    # re-rank + ingest new-vertex/old-vs-batch scoring — every
    # non-equi join broadcasts a cohort bounded <= 256 by
    # similarity.churn_modulus (executable geometry, any corpus size)
    "s27_graph_churn": 3,
    # s28's exact same-tenant truth joins on an EXTRACTABLE equi key
    # (qid % mod = cid % mod → SMJ/BHJ, <> as post-filter) — no BNLJ
    # anywhere; the checkpoint-hidden form is still pinned in
    # test_checkpoint_blind_spot_joins_pinned_pre_checkpoint
    "s28_filtered_ann": 0,
    # s30's two broadcast-codebook assignment passes (initial pool +
    # ingest batch): the k-means assignment shape — an n × n_cells
    # product whose build side is the ≤n_labels-row FROZEN codebook,
    # constant-size at any corpus scale (same rationale as s9's
    # deposit-hidden fit; here the maintenance chain IS the product)
    "s30_ivf_churn": 2,
    "d26_quality_buckets": 1,
    "d28_token_zipf": 1,  # single-row corpus-total broadcast (q11 pattern)
    # k-means assignment IS an n x k product with a k-row (10) broadcast
    # side — one per Lloyd round, but since r6 the fit is a sim_family
    # DEPOSIT: the visible s9 plan is a parquet scan of the persisted
    # model (0 BNLJ); the assignment shape lives inside the one-time
    # builder, same as s4/s7's checkpoint-hidden IVF assignment.
    "d29_dsir_weights": 1,  # single-row (Rtot, Ttot) totals broadcast
    "e21_cusum_drift": 1,  # single-row calendar-bounds broadcast (densify)
    # s10's fit hides behind its lazy checkpoint boundary (computed
    # once for both consumers); the visible BNLJ is the single-row
    # k_active broadcast for the quota
    "s10_cluster_balance": 1,
    "d31_token_surprisal": 1,  # single-row corpus-total (N, log2 N) broadcast
    # d52 reads the LM family's per_doc2 deposit since the r14
    # optimization round (its single-row l2N broadcast lives inside
    # the one-time builder, the d56 pattern)
    "d52_bigram_lm_perplexity": 0,
    # d56 reads the LM family's per_doc3 deposit since r14 (the whole
    # trigram chain, l2N broadcast included, lives inside the one-time
    # builder — the s4/s7 checkpoint-hidden pattern, pinned instead by
    # the list-based reference test + oracle parity)
    "d56_trigram_lm_perplexity": 0,
    # d57 reads the learned-BPE merges deposit since the r14
    # optimization round (training — including its 8 single-row top-1
    # × tokens-after broadcasts — lives inside the one-time builder
    # shared with d58, the d56/per_doc3 pattern); the trainer's
    # per-iteration shape stays pinned by the list-based reference
    # test + oracle parity
    "d57_bpe_train": 0,
    # d59 reads the model family's clf_curve deposit since the r14
    # review (training lives inside the one-time builder shared with
    # d60 — the d56/per_doc3 pattern); the per-iteration single-row
    # broadcasts are pinned by the numpy-reference trainer test
    "d59_classifier_train": 0,
    # d60 = the single-row percentile-cutoff broadcast (the q11/d26/
    # d54 scalar pattern); training lives inside the one-time clf_w
    # deposit builder shared with d59, so d60's visible plan is the
    # deposit read + one scoring pass
    "d60_learned_classifier_filter": 1,
    # d54's visible plan since r14 is the per_doc3 deposit read + the
    # single-row percentile-cutoff broadcast (the q11/d26 scalar
    # pattern); the scoring chain's joins live inside the LM family's
    # one-time builder
    "d54_perplexity_filter": 1,
    "d41_mix_planner": 1,  # single-row (corpus_tokens, n_sources) broadcast
    "d43_shard_balance": 1,  # single-row corpus_tokens broadcast
    "d49_retraction_impact": 1,  # single-row min(source) broadcast
    # d18's distributed prefix sum broadcasts ONE (lo, bucket-width)
    # row, but the bucketed doc stream sits behind a lazy checkpoint
    # (tokenize once for both consumers), so the visible plan shows 0
    "d18_sequence_packing": 0,
    # d45's class totals ride an unpartitioned window over the
    # <=LID_FEATURES-row bucket table since the r14 optimization round
    # (the r9 single-row totals broadcast BNLJ is gone)
    "d45_langid_model": 0,
    "e22_psi_drift": 0,  # densify BNLJ hides behind the grid checkpoint
}


def test_cluster_profile_fact_joins_degrade_to_smj(spark, qs):
    """The 1000-executor conf surface (session.cluster_profile) must
    leave the d33/d20-class corpus joins on SortMergeJoin when the
    build sides outgrow the broadcast threshold: force
    autoBroadcastJoinThreshold to 1 KB (the at-scale truth for a
    corpus-sized pair/cluster table) and assert the doc_id equi-joins
    pick SMJ — not a broadcast of a corpus-sized side, and never a
    cartesian."""
    from yuki_spark.session import cluster_profile, session_profile

    prof = cluster_profile()
    # sanity on the shipped profile itself
    assert int(prof["spark.sql.shuffle.partitions"]) >= 4000
    assert prof["spark.sql.adaptive.skewJoin.enabled"] == "true"

    low = dict(prof)
    low["spark.sql.autoBroadcastJoinThreshold"] = "1024"
    # keep the local session's partition count: this gate reads PLAN
    # SHAPE; 8000 shuffle partitions on sf0.001 would only slow it
    low["spark.sql.shuffle.partitions"] = spark.conf.get(
        "spark.sql.shuffle.partitions"
    )
    with session_profile(spark, low):
        # d42's gram-spread join rides too: its build side is
        # vocabulary-sized (broadcastable at test sf, NOT at web scale)
        for name in ("d33_split_leakage", "d20_dedup_apply", "d42_source_novelty"):
            plan = fmt_plan(spark, qs[name](spark, SF_SMOKE))
            assert "SortMergeJoin" in plan, name
            assert "CartesianProduct" not in plan, name
    # restoration: the session's own threshold is back
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "1024"


def test_r9_window_shape_fixes(spark, qs):
    """The three corpus-grain window shapes the r8 verdict flagged
    stay fixed: d28/d30 cut the vocabulary with a DISTRIBUTED top-k
    (TakeOrderedAndProject — per-partition heads, no vocab-wide
    shuffle to one task) and d18's running sum is bucket-decomposed
    (no window partitioned by lang alone over the corpus grain)."""
    import re

    p28 = fmt_plan(spark, qs["d28_token_zipf"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p28
    # the sole remaining window ranks the ZIPF_TOP-row head only
    assert len(re.findall(r"\(\d+\) Window\b", p28)) == 1

    p30 = fmt_plan(spark, qs["d30_oov_rate"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p30
    # the top-V cut needs no window at all
    assert not re.findall(r"\(\d+\) Window\b", p30)

    p18 = fmt_plan(spark, qs["d18_sequence_packing"](spark, SF_SMOKE))
    specs = re.findall(r"windowspecdefinition\(([^)]*?) ASC", p18)
    assert specs, p18
    for spec in specs:
        # every window is either (lang, bkt)->doc_id (corpus grain,
        # bucket-bounded) or lang->bkt (bucket-grain offsets); the old
        # straggler shape lang->doc_id must never come back
        assert not re.match(r"lang#\d+, doc_id#\d+$", spec.strip()), spec


def test_d18_bucket_decomposition_matches_single_window(spark):
    """cum0-grain equality: the distributed prefix sum reproduces the
    single-window per-lang running sum EXACTLY (prefix sums decompose
    over ordered buckets), doc by doc — stronger than the aggregate
    oracle hash."""
    from pyspark.sql.window import Window

    from yuki_spark.catalog import load
    from yuki_spark.operators import text
    from yuki_spark.queries.docs import PACK_BUCKETS

    docs = text.with_tokens(load(spark, SF_SMOKE, "documents")).select(
        "lang", "doc_id", "n_tokens"
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    old = docs.select(
        "lang",
        "doc_id",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum0"),
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"),
        F.expr(f"((max(doc_id) - min(doc_id)) div {PACK_BUCKETS}) + 1").alias(
            "bw"
        ),
    )
    bucketed = docs.join(F.broadcast(bounds)).withColumn(
        "bkt", F.expr("(doc_id - lo) div bw")
    )
    per_bkt = bucketed.groupBy("lang", "bkt").agg(
        F.sum("n_tokens").alias("bt")
    )
    w_off = Window.partitionBy("lang").orderBy("bkt")
    offsets = per_bkt.select(
        "lang", "bkt", (F.sum("bt").over(w_off) - F.col("bt")).alias("off")
    )
    w_in = Window.partitionBy("lang", "bkt").orderBy("doc_id")
    new = bucketed.join(F.broadcast(offsets), ["lang", "bkt"]).select(
        "lang",
        "doc_id",
        (
            F.col("off") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
        ).alias("cum0"),
    )
    diff = (
        old.join(new, ["lang", "doc_id"], "full")
        .where(
            old["cum0"].isNull()
            | new["cum0"].isNull()
            | (old["cum0"] != new["cum0"])
        )
        .count()
    )
    assert diff == 0


def test_checkpoint_blind_spot_joins_pinned_pre_checkpoint(spark):
    """The every-key plan gate cannot see inside localCheckpoint
    subtrees (they surface as LogicalRDD leaves) — the two documented
    blind-spot joins are pinned here on their UN-checkpointed forms:

    1. hnsw_descent's entry join (similarity.hnsw_entry): its
       broadcast hint is LOAD-BEARING at scale — once the corpus
       base's size statistic outgrows the broadcast threshold (the
       100 TB truth; at test sf the lazy checkpoint still carries a
       small estimate), a hint-less JoinSelection degrades the
       non-equi inner join to a CartesianProduct. Simulated the same
       way as the cluster-profile SMJ gate: stats-based broadcast
       DISABLED (threshold -1), where only the explicit hint keeps
       the BNLJ; the hint-less twin build is asserted to actually
       degrade, so this pin fails if the hint is ever dropped.
    2. d18's bounds join (docs._d18_bucketed): the single-row bounds
       aggregate must broadcast (BNLJ), never plan as a cartesian —
       also pinned under the disabled threshold (F.broadcast is the
       load-bearing marker there too).

    Either pin failing means a refactor silently regressed a shape the
    production checkpoint would hide from the gate."""
    import re

    from yuki_spark.catalog import load
    from yuki_spark.operators import similarity, text
    from yuki_spark.queries import docs as docs_mod
    from yuki_spark.session import session_profile

    def bnlj_nodes(plan: str) -> int:
        # formatted explain names each node twice (tree + detail);
        # the "(<id>) <Node>" detail header appears once per node
        return len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))

    emb = load(spark, SF_SMOKE, "embeddings")
    base = similarity.hnsw_base(emb)  # lazy checkpoint: LogicalRDD stats
    q = base.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"))
    docs = text.with_tokens(load(spark, SF_SMOKE, "documents")).select(
        "lang", "doc_id", "n_tokens"
    )
    with session_profile(
        spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        entry_plan = fmt_plan(spark, similarity.hnsw_entry(q, base, 16))
        assert bnlj_nodes(entry_plan) == 1
        assert "CartesianProduct" not in entry_plan
        # the hint-less twin REALLY degrades under these stats — the
        # pin above is meaningful, not vacuously green
        nohint = q.select("qid").join(
            base.where(F.col("vec_id") % 16 == 0).select(
                F.col("vec_id").alias("cid")
            ),
            F.col("qid") != F.col("cid"),
        )
        assert "CartesianProduct" in fmt_plan(spark, nohint)

        d18_plan = fmt_plan(spark, docs_mod._d18_bucketed(docs))
        assert bnlj_nodes(d18_plan) == 1
        assert "CartesianProduct" not in d18_plan

        # 3. s28's exact same-tenant truth (sim._s28_exact_filtered)
        # hides behind the exact_f lazy checkpoint in the production
        # plan — pinned here on the un-checkpointed form. Unlike s1's
        # pure-BNLJ brute force, the tenant predicate hands Catalyst
        # an EQUI key (qid % mod = cid % mod), so even with stats
        # broadcast disabled the join plans as a keyed join (SMJ/BHJ)
        # with the <> as a post-filter — never a cartesian and never
        # an unkeyed loop join. The pin fails if a predicate refactor
        # loses the extractable equality.
        from yuki_spark.queries import sim as sim_mod

        s28_plan = fmt_plan(
            spark, sim_mod._s28_exact_filtered(base, 5, sim_mod.S28_FILTER_MOD)
        )
        assert bnlj_nodes(s28_plan) == 0
        assert "CartesianProduct" not in s28_plan
        assert (
            "SortMergeJoin" in s28_plan
            or "BroadcastHashJoin" in s28_plan
            or "ShuffledHashJoin" in s28_plan
        )

        # 4. s29's filtered-beam entry (r12): hnsw_entry's bounded
        # cross with the tenant predicate applied on top (hnsw_descent
        # keep=...). Pinned: never a cartesian under disabled stats —
        # either the broadcast hint keeps the bounded BNLJ or the
        # extractable equi key upgrades it to a keyed join.
        fentry = similarity.hnsw_entry(q, base, 16).where(
            F.col("qid") % 2 == F.col("cid") % 2
        )
        fplan = fmt_plan(spark, fentry)
        assert "CartesianProduct" not in fplan
        assert bnlj_nodes(fplan) <= 1


def test_every_query_plan_scale_safe(spark, qs):
    """The PLANS.md audit as a gate, over EVERY queries() entry:
    zero row-at-a-time Python stages (BatchEvalPython) anywhere, zero
    CartesianProduct, and BroadcastNestedLoopJoin only in the
    documented bounded-broadcast cells at exactly their counts.
    One test (not parametrized): plan compilation for all ~90 keys
    shares a session and takes ~40 s total; a per-key test would pay
    fixture overhead 90 times."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "plan_audit.py"),
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    # compile plans on a thread pool: analysis is driver-side JVM work
    # with no actions, and py4j calls are thread-safe — 8 threads cut
    # this gate from ~40 s to ~10 s of suite wall-clock
    from concurrent.futures import ThreadPoolExecutor

    def one(item):
        name, fn = item
        return name, pa.audit(fmt_plan(spark, fn(spark, SF_SMOKE)))

    with ThreadPoolExecutor(max_workers=8) as pool:
        audits = dict(pool.map(one, sorted(qs.items())))

    offenders = {
        name: a
        for name, a in audits.items()
        if a["row_python"]
        or a["cartesian"]
        or a["bnlj"] != ALLOWED_BNLJ.get(name, 0)
    }
    assert not offenders, f"scale-unsafe plans: {offenders}"
