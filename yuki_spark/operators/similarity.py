"""Similarity search over the embeddings table (array<float>, 64-d).

Exactness strategy: float32 values are scaled to exact integers
(``floor(x * 2^24)`` — float32 has a 24-bit mantissa so the product is
exact in double space) and all dot products / norms are *integer*
sums, which match DuckDB bit-for-bit. Cosine is then derived by
identical IEEE double ops on identical integer operands.

Scale design: brute-force top-k broadcasts the (small) query set and
scans candidates once — a map-side join, no shuffle of the corpus.
The LSH path buckets the corpus by random-hyperplane signs so each
query only joins its bucket (shuffle on bucket key).
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

SCALE = float(1 << 24)


def scaled(col: Column | str) -> Column:
    """array<float> -> array<bigint> of floor(x * 2^24) (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * F.lit(SCALE)))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def cosine_from_ints(dot_i: Column, na_i: Column, nb_i: Column) -> Column:
    return dot_i.cast("double") / (
        F.sqrt(na_i.cast("double")) * F.sqrt(nb_i.cast("double"))
    )


def cosine_topk(
    emb: DataFrame, k: int = 3, n_queries: int = 5
) -> DataFrame:
    """Brute-force cosine top-k: queries (vec_id < n_queries) against
    all other vectors. Query side is broadcast."""
    base = (
        emb.select("vec_id", scaled("embedding").alias("sv"))
        .withColumn("nrm", int_dot(F.col("sv"), F.col("sv")))
        .localCheckpoint(eager=False)  # feeds query + candidate sides once
    )
    return cosine_topk_from(base, k, n_queries)


def cosine_topk_from(
    base: DataFrame, k: int = 3, n_queries: int = 5
) -> DataFrame:
    """:func:`cosine_topk`'s core over a prebuilt integer-vector frame
    (vec_id, sv[, nrm]) — callers with an alternative representation
    (s25's int8 codes) reuse the identical scoring/tiebreak path."""
    if "nrm" not in base.columns:
        base = base.withColumn("nrm", int_dot(F.col("sv"), F.col("sv")))
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("sv").alias("qv"), F.col("nrm").alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("cid"), F.col("sv").alias("cv"), F.col("nrm").alias("cn")
    )
    dot_i = int_dot(F.col("qv"), F.col("cv"))
    scored = (
        c.join(broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("cosine", F.round(cosine_from_ints(dot_i, F.col("qn"), F.col("cn")), 9))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
        .orderBy("qid", "rk")
    )


def int8_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, sv): the embeddings under the SAME symmetric int8
    quantization :func:`quantize_error` accounts for — xi =
    floor(x·2^20) exact, m = max|xi| per vector, q = sign·((2·127·|xi|
    + m) div (2·m)) ∈ [−127, 127] — so s25 measures the retrieval
    effect of exactly the compression s5 measures the reconstruction
    error of. Pure int64 round-half-away arithmetic, bit-identical in
    any engine. All-zero vectors (m = 0) are excluded: their cosine is
    undefined under ANY representation (both engines drop them the
    same way)."""
    x = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * F.lit(float(Q_SCALE))).cast(
                "long"
            ),
        ).alias("xi"),
    )
    withm = x.withColumn(
        "m", F.greatest(F.array_max("xi"), -F.array_min("xi"))
    ).where(F.col("m") > 0)
    qexpr = F.expr(
        "transform(xi, v -> CASE WHEN v >= 0"
        " THEN (2*127*v + m) div (2*m)"
        " ELSE -((2*127*(-v) + m) div (2*m)) END)"
    )
    return withm.select("vec_id", qexpr.alias("sv"))


def mmr_rerank(
    emb: DataFrame, cands: DataFrame, m: int = 6
) -> DataFrame:
    """Maximal-marginal-relevance re-rank of each query's candidate
    pool: greedily select ``m`` of the pool, each step maximizing
    ``rel(c) − max_{s∈selected} sim(c, s)`` (λ=½ MMR — the constant
    factor does not change the argmax), ties broken by smaller cid.
    The retrieval-diversification step a RAG / few-shot-selection
    pipeline runs on its ANN shortlist so near-duplicate passages
    don't crowd out coverage.

    ``cands`` is (qid, rk, cid, cosine) — an exact or ANN top-k table.
    All scores are the family's rounded-9 exact-int cosines and the
    per-step comparison is one IEEE subtraction of identical doubles,
    so the DuckDB recursive-CTE twin selects the identical sequence.

    Scale shape: ONE qid shuffle. The pool is a bounded constant
    (≤ dozens), so the whole greedy selection runs as a higher-order
    ``aggregate`` over each query's collected candidate array — all
    JVM expression code (whole-stage codegen), no Python stage, no
    per-step job: m−1 folds of an argmax (``array_max`` on
    (score, −cid) structs) over ≤ pool candidates, each scored by the
    exact-int dot against the picked set. A first driver-loop version
    (m−1 rounds of join+window per step) timed ~5 s at sf0.1 purely
    in job overhead; this form is one stage and is linear in the
    number of queries at any corpus size."""
    base = emb.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    c = (
        cands.select("qid", "rk", "cid", "cosine")
        .join(base, F.col("cid") == F.col("vec_id"))
        .select("qid", "rk", "cid", "cosine", "sv", "nrm")
    )
    g = c.groupBy("qid").agg(
        F.sort_array(
            F.collect_list(F.struct("rk", "cid", "cosine", "sv", "nrm"))
        ).alias("cs")
    )
    # rounded-9 exact-int cosine between a remaining candidate r and a
    # picked candidate p — the identical expression cosine_topk scores
    # with (and the DuckDB twin reproduces)
    sim = (
        "round(CAST(aggregate(zip_with(r.sv, p.sv, (x, y) -> x * y),"
        " CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE)"
        " / (sqrt(CAST(r.nrm AS DOUBLE)) * sqrt(CAST(p.nrm AS DOUBLE))), 9)"
    )
    # per-step argmax: max over (score, −cid) struct ordering == best
    # score, smaller cid on ties
    best = (
        "array_max(transform(acc.rem, r -> named_struct("
        f"'score', r.rel - array_max(transform(acc.picked, p -> {sim})),"
        " 'tb', -r.cid, 'r', r)))"
    )
    # single-element-array transform as a let-binding for `best`
    step_expr = (
        "CASE WHEN size(acc.rem) = 0 THEN acc ELSE "
        f"transform(array({best}), b -> named_struct("
        "'picked', array_append(acc.picked, named_struct("
        "'cid', b.r.cid, 'rel', b.r.rel, 'score', b.score,"
        " 'sv', b.r.sv, 'nrm', b.r.nrm)),"
        "'rem', filter(acc.rem, x -> x.cid <> b.r.cid)))[0] END"
    )
    # cs is rk-sorted: cs[0] is the relevance top-1 (step-1 pick, its
    # mmr score IS its relevance); the rest start as remaining
    init = (
        "named_struct("
        "'picked', array(named_struct('cid', cs[0].cid,"
        " 'rel', cs[0].cosine, 'score', cs[0].cosine,"
        " 'sv', cs[0].sv, 'nrm', cs[0].nrm)),"
        "'rem', transform(slice(cs, 2, greatest(size(cs) - 1, 0)),"
        " x -> named_struct('cid', x.cid, 'rel', x.cosine,"
        " 'sv', x.sv, 'nrm', x.nrm)))"
    )
    final = (
        "acc -> transform(acc.picked, p -> named_struct("
        "'cid', p.cid, 'rel', p.rel, 'mmr_score', p.score))"
    )
    if m >= 2:
        arr = (
            f"aggregate(sequence(1, {m - 1}), {init},"
            f" (acc, step) -> {step_expr}, {final})"
        )
    else:
        arr = (
            f"transform({init}.picked, p -> named_struct("
            "'cid', p.cid, 'rel', p.rel, 'mmr_score', p.score))"
        )
    return (
        g.select("qid", F.posexplode(F.expr(arr)).alias("pos", "p"))
        .select(
            "qid",
            (F.col("pos") + 1).cast("bigint").alias("step"),
            F.col("p.cid").alias("cid"),
            F.col("p.rel").alias("rel"),
            F.col("p.mmr_score").alias("mmr_score"),
        )
        .orderBy("qid", "step")
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """Element-wise mean embedding per label, long format
    (label, dim, centroid) — exact integer sums / count."""
    ex = emb.select(
        "label", F.posexplode(scaled("embedding")).alias("dim", "sx")
    )
    return (
        ex.groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            (F.sum("sx").cast("double") / (F.count("sx").cast("double") * F.lit(SCALE))).alias("centroid")
        )
        .orderBy("label", "dim")
    )


NEARDUP_OUT = "id_a bigint, id_b bigint, cosine double"

# Banded sign-LSH for the near-dup scale path: NEARDUP_BANDS hash
# tables of `bits` sign bits each (OR-amplification). Planes are
# deterministic ±1 vectors so the sign of the *integer* dot product is
# engine-portable (the DuckDB twin reproduces every bucket exactly).
# Bits-per-band are corpus-adaptive (adaptive_bits): the bucket count
# grows with n so the expected band-bucket population stays near
# NEARDUP_TARGET_BUCKET, keeping the bucket-local GEMM's quadratic
# work bounded at any scale. Bands trade recall vs candidate volume.
NEARDUP_MIN_BITS = 4
NEARDUP_BANDS = 16
NEARDUP_TARGET_BUCKET = 128


def plane_stream(total: int, seed: int) -> np.ndarray:
    """First ``total`` deterministic ±1 hyperplanes of the seeded
    stream — a prefix of any longer request, so growing the plane
    budget never perturbs existing buckets."""
    return np.where(
        np.random.RandomState(seed).standard_normal((total, 64)) >= 0, 1, -1
    ).astype(np.int64)


def lsh_planes(total: int) -> np.ndarray:
    """Bucket-hash planes shared by the near-dup bands and the ANN
    index (seed 11)."""
    return plane_stream(total, 11)


def adaptive_bits(
    n: int, target: int = NEARDUP_TARGET_BUCKET, lo: int = NEARDUP_MIN_BITS
) -> int:
    """Smallest bits-per-band keeping the expected band-bucket
    population ``n / 2^bits`` at or under ``target`` (integer-exact —
    no float log whose libm rounding could differ across hosts)."""
    bits = lo
    while n > (target << bits):
        bits += 1
    # bucket ids are int64 end-to-end since r8 (_nd_bucket_udf emits
    # ArrayType(LongType), the sign-bit sums build bigint columns):
    # 62 bits keeps every `1 << i` weight and the packed sum positive
    # in int64. 62 bits ≈ 2^62·target rows — beyond any corpus; refuse
    # loudly there rather than wrap (the r7 ceiling was int32's 31
    # bits ≈ 275 G rows, which a 100 TB embedding corpus approaches).
    if bits > 62:
        raise ValueError(
            f"adaptive bits={bits} exceeds the int64 bucket-id budget "
            f"(n={n}, target={target})"
        )
    return bits


def _nd_bucket_udf(planes: np.ndarray, bands: int, bits: int):
    """Build the per-vector band-bucket UDF for a given plane matrix:
    one int64 GEMM against the ±1 planes (exact — |dot| ≤ 64·2^26),
    sign bits packed per band. Vectorized over Arrow batches;
    identical to the DuckDB twin's per-plane sign CASEs."""

    if bits > 62:  # guards the explicit-bits path too (int64 packing)
        raise ValueError(f"bits={bits} exceeds the int64 bucket-id budget")

    @pandas_udf(ArrayType(LongType()))
    def nd_buckets(svs: pd.Series) -> pd.Series:
        if len(svs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.int64) for v in svs])
        S = (V @ planes.T >= 0).astype(np.int64)  # n × (bands·bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        B = (S.reshape(len(svs), bands, bits) * weights).sum(axis=2)
        return pd.Series(B.astype(np.int64).tolist())

    return nd_buckets


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    bits: int | None = None,
    n_est: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs among LSH candidates:
    (a, b) with a < b, some band bucket in common, and
    cosine(a, b) >= threshold. Exact scaled-integer arithmetic so the
    DuckDB oracle matches bit-for-bit.

    Execution (the 100 TB shape — no cartesian anywhere):
    1. signatures: one vectorized GEMM assigns each vector its
       NEARDUP_BANDS bucket ids;
    2. band explode + shuffle on (band, bucket) — a key shuffle, like
       the MinHash band join (dedup.minhash_lsh_pairs);
    3. bucket-local exact scoring: one numpy int64 GEMM per bucket
       group inside ``applyInPandas`` (same arithmetic as the twin —
       no per-pair Catalyst lambdas, no join-backs);
    4. distinct over (id_a, id_b, cosine) — duplicates from pairs
       sharing several band buckets collapse exactly because the
       scoring is deterministic.

    Recall vs the exact all-pairs result is probabilistic (asserted in
    tests against :func:`cosine_neardup_pairs_exact`); correctness of
    the produced pairs is exact.

    ``bits`` (sign bits per band) defaults to :func:`adaptive_bits` of
    the corpus size — ``n_est`` lets callers pass a catalog/footer
    estimate so no counting job runs; otherwise one ``count()`` does.
    The DuckDB twin must be generated with the same bit count
    (`queries/sim.py` derives both from the same footer count)."""
    if bits is None:
        bits = adaptive_bits(n_est if n_est is not None else emb.count())
    return cosine_neardup_pairs_from(nd_signatures(emb, bits), threshold)


PR_SCALE = 1_000_000_000  # initial integer rank mass per node
PR_BASE = 15 * PR_SCALE // 100  # the (1−d) teleport term, d = 0.85


def graph_pagerank(
    graph: DataFrame, iters: int = 3, top: int = 25
) -> DataFrame:
    """Integer-arithmetic PageRank over a kNN graph (``graph``:
    qid→cid edges, e.g. :func:`knn_graph`'s output) — the
    graph-centrality signal density/coreset-based data curation reads
    (a high-rank vector sits in a dense, well-connected region; the
    non-normalized d=0.85 variant, ``iters`` fixed rounds). ALL
    arithmetic is int64 (floor-div contributions, integer damping
    ``(85·inflow) div 100``), so every engine reproduces the ranks
    bit-for-bit — no float summation order to disagree on.

    Scale shape: per round one keyed edge join (src) + one hash-agg
    (dst) + one left join back to nodes — O(edges) per round, rounds
    constant, lineage cut per round. PR_SCALE bounds: max rank ≈
    0.85 · total mass ≈ N·PR_SCALE, so int64 holds through ~10^8
    nodes; beyond that a deployment lowers PR_SCALE (the ORDER of
    ranks is scale-invariant down to floor-div granularity)."""
    edges = graph.select(
        F.col("qid").alias("src"), F.col("cid").alias("dst")
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("vec_id"))
        .union(edges.select(F.col("dst").alias("vec_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ce = edges.join(deg, "src").localCheckpoint(eager=False)
    r = nodes.select("vec_id", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for _ in range(iters):
        inflow = (
            ce.join(r.withColumnRenamed("vec_id", "src"), "src")
            .select("dst", F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        r = (
            nodes.join(inflow, nodes["vec_id"] == inflow["dst"], "left")
            .select(
                "vec_id",
                (
                    F.lit(PR_BASE)
                    + F.coalesce(F.expr("(85 * inflow) div 100"), F.lit(0))
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n_in"))
    return (
        r.join(indeg, r["vec_id"] == indeg["dst"], "left")
        .select(
            "vec_id",
            F.coalesce("n_in", F.lit(0)).cast("bigint").alias("n_in"),
            "pr",
        )
        .orderBy(F.desc("pr"), "vec_id")
        .limit(top)
    )


def nd_signatures(emb: DataFrame, bits: int) -> DataFrame:
    """(vec_id, sv, band, bucket) sign-LSH signature rows — the shared
    input of :func:`cosine_neardup_pairs_from` and the persistable
    bucket index (project on the last three columns). One scaling +
    one bucket-UDF pass; callers that need both the pair check and the
    index rows (the streaming embedding ingest) compute this ONCE."""
    planes = lsh_planes(NEARDUP_BANDS * bits)
    return (
        emb.select("vec_id", scaled("embedding").alias("sv"))
        .withColumn("buckets", _nd_bucket_udf(planes, NEARDUP_BANDS, bits)("sv"))
        .select("vec_id", "sv", F.posexplode("buckets").alias("band", "bucket"))
    )


def cosine_neardup_pairs_from(sig: DataFrame, threshold: float) -> DataFrame:
    """:func:`cosine_neardup_pairs`' core over precomputed signature
    rows (see :func:`nd_signatures`) — the streaming ingest reuses its
    one signature pass for both this check and the index rows."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["sv"]])
        dots = V @ V.T  # exact int64: |scaled dot| <= 64·2^52 < 2^63
        rt = np.sqrt(np.diag(dots).astype(np.float64))
        # sqrt(na)·sqrt(nb), NOT sqrt(na·nb): must match the twin's
        # IEEE op sequence exactly for bit-identical cosines
        cos = np.round(dots.astype(np.float64) / (rt[:, None] * rt[None, :]), 9)
        ia, ib = np.nonzero((cos >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine": cos[ia, ib]}
        )

    return (
        sig.groupBy("band", "bucket")
        .applyInPandas(lambda _, pdf: score(pdf), NEARDUP_OUT)
        .distinct()
        .orderBy("id_a", "id_b")
    )


def label_drift(emb: DataFrame) -> DataFrame:
    """Per-label embedding DRIFT between the two vec_id parity halves:
    cosine between the halves' centroid vectors plus both half sizes —
    the embedding-space analogue of e22's PSI drift (a retrieval
    corpus monitors this as new vectors land; a low cosine means the
    label's meaning moved). Cosine is scale-invariant, so the exact
    int64 per-dim SUMS stand in for the centroids (no division, no
    count normalization) and only the final fold is double — the same
    documented IEEE op order as _ivf_assignment's affinity, so the
    DuckDB twin reproduces it bit-for-bit.

    Scale shape: ONE corpus pass — an explode → (label, half, dim)
    hash-agg with map-side combine; the half size rides along as the
    per-dim row count (every vector contributes every dim, so
    count-per-dim == vectors-per-half — no second corpus scan, no
    countDistinct shuffle). Everything after is at label grain —
    64-long sum vectors, a label equi-join of the two halves behind a
    lazy checkpoint (consumed by both sides), a fold per label. No
    window over the corpus, no pair work."""
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(scaled("embedding")).alias("dim", "sx"),
    )
    h = (
        ex.groupBy("label", "half", "dim")
        .agg(F.sum("sx").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .groupBy("label", "half")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda p: p["s"],
            ).alias("sv"),
            F.max("cnt").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    a = h.where(F.col("half") == 0).select(
        "label", F.col("sv").alias("av"), F.col("n").alias("n_even")
    )
    b = h.where(F.col("half") == 1).select(
        "label", F.col("sv").alias("bv"), F.col("n").alias("n_odd")
    )

    def dfold(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = F.round(
        dfold(F.col("av"), F.col("bv"))
        / (
            F.sqrt(dfold(F.col("av"), F.col("av")))
            * F.sqrt(dfold(F.col("bv"), F.col("bv")))
        ),
        9,
    )
    return (
        a.join(b, "label")
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_even",
            "n_odd",
            cos.alias("centroid_cosine"),
        )
        .orderBy("label")
    )


def nd_bucket_rows(emb: DataFrame, bits: int) -> DataFrame:
    """(vec_id, band, bucket) sign-LSH bucket rows at a FIXED bit
    width — the persistable index of a continuously ingested vector
    corpus (streaming/stream.py::run_embedding_ingest). The band count
    is NEARDUP_BANDS and ``bits`` must stay fixed for the index's
    lifetime so historical and new batches bucket identically (an
    adaptive width would silently shear the index as the corpus
    grows — re-bucketing is an explicit rebuild, not a drift).
    Bucket ids are int64 since r8 (values unchanged for bits ≤ 31);
    an index persisted by the old int32 code should be rebuilt before
    mixing with new rows — MERGE across the width change would fail
    on the schema, loudly."""
    return nd_signatures(emb, bits).select("vec_id", "band", "bucket")


def cosine_neardup_pairs_exact(
    emb: DataFrame, threshold: float = 0.35, block_size: int = 1024
) -> DataFrame:
    """Exact all-pairs near-dup baseline (test-time oracle for the LSH
    path's recall; not the shipped scale path — O(n²) by definition).

    Vectors are grouped into blocks of ``block_size``; every block
    pair (i <= j) is scored with one numpy int64 matmul inside
    ``applyInPandas`` (exact: |scaled dot| <= 64·2^52 < 2^63), then
    cosine is derived by the same IEEE double ops as the oracle."""
    base = emb.select(
        "vec_id",
        scaled("embedding").alias("sv"),
        F.floor(F.col("vec_id") / block_size).alias("blk"),
    )
    blocks = base.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "sv")).alias("vecs")
    ).localCheckpoint(eager=False)  # both block-pair join sides
    left = blocks.select(F.col("blk").alias("blk_a"), F.col("vecs").alias("vecs_a"))
    right = blocks.select(F.col("blk").alias("blk_b"), F.col("vecs").alias("vecs_b"))
    pairs = left.join(right, F.col("blk_a") <= F.col("blk_b"))

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for _, row in pdf.iterrows():
            ids_a = np.array([v["vec_id"] for v in row["vecs_a"]], dtype=np.int64)
            ids_b = np.array([v["vec_id"] for v in row["vecs_b"]], dtype=np.int64)
            A = np.array([v["sv"] for v in row["vecs_a"]], dtype=np.int64)
            B = np.array([v["sv"] for v in row["vecs_b"]], dtype=np.int64)
            dots = A @ B.T  # exact int64
            na = (A * A).sum(axis=1)
            nb = (B * B).sum(axis=1)
            cos = dots.astype(np.float64) / (
                np.sqrt(na.astype(np.float64))[:, None]
                * np.sqrt(nb.astype(np.float64))[None, :]
            )
            cos = np.round(cos, 9)
            ia, ib = np.nonzero((cos >= threshold) & (ids_a[:, None] < ids_b[None, :]))
            out_a.extend(ids_a[ia].tolist())
            out_b.extend(ids_b[ib].tolist())
            out_c.extend(cos[ia, ib].tolist())
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return (
        pairs.groupBy("blk_a", "blk_b")
        .applyInPandas(lambda _, pdf: score(pdf), NEARDUP_OUT)
        .orderBy("id_a", "id_b")
    )


def ivf_codebook(emb: DataFrame) -> DataFrame:
    """(cell, cv): the IVF codebook — exact int64 per-dim SUMS of
    scaled vectors per label (cosine is scale-invariant, so cos(v, Σ)
    ≡ cos(v, mean) with zero float division whose rounding could
    drift between engines). Factored out of :func:`_ivf_assignment`
    (r12) so a churn loop can FREEZE a codebook built over one corpus
    snapshot and keep assigning against it — assignment at a frozen
    codebook is a pure per-vector function, which is exactly what
    makes incremental index maintenance exact (s30)."""
    return (
        emb.select("label", F.posexplode(scaled("embedding")).alias("dim", "sx"))
        .groupBy("label", "dim")
        .agg(F.sum("sx").alias("cs"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cs"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda p: p["cs"]).alias("cv"),
        )
    )


def _ivf_affinity() -> Column:
    """Double-fold cell affinity over (sv, nrm, cv) columns: products
    can exceed 2^53 so they round, but both engines run the same IEEE
    ops in the same order (left fold, like DuckDB's list_reduce)."""
    dot_cv = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ncv = F.aggregate(
        F.transform("cv", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return dot_cv / (F.sqrt(F.col("nrm").cast("double")) * F.sqrt(ncv))


def ivf_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell, aff): best-cell assignment of ``emb`` at an
    EXPLICIT (typically frozen) codebook — the incremental-ingest
    path of IVF deposit maintenance under churn (s30): newly
    ingested vectors are assigned by one broadcast-codebook pass, and
    because assignment is a pure per-vector function of (embedding,
    codebook), the maintained deposit equals a from-scratch
    re-assignment of the whole surviving corpus at the same centroids
    ROW-FOR-ROW (the invariant s30's DuckDB twin hash-checks).
    ``aff`` is the double-fold affinity rounded to 9 (ranking uses
    the raw double, the family's s4 discipline).

    Scale shape: one broadcast of the ≤n_cells-row codebook against
    the corpus (the k-means assignment shape) + one per-vector
    window; linear, no corpus shuffle beyond the window's."""
    base = emb.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), "cell")
    return (
        base.join(broadcast(cents))
        .withColumn("aff", _ivf_affinity())
        .withColumn("ark", F.row_number().over(w))
        .where(F.col("ark") == 1)
        .select("vec_id", "cell", F.round("aff", 9).alias("aff"))
    )


def ivf_codebook_drift(
    frozen: DataFrame, current: DataFrame, threshold: float
) -> DataFrame:
    """(cell, drift, retrain): per-cell STALENESS of a frozen IVF
    codebook against the centroids the current corpus implies —
    drift = round(1 − cos(frozen cv, current cv), 9) under the
    family's double-fold IEEE discipline (s15's drift machinery at
    codebook grain), and ``retrain`` = drift > ``threshold`` — the
    re-train trigger a production index runs between incremental
    assignments (centroids stay frozen until the monitor fires; the
    policy is pinned in tests with synthetically shifted codebooks).
    A cell present on only one side (a label fully churned in or
    out) surfaces with drift = 1.0 — maximal staleness — rather than
    vanishing. Bounded: codebook-grain rows in, codebook-grain rows
    out."""
    f = frozen.select("cell", F.col("cv").alias("fv"))
    c = current.select("cell", F.col("cv").alias("nv"))
    dd = F.aggregate(
        F.zip_with("fv", "nv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nf = F.aggregate(
        F.transform("fv", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nn = F.aggregate(
        F.transform("nv", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    drift = F.when(
        F.col("fv").isNull() | F.col("nv").isNull(), F.lit(1.0)
    ).otherwise(F.round(F.lit(1.0) - dd / (F.sqrt(nf) * F.sqrt(nn)), 9))
    return (
        f.join(c, "cell", "full")
        .select(
            "cell",
            drift.alias("drift"),
        )
        .withColumn("retrain", F.col("drift") > F.lit(threshold))
        .orderBy("cell")
    )


def _ivf_assignment(emb: DataFrame):
    """Exact-int IVF cell assignment shared by :func:`ivf_ann` and
    :func:`semdedup`: returns ``(scored_cells, w_assign)`` where
    ``scored_cells`` carries every (vector, cell, affinity) row and
    ``w_assign`` ranks cells per vector (deterministic tiebreak).
    The codebook build and the double-fold affinity are the factored
    :func:`ivf_codebook` / :func:`_ivf_affinity` (r12) — one copy of
    each, shared with the churn-maintenance path."""
    base = emb.select("vec_id", "label", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    cents = ivf_codebook(emb)
    scored_cells = (
        base.join(broadcast(cents))
        .withColumn("aff", _ivf_affinity())
        .localCheckpoint(eager=False)
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("aff"), "cell")
    return scored_cells, w_assign


def ivf_ann(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    nprobe: int = 3,
    filter_mod: int | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into cells (label
    centroids as the codebook — at real scale a k-means pass), then
    each query scores only the ``nprobe`` nearest cells.

    Deterministic in every engine: the codebook cell is the exact
    int64 per-dim SUM of scaled vectors (cosine is scale-invariant, so
    cos(v, Σ) ≡ cos(v, mean) — no float division whose rounding could
    drift); cell affinity folds those identical integers through the
    identical IEEE double op sequence (left fold, like DuckDB's
    list_reduce); final candidate scores are exact int-cosines. That
    makes the full result SQL-twinnable — no rows-only escape hatch.

    Shuffle shape at 100 TB: the corpus partitions by cell id once;
    queries broadcast with their probed cell list; scoring joins on
    cell id only — no full-corpus scan per query.

    ``filter_mod`` adds the attribute predicate qid % mod == cid %
    mod BELOW the top-k cut (pre-filtered search — s28; mirrors the
    twin's injectable ``pred``); None keeps the unfiltered family
    behavior byte-for-byte."""
    scored_cells, w_assign = _ivf_assignment(emb)
    assigned = (
        scored_cells.withColumn("rk", F.row_number().over(w_assign))
        .where(F.col("rk") == 1)
        .select("vec_id", "sv", "nrm", "cell")
    )

    probes = (
        scored_cells.where(F.col("vec_id") < n_queries)
        .withColumn("rk", F.row_number().over(w_assign))
        .where(F.col("rk") <= nprobe)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("sv").alias("qv"),
            F.col("nrm").alias("qn"),
            "cell",
        )
    )

    cands = assigned.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv2"),
        F.col("nrm").alias("cn"),
        "cell",
    )
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv2")), F.col("qn"), F.col("cn")),
        9,
    )
    scored = (
        cands.join(broadcast(probes), "cell")
        .where(F.col("qid") != F.col("cid"))
        .withColumn("cosine", cos)
    )
    if filter_mod is not None:
        scored = scored.where(
            F.col("qid") % filter_mod == F.col("cid") % filter_mod
        )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
        .orderBy("qid", "rk")
    )


def ivf_ann_filtered(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    nprobe: int = 3,
    filter_mod: int = 2,
) -> DataFrame:
    """Attribute-FILTERED IVF ANN, pre-filter strategy (r11): each
    query searches only candidates satisfying its metadata predicate -
    the deterministic tenant attribute vec_id % ``filter_mod`` (the
    stand-in for source/tenant/ACL columns a production vector store
    filters on). The predicate lands BEFORE the top-k cut
    (pre-filtering), so every query gets a full k from its own tenant
    - versus post-filtering an unfiltered top-k, which starves when
    the near neighbors belong to other tenants (s28 measures exactly
    that trade against exact filtered truth).

    One pipeline, not a fork: this delegates to :func:`ivf_ann` with
    its ``filter_mod`` engaged (mirroring the twin, where the same
    need is one injectable predicate on _s4_oracle), so the filtered
    path can never drift from the s4 family's deterministic machinery
    (exact-int centroid sums, IEEE double-fold affinity, rounded-9
    int-cosines)."""
    return ivf_ann(
        emb, k=k, n_queries=n_queries, nprobe=nprobe, filter_mod=filter_mod
    )


SEMDEDUP_OUT = (
    "vec_id bigint, cell bigint, subcell bigint, pos bigint,"
    " max_prior_cos double, kept boolean"
)

# sub-cell split planes: a ±1 stream seeded apart from the bucket
# planes (seed 13) so cell refinement is uncorrelated with d9/s3 LSH.
# 16 bits absorb up to 65536× cell overflow; past that the codebook
# itself must grow (k-means with k ~ n/max_cell — the paper's regime;
# the label codebook here is its deterministic stand-in)
SEMDEDUP_MAX_SPLIT_BITS = 16


def _split_planes(total: int) -> np.ndarray:
    return plane_stream(total, 13)


def semdedup(emb: DataFrame, threshold: float = 0.3, max_cell: int = 256) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, "SemDeDup"): coarse-
    cluster the corpus, then within each cell greedily keep the member
    *farthest from the centroid* and drop any later member whose cosine
    to **any earlier member in greedy order — kept or dropped** reaches
    ``threshold`` (the prior-triangle max, exactly as in the reference
    SemDeDup implementation; NOT a kept-only transitive-closure-free
    variant — a twin implementing that rule produces different keep
    sets). The paper's low-centroid-similarity keep rule is made
    deterministic (ties broken by vec_id).

    Shares the exact-int IVF assignment with :func:`ivf_ann` (cells =
    nearest exact-int centroid), so the whole decision — cell, greedy
    order, pairwise cosines — is engine-portable and SQL-twinnable.
    Per-cell pair scoring is one int64 GEMM inside ``applyInPandas``
    (same arithmetic as :func:`cosine_neardup_pairs`).

    Scale shape: one shuffle partitions the corpus by cell; all pair
    work is cell-local, and cells whose population exceeds ``max_cell``
    are deterministically re-split by ±1 sign-plane bisection
    (``ceil(log2(ceil(pop / max_cell)))`` extra bits, capped at
    :data:`SEMDEDUP_MAX_SPLIT_BITS`) so the per-group GEMM's quadratic
    work stays bounded as n grows — the codebook's k effectively grows
    with n, the paper's regime. The split-bit count is a pure integer
    function of the cell population and the sign bits come from exact
    int64 dots, so the refinement is engine-portable and the twin
    reproduces it. No global all-pairs stage anywhere. Output ``pos``/
    ``kept`` are per (cell, subcell); ``subcell`` is 0 wherever no
    split was needed."""
    scored_cells, w_assign = _ivf_assignment(emb)
    assigned = (
        scored_cells.withColumn("rk", F.row_number().over(w_assign))
        .where(F.col("rk") == 1)
        .select("vec_id", "sv", F.col("cell").cast("bigint").alias("cell"), "aff")
        .localCheckpoint(eager=False)  # feeds pops + refined sides once
    )

    # split-bit count per cell: eb = #{i : ceil(pop/max_cell) > 2^i} —
    # integer-exact ceil(log2(ceil(pop/max_cell))), same unrolled
    # comparison chain the SQL twin runs
    pops = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("pop"))
    m = F.floor((F.col("pop") + F.lit(max_cell) - 1) / F.lit(max_cell))
    eb_terms = [
        F.when(m > F.lit(1 << i), F.lit(1)).otherwise(F.lit(0))
        for i in range(SEMDEDUP_MAX_SPLIT_BITS)
    ]
    eb = sum(eb_terms[1:], eb_terms[0]).alias("eb")
    cell_bits = pops.select("cell", eb)

    sp = _split_planes(SEMDEDUP_MAX_SPLIT_BITS)
    subcell = " + ".join(
        f"(CASE WHEN (({i} < eb) AND "
        f"({_int_dot_sql('sv', _plane_sql(sp, i))} >= 0)) "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(SEMDEDUP_MAX_SPLIT_BITS)
    )
    refined = assigned.join(cell_bits, "cell").withColumn(
        "subcell", F.expr(subcell).cast("bigint")
    )

    def greedy(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # greedy order: ascending Spark-computed affinity (the fold is
        # bit-identical across engines — see _ivf_assignment), vec_id
        # tiebreak. numpy must NOT recompute aff: its pairwise-summed
        # dot would round differently from the left fold.
        order = np.lexsort((pdf["vec_id"].to_numpy(), pdf["aff"].to_numpy()))
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)[order]
        V = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["sv"]])[order]
        dots = V @ V.T  # exact int64: |scaled dot| <= 64·2^52 < 2^63
        rt = np.sqrt(np.diag(dots).astype(np.float64))
        cos = np.round(dots.astype(np.float64) / (rt[:, None] * rt[None, :]), 9)
        n = len(ids)
        prior = np.where(
            np.arange(n)[None, :] < np.arange(n)[:, None], cos, -np.inf
        )
        mx = prior.max(axis=1)  # row j: max cosine to any earlier member
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": np.full(n, key[0], dtype=np.int64),
                "subcell": np.full(n, key[1], dtype=np.int64),
                "pos": np.arange(1, n + 1, dtype=np.int64),
                "max_prior_cos": np.where(np.isfinite(mx), mx, np.nan),
                "kept": ~(mx >= threshold),
            }
        )

    return (
        refined.groupBy("cell", "subcell")
        .applyInPandas(greedy, SEMDEDUP_OUT)
        .orderBy("vec_id")
    )


# ---- LSH ANN (scale path) ------------------------------------------------

# The ANN bucket hash reuses the deterministic ±1 plane stream: the
# bucket derives from exact int64 dot signs — engine-portable, and the
# DuckDB twin reproduces every bucket (no rows-only check needed).
ANN_MIN_PLANES = 8
ANN_TARGET_BUCKET = 8


def adaptive_planes(
    n: int, target: int = ANN_TARGET_BUCKET, lo: int = ANN_MIN_PLANES
) -> int:
    """Smallest plane count keeping the expected ANN bucket population
    ``n / 2^planes`` at or under ``target`` (integer-exact)."""
    return adaptive_bits(n, target=target, lo=lo)


def _plane_lit(planes: np.ndarray, i: int) -> Column:
    return F.array(*[F.lit(int(v)) for v in planes[i]])


# SQL-string fast paths for the per-plane loops (r14 opt): composing
# a 64-element plane literal + zip_with/aggregate lambdas from Column
# objects costs ~100 ms of py4j round trips PER PLANE, and the sign/
# split loops run 8–16 planes per call site (measured: 1.8 s of s7's
# 3.9 s build). One parsed F.expr builds the identical expression
# trees — same literals, same fold order, bit-identical results.
def _plane_sql(planes: np.ndarray, i: int) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in planes[i]) + ")"


def _int_dot_sql(a: str, b: str) -> str:
    """SQL twin of :func:`int_dot` (same zip_with/aggregate fold)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _multi_probes(n_planes: int) -> Column:
    """The multi-probe bucket set of a row's sign ``bucket`` column:
    the bucket itself plus every single-bit flip — ONE copy of the
    probe geometry for every LSH consumer (lsh_ann, knn_graph, the
    churn-repair branches, tools/stress.py's flatness audit): a probe
    change that skipped one site would silently divorce an audit or a
    repair from the candidates the serving path actually generates."""
    return F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("bigint"))
            for i in range(n_planes)
        ],
    )


def _sign_bucketed(emb: DataFrame, n_planes: int) -> DataFrame:
    """(vec_id, sv, nrm, bucket): scaled vectors with their
    random-hyperplane sign bucket — shared by lsh_ann and knn_graph
    (one copy of the sign-bit packing)."""
    planes = lsh_planes(n_planes)
    base = emb.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    bucket = " + ".join(
        f"(CASE WHEN ({_int_dot_sql('sv', _plane_sql(planes, i))} >= 0) "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(n_planes)
    )
    return base.withColumn("bucket", F.expr(bucket))


# ANN bucket-skew guard: adaptive_planes bounds EXPECTED populations
# under a spread-out distribution; a clustered corpus (many vectors on
# one side of every plane) can still pile into one bucket and turn the
# bucket join quadratic. The fallback refines semdedup's cell
# re-split: oversized buckets gain extra split bits from planes
# seeded apart from the bucket planes, and each split is CENTERED at
# the bucket's mean projection — a raw sign split cannot bisect a
# tight cluster (every member sits on the same side of almost any
# fixed plane; measured: a 400-vector cluster left 254 rows in one
# sub-group under sign splits), while splitting at the bucket mean
# halves any distribution in expectation. The mean threshold is an
# exact integer cross-multiply (d·pop ≥ Σd), so both join sides and
# any SQL twin agree bit-for-bit.
ANN_MAX_SPLIT_BITS = 16


def _split_dots(df: DataFrame, vec_col: str) -> DataFrame:
    """Append the row's exact-int projections on every split plane."""
    sp = _split_planes(ANN_MAX_SPLIT_BITS)
    return df.select(
        "*",
        *[
            F.expr(_int_dot_sql(f"`{vec_col}`", _plane_sql(sp, i))).alias(
                f"__d{i}"
            )
            for i in range(ANN_MAX_SPLIT_BITS)
        ],
    )


def _bucket_split_stats(bucketed: DataFrame, max_bucket: int) -> DataFrame:
    """Per-bucket split parameters: ``eb`` = extra split-bit count
    (integer-exact ceil(log2(ceil(pop/max_bucket))), the same unrolled
    chain as semdedup's cell split), plus the population and per-plane
    projection sums that center each split at the bucket mean."""
    d = _split_dots(bucketed, "sv")
    pops = d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("pop"),
        *[F.sum(f"__d{i}").alias(f"__s{i}") for i in range(ANN_MAX_SPLIT_BITS)],
    )
    m_sql = f"FLOOR(((pop + {max_bucket}) - 1) / {max_bucket})"
    eb = " + ".join(
        f"(CASE WHEN ({m_sql} > {1 << i}) THEN 1 ELSE 0 END)"
        for i in range(ANN_MAX_SPLIT_BITS)
    )
    return pops.select(
        "bucket",
        F.expr(eb).alias("eb"),
        "pop",
        *[f"__s{i}" for i in range(ANN_MAX_SPLIT_BITS)],
    )


def _with_subkey(df: DataFrame, stats: DataFrame, vec_col: str) -> DataFrame:
    """Append ``sub`` = the row's mean-centered split bits masked to
    its bucket's split-bit count (0 wherever the bucket fits the
    cap): bit i set iff the row's plane-i projection is at or above
    the bucket's mean projection (exact cross-multiply d·pop ≥ Σd).
    Works on both join sides: candidates split by their OWN bucket's
    stats, probe rows by the PROBED bucket's — a probe meets exactly
    the sub-group its projections land in. Near-identical vectors
    have near-identical projections and stay together (the s7
    rationale); exact duplicates are ungroupable by construction —
    the cap is a skew guard, not a degenerate-duplicate remover."""
    joined = _split_dots(df, vec_col).join(
        broadcast(stats), "bucket", "left"
    ).withColumn(
        # a probed bucket can be empty of candidates and absent from
        # the stats — its eb is 0 (and the null pop/sums are then
        # unreachable: `i < 0` short-circuits every bit to 0)
        "__eb",
        F.coalesce(F.col("eb"), F.lit(0)),
    )
    sub = " + ".join(
        f"(CASE WHEN (({i} < __eb) AND ((__d{i} * pop) >= __s{i})) "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(ANN_MAX_SPLIT_BITS)
    )
    drop = (
        ["eb", "__eb", "pop"]
        + [f"__d{i}" for i in range(ANN_MAX_SPLIT_BITS)]
        + [f"__s{i}" for i in range(ANN_MAX_SPLIT_BITS)]
    )
    return joined.withColumn("sub", F.expr(sub).cast("int")).drop(*drop)


def _skew_guarded_sides(bucketed, q, c, max_bucket):
    """Apply the mean-centered bucket re-split to BOTH join sides of
    an ANN bucket join (one copy of the guard wiring for lsh_ann and
    knn_graph): returns (q, c, join_on). ``max_bucket=None`` is the
    identity — join on bucket alone."""
    if max_bucket is None:
        return q, c, ["bucket"]
    stats = _bucket_split_stats(bucketed, max_bucket).localCheckpoint(
        eager=False
    )  # feeds both sides once
    return (
        _with_subkey(q, stats, "qv"),
        _with_subkey(c, stats, "cv"),
        ["bucket", "sub"],
    )


def lsh_ann(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    n_planes: int | None = None,
    n_est: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Multi-probe random-hyperplane LSH ANN: bucket by ``n_planes``
    sign bits (2^n_planes buckets); each query probes its own bucket
    plus every bucket at Hamming distance 1 (Lv et al.'s multi-probe
    trick — n_planes+1 probe buckets instead of as many hash tables),
    then exact cosine only within probed buckets. The probe explode
    stays an equi-join on bucket id. All arithmetic is scaled-integer
    (signs from exact int64 dots, cosine from int dots rounded to 9
    places) so results match the SQL twin bit-for-bit.

    ``n_planes`` defaults to :func:`adaptive_planes` of the corpus
    size (``n_est`` avoids the counting job), so the bucket count
    scales with n and per-bucket join work stays bounded; the twin
    must be generated with the same plane count. ``max_bucket``
    (optional) engages the skew guard: buckets whose population
    exceeds it are re-split by extra sign bits (see
    :func:`_bucket_split_stats`) so no single join key turns
    quadratic on a clustered corpus; identical to the unguarded
    result whenever every bucket already fits the cap."""
    if n_planes is None:
        n_planes = adaptive_planes(n_est if n_est is not None else emb.count())
    if n_planes > 62:  # int64 bucket ids / probe XOR literals
        raise ValueError(
            f"n_planes={n_planes} exceeds the int64 bucket-id budget"
        )
    bucketed = _sign_bucketed(emb, n_planes).localCheckpoint(
        eager=False
    )  # feeds query + candidate sides once
    probes = _multi_probes(n_planes)
    q = bucketed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(probes).alias("bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket"),
    )
    q, c, join_on = _skew_guarded_sides(bucketed, q, c, max_bucket)
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 9
    )
    scored = (
        c.join(broadcast(q), join_on)
        .where(F.col("qid") != F.col("cid"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
        .orderBy("qid", "rk")
    )


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    n_est: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate k-NN GRAPH over the whole corpus: every vector's
    top-k neighbors from its multi-probe LSH buckets — the precursor
    artifact a graph-ANN build starts from (NN-descent seeds, HNSW
    layer-0 approximation) and the neighborhood structure
    density-based curation reads. Same bucket/probe/scoring machinery
    as :func:`lsh_ann`, generalized from a bounded query set to all
    vectors.

    Scale shape: no broadcast (both sides are corpus-sized) — the
    probe explode (n_planes+1 rows per vector) equi-joins the bucketed
    corpus on bucket id, so candidate volume is Σ over buckets of
    |probes into b|·|b|, bounded because :func:`adaptive_planes` keeps
    expected bucket population constant as n grows; exact int-cosine
    scoring; one per-vector window for the top-k cut. A vector whose
    probed buckets hold fewer than k candidates reports what it found
    (the graph is approximate by contract; recall is s6's job).
    ``max_bucket`` engages the same oversized-bucket re-split as
    :func:`lsh_ann` — on an all-vectors graph the skew guard matters
    most, since one hot bucket is quadratic in BOTH sides."""
    if n_planes is None:
        n_planes = adaptive_planes(n_est if n_est is not None else emb.count())
    if n_planes > 62:  # int64 bucket ids / probe XOR literals
        raise ValueError(
            f"n_planes={n_planes} exceeds the int64 bucket-id budget"
        )
    bucketed = _sign_bucketed(emb, n_planes).localCheckpoint(
        eager=False
    )  # feeds probe + candidate sides once
    probes = _multi_probes(n_planes)
    q = bucketed.select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(probes).alias("bucket"),
    )
    c = bucketed.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("bucket"),
    )
    q, c, join_on = _skew_guarded_sides(bucketed, q, c, max_bucket)
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 9
    )
    scored = (
        q.join(c, join_on).where(F.col("qid") != F.col("cid")).withColumn("cosine", cos)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
        .orderBy("qid", "rk")
    )


def nn_descent_round(emb: DataFrame, graph: DataFrame, k: int = 3) -> DataFrame:
    """One NN-descent refinement round (Dong et al., WWW 2011 shape)
    over an approximate kNN graph: candidate set = current edges ∪
    neighbor-of-neighbor pairs (graph self-join g(q,m) ⋈ g(m,c)),
    exact-int cosine re-rank, per-vertex top-k — the cheap round that
    recovers neighbors the one-shot LSH buckets missed, WITHOUT any
    extra bucket probing (the candidate budget stays O(k²) per
    vertex). Because the candidate set is a superset of the current
    edges and the re-rank uses the same (cosine desc, cid) order as
    the exact truth, per-vertex recall is NON-DECREASING by
    construction (pinned in tests).

    Scale shape: one k²-fanout graph self-join (edge table is n·k
    rows — tiny next to the corpus), one distinct, then two keyed
    joins against the scaled corpus for the exact re-rank and one
    per-vertex window. No broadcast of anything corpus-sized; every
    join is equi-keyed (SMJ-able at any scale)."""
    base = emb.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    e1 = graph.select("qid", F.col("cid").alias("mid"))
    e2 = graph.select(F.col("qid").alias("mid"), "cid")
    non = (
        e1.join(e2, "mid")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    cand = graph.select("qid", "cid").unionByName(non).distinct()
    q = base.select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        cand.join(q, "qid")
        .join(c, "cid")
        .withColumn(
            "cosine",
            F.round(
                cosine_from_ints(
                    int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
                ),
                9,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
        .orderBy("qid", "rk")
    )


def _lsh_pool(
    pool: DataFrame,
    n_planes: int | None,
    n_est: int | None,
    bucketed: DataFrame | None,
) -> tuple[DataFrame, int]:
    """((vec_id, sv, nrm, bucket), n_planes) for the LSH repair
    branches. Without a persisted table: one _sign_bucketed pass
    (n_planes adaptive from n_est / a pool count). With one — the
    (vec_id, bucket) DEPOSIT a maintenance loop persists beside the
    graph (streaming stream.py's "_buckets" sidecar) — the per-batch
    plane-dot scan disappears: the pool only pays the cheap scaled-
    vector projection, joined to its persisted buckets. ``n_planes``
    is then REQUIRED and must be the width the table was built at
    (the nd_bucket_rows fixed-width contract — probe flips at a
    different width would silently probe garbage). Contract: the
    table covers the pool (the sidecar heal/maintain rules guarantee
    it; a TOUCHED vertex missing from the table trips the caller's
    pool-grain poison guard)."""
    if bucketed is not None:
        if n_planes is None:
            raise ValueError(
                "a persisted bucket table needs its fixed n_planes — "
                "probe flips must match the width it was built at"
            )
        if n_planes > 62:
            raise ValueError(
                f"n_planes={n_planes} exceeds the int64 bucket-id budget"
            )
        base = pool.select("vec_id", scaled("embedding").alias("sv")).withColumn(
            "nrm", int_dot(F.col("sv"), F.col("sv"))
        )
        bdf = base.join(
            bucketed.select("vec_id", "bucket"), "vec_id"
        ).localCheckpoint(eager=False)  # feeds probe/candidate/score sides
        return bdf, n_planes
    if n_planes is None:
        n_planes = adaptive_planes(n_est if n_est is not None else pool.count())
    if n_planes > 62:
        raise ValueError(f"n_planes={n_planes} exceeds the int64 bucket-id budget")
    return (
        _sign_bucketed(pool, n_planes).localCheckpoint(eager=False),
        n_planes,
    )


def knn_graph_retract(
    survivors: DataFrame,
    graph: DataFrame,
    ids: DataFrame,
    k: int = 3,
    members: DataFrame | None = None,
    repair: str = "exact",
    n_planes: int | None = None,
    n_est: int | None = None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a per-vertex top-k neighbor graph under
    a batch DELETION — the graph-deposit analogue of
    dedup.remove_from_index / relabel_after_removal, closing the r10
    verdict's "graph-deposit maintenance under churn" gap (before
    this, retracted vectors invalidated graph_nnd2/graph_l1/graph_l2
    wholesale):

    1. rows whose qid was removed are dropped (the vertex is gone),
    2. rows pointing AT a removed cid identify the TOUCHED vertices,
    3. untouched vertices keep their rows verbatim (their whole top-k
       survived, and deletion only shrinks the candidate pool, so a
       surviving top-k is still the top-k),
    4. every touched vertex gets an EXACT re-ranked neighborhood over
       the surviving pool (``members`` when given — a ladder level
       repairs against its level members — else ``survivors``), under
       the graph family's (cosine desc, cid) total order.

    Invariant (pinned in tests): if the input graph is the exact
    per-vertex top-k over the pre-removal pool, the output equals a
    from-scratch exact build over the survivors ROW-FOR-ROW. On an
    approximate deposit (knn_graph / nn_descent_round output) the
    repair is strictly conservative: untouched neighborhoods are
    unchanged and touched ones become exact, so per-vertex recall is
    non-decreasing.

    Repair modes (r11 verdict item 3 — bound per-batch maintenance
    independent of corpus size):

    - ``repair="exact"`` (default): the touched cohort is broadcast
      against the FULL pool for an exact re-rank — O(|touched|·n)
      scores per batch. Right when the pool is a bounded ladder level
      (s27's ≤256-member churn grain, any mod>1 level) where n IS the
      bound, and required for the maintained ≡ from-scratch-rebuild
      hash invariant.
    - ``repair="lsh"``: repair candidates come from the s11 bucket
      machinery instead — the pool is sign-bucketed
      (:func:`_sign_bucketed`, ``n_planes`` defaulting to
      :func:`adaptive_planes` of ``n_est``/a pool count), each
      touched vertex multi-probes its bucket ± one bit flip, and only
      bucket mates ∪ the vertex's own SURVIVING edges are exactly
      re-ranked. Per-batch SCORING work is O(|touched| · (planes+1) ·
      expected-bucket ≤ ANN_TARGET_BUCKET) — independent of n at
      fixed planes, log-n via the adaptive width — versus exact
      mode's O(|touched| · n) scores. Without a persisted table each
      call pays ONE linear no-shuffle sign-bucketing pass (plus a
      pool count when neither ``n_planes`` nor ``n_est`` is given);
      passing ``bucketed`` — the (vec_id, bucket) deposit the
      streaming loops persist beside each "lsh" graph as a
      ``_buckets`` sidecar (healed/maintained at a FROZEN width) —
      removes the plane-dot scan, leaving only the cheap scaled-
      vector projection. A touched vertex
      whose surviving edges AND probe buckets are both empty falls
      back to an exact-mode re-rank rather than vanishing (broadcast
      bounded by the starved count; empty in the common case).
      Keeping
      the surviving edges in the candidate set makes the repair
      strictly conservative on APPROXIMATE deposits: a touched
      vertex's new top-k is drawn from a superset of what it already
      had, so per-vertex recall is non-decreasing (pinned in tests);
      from-scratch equality is the exact mode's contract only
      (though the LSH mode reproduces it whenever the probe set
      covers every bucket — also pinned).

    Scale shape (exact mode): two keyed anti-joins + one semi-join
    sized by the deletion batch (AQE broadcasts it), then one exact
    re-rank of the touched cohort — |touched| is bounded by the
    removed set's in-degree (≈ k·|batch|), broadcast against the
    pool: O(|touched|·n) exact scores and NO shuffle of the corpus,
    versus the O(n²/buckets · rounds) from-scratch rebuild it
    replaces. The broadcast hint on the touched query side is
    load-bearing for the same reason as :func:`hnsw_entry`'s. The
    LSH mode replaces the broadcast non-equi join with bucket
    equi-joins — no BNLJ at all.

    Contract (fails loud, like :func:`knn_graph_ingest`'s members
    guard): every touched vertex must be present in the repair pool —
    a graph deposit and a ``members`` level built at mismatched
    moduli would otherwise silently lose the mismatched vertices'
    rows. Violations raise at execution time via an assert_true
    poison branch that is empty whenever the contract holds."""
    if repair not in ("exact", "lsh"):
        raise ValueError(f"repair must be 'exact' or 'lsh', got {repair!r}")
    rm = ids.select("vec_id").distinct()
    g = graph.join(
        rm.withColumnRenamed("vec_id", "qid"), "qid", "left_anti"
    ).localCheckpoint(eager=False)  # feeds touched + untouched once
    touched = (
        g.join(rm.withColumnRenamed("vec_id", "cid"), "cid", "left_semi")
        .select("qid")
        .distinct()
    )
    untouched = g.join(touched, "qid", "left_anti")
    pool = members if members is not None else survivors
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 9
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    if repair == "lsh":
        bdf, n_planes = _lsh_pool(pool, n_planes, n_est, bucketed)
        base = bdf.select("vec_id", "sv", "nrm")
        probes = _multi_probes(n_planes)
        qb = bdf.join(
            touched.withColumnRenamed("qid", "vec_id"), "vec_id", "left_semi"
        ).select(F.col("vec_id").alias("qid"), F.explode(probes).alias("bucket"))
        cb = bdf.select(F.col("vec_id").alias("cid"), "bucket")
        # surviving current edges stay candidates: the re-rank draws
        # from a superset of the vertex's present neighborhood, which
        # is what makes per-vertex recall non-decreasing on
        # approximate deposits (edges at a matching grain point at
        # pool members; g already dropped removed qids, and removed
        # cids are filtered here)
        kept = (
            g.join(touched, "qid", "left_semi")
            .join(rm.withColumnRenamed("vec_id", "cid"), "cid", "left_anti")
            .select("qid", "cid")
        )
        cand = (
            qb.join(cb, "bucket")
            .where(F.col("qid") != F.col("cid"))
            .select("qid", "cid")
            .unionByName(kept)
            .distinct()
        )
        repaired = (
            cand.join(
                base.select(
                    F.col("vec_id").alias("qid"),
                    F.col("sv").alias("qv"),
                    F.col("nrm").alias("qn"),
                ),
                "qid",
            )
            .join(
                base.select(
                    F.col("vec_id").alias("cid"),
                    F.col("sv").alias("cv"),
                    F.col("nrm").alias("cn"),
                ),
                "cid",
            )
            .withColumn("cosine", cos)
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= k)
            .select("qid", "rk", "cid", "cosine")
        ).localCheckpoint(eager=False)  # feeds the union + the
        # starvation anti-join once
        # Starvation fallback (r12 review): a touched vertex whose
        # surviving edges were ALL removed and whose probe buckets
        # hold no mates (a whole near-dup cluster retracted — near-
        # identical vectors share every plane sign) would otherwise
        # VANISH from the deposit, where exact mode always re-ranks it
        # to k fresh rows. Such vertices get the exact-mode re-rank;
        # the anti-join is empty in the common case, and the broadcast
        # build side is bounded by the starved count ≤ |touched|.
        starved = touched.join(
            repaired.select("qid").distinct(), "qid", "left_anti"
        )
        sq = base.join(
            starved.withColumnRenamed("qid", "vec_id"), "vec_id", "left_semi"
        ).select(
            F.col("vec_id").alias("qid"),
            F.col("sv").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        srows = (
            base.select(
                F.col("vec_id").alias("cid"),
                F.col("sv").alias("cv"),
                F.col("nrm").alias("cn"),
            )
            .join(broadcast(sq), F.col("qid") != F.col("cid"))
            .withColumn("cosine", cos)
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= k)
            .select("qid", "rk", "cid", "cosine")
        )
        repaired = repaired.unionByName(srows)
    else:
        base = pool.select("vec_id", scaled("embedding").alias("sv")).withColumn(
            "nrm", int_dot(F.col("sv"), F.col("sv"))
        )
        q = base.join(
            touched.withColumnRenamed("qid", "vec_id"), "vec_id", "left_semi"
        ).select(
            F.col("vec_id").alias("qid"),
            F.col("sv").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        c = base.select(
            F.col("vec_id").alias("cid"),
            F.col("sv").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        repaired = (
            c.join(broadcast(q), F.col("qid") != F.col("cid"))
            .withColumn("cosine", cos)
            .withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= k)
            .select("qid", "rk", "cid", "cosine")
        )
    # Contract guard (mirrors knn_graph_ingest's members check, made
    # lazy): a touched vertex ABSENT from the repair pool — graph and
    # members built at mismatched level moduli — would silently lose
    # its rows through the left_semi above. Surface it as a runtime
    # error instead: the anti-join is empty when the contract holds
    # (zero extra rows, s27's hash unchanged) and any violating row
    # trips assert_true at execution. The condition references a
    # column, so it is not constant-folded away at plan time.
    bad = touched.join(
        base.select(F.col("vec_id").alias("qid")), "qid", "left_anti"
    )
    poison = bad.select(
        "qid",
        F.lit(0).cast("bigint").alias("rk"),
        F.col("qid").alias("cid"),
        F.assert_true(
            F.col("qid").isNull(),
            F.concat_ws(
                " ",
                F.lit("knn_graph_retract: touched vertex"),
                F.col("qid").cast("string"),
                F.lit(
                    "is absent from the repair pool — graph and"
                    " members were built at mismatched grains"
                ),
            ),
        ).cast("double").alias("cosine"),
    )
    return untouched.unionByName(repaired).unionByName(poison).orderBy("qid", "rk")


def knn_graph_ingest(
    graph: DataFrame,
    batch: DataFrame,
    k: int = 3,
    members: DataFrame | None = None,
    repair: str = "exact",
    n_planes: int | None = None,
    n_est: int | None = None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain a per-vertex top-k neighbor graph under
    a batch INSERTION — :func:`knn_graph_retract`'s twin, closing the
    ingest direction of the r10 verdict's churn gap. ``members`` is
    the POST-insertion vertex pool (vec_id, embedding) — all vectors
    for a ground-level graph, the level members for a ladder level; it
    is REQUIRED (fails loud) because vertices can be edge-less, so the
    graph's own qid set cannot stand in for it:

    1. the NEW vertices get an exact top-k over the whole pool (one
       broadcast re-rank, |batch| × n scores),
    2. every EXISTING vertex re-cuts its top-k from {current edges} ∪
       {its scores against the new batch} — correct because the new
       pool's true top-k can only contain old-pool vectors (covered by
       the current edges when those are exact) or new ones (all
       scored), so no candidate outside the union can enter.

    Invariant (pinned in tests): if the input graph is the exact
    per-vertex top-k over the pre-insertion pool, the output equals a
    from-scratch exact build over the post-insertion pool ROW-FOR-ROW.
    On an approximate deposit the merge is strictly conservative: an
    existing vertex's neighborhood only changes where a new vector
    beats a current edge, so per-vertex recall is non-decreasing.

    Contract: batch ids must be NEW to the pool, or a bit-identical
    replay (the distinct() below makes that a no-op). An id that
    RE-ENTERS with a different embedding violates the merge's
    exactness — its stale edges describe a vector that no longer
    exists, and step 2's candidate union cannot recover the old-pool
    vector its old edge displaced — so updates must go through
    :func:`knn_graph_retract` first (the streaming maintain hook does
    exactly that: retract-then-ingest).

    Scale shape (``repair="exact"``, the default): the batch side is
    broadcast everywhere (it is micro-batch-sized); existing vertices
    pay one |pool| × |batch| broadcast join + a top-k window over
    ≤ k + |batch| candidates per vertex, and the corpus is never
    self-joined — O(n·|batch|) scores total versus the O(n²/buckets ·
    rounds) from-scratch rebuild. ``repair="lsh"`` routes BOTH passes
    through the s11 bucket machinery instead (r11 verdict item 3):
    new vertices draw candidates from their multi-probed sign
    buckets, and an existing vertex is re-cut only where a batch
    vector probes into its bucket — per-batch SCORING work is
    O(|batch| · (planes+1) · expected-bucket), independent of n at
    fixed planes (vs exact mode's O(n·|batch|)); pass ``bucketed``
    (the streaming loops' ``_buckets`` sidecar) to drop the per-call
    sign-bucketing scan — see knn_graph_retract's cost note. A new
    vertex whose probe buckets hold no
    mates falls back to an exact-mode re-rank instead of entering the
    graph edge-less. The merge stays conservative
    (current edges always candidates → per-vertex recall
    non-decreasing) and replay-idempotent; from-scratch equality is
    the exact mode's contract only (the LSH mode reproduces it when
    the probe set covers every bucket — pinned in tests)."""
    if members is None:
        raise ValueError(
            "knn_graph_ingest needs the post-insertion member pool "
            "(vec_id, embedding) — vertices can be edge-less, so the "
            "graph's qid set cannot stand in for it"
        )
    if repair not in ("exact", "lsh"):
        raise ValueError(f"repair must be 'exact' or 'lsh', got {repair!r}")
    if repair == "lsh":
        return _knn_graph_ingest_lsh(
            graph, batch, k, members, n_planes, n_est, bucketed
        )
    base = members.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    ).localCheckpoint(eager=False)  # feeds new-vertex q, batch c, old q
    bids = batch.select("vec_id").distinct()
    newq = base.join(bids, "vec_id", "left_semi").select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c_all = base.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 9
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    new_rows = (
        c_all.join(broadcast(newq), F.col("qid") != F.col("cid"))
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
    )
    # existing vertices: current edges ∪ scores against the new batch
    oldq = base.join(bids, "vec_id", "left_anti").select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c_new = base.join(bids, "vec_id", "left_semi").select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    vs_batch = (
        oldq.join(broadcast(c_new), F.col("qid") != F.col("cid"))
        .withColumn("cosine", cos)
        .select("qid", "cid", "cosine")
    )
    old_kept = graph.join(bids.withColumnRenamed("vec_id", "qid"), "qid", "left_anti")
    # distinct: a REPLAYED batch's vectors are already graph vertices,
    # so an old edge into them and its vs_batch re-score are the same
    # (qid, cid, cosine) row — without the dedup that row would occupy
    # two top-k slots and break replay idempotence
    merged = old_kept.select("qid", "cid", "cosine").unionByName(vs_batch).distinct()
    old_rows = (
        merged.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
    )
    return old_rows.unionByName(new_rows).orderBy("qid", "rk")


def _knn_graph_ingest_lsh(
    graph: DataFrame,
    batch: DataFrame,
    k: int,
    members: DataFrame,
    n_planes: int | None,
    n_est: int | None,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """:func:`knn_graph_ingest`'s ``repair="lsh"`` body: candidates
    from the s11 multi-probe sign buckets instead of full-pool
    broadcasts, bounding per-batch work independent of corpus size
    (see the caller's docstring for the contract)."""
    bdf, n_planes = _lsh_pool(members, n_planes, n_est, bucketed)
    bids = batch.select("vec_id").distinct()
    probes = _multi_probes(n_planes)
    qside = bdf.select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cside = bdf.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 9
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
    # new vertices: candidates = multi-probed bucket mates
    qb_new = bdf.join(bids, "vec_id", "left_semi").select(
        F.col("vec_id").alias("qid"), F.explode(probes).alias("bucket")
    )
    cb = bdf.select(F.col("vec_id").alias("cid"), "bucket")
    cand_new = (
        qb_new.join(cb, "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    new_rows = (
        cand_new.join(qside, "qid")
        .join(cside, "cid")
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
    ).localCheckpoint(eager=False)  # feeds the union + the
    # starvation anti-join once
    # Starvation fallback (r12 review, knn_graph_retract's twin): a
    # new vertex whose probe buckets hold no mates would otherwise
    # enter the graph edge-less and invisible; it gets the exact-mode
    # re-rank over the pool — empty anti-join in the common case,
    # broadcast build bounded by the starved-batch count.
    starved_new = bids.join(
        new_rows.select(F.col("qid").alias("vec_id")).distinct(),
        "vec_id",
        "left_anti",
    )
    snq = bdf.join(starved_new, "vec_id", "left_semi").select(
        F.col("vec_id").alias("qid"),
        F.col("sv").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    s_rows = (
        cside.join(broadcast(snq), F.col("qid") != F.col("cid"))
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
    )
    new_rows = new_rows.unionByName(s_rows)
    # existing vertices: re-cut only where a batch vector probes into
    # the vertex's bucket — candidates = {current edges} ∪ {bucket
    # collisions with the batch}; everyone else keeps rows verbatim
    # through the top-k window (≤ k rows in, same ≤ k rows out)
    bq = bdf.join(bids, "vec_id", "left_semi").select(
        F.col("vec_id").alias("cid"), F.explode(probes).alias("bucket")
    )
    oldb = bdf.join(bids, "vec_id", "left_anti").select(
        F.col("vec_id").alias("qid"), "bucket"
    )
    cand_old = (
        oldb.join(bq, "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    vs_batch = (
        cand_old.join(qside, "qid")
        .join(cside, "cid")
        .withColumn("cosine", cos)
        .select("qid", "cid", "cosine")
    )
    old_kept = graph.join(bids.withColumnRenamed("vec_id", "qid"), "qid", "left_anti")
    # distinct: replay idempotence — see the exact mode's comment
    merged = old_kept.select("qid", "cid", "cosine").unionByName(vs_batch).distinct()
    old_rows = (
        merged.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine")
    )
    return old_rows.unionByName(new_rows).orderBy("qid", "rk")


HNSW_BRANCHING = 4     # level-membership thinning factor (÷4 per rung)
HNSW_ENTRY_TARGET = 24  # smallest useful exact-scan entry level


# The pre-filter cliff for attribute-filtered ANN: at or below this
# selectivity, running the predicate through the INDEX (s28's
# ivf_ann_filtered pre-filter) beats any descent shape — the s28/s29
# decision tables measure exactly this (the mod-8 tenant's filtered
# beams starve at every shipped width while pre-filter holds full-k
# recall). 1/8 is the coarsest selectivity the shipped tables show
# starving; production deployments re-derive it from their own s29
# table, the way hnsw_ladder_moduli re-derives ladder depth from n.
FILTERED_ANN_PRE_MAX = 1.0 / 8.0


def filtered_ann_strategy(selectivity: float, k: int, beam: int) -> str:
    """Executable query-time POLICY for attribute-filtered ANN — the
    DECISION the s28/s29 tables inform (r13, the r12 verdict's item
    4; the :func:`hnsw_ladder_moduli` discipline applied to the
    strategy knob — an executable formula instead of a table the
    operator reads by hand):

    - ``'pre'`` when selectivity ≤ FILTERED_ANN_PRE_MAX: the
      predicate prunes so hard that running it through the index
      (s28's pre-filter) is both cheapest and recall-safest — every
      query gets a full k from its own tenant.
    - ``'beam'`` when beam · selectivity ≥ k: the filtered beam
      (hnsw_descent ``keep=``) keeps enough predicate-passing slots
      per hop in expectation to fill the answer — starvation not
      predicted, cheapest descent wins. ``beam`` is the EFFECTIVE
      width (base × widen — the production widen-by-1/selectivity
      rule of thumb feeds in here).
    - ``'route'`` otherwise: starvation predicted (the filtered beam
      would keep < k candidates in expectation), so navigate
      unfiltered and answer from the scored pool
      (``collect_candidates=True``).

    Pure scalar function — callable at plan-build time (s29 stamps
    the decision on every cell row so the DuckDB twin hash-verifies
    the policy itself) and cheap enough for per-query dispatch when
    selectivity stats are per-tenant."""
    if not 0.0 < selectivity <= 1.0:
        raise ValueError(f"selectivity must be in (0, 1], got {selectivity}")
    if k < 1 or beam < 1:
        raise ValueError("k and beam must be positive")
    if selectivity <= FILTERED_ANN_PRE_MAX:
        return "pre"
    if beam * selectivity >= k:
        return "beam"
    return "route"


def hnsw_ladder_moduli(
    n: int,
    branching: int = HNSW_BRANCHING,
    entry_target: int = HNSW_ENTRY_TARGET,
) -> list[int]:
    """Ladder GEOMETRY from the corpus size — the executable form of
    the "levels grow with log(n)" claim: returns the graph-level
    moduli [b, b², …, b^L] (top graph last; the entry level sits one
    rung above, modulus b^(L+1)), choosing the deepest ladder whose
    entry level still holds ≥ ``entry_target`` members. The entry
    scan is exact, so its size is the recall floor — deepening past
    the target trades recall for nothing (s24's honesty note measures
    exactly that at test scale). Every corpus growth by the branching
    factor adds one level; each level is the same bounded
    knn_graph-over-members plan (graph_l1/graph_l2's shape).

    The s22/s24 keys pin FIXED two- and three-level instances (their
    oracles replay fixed geometry); a production deployment derives
    its ladder from this and builds one deposit per modulus:
    hnsw_ladder_moduli(500) == [4] (s22's geometry, entry mod 16) and
    the 3-level s24 geometry becomes the pick once n reaches
    branching·entry_target·16 (pinned in tests)."""
    if n < 1:
        raise ValueError("corpus size must be positive")
    # entry-level membership over dense vec_ids 0..n-1 with the
    # vec_id % mod == 0 rule is ceil(n / mod) — the same _lvl_count
    # formula the descent uses — so the depth test must be ceil too:
    # a floor here would leave boundary corpus sizes (ceil meets the
    # target, floor misses by one) a level shallower than the
    # documented "entry level still holds >= entry_target members".
    levels = 1
    while -(-n // (branching ** (levels + 2))) >= entry_target:
        levels += 1
    return [branching ** i for i in range(1, levels + 1)]


def churn_modulus(n: int, target: int = 256) -> int:
    """Member-thinning modulus for the churn-maintenance demo grain
    (s27): the smallest power of two whose member level (vec_id % mod
    == 0, ceil(n/mod) members) holds ≤ ``target`` vectors — the same
    executable-geometry discipline as :func:`hnsw_ladder_moduli`, so
    the exact from-scratch twin stays bounded at ANY corpus size while
    the maintenance operators it validates (knn_graph_retract /
    knn_graph_ingest) are themselves corpus-grain."""
    if n < 1:
        raise ValueError("corpus size must be positive")
    mod = 1
    while -(-n // mod) > target:
        mod *= 2
    return mod


def hnsw_base(emb: DataFrame) -> DataFrame:
    """The layered descent's scaled-vector corpus base: (vec_id, sv,
    nrm), lazily checkpointed so entry scan + every re-rank hop read
    one materialization. Build it ONCE and pass to every
    :func:`hnsw_descent` call that shares the corpus (a beam sweep, a
    serving loop's micro-batches) — otherwise each call pays its own
    corpus scan + checkpoint."""
    return (
        emb.select("vec_id", scaled("embedding").alias("sv"))
        .withColumn("nrm", int_dot(F.col("sv"), F.col("sv")))
        .localCheckpoint(eager=False)  # feeds entry + every re-rank once
    )


def hnsw_entry(q: DataFrame, base: DataFrame, entry_mod: int) -> DataFrame:
    """Entry-level candidates: every query × every entry member
    (vec_id % entry_mod == 0), self-matches excluded. The ONE non-equi
    join in the descent — bounded build side (the query cohort), and
    the broadcast hint is LOAD-BEARING: q normally sits behind the
    base checkpoint's LogicalRDD whose size statistic is the default
    (huge), so without the hint JoinSelection degrades this to a
    cartesian that the (post-checkpoint) visible plan would hide from
    the plan-safety gate. Same pattern as cosine_topk's query side;
    plan shape pinned by tests/test_scale_plans.py on the
    UN-checkpointed form."""
    return broadcast(q.select("qid")).join(
        base.where(F.col("vec_id") % entry_mod == 0).select(
            F.col("vec_id").alias("cid")
        ),
        F.col("qid") != F.col("cid"),
    )


def hnsw_descent(
    emb: DataFrame,
    graphs: Sequence[DataFrame],
    k: int = 3,
    n_queries: int = 20,
    beam: int = 4,
    entry_mod: int = 16,
    queries: DataFrame | None = None,
    base: DataFrame | None = None,
    keep: Column | None = None,
    collect_candidates: bool = False,
) -> DataFrame:
    """Hierarchical layered-descent ANN search (the HNSW search shape,
    Malkov & Yashunin 2018) expressed as batch DataFrame ops: the
    ENTRY level's membership is a deterministic modulus of vec_id
    (entry members = vec_id % entry_mod == 0), and every level below
    is defined entirely by its position in ``graphs`` — an ARBITRARY
    ladder of neighbor-graph arguments ordered top level → level 0
    (persisted deposits: e.g. [graph_l2, graph_l1, graph_l0] for a
    3-level descent; the caller keeps the nested-layers invariant
    entry ⊂ top graph's members ⊂ … ⊂ all by building each level
    graph over a superset of the level above, e.g. divisor moduli).
    Each query descends greedily: exact-score the (small) entry level
    for an entry beam, then per level below re-rank {beam ∪
    level-graph neighbors of the beam} and keep the best ``beam``
    (``k`` at ground level). Deterministic end-to-end (exact-int
    cosines, (cosine desc, cid) total order), so a DuckDB twin
    replays every hop.

    Final top-k quality dominates the entry beam's pointwise (each
    level re-ranks a superset of the incoming beam under the same
    total order — pinned in tests), and the per-query work is
    O(|entry| + len(graphs)·beam·k) exact scores instead of O(n):
    the hierarchical version of s19's coarse-prune-then-refine.
    This is the "levels grow with log(n)" ladder made literal: at
    100 TB the caller appends more graph deposits (more moduli) and
    every added level is the same bounded per-level plan.

    Scale shape: the only non-equi join is the bounded entry cross
    (n_queries × |entry|, query side broadcast — s1's audited
    pattern, see :func:`hnsw_entry`); every descent hop is an
    equi-join against an n·k-row edge deposit plus a re-rank join
    against the scaled corpus, all keyed.

    ``base`` lets a caller that runs several descents over the same
    corpus (a beam sweep, a serving loop) pass one prebuilt
    :func:`hnsw_base` instead of paying a corpus scan + checkpoint
    per call.

    ``keep`` (a boolean Column over the candidate pair's ``qid`` /
    ``cid``) turns the search into the FILTERED-beam descent every
    production vector store runs for tenant/ACL predicates (the
    Qdrant/Weaviate filtered-HNSW shape): the graph EXPANSION still
    walks the unfiltered deposits — a beam member's neighbors are
    generated regardless of their attributes — but only predicate-
    passing candidates are re-ranked into the beam, at the entry
    scan and at every hop. A selective predicate thins the beam
    (starvation: fewer than k passing candidates survive); the
    caller's counter-knob is widening ``beam`` by roughly the
    inverse selectivity. The filter changes candidate SETS only —
    per-hop work stays bounded by the same O(|entry| +
    len(graphs)·beam·k) envelope, shrunk by the predicate.

    ``collect_candidates=True`` returns the distinct union of EVERY
    candidate the descent scored — (qid, cid, cosine) across the
    entry scan and all hop expansions — instead of the final beam:
    the scored POOL of an unfiltered routing pass, which a filtered
    search can post-filter under a predicate too selective for the
    filtered beam to navigate (severed routes). The pool is a
    superset of the final beam at the same width and its size is the
    same bounded per-query envelope. Composes with ``keep`` (the
    pool is then predicate-filtered too), though the filtered-pool
    question s29 asks uses one or the other."""
    if not graphs:
        raise ValueError("hnsw_descent needs at least one level graph")
    if base is None:
        base = hnsw_base(emb)
    if queries is None:
        q = base.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("qid"),
            F.col("sv").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    else:
        # external serving cohort: EVERY row of ``queries`` probes the
        # index (n_queries is ignored); ids live in the caller's
        # namespace — a query whose id collides with a corpus vec_id
        # would have that one candidate excluded by the self-match
        # guard, so serve with a disjoint id space
        q = queries.select(
            F.col("vec_id").alias("qid"),
            scaled("embedding").alias("qv"),
        ).withColumn("qn", int_dot(F.col("qv"), F.col("qv")))
    cand_side = base.select(
        F.col("vec_id").alias("cid"),
        F.col("sv").alias("cv"),
        F.col("nrm").alias("cn"),
    )

    collected: list[DataFrame] = []  # scored pools (collect_candidates)

    # one parsed expression for the exact-int re-rank cosine (r14 opt:
    # the Column-composed int_dot/round chain cost ~15 py4j round
    # trips per rerank, × ~3 reranks per descent × every descent of a
    # sweep — the SQL string builds the identical tree)
    cos_sql = (
        f"ROUND(CAST({_int_dot_sql('qv', 'cv')} AS DOUBLE) / "
        f"(SQRT(CAST(qn AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))), 9)"
    )

    def rerank(cand: DataFrame, width: int) -> DataFrame:
        if keep is not None:
            cand = cand.where(keep)
        # the candidate set is nq-bounded (O(nq·(|entry| + beam·k))
        # rows of two ids) — broadcast it into the corpus-side re-rank
        # join so the scaled base is SCANNED, never EXCHANGED+SORTED,
        # per hop. Without the hint the base sits behind a checkpoint
        # whose size statistic defeats auto-broadcast and every hop
        # pays a full corpus shuffle (SMJ) at any scale.
        scored = (
            broadcast(cand.join(broadcast(q), "qid"))
            .join(cand_side, "cid")
            .select("qid", "cid", F.expr(cos_sql).alias("cosine"))
        )
        if collect_candidates:
            collected.append(scored)
        w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.col("cid"))
        return (
            scored.select(
                "qid",
                F.row_number().over(w).cast("bigint").alias("rk"),
                "cid",
                "cosine",
            )
            .where(F.col("rk") <= width)
        )

    entry = hnsw_entry(q, base, entry_mod)
    # each beam is consumed twice (graph expansion + the union that
    # keeps it in the candidate set); checkpoint the n_queries×beam-row
    # tables so each descent hop computes once, not once per consumer
    bm = rerank(entry, beam).localCheckpoint(eager=False)

    def expand(beam_df: DataFrame, graph: DataFrame, width: int) -> DataFrame:
        # beam is nq×beam rows — broadcast it against the n·k edge
        # deposit so the expansion SCANS the deposit instead of
        # shuffling it by mid every hop (same rationale as rerank)
        nb = (
            broadcast(beam_df.select("qid", F.col("cid").alias("mid")))
            .join(
                graph.select(F.col("qid").alias("mid"), "cid"), "mid"
            )
            .select("qid", "cid")
        )
        cand = (
            beam_df.select("qid", "cid")
            .unionByName(nb)
            .where(F.col("qid") != F.col("cid"))
            .distinct()
        )
        return rerank(cand, width)

    for i, graph in enumerate(graphs):
        last = i == len(graphs) - 1
        bm = expand(bm, graph, k if last else beam)
        if not last:
            bm = bm.localCheckpoint(eager=False)
    if collect_candidates:
        pool = collected[0]
        for s in collected[1:]:
            pool = pool.unionByName(s)
        # UNORDERED distinct pairs (r14 opt): every consumer re-ranks
        # the pool per query (a window) or treats it as a set, so the
        # former global orderBy was a pure sort+exchange of an
        # intermediate — dropped
        return pool.distinct()
    return bm.orderBy("qid", "rk")


# ---- int8 quantization --------------------------------------------------

Q_SCALE = 1 << 20  # 2^20: float32*2^20 is exact; keeps err² sums in int64


def quantize_error(emb: DataFrame) -> DataFrame:
    """Symmetric int8 quantization of embeddings with *exact* integer
    error accounting (the compression step an ANN index / training
    store applies before shipping vectors).

    Per vector: xi = floor(x·2^20) (exact), m = max|xi|, and each
    element quantizes to q = sign·((2·127·|xi| + m) div (2·m)) —
    round-half-away in pure int64 arithmetic, so any engine reproduces
    it bit-for-bit. The reconstruction error numerator q·m − 127·xi
    (i.e. 127·m·(q/127 − xi/m)) is an exact int64; we report its sum
    of squares per label plus the derived mean — one narrow shuffle
    of 4 longs per vector, no floats until the final division.
    """
    x = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * F.lit(float(Q_SCALE))).cast("long"),
        ).alias("xi"),
    )
    withm = x.withColumn(
        "m", F.greatest(F.array_max("xi"), -F.array_min("xi"))
    ).where(F.col("m") > 0)
    # m is a plain attribute by now — re-evaluating it inside the
    # lambda is a constant-time ref, not an O(dim) recompute.
    err = F.expr(
        "transform(xi, v -> CASE WHEN v >= 0"
        " THEN ((2*127*v + m) div (2*m))*m - 127*v"
        " ELSE -(((2*127*(-v) + m) div (2*m))*m) - 127*v END)"
    )
    per_vec = withm.select(
        "vec_id",
        "label",
        F.size("xi").cast("bigint").alias("n_elems"),
        F.aggregate(
            err, F.lit(0).cast("bigint"), lambda acc, e: acc + e * e
        ).alias("sse_num"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("n_elems").alias("n_elems"),
            F.sum("sse_num").alias("sse_num"),
        )
        .withColumn(
            "mse_num",
            F.col("sse_num").cast("double") / F.col("n_elems").cast("double"),
        )
    )


# ---- Product quantization ANN (s8) ------------------------------------
# m subspaces x 4 sign bits: a 64-d float32 vector compresses to
# PQ_M * PQ_BITS = 32 bits of codes — the memory-bounded residency an
# ANN index carries at 100 TB (raw vectors stay in cold storage and
# only the shortlist is fetched for exact re-rank).
PQ_M = 8           # subspaces
PQ_SUBDIM = 8      # dims per subspace (PQ_M * PQ_SUBDIM = 64)
PQ_BITS = 4        # sign bits -> 16 cells per subspace
PQ_SHORTLIST = 12  # ADC shortlist per query before exact re-rank


def pq_shift(n: int) -> int:
    """Centroid down-shift keeping the ADC int64 arithmetic exact at
    any corpus size: per-dim products are bounded by 2^48 * cnt and
    the 64-term fold adds 6 bits, so cells must stay under ~2^8
    effective members. shiftright (arithmetic, floors negatives the
    same way in Spark and DuckDB) trades <= shift bits of centroid
    precision — ranking noise, recovered by the exact re-rank."""
    return max(0, int(n).bit_length() - 8)


def _pq_coded(base: DataFrame) -> DataFrame:
    """(vec_id, sub, subv, code): subspace slices + 4-bit sign cell.
    Zero-centered embeddings make sign cells balanced; the code is
    pure comparison algebra — identical in any engine."""
    sub_arr = F.array(
        *[F.slice("sv", s * PQ_SUBDIM + 1, PQ_SUBDIM) for s in range(PQ_M)]
    )
    subs = base.select("vec_id", F.posexplode(sub_arr).alias("sub", "subv"))
    code = None
    for j in range(PQ_BITS):
        bit = F.when(F.element_at("subv", j + 1) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        code = bit if code is None else code + bit
    return subs.withColumn("code", code.cast("int"))


def pq_ann(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    shortlist: int = PQ_SHORTLIST,
    n_est: int | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 shape): each vector
    is coded per subspace by a 4-bit sign cell; the codebook entry is
    the cell's exact int64 per-dim sum (down-shifted by
    :func:`pq_shift`); queries precompute an asymmetric-distance LUT
    (query-subvector x codebook dots, exact ints) and every candidate
    is scored by the pure int64 sum of its 8 LUT entries — no float
    appears until the final exact re-rank, so groupBy addition order
    cannot perturb the shortlist and the DuckDB twin reproduces it
    bit-for-bit.

    The ADC score ranks by approximate *inner product* against cell
    sums (unnormalized — standard for IP-metric PQ); shortlist recall
    is guarded by the exact int-cosine re-rank of the top
    ``shortlist`` and measured in s6's recall harness.

    Scale shape: codes are PQ_M*PQ_BITS = 32 bits/vector (64x less
    than raw float32); the LUT (n_queries x PQ_M x 2^PQ_BITS longs)
    broadcasts; the ADC pass reads codes only. At 100 TB stack s4's
    IVF cell pruning in front so the linear ADC scan touches probed
    cells only."""
    n = n_est if n_est is not None else emb.count()
    shift = pq_shift(n)
    base = (
        emb.select("vec_id", scaled("embedding").alias("sv"))
        .withColumn("nrm", int_dot(F.col("sv"), F.col("sv")))
        .localCheckpoint(eager=False)  # feeds codes + both re-rank sides
    )
    coded = _pq_coded(base).localCheckpoint(eager=False)  # codebook+cand+LUT
    lut = _pq_lut(coded, shift, n_queries)
    adc = (
        coded.select(F.col("vec_id").alias("cid"), "sub", "code")
        .join(broadcast(lut), ["sub", "code"])
        .where(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.sum("part").alias("adc"))
    )
    return _pq_rerank(adc, base, k, shortlist)


def pq_codebook(coded: DataFrame, shift: int) -> DataFrame:
    """(sub, code, cv): the PQ codebook — per-(subspace, cell)
    down-shifted exact-int per-dim centroid SUMS over the coded pool
    (:func:`_pq_coded` rows). Factored out of :func:`_pq_lut` (r13)
    so a churn loop can FREEZE a codebook built over one corpus
    snapshot while the code deposit is maintained incrementally
    (s31) — ONE copy of the codebook arithmetic the twins mirror."""
    return (
        coded.select("sub", "code", F.posexplode("subv").alias("dim", "sx"))
        .groupBy("sub", "code", "dim")
        .agg(F.sum("sx").alias("cs"))
        .groupBy("sub", "code")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", F.shiftright("cs", shift).alias("cs")))
            ).alias("pairs")
        )
        .select("sub", "code", F.transform("pairs", lambda p: p["cs"]).alias("cv"))
    )


def pq_encode(emb: DataFrame) -> DataFrame:
    """(vec_id, sub, code): the PQ CODE rows of ``emb`` — the
    incremental-ingest path of PQ code-deposit maintenance under
    churn (s31). The sign-cell encode is a pure PER-VECTOR function
    (no pool statistics touch it), so a maintained deposit (keyed
    anti-join on retract, one batch encode on ingest) equals a
    from-scratch re-encode of the surviving corpus ROW-FOR-ROW — the
    invariant s31's DuckDB twin hash-checks. Scale shape: one linear
    pass, PQ_M rows out per vector, no join, no shuffle beyond the
    caller's."""
    base = emb.select("vec_id", scaled("embedding").alias("sv"))
    return _pq_coded(base).select("vec_id", "sub", "code")


def pq_codebook_drift(
    frozen: DataFrame, current: DataFrame, threshold: float
) -> DataFrame:
    """(sub, code, drift, retrain): per-SUBSPACE-cell staleness of a
    frozen PQ codebook against the centroid sums the current corpus
    implies — :func:`ivf_codebook_drift`'s machinery applied at
    subspace grain via the packed key sub·2^PQ_BITS + code (the
    retrain trigger a production PQ index runs between incremental
    re-encodes; codes stay frozen until the monitor fires). A
    (sub, code) cell populated on only one side — fully churned in or
    out — surfaces with drift = 1.0. Bounded: ≤ PQ_M·2^PQ_BITS rows
    in and out."""
    ncells = 1 << PQ_BITS
    key = (F.col("sub") * ncells + F.col("code")).alias("cell")
    d = ivf_codebook_drift(
        frozen.select(key, "cv"), current.select(key, "cv"), threshold
    )
    return d.select(
        F.expr(f"CAST(cell DIV {ncells} AS INT)").alias("sub"),
        F.expr(f"CAST(cell % {ncells} AS INT)").alias("code"),
        "drift",
        "retrain",
    )


def _pq_lut(coded: DataFrame, shift: int, n_queries: int) -> DataFrame:
    """Codebook + query ADC lookup table (qid, sub, code, part): the
    per-(sub, code) down-shifted exact-int centroid sums dotted with
    every query's subvectors — shared by pq_ann and ivfpq_ann (ONE
    copy of the codebook arithmetic, :func:`pq_codebook`, that the
    twins mirror)."""
    cb = pq_codebook(coded, shift)
    return (
        coded.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("qid"), "sub", "subv")
        .join(broadcast(cb), "sub")
        .select("qid", "sub", "code", int_dot(F.col("subv"), F.col("cv")).alias("part"))
    )


def _pq_rerank(adc: DataFrame, base: DataFrame, k: int, shortlist: int) -> DataFrame:
    """ADC shortlist cut + exact int-cosine re-rank to the final top-k
    (qid, rk, cid, cosine, adc) — shared by pq_ann and ivfpq_ann."""
    wsl = Window.partitionBy("qid").orderBy(F.desc("adc"), "cid")
    sl = adc.withColumn("ark", F.row_number().over(wsl)).where(
        F.col("ark") <= shortlist
    )
    q = base.select(
        F.col("vec_id").alias("qid"), F.col("sv").alias("qv"), F.col("nrm").alias("qn")
    )
    c = base.select(
        F.col("vec_id").alias("cid"), F.col("sv").alias("cv2"), F.col("nrm").alias("cn")
    )
    cos = F.round(
        cosine_from_ints(int_dot(F.col("qv"), F.col("cv2")), F.col("qn"), F.col("cn")),
        9,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return (
        sl.join(broadcast(q), "qid")
        .join(c, "cid")
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("qid", "rk", "cid", "cosine", "adc")
        .orderBy("qid", "rk")
    )


def ivfpq_ann(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    nprobe: int = 3,
    shortlist: int = PQ_SHORTLIST,
    n_est: int | None = None,
) -> DataFrame:
    """IVF-ADC (Jégou et al. 2011 §V, the FAISS IVFPQ production
    shape): the IVF coarse quantizer prunes the corpus to ``nprobe``
    probed cells per query, and only those cells' members are
    ADC-scored from their 32-bit PQ codes, shortlisted, and exactly
    re-ranked. s4 scans probed cells with FULL vectors, s8 ADC-scans
    the WHOLE corpus — this composition is what a 100 TB deployment
    actually runs: the linear ADC pass touches probed cells only and
    reads codes (64× smaller than raw float32), full vectors are
    fetched for the shortlist alone.

    Determinism: same exact-int centroid sums / double-fold affinity
    as ivf_ann, same down-shifted exact-int codebook and int64 ADC as
    pq_ann — the composed DuckDB twin reproduces every row.

    Scale shape: the probe pair list is |queries|·nprobe·cell-size
    rows (cells are corpus/|codebook| on average); the ADC join is
    keyed on (cid) then (sub, code, qid) with the LUT broadcast; no
    corpus-sized broadcast, no cartesian."""
    adc = ivfpq_adc(emb, n_queries=n_queries, nprobe=nprobe, n_est=n_est)
    return pq_rerank_from(adc, emb, k=k, shortlist=shortlist)


def ivfpq_adc(
    emb: DataFrame,
    n_queries: int = 20,
    nprobe: int = 3,
    n_est: int | None = None,
) -> DataFrame:
    """The IVF-ADC score table (qid, cid, adc) BEFORE the shortlist
    cut — shortlist-INDEPENDENT, so a recall-vs-shortlist sweep (s20)
    deposits this once and derives every budget's cut from it instead
    of re-running the coarse quantizer + codebook + ADC scan per
    point."""
    n = n_est if n_est is not None else emb.count()
    shift = pq_shift(n)
    scored_cells, w_assign = _ivf_assignment(emb)
    ranked = scored_cells.withColumn("ark", F.row_number().over(w_assign))
    assigned_cells = ranked.where(F.col("ark") == 1).select(
        F.col("vec_id").alias("cid"), "cell"
    )
    probe_cells = (
        ranked.where((F.col("ark") <= nprobe) & (F.col("vec_id") < n_queries))
        .select(F.col("vec_id").alias("qid"), "cell")
    )
    pairs = (
        assigned_cells.join(broadcast(probe_cells), "cell")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    base = emb.select("vec_id", scaled("embedding").alias("sv"))
    coded = _pq_coded(base).localCheckpoint(eager=False)  # codebook + cands
    lut = _pq_lut(coded, shift, n_queries)
    return (
        coded.select(F.col("vec_id").alias("cid"), "sub", "code")
        .join(pairs, "cid")
        .join(broadcast(lut), ["qid", "sub", "code"])
        .groupBy("qid", "cid")
        .agg(F.sum("part").alias("adc"))
    )


def pq_rerank_from(
    adc: DataFrame, emb: DataFrame, k: int, shortlist: int
) -> DataFrame:
    """Public shortlist-cut + exact re-rank over a (possibly
    deposited) ADC table: rebuilds the scaled-vector side from the
    corpus and applies :func:`_pq_rerank`."""
    base = emb.select("vec_id", scaled("embedding").alias("sv")).withColumn(
        "nrm", int_dot(F.col("sv"), F.col("sv"))
    )
    return _pq_rerank(adc, base, k, shortlist)


# ---- Deterministic k-means refinement (s9) ----------------------------
KMEANS_K = 10
KMEANS_ROUNDS = 2


def kmeans_refine(
    emb: DataFrame, k: int = KMEANS_K, rounds: int = KMEANS_ROUNDS
) -> DataFrame:
    """Distributed Lloyd's k-means over cosine affinity — the
    clustering primitive the curation stack assumes (SemDeDup cells,
    IVF codebooks, topic balancing all start from a k-means fit).

    Deterministic in every engine, like :func:`ivf_ann`'s assignment:
    seeds are the first ``k`` vectors (vec_id < k); each round scores
    every vector against every centroid with the double-fold affinity
    (identical IEEE op order both engines) and re-assigns by max
    affinity (cell-id tiebreak); updated centroids are *exact int64
    per-dim sums* of the members (cosine is scale-invariant, so the
    sum IS the mean direction — no float division to drift). A seed
    that captures no members simply drops out of later rounds — the
    same rule in both engines.

    Scale shape per round: centroids broadcast (k rows), assignment is
    a map-side scan (no shuffle of the corpus), and the centroid
    update is one k×dim-wide aggregation. ``rounds`` is fixed and
    small — exactly how a production fit runs (bounded iterations,
    convergence measured offline)."""
    base = (
        emb.select("vec_id", scaled("embedding").alias("sv"))
        .withColumn("nrm", int_dot(F.col("sv"), F.col("sv")))
        .localCheckpoint(eager=False)  # feeds every round's scan
    )
    cents = base.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("sv").alias("cv")
    )
    dot_cv = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ncv = F.aggregate(
        F.transform("cv", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    affinity = dot_cv / (F.sqrt(F.col("nrm").cast("double")) * F.sqrt(ncv))
    w = Window.partitionBy("vec_id").orderBy(F.desc("aff"), "cell")
    assigned = None
    for r in range(rounds):
        assigned = (
            base.join(broadcast(cents))
            .withColumn("aff", affinity)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("vec_id", "sv", "nrm", "cell", "aff")
        )
        if r < rounds - 1:
            cents = (
                assigned.select("cell", F.posexplode("sv").alias("dim", "sx"))
                .groupBy("cell", "dim")
                .agg(F.sum("sx").alias("cs"))
                .groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "cs"))).alias("pairs"))
                .select("cell", F.transform("pairs", lambda p: p["cs"]).alias("cv"))
            )
    ws = Window.partitionBy("cell")
    return (
        assigned.select("vec_id", "cell", F.round("aff", 9).alias("affinity"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(ws).cast("bigint"))
        .orderBy("vec_id")
    )
