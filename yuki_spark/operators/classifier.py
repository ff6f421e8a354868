"""Distributed linear-classifier TRAINING over hashed token features.

The d40 quality filter scores documents with a linear model over
hashing-trick features but applies a FIXED weight table; this module
LEARNS one — the missing train step of the fastText/DCLM-style
quality-classifier loop (train a cheap linear model on weak labels,
filter the corpus with it). The trainer is the batch PERCEPTRON:

    score_i = Σ_b x_{i,b} · w_b            (exact int64)
    M_t     = { i : y_i · score_i ≤ 0 }    (the mistake set)
    w ← w + Σ_{i ∈ M_t} y_i · x_{i,b}      (batch update, lr = 1)

Everything is integer arithmetic on deterministic inputs, so both
engines reproduce the learned weights bit-for-bit — the same
portability argument as the BPE trainer (operators/bpe.py) and the
lang-id trainer (queries/docs.langid_train_confusion). The classic
per-sample perceptron is sequential; the batch variant is an
order-free aggregate per iteration, which is what makes it a Spark
hash-agg instead of a driver loop.

Scale shape: the feature table (doc_id, bucket, x) is built once and
lineage-truncated; each of the K iterations is ONE pass over it — a
broadcast join against the ≤FEATURES-row weight table, a doc-grain
hash-agg for scores, the mistake anti-filter, and a bucket-grain
hash-agg for the gradient. Weights stay a bounded DataFrame
(broadcastable at any corpus size); nothing is collected to the
driver; K is the artifact size, fixed by the caller.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scores(feat: DataFrame, lbl: DataFrame, w: "DataFrame | None") -> DataFrame:
    """(doc_id, y, score) under weights ``w`` (None = the zero model):
    docs with no feature rows — or none touching a non-zero weight —
    score 0 via the left joins, exactly like the SQL twin's COALESCE."""
    if w is None:
        return lbl.select("doc_id", "y", F.lit(0).cast("bigint").alias("score"))
    s = (
        feat.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("val")).cast("bigint").alias("score"))
    )
    return lbl.join(s, "doc_id", "left").select(
        "doc_id",
        "y",
        F.coalesce(F.col("score"), F.lit(0).cast("bigint")).alias("score"),
    )


def perceptron_train(feat: DataFrame, lbl: DataFrame, n_iters: int):
    """Train K batch-perceptron iterations over a (doc_id, bucket, x)
    feature table and (doc_id, y ∈ {+1, −1}) labels. Returns
    ``(report_df, w_avg)``: one report row per iteration —
    (iteration, n_mistakes, n_pos_mis, n_neg_mis, w_nnz, w_pin) where
    the mistake counts are measured BEFORE that iteration's update
    (the training curve) and (w_nnz, w_pin) describe the weights
    AFTER it (w_pin = Σ val·(bucket+1), the artifact's integer
    checksum — exact in int64 while Σ|val|·FEATURES < 2^63; at
    1e12-token corpora swap to modular arithmetic) — and the
    AVERAGED-perceptron model Σ_t w_t (Collins 2002, EMNLP: the
    batch iterates oscillate on non-separable data, the running
    average is the model you deploy; the K× scale factor leaves the
    decision sign unchanged, so the average stays exact int64).

    Every per-iteration state is lineage-truncated: the weight table
    eagerly (≤FEATURES rows — also what keeps the broadcast hint
    honest), the mistake set lazily (doc-grain, feeds both the
    gradient and the report row)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be positive, got {n_iters}")
    feat = feat.localCheckpoint(eager=False)
    lbl = lbl.localCheckpoint(eager=False)
    w: DataFrame | None = None
    iterates: list[DataFrame] = []
    out: DataFrame | None = None
    for it in range(1, n_iters + 1):
        mis = (
            _scores(feat, lbl, w)
            .where(F.col("y") * F.col("score") <= 0)
            .select("doc_id", "y")
            .localCheckpoint(eager=False)
        )
        grad = (
            feat.join(mis, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("x")).cast("bigint").alias("val"))
        )
        merged = grad if w is None else w.unionByName(grad)
        w = (
            merged.groupBy("bucket")
            .agg(F.sum("val").cast("bigint").alias("val"))
            .where(F.col("val") != 0)
            .localCheckpoint(eager=True)
        )
        iterates.append(w)
        mstat = mis.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_mistakes"),
            F.coalesce(
                F.sum(F.when(F.col("y") == 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_pos_mis"),
            F.coalesce(
                F.sum(F.when(F.col("y") == -1, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_neg_mis"),
        )
        wstat = w.agg(
            F.count(F.lit(1)).cast("bigint").alias("w_nnz"),
            F.coalesce(
                F.sum(F.col("val") * (F.col("bucket") + 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("w_pin"),
        )
        row = (
            mstat.crossJoin(F.broadcast(wstat))
            .select(
                F.lit(it).cast("bigint").alias("iteration"),
                "n_mistakes",
                "n_pos_mis",
                "n_neg_mis",
                "w_nnz",
                "w_pin",
            )
        )
        out = row if out is None else out.unionByName(row)
    merged = iterates[0]
    for wi in iterates[1:]:
        merged = merged.unionByName(wi)
    w_avg = (
        merged.groupBy("bucket")
        .agg(F.sum("val").cast("bigint").alias("val"))
        .where(F.col("val") != 0)
        .localCheckpoint(eager=True)
    )
    return out.orderBy("iteration"), w_avg
