"""Similarity-search queries over the embeddings table (SURVEY §2.3)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators import similarity

K = 3
N_QUERIES = 5


def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, k=K, n_queries=N_QUERIES)


def s2_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return similarity.label_centroids(emb)


def s3_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return similarity.lsh_ann(emb, k=K, n_queries=20)


NEARDUP_THRESHOLD = 0.35


def d9_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(emb, threshold=NEARDUP_THRESHOLD)


def s4_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (coarse cells + nprobe); rows-only check."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann(emb, k=K, n_queries=20, nprobe=3)


QUERIES = {
    "s1_cosine_topk": s1_cosine_topk,
    "s2_label_centroids": s2_label_centroids,
    "s3_lsh_ann": s3_lsh_ann,
    "s4_ivf_ann": s4_ivf_ann,
    "d9_embedding_neardup": d9_embedding_neardup,
}

# scaled-integer arithmetic twin — see operators/similarity.py
_SCALED = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT))"
_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
)

ORACLE = {
    "d9_embedding_neardup": f"""
        WITH base AS (
          SELECT vec_id, {_SCALED} AS sv FROM embeddings),
        normed AS (
          SELECT vec_id, sv, {_DOT.format(a='sv', b='sv')} AS nrm FROM base)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(CAST({_DOT.format(a='a.sv', b='b.sv')} AS DOUBLE)
                 / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))), 9) AS cosine
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE round(CAST({_DOT.format(a='a.sv', b='b.sv')} AS DOUBLE)
                 / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))), 9) >= {NEARDUP_THRESHOLD}
        ORDER BY id_a, id_b
    """,
    "s1_cosine_topk": f"""
        WITH base AS (
          SELECT vec_id, {_SCALED} AS sv FROM embeddings),
        normed AS (
          SELECT vec_id, sv, {_DOT.format(a='sv', b='sv')} AS nrm FROM base),
        scored AS (
          SELECT q.vec_id AS qid, c.vec_id AS cid,
                 round(CAST({_DOT.format(a='q.sv', b='c.sv')} AS DOUBLE)
                   / (sqrt(CAST(q.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE))), 9) AS cosine
          FROM normed q JOIN normed c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id)
        SELECT qid, rk, cid, cosine FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS BIGINT) AS rk
          FROM scored)
        WHERE rk <= {K}
        ORDER BY qid, rk
    """,
    "s2_label_centroids": f"""
        WITH ex AS (
          SELECT label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 16777216.0) AS BIGINT) AS sx
          FROM embeddings)
        SELECT label, dim,
               CAST(SUM(sx) AS DOUBLE) / (CAST(COUNT(sx) AS DOUBLE) * 16777216.0) AS centroid
        FROM ex GROUP BY label, dim ORDER BY label, dim
    """,
}
