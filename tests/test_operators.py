"""Known-answer unit tests for the dedup / similarity / text /
multimodal operators (SURVEY §5) on tiny hand-built inputs."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yuki_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
        (2, "the quick brown fox jumps over the lazy cat", "en", "a"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog", "en", "b"),  # exact dup of 1
        (4, "completely different words entirely unrelated text here", "en", "b"),
        (5, "le chat et la souris dansent dans le jardin", "fr", "b"),
        (6, "", "en", "b"),  # empty doc edge case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_exact_dup_stats(spark, docs):
    got = {r["source"]: (r["n_docs"], r["n_unique"], r["n_dups"]) for r in dedup.exact_dup_stats(docs).collect()}
    # source b holds doc 3 (dup of doc 1 across sources — not within b)
    assert got["a"] == (2, 2, 0)
    assert got["b"] == (4, 4, 0)


def test_jaccard_pairs_known_value(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jac"] for r in dedup.jaccard_pairs(docs, 0.5).collect()}
    # docs 1 and 2: 8 distinct tokens each, 7 shared → J = 7/9
    assert pairs[(1, 2)] == pytest.approx(7 / 9)
    assert pairs[(1, 3)] == pytest.approx(1.0)  # exact dup
    assert (1, 4) not in pairs
    assert (2, 4) not in pairs


def test_minhash_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jac"] for r in dedup.minhash_lsh_pairs(docs, 0.7).collect()}
    assert pairs[(1, 3)] == pytest.approx(1.0)  # identical sigs always collide
    assert pairs.get((1, 2)) == pytest.approx(7 / 9)  # J=7/9 ≫ LSH s-curve knee
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_simhash_identical_docs_distance_zero(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup.simhash_pairs(docs, 3).collect()}
    assert pairs[(1, 3)] == 0
    assert (1, 4) not in pairs


def test_lang_id_and_und(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_scores(docs).collect()}
    assert got[1] == "en"
    assert got[5] == "fr"
    assert got[6] == "und"  # no stopword hits at all


def test_quality_score_bounds_and_ordering(spark, docs):
    got = {r["doc_id"]: r["quality"] for r in text.quality_features(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[6]  # real text beats empty text


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in text.fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((30, 64)).astype("float32")
    vecs[7] = vecs[0] * 2.0  # colinear with 0 → cosine 1
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int"), vecs


def test_cosine_topk_matches_numpy(spark, emb):
    df, vecs = emb
    got = similarity.cosine_topk(df, k=3, n_queries=2).collect()
    v = vecs.astype("float64")
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    S = vn @ vn.T
    for r in got:
        assert r["cosine"] == pytest.approx(S[r["qid"], r["cid"]], abs=1e-6)
    top1 = {r["qid"]: r["cid"] for r in got if r["rk"] == 1}
    assert top1[0] == 7  # colinear vector wins for query 0


def test_neardup_pairs_finds_colinear(spark, emb):
    df, _ = emb
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in similarity.cosine_neardup_pairs(df, 0.95).collect()}
    assert pairs[(0, 7)] == pytest.approx(1.0, abs=1e-6)


def test_ivf_ann_shape_and_self_exclusion(spark, emb):
    df, _ = emb
    got = similarity.ivf_ann(df, k=2, n_queries=3, nprobe=3).collect()
    assert all(r["qid"] != r["cid"] for r in got)
    per_q = {q: [r for r in got if r["qid"] == q] for q in {r["qid"] for r in got}}
    for q, rows in per_q.items():
        assert [r["rk"] for r in sorted(rows, key=lambda r: r["rk"])] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_multimodal_roundtrip(spark, docs):
    media = multimodal.synth_media(docs.where("doc_id <= 3"))
    feats = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    assert feats[1]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert feats[1]["checksum"] == feats[3]["checksum"]  # same text → same payload
    assert feats[1]["checksum"] != feats[2]["checksum"]
    assert 64 <= feats[1]["width"] <= 1024 + 64 and 64 <= feats[1]["height"] <= 1024 + 64
