"""Property-based tests (hypothesis): operator semantics must hold on
arbitrary inputs, not just the fixtures. Example counts are small —
every example is a full Spark job.

Slow tier (r14 verdict item 1): the whole module is a robustness
sweep, not a driver-gated correctness gate — it runs in the
builder's full CI (tools/citest.sh sets YUKI_SPARK_RUN_SLOW=1) and
skips in the driver's budget-bounded default run."""
from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from yuki_spark.operators import dedup
from yuki_spark.operators.joins import asof_join
from yuki_spark.operators.merge import merge_upsert

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    left_ts=hst.lists(hst.integers(0, 500), min_size=1, max_size=20),
    right_ts=hst.lists(hst.integers(0, 500), min_size=1, max_size=20),
)
@_SETTINGS
def test_asof_join_matches_pandas(spark, left_ts, right_ts):
    trades = pd.DataFrame(
        {"g": [0] * len(left_ts), "t": pd.to_datetime(sorted(left_ts), unit="s")}
    ).assign(row=range(len(left_ts)))
    quotes = pd.DataFrame(
        {
            "g": [0] * len(right_ts),
            "t": pd.to_datetime(sorted(right_ts), unit="s"),
            "px": [float(i) for i in range(len(right_ts))],
        }
    )
    # pandas merge_asof keeps the LAST row among equal timestamps; our
    # window does the same via last() — dedupe ts to avoid ambiguity
    quotes = quotes.drop_duplicates("t", keep="last")
    got = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="t",
        by="g",
        value_cols=["px"],
        strict=True,
    )
    got_map = {r["row"]: r["asof_px"] for r in got.collect()}
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"), on="t", by="g",
        allow_exact_matches=False,
    )
    for _, r in want.iterrows():
        if pd.isna(r["px"]):
            assert got_map[r["row"]] is None
        else:
            assert got_map[r["row"]] == r["px"]


@given(
    docs=hst.lists(
        hst.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=8
    )
)
@_SETTINGS
def test_jaccard_pairs_match_bruteforce(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in dedup.jaccard_pairs(df, threshold=0.0).collect()
    }
    sets = [set(t.split()) for t in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter == 0:
                assert (a, b) not in got  # no shared token → no candidate
            else:
                assert got[(a, b)] == pytest.approx(inter / union)


@given(
    docs=hst.lists(
        hst.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=8
    )
)
@_SETTINGS
def test_jaccard_prefix_filter_exact_at_threshold(spark, docs):
    """Prefix filtering must lose no pair at the shipped threshold:
    results == brute force, value and membership."""
    t = 0.8
    df = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jac"]
        for r in dedup.jaccard_pairs(df, threshold=t).collect()
    }
    sets = [set(txt.split()) for txt in docs]
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = inter / len(sets[a] | sets[b])
            if jac >= t:
                want[(a, b)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_jaccard_hot_token_generates_no_candidates(spark):
    """One stopword-grade token shared by every doc must not blow up
    candidate generation: the hot token lands outside every prefix
    (rarest-first order), so the candidate count stays ~linear, not
    f² in the token's document frequency."""
    n = 60
    rows = [(i, f"the u{i}a u{i}b u{i}c u{i}d") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ts = dedup.token_sets(df)
    n_cand = dedup.jaccard_candidates(ts, threshold=0.8).count()
    assert n_cand == 0  # plain inverted index would give n*(n-1)/2 = 1770
    assert dedup.jaccard_pairs(df, threshold=0.8).count() == 0


@given(
    target_keys=hst.lists(hst.integers(0, 20), min_size=0, max_size=15, unique=True),
    update_keys=hst.lists(hst.integers(0, 20), min_size=0, max_size=15, unique=True),
)
@_SETTINGS
def test_merge_upsert_properties(spark, target_keys, update_keys):
    if not target_keys and not update_keys:
        return
    target = spark.createDataFrame(
        [(k, "old") for k in target_keys] or [], "id long, src string"
    )
    updates = spark.createDataFrame(
        [(k, "new") for k in update_keys] or [], "id long, src string"
    )
    got = {r["id"]: r["src"] for r in merge_upsert(target, updates, ["id"]).collect()}
    assert set(got) == set(target_keys) | set(update_keys)
    for k in update_keys:
        assert got[k] == "new"  # updates win
    for k in set(target_keys) - set(update_keys):
        assert got[k] == "old"  # untouched rows pass through


@given(
    texts=hst.lists(
        hst.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
@_SETTINGS
def test_repetition_matches_python_reference(spark, texts):
    from collections import Counter

    from yuki_spark.operators import text as text_ops

    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r["doc_id"]: r for r in text_ops.repetition_features(df).collect()}
    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else [""]
        # split(trim(x), '\s+') of all-space text yields [''] — one
        # token, no bigram, matching the Spark/DuckDB tokenizer
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        r = got[i]
        assert r["n_bigrams"] == len(grams)
        assert r["n_distinct"] == len(c)
        assert r["max_ct"] == max(c.values())


@given(
    vecs=hst.lists(
        hst.lists(
            hst.floats(-2.0, 2.0, allow_nan=False, width=32), min_size=4, max_size=8
        ).map(tuple),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_quantize_error_matches_python_reference(spark, vecs):
    import math

    from yuki_spark.operators.similarity import Q_SCALE, quantize_error

    # pad/truncate to uniform dim 4 so createDataFrame schema is stable
    vecs = [v[:4] for v in vecs if len(v) >= 4]
    if not vecs:
        return
    rows = [(i, list(v), 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = quantize_error(df).collect()

    import struct

    def f32(x):  # value after float32 storage
        return struct.unpack("f", struct.pack("f", x))[0]

    exp_sse, exp_elems, exp_vecs = 0, 0, 0
    for v in vecs:
        xi = [math.floor(f32(x) * Q_SCALE) for x in v]
        m = max(abs(e) for e in xi)
        if m == 0:
            continue
        exp_vecs += 1
        exp_elems += len(xi)
        for e in xi:
            q = (2 * 127 * abs(e) + m) // (2 * m) * (1 if e >= 0 else -1)
            assert abs(q) <= 127
            exp_sse += (q * m - 127 * e) ** 2
    if exp_vecs == 0:
        assert not out
        return
    r = out[0]
    assert (r["n_vecs"], r["n_elems"], r["sse_num"]) == (exp_vecs, exp_elems, exp_sse)


@given(
    batch=hst.lists(
        hst.tuples(hst.integers(1, 4), hst.integers(1, 6), hst.sampled_from("abcd")),
        min_size=1,
        max_size=12,
    )
)
@_SETTINGS
def test_merge_scd2_single_open_row_invariant(spark, batch):
    """For ANY update batch (multi-version, tied timestamps, dup rows):
    every key ends with exactly one open row, and history closure is
    consistent (closed rows have valid_to set)."""
    from datetime import datetime

    from yuki_spark.operators.merge import merge_scd2

    current = spark.createDataFrame(
        [(1, "base", datetime(2023, 1, 1), None, True)],
        "id long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(k, a, datetime(2024, 1, d)) for k, d, a in batch],
        "id long, attr string, valid_from timestamp",
    )
    out = merge_scd2(current, updates, ["id"], "valid_from").collect()
    open_per_key: dict[int, int] = {}
    for r in out:
        if r["is_current"]:
            open_per_key[r["id"]] = open_per_key.get(r["id"], 0) + 1
            assert r["valid_to"] is None
    for k in {k for k, _, _ in batch} | {1}:
        assert open_per_key.get(k, 0) == 1, (k, out)


@pytest.fixture(scope="module")
def cm_fixture(spark):
    """One CM sketch + its JVM twin, built once — each probe example
    is then JVM-call + pure Python, no Spark job."""
    from yuki_spark.operators import sketches

    df = spark.createDataFrame([(f"key{i % 7}",) for i in range(100)], "key string")
    sk = sketches.cm_sketch(df, "key", 0.01, 0.9)
    d, w, t = sketches.parse_cm_sketch(sk)
    jvm = spark.sparkContext._jvm
    jcms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(sk))
    )
    return d, w, t, jcms


@given(key=hst.text(max_size=40))
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_cm_probe_matches_jvm_on_arbitrary_strings(cm_fixture, key):
    """The pure-Python CountMinSketch string probe must equal the JVM
    estimateCount for ANY string — multi-byte UTF-8 exercises the
    signed-byte tail mixing, long strings the word loop, '' the
    zero-length fmix."""
    from yuki_spark.operators import sketches

    d, w, t, jcms = cm_fixture
    assert sketches.cm_estimate_string(d, w, t, key) == int(jcms.estimateCount(key))


@given(
    pts=hst.lists(
        hst.tuples(hst.integers(0, 8), hst.integers(0, 8)), min_size=1, max_size=25
    )
)
@_SETTINGS
def test_skyline_matches_bruteforce(spark, pts):
    """Skyline over arbitrary points (many criterion ties/duplicates)
    equals the O(n²) dominance definition, under multi-partition
    execution."""
    from yuki_spark.operators.skyline import skyline

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price double, size long").repartition(3)
    got = sorted(
        r["id"] for r in skyline(df, minimize=("price",), maximize=("size",)).collect()
    )

    def dom(q, p):
        return q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])

    want = sorted(r[0] for r in rows if not any(dom(q, r) for q in rows))
    assert got == want


@given(
    vals=hst.lists(
        hst.one_of(hst.none(), hst.integers(min_value=-100, max_value=100)),
        min_size=0,
        max_size=40,
    ),
    split=hst.integers(min_value=0, max_value=40),
)
@_SETTINGS
def test_constraint_report_properties(spark, vals, split):
    """Invariants of the one-pass quality gate: 0 <= violations <=
    n_rows; row-check violations are ADDITIVE under union (each row
    judged independently); unique-key violations equal the brute-force
    duplicate count with nulls counted as violations."""
    from yuki_spark.operators.profile import constraint_report

    split = min(split, len(vals))
    rows = [(i, v) for i, v in enumerate(vals)]
    checks = [
        ("v_null", F.col("v").isNull()),
        ("v_negative", F.coalesce(F.col("v") < 0, F.lit(True))),
    ]
    uniq = (("v_unique", ["v"]),)

    def report(rws):
        df = spark.createDataFrame(rws, "id long, v long") if rws else (
            spark.createDataFrame([], "id long, v long")
        )
        out = constraint_report(df, checks, uniq)
        got = {r["check_name"]: r for r in out.collect()}
        assert all(0 <= r["n_violations"] <= r["n_rows"] for r in got.values())
        assert all(r["ok"] == (r["n_violations"] == 0) for r in got.values())
        return got

    whole = report(rows)
    assert whole["v_null"]["n_violations"] == sum(1 for v in vals if v is None)
    assert whole["v_negative"]["n_violations"] == sum(
        1 for v in vals if v is None or v < 0
    )
    non_null = [v for v in vals if v is not None]
    assert whole["v_unique"]["n_violations"] == len(vals) - len(set(non_null))

    # row checks are additive under union; unique is subadditive
    a, b = report(rows[:split]), report(rows[split:])
    for name in ("v_null", "v_negative"):
        assert (
            a[name]["n_violations"] + b[name]["n_violations"]
            == whole[name]["n_violations"]
        )
    assert (
        a["v_unique"]["n_violations"] + b["v_unique"]["n_violations"]
        <= whole["v_unique"]["n_violations"]
    )


@given(
    vecs=hst.lists(
        hst.lists(hst.integers(-3, 3), min_size=4, max_size=4),
        min_size=3,
        max_size=9,
    )
)
@_SETTINGS
def test_mmr_rerank_matches_python_reference(spark, vecs):
    """mmr_rerank's greedy sequence (picks, steps AND scores) must
    equal a pure-Python reference running the same rule with the same
    arithmetic: scaled-int cosines rounded HALF_UP to 9 places (the
    repr-based decimal mirrors Spark's BigDecimal.valueOf round), then
    argmax of rel − max-sim-to-picked with smaller-cid tiebreak."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from yuki_spark.operators.similarity import cosine_topk, mmr_rerank

    vecs = [v for v in vecs if any(x != 0 for x in v)]
    if len(vecs) < 3:
        return
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    k = len(vecs) - 1
    m = 3
    pool = cosine_topk(df, k=k, n_queries=1)
    got = [
        (r["step"], r["cid"], r["rel"], r["mmr_score"])
        for r in mmr_rerank(df, pool, m=m).collect()
    ]

    def r9(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    sv = [[x << 24 for x in v] for v in vecs]  # floor(f32 * 2^24) exact for ints

    def cos(a: int, b: int) -> float:
        dot = sum(x * y for x, y in zip(sv[a], sv[b]))
        na = sum(x * x for x in sv[a])
        nb = sum(x * x for x in sv[b])
        return r9(dot / (math.sqrt(na) * math.sqrt(nb)))

    cands = sorted(range(1, len(vecs)), key=lambda c: (-cos(0, c), c))[:k]
    exp = []
    picked = [cands[0]]
    exp.append((1, cands[0], cos(0, cands[0]), cos(0, cands[0])))
    rem = [c for c in cands[1:]]
    for step in range(2, m + 1):
        if not rem:
            break
        scored = [
            (cos(0, c) - max(cos(c, p) for p in picked), -c, c) for c in rem
        ]
        score, _negc, c = max(scored)
        exp.append((step, c, cos(0, c), score))
        picked.append(c)
        rem.remove(c)
    assert got == exp


# ---- round-7 query invariants on arbitrary corpora -------------------------
# The three r7 scan+agg queries (classifier scoring, mix planner,
# source novelty) are validated against INDEPENDENT pure-Python
# references — a third implementation besides Spark and the DuckDB
# twin, so a shared misunderstanding in the SQL can't hide.

_WORDS = ["x", "y", "zz", "w", "vv", "q"]


def _write_doc_catalog(rows):
    """Materialize (source, text) rows as a documents.parquet catalog
    in a fresh temp dir (fresh per example: no path reuse across
    hypothesis examples)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="yuki-prop-cat-")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    return d


def _py_tokens(text):
    import re

    return re.split(r"\s+", text.strip())


def _py_h60(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_DOCS_STRAT = hst.lists(
    hst.tuples(
        hst.sampled_from(["a", "b", "c"]),
        hst.lists(hst.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
    ),
    min_size=1,
    max_size=10,
)


@given(rows=_DOCS_STRAT)
@_SETTINGS
def test_classifier_filter_matches_python_reference(spark, rows):
    from yuki_spark.queries import docs as docs_q

    sf = _write_doc_catalog(rows)
    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["total_score"],
                      r["min_score"], r["max_score"])
        for r in docs_q.d40_classifier_filter(spark, sf).collect()
    }

    def score(text):
        return sum(
            ((_py_h60(tok) % docs_q.CLF_FEATURES) * docs_q.CLF_MIX)
            % docs_q.CLF_WEIGHT_MOD
            - docs_q.CLF_WEIGHT_MOD // 2
            for tok in _py_tokens(text)
        )

    exp = {}
    for src, text in rows:
        s = score(text)
        n, k, tot, mn, mx = exp.get(src, (0, 0, 0, None, None))
        exp[src] = (
            n + 1,
            k + (1 if s >= 0 else 0),
            tot + s,
            s if mn is None else min(mn, s),
            s if mx is None else max(mx, s),
        )
    assert got == exp


@given(rows=_DOCS_STRAT)
@_SETTINGS
def test_mix_planner_matches_python_reference(spark, rows):
    from yuki_spark.queries import docs as docs_q

    sf = _write_doc_catalog(rows)
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["target_tokens"],
                      r["planned_tokens"], r["shortfall"])
        for r in docs_q.d41_mix_planner(spark, sf).collect()
    }

    per = {}
    for src, text in rows:
        n, t = per.get(src, (0, 0))
        per[src] = (n + 1, t + len(_py_tokens(text)))
    corpus = sum(t for _n, t in per.values())
    target = (corpus // docs_q.MIXPLAN_BUDGET_DIV) // len(per)
    exp = {
        src: (n, t, target, min(t, target), max(0, target - t))
        for src, (n, t) in per.items()
    }
    assert got == exp


@given(rows=_DOCS_STRAT)
@_SETTINGS
def test_source_novelty_matches_python_reference(spark, rows):
    from yuki_spark.queries import docs as docs_q

    sf = _write_doc_catalog(rows)
    got = {
        r["source"]: (r["n_distinct_grams"], r["n_exclusive"])
        for r in docs_q.d42_source_novelty(spark, sf).collect()
    }

    per = {}
    for src, text in rows:
        toks = _py_tokens(text)
        grams = {
            " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
        }
        per.setdefault(src, set()).update(grams)
    exp = {}
    for src, grams in per.items():
        others = set().union(
            *(g for s, g in per.items() if s != src), set()
        )
        excl = len(grams - others)
        if grams:
            exp[src] = (len(grams), excl)
    assert got == exp


def _write_event_catalog(evs):
    """(user_id, ts_seconds, event_type, value) rows → events.parquet
    in a fresh temp dir, timestamps as TIMESTAMP(us, UTC)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="yuki-prop-ev-")
    t = pa.table(
        {
            "event_id": pa.array(range(len(evs)), pa.int64()),
            "ts": pa.array(
                [e[1] * 1_000_000 for e in evs], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array([e[0] for e in evs], pa.int64()),
            "event_type": pa.array([e[2] for e in evs], pa.string()),
            "value": pa.array([float(e[3]) for e in evs], pa.float64()),
            "props": pa.array(["{}"] * len(evs), pa.string()),
        }
    )
    pq.write_table(t, f"{d}/events.parquet")
    return d


_EVENTS_STRAT = hst.lists(
    hst.tuples(
        hst.integers(0, 3),  # user_id
        hst.integers(0, 1000),  # ts seconds
        hst.sampled_from(["view", "click", "purchase"]),
        hst.integers(0, 100),  # value (integral: exact in double+decimal)
    ),
    min_size=1,
    max_size=16,
)


@given(evs=_EVENTS_STRAT)
@_SETTINGS
def test_ab_lift_matches_python_reference(spark, evs):
    from yuki_spark.queries import events as events_q

    sf = _write_event_catalog(evs)
    got = {
        r["variant"]: (r["n_users"], r["n_converted"], r["purchase_value"])
        for r in events_q.e27_ab_lift(spark, sf).collect()
    }

    per_user = {}
    for uid, _ts, typ, val in evs:
        conv, tot = per_user.get(uid, (0, 0))
        if typ == "purchase":
            conv, tot = 1, tot + val
        per_user[uid] = (conv, tot)
    exp = {}
    for uid, (conv, tot) in per_user.items():
        var = _py_h60(str(uid)) % 2
        n, c, v = exp.get(var, (0, 0, 0))
        exp[var] = (n + 1, c + conv, v + tot)
    assert got == {k: (n, c, float(v)) for k, (n, c, v) in exp.items()}


@given(evs=_EVENTS_STRAT)
@_SETTINGS
def test_funnel_latency_matches_python_reference(spark, evs):
    from yuki_spark.queries import events as events_q

    sf = _write_event_catalog(evs)
    got = {
        r["stage"]: (r["n_users"], r["total_lat_us"], r["max_lat_us"])
        for r in events_q.e26_funnel_latency(spark, sf).collect()
    }

    by_user = {}
    for uid, ts, typ, _val in evs:
        by_user.setdefault(uid, []).append((ts, typ))
    lat1, lat2 = [], []
    for uid, rows in by_user.items():
        views = [t for t, ty in rows if ty == "view"]
        if not views:
            continue
        t_view = min(views)
        clicks = [t for t, ty in rows if ty == "click" and t >= t_view]
        if not clicks:
            continue
        t_click = min(clicks)
        lat1.append((t_click - t_view) * 1_000_000)
        purchases = [t for t, ty in rows if ty == "purchase" and t >= t_click]
        if purchases:
            lat2.append((min(purchases) - t_click) * 1_000_000)
    exp = {}
    if lat1:
        exp["view>click"] = (len(lat1), sum(lat1), max(lat1))
    if lat2:
        exp["click>purchase"] = (len(lat2), sum(lat2), max(lat2))
    assert got == exp


@given(rows=_DOCS_STRAT)
@_SETTINGS
def test_shard_balance_matches_python_reference(spark, rows):
    """The distributed rank (per-n_tokens window + offset table) must
    reproduce the plain global (n_tokens desc, doc_id) deal exactly."""
    from yuki_spark.queries import docs as docs_q

    sf = _write_doc_catalog(rows)
    got = {
        r["shard"]: (r["n_docs"], r["shard_tokens"])
        for r in docs_q.d43_shard_balance(spark, sf).collect()
    }

    toks = [(len(_py_tokens(text)), i) for i, (_src, text) in enumerate(rows)]
    order = sorted(toks, key=lambda p: (-p[0], p[1]))
    exp = {}
    for pos, (n, _i) in enumerate(order):
        s = pos % docs_q.N_SHARDS
        nd, tt = exp.get(s, (0, 0))
        exp[s] = (nd + 1, tt + n)
    assert got == exp


# ---- BPE (d44): canonical string impl vs independent GPT-2-style ----
# reference. The production tokenizer (operators/bpe.bpe_tokenize)
# runs a sticky-fixpoint string-replace loop; the reference below is
# the classic list-based GPT-2 bpe(): recompute present pairs, merge
# ALL occurrences of the best-ranked pair left-to-right, repeat. The
# two must agree on ARBITRARY words and ARBITRARY (adversarially
# chained) merge tables — this is the pure-function twin discipline,
# no Spark job per example.


def _gpt2_bpe_reference(word: str, merges: list[tuple[str, str]]) -> list[str]:
    ranks = {}
    for i, m in enumerate(merges):  # first occurrence wins, like rank order
        ranks.setdefault(m, i)
    toks = list(word)
    while len(toks) > 1:
        present = [
            (toks[i], toks[i + 1])
            for i in range(len(toks) - 1)
            if (toks[i], toks[i + 1]) in ranks
        ]
        if not present:
            break
        a, b = min(present, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@given(
    word=hst.text(alphabet="ab", min_size=1, max_size=14),
    merges=hst.lists(
        hst.tuples(
            hst.text(alphabet="ab", min_size=1, max_size=3),
            hst.text(alphabet="ab", min_size=1, max_size=3),
        ),
        max_size=12,
    ),
)
@settings(max_examples=400, deadline=None)
def test_bpe_matches_gpt2_reference_adversarial(word, merges):
    """Two-letter alphabet + short merge sides maximize adjacent-
    occurrence overlaps and chained ranks ((a,a) then (aa,a)) — the
    corners where a naive replace-all diverges from true BPE."""
    from yuki_spark.operators.bpe import bpe_tokenize

    dedup_merges = list(dict.fromkeys(merges))
    got = bpe_tokenize(word, tuple(dedup_merges))
    assert got == _gpt2_bpe_reference(word, dedup_merges)
    assert "".join(got) == word  # tokenization is a partition of the word


@given(word=hst.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=24))
@settings(max_examples=300, deadline=None)
def test_bpe_matches_gpt2_reference_production_table(word):
    from yuki_spark.operators.bpe import MERGES, bpe_tokenize

    got = bpe_tokenize(word)
    assert got == _gpt2_bpe_reference(word, list(MERGES))
    assert "".join(got) == word


@given(
    payloads=hst.lists(
        hst.tuples(hst.booleans(), hst.binary(min_size=0, max_size=33)),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=120, deadline=None)
def test_avi_mjpeg_walk_roundtrip_property(payloads):
    """RIFF walk robustness on arbitrary chunk layouts: frames we mark
    as JPEG (SOI-prefixed, any odd/even size — exercises RIFF padding)
    come back byte-identical and in order; non-JPEG video chunks are
    skipped; the walk never raises on a well-formed container."""
    from yuki_spark.operators import codecs

    frames = [
        (codecs.JPEG_SOI + body) if is_jpeg else (b"\x00\x00" + body)
        for is_jpeg, body in payloads
    ]
    avi = codecs.encode_avi_mjpeg(frames, 8, 8)
    got = codecs.avi_mjpeg_frames(avi)
    want = [f for f in frames if f[:2] == codecs.JPEG_SOI]
    assert got == want


@given(
    vecs=hst.lists(
        hst.lists(
            hst.floats(0.125, 2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ).map(tuple),
        min_size=8,
        max_size=20,
    ),
    depth=hst.sampled_from([2, 3]),
)
@_SETTINGS
def test_hnsw_descent_matches_python_reference(spark, vecs, depth):
    """The layered descent replayed by an independent python reference
    on arbitrary corpora, arbitrary (exact) level graphs, AND an
    arbitrary ladder DEPTH (2 or 3 levels — the r10 level-list
    generalization property-proven, not just pinned at the s24
    fixture): identical final top-k, row for row. Positive components
    keep every norm nonzero; the level graphs are built exactly in
    python and handed to BOTH sides, so this isolates the descent
    mechanics (entry beam, superset expansion, re-rank order,
    self-exclusion)."""
    import math
    import struct

    from yuki_spark.operators.similarity import hnsw_descent

    K_, NQ, BEAM = 2, 4, 2
    # one graph per level, level 0 first: members = ids % m == 0;
    # the entry level sits one modulus above the top graph
    graph_moduli = [1, 2] if depth == 2 else [1, 2, 4]
    entry_mod = graph_moduli[-1] * 2

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    sv = {
        i: [math.floor(f32(x) * (1 << 24)) for x in v]
        for i, v in enumerate(vecs)
    }
    ids = sorted(sv)

    def cos(a, b):
        da = sum(x * y for x, y in zip(sv[a], sv[b]))
        na = math.sqrt(sum(x * x for x in sv[a]))
        nb = math.sqrt(sum(x * x for x in sv[b]))
        return round(da / (na * nb), 9)

    def exact_graph(members):
        edges = {}
        for q in members:
            cands = sorted(
                ((cos(q, c), c) for c in members if c != q),
                key=lambda t: (-t[0], t[1]),
            )
            edges[q] = [c for _, c in cands[:K_]]
        return edges

    # graphs in DESCENT order: top level first, level 0 last
    graphs = [
        exact_graph([i for i in ids if i % m == 0])
        for m in reversed(graph_moduli)
    ]

    def topk(q, cand, width):
        return sorted(
            ((cos(q, c), c) for c in cand if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:width]

    expected = []
    for q in range(min(NQ, len(ids))):
        beam = [
            c for _, c in topk(q, [i for i in ids if i % entry_mod == 0], BEAM)
        ]
        for li, g in enumerate(graphs):
            cand = set(beam)
            for m in beam:
                cand.update(g.get(m, []))
            width = K_ if li == len(graphs) - 1 else BEAM
            beam = [c for _, c in topk(q, cand, width)]
        for rk, c in enumerate(beam, 1):
            expected.append((q, rk, c, cos(q, c)))

    emb = spark.createDataFrame(
        [(i, list(v), 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )

    def gdf(edges):
        rows = [
            (q, rk, c, cos(q, c))
            for q, cs in edges.items()
            for rk, c in enumerate(cs, 1)
        ]
        return spark.createDataFrame(
            rows, "qid long, rk long, cid long, cosine double"
        )

    got = [
        (r["qid"], r["rk"], r["cid"], r["cosine"])
        for r in hnsw_descent(
            emb, [gdf(g) for g in graphs], k=K_, n_queries=NQ, beam=BEAM,
            entry_mod=entry_mod,
        ).collect()
    ]
    assert sorted(got) == sorted(expected)


@given(
    data=hst.data(),
    vecs=hst.lists(
        hst.lists(
            hst.floats(0.125, 2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ).map(tuple),
        min_size=4,
        max_size=12,
    ),
)
@_SETTINGS
def test_nn_descent_round_matches_python_reference(spark, data, vecs):
    """One NN-descent round replayed by an independent python
    reference on arbitrary corpora AND arbitrary (possibly bogus)
    seed graphs: identical refined edge table, row for row. The seed
    graph need not be a true kNN graph — the operator's contract is
    purely 'candidates = edges ∪ neighbor-of-neighbor, exact-int
    re-rank, top-k per vertex', and that must hold for any input."""
    import math
    import struct

    from yuki_spark.operators.similarity import nn_descent_round

    K_ = 2
    ids = list(range(len(vecs)))
    # arbitrary directed edge set over the ids (self-loops excluded)
    pairs = [(a, b) for a in ids for b in ids if a != b]
    edges = data.draw(
        hst.lists(hst.sampled_from(pairs), min_size=1, max_size=16, unique=True)
    )

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    sv = {
        i: [math.floor(f32(x) * (1 << 24)) for x in v]
        for i, v in enumerate(vecs)
    }

    def cos(a, b):
        da = sum(x * y for x, y in zip(sv[a], sv[b]))
        na = math.sqrt(sum(x * x for x in sv[a]))
        nb = math.sqrt(sum(x * x for x in sv[b]))
        return round(da / (na * nb), 9)

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    expected = []
    for q in sorted(adj):
        cand = set(adj[q])
        for m in adj[q]:
            cand.update(c for c in adj.get(m, []) if c != q)
        top = sorted(
            ((cos(q, c), c) for c in cand), key=lambda t: (-t[0], t[1])
        )[:K_]
        for rk, (v, c) in enumerate(top, 1):
            expected.append((q, rk, c, v))

    emb = spark.createDataFrame(
        [(i, list(v), 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    graph = spark.createDataFrame(
        [(a, 1, b, cos(a, b)) for a, b in edges],
        "qid long, rk long, cid long, cosine double",
    )
    got = [
        (r["qid"], r["rk"], r["cid"], r["cosine"])
        for r in nn_descent_round(emb, graph, k=K_).collect()
    ]
    assert sorted(got) == sorted(expected)


@given(
    data=hst.data(),
    edges=hst.lists(
        hst.tuples(hst.integers(0, 15), hst.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
)
@_SETTINGS
def test_relabel_after_removal_matches_rebuild_on_arbitrary_graphs(
    spark, data, edges
):
    """Incremental CC relabel == from-scratch dedup_clusters over the
    surviving pairs, for ARBITRARY pair graphs and ARBITRARY removal
    sets (hypothesis picks both) — splits, merges-into-nothing,
    removed min-labels, whole-component removals, and empty survivor
    graphs all fall out of the same equality."""
    pairs_rows = sorted({(min(a, b), max(a, b)) for a, b in edges})
    nodes = sorted({x for p in pairs_rows for x in p})
    rm_set = data.draw(
        hst.sets(hst.sampled_from(nodes), min_size=0, max_size=len(nodes)),
        label="removed",
    )

    pairs = spark.createDataFrame(pairs_rows, "doc_a long, doc_b long")
    clusters = dedup.dedup_clusters(pairs)
    rm = spark.createDataFrame(
        [(int(x),) for x in sorted(rm_set)] or [(-1,)], "doc_id long"
    )
    got = sorted(
        tuple(r)
        for r in dedup.relabel_after_removal(clusters, pairs, rm).collect()
    )
    want = sorted(
        tuple(r)
        for r in dedup.dedup_clusters(
            dedup.surviving_pairs(pairs, rm)
        ).collect()
    )
    assert got == want
    # removed docs never survive in the labels
    assert not ({d for d, _ in got} & rm_set)


@given(
    data=hst.data(),
    edges=hst.lists(
        hst.tuples(hst.integers(0, 15), hst.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
)
@_SETTINGS
def test_relabel_after_addition_matches_rebuild_on_arbitrary_graphs(
    spark, data, edges
):
    """Incremental CC relabel under edge ADDITION == from-scratch
    dedup_clusters over the union, for ARBITRARY pair graphs split
    arbitrarily into an existing set and a new batch (hypothesis picks
    both) — merges across components, brand-new components, edges
    inside an existing component (condensed self-loops), and an empty
    existing graph all fall out of the same equality; re-applying the
    batch over the merged labels is a no-op (replay idempotence)."""
    pairs_rows = sorted({(min(a, b), max(a, b)) for a, b in edges})
    new_set = data.draw(
        hst.sets(
            hst.sampled_from(pairs_rows), min_size=1, max_size=len(pairs_rows)
        ),
        label="new_batch",
    )
    old_rows = [p for p in pairs_rows if p not in new_set]
    new_rows = sorted(new_set)

    old = spark.createDataFrame(old_rows or [(-1, -2)], "doc_a long, doc_b long")
    if not old_rows:
        old = old.where("doc_a > 0")  # genuinely empty existing graph
    new = spark.createDataFrame(new_rows, "doc_a long, doc_b long")
    clusters = dedup.dedup_clusters(old)
    got_df = dedup.relabel_after_addition(clusters, new)
    got = sorted(tuple(r) for r in got_df.collect())
    want = sorted(
        tuple(r)
        for r in dedup.dedup_clusters(
            spark.createDataFrame(pairs_rows, "doc_a long, doc_b long")
        ).collect()
    )
    assert got == want
    # replay: re-applying the same batch over the merged labels moves
    # nothing (every edge condenses to a self-loop)
    merged = spark.createDataFrame(got or [(-1, -2)], "doc_id long, cluster_id long")
    if not got:
        merged = merged.where("doc_id > 0")
    replay = sorted(
        tuple(r) for r in dedup.relabel_after_addition(merged, new).collect()
    )
    assert replay == want


@given(
    data=hst.data(),
    rows=hst.lists(
        hst.lists(hst.integers(-2, 2), min_size=4, max_size=4),
        min_size=4,
        max_size=14,
    ),
)
@_SETTINGS
def test_graph_churn_maintenance_matches_rebuild_on_arbitrary_vectors(
    spark, data, rows
):
    """knn_graph_retract / knn_graph_ingest == from-scratch exact
    builds for ARBITRARY small-int vector sets (ties everywhere:
    duplicate and colinear vectors force equal cosines, exercising the
    (cosine desc, cid) total order) and ARBITRARY removal/insertion
    splits chosen by hypothesis. Zero vectors are excluded (cosine
    undefined — the family drops them by contract)."""
    from yuki_spark.operators import similarity

    vecs = [v for v in rows if any(x != 0 for x in v)]
    if len(vecs) < 3:
        return
    n = len(vecs)
    k = 2
    full_rows = [
        (i, [float(x) for x in v] + [0.0] * 60, 0) for i, v in enumerate(vecs)
    ]
    full = spark.createDataFrame(
        full_rows, "vec_id long, embedding array<float>, label int"
    )

    def exact(frame):
        return similarity.cosine_topk(frame, k=k, n_queries=10**9)

    # RETRACT: arbitrary removal set (never everything)
    rm_set = data.draw(
        hst.sets(hst.sampled_from(range(n)), min_size=1, max_size=n - 1),
        label="removed",
    )
    ids = spark.createDataFrame([(int(i),) for i in sorted(rm_set)], "vec_id long")
    surv = full.join(ids, "vec_id", "left_anti")
    got_r = sorted(
        tuple(r)
        for r in similarity.knn_graph_retract(surv, exact(full), ids, k=k).collect()
    )
    assert got_r == sorted(tuple(r) for r in exact(surv).collect())

    # INGEST: arbitrary batch split (at least one old, one new)
    batch_set = data.draw(
        hst.sets(hst.sampled_from(range(n)), min_size=1, max_size=n - 1),
        label="batch",
    )
    old = full.join(
        spark.createDataFrame(
            [(int(i),) for i in sorted(batch_set)], "vec_id long"
        ),
        "vec_id",
        "left_anti",
    )
    batch = full.join(
        spark.createDataFrame(
            [(int(i),) for i in sorted(batch_set)], "vec_id long"
        ),
        "vec_id",
        "left_semi",
    )
    got_i = sorted(
        tuple(r)
        for r in similarity.knn_graph_ingest(
            exact(old), batch, k=k, members=full
        ).collect()
    )
    assert got_i == sorted(tuple(r) for r in exact(full).collect())
