"""Byte-pair-encoding tokenization at VOCABULARY grain.

Real BPE application (Sennrich et al. 2016; the GPT-2 ``bpe()`` loop):
repeatedly merge every left-to-right non-overlapping occurrence of the
best-ranked adjacent token pair until no ranked pair remains. The
merges table is a FIXED artifact — exactly like a production
tokenizer, which is trained once offline and shipped as data — so
every engine (Spark, DuckDB, pure Python) applies the same ranks and
produces bit-identical tokenizations.

Scale design: BPE is a pure function of the word, so it runs over the
DISTINCT vocabulary (``vocab_bpe``), never the corpus — the corpus
pass is one explode + hash-agg to word counts, the tokenizer cost is
O(|vocab|) in an Arrow batch, and the result broadcast-joins back.
That is the production shape for token-budget accounting at 100 TB:
the vocabulary is millions of rows where the corpus is trillions.

Representation (shared by the Python loop and the DuckDB recursive
CTE): the token list is a string of individually-wrapped tokens,
``(t1)(t2)...``. The pair pattern ``(a)(b)`` carries both token
boundaries and adjacent occurrences share NO characters, so one
leftmost non-overlapping ``replace`` call IS one GPT-2 merge pass —
including runs like ``bbbbb`` + merge (b,b) → [bb, bb, b], where a
pipe-delimited ``|a|b|`` pattern would skip the middle occurrence
(adjacent matches share the boundary pipe; caught by the property
test against the list-based reference). Merging (a,b) can never
create a new (a,b) occurrence (the merged token ab equals neither a
nor b), so the pass needs no fixpoint, and the outer loop just
re-picks the min-rank pair still present. Tokens are [a-z]+ runs, so
the paren delimiters are collision-free.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Rank-ordered merges (rank = 1-based position). A miniature
# English-ish table with multi-level chains (t+a → ta+b → tab+le →
# table) so rank priority, chained merges, and whole-word merges are
# all exercised on the test corpus. Lowercase a–z only — words are
# extracted as [a-z]+ runs.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("a", "t"),
    ("e", "r"),
    ("a", "n"),
    ("o", "w"),
    ("a", "s"),
    ("l", "e"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "le"),
    ("i", "n"),
    ("e", "y"),
    ("s", "t"),
    ("a", "l"),
    ("g", "r"),
    ("b", "i"),
    ("u", "e"),
    ("al", "ue"),
    ("v", "alue"),
    ("q", "u"),
    ("o", "r"),
    ("w", "in"),
    ("d", "at"),
    ("dat", "a"),
    ("s", "c"),
    ("sc", "an"),
    ("m", "er"),
    ("mer", "g"),
    ("merg", "e"),
    ("p", "ar"),
    ("a", "r"),
)

WORD_RE = "[a-z]+"  # the word extraction both engines apply to lower(text)


def bpe_tokenize(word: str, merges: tuple[tuple[str, str], ...] = MERGES) -> list[str]:
    """Tokenize one word (the canonical implementation — the Spark UDF
    applies it per distinct word, the DuckDB twin replicates the exact
    replace sequence, and tests pin it against an independent
    list-based GPT-2 reference on adversarial inputs)."""
    s = "".join(f"({c})" for c in word)
    while True:
        pick = None
        for a, b in merges:  # first hit in rank order == min rank
            if f"({a})({b})" in s:
                pick = (a, b)
                break
        if pick is None:
            break
        a, b = pick
        s = s.replace(f"({a})({b})", f"({a}{b})")
    return s[1:-1].split(")(") if s else []


def vocab_bpe(vocab: DataFrame, word_col: str = "word") -> DataFrame:
    """Append ``tok_str`` (space-joined BPE tokens — words are [a-z]+
    so the space is boundary-safe) and ``n_tok`` to a DISTINCT-word
    frame. One Arrow batch pass over the vocabulary; cache/broadcast
    the result and join it back to corpus word counts."""

    @pandas_udf(StringType())
    def bpe_str(words: pd.Series) -> pd.Series:
        return words.map(lambda w: " ".join(bpe_tokenize(w)))

    return vocab.withColumn("tok_str", bpe_str(F.col(word_col))).withColumn(
        "n_tok", F.size(F.split("tok_str", " ")).cast("bigint")
    )


def sql_merges_values() -> str:
    """The merges table as a DuckDB VALUES list: (rank, a, b)."""
    return ", ".join(
        f"({r + 1}, '{a}', '{b}')" for r, (a, b) in enumerate(MERGES)
    )


def sql_bpe_ctes(vocab_rel: str = "vocab") -> str:
    """DuckDB recursive-CTE twin of :func:`bpe_tokenize` over a
    relation of distinct ``word`` rows: seeds each word as the
    paren-wrapped char string; one recursive step = one replace-all of
    the min-rank pair present (== one GPT-2 merge pass, see module
    docstring), terminating (the row drops out of the join) when no
    ranked pair remains. ``bpe_done`` holds each word's terminal state
    exactly once — every step strictly shrinks the string, and only
    the terminal string has no ranked pair left. Depth ≤ len(word) − 1
    steps per word.

    Emit AFTER a ``merges(rank, a, b)`` CTE (see
    :func:`sql_merges_values`); the fragment defines ``seeds``,
    ``bpe`` and ``bpe_done(word, tok_str, n_tok)``."""
    return f"""
        seeds AS (
          SELECT word,
                 '(' || array_to_string(regexp_extract_all(word, '.'), ')(') || ')' AS s
          FROM {vocab_rel}),
        bpe(word, s) AS (
          SELECT word, s FROM seeds
          UNION ALL
          SELECT st.word,
                 replace(st.s, '(' || mm.a || ')(' || mm.b || ')',
                         '(' || mm.a || mm.b || ')')
          FROM (
            SELECT word, s,
                   (SELECT MIN(m.rank) FROM merges m
                    WHERE strpos(s, '(' || m.a || ')(' || m.b || ')') > 0)
                     AS rk
            FROM bpe) st
          JOIN merges mm ON mm.rank = st.rk),
        bpe_done AS (
          SELECT word,
                 replace(substr(s, 2, len(s) - 2), ')(', ' ') AS tok_str,
                 CAST(len(string_split(substr(s, 2, len(s) - 2), ')(')) AS BIGINT)
                   AS n_tok
          FROM bpe b
          WHERE NOT EXISTS (SELECT 1 FROM merges m
                            WHERE strpos(b.s, '(' || m.a || ')(' || m.b || ')') > 0))
    """


def bpe_train_merges(vocab: DataFrame, n_merges: int = 8) -> DataFrame:
    """LEARN a BPE merges table from a (word, freq) vocabulary — the
    tokenizer-TRAINING step (Sennrich et al. 2016 §3.2) that produces
    the artifact :func:`bpe_tokenize` applies. Each iteration counts
    every adjacent symbol pair over the current segmentation (each
    occurrence weighted by the word's corpus frequency — overlapping
    occurrences all count, the reference algorithm's multiset), picks
    the most frequent pair (ties broken by the pair string ascending —
    deterministic in any engine), and merges its leftmost
    non-overlapping occurrences in every word (one ``replace`` pass on
    the paren-wrapped representation IS one merge pass — the module
    docstring's argument; merging (a,b) never creates a new (a,b)).

    Returns one row per iteration: ``(iteration, sym_a, sym_b,
    merged, pair_count, tokens_after)`` where ``tokens_after`` is the
    corpus token count under the segmentation after that merge
    (Σ freq · symbols — the quantity tokenizer training curves
    plot). If the vocabulary exhausts its pairs before ``n_merges``
    (every word a single symbol), the remaining iterations emit no
    rows, and the remaining merge passes are NO-OPS on the state
    (left join + coalesce, never an empty cross join that would
    annihilate it) — the DuckDB twin mirrors both halves.

    Scale shape: training runs at (typically frequency-capped)
    VOCABULARY grain, never the corpus — per iteration one bounded
    explode + hash-agg + single-row top-1 broadcast + one linear
    replace pass; each state is lineage-truncated (localCheckpoint)
    so N iterations cost N bounded jobs, not an exponential replay.
    The corpus pass that builds (word, freq) is the caller's one
    explode + agg (d44's shape)."""
    out, _tops = bpe_train_merge_frames(vocab, n_merges)
    return out


def _merge_pass(state: DataFrame, top1: DataFrame, keep: list) -> DataFrame:
    """One leftmost-non-overlapping merge pass of a single-row
    (sym_a, sym_b) frame over paren-string state. A LEFT join on TRUE
    (same broadcast-nested-loop physical shape as a cross join against
    a one-row build side) rather than ``crossJoin``, so an EMPTY merge
    frame — training exhausted its pair supply before ``n_merges`` —
    applies as a NO-OP instead of silently annihilating the entire
    state frame (r13 advice: the empty-frame total-data-loss mode)."""
    return state.join(
        F.broadcast(top1.select("sym_a", "sym_b")), F.lit(True), "left"
    ).select(
        *keep,
        F.coalesce(
            F.replace(
                F.col("s"),
                F.concat(
                    F.lit("("),
                    F.col("sym_a"),
                    F.lit(")("),
                    F.col("sym_b"),
                    F.lit(")"),
                ),
                F.concat(
                    F.lit("("), F.col("sym_a"), F.col("sym_b"), F.lit(")")
                ),
            ),
            F.col("s"),
        ).alias("s"),
    )


def bpe_train_merge_frames(vocab: DataFrame, n_merges: int = 8):
    """:func:`bpe_train_merges`'s core, additionally returning the
    per-iteration single-row (sym_a, sym_b, pair_count) frames so a
    caller can APPLY the learned artifact without collecting it to
    the driver (:func:`bpe_apply_merge_frames` / d58). Returns
    ``(report_df, [top1_frame, ...])``."""
    from . import text

    if n_merges < 1:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    state = vocab.select(
        F.regexp_replace("word", "(.)", "($1)").alias("s"),
        F.col("freq").cast("bigint").alias("freq"),
    ).localCheckpoint(eager=False)
    out: DataFrame | None = None
    tops: list[DataFrame] = []
    for it in range(1, n_merges + 1):
        syms = state.withColumn(
            "syms",
            F.split(F.expr("substring(s, 2, length(s) - 2)"), "\\)\\("),
        )
        pc = (
            syms.select("freq", F.explode(text._zip_ngrams("syms", 2)).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("c"))
        )
        top1 = (
            pc.orderBy(F.desc("c"), F.asc("p"))
            .limit(1)
            .select(
                F.substring_index("p", " ", 1).alias("sym_a"),
                F.substring_index("p", " ", -1).alias("sym_b"),
                F.col("c").alias("pair_count"),
            )
            .localCheckpoint(eager=True)  # single row, feeds state + report
        )
        state = _merge_pass(state, top1, ["freq"]).localCheckpoint(
            eager=False
        )
        ta = state.agg(
            F.sum(
                F.col("freq")
                * (
                    F.length("s")
                    - F.length(F.replace(F.col("s"), F.lit("("), F.lit("")))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("tokens_after")
        )
        row = (
            top1.select(
                F.lit(it).cast("bigint").alias("iteration"),
                "sym_a",
                "sym_b",
                F.concat("sym_a", "sym_b").alias("merged"),
                F.col("pair_count").cast("bigint").alias("pair_count"),
            )
            .crossJoin(F.broadcast(ta))
        )
        out = row if out is None else out.unionByName(row)
        tops.append(top1)
    return out.orderBy("iteration"), tops


def bpe_apply_merge_frames(words: DataFrame, tops) -> DataFrame:
    """Tokenize a DISTINCT-word frame with a LEARNED merges artifact
    (the per-iteration single-row frames from
    :func:`bpe_train_merge_frames`) WITHOUT collecting it to the
    driver: the merges apply in rank order, one leftmost
    non-overlapping ``replace`` pass each — exact, because a rank-k
    pair's symbols exist before iteration k, so no later merge can
    create a new rank-k occurrence (the single-pass-per-rank ==
    exhaustive-min-rank-loop argument; holds for UNSEEN words too).
    Returns ``(word, n_tok)`` — the learned segmentation's token
    count, with n_tok counted as the '(' population of the terminal
    paren string.

    Scale shape: |merges| single-row broadcasts + linear replace
    passes at vocabulary grain, each state lineage-truncated — the
    same bounded loop as training, minus the pair counting. An EMPTY
    merge frame (exhausted training) is a NO-OP pass, not an
    annihilating cross join — see :func:`_merge_pass`."""
    state = words.select(
        "word", F.regexp_replace("word", "(.)", "($1)").alias("s")
    ).localCheckpoint(eager=False)
    for top1 in tops:
        state = _merge_pass(state, top1, ["word"]).localCheckpoint(
            eager=False
        )
    return state.select(
        "word",
        (
            F.length("s")
            - F.length(F.replace(F.col("s"), F.lit("("), F.lit("")))
        )
        .cast("bigint")
        .alias("n_tok"),
    )
