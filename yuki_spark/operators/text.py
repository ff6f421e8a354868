"""Text-analysis operators for the documents table.

All hot-path logic is built-in-function column algebra (JVM-side,
whole-stage codegen) — no Python UDFs. Each operator has a
deterministic DuckDB-SQL twin for the correctness gate.

Determinism: counts and integer sums are exact; doubles are derived
from exact integers by identical IEEE operations in both engines.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import DEC, tokens

# Tiny per-language stopword lists (n-gram-heuristic style language ID;
# deterministic and SQL-expressible — see SURVEY.md §2.3).
STOPWORDS = {
    "en": ("the", "a", "and", "of"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "y", "las"),
}
_LANG_ORDER = ("en", "fr", "de", "es")  # deterministic argmax tiebreak

PUNCT_RE = r"[^a-zA-Z0-9\s]"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("toks", tokens(text_col)).withColumn(
        "n_tokens", F.size("toks").cast("bigint")
    )


def _hits(lang: str) -> Column:
    words = list(STOPWORDS[lang])
    return F.size(F.filter(F.col("toks"), lambda t: t.isin(*words))).cast("bigint")


def lang_scores(df: DataFrame) -> DataFrame:
    """Stopword-hit counts per language + deterministic argmax."""
    out = with_tokens(df)
    for lang in _LANG_ORDER:
        out = out.withColumn(f"hits_{lang}", _hits(lang))
    best = F.greatest(*[F.col(f"hits_{l}") for l in _LANG_ORDER])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_ORDER:  # first language reaching the max wins
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def quality_features(df: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    composite [0,1] score (all double math on exact integer inputs)."""
    out = with_tokens(df)
    n_chars = F.length("text").cast("bigint")
    n_punct = (n_chars - F.length(F.regexp_replace("text", PUNCT_RE, ""))).cast("bigint")
    sw = _hits("en")
    nt = F.col("n_tokens").cast("double")
    score = (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"))
        + F.lit(0.3) * F.least(sw.cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double") * F.lit(5.0), F.lit(1.0))
    )
    return (
        out.withColumn("n_chars_txt", n_chars)
        .withColumn("n_punct", n_punct)
        .withColumn("sw_hits", sw)
        .withColumn("quality", score)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-text md5 document fingerprint (exact dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fp", F.md5(norm))


# GPT-2-style pretokenizer shape: leading-space word chunks, number
# runs, punctuation runs — the regex pass a BPE tokenizer applies
# before merges, so counts approximate BPE token counts well.
BPE_ISH_RE = r"( ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s)"


def subword_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish subword token counting (JVM regexp_extract_all — no
    Python): pretokenizer chunks stand in for real BPE merges, giving
    the length signal an LLM-data pipeline budgets by."""
    pieces = F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_RE}', 1)")
    return df.withColumn("subword_toks", pieces).withColumn(
        "n_subwords",
        F.size(F.filter(F.col("subword_toks"), lambda t: F.trim(t) != "")).cast("bigint"),
    )


def winnow_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): hash every
    k-gram of tokens, slide a window of ``w`` hashes, keep each
    window's minimum — a robust near-dup/plagiarism signature that
    survives local edits.

    All JVM-side column algebra: the "rolling hash" is md5 of the
    joined k-gram (identical hex in DuckDB), minima are string minima.
    Emits the distinct sorted fingerprint set + a compact digest.

    Formulated as window functions over posexploded tokens (gram =
    md5 of tok + k-1 leads; window minimum over the next w grams):
    one shuffle on doc_id, O(tokens) work per doc. The tempting
    nested-``transform`` array formulation re-evaluates the captured
    gram array per lambda element — O(tokens²) per doc — because
    Catalyst doesn't hoist expressions out of higher-order lambdas."""
    from pyspark.sql.window import Window

    t = df.select("doc_id", F.posexplode(tokens(text_col)).alias("pos", "tok"))
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    gram_parts = ["tok"] + [F.lead("tok", i).over(w_ord) for i in range(1, k)]
    g = (
        t.withColumn("n", F.count("pos").over(Window.partitionBy("doc_id")))
        .withColumn("gram", F.md5(F.concat_ws(" ", *gram_parts)))
        .where(F.col("pos") <= F.col("n") - k)  # valid grams only
    )
    h = (
        g.withColumn("wmin", F.min("gram").over(w_ord.rowsBetween(0, w - 1)))
        .where(F.col("pos") <= F.col("n") - k - w + 1)  # full windows only
    )
    fps = h.groupBy("doc_id").agg(F.array_sort(F.collect_set("wmin")).alias("fp"))
    # docs shorter than k+w-1 tokens have no full window → empty set
    return (
        df.select("doc_id")
        .join(fps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.size("fp"), F.lit(0)).cast("bigint").alias("n_fp"),
            F.md5(F.coalesce(F.array_join("fp", ","), F.lit(""))).alias("fp_digest"),
        )
    )


def _zip_ngrams(toks_col: str, n: int) -> Column:
    """Build the array of token ``n``-grams from an array column.

    Uses ``zip_with`` over shifted slices — the arrays sit in
    *argument* position, so Catalyst evaluates each slice once per row
    (capturing an array inside a lambda body would re-evaluate it per
    element: O(tokens²); see winnow_fingerprint's note)."""
    ln = f"greatest(size({toks_col}) - {n - 1}, 0)"
    expr = f"slice({toks_col}, 1, {ln})"
    for i in range(2, n + 1):
        expr = (
            f"zip_with({expr}, slice({toks_col}, {i}, {ln}), "
            f"(a, b) -> concat(a, ' ', b))"
        )
    return F.expr(expr)


def repetition_features(df: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et
    al. 2021 §A1.1, adapted to token bigrams — the synthetic docs have
    no line structure): duplicate-bigram count and most-frequent-bigram
    share, computed distributively (explode → two hash aggregations;
    no per-doc n² array work, no Python).

    Returns one row per doc with >=1 bigram: ``n_bigrams``,
    ``n_distinct``, ``max_ct`` (all exact BIGINT) and ``top_frac``
    (double from one exact int division — engine-portable)."""
    bg = with_tokens(df).select(
        "doc_id",
        "source",
        F.explode(_zip_ngrams("toks", 2)).alias("bigram"),
    )
    per_bigram = bg.groupBy("doc_id", "source", "bigram").agg(
        F.count(F.lit(1)).alias("ct")
    )
    return (
        per_bigram.groupBy("doc_id", "source")
        .agg(
            F.sum("ct").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("ct").alias("max_ct"),
        )
        .withColumn(
            "top_frac",
            F.col("max_ct").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def split_ngrams(
    df: DataFrame, n: int = 3, eval_mod: int = 17
) -> tuple[DataFrame, DataFrame]:
    """Shared front end of the contamination scans: docs with
    ``doc_id % eval_mod == 0`` form a held-out eval split. Returns
    ``(corpus_grams, eval_grams)`` — per-doc *distinct* token
    ``n``-grams of the training docs, and the deduplicated gram set of
    the eval split (orders smaller than the corpus: the broadcastable
    side)."""
    g = with_tokens(df).select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(_zip_ngrams("toks", n))).alias("gram"),
    )
    bench = g.where(F.col("doc_id") % eval_mod == 0).select("gram").distinct()
    corpus = g.where(F.col("doc_id") % eval_mod != 0)
    return corpus, bench


def ngram_contamination(
    df: DataFrame, n: int = 3, eval_mod: int = 17
) -> DataFrame:
    """Benchmark-contamination scan: for every training doc, the
    fraction of its distinct token ``n``-grams appearing in the eval
    split's n-gram set (the standard pretraining decontamination
    check, cf. GPT-3 appendix C).

    Scale path: the eval n-gram set is deduplicated and *broadcast*
    into the membership join; the corpus side stays a linear explode
    + one hash aggregation per doc."""
    corpus, bench_set = split_ngrams(df, n=n, eval_mod=eval_mod)
    bench = bench_set.withColumn("hit", F.lit(1).cast("bigint"))
    per_doc = (
        corpus.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    return per_doc.withColumn(
        "contamination",
        F.col("n_hits").cast("double") / F.col("n_grams").cast("double"),
    )


# PII patterns: RE2/Java-compatible subset (no backreferences) so the
# same pattern runs JVM-side here and in any SQL twin.
# Ordered most-specific first: each category is matched against the
# text with earlier categories already redacted, so counts are
# disjoint (an SSN is not also a phone; an IP is not a phone).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]"),
)


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count PII-looking spans per document and emit a redacted text
    (each match replaced by ``<CATEGORY>``), entirely with JVM
    regexps (RE2-compatible subset, no backreferences) — the scrub
    step every pretraining pipeline runs before tokenization.

    The synthetic corpus contains no digits/@-signs, so this operator
    is exercised by unit tests on hand-built rows rather than an
    oracle query; the counts/redaction are deterministic either way."""
    out = df.withColumn("redacted", F.col(text_col))
    for name, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(
                F.regexp_extract_all("redacted", F.lit(pat), F.lit(0))
            ).cast("bigint"),
        ).withColumn("redacted", F.regexp_replace("redacted", pat, f"<{name.upper()}>"))
    return out.withColumn(
        "n_pii", sum(F.col(f"n_{n}") for n, _ in PII_PATTERNS).cast("bigint")
    )


# ---- SQL twins (DuckDB) -------------------------------------------------

SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def sql_hits(lang: str, toks: str = "toks") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"CAST(len(list_filter({toks}, t -> t IN ({words}))) AS BIGINT)"


SQL_PRED_LANG = (
    "CASE WHEN greatest(hits_en, hits_fr, hits_de, hits_es) <= 0 THEN 'und' "
    + " ".join(
        f"WHEN hits_{l} = greatest(hits_en, hits_fr, hits_de, hits_es) THEN '{l}'"
        for l in _LANG_ORDER
    )
    + " END"
)
