"""Column-function helpers shared by the query suite.

Determinism note: the driver hash-compares our Spark results against
DuckDB oracles. Floating-point *sums* are order-dependent, and Spark's
partial aggregation order differs from DuckDB's sequential scan. We
therefore aggregate through exact DECIMAL arithmetic: cast each row's
(double) measure to DECIMAL(18,6) — identical value in both engines —
sum exactly, and cast the exact result back to DOUBLE. Divisions are
then performed in double space on identical operands, giving
bit-identical results.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum of a double measure via decimal; result as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: decimal sum cast to double, / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty-safe, matching DuckDB's
    ``regexp_split_to_array(trim(x), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def portable_hash60(col: Column | str) -> Column:
    """60-bit string hash computable identically in DuckDB:
    Spark ``conv(substr(md5(x),1,15),16,10)`` ==
    DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT`` (verified
    bit-exact incl. empty/non-ASCII strings). JVM-side md5 — no
    Python; 60 bits keeps the value non-negative in a signed int64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_portable_hash60(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Portable (libm-free) base-2 logarithm of a positive integer column.
#
# ln/log are NOT IEEE-correctly-rounded, so Java's Math.log and
# DuckDB's libm can disagree by 1 ulp and break the driver's exact
# hash compare. This primitive computes log2 with ONLY correctly-
# rounded ops (+, -, ×, ÷, integer compares): exponent via exact
# integer comparisons, mantissa log via a truncated atanh series in
# Horner form (same literals, same association order in both
# engines → bit-identical 64-bit results). Domain: 1 ≤ b ≤ 2^53
# (b must be exactly double-representable); out of domain → NULL.
# Accuracy: true log2 to ~5e-12 (series truncation) — and, the
# property the oracles need, the SAME ~5e-12-off value everywhere.
#
# The expression is emitted as a CHAIN of intermediate columns
# (with_plog2 column steps / sql_plog2_ctes CTE steps) — one inlined
# expression would re-expand the Horner chain through the binder
# (measured: exponential blowup hangs both engines).
# ---------------------------------------------------------------------------

PLOG2_MAX_BITS = 53
_ATANH_COEFFS = [1.0 / k for k in range(17, 0, -2)]  # 1/17 … 1/1
_ATANH_LEAD = 1.0 / 19.0
_TWO_OVER_LN2 = 2.8853900817779268  # 2/ln2, one exact double literal


def with_plog2(df, col: Column | str, out: str, max_bits: int = PLOG2_MAX_BITS):
    """Append ``out`` = portable log2 of a positive BIGINT column
    (NULL outside [1, 2^max_bits]). Intermediates are prefixed
    ``__{out}_`` and dropped. ``max_bits`` trims the exponent
    compare/scale chains when the caller's domain is narrower (the
    result is IDENTICAL in-domain — the extra compares are all
    false — just cheaper); 53 is the exact-double ceiling.

    Each step is ONE ``F.expr`` string (r14 opt): composing the
    53-term exponent sum / 53-arm scale CASE from Column objects cost
    ~300 py4j round trips ≈ 1.3 s of pure driver time PER CALL
    (measured — d52 alone paid 5.4 s of its 6.4 s build here); the
    parsed SQL builds the identical expression trees (same literals,
    same association order, so the runtime math is bit-identical)."""
    if max_bits > PLOG2_MAX_BITS:
        raise ValueError(f"max_bits={max_bits} > {PLOG2_MAX_BITS} (double-exact ceiling)")
    c = F.col(col) if isinstance(col, str) else col
    p = f"__{out}_"
    work = df.select("*", c.cast("bigint").alias(f"{p}b"))
    b = f"`{p}b`"
    e_terms = " + ".join(
        f"CAST(({b} >= {1 << k}L) AS INT)" for k in range(1, max_bits + 1)
    )
    work = work.select("*", F.expr(e_terms).alias(f"{p}e"))
    e = f"`{p}e`"
    scale_arms = " ".join(
        [f"WHEN ({e} = 0) THEN 1.0D"]
        + [f"WHEN ({e} = {k}) THEN {2.0 ** -k!r}D" for k in range(1, max_bits + 1)]
    )
    work = work.select(
        "*",
        F.expr(f"CAST({b} AS DOUBLE) * (CASE {scale_arms} END)").alias(f"{p}m"),
    )
    m = f"`{p}m`"
    work = work.select(
        "*", F.expr(f"({m} - 1.0D) / ({m} + 1.0D)").alias(f"{p}z")
    )
    z = f"`{p}z`"
    work = work.select("*", F.expr(f"({z} * {z})").alias(f"{p}z2"))
    z2 = f"`{p}z2`"
    h = f"{_ATANH_LEAD!r}D"
    for cf in _ATANH_COEFFS:
        h = f"(({h} * {z2}) + {cf!r}D)"
    val = F.expr(
        f"CASE WHEN (({b} >= 1L) AND ({b} <= {1 << max_bits}L)) "
        f"THEN (CAST({e} AS DOUBLE) + (({z} * {h}) * {_TWO_OVER_LN2!r}D)) "
        f"END"
    )
    return work.select(*df.columns, val.alias(out))


def sql_plog2_ctes(
    name: str,
    src: str,
    b_expr: str,
    out: str,
    max_bits: int = PLOG2_MAX_BITS,
) -> str:
    """DuckDB twin of :func:`with_plog2` as a PER-STEP CTE chain —
    bit-identical math (same literals, same association order).

    Why this shape: DuckDB's binder expands lateral aliases (and
    plain inlined CTEs) by SUBSTITUTION, so the natural single-SELECT
    chain form costs ~7 s of pure planning time PER CHAIN regardless
    of row count, and at the 53-wide chain blows expression state to
    the vm.max_map_count ceiling beside a live Spark JVM (measured
    r3–r5; the r5 pytest suite burned ~90 s binding the d24/e22/d31/
    d32 twins). Here every step references COLUMNS of the previous
    MATERIALIZED CTE — zero substitution, ~20 ms to bind.

    Oracle twins should pass ``max_bits=33``: for in-domain values
    (< 2^33 — every gate corpus) a 33-bit chain produces the SAME
    double as Spark's 53-bit one (the extra exponent compares are all
    false); an out-of-domain value yields NULL oracle-side and a
    value on Spark's — a loud mismatch, never a silent wrong answer.

    Emits ``{name}__0 AS MATERIALIZED (…), …, {name} AS (…)``;
    splice into a WITH list and read ``{name}`` (source columns plus
    ``{out}``) downstream. ``src`` must be a relation name visible in
    the same WITH scope."""
    p = f"__{name}_"
    e_terms = " + ".join(
        f"CASE WHEN {p}b >= {1 << k} THEN 1 ELSE 0 END"
        for k in range(1, max_bits + 1)
    )
    scale_arms = " ".join(
        f"WHEN {k} THEN {2.0 ** -k!r}" for k in range(1, max_bits + 1)
    )
    steps = [
        f"{name}__0 AS MATERIALIZED (SELECT *, CAST({b_expr} AS BIGINT) AS {p}b FROM {src})",
        f"{name}__1 AS MATERIALIZED (SELECT *, ({e_terms}) AS {p}e FROM {name}__0)",
        f"{name}__2 AS MATERIALIZED (SELECT *, CAST({p}b AS DOUBLE) * "
        f"(CASE {p}e WHEN 0 THEN CAST(1 AS DOUBLE) {scale_arms} END) AS {p}m FROM {name}__1)",
        f"{name}__3 AS MATERIALIZED (SELECT *, ({p}m - CAST(1 AS DOUBLE)) / "
        f"({p}m + CAST(1 AS DOUBLE)) AS {p}z FROM {name}__2)",
        f"{name}__4 AS MATERIALIZED (SELECT *, {p}z * {p}z AS {p}z2 FROM {name}__3)",
        f"{name}__5 AS MATERIALIZED (SELECT *, CAST({_ATANH_LEAD!r} AS DOUBLE) AS {p}h0 FROM {name}__4)",
    ]
    intermediates = [f"{p}b", f"{p}e", f"{p}m", f"{p}z", f"{p}z2", f"{p}h0"]
    prev_cte, prev_h = f"{name}__5", f"{p}h0"
    for i, cf in enumerate(_ATANH_COEFFS):
        cur_cte, cur_h = f"{name}__{6 + i}", f"{p}h{i + 1}"
        steps.append(
            f"{cur_cte} AS MATERIALIZED (SELECT *, {prev_h} * {p}z2 + {cf!r} "
            f"AS {cur_h} FROM {prev_cte})"
        )
        intermediates.append(cur_h)
        prev_cte, prev_h = cur_cte, cur_h
    steps.append(
        f"{name} AS (SELECT * EXCLUDE ({', '.join(intermediates)}), "
        f"CASE WHEN {p}b >= 1 AND {p}b <= {1 << max_bits} "
        f"THEN CAST({p}e AS DOUBLE) + (({p}z * {prev_h}) * {_TWO_OVER_LN2!r}) "
        f"ELSE NULL END AS {out} FROM {prev_cte})"
    )
    return ",\n        ".join(steps)


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two double arrays (sequential order —
    matches DuckDB's list_sum fold for the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))
