"""Data profiling: per-column quality stats for any table — the
integration-engine feature that guards ingested data before a
pipeline consumes it (null rates, cardinalities, ranges).

One job, not one per column: all per-column aggregates compute in a
single pass over the table (one partial-agg stage, no shuffle of the
data itself), then unpivot to long form driver-free via stack().
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def profile(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr). ``approx_distinct`` switches exact
    countDistinct (a shuffle per column) to HLL sketches (the 100 TB
    path — one pass, mergeable)."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        base = F.col(c)
        # complex types: profile on their string form
        t = dict(df.dtypes)[c]
        simple = t.split("(")[0] in _NUMERIC | {"string", "boolean", "date", "timestamp", "timestamp_ntz"}
        v = base if simple else base.cast("string")
        aggs.append(F.count(v).alias(f"__cnt_{c}"))
        nd = (
            F.approx_count_distinct(v) if approx_distinct else F.countDistinct(v)
        )
        aggs.append(nd.alias(f"__nd_{c}"))
        aggs.append(F.min(v).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(v).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __cnt_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return (
        wide.select(
            "__n",
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS "
                "(column, n_non_null, n_distinct, min_repr, max_repr)"
            ),
        )
        .select(
            "column",
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col("n_non_null")).alias("n_nulls"),
            "n_distinct",
            "min_repr",
            "max_repr",
        )
        .orderBy("column")
    )


def constraint_report(
    df: DataFrame,
    row_checks: list[tuple[str, "F.Column"]],
    unique_checks: tuple[tuple[str, list[str]], ...] | list = (),
) -> DataFrame:
    """Declarative data-quality gate (the deequ-style companion to
    :func:`profile`): evaluate named constraints over a table in ONE
    aggregation pass and report violations per constraint.

    ``row_checks``: (name, violation predicate Column) — the predicate
    is True on a ROW THAT VIOLATES (write it null-safe: a null that
    should fail the check must coalesce to True). ``unique_checks``:
    (name, key columns) — violations = n_rows − countDistinct(keys);
    rows with a null key count as violations (countDistinct drops
    them), which is the right default for a key constraint.

    Scale shape: exactly like profile() — every constraint folds into
    one partial-agg stage over a single scan (unique adds a distinct
    per key set), then a stack() unpivot of the one-row wide result.
    No per-constraint jobs, no driver loop.

    Constraint names must be identifiers ([A-Za-z_][A-Za-z0-9_]*):
    they are spliced into the generated stack() expression, where an
    arbitrary string could parse as SQL (e.g. names 'a' and 'a-0'
    would make the term __v_a-0 resolve as __v_a MINUS 0 — check
    'a-0' silently reporting check 'a''s count). Rejecting
    non-identifiers up front turns that silent mis-bind into a clear
    error."""
    import re

    if not row_checks and not unique_checks:
        raise ValueError("constraint_report needs at least one check")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for name, viol in row_checks:
        names.append(name)
        aggs.append(
            F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"__v_{name}")
        )
    for name, cols in unique_checks:
        names.append(name)
        aggs.append(F.countDistinct(*[F.col(c) for c in cols]).alias(f"__d_{name}"))
    seen = set()
    for n in names:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n):
            raise ValueError(
                f"constraint name {n!r} is not an identifier "
                "([A-Za-z_][A-Za-z0-9_]*)"
            )
        if n in seen:
            raise ValueError(f"duplicate constraint name {n!r}")
        seen.add(n)
    wide = df.agg(*aggs)
    terms = [f"'{name}', __v_{name}" for name, _ in row_checks]
    terms += [f"'{name}', __n - __d_{name}" for name, _ in unique_checks]
    return (
        wide.select(
            "__n",
            F.expr(
                f"stack({len(terms)}, {', '.join(terms)}) AS "
                "(check_name, n_violations)"
            ),
        )
        .select(
            "check_name",
            F.col("__n").alias("n_rows"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.col("n_violations") == 0).alias("ok"),
        )
        .orderBy("check_name")
    )
