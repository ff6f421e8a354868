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
