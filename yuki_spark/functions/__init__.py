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
