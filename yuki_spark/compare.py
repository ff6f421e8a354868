"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its DuckDB oracle on the same sf_dir, compares
row count, column names, and order-insensitive values. Used by
tests/test_oracle_parity.py so we catch mismatches before the driver
does.
"""
from __future__ import annotations

import math
from typing import Any

import duckdb
import pyarrow as pa
from pyspark.sql import SparkSession

from .catalog import TABLES, table_path


def run_oracle(
    sql: str, sf_dir: str
) -> tuple[list[str], list[tuple], pa.Schema]:
    con = duckdb.connect()
    # gate corpora are tiny; 32 threads buy nothing and multiply
    # per-thread expression state 32× (the wide portable-log2 alias
    # chains allocate per-thread executor state — at the default
    # thread count, beside a live Spark JVM, that intermittently
    # trips the kernel's commit heuristic as a bad_alloc)
    con.execute("SET threads=4")
    con.execute("SET memory_limit='8GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    arrow = con.execute(sql).arrow()
    cols = arrow.schema.names
    # derive rows from the Arrow table already fetched — the recursive-
    # CTE / ANN twins are expensive, don't execute them a second time
    rows = [tuple(d[c] for c in cols) for d in arrow.to_pylist()]
    con.close()
    return list(cols), rows, arrow.schema


def _norm_type(t: pa.DataType) -> pa.DataType:
    """Normalize an Arrow type for cross-engine comparison.

    Keeps the distinctions that make the driver's value hash dtype-sensitive
    (int64 vs decimal128, float32 vs float64) while dropping the ones the
    driver tolerates: timestamp timezone (Spark stamps tz=UTC, DuckDB does
    not) and string width (large_string vs string).
    """
    if pa.types.is_timestamp(t):
        return pa.timestamp(t.unit)
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _norm_type(f.type)) for f in t])
    return t


def _spark_arrow_schema(sdf) -> pa.Schema:
    """Arrow schema a Spark DataFrame would produce, without executing it."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(sdf.schema)


def arrow_schema_problems(spark_schema: pa.Schema, oracle_schema: pa.Schema) -> list[str]:
    """Dtype drift between engines that the driver's value hash would flag.

    Compares per-column Arrow types (sorted by column name, nullability
    ignored) after :func:`_norm_type` normalization.
    """
    problems = []
    s_fields = {f.name: _norm_type(f.type) for f in spark_schema}
    o_fields = {f.name: _norm_type(f.type) for f in oracle_schema}
    for name in sorted(set(s_fields) & set(o_fields)):
        if s_fields[name] != o_fields[name]:
            problems.append(
                f"arrow dtype differs for {name!r}: "
                f"spark={s_fields[name]} oracle={o_fields[name]}"
            )
    return problems


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(
    spark: SparkSession,
    query_fn,
    oracle_sql: str,
    sf_dir: str,
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    Strictly bit-exact by design (the driver's hash is too): a float
    tolerance would need order-insensitive row PAIRING to be sound,
    and every oracle is engineered for exactness instead.

    The DuckDB side runs on a worker thread WHILE Spark executes —
    the engines are independent processes, so the gate costs
    max(spark, oracle) instead of their sum (oracle duckdb stays
    pinned to 4 threads / 8 GB in run_oracle, so the overlap adds no
    memory-pressure risk beyond what a sequential run already has)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        oracle_fut = pool.submit(run_oracle, oracle_sql, sf_dir)
        sdf = query_fn(spark, sf_dir)
        s_schema = _spark_arrow_schema(sdf)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        o_cols, o_rows, o_schema = oracle_fut.result()

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    problems.extend(arrow_schema_problems(s_schema, o_schema))
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sc = _canon(s_cols, s_rows)
    oc = _canon(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a == b:
            continue
        problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
        if len(problems) >= 5:
            break
    return problems
