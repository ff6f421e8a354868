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
from pyspark.sql import SparkSession

from .catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


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
    float_tol: float = 0.0,
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sc = _canon(s_cols, s_rows)
    oc = _canon(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a == b:
            continue
        if float_tol > 0 and len(a) == len(b):
            ok = all(
                (x == y)
                or (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and abs(x - y) <= float_tol * max(1.0, abs(y))
                )
                for x, y in zip(a, b)
            )
            if ok:
                continue
        problems.append(f"row {i} differs:\n  spark : {a}\n  oracle: {b}")
        if len(problems) >= 5:
            break
    return problems
