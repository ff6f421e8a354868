"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle must match the DuckDB result exactly (row count,
columns, order-insensitive values)."""
from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from yuki_spark.compare import compare
from tests.conftest import SF_CORRECT

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for k, v in QUERIES.items():
        assert callable(v), k


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    problems = compare(spark, QUERIES[name], ORACLES[name], SF_CORRECT)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
