"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB twins for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yuki_spark.queries import docs, events, sim, tpch


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Insertion order is gate order: the LLM-data-pipeline families (docs,
    # sim) lead so they are validated first if the driver caps its sweep;
    # the relational families follow.
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(docs.QUERIES)
    out.update(sim.QUERIES)
    out.update(events.QUERIES)
    out.update(tpch.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(docs.ORACLE)
    out.update(sim.ORACLE)
    out.update(events.ORACLE)
    out.update(tpch.ORACLE)
    return out
