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


# Insertion order is gate order (the driver caps its sweep at 50 rows).
# Round-3 rotation: the three queries whose last driver row is a stale
# r1 FAIL (fixed in ee50a9d, local-pass since) lead, followed by
# queries new this round, then the relational family (no r2 row — r2's
# window covered the LLM families), then events/docs/sim (all r2-green).
_PRIORITY = [
    "q12_priority_shipping",
    "setops_customer_activity",
    "union_dedup_keys",
    "s7_semdedup",
    "e17_session_window_stats",
    "q23_skyline_parts",
    "d24_weighted_sample",
    "d25_domain_mix",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(tpch.QUERIES)
    merged.update(events.QUERIES)
    merged.update(docs.QUERIES)
    merged.update(sim.QUERIES)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(docs.ORACLE)
    out.update(sim.ORACLE)
    out.update(events.ORACLE)
    out.update(tpch.ORACLE)
    return out
