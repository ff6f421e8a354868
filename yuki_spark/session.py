"""SparkSession factory tuned for the yuki_spark engine.

Local testing runs on ``local[N]``; the same configuration is what we
would ship to a 1000-executor cluster: AQE on (with skew-join
handling), Arrow enabled for the few Pandas-UDF operators, and a
shuffle-partition count that AQE coalesces at runtime.

Relied-upon Spark 4.x defaults (verified on): runtime bloom-filter
join pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`) —
semi-join reduction of fact scans behind selective dim filters — and
dynamic partition pruning for partitioned layouts written by
io.sinks.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "yuki_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Respects ``SPARK_GRAFT_CPUS`` for local parallelism so bench and
    tests share one entry point.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); read as long, converted
        # to a microsecond timestamp in catalog.load (matches DuckDB's µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
