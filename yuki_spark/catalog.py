"""Catalog: named access to the test-data tables under an sf_dir.

Mirrors the reference's notion of versioned input storage
(`Yuki/kernel/impression_storage.py`): inputs are immutable parquet
artifacts addressed by name. Here a catalog root (``sf_dir``) maps
table name -> parquet path, registered as temp views so both the
DataFrame API and ``spark.sql`` can reach them.
"""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Declarative scan: Catalyst prunes columns and
    pushes filters into the parquet reader downstream."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which a default
        # session refuses to read — the engine must work with ANY
        # caller-provided SparkSession, so set the (runtime-settable)
        # escape hatch here, not only in our session factory
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong=true surfaces the TIMESTAMP(NANOS) column as raw
        # nanos; truncate to µs exactly like DuckDB does on read.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view named after itself."""
    out = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
