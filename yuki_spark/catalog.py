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


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footers only (no Spark job) — the
    catalog-statistics estimate the adaptive LSH parameters consume
    (on a cluster this is the table-stats lookup). Handles a single
    file or a directory of part files."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Declarative scan: Catalyst prunes columns and
    pushes filters into the parquet reader downstream."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped as TIMESTAMP(NANOS) (which a
        # default session refuses to read) and as plain µs-without-tz
        # (which Spark 4 infers as TIMESTAMP_NTZ, breaking epoch
        # casts). The engine must behave identically under ANY
        # caller-provided SparkSession and either file flavor, so set
        # the (runtime-settable) escape hatches here, not only in our
        # session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(table_path(sf_dir, name))
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        # nanosAsLong=true surfaces the TIMESTAMP(NANOS) column as raw
        # nanos; truncate to µs exactly like DuckDB does on read.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif name == "events" and ts_type == "timestamp_ntz":
        # a session that pre-cached NTZ inference: reinterpret the
        # naive µs value as a *UTC* instant regardless of the caller
        # session's timezone
        df = df.withColumn("ts", ntz_as_utc_instant(F.col("ts")))
    return df


def ntz_as_utc_instant(col):
    """Reinterpret a TIMESTAMP_NTZ column as UTC instants under ANY
    session timezone. A bare cast interprets the naive value in the
    session tz (shifting the instant by the tz offset vs the
    nanos-as-long path when the session is not UTC);
    ``from_utc_timestamp`` adds that offset back, pinning the result
    to the same instants DuckDB reads. (Direction verified: naive
    12:00 under an Asia/Tokyo session lands on epoch 12:00Z only via
    from_utc_timestamp — to_utc_timestamp doubles the shift.)"""
    return F.from_utc_timestamp(col.cast("timestamp"), F.expr("current_timezone()"))


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view named after itself."""
    out = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
