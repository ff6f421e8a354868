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
    file or a (possibly partitioned/nested) directory of part files;
    raises rather than return 0 for a layout with no parquet files —
    a silent 0 would collapse the adaptive parameters back to their
    minimums, reinstating the fixed-bucket blowup they prevent."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if not os.path.isdir(path):
        return pq.ParquetFile(path).metadata.num_rows
    total, found = 0, False
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                found = True
                total += pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
    if not found:
        raise FileNotFoundError(f"no parquet part files under {path}")
    return total


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Declarative scan: Catalyst prunes columns and
    pushes filters into the parquet reader downstream."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Spark 4 defaults inferTimestampNTZ=true, so µs-without-tz
    # parquet (orders/lineitem dates) reads as TIMESTAMP_NTZ in a
    # fresh session — and as TIMESTAMP once anything flipped the conf:
    # an ORDER-DEPENDENT schema (r12 finding — the snapshot gate only
    # passed when an events load happened to run first). Pin it off
    # unconditionally (runtime-settable), for ANY caller session.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # events.parquet has shipped as TIMESTAMP(NANOS) (which a
        # default session refuses to read) and as plain µs-without-tz.
        # The engine must behave identically under ANY caller-provided
        # SparkSession and either file flavor, so set the
        # (runtime-settable) escape hatch here, not only in our
        # session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
        df = ntz_as_utc_instant(df, "ts")
    return df


def ntz_as_utc_instant(df: DataFrame, colname: str) -> DataFrame:
    """Reinterpret a TIMESTAMP_NTZ column as UTC instants under ANY
    session timezone. A bare cast interprets the naive value in the
    *session* tz - which both shifts the instant by the tz offset and,
    in DST zones, mangles wall times inside a spring-forward gap (the
    local-time mapping is not total there). Instead the cast is
    analyzed while the session tz is pinned to UTC: Spark's
    ResolveTimeZone stamps the zone into the Cast expression at
    analysis time (withColumn analyzes eagerly), so execution uses
    UTC - offset-free, DST-free, total - no matter what the session
    tz is by then."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        return df.withColumn(colname, F.col(colname).cast("timestamp"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view named after itself."""
    out = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
