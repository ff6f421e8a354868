"""Sinks: partitioned / bucketed / compacted writes — the Spark-native
analogue of Yuki's output collection
(/root/reference/Yuki/kernel/impression_storage.py: collect_outputs
deposits job results as versioned artifacts).

Scale notes baked into the API:
- ``partition_by`` → hive-style directory partitioning so downstream
  reads prune partitions (the #1 lever for 100 TB layouts).
- ``bucket_by`` → pre-shuffled, co-located layout: joins/aggs on the
  bucket keys skip the shuffle entirely (requires saveAsTable).
- ``target_files`` → repartition before write to avoid the
  small-files problem (one task = one file per partition dir).
- ``sort_by`` within files → better min/max pruning + compression.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
    dynamic_overwrite: bool = False,
) -> None:
    """Partitioned parquet write with small-file control.
    ``dynamic_overwrite=True`` switches an overwrite to
    dynamic-partition mode (replace only the partitions present in
    ``df``) — see :func:`overwrite_partitions`."""
    if target_files is not None:
        if partition_by:
            # one write task per output dir per slice → bounded files
            df = df.repartition(target_files, *partition_by)
        else:
            df = df.repartition(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).option("compression", compression)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    target_files: int | None = None,
    sort_by: list[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Backfill write: replace ONLY the hive partitions present in
    ``df``, leaving sibling partitions untouched — the
    reprocess-one-slice primitive every incremental pipeline needs
    (re-running one day's extract must not clobber the other 364 at
    100 TB). Static overwrite would drop the whole root; this sets
    ``partitionOverwriteMode=dynamic`` as a per-write option, so no
    session-global conf is touched. Thin wrapper over
    :func:`write_parquet` (one copy of the small-file/sort logic)."""
    write_parquet(
        df,
        path,
        partition_by=partition_by,
        target_files=target_files,
        sort_by=sort_by,
        mode="overwrite",
        compression=compression,
        dynamic_overwrite=True,
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed/external table: co-locates rows by key so a
    later join/groupBy on ``bucket_cols`` is shuffle-free on both
    bucketed sides (Catalyst recognizes the layout)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    options.setdefault("header", "true")
    df.write.mode(mode).options(**options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
