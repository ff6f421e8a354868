"""MERGE INTO / upsert emulation over parquet snapshots.

Yuki deposits each job run as a fresh versioned impression
(/root/reference/Yuki/kernel/impression_storage.py); combining a new
batch with the previous snapshot is the data-integration step a
warehouse would do with MERGE INTO. Without a table format (Delta/
Iceberg jars absent) the Spark-native emulation is:

    upsert   = updates ∪ (target ⟕anti updates on key)
    scd2     = close overlapped current rows, append new versions

Scale notes: both are one shuffle on the merge key (the anti-join);
writing back through partitioned parquet (io.sinks) keeps rewrite
scope to touched partitions. At table-format scale this becomes a
real MERGE with file-level skipping — the API here is the stable
surface.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Last-writer-wins upsert: rows from ``updates`` replace target
    rows with the same key; unmatched target rows pass through."""
    if not keys:
        raise ValueError("merge keys required")
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def merge_scd2(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge.

    ``current`` rows carry (effective_col, end_col, current_flag);
    an update for an existing key closes the open row (end_col :=
    update's effective time, flag := false) and appends the new
    version as the open row. New keys just append.

    A batch may carry several versions of one key: each non-latest
    update row is closed by its successor (lead over effective_col),
    so exactly one open row per key survives — the SCD2 invariant.
    Ties on effective_col are broken by the remaining columns, so
    which version stays open is deterministic across shuffles (the
    lexicographically greatest row wins); byte-identical duplicate
    rows are interchangeable either way."""
    from pyspark.sql.window import Window

    from pyspark.sql.types import MapType

    # maps are unorderable in Spark — excluding them keeps the merge
    # working for payloads that carry one (ties then break on the
    # orderable columns only)
    tiebreak = [
        c
        for c in updates.columns
        if c not in keys
        and c != effective_col
        and not isinstance(updates.schema[c].dataType, MapType)
    ]
    w = Window.partitionBy(*keys).orderBy(effective_col, *tiebreak)
    upd = (
        updates.withColumn("__next_eff", F.lead(effective_col).over(w))
        .withColumns(
            {
                end_col: F.col("__next_eff").cast(current.schema[end_col].dataType),
                current_flag: F.col("__next_eff").isNull(),
            }
        )
        .drop("__next_eff")
    )
    new_eff = updates.groupBy(*keys).agg(F.min(effective_col).alias("__new_eff"))
    closed = (
        current.join(new_eff, keys, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_flag) & F.col("__new_eff").isNotNull(), F.col("__new_eff")
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("__new_eff").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("__new_eff")
    )
    return closed.unionByName(upd.select(*current.columns))
