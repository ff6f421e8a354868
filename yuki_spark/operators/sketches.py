"""Sketch operators: sublinear-memory summaries that merge across
partitions — the 100 TB substitutes for exact distinct/frequency
state.

- ``hll_distinct``: HyperLogLog distinct counts per group
  (``approx_count_distinct``'s relative error defaults to 5%; rsd
  parameter trades memory for accuracy). Mergeable map-side.
- ``heavy_hitters``: frequency estimates for candidate keys from a
  Count-Min sketch (``F.count_min_sketch``, one pass, mergeable);
  estimates are upper-biased (estimate >= true count) with error
  <= eps * N at confidence `confidence` — the classic CM guarantee.
- ``topk_exact_vs_sketch``: the verification harness — exact top-k
  beside sketch estimates so accuracy is measurable on real data.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, group: str, key: str, rsd: float = 0.05) -> DataFrame:
    """Distinct ``key`` per ``group`` via HLL (one pass, no distinct
    shuffle of the raw keys)."""
    return (
        df.groupBy(group)
        .agg(F.approx_count_distinct(key, rsd).alias("approx_distinct"))
        .orderBy(group)
    )


def cm_sketch(df: DataFrame, key: str, eps: float = 0.001, confidence: float = 0.99):
    """Build one Count-Min sketch over ``key`` (binary, mergeable).
    Returns the sketch bytes (driver-side: tiny, O(1/eps * ln(1/conf)))."""
    row = df.agg(
        F.count_min_sketch(F.col(key), F.lit(eps), F.lit(confidence), F.lit(42)).alias("cms")
    ).collect()[0]
    return bytes(row["cms"])


def heavy_hitters(df: DataFrame, key: str, candidates: DataFrame, eps: float = 0.001, confidence: float = 0.99) -> DataFrame:
    """Estimate frequencies of candidate keys from a single CM sketch
    pass. The candidate set typically comes from a cheap per-partition
    pre-top-k; estimates are upper bounds within eps*N."""
    from pyspark.sql.types import LongType

    sketch = cm_sketch(df, key, eps, confidence)
    spark = df.sparkSession
    sc = spark.sparkContext
    jvm = sc._jvm
    in_stream = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    jcms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(in_stream)

    rows = candidates.collect()  # candidate set is small by contract
    ests = [(r[0], int(jcms.estimateCount(r[0]))) for r in rows]
    return spark.createDataFrame(ests, f"{key} string, est_count long").withColumn(
        "est_count", F.col("est_count").cast(LongType())
    )


def topk_exact_vs_sketch(df: DataFrame, key: str, k: int = 5, eps: float = 0.001) -> DataFrame:
    """Exact top-k counts joined with their CM estimates — the
    accuracy check a sketch deployment ships with."""
    exact = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), key)
        .limit(k)
    )
    est = heavy_hitters(df, key, exact.select(key), eps=eps)
    return exact.join(est, key).orderBy(F.desc("true_count"), key)
