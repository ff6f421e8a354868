"""Skew resilience: pathological hot keys must neither break
correctness nor degrade into one straggler partition (SURVEY §4)."""
from __future__ import annotations

from pyspark.sql import functions as F

from yuki_spark.operators.joins import salted_join


def _skewed(spark, n=200_000, hot_frac=0.9):
    """90% of rows share key 0; the rest spread over 1000 keys."""
    return spark.range(n).select(
        F.when(F.rand(7) < hot_frac, 0)
        .otherwise((F.rand(11) * 1000).cast("long") + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_correct_and_spread_under_skew(spark):
    skewed = _skewed(spark)
    small = spark.range(0, 1001).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    plain = skewed.join(small, "k")
    salted = salted_join(skewed, small, "k", n_salts=16, tiebreak="payload")
    assert salted.count() == plain.count()
    # hot key's rows really spread over all 16 salt partitions
    spread = (
        skewed.where("k = 0")
        .select(F.pmod(F.xxhash64("payload"), F.lit(16)).alias("s"))
        .groupBy("s").count().collect()
    )
    assert len(spread) == 16
    counts = [r["count"] for r in spread]
    assert max(counts) < 2 * min(counts)  # roughly even


def test_skewed_aggregation_partial_combines(spark):
    """The hot-key groupBy must partial-aggregate map-side: the
    shuffle carries one row per (partition, key), not 180k hot rows."""
    skewed = _skewed(spark)
    agg = skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "partial_count" in plan  # map-side combine present
    hot = agg.where("k = 0").collect()[0]
    assert hot["n"] > 150_000  # the skew is real and the answer right


def test_aqe_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
