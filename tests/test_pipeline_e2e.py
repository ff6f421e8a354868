"""Flagship end-to-end: the full Yuki-shaped workflow on Spark — a
DAG of data transformations over versioned inputs, executed with
impression persistence, status journaling, and reuse on re-run.

Pipeline: stage documents → exact-dedup survivors → quality filter →
per-source stats, with the stats snapshot deposited as an impression.
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from yuki_spark.operators import text
from yuki_spark.pipeline.backends import LocalBackend
from yuki_spark.pipeline.dag import Pipeline
from yuki_spark.pipeline.impressions import ImpressionStore
from yuki_spark.pipeline.status import StatusStore


def build(sf_dir: str) -> Pipeline:
    p = Pipeline("corpus_curation")
    p.source("documents", lambda s, _: s.read.parquet(f"{sf_dir}/documents.parquet"))
    p.add(
        "deduped",
        lambda s, d: (
            text.fingerprint(d["documents"])
            .withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .where(F.col("rk") == 1)
            .drop("rk", "fp")
        ),
        deps=("documents",),
    )
    p.add(
        "quality_filtered",
        lambda s, d: text.quality_features(d["deduped"]).where(F.col("quality") > 0.3),
        deps=("deduped",),
    )
    p.add(
        "source_stats",
        lambda s, d: (
            d["quality_filtered"]
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.avg("quality").alias("avg_quality"),
                F.sum("n_tokens").alias("total_tokens"),
            )
        ),
        deps=("quality_filtered",),
    )
    return p


def test_corpus_curation_end_to_end(spark, tmp_path):
    store = ImpressionStore(str(tmp_path / "imps"))
    status = StatusStore(str(tmp_path / "status.jsonl"))

    p1 = build(SF_SMOKE)
    out1 = LocalBackend(store, persist={"source_stats"}, status_store=status).run(spark, p1)
    assert out1["statuses"]["source_stats"] == "finished"
    stats1 = {r["source"]: r["n_docs"] for r in out1["results"]["source_stats"].collect()}
    assert stats1 and sum(stats1.values()) > 0

    # deposited impression is readable standalone (the "collect" path)
    imp = out1["impressions"]["source_stats"]
    assert store.exists(imp)
    assert store.read(spark, imp).count() == len(stats1)

    # re-run: unchanged DAG reuses the deposited snapshot, no recompute
    p2 = build(SF_SMOKE)
    out2 = LocalBackend(store, persist={"source_stats"}, status_store=status).run(spark, p2)
    assert out2["statuses"]["source_stats"] == "reused"
    stats2 = {r["source"]: r["n_docs"] for r in out2["results"]["source_stats"].collect()}
    assert stats2 == stats1

    # version bump on an upstream task invalidates the whole chain
    p3 = build(SF_SMOKE)
    p3.tasks["quality_filtered"].version = "2"
    out3 = LocalBackend(store, persist={"source_stats"}, status_store=status).run(spark, p3)
    assert out3["statuses"]["source_stats"] == "finished"  # recomputed

    # the journal shows the full audited history across all three runs
    hist = status.history("corpus_curation")
    assert [r["status"] for r in hist if r["task"] == "source_stats"] == [
        "running", "finished", "running", "reused", "running", "finished",
    ]


def test_per_task_log_collection(spark, tmp_path):
    """Every run deposits a logs.json artifact at each task's content
    address — explain string + observed metrics for executed tasks,
    the error for failed ones (parity: impression_storage.collect_logs)."""
    store = ImpressionStore(str(tmp_path / "imps"))

    p = build(SF_SMOKE)
    out = LocalBackend(store, persist={"source_stats"}, observe=True).run(spark, p)

    logs = store.logs(out["impressions"]["source_stats"])
    assert logs["status"] == "finished"
    assert "Physical Plan" in logs["explain"]
    assert logs["metrics"]["n_rows"] > 0
    assert logs["error"] is None
    # compiled upstream tasks get artifacts too (metrics resolved off
    # the sink's single action)
    dlogs = store.logs(out["impressions"]["deduped"])
    assert dlogs["status"] == "compiled"
    assert dlogs["metrics"]["n_rows"] > 0

    # failed task: logs.json records the error at the task's address
    # even though no data was deposited there
    pf = build(SF_SMOKE)
    pf.add("boom", lambda s, d: d["source_stats"].select("no_such_col"), deps=("source_stats",))
    outf = LocalBackend(store, persist={"source_stats"}).run(spark, pf)
    flogs = store.logs(outf["impressions"]["boom"])
    assert flogs["status"] == "failed"
    assert "no_such_col" in flogs["error"]
    assert not store.exists(outf["impressions"]["boom"])  # logs-only dir
