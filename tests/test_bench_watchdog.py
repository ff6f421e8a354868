"""The bench harness's py4j-hang watchdog (SURVEY §7.17): a key that
never returns must record a ``timed_out`` sentinel and leave a COMPLETE
bench_results.json — before r10 the only guard was an external timeout
around the whole process, which cost the driver its entire perf
artifact when one key froze."""
from __future__ import annotations

import json
import time

import pytest

import bench


def test_guarded_returns_elapsed_on_success():
    dt = bench._guarded(lambda: time.sleep(0.05), 5.0)
    assert dt is not None and dt >= 0.05


def test_guarded_none_on_timeout():
    assert bench._guarded(lambda: time.sleep(5.0), 0.3) is None


def test_guarded_reraises_fn_errors():
    with pytest.raises(ValueError, match="boom"):
        bench._guarded(lambda: (_ for _ in ()).throw(ValueError("boom")), 5.0)


def test_forced_hang_yields_sentinel_and_complete_artifact(
    spark, tmp_path, monkeypatch, capsys
):
    """End-to-end: a query whose execution sleeps past the per-key
    timeout gets a sentinel row; the other keys are timed normally and
    the artifact + stdout line stay well-formed."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sleepy(s):
        time.sleep(30)
        return s

    def hang_query(spark, sf_dir):
        return spark.range(1).select(_sleepy(F.col("id")).alias("id"))

    def fast_query(spark, sf_dir):
        return spark.range(8).selectExpr("sum(id) AS s")

    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "2")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET_S", "60")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_KEY_TIMEOUT_S", "3")
    out = tmp_path / "bench_results.json"
    report = bench._main_body(
        "/root/testdata/sf0.001",
        0.001,
        qs={"fastq": fast_query, "hangq": hang_query},
        out_path=str(out),
    )

    assert report["timed_out"] == {"hangq": 3.0}
    assert "hangq" not in report["queries"]
    assert "hangq" not in report["medians"]
    # the fast key was sampled on BOTH rounds despite the hang
    assert report["queries"]["fastq"] >= 0
    assert report["value"] == sum(report["queries"].values())

    # the on-disk artifact is complete and carries the sentinel
    disk = json.loads(out.read_text())
    assert disk["timed_out"] == {"hangq": 3.0}
    assert "fastq" in disk["queries"]

    # the stdout contract line parses, carries the sentinel, and stays
    # inside the driver's ~2000-char stdout tail window (the reason
    # the line truncates its queries dict in the first place)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["timed_out"] == {"hangq": 3.0}
    assert len(line) <= 2000
