from __future__ import annotations

import os
import tempfile

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("YUKI_SPARK_TEST_SF", "/root/testdata/sf0.01")

# Isolate the query-artifact stores (dedup_family / sim_family) to a
# per-pytest-session directory: gate tests must never read deposits an
# ambient bench/driver run left in the shared temp root, nor leak
# deposits outside pytest's own sandbox. Tests that need a SPECIFIC
# store (test_artifact_families) still monkeypatch their own.
_ARTIFACT_TMP = tempfile.mkdtemp(prefix="yuki-test-artifacts-")
os.environ.setdefault(
    "YUKI_SPARK_DEDUP_STORE", os.path.join(_ARTIFACT_TMP, "dedup")
)
os.environ.setdefault("YUKI_SPARK_SIM_STORE", os.path.join(_ARTIFACT_TMP, "sim"))
os.environ.setdefault("YUKI_SPARK_LM_STORE", os.path.join(_ARTIFACT_TMP, "lm"))
os.environ.setdefault(
    "YUKI_SPARK_PIPE_STORE", os.path.join(_ARTIFACT_TMP, "pipe")
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from yuki_spark.session import get_spark

    s = get_spark("yuki_spark-tests")
    yield s
