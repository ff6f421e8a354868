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
    # default raised 8 → 16 (r14 verdict item 1): the driver's verify
    # is a single budget-bounded pytest process on a 32-core host —
    # half the machine roughly halves the Spark-heavy gates' wall
    # clock without contending with anything (citest's two halves
    # use 14+14 and pass identically, so the suite is core-count
    # agnostic). An explicit $SPARK_GRAFT_CPUS still wins.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from yuki_spark.session import get_spark

    s = get_spark("yuki_spark-tests")
    yield s


# ---- driver-profile tiering (r14 VERDICT item 1) ------------------------
#
# The suite outgrew the driver's single-process pytest budget: the r14
# verify artifact truncated at 53% with zero failures, so the round's
# strongest correctness gate went unrecorded. Two measures keep the
# DEFAULT `pytest tests/` run inside the budget while losing nothing
# from the builder's own CI:
#
# 1. ORDER: the four driver-grade gates (oracle-parity sweep, plan
#    gate, empty-catalog sweep, schema snapshot) collect FIRST, so
#    even a budget-truncated run records the gates that matter.
# 2. TIER: tests marked `slow` (10x-stress passes and property
#    sweeps — redundancy/robustness tiers, not correctness gates)
#    skip by default and run when YUKI_SPARK_RUN_SLOW=1 is set;
#    tools/citest.sh sets it, so the builder's full CI is unchanged.

_GATE_FILES = (
    "test_oracle_parity.py",   # the driver correctness gate, replicated
    "test_scale_plans.py",     # the every-key plan gate
    "test_empty_catalog.py",   # the every-key empty-catalog sweep
    "test_schema_snapshot.py", # declared-schema drift gate
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: stress/property tier — skipped unless YUKI_SPARK_RUN_SLOW=1 "
        "(tools/citest.sh sets it; the default run stays inside the "
        "driver's pytest budget)",
    )


def pytest_collection_modifyitems(config, items):
    rank = {name: i for i, name in enumerate(_GATE_FILES)}
    items.sort(
        key=lambda it: rank.get(os.path.basename(str(it.fspath)), len(rank))
    )
    if os.environ.get("YUKI_SPARK_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set YUKI_SPARK_RUN_SLOW=1 to run"
    )
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
