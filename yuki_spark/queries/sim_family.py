"""Shared, content-addressed ANN result artifacts for the similarity
query family — the vector-index analogue of :mod:`.dedup_family`.

A production ANN deployment builds its indexes ONCE and queries them
many times; before round 6 every similarity query here re-derived its
index end-to-end per run, and the evaluation harnesses (s6 recall,
s12 graph recall) re-ran three or four whole index pipelines just to
join their outputs. This module deposits the deterministic RESULT
tables (every ANN operator ends in the same ``(qid, rk, cid,
cosine)`` contract, exact-int scored, so a parquet roundtrip is
bit-exact) through the impression store:

- ``exact20`` — brute-force cosine top-k over the nq=20 query cohort
  (the ground truth s6 and s12 both join against)
- ``lsh20`` / ``ivf20`` / ``pq20`` — the three index paths' top-k
  (s3 / s4 / s8 read these; s6 re-reads them instead of re-running
  the index builds)
- ``graph`` — the all-vectors kNN graph (s11; s12 re-reads it)

Addresses cover the embeddings table fingerprint (part-file
sizes/mtimes — the adaptive plane/probe parameters derive from its
row count, so they are covered transitively) plus the query
parameters; SIM_VERSION must be bumped on any algorithm change (O5
version-bump contract). Ordering is NOT part of a deposit (parquet
has no order): every consumer re-applies the operator's documented
``orderBy`` on read.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .artifact_store import (
    code_fingerprint,
    default_store_root,
    deposit_or_reuse,
    table_fingerprint,
)

# Effective version folds in a code hash of this module +
# operators/similarity.py (see dedup_family for the rationale).
SIM_VERSION = "r6-1"

COMPUTES: dict[str, int] = {}


def store_root() -> str | None:
    return default_store_root("YUKI_SPARK_SIM_STORE", "yuki_spark-sim-family")


def result(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    params: dict[str, Any],
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Deposit-or-reuse one ANN result table for this corpus+params.
    Returns the UNORDERED deposit read — callers re-apply their
    operator's output ordering."""
    import importlib
    import sys

    from ..operators import similarity

    # The builder lambdas live in queries/sim.py (e.g. s13's embedding
    # slice), so its source MUST be part of the address — without it an
    # edit there keeps the old address and silently serves a stale
    # deposit. Import by name: sim.py imports this module, so a direct
    # `from . import sim` here would be circular at import time.
    sim_mod = importlib.import_module(__package__ + ".sim")
    fp = table_fingerprint(sf_dir, "embeddings", {"params": params})
    version = SIM_VERSION + "+" + code_fingerprint(
        sys.modules[__name__], similarity, sim_mod
    )
    df, _ = deposit_or_reuse(
        spark,
        store_root(),
        f"sim_family.{name}",
        version,
        [fp],
        builder,
        COMPUTES,
        name,
    )
    return df
