"""Incremental aggregate maintenance: keep a grouped aggregate up to
date as new batches land WITHOUT rescanning history — the difference
between O(new data) and O(100 TB) per refresh.

The trick is storing mergeable *state* (sum/count/min/max are all
semigroups) keyed by group: a new batch contributes its own partial
state, and ``merge_states`` folds it in with one keyed shuffle over
state-sized (not history-sized) data. Derived measures (avg) are
computed at read time in ``finalize``.

Spec format: ``{out_col: (op, src_col)}`` with op in
{"sum", "count", "min", "max", "avg"}.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import DEC

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _state_cols(spec: dict) -> dict:
    """Expand derived ops into their mergeable state columns."""
    out = {}
    for name, (op, src) in spec.items():
        if op == "avg":
            out[f"{name}__sum"] = ("sum", src)
            out[f"{name}__cnt"] = ("count", src)
        else:
            out[name] = (op, src)
    return out


def compute_state(batch: DataFrame, keys: list[str], spec: dict) -> DataFrame:
    """Partial (mergeable) state for one batch."""
    aggs = []
    for name, (op, src) in _state_cols(spec).items():
        if op == "sum":
            aggs.append(F.sum(F.col(src).cast(DEC)).alias(name))
        elif op == "count":
            aggs.append(F.count(src).cast("bigint").alias(name))
        else:
            aggs.append(_MERGE[op](src).alias(name))
    return batch.groupBy(*keys).agg(*aggs)


def merge_states(state: DataFrame | None, delta: DataFrame, keys: list[str], spec: dict) -> DataFrame:
    """Fold a batch's partial state into the running state — one
    shuffle over state rows only."""
    if state is None:
        return delta
    cols = _state_cols(spec)
    merged = state.unionByName(delta).groupBy(*keys)
    aggs = []
    for name, (op, _src) in cols.items():
        fn = _MERGE["sum" if op in ("sum", "count") else op]
        aggs.append(fn(name).alias(name))
    return merged.agg(*aggs)


def finalize(state: DataFrame, keys: list[str], spec: dict) -> DataFrame:
    """Resolve derived measures from state (avg = sum/count) and cast
    exact decimal sums back to double."""
    sel = [F.col(k) for k in keys]
    for name, (op, _src) in spec.items():
        if op == "avg":
            sel.append(
                (F.col(f"{name}__sum").cast("double") / F.col(f"{name}__cnt")).alias(name)
            )
        elif op == "sum":
            sel.append(F.col(name).cast("double").alias(name))
        else:
            sel.append(F.col(name).alias(name))
    return state.select(*sel)
