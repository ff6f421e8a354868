"""Pareto skyline (dominance) operator.

A row is on the skyline iff no other row is at-least-as-good on every
criterion and strictly better on at least one (minimize some columns,
maximize others). The classic OLAP "best tradeoffs" query — here in
the two-phase distributed shape the Spark-SQL skyline integration
literature uses (local skyline per partition, then a global resolve):

1. **Local prune** (``mapInPandas``): each Arrow batch computes its
   own skyline. Dominance is transitive, so a row dominated inside
   its batch is dominated globally — dropping it is always safe, and
   the candidate set that leaves the executors is typically tiny
   (O(log^d n) for independent dimensions, vs n rows scanned).
2. **Tree resolve**: the surviving candidates shuffle into a bounded
   fan-in of intermediate partitions (default 32) that each run the
   same scan, and THEIR survivors collapse to one final partition for
   the last pass. On a benign distribution the intermediate level is
   ~free (candidates are already tiny); on an adversarial
   anti-correlated input — where the local prune drops little — it
   caps the single-task resolve at O((survivors/fanout)²) per
   intermediate task instead of one O(survivors²) straggler. No
   shuffle of the full input, no cartesian product anywhere — the
   O(n²) all-pairs formulation survives only as the DuckDB twin /
   test oracle.

Per-batch scan is sort-then-filter: after lexicographic sort by the
normalized criteria, a row can only be dominated by an *earlier* row,
so one pass testing each row against the accumulated skyline (a
vectorized numpy check against s kept rows) costs O(n·s + n log n)
with s = skyline size — not O(n²).

The skyline of a set is unique (duplicates on all criteria don't
dominate each other and all survive), so the result is deterministic
under any partitioning and exactly reproducible by the SQL twin's
NOT EXISTS formulation.
"""
from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _batch_skyline(
    pdf: pd.DataFrame, mins: Sequence[str], maxs: Sequence[str]
) -> pd.DataFrame:
    if len(pdf) == 0:
        return pdf
    # normalize to all-minimize criteria
    crit = np.column_stack(
        [pdf[c].to_numpy(dtype=np.float64) for c in mins]
        + [-pdf[c].to_numpy(dtype=np.float64) for c in maxs]
    )
    order = np.lexsort(crit.T[::-1])  # lexicographic by criteria
    sorted_crit = crit[order]
    kept_rows: list[int] = []
    # accumulated skyline criteria: geometric growth keeps the scan
    # amortized O(s·d) instead of an O(s²·d) per-row vstack copy
    cap = 16
    sky = np.empty((cap, sorted_crit.shape[1]))
    s = 0
    for i in range(len(sorted_crit)):
        row = sorted_crit[i]
        if s:
            # dominated ⇔ some kept row ≤ everywhere and < somewhere;
            # lexicographic order guarantees dominators appear earlier
            le = (sky[:s] <= row).all(axis=1)
            lt = (sky[:s] < row).any(axis=1)
            if bool((le & lt).any()):
                continue
        if s == cap:
            cap *= 2
            grown = np.empty((cap, sky.shape[1]))
            grown[:s] = sky[:s]
            sky = grown
        sky[s] = row
        s += 1
        kept_rows.append(order[i])
    return pdf.iloc[sorted(kept_rows)]


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
    fanout: int = 32,
) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated under the given criteria.

    Criteria columns must be numeric, non-null, and exactly
    representable in float64 (|v| ≤ 2^53 for integer criteria — the
    dominance scan compares float64 views, so wider integers would
    collapse near-equal values and diverge from an exact-integer SQL
    twin); all other columns pass through untouched (duplicate
    criterion vectors all survive — standard skyline semantics, and
    what keeps the result exactly equal to the SQL twin).

    ``fanout`` sizes the intermediate resolve level (see module
    docstring): pruning dominated rows is safe on ANY subset of the
    candidates (dominance is transitive and witness rows survive into
    the next level or are themselves dominated by survivors), so the
    partial resolves can partition the candidates arbitrarily and the
    final pass still produces exactly the global skyline. ``fanout<=1``
    skips the intermediate level."""
    mins, maxs = list(minimize), list(maximize)
    if not mins and not maxs:
        raise ValueError("skyline needs at least one criterion")

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_skyline(pdf, mins, maxs)

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a resolve task MUST see its whole partition at once: Arrow
        # re-batches the partition, and a per-batch scan would let a
        # row dominated from another batch survive
        pdfs = [pdf for pdf in batches if len(pdf)]
        if pdfs:
            yield _batch_skyline(pd.concat(pdfs), mins, maxs)

    candidates = df.mapInPandas(local, df.schema)
    # repartition (not coalesce — coalesce would fuse the local prune
    # into the same single task, serializing the parallel phase) so
    # only the small candidate set shuffles between resolve levels
    if fanout > 1:
        candidates = candidates.repartition(fanout).mapInPandas(
            resolve, df.schema
        )
    return candidates.repartition(1).mapInPandas(resolve, df.schema)
