"""Join operators Spark lacks natively: as-of, range/interval, and
salted skew joins — each built so the shuffle shape survives 100 TB.

- ``asof_join``: union-then-window (one shuffle on the `by` key; no
  per-row range probe). This is the merge_asof semantic over
  distributed data.
- ``range_join``: interval join via bucketization — each interval
  explodes to the coarse buckets it overlaps, the join is a bucket
  equi-join, and an exact predicate filters the residue. Turns an
  O(n·m) inequality join (broadcast-nested-loop in Spark) into a
  keyed shuffle whose fan-out is interval_len/bucket_len.
- ``salted_join``: hot-key mitigation — the skewed left side gets a
  random-ish salt (deterministic hash of a tiebreak column), the
  small-ish right side replicates ``n_salts`` times. AQE's skew-join
  handles moderate skew automatically; salting is the explicit tool
  for pathological keys.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_sec: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on < left.on`` (``<=`` when ``strict=False``) within the
    same ``by`` group, optionally within ``tolerance_sec``.

    Implementation: tag and union both sides, sort within the `by`
    partition by (`on`, tag), and carry the last seen right values
    forward with ``last(..., ignorenulls=True)`` — a single shuffle
    on `by`, linear in rows."""
    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))
    cols = set(lt.columns) | set(rt.columns)
    for c in cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.select(*sorted(cols)).unionByName(rt.select(*sorted(cols)))
    # strict (<): same-ts right rows must sort AFTER left rows so the
    # preceding-frame excludes them; non-strict (<=): before, and the
    # frame extends to the current row (self is null-valued, ignored).
    # Ties among right rows at identical `on` are arbitrary — dedupe
    # the right side on (by, on) if that matters.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    out = u
    for v in value_cols:
        src = F.when(F.col("__side") == 0, F.col(v))
        out = out.withColumn(f"asof_{v}", F.last(src, ignorenulls=True).over(w))
    asof_on = F.when(F.col("__side") == 0, F.col(on))
    out = out.withColumn("asof_on", F.last(asof_on, ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1).drop("__side")
    if tolerance_sec is not None:
        within = (
            F.col(on).cast("long") - F.col("asof_on").cast("long") <= tolerance_sec
        )
        for v in value_cols:
            out = out.withColumn(
                f"asof_{v}", F.when(within, F.col(f"asof_{v}"))
            )
        out = out.withColumn("asof_on", F.when(within, F.col("asof_on")))
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point <= end`` via bucketized equi-join.

    Each interval is exploded to ceil(len/bucket)+1 coarse buckets;
    points map to exactly one bucket; the equi-join on bucket id is a
    normal shuffle join and the exact range predicate prunes the
    residue. Choose ``bucket_sec`` ≈ typical interval length so the
    explode factor stays ~2."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col).cast("long") / bucket_sec)
    )
    iv = intervals.withColumn(
        "__bucket_iv",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bucket_sec),
                F.floor(F.col(end_col).cast("long") / bucket_sec),
            )
        ),
    )
    # the range predicate joins the bucket equality INSIDE the join
    # condition (not as a post-filter, which would silently turn an
    # outer join back into inner by dropping the null-extended rows);
    # a point has exactly one bucket, so each (point, interval) match
    # appears once and 'left' needs no dedup
    cond = (
        (F.col("__bucket") == F.col("__bucket_iv"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return p.join(iv, cond, how).drop("__bucket", "__bucket_iv")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    tiebreak: str | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has pathological hot keys: spread
    each hot key over ``n_salts`` shuffle partitions by salting, and
    replicate ``small`` across all salts. Result is identical to a
    plain inner join on ``key``."""
    tb = F.col(tiebreak) if tiebreak else F.monotonically_increasing_id()
    sk = skewed.withColumn("__salt", F.pmod(F.xxhash64(tb), F.lit(n_salts)))
    sm = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return sk.join(sm, [key, "__salt"]).drop("__salt")
