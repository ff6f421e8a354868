"""Reproducible sampling for training-data pipelines.

Random sampling (``df.sample``) is not stable across runs, partition
layouts, or engines — a training pipeline needs the SAME split every
time anywhere. These operators hash a key column with a Knuth
multiplicative hash (pure 64-bit arithmetic, bit-identical in any
engine — no dependence on Spark's xxhash or DuckDB's hash), so
membership is a pure function of the key:

- ``hash_sample``: keep rows whose hash bucket falls under the
  fraction (stable Bernoulli-style sample).
- ``split_train_eval``: disjoint stable train/eval split.
- ``stratified_sample``: exactly n rows per stratum, chosen by hash
  order (deterministic reservoir equivalent; one shuffle on strata).

Scale: hash_sample is a pure map (filter pushes into the scan);
stratified is one window shuffle on the strata key.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hashing
MOD = 1 << 32


def bucket(key: Column | str) -> Column:
    """Deterministic hash bucket in [0, 2^32): (key * KNUTH) mod 2^32."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(c.cast("bigint") * F.lit(KNUTH), F.lit(MOD))


def sql_bucket(key: str) -> str:
    """DuckDB twin of :func:`bucket` (identical integer arithmetic)."""
    return f"((CAST({key} AS BIGINT) * {KNUTH}) % {MOD} + {MOD}) % {MOD}"


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Stable sample: keeps rows with bucket < fraction * 2^32."""
    return df.where(bucket(key) < int(fraction * MOD))


def split_train_eval(df: DataFrame, key: str, eval_fraction: float):
    """Disjoint, stable (train, eval) split on the hashed key."""
    cut = int(eval_fraction * MOD)
    b = bucket(key)
    return df.where(b >= cut), df.where(b < cut)


def weighted_sample(
    df: DataFrame, key: str, weight: Column, n: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws u ∈ (0, 1] from the
    portable hash of its key and scores ``ares_key = ln(u)/w`` — the
    top-n scores win, so heavier rows systematically draw better
    scores while every row keeps a chance (the exact A-Res
    ``u^(1/w)`` order, taken in log space).

    Rows with ``weight <= 0`` are excluded (A-Res is defined for
    positive weights; without the guard a zero weight scores NaN,
    which Spark's descending sort ranks above every finite key while
    DuckDB errors — an engine-twin break). Weights should stay below
    ~1e6: the 9-place rounding that makes scores engine-portable
    quantizes ``ln(u)/w`` away for huge w — A-Res order is invariant
    under scaling all weights by a constant, so pre-scale instead.

    Engine-portable: the hash is exact integer arithmetic and the
    ln/÷ result rounds to 9 places before ranking (the same ulp-kill
    trick as the cosine operators), ties broken by key. Residual
    portability risk (accepted, documented): unlike sqrt/divide, ln is
    NOT IEEE-correctly-rounded, so Java's Math.log and DuckDB's libm
    log may differ by 1 ulp; the 9-place round suppresses that except
    when ln(u)/w lands within ~1 ulp of a 0.5e-9 decimal rounding
    boundary AND the flipped 9th decimal changes the order exactly at
    the LIMIT cutoff — a ~1e-9-per-row coincidence that an exact
    cross-engine comparison cannot eliminate without bignum ln on both
    sides. Scale: a pure map + distributed top-n (TakeOrdered) — no
    global sort, no single-partition window."""
    u = (bucket(key) + F.lit(1)).cast("double") / F.lit(float(MOD))
    k = F.round(F.log(u) / weight.cast("double"), 9)
    return (
        df.where(weight > F.lit(0))
        .withColumn("ares_key", k)
        .orderBy(F.desc("ares_key"), F.col(key))
        .limit(n)
    )


def allocate_quotas(weights: dict[str, float], budget: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``budget`` slots across
    strata by weight — deterministic: floors first, then the leftover
    slots go to the largest fractional parts (ties by stratum name).
    Pure driver-side arithmetic; the SQL twin inlines the SAME quotas,
    so both engines select identical rows.

    Weights must be non-negative and sum to 1 (within fp tolerance):
    the floors-plus-remainder step only corrects a shortfall of at
    most one slot per stratum, so an off-sum weight vector would
    silently over- or under-allocate the budget."""
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative weight in {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights sum to {total}, expected 1")
    exact = {k: budget * w for k, w in weights.items()}
    floors = {k: int(v) for k, v in exact.items()}
    leftover = budget - sum(floors.values())
    by_frac = sorted(weights, key=lambda k: (-(exact[k] - floors[k]), k))
    for k in by_frac[:leftover]:
        floors[k] += 1
    return floors


def domain_mix(
    df: DataFrame,
    stratum: str,
    key: str,
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Deterministic mixture sampling (the domain/language re-weighting
    step of a pretraining data pipeline): allocate ``budget`` slots
    across strata by ``weights`` (largest-remainder), then fill each
    stratum's quota in portable-hash order. A stratum smaller than its
    quota contributes everything it has (no reallocation — shortfalls
    surface in the output counts rather than silently skewing other
    strata). Strata absent from ``weights`` contribute nothing.

    Scale: one shuffle on the stratum key; the per-stratum rank is a
    window over that partitioning."""
    quotas = allocate_quotas(weights, budget)
    qmap = F.create_map(
        *[x for k, v in sorted(quotas.items()) for x in (F.lit(k), F.lit(v))]
    )
    return _take_hash_ranked(
        df, stratum, key, F.coalesce(qmap[F.col(stratum)], F.lit(0))
    )


def _take_hash_ranked(
    df: DataFrame, stratum: str, key: str, quota: Column
) -> DataFrame:
    """Per-stratum hash-order rank filter shared by
    :func:`stratified_sample` (constant quota) and :func:`domain_mix`
    (weight-apportioned quota)."""
    w = Window.partitionBy(stratum).orderBy(bucket(key), F.col(key))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )


def stratified_sample(
    df: DataFrame, strata: str, key: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, selected by hash
    order — a deterministic reservoir sample per group."""
    return _take_hash_ranked(df, strata, key, F.lit(n_per_stratum))
