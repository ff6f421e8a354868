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

# The libm-free log2 primitive lives in functions (with_plog2 /
# sql_plog2_ctes — exponent via exact integer compares, atanh-series
# Horner mantissa, bit-identical across engines); re-exported here
# for the sampling test twins.
from ..functions import (  # noqa: F401 — re-exported for test twins
    _ATANH_COEFFS,
    _TWO_OVER_LN2,
    sql_plog2_ctes,
    with_plog2,
)

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


def with_portable_log2_u(df: DataFrame, key: str, out: str) -> DataFrame:
    """Append ``out`` ≈ log2(u) where u = (bucket(key)+1) / 2^32 —
    computed with ONLY IEEE-754 correctly-rounded operations (+, -,
    ×, ÷, integer compares), never libm: ``ln``/``log`` are not
    correctly rounded, so Java's Math.log and DuckDB's libm log can
    disagree by 1 ulp and flip a ranking at a LIMIT cutoff (the last
    float-libm flake vector the r3/r4 reviews flagged). Libm-free
    recipe, identical expression in both engines:

    1. e = floor(log2 b) via 32 exact integer comparisons
       (Σ [b ≥ 2^k]);
    2. m = b·2^-e ∈ [1,2) — multiplication by a power of two is
       EXACT in binary floating point;
    3. log2(m) = (2/ln2)·atanh(z), z = (m−1)/(m+1) ∈ [0,1/3),
       atanh by truncated odd series in Horner form — every +,×,÷ is
       correctly rounded, so the 64-bit result is a deterministic
       function of b in ANY IEEE-754 engine;
    4. log2(u) = e + log2(m) − 32.

    The value is the true log2 to ~5e-12 (series truncation), and —
    the property that matters — BIT-IDENTICAL between Spark and
    DuckDB: no rounding step, no tolerance, no tie ambiguity.

    Scale: ~50 cheap column ops per row inside whole-stage codegen —
    a pure map, no shuffle."""
    work = df.select(
        "*", (bucket(key) + F.lit(1)).cast("bigint").alias("__pu")
    )
    work = with_plog2(work, "__pu", "__plog2", max_bits=33)
    return work.select(
        *df.columns, (F.col("__plog2") - F.lit(32.0)).alias(out)
    )


def sql_log2_u_ctes(name: str, src: str, b_expr: str, out: str = "log2_u") -> str:
    """DuckDB twin of :func:`with_portable_log2_u`: the IDENTICAL
    libm-free expression (same association order, same literals) as a
    per-step CTE chain (see functions.sql_plog2_ctes for why not a
    lateral-alias fragment): splice into a WITH list and read
    ``{name}`` (source columns + ``{out}``) downstream."""
    from ..functions import sql_plog2_ctes

    return (
        sql_plog2_ctes(f"{name}__p", src, f"{b_expr} + 1", f"{out}__raw", max_bits=33)
        + f",\n        {name} AS (SELECT * EXCLUDE ({out}__raw), "
        f"{out}__raw - CAST(32 AS DOUBLE) AS {out} FROM {name}__p)"
    )


def weighted_sample(
    df: DataFrame, key: str, weight: Column, n: int
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): each row draws u ∈ (0, 1] from the
    portable hash of its key and scores ``ares_key = log2(u)/w`` —
    the top-n scores win, so heavier rows systematically draw better
    scores while every row keeps a chance. log2 differs from the
    paper's ln by the positive constant ln 2, so the ranking is the
    exact A-Res ``u^(1/w)`` order (granularity: u itself is drawn on
    a 2^-32 hash-derived grid — the score is NOT quantized further;
    ties broken by key).

    Rows with ``weight <= 0`` are excluded (A-Res is defined for
    positive weights; without the guard a zero weight scores NaN,
    which Spark's descending sort ranks above every finite key while
    DuckDB errors — an engine-twin break).

    Engine-portable with NO float-libm dependence: the hash is exact
    integer arithmetic and log2(u) comes from
    :func:`with_portable_log2_u` (IEEE-correctly-rounded ops only),
    so both engines compute bit-identical scores — the ln-based
    formulation this replaces carried a documented 1-ulp Java-vs-libm
    risk at decimal rounding boundaries. The final ÷w is a single
    correctly-rounded double division, also bit-identical. Scale: a
    pure map + distributed top-n (TakeOrdered) — no global sort, no
    single-partition window."""
    scored = with_portable_log2_u(df.where(weight > F.lit(0)), key, "__log2u")
    return (
        scored.withColumn(
            "ares_key", F.col("__log2u") / weight.cast("double")
        )
        .drop("__log2u")
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
