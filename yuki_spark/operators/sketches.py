"""Sketch operators: sublinear-memory summaries that merge across
partitions — the 100 TB substitutes for exact distinct/frequency
state.

- ``hll_distinct``: HyperLogLog distinct counts per group
  (``approx_count_distinct``'s relative error defaults to 5%; rsd
  parameter trades memory for accuracy). Mergeable map-side.
- ``heavy_hitters``: frequency estimates for candidate keys from a
  Count-Min sketch (``F.count_min_sketch``, one pass, mergeable);
  estimates are upper-biased (estimate >= true count) with error
  <= eps * N at confidence `confidence` — the classic CM guarantee.
- ``topk_exact_vs_sketch``: the verification harness — exact top-k
  beside sketch estimates so accuracy is measurable on real data.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, group: str, key: str, rsd: float = 0.05) -> DataFrame:
    """Distinct ``key`` per ``group`` via HLL (one pass, no distinct
    shuffle of the raw keys)."""
    return (
        df.groupBy(group)
        .agg(F.approx_count_distinct(key, rsd).alias("approx_distinct"))
        .orderBy(group)
    )


HLL_LGK = 12  # DataSketches lgConfigK: 2^12 registers, ~0.8% rse


def hll_sketch(df: DataFrame, key: str, lgk: int = HLL_LGK) -> bytes:
    """Build one DataSketches HLL sketch over ``key`` (binary,
    mergeable). Same single-row-collect contract as :func:`cm_sketch`:
    a whole-stream aggregate, never inside a per-group loop."""
    row = df.agg(F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias("s")).collect()[0]
    return bytes(row["s"])


def merge_hll_bytes(spark, a: bytes, b: bytes) -> bytes:
    """Union two serialized HLL sketches (same lgConfigK). HLL merge
    is register-wise MAX — idempotent and order-independent — so the
    union's ESTIMATE equals the one-shot sketch's over the
    concatenated streams (the serialized bytes may differ: the union
    can densify a sparse sketch). One-row JVM job via ``hll_union``;
    no Python-side parsing of the DataSketches binary format."""
    row = spark.range(1).select(F.hll_union(F.lit(a), F.lit(b)).alias("m")).collect()[0]
    return bytes(row["m"])


def hll_estimate(spark, sketch: bytes) -> int:
    """Distinct-count estimate of a serialized HLL sketch."""
    row = (
        spark.range(1)
        .select(F.hll_sketch_estimate(F.lit(sketch)).alias("e"))
        .collect()[0]
    )
    return int(row["e"])


def cm_sketch(df: DataFrame, key: str, eps: float = 0.001, confidence: float = 0.99):
    """Build one Count-Min sketch over ``key`` (binary, mergeable).
    Returns the sketch bytes (driver-side: tiny, O(1/eps * ln(1/conf))).

    The single-row collect here is a whole-stream aggregate — fine at
    any scale, but callers must NOT invoke it inside a per-group loop
    (that would serialize one Spark job per group); sketch per-group
    instead via ``count_min_sketch`` in a groupBy agg."""
    row = df.agg(
        F.count_min_sketch(F.col(key), F.lit(eps), F.lit(confidence), F.lit(42)).alias("cms")
    ).collect()[0]
    return bytes(row["cms"])


def parse_cm_sketch(data: bytes):
    """Decode ``org.apache.spark.util.sketch.CountMinSketch`` V1 bytes
    (big-endian: version, totalCount, depth, width, hashA[depth],
    table[depth][width]) into ``(depth, width, table)`` — the pieces
    the string-key probe needs (strings hash via double murmur3, not
    hashA). Layout is locked by ``test_cm_python_probe_matches_jvm``."""
    import struct

    import numpy as np

    ver, _total, depth, width = struct.unpack_from(">iqii", data, 0)
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    off = 4 + 8 + 4 + 4 + 8 * depth  # skip hashA (long-key path only)
    expected = off + 8 * depth * width
    if len(data) != expected:
        raise ValueError(f"CM sketch length {len(data)} != expected {expected}")
    table = (
        np.frombuffer(data, dtype=">i8", count=depth * width, offset=off)
        .reshape(depth, width)
        .astype("int64")
    )
    return depth, width, table


_M32 = 0xFFFFFFFF


def _mm3_bytes(b: bytes, seed: int) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: little-endian 4-byte
    words, then each tail byte (signed) mixed as a full word; returns
    a signed int32. Mirrors catalyst's hash used by the CM string
    probe (public Spark algorithm)."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    def mix(h1: int, k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & _M32
        k1 = rotl(k1, 15)
        k1 = (k1 * 0x1B873593) & _M32
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & _M32

    h1 = seed & _M32
    aligned = len(b) - len(b) % 4
    for i in range(0, aligned, 4):
        h1 = mix(h1, int.from_bytes(b[i : i + 4], "little"))
    for i in range(aligned, len(b)):
        byte = b[i] - 256 if b[i] >= 128 else b[i]  # signed byte
        h1 = mix(h1, byte & _M32)
    h1 ^= len(b)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def cm_estimate_string(depth: int, width: int, table, key: str) -> int:
    """estimateCount for a string key: double hashing
    ``abs((hash1 + i*hash2) % width)`` with Java int32 wraparound and
    truncating remainder, min over the depth rows."""
    b = key.encode("utf-8")
    h1 = _mm3_bytes(b, 0)
    h2 = _mm3_bytes(b, h1)
    est = None
    for i in range(depth):
        v = (h1 + i * h2) & _M32
        if v >= 1 << 31:
            v -= 1 << 32
        r = v - int(v / width) * width  # Java %: sign of dividend
        cell = int(table[i][abs(r)])
        est = cell if est is None else min(est, cell)
    return est


# one-slot broadcast cache: re-constructing the same query (bench runs
# it 3x per process) must not accumulate identical broadcast blocks in
# the block manager for the session's lifetime
_BC_CACHE: dict = {"key": None, "bc": None}


def _sketch_broadcast(sc, sketch: bytes, payload):
    import hashlib

    # key on applicationId, not id(sc): CPython can recycle an id after
    # a stopped context is garbage-collected, which would hand back a
    # broadcast from a dead context
    cache_key = (sc.applicationId, hashlib.sha256(sketch).hexdigest())
    if _BC_CACHE["key"] != cache_key:
        old = _BC_CACHE["bc"]
        if old is not None and _BC_CACHE["key"] and _BC_CACHE["key"][0] == sc.applicationId:
            # evicted broadcast from the SAME live app: release its
            # blocks instead of leaking them for the session lifetime
            try:
                old.unpersist()
            except Exception:
                pass  # already destroyed / context torn down mid-call
        _BC_CACHE["key"] = cache_key
        _BC_CACHE["bc"] = sc.broadcast(payload)
    return _BC_CACHE["bc"]


def heavy_hitters(df: DataFrame, key: str, candidates: DataFrame, eps: float = 0.001, confidence: float = 0.99) -> DataFrame:
    """Estimate frequencies of candidate keys from a single CM sketch
    pass. The candidate set typically comes from a cheap per-partition
    pre-top-k; estimates are upper bounds within eps*N.

    The sketch is built once (single-row aggregate — the only
    driver-side materialization), then its table is *broadcast* and
    probed inside an Arrow-batched pandas UDF over the candidate
    DataFrame: no candidate collect, no createDataFrame, so the
    candidate set can itself be a distributed DataFrame at scale."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType, StringType

    import struct

    # the probe replays Spark's STRING murmur3 double-hash path; a
    # long/int key column would silently hash differently (JVM uses
    # hashA for longs), so refuse it loudly instead of returning wrong
    # estimates or an opaque AttributeError inside the UDF
    for side, sdf in (("df", df), ("candidates", candidates)):
        dt = sdf.schema[key].dataType
        if not isinstance(dt, StringType):
            raise TypeError(
                f"heavy_hitters: {side}[{key!r}] has type {dt.simpleString()}; "
                "only string key columns are supported (cast the column to "
                "string on BOTH sides, or extend the probe with the hashA "
                "long-key path)"
            )

    sketch = cm_sketch(df, key, eps, confidence)
    depth, width, table = parse_cm_sketch(sketch)
    bc = _sketch_broadcast(df.sparkSession.sparkContext, sketch, (depth, width, table))

    @pandas_udf(LongType())
    def probe(keys: pd.Series) -> pd.Series:
        d, w, t = bc.value
        # null candidate keys estimate as NULL: count_min_sketch skips
        # nulls when building, so the sketch holds no count for them
        return pd.Series(
            pd.array(
                [
                    None if k is None else cm_estimate_string(d, w, t, k)
                    for k in keys
                ],
                dtype="Int64",
            )
        )

    # the sketch's totalCount is the exact stream length N — expose it
    # as a literal so CM-bound checks need no extra scan or scalar join
    total = struct.unpack_from(">q", sketch, 4)[0]
    return candidates.select(
        F.col(key),
        probe(F.col(key)).alias("est_count"),
        F.lit(total).cast("bigint").alias("n_total"),
    )


def topk_exact_vs_sketch(df: DataFrame, key: str, k: int = 5, eps: float = 0.001) -> DataFrame:
    """Exact top-k counts joined with their CM estimates — the
    accuracy check a sketch deployment ships with."""
    exact = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), key)
        .limit(k)
        .localCheckpoint(eager=False)  # feeds candidate + join sides once
    )
    est = heavy_hitters(df, key, exact.select(key), eps=eps)
    return exact.join(est, key).orderBy(F.desc("true_count"), key)


def bloom_membership(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    bits_per_key: int = 10,
    num_hashes: int = 7,
) -> DataFrame:
    """Bloom-filter membership probe in pure column algebra — the
    memory-bounded substitute for broadcasting a full membership set
    (the standard decontamination-at-scale structure: ~10 bits/key vs
    the keys themselves).

    Build keys map to ``num_hashes`` bit positions via
    Kirsch–Mitzenmacher double hashing (pos_j = h1 + j*h2 mod m) over
    ``xxhash64``; the distinct set-bit table (<= n_build*k longs,
    independent of key width) broadcasts. A probe row is flagged
    ``bloom_candidate`` iff ALL k of its positions are set — true
    bloom semantics: zero false negatives by construction, false
    positives at the designed rate (~0.8% at 10 bits/key, k=7).

    Probe rows must be distinct (they are re-grouped by all their
    columns around the position explode). One count() job sizes m off
    the build side — the small side by definition.
    """
    n_keys = build.select(key).distinct().count()
    m = max(1024, n_keys * bits_per_key)

    def positions(col: str):
        # pmod-first keeps every term < m so the int64 sum can't
        # overflow even under ANSI arithmetic at any realistic m
        h1 = F.pmod(F.xxhash64(F.col(col)), F.lit(m))
        h2 = F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(m))
        return F.array(
            *[F.pmod(h1 + F.lit(j) * h2, F.lit(m)) for j in range(num_hashes)]
        )

    bits = (
        build.select(F.explode(positions(key)).alias("_pos"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cols = probe.columns
    return (
        probe.withColumn("_pos", F.explode(positions(key)))
        .join(F.broadcast(bits), "_pos", "left")
        .groupBy(*cols)
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_hit"), F.lit(0))))
            .alias("bloom_candidate")
        )
    )


def merge_cm_bytes(a: bytes, b: bytes) -> bytes:
    """Merge two serialized CountMinSketch blobs (identical
    depth/width/seed) by cell-wise table addition. CM sketches are
    linear — every cell is a sum of per-row contributions — so the
    merge equals the sketch built over the concatenated streams
    BIT-FOR-BIT (same bytes, not just same estimates). This is the
    property that lets micro-batch / per-partition sketches roll up
    into one without accuracy loss."""
    import struct

    import numpy as np

    va, ta, da, wa = struct.unpack_from(">iqii", a, 0)
    vb, tb, db, wb = struct.unpack_from(">iqii", b, 0)
    if (va, da, wa) != (vb, db, wb):
        raise ValueError(
            f"incompatible sketches: {(va, da, wa)} vs {(vb, db, wb)}"
        )
    off = 4 + 8 + 4 + 4 + 8 * da
    if a[20:off] != b[20:off]:
        raise ValueError("hashA mismatch: sketches built with different seeds")
    ta_arr = np.frombuffer(a, dtype=">i8", count=da * wa, offset=off)
    tb_arr = np.frombuffer(b, dtype=">i8", count=da * wa, offset=off)
    merged = (ta_arr.astype("int64") + tb_arr.astype("int64")).astype(">i8")
    return struct.pack(">iqii", va, ta + tb, da, wa) + a[20:off] + merged.tobytes()
