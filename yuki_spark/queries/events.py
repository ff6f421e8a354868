"""Event-stream analytics (batch twins of the streaming module).

e2/e3 are the batch equivalents of the Structured Streaming
sessionization / windowed rollup in ``yuki_spark/streaming`` — the
driver-checkable form of the same semantics.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions import DEC

SESSION_GAP_MIN = 30


def e1_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


def e2_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag window."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def e17_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` gap aggregate on the batch path — the
    SAME operator ``streaming/stream.py::session_window_stats`` runs
    on a stream (stream/batch equivalence is pytest-asserted in
    tests/test_streaming.py), so this row is the streaming family's
    hard-signal anchor. Merge rule differs from e2 at the boundary:
    an event at exactly start+gap opens a NEW session (native strict-
    overlap semantics) where e2's strict-``>`` keeps it."""
    from ..streaming.stream import session_window_stats

    ev = load(spark, sf_dir, "events")
    return session_window_stats(ev).orderBy("user_id", "session_start")


def e3_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup (batch twin of the streaming windowed agg)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


def e4_user_asof_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks the latest strictly-earlier
    'view' value of the same user (window formulation — one shuffle on
    user_id, no range join explosion)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_val = F.when(F.col("event_type") == "view", F.col("value"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    out = (
        ev.withColumn("asof_view_value", F.last(view_val, ignorenulls=True).over(w))
        .withColumn("asof_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_view_ts", "asof_view_value"
    ).orderBy("event_id")


def e5_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase per user."""
    ev = load(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = ev.where(F.col("event_type") == "click").alias("c")
    first_click = (
        c.join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    p = ev.where(F.col("event_type") == "purchase")
    first_purchase = (
        p.join(first_click, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(first_click.agg(F.count(F.lit(1)).alias("n_click_users")))
        .crossJoin(first_purchase.agg(F.count(F.lit(1)).alias("n_purchase_users")))
    )


def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


def e18_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) beside daily actives (DAU),
    one row per observed day — the retention dashboard's backbone
    metric. A rolling COUNT(DISTINCT) cannot ride a window frame
    (distinct doesn't decompose), and the naive day×day range join is
    O(days²): instead each (day, user) pair *contributes itself
    forward* into the ≤7 target days it makes active
    (explode(sequence(day, day+6)) — a pure map), then one
    shuffle-on-day distinct count. The target-day set is pinned back
    to observed days with a broadcast join (days is a tiny dimension
    at any corpus scale — O(calendar), not O(rows))."""
    ev = load(spark, sf_dir, "events")
    # daily feeds three consumers (dau, days, contrib): materialize the
    # distinct once instead of re-scanning + re-shuffling per consumer
    daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    days = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.countDistinct("user_id").alias("n_users_1d"))
    contrib = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )
    return dau.join(wau, "day").orderBy("day")


GAP_FILL_MIN_VALUE = 300.0  # tail threshold -> genuinely sparse daily series


def e19_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify + forward fill: the daily high-value total
    per event type is a sparse series (most days have no tail event);
    emit one row per calendar day in each type's observed span, with
    missing days carried forward from the last observed value.

    Portable forward fill without IGNORE NULLS (dialect-dependent):
    ``grp`` counts non-null observations up to each row, so every gap
    row shares its grp with the last observed day, and a per-(type,
    grp) MAX recovers that value. Daily totals ride the exact decimal
    sum as integral micro-units (int64 — bit-identical everywhere).

    Scale shape: one shuffle to the daily grain, then the calendar is
    O(span) per type (a tiny dimension at any corpus scale); the two
    windows share one partitioning on event_type. No per-row Python."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value") > GAP_FILL_MIN_VALUE)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("dval"))
        .withColumn("di", (F.col("dval") * 1_000_000).cast("long"))
        .drop("dval")
    )
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    filled = cal.join(daily, ["event_type", "day"], "left").withColumn(
        "grp", F.count("di").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wg = Window.partitionBy("event_type", "grp")
    return (
        filled.withColumn("filled_di", F.max("di").over(wg))
        .withColumn("is_gap", F.col("di").isNull())
        .select("event_type", "day", "di", "filled_di", "is_gap")
        .orderBy("event_type", "day")
    )


MAD_K = 3.0 * 1.4826  # ~3 sigma under normality; inlined identically both sides


def e20_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation (MAD) instead of e13's moment-based z-score — the
    estimator a heavy-tailed value column actually needs (one wild
    point shifts mean/std but not median/MAD).

    Portable math: exact interpolated medians (percentile /
    quantile_cont share the (n-1)p rank definition), and the cutoff
    multiplies by one Python-repr'd constant inlined into both
    engines, so every comparison is the same IEEE expression tree.

    Scale shape: two median shuffles on event_type (5 groups) with the
    per-type stats broadcast back onto the fact scan each pass —
    map-side scoring, no sort of the full data."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("value") - F.col("med")))
        .groupBy("event_type")
        .agg(
            F.expr("percentile(adev, 0.5)").alias("mad"),
            F.max("med").alias("med"),
        )
        .where(F.col("mad") > 0)
    )
    cutoff = F.col("mad") * F.lit(MAD_K)
    adev = F.abs(F.col("value") - F.col("med"))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(F.when(adev > cutoff, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.max(adev / F.col("mad")).alias("max_score"),
        )
        .orderBy("event_type")
    )


def e8_error_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: each 'error' event opens a 10-minute window; count
    and sum all events landing in it (bucketized interval join — see
    operators/joins.range_join)."""
    from ..operators.joins import range_join

    ev = load(spark, sf_dir, "events")
    windows = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    joined = range_join(
        ev.select("ts", "value"), windows, "ts", "w_start", "w_end", bucket_sec=600
    )
    return (
        joined.groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("window_value"),
        )
        .orderBy("err_id")
    )


def e9_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` column
    (from_json with explicit schema — scans stay columnar; no
    per-row Python) and aggregate the extracted field."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


def e10_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram of event values per type — a pure map +
    one agg; the bucket arithmetic (floor(v/50)) is written with the
    identical double ops in both engines."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0.0, F.lit(0))
        .when(F.col("value") >= 500.0, F.lit(11))
        .otherwise(F.floor(F.col("value") / F.lit(50.0)) + 1)
    ).cast("bigint")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


def e12_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters, made deterministic for the oracle:
    exact top-5 counts plus ``est_ok`` asserting the sketch estimate
    obeys the CM guarantee (true ≤ est ≤ true + ⌈eps·N⌉). The oracle
    recomputes the exact side and expects the flag TRUE — a sketch
    regression flips the flag and fails the value hash."""
    from ..operators.sketches import topk_exact_vs_sketch

    eps = 0.001
    ev = load(spark, sf_dir, "events")
    # NOTE: construction runs the sketch build eagerly (one single-row
    # aggregate collect — the sketch bytes must reach the broadcast);
    # the candidate probe itself rides an executor-side pandas UDF and
    # the stream length N comes from the sketch's own totalCount, so
    # the query path has no candidate collect, no createDataFrame and
    # no scalar cross-join.
    r = topk_exact_vs_sketch(ev, "event_type", k=5, eps=eps)
    bound = (
        F.col("true_count")
        + (F.lit(eps) * F.col("n_total").cast("double")).cast("bigint")
        + F.lit(1)
    )
    return r.select(
        "event_type",
        "true_count",
        (
            (F.col("est_count") >= F.col("true_count"))
            & (F.col("est_count") <= bound)
        ).alias("est_ok"),
    ).orderBy(F.desc("true_count"), "event_type")


def e6_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type (the
    correctness twin of the percentile_approx/sketch scale path)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


def e7_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch path: percentile_approx (KLL-style) + HLL distinct — at
    100 TB these mergeable sketches replace exact sort/distinct. Made
    deterministic for the oracle: emit the *exact* percentiles and
    user count alongside boolean flags asserting each sketch lands
    within its published tolerance (rank error ≤ n/accuracy for
    percentile_approx; rsd-scaled relative error for HLL). The oracle
    recomputes the exact columns and expects TRUE flags, so a sketch
    accuracy regression fails the value hash."""
    accuracy = 10000
    ev = load(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, accuracy).alias("a50"),
        F.percentile_approx("value", 0.99, accuracy).alias("a99"),
        F.approx_count_distinct("user_id").alias("au"),
    )
    per = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") <= F.col("a50"), 1).otherwise(0)).alias("r50"),
            F.sum(F.when(F.col("value") <= F.col("a99"), 1).otherwise(0)).alias("r99"),
            F.sum(F.when(F.col("value") < F.col("a50"), 1).otherwise(0)).alias("r50lt"),
            F.sum(F.when(F.col("value") < F.col("a99"), 1).otherwise(0)).alias("r99lt"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.countDistinct("user_id").alias("n_users"),
            F.first("au").alias("au"),
        )
    )
    # percentile_approx returns a real element whose rank is within
    # n/accuracy of the target rank. A tied value occupies the rank
    # interval [r_lt+1, r_le]; the sketch met its guarantee iff that
    # interval overlaps [target - tol, target + tol] — checking only
    # r_le would flag correct sketches on heavily-tied data (a value
    # with 1000 duplicates puts r_le ~1000 past the target).
    rank_tol = F.col("n").cast("double") / accuracy + 1.0

    def _rank_ok(r_le: str, r_lt: str, q: float):
        target = F.lit(q) * F.col("n").cast("double")
        return (F.col(r_le).cast("double") >= target - rank_tol) & (
            F.col(r_lt).cast("double") + 1.0 <= target + rank_tol
        )

    return per.select(
        "event_type",
        "p50",
        "p99",
        "n_users",
        _rank_ok("r50", "r50lt", 0.5).alias("p50_rank_ok"),
        _rank_ok("r99", "r99lt", 0.99).alias("p99_rank_ok"),
        (
            F.abs(F.col("au").cast("double") - F.col("n_users").cast("double"))
            <= 0.15 * F.col("n_users").cast("double")
        ).alias("users_ok"),
    ).orderBy("event_type")


def e13_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: per-type z-score outliers (|z| > 3).

    Portable math: moments via exact decimal sums; mean/var/std/z by
    the same IEEE double expression tree in both engines (var =
    s2/n − mean², std = sqrt — correctly-rounded per IEEE, so
    bit-identical). The per-type stats broadcast back onto the fact
    scan: one shuffle for the moments, a map-side join for scoring."""
    ev = load(spark, sf_dir, "events")
    st = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("s1"),
            F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double").alias("s2"),
        )
        .withColumn("mean_value", F.col("s1") / F.col("n_events"))
        .withColumn(
            "var_value",
            F.col("s2") / F.col("n_events") - F.col("mean_value") * F.col("mean_value"),
        )
        .where(F.col("var_value") > 0)
        .withColumn("std_value", F.sqrt("var_value"))
    )
    z = F.abs((F.col("value") - F.col("mean_value")) / F.col("std_value"))
    return (
        ev.join(F.broadcast(st), "event_type")
        .withColumn("abs_z", z)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("mean_value").alias("mean_value"),
            F.max("std_value").alias("std_value"),
            F.sum(F.when(F.col("abs_z") > 3.0, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.max("abs_z").alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


EWMA_SPAN = 16  # lookback rows; alpha = 1/2 so weights are exact 2^-k


def e14_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue-like
    value per event type (trend smoothing with alpha = 1/2).

    Portability trick: 2^-k weights are exact binary fractions, and
    daily totals come out of the decimal-exact sum as integral
    micro-units, so the weighted numerator is a pure int64 sum —
    order-independent and bit-identical in any engine. The window is
    a lag-chain per type: one shuffle on event_type, O(span) columns,
    no per-row Python."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("dval"))
        # DECIMAL(…,6) × 10^6 is integral: exact micro-units
        .withColumn("di", (F.col("dval") * 1_000_000).cast("long"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    for k in range(EWMA_SPAN):
        term = F.coalesce(F.lag("di", k).over(w), F.lit(0)) * F.lit(
            1 << (EWMA_SPAN - 1 - k)
        )
        num = term if num is None else num + term
    # EWMA = Σ di_{t-k}·2^{S-1-k} / (2^S − 1), back to units via 10^6
    denom = float(((1 << EWMA_SPAN) - 1)) * 1_000_000.0
    return (
        daily.withColumn("ewma", num.cast("double") / F.lit(denom))
        .select("event_type", "day", "di", "ewma")
        .orderBy("event_type", "day")
    )


def e15_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the (Monday-truncated)
    week of their first event; for each (cohort_week, weeks elapsed)
    the distinct users still active, plus the retention fraction vs
    the cohort's week-0 size.

    Scale shape: one shuffle to find each user's first week, one
    user-keyed join (co-partitioned with the distinct), one final
    rollup — the cohort matrix itself is tiny (weeks²). week_idx is
    exact: both engines Monday-truncate, so the day delta is always a
    multiple of 7."""
    ev = load(spark, sf_dir, "events")
    weeks = ev.select("user_id", F.date_trunc("week", "ts").alias("week"))
    first = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = weeks.distinct().join(first, "user_id")
    per = (
        act.withColumn(
            "week_idx", (F.datediff("week", "cohort_week") / 7).cast("bigint")
        )
        .groupBy("cohort_week", "week_idx")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    wc = Window.partitionBy("cohort_week")
    cohort_size = F.max(F.when(F.col("week_idx") == 0, F.col("n_users"))).over(wc)
    return (
        per.withColumn("cohort_size", cohort_size)
        .withColumn(
            "retention",
            F.col("n_users").cast("double") / F.col("cohort_size").cast("double"),
        )
        .orderBy("cohort_week", "week_idx")
    )


def e16_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over event types: per user, each event
    transitions from the previous event's type (lag window, ties broken
    by event_id so the chain is deterministic). Reports transition
    counts, distinct users making the transition, and the row-normalized
    transition fraction. One shuffle on user_id + one rollup."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("from_type", F.lag("event_type").over(w)).where(
        F.col("from_type").isNotNull()
    )
    per = t.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wf = Window.partitionBy("from_type")
    return (
        per.withColumn(
            "frac",
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(wf).cast("double"),
        )
        .orderBy("from_type", "to_type")
    )


# CUSUM drift flag fires when |S_t| > D*sqrt(T*D) / 10, tested in the
# cross-multiplied exact-int form  100*S^2 > T*D^3  (no sqrt, no
# float).  The sqrt(T) scaling keeps the threshold relative to the
# random walk's natural Poisson magnitude at any volume, and the /10
# sensitivity is calibrated so ordinary fluctuation occasionally
# crosses it — both flag branches are exercised at every test sf.
CUSUM_NUM = 100  # (10)^2 from the cross-multiplied /10


def e21_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over daily event volume per type (Page
    1954): the running sum of each day's deviation from the
    partition mean drifts away from zero when the underlying rate
    shifts — the standard drift detector a pipeline runs over its
    ingest volumes.

    Portability: the day-mean T/D is rational, so deviations are kept
    ×D — ``dev = n*D - T`` — making the running sum an exact int64
    chain whose sign/threshold comparisons are bit-identical in any
    engine (no float mean, no rounding). The flag threshold
    |S_t| > D*sqrt(T*D)/10 is likewise tested sqrt-free in the
    cross-multiplied exact-int form 100*S^2 > T*D^3.

    Zero-day completeness: a type that STOPS emitting is the most
    drastic rate shift of all, but absent days produce no groupBy
    row — so the daily table is densified against the global observed
    calendar (single-row min/max bounds broadcast + sequence/explode,
    e19's densify pattern) and missing (type, day) cells count 0.
    An ingest outage therefore drives dev = -T per silent day and the
    flag fires instead of the detector going blind.

    Scale shape: one shuffle to the (type, day) grain (partial
    count map-side), then two windows over the *aggregated* daily
    table (types × days rows — tiny) on one partitioning. int64
    bounds: dev and S are exact int64 (|S| <= T*D, safe to ~1e14
    event-days); the SQUARED threshold comparison runs in double
    with identical IEEE multiply order on both engines — exact-int
    squares would overflow at the decade-spanning stress grain."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    observed = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    daily = grid.join(observed, ["event_type", "day"], "left").withColumn(
        "n_events", F.coalesce("n_events", F.lit(0).cast("bigint"))
    )
    wp = Window.partitionBy("event_type")
    wr = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.withColumn("total", F.sum("n_events").over(wp))
        .withColumn("n_days", F.count(F.lit(1)).over(wp))
        .withColumn("dev", F.col("n_events") * F.col("n_days") - F.col("total"))
        .withColumn("cusum", F.sum("dev").over(wr))
        .select(
            "event_type",
            "day",
            "n_events",
            "dev",
            "cusum",
            # threshold comparison in DOUBLE: S and T*D stay exact
            # int64 (safe to ~1e14 event-days) but their SQUARES
            # overflow int64 at the decade-spanning 10x stress grain;
            # identical IEEE multiply order on both engines keeps the
            # comparison bit-identical (tools/stress.py regression)
            (
                F.col("cusum").cast("double")
                * F.col("cusum").cast("double")
                * F.lit(float(CUSUM_NUM))
                > F.col("total").cast("double")
                * F.col("n_days").cast("double")
                * F.col("n_days").cast("double")
                * F.col("n_days").cast("double")
            ).alias("drift"),
        )
        .orderBy("event_type", "day")
    )


PSI_BINS = 12  # e10's fixed value-histogram domain: buckets 0..11
PSI_SPLIT_DAY = "2024-01-15"  # events span January; halves at mid-month


def e22_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift per event type between the
    two halves of the month — the distribution-shift alarm a data
    pipeline runs between ingest windows (PSI is the standard
    monitoring statistic; > 0.1–0.25 flags actionable drift). The
    value distribution uses e10's fixed 12-bucket histogram; counts
    are Laplace-smoothed (+1 per bucket) so empty buckets are
    well-defined, and PSI = Σ_bins (p1−p2)·log2(p1/p2) in bits.

    Portability: the log ratio decomposes into four portable-log2
    terms over INTEGERS — (l2(c1+1) − l2(N1+B)) − (l2(c2+1) −
    l2(N2+B)) — via functions.with_plog2 (libm-free, bit-identical
    across engines); the per-bin products quantize to DECIMAL(18,6)
    before the per-type sum, making the total order-independent.
    Scale: one groupBy over (type, half, bucket) — the PSI math runs
    on the ~type×12 aggregated grid, not per event."""
    from ..functions import DEC, with_plog2

    ev = load(spark, sf_dir, "events")
    half = F.when(
        F.to_date("ts") <= F.lit(PSI_SPLIT_DAY).cast("date"), F.lit(1)
    ).otherwise(F.lit(2))
    bucket = (
        F.when(F.col("value") < 0.0, F.lit(0))
        .when(F.col("value") >= 500.0, F.lit(11))
        .otherwise(F.floor(F.col("value") / F.lit(50.0)) + 1)
    ).cast("bigint")
    counts = (
        ev.select("event_type", half.alias("half"), bucket.alias("bucket"))
        .groupBy("event_type", "half", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(
            # 12-row constant dimension — broadcast so the densify is
            # a bounded BNLJ, never a cartesian shuffle
            F.broadcast(spark.range(PSI_BINS).select(F.col("id").alias("bucket")))
        )
    )
    c1 = counts.where(F.col("half") == 1).select(
        "event_type", "bucket", F.col("c").alias("c1")
    )
    c2 = counts.where(F.col("half") == 2).select(
        "event_type", "bucket", F.col("c").alias("c2")
    )
    g = (
        grid.join(c1, ["event_type", "bucket"], "left")
        .join(c2, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        # feeds totals AND the per-bin math: checkpoint the (tiny,
        # type×12) grid once so the densify subtree isn't recomputed
        .localCheckpoint(eager=False)
    )
    totals = g.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    g = (
        g.join(totals, "event_type")
        .withColumn("c1p", F.col("c1") + F.lit(1))
        .withColumn("c2p", F.col("c2") + F.lit(1))
        .withColumn("n1p", F.col("n1") + F.lit(PSI_BINS))
        .withColumn("n2p", F.col("n2") + F.lit(PSI_BINS))
    )
    # ONE portable-log2 chain over the four integers in long format
    # (stack → chain → pivot back): four separate chains quadruple the
    # driver-side plan-analysis cost (~4 s of build per call measured)
    # for identical values — the chain is the same pure function of
    # its integer input either way
    long = g.selectExpr(
        "event_type",
        "bucket",
        "stack(4, 'l2c1', c1p, 'l2c2', c2p, 'l2n1', n1p, 'l2n2', n2p) AS (role, v)",
    )
    long = with_plog2(long, "v", "l2")
    wide = (
        long.groupBy("event_type", "bucket")
        .pivot("role", ["l2c1", "l2c2", "l2n1", "l2n2"])
        .agg(F.first("l2"))
    )
    g = g.join(wide, ["event_type", "bucket"])
    p1 = F.col("c1p").cast("double") / F.col("n1p").cast("double")
    p2 = F.col("c2p").cast("double") / F.col("n2p").cast("double")
    lratio = (F.col("l2c1") - F.col("l2n1")) - (F.col("l2c2") - F.col("l2n2"))
    term = ((p1 - p2) * lratio).cast(DEC)
    return (
        g.select("event_type", "n1", "n2", term.alias("term"))
        .groupBy("event_type", "n1", "n2")
        .agg(F.sum("term").cast("double").alias("psi_bits"))
        .withColumn("drifted", F.col("psi_bits") > F.lit(0.01))
        .orderBy("event_type")
    )


SEASON_DAYS = 7
SEASONAL_K = 3.0  # MAD multiples before a day is anomalous


def e23_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly scan over daily event volume per type: the
    seasonal-naive residual (today − same weekday last week) removes
    weekly seasonality that absolute-volume detectors (e21's CUSUM)
    average away, then residual days beyond ``SEASONAL_K`` MADs of
    the per-type residual median are flagged — e20's robust-outlier
    estimator applied at the forecast-residual grain, the standard
    shape of an ops volume monitor.

    Portability: residuals are exact integer differences over the
    densified calendar (e21's zero-day completeness — a silent day
    residuals hard negative instead of disappearing); medians/MADs
    use the exact interpolated percentile both engines share; the
    cutoff multiplies one repr'd constant. Scale: one shuffle to the
    (type, day) grain, then windows/medians over the tiny aggregated
    table."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    observed = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    daily = grid.join(observed, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = (
        daily.withColumn(
            "resid", F.col("n_events") - F.lag("n_events", SEASON_DAYS).over(w)
        )
        .where(F.col("resid").isNotNull())
        .localCheckpoint(eager=False)  # feeds med, mad, and the scan
    )
    med = r.groupBy("event_type").agg(
        F.expr("percentile(resid, 0.5)").alias("med")
    )
    mad = (
        r.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("resid") - F.col("med")))
        .groupBy("event_type")
        .agg(
            F.expr("percentile(adev, 0.5)").alias("mad"),
            F.max("med").alias("med"),
        )
        .where(F.col("mad") > 0)
    )
    adev = F.abs(F.col("resid") - F.col("med"))
    return (
        r.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            "resid",
            (adev > F.col("mad") * F.lit(SEASONAL_K)).alias("anomaly"),
        )
        .orderBy("event_type", "day")
    )


E24_TOP = 20


def e24_common_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory mining: the top-20 most frequent 3-event-type paths
    across user timelines — e16's Markov transition matrix extended to
    3-gram sequences (funnel DISCOVERY: which concrete paths dominate,
    before e5's fixed-funnel measurement). Deterministic chain order
    (ts, event_id tiebreak — e16's rule); occurrence and distinct-user
    counts per path; top-k ties broken by path string (ASCII, so both
    engines sort identically).

    Scale shape: one user_id shuffle for the lead window (shared
    partitioning with the whole per-user family), one path hash-agg
    with map-side combine, distributed top-k — no joins, no state
    beyond the window."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        t.select(
            "user_id",
            F.concat_ws(">", "event_type", "t1", "t2").alias("path"),
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(E24_TOP)
    )


def e25_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process audit: the inter-event gap distribution along
    each user's timeline, attributed to the LATER event's type — the
    cadence profile (how long users idle before each action) that
    complements e6's value distribution and e2's fixed-gap sessions.
    Gaps are exact integer microseconds (unix_micros / epoch_us on
    both engines), chain order is the family's deterministic
    (ts, event_id) rule, so attribution under timestamp ties is
    engine-independent.

    Scale shape: one user_id window shuffle — the SAME partitioning
    the whole per-user family (e2/e16/e24) reuses — then one
    hash-agg by event_type. Exact percentile() is the correctness
    anchor here; at 100 TB the sketch path demonstrated by e7
    (percentile_approx) swaps in with one function change."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").alias("total_gap_us"),
            F.expr("percentile(gap_us, 0.5)").alias("p50_gap_us"),
            F.expr("percentile(gap_us, 0.9)").alias("p90_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


def e26_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distributions for e5's funnel: per stage
    transition (first view → first subsequent click, first click →
    first subsequent purchase) the exact-µs latency profile — e5
    measures HOW MANY users convert, this measures HOW LONG conversion
    takes, the other half of any funnel report. First-event semantics
    are e5's exactly (min ts per user, each stage anchored at-or-after
    the previous stage's timestamp), latencies are exact integer
    microseconds (unix_micros / epoch_us), and the exact percentile()
    anchors correctness per e25's discipline.

    Scale shape: same as e5 — per-user min-aggregates (map-side
    combine) joined user_id-to-user_id (AQE picks broadcast at small
    sf, SMJ at scale), then one tiny hash-agg over two stage labels.
    No window, no state; the stage union is two narrow projections."""
    ev = load(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    first_click = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_click.select("user_id", "t_click"), "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id", "t_click")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = first_click.select(
        F.lit("view>click").alias("stage"),
        (F.unix_micros(F.col("t_click")) - F.unix_micros(F.col("t_view"))).alias(
            "lat_us"
        ),
    ).unionAll(
        first_purchase.select(
            F.lit("click>purchase").alias("stage"),
            (
                F.unix_micros(F.col("t_purchase")) - F.unix_micros(F.col("t_click"))
            ).alias("lat_us"),
        )
    )
    return (
        lat.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("lat_us").alias("total_lat_us"),
            F.expr("percentile(lat_us, 0.5)").alias("p50_lat_us"),
            F.expr("percentile(lat_us, 0.9)").alias("p90_lat_us"),
            F.max("lat_us").alias("max_lat_us"),
        )
        .orderBy("stage")
    )


def e27_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: split users into two variants by the
    portable 60-bit hash of their user_id (the deterministic bucketing
    an A/B platform applies at assignment time), then compare purchase
    conversion and revenue per variant — the readout every growth team
    runs over this exact event shape. Conversion is exact-integer
    (per-user max over a purchase flag), revenue sums pass through
    DECIMAL(18,6) so float order cannot drift the totals, and the
    hash assignment is engine-identical, so the DuckDB twin reproduces
    both rows bit-for-bit.

    Scale shape: one user_id hash-agg (map-side combined) then a
    two-row variant rollup — one shuffle at the user grain, nothing
    else. The variant expression is pure codegen (md5 + mod)."""
    from ..functions import portable_hash60

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        ).alias("pval"),
    )
    variant = portable_hash60(F.col("user_id").cast("string")) % 2
    return (
        u.select(
            variant.alias("variant"),
            "converted",
            "pval",
        )
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
                "conv_rate"
            ),
            F.sum("pval").cast("double").alias("purchase_value"),
        )
        .orderBy("variant")
    )


def e29_trending_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily trending leaderboard: per-day event-type ranks (count
    desc, event_type tiebreak), top-3 rows per day, each carrying the
    type's rank at its PREVIOUS observation and a trend tag
    (new/up/down/flat) — the ops dashboard query behind "what moved
    today", complementing e12 (global heavy hitters) with the
    time-sliced view. Ranks are computed over ALL types per day
    before the top-3 cut, so a type storming in from rank 7 shows its
    true delta.

    Scale shape: one (day × type) hash-agg off the scan, then two
    windows over the aggregated grid (days × types — tiny at any
    corpus size). Exact integer counts/ranks end-to-end."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wd = Window.partitionBy("day").orderBy(F.desc("n_events"), "event_type")
    ranked = daily.withColumn("rnk", F.row_number().over(wd).cast("bigint"))
    wt = Window.partitionBy("event_type").orderBy("day")
    trended = ranked.withColumn("prev_rnk", F.lag("rnk").over(wt))
    trend = (
        F.when(F.col("prev_rnk").isNull(), F.lit("new"))
        .when(F.col("prev_rnk") > F.col("rnk"), F.lit("up"))
        .when(F.col("prev_rnk") < F.col("rnk"), F.lit("down"))
        .otherwise(F.lit("flat"))
    )
    return (
        trended.where(F.col("rnk") <= 3)
        .select("day", "event_type", "n_events", "rnk", "prev_rnk", trend.alias("trend"))
        .orderBy("day", "rnk")
    )


def e28_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user counting vs exact truth — the batch
    twin of the streaming drift monitor's HLL accumulator, completing
    the sketch accuracy matrix (e12 pins Count-Min, e7 pins the
    quantile sketch, this pins Spark's approx_count_distinct). Output
    carries the exact count plus ``est_ok`` asserting the estimate
    lands within the documented rsd envelope (2% rsd → 10%+5 slack
    here); the oracle recomputes the exact side and expects the flag
    TRUE, so an HLL accuracy regression breaks the value hash.

    SPARK-VERSION-SENSITIVE (intentional accuracy pin): the gate hash
    couples to approx_count_distinct's HLL++ bias correction. A Spark
    upgrade that re-tunes the estimator can flip ``est_ok`` with no
    data regression — if a version bump breaks this key, widen the
    slack (the pin's job is to catch accuracy REGRESSIONS, not to
    freeze the exact estimator bytes).

    Scale shape: one hash-agg per event_type; the HLL partials merge
    map-side — at 100 TB this is exactly the cardinality pattern that
    replaces COUNT(DISTINCT)'s expensive exact shuffle."""
    ev = load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.02).alias("est_raw"),
    )
    slack = (
        (F.col("n_users").cast("double") * F.lit(0.1)).cast("bigint") + F.lit(5)
    )
    return per.select(
        "event_type",
        "n_users",
        (
            (F.col("est_raw") >= F.col("n_users") - slack)
            & (F.col("est_raw") <= F.col("n_users") + slack)
        ).alias("est_ok"),
    ).orderBy("event_type")


QUERIES = {
    "e24_common_paths": e24_common_paths,
    "e27_ab_lift": e27_ab_lift,
    "e28_hll_users": e28_hll_users,
    "e29_trending_events": e29_trending_events,
    "e25_interarrival": e25_interarrival,
    "e26_funnel_latency": e26_funnel_latency,
    "e22_psi_drift": e22_psi_drift,
    "e23_seasonal_anomaly": e23_seasonal_anomaly,
    "e13_zscore_outliers": e13_zscore_outliers,
    "e15_retention_cohorts": e15_retention_cohorts,
    "e16_event_transitions": e16_event_transitions,
    "e14_ewma_daily": e14_ewma_daily,
    "e1_event_counts": e1_event_counts,
    "e6_value_percentiles": e6_value_percentiles,
    "e8_error_window_stats": e8_error_window_stats,
    "e9_json_props_stats": e9_json_props_stats,
    "e10_value_histogram": e10_value_histogram,
    "e12_heavy_hitters": e12_heavy_hitters,
    "e7_value_percentiles_approx": e7_value_percentiles_approx,
    "e2_sessionization": e2_sessionization,
    "e17_session_window_stats": e17_session_window_stats,
    "e3_hourly_rollup": e3_hourly_rollup,
    "e4_user_asof_value": e4_user_asof_value,
    "e5_funnel": e5_funnel,
    "e18_rolling_active_users": e18_rolling_active_users,
    "e19_gap_fill": e19_gap_fill,
    "e20_mad_outliers": e20_mad_outliers,
    "e21_cusum_drift": e21_cusum_drift,
    "distinct_users_daily": distinct_users_daily,
}

_EWMA_TERMS = " + ".join(
    f"COALESCE(lag(di, {k}) OVER w, 0) * {1 << (EWMA_SPAN - 1 - k)}"
    for k in range(EWMA_SPAN)
)


def _e22_oracle() -> str:
    """Twin of e22_psi_drift. The four portable-log2 chains are
    PER-STEP CTE chains (functions.sql_plog2_ctes): the lateral-alias
    form costs ~7 s of DuckDB binder time PER CHAIN (substitution
    re-expands every intermediate), which made this twin the
    second-slowest test in the suite; column-referencing steps bind
    in milliseconds with bit-identical output."""
    from ..functions import sql_plog2_ctes

    def layer(name: str, src: str, col: str, out: str) -> str:
        return sql_plog2_ctes(name, src, col, out, max_bits=33)

    return f"""
        WITH counts AS (
          SELECT event_type,
                 CASE WHEN CAST(ts AS DATE) <= DATE '{PSI_SPLIT_DAY}'
                      THEN 1 ELSE 2 END AS half,
                 CAST(CASE WHEN value < 0.0 THEN 0
                           WHEN value >= 500.0 THEN 11
                           ELSE floor(value / 50.0) + 1 END AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2, 3),
        grid AS (
          SELECT t.event_type, b.range AS bucket
          FROM (SELECT DISTINCT event_type FROM counts) t,
               range(0, {PSI_BINS}) b),
        g0 AS (
          SELECT grid.event_type, grid.bucket,
                 COALESCE(h1.c, 0) AS c1, COALESCE(h2.c, 0) AS c2
          FROM grid
          LEFT JOIN counts h1 ON h1.event_type = grid.event_type
                             AND h1.bucket = grid.bucket AND h1.half = 1
          LEFT JOIN counts h2 ON h2.event_type = grid.event_type
                             AND h2.bucket = grid.bucket AND h2.half = 2),
        tot AS (SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
                       CAST(SUM(c2) AS BIGINT) AS n2
                FROM g0 GROUP BY event_type),
        g1 AS (
          SELECT g0.*, tot.n1, tot.n2,
                 g0.c1 + 1 AS c1p, g0.c2 + 1 AS c2p,
                 tot.n1 + {PSI_BINS} AS n1p, tot.n2 + {PSI_BINS} AS n2p
          FROM g0 JOIN tot USING (event_type)),
        {layer("ga", "g1", "c1p", "l2c1")},
        {layer("gb", "ga", "c2p", "l2c2")},
        {layer("gc", "gb", "n1p", "l2n1")},
        {layer("gd", "gc", "n2p", "l2n2")},
        terms AS (
          SELECT event_type, n1, n2,
                 CAST((CAST(c1p AS DOUBLE) / CAST(n1p AS DOUBLE)
                       - CAST(c2p AS DOUBLE) / CAST(n2p AS DOUBLE))
                      * ((l2c1 - l2n1) - (l2c2 - l2n2))
                      AS DECIMAL(18,6)) AS term
          FROM gd)
        SELECT event_type, n1, n2,
               CAST(SUM(term) AS DOUBLE) AS psi_bits,
               CAST(SUM(term) AS DOUBLE) > 0.01 AS drifted
        FROM terms GROUP BY event_type, n1, n2 ORDER BY event_type
    """


ORACLE = {
    "e22_psi_drift": _e22_oracle(),
    "e23_seasonal_anomaly": f"""
        WITH bounds AS (
          SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
                 CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
          FROM events),
        cal AS (
          SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
          FROM bounds),
        grid AS (
          SELECT event_type, day
          FROM (SELECT DISTINCT event_type FROM events), cal),
        obs AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        daily AS (
          SELECT g.event_type, g.day, COALESCE(o.n_events, 0) AS n_events
          FROM grid g LEFT JOIN obs o
            ON g.event_type = o.event_type AND g.day = o.day),
        r AS (
          SELECT event_type, day, n_events,
                 n_events - lag(n_events, {SEASON_DAYS})
                   OVER (PARTITION BY event_type ORDER BY day) AS resid
          FROM daily
          QUALIFY resid IS NOT NULL),
        med AS (
          SELECT event_type, quantile_cont(resid, 0.5) AS med
          FROM r GROUP BY event_type),
        mad AS (
          SELECT r.event_type,
                 quantile_cont(abs(r.resid - med.med), 0.5) AS mad,
                 MAX(med.med) AS med
          FROM r JOIN med USING (event_type)
          GROUP BY r.event_type
          HAVING quantile_cont(abs(r.resid - med.med), 0.5) > 0)
        SELECT r.event_type, r.day, r.n_events,
               CAST(r.resid AS BIGINT) AS resid,
               abs(r.resid - mad.med) > mad.mad * {SEASONAL_K!r} AS anomaly
        FROM r JOIN mad USING (event_type)
        ORDER BY r.event_type, r.day
    """,
    "e15_retention_cohorts": """
        WITH weeks AS (
          SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
          FROM events),
        first AS (
          SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
        act AS (
          SELECT DISTINCT w.user_id, w.week, f.cohort_week
          FROM weeks w JOIN first f USING (user_id)),
        per AS (
          SELECT cohort_week,
                 CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_idx,
                 COUNT(DISTINCT user_id) AS n_users
          FROM act GROUP BY 1, 2)
        SELECT cohort_week, week_idx, n_users,
               CAST(MAX(CASE WHEN week_idx = 0 THEN n_users END)
                 OVER (PARTITION BY cohort_week) AS BIGINT) AS cohort_size,
               CAST(n_users AS DOUBLE)
                 / CAST(MAX(CASE WHEN week_idx = 0 THEN n_users END)
                     OVER (PARTITION BY cohort_week) AS DOUBLE) AS retention
        FROM per ORDER BY cohort_week, week_idx
    """,
    "e24_common_paths": f"""
        WITH t AS (
          SELECT user_id, event_type,
                 lead(event_type, 1) OVER w AS t1,
                 lead(event_type, 2) OVER w AS t2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        p AS (
          SELECT user_id, event_type || '>' || t1 || '>' || t2 AS path
          FROM t WHERE t2 IS NOT NULL)
        SELECT path, COUNT(*) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM p GROUP BY path
        ORDER BY n_occurrences DESC, path LIMIT {E24_TOP}
    """,
    "e16_event_transitions": """
        WITH t AS (
          SELECT user_id, event_type AS to_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS from_type
          FROM events),
        per AS (
          SELECT from_type, to_type, COUNT(*) AS n_trans,
                 COUNT(DISTINCT user_id) AS n_users
          FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n_trans, n_users,
               CAST(n_trans AS DOUBLE)
                 / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS frac
        FROM per ORDER BY from_type, to_type
    """,
    "e14_ewma_daily": f"""
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 SUM(CAST(value AS DECIMAL(18,6))) AS dval
          FROM events GROUP BY 1, 2),
        d2 AS (SELECT event_type, day, CAST(dval * 1000000 AS BIGINT) AS di
               FROM daily),
        l AS (SELECT event_type, day, di, {_EWMA_TERMS} AS num
              FROM d2 WINDOW w AS (PARTITION BY event_type ORDER BY day))
        SELECT event_type, day, di,
               CAST(num AS DOUBLE) / {float((1 << EWMA_SPAN) - 1) * 1_000_000.0} AS ewma
        FROM l ORDER BY event_type, day
    """,
    "e21_cusum_drift": f"""
        WITH bounds AS (
          SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
                 CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
          FROM events),
        cal AS (
          SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
          FROM bounds),
        grid AS (
          SELECT event_type, day
          FROM (SELECT DISTINCT event_type FROM events), cal),
        obs AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        daily AS (
          SELECT g.event_type, g.day, COALESCE(o.n_events, 0) AS n_events
          FROM grid g LEFT JOIN obs o
            ON g.event_type = o.event_type AND g.day = o.day),
        d AS (
          SELECT event_type, day, n_events,
                 SUM(n_events) OVER (PARTITION BY event_type) AS total,
                 COUNT(*) OVER (PARTITION BY event_type) AS n_days
          FROM daily),
        c AS (
          SELECT event_type, day, n_events,
                 CAST(n_events * n_days - total AS BIGINT) AS dev,
                 CAST(SUM(n_events * n_days - total) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cusum,
                 total, n_days
          FROM d)
        SELECT event_type, day, n_events, dev, cusum,
               CAST(cusum AS DOUBLE) * CAST(cusum AS DOUBLE)
                 * CAST({CUSUM_NUM} AS DOUBLE)
                 > CAST(total AS DOUBLE) * CAST(n_days AS DOUBLE)
                   * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                 AS drift
        FROM c ORDER BY event_type, day
    """,
    "e13_zscore_outliers": """
        WITH st AS (
          SELECT event_type, COUNT(*) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
          FROM events GROUP BY event_type),
        m AS (
          SELECT event_type, n_events, s1 / n_events AS mean_value,
                 s2 / n_events - (s1 / n_events) * (s1 / n_events) AS var_value
          FROM st),
        sd AS (
          SELECT event_type, mean_value, sqrt(var_value) AS std_value
          FROM m WHERE var_value > 0)
        SELECT e.event_type, COUNT(*) AS n_events,
               MAX(mean_value) AS mean_value,
               MAX(std_value) AS std_value,
               CAST(SUM(CASE WHEN abs((e.value - mean_value) / std_value) > 3.0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               MAX(abs((e.value - mean_value) / std_value)) AS max_abs_z
        FROM events e JOIN sd USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    "e10_value_histogram": """
        SELECT event_type,
               CAST(CASE WHEN value < 0.0 THEN 0
                         WHEN value >= 500.0 THEN 11
                         ELSE floor(value / 50.0) + 1 END AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY event_type, bucket ORDER BY event_type, bucket
    """,
    "e9_json_props_stats": """
        SELECT event_type,
               COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "e8_error_window_stats": """
        WITH w AS (
          SELECT event_id AS err_id, ts AS w_start,
                 ts + INTERVAL 10 MINUTE AS w_end
          FROM events WHERE event_type = 'error')
        SELECT err_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS window_value
        FROM w JOIN events p ON p.ts >= w.w_start AND p.ts <= w.w_end
        GROUP BY err_id ORDER BY err_id
    """,
    # e7/e12 twins recompute the exact columns and pin the tolerance
    # flags TRUE — the Spark side computes the flags from the live
    # sketches, so an accuracy regression breaks the value hash
    "e7_value_percentiles_approx": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.99) AS p99,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               TRUE AS p50_rank_ok, TRUE AS p99_rank_ok, TRUE AS users_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "e12_heavy_hitters": """
        SELECT event_type, COUNT(*) AS true_count, TRUE AS est_ok
        FROM events GROUP BY event_type
        ORDER BY true_count DESC, event_type LIMIT 5
    """,
    # chain order (ts, event_id) matches the Spark window exactly;
    # epoch_us/unix_micros are both integer-µs views of the same
    # parquet NANOS column, so gaps are exact-integer on both engines
    # e12's discipline: the oracle recomputes the exact side and pins
    # the tolerance flag TRUE — an HLL regression breaks the hash
    "e28_hll_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               TRUE AS est_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "e29_trending_events": """
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 event_type, COUNT(*) AS n_events
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT day, event_type, n_events,
                 CAST(ROW_NUMBER() OVER (PARTITION BY day
                        ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
          FROM daily),
        trended AS (
          SELECT *, LAG(rnk) OVER (PARTITION BY event_type ORDER BY day)
                      AS prev_rnk
          FROM ranked)
        SELECT day, event_type, n_events, rnk, prev_rnk,
               CASE WHEN prev_rnk IS NULL THEN 'new'
                    WHEN prev_rnk > rnk THEN 'up'
                    WHEN prev_rnk < rnk THEN 'down'
                    ELSE 'flat' END AS trend
        FROM trended WHERE rnk <= 3
        ORDER BY day, rnk
    """,
    # variant = portable hash of the DECIMAL-free user_id string, so
    # assignment is engine-identical; revenue passes through DECIMAL
    "e27_ab_lift": """
        WITH u AS (
          SELECT user_id,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % 2 AS variant,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
                 SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(value AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS pval
          FROM events GROUP BY user_id)
        SELECT variant, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate,
               CAST(SUM(pval) AS DOUBLE) AS purchase_value
        FROM u GROUP BY variant ORDER BY variant
    """,
    # e5's CTE chain extended with stage latencies; epoch_us diffs are
    # exact-integer on both engines, quantile_cont twins percentile()
    "e26_funnel_latency": """
        WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        fc AS (SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts >= v.t_view
               GROUP BY e.user_id, v.t_view),
        fp AS (SELECT e.user_id, fc.t_click, MIN(e.ts) AS t_purchase
               FROM events e JOIN fc ON e.user_id = fc.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= fc.t_click
               GROUP BY e.user_id, fc.t_click),
        lat AS (
          SELECT 'view>click' AS stage,
                 CAST(epoch_us(t_click) - epoch_us(t_view) AS BIGINT) AS lat_us
          FROM fc
          UNION ALL
          SELECT 'click>purchase' AS stage,
                 CAST(epoch_us(t_purchase) - epoch_us(t_click) AS BIGINT) AS lat_us
          FROM fp)
        SELECT stage, COUNT(*) AS n_users,
               CAST(SUM(lat_us) AS BIGINT) AS total_lat_us,
               quantile_cont(lat_us, 0.5) AS p50_lat_us,
               quantile_cont(lat_us, 0.9) AS p90_lat_us,
               CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
        FROM lat GROUP BY stage ORDER BY stage
    """,
    "e25_interarrival": """
        WITH o AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events),
        g AS (SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
              FROM o WHERE gap_us IS NOT NULL)
        SELECT event_type, COUNT(*) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
               quantile_cont(gap_us, 0.5) AS p50_gap_us,
               quantile_cont(gap_us, 0.9) AS p90_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM g GROUP BY event_type ORDER BY event_type
    """,
    "e6_value_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "e1_event_counts": """
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "e2_sessionization": f"""
        WITH flagged AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM flagged)
        SELECT user_id, session_seq, MIN(ts) AS session_start,
               MAX(ts) AS session_end, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        FROM sess GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    # twin of the native session_window merge rule: a new session opens
    # when the inter-event delta reaches the gap (>=, unlike e2's >)
    # and session_end = last event + gap
    "e17_session_window_stats": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
          FROM flagged)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 1800 SECOND AS session_end,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, seq
        ORDER BY user_id, session_start
    """,
    "e3_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type
    """,
    "e4_user_asof_value": """
        WITH marked AS (
          SELECT event_id, user_id, ts, value, event_type,
                 last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
                   OVER w AS asof_view_value,
                 last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                   OVER w AS asof_view_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, ts, value, asof_view_ts, asof_view_value
        FROM marked WHERE event_type = 'purchase' ORDER BY event_id
    """,
    "e5_funnel": """
        WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        fc AS (SELECT e.user_id, v.t_view, MIN(e.ts) AS t_click
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts >= v.t_view
               GROUP BY e.user_id, v.t_view),
        fp AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
               FROM events e JOIN fc ON e.user_id = fc.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= fc.t_click
               GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
               (SELECT COUNT(*) FROM fc) AS n_click_users,
               (SELECT COUNT(*) FROM fp) AS n_purchase_users
    """,
    "distinct_users_daily": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY day
    """,
    "e18_rolling_active_users": """
        WITH daily AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        days AS (SELECT DISTINCT day FROM daily),
        dau AS (
          SELECT day, COUNT(DISTINCT user_id) AS n_users_1d
          FROM daily GROUP BY day),
        wau AS (
          SELECT d.day AS day, COUNT(DISTINCT u.user_id) AS n_users_7d
          FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day)
        SELECT dau.day AS day, n_users_1d, n_users_7d
        FROM dau JOIN wau ON dau.day = wau.day
        ORDER BY day
    """,
    "e19_gap_fill": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS di
          FROM events WHERE value > {GAP_FILL_MIN_VALUE!r} GROUP BY 1, 2),
        span AS (
          SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
          FROM daily GROUP BY 1),
        cal AS (
          SELECT event_type,
                 CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                             CAST(d1 AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS DATE) AS day
          FROM span),
        j AS (
          SELECT c.event_type, c.day, d.di
          FROM cal c LEFT JOIN daily d
            ON c.event_type = d.event_type AND c.day = d.day),
        g AS (
          SELECT *, COUNT(di) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS grp
          FROM j)
        SELECT event_type, day, di,
               MAX(di) OVER (PARTITION BY event_type, grp) AS filled_di,
               di IS NULL AS is_gap
        FROM g ORDER BY event_type, day
    """,
    "e20_mad_outliers": f"""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY 1),
        mad AS (
          SELECT e.event_type,
                 quantile_cont(abs(e.value - m.med), 0.5) AS mad,
                 MAX(m.med) AS med
          FROM events e JOIN med m ON e.event_type = m.event_type
          GROUP BY 1)
        SELECT e.event_type, COUNT(*) AS n_events,
               MAX(m.med) AS med, MAX(m.mad) AS mad,
               CAST(SUM(CASE WHEN abs(e.value - m.med) > m.mad * {MAD_K!r}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               MAX(abs(e.value - m.med) / m.mad) AS max_score
        FROM events e JOIN mad m ON e.event_type = m.event_type
        WHERE m.mad > 0
        GROUP BY e.event_type ORDER BY e.event_type
    """,
}
