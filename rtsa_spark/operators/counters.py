"""Monotonic-counter rate extraction and CUSUM drift detection.

Two window-shaped diagnostics every large ingest pipeline runs over its
retention tiers:

- :func:`counter_increase` — Prometheus-style ``increase()`` semantics
  (public, prometheus.io/docs/prometheus/latest/querying/functions): a
  cumulative counter that RESETS (source restart) must contribute its
  post-reset value, not a negative delta. One ``lag`` window per key.
- :func:`cusum_drift` — Page (1954) one-sided CUSUM, computed WITHOUT the
  sequential recursion: ``S_t = max(0, S_{t-1} + dev_t)`` is identically
  ``C_t - min_{i<=t} C_i`` for the prefix sums ``C`` of the deviations,
  so two stock window functions (running sum, running min) replace the
  per-row loop — the whole detector stays in whole-stage codegen and is
  replayable by any SQL engine. Extends the reference's trend testing
  (Mann-Kendall, ``/root/reference/R/rtsa.trend.R``) with a
  changepoint-flavored drift statistic.

Both are one hash shuffle on the key; state per key is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["counter_increase", "cusum_drift", "cohort_retention", "bucket_derivative"]


def counter_increase(
    df: DataFrame, key_col: str, ts_col: str, counter_col: str
) -> DataFrame:
    """Per-sample increase of a cumulative counter with reset handling:
    ``inc = c - prev`` when the counter advanced, ``c`` after a reset
    (counter dropped — the new value is what accumulated since restart).
    First sample per key contributes no increase (NULL inc, reset=0).

    Returns the input rows plus ``inc`` and ``is_reset``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(counter_col).over(w)
    c = F.col(counter_col)
    return df.select(
        "*",
        F.when(prev.isNull(), F.lit(None).cast("bigint"))
        .when(c >= prev, (c - prev).cast("bigint"))
        .otherwise(c.cast("bigint"))
        .alias("inc"),
        F.when(prev.isNull(), F.lit(0))
        .otherwise((c < prev).cast("int"))
        .alias("is_reset"),
    )


def cusum_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    target_col: str = None,
) -> DataFrame:
    """One-sided upward CUSUM per key over an integer series.

    ``dev_t = x_t - target`` (caller supplies an integer target column or
    scaled-int constant upstream so everything stays exact-int);
    ``C_t = sum(dev)`` running, ``S_t = C_t - min(C) so far``
    (== Page's recursion, see module docstring). Emits every row with its
    ``cusum_s``; the downstream drift summary is a plain max/argmax agg.
    """
    tgt = F.col(target_col) if target_col else F.lit(0)
    dev = (F.col(value_col) - tgt).cast("bigint")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # two stacked selects: Spark forbids nesting a window inside a window
    # expression, but both share the same (partition, order) so Catalyst
    # plans ONE shuffle + sort with two Window nodes on top.
    with_c = df.select("*", F.sum(dev).over(w).alias("_c"))
    # S_t = C_t - min(0, running_min(C)): Page's S_0 = 0 baseline means a
    # series that only rises never subtracts anything.
    run_min = F.least(F.lit(0).cast("bigint"), F.min("_c").over(w))
    return with_c.select("*", (F.col("_c") - run_min).alias("cusum_s")).drop(
        "_c"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    day_s: int = 86400,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: group users by their first-seen day, then
    for each ``(cohort_day, day_offset)`` count the distinct users active
    that many days later — the classic product-analytics triangle, here
    the freshness/stickiness read on a source/user event tier.

    Day boundaries are pure epoch integer arithmetic (``epoch div
    day_s``), never an engine calendar function.  Emits ``(cohort_day,
    day_offset, n_active, n_cohort, retention_e6)`` with
    ``retention_e6 = (1e6 * n_active) div n_cohort`` — exact integers
    end to end; ``day_offset = 0`` rows carry ``n_active = n_cohort``
    by construction.

    Scale shape: one groupBy per user for the first-seen day (map-side
    combined min), an equi-join back onto the distinct (user, day) set
    (NOT the raw events — activity is collapsed first, so the join input
    is distinct-pair-sized), then one groupBy on (cohort, offset).
    ``max_offset`` caps the emitted triangle; NULL keeps everything.
    """
    if day_s <= 0:
        raise ValueError(f"day_s must be > 0, got {day_s}")
    # unix_timestamp (not a bigint cast): works for both TIMESTAMP and
    # TIMESTAMP_NTZ inputs, truncating to whole UTC seconds — day floors
    # then agree with any exact-integer epoch recipe for positive epochs.
    days = df.select(
        F.col(user_col).alias("u"),
        F.expr(f"unix_timestamp({ts_col}) div {int(day_s)}").alias("d"),
    ).distinct()
    first = days.groupBy("u").agg(F.min("d").alias("d0"))
    j = days.join(first, "u").select(
        "u", F.col("d0").alias("cohort_day"), (F.col("d") - F.col("d0")).alias("day_offset")
    )
    if max_offset is not None:
        j = j.where(F.col("day_offset") <= int(max_offset))
    sizes = first.groupBy("d0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    act = j.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    out = act.join(
        F.broadcast(sizes.withColumnRenamed("d0", "cohort_day")), "cohort_day"
    )
    return out.select(
        "cohort_day",
        F.col("day_offset").cast("bigint").alias("day_offset"),
        "n_active",
        "n_cohort",
        F.expr("(1000000 * n_active) div n_cohort")
        .cast("bigint")
        .alias("retention_e6"),
    )


def bucket_derivative(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Gap-aware discrete derivative between consecutive OBSERVED buckets:
    ``rate_e6 = (1e6 * (x - prev_x)) div gap_s`` — the per-second rate of
    change a dashboard plots from a tier, with spine gaps lengthening the
    denominator instead of inventing a bucket (the irregular-spine
    convention shared with the Mann-Kendall family).

    Exact integers end to end: gap seconds from ``unix_timestamp``
    truncation, one divide into the e6 domain rounded TOWARD ZERO
    (sign-magnitude: divide ``abs(delta)``, re-apply the sign — so a
    negative delta rounds up toward zero, NOT floor).  Spark ``div`` and
    DuckDB ``//`` both already truncate toward zero on negatives (see
    ``components.component_strength``, whose oracle relies on exactly
    that); the ``abs``/sign split here is for spec clarity — it makes the
    rounding direction explicit in both engines' query text rather than
    leaning on each engine's signed-division convention.  The oracle
    replays the identical ``CASE WHEN x < prev_x THEN -((...)//gap_s)``
    chain.  First bucket per key emits NULLs.

    Scale shape: one lag window per key over the tier — no join, no UDF.
    """
    w = Window.partitionBy("key").orderBy("bucket")
    d = df.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).alias("bucket"),
        F.col(value_col).cast("bigint").alias("x"),
    ).select(
        "key",
        "bucket",
        "x",
        F.lag("x").over(w).alias("prev_x"),
        (
            F.unix_timestamp("bucket")
            - F.lag(F.unix_timestamp("bucket")).over(w)
        ).cast("bigint").alias("gap_s"),
    )
    delta = F.col("x") - F.col("prev_x")
    mag = F.expr("(1000000 * abs(x - prev_x)) div gap_s")
    rate = F.when(delta < 0, -mag).otherwise(mag)
    return d.select(
        "key",
        "bucket",
        "x",
        "prev_x",
        "gap_s",
        F.when(
            F.col("prev_x").isNotNull() & (F.col("gap_s") > 0), rate
        ).cast("bigint").alias("rate_e6"),
    )
