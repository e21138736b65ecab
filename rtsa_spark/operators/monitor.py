"""Operational tier monitoring: missing-bucket backfill ranges, staleness
flags, top movers.

The ops an on-call engineer runs against the retention ladder — where the
reference's workflow is "rebuild the raster" (``/root/reference/R/
rtsa_gapfill.R`` fills everything unconditionally), a 100 TB tier wants
the DIAGNOSIS first: which (source, range) is missing (feed a targeted
backfill), which sources went silent, what moved hardest since yesterday.

All three are spine/window algebra in whole-stage codegen — exact
BIGINT/epoch arithmetic end to end (CLAUDE.md contract), no UDFs:

- :func:`missing_ranges`: islands-and-gaps over the dense per-key spine
  (``gapfill.bucket_spine``) anti-joined with the observed buckets; run
  ids via the classic ``row_number - rank-position`` difference on the
  epoch grid, so each maximal missing run collapses to one row.
- :func:`stale_sources`: last observed bucket per key vs an ``as_of``
  epoch — one map-side-combinable groupBy.
- :func:`top_movers`: largest absolute period-over-period delta per key
  (one lag window), ranked with a deterministic tie-break.

Scale shape: spines are key-count x buckets (tier-sized, never
fact-sized); every window partitions on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rtsa_spark.operators.gapfill import bucket_spine

__all__ = ["missing_ranges", "stale_sources", "top_movers", "phase_band_breach", "value_streaks", "streak_summary", "topk_churn"]


def missing_ranges(
    df: DataFrame,
    tier: str,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Backfill plan: one row per maximal run of missing buckets inside
    each key's observed min..max spine — ``(key, gap_start, gap_end,
    n_missing)``, ordered runs collapsed via the position-minus-rank
    island identity (position arithmetic, so calendar-width monthly
    steps work too)."""
    spine = bucket_spine(df, tier, key_col, bucket_col)
    obs = df.select(F.col(key_col).alias("k"), F.col(bucket_col).alias("b"))
    w = Window.partitionBy(key_col).orderBy(bucket_col)
    flagged = (
        spine.join(
            obs,
            (spine[key_col] == obs["k"]) & (spine[bucket_col] == obs["b"]),
            "left",
        )
        .select(key_col, bucket_col, F.col("b").isNull().alias("_miss"))
        .withColumn("_pos", F.row_number().over(w))
    )
    miss = flagged.where("_miss")
    wm = Window.partitionBy(key_col).orderBy("_pos")
    runs = miss.withColumn("_run", F.col("_pos") - F.row_number().over(wm))
    return (
        runs.groupBy(key_col, "_run")
        .agg(
            F.min(bucket_col).alias("gap_start"),
            F.max(bucket_col).alias("gap_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_missing"),
        )
        .drop("_run")
    )


def stale_sources(
    df: DataFrame,
    as_of,
    max_age_s: int,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Liveness: per key, the last observed bucket and whether it is older
    than ``max_age_s`` seconds before ``as_of`` (epoch seconds or a
    timestamp-like Column/literal castable by ``unix_timestamp``).
    Emits ``(key, last_bucket, age_s, is_stale)`` — exact integers."""
    if max_age_s < 0:
        raise ValueError(f"max_age_s must be >= 0, got {max_age_s}")
    as_of_s = (
        F.lit(int(as_of))
        if isinstance(as_of, int)
        else F.unix_timestamp(F.lit(as_of))
    )
    last = df.groupBy(F.col(key_col).alias("key")).agg(
        F.max(bucket_col).alias("last_bucket")
    )
    age = as_of_s - F.unix_timestamp(F.col("last_bucket"))
    return last.select(
        "key",
        "last_bucket",
        age.cast("bigint").alias("age_s"),
        (age > max_age_s).alias("is_stale"),
    )


def top_movers(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """Largest absolute period-over-period changes per key: ``delta =
    x - lag(x)`` over the key's observed bucket order, global top-k by
    ``|delta|`` with a deterministic ``(|delta| DESC, key, bucket)``
    tie-break.  First bucket per key has no predecessor and is skipped.

    A global rank window would single-partition the whole delta table
    (and even after a per-key prune, k x keys rows is 10^8-10^9 at
    10^7-10^8 keys — r5 verdict). Instead the global top-k is
    ``orderBy().limit(k)`` — TakeOrderedAndProject, per-partition heads
    merged k-at-a-time on the driver — and only the k survivors are
    ranked (the retrieval.bm25_topk pattern). No single-partition sort
    anywhere, any key count."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    d = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(bucket_col).alias("bucket"),
            F.col(value_col).cast("bigint").alias("x"),
        )
        .withColumn(
            "prev_x",
            F.lag("x").over(Window.partitionBy("key").orderBy("bucket")),
        )
        .where(F.col("prev_x").isNotNull())
        .withColumn("delta", F.col("x") - F.col("prev_x"))
    )
    top = d.orderBy(
        F.desc(F.abs(F.col("delta"))), F.asc("key"), F.asc("bucket")
    ).limit(k)
    rk = Window.orderBy(
        F.desc(F.abs(F.col("delta"))), F.asc("key"), F.asc("bucket")
    )
    return (
        top.withColumn("rank", F.row_number().over(rk).cast("int"))
        .select("key", "bucket", "prev_x", "x", "delta", "rank")
    )


def phase_band_breach(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    phase: str = "hour",
    lo_p: int = 10,
    hi_p: int = 90,
) -> DataFrame:
    """The operational consumer of
    :func:`rtsa_spark.operators.sessionize.phase_profile`: flag every
    bucket whose value leaves its key's [p_lo, p_hi] seasonal envelope
    for that bucket's phase (hour-of-day / day-of-week) — "is tonight's
    3am volume abnormal FOR a 3am?".

    The e2-domain percentile bands compare against ``100 * x`` by
    cross-multiplication — exact integers, no float.  Emits the input
    keys/buckets plus ``(phase, p{lo}_e2, p{hi}_e2, below, above)``.

    Scale shape: the profile is (keys x phases)-sized — broadcast back
    onto the tier; flags are a codegen'd projection.
    """
    from rtsa_spark.operators.sessionize import phase_profile

    prof = phase_profile(
        df, key_col, bucket_col, value_col, phase, ps=(lo_p, hi_p)
    ).drop("n_buckets")
    if phase == "hour":
        ph = F.pmod(
            F.expr(f"(cast({bucket_col} as long) div 3600)"), F.lit(24)
        )
    else:
        ph = F.pmod(
            F.expr(f"(cast({bucket_col} as long) div 86400) + 4"), F.lit(7)
        )
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).alias("bucket"),
        ph.cast("int").alias("phase"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    j = base.join(F.broadcast(prof), ["key", "phase"])
    lo, hi = F.col(f"p{lo_p}_e2"), F.col(f"p{hi_p}_e2")
    return j.select(
        "key",
        "bucket",
        "phase",
        "x",
        lo.alias(f"p{lo_p}_e2"),
        hi.alias(f"p{hi_p}_e2"),
        (100 * F.col("x") < lo).alias("below"),
        (100 * F.col("x") > hi).alias("above"),
    )


def value_streaks(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    bucket_seconds: int,
    cond_col: str,
) -> DataFrame:
    """Maximal runs of CONSECUTIVE observed buckets where a condition
    holds, per key — the gaps-and-islands twin of :func:`missing_ranges`
    conditioned on a VALUE predicate instead of absence ("longest
    healthy streak", "how long has this source been over its band").

    Emits one row per streak: ``(keys..., streak_start, streak_end,
    n_buckets)``.  Consecutive means bucket epochs exactly
    ``bucket_seconds`` apart (fixed-width tiers; calendar-width monthly
    spines belong to the position-arithmetic device in
    :func:`missing_ranges`) — an unobserved bucket BREAKS a streak,
    and a bucket where the condition is false breaks it too.

    Island identity: among condition-true rows, ``bucket_epoch div
    bucket_seconds - row_number()`` is constant exactly on maximal
    consecutive runs.  One window + one combinable groupBy; rows in
    flight = condition-true buckets only.
    """
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    pre = (
        df.select(
            *key_cols,
            F.col(bucket_col).alias("_b"),
            F.expr(
                f"unix_timestamp({bucket_col}) div {int(bucket_seconds)}"
            ).alias("_idx"),
        )
        .where(F.col(cond_col))
        # one row per (key, bucket): a duplicate input row would bump
        # row_number without bumping _idx and split/double-count runs
        .distinct()
    )
    w = Window.partitionBy(*key_cols).orderBy("_idx")
    runs = pre.withColumn(
        "_run", F.col("_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy(*key_cols, "_run")
        .agg(
            F.min("_b").alias("streak_start"),
            F.max("_b").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        )
        .drop("_run")
    )


def streak_summary(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    bucket_seconds: int,
    cond_col: str,
) -> DataFrame:
    """Per-key streak scoreboard over :func:`value_streaks` output:
    ``(keys..., n_streaks, longest, longest_start, total_true)`` where
    ``longest_start`` pins the FIRST streak attaining the maximum
    (earliest start — deterministic under ties on any engine).
    """
    st = value_streaks(df, key_cols, bucket_col, bucket_seconds, cond_col)
    # single pass over the (tiny) streak table: a window max marks the
    # longest length, then ONE groupBy pins the earliest start attaining
    # it — no second evaluation of the upstream island lineage
    mx = F.max("n_buckets").over(Window.partitionBy(*key_cols))
    marked = st.withColumn("_mx", mx)
    return marked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("n_buckets").cast("bigint").alias("longest"),
        F.min(
            F.when(F.col("n_buckets") == F.col("_mx"), F.col("streak_start"))
        ).alias("longest_start"),
        F.sum("n_buckets").cast("bigint").alias("total_true"),
    ).select(
        *key_cols, "n_streaks", "longest", "longest_start", "total_true"
    )


def topk_churn(
    df: DataFrame,
    key_cols: list[str],
    period_col: str,
    item_col: str,
    k: int = 10,
) -> DataFrame:
    """Leaderboard churn: how much each period's top-k item set (by
    occurrence count) differs from the PREVIOUS period's — the "did the
    dominant domains/tokens/users change" monitor that a plain top-k
    table makes the reader eyeball.

    Emits one row per (key, period) observed: ``(keys..., period,
    topk array<string> in rank order, n_kept, n_entered, n_exited,
    jaccard_e6)`` where the set algebra compares against the key's
    previous OBSERVED period (first period: NULL churn columns).  Rank
    ties are pinned by (count desc, item asc) so any engine produces
    the identical top-k.

    Scale shape: one map-side-combined count groupBy, one per-period
    rank window bounded to k rows, one collect into a k-string array,
    one lag window over the (tiny) period table — churn is in-row
    array algebra, never an item-level self-join.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.select(
            *key_cols,
            F.col(period_col).alias("period"),
            F.col(item_col).cast("string").alias("_it"),
        )
        .groupBy(*key_cols, "period", "_it")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    w = Window.partitionBy(*key_cols, "period").orderBy(
        F.desc("_c"), F.asc("_it")
    )
    top = counts.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    sets = top.groupBy(*key_cols, "period").agg(
        F.expr("transform(array_sort(collect_list(struct(_rn, _it))),"
               " x -> x._it)").alias("topk")
    )
    lagw = Window.partitionBy(*key_cols).orderBy("period")
    with_prev = sets.withColumn("_prev", F.lag("topk").over(lagw))
    kept = F.size(F.array_intersect("topk", "_prev"))
    entered = F.size(F.array_except("topk", "_prev"))
    exited = F.size(F.array_except("_prev", "topk"))
    uni = F.size(F.array_union("topk", "_prev"))
    has_prev = F.col("_prev").isNotNull()
    return with_prev.select(
        *key_cols,
        "period",
        "topk",
        F.when(has_prev, kept).cast("bigint").alias("n_kept"),
        F.when(has_prev, entered).cast("bigint").alias("n_entered"),
        F.when(has_prev, exited).cast("bigint").alias("n_exited"),
        F.when(
            has_prev & (uni > 0),
            F.expr(
                "(1000000 * size(array_intersect(topk, _prev)))"
                " div size(array_union(topk, _prev))"
            ),
        )
        .cast("bigint")
        .alias("jaccard_e6"),
    )
