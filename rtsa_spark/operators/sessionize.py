"""Gap-based sessionization + exact tier percentiles — window-family ops.

Two batch analytics the tier engine needs around the rollup ladder:

- :func:`sessionize`: classic inactivity-gap sessionization (the batch
  twin of Structured Streaming's session windows): a new session starts
  whenever the gap to the previous event on the key exceeds ``gap_s``.
  One shuffle (window over the key), no UDFs — lag + running sum of
  session-start flags, all whole-stage codegen.
- :func:`tier_percentiles`: EXACT type-7 (linear-interpolation) per-key
  percentiles of a tier column, emitted in the e2 integer domain
  (``value_e2 = x_lo*(100-rem) + x_hi*rem`` with integer ``rem`` — no
  float rounding, so any SQL engine reproduces it bit-for-bit). Per-key
  state is the sorted per-bucket value list: tier-bounded (buckets per
  source), NOT raw-data-bounded, so the sort_array stays small even at
  100 TB of raw input. For cross-tier merges the token-histogram sketch
  (operators/rollup.py) is the distributive path; this operator is the
  exact finisher on a rolled-up tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_s: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Sessionize events per key with an inactivity gap of ``gap_s``
    seconds. Returns one row per session: ``(key..., session_id (1-based
    per key), n_events, start_s, end_s, duration_s [, v_sum])``.

    Ties on the timestamp stay in one session (gap 0 <= gap_s).
    Semantics match Spark's native ``F.session_window`` with the same gap
    (boundary inclusive; pytest pins the equivalence) — the lag+cumsum
    construction is used instead because it (a) yields a stable per-key
    session ORDINAL usable as a join key and (b) is plain ANSI window
    SQL, so the DuckDB oracle replays it exactly.
    """
    if gap_s < 0:
        raise ValueError("gap_s must be >= 0")
    proj = df.select(
        *key_cols,
        F.unix_timestamp(F.col(ts_col)).alias("ts_s"),
        *([F.col(value_col).alias("v")] if value_col else []),
    )
    ts_s = F.col("ts_s")
    w = Window.partitionBy(*key_cols).orderBy(ts_s)
    prev = F.lag(ts_s).over(w)
    is_new = (prev.isNull() | ((ts_s - prev) > gap_s)).cast("int")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = proj.withColumn(
        "session_id", F.sum(is_new).over(wrun).cast("bigint")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts_s").cast("bigint").alias("start_s"),
        F.max("ts_s").cast("bigint").alias("end_s"),
        (F.max("ts_s") - F.min("ts_s")).cast("bigint").alias("duration_s"),
    ]
    if value_col:
        aggs.append(F.sum("v").cast("bigint").alias("v_sum"))
    return sess.groupBy(*key_cols, "session_id").agg(*aggs)


def tier_percentiles(
    df: DataFrame,
    value_col: str = "n_tok_sum",
    key_col: str | list[str] = "source",
    ps: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact type-7 percentiles of ``value_col`` per key (single column or
    composite list) over a rolled-up tier, in the e2 integer domain. For
    percentile p over the sorted values x[0..n-1]: pos = (n-1)*p,
    lo = pos // 100, rem = pos % 100,
    ``p{p}_e2 = x[lo]*(100-rem) + x[lo+1]*rem`` (``x[lo]*100`` at the
    boundary) — pure integer arithmetic both engines agree on."""
    if not ps or any(not 0 <= p <= 100 for p in ps):
        raise ValueError("ps must be percentiles in [0, 100]")
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    xs = F.sort_array(F.collect_list(F.col(value_col).cast("bigint")))
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        xs.alias("xs"),
    )
    cols = [*[F.col(k) for k in keys], F.col("n_buckets")]
    for p in ps:
        pos = (F.col("n_buckets") - 1) * p
        lo = F.floor(pos / 100).cast("int")
        rem = (pos % 100).cast("bigint")
        x_lo = F.element_at("xs", lo + 1)
        x_hi = F.element_at("xs", F.least(lo + 2, F.size("xs")))
        cols.append(
            (x_lo * (100 - rem) + x_hi * rem).cast("bigint").alias(f"p{p}_e2")
        )
    return agg.select(*cols)


def phase_profile(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    phase: str = "hour",
    ps: tuple[int, ...] = (10, 50, 90),
) -> DataFrame:
    """Seasonal envelope — "what does a typical day/week look like": exact
    type-7 percentile bands of ``value_col`` per ``(key, phase)`` where
    phase is the hour-of-day (0-23) or day-of-week (0=Sunday..6) of the
    bucket.  The per-phase p10/p50/p90 profile is the reference's seasonal
    climatology read (``/root/reference/R/rtsa.seas.R`` amplitude cycle)
    turned into an operational band a monitor can compare live buckets
    against.

    Phase extraction is pure integer epoch arithmetic — ``(epoch div
    3600) mod 24`` / ``((epoch div 86400) + 4) mod 7`` (1970-01-01 was a
    Thursday) — never an engine calendar function, so UTC phases agree
    across engines by construction.

    Scale shape: inherits :func:`tier_percentiles` — one groupBy on the
    composite key; per-group state is the sorted per-bucket list, tier-
    bounded (buckets per key-phase), not raw-data-bounded.
    """
    if phase == "hour":
        ph = F.pmod(F.expr(f"(cast({bucket_col} as long) div 3600)"), F.lit(24))
    elif phase == "dow":
        ph = F.pmod(
            F.expr(f"(cast({bucket_col} as long) div 86400) + 4"), F.lit(7)
        )
    else:
        raise ValueError(f"phase must be 'hour' or 'dow', got {phase!r}")
    base = df.select(
        F.col(key_col).alias("key"),
        ph.cast("int").alias("phase"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    return tier_percentiles(base, value_col="x", key_col=["key", "phase"], ps=ps)


def interarrival_stats(
    df: DataFrame, key_cols: list[str], ts_col: str = "ts"
) -> DataFrame:
    """Inter-arrival gap statistics per key — the ingest-cadence read
    that sits beside :func:`sessionize` (same lag construction, but
    characterizing the gaps instead of cutting sessions): ``(key...,
    n_events, n_gaps, gap_min_s, gap_max_s, gap_sum_s, gap_mean_e2)``
    with ``gap_mean_e2 = (100 * gap_sum) div n_gaps`` — exact integer
    seconds end to end (``unix_timestamp`` truncation, both engines).

    Keys with a single event emit ``n_gaps = 0`` and NULL gap stats.

    Scale shape: one lag window per key, then a map-side-combinable
    groupBy — O(1) state per key, no list/sort state (use
    :func:`tier_percentiles` on a rolled-up tier for gap quantiles)."""
    proj = df.select(
        *key_cols, F.unix_timestamp(F.col(ts_col)).alias("ts_s")
    )
    w = Window.partitionBy(*key_cols).orderBy("ts_s")
    g = proj.withColumn("gap", F.col("ts_s") - F.lag("ts_s").over(w))
    agg = g.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("gap_min_s"),
        F.max("gap").cast("bigint").alias("gap_max_s"),
        F.sum("gap").cast("bigint").alias("gap_sum_s"),
    )
    return agg.withColumn(
        "gap_mean_e2",
        F.when(
            F.col("n_gaps") > 0,
            F.expr("(100 * gap_sum_s) div n_gaps"),
        ).cast("bigint"),
    )


def weighted_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact lower weighted median per key: the smallest value whose
    cumulative weight reaches half the total — the robust center for
    size-weighted reads ("token-weighted median document length") where
    the unweighted median of :func:`tier_percentiles` would let a
    million tiny rows outvote the mass.

    Emits ``(keys..., n_rows, total_w, wmedian)``; the pick is the
    standard lower weighted median (``2 * cumw >= total_w``, value
    order ascending) — deterministic on any engine, no interpolation.
    Weights must be POSITIVE integers: a zero/negative weight raises
    before any arithmetic (a silently dropped row would shift the
    median with no signal).

    Scale shape: one groupBy on (keys, value) collapses ties — the
    window then runs over DISTINCT values per key, not rows — plus one
    cumulative-sum window and one final min-pick agg.
    """
    v = F.col(value_col).cast("bigint")
    w = F.col(weight_col).cast("bigint")
    pre = df.select(
        *key_cols,
        v.alias("_v"),
        F.when(w > 0, w)
        .otherwise(
            F.raise_error(
                F.format_string(
                    "weighted_median: weight must be > 0, got %s",
                    w.cast("string"),
                )
            )
        )
        .alias("_w"),
    )
    g = pre.groupBy(*key_cols, "_v").agg(
        F.sum("_w").cast("bigint").alias("_wg"),
        F.count(F.lit(1)).cast("bigint").alias("_ng"),
    )
    win = (
        Window.partitionBy(*key_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*key_cols)
    cum = g.select(
        *key_cols,
        "_v",
        "_ng",
        "_wg",
        F.sum("_wg").over(win).alias("_cum"),
        F.sum("_wg").over(tot).alias("_tot"),
        F.sum("_ng").over(tot).alias("_n"),
    )
    return (
        cum.where(2 * F.col("_cum") >= F.col("_tot"))
        .groupBy(*key_cols)
        .agg(
            F.max("_n").cast("bigint").alias("n_rows"),
            F.max("_tot").cast("bigint").alias("total_w"),
            F.min("_v").cast("bigint").alias("wmedian"),
        )
    )
