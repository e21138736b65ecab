"""Time-weighted aggregation over irregular samples (LOCF interval algebra).

Two interval-weighted diagnostics every irregular-cadence tier needs, both
public, well-known shapes (TimescaleDB's ``time_weight`` / ``state_agg``
hyperfunctions document the semantics; the implementations here are
original window algebra):

- :func:`time_weighted_avg` — the mean of a sampled signal weighted by how
  LONG each sample held, not how OFTEN it was reported.  A sensor that
  reports 100x/s while alarming and 1x/h while healthy has a plain
  ``avg(value)`` biased toward the alarm value; the time-weighted mean is
  the physically meaningful one.  Both the step (LOCF — each sample holds
  until the next) and trapezoid (linear between samples) integrals are
  emitted from one pass.  Extends the reference's LOCF treatment of
  irregular series (``/root/reference/R/rtsa_gapfill.R`` fills before any
  equal-weight statistic) with the integral that makes the fill
  unnecessary.
- :func:`duration_in_state` — how long each key HELD each discrete state
  under LOCF (state persists until the next observation), plus how many
  times it ENTERED the state.  The "time in degraded / error budget"
  query over a status-event stream.

Scale shape: one window shuffle on the key (lead/lag over (key, ts)),
then one map-side-combinable groupBy — O(1) state per key, no joins, no
Python.  Everything stays in the exact-int domain (epoch seconds x
integer values), with a single trailing ``div`` per output column, so any
engine replays the results bit-identically.

Determinism under timestamp ties: rows in the same second are ordered by
(ts, value) / (ts, state) — zero-length intervals contribute nothing and
the carried value of a tied group is pinned to the sort-maximal row, so
both engines replay ties identically (same device as
``operators/sampling.rank_normalize``'s id tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_weighted_avg", "duration_in_state"]


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key time-weighted mean of an integer-valued irregular series.

    ``value_col`` must already be exact-int (scale dollars to cents etc.
    upstream); timestamps truncate to whole epoch seconds (repo-wide
    convention).  For consecutive samples ``(t_i, v_i)``:

    - LOCF (step) integral:   ``num_locf = sum(v_i * (t_{i+1} - t_i))``
    - trapezoid integral:     ``num_trap = sum((v_i + v_{i+1}) * dt_i)``
      (kept at 2x scale so it stays integer; the final div halves it)
    - span:                   ``span_s = t_n - t_1  (== sum(dt_i))``

    Emits per key: ``n_samples``, ``span_s``, and
    ``twa_locf_e6 = (1e6 * num_locf) div span_s`` /
    ``twa_trap_e6 = (1e6 * num_trap) div (2 * span_s)`` — NULL when the
    span is zero (single sample, or all samples in one second): there is
    no interval to weight, and ANSI mode would otherwise throw.

    The quotient uses ``div`` (truncate toward zero — matches DuckDB
    ``//``; see ``operators/counters.bucket_derivative`` for the
    convention note).  Integer bound: ``|v| * span < 2^53 / 1e6`` — whole
    years of second-resolution cent values stay exact.
    """
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    pre = df.select(
        *key_cols, ts_s.alias("_t"), F.col(value_col).cast("bigint").alias("_v")
    )
    w = Window.partitionBy(*key_cols).orderBy("_t", "_v")
    stepped = pre.select(
        *key_cols,
        "_v",
        (F.lead("_t").over(w) - F.col("_t")).alias("_dt"),
        F.lead("_v").over(w).alias("_vn"),
    )
    agg = stepped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.coalesce(F.sum("_dt"), F.lit(0)).cast("bigint").alias("span_s"),
        F.sum(F.col("_v") * F.col("_dt")).alias("_num_locf"),
        F.sum((F.col("_v") + F.col("_vn")) * F.col("_dt")).alias("_num_trap"),
    )
    return agg.select(
        *key_cols,
        "n_samples",
        "span_s",
        F.when(
            F.col("span_s") > 0,
            F.expr("(1000000 * _num_locf) div span_s"),
        ).alias("twa_locf_e6"),
        F.when(
            F.col("span_s") > 0,
            F.expr("(1000000 * _num_trap) div (2 * span_s)"),
        ).alias("twa_trap_e6"),
    )


def duration_in_state(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
) -> DataFrame:
    """Per (key, state) LOCF dwell time over a discrete-state event
    stream: each observation's state holds until the key's next
    observation; the final observation holds for 0 s (the observed span
    ends at the key's last event — nothing after it is evidence).

    Emits per (key, state): ``n_obs`` (observations reporting the
    state), ``n_enters`` (transitions INTO the state — first observation
    counts as an entry), ``held_s`` (total LOCF seconds), and
    ``pct_e6 = (1e6 * held_s) div span_s`` of the key's observed span
    (NULL when the span is zero).  ``sum(held_s)`` over a key's states
    equals its span exactly — conservation the tests and oracle pin.

    NULL states are dropped before the window (repo-wide stance: NULL
    rows are not evidence — same rule as evaluation.py and
    hll_bucket_sketch), so a NULL observation neither forms its own
    state group nor forces spurious enter flags on its neighbors; the
    key's span and LOCF durations are computed over non-NULL
    observations only.

    Scale shape: one window shuffle on the key + one combinable groupBy;
    the per-key span re-enters through the same window (no join).
    """
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    pre = df.where(F.col(state_col).isNotNull()).select(
        *key_cols, ts_s.alias("_t"), F.col(state_col).alias("_st")
    )
    w = Window.partitionBy(*key_cols).orderBy("_t", "_st")
    wk = Window.partitionBy(*key_cols)
    stepped = pre.select(
        *key_cols,
        "_st",
        (F.lead("_t").over(w) - F.col("_t")).alias("_dur"),
        F.coalesce(
            (F.lag("_st").over(w) != F.col("_st")).cast("int"), F.lit(1)
        ).alias("_enter"),
        (F.max("_t").over(wk) - F.min("_t").over(wk)).alias("_span"),
    )
    return stepped.groupBy(*key_cols, F.col("_st").alias("state")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("_enter").cast("bigint").alias("n_enters"),
        F.coalesce(F.sum("_dur"), F.lit(0)).cast("bigint").alias("held_s"),
        F.max("_span").alias("_span"),
    ).select(
        *key_cols,
        "state",
        "n_obs",
        "n_enters",
        "held_s",
        F.when(
            F.col("_span") > 0, F.expr("(1000000 * held_s) div _span")
        ).alias("pct_e6"),
    )
