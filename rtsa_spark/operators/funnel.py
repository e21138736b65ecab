"""Ordered-sequence analytics: funnel conversion and state transitions.

The two event-sequence reads every product/ops pipeline runs (public
shapes: Amplitude/Mixpanel funnels, ClickHouse ``windowFunnel``, Kusto
``funnel_sequence``; implementations here are original window algebra):

- :func:`funnel_conversion` — per key (user), the earliest time each
  funnel step completes GIVEN the previous step completed before it,
  optionally bounded to a whole-funnel window from step 1; then the
  per-step survivor counts and conversion rates.  Step times chain
  through STACKED window aggregates over one partition — ``s1 = min(ts
  where type = step1)``, ``s2 = min(ts where type = step2 and ts >=
  s1)``, … — so Catalyst plans ONE shuffle with k Window nodes, never a
  self-join per step.
- :func:`markov_transitions` — the first-order transition table of a
  discrete-state event stream: counts and exact-int probabilities of
  ``from_state -> to_state`` over consecutive observations within each
  key.  One lag window + one combinable groupBy; the row-count is
  states², never event-volume.

Exact-int contract: epoch-second timestamps, counts, and a single
trailing ``div`` per derived column; ties in the same second are pinned
by (ts, state) sort order (same device as ``operators/timeweight``), so
any engine replays the tables bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_conversion", "funnel_latency", "markov_transitions"]


def _step_times(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_s: int | None,
) -> DataFrame:
    """Per-key chained step-completion epochs: one row per key with
    columns ``_k, _s0.._s{k-1}`` (NULL where the chain broke).  Shared
    by :func:`funnel_conversion` (counts) and :func:`funnel_latency`
    (step-to-step timing percentiles)."""
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        # `>=` lets a single event satisfy two consecutive identical
        # steps — repeated types need strict-ordering semantics this
        # operator does not implement; refuse loudly
        raise ValueError(f"funnel steps must be distinct types, got {steps!r}")
    if within_s is not None and within_s < 1:
        raise ValueError(f"within_s must be >= 1, got {within_s}")
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    cur = df.select(
        F.col(key_col).alias("_k"),
        ts_s.alias("_t"),
        F.col(type_col).alias("_ty"),
    )
    w = Window.partitionBy("_k")
    # stacked window aggregates: each step's min-ts condition reads the
    # previous step's column; same partition key -> Catalyst plans one
    # Exchange with k Window nodes on top (the cusum_drift device)
    for i, step in enumerate(steps):
        cond = F.col("_ty") == step
        if i > 0:
            prev = F.col(f"_s{i - 1}")
            cond = cond & prev.isNotNull() & (F.col("_t") >= prev)
            if within_s is not None:
                cond = cond & (
                    F.col("_t") <= F.col("_s0") + F.lit(int(within_s))
                )
        cur = cur.select(
            "*",
            F.min(F.when(cond, F.col("_t"))).over(w).alias(f"_s{i}"),
        )
    return cur.groupBy("_k").agg(
        *[F.max(f"_s{i}").alias(f"_s{i}") for i in range(len(steps))]
    )


def funnel_conversion(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_s: int | None = None,
) -> DataFrame:
    """Funnel step completion over an event stream: for each key, step i
    completes at the earliest event of type ``steps[i]`` at-or-after the
    key's step i-1 completion (``>=`` — a same-second follow-up counts);
    with ``within_s``, every step must also land within ``within_s``
    seconds of the key's step-1 time (the whole-funnel window, the
    Amplitude convention).

    Emits one row per step: ``(step, step_type, n_converted,
    conv_from_first_e6, conv_from_prev_e6)`` with
    ``conv_from_first_e6 = (1e6 * n_i) div n_1`` and
    ``conv_from_prev_e6 = (1e6 * n_i) div n_{i-1}`` (NULL denominators
    guarded; step 1 reports 1e6 for both).  Keys that never reach step 1
    don't appear in any denominator.

    Scale shape: k stacked whole-partition window aggregates over ONE
    hash shuffle on the key (k = number of steps, driver-side constant),
    one k-column groupBy-less agg at the end — no joins, no Python, no
    per-step pass over the raw events.
    """
    per_key = _step_times(df, key_col, ts_col, type_col, steps, within_s)
    counts = per_key.agg(
        *[
            F.count(f"_s{i}").cast("bigint").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = []
    for i, step in enumerate(steps):
        n_i, n_0 = F.col(f"_n{i}"), F.col("_n0")
        n_prev = F.col(f"_n{max(i - 1, 0)}")
        rows.append(
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(step).alias("step_type"),
                n_i.alias("n_converted"),
                F.when(
                    n_0 > 0, (F.lit(1_000_000) * n_i).cast("bigint")
                ).alias("_num_first"),
                F.when(
                    n_prev > 0, (F.lit(1_000_000) * n_i).cast("bigint")
                ).alias("_num_prev"),
                n_0.alias("_d_first"),
                n_prev.alias("_d_prev"),
            )
        )
    exploded = counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    return exploded.select(
        "step",
        "step_type",
        "n_converted",
        F.when(
            F.col("_d_first") > 0, F.expr("_num_first div _d_first")
        ).alias("conv_from_first_e6"),
        F.when(
            F.col("_d_prev") > 0, F.expr("_num_prev div _d_prev")
        ).alias("conv_from_prev_e6"),
    )


def markov_transitions(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
) -> DataFrame:
    """First-order transition table over a discrete-state event stream:
    for consecutive observations WITHIN each key (ordered by (ts, state)
    — ties pinned), count every ``from_state -> to_state`` pair across
    all keys and emit ``(from_state, to_state, cnt, from_total,
    p_e6 = (1e6 * cnt) div from_total)`` — rows sum to ``from_total``
    per origin state exactly, and the table is states² regardless of
    event volume.

    One lag window on the key + one combinable groupBy; the per-origin
    total re-enters through a window over the (tiny) transition table.
    """
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    pre = df.select(
        *key_cols, ts_s.alias("_t"), F.col(state_col).alias("_st")
    )
    w = Window.partitionBy(*key_cols).orderBy("_t", "_st")
    pairs = pre.select(
        F.lag("_st").over(w).alias("from_state"),
        F.col("_st").alias("to_state"),
    ).where(F.col("from_state").isNotNull())
    counted = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = F.sum("cnt").over(Window.partitionBy("from_state"))
    with_tot = counted.select("*", tot.cast("bigint").alias("from_total"))
    return with_tot.select(
        "from_state",
        "to_state",
        "cnt",
        "from_total",
        F.expr("(1000000 * cnt) div from_total").alias("p_e6"),
    )


def funnel_latency(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_s: int | None = None,
) -> DataFrame:
    """Step-to-step conversion TIMING: for every consecutive step pair
    of the funnel, the exact min / lower-median / lower-p90 / max of
    ``s_i - s_{i-1}`` seconds over the keys that completed step i —
    "how long from view to click, click to purchase", the product read
    that pairs with :func:`funnel_conversion`'s survivor counts.

    Percentiles are the exact LOWER order statistics (rank
    ``(q * (n-1)) div 100 + 1`` of the ascending deltas — the
    engine-portable pick, no interpolation).  Emits one row per step
    transition: ``(step, step_type, n, min_s, p50_s, p90_s, max_s)``
    where ``step`` is the DESTINATION step index (2-based first
    transition).

    Scale shape: the shared :func:`_step_times` chain (one shuffle, k
    windows), then one groupBy over (transition, delta) ranks — rows
    in flight are converted keys, never raw events.
    """
    per_key = _step_times(df, key_col, ts_col, type_col, steps, within_s)
    pairs = []
    for i in range(1, len(steps)):
        pairs.append(
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(steps[i]).alias("step_type"),
                (F.col(f"_s{i}") - F.col(f"_s{i - 1}")).alias("delta"),
            )
        )
    deltas = (
        per_key.select(F.explode(F.array(*pairs)).alias("r"))
        .select("r.*")
        .where(F.col("delta").isNotNull())
    )
    w = Window.partitionBy("step").orderBy("delta")
    ranked = deltas.select(
        "step",
        "step_type",
        "delta",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("step")).alias("_n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("_rn") == F.expr(f"({q} * (_n - 1)) div 100 + 1"),
            F.col("delta"),
        )
    )
    return ranked.groupBy("step", "step_type").agg(
        F.max("_n").cast("bigint").alias("n"),
        F.min("delta").cast("bigint").alias("min_s"),
        pick(50).cast("bigint").alias("p50_s"),
        pick(90).cast("bigint").alias("p90_s"),
        F.max("delta").cast("bigint").alias("max_s"),
    )
