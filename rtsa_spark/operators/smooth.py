"""Exponential smoothing over a retention tier: SES level and Holt
level+trend with an h-step linear forecast.

Complements the reference's decomposition surface (STL/X-11 extract
seasonal structure; ``/root/reference/R/rtsa.stl.R``): exponential
smoothing (Brown 1956; Holt 1957 — public) is the standard low-state
alternative when a tier consumer wants a current "level" and a drift
estimate per source without a full decomposition — it is also exactly
the per-key O(1)-state recursion a streaming tracker would keep, so the
batch operator doubles as the replay oracle for
``streaming/stateful.py``-style state.

IEEE-deterministic contract (CLAUDE.md): the recursions

    SES :  l_t = a * x_t + (1-a) * l_{t-1}                 (l_0 = x_0)
    Holt:  l_t = a * x_t + (1-a) * (l_{t-1} + b_{t-1})     (l_0 = x_0)
           b_t = g * (l_t - l_{t-1}) + (1-g) * b_{t-1}     (b_0 = 0)

are ordered left-folds of correctly-rounded double ops.  Both engines
evaluate the IDENTICAL op sequence — Spark as a ``aggregate`` lambda
over the time-sorted array, DuckDB as a scalar ``list_reduce`` (SES) /
recursive CTE (Holt; DuckDB 1.0's ``list_reduce`` mis-binds STRUCT
accumulator fields, so coupled recursions must not use it) — so the
finals are bit-identical when ``a``/``g`` are exactly-representable
binary rationals (0.25, 0.125, ...).  ``b_0 = 0`` (not the classical
``x_1 - x_0``) keeps the single-element base case trivial; documented
divergence.

Scale shape: one ``collect_list`` per key (tier-bounded series), fold
inside codegen, no UDFs; state per key is O(1) regardless of series
length.  The collected array itself is the bound: a key's series must
fit one task's memory, so both operators take ``max_points``
(default 1,000,000 — a ~16 MB struct array, far above any real tier's
bucket count) and FAIL LOUDLY via ``raise_error`` when a skewed key
exceeds it, instead of OOM-ing an executor.  Feed coarser tiers or
pre-chunk (e.g. per-year sub-keys) past that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["holt_smooth", "holt_winters"]


def _guarded_size(max_points: int, fn_name: str):
    """Plan-level state cap: size of the per-key collected array, or a
    loud task failure when it exceeds ``max_points`` (the same
    fail-don't-overflow pattern as the 2^53 guards). Kept inside the
    projection so column pruning can never drop the check."""
    return F.when(
        F.size("_arr") > max_points,
        F.raise_error(
            F.format_string(
                fn_name + ": key %s collected %s points > max_points="
                + str(int(max_points))
                + " — feed a coarser tier or pre-chunk the key",
                F.col("k").cast("string"),
                F.size("_arr").cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.size("_arr"))


def _check_binary_rational(name: str, v: float) -> None:
    # exactly-representable check: v * 2^20 must be integral and v in (0,1)
    if not (0.0 < v < 1.0) or (v * (1 << 20)) != int(v * (1 << 20)):
        raise ValueError(
            f"{name}={v} must be a binary rational k/2^m in (0,1), m<=20, "
            "or cross-engine bit-equality is lost"
        )


def holt_smooth(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    beta: float = 0.125,
    horizon: int = 24,
    max_points: int = 1_000_000,
) -> DataFrame:
    """Per-key SES + Holt finals over the time-ordered integer series.

    Emits ``(key, n, ses_e6, level_e6, trend_e6, fc_e6)`` — all
    ``floor(1e6 * value)`` of the final SES level, Holt level, Holt
    trend, and the ``horizon``-step forecast ``l + horizon * b``.
    A key whose series exceeds ``max_points`` fails the job loudly
    (module docstring: the fold's state cap).
    """
    _check_binary_rational("alpha", alpha)
    _check_binary_rational("beta", beta)
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    if max_points < 1:
        raise ValueError(f"max_points must be >= 1, got {max_points}")
    a, na, g, ng = (
        float(alpha),
        1.0 - float(alpha),
        float(beta),
        1.0 - float(beta),
    )

    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(value_col).cast("bigint").alias("x"),
            )
        )
    )
    grouped = df.groupBy(F.col(key_col).alias("k")).agg(arr.alias("_arr"))
    xs = F.transform("_arr", lambda s: s["x"].cast("double"))
    with_xs = grouped.select(
        "k",
        _guarded_size(max_points, "holt_smooth").alias("n"),
        xs.alias("_xs"),
    )
    tail = F.slice("_xs", 2, F.col("n") - 1)

    def holt_l(acc, e):
        return F.lit(a) * e + F.lit(na) * (acc["l"] + acc["b"])

    folded = with_xs.select(
        "k",
        F.col("n").cast("bigint").alias("n"),
        F.aggregate(
            tail,
            F.element_at("_xs", 1),
            lambda acc, e: F.lit(a) * e + F.lit(na) * acc,
        ).alias("_ses"),
        F.aggregate(
            tail,
            F.struct(
                F.element_at("_xs", 1).alias("l"), F.lit(0.0).alias("b")
            ),
            lambda acc, e: F.struct(
                holt_l(acc, e).alias("l"),
                (
                    F.lit(g) * (holt_l(acc, e) - acc["l"])
                    + F.lit(ng) * acc["b"]
                ).alias("b"),
            ),
        ).alias("_st"),
    )
    e6 = lambda c: F.floor(c * F.lit(1e6)).cast("bigint")  # noqa: E731
    return folded.select(
        F.col("k").alias(key_col),
        "n",
        e6(F.col("_ses")).alias("ses_e6"),
        e6(F.col("_st.l")).alias("level_e6"),
        e6(F.col("_st.b")).alias("trend_e6"),
        e6(
            F.col("_st.l") + F.lit(float(horizon)) * F.col("_st.b")
        ).alias("fc_e6"),
    )


def holt_winters(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.25,
    beta: float = 0.125,
    delta: float = 0.25,
    horizon: int = 24,
    max_points: int = 1_000_000,
) -> DataFrame:
    """Additive Holt-Winters (Winters 1960) level/trend/seasonal finals
    per key, same IEEE-deterministic fold contract as :func:`holt_smooth`:

        l_t = a*(x_t - s_{t-p}) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
        s_t = d*(x_t - l_t)     + (1-d)*s_{t-p}

    State is a struct ``(l, b, s[p])`` with the seasonal vector kept as a
    rotating queue (head = the seasonal owed to the CURRENT step), folded
    left over the time-sorted array inside codegen.  Init is the
    simplified deterministic start ``l_0 = x_0, b_0 = 0, s = zeros(p)``
    — the first element only sets the level, exactly as in
    :func:`holt_smooth` (classical init instead fits a full first cycle;
    documented divergence — after a few cycles the recursions coincide).

    Emits ``(key, n, level_e6, trend_e6, s_next_e6, fc_e6)`` — finals at
    1e-6 floor quantization; ``s_next_e6`` is the seasonal the NEXT
    bucket would consume, ``fc_e6 = l + horizon*b + s[(horizon-1) mod p]``
    the additive h-step forecast.

    Scale shape: identical to :func:`holt_smooth` — one ``collect_list``
    per key, O(p) state, no UDFs.
    """
    _check_binary_rational("alpha", alpha)
    _check_binary_rational("beta", beta)
    _check_binary_rational("delta", delta)
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    if max_points < 1:
        raise ValueError(f"max_points must be >= 1, got {max_points}")
    p = int(period)
    a, na = float(alpha), 1.0 - float(alpha)
    g, ng = float(beta), 1.0 - float(beta)
    d, nd = float(delta), 1.0 - float(delta)

    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(value_col).cast("bigint").alias("x"),
            )
        )
    )
    grouped = df.groupBy(F.col(key_col).alias("k")).agg(arr.alias("_arr"))
    xs = F.transform("_arr", lambda s: s["x"].cast("double"))
    with_xs = grouped.select(
        "k",
        _guarded_size(max_points, "holt_winters").alias("n"),
        xs.alias("_xs"),
    )

    def step(acc, e):
        s1 = F.element_at(acc["s"], 1)
        l2 = F.lit(a) * (e - s1) + F.lit(na) * (acc["l"] + acc["b"])
        return F.struct(
            l2.alias("l"),
            (F.lit(g) * (l2 - acc["l"]) + F.lit(ng) * acc["b"]).alias("b"),
            F.concat(
                F.slice(acc["s"], 2, p - 1),
                F.array(F.lit(d) * (e - l2) + F.lit(nd) * s1),
            ).alias("s"),
        )

    folded = with_xs.select(
        "k",
        F.col("n").cast("bigint").alias("n"),
        F.aggregate(
            F.slice("_xs", 2, F.col("n") - 1),
            F.struct(
                F.element_at("_xs", 1).alias("l"),
                F.lit(0.0).alias("b"),
                F.array_repeat(F.lit(0.0), p).alias("s"),
            ),
            step,
        ).alias("_st"),
    )
    e6 = lambda c: F.floor(c * F.lit(1e6)).cast("bigint")  # noqa: E731
    fc = (
        F.col("_st.l")
        + F.lit(float(horizon)) * F.col("_st.b")
        + F.element_at(F.col("_st.s"), ((horizon - 1) % p) + 1)
    )
    return folded.select(
        F.col("k").alias(key_col),
        "n",
        e6(F.col("_st.l")).alias("level_e6"),
        e6(F.col("_st.b")).alias("trend_e6"),
        e6(F.element_at(F.col("_st.s"), 1)).alias("s_next_e6"),
        e6(fc).alias("fc_e6"),
    )
