"""Per-bucket component series — the STDstack brick table (SURVEY.md §2.4).

The reference's ``only.statistics=FALSE`` path returns the full seasonal/
trend/remainder series per cell (``/root/reference/R/rtsa.stl.R:378-382,
441-489``; seas variant ``R/rtsa.seas.R:330-334``) — a user doing seasonal
adjustment wants the adjusted series, not just its amplitude. Round 2
computed the components inside the metrics kernel but never emitted them;
this operator writes the ``(source, bucket, value, seasonal, trend,
remainder)`` table.

Scale shape: one shuffle on ``source`` into a grouped Arrow kernel (numpy
body, no per-row Python); output is tier-sized (same row count as the
input tier), so the stage neither expands nor collects data. Parallelism
is bounded by source cardinality — fine at production source counts.

:func:`decompose_components_deterministic` is the oracle-facing twin for
the periodic-seasonal closed form: every component value is an exact-int
numerator over a common denominator (the same D2 = den*Q*p construction as
``functions.decompose.decompose_deterministic_stats``), quantized with one
floor-divide — DuckDB replays it bit-exactly (``__spark_entry__``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtsa_spark.functions.decompose import decompose
from rtsa_spark.operators.metrics import DEFAULT_PERIOD


def decompose_components(
    tier_df: DataFrame,
    tier: str,
    value_col: str = "n_tok_mean",
    period: int | None = None,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    s_window: int | str = "periodic",
    s_degree: int = 0,
    t_window: int | None = None,
    t_degree: int = 1,
    decomposition: str = "stl",
    outer: int = 0,
) -> DataFrame:
    """Full component series per (source, bucket) — same decomposition
    surface as ``compute_metrics`` (periodic closed form, numeric-window
    STL loess, or the X-11 MA cascade), but emitting every bucket's
    seasonal/trend/remainder instead of the stats row.

    Identity: ``value = seasonal + trend + remainder`` holds exactly
    (remainder is computed as the residual); ``component_stats`` of the
    emitted series equals the ``compute_metrics`` row (pytest-pinned).
    """
    p = period if period is not None else DEFAULT_PERIOD.get(tier, 12)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        x = pdf[value_col].to_numpy("float64")
        if decomposition == "x11":
            from rtsa_spark.functions.x11 import x11_decompose

            comp = x11_decompose(x, p)
        elif s_window == "periodic" and t_window is None and outer == 0:
            comp = decompose(x, p)
        else:
            from rtsa_spark.functions.stl import stl_decompose

            comp = stl_decompose(
                x, p, s_window=s_window, s_degree=s_degree,
                t_window=t_window, t_degree=t_degree, outer=outer,
            )
        return pd.DataFrame(
            {
                key_col: pdf[key_col].to_numpy(),
                bucket_col: pdf[bucket_col].to_numpy(),
                "value": x,
                "seasonal": comp["seasonal"],
                "trend": comp["trend"],
                "remainder": x - comp["seasonal"] - comp["trend"],
            }
        )

    return tier_df.groupBy(key_col).applyInPandas(
        kernel,
        f"{key_col} string, {bucket_col} timestamp, value double,"
        " seasonal double, trend double, remainder double",
    )


def component_strength(comp_df: DataFrame, key_col: str = "source") -> DataFrame:
    """Trend/seasonal strength per key over a deterministic component
    table (Wang, Smith & Hyndman 2006; Hyndman & Athanasopoulos FPP3
    §4.3): ``F_trend = max(0, 1 - Var(R)/Var(T+R))``, ``F_seasonal =
    max(0, 1 - Var(R)/Var(S+R))`` — the single-number "does this series
    have structure worth decomposing?" screen used to rank thousands of
    sources before running the heavier STL/X-11/EOF analytics on them.

    Input is the ``*_e4`` exact-int table from
    :func:`decompose_components_deterministic`. Each component is
    trunc-quantized to integer units (``div 10000`` — truncation toward
    zero, matching DuckDB ``//``), so every multi-term sum (sums and
    sums of squares) stays in the exact-int domain, and only a FIXED
    final sequence of correctly-rounded double ops (two casts, divide,
    subtract, clamp, scale, floor) produces each ``*_e6`` — bit-identical
    on any IEEE engine (CLAUDE.md contract). Quantized values past ~3e6
    would push n * sum-of-squares toward 2^63; ANSI mode then throws
    loudly rather than wrapping — rescale the input tier (the same rule
    as the decomposition twin's 2^53 guard).

    NULL strength when the corresponding variance numerator is zero
    (constant series — the ratio is undefined, not zero).

    Shape: one map-side-combinable aggregation over the tier-sized
    component table; output is key-count rows.
    """
    q = comp_df.select(
        key_col,
        F.expr("remainder_e4 div 10000").alias("r0"),
        F.expr("(seasonal_e4 + remainder_e4) div 10000").alias("d0"),
        F.expr("(trend_e4 + remainder_e4) div 10000").alias("t0"),
    )
    agg = q.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r0").alias("sr"),
        F.sum(F.col("r0") * F.col("r0")).alias("srr"),
        F.sum("d0").alias("sd"),
        F.sum(F.col("d0") * F.col("d0")).alias("sdd"),
        F.sum("t0").alias("st"),
        F.sum(F.col("t0") * F.col("t0")).alias("stt"),
    )
    vr = F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")
    vd = F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    vt = F.col("n") * F.col("stt") - F.col("st") * F.col("st")

    def strength(v_rem, v_comp):
        ratio = v_rem.cast("double") / v_comp.cast("double")
        return F.when(
            v_comp > 0,
            F.floor(F.lit(1000000.0) * F.greatest(F.lit(0.0), F.lit(1.0) - ratio)),
        ).cast("bigint")

    return agg.select(
        key_col,
        "n",
        strength(vr, vt).alias("f_trend_e6"),
        strength(vr, vd).alias("f_seasonal_e6"),
    )


def decompose_components_deterministic(
    tier_df: DataFrame,
    tier: str,
    value_col: str = "n_tok_sum",
    period: int | None = None,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Oracle-facing component series over an INTEGER tier (periodic
    seasonal, odd period): exact-int numerators with common denominators
    (seasonal: D2 = den*Q*p; trend/remainder: D2*w), one floor-divide per
    emitted ``*_e4`` value — bit-replayable by any engine running the same
    integer recipe. Mirrors
    ``functions.decompose.decompose_deterministic_stats`` (same reflect
    padding, per-phase sums, final MA on the deseasonalized series); the
    float64 production path is pinned to this twin in tests.

    Degenerate series (n < 2*period) follow ``decompose``'s contract:
    zero seasonal, trend = x, zero remainder.
    """
    import numpy as np

    p = period if period is not None else DEFAULT_PERIOD.get(tier, 12)
    if p % 2 != 1:
        raise ValueError("deterministic component twin requires an odd period")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        x = pdf[value_col].to_numpy("int64")
        n = len(x)
        key = pdf[key_col].to_numpy()
        b = pdf[bucket_col].to_numpy()
        if n < 2 * p:
            return pd.DataFrame(
                {
                    key_col: key,
                    bucket_col: b,
                    "x": x,
                    "seasonal_e4": np.zeros(n, dtype=np.int64),
                    "trend_e4": 10_000 * x,
                    "remainder_e4": np.zeros(n, dtype=np.int64),
                }
            )
        half = p // 2
        xp = np.pad(x, (half, half), mode="reflect")
        kern = np.ones(p, dtype=np.int64)
        den = p
        t0_num = np.convolve(xp, kern, mode="valid")
        detr_num = den * x - t0_num
        phases = np.arange(n) % p
        q, r = divmod(n, p)
        c_ph = np.where(np.arange(p) < r, q + 1, q).astype(np.int64)
        ph_sum = np.zeros(p, dtype=np.int64)
        np.add.at(ph_sum, phases, detr_num)
        Q = q * (q + 1)
        D2 = den * Q * p
        overall_num = int(np.sum(ph_sum * (Q // c_ph)))
        s_num = ph_sum * ((Q * p) // c_ph) - overall_num
        sn = s_num[phases]
        deseason_num = D2 * x - sn
        w = p  # odd period
        wh = w // 2
        dp = np.pad(deseason_num, (wh, wh), mode="reflect")
        tn = np.convolve(dp, np.ones(w, dtype=np.int64), mode="valid")
        rem_num = D2 * w * x - w * sn - tn
        # exact-int bit-equality contract (same rule as the EOT Gramian):
        # every scaled numerator must stay in float64-exact range
        lim = 2**53
        if max(
            int(np.abs(10_000 * sn).max()),
            int(np.abs(10_000 * tn).max()),
            int(np.abs(10_000 * rem_num).max()),
        ) >= lim:
            raise ValueError(
                "decompose_components_deterministic exact-int domain exceeded;"
                " rescale the input to keep the oracle bit-exact"
            )
        return pd.DataFrame(
            {
                key_col: key,
                bucket_col: b,
                "x": x,
                "seasonal_e4": np.floor_divide(10_000 * sn, D2),
                "trend_e4": np.floor_divide(10_000 * tn, D2 * w),
                "remainder_e4": np.floor_divide(10_000 * rem_num, D2 * w),
            }
        )

    return tier_df.groupBy(key_col).applyInPandas(
        kernel,
        f"{key_col} string, {bucket_col} timestamp, x bigint,"
        " seasonal_e4 bigint, trend_e4 bigint, remainder_e4 bigint",
    )
