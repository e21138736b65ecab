"""Per-source metrics table — the STDstack/MKstack analog (SURVEY.md §2.4).

One ``applyInPandas`` pass per source over its (gap-filled, bucket-ordered)
tier series computes the full statistics row: seasonal decomposition stats
(A1-A4) + Mann-Kendall (A6). The reference computes the same numbers per
pixel in ``rtsa.stlpar`` (``/root/reference/R/rtsa.stl.R:352-385``) and
``rtsa.mkpar`` (``R/rtsa.mk.R:296-312``) over a PSOCK cluster; here the
shuffle on ``source`` is the only data movement and every kernel is numpy.

Run AFTER masks (two-phase refinement): ``mask_min_observations(tier, 5)``
and/or ``mask_max_consecutive_gap`` prune sources cheaply before this
(relatively) expensive stage — Catalyst won't invent that ordering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from rtsa_spark.functions.decompose import component_stats, decompose
from rtsa_spark.functions.kendall import mann_kendall, seasonal_mann_kendall

#: default cycle length per tier (reference periodicity enum,
#: ``R/rtsa.stl.R:128-135``): monthly data cycles yearly, daily weekly,
#: hourly daily.
DEFAULT_PERIOD = {"hourly": 24, "daily": 7, "monthly": 12}

def _metrics_schema(key_col: str) -> str:
    return (
        f"{key_col} string, n_buckets int, value_mean double, value_stdev double,"
        " seasonal_amplitude double, trend_slope double, remainder_stdev double,"
        " seas_amp_cycle_mean double, seas_amp_cycle_stdev double,"
        " mk_s double, mk_vars double, mk_tau double, mk_p double"
    )


def compute_metrics(
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
    """One metrics row per source from its tier series.

    Seasonal MK is used when period == 12, mirroring the reference's
    monthly-periodicity switch (``R/rtsa.mk.R:121-125``).

    ``s_window``: "periodic" (default) uses the closed-form periodic
    decomposition; a numeric window runs the genuine STL loess loop with
    the reference's window/degree surface (``R/rtsa.stl.R:140-169``) —
    ``t_window=None`` then defaults to the odd-ized series length, the
    reference wrapper's own default (``:148-150``).

    ``decomposition="x11"`` switches to the X-11 MA-cascade core
    (functions/x11.py; reference rtsa.seas, ``R/rtsa.seas.R:275-285``) —
    same statistics contract over its components. DIVERGENCE: series ends
    use symmetric reflect padding, not X-11's asymmetric Musgrave end
    filters, so the first/last ~half-filter-width of the trend (and the
    trend-endpoint slope statistic) differ slightly from X-13 output;
    interior values match. The X-13-SEATS variant is out of scope
    (SURVEY.md §2.6).

    ``outer``: STL robustness iterations (Cleveland 1990); default 0
    diverges from stlplus's one outer pass — see
    :func:`rtsa_spark.functions.stl.stl_decompose`.
    """
    p = period if period is not None else DEFAULT_PERIOD.get(tier, 12)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(bucket_col)
        x = pdf[value_col].to_numpy("float64")
        t = pdf[bucket_col].to_numpy("datetime64[ns]").view("int64") / 1e9
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
        stats = component_stats(comp["seasonal"], comp["trend"], comp["remainder"], t, p)
        mk = seasonal_mann_kendall(x, p) if p == 12 else mann_kendall(x)
        return pd.DataFrame(
            [
                {
                    key_col: pdf[key_col].iloc[0],
                    "n_buckets": len(x),
                    "value_mean": float(np.mean(x)) if len(x) else float("nan"),
                    "value_stdev": float(np.std(x, ddof=1)) if len(x) >= 2 else float("nan"),
                    **stats,
                    **mk,
                }
            ]
        )

    return tier_df.groupBy(key_col).applyInPandas(kernel, _metrics_schema(key_col))


def _deterministic_schema(key_col: str) -> str:
    return (
        f"{key_col} string, n_buckets bigint, x_sum bigint, value_mean_e4 bigint,"
        " seasonal_amplitude_e4 bigint, trend_slope_e9 bigint,"
        " mk_s bigint, mk_vars18 bigint, mk_tau_e6 bigint"
    )


def compute_metrics_deterministic(
    tier_df: DataFrame,
    tier: str,
    value_col: str = "n_tok_sum",
    period: int | None = None,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Oracle-facing metrics row per source over an INTEGER-valued tier
    series: decomposition stats via exact-int numerators
    (:func:`rtsa_spark.functions.decompose.decompose_deterministic_stats`)
    and Mann-Kendall emitted as exact integers (S, 18*varS) plus the
    IEEE-deterministic ``floor(1e6*tau)``. Every output column hash-matches
    a DuckDB oracle replaying the same integer recipe; pytest ties these to
    the float64 production kernel (:func:`compute_metrics`).

    Same reference statistics contract as compute_metrics
    (``/root/reference/R/rtsa.stl.R:363-375``, ``R/rtsa.mk.R:296-312``).
    """
    import math

    import numpy as np

    from rtsa_spark.functions.decompose import decompose_deterministic_stats
    from rtsa_spark.functions.kendall import (
        MK_MIN_OBS,
        _s_and_ties,
        _tau_denominator,
        _var_s,
    )

    p = period if period is not None else DEFAULT_PERIOD.get(tier, 12)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        x = pdf[value_col].to_numpy("int64")
        t = pdf[bucket_col].to_numpy("datetime64[ns]").view("int64") // 1_000_000_000
        n = len(x)
        span = int(t[-1] - t[0]) if n >= 2 else 0
        dstats = decompose_deterministic_stats(x, p, span)
        row = {
            key_col: pdf[key_col].iloc[0],
            "n_buckets": n,
            "x_sum": int(x.sum()),
            "value_mean_e4": (10000 * int(x.sum())) // n if n else None,
            "seasonal_amplitude_e4": dstats["seasonal_amplitude_e4"],
            "trend_slope_e9": dstats["trend_slope_e9"],
            "mk_s": None,
            "mk_vars18": None,
            "mk_tau_e6": None,
        }
        if n >= MK_MIN_OBS:
            s, ties = _s_and_ties(x.astype("float64"))
            var_s = _var_s(n, ties)
            denom = _tau_denominator(n, ties)
            row["mk_s"] = int(s)
            row["mk_vars18"] = int(round(var_s * 18))  # varS = int/18 -> exact
            if denom > 0:
                row["mk_tau_e6"] = math.floor(1_000_000.0 * (s / denom))
        return pd.DataFrame([row]).astype(
            {
                c: "Int64"
                for c in (
                    "value_mean_e4", "seasonal_amplitude_e4", "trend_slope_e9",
                    "mk_s", "mk_vars18", "mk_tau_e6",
                )
            }
        )

    return tier_df.groupBy(key_col).applyInPandas(
        kernel, _deterministic_schema(key_col)
    )
