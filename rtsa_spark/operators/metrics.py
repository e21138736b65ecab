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

METRICS_SCHEMA = (
    "source string, n_buckets int, value_mean double, value_stdev double,"
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
) -> DataFrame:
    """One metrics row per source from its tier series.

    Seasonal MK is used when period == 12, mirroring the reference's
    monthly-periodicity switch (``R/rtsa.mk.R:121-125``).
    """
    p = period if period is not None else DEFAULT_PERIOD.get(tier, 12)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(bucket_col)
        x = pdf[value_col].to_numpy("float64")
        t = pdf[bucket_col].to_numpy("datetime64[ns]").view("int64") / 1e9
        comp = decompose(x, p)
        stats = component_stats(comp["seasonal"], comp["trend"], comp["remainder"], t, p)
        mk = seasonal_mann_kendall(x, p) if p == 12 else mann_kendall(x)
        return pd.DataFrame(
            [
                {
                    "source": pdf[key_col].iloc[0],
                    "n_buckets": len(x),
                    "value_mean": float(np.mean(x)) if len(x) else float("nan"),
                    "value_stdev": float(np.std(x, ddof=1)) if len(x) >= 2 else float("nan"),
                    **stats,
                    **mk,
                }
            ]
        )

    return tier_df.groupBy(key_col).applyInPandas(kernel, METRICS_SCHEMA)
