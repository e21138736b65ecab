"""Hampel rolling-median anomaly filter over a retention tier.

The reference's outlier handling is implicit (stlplus robustness weights
inside ``/root/reference/R/rtsa.stl.R:360``; our ``functions/stl.py``
outer loop).  This operator makes outlier detection a first-class tier
operation: the classic Hampel identifier (Hampel 1974; Pearson 2002,
public) flags ``x_t`` when ``|x_t - med_t| > k * MAD_t`` with ``med_t``
/ ``MAD_t`` the rolling median / median-absolute-deviation over a
centered window of ``2h+1`` buckets.

Exact-int contract (CLAUDE.md): the tier value is integer, the window
length is odd, and the median of an odd number of integers is an
element, not an average — so ``med``, ``dev = |x - med|``, ``mad`` and
the flag comparison ``dev * k_den > k_num * mad`` are ALL exact BIGINT
arithmetic.  No floats anywhere; both engines agree bit-for-bit by
construction.  Edge rows whose window is short (fewer than ``2h+1``
neighbors) emit NULL med/mad/flag — the caller decides edge policy.

Scale shape: one window sort per key (the tier is already small —
hours/days per source), sorted-array medians via ``sort_array`` +
``element_at`` inside codegen, no UDFs, no shuffle beyond the
per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hampel"]


def hampel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_window: int = 3,
    k_num: int = 44478,
    k_den: int = 10000,
) -> DataFrame:
    """Flag per-bucket outliers with a rolling-median Hampel identifier.

    ``k_num / k_den`` is the threshold multiplier applied to the rolling
    MAD (default 4.4478 = 3 * 1.4826, the Gaussian-consistent Hampel
    default).  Emits ``(key, t, x, med, mad, anom)`` where ``anom`` is
    1/0, and med/mad/anom are NULL on short edge windows.
    """
    if half_window < 1:
        raise ValueError(f"half_window must be >= 1, got {half_window}")
    if k_num < 0 or k_den <= 0:
        raise ValueError(f"bad threshold {k_num}/{k_den}")
    full = 2 * half_window + 1
    w = (
        Window.partitionBy("k")
        .orderBy("t")
        .rowsBetween(-half_window, half_window)
    )
    arr = F.sort_array(F.collect_list(F.col("x")).over(w))
    out = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("t"),
            F.col(value_col).cast("bigint").alias("x"),
        )
        .withColumn("_arr", arr)
        .withColumn(
            "med",
            F.when(
                F.size("_arr") == full, F.element_at("_arr", half_window + 1)
            ),
        )
        .withColumn(
            "mad",
            F.element_at(
                F.sort_array(
                    F.transform("_arr", lambda v: F.abs(v - F.col("med")))
                ),
                half_window + 1,
            ),
        )
        .withColumn(
            "anom",
            F.when(
                F.col("med").isNotNull(),
                (
                    F.abs(F.col("x") - F.col("med")) * F.lit(int(k_den))
                    > F.lit(int(k_num)) * F.col("mad")
                ).cast("bigint"),
            ),
        )
    )
    return out.select(
        F.col("k").alias(key_col), "t", "x", "med", "mad", "anom"
    )
