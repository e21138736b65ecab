"""Per-key trend estimation over retention tiers: exact-sum OLS and the
Theil–Sen robust slope.

Complements the reference's trend surface — Mann-Kendall significance
(``/root/reference/R/rtsa.trend.R``, our ``functions/kendall.py``) and the
STL endpoint slope (``R/rtsa.stl.R:366-373``, ``functions/decompose.py``)
— with the two standard slope *estimators*: least squares (with R²) and
the median-of-pairwise-slopes Theil–Sen estimator that Mann-Kendall is
usually paired with (Sen 1968, public).

Scale shapes:

- :func:`ols_trend` is pure Catalyst: one window (row index per key) +
  one map-side-combinable aggregation of six exact-integer sums, then a
  fixed chain of correctly-rounded float ops — bit-identical across
  engines (CLAUDE.md IEEE-deterministic contract). One shuffle.
- :func:`theil_sen` is O(n²) in the per-key bucket count — inherent to
  the estimator. n is the TIER length (bounded by the retention window,
  e.g. ~10⁴ hourly buckets/year), never the raw input, so the vectorized
  numpy kernel (np broadcasting over the pair triangle) stays in the
  tens-of-MB range per key regardless of raw-data scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ols_trend", "theil_sen"]


def ols_trend(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Least-squares trend per key over an INTEGER value series, with the
    regressor being the 0-based bucket rank (uniform spacing — the tier
    contract). Emits per key, IEEE-deterministically:

    ``n``, ``sy`` (exact sums), ``slope_e9`` / ``intercept_e6`` /
    ``r2_e6`` (floor-quantized; NULL when n < 2 or the series is
    constant). All intermediate sums stay exact integers < 2^53; the
    final ops are single correctly-rounded divides/multiplies, so any
    engine replays the identical doubles.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    idx = df.select(
        key_col,
        (F.row_number().over(w) - 1).cast("bigint").alias("i"),
        F.col(value_col).cast("bigint").alias("y"),
    )
    sums = idx.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
        F.sum(F.col("i") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = n * F.col("sxx") - sx * sx
    dtot = n * F.col("syy") - sy * sy
    slope = num / den  # exact ints -> one correctly-rounded divide
    r2 = (num / den) * (num / dtot)
    intercept = (sy - slope * sx) / n
    ok = (n >= 2) & (den > 0)
    return sums.select(
        key_col,
        "n",
        sy.alias("sy"),
        F.when(ok, F.floor(slope * 1e9)).cast("bigint").alias("slope_e9"),
        F.when(ok, F.floor(intercept * 1e6)).cast("bigint").alias("intercept_e6"),
        F.when(ok & (dtot > 0), F.floor(r2 * 1e6)).cast("bigint").alias("r2_e6"),
    )


def _theil_sen_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("_ts")
    y = pdf["_y"].to_numpy(dtype="int64")
    n = len(y)
    key = pdf["_k"].iloc[0]
    if n < 2:
        return pd.DataFrame(
            {"_k": [key], "n": [n], "n_pairs": [0], "ts_slope_e9": [None]}
        )
    i = np.arange(n, dtype="int64")
    # pair triangle: slopes (y_j - y_i) / (j - i), i < j — exact ints into
    # one correctly-rounded divide each, so any engine replays the same
    # doubles and sorts them identically.
    dy = y[None, :] - y[:, None]
    dx = i[None, :] - i[:, None]
    mask = dx > 0
    slopes = np.sort(dy[mask].astype("float64") / dx[mask].astype("float64"))
    m = len(slopes)
    if m % 2:
        med = slopes[m // 2]
    else:
        med = (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    return pd.DataFrame(
        {
            "_k": [key],
            "n": [n],
            "n_pairs": [m],
            "ts_slope_e9": [int(np.floor(1e9 * med))],
        }
    )


def theil_sen(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Theil–Sen robust slope per key (Sen 1968): the median of all
    pairwise slopes over the rank-spaced integer series. Vectorized numpy
    kernel per key (applyInPandas, Arrow-batched); median by explicit
    sort + middle selection so a SQL oracle replays it rank-for-rank.

    Emits ``(key, n, n_pairs, ts_slope_e9)`` — slope floor-quantized at
    1e9, NULL when n < 2.
    """
    prepped = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("bigint").alias("_y"),
    )
    out = prepped.groupBy("_k").applyInPandas(
        _theil_sen_kernel, "_k string, n long, n_pairs long, ts_slope_e9 long"
    )
    return out.withColumnRenamed("_k", key_col)
