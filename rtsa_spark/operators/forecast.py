"""Seasonal-naive forecast accuracy and periodicity-strength scan.

The reference decomposes with a FIXED, user-supplied period
(``/root/reference/R/rtsa.stl.R`` takes the raster's cycle length as
given).  At 100 TB nobody eyeballs periods: these operators quantify
(a) how predictable a tier series is under the standard seasonal-naive
baseline (Hyndman & Koehler 2006's MASE — the scale-free accuracy
metric) and (b) WHICH candidate period carries the seasonality (variance
ratio of phase means), feeding the period parameter of
``functions/stl.py`` / ``functions/x11.py``.

Exact-int contract (CLAUDE.md): on an integer tier both numerators and
denominators are exact BIGINT sums —

  MASE  = mean|x_t - x_{t-p}| / mean|x_t - x_{t-1}|
        = (sum_abs_err * (n-1)) / (sum_abs_diff * m)

  strength(p) over the first ``m*p`` rows (complete cycles, equal phase
  counts) = BSS/TSS = (p * sum_j S_j^2 - S^2) / (m*p * sum x^2 - S^2)

— each one exact-int divided by exact-int in ONE correctly-rounded float
divide, then one multiply by 1e9/1e6 and a floor: bit-identical across
engines with no ordered float sums at all.

Scale shape: a row-number window per key plus one or two map-side
combinable aggregations; rows-per-key is tier-bounded (hours/days), so
the window sort is cheap and nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_naive_accuracy", "period_strength"]


def seasonal_naive_accuracy(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, period: int
) -> DataFrame:
    """Per-key seasonal-naive (``f_t = x_{t-period}``, row lag) accuracy.

    Emits ``(key, n, m_eval, mae_e6, mase_e9)`` — ``mae_e6 = floor(1e6 *
    mean|err|)`` over the ``m_eval = n - period`` evaluable rows,
    ``mase_e9 = floor(1e9 * MASE)`` with the in-sample naive-1 denominator
    (Hyndman & Koehler 2006).  NULL metrics when there are no evaluable
    rows or the naive-1 denominator is zero (constant series).
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    w = Window.partitionBy("k").orderBy("t")
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    lagged = base.select(
        "k",
        F.abs(F.col("x") - F.lag("x", period).over(w)).alias("_err"),
        F.abs(F.col("x") - F.lag("x", 1).over(w)).alias("_diff"),
    )
    agg = lagged.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("_err").alias("m_eval"),
        F.sum("_err").alias("_se"),
        F.sum("_diff").alias("_sd"),
    )
    mae = F.floor((F.col("_se") / F.col("m_eval")) * 1e6)
    mase = F.floor(
        (
            (F.col("_se") * (F.col("n") - 1))
            / (F.col("_sd") * F.col("m_eval"))
        )
        * 1e9
    )
    return agg.select(
        F.col("k").alias(key_col),
        "n",
        "m_eval",
        F.when(F.col("m_eval") > 0, mae).cast("bigint").alias("mae_e6"),
        F.when((F.col("m_eval") > 0) & (F.col("_sd") > 0), mase)
        .cast("bigint")
        .alias("mase_e9"),
    )


def period_strength(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    periods: list[int],
) -> DataFrame:
    """Seasonality strength of each candidate period per key.

    For each ``p``, rows are truncated to the first ``m*p`` by time
    (complete cycles, so every phase has exactly ``m`` members) and the
    strength is the between-phase variance ratio ``(p * sum S_j^2 - S^2)
    / (m*p * sum x^2 - S^2)`` in [0, 1].  Emits ``(key, period, n_used,
    strength_e9)``; NULL when fewer than 2 complete cycles exist or the
    used rows are constant (TSS == 0).
    """
    if not periods or any(int(p) < 2 for p in periods):
        raise ValueError(f"periods must be ints >= 2, got {periods}")
    periods = sorted({int(p) for p in periods})
    w = Window.partitionBy(key_col).orderBy(ts_col)
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).cast("bigint").alias("x"),
        (F.row_number().over(w) - 1).alias("_i"),
        F.count(F.lit(1)).over(Window.partitionBy(key_col)).alias("_n"),
    )
    pdf = base.crossJoin(
        F.broadcast(
            base.sparkSession.createDataFrame(
                [(p,) for p in periods], "period bigint"
            )
        )
    )
    used = pdf.where(
        F.col("_i") < (F.col("_n") - F.col("_n") % F.col("period"))
    ).withColumn("_phase", F.col("_i") % F.col("period"))
    phase = used.groupBy("k", "period", "_phase").agg(
        F.sum("x").alias("_sj"),
        F.count(F.lit(1)).alias("_m"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
    )
    agg = phase.groupBy("k", "period").agg(
        F.sum(F.col("_m")).alias("n_used"),
        F.max("_m").alias("_m"),
        F.sum("_sj").alias("_s"),
        F.sum(F.col("_sj") * F.col("_sj")).alias("_ssj"),
        F.sum("_sxx").alias("_sxx"),
    )
    num = F.col("period") * F.col("_ssj") - F.col("_s") * F.col("_s")
    den = F.col("n_used") * F.col("_sxx") - F.col("_s") * F.col("_s")
    return agg.select(
        F.col("k").alias(key_col),
        "period",
        F.col("n_used").cast("bigint").alias("n_used"),
        F.when(
            (F.col("_m") >= 2) & (den > 0),
            F.floor((num / den) * 1e9),
        )
        .cast("bigint")
        .alias("strength_e9"),
    )
