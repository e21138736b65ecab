"""Autocorrelation function (ACF) and the Ljung-Box portmanteau statistic
per key over a retention tier.

Complements the reference's serial-dependence surface — Mann-Kendall
(``/root/reference/R/rtsa.trend.R``, our ``functions/kendall.py``) tests
monotone trend; the ACF quantifies serial correlation at explicit lags and
Ljung-Box (Ljung & Box 1978, public) tests the joint null of white noise,
the standard pre-check before fitting the decompositions rtsa runs
(STL/X-11 assume autocorrelated structure worth extracting).

IEEE-deterministic contract (CLAUDE.md): with ``S = sum(x)``, ``n =
count`` per key, work on integer residual numerators ``z_i = n*x_i - S``
(exact ``bigint``; ANSI overflow throws loudly).  The lag-L estimator

    r_L = sum_i z_i * z_{i-L} / sum_i z_i^2

uses the FULL-series mean and denominator (the standard biased
estimator, e.g. R ``acf()``).  Numerator and denominator are exact
integer sums in BOTH engines (Spark LongType, DuckDB HUGEINT); int->double
conversion and the single divide are correctly rounded, so the quotient
is bit-identical with no 2^53 cap on the sums themselves.  Ljung-Box

    Q = n(n+2) * sum_{l=1..K} r_l^2 / (n-l)

is a fixed chain: per-lag ``(r*r)/(n-l)`` then an ORDERED (ascending-lag)
left-fold float sum — the ``list_sum(list(x ORDER BY k))`` pattern — then
one multiply by the exact int ``n(n+2)`` and one by ``1e6``, then floor.

Scale shape: one stats agg (map-side combine) + broadcast join back, one
window sort per key, one final map-side-combinable agg.  Lags are
compile-time constants so every lag product rides the SAME window pass —
no per-lag self-join, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["acf", "ccf", "ljung_box"]


def _acf_long(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, lags: list[int]
) -> DataFrame:
    """(key, lag, n, num, den) exact-int long table for the given lags."""
    if not lags or any(int(l) <= 0 for l in lags):
        raise ValueError(f"lags must be positive ints, got {lags}")
    lags = sorted({int(l) for l in lags})
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    stats = base.groupBy("_k").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_x").alias("_sx")
    )
    w = Window.partitionBy("_k").orderBy("_ts")
    z = (
        base.join(F.broadcast(stats), "_k")
        .withColumn("_z", F.col("_n") * F.col("_x") - F.col("_sx"))
        .select(
            "_k",
            "_n",
            "_z",
            *[F.lag("_z", L).over(w).alias(f"_zl{L}") for L in lags],
        )
    )
    agg = z.groupBy("_k", "_n").agg(
        F.sum(F.col("_z") * F.col("_z")).alias("_den"),
        *[
            F.sum(F.col("_z") * F.col(f"_zl{L}")).alias(f"_num{L}")
            for L in lags
        ],
    )
    stacked = agg.select(
        "_k",
        "_n",
        "_den",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("bigint").alias("lag"),
                        F.col(f"_num{L}").alias("num"),
                    )
                    for L in lags
                ]
            )
        ).alias("_s"),
    )
    return stacked.select(
        F.col("_k").alias(key_col),
        F.col("_s.lag").alias("lag"),
        F.col("_n").alias("n"),
        F.col("_s.num").alias("num"),
        F.col("_den").alias("den"),
    )


def acf(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, lags: list[int]
) -> DataFrame:
    """Per-key ACF at the given lags over an integer series.

    Emits ``(key, lag, n, acf_e9)`` — ``acf_e9 = floor(1e9 * r_lag)``,
    NULL when ``n <= lag`` (no pairs) or the series is constant
    (``den == 0``). One row per (key, lag), lags ascending.
    """
    long = _acf_long(df, key_col, ts_col, value_col, lags)
    ok = (F.col("n") > F.col("lag")) & (F.col("den") > 0)
    return long.select(
        key_col,
        "lag",
        "n",
        F.when(ok, F.floor((F.col("num") / F.col("den")) * 1e9))
        .cast("bigint")
        .alias("acf_e9"),
    )


def ccf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    lags: list[int],
) -> DataFrame:
    """Cross-correlation between every ordered key pair at given lags.

    For each pair ``(kx, ky)`` with ``kx < ky`` the two series are inner-
    joined on the bucket (the pair's COMMON spine, length ``m``) and

        r_xy(L) = sum_t zx_t * zy_{t-L} / (sqrt(sum zx^2) * sqrt(sum zy^2))

    with ``zx_i = m*x_i - Sx`` / ``zy_i = m*y_i - Sy`` the exact-int
    residual numerators over the common spine (positive ``r`` at lag L
    means y LEADS x by L buckets).  Numerator and the two denominator
    sums are exact integer sums; the final chain is int->double
    conversions, two correctly-rounded ``sqrt``s, one multiply, one
    divide — bit-identical across engines (``sqrt(A)*sqrt(B)``, never
    ``sqrt(A*B)``: the product can overflow the exact-int domain).
    Emits ``(kx, ky, lag, m, ccf_e9)``; NULL when ``m <= lag`` or
    either series is constant on the common spine.

    Scale shape: one equi-join on bucket (quadratic in KEY count, not in
    rows — callers with many keys should pre-filter the pair set), then
    the same single-window single-agg design as :func:`acf`.
    """
    if not lags or any(int(l) < 0 for l in lags):
        raise ValueError(f"lags must be ints >= 0, got {lags}")
    lags = sorted({int(l) for l in lags})
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    left = base.select(
        F.col("_k").alias("kx"), "_ts", F.col("_x").alias("x")
    )
    right = base.select(
        F.col("_k").alias("ky"), "_ts", F.col("_x").alias("y")
    )
    pair = left.join(right, "_ts").where(F.col("kx") < F.col("ky"))
    stats = pair.groupBy("kx", "ky").agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
    )
    w = Window.partitionBy("kx", "ky").orderBy("_ts")
    z = (
        pair.join(F.broadcast(stats), ["kx", "ky"])
        .withColumn("_zx", F.col("_m") * F.col("x") - F.col("_sx"))
        .withColumn("_zy", F.col("_m") * F.col("y") - F.col("_sy"))
        .select(
            "kx",
            "ky",
            "_m",
            "_zx",
            "_zy",
            *[F.lag("_zy", L).over(w).alias(f"_zyl{L}") for L in lags],
        )
    )
    agg = z.groupBy("kx", "ky", "_m").agg(
        F.sum(F.col("_zx") * F.col("_zx")).alias("_dx"),
        F.sum(F.col("_zy") * F.col("_zy")).alias("_dy"),
        *[
            F.sum(F.col("_zx") * F.col(f"_zyl{L}")).alias(f"_num{L}")
            for L in lags
        ],
    )
    stacked = agg.select(
        "kx",
        "ky",
        "_m",
        "_dx",
        "_dy",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("bigint").alias("lag"),
                        F.col(f"_num{L}").alias("num"),
                    )
                    for L in lags
                ]
            )
        ).alias("_s"),
    )
    ok = (
        (F.col("_m") > F.col("_s.lag"))
        & (F.col("_dx") > 0)
        & (F.col("_dy") > 0)
    )
    r = F.col("_s.num") / (
        F.sqrt(F.col("_dx").cast("double"))
        * F.sqrt(F.col("_dy").cast("double"))
    )
    return stacked.select(
        "kx",
        "ky",
        F.col("_s.lag").alias("lag"),
        F.col("_m").cast("bigint").alias("m"),
        F.when(ok, F.floor(r * 1e9)).cast("bigint").alias("ccf_e9"),
    )


def ljung_box(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, max_lag: int
) -> DataFrame:
    """Ljung-Box portmanteau Q over lags ``1..max_lag`` per key.

    Emits ``(key, n, k_lags, lb_q_e6)`` — ``lb_q_e6 = floor(1e6 * Q)``,
    NULL when any lag in range has no pairs (``n <= max_lag``) or the
    series is constant. Compare Q against chi-square(k_lags) externally;
    the statistic itself is the deterministic part.
    """
    if max_lag <= 0:
        raise ValueError(f"max_lag must be positive, got {max_lag}")
    long = _acf_long(df, key_col, ts_col, value_col, list(range(1, max_lag + 1)))
    r = F.col("num") / F.col("den")
    term = (r * r) / (F.col("n") - F.col("lag"))
    per = long.select(
        key_col,
        "n",
        "lag",
        F.when(
            (F.col("n") > F.col("lag")) & (F.col("den") > 0), term
        ).alias("_term"),
    )
    folded = per.groupBy(key_col, "n").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_lags"),
        F.sum(F.when(F.col("_term").isNull(), 1).otherwise(0)).alias("_bad"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("lag", "_term"))),
            F.lit(0.0),
            lambda acc, s: acc + F.coalesce(s["_term"], F.lit(0.0)),
        ).alias("_sm"),
    )
    q = F.col("_sm") * (F.col("n") * (F.col("n") + F.lit(2))).cast("double")
    return folded.select(
        key_col,
        "n",
        "k_lags",
        F.when(F.col("_bad") == 0, F.floor(q * 1e6))
        .cast("bigint")
        .alias("lb_q_e6"),
    )
