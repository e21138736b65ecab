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

__all__ = ["acf", "ljung_box"]


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
