"""Pettitt (1979) nonparametric single change-point test per key.

Complements the reference's monotone-trend surface (Mann-Kendall in
``/root/reference/R/rtsa.trend.R``, our ``functions/kendall.py``): MK
asks "is there a monotone drift?", Pettitt asks "WHERE does the
distribution shift?" — the standard rank-based companion test, and the
natural feeder for segment-wise re-runs of the decompositions.

Exact-int contract (CLAUDE.md): the Pettitt statistic

    U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j),   K = max_t |U_t|

is computed WITHOUT the O(n^2) pair triangle via the prefix-sum
identity: with ``S_k = sum_{j != k} sgn(x_k - x_j)`` (the full-series
sign-sum of row k), ``U_t = sum_{k<=t} S_k`` (moving row t+1 across the
cut changes U by exactly ``S_{t+1}``).  ``S_k`` itself is pure rank
arithmetic: ``less = rank-1`` strictly-smaller rows, ``cnt`` ties
(incl. self), so ``S = 2*less + cnt - n``.  Everything — S, U, K, the
argmax bucket — is exact BIGINT on both engines; bit-identical by
construction.  The classical significance approximation ``p ~= 2 *
exp(-6 K^2 / (n^3 + n^2))`` is emitted for convenience but ``exp`` is
NOT correctly rounded cross-engine, so oracle queries must compare the
exact columns only (``six_k2`` carries the exact-int input to it).

Scale shape: two value-ordered windows + one time-ordered window per
key, all inside codegen; no join, no UDF, no driver state.  Rows per
key are tier-bounded (hours/days per source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pettitt"]


def pettitt(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-key Pettitt change-point statistic over an integer series.

    Emits ``(key, n, k_stat, u_at_cp, cp_t, six_k2, p_e6)`` — ``k_stat
    = max_t |U_t|`` over cut points ``t = 1..n-1``, ``u_at_cp`` the
    signed U there (sign = direction of shift: positive means the early
    segment is stochastically larger), ``cp_t`` the EARLIEST ts
    attaining the max (the last bucket of the left segment), ``six_k2 =
    6*K^2`` exact, ``p_e6 = floor(1e6 * min(1, 2*exp(-6K^2/(n^3+n^2))))``.
    Keys with ``n < 2`` emit NULL stats.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    wk = Window.partitionBy("k")
    wv = Window.partitionBy("k").orderBy("x")
    wt = Window.partitionBy("k").orderBy("t")
    ranked = base.select(
        "k",
        "t",
        F.count(F.lit(1)).over(wk).alias("n"),
        (F.rank().over(wv) - 1).alias("_less"),
        F.count(F.lit(1)).over(Window.partitionBy("k", "x")).alias("_cnt"),
    )
    u = ranked.select(
        "k",
        "t",
        "n",
        F.row_number().over(wt).alias("_rn"),
        F.sum(2 * F.col("_less") + F.col("_cnt") - F.col("n"))
        .over(wt.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_u"),
    )
    cuts = u.where(F.col("_rn") < F.col("n"))
    mx = cuts.groupBy("k", "n").agg(F.max(F.abs("_u")).alias("k_stat"))
    at = (
        cuts.join(mx, ["k", "n"])
        .where(F.abs("_u") == F.col("k_stat"))
        .groupBy("k", "n", "k_stat")
        .agg(
            F.min("t").alias("cp_t"),
            F.min_by("_u", "t").alias("u_at_cp"),
        )
    )
    six_k2 = (F.lit(6) * F.col("k_stat") * F.col("k_stat")).cast("bigint")
    nn = F.col("n").cast("double")
    p = F.lit(2.0) * F.exp(
        -six_k2.cast("double") / (nn * nn * nn + nn * nn)
    )
    full = at.select(
        F.col("k").alias(key_col),
        F.col("n").cast("bigint").alias("n"),
        F.col("k_stat").cast("bigint").alias("k_stat"),
        F.col("u_at_cp").cast("bigint").alias("u_at_cp"),
        "cp_t",
        six_k2.alias("six_k2"),
        F.floor(F.least(F.lit(1.0), p) * 1e6).cast("bigint").alias("p_e6"),
    )
    singletons = (
        base.groupBy(F.col("k").alias(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < 2)
        .select(
            key_col,
            F.col("n").cast("bigint").alias("n"),
            *[
                F.lit(None).cast("bigint").alias(c)
                for c in ("k_stat", "u_at_cp")
            ],
            F.lit(None).cast(dict(base.dtypes)["t"]).alias("cp_t"),
            *[
                F.lit(None).cast("bigint").alias(c)
                for c in ("six_k2", "p_e6")
            ],
        )
    )
    return full.unionByName(singletons)
