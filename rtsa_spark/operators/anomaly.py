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

__all__ = [
    "hampel",
    "benford_audit",
    "iqr_outliers",
    "zscore_outliers",
    "BENFORD_E6",
    "mad_stats",
]


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


#: round(1e6 * log10(1 + 1/d)) for d = 1..9 — exact integer constants that
#: sum to exactly 1_000_000 (Benford 1938, public closed form; the logs are
#: precomputed here so neither engine evaluates a transcendental at query
#: time — the non-portable step never happens).
BENFORD_E6 = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """First-significant-digit distribution per key vs Benford's law —
    the classic synthetic-data / corruption audit for "organically grown"
    measures (tier volumes, token counts).

    The leading digit is extracted lexically (first character of the
    decimal rendering of ``|value|``), so no logs or float powers are
    involved; zero values are excluded (no leading significant digit).
    Emits one row per (key, digit): observed count, expected e6 share,
    observed e6 share, and ``dev_e6 = |1e6*cnt - exp_e6*n| div n`` — the
    per-digit absolute deviation, exact integer arithmetic end to end.
    Interpretation stays with the caller (max dev_e6 > ~30000 is the
    usual screening threshold); the operator only reports.

    Scale shape: one map-side-combinable groupBy on (key, digit) — digit
    cardinality is 9, so the shuffle is key-count-sized.
    """
    v = F.abs(F.col(value_col).cast("bigint"))
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(v > 0)
        .select(F.col(key_col).alias("key"), digit.alias("digit"))
        .groupBy("key", "digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = Window.partitionBy("key")
    exp_e6 = F.element_at(
        F.array(*[F.lit(x) for x in BENFORD_E6]), F.col("digit")
    ).cast("bigint")
    out = (
        counts.withColumn("n", F.sum("cnt").over(n))
        .withColumn("exp_e6", exp_e6)
    )
    return out.select(
        "key",
        "digit",
        "cnt",
        "n",
        "exp_e6",
        F.expr("(1000000 * cnt) div n").alias("obs_e6"),
        F.expr("abs(1000000 * cnt - exp_e6 * n) div n").alias("dev_e6"),
    )


def iqr_outliers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_num: int = 3,
    k_den: int = 2,
) -> DataFrame:
    """Tukey boxplot outlier flags per key: ``x`` is flagged when it falls
    outside ``[q25 - k*IQR, q75 + k*IQR]`` with ``k = k_num/k_den``
    (default the classic 1.5).

    Quartiles are the exact type-7 interpolants carried in the e2 integer
    domain (the same chain as ``sessionize.tier_percentiles``), and the
    fence comparison is cross-multiplied into the ``2 * k_den * e2``
    integer domain — no float ever materializes, so both engines agree
    bit-for-bit:  flag_low  <=>  ``2*k_den*100*x < 2*k_den*q25_e2 -
    2*k_num*iqr_e2`` (the 2 keeps k=3/2 integral).

    Scale shape: one per-key quartile agg (key-count-sized result)
    broadcast back onto the tier — rows are flagged in a codegen'd
    projection, no window over the fact table.
    """
    from rtsa_spark.operators.sessionize import tier_percentiles

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("t"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    q = tier_percentiles(base, value_col="x", key_col="key", ps=(25, 75))
    q = q.select(
        "key",
        "n_buckets",
        "p25_e2",
        "p75_e2",
        (F.col("p75_e2") - F.col("p25_e2")).alias("iqr_e2"),
    )
    j = base.join(F.broadcast(q), "key")
    c = 2 * k_den
    low = c * 100 * F.col("x") < c * F.col("p25_e2") - 2 * k_num * F.col("iqr_e2")
    high = c * 100 * F.col("x") > c * F.col("p75_e2") + 2 * k_num * F.col("iqr_e2")
    return j.select(
        "key",
        "t",
        "x",
        "p25_e2",
        "p75_e2",
        low.alias("is_low"),
        high.alias("is_high"),
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Classic k-sigma rule per key, exact-int end to end: flag ``x_i``
    when ``|x_i - mean| > k * sd`` with ``sd`` the n-1 sample stdev and
    ``k = k_num/k_den``.

    Square-and-cross-multiply so no sqrt/divide ever runs: with
    ``S = sum x``, ``Q = sum x^2`` and ``z_i = n*x_i - S`` (all exact
    BIGINT), ``sum_j z_j^2 = n^2*Q - n*S^2`` in closed form and the flag
    is ``k_den^2 * z_i^2 * (n-1) > k_num^2 * (n^2*Q - n*S^2)`` — pure
    integer comparison, identical in any engine (ANSI overflow throws
    loudly; at tier magnitudes z^2 stays far below 2^63).  ``z_num`` is
    emitted signed so callers can rank by deviation without recomputing.

    Complements :func:`hampel` (rolling robust, window-local) and
    :func:`iqr_outliers` (global robust): this is the global
    moment-based detector — the one to run on a REMAINDER series after
    :func:`rtsa_spark.operators.components.decompose_components`
    strips seasonality (the classic seasonal-ESD composition), where
    the near-normal residual makes mean/sd appropriate.

    Scale shape: one map-side-combinable groupBy per key (n, S, Q) and
    a broadcast join back onto the tier — a codegen'd projection flags
    every row, no window over the fact table, two passes total.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("t"),
        F.col(value_col).cast("bigint").alias("x"),
    )
    s = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    j = base.join(F.broadcast(s), "key")
    z = F.col("n") * F.col("x") - F.col("s")
    ssz = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    flag = (
        F.lit(k_den * k_den) * z * z * (F.col("n") - 1)
        > F.lit(k_num * k_num) * ssz
    )
    return j.select(
        "key",
        "t",
        "x",
        "n",
        z.alias("z_num"),
        F.when(F.col("n") >= 2, flag).otherwise(F.lit(False)).alias("is_outlier"),
    )


def mad_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key robust center and scale: the exact lower median and the
    median absolute deviation (Hampel 1974 popularized MAD as the
    robust sigma) — the global twin of :func:`hampel`'s rolling window,
    for "flag anything further than k MADs from the key's center"
    rules whose thresholds must replay identically anywhere.

    Emits ``(keys..., n, median, mad)`` over integer values; both picks
    are the exact LOWER order statistic (rank ``(50 * (n-1)) div 100 +
    1`` ascending — the engine-portable convention shared with
    ``funnel_latency``), so everything stays exact BIGINT with no
    interpolation.  NULL values are excluded.

    Scale shape: two rank windows over (keys)-partitioned rows plus one
    broadcast-size median join — rows in flight are the key's values,
    never wider.
    """
    pre = df.select(
        *key_cols, F.col(value_col).cast("bigint").alias("_v")
    ).where(F.col("_v").isNotNull())

    def _lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(*key_cols).orderBy(col)
        ranked = frame.select(
            *key_cols,
            col,
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).alias("_n"),
        )
        return ranked.groupBy(*key_cols).agg(
            F.max("_n").cast("bigint").alias("_n_out"),
            F.max(
                F.when(
                    F.col("_rn") == F.expr("(50 * (_n - 1)) div 100 + 1"),
                    F.col(col),
                )
            ).cast("bigint").alias(out),
        )

    med = _lower_median(pre, "_v", "median")
    dev = pre.join(F.broadcast(med.select(*key_cols, "median")), [*key_cols]).select(
        *key_cols, F.abs(F.col("_v") - F.col("median")).alias("_d")
    )
    mad = _lower_median(dev, "_d", "mad")
    return (
        med.select(*key_cols, F.col("_n_out").alias("n"), "median")
        .join(mad.select(*key_cols, "mad"), [*key_cols])
    )
