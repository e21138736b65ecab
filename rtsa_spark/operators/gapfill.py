"""Linear-interpolation gap-fill of missing buckets — pure window algebra.

The reference delegates per-profile interpolation to ``imputeTS::na.interpolation``
(``/root/reference/R/rtsa_gapfill.R:185-204``); its linear method is
``stats::approx`` over the observed points. Re-expressed relationally:

1. build each source's dense bucket *spine* (min..max observed bucket, one
   calendar step apart) — so every missing bucket is interior, which makes
   R's boundary rule moot by construction;
2. outer-join the tier rollup onto the spine;
3. for missing buckets, time-weighted blend of the nearest observed
   neighbors via two ignore-nulls window frames:
   ``last(value) over (unbounded preceding..-1)`` and
   ``first(value) over (1..unbounded following)``.

No UDF, no kernel: the whole fill is Catalyst window exchange + codegen'd
projection. The shuffle key is ``source`` (window partition) — at 10^12 rows
this runs on tier-sized data (buckets, not sequences), and the per-source
partition is bounded by the bucket count of the retention window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rtsa_spark.operators.rollup import ROLLUP_COLS

#: calendar step per tier, as an INTERVAL literal for F.sequence
STEP_OF = {
    "raw": "interval 1 minute",
    "hourly": "interval 1 hour",
    "daily": "interval 1 day",
    "weekly": "interval 1 week",
    "monthly": "interval 1 month",
}

_INT_CASTS = {"n_seq": "bigint", "n_tok_sum": "bigint", "n_tok_min": "int", "n_tok_max": "int"}


def _keys(key_col) -> list[str]:
    return [key_col] if isinstance(key_col, str) else list(key_col)


def bucket_spine(
    df: DataFrame,
    tier: str,
    key_col="source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Dense per-key bucket spine from each key's min..max observed bucket.

    ``sequence(min, max, step)`` is evaluated per key row (tiny groupBy) and
    exploded — the spine never touches the fact table. ``key_col`` may be a
    single name or a list (composite keys)."""
    keys = _keys(key_col)
    step = F.expr(STEP_OF[tier])
    return (
        df.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(bucket_col),
        )
    )


def gapfill_linear(
    df: DataFrame,
    tier: str,
    value_cols: list[str] | None = None,
    key_col="source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Fill missing (key, bucket) rows by linear interpolation over time.

    Returns the dense series: observed rows unchanged (``gapfilled=false``),
    interpolated rows flagged ``gapfilled=true``. Integer-typed rollup columns
    are rounded back to their types after the double-space interpolation.
    """
    if value_cols is None:
        value_cols = ["n_seq", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean"]
    keys = _keys(key_col)
    spine = bucket_spine(df, tier, keys, bucket_col)
    joined = spine.join(df, [*keys, bucket_col], "left").withColumn(
        "_obs", F.col(value_cols[0]).isNotNull()
    )

    order = Window.partitionBy(*keys).orderBy(bucket_col)
    before = order.rowsBetween(Window.unboundedPreceding, -1)
    after = order.rowsBetween(1, Window.unboundedFollowing)
    t = F.col(bucket_col).cast("double")
    obs_t = F.when(F.col("_obs"), t)
    prev_t = F.last(obs_t, ignorenulls=True).over(before)
    next_t = F.first(obs_t, ignorenulls=True).over(after)
    # interior by construction -> both neighbors exist for every missing row
    w = (t - prev_t) / (next_t - prev_t)

    out = joined.withColumn("_w", w)
    for c in value_cols:
        prev_v = F.last(F.when(F.col("_obs"), F.col(c)), ignorenulls=True).over(before)
        next_v = F.first(F.when(F.col("_obs"), F.col(c)), ignorenulls=True).over(after)
        filled = prev_v + F.col("_w") * (next_v - prev_v)
        if c in _INT_CASTS:
            filled = F.round(filled).cast(_INT_CASTS[c])
        out = out.withColumn(c, F.when(F.col("_obs"), F.col(c)).otherwise(filled))
    prior_flag = (
        F.coalesce(F.col("gapfilled"), F.lit(False))
        if "gapfilled" in df.columns
        else F.lit(False)
    )
    out = out.withColumn(
        "gapfilled", F.when(F.col("_obs"), prior_flag).otherwise(F.lit(True))
    )
    extras = [
        c for c in ROLLUP_COLS
        if c in out.columns and c not in (*keys, bucket_col, *value_cols, "gapfilled")
    ]
    return out.select(*keys, bucket_col, *value_cols, *extras, "gapfilled")


def gapfill_locf(
    df: DataFrame,
    tier: str,
    value_cols: list[str] | None = None,
    key_col="source",
    bucket_col: str = "bucket_start",
    max_carry: int | None = None,
) -> DataFrame:
    """Last-observation-carried-forward fill on the dense bucket spine.

    The step-function counterpart of :func:`gapfill_linear` (reference
    gap-fill surface, ``/root/reference/R/rtsa_gapfill.R`` — LOCF is the
    conventional fill for state-like series where interpolating between
    observations invents values, e.g. configuration or cumulative
    counters).  Observed rows pass through unchanged; missing buckets take
    the key's most recent observed value.  ``carry_dist`` counts buckets
    since that observation (0 for observed rows); with ``max_carry`` set,
    fills farther than that stay NULL (stale-data cutoff).  Leading
    missing buckets cannot exist: the spine starts at each key's first
    observation.  Exact by construction — values are copied, never
    computed, so any SQL engine with IGNORE NULLS windows replays it.

    Scale shape: one spine left-join + one ordered window per key, same
    as the linear fill.
    """
    if value_cols is None:
        value_cols = ["n_seq", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean"]
    keys = _keys(key_col)
    spine = bucket_spine(df, tier, keys, bucket_col)
    joined = spine.join(df, [*keys, bucket_col], "left").withColumn(
        "_obs", F.col(value_cols[0]).isNotNull()
    )
    order = Window.partitionBy(*keys).orderBy(bucket_col)
    upto = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rn = F.row_number().over(order)
    joined = joined.withColumn("_rn", rn).withColumn(
        "_last_rn",
        F.last(F.when(F.col("_obs"), rn), ignorenulls=True).over(upto),
    )
    dist = (F.col("_rn") - F.col("_last_rn")).cast("bigint")
    within = dist <= max_carry if max_carry is not None else F.lit(True)
    out = joined.withColumn(
        "carry_dist", F.when(within, dist).cast("bigint")
    )
    for c in value_cols:
        carried = F.last(
            F.when(F.col("_obs"), F.col(c)), ignorenulls=True
        ).over(upto)
        out = out.withColumn(
            c,
            F.when(F.col("_obs"), F.col(c)).otherwise(
                F.when(within, carried)
            ),
        )
    out = out.withColumn("gapfilled", ~F.col("_obs"))
    return out.select(*keys, bucket_col, *value_cols, "carry_dist", "gapfilled")


#: pandas frequency per tier, for the kernel-based interpolators
_PD_FREQ = {"raw": "min", "hourly": "h", "daily": "D", "monthly": "MS"}


def gapfill_interpolate(
    df: DataFrame,
    tier: str,
    method: str = "spline",
    value_cols: list[str] | None = None,
    key_col="source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Spline / monotone-cubic gap-fill — the reference's 'spline' and
    'stine' methods (W4, ``R/rtsa_gapfill.R:185-204``) as a grouped Arrow
    kernel over numpy interpolators (functions/interp.py). Same dense
    output contract as gapfill_linear; 'linear' routes to the pure
    window-algebra path (no kernel at all)."""
    if method == "linear":
        return gapfill_linear(df, tier, value_cols, key_col, bucket_col)
    if method not in ("spline", "stine", "pchip"):
        raise ValueError(f"unknown gap-fill method: {method}")
    if value_cols is None:
        value_cols = [c for c in ("n_tok_mean",) if c in df.columns] or ["v_mean"]
    keys = _keys(key_col)
    freq = _PD_FREQ[tier]

    from rtsa_spark.functions.interp import (
        monotone_cubic,
        natural_cubic_spline,
        stineman,
    )

    interp = {
        "spline": natural_cubic_spline,
        "stine": stineman,  # true Stineman rational interpolant
        "pchip": monotone_cubic,
    }[method]

    import pandas as pd

    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"{k} {dtypes.get(k, 'string')}" for k in keys]
        + [f"{bucket_col} timestamp"]
        + [f"{c} double" for c in value_cols]
        + ["gapfilled boolean"]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(bucket_col)
        spine = pd.date_range(pdf[bucket_col].iloc[0], pdf[bucket_col].iloc[-1], freq=freq)
        xs = spine.asi8.astype("float64")
        x_obs = pdf[bucket_col].to_numpy("datetime64[ns]").view("int64").astype("float64")
        pos = np.searchsorted(xs, x_obs)  # observed knots' spine positions
        # every observed bucket must land exactly on the tier spine —
        # otherwise the wrong slot would silently be marked observed
        if (pos >= len(xs)).any() or not np.array_equal(xs[pos], x_obs):
            raise ValueError(
                f"observed bucket_start not aligned to the '{tier}' spine "
                f"({freq}); re-bucket the input with date_trunc first"
            )
        is_obs = np.zeros(len(xs), dtype=bool)
        is_obs[pos] = True
        data = {k: pdf[k].iloc[0] for k in keys}
        data[bucket_col] = spine
        for c in value_cols:
            y_obs = pdf[c].to_numpy("float64")
            y = interp(x_obs, y_obs, xs)
            y[pos] = y_obs  # observed buckets pass through bit-exactly
            data[c] = y
        data["gapfilled"] = ~is_obs
        return pd.DataFrame(data)

    return df.groupBy(*keys).applyInPandas(kernel, out_schema)
