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

    Shape (r6): the dense spine is reconstructed per observed row from a
    single ``lag`` window — each row emits its ``(prev, cur]`` gap
    segment with the interpolated values computed directly from the two
    anchors (the same ``prev_v + w * (next_v - prev_v)`` doubles as the
    former two ignore-nulls frames, so outputs are bit-identical) —
    instead of the former spine-aggregate + explode + spine⋈tier join +
    window. One exchange on the keys total, versus three join/window
    exchanges of tier-sized data. Input rows must be unique per
    (key, bucket) with non-NULL ``value_cols[0]`` — true for every
    tier/rollup output (groupBy keys over counted rows).
    """
    if value_cols is None:
        value_cols = ["n_seq", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean"]
    keys = _keys(key_col)
    step = F.expr(STEP_OF[tier])
    order = Window.partitionBy(*keys).orderBy(bucket_col)
    extras = [
        c for c in ROLLUP_COLS
        if c in df.columns
        and c not in (*keys, bucket_col, *value_cols, "gapfilled")
    ]
    prior_flag = (
        F.coalesce(F.col("gapfilled"), F.lit(False))
        if "gapfilled" in df.columns
        else F.lit(False)
    )
    prevs = df.select(
        *keys,
        F.col(bucket_col).alias("_cb"),
        *value_cols,
        *extras,
        prior_flag.alias("_pflag"),
        F.lag(bucket_col).over(order).alias("_pb"),
        *[F.lag(c).over(order).alias(f"_pv_{c}") for c in value_cols],
    )
    # (prev, cur] gap segment: interior misses + the observed row itself;
    # first row per key (or a duplicate bucket) emits only itself
    seg = F.when(
        F.col("_pb").isNull() | (F.col("_pb") >= F.col("_cb")),
        F.array(F.col("_cb")),
    ).otherwise(F.sequence(F.col("_pb") + step, F.col("_cb"), step))
    dense = prevs.withColumn("_seg", seg).select(
        *keys,
        "_cb",
        *value_cols,
        *extras,
        "_pflag",
        "_pb",
        *[f"_pv_{c}" for c in value_cols],
        F.size("_seg").alias("_n"),
        F.posexplode("_seg").alias("_pos", "_b"),
    )
    is_obs = F.col("_pos") == F.col("_n") - 1
    t = F.col("_b").cast("double")
    prev_t = F.col("_pb").cast("double")
    next_t = F.col("_cb").cast("double")
    # both anchors exist for every interior miss by construction
    w = (t - prev_t) / (next_t - prev_t)
    filled_cols = []
    for c in value_cols:
        filled = F.col(f"_pv_{c}") + w * (F.col(c) - F.col(f"_pv_{c}"))
        if c in _INT_CASTS:
            filled = F.round(filled).cast(_INT_CASTS[c])
        filled_cols.append(F.when(is_obs, F.col(c)).otherwise(filled).alias(c))
    return dense.select(
        *keys,
        F.col("_b").alias(bucket_col),
        *filled_cols,
        *[
            F.when(is_obs, F.col(c)).alias(c)  # missing rows: NULL extras
            for c in extras
        ],
        F.when(is_obs, F.col("_pflag")).otherwise(F.lit(True)).alias(
            "gapfilled"
        ),
    )


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
