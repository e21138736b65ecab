"""M4 visual downsampling — min/max/first/last per pixel bucket.

Jugel, Markl et al., "M4: A Visualization-Oriented Time Series Data
Aggregation" (VLDB 2014, public): for a W-pixel-wide chart, grouping each
series into W time buckets and keeping only the rows holding the min
value, max value, first (earliest) and last (latest) point per bucket is
*pixel-perfect* — the rendered line is identical to drawing every raw
point. This is THE standard downsample-for-display operator the
reference's raster quick-look path approximates by decimation
(``/root/reference/R/rtsa_plot.R`` plots whole layers; at 10^12 rows a
bounded-size extract is required instead).

Spark-first plan: one tiny per-key span aggregation (broadcast back —
|keys| rows), then ONE map-side-combinable groupBy over (key, pixel)
using ``min/max/min_by/max_by``. No window, no sort, no UDF: at 100 TB
this is a single shuffle whose output is bounded by |keys| * width rows
regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["m4_downsample", "lttb_downsample"]


def m4_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    width: int = 64,
) -> DataFrame:
    """M4 aggregation: per ``key_col``, split the series' time span into
    ``width`` equal pixel buckets and emit per non-empty bucket the
    min/max value plus the first/last value (by timestamp).

    ``ts_col`` must be numeric (epoch seconds / bucket index) and unique
    per key for deterministic first/last (true for retention-tier input,
    unique per (source, bucket)). Pixel assignment is integer-exact:
    ``pixel = floor((t - tmin) * width / (tmax - tmin + 1))`` — the +1
    keeps the max timestamp inside pixel ``width - 1`` without a special
    case, and both engines floor identical integer quotients.
    """
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    span = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_tmin"), F.max(ts_col).alias("_tmax")
    )
    withpix = df.join(F.broadcast(span), key_col).withColumn(
        "pixel",
        F.floor(
            (F.col(ts_col) - F.col("_tmin"))
            * width
            / (F.col("_tmax") - F.col("_tmin") + 1)
        ).cast("int"),
    )
    return withpix.groupBy(key_col, "pixel").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.min_by(value_col, F.col(ts_col)).alias("v_first"),
        F.max_by(value_col, F.col(ts_col)).alias("v_last"),
        F.min(ts_col).alias("t_first"),
        F.max(ts_col).alias("t_last"),
    )


def _lttb_kernel_factory(m: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        key = pdf["_k"].iloc[0]
        t = pdf["_ts"].to_numpy(dtype="int64")
        x = pdf["_x"].to_numpy(dtype="int64")
        n = len(x)
        if n <= m or n < 3:
            return pd.DataFrame(
                {
                    "_k": key,
                    "rank": np.arange(n, dtype="int64"),
                    "i": np.arange(n, dtype="int64"),
                    "t": t,
                    "x": x,
                }
            )
        # interior point i (1..n-2) -> bucket ((i-1)*(m-2)) // (n-2),
        # exact floor division; boundaries via searchsorted
        j = np.arange(n - 2, dtype="int64")
        buck = (j * (m - 2)) // (n - 2)
        starts = np.searchsorted(buck, np.arange(m - 2, dtype="int64"))
        ends = np.append(starts[1:], n - 2)
        sel = np.empty(m, dtype="int64")
        sel[0] = 0
        prev = 0
        for b in range(m - 2):
            lo, hi = starts[b] + 1, ends[b] + 1  # back to series index
            if b < m - 3:
                nlo, nhi = starts[b + 1] + 1, ends[b + 1] + 1
                mn = nhi - nlo
                gi = np.arange(nlo, nhi, dtype="int64").sum()
                gx = x[nlo:nhi].sum()
            else:
                mn, gi, gx = 1, n - 1, x[n - 1]
            ci = np.arange(lo, hi, dtype="int64")
            cx = x[lo:hi]
            pi, px = prev, x[prev]
            area = np.abs(
                (ci - pi) * (gx - mn * px) - (gi - mn * pi) * (cx - px)
            )
            prev = lo + int(np.argmax(area))  # first max -> earliest i
            sel[b + 1] = prev
        sel[m - 1] = n - 1
        return pd.DataFrame(
            {
                "_k": key,
                "rank": np.arange(m, dtype="int64"),
                "i": sel,
                "t": t[sel],
                "x": x[sel],
            }
        )

    return kernel


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    m: int = 40,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsample to ``m`` points per key
    (Steinarsson 2013, public — the shape-preserving companion to
    :func:`m4_downsample`'s pixel-perfect extract).  First and last
    points are always kept; interior points are split into ``m - 2``
    buckets (exact-int assignment ``((i-1)*(m-2)) // (n-2)`` — a
    documented divergence from float-range reference implementations)
    and each bucket keeps the point maximizing the triangle area with
    the PREVIOUSLY selected point and the next bucket's centroid.

    Integer-exact contract: comparing ``2 * area * mn`` (``mn`` = next
    bucket size) keeps every area an exact BIGINT — ``|(ci-pi) *
    (gx - mn*px) - (gi - mn*pi)*(cx-px)|`` — so the argmax (ties ->
    earliest index) is engine-exact, and a recursive-CTE oracle replays
    the whole selection chain.  Keys with ``n <= m`` pass through
    unchanged.

    Scale shape: ONE shuffle (groupBy key into an Arrow-batched numpy
    kernel); the sequential dependency is inherent to LTTB (each pick
    conditions on the previous), but state is O(1) and work O(n) per
    key, n = tier length.  Output bounded by |keys| * m.

    Emits ``(key, rank, i, t, x)`` — selection order, 0-based series
    index, original timestamp and value.
    """
    if m < 3:
        raise ValueError(f"m must be >= 3, got {m}")
    prepped = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    out = prepped.groupBy("_k").applyInPandas(
        _lttb_kernel_factory(int(m)),
        "_k string, rank long, i long, t long, x long",
    )
    return out.withColumnRenamed("_k", key_col)
