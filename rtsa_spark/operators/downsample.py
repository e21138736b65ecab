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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["m4_downsample"]


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
