"""Interval (range-containment) join — points matched into [start, end]
windows per key, without a cross product.

The second classic time-series join Spark's equi-join surface lacks
(alongside :mod:`rtsa_spark.operators.asof`): attach every point event to
the enclosing incident window, maintenance window, or session. A naive
``ON p.t BETWEEN i.s AND i.e`` becomes a per-key cross product under
Spark (BroadcastNestedLoop / cartesian at scale).

Spark-first plan — coarse-bucket equi-join + exact refine:

- each interval explodes into the ``bucket_s``-wide time buckets it
  covers (``sequence(floor(s/W), floor(e/W))`` — pure Catalyst),
- each point maps to its single bucket,
- one hash equi-join on ``(key, bucket)``, then the exact
  ``s <= t <= e`` filter.

Every (point, interval) pair meets in EXACTLY one bucket (the point's),
so no dedup pass is needed. Shuffle volume is |points| +
sum(interval_span / bucket_s) — pick ``bucket_s`` near the typical
interval length so intervals explode into O(1) buckets each. This is the
standard bucketed range-join strategy (what Databricks' range-join hints
and KDB's window joins do under the hood; public technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner interval join: rows = every (point, interval) pair with the
    same ``key_col`` and ``start <= ts <= end`` (inclusive bounds, the
    session contract). Timestamp columns must be numeric (epoch seconds).

    Returns all point columns plus the interval's columns (point columns
    win name clashes — alias upstream if both sides share names beyond
    the key).
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    icols = [c for c in intervals.columns if c != key_col]
    pcols = [c for c in points.columns]
    iv = intervals.select(
        F.col(key_col).alias("_k"),
        *[F.col(c) for c in icols],
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s).cast("bigint"),
                F.floor(F.col(end_col) / bucket_s).cast("bigint"),
            )
        ).alias("_bucket"),
    )
    pt = points.select(
        F.col(key_col).alias("_k"),
        F.floor(F.col(ts_col) / bucket_s).cast("bigint").alias("_bucket"),
        *[F.col(c) for c in pcols if c != key_col],
    )
    joined = pt.join(iv, ["_k", "_bucket"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.select(
        F.col("_k").alias(key_col),
        *[F.col(c) for c in pcols if c != key_col],
        *[F.col(c) for c in icols],
    )
