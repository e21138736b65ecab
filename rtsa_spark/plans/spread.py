"""Scan fan-out for small, unsplittable inputs.

A parquet file is split at ROW-GROUP boundaries: a single-row-group file
is one scan task no matter how many byte-range splits the planner cuts,
so every downstream per-row-heavy stage (shingle explode, feature hash,
tokenize) runs on one core while the rest of the cluster idles (guide
§2.5 "input skew: one huge unsplittable file — repartition immediately
after the read").

:func:`fan_out_scan` repartitions ONLY when the whole input is small
enough that the extra narrow shuffle is trivially cheap — at most one
``maxPartitionBytes`` split per core.  Past that size the planner's
byte-range splits already feed every core and a blind repartition would
be a full extra pass over the data, so the guard makes the rule inert at
cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a small scan across the cluster.

    No-op when the optimizer's size estimate exceeds
    ``maxPartitionBytes * parallelism`` (the input already yields a split
    per core) or when the estimate is unavailable.  Round-robin is
    retry-deterministic (sort-before-repartition, SPARK-23207) and every
    engine-surface result is partitioning-independent by the repo's
    oracle contract (a DuckDB twin replays each query with its own
    placement), so this changes no output.
    """
    spark = df.sparkSession
    want = parallelism or spark.sparkContext.defaultParallelism
    if want <= 1:
        return df
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    try:
        # conf value may be "134217728", "134217728b" or "128MB"
        raw = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        ).strip().lower()
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
        raw = raw.removesuffix("b")
        mult = units.get(raw[-1:], 1)
        max_split = int(raw.rstrip("kmg")) * mult
    except Exception:
        max_split = 128 * (1 << 20)
    if size <= 0 or size > max_split * want:
        return df
    # ROUND-ROBIN, deliberately: an expression-keyed repartition is
    # porous — the optimizer pushes deterministic projections below
    # RepartitionByExpression (and CollapseRepartition can fuse it with a
    # later repartition), sinking the very compute this fan-out exists to
    # parallelize back into the unsplittable scan task. Round-robin holds
    # the boundary; its local sort (sortBeforeRepartition, SPARK-23207)
    # is the price of retry-determinism and is bounded by the small-input
    # guard above.
    return df.repartition(want)
