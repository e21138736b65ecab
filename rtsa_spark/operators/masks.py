"""Eligibility masks — the reference's ``rastermask`` subsystem as semi-joins.

rtsa filters *cells* through a {0,1} raster mask before every analytic
(explicit mask P1 ``/root/reference/R/rtsa_gapfill.R:98-122``; computed masks
P2/P3/P5, consecutive-gap refinement P4). Key-based tables make the whole
positional ``na_index_mask`` bookkeeping vanish: a mask here is just a small
DataFrame of eligible ``source`` keys, broadcast into a left-semi join.

All mask computations are cheap pre-aggregates that run BEFORE the expensive
per-source kernels — the reference's two-phase refinement (SURVEY.md §4),
which Catalyst won't invent on its own, kept as an explicit stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from rtsa_spark.operators.gapfill import STEP_OF, _keys, bucket_spine


def _observed(tier_df: DataFrame) -> DataFrame:
    """Observed (non-gapfilled) rows — the shared mask input convention."""
    if "gapfilled" in tier_df.columns:
        return tier_df.where(~F.col("gapfilled"))
    return tier_df


def mask_min_observations(
    tier_df: DataFrame, min_obs: int, key_col="source"
) -> DataFrame:
    """Keys with >= min_obs observed (non-gapfilled) buckets.

    min_obs=2 is gap-fill's default gate (P3, ``R/rtsa_gapfill.R:130-133``);
    min_obs=5 is the Mann-Kendall minimum (P5, ``R/rtsa.mk.R:243-246`` —
    implementing the documented intent, not the scalar-drop bug at ``:276``,
    SURVEY.md §8 Q4).
    """
    keys = _keys(key_col)
    return (
        _observed(tier_df).groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_obs)
        .select(*keys)
    )


def mask_complete_profile(
    tier_df: DataFrame, tier: str, key_col="source", bucket_col: str = "bucket_start"
) -> DataFrame:
    """Keys whose bucket series has NO missing bucket over its own span —
    the ``rastermask="compute"`` complete-profile mask (P2,
    ``R/rtsa.eof.R:129-132``): observed buckets == spine length.

    One groupBy, no spine explode: the expected bucket count is
    ``size(sequence(min, max, step))`` computed per key row.
    """
    keys = _keys(key_col)
    step = F.expr(STEP_OF[tier])
    agg = _observed(tier_df).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_got"),
        F.min(bucket_col).alias("_lo"),
        F.max(bucket_col).alias("_hi"),
    )
    want = F.size(F.sequence(F.col("_lo"), F.col("_hi"), step))
    return agg.where(F.col("_got") == want).select(*keys)


def mask_max_consecutive_gap(
    tier_df: DataFrame,
    tier: str,
    n_p: int,
    key_col="source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Keys whose max windowed missing-bucket count stays BELOW n_p —
    STL's consecutive-gap cap (P4, ``R/rtsa.stl.R:289-344``): a sliding
    row-frame of half-width floor(n_p/2) counts gaps around each bucket;
    a key is dropped when any window holds >= n_p gaps.

    Shape (r6): the dense spine is reconstructed per observed row from a
    single ``lag`` window — each row emits ``(prev, cur]`` as a segment
    of its missing buckets plus itself — instead of the former
    spine-aggregate + explode + spine⋈observed join. One exchange on the
    keys total (the segment explode and the sliding window both keep the
    lag window's partitioning), versus three for the join form; identical
    dense rows, identical result. Input rows must be unique per
    (key, bucket) — true for every tier/rollup output (groupBy keys).
    """
    keys = _keys(key_col)
    observed = _observed(tier_df)
    step = F.expr(STEP_OF[tier])
    lag = n_p // 2
    wlag = Window.partitionBy(*keys).orderBy(bucket_col)
    seg = observed.select(*keys, bucket_col).select(
        *keys,
        F.when(
            F.lag(bucket_col).over(wlag).isNull(),
            F.array(F.col(bucket_col)),
        )
        .otherwise(
            F.sequence(
                F.lag(bucket_col).over(wlag) + step, F.col(bucket_col), step
            )
        )
        .alias("_seg"),
    )
    dense = seg.select(
        *keys,
        F.size("_seg").alias("_n"),
        F.posexplode("_seg").alias("_pos", bucket_col),
    ).select(
        *keys,
        bucket_col,
        F.when(F.col("_pos") < F.col("_n") - 1, 1).otherwise(0).alias("_miss"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(-lag, lag)
    )
    return (
        dense.withColumn("_wmiss", F.sum("_miss").over(w))
        .groupBy(*keys)
        .agg(F.max("_wmiss").alias("_maxmiss"))
        .where(F.col("_maxmiss") < n_p)
        .select(*keys)
    )


def apply_mask(df: DataFrame, mask: DataFrame, key_col="source") -> DataFrame:
    """Left-semi join against the (small, broadcast) eligible-key set — the
    relational form of ``matrice <- rasterts[na_index_mask]`` (P6/J1)."""
    return df.join(F.broadcast(mask), _keys(key_col), "left_semi")
