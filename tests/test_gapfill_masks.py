from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F

from rtsa_spark.operators.gapfill import bucket_spine, gapfill_linear
from rtsa_spark.operators.masks import (
    apply_mask,
    mask_complete_profile,
    mask_max_consecutive_gap,
    mask_min_observations,
)
from rtsa_spark.operators.rollup import rollup_next, rollup_raw
from rtsa_spark.synth import knock_out_buckets
from tests.oracle import gapfill_oracle

VALUE_COLS = ["n_seq", "n_tok_sum", "n_tok_min", "n_tok_max", "n_tok_mean"]


def _hourly(spark, tiny_sequences, gappy=("s001", "s002")):
    gapped = knock_out_buckets(tiny_sequences, list(gappy), bucket="hour")
    return rollup_next(rollup_raw(gapped), "hourly")


def test_gapfill_matches_numpy_interp(spark, tiny_sequences):
    hr = _hourly(spark, tiny_sequences)
    got = (
        gapfill_linear(hr, "hourly")
        .toPandas()
        .sort_values(["source", "bucket_start"])
        .reset_index(drop=True)
    )
    want = gapfill_oracle(
        hr.drop("gapfilled").toPandas(), "hourly", VALUE_COLS
    )
    assert (got["gapfilled"] == want["gapfilled"]).all()
    # doubles: exact interp match; ints: engine rounds, oracle keeps float
    pd.testing.assert_series_equal(
        got["n_tok_mean"], want["n_tok_mean"], rtol=1e-9, check_names=False
    )
    assert (got["n_seq"] - want["n_seq"]).abs().max() <= 0.5 + 1e-9
    assert got["n_seq"].notna().all()


def test_gapfill_idempotent(spark, tiny_sequences):
    hr = _hourly(spark, tiny_sequences)
    once = gapfill_linear(hr, "hourly")
    twice = gapfill_linear(once, "hourly")
    assert once.count() == twice.count()
    # re-running marks nothing new
    assert (
        twice.where("gapfilled").count() == once.where("gapfilled").count()
    )


def test_spine_is_dense(spark, tiny_sequences):
    hr = _hourly(spark, tiny_sequences)
    spine = bucket_spine(hr, "hourly")
    dense = gapfill_linear(hr, "hourly")
    assert spine.count() == dense.count()


def _mini_tier(spark, rows):
    """rows: list of (source, iso_hour, n)  -> minimal hourly tier frame."""
    data = [
        (s, dt.datetime.fromisoformat(b), n, n, n, n, float(n), False)
        for (s, b, n) in rows
    ]
    return spark.createDataFrame(
        data,
        "source string, bucket_start timestamp, n_seq long, n_tok_sum long,"
        " n_tok_min int, n_tok_max int, n_tok_mean double, gapfilled boolean",
    )


def test_mask_min_observations(spark):
    tier = _mini_tier(
        spark,
        [("a", "2024-01-01T00:00", 1), ("a", "2024-01-01T01:00", 1),
         ("a", "2024-01-01T02:00", 1), ("a", "2024-01-01T03:00", 1),
         ("a", "2024-01-01T04:00", 1), ("b", "2024-01-01T00:00", 1)],
    )
    assert {r["source"] for r in mask_min_observations(tier, 5).collect()} == {"a"}
    assert {r["source"] for r in mask_min_observations(tier, 1).collect()} == {"a", "b"}


def test_mask_complete_profile(spark):
    tier = _mini_tier(
        spark,
        [("a", "2024-01-01T00:00", 1), ("a", "2024-01-01T01:00", 1),
         ("a", "2024-01-01T02:00", 1),
         # b has a hole at 01:00
         ("b", "2024-01-01T00:00", 1), ("b", "2024-01-01T02:00", 1)],
    )
    assert {r["source"] for r in mask_complete_profile(tier, "hourly").collect()} == {"a"}


def test_mask_max_consecutive_gap(spark):
    # c: 4 consecutive missing hours; window n_p=3 must reject it
    rows = [("c", "2024-01-01T00:00", 1), ("c", "2024-01-01T05:00", 1)]
    rows += [("d", f"2024-01-01T0{h}:00", 1) for h in range(6) if h != 3]
    tier = _mini_tier(spark, rows)
    ok = {r["source"] for r in mask_max_consecutive_gap(tier, "hourly", 3).collect()}
    assert ok == {"d"}


def test_mask_max_consecutive_gap_matches_spine_join(spark, tiny_sequences):
    """r6 internals change: the dense spine is rebuilt from lag-window
    gap segments instead of a spine-aggregate + explode + join. Pin the
    new form against the explicit spine-join reference for several n_p
    (window widths 1, 3 and 5) on realistically gappy tiers."""
    from pyspark.sql import Window

    hourly = _hourly(spark, tiny_sequences)

    def spine_join_reference(tier_df, tier, n_p):
        spine = bucket_spine(tier_df, tier, ["source"], "bucket_start")
        dense = spine.join(
            tier_df.select("source", "bucket_start", F.lit(1).alias("_one")),
            ["source", "bucket_start"],
            "left",
        ).withColumn("_miss", F.when(F.col("_one").isNull(), 1).otherwise(0))
        lag = n_p // 2
        w = (
            Window.partitionBy("source")
            .orderBy("bucket_start")
            .rowsBetween(-lag, lag)
        )
        return (
            dense.withColumn("_wmiss", F.sum("_miss").over(w))
            .groupBy("source")
            .agg(F.max("_wmiss").alias("_m"))
            .where(F.col("_m") < n_p)
            .select("source")
        )

    for n_p in (2, 3, 4, 5):
        want = sorted(
            r["source"]
            for r in spine_join_reference(hourly, "hourly", n_p).collect()
        )
        got = sorted(
            r["source"]
            for r in mask_max_consecutive_gap(hourly, "hourly", n_p).collect()
        )
        assert got == want, f"n_p={n_p}: {got} != {want}"


def test_apply_mask_is_semi_join(spark, tiny_sequences):
    mask = spark.createDataFrame([("s001",)], "source string")
    out = apply_mask(tiny_sequences, mask)
    assert out.select("source").distinct().collect()[0]["source"] == "s001"
    assert set(out.columns) == set(tiny_sequences.columns)


def test_gapfill_linear_matches_spine_join_reference(spark, tiny_sequences):
    """r6 internals change: gapfill_linear rebuilds the dense spine from
    lag-window gap segments. Pin bit-identical output (every value col,
    doubles included) against the explicit spine-join + ignore-nulls
    window reference it replaced."""
    from pyspark.sql import Window

    hourly = _hourly(spark, tiny_sequences)

    def reference(df, tier):
        from rtsa_spark.operators.gapfill import _INT_CASTS, STEP_OF

        spine = bucket_spine(df, tier, ["source"], "bucket_start")
        joined = spine.join(df, ["source", "bucket_start"], "left").withColumn(
            "_obs", F.col(VALUE_COLS[0]).isNotNull()
        )
        order = Window.partitionBy("source").orderBy("bucket_start")
        before = order.rowsBetween(Window.unboundedPreceding, -1)
        after = order.rowsBetween(1, Window.unboundedFollowing)
        t = F.col("bucket_start").cast("double")
        obs_t = F.when(F.col("_obs"), t)
        prev_t = F.last(obs_t, ignorenulls=True).over(before)
        next_t = F.first(obs_t, ignorenulls=True).over(after)
        w = (t - prev_t) / (next_t - prev_t)
        out = joined.withColumn("_w", w)
        for c in VALUE_COLS:
            pv = F.last(
                F.when(F.col("_obs"), F.col(c)), ignorenulls=True
            ).over(before)
            nv = F.first(
                F.when(F.col("_obs"), F.col(c)), ignorenulls=True
            ).over(after)
            filled = pv + F.col("_w") * (nv - pv)
            if c in _INT_CASTS:
                filled = F.round(filled).cast(_INT_CASTS[c])
            out = out.withColumn(
                c, F.when(F.col("_obs"), F.col(c)).otherwise(filled)
            )
        out = out.withColumn(
            "gapfilled",
            F.when(
                F.col("_obs"), F.coalesce(F.col("gapfilled"), F.lit(False))
            ).otherwise(F.lit(True)),
        )
        return out.select("source", "bucket_start", *VALUE_COLS, "gapfilled")

    key = ["source", "bucket_start"]
    got = gapfill_linear(hourly, "hourly").orderBy(*key).collect()
    want = reference(hourly, "hourly").orderBy(*key).collect()
    assert len(got) == len(want) and len(got) > 0
    for g, w_ in zip(got, want):
        assert tuple(g) == tuple(w_), f"{g} != {w_}"
