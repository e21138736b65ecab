"""Trailing-window continuous aggregates and streaming exact dedup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rtsa_spark.operators.rollup import trailing_window


def _hourly(spark, pts: dict[int, int]):
    rows = [(f"2024-03-01 {h:02d}:00:00", int(v)) for h, v in pts.items()]
    return spark.createDataFrame(rows, "b string, x long").select(
        F.lit("k1").alias("k"),
        F.to_timestamp("b").alias("bucket_start"),
        "x",
    )


def test_trailing_window_hand_case(spark):
    df = _hourly(spark, {0: 10, 1: 20, 2: 30, 3: 40})
    out = {
        r["bucket_start"].hour: r
        for r in trailing_window(
            df, window_buckets=3, bucket_seconds=3600,
            key_cols=["k"], value_col="x",
        ).collect()
    }
    assert (out[0]["w_sum"], out[0]["n_in_window"]) == (10, 1)
    assert (out[2]["w_sum"], out[2]["w_min"], out[2]["w_max"]) == (60, 10, 30)
    assert (out[3]["w_sum"], out[3]["n_in_window"]) == (90, 3)
    assert out[3]["w_mean_e4"] == (10000 * 90) // 3


def test_trailing_window_gap_shortens_not_stretches(spark):
    """RANGE frame: a missing bucket drops out of the window instead of
    pulling an older bucket in (the ROWS-frame bug this op avoids)."""
    df = _hourly(spark, {0: 100, 5: 1, 6: 2})
    out = {
        r["bucket_start"].hour: r
        for r in trailing_window(
            df, window_buckets=3, bucket_seconds=3600,
            key_cols=["k"], value_col="x",
        ).collect()
    }
    # at hour 6 the 3-bucket range covers hours 4..6 -> only 5 and 6
    assert (out[6]["w_sum"], out[6]["n_in_window"]) == (3, 2)
    assert out[5]["n_in_window"] == 1  # hour 0 is far outside the range


def test_trailing_window_matches_numpy(spark):
    rng = np.random.RandomState(5)
    vals = rng.randint(-50, 200, 48)
    epoch = 1_709_251_200  # 2024-03-01 00:00:00 UTC
    df = spark.createDataFrame(
        [(epoch + 3600 * h, int(v)) for h, v in enumerate(vals)],
        "t long, x long",
    ).select(
        F.lit("k1").alias("k"),
        F.timestamp_seconds("t").alias("bucket_start"),
        "x",
    )
    out = {
        (r["bucket_start"].day - 1) * 24 + r["bucket_start"].hour: r
        for r in trailing_window(
            df, window_buckets=7, bucket_seconds=3600,
            key_cols=["k"], value_col="x",
        ).collect()
    }
    for h in range(48):
        lo = max(0, h - 6)
        seg = vals[lo : h + 1]
        assert out[h]["w_sum"] == seg.sum()
        assert out[h]["w_min"] == seg.min()
        assert out[h]["w_max"] == seg.max()
        s, n = int(seg.sum()), len(seg)
        want = (10000 * s) // n if s >= 0 else -((10000 * (-s) + n - 1) // n)
        assert out[h]["w_mean_e4"] == want


def test_streaming_dedup_drops_watermark_window_dups(spark, tmp_path):
    from rtsa_spark.streaming.rollup_stream import streaming_dedup

    rows = [
        (f"d{i}", f"content-{i % 4}", f"2024-03-01 00:{i:02d}:00")
        for i in range(16)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, content string, ts_s string"
    ).select("doc_id", "content", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream = spark.readStream.schema(
        "doc_id string, content string, ts timestamp"
    ).parquet(str(tmp_path / "in"))
    q = (
        streaming_dedup(stream, watermark="10 minutes", content_cols=["content"])
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 4  # one survivor per distinct content
    assert {r["content"] for r in out.collect()} == {
        f"content-{i}" for i in range(4)
    }
