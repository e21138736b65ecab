from __future__ import annotations

import pyspark.sql.functions as F

from rtsa_spark.operators.rollup import rollup_raw
from rtsa_spark.streaming.rollup_stream import (
    read_sequences_stream,
    run_stream_to_parquet,
    streaming_rollup_raw,
)


def test_streaming_rollup_matches_batch(spark, tiny_sequences, tmp_path):
    """availableNow replay of the raw tier == batch rollup_raw on every
    finalized bucket. Append mode only emits windows the watermark has
    passed, so the source carries one sentinel row 2 days past max(ts):
    the watermark then clears every real bucket, and the sentinel's own
    bucket is the only state left unemitted."""
    src = str(tmp_path / "seq_stream_src")
    sentinel = tiny_sequences.limit(1).withColumn(
        "ts", F.lit("2099-01-01 00:00:00").cast("timestamp")
    )
    tiny_sequences.unionByName(sentinel).coalesce(4).write.mode("overwrite").parquet(src)

    stream = read_sequences_stream(spark, src, max_files_per_trigger=None)
    assert stream.isStreaming
    rolled = streaming_rollup_raw(stream, watermark="5 minutes")

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = run_stream_to_parquet(rolled, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    want = rollup_raw(tiny_sequences)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # resume from checkpoint with no new data: no duplicate output
    q2 = run_stream_to_parquet(
        streaming_rollup_raw(
            read_sequences_stream(spark, src, max_files_per_trigger=None),
            "5 minutes",
        ),
        out,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == want.count()
