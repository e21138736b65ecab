"""Incremental count-min maintenance (streaming/sketch_stream.py):
multi-microbatch state equals the direct batch sketch (the exact-merge
identity, end to end through foreachBatch), only touched bucket
partitions rewrite, and the batch-id ledger keeps replays exactly-once.
"""

import os

import pyspark.sql.functions as F
import pytest


def _events(spark, tmp, n_files=3):
    rows = []
    for i in range(600):
        rows.append((f"s{i % 3}", i % 4, str(i % 23)))
    df = spark.createDataFrame(rows, "source string, b long, item string")
    path = os.path.join(tmp, "in")
    for f in range(n_files):
        df.where(F.expr(f"abs(hash(item, b)) % {n_files} = {f}")).coalesce(
            1
        ).write.mode("append").parquet(path)
    return df, path


def test_cm_state_multibatch_equals_direct(spark, tmp_path):
    from rtsa_spark.operators.sketch import cm_bucket_sketch
    from rtsa_spark.streaming.sketch_stream import (
        read_cm_state,
        streaming_cm_state,
    )

    df, in_path = _events(spark, str(tmp_path))
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("source string, b long, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_path)
    )
    q = streaming_cm_state(
        stream, state, str(tmp_path / "ckpt"), ["source"], "b", "item",
        d_rows=3, w_cols=16,
    )
    q.awaitTermination(300)
    got = {
        (r["source"], r["bucket"]): (r["cm"], r["n_items"])
        for r in read_cm_state(spark, state).collect()
    }
    want = {
        (r["source"], r["bucket"]): (r["cm"], r["n_items"])
        for r in cm_bucket_sketch(
            df, ["source"], "b", "item", d_rows=3, w_cols=16
        ).collect()
    }
    assert got == want
    # ledger recorded one row per microbatch (3 files -> 3 batches)
    with open(os.path.join(state, "_sketch_ledger.jsonl")) as f:
        assert sum(1 for _ in f) == 3


def test_cm_state_replay_skipped_and_partition_scoped(spark, tmp_path):
    from rtsa_spark.streaming.sketch_stream import (
        cm_state_update,
        read_cm_state,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [("s1", 1, "a")] * 3 + [("s1", 2, "b")] * 2,
        "source string, b long, item string",
    )
    assert cm_state_update(
        spark, b1, 0, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    before = sorted(
        map(tuple, read_cm_state(spark, state).collect())
    )
    # replaying the same batch id is a no-op (at-least-once -> exactly-once)
    assert not cm_state_update(
        spark, b1, 0, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    assert sorted(map(tuple, read_cm_state(spark, state).collect())) == before
    # a second batch touching only bucket 2 leaves bucket 1's partition
    # directory bit-identical (scoped rewrite, not a full-table rewrite)
    p1 = os.path.join(state, "data", "p_bucket=1")
    files_before = sorted(os.listdir(p1))
    mtimes = {f: os.path.getmtime(os.path.join(p1, f)) for f in files_before}
    b2 = spark.createDataFrame(
        [("s1", 2, "b")] * 5, "source string, b long, item string"
    )
    assert cm_state_update(
        spark, b2, 1, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    assert sorted(os.listdir(p1)) == files_before
    assert all(
        os.path.getmtime(os.path.join(p1, f)) == mtimes[f]
        for f in files_before
    )
    # and bucket 2 accumulated: n_items = 2 + 5
    r = [
        x
        for x in read_cm_state(spark, state).collect()
        if x["bucket"] == 2
    ][0]
    assert r["n_items"] == 7
