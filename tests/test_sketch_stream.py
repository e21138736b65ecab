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


def test_bloom_dedup_stream_equals_global_first_occurrence(spark, tmp_path):
    """Three time-ordered microbatches with cross-batch re-crawls: the
    admitted set equals a global first-occurrence dedup, re-arrivals are
    dropped across batch boundaries (beyond any watermark horizon)."""
    from rtsa_spark.streaming.sketch_stream import streaming_bloom_dedup

    rows = []
    texts = [f"content {i}" for i in range(40)]
    # batch files in time order; later files re-send earlier content
    batches = [
        [(f"d{i:03d}", i, texts[i]) for i in range(20)],
        [(f"d{i:03d}", i, texts[i - 20]) for i in range(20, 30)]  # all dups
        + [(f"d{i:03d}", i, texts[i - 10]) for i in range(30, 40)],  # fresh
        [(f"d{i:03d}", i, texts[(i * 7) % 30]) for i in range(40, 55)],
    ]
    in_path = str(tmp_path / "in")
    import os as _os
    for ws in batches:
        df = spark.createDataFrame(ws, "doc_id string, ts long, text string")
        df.coalesce(1).write.mode("append").parquet(in_path)
        rows += ws
    stream = (
        spark.readStream.schema("doc_id string, ts long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_path)
    )
    q = streaming_bloom_dedup(
        stream, str(tmp_path / "state"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), content_col="text",
        order_cols=["ts", "doc_id"], m_bits=4096, k_hash=3,
    )
    q.awaitTermination(300)
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    seen, want = set(), []
    for d, _, t in sorted(rows, key=lambda r: (r[1], r[0])):
        if t not in seen:
            seen.add(t)
            want.append(d)
    assert got == sorted(want)


def test_bloom_dedup_replay_is_structurally_idempotent(spark, tmp_path):
    """Replaying a batch AFTER its writes but BEFORE its ledger row
    (the crash window) rewrites the same per-batch directories and keeps
    the same admitted set — correctness does not depend on the ledger."""
    import os as _os

    from rtsa_spark.streaming.sketch_stream import bloom_dedup_update

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "x")],
        "doc_id string, ts long, text string",
    )
    assert bloom_dedup_update(spark, b0, 0, state, out, m_bits=512) == 2
    b1 = spark.createDataFrame(
        [("d", 4, "y"), ("e", 5, "z")], "doc_id string, ts long, text string"
    )
    assert bloom_dedup_update(spark, b1, 1, state, out, m_bits=512) == 1
    before = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert before == ["a", "b", "e"]
    # simulate the crash window: drop batch 1's ledger row, replay it
    lp = _os.path.join(state, "_sketch_ledger.jsonl")
    lines = open(lp).read().strip().splitlines()
    with open(lp, "w") as f:
        f.write(lines[0] + "\n")
    assert bloom_dedup_update(spark, b1, 1, state, out, m_bits=512) == 1
    after = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert after == before
    # and a ledgered replay is the fast-path no-op
    assert bloom_dedup_update(spark, b1, 1, state, out, m_bits=512) == -1
