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
    assert q.awaitTermination(300)
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


def test_cm_state_replay_and_crash_window_are_exactly_once(spark, tmp_path):
    """The manifest makes the cell-sum structurally exactly-once: a
    committed batch id is a no-op on replay, and a crash AFTER the delta
    write but BEFORE the manifest commit (the double-apply window of a
    merge-in-place design) heals — the replay rewrites the orphan
    directory and commits once."""
    import json as _json
    import os as _os

    from rtsa_spark.streaming.sketch_stream import (
        cm_state_update,
        read_cm_state,
    )

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [("s1", 1, "a")] * 3 + [("s1", 2, "b")] * 2,
        "source string, b long, item string",
    )
    assert cm_state_update(
        spark, b0, 0, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    before = sorted(map(tuple, read_cm_state(spark, state).collect()))
    # committed replay: fast no-op
    assert not cm_state_update(
        spark, b0, 0, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    assert sorted(map(tuple, read_cm_state(spark, state).collect())) == before
    # crash window: batch 1's delta directory exists but the manifest
    # commit never happened -> readers ignore it, replay applies ONCE
    b1 = spark.createDataFrame(
        [("s1", 2, "b")] * 5, "source string, b long, item string"
    )
    assert cm_state_update(
        spark, b1, 1, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    mp = _os.path.join(state, "MANIFEST.json")
    man = _json.load(open(mp))
    man["dirs"] = [d for d in man["dirs"] if d != "deltas/batch=1"]
    man["applied"] = [a for a in man["applied"] if a != 1]
    with open(mp, "w") as f:
        _json.dump(man, f)  # simulate the pre-commit crash
    assert sorted(map(tuple, read_cm_state(spark, state).collect())) == before
    assert cm_state_update(  # replay heals: rewrites dir, commits once
        spark, b1, 1, state, ["source"], "b", "item", d_rows=2, w_cols=8
    )
    r = {
        x["bucket"]: x["n_items"]
        for x in read_cm_state(spark, state).collect()
    }
    assert r == {1: 3, 2: 7}  # bucket 2 = 2 + 5, applied exactly once


def test_cm_state_compaction_preserves_state(spark, tmp_path):
    """Past compact_after live directories the state folds into one base
    under a manifest swap — same cells, bounded read fan-in, orphan
    deltas removed."""
    import json as _json
    import os as _os

    from rtsa_spark.streaming.sketch_stream import (
        cm_state_update,
        read_cm_state,
    )

    state = str(tmp_path / "state")
    for i in range(4):
        b = spark.createDataFrame(
            [("s1", 1, f"it{i}")] * (i + 1),
            "source string, b long, item string",
        )
        cm_state_update(
            spark, b, i, state, ["source"], "b", "item",
            d_rows=2, w_cols=8, compact_after=2,
        )
    man = _json.load(open(_os.path.join(state, "MANIFEST.json")))
    assert len(man["dirs"]) <= 3 and any("base=" in d for d in man["dirs"])
    assert man["applied"] == [0, 1, 2, 3]
    r = read_cm_state(spark, state).collect()[0]
    assert r["n_items"] == 1 + 2 + 3 + 4


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
    assert q.awaitTermination(300)
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


def test_bloom_dedup_recovers_from_missing_filter(spark, tmp_path):
    """The filter is a cache of the fingerprint store: if its directory
    is destroyed (crash during the rewrite), the next batch rebuilds it
    from the store and dedup does NOT degrade to pass-through."""
    import os as _os
    import shutil as _shutil

    from rtsa_spark.streaming.sketch_stream import bloom_dedup_update

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "doc_id string, ts long, text string"
    )
    assert bloom_dedup_update(spark, b0, 0, state, out, m_bits=512) == 2
    _shutil.rmtree(_os.path.join(state, "bloom"))  # torn filter
    b1 = spark.createDataFrame(
        [("c", 3, "x"), ("d", 4, "z")], "doc_id string, ts long, text string"
    )
    assert bloom_dedup_update(spark, b1, 1, state, out, m_bits=512) == 1
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == ["a", "b", "d"]  # "c" was the re-arrival of "x"
    # and the filter cache is restored for subsequent batches
    assert _os.path.exists(_os.path.join(state, "bloom"))
