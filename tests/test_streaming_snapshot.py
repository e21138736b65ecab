"""Streaming continuous aggregate into the snapshot store.

Properties: an availableNow replay split across micro-batches converges
to the exact batch rollup (buckets split across batches MERGE, no
watermark drops); every micro-batch is a time-travelable checkpoint whose
totals are a prefix of the input; retried batch ids no-op; checkpoint
resume with no new data commits nothing.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rtsa_spark.operators.rollup import merge_rollup, rollup_next, rollup_raw
from rtsa_spark.snapshot import SnapshotStore
from rtsa_spark.streaming.rollup_stream import read_sequences_stream
from rtsa_spark.streaming.snapshot_sink import (
    snapshot_rollup_sink,
    stream_sequences_to_snapshot,
)
from rtsa_spark.synth import synth_sequences


def _tier_totals(df):
    return {
        (r["source"], r["bucket_start"]): (
            r["n_seq"], r["n_tok_sum"], r["n_tok_min"], r["n_tok_max"]
        )
        for r in df.collect()
    }


def test_merge_rollup_is_exact_on_overlap(spark):
    seq = synth_sequences(spark, 3000, n_sources=3)
    half_a = seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    half_b = seq.exceptAll(half_a)
    merged = merge_rollup(rollup_raw(half_a), rollup_raw(half_b))
    assert _tier_totals(merged) == _tier_totals(rollup_raw(seq))


def test_stream_converges_to_batch_and_checkpoints_history(
    spark, tmp_path
):
    seq = synth_sequences(spark, 4000, n_sources=3)
    src = str(tmp_path / "src")
    seq.coalesce(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(spark, str(tmp_path / "store"))
    q = stream_sequences_to_snapshot(
        read_sequences_stream(spark, src, max_files_per_trigger=1),
        store,
        tier="hourly",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    want = rollup_next(rollup_raw(seq), "hourly")
    assert _tier_totals(store.read()) == _tier_totals(want)

    # one commit per non-empty micro-batch; history is monotone:
    # each checkpoint's global totals are <= the final
    commits = store.data_commits()
    assert len(commits) >= 2  # maxFilesPerTrigger=1 over 4 files
    final_tok = store.read().agg(F.sum("n_tok_sum")).first()[0]
    prev = 0
    for c in commits:
        tok = (
            store.read(asof=c["snapshot_id"])
            .agg(F.sum("n_tok_sum"))
            .first()[0]
        )
        assert prev <= tok <= final_tok
        prev = tok
    assert prev == final_tok

    # checkpoint resume with no new data: no further commits
    q2 = stream_sequences_to_snapshot(
        read_sequences_stream(spark, src, max_files_per_trigger=1),
        store,
        tier="hourly",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(300)
    assert len(store.data_commits()) == len(commits)
    assert _tier_totals(store.read()) == _tier_totals(want)


def test_retried_batch_id_is_noop(spark, tmp_path):
    seq = synth_sequences(spark, 1500, n_sources=2)
    store = SnapshotStore(spark, str(tmp_path / "store"))
    fold = snapshot_rollup_sink(store, tier="raw")
    fold(seq, 0)
    t1 = _tier_totals(store.read())
    fold(seq, 0)  # Spark replays the same batch id after a failure
    assert len(store.data_commits()) == 1
    assert _tier_totals(store.read()) == t1
    # a NEW batch id merges (totals double)
    fold(seq, 1)
    tok1 = sum(v[1] for v in t1.values())
    tok2 = sum(v[1] for v in _tier_totals(store.read()).values())
    assert tok2 == 2 * tok1


def test_sink_guards(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "store"))
    with pytest.raises(ValueError, match="unknown tier"):
        snapshot_rollup_sink(store, tier="decade")


def test_stream_stages_onto_branch_then_fast_forwards(spark, tmp_path):
    """Streaming write-audit-publish: micro-batches land on a branch,
    main stays at the pre-stream state until fast_forward."""
    seq = synth_sequences(spark, 3000, n_sources=3)
    early = seq.where(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == 0)
    late = seq.exceptAll(early)
    src = str(tmp_path / "src")
    late.coalesce(2).write.mode("overwrite").parquet(src)

    store = SnapshotStore(spark, str(tmp_path / "store"))
    store.publish(rollup_next(rollup_raw(early), "hourly"))
    store.branch("ingest")

    q = stream_sequences_to_snapshot(
        read_sequences_stream(spark, src, max_files_per_trigger=1),
        store,
        tier="hourly",
        checkpoint=str(tmp_path / "ckpt"),
        branch="ingest",
    )
    q.awaitTermination(300)

    want_all = rollup_next(rollup_raw(seq), "hourly")
    want_early = rollup_next(rollup_raw(early), "hourly")
    # main untouched mid-stream; the branch holds the converged fold
    assert _tier_totals(store.read()) == _tier_totals(want_early)
    assert _tier_totals(store.read(asof="ingest")) == _tier_totals(want_all)

    store.fast_forward("ingest")
    store.drop_branch("ingest")
    assert _tier_totals(store.read()) == _tier_totals(want_all)
