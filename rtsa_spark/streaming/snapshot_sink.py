"""Streaming continuous aggregate into the snapshot store.

``streaming/rollup_stream.py`` emits finalized raw-tier buckets append-only
(watermark-evicted, each bucket exactly once).  This module is the other
streaming shape the north rule's "continuous aggregates" implies: a
**merging** sink that folds every micro-batch into a persistent tier held
by a :class:`rtsa_spark.snapshot.SnapshotStore` — so the tier is queryable
mid-stream, every micro-batch is a resumable checkpoint (time-travel shows
the tier as of any committed batch), and a bucket split across
micro-batches converges to the exact batch rollup (no watermark drops:
late data just merges into its bucket whenever it arrives).

Exactly-once without transactions:

- each commit records its micro-batch id (``stream_batch_id``) on the
  snapshot-log row; a RETRIED micro-batch (same id, Spark replays it after
  a failure) is detected driver-side and skipped — the standard
  foreachBatch idempotence pattern, here backed by the store's own log
  instead of a side table;
- the store is append-only: a batch that died between the data write and
  the log append leaves an orphan version dir that no snapshot references
  — the retry re-merges from the last COMMITTED state, and the orphan is
  reaped by ``expire()``.  There is no torn state to repair;
- per micro-batch cost: rollup of the batch + a month-pruned read of ONLY
  the affected months of the stored tier + an append of those months —
  delta-sized, never history-sized.

The reference is pure batch (it recomputes every stack per call,
``/root/reference/R/rtsa.stl.R:441-489``); incremental maintenance with
checkpoint history is this engine's own surface.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rtsa_spark.operators.rollup import (
    TIER_ORDER,
    merge_rollup,
    rollup_next,
    rollup_raw,
)
from rtsa_spark.snapshot import MAIN, CommitConflict, SnapshotStore


def _batch_to_tier(batch_df: DataFrame, tier: str) -> DataFrame:
    if tier not in TIER_ORDER:
        raise ValueError(f"unknown tier {tier!r}")
    out = rollup_raw(batch_df)
    for t in TIER_ORDER[1 : TIER_ORDER.index(tier) + 1]:
        out = rollup_next(out, t)
    return out


def snapshot_rollup_sink(
    store: SnapshotStore,
    tier: str = "raw",
    branch: str = MAIN,
    max_retries: int = 3,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining ``tier`` incrementally in
    ``store``: rollup the micro-batch, merge it with the stored tier's
    affected months, commit month-scoped.  Retried batch ids no-op.

    ``branch`` stages the stream onto a ref instead of main (streaming
    write-audit-publish: audit ``read(asof=branch)`` mid-stream, land
    with ``fast_forward`` when the batch window validates).  The merge
    is read-modify-write, so a concurrent writer to the same months
    raises :class:`CommitConflict` — retried here up to ``max_retries``
    times against the fresh head (the Iceberg commit-retry loop), and the
    branch-scoped batch-id guard is RE-CHECKED before every retry so a
    zombie writer that committed the same micro-batch during the race
    can never be folded twice.  One stream per (store, branch): the guard
    is branch-scoped, so independent branches carry independent streams,
    but two queries writing the same branch would trip each other's ids."""
    if tier not in TIER_ORDER:
        raise ValueError(f"unknown tier {tier!r}")

    def _committed_through() -> int:
        # branch-scoped: another branch's (or another stream's) batch ids
        # must not mask this stream's commits
        return max(
            (
                r.get("stream_batch_id", -1)
                for r in store.data_commits(branch)
            ),
            default=-1,
        )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _committed_through():
            return  # retried micro-batch: already committed
        delta = _batch_to_tier(batch_df, tier).persist()
        try:
            months = [
                r["m"]
                for r in delta.select(
                    F.date_format("bucket_start", "yyyy-MM").alias("m")
                )
                .distinct()
                .collect()
            ]
            if not months:
                return  # empty micro-batch: nothing to commit
            extra = {"stream_batch_id": batch_id}
            if store.current_snapshot(branch) is None:
                try:
                    store.publish(
                        delta, extra=extra, branch=branch, expect_empty=True
                    )
                    return
                except CommitConflict:
                    pass  # another writer bootstrapped first: fold instead
            for attempt in range(max_retries):
                try:
                    store.merge(
                        delta, combine=merge_rollup, months=months,
                        extra=extra, branch=branch,
                    )
                    return
                except CommitConflict:
                    # the conflicting commit may BE this micro-batch
                    # (zombie driver): folding again would double it
                    if batch_id <= _committed_through():
                        return
                    if attempt == max_retries - 1:
                        raise
        finally:
            delta.unpersist()

    return _fold


def stream_sequences_to_snapshot(
    stream: DataFrame,
    store: SnapshotStore,
    tier: str = "raw",
    checkpoint: str | None = None,
    available_now: bool = True,
    branch: str = MAIN,
):
    """Wire a sequences stream into :func:`snapshot_rollup_sink` and
    start it.  ``checkpoint`` gives Spark's offset tracking; the sink's
    batch-id skip makes replays after a checkpoint restore idempotent."""
    writer = stream.writeStream.foreachBatch(
        snapshot_rollup_sink(store, tier, branch=branch)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
