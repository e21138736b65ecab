"""Changelog-driven incremental maintenance of downstream tiers.

``TierPipeline.sync`` maintains tiers at MONTH granularity: a changed
month recomputes wholesale downstream.  This module is the finer,
Iceberg-native shape the north rule's "continuous aggregates" implies:
given a SOURCE tier held in a :class:`~rtsa_spark.snapshot.SnapshotStore`
(e.g. the hourly tier a streaming sink maintains), fold its CDC delta
(:meth:`SnapshotStore.read_changes`) into the NEXT tier's store by
recomputing ONLY the coarser buckets the delta touched — incremental
materialized-view maintenance, cost O(changed buckets + their months),
never O(table).

Why recompute affected buckets instead of applying +/- deltas directly:
count and sum ARE incrementally maintainable under DELETEs, but min/max
are not (removing the row that held the minimum needs the remaining
rows).  Recomputing just the affected (source, bucket) groups from the
source head is exact for every aggregate, and the source read is
manifest-pruned to the affected months — a day bucket never spans a
month boundary, so the pruned read always contains every source row the
recompute needs.

Resumability: each sync commit records ``synced_from`` = the source
snapshot it consumed up to; the next :func:`sync_next` resumes from
there automatically.  The destination commit pins ``expect_versions``
on the months it read, so a concurrent writer to the destination raises
:class:`~rtsa_spark.snapshot.CommitConflict` instead of being folded
over (retry re-reads both sides).

The reference recomputes every result stack per call
(``/root/reference/R/rtsa.stl.R:441-489``); incremental maintenance of
derived tiers is this engine's own surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rtsa_spark.operators.rollup import BUCKET_OF, rollup_next
from rtsa_spark.snapshot import MAIN, SnapshotStore

__all__ = ["sync_next"]


def _last_synced(dst: SnapshotStore) -> int | None:
    for row in reversed(dst.data_commits()):
        if "synced_from" in row:
            return row["synced_from"]
    return None


def sync_next(
    src: SnapshotStore,
    dst: SnapshotStore,
    to_tier: str,
    since: int | None = None,
) -> int | None:
    """Fold ``src``'s changes since the last sync into ``dst`` as tier
    ``to_tier`` (``"daily"``/``"monthly"``/... — the next rollup of the
    tier ``src`` holds).  Returns the destination commit id, or ``None``
    when the source has no new changes (no empty commits).

    First call (empty ``dst``): publishes the full ``rollup_next`` of the
    source head and records the watermark.  Afterwards: reads the source
    changelog ``(since, head]`` — manifest-pruned to changed months —
    derives the DISTINCT affected coarser buckets, recomputes exactly
    those groups from the source head (read pruned to their months),
    and commits a month-scoped refresh of the destination where
    untouched buckets ride through unchanged and an emptied month is
    deleted.  ``since`` overrides the recorded watermark (e.g. to replay
    after a destination rollback)."""
    if to_tier not in BUCKET_OF or to_tier == "raw":
        raise ValueError(f"bad target tier: {to_tier}")
    until = src.current_snapshot()
    if until is None:
        raise ValueError("source store has no snapshots yet")

    if dst.current_snapshot() is None:
        return dst.publish(
            rollup_next(src.read(), to_tier), extra={"synced_from": until}
        )

    if since is None:
        since = _last_synced(dst)
        if since is None:
            raise ValueError(
                "destination has commits but no synced_from watermark; "
                "pass since= explicitly"
            )
    if since == until:
        return None

    unit = BUCKET_OF[to_tier]
    changes = src.read_changes(since, until)
    affected = (
        changes.select(
            "source",
            F.date_trunc(unit, F.col(src.ts_col)).alias("bucket_start"),
        )
        .distinct()
    )
    months = sorted(
        r["m"]
        for r in affected.select(
            F.date_format("bucket_start", "yyyy-MM").alias("m")
        )
        .distinct()
        .collect()
    )
    if not months:
        # a layout-only source commit (rewrite) yields an empty changelog
        return None

    # recompute exactly the affected coarser buckets from the source head;
    # a bucket never spans months, so the month-pruned read is complete.
    # `affected` is bucket-count-sized — broadcast the semi-join.
    keys = affected.withColumnRenamed("source", "_s").withColumnRenamed(
        "bucket_start", "_b"
    )
    pruned = src.read(months=months)
    selected = pruned.join(
        F.broadcast(keys),
        (pruned["source"] == keys["_s"])
        & (F.date_trunc(unit, pruned[src.ts_col]) == keys["_b"]),
        "left_semi",
    )
    recomputed = rollup_next(selected, to_tier)

    dst_head = dst.current_snapshot()
    dst_months = dst.months(asof=dst_head)
    expect = {m: dst_months.get(m) for m in months}
    keep = dst.read(asof=dst_head, months=months).join(
        affected, ["source", "bucket_start"], "left_anti"
    )
    merged = keep.unionByName(recomputed)
    return dst.refresh_months(
        merged,
        months,
        extra={"synced_from": until},
        expect_versions=expect,
    )
