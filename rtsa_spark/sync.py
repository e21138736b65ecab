"""Changelog-driven incremental maintenance of downstream tiers.

``TierPipeline.sync`` maintains tiers at MONTH granularity: a changed
month recomputes wholesale downstream.  This module is the finer,
Iceberg-native shape the north rule's "continuous aggregates" implies:
given a SOURCE tier held in a :class:`~rtsa_spark.snapshot.SnapshotStore`
(e.g. the hourly tier a streaming sink maintains), fold its CDC delta
(:meth:`SnapshotStore.read_changes`): the changelog names the months
that changed, and ONLY those months of the next tier recompute —
incremental materialized-view maintenance, cost O(changed months),
never O(table).

Why recompute instead of applying +/- deltas directly: count and sum
ARE incrementally maintainable under DELETEs, but min/max are not
(removing the row that held the minimum needs the remaining rows).
Recomputing the changed months from the source head is exact for every
aggregate; the recompute derives purely from the source (no destination
read), so there is no stale-fold hazard, and the destination refresh is
month-scoped so untouched months ride through as metadata.

Resumability: each sync commit records ``synced_from`` = the source
snapshot it consumed up to; the next :func:`sync_next` resumes from
there automatically.  All source reads pin ``asof=`` that snapshot, so
a source commit racing the sync cannot leak data the watermark does not
cover (the racer's months re-sync next call instead of silently riding
an understated watermark).

Weekly is the one tier whose buckets do not nest in months
(``date_trunc("week")`` is the week's Monday, which can fall in the
previous month), so the incremental path works in TARGET-bucket space:
the affected destination months are the months of the changed rows'
*truncated* bucket starts, the source read widens one month forward (a
week starting month-end spills into the next month), and the recompute
filters to exactly the affected buckets' months — boundary weeks
re-aggregate from both their months and untouched weeks sharing a
refreshed month are recomputed rather than dropped.

The reference recomputes every result stack per call
(``/root/reference/R/rtsa.stl.R:441-489``); incremental maintenance of
derived tiers is this engine's own surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rtsa_spark.operators.rollup import BUCKET_OF, rollup_next
from rtsa_spark.snapshot import MAIN, SnapshotStore

__all__ = ["sync_next"]


def _next_month(m: str) -> str:
    """``"YYYY-MM"`` one month forward (``"2024-12"`` -> ``"2025-01"``)."""
    y, mo = int(m[:4]), int(m[5:7])
    y, mo = (y + 1, 1) if mo == 12 else (y, mo + 1)
    return f"{y:04d}-{mo:02d}"


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
    recomputes exactly those months from the source head, and commits a
    month-scoped refresh of the destination where untouched months ride
    through unchanged and an emptied month is deleted.  ``since``
    overrides the recorded watermark (e.g. to replay after a destination
    rollback)."""
    if to_tier not in BUCKET_OF or to_tier == "raw":
        raise ValueError(f"bad target tier: {to_tier}")
    until = src.current_snapshot()
    if until is None:
        raise ValueError("source store has no snapshots yet")

    if dst.current_snapshot() is None:
        return dst.publish(
            rollup_next(src.read(asof=until), to_tier),
            extra={"synced_from": until},
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

    # affected DESTINATION months: months of the changed rows' truncated
    # bucket starts.  For hourly/daily/monthly the truncation nests, so
    # this equals the changed source months; for weekly a row in the first
    # days of a month can belong to a week starting in the previous month.
    changes = src.read_changes(since, until)
    bucket_month = F.date_format(
        F.date_trunc(BUCKET_OF[to_tier], F.col(src.ts_col)), "yyyy-MM"
    )
    months = sorted(
        r["m"]
        for r in changes.select(bucket_month.alias("m")).distinct().collect()
    )
    if not months:
        # a layout-only source commit (rewrite) yields an empty changelog
        return None

    # recompute the affected destination months wholesale from the source
    # head and let the month-scoped refresh replace them.  Finer
    # (per-bucket) precision buys nothing here: the destination commit is
    # month-granular anyway, the source scan is month-pruned either way,
    # and this shape needs no destination read, no broadcast, and no
    # keep/anti-join — the whole sync is one pruned scan + one
    # aggregation, derived purely from the source (so there is no
    # stale-fold hazard to validate against).  The refresh replaces whole
    # destination months, so the recompute must carry EVERY bucket whose
    # start falls in them: for weekly the source read widens one month
    # forward (a week starting month-end spills rows into the next month)
    # and the filter keeps exactly those buckets; the month-nesting tiers
    # read the affected months as-is.
    if BUCKET_OF[to_tier] == "week":
        read_months = sorted({*months, *(_next_month(m) for m in months)})
        src_rows = src.read(asof=until, months=read_months).where(
            bucket_month.isin(months)
        )
    else:
        src_rows = src.read(asof=until, months=months)
    recomputed = rollup_next(src_rows, to_tier)
    return dst.refresh_months(
        recomputed, months, extra={"synced_from": until}
    )
