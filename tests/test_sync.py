"""Changelog-driven incremental tier maintenance (rtsa_spark/sync.py).

Invariant after every sync: the destination store equals a from-scratch
``rollup_next`` of the source head — while the commit that got it there
touched only the months the source delta affected.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.rollup import merge_rollup, rollup_next, rollup_raw
from rtsa_spark.snapshot import SnapshotStore
from rtsa_spark.sync import sync_next
from rtsa_spark.synth import synth_sequences


@pytest.fixture(scope="module")
def hourly(spark):
    return rollup_next(
        rollup_raw(synth_sequences(spark, 6000, n_sources=4)), "hourly"
    ).cache()


def _totals(df):
    return {
        (r["source"], r["bucket_start"]): (r["n_seq"], r["n_tok_sum"])
        for r in df.select(
            "source", "bucket_start", "n_seq", "n_tok_sum"
        ).collect()
    }


def _stores(spark, tmp_path, hourly):
    src = SnapshotStore(spark, str(tmp_path / "src"))
    dst = SnapshotStore(spark, str(tmp_path / "dst"))
    src.publish(hourly)
    return src, dst


def test_first_sync_publishes_full_rollup(spark, hourly, tmp_path):
    src, dst = _stores(spark, tmp_path, hourly)
    sid = sync_next(src, dst, "daily")
    assert sid == 1
    assert _totals(dst.read()) == _totals(rollup_next(hourly, "daily"))
    # watermark recorded; an immediate re-sync is a no-op
    assert sync_next(src, dst, "daily") is None


def test_incremental_sync_touches_only_affected_months(
    spark, hourly, tmp_path
):
    src, dst = _stores(spark, tmp_path, hourly)
    sync_next(src, dst, "daily")
    feb = F.date_format("bucket_start", "yyyy-MM") == "2024-02"
    src.refresh_months(
        hourly.where(feb).withColumn("n_tok_sum", F.col("n_tok_sum") * 2),
        ["2024-02"],
    )
    before = dst.months()
    sid = sync_next(src, dst, "daily")
    assert sid is not None
    # exactness: dst == from-scratch rollup of the source head
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "daily"))
    # minimality: only the affected month's version changed
    after = dst.months(asof=sid)
    assert {m for m in before if before[m] != after.get(m)} == {"2024-02"}


def test_sync_applies_merge_deltas_and_deletions(spark, hourly, tmp_path):
    src, dst = _stores(spark, tmp_path, hourly)
    sync_next(src, dst, "daily")
    feb = F.date_format("bucket_start", "yyyy-MM") == "2024-02"
    # late data folds into february buckets at the source
    src.merge(hourly.where(feb), combine=merge_rollup)
    sync_next(src, dst, "daily")
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "daily"))
    # now the source deletes february wholesale; the emptied destination
    # month must disappear too
    src.refresh_months(hourly.where(F.lit(False)), ["2024-02"])
    sid = sync_next(src, dst, "daily")
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "daily"))
    assert "2024-02" not in dst.months(asof=sid)


def test_sync_resumes_across_multiple_source_commits(spark, hourly, tmp_path):
    src, dst = _stores(spark, tmp_path, hourly)
    sync_next(src, dst, "daily")
    for k in (1, 2, 3):
        src.refresh_months(
            hourly.withColumn("n_tok_sum", F.col("n_tok_sum") + k),
            ["2024-02"],
        )
    # one sync consumes all three commits at once
    sync_next(src, dst, "daily")
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "daily"))


def test_sync_noop_on_layout_only_rewrite(spark, hourly, tmp_path):
    src, dst = _stores(spark, tmp_path, hourly)
    sync_next(src, dst, "daily")
    src.rewrite()  # bit-identical content, empty changelog
    assert sync_next(src, dst, "daily") is None


def test_weekly_sync_exact_across_month_boundary(spark, hourly, tmp_path):
    """Weekly buckets do not nest in months (date_trunc("week") is the
    week's Monday, possibly in the previous month): a change in the first
    days of february belongs to the week of 2024-01-29, so the sync must
    refresh JANUARY's destination month and re-aggregate that week from
    both its months — the regression this test pins was an undercounted
    boundary week plus a stale destination row."""
    from rtsa_spark.sync import _next_month

    assert _next_month("2024-12") == "2025-01"
    assert _next_month("2024-02") == "2024-03"

    src, dst = _stores(spark, tmp_path, hourly)
    sync_next(src, dst, "weekly")
    assert _totals(dst.read()) == _totals(rollup_next(hourly, "weekly"))

    # double ONLY the first three february days (Thu-Sat of the week
    # starting Monday 2024-01-29) via a whole-month source refresh
    first_days = F.date_format("bucket_start", "yyyy-MM-dd").between(
        "2024-02-01", "2024-02-03"
    )
    feb = F.date_format("bucket_start", "yyyy-MM") == "2024-02"
    src.refresh_months(
        hourly.where(feb).withColumn(
            "n_tok_sum",
            F.when(first_days, F.col("n_tok_sum") * 2).otherwise(
                F.col("n_tok_sum")
            ),
        ),
        ["2024-02"],
    )
    before = dst.months()
    sid = sync_next(src, dst, "weekly")
    assert sid is not None
    # exactness: dst == from-scratch weekly rollup of the source head
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "weekly"))
    # minimality: only JANUARY's destination month changed (the affected
    # week starts 2024-01-29; february's weekly rows were untouched)
    after = dst.months(asof=sid)
    changed = {
        m
        for m in set(before) | set(after)
        if before.get(m) != after.get(m)
    }
    assert changed == {"2024-01"}


def test_sync_guards(spark, hourly, tmp_path):
    src = SnapshotStore(spark, str(tmp_path / "src"))
    dst = SnapshotStore(spark, str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="no snapshots"):
        sync_next(src, dst, "daily")
    src.publish(hourly)
    with pytest.raises(ValueError, match="bad target tier"):
        sync_next(src, dst, "raw")
    # a destination written outside sync has no watermark to resume from
    dst.publish(rollup_next(hourly, "daily"))
    with pytest.raises(ValueError, match="synced_from watermark"):
        sync_next(src, dst, "daily")
    # explicit since recovers it
    src.refresh_months(
        hourly.withColumn("n_tok_sum", F.col("n_tok_sum") + 1), ["2024-02"]
    )
    sid = sync_next(src, dst, "daily", since=1)
    assert sid is not None
    assert _totals(dst.read()) == _totals(rollup_next(src.read(), "daily"))


def test_stream_then_sync_chain(spark, tmp_path):
    """The full continuous-aggregate chain: micro-batches fold into the
    hourly store (merging sink), then sync_next maintains the daily tier
    from the hourly changelog — end state equals the batch truth."""
    from rtsa_spark.streaming.rollup_stream import read_sequences_stream
    from rtsa_spark.streaming.snapshot_sink import (
        stream_sequences_to_snapshot,
    )

    seq = synth_sequences(spark, 4000, n_sources=3)
    src_dir = str(tmp_path / "in")
    seq.coalesce(3).write.mode("overwrite").parquet(src_dir)

    hourly_store = SnapshotStore(spark, str(tmp_path / "hr"))
    daily_store = SnapshotStore(spark, str(tmp_path / "dy"))

    q = stream_sequences_to_snapshot(
        read_sequences_stream(spark, src_dir, max_files_per_trigger=1),
        hourly_store,
        tier="hourly",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    # sync after the stream drains; then replay late data and re-sync
    sync_next(hourly_store, daily_store, "daily")
    want = rollup_next(rollup_next(rollup_raw(seq), "hourly"), "daily")
    assert _totals(daily_store.read()) == _totals(want)

    late = seq.limit(200)
    hourly_store.merge(
        rollup_next(rollup_raw(late), "hourly"), combine=merge_rollup
    )
    sync_next(hourly_store, daily_store, "daily")
    assert _totals(daily_store.read()) == _totals(
        rollup_next(hourly_store.read(), "daily")
    )
