"""Retention policies: pure-filter semantics, manifest accounting, and
partition-granular file expiry over the pipeline layout."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F

from rtsa_spark.operators.retention import (
    apply_retention,
    expire_partitions,
    retention_manifest,
)


def _tier(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=d), d) for d in range(100)
    ]
    return spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )


def test_apply_retention_filters_exactly(spark):
    df = _tier(spark)
    kept = apply_retention(df, "2024-04-09 00:00:00", "7 days")
    rows = kept.select("bucket_start").collect()
    # cutoff = 2024-04-02; days 92..99 qualify (2024-04-02 .. 2024-04-09)
    assert len(rows) == 8
    assert min(r[0] for r in rows) == dt.datetime(2024, 4, 2)
    # keep=None keeps everything
    assert apply_retention(df, "2024-04-09 00:00:00", None).count() == 100


def test_retention_manifest_accounting(spark):
    df = _tier(spark)
    man = {
        r["tier"]: r
        for r in retention_manifest(
            {"daily": df, "monthly": df},
            as_of="2024-04-09 00:00:00",
            policy={"daily": "7 days", "monthly": None},
        ).collect()
    }
    assert man["daily"]["rows_total"] == 100
    assert man["daily"]["rows_kept"] == 8
    assert man["daily"]["rows_dropped"] == 92
    assert man["monthly"]["rows_dropped"] == 0


def test_expire_partitions_month_granular(spark, tmp_path):
    base = str(tmp_path / "tiers")
    df = _tier(spark).withColumn(
        "p_month", F.date_format("bucket_start", "yyyy-MM")
    )
    df.write.partitionBy("p_month").mode("overwrite").parquet(f"{base}/daily")
    # keep 30 days ending 2024-04-09 -> cutoff 2024-03-10: January and
    # February fully age out; March contains the cutoff -> kept
    deleted = expire_partitions(base, "daily", "2024-04-09T00:00:00", "30 days")
    assert deleted == ["p_month=2024-01", "p_month=2024-02"]
    left = sorted(
        n for n in os.listdir(f"{base}/daily") if n.startswith("p_month=")
    )
    assert left == ["p_month=2024-03", "p_month=2024-04"]
    # surviving rows are intact and include everything >= cutoff
    back = spark.read.parquet(f"{base}/daily")
    assert back.count() == 31 + 9  # all of March + Apr 1-9
    assert back.where("bucket_start >= '2024-03-10'").count() == 22 + 9
    # idempotent: second pass deletes nothing
    assert expire_partitions(base, "daily", "2024-04-09T00:00:00", "30 days") == []


def test_file_stats_and_compaction_plan(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from rtsa_spark.operators.retention import file_stats, plan_compaction

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", t0 + dt.timedelta(hours=h), h) for h in range(100)
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )
    out = str(tmp_path / "frag")
    # fragment into 10 files of 10 rows
    df.repartition(10).write.mode("overwrite").parquet(out)
    tier = spark.read.parquet(out)
    st = file_stats(tier)
    stats = st.collect()
    # AQE may coalesce the shuffle: file count/sizes vary, totals don't
    assert len(stats) >= 2
    assert sum(r["n_rows"] for r in stats) == 100
    assert all(r["bucket_min"] <= r["bucket_max"] for r in stats)
    max_file = max(r["n_rows"] for r in stats)

    plan = plan_compaction(st, target_rows=max_file + 1).collect()
    # every file is sub-target; groups bounded by 2*target + one file
    assert len(plan) == len(stats)
    from collections import defaultdict

    totals = defaultdict(int)
    for r in plan:
        totals[r["group"]] += r["n_rows"]
    assert all(v <= 2 * (max_file + 1) + max_file for v in totals.values())

    # files already at/above target are never rewritten
    assert plan_compaction(st, target_rows=1).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        plan_compaction(st, 0)
