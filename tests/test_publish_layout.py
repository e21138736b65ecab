"""Publish layout: range-clustered + sorted tier files.

The pipeline's writes emulate Iceberg's ``write.distribution-mode=range``
+ sort order (rtsa_spark/storage.py::cluster_for_publish): without it, a
month-partitioned write sprays every shuffle partition into every month
dir (shuffle_partitions x months files) and parquet row groups carry
useless (source, bucket_start) min/max stats. These tests pin both
effects at tiny scale: file counts bounded by partitions + months (not
their product), and every data file internally sorted so row-group
pruning stays tight at 100 TB.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from rtsa_spark.pipeline import TierPipeline


def _parquet_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return out


def _assert_sorted_files(files, keys):
    import pyarrow.parquet as pq

    assert files
    for path in files:
        t = pq.read_table(path, columns=keys).to_pandas()
        if len(t) < 2:
            continue
        ordered = t.sort_values(keys, kind="mergesort").reset_index(drop=True)
        assert t.reset_index(drop=True).equals(ordered), (
            f"rows not sorted by {keys} in {path}"
        )


def test_publish_is_clustered_and_sorted(spark, tiny_sequences, tmp_path):
    """run(): every tier data file is sorted by (source, bucket_start) and
    the file count is bounded by shuffle_partitions + months, not their
    product (the unclustered spray)."""
    base = str(tmp_path / "layout")
    p = TierPipeline(spark, base, gapfill_tiers=(), metrics_tiers=())
    p.run(tiny_sequences)

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    months = (
        tiny_sequences.select(
            F.date_format("ts", "yyyy-MM").alias("m")
        )
        .distinct()
        .count()
    )
    for tier in ("raw", "hourly", "daily"):
        files = _parquet_files(f"{base}/rollup_{tier}")
        assert len(files) <= n_shuffle + months, (
            tier,
            len(files),
            n_shuffle,
            months,
        )
        _assert_sorted_files(files, ["source", "bucket_start"])


def test_refresh_writes_clustered_partitions(spark, tiny_sequences, tmp_path):
    """refresh_months(): the rewritten month's files are also sorted (the
    dynamic-overwrite path must not regress to the unclustered layout)."""
    base = str(tmp_path / "layout_r")
    p = TierPipeline(spark, base, gapfill_tiers=(), metrics_tiers=())
    p.run(tiny_sequences)

    feb = F.date_format(F.col("ts"), "yyyy-MM") == "2024-02"
    corrected = tiny_sequences.withColumn(
        "n_tok", F.when(feb, F.col("n_tok") * 2).otherwise(F.col("n_tok"))
    )
    p.refresh_months(corrected, ["2024-02"])
    files = _parquet_files(f"{base}/rollup_hourly/p_month=2024-02")
    _assert_sorted_files(files, ["source", "bucket_start"])


def test_snapshot_publish_is_sorted(spark, tiny_sequences, tmp_path):
    """Snapshot-store versions carry the same sorted layout."""
    base = str(tmp_path / "layout_s")
    p = TierPipeline(
        spark,
        base,
        gapfill_tiers=(),
        metrics_tiers=(),
        snapshot_tiers=("hourly",),
    )
    p.run(tiny_sequences)
    files = _parquet_files(f"{base}/rollup_hourly")
    _assert_sorted_files(files, ["source", "bucket_start"])
