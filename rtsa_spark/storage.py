"""Bucketed tier tables: the co-location layout for 100 TB tier joins.

Every tier, mask, and analytics table in this engine is keyed by
``source`` — the mask semi-joins (operators/masks.py), the tier-match
audit, the phase-band broadcast-back, and every per-source aggregation
shuffle on it.  At production scale those shuffles dominate: a daily tier
of 10^12 raw rows re-hashed for every downstream join is the single
largest avoidable cost in the pipeline.

``write_bucketed`` persists a tier as a Spark **bucketed table**
(``bucketBy(n, "source")`` + per-file ``sortBy``): the hash-partitioning
is baked into the file layout once at write time, so every later
source-keyed join between two co-bucketed tiers and every
``groupBy("source")`` aggregation reads the layout instead of
shuffling — Catalyst plans a SortMergeJoin / HashAggregate with **no
Exchange** on the bucketed side(s).  This is the parquet-native analog of
the reference's single-machine locality (the whole rts brick lives in
one R process, ``/root/reference/R/rtsa.stl.R:441-489``): here the
locality is per-bucket, and 1000 executors each own buckets instead of
one process owning everything.

Operational contract:

- **Same bucket count across tiers that join.** Spark avoids the shuffle
  when both sides agree (or one is a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).  Pick the
  count once per deployment (default 64; at 100 TB size it so one
  bucket of the RAW tier fits an executor — e.g. 4096) and pass the
  same value everywhere; ``read_bucketed`` exposes the table's count so
  callers can assert agreement.
- Bucketed writes require the table catalog (``saveAsTable``); plain
  ``.parquet(path)`` cannot carry bucket metadata.  The in-memory /
  Derby catalog in local mode and any Hive/Glue/Unity catalog in
  production both work; pass ``path=...`` to keep the data external.
- ``sortBy`` the time column: per-file ordering turns the downstream
  SortMergeJoin sort and every window-over-(source, time) into a cheap
  near-sorted pass, and parquet min/max row-group pruning on time
  ranges gets tight for free.

Verification: tests/test_storage.py writes two co-bucketed tiers and
asserts (a) read-back content equality, (b) the source-keyed join plan
contains no shuffle Exchange, (c) ``groupBy(source)`` aggregation plans
with no Exchange; tools/explain_audit.py carries the same no-Exchange
assertion as audit #16.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "bucket_spec", "cluster_for_publish"]

DEFAULT_BUCKETS = 64


def cluster_for_publish(
    df: DataFrame, order_cols: tuple[str, ...], month_col: str = "p_month"
) -> DataFrame:
    """Range-cluster + sort rows ahead of a month-partitioned write —
    the parquet-dir emulation of Iceberg's ``write.distribution-mode =
    range`` + sort order.  Two effects that only matter once the table is
    big, which is exactly when they dominate:

    - **file-count control**: an unclustered write sprays every shuffle
      partition into every month dir (``shuffle_partitions × months``
      files per stage — the small-files explosion that kills a 100 TB
      table's planning time).  Range partitioning on ``(month, *order)``
      makes the month runs contiguous, so each write task lands in one
      (boundary tasks: two) month dirs: total files ≈ shuffle partitions,
      not the product.  Skew-safe where ``repartition(month_col)`` is
      not — a dominant month simply spans several range partitions.
    - **row-group stats**: ``sortWithinPartitions`` gives every parquet
      row group a tight ``(source, bucket_start)`` min/max envelope, so
      time-range and per-source reads prune row groups instead of
      scanning the month (the block-pruned ``read_points`` and every
      mask semi-join read benefit immediately).

    Costs one extra range exchange per PUBLISH (never on the query path);
    that is the trade every table format makes for sorted data files.
    Columns absent from ``df`` are skipped, so one helper serves the
    rollup (``bucket_start``), encoded (``block_day``) and histogram
    stages alike.
    """
    cols = [month_col] + [c for c in order_cols if c in df.columns]
    return df.repartitionByRange(*[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )



def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = DEFAULT_BUCKETS,
    bucket_col: str = "source",
    sort_col: str | None = "bucket_start",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally external) table.

    ``n_buckets`` must match across every table this one will join
    bucket-to-bucket; see the module docstring for sizing guidance.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (the bucket layout rides along in the
    catalog metadata — a plain ``spark.table`` keeps it)."""
    return spark.table(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """Return ``(n_buckets, bucket_columns)`` for a catalog table, so
    pipelines can assert co-bucketing before relying on shuffle-free
    joins (0, [] when the table is not bucketed)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    n, cols = 0, []
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [
                c.strip().strip("`")
                for c in r["data_type"].strip("[]").split(",")
                if c.strip()
            ]
    return n, cols
