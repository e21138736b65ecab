"""Incremental sketch maintenance on the live ingest path: a
foreachBatch loop that keeps a per-(key, bucket) count-min state table
current as microbatches arrive, exploiting the cascade's EXACT merge
(``operators/sketch.cm_merge_buckets`` — cell-wise BIGINT sum) so the
state after any prefix of the stream equals the sketch built directly
from that prefix (pytest- and oracle-pinned parity).

Why foreachBatch and not a windowed stateful aggregate: the sketch is a
bucket-keyed ARRAY column merged by an algebraic identity — exactly the
shape of the batch pipeline's tier maintenance — so the streaming skin
reuses the batch operators verbatim per microbatch and owns only (a)
which bucket partitions a batch touches and (b) replay safety.

Scale shape per microbatch:
- the batch collapses to (keys, bucket, item) counts and then to
  bounded ``d*w``-cell sketches (``cm_bucket_sketch`` — map-side
  combined, vocabulary-bounded);
- only the TOUCHED bucket partitions of the state table are read back
  and rewritten (dynamic partition overwrite on ``p_bucket`` — the
  pipeline's month-refresh move); untouched history is never scanned;
- a batch-id ledger (jsonl, the pipeline's lineage pattern) makes the
  merge idempotent under foreachBatch's at-least-once replay: a replayed
  batch id is skipped, so the non-idempotent cell-sum is applied exactly
  once.

State table schema: ``(keys..., bucket, cm array<bigint>, n_items,
p_bucket)`` — ``p_bucket`` is the partition directory key (stringified
bucket), the rest is ``cm_bucket_sketch`` output.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rtsa_spark.operators.sketch import cm_bucket_sketch, cm_merge_buckets

__all__ = ["cm_state_update", "streaming_cm_state", "read_cm_state"]


def _ledger_path(state_path: str) -> str:
    return os.path.join(state_path, "_sketch_ledger.jsonl")


def _applied_batches(state_path: str) -> set[int]:
    p = _ledger_path(state_path)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return {json.loads(line)["batch_id"] for line in f if line.strip()}


def cm_state_update(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    d_rows: int = 4,
    w_cols: int = 256,
) -> bool:
    """Apply one microbatch to the count-min state table; returns True
    if applied, False if ``batch_id`` was already in the ledger (replay
    after a failure — skipped, keeping the cell-sum exactly-once).

    Callable directly for backfills/tests; :func:`streaming_cm_state`
    wires it as the stream's foreachBatch.
    """
    if batch_id in _applied_batches(state_path):
        return False
    delta = cm_bucket_sketch(
        batch_df, key_cols, bucket_col, item_col, d_rows=d_rows, w_cols=w_cols
    ).withColumn("p_bucket", F.col("bucket").cast("string"))
    data_path = os.path.join(state_path, "data")
    have_state = os.path.exists(data_path)
    if have_state:
        touched = [
            r[0] for r in delta.select("p_bucket").distinct().collect()
        ]
        old = (
            spark.read.parquet(data_path)
            .where(F.col("p_bucket").isin(touched))
            .drop("p_bucket")
        )
        merged = cm_merge_buckets(
            old.unionByName(delta.drop("p_bucket")),
            key_cols,
            F.col("bucket"),
            w_cols=w_cols,
        ).withColumn("p_bucket", F.col("bucket").cast("string"))
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p_bucket")
            .parquet(data_path)
        )
    else:
        delta.write.mode("overwrite").partitionBy("p_bucket").parquet(
            data_path
        )
    os.makedirs(state_path, exist_ok=True)
    with open(_ledger_path(state_path), "a") as f:
        f.write(json.dumps({"batch_id": int(batch_id)}) + "\n")
    return True


def streaming_cm_state(
    stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    d_rows: int = 4,
    w_cols: int = 256,
    available_now: bool = True,
):
    """Drive a stream into the count-min state table via foreachBatch.
    ``available_now=True`` drains the backlog then stops (test/backfill
    mode); False runs continuously."""
    spark = stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cm_state_update(
            spark, batch_df, batch_id, state_path, key_cols,
            bucket_col, item_col, d_rows=d_rows, w_cols=w_cols,
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cm_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Current state table (without the partition key column)."""
    return spark.read.parquet(os.path.join(state_path, "data")).drop(
        "p_bucket"
    )
