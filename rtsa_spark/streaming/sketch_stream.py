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

__all__ = [
    "cm_state_update",
    "streaming_cm_state",
    "read_cm_state",
    "bloom_dedup_update",
    "streaming_bloom_dedup",
]


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


def bloom_dedup_update(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    out_path: str,
    content_col: str = "text",
    order_cols: list[str] | None = None,
    m_bits: int = 1 << 16,
    k_hash: int = 3,
) -> int:
    """Apply one microbatch of UNBOUNDED-HISTORY streaming exact dedup;
    returns the number of rows kept (-1 if ``batch_id`` replayed).

    The watermark-bounded ``streaming_dedup`` forgets hashes older than
    its horizon; this one never forgets, at sketch cost: the state is a
    single Bloom filter over every fingerprint ever admitted plus an
    append-only fingerprint store.  Per batch:

    1. first occurrence per fingerprint WITHIN the batch wins
       (deterministic ``order_cols`` rank);
    2. fingerprints whose Bloom probe says "never seen" are admitted
       WITHOUT touching the store — the no-false-negative guarantee
       makes the skip safe, and at a healthy width that is almost every
       novel fingerprint;
    3. only the "maybe seen" minority pays the exact verify join
       against the fingerprint store (candidates broadcast, store never
       shuffled);
    4. admitted rows append to ``out_path``, their fingerprints to the
       store, and their bits OR into the filter (exact bit_or merge).

    A growing corpus raises the filter's false-positive rate — more
    verify work, never a wrong result; size ``m_bits`` for the expected
    corpus (~10 bits/fingerprint for ~1% FP at k=3).

    Replay safety is STRUCTURAL, not just ledger-gated: output and
    fingerprints land in per-batch ``batch=<id>`` subdirectories written
    with overwrite (a replay rewrites the same directory), the verify
    join reads every fingerprint directory EXCEPT the current batch's
    (so a partially-written replay cannot judge its own rows as dups and
    emit nothing), and the filter merge is bit_or (re-applying the same
    bits is a no-op).  The jsonl ledger is the fast-path skip and the
    metrics record; correctness survives a crash at any point.
    Downstream readers of ``out_path`` see a ``batch`` partition column.
    """
    if batch_id in _applied_batches(state_path):
        return -1
    order_cols = order_cols or ["ts", "doc_id"]
    from pyspark.sql import Window

    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_maybe_contains,
        bloom_merge_buckets,
    )

    fp = F.md5(F.col(content_col).cast("string"))
    w = Window.partitionBy("_fp").orderBy(*order_cols)
    batch = (
        batch_df.withColumn("_fp", fp)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    bloom_path = os.path.join(state_path, "bloom")
    fps_path = os.path.join(state_path, "fps")
    prior_fp_dirs = (
        [
            os.path.join(fps_path, d)
            for d in sorted(os.listdir(fps_path))
            if d.startswith("batch=") and d != f"batch={int(batch_id)}"
        ]
        if os.path.exists(fps_path)
        else []
    )
    if os.path.exists(bloom_path) and prior_fp_dirs:
        state = spark.read.parquet(bloom_path)
        probed = bloom_maybe_contains(
            state,
            batch.select(F.col("_fp").alias("item")).distinct(),
            m_bits=m_bits,
            k_hash=k_hash,
        ).select(F.col("item").alias("_fp"), "maybe")
        cand = probed.where("maybe").select("_fp")
        dup = (
            spark.read.parquet(*prior_fp_dirs)
            .join(F.broadcast(cand), F.col("fp") == F.col("_fp"), "left_semi")
            .select(F.col("fp").alias("_fp"))
            .distinct()
        )
        keep = batch.join(dup, "_fp", "left_anti")
    else:
        keep = batch
    kept = keep.persist()
    n_kept = kept.count()
    if n_kept:
        kept.drop("_fp").write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={int(batch_id)}")
        )
        kept.select(F.col("_fp").alias("fp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(fps_path, f"batch={int(batch_id)}"))
        delta = bloom_bucket_sketch(
            kept.select(F.col("_fp").alias("item")).withColumn(
                "b", F.lit("all")
            ),
            [],
            "b",
            "item",
            m_bits=m_bits,
            k_hash=k_hash,
        )
        if os.path.exists(bloom_path):
            merged = bloom_merge_buckets(
                spark.read.parquet(bloom_path).unionByName(
                    delta, allowMissingColumns=True
                ),
                [],
                F.lit("all"),
            )
        else:
            merged = delta.drop("n_distinct")
        # the filter is one bounded row — rewrite via a stable temp swap
        tmp = bloom_path + "._tmp_swap"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(bloom_path)
    kept.unpersist()
    os.makedirs(state_path, exist_ok=True)
    with open(_ledger_path(state_path), "a") as f:
        f.write(json.dumps({"batch_id": int(batch_id), "kept": n_kept}) + "\n")
    return n_kept


def streaming_bloom_dedup(
    stream: DataFrame,
    state_path: str,
    out_path: str,
    checkpoint_path: str,
    content_col: str = "text",
    order_cols: list[str] | None = None,
    m_bits: int = 1 << 16,
    k_hash: int = 3,
    available_now: bool = True,
):
    """Drive a stream through :func:`bloom_dedup_update` (foreachBatch).
    Kept rows land in ``out_path``; state (filter + fingerprint store +
    ledger) lives under ``state_path``."""
    spark = stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        bloom_dedup_update(
            spark, batch_df, batch_id, state_path, out_path,
            content_col=content_col, order_cols=order_cols,
            m_bits=m_bits, k_hash=k_hash,
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
