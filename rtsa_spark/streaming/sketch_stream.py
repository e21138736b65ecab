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
- the delta lands in its own ``deltas/batch=<id>`` directory and becomes
  visible only through a single-file ATOMIC manifest commit that also
  records the batch id — the LSM move: replay overwrites the same
  directory, orphans from crashes are invisible to readers, and there
  is no window in which the non-idempotent cell-sum applies twice;
- past ``compact_after`` live directories they fold into one base (the
  exact cell-sum cascade) under a manifest swap, bounding merge-on-read.

State schema per directory: ``(keys..., bucket, cm array<bigint>,
n_items)`` — ``cm_bucket_sketch`` output; ``read_cm_state`` returns the
exact merge of the live directories.
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


def _manifest_path(state_path: str) -> str:
    return os.path.join(state_path, "MANIFEST.json")


def _read_manifest(state_path: str) -> dict:
    p = _manifest_path(state_path)
    if not os.path.exists(p):
        return {"dirs": [], "applied": []}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(state_path: str, manifest: dict) -> None:
    """Single-file atomic commit (os.replace): readers see either the
    old or the new manifest, never a torn one."""
    tmp = _manifest_path(state_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(state_path))


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
    compact_after: int = 16,
) -> bool:
    """Apply one microbatch to the count-min state; returns True if
    applied, False if ``batch_id`` was already committed (replay).

    Exactly-once is STRUCTURAL (the LSM/manifest move, not a ledger
    race): each batch's delta sketch lands in its own
    ``deltas/batch=<id>`` directory (a replay overwrites the same
    directory — idempotent), and the directory only becomes visible via
    a single-file atomic manifest commit that also records the batch
    id.  A crash after the delta write but before the commit leaves an
    orphan directory that readers ignore and the replay rewrites; a
    crash during the write leaves a partial orphan, same story.  There
    is no window in which the cell-sum can be applied twice.

    Once more than ``compact_after`` directories are live, they merge
    into one ``base=<id>`` directory (the exact cell-sum cascade) and
    the manifest atomically swaps to it — read cost stays bounded, and
    a compaction crash at any point leaves the old manifest intact
    (orphan base directory ignored, cleaned next compaction).

    Callable directly for backfills/tests; :func:`streaming_cm_state`
    wires it as the stream's foreachBatch.
    """
    os.makedirs(state_path, exist_ok=True)
    manifest = _read_manifest(state_path)
    if int(batch_id) in manifest["applied"]:
        return False
    delta = cm_bucket_sketch(
        batch_df, key_cols, bucket_col, item_col, d_rows=d_rows, w_cols=w_cols
    )
    delta_dir = os.path.join("deltas", f"batch={int(batch_id)}")
    delta.write.mode("overwrite").parquet(
        os.path.join(state_path, delta_dir)
    )
    manifest = {
        "dirs": manifest["dirs"] + [delta_dir],
        "applied": manifest["applied"] + [int(batch_id)],
    }
    _commit_manifest(state_path, manifest)
    with open(_ledger_path(state_path), "a") as f:
        f.write(json.dumps({"batch_id": int(batch_id)}) + "\n")
    if len(manifest["dirs"]) > compact_after:
        base_dir = os.path.join("bases", f"base={int(batch_id)}")
        read_cm_state(spark, state_path).write.mode("overwrite").parquet(
            os.path.join(state_path, base_dir)
        )
        _commit_manifest(
            state_path,
            {"dirs": [base_dir], "applied": manifest["applied"]},
        )
        import shutil

        for d in manifest["dirs"]:  # now-orphaned inputs, best effort
            shutil.rmtree(os.path.join(state_path, d), ignore_errors=True)
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
    """Current state: the exact cell-sum merge of every manifest-live
    directory (bounded by ``compact_after``, so merge-on-read stays
    cheap).  Orphan directories from crashed writes are invisible —
    only the manifest decides what exists."""
    manifest = _read_manifest(state_path)
    if not manifest["dirs"]:
        raise FileNotFoundError(
            f"no committed sketch state under {state_path}"
        )
    parts = spark.read.parquet(
        *[os.path.join(state_path, d) for d in manifest["dirs"]]
    )
    key_cols = [
        c for c in parts.columns if c not in ("bucket", "cm", "n_items")
    ]
    return cm_merge_buckets(parts, key_cols, F.col("bucket"))


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
    bits is a no-op).  The filter itself is a CACHE of the fingerprint
    store: if its directory is missing or torn (a crash during the
    filter rewrite), it is rebuilt from the store before probing — so
    dedup never silently degrades to pass-through.  The jsonl ledger is
    the fast-path skip and the metrics record; correctness survives a
    crash at any point.  Downstream readers of ``out_path`` see a
    ``batch`` partition column.
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
    prev_filter = None
    if prior_fp_dirs:
        store = spark.read.parquet(*prior_fp_dirs)
        try:
            if not os.path.exists(bloom_path):
                raise FileNotFoundError(bloom_path)
            prev_filter = spark.read.parquet(bloom_path)
            prev_filter.head(1)  # force a read: a torn dir fails HERE
        except Exception:
            # filter missing/torn (crash during its rewrite): rebuild
            # the cache from the store of record before probing
            prev_filter = bloom_bucket_sketch(
                store.select(F.col("fp").alias("item")).withColumn(
                    "b", F.lit("all")
                ),
                [],
                "b",
                "item",
                m_bits=m_bits,
                k_hash=k_hash,
            )
        probed = bloom_maybe_contains(
            prev_filter,
            batch.select(F.col("_fp").alias("item")).distinct(),
            m_bits=m_bits,
            k_hash=k_hash,
        ).select(F.col("item").alias("_fp"), "maybe")
        cand = probed.where("maybe").select("_fp")
        dup = (
            store.join(
                F.broadcast(cand), F.col("fp") == F.col("_fp"), "left_semi"
            )
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
        if prev_filter is not None:
            merged = bloom_merge_buckets(
                prev_filter.unionByName(delta, allowMissingColumns=True),
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
