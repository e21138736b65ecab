"""Deterministic sampling / splitting / packing for training-data pipelines.

The reference engine rolls data up; an LLM-scale pipeline additionally has
to SELECT and SHARD it. Three primitives, all pure Catalyst projections or
single-window ops (no UDFs, no driver state), all reproducible run-to-run
and engine-to-engine because the randomness is a salted cryptographic hash
of the row key — the property a 100 TB pipeline needs so reruns, backfills
and multi-engine audits agree row-for-row:

- :func:`hash_bucket` / :func:`hash_split`: stable train/val/test
  assignment. Scan-speed, shuffle-free; the split of a 100 TB corpus is
  one projection.
- :func:`hash_sample`: stratified deterministic subsampling at an exact
  e4 rate per row key (Bernoulli-by-hash, the standard web-corpus
  downsampling move).
- :func:`token_budget_pack`: GPT-style sequence packing — documents are
  concatenated in a deterministic per-key order and chunked into
  fixed-token-budget shards; emits each doc's shard id + offset. One
  shuffle (window over the pack key); at production scale the pack key
  (dump/shard-group) bounds partition size, so the sort stays in-memory
  per partition.

Oracle portability: the hash is the 48-bit integer prefix of md5, which
DuckDB replays as ``('0x' || substr(md5(x), 1, 12))::BIGINT`` — proven
version-stable (unlike blob/encode parsing). Spark computes the identical
value via ``conv(substring(md5(x), 1, 12), 16, 10)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

#: modulus for hash buckets: 10^4 buckets = exact e4 rates, far below the
#: 2^48 hash range so the bucket distribution is uniform to ~3.6e-11
BUCKETS = 10_000


def hash_bucket(key_col, salt: str):
    """Deterministic bucket in [0, BUCKETS) from the salted md5 of the key.
    Pure Catalyst; identical in DuckDB via the md5-prefix recipe above."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return h % BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (9_800, 100, 100),
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to train/val/test by hash bucket. ``weights`` are
    e4 shares summing to BUCKETS (default 98%/1%/1%). Adding data later
    never moves an existing row between splits (assignment depends only on
    the row's own key + salt) — the invariant that keeps eval sets
    uncontaminated across corpus versions."""
    if sum(weights) != BUCKETS or len(weights) != 3:
        raise ValueError(f"weights must be 3 shares summing to {BUCKETS}")
    b = hash_bucket(id_col, salt)
    split = (
        F.when(b < weights[0], "train")
        .when(b < weights[0] + weights[1], "val")
        .otherwise("test")
    )
    return df.withColumn("bucket", b).withColumn("split", split)


def hash_sample(
    df: DataFrame,
    rate_e4: int,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep rows whose bucket < rate_e4 — a deterministic Bernoulli
    subsample at rate rate_e4/10^4. Stratify by choosing a per-stratum
    rate upstream and filtering on it (the predicate is pushed to the
    scan either way)."""
    if not 0 <= rate_e4 <= BUCKETS:
        raise ValueError(f"rate_e4 must be in [0, {BUCKETS}]")
    return df.where(hash_bucket(id_col, salt) < rate_e4)


def token_budget_pack(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    key_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Pack documents into fixed token-budget training shards, GPT-style:
    within each ``key_col`` group, documents are concatenated in
    ``order_col`` order and the token stream is chunked every ``budget``
    tokens. Emits per doc: the shard its FIRST token lands in and the
    offset within that shard (docs may straddle shard boundaries — that
    is exactly how packed-sequence pretraining batches are built).

    One window (shuffle on key, sort by order) — integer-exact, so the
    DuckDB oracle replays it with the same SUM ... ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING window."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    return df.withColumn("tok_before", cum).select(
        key_col,
        order_col,
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        F.col("tok_before"),
        F.floor(F.col("tok_before") / budget).cast("bigint").alias("shard"),
        (F.col("tok_before") % budget).cast("bigint").alias("shard_offset"),
    )
