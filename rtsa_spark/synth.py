"""Deterministic synthesizer for the north-rule input table.

Produces ``sequences(doc_id string, tokens array<int>, n_tok int,
source string, ts timestamp)`` — the schema of BASELINE.json ``input_hint``
(``ts`` is derived: the hint has no time column, so event time comes from
``xxhash64(doc_id)``, documented in FIXTURES.md F1).

Everything is computed with built-in JVM-side functions over ``spark.range``:
no driver-side loops, no Python in the row path, no wall-clock — the same
``(seed, n_rows)`` always yields byte-identical data at any parallelism, so
goldens and the local[8]-vs-local[32] scaling runs share one input.

Mirrors the reference's fixture recipe (pacificSST monthly raster, zeros->NA,
random 50%% knockout — ``/root/reference/R/rtsa_gapfill.R:42-77``) re-expressed
as a sequence table: Zipf-ish source skew stands in for the spatial grid, the
seeded (source, bucket) knockout stands in for the NA'd layers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EPOCH = "2024-01-01 00:00:00"
HORIZON_MINUTES = 120 * 24 * 60  # 120 days -> >=4 monthly buckets
VOCAB = 32768
MAX_TOKENS_DEFAULT = 512
DOMINANT_SHARE_PCT = 30  # one source absorbs ~30% of rows (skew exercise)


def synth_sequences(
    spark: SparkSession,
    n_rows: int,
    n_sources: int = 32,
    seed: int = 42,
    max_tokens: int = MAX_TOKENS_DEFAULT,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic sequences table; safe to regenerate anywhere."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism * 4, 8)
    df = spark.range(0, n_rows, 1, partitions)
    doc_id = F.format_string("d%012d", F.col("id"))
    h = F.xxhash64(doc_id, F.lit(seed))
    # log-uniform length in [1, max_tokens]
    u_len = (F.pmod(F.xxhash64(doc_id, F.lit(seed + 1)), F.lit(1_000_000)) / 1_000_000.0)
    n_tok = F.least(
        F.lit(max_tokens),
        F.greatest(F.lit(1), F.pow(F.lit(float(max_tokens)), u_len).cast("int")),
    ).cast("int")
    # Zipf-ish skew: DOMINANT_SHARE_PCT% of rows land on s000, rest uniform.
    u_src = F.pmod(F.xxhash64(doc_id, F.lit(seed + 2)), F.lit(100))
    if n_sources <= 1:
        src_idx = F.lit(0)
    else:
        src_idx = F.when(u_src < DOMINANT_SHARE_PCT, F.lit(0)).otherwise(
            1 + F.pmod(F.xxhash64(doc_id, F.lit(seed + 3)), F.lit(n_sources - 1))
        )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH).cast("timestamp"))
        + F.pmod(h, F.lit(HORIZON_MINUTES)) * 60
    )
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.pmod(F.xxhash64(doc_id, i, F.lit(seed + 4)), F.lit(VOCAB)).cast("int"),
    )
    return df.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        F.format_string("s%03d", src_idx).alias("source"),
        ts.alias("ts"),
    )


def knock_out_buckets(
    df: DataFrame,
    gappy_sources: list[str],
    frac_pct: int = 50,
    bucket: str = "hour",
    seed: int = 7,
) -> DataFrame:
    """Seeded knockout of ~``frac_pct``% of (source, bucket) pairs for the
    designated gappy sources — the sequence-table analog of the reference's
    ``frac_gaps <- 0.5`` cell knockout (``R/rtsa_gapfill.R:56-62``).

    Deterministic: the kill decision hashes (source, bucket_start, seed) so it
    is row-order- and partitioning-independent.
    """
    b = F.date_trunc(bucket, F.col("ts"))
    killed = (
        F.col("source").isin(gappy_sources)
        & (F.pmod(F.xxhash64(F.col("source"), b.cast("string"), F.lit(seed)), F.lit(100)) < frac_pct)
    )
    return df.where(~killed)
