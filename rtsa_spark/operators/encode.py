"""Encoded-block table: Gorilla/delta-of-delta compression of per-source
bucket streams — the north rule's hot inner loop as a grouped Arrow kernel.

Layout: one block row per (source, block) holding the DoD-compressed bucket
timestamps and the Gorilla-compressed values of one rollup column, plus
``n_points`` and a CRC of the raw stream. The block granularity defaults to
calendar MONTH (thousands of points per block amortize the kernel's
per-call overhead); pass ``block="day"`` for tighter read pruning or
minute-tier input. Grouping by (source, block) rather than (source) is the
skew defuser: the dominant source's stream splits into per-block Arrow
batches, bounding kernel memory and letting 1000 executors work one source
in parallel. Blocks are self-contained, so the encoded table is
partition-prunable by block on read.

The kernel is ``applyInPandas`` — Arrow batches in, zero per-row Python:
sort + int64 view + the vectorized bit-packers in functions/gorilla.py.

Reference lineage: this plays the role of rtsa's dense in-memory value
matrix (``/root/reference/R/rtsa_methods.R:79-97``) as a *compressed,
distributed* representation instead of an uncompressed driver-side one.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rtsa_spark.functions.gorilla import (
    block_crc,
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

BLOCK_SCHEMA = (
    "source string, block_day timestamp, bucket_lo timestamp, bucket_hi timestamp,"
    " n_points int, ts_dod binary, val_gorilla binary, crc bigint"
)

POINT_SCHEMA = "source string, bucket_start timestamp, value double"


def encode_tier(
    df: DataFrame,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    block: str = "month",
    partitions: int | None = None,
    value_reuse: str = "equal",
) -> DataFrame:
    """Compress one rollup column into per-(source, block) encoded rows.

    ``block`` picks the group granularity: month by default so blocks hold
    thousands of points and the vectorized kernels amortize their per-call
    overhead; drop to "day" when a single (source, day) already holds
    enough points (minute-tier input) or tighter read pruning matters.

    ``value_reuse``: Gorilla window-reuse rule — ``"equal"`` (default,
    stateless vectorized) or ``"containment"`` (paper-exact); both decode
    with the same reader (see functions/gorilla.py module docstring).
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ts = pdf[bucket_col].to_numpy("datetime64[ns]").view("int64")
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        vals = pdf[value_col].to_numpy("float64")[order]
        return pd.DataFrame(
            {
                "source": [pdf[key_col].iloc[0]],
                "block_day": [pdf["_block"].iloc[0]],
                "bucket_lo": [pd.Timestamp(ts[0])],
                "bucket_hi": [pd.Timestamp(ts[-1])],
                "n_points": [len(ts)],
                "ts_dod": [dod_encode(ts)],
                "val_gorilla": [gorilla_encode(vals, reuse=value_reuse)],
                "crc": [block_crc(ts, vals)],
            }
        )

    with_block = df.withColumn("_block", F.date_trunc(block, F.col(bucket_col)))
    if partitions:
        # pre-partition on the exact group keys: the groupBy reuses this
        # exchange (no second shuffle) and the kernel fans out over
        # ``partitions`` python workers instead of spark.sql.shuffle.partitions
        # — worker startup is the dominant cost when blocks are small
        with_block = with_block.repartition(partitions, F.col(key_col), F.col("_block"))
    return with_block.groupBy(key_col, "_block").applyInPandas(kernel, BLOCK_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Explode encoded blocks back into (source, bucket_start, value) points.

    ``mapInPandas`` — streams Arrow batches, never materializes a partition.
    CRC is re-verified on every block; a corrupt block raises rather than
    silently yielding wrong points.
    """

    def it(batches):
        import numpy as np

        for pdf in batches:
            out_ts, out_val = [], []
            # per-BLOCK loop (inherent: one bitstream per block); everything
            # per-POINT is numpy — sources repeat via np.repeat, timestamps
            # and values concat once (no Python object per decoded point)
            for ts_dod, val_g, n_pts, crc, src, day in zip(
                pdf["ts_dod"], pdf["val_gorilla"], pdf["n_points"],
                pdf["crc"], pdf["source"], pdf["block_day"],
            ):
                ts = dod_decode(ts_dod, n_pts)
                vals = gorilla_decode(val_g, n_pts)
                if block_crc(ts, vals) != crc:
                    raise ValueError(
                        f"CRC mismatch decoding block source={src} day={day}"
                    )
                out_ts.append(ts)
                out_val.append(vals)
            if out_ts:
                yield pd.DataFrame(
                    {
                        "source": np.repeat(
                            pdf["source"].to_numpy(),
                            pdf["n_points"].to_numpy("int64"),
                        ),
                        "bucket_start": pd.to_datetime(
                            np.concatenate(out_ts).view("datetime64[ns]")
                        ),
                        "value": np.concatenate(out_val),
                    }
                )

    return blocks.mapInPandas(it, POINT_SCHEMA)


def read_points(
    blocks: DataFrame,
    start=None,
    end=None,
    sources=None,
) -> DataFrame:
    """Pruned point read over the encoded-block table: decode only the
    blocks whose ``[bucket_lo, bucket_hi]`` envelope intersects the
    half-open time range ``[start, end)`` (and, optionally, only the
    requested ``sources``).

    The envelope predicate is a plain Catalyst filter on the block
    manifest columns, so when ``blocks`` comes straight off parquet it is
    pushed into the scan (row-group min/max stats skip whole blocks
    without ever reading the bitstreams) — the TSDB chunk-pruning read
    path, at block granularity. Surviving edge blocks that only partially
    overlap are trimmed by a point-level filter after decode.

    ``start`` / ``end`` accept datetimes or ISO strings; either side may
    be None (unbounded). An empty or inverted range is valid and returns
    zero rows.
    """
    pruned = blocks
    if sources is not None:
        pruned = pruned.where(F.col("source").isin(list(sources)))
    if start is not None:
        pruned = pruned.where(
            F.col("bucket_hi") >= F.lit(start).cast("timestamp")
        )
    if end is not None:
        pruned = pruned.where(F.col("bucket_lo") < F.lit(end).cast("timestamp"))
    pts = decode_blocks(pruned)
    if start is not None:
        pts = pts.where(F.col("bucket_start") >= F.lit(start).cast("timestamp"))
    if end is not None:
        pts = pts.where(F.col("bucket_start") < F.lit(end).cast("timestamp"))
    return pts
