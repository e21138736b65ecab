"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to a metadata struct;
decode/resize/frame-sample are Arrow-batched ``mapInPandas`` stages. The
decode step itself is STUBBED (no imaging/audio libraries in this
container — it raises NotImplementedError unless ``fake=True`` substitutes
a deterministic synthetic decoder), but everything Spark-side is real and
tested: schema, partition sizing, UDF signatures, batch shapes, and the
metadata fast paths that never touch the payload.

Scale design: payload columns are huge, so (a) metadata-only operations
must never deserialize payloads — they are separate columns and Parquet
column pruning skips the bytes entirely; (b) the decode stage bounds Arrow
batch memory via spark.sql.execution.arrow.maxRecordsPerBatch (session.py)
— batch_bytes ~ records * avg_payload; (c) decoded features are small
fixed-width vectors, so the expensive stage shrinks data, never grows it.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary,"
    " width int, height int, n_frames int, sample_rate int, codec string"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"

FEATURE_DIM = 16


def synth_media(spark, n_rows: int, seed: int = 42, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (binary payload from xxhash64 bytes)."""
    df = spark.range(n_rows)
    mid = F.format_string("m%08d", F.col("id"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(mid, F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    # payload: concatenated hex of per-chunk hashes (16 hex chars = 8 bytes
    # each), cast to binary
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(payload_bytes // 8 - 1)),
        lambda i: F.lpad(F.hex(F.xxhash64(mid, i, F.lit(seed + 1))), 16, "0"),
    )
    payload = F.to_binary(F.array_join(chunks, ""), F.lit("hex"))
    return df.select(
        mid.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (64 + F.pmod(F.xxhash64(mid, F.lit(seed + 2)), F.lit(448))).cast("int").alias("width"),
        (64 + F.pmod(F.xxhash64(mid, F.lit(seed + 3)), F.lit(448))).cast("int").alias("height"),
        (1 + F.pmod(F.xxhash64(mid, F.lit(seed + 4)), F.lit(300))).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
        F.lit("synthetic").alias("codec"),
    )


def _decode_stub(payload: bytes, kind: str) -> "object":
    raise NotImplementedError(
        "media decoding requires imaging/audio libraries not present in this"
        " container; run with fake=True for the deterministic synthetic decoder"
    )


def _fake_decode_features(payloads: "pd.Series") -> "object":
    """Deterministic 'decoder': fixed-width feature = per-column byte mean
    of the zero-padded (rows, FEATURE_DIM) reshape of each payload.

    Truly vectorized over the whole batch: one ``frombuffer`` of the
    concatenated payloads + a single ``np.add.at`` scatter-add keyed by
    (row, byte_position % FEATURE_DIM) — no per-row Python loop (CLAUDE.md
    kernel rule), identical output to the per-payload reshape/mean."""
    import numpy as np

    k = FEATURE_DIM
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=len(payloads))
    blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    nb = len(lens)
    sums = np.zeros((nb, k), dtype=np.float64)
    if blob.size:
        row_ids = np.repeat(np.arange(nb), lens)
        pos = np.arange(blob.size) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        np.add.at(sums, (row_ids, pos % k), blob)
    rows = np.maximum((lens + k - 1) // k, 1)
    feats = (sums / (rows[:, None] * 255.0)).astype("float32")
    return list(feats)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract stage over Arrow batches.

    Real pipelines swap ``_fake_decode_features`` for an image/audio decoder
    with the same signature; the Spark plumbing (batching, schema, pruning)
    is identical.
    """

    def it(batches):
        for pdf in batches:
            if not fake:
                _decode_stub(None, None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": _fake_decode_features(pdf["payload"]),
                }
            )

    return media.mapInPandas(it, FEATURE_SCHEMA)


def extract_feature_digests(
    media: DataFrame, id_col: str = "media_id", fake: bool = False
) -> DataFrame:
    """Decode stage projected to integer-exact scalars (oracle-friendly).

    Same Arrow-batched plumbing as :func:`extract_features`, but the output
    is canonicalizable/hashable: ``n_bytes``, ``byte_sum`` (exact int sum of
    payload bytes) and ``feat_digest_e6`` — the integer-exact digest of the
    fake decoder's feature vector. Because the decoder's features are
    column-means of the zero-padded byte matrix divided by 255,
    ``sum(feature) = byte_sum / (255 * ceil(n_bytes/16))`` exactly, so
    ``feat_digest_e6 = (1e6 * byte_sum) // (255 * ceil(n_bytes/16))``
    computed in pure integer arithmetic — reproducible bit-for-bit by any
    ANSI-SQL engine. pytest ties the digest to the float feature path.

    Vectorized: one ``frombuffer`` over the concatenated batch payloads +
    ``np.add.reduceat`` per-row sums — zero per-row Python.
    """
    id_type = dict(media.dtypes)[id_col]
    schema = (
        f"media_id {id_type}, n_bytes bigint, byte_sum bigint, feat_digest_e6 bigint"
    )

    def it(batches):
        import numpy as np

        for pdf in batches:
            if not fake:
                _decode_stub(None, None)
            if len(pdf) == 0:
                continue
            lens = pdf["payload"].map(len).to_numpy("int64")
            blob = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            if blob.size:
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                byte_sum = np.add.reduceat(
                    blob.astype(np.int64), np.clip(offsets, 0, blob.size - 1)
                )
                byte_sum[lens == 0] = 0  # reduceat yields a stray element there
            else:
                byte_sum = np.zeros(len(pdf), dtype=np.int64)
            rows = (lens + FEATURE_DIM - 1) // FEATURE_DIM
            digest = np.where(
                rows > 0, (1_000_000 * byte_sum) // (255 * np.maximum(rows, 1)), 0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "n_bytes": lens,
                    "byte_sum": byte_sum,
                    "feat_digest_e6": digest,
                }
            )

    return media.mapInPandas(it, schema)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never read the payload column
    (Parquet column pruning; assert via .explain / tests)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("n_frames").alias("avg_frames"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling manifest (video): one output row per sampled frame
    index — pure Catalyst (sequence + explode), payload untouched."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Pure-Catalyst resize planning (metadata only, payload never read):
    aspect-preserving integer target dims capped at ``max_side`` on the
    longest side, plus the decimation ``stride`` (ceil(longest/max_side))
    the payload stage samples with. Null/degenerate dims pass through
    unchanged at stride 1. All integer arithmetic — any SQL engine
    replays the plan exactly."""
    if max_side <= 0:
        raise ValueError("max_side must be positive")
    w, h = F.col("width"), F.col("height")
    m = F.greatest(w, h)
    need = m.isNotNull() & (m > max_side)
    return media.withColumns(
        {
            "target_w": F.when(need, F.floor(w * max_side / m))
            .otherwise(w).cast("int"),
            "target_h": F.when(need, F.floor(h * max_side / m))
            .otherwise(h).cast("int"),
            "stride": F.when(
                need, F.floor((m + max_side - 1) / max_side)
            ).otherwise(F.lit(1)).cast("int"),
        }
    )


def resize_media(
    media: DataFrame,
    max_side: int = 224,
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Decode -> resize (decimate by the plan's stride) -> digest, as one
    Arrow-batched ``mapInPandas`` stage over :func:`resize_plan`. The real
    decoder is stubbed (no imaging libs in this container); ``fake=True``
    substitutes the deterministic stand-in used throughout this module —
    payload bytes ARE the utf-8 'pixel' stream, decode = utf-8 ->
    code-point array, resize = every ``stride``-th code point, digest =
    their exact integer sum (``strided_cp_sum``) — so the full
    batching/schema/pruning plumbing runs for real and the output is
    oracle-replayable.

    Kernel is batch-vectorized, zero per-row Python: code-point counts
    come from counting non-continuation bytes per row (reduceat over one
    boolean mask of the concatenated blob), the code-point stream from a
    single utf-32 reinterpretation of the batch-joined decode, and the
    per-row strided sums from one masked bincount."""
    import numpy as np

    planned = resize_plan(media, max_side)
    id_type = dict(media.dtypes)[id_col]
    schema = (
        f"media_id {id_type}, target_w int, target_h int, stride int,"
        " n_cp bigint, strided_cp_sum bigint"
    )

    def it(batches):
        for pdf in batches:
            if not fake:
                _decode_stub(None, None)
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            # code points per row = non-continuation bytes per row
            lens = payloads.map(len).to_numpy("int64")
            is_start = (blob < 0x80) | (blob >= 0xC0)
            offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
            if blob.size:
                n_cp = np.add.reduceat(
                    is_start.astype(np.int64), np.clip(offsets, 0, blob.size - 1)
                )
                n_cp[lens == 0] = 0
            else:
                n_cp = np.zeros(len(pdf), dtype=np.int64)
            # one decode of the joined blob -> one utf-32 view = code points
            cps = np.frombuffer(
                blob.tobytes().decode("utf-8").encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            nb = len(pdf)
            cp_off = np.concatenate(([0], np.cumsum(n_cp)[:-1]))
            row_ids = np.repeat(np.arange(nb), n_cp)
            pos = np.arange(cps.size) - np.repeat(cp_off, n_cp)
            k = np.repeat(pdf["stride"].to_numpy("int64"), n_cp)
            keep = (pos % np.maximum(k, 1)) == 0
            ssum = np.bincount(
                row_ids[keep], weights=cps[keep], minlength=nb
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "target_w": pdf["target_w"].to_numpy(),
                    "target_h": pdf["target_h"].to_numpy(),
                    "stride": pdf["stride"].to_numpy(),
                    "n_cp": n_cp,
                    "strided_cp_sum": ssum,
                }
            )

    return planned.mapInPandas(it, schema)
