from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rtsa_spark.functions.gorilla import (
    block_crc,
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)

rng = np.random.default_rng(7)

TS_CASES = [
    np.array([], dtype=np.int64),
    np.array([5], dtype=np.int64),
    np.arange(0, 10_000, 60, dtype=np.int64),  # perfectly regular
    np.cumsum(rng.integers(1, 10**9, 500)).astype(np.int64),  # irregular gaps
    np.array([0, 1, 1, 1, 2, 100, -50, -50], dtype=np.int64),  # non-monotone
    rng.integers(-(2**62), 2**62, 300).astype(np.int64),  # extreme magnitude
]

VAL_CASES = [
    np.array([]),
    np.array([3.14]),
    np.full(1000, 7.5),  # constant
    np.cumsum(rng.normal(0, 0.1, 1000)) + 100.0,  # slowly varying
    rng.normal(0, 1e10, 500),  # wild
    np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-308, 1.7e308]),
]


@pytest.mark.parametrize("ts", TS_CASES, ids=range(len(TS_CASES)))
def test_dod_roundtrip(ts):
    assert np.array_equal(ts, dod_decode(dod_encode(ts), len(ts)))


@pytest.mark.parametrize("v", VAL_CASES, ids=range(len(VAL_CASES)))
def test_gorilla_roundtrip_bitexact(v):
    got = gorilla_decode(gorilla_encode(v), len(v))
    assert np.array_equal(
        np.asarray(v, dtype=np.float64).view(np.uint64), got.view(np.uint64)
    )


def test_regular_series_compresses_hard():
    ts = np.arange(0, 86400 * 7, 60, dtype=np.int64) * 10**9
    blob = dod_encode(ts)
    assert len(blob) < ts.nbytes / 40  # ~1 bit/point for regular cadence


def test_constant_values_compress_hard():
    v = np.full(10_000, 42.5)
    assert len(gorilla_encode(v)) < v.nbytes / 40


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=200
    )
)
def test_dod_roundtrip_property(xs):
    ts = np.array(xs, dtype=np.int64)
    assert np.array_equal(ts, dod_decode(dod_encode(ts), len(ts)))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=200,
    )
)
def test_gorilla_roundtrip_property(xs):
    v = np.array(xs, dtype=np.float64)
    got = gorilla_decode(gorilla_encode(v), len(v))
    assert np.array_equal(v.view(np.uint64), got.view(np.uint64))


@pytest.mark.parametrize("v", VAL_CASES, ids=range(len(VAL_CASES)))
def test_gorilla_containment_roundtrip_bitexact(v):
    """Paper-exact containment reuse (r5 opt-in): same decoder, bit-exact
    round-trip on every case the equal rule covers."""
    got = gorilla_decode(gorilla_encode(v, reuse="containment"), len(v))
    assert np.array_equal(
        np.asarray(v, dtype=np.float64).view(np.uint64), got.view(np.uint64)
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=200,
    )
)
def test_gorilla_containment_roundtrip_property(xs):
    v = np.array(xs, dtype=np.float64)
    got = gorilla_decode(gorilla_encode(v, reuse="containment"), len(v))
    assert np.array_equal(v.view(np.uint64), got.view(np.uint64))


def test_gorilla_containment_reuses_contained_windows():
    """On a slowly-varying series the containment rule must actually fire
    (reuse runs exist where the equal rule would re-emit) and never
    produce a larger stream than re-emitting every window would."""
    v = np.cumsum(rng.normal(0, 0.1, 5000)) + 100.0
    eq = gorilla_encode(v, reuse="equal")
    cont = gorilla_encode(v, reuse="containment")
    assert gorilla_decode(cont, len(v)).tobytes() == v.tobytes()
    # both beat raw; on this random walk the paper rule saves the 11-bit
    # window headers often enough to beat exact-equality reuse (measured
    # ~6% here — the "few percent" the r4 divergence note promised)
    assert len(cont) < v.nbytes and len(eq) < v.nbytes
    assert len(cont) < len(eq)
    with pytest.raises(ValueError, match="reuse"):
        gorilla_encode(v, reuse="bogus")


def test_crc_detects_corruption():
    ts = np.arange(100, dtype=np.int64)
    v = rng.normal(size=100)
    assert block_crc(ts, v) != block_crc(ts, v + 1e-9)


def test_spark_encode_decode_roundtrip(spark, tiny_sequences):
    from pyspark.sql import functions as F

    from rtsa_spark.operators.encode import decode_blocks, encode_tier
    from rtsa_spark.operators.rollup import rollup_next, rollup_raw

    hourly = rollup_next(rollup_raw(tiny_sequences), "hourly")
    blocks = encode_tier(hourly, value_col="n_tok_mean")
    pts = decode_blocks(blocks)
    orig = hourly.select(
        "source", "bucket_start", F.col("n_tok_mean").alias("value")
    )
    assert pts.count() == orig.count()
    # bit-exact equality via anti-join on all three columns
    assert pts.exceptAll(orig).count() == 0
    # compression actually happened
    agg = blocks.select(
        F.sum(F.octet_length("ts_dod") + F.octet_length("val_gorilla")).alias("enc"),
        F.sum(F.col("n_points") * 16).alias("raw"),
    ).first()
    assert agg["enc"] < agg["raw"]


def test_read_points_pruned_window(spark, tiny_sequences, tmp_path):
    from pyspark.sql import functions as F

    from rtsa_spark.operators.encode import decode_blocks, encode_tier, read_points
    from rtsa_spark.operators.rollup import rollup_next, rollup_raw

    hourly = rollup_next(rollup_raw(tiny_sequences), "hourly")
    path = str(tmp_path / "blocks")
    encode_tier(hourly, value_col="n_tok_mean").write.parquet(path)
    blocks = spark.read.parquet(path)
    t0, t1 = "2024-02-01 00:00:00", "2024-03-01 00:00:00"
    got = read_points(blocks, start=t0, end=t1)
    # equivalence vs decode-everything-then-filter
    want = decode_blocks(blocks).where(
        (F.col("bucket_start") >= F.lit(t0).cast("timestamp"))
        & (F.col("bucket_start") < F.lit(t1).cast("timestamp"))
    )
    n = got.count()
    assert n == want.count() and n > 0
    assert got.exceptAll(want).count() == 0
    # block-level pruning is real: only the overlapping month's blocks
    # survive the envelope filter (monthly blocks over a 4-month horizon)
    surviving = blocks.where(
        (F.col("bucket_hi") >= F.lit(t0).cast("timestamp"))
        & (F.col("bucket_lo") < F.lit(t1).cast("timestamp"))
    ).count()
    assert 0 < surviving < blocks.count()
    # the envelope predicate reaches the parquet scan (row-group min/max
    # stats skip non-overlapping blocks without reading the bitstreams)
    fmt = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in fmt and "bucket_hi" in fmt


def test_read_points_degenerate_ranges(spark, tiny_sequences):
    from rtsa_spark.operators.encode import decode_blocks, encode_tier, read_points
    from rtsa_spark.operators.rollup import rollup_next, rollup_raw

    hourly = rollup_next(rollup_raw(tiny_sequences), "hourly")
    blocks = encode_tier(hourly, value_col="n_tok_mean")
    # inverted / empty window: valid, zero rows, no error
    assert read_points(blocks, start="2025-01-01", end="2024-01-01").count() == 0
    # unbounded on both sides == full decode
    assert read_points(blocks).count() == decode_blocks(blocks).count()
    # source restriction composes with the window
    one = read_points(blocks, start="2024-02-01", end="2024-03-01",
                      sources=["s001"])
    assert one.select("source").distinct().collect() == [("s001",)]
