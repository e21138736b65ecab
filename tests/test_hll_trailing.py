"""Trailing HLL cardinality: window fold equals direct sketch, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.sketch import (
    hll_bucket_sketch,
    hll_trailing_distinct,
)


def _ev(spark, spec):
    rows = [(k, d, u) for k, d, us in spec for u in us]
    return spark.createDataFrame(rows, "k string, d int, u long").select(
        "k",
        F.to_timestamp(F.format_string("2024-01-%02d", "d")).alias("ts"),
        "u",
    )


def test_trailing_equals_direct_window_build(spark):
    spec = [
        ("a", 1, range(0, 300)),
        ("a", 2, range(200, 500)),
        ("a", 3, range(400, 900)),
        ("a", 5, range(0, 100)),  # day 4 missing: shorter fold
        ("b", 2, range(0, 50)),
    ]
    df = _ev(spark, spec)
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=8)
    trail = hll_trailing_distinct(daily, ["k"], 3, 86400, p=8)
    got = {
        (r["k"], str(r["bucket"])[:10]): r.asDict() for r in trail.collect()
    }
    # direct: for each observed day, sketch the union of trailing 3 days
    for k, d, _ in spec:
        lo = d - 2
        sub = [(kk, dd, us) for kk, dd, us in spec if kk == k and lo <= dd <= d]
        direct = hll_bucket_sketch(
            _ev(spark, sub).select("k", F.lit(1).alias("one"), "u"),
            ["k"],
            "one",
            "u",
            p=8,
        ).collect()[0]
        key = (k, f"2024-01-{d:02d}")
        assert got[key]["regs"] == direct["regs"], key
        assert got[key]["est_distinct"] == direct["est_distinct"], key


def test_trailing_window_one_is_identity(spark):
    df = _ev(spark, [("a", 1, range(100)), ("a", 2, range(50, 200))])
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=6)
    trail = hll_trailing_distinct(daily, ["k"], 1, 86400, p=6)
    d = {str(r["bucket"]): r["est_distinct"] for r in daily.collect()}
    t = {str(r["bucket"]): r["est_distinct"] for r in trail.collect()}
    assert d == t


def test_trailing_guards(spark):
    df = _ev(spark, [("a", 1, range(10))])
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=6)
    with pytest.raises(ValueError):
        hll_trailing_distinct(daily, ["k"], 0, 86400, p=6)
    with pytest.raises(ValueError):
        hll_trailing_distinct(daily, ["k"], 7, 0, p=6)
    with pytest.raises(ValueError):
        hll_trailing_distinct(daily, ["k"], 7, 86400, p=3)
