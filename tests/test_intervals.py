"""Interval join: hand cases, brute-force parity, bucket-boundary edges."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.intervals import interval_join


def _ij(spark, pts, ivs, bucket_s=10):
    p = spark.createDataFrame(pts, "k string, t long, pid long")
    i = spark.createDataFrame(ivs, "k string, s long, e long, iid long")
    return interval_join(p, i, "k", "t", "s", "e", bucket_s=bucket_s)


def test_interval_join_inclusive_bounds(spark):
    out = _ij(
        spark,
        [("a", 4, 1), ("a", 5, 2), ("a", 15, 3), ("a", 16, 4)],
        [("a", 5, 15, 100)],
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(2, 100), (3, 100)]  # 5 and 15 inclusive, 4 and 16 out


def test_interval_join_multi_bucket_span(spark):
    # interval spans several buckets; each contained point matches ONCE
    out = _ij(
        spark,
        [("a", 12, 1), ("a", 25, 2), ("a", 38, 3)],
        [("a", 10, 40, 100)],
        bucket_s=10,
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (3, 100)]


def test_interval_join_overlapping_intervals(spark):
    # one point inside two overlapping windows -> two pairs
    out = _ij(
        spark,
        [("a", 20, 1)],
        [("a", 10, 25, 100), ("a", 15, 30, 200)],
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100), (1, 200)]


def test_interval_join_key_isolation(spark):
    out = _ij(spark, [("a", 5, 1), ("b", 5, 2)], [("a", 0, 10, 100)])
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 100)]


def test_interval_join_brute_force_parity(spark):
    rng = np.random.default_rng(13)
    pts = [("k", int(t), i) for i, t in enumerate(rng.integers(0, 500, 120))]
    ivs = []
    for i in range(25):
        s = int(rng.integers(0, 480))
        ivs.append(("k", s, s + int(rng.integers(0, 60)), 1000 + i))
    out = _ij(spark, pts, ivs, bucket_s=32)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    want = sorted(
        (pid, iid)
        for (_, t, pid) in pts
        for (_, s, e, iid) in ivs
        if s <= t <= e
    )
    assert got == want
