"""log2 exponential histogram: hand buckets, signs, cascade merge identity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rtsa_spark.operators.sketch import log2_histogram


def _build(spark, vals, key="a"):
    df = spark.createDataFrame([(key, v) for v in vals], "k string, v long")
    return {
        (r["sign"], r["mag"]): (r["lo"], r["hi"], r["cnt"])
        for r in log2_histogram(df, ["k"], "v").collect()
    }


def test_log2_hand_buckets(spark):
    got = _build(spark, [0, 1, 2, 3, 4, 7, 8, -1, -5])
    assert got[(0, 0)] == (0, 0, 1)
    assert got[(1, 0)] == (1, 1, 1)
    assert got[(1, 1)] == (2, 3, 2)
    assert got[(1, 2)] == (4, 7, 2)
    assert got[(1, 3)] == (8, 15, 1)
    assert got[(-1, 0)] == (-1, -1, 1)
    assert got[(-1, 2)] == (-7, -4, 1)


def test_log2_bounds_contain_values(spark):
    rng = random.Random(3)
    vals = [rng.randint(-10**9, 10**9) for _ in range(300)]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v long")
    hist = log2_histogram(df, ["k"], "v")
    # python replay: every value lands in exactly one bucket, in-bounds
    def bucket(v):
        if v == 0:
            return (0, 0)
        return (1 if v > 0 else -1, abs(v).bit_length() - 1)

    from collections import Counter

    want = Counter(bucket(v) for v in vals)
    got = {(r["sign"], r["mag"]): r for r in hist.collect()}
    assert {k: r["cnt"] for k, r in got.items()} == dict(want)
    for v in vals:
        r = got[bucket(v)]
        assert r["lo"] <= v <= r["hi"]
    assert sum(r["cnt"] for r in got.values()) == len(vals)


def test_log2_cascade_merge_identity(spark):
    rng = random.Random(9)
    rows = [("a", d, rng.randint(-1000, 1000)) for d in range(5) for _ in range(40)]
    df = spark.createDataFrame(rows, "k string, day int, v long")
    daily = log2_histogram(df, ["k", "day"], "v")
    merged = (
        daily.groupBy("k", "sign", "mag", "lo", "hi")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = log2_histogram(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
