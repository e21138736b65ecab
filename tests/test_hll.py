"""HyperLogLog sketch family: merge identity, accuracy bounds, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.sketch import (
    hll_bucket_sketch,
    hll_corrected,
    hll_merge_buckets,
)


def _days(spark, spec):
    """spec: list of (key, day, n_distinct) -> one row per (key, day, u)."""
    rows = [
        (k, d, u) for k, d, n in spec for u in range(n)
    ]
    return spark.createDataFrame(rows, "k string, d int, u long").select(
        "k",
        F.to_timestamp(F.format_string("2024-01-%02d", "d")).alias("ts"),
        "u",
    )


def test_hll_merge_equals_direct(spark):
    df = _days(spark, [("a", 1, 700), ("a", 2, 1400), ("b", 1, 40)])
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=10)
    month = F.date_trunc("month", F.col("bucket"))
    merged = hll_merge_buckets(daily, ["k"], month, p=10)
    direct = hll_bucket_sketch(
        df.select("k", F.date_trunc("month", "ts").alias("m"), "u"),
        ["k"],
        "m",
        "u",
        p=10,
    )
    got = {r["k"]: r.asDict() for r in merged.collect()}
    want = {r["k"]: r.asDict() for r in direct.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["regs"] == want[k]["regs"]
        assert got[k]["z_scaled"] == want[k]["z_scaled"]
        assert got[k]["est_distinct"] == want[k]["est_distinct"]


def test_hll_merge_replay_noop(spark):
    # max is idempotent: a replayed day must not move the merged sketch
    df = _days(spark, [("a", 1, 500), ("a", 2, 500)])
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=8)
    month = F.date_trunc("month", F.col("bucket"))
    once = hll_merge_buckets(daily, ["k"], month, p=8).collect()
    twice = hll_merge_buckets(
        daily.unionByName(daily), ["k"], month, p=8
    ).collect()
    assert [r.asDict() for r in once] == [r.asDict() for r in twice]


def test_hll_accuracy_raw_and_corrected(spark):
    # p=10 -> rel std err ~1.04/sqrt(1024) = 3.3%; allow 4 sigma
    df = _days(spark, [("big", 1, 20000), ("small", 1, 100)])
    sk = hll_corrected(hll_bucket_sketch(df, ["k"], "ts", "u", p=10), p=10)
    got = {r["k"]: r.asDict() for r in sk.collect()}
    assert abs(got["big"]["est_corrected"] - 20000) <= 0.14 * 20000
    # small range: raw HLL overshoots badly, linear counting recovers
    assert abs(got["small"]["est_corrected"] - 100) <= 10
    assert got["small"]["est_corrected"] != got["small"]["est_distinct"]


def test_hll_fixed_size_and_zero_sum(spark):
    df = _days(spark, [("a", 1, 3000)])
    r = hll_bucket_sketch(df, ["k"], "ts", "u", p=6).collect()[0]
    assert len(r["regs"]) == 64
    assert r["n_zero"] == sum(1 for x in r["regs"] if x == 0)
    # z_scaled replays exactly from the registers (Rmax = 48-6+1 = 43)
    assert r["z_scaled"] == sum(1 << (43 - x) for x in r["regs"])


def test_hll_guards_and_degenerate(spark):
    df = spark.createDataFrame([], "k string, ts timestamp, u long")
    for p in (3, 17):
        with pytest.raises(ValueError):
            hll_bucket_sketch(df, ["k"], "ts", "u", p=p)
        with pytest.raises(ValueError):
            hll_merge_buckets(df, ["k"], F.col("ts"), p=p)
    assert hll_bucket_sketch(df, ["k"], "ts", "u", p=4).count() == 0
    one = _days(spark, [("a", 1, 1)])
    r = hll_bucket_sketch(one, ["k"], "ts", "u", p=4).collect()[0]
    assert r["n_zero"] == 15 and sum(1 for x in r["regs"] if x > 0) == 1


def test_hll_p_mismatch_raises(spark):
    from py4j.protocol import Py4JJavaError

    df = _days(spark, [("a", 1, 50)])
    daily = hll_bucket_sketch(df, ["k"], "ts", "u", p=8)
    with pytest.raises(Exception):  # raise_error surfaces as Spark exception
        hll_merge_buckets(
            daily, ["k"], F.date_trunc("month", F.col("bucket")), p=6
        ).collect()
    with pytest.raises(ValueError):
        hll_corrected(daily, p=3)


def test_hll_null_items_dropped(spark):
    rows = [("a", 1, 1), ("a", 1, 2), ("a", 1, None)]
    df = spark.createDataFrame(rows, "k string, d int, u string").select(
        "k", F.to_timestamp(F.format_string("2024-01-%02d", "d")).alias("ts"),
        "u",
    )
    r = hll_bucket_sketch(df, ["k"], "ts", "u", p=6).collect()[0]
    # COUNT DISTINCT semantics: the NULL item is not an element, and the
    # regs array stays intact (no NULL poisoning)
    assert r["regs"] is not None and sum(1 for x in r["regs"] if x > 0) == 2
