"""LOCF gap-fill, per-key corpus capping, histogram quantile sketch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.gapfill import gapfill_locf
from rtsa_spark.operators.sampling import cap_per_key
from rtsa_spark.operators.sketch import histogram_quantiles, value_histogram


def _hourly(spark, pts: dict[int, int]):
    rows = [
        (f"2024-03-01 {h:02d}:00:00", int(v)) for h, v in pts.items()
    ]
    return spark.createDataFrame(rows, "b string, v long").select(
        F.lit("s1").alias("source"),
        F.to_timestamp("b").alias("bucket_start"),
        F.col("v").alias("v"),
    )


# ----------------------------------------------------------------- locf


def test_locf_carries_and_counts(spark):
    df = _hourly(spark, {0: 10, 3: 40, 4: 50})
    out = {
        r["bucket_start"].hour: r
        for r in gapfill_locf(
            df, "hourly", value_cols=["v"], key_col="source"
        ).collect()
    }
    assert [out[h]["v"] for h in range(5)] == [10, 10, 10, 40, 50]
    assert [out[h]["carry_dist"] for h in range(5)] == [0, 1, 2, 0, 0]
    assert [out[h]["gapfilled"] for h in range(5)] == [
        False, True, True, False, False,
    ]


def test_locf_max_carry_cutoff(spark):
    df = _hourly(spark, {0: 10, 5: 60})
    out = {
        r["bucket_start"].hour: r
        for r in gapfill_locf(
            df, "hourly", value_cols=["v"], key_col="source", max_carry=2
        ).collect()
    }
    assert [out[h]["v"] for h in range(6)] == [10, 10, 10, None, None, 60]
    assert out[3]["carry_dist"] is None and out[4]["carry_dist"] is None


def test_locf_observed_rows_unchanged(spark):
    df = _hourly(spark, {1: 11, 2: 22, 3: 33})
    out = gapfill_locf(df, "hourly", value_cols=["v"], key_col="source")
    assert out.where("gapfilled").count() == 0
    assert {r["v"] for r in out.collect()} == {11, 22, 33}


# ------------------------------------------------------------------ cap


def test_cap_per_key_bounds_and_determinism(spark):
    rows = [(f"s{i % 3}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    kept = cap_per_key(df, "source", cap=10)
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(v == 10 for v in counts.values())
    again = {tuple(r) for r in cap_per_key(df, "source", cap=10).collect()}
    assert {tuple(r) for r in kept.collect()} == again


def test_cap_per_key_stable_under_growth(spark):
    """Rows kept from the original corpus stay kept unless new rows hash
    ahead of them — with a cap far above the original size, growth only
    appends."""
    old = spark.createDataFrame(
        [("s", i) for i in range(20)], "source string, doc_id long"
    )
    grown = spark.createDataFrame(
        [("s", i) for i in range(40)], "source string, doc_id long"
    )
    kept_old = {r["doc_id"] for r in cap_per_key(old, "source", 20).collect()}
    kept_new = {
        r["doc_id"] for r in cap_per_key(grown, "source", 40).collect()
    }
    assert kept_old <= kept_new


# ------------------------------------------------------- histogram sketch


def test_histogram_merge_equals_whole(spark):
    rng = np.random.RandomState(3)
    vals = rng.randint(-500, 2000, 600).tolist()
    whole = spark.createDataFrame(
        [("k", v) for v in vals], "g string, v long"
    )
    h1 = value_histogram(
        spark.createDataFrame(
            [("k", v) for v in vals[:311]], "g string, v long"
        ), "g", "v", 25,
    )
    h2 = value_histogram(
        spark.createDataFrame(
            [("k", v) for v in vals[311:]], "g string, v long"
        ), "g", "v", 25,
    )
    merged = (
        h1.unionByName(h2).groupBy("key", "bin").agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["bin"], r["cnt"]) for r in merged.collect()}
    want = {
        (r["bin"], r["cnt"])
        for r in value_histogram(whole, "g", "v", 25).collect()
    }
    assert got == want


def test_histogram_quantile_within_one_bin(spark):
    rng = np.random.RandomState(9)
    vals = rng.randint(0, 10_000, 2000)
    df = spark.createDataFrame(
        [("k", int(v)) for v in vals], "g string, v long"
    )
    hist = value_histogram(df, "g", "v", 100)
    got = {
        r["q_e3"]: r["bin_lo"]
        for r in histogram_quantiles(hist, [500, 900, 990], 100).collect()
    }
    s = np.sort(vals)
    for q in (500, 900, 990):
        exact = s[int(np.ceil(q / 1000 * len(s))) - 1]
        assert got[q] <= exact < got[q] + 100


def test_histogram_negative_values_floor_bins(spark):
    df = spark.createDataFrame(
        [("k", -1), ("k", -100), ("k", 0), ("k", 99)], "g string, v long"
    )
    bins = {
        r["bin"]: r["cnt"]
        for r in value_histogram(df, "g", "v", 100).collect()
    }
    assert bins == {-1: 2, 0: 2}  # -1 and -100 both floor to bin -1


def test_histogram_quantile_validates_qs(spark):
    df = spark.createDataFrame([("k", 1)], "g string, v long")
    hist = value_histogram(df, "g", "v", 10)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, [0], 10)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, [1001], 10)
