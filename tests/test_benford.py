"""Benford digit table: constants, hand counts, exclusions, spine."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from rtsa_spark.operators.monitor import BENFORD_E6, benford_deviation


def test_benford_constants():
    assert sum(BENFORD_E6) == 1_000_000
    for d, e6 in enumerate(BENFORD_E6, start=1):
        assert abs(e6 - 1_000_000 * math.log10(1 + 1 / d)) <= 1


def test_benford_hand_table(spark):
    rows = (
        [("k", 1)] * 3 + [("k", 19)] * 2 + [("k", 250)]
        + [("k", 9)] + [("k", 0)] + [("k", -5)]  # non-positive excluded
    )
    df = spark.createDataFrame(rows, "k string, v long")
    out = benford_deviation(df, ["k"], "v")
    got = {r["digit"]: r.asDict() for r in out.collect()}
    assert set(got) == set(range(1, 10))  # full 9-digit spine
    assert got[1]["cnt"] == 5 and got[2]["cnt"] == 1 and got[9]["cnt"] == 1
    assert got[3]["cnt"] == 0
    assert all(r["n"] == 7 for r in got.values())
    assert got[1]["freq_e6"] == (1_000_000 * 5) // 7
    assert got[1]["dev_e6"] == abs((1_000_000 * 5) // 7 - 301_030)
    assert got[3]["freq_e6"] == 0 and got[3]["dev_e6"] == 124_939


def test_benford_all_nonpositive_emits_nothing(spark):
    df = spark.createDataFrame([("k", 0), ("k", -1)], "k string, v long")
    assert benford_deviation(df, ["k"], "v").count() == 0
