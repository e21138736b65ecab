"""Column profiling: hand stats, null math, type guard."""

from __future__ import annotations

import pytest

from rtsa_spark.operators.profile import column_profile


def test_profile_hand(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "a", 30), (4, None, 30)],
        "id long, s string, v long",
    )
    out = column_profile(df, ["id", "s", "v"])
    got = {r["column"]: r.asDict() for r in out.collect()}
    assert set(got) == {"id", "s", "v"}
    assert got["id"]["n"] == 4 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert got["id"]["min_str"] == "1" and got["id"]["max_str"] == "4"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["null_e6"] == 250_000
    assert got["v"]["n_distinct"] == 2  # nulls excluded from distinct
    assert got["v"]["min_str"] == "10" and got["v"]["max_str"] == "30"


def test_profile_guards(spark):
    df = spark.createDataFrame([(1, 1.5)], "id long, x double")
    with pytest.raises(ValueError):
        column_profile(df, [])
    with pytest.raises(ValueError):
        column_profile(df, ["nope"])
    with pytest.raises(ValueError):
        column_profile(df, ["x"])  # float rendering not portable


def test_profile_empty_input(spark):
    df = spark.createDataFrame([], "id long, s string")
    got = {r["column"]: r.asDict() for r in column_profile(df, ["id", "s"]).collect()}
    assert got["id"]["n"] == 0 and got["id"]["null_e6"] is None
    assert got["id"]["min_str"] is None
