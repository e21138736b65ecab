"""ACF + Ljung-Box: numpy parity, degenerate series, lag edges."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.acf import acf, ljung_box


def _series_df(spark, vals, key="a"):
    rows = [(key, i, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, x long")


def _np_acf(x, lag):
    x = np.asarray(x, dtype=np.float64)
    m = x.mean()
    d = x - m
    den = float(np.sum(d * d))
    num = float(np.sum(d[lag:] * d[:-lag]))
    return num / den


def test_acf_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vals = np.cumsum(rng.randint(-5, 6, size=200)) + 100
    out = acf(_series_df(spark, vals), "k", "t", "x", [1, 2, 5, 10])
    got = {r["lag"]: r["acf_e9"] for r in out.collect()}
    assert set(got) == {1, 2, 5, 10}
    for lag, e9 in got.items():
        expect = _np_acf(vals, lag)
        assert abs(e9 / 1e9 - expect) < 1e-6, (lag, e9, expect)


def test_acf_white_noise_near_zero(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 1000, size=500)
    out = acf(_series_df(spark, vals), "k", "t", "x", [1, 2, 3])
    for r in out.collect():
        assert abs(r["acf_e9"]) < 0.2e9  # uncorrelated -> small |r|


def test_acf_constant_and_short_series_null(spark):
    const = acf(_series_df(spark, [5] * 10), "k", "t", "x", [1])
    assert const.collect()[0]["acf_e9"] is None  # den == 0
    short = acf(_series_df(spark, [1, 2, 3]), "k", "t", "x", [2, 3, 5])
    got = {r["lag"]: r["acf_e9"] for r in short.collect()}
    assert got[3] is None and got[5] is None  # n <= lag -> no pairs
    assert got[2] is not None


def test_acf_perfect_alternation(spark):
    out = acf(_series_df(spark, [0, 10] * 50), "k", "t", "x", [1, 2])
    got = {r["lag"]: r["acf_e9"] / 1e9 for r in out.collect()}
    assert got[1] < -0.9 and got[2] > 0.9


def test_ljung_box_matches_numpy(spark):
    rng = np.random.RandomState(3)
    vals = np.cumsum(rng.randint(-4, 5, size=150)) + 50
    out = ljung_box(_series_df(spark, vals), "k", "t", "x", 6)
    row = out.collect()[0]
    n = len(vals)
    q = n * (n + 2) * sum(
        _np_acf(vals, l) ** 2 / (n - l) for l in range(1, 7)
    )
    assert row["n"] == n and row["k_lags"] == 6
    assert abs(row["lb_q_e6"] / 1e6 - q) < 1e-3


def test_ljung_box_multi_key_and_guard(spark):
    rows = [("a", i, int(v)) for i, v in enumerate([3, 7, 4, 9, 1, 8, 2, 6])]
    rows += [("b", i, 5) for i in range(8)]  # constant -> NULL
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r["k"]: r for r in ljung_box(df, "k", "t", "x", 3).collect()}
    assert got["a"]["lb_q_e6"] is not None
    assert got["b"]["lb_q_e6"] is None
    with pytest.raises(ValueError):
        ljung_box(df, "k", "t", "x", 0)
