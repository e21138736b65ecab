"""OLS + Theil–Sen trend estimators vs numpy/scipy-free references."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.trend import ols_trend, theil_sen


def _df(spark, ys, key="a"):
    return spark.createDataFrame(
        [(key, t, int(y)) for t, y in enumerate(ys)], "k string, t long, x long"
    )


def test_ols_exact_line(spark):
    # y = 3x + 7 exactly: slope 3, intercept 7, r2 = 1
    (r,) = ols_trend(_df(spark, [7 + 3 * i for i in range(10)]), "k", "t", "x").collect()
    assert r["slope_e9"] == 3_000_000_000
    assert r["intercept_e6"] == 7_000_000
    assert r["r2_e6"] == 1_000_000


def test_ols_matches_numpy(spark):
    rng = np.random.default_rng(5)
    ys = rng.integers(-500, 500, size=60)
    (r,) = ols_trend(_df(spark, ys), "k", "t", "x").collect()
    xs = np.arange(60)
    slope, intercept = np.polyfit(xs, ys.astype(float), 1)
    corr = np.corrcoef(xs, ys.astype(float))[0, 1]
    assert abs(r["slope_e9"] / 1e9 - slope) < 1e-6
    assert abs(r["intercept_e6"] / 1e6 - intercept) < 1e-4
    assert abs(r["r2_e6"] / 1e6 - corr**2) < 1e-4


def test_ols_degenerate(spark):
    (r1,) = ols_trend(_df(spark, [5]), "k", "t", "x").collect()
    assert r1["slope_e9"] is None and r1["n"] == 1
    (r2,) = ols_trend(_df(spark, [5, 5, 5, 5]), "k", "t", "x").collect()
    assert r2["slope_e9"] == 0 and r2["r2_e6"] is None  # constant: dtot == 0


def test_theil_sen_hand_case(spark):
    # slopes for [0, 2, 1]: (2-0)/1=2, (1-0)/2=0.5, (1-2)/1=-1 -> median 0.5
    (r,) = theil_sen(_df(spark, [0, 2, 1]), "k", "t", "x").collect()
    assert r["n_pairs"] == 3
    assert r["ts_slope_e9"] == 500_000_000


def test_theil_sen_robust_to_outlier(spark):
    # clean line y = 2x with one wild outlier: TS stays ~2, OLS drifts
    ys = [2 * i for i in range(20)]
    ys[10] = 10_000
    (ts,) = theil_sen(_df(spark, ys), "k", "t", "x").collect()
    (ols,) = ols_trend(_df(spark, ys), "k", "t", "x").collect()
    assert abs(ts["ts_slope_e9"] - 2_000_000_000) < 100_000_000
    assert abs(ols["slope_e9"] - 2_000_000_000) > 1_000_000_000


def test_theil_sen_matches_reference_median(spark):
    rng = np.random.default_rng(9)
    ys = rng.integers(0, 1000, size=40)
    (r,) = theil_sen(_df(spark, ys), "k", "t", "x").collect()
    slopes = []
    for i in range(40):
        for j in range(i + 1, 40):
            slopes.append((int(ys[j]) - int(ys[i])) / (j - i))
    assert r["n_pairs"] == len(slopes)
    assert r["ts_slope_e9"] == int(np.floor(1e9 * np.median(slopes)))


def test_theil_sen_single_point(spark):
    (r,) = theil_sen(_df(spark, [5]), "k", "t", "x").collect()
    assert r["n_pairs"] == 0 and r["ts_slope_e9"] is None
