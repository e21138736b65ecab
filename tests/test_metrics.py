from __future__ import annotations

import math

import numpy as np
import pytest

from rtsa_spark.functions.decompose import component_stats, decompose
from rtsa_spark.functions.kendall import mann_kendall, seasonal_mann_kendall


# ---------- Mann-Kendall against closed-form hand calculations ----------

def test_mk_strictly_increasing():
    r = mann_kendall(np.arange(1.0, 11.0))
    n = 10
    assert r["mk_s"] == n * (n - 1) / 2  # every pair concordant
    assert r["mk_tau"] == pytest.approx(1.0)
    assert r["mk_p"] < 0.001


def test_mk_strictly_decreasing_symmetry():
    up = mann_kendall(np.arange(1.0, 21.0))
    dn = mann_kendall(np.arange(20.0, 0.0, -1.0))
    assert dn["mk_s"] == -up["mk_s"]
    assert dn["mk_tau"] == pytest.approx(-up["mk_tau"])
    assert dn["mk_p"] == pytest.approx(up["mk_p"])


def test_mk_hand_computed_five_points():
    # x = [1,2,3,4,5]: S=10, varS = 5*4*15/18, z=(10-1)/sqrt(varS)
    r = mann_kendall(np.array([1.0, 2, 3, 4, 5]))
    var_s = 5 * 4 * 15 / 18
    assert r["mk_s"] == 10
    assert r["mk_vars"] == pytest.approx(var_s)
    z = 9 / math.sqrt(var_s)
    assert r["mk_p"] == pytest.approx(math.erfc(z / math.sqrt(2)))


def test_mk_with_ties_hand_computed():
    # x = [1,2,2,3]: pairs: (1,2)+,(1,2)+,(1,3)+,(2,2)0,(2,3)+,(2,3)+ => S=5
    r = mann_kendall(np.array([1.0, 2, 2, 3, 4]))
    # recompute by brute force
    x = [1.0, 2, 2, 3, 4]
    s = sum(np.sign(x[j] - x[i]) for i in range(5) for j in range(i + 1, 5))
    assert r["mk_s"] == s
    # tie correction: one group of size 2
    assert r["mk_vars"] == pytest.approx((5 * 4 * 15 - 2 * 1 * 9) / 18)


def test_mk_short_series_nan():
    r = mann_kendall(np.array([1.0, 2, 3]))
    assert math.isnan(r["mk_tau"])


def test_mk_nan_dropped():
    a = mann_kendall(np.array([1.0, np.nan, 2, 3, np.nan, 4, 5, 6]))
    b = mann_kendall(np.array([1.0, 2, 3, 4, 5, 6]))
    assert a == b


def test_seasonal_mk_pure_trend():
    # 4 years of monthly data with pure linear trend: every season increasing
    x = np.arange(48, dtype=np.float64)
    r = seasonal_mann_kendall(x, 12)
    assert r["mk_tau"] == pytest.approx(1.0)
    # per-season n=4 -> S=6 each, 12 seasons
    assert r["mk_s"] == 12 * 6


def test_mk_chunked_matches_bruteforce_large():
    rng = np.random.default_rng(3)
    x = rng.normal(size=300)
    r = mann_kendall(x)
    s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(300, 1)].sum())
    assert r["mk_s"] == s


# ---------- decomposition stats on constructed series ----------

def test_decompose_recovers_known_components():
    period = 12
    n = 120
    t = np.arange(n)
    trend_true = 0.5 * t + 10
    seas_true = 3.0 * np.sin(2 * np.pi * t / period)
    rng = np.random.default_rng(1)
    noise = rng.normal(0, 0.2, n)
    x = trend_true + seas_true + noise
    comp = decompose(x, period)
    stats = component_stats(comp["seasonal"], comp["trend"], comp["remainder"], t.astype(float), period)
    assert stats["seasonal_amplitude"] == pytest.approx(6.0, rel=0.15)
    assert stats["trend_slope"] == pytest.approx(0.5, rel=0.1)
    assert stats["remainder_stdev"] < 0.5
    assert stats["seas_amp_cycle_mean"] == pytest.approx(6.0, rel=0.15)


def test_decompose_constant_series():
    comp = decompose(np.full(48, 5.0), 12)
    assert np.allclose(comp["seasonal"], 0)
    assert np.allclose(comp["trend"], 5.0)
    assert np.allclose(comp["remainder"], 0)


def test_decompose_short_series_degenerate():
    x = np.array([1.0, 2, 3])
    comp = decompose(x, 12)
    assert np.allclose(comp["trend"], x)
    assert np.allclose(comp["seasonal"], 0)


def test_decompose_additivity():
    rng = np.random.default_rng(2)
    x = rng.normal(size=100).cumsum()
    comp = decompose(x, 7)
    assert np.allclose(comp["seasonal"] + comp["trend"] + comp["remainder"], x)


# ---------- Spark metrics operator ----------

def test_compute_metrics_spark(spark):
    import datetime as dt

    import pandas as pd

    period = 12
    rows = []
    for src, slope, amp in [("a", 0.5, 3.0), ("b", -0.2, 1.0)]:
        for i in range(96):
            t = np.arange(96)
            val = slope * i + amp * np.sin(2 * np.pi * i / period) + 100
            rows.append(
                (src, dt.datetime(2016, 1, 1) + dt.timedelta(days=30 * i) if False else dt.datetime(2016 + i // 12, 1 + i % 12, 1), float(val))
            )
    pdf = pd.DataFrame(rows, columns=["source", "bucket_start", "n_tok_mean"])
    tier = spark.createDataFrame(pdf)
    from rtsa_spark.operators.metrics import compute_metrics

    out = {r["source"]: r.asDict() for r in compute_metrics(tier, "monthly").collect()}
    # trend_slope is per second; one month ~ 2.63e6 s; slope per bucket / sec
    assert out["a"]["mk_tau"] > 0.9
    assert out["b"]["mk_tau"] < -0.5
    assert out["a"]["seasonal_amplitude"] == pytest.approx(6.0, rel=0.2)
    assert out["b"]["seasonal_amplitude"] == pytest.approx(2.0, rel=0.2)
    assert out["a"]["trend_slope"] > 0
    assert out["b"]["trend_slope"] < 0
    assert out["a"]["n_buckets"] == 96


# ---------- deterministic (oracle-facing) kernel vs float production ----------

def test_deterministic_stats_match_float_kernel():
    """decompose_deterministic_stats must agree with the float64 production
    decomposition to ~1e-9 relative — same math, exact-int summation."""
    from rtsa_spark.functions.decompose import decompose_deterministic_stats

    rng = np.random.default_rng(11)
    for period in (7, 12, 24):
        for n in (2 * period, 3 * period + 5, 101):
            x = rng.integers(10, 100_000, size=n)
            t = np.arange(n) * 86400.0
            comp = decompose(x.astype("float64"), period)
            stats = component_stats(
                comp["seasonal"], comp["trend"], comp["remainder"], t, period
            )
            span = int(t[-1] - t[0])
            det = decompose_deterministic_stats(x, period, span)
            # amplitude: floor(1e4 * float_amp) within 1 ulp of the int path
            assert abs(det["seasonal_amplitude_e4"] - math.floor(1e4 * stats["seasonal_amplitude"])) <= 1
            assert det["trend_slope_e9"] == pytest.approx(
                1e9 * stats["trend_slope"], abs=2
            )


def test_deterministic_degenerate_paths():
    from rtsa_spark.functions.decompose import decompose_deterministic_stats

    # short series: zero seasonal, trend = series endpoints
    d = decompose_deterministic_stats(np.array([10, 40, 20]), 7, 200)
    assert d["seasonal_amplitude_e4"] == 0
    assert d["trend_slope_e9"] == (1_000_000_000 * 10) // 200
    # single point / zero span -> no slope
    d1 = decompose_deterministic_stats(np.array([5]), 7, 0)
    assert d1["trend_slope_e9"] is None


def test_compute_metrics_deterministic_spark(spark):
    """The Spark deterministic metrics agree with per-series local compute
    and with the float production kernel's MK stats."""
    import pandas as pd
    import pyspark.sql.functions as F

    from rtsa_spark.operators.metrics import (
        compute_metrics,
        compute_metrics_deterministic,
    )
    from rtsa_spark.operators.rollup import rollup_ladder
    from rtsa_spark.synth import synth_sequences

    seq = synth_sequences(spark, 15_000, n_sources=6)
    daily = rollup_ladder(seq)["daily"]
    det = {
        r["source"]: r
        for r in compute_metrics_deterministic(
            daily, "daily", value_col="n_tok_sum", period=7
        ).collect()
    }
    prod = {
        r["source"]: r
        for r in compute_metrics(
            daily, "daily", value_col="n_tok_sum", period=7
        ).collect()
    }
    assert set(det) == set(prod)
    for src, d in det.items():
        p = prod[src]
        assert d["n_buckets"] == p["n_buckets"]
        # MK: deterministic ints must be the exact integers behind the floats
        assert d["mk_s"] == int(p["mk_s"])
        assert d["mk_vars18"] == round(p["mk_vars"] * 18)
        assert d["mk_tau_e6"] == math.floor(1e6 * p["mk_tau"])
        # decomposition stats within integer-quantization slack
        assert d["seasonal_amplitude_e4"] == pytest.approx(
            1e4 * p["seasonal_amplitude"], abs=2
        )
        assert d["trend_slope_e9"] == pytest.approx(1e9 * p["trend_slope"], abs=2)


def test_seasonal_mk_deterministic_matches_production():
    """The exact-int seasonal MK twin must carry the same integers the
    float production kernel (seasonal_mann_kendall) computes, including on
    series with ties and a non-multiple-of-period length."""
    import numpy as np

    from rtsa_spark.functions.kendall import (
        seasonal_mann_kendall,
        seasonal_mann_kendall_deterministic,
    )

    rng = np.random.default_rng(3)
    for n in (23, 28, 60):
        x = rng.integers(0, 12, size=n).astype("int64")  # many ties
        det = seasonal_mann_kendall_deterministic(x, 7)
        prod = seasonal_mann_kendall(x.astype("float64"), 7)
        assert det["smk_s"] == int(prod["mk_s"])
        assert det["smk_vars18"] == round(prod["mk_vars"] * 18)
        assert det["smk_tau_e6"] == math.floor(1e6 * prod["mk_tau"])

    # below the minimum-observation gate: NULLs, matching the SQL twin
    assert seasonal_mann_kendall_deterministic(
        np.array([1, 2, 3], dtype="int64"), 7
    ) == {"smk_s": None, "smk_vars18": None, "smk_tau_e6": None}
