"""STL with numeric loess windows (reference W3/M5, R/rtsa.stl.R:140-169)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rtsa_spark.functions.stl import _ma, loess_smooth, stl_decompose


def test_loess_degree0_is_weighted_mean():
    y = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    # window 3 at i=2: neighbors 1,2,3 dist 1,0,1; dmax=1 -> tricube(1)=0,
    # tricube(0)=1 -> pure center value
    out = loess_smooth(y, 3, degree=0)
    assert out[2] == pytest.approx(4.0)


def test_loess_degree1_reproduces_line_exactly():
    y = 3.0 + 2.0 * np.arange(40)
    for w in (5, 11, 41):
        out = loess_smooth(y, w, degree=1)
        assert np.allclose(out, y, atol=1e-8)


def test_loess_degree2_reproduces_parabola_exactly():
    t = np.arange(50, dtype="float64")
    y = 1.0 + 0.5 * t - 0.02 * t * t
    out = loess_smooth(y, 11, degree=2)
    assert np.allclose(out, y, atol=1e-8)


def test_loess_hand_computed_weighted_regression():
    # window 3 at i=1 of [0, 6, 0]: xc=(-1,0,1), d=(1,0,1), tricube -> w=(0,1,0)
    # degree-1 fit through single weighted point = its value
    out = loess_smooth(np.array([0.0, 6.0, 0.0]), 3, degree=1)
    assert out[1] == pytest.approx(6.0)


def test_loess_extension_extrapolates_linearly():
    y = 1.0 + 2.0 * np.arange(10)
    out = loess_smooth(y, 21, degree=1, eval_x=np.array([-1.0, 10.0]))
    assert out[0] == pytest.approx(-1.0, abs=1e-6)
    assert out[1] == pytest.approx(21.0, abs=1e-6)


def test_ma_reduces_length():
    out = _ma(np.arange(10, dtype="float64"), 3)
    assert len(out) == 8
    assert out[0] == pytest.approx(1.0)


def test_stl_recovers_planted_components():
    rng = np.random.default_rng(7)
    n, p = 240, 12
    t = np.arange(n)
    season = 5.0 * np.sin(2 * np.pi * t / p)
    trend = 0.05 * t + 10
    x = season + trend + rng.normal(0, 0.1, n)
    out = stl_decompose(x, p, s_window=25, s_degree=1)
    assert np.corrcoef(out["seasonal"], season)[0, 1] > 0.99
    assert np.corrcoef(out["trend"], trend)[0, 1] > 0.99
    assert float(np.std(out["remainder"])) < 0.5
    # additivity is exact by construction
    assert np.allclose(out["seasonal"] + out["trend"] + out["remainder"], x)


def test_stl_periodic_matches_phase_means_shape():
    """s_window='periodic' must give a strictly periodic seasonal whose
    phase pattern matches the closed-form decompose() phase means."""
    from rtsa_spark.functions.decompose import decompose

    rng = np.random.default_rng(3)
    n, p = 96, 12
    x = 3 * np.sin(2 * np.pi * np.arange(n) / p) + 0.02 * np.arange(n) + rng.normal(0, 0.05, n)
    out = stl_decompose(x, p, s_window="periodic")
    s = out["seasonal"]
    assert np.allclose(s[:p], s[p : 2 * p], atol=1e-9)  # strictly periodic
    ref = decompose(x, p)
    # same amplitude to within the trend-estimator difference
    amp_stl = s.max() - s.min()
    amp_ref = ref["seasonal"].max() - ref["seasonal"].min()
    assert amp_stl == pytest.approx(amp_ref, rel=0.05)


def test_stl_numeric_swindow_tracks_evolving_seasonal():
    """A seasonal whose amplitude doubles over the series: numeric s_window
    tracks it (periodic mode cannot by construction)."""
    n, p = 480, 24
    t = np.arange(n)
    grow = 1.0 + t / n  # amplitude 1 -> 2
    x = grow * np.sin(2 * np.pi * t / p)
    num = stl_decompose(x, p, s_window=11, s_degree=1)
    per = stl_decompose(x, p, s_window="periodic")
    err_num = float(np.abs(num["seasonal"] - x).mean())  # trend ~0 here
    err_per = float(np.abs(per["seasonal"] - x).mean())
    assert err_num < 0.55 * err_per


def test_stl_degenerate_short_series():
    out = stl_decompose(np.array([1.0, 2.0, 3.0]), 12)
    assert np.allclose(out["trend"], [1, 2, 3])
    assert np.allclose(out["seasonal"], 0)


def test_stl_deterministic_matches_production():
    """The oracle-facing twin (explicit ordered loops) must agree with the
    vectorized stl_decompose to quantization slack across series lengths,
    including the 14..27 short-subseries window and the degenerate gate."""
    import math

    import numpy as np

    from rtsa_spark.functions.stl import stl_decompose, stl_deterministic_stats

    rng = np.random.default_rng(5)
    for n in (*range(14, 28), 30, 60, 101):
        x = rng.integers(100, 100_000, size=n)
        det = stl_deterministic_stats(x, 7, s_window=15)
        prod = stl_decompose(
            x.astype("float64"), 7, s_window=15, s_degree=1, t_degree=1
        )
        amp = float(prod["seasonal"].max() - prod["seasonal"].min())
        assert abs(det["seas_amp_e4"] - math.floor(1e4 * amp)) <= 1
        assert abs(det["trend_first_e4"] - math.floor(1e4 * prod["trend"][0])) <= 1
        assert abs(det["trend_last_e4"] - math.floor(1e4 * prod["trend"][-1])) <= 1

    short = np.array([5, 9, 7], dtype="int64")
    det = stl_deterministic_stats(short, 7)
    assert det["seas_amp_e4"] == 0
    assert det["trend_first_e4"] == 50000 and det["trend_last_e4"] == 70000


def test_outer_robustness_downweights_outliers():
    """Cleveland 1990 outer loop: with bisquare robustness weights, an
    outlier perturbs the fitted trend/seasonal far less than without.
    Documents the stlplus divergence (outer=0 default vs stlplus's one
    outer pass, R/rtsa.stl.R:360)."""
    import numpy as np

    from rtsa_spark.functions.stl import stl_decompose

    rng = np.random.default_rng(7)
    n, p = 84, 7
    t = np.arange(n, dtype=float)
    clean = 100.0 + 0.5 * t + 10.0 * np.sin(2 * np.pi * t / p)
    clean = clean + rng.normal(0, 0.5, n)
    dirty = clean.copy()
    dirty[40] += 500.0

    ref = stl_decompose(clean, p, s_window=15, s_degree=1)
    plain = stl_decompose(dirty, p, s_window=15, s_degree=1, outer=0)
    robust = stl_decompose(dirty, p, s_window=15, s_degree=1, outer=2)

    def dev(res):
        keep = np.abs(np.arange(n) - 40) > 3  # judge away from the spike
        return float(
            np.abs((res["trend"] + res["seasonal"])
                   - (ref["trend"] + ref["seasonal"]))[keep].max()
        )

    assert dev(robust) < 0.5 * dev(plain)
    # outer=0 keeps bit-identical behavior with the pre-robustness code
    legacy = stl_decompose(dirty, p, s_window=15, s_degree=1)
    assert np.array_equal(plain["trend"], legacy["trend"])
    assert np.array_equal(plain["seasonal"], legacy["seasonal"])


def test_robust_twin_matches_production_exactly():
    """The robust (outer=1) deterministic twin pins stl_decompose to
    quantization slack — the 'diverges less' golden tightened to exact,
    per the r3 verdict. Covers clean series, heavy outliers (rho -> 0
    windows), and the degenerate short gate."""
    import math

    from rtsa_spark.functions.stl import stl_robust_deterministic_stats

    rng = np.random.default_rng(11)
    for n in (14, 21, 35, 60, 101, 150):
        x = rng.integers(1000, 50_000, size=n)
        x[n // 3] *= 20  # planted outlier
        det = stl_robust_deterministic_stats(x, 7, s_window=15, outer=1)
        prod = stl_decompose(
            x.astype("float64"), 7, s_window=15, s_degree=1, outer=1
        )
        amp = float(prod["seasonal"].max() - prod["seasonal"].min())
        assert abs(det["seas_amp_e4"] - math.floor(1e4 * amp)) <= 1
        assert (
            abs(det["trend_first_e4"] - math.floor(1e4 * prod["trend"][0]))
            <= 1
        )
        assert (
            abs(det["trend_last_e4"] - math.floor(1e4 * prod["trend"][-1]))
            <= 1
        )
        # the planted outlier must actually be down-weighted — except at
        # n == 2*period, where the fit is exact and the noise-scale
        # remainder guard correctly leaves every weight at 1
        if n > 14:
            assert det["rho_min_e4"] < 10000
        else:
            assert det["rho_min_e4"] == 10000

    # outer=0 twin degenerates to the plain twin (minus the rho stat)
    from rtsa_spark.functions.stl import stl_deterministic_stats

    x = rng.integers(100, 100_000, size=60)
    a = stl_deterministic_stats(x, 7, s_window=15)
    b = stl_robust_deterministic_stats(x, 7, s_window=15, outer=0)
    assert all(a[k] == b[k] for k in a) and b["rho_min_e4"] == 10000

    # degenerate short series
    det = stl_robust_deterministic_stats(np.array([5, 9, 7]), 7)
    assert det["seas_amp_e4"] == 0 and det["rho_min_e4"] == 10000
