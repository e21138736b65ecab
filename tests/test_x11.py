"""X-11 decomposition core (reference M6, R/rtsa.seas.R:275-285)."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.functions.x11 import henderson_weights, x11_decompose, _sym_filter


def test_henderson_weights_published_properties():
    """The closed-form weights must behave like the published filter:
    sum to 1, symmetric, and reproduce cubic polynomials EXACTLY."""
    for n in (5, 9, 13, 23):
        w = henderson_weights(n)
        assert w.sum() == pytest.approx(1.0, abs=1e-12)
        assert np.allclose(w, w[::-1])
    w13 = henderson_weights(13)
    t = np.arange(60, dtype="float64")
    cubic = 2.0 - 0.3 * t + 0.05 * t**2 - 0.001 * t**3
    sm = _sym_filter(cubic, w13)
    # interior points (away from the reflect-padded ends) are exact
    assert np.allclose(sm[6:-6], cubic[6:-6], atol=1e-8)
    # known spot value: center weight of H13 ~ 0.2402
    assert w13[6] == pytest.approx(0.24006, abs=3e-4)


def test_musgrave_end_weights_published_values():
    """Musgrave asymmetric end weights for Henderson-13 at I/C=3.5 must
    reproduce the published X-11 table (Ladiray & Quenneville 2001, ch. 3;
    the classic last-point vector), sum to 1 (constant reproduction), and
    collapse to the symmetric filter at q=H."""
    from rtsa_spark.functions.x11 import musgrave_weights

    h13 = henderson_weights(13)
    last_point = musgrave_weights(h13, 0)
    published_q0 = [-0.092, -0.058, 0.012, 0.120, 0.244, 0.353, 0.421]
    assert np.allclose(last_point, published_q0, atol=5e-4)
    for q in range(7):
        u = musgrave_weights(h13, q)
        assert len(u) == 7 + q
        assert u.sum() == pytest.approx(1.0, abs=1e-12)
    assert np.array_equal(musgrave_weights(h13, 6), h13)
    with pytest.raises(ValueError):
        musgrave_weights(h13, 7)


def test_henderson_filter_musgrave_ends():
    """The Musgrave-ended Henderson filter: interior equals the symmetric
    convolution, ends reproduce constants exactly and track a linear
    trend closely (minimum-revision property), and the ordered twin
    agrees to float noise."""
    from rtsa_spark.functions.x11 import (
        _filt_henderson_ordered,
        _henderson_filter,
        musgrave_table,
    )

    h13 = henderson_weights(13)
    const = np.full(30, 7.25)
    assert np.allclose(_henderson_filter(const, h13), 7.25, atol=1e-12)
    line = 3.0 + 0.5 * np.arange(40)
    t = _henderson_filter(line, h13)
    assert np.allclose(t[6:-6], line[6:-6], atol=1e-9)  # interior exact
    assert float(np.abs(t - line).max()) < 0.35  # ends: slope-biased, small
    rng = np.random.default_rng(7)
    x = rng.integers(100, 100_000, size=41).astype("float64")
    twin = _filt_henderson_ordered(
        list(x), [float(v) for v in h13], musgrave_table(h13)
    )
    assert np.allclose(_henderson_filter(x, h13), twin, rtol=1e-12)


def test_x11_recovers_planted_components():
    rng = np.random.default_rng(5)
    n, p = 144, 12
    t = np.arange(n)
    season = 4.0 * np.sin(2 * np.pi * t / p) + 1.5 * np.cos(4 * np.pi * t / p)
    trend = 20 + 0.1 * t
    x = season + trend + rng.normal(0, 0.15, n)
    out = x11_decompose(x, p)
    assert np.corrcoef(out["seasonal"], season)[0, 1] > 0.995
    assert np.corrcoef(out["trend"], trend)[0, 1] > 0.998
    # interior (away from the documented symmetric end effects) is tight
    interior = slice(12, -12)
    s_err = out["seasonal"][interior] - (season - season.mean())[interior]
    assert float(np.abs(s_err).max()) < 0.5
    assert float(np.std(out["remainder"])) < 0.4
    assert np.allclose(out["adjusted"], x - out["seasonal"])
    assert np.allclose(out["seasonal"] + out["trend"] + out["remainder"], x)


def test_x11_seasonal_windows_sum_to_zero():
    """Normalization: every centered full-period window of the seasonal
    sums to ~0 (the defining X-11 constraint)."""
    rng = np.random.default_rng(8)
    n, p = 120, 12
    x = 3 * np.sin(2 * np.pi * np.arange(n) / p) + rng.normal(0, 0.2, n)
    s = x11_decompose(x, p)["seasonal"]
    sums = np.convolve(s, np.ones(p), "valid")
    assert float(np.abs(sums[p:-p]).max()) < 0.25


def test_x11_degenerate_short():
    out = x11_decompose(np.array([1.0, 2.0]), 12)
    assert np.allclose(out["trend"], [1, 2])
    assert np.allclose(out["seasonal"], 0)


def test_x11_stats_contract(spark):
    """compute_metrics with decomposition='x11' produces the A2-A4 stats
    row shape over a tier series."""
    import datetime as dt

    from rtsa_spark.operators.metrics import compute_metrics

    rows = []
    base = dt.datetime(2020, 1, 1)
    for src in ("a", "b"):
        for i in range(48):
            v = 100 + (5 if src == "a" else -3) * np.sin(2 * np.pi * i / 12) + 0.5 * i
            rows.append((src, base + dt.timedelta(days=31 * i), float(v)))
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    out = {r["source"]: r for r in compute_metrics(
        df, "monthly", period=12, decomposition="x11"
    ).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["seasonal_amplitude"] > out["b"]["seasonal_amplitude"] * 0.9
    assert out["a"]["trend_slope"] > 0


def test_x11_deterministic_matches_production():
    """The oracle-facing twin (explicit ascending-tap sums) must agree
    with the convolve-based production cascade to quantization slack on
    integer series of assorted lengths, including the short-series
    degenerate branch."""
    import math

    import numpy as np

    from rtsa_spark.functions.x11 import x11_decompose, x11_deterministic_stats

    rng = np.random.default_rng(5)
    for n in (*range(14, 28), 28, 30, 60, 101):  # incl. multi-bounce window
        x = rng.integers(100, 100_000, size=n)
        det = x11_deterministic_stats(x, 7)
        prod = x11_decompose(x.astype("float64"), 7)
        amp = float(prod["seasonal"].max() - prod["seasonal"].min())
        assert abs(det["seas_amp_e4"] - math.floor(1e4 * amp)) <= 1
        assert abs(det["trend_first_e4"] - math.floor(1e4 * prod["trend"][0])) <= 1
        assert abs(det["trend_last_e4"] - math.floor(1e4 * prod["trend"][-1])) <= 1

    short = np.array([5, 9, 7, 8], dtype="int64")
    det = x11_deterministic_stats(short, 7)
    assert det["seas_amp_e4"] == 0
    assert det["trend_first_e4"] == 50000 and det["trend_last_e4"] == 80000


def test_adaptive_ic_selection_and_musgrave_tables():
    """X-11 I/C rule (r3 verdict item 5): the selection thresholds, the
    conventional per-filter Musgrave R values, and the property that
    every asymmetric table row reproduces constants (sums to 1) and
    lines (first moment matches) to float tolerance."""
    import numpy as np

    from rtsa_spark.functions.x11 import (
        HENDERSON_RIC,
        henderson_weights,
        musgrave_table,
        select_henderson,
    )

    assert select_henderson(0.5) == (9, 1.0)
    assert select_henderson(1.0) == (13, 3.5)
    assert select_henderson(3.5) == (13, 3.5)
    assert select_henderson(3.6) == (23, 4.5)
    assert select_henderson(float("inf")) == (23, 4.5)
    for n_terms, r in HENDERSON_RIC.items():
        w = henderson_weights(n_terms)
        H = n_terms // 2
        for q, row in enumerate(musgrave_table(w, r)):
            assert abs(sum(row) - 1.0) < 1e-12  # constants exact
            # minimum-revision linear response: the end filter applied to
            # a line deviates from the symmetric filter only through the
            # documented slope-bias term, which vanishes as R -> 0
            assert len(row) == H + q + 1


def test_x11_adaptive_regimes_match_twin():
    """Production adaptive=True agrees with the deterministic adaptive
    twin (selection AND quantized stats) across all three I/C regimes:
    noisy -> 23-term, integrated smooth -> 9-term, mid -> 13-term."""
    import math

    import numpy as np

    from rtsa_spark.functions.x11 import (
        x11_adaptive_deterministic_stats,
        x11_decompose,
    )

    rng = np.random.default_rng(7)
    noisy = rng.integers(1000, 50_000, size=90)
    smooth = np.cumsum(rng.integers(100, 200, size=90)).astype("int64")
    mid = (1000 + 50 * np.arange(90)
           + rng.integers(-300, 300, size=90)).astype("int64")
    seen = set()
    for series in (noisy, smooth, mid):
        det = x11_adaptive_deterministic_stats(series, 7)
        prod = x11_decompose(series.astype("float64"), 7, adaptive=True)
        assert det["hsel"] == prod["hsel"]
        seen.add(det["hsel"])
        amp = float(prod["seasonal"].max() - prod["seasonal"].min())
        assert abs(det["seas_amp_e4"] - math.floor(1e4 * amp)) <= 1
        assert abs(det["trend_first_e4"]
                   - math.floor(1e4 * prod["trend"][0])) <= 1
        assert abs(det["trend_last_e4"]
                   - math.floor(1e4 * prod["trend"][-1])) <= 1
    assert seen == {9, 13, 23}  # every branch of the rule exercised

    # the 23-term filter is clamped out when the series is too short
    short_noisy = rng.integers(1000, 50_000, size=20)
    det = x11_adaptive_deterministic_stats(short_noisy, 7)
    prod = x11_decompose(short_noisy.astype("float64"), 7, adaptive=True)
    assert det["hsel"] == prod["hsel"] == 13


def test_x11_golden_seasonal_recovery_envelope():
    """Quantified X-11-vs-truth error envelope on the golden monthly
    recipe (348 months, the pacificSST length — FIXTURES.md §F6), the
    honest stand-in for X-13 parity this sandbox can measure (no X-13
    binary; X-13's own recovery error on a stable-seasonality series is
    small, so distance-to-injected-truth bounds the migration divergence
    to first order; R/rtsa.seas.R:275-285 is the delegating reference).

    Pins three facts a migrating user needs:
    1. interior factors (>= 2 years from each end) recover the injected
       seasonal within a few percent of its amplitude;
    2. the DEFAULT (oracle-replayed) normalization collapses the
       outermost ~half-period factors toward zero — a large, documented
       end divergence;
    3. the opt-in norm_ends='periodic' variant removes that collapse
       (whole-series error at interior levels; the cascade feeds ends
       back through the Henderson and phase MAs, so interiors differ
       slightly between rules — both stay inside the envelope).
    """
    import numpy as np

    from rtsa_spark.functions.x11 import x11_decompose

    n = 348
    rng = np.random.default_rng(1982)
    m = np.arange(n)
    tru = np.array(
        [3.2, 2.1, 0.8, -0.5, -1.9, -3.0, -3.4, -2.6, -1.0, 0.7, 2.2, 3.4]
    )
    tru = tru - tru.mean()
    seas = tru[m % 12]
    amp = tru.max() - tru.min()
    x = (
        20 + 0.01 * m + 2 * np.sin(2 * np.pi * m / 240.0)
        + seas + rng.normal(0, 0.3, n)
    )

    err = x11_decompose(x, period=12)["seasonal"] - seas
    core = slice(24, n - 24)
    # measured r5: core max 5.6% / mean 1.5% of amplitude
    assert np.abs(err[core]).max() <= 0.08 * amp
    assert np.abs(err[core]).mean() <= 0.03 * amp
    # the documented default end divergence: last factor collapses to ~0
    assert np.abs(err[-1]) >= 0.4 * amp

    s2p = x11_decompose(x, period=12, norm_ends="periodic")["seasonal"]
    errp = s2p - seas
    # measured r5: whole-series max 5.0% of amplitude under periodic ends
    assert np.abs(errp).max() <= 0.08 * amp
    assert np.abs(errp).mean() <= 0.03 * amp


def test_periodic_normalization_phase_aligned_at_partial_period():
    """Regression (r5 review): periodic end-padding must be phase-correct
    when the series length is NOT a whole number of periods. A zero-mean
    purely periodic seasonal must pass through normalization (nearly)
    unchanged at every position INCLUDING the ends — a raw whole-array
    wrap pad (the pre-fix np.pad(mode='wrap')) lands end pads on wrong
    phases at n % period != 0 and visibly biases the outer factors."""
    from rtsa_spark.functions.x11 import _normalize_seasonal

    period = 12
    pat = np.sin(2 * np.pi * np.arange(period) / period) * 3.0
    pat -= pat.mean()
    for n in (350, 355, 341):  # 2, 7, 5 extra points past a whole period
        s = pat[np.arange(n) % period]
        out = _normalize_seasonal(s, period, ends="periodic")
        assert np.abs(out - s).max() < 1e-9, n
