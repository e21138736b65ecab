"""Seasonal-trend decomposition (additive, periodic-seasonal) — vectorized.

The reference runs ``stlplus::stlplus`` per pixel with the default
``s.window="periodic"`` (``/root/reference/R/rtsa.stl.R:148,360``), then keeps
only three statistics of the components (``:363-375``). With a periodic
seasonal window, STL's seasonal converges to per-phase means of the
detrended series — which IS expressible in closed form. We implement the
classical additive decomposition with that periodic seasonal:

1. initial trend: centered moving average, window = period (split-weight
   ends for even periods), reflect-padded;
2. seasonal: per-phase mean of (x - trend), centered to zero mean;
3. final trend: centered moving average of the deseasonalized series
   (window = period, odd-ized), reflect-padded;
4. remainder = x - seasonal - trend.

Statistics match the reference formulas exactly:
- seasonal_amplitude = max(seasonal) - min(seasonal)    (R/rtsa.stl.R:363)
- trend_slope = (trend[T]-trend[1]) / (t[T]-t[1])       (R/rtsa.stl.R:366-373
  — endpoints, NOT a regression)
- remainder_stdev = sample sd, n-1                      (R/rtsa.stl.R:375)
- yearly seasonal amplitude mean/stdev                  (R/rtsa.seas.R:314-316)

This is a deliberate re-expression, not an stlplus port: the loess inner
loop buys little once s.window is periodic, and per-phase means + moving
averages are O(n) numpy with no iteration.
"""

from __future__ import annotations

import math

import numpy as np


def _centered_ma(x: np.ndarray, window: int) -> np.ndarray:
    """Centered moving average with reflect padding; even windows use the
    classic split-end weights (X-11 2x(period) MA)."""
    n = len(x)
    if window <= 1 or n == 0:
        return x.astype(np.float64, copy=True)
    if window % 2 == 1:
        w = np.full(window, 1.0 / window)
        half = window // 2
    else:
        w = np.full(window + 1, 1.0 / window)
        w[0] = w[-1] = 1.0 / (2 * window)
        half = window // 2
    xp = np.pad(x, (half, half), mode="reflect" if n > 1 else "edge")
    return np.convolve(xp, w, mode="valid")


def decompose(x: np.ndarray, period: int) -> dict[str, np.ndarray]:
    """Additive decomposition of a regular series. NaN-free input expected
    (run gap-fill first); series shorter than 2*period get a degenerate
    decomposition (zero seasonal, trend = series)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2 * period or period < 2:
        return {
            "seasonal": np.zeros(n),
            "trend": x.copy(),
            "remainder": np.zeros(n),
        }
    trend0 = _centered_ma(x, period)
    detrended = x - trend0
    phases = np.arange(n) % period
    phase_means = np.full(period, np.nan)
    for ph in range(period):
        phase_means[ph] = detrended[phases == ph].mean()
    phase_means -= phase_means.mean()  # center seasonal at 0
    seasonal = phase_means[phases]
    deseason = x - seasonal
    window = period if period % 2 == 1 else period + 1
    trend = _centered_ma(deseason, window)
    return {"seasonal": seasonal, "trend": trend, "remainder": x - seasonal - trend}


def decompose_deterministic_stats(
    x_int: np.ndarray, period: int, span_seconds: int
) -> dict[str, object]:
    """IEEE-deterministic decomposition statistics over an INTEGER series —
    the oracle-facing variant of :func:`decompose` + :func:`component_stats`.

    Every multi-term summation stays in exact int64 arithmetic (windowed MA
    numerators, per-phase detrended sums, deseasonalized window sums with a
    common denominator); floating point appears only in a fixed, final
    sequence of correctly-rounded ops (one divide / subtract / floor per
    statistic). Any engine replaying the same integer recipe (e.g. the
    DuckDB list-based oracle in ``__spark_entry__``) produces bit-identical
    doubles, so ``floor``-scaled outputs hash-match exactly.

    Math matches :func:`decompose` (same reflect padding, same per-phase
    means, same final moving average on the deseasonalized series); pytest
    asserts the float64 production kernel agrees to ~1e-9. Returns
    ``seasonal_amplitude_e4``, ``trend_slope_e9`` (None when span==0) — and
    the building blocks for tests.
    """
    x = np.asarray(x_int, dtype=np.int64)
    n = len(x)
    if n == 0:
        return {"seasonal_amplitude_e4": None, "trend_slope_e9": None}
    if n < 2 * period or period < 2:
        # degenerate contract of decompose(): zero seasonal, trend = x
        amp_e4 = 0
        slope_e9 = (
            (1_000_000_000 * (int(x[-1]) - int(x[0]))) // span_seconds
            if span_seconds > 0 and n >= 2
            else None
        )
        return {"seasonal_amplitude_e4": amp_e4, "trend_slope_e9": slope_e9}

    p = period
    half = p // 2
    xp = np.pad(x, (half, half), mode="reflect")
    if p % 2 == 1:
        den = p
        # t0_num[i] = sum of the p-wide window (integer numerator, den = p)
        kern = np.ones(p, dtype=np.int64)
    else:
        den = 2 * p
        kern = np.full(p + 1, 2, dtype=np.int64)
        kern[0] = kern[-1] = 1
    t0_num = np.convolve(xp, kern, mode="valid")  # int64 convolution: exact
    detr_num = den * x - t0_num

    phases = np.arange(n) % p
    q, r = divmod(n, p)
    c_ph = np.where(np.arange(p) < r, q + 1, q).astype(np.int64)
    ph_sum = np.zeros(p, dtype=np.int64)
    np.add.at(ph_sum, phases, detr_num)

    # amplitude: max-min of phase means (centering cancels); one float
    # division per phase of exact ints -> bit-identical across engines
    ph_mean = ph_sum.astype(np.float64) / (den * c_ph).astype(np.float64)
    amp = float(ph_mean.max() - ph_mean.min())
    amp_e4 = math.floor(10000.0 * amp)

    # final trend endpoints on the deseasonalized series, common denominator
    # D2 = den * Q * p with Q = q*(q+1) (c_ph | Q for both count values)
    Q = q * (q + 1) if q > 0 else 1
    D2 = den * Q * p
    overall_num = int(np.sum(ph_sum * (Q // np.maximum(c_ph, 1))))  # = D2*overall/p... see below
    s_num = ph_sum * ((Q * p) // np.maximum(c_ph, 1)) - overall_num
    deseason_num = D2 * x - s_num[phases]
    w = p if p % 2 == 1 else p + 1
    wh = w // 2
    dp = np.pad(deseason_num, (wh, wh), mode="reflect")
    first_num = int(dp[:w].sum())
    last_num = int(dp[-w:].sum())
    if span_seconds > 0:
        # exact integer floor division (Python bigints: D2*w*span can pass 2^63)
        slope_e9 = (1_000_000_000 * (last_num - first_num)) // (D2 * w * span_seconds)
    else:
        slope_e9 = None
    return {
        "seasonal_amplitude_e4": int(amp_e4),
        "trend_slope_e9": int(slope_e9) if slope_e9 is not None else None,
        "_ph_mean": ph_mean,
        "_D2": D2,
    }


def component_stats(
    seasonal: np.ndarray,
    trend: np.ndarray,
    remainder: np.ndarray,
    times: np.ndarray,
    period: int,
) -> dict[str, float]:
    """The reference's component statistics (citations in module header)."""
    n = len(trend)
    out: dict[str, float] = {}
    out["seasonal_amplitude"] = float(seasonal.max() - seasonal.min()) if n else float("nan")
    if n >= 2 and times[-1] != times[0]:
        out["trend_slope"] = float((trend[-1] - trend[0]) / (times[-1] - times[0]))
    else:
        out["trend_slope"] = float("nan")
    out["remainder_stdev"] = float(np.std(remainder, ddof=1)) if n >= 2 else float("nan")
    # yearly (per full cycle) amplitude mean/stdev — R/rtsa.seas.R:314-316
    n_cycles = n // period if period > 0 else 0
    if n_cycles >= 1:
        amps = np.array(
            [
                seasonal[c * period : (c + 1) * period].max()
                - seasonal[c * period : (c + 1) * period].min()
                for c in range(n_cycles)
            ]
        )
        out["seas_amp_cycle_mean"] = float(amps.mean())
        out["seas_amp_cycle_stdev"] = (
            float(np.std(amps, ddof=1)) if n_cycles >= 2 else float("nan")
        )
    else:
        out["seas_amp_cycle_mean"] = float("nan")
        out["seas_amp_cycle_stdev"] = float("nan")
    return out
