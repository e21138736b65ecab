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
