"""X-11-style seasonal adjustment core — vectorized numpy (reference M6).

``rtsa.seas`` (``/root/reference/R/rtsa.seas.R:275-285``) delegates to
``seasonal::seas`` (X-13ARIMA-SEATS). The ARIMA pre-adjustment/forecast
machinery is out of scope (SURVEY §2.6 decision), but the X-11 DECOMPOSITION
core itself is a published sequence of moving averages (Shiskin, Young &
Musgrave 1967; summarized in every X-11/X-12 methods paper) and is
implemented here for the additive case:

  B1. initial trend: centered 2x(period) MA;
  B2. initial SI = x - trend; initial seasonal: 3x3 MA over each phase
      subseries, normalized so every centered 2x(period) window of the
      seasonal sums to ~0;
  B3. first pass seasonally adjusted = x - seasonal;
  B4. trend: HENDERSON 13-term filter (weights from the published
      closed-form polynomial, not hard-coded constants — they reproduce
      cubic polynomials exactly, which the tests assert);
  B5. final SI = x - trend; final seasonal: 3x5 MA per phase, normalized;
  B6. final trend: Henderson on the final adjusted series.

End effects use symmetric reflect padding (a documented divergence from
X-11's asymmetric Musgrave end filters — interior values match the
standard filters exactly).

Statistics consumed downstream are the reference's A2-A4 contract
(trend endpoint slope, yearly seasonal amplitude mean/sd —
``R/rtsa.seas.R:314-327``), already produced by
``decompose.component_stats``.
"""

from __future__ import annotations

import numpy as np


def henderson_weights(n_terms: int = 13) -> np.ndarray:
    """Henderson filter weights from the closed-form polynomial.

    For a (2p+1)-term filter let m = p + 2; then for j in [-p, p]:
      w_j = 315 * ((m-1)^2 - j^2) * (m^2 - j^2) * ((m+1)^2 - j^2)
                 * (3m^2 - 16 - 11 j^2)
            / (8 m (m^2-1) (4m^2-1) (4m^2-9) (4m^2-25))
    (standard published form). Weights sum to 1 and annihilate nothing up
    to cubic — the filter passes cubics through unchanged.
    """
    if n_terms % 2 == 0 or n_terms < 5:
        raise ValueError("Henderson filter needs an odd term count >= 5")
    p = n_terms // 2
    m = p + 2
    j = np.arange(-p, p + 1, dtype="float64")
    num = (
        315.0
        * ((m - 1) ** 2 - j**2)
        * (m**2 - j**2)
        * ((m + 1) ** 2 - j**2)
        * (3 * m**2 - 16 - 11 * j**2)
    )
    den = (
        8.0 * m * (m**2 - 1) * (4 * m**2 - 1) * (4 * m**2 - 9) * (4 * m**2 - 25)
    )
    return num / den


def _sym_filter(x: np.ndarray, w: np.ndarray, odd: bool = True) -> np.ndarray:
    """Symmetric filter, length-preserving. Ends use ODD reflection by
    default (point-reflection through the end value), which passes linear
    trends through exactly — the cheap stand-in for X-11's asymmetric
    Musgrave end filters (documented divergence; interior is exact)."""
    half = len(w) // 2
    if len(x) < 2:
        return x.astype("float64", copy=True)
    xp = np.pad(
        x, (half, half), mode="reflect", reflect_type="odd" if odd else "even"
    )
    return np.convolve(xp, w, mode="valid")


def _ma2xp(x: np.ndarray, period: int, odd: bool = True) -> np.ndarray:
    """Centered 2x(period) MA (split end weights for even periods).
    Taps come from x11_weight_lists — the single source of truth shared
    with the deterministic twin and its SQL oracle."""
    w = np.array(x11_weight_lists(period)["ma_p"], dtype="float64")
    return _sym_filter(x, w, odd=odd)


def _seasonal_ma(si: np.ndarray, period: int, kind: str) -> np.ndarray:
    """3x3 or 3x5 MA over each phase subseries of the SI ratios."""
    wl = x11_weight_lists(0)  # 3x3/3x5 taps are period-independent
    w = np.array(wl["m3x3" if kind == "3x3" else "m3x5"], dtype="float64")
    out = np.empty_like(si, dtype="float64")
    for ph in range(period):
        sub = si[ph::period]
        # detrended SI subseries are level-ish: even reflection is right
        out[ph::period] = _sym_filter(sub, w, odd=False)
    return out


def _normalize_seasonal(s: np.ndarray, period: int) -> np.ndarray:
    """X-11 seasonal normalization: subtract the centered 2x(period) MA of
    the raw seasonal so any full-period window sums to ~0."""
    return s - _ma2xp(s, period)


def x11_decompose(x: np.ndarray, period: int = 12) -> dict[str, np.ndarray]:
    """Additive X-11-core decomposition. Returns seasonal/trend/remainder
    plus the seasonally adjusted series (the slot rtsa.seas reports —
    noting its Q3 slot mix-up is NOT reproduced; columns here are named by
    meaning)."""
    x = np.asarray(x, dtype="float64")
    n = len(x)
    if n < 2 * period or period < 2:
        return {
            "seasonal": np.zeros(n),
            "trend": x.copy(),
            "remainder": np.zeros(n),
            "adjusted": x.copy(),
        }
    # short series still get a valid (>=5-term) filter: reflect padding
    # makes a kernel longer than the series well-defined
    hw = henderson_weights(max(5, 13 if n >= 13 else (n if n % 2 == 1 else n - 1)))
    # B1-B2: initial estimate
    t1 = _ma2xp(x, period)
    s1 = _normalize_seasonal(_seasonal_ma(x - t1, period, "3x3"), period)
    # B3-B4: first adjusted pass + Henderson trend
    t2 = _sym_filter(x - s1, hw)
    # B5: final seasonal from the Henderson-detrended SI
    s2 = _normalize_seasonal(_seasonal_ma(x - t2, period, "3x5"), period)
    # B6: final trend on the final adjusted series
    adjusted = x - s2
    t3 = _sym_filter(adjusted, hw)
    return {
        "seasonal": s2,
        "trend": t3,
        "remainder": x - s2 - t3,
        "adjusted": adjusted,
    }


def _refl_even(j: int, m: int) -> int:
    """np.pad mode='reflect' (even) index for ANY distance: the reflected
    sequence is periodic with period 2(m-1) (triangle wave), so a floor-mod
    fold handles multi-bounce — phase subseries can be shorter than the
    3x3/3x5 half-widths when n is just past the 2*period gate."""
    r = j % (2 * m - 2)
    return 2 * (m - 1) - r if r >= m else r


def _val_odd(arr: list, j: int, m: int) -> float:
    """ODD (point) reflection value: 2*edge - mirrored, matching
    np.pad(..., mode='reflect', reflect_type='odd')."""
    if 0 <= j < m:
        return arr[j]
    if j < 0:
        return 2.0 * arr[0] - arr[-j]
    return 2.0 * arr[m - 1] - arr[2 * (m - 1) - j]


def _filt_ordered(arr: list, w: list, odd: bool) -> list:
    """Length-preserving symmetric filter with an EXPLICIT ascending-tap
    summation order (the IEEE-deterministic twin of _sym_filter: same
    values up to summation order, bit-replayable in SQL)."""
    m = len(arr)
    if m < 2:
        return list(arr)
    half = len(w) // 2
    out = []
    for i in range(m):
        s = 0.0
        for d in range(-half, half + 1):
            j = i + d
            v = _val_odd(arr, j, m) if odd else arr[_refl_even(j, m)]
            s += w[d + half] * v
        out.append(s)
    return out


def _phase_filt_ordered(si: list, period: int, w: list) -> list:
    """Per-phase subseries filter (EVEN reflection), ascending taps."""
    n = len(si)
    out = [0.0] * n
    for ph in range(period):
        sub = [si[ph + period * k] for k in range((n - 1 - ph) // period + 1)]
        f = _filt_ordered(sub, w, odd=False)
        for k, v in enumerate(f):
            out[ph + period * k] = v
    return out


def x11_weight_lists(period: int) -> dict[str, list[float]]:
    """The exact double tap values of the X-11 cascade filters, exposed so
    the SQL oracle can embed them as literals (repr round-trips doubles,
    so both engines compute with bit-identical constants)."""
    out = {
        "m3x3": [float(v) for v in
                 np.array([1, 2, 3, 2, 1], dtype="float64") / 9.0],
        "m3x5": [float(v) for v in
                 np.array([1, 2, 3, 3, 3, 2, 1], dtype="float64") / 15.0],
        "h13": [float(v) for v in henderson_weights(13)],
    }
    if period >= 1:  # the 2xp MA is only defined for a real period
        out["ma_p"] = (
            [1.0 / period] * period if period % 2 == 1 else
            [1.0 / (2 * period)] + [1.0 / period] * (period - 1)
            + [1.0 / (2 * period)]
        )
    return out


def x11_deterministic_stats(x, period: int = 7) -> dict:
    """Oracle-facing X-11 twin (reference M6 core, ``R/rtsa.seas.R:275-285``)
    over an INTEGER series: runs the same B1-B6 moving-average cascade as
    :func:`x11_decompose` with explicit ascending-tap summation and the
    shared :func:`x11_weight_lists` constants, then emits quantized stats
    — floor(1e4 * seasonal amplitude) and floor(1e4 * trend endpoints).
    Every op is a fixed correctly-rounded sequence a DuckDB oracle replays
    bit-exactly; pytest pins :func:`x11_decompose` to these values."""
    import math

    xs = [float(v) for v in x]
    n = len(xs)
    if n < 2 * period or period < 2:
        # degenerate contract of x11_decompose: zero seasonal, trend = x
        return {
            "seas_amp_e4": 0 if n else None,
            "trend_first_e4": math.floor(10000.0 * xs[0]) if n else None,
            "trend_last_e4": math.floor(10000.0 * xs[-1]) if n else None,
        }
    comp = x11_deterministic_components(x, period)
    s2, t3 = comp["s2"], comp["t3"]
    return {
        "seas_amp_e4": math.floor(10000.0 * (max(s2) - min(s2))),
        "trend_first_e4": math.floor(10000.0 * t3[0]),
        "trend_last_e4": math.floor(10000.0 * t3[n - 1]),
    }


def x11_deterministic_components(x, period: int = 7) -> dict | None:
    """The deterministic cascade's component LISTS (final seasonal ``s2``
    and trend ``t3``) for oracle queries that need per-cycle values —
    e.g. the yearly seasonal-amplitude stats (A4, ``R/rtsa.seas.R:314-316``).
    Same op sequence as :func:`x11_deterministic_stats`; returns None for
    the degenerate short-series case (n < 2*period)."""
    xs = [float(v) for v in x]
    n = len(xs)
    if n < 2 * period or period < 2:
        return None
    w = x11_weight_lists(period)
    if n < 13:
        hw = [float(v) for v in
              henderson_weights(max(5, n if n % 2 == 1 else n - 1))]
    else:
        hw = w["h13"]

    def sub(a, b):
        return [a[i] - b[i] for i in range(n)]

    t1 = _filt_ordered(xs, w["ma_p"], odd=True)
    s1p = _phase_filt_ordered(sub(xs, t1), period, w["m3x3"])
    s1 = sub(s1p, _filt_ordered(s1p, w["ma_p"], odd=True))
    t2 = _filt_ordered(sub(xs, s1), hw, odd=True)
    s2p = _phase_filt_ordered(sub(xs, t2), period, w["m3x5"])
    s2 = sub(s2p, _filt_ordered(s2p, w["ma_p"], odd=True))
    t3 = _filt_ordered(sub(xs, s2), hw, odd=True)
    return {"s2": s2, "t3": t3, "n": n}
