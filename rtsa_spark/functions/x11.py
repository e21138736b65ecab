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

End effects: the HENDERSON passes use X-11's asymmetric MUSGRAVE end
filters (Musgrave 1964 minimum-revision construction; closed form as in
Doherty 2001, "The surrogate Henderson filters in X-11", with the
standard I/C ratio 3.5 for the 13-term filter). The 2x(period) and
seasonal 3x3/3x5 MAs still use reflect padding (a smaller, documented
divergence — X-11's hand-derived seasonal end tables are not reproduced).

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


def musgrave_weights(w, q: int, r_ic: float = 3.5) -> np.ndarray:
    """Musgrave asymmetric end weights for a symmetric filter ``w``
    (2H+1 terms) when only ``q`` future points are available (0 <= q <= H).

    Minimum-revision construction (Musgrave 1964; closed form per Doherty
    2001 / Ladiray & Quenneville 2001 ch. 3): with available taps
    j = -H..q, mean mu = (q-H)/2, and D = 4 / (pi * R^2) where R is the
    I/C (noise-to-slope) ratio — R = 3.5 is X-11's value for the 13-term
    Henderson — the end weights are

      u_j = w_j + S0/(H+q+1) + (j-mu) * D / (1 + D*sum_k (k-mu)^2) * S1

    where S0/S1 are the plain/linear-moment sums of the UNAVAILABLE
    weights. u reproduces constants exactly (sum u = 1); q = H returns w
    unchanged. Returns the length-(H+q+1) vector for taps -H..q (the
    RIGHT end of a series; the left end uses the reversed vector)."""
    w = np.asarray(w, dtype="float64")
    H = len(w) // 2
    if not 0 <= q <= H:
        raise ValueError(f"q must be in [0, {H}], got {q}")
    if q == H:
        return w.copy()
    idx = np.arange(-H, H + 1, dtype="float64")
    miss = idx > q
    mu = (q - H) / 2.0
    D = 4.0 / (np.pi * r_ic * r_ic)
    S0 = float(w[miss].sum())
    S1 = float(((idx[miss] - mu) * w[miss]).sum())
    avail = ~miss
    denom = 1.0 + D * float(((idx[avail] - mu) ** 2).sum())
    return w[avail] + S0 / (H + q + 1) + (idx[avail] - mu) * (D / denom) * S1


def musgrave_table(w, r_ic: float = 3.5) -> list[list[float]]:
    """End-weight table [u_0, ..., u_{H-1}] (u_q = weights with q future
    points) as exact Python doubles — the single source shared by the
    production kernel, the deterministic twin, and the SQL oracle."""
    H = len(np.asarray(w)) // 2
    return [[float(v) for v in musgrave_weights(w, q, r_ic)] for q in range(H)]


def _henderson_filter(
    x: np.ndarray, hw: np.ndarray, end_table: list[list[float]] | None = None
) -> np.ndarray:
    """Length-preserving Henderson trend filter: symmetric weights in the
    interior, Musgrave asymmetric weights over the first/last H points
    (left end = reversed right-end vectors). Falls back to odd-reflection
    :func:`_sym_filter` when the series is shorter than the filter
    (2H+1), where one-sided truncation no longer holds."""
    x = np.asarray(x, dtype="float64")
    hw = np.asarray(hw, dtype="float64")
    n, H = len(x), len(hw) // 2
    if n < 2 * H + 1:
        return _sym_filter(x, hw)
    if end_table is None:
        end_table = musgrave_table(hw)
    out = np.empty(n, dtype="float64")
    out[H : n - H] = np.convolve(x, hw, mode="valid")
    for q in range(H):
        aq = np.asarray(end_table[q], dtype="float64")
        out[n - 1 - q] = float(np.dot(aq, x[n - 1 - q - H :]))
        out[q] = float(np.dot(aq[::-1], x[: q + H + 1]))
    return out


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


def _normalize_seasonal(
    s: np.ndarray, period: int, ends: str = "reflect"
) -> np.ndarray:
    """X-11 seasonal normalization: subtract the centered 2x(period) MA of
    the raw seasonal so any full-period window sums to ~0.

    ``ends``: end-padding of the normalization MA. ``"reflect"`` (default,
    the oracle-replayed rule) odd-reflects — which near the boundaries
    subtracts most of the seasonal itself, collapsing the outermost
    ~period/2 factors toward zero (quantified in FIXTURES.md §F6 and
    pinned by tests/test_x11.py::test_x11_golden_seasonal_recovery).
    ``"periodic"`` wrap-pads — semantically right for a seasonal series —
    which removes the collapse entirely (measured: whole-series max error
    drops from ~50% of seasonal amplitude at the last point to ~5%).
    Opt-in via ``x11_decompose(norm_ends="periodic")``; the default stays
    bit-compatible with the deterministic twin and its SQL oracle."""
    if ends == "periodic":
        w = np.array(x11_weight_lists(period)["ma_p"], dtype="float64")
        half = len(w) // 2
        n = len(s)
        if n < period or half >= period:
            return s - _ma2xp(s, period)
        # Phase-correct one-period pad: position -i takes s[period - i]
        # and position n-1+i takes s[n - period - 1 + i] — same phase one
        # period inward. A raw np.pad(mode="wrap") (whole-array wrap) is
        # only phase-aligned when n % period == 0; otherwise the left pad
        # lands on the wrong phases and the normalization MA subtracts a
        # seasonal-contaminated baseline, re-biasing the end factors this
        # option exists to fix.
        xp = np.concatenate(
            [s[period - half : period], s, s[n - period : n - period + half]]
        )
        return s - np.convolve(xp, w, mode="valid")
    return s - _ma2xp(s, period)


# X-11's conventional Musgrave I/C ratios per Henderson length (Doherty
# 2001; Ladiray & Quenneville 2001 ch. 3): the R assumed when deriving
# the asymmetric end weights of each filter.
HENDERSON_RIC = {5: 0.001, 9: 1.0, 13: 3.5, 23: 4.5}


def select_henderson(ic: float) -> tuple[int, float]:
    """X-11's monthly trend-filter selection from the measured I/C
    (noise-to-slope) ratio: < 1 -> 9-term, <= 3.5 -> 13-term, else
    23-term — each with its conventional Musgrave R from
    :data:`HENDERSON_RIC`. (``rtsa.seas`` delegates to X-13, which
    applies this same rule internally; the r3 verdict flagged the fixed
    13/3.5 as a documented divergence — this closes it.)"""
    if ic < 1.0:
        n = 9
    elif ic <= 3.5:
        n = 13
    else:
        n = 23
    return n, HENDERSON_RIC[n]


def ic_ratio(irregular: np.ndarray, trend: np.ndarray) -> float:
    """X-11 I/C ratio: mean |first difference| of the irregular over the
    trend — computed as the single quotient of the two difference sums
    (same count cancels; one divide keeps it IEEE-deterministic).
    Returns inf for a perfectly flat trend."""
    di = float(np.sum(np.abs(np.diff(irregular))))
    dc = float(np.sum(np.abs(np.diff(trend))))
    return float("inf") if dc == 0.0 else di / dc


def x11_decompose(
    x: np.ndarray,
    period: int = 12,
    adaptive: bool = False,
    norm_ends: str = "reflect",
) -> dict[str, np.ndarray]:
    """Additive X-11-core decomposition. Returns seasonal/trend/remainder
    plus the seasonally adjusted series (the slot rtsa.seas reports —
    noting its Q3 slot mix-up is NOT reproduced; columns here are named by
    meaning).

    ``adaptive=True`` applies X-11's I/C rule: the B-stage irregular from
    the default 13-term pass measures the noise-to-slope ratio, which
    selects Henderson 9/13/23 (+ its conventional Musgrave R) for the
    final trend passes — clamped back to 13 when the series is shorter
    than the 23-term filter. The returned dict gains ``hsel``/``ic``.

    ``norm_ends``: see :func:`_normalize_seasonal` — ``"periodic"`` opts
    into wrap-padded seasonal normalization, fixing the boundary factor
    collapse at the cost of bit-compatibility with the SQL oracle."""
    x = np.asarray(x, dtype="float64")
    n = len(x)
    if n < 2 * period or period < 2:
        out = {
            "seasonal": np.zeros(n),
            "trend": x.copy(),
            "remainder": np.zeros(n),
            "adjusted": x.copy(),
        }
        if adaptive:
            out["hsel"], out["ic"] = 13, float("nan")
        return out
    # short series still get a valid (>=5-term) filter: reflect padding
    # makes a kernel longer than the series well-defined
    hw = henderson_weights(max(5, 13 if n >= 13 else (n if n % 2 == 1 else n - 1)))
    # B1-B2: initial estimate
    t1 = _ma2xp(x, period)
    s1 = _normalize_seasonal(
        _seasonal_ma(x - t1, period, "3x3"), period, ends=norm_ends
    )
    # B3-B4: first adjusted pass + Henderson trend (Musgrave ends)
    hend = musgrave_table(hw)
    adj1 = x - s1
    t2 = _henderson_filter(adj1, hw, hend)
    hsel, ic = len(hw), float("nan")
    if adaptive and n >= 13:
        ic = ic_ratio(adj1 - t2, t2)
        hsel, r_sel = select_henderson(ic)
        if hsel == 23 and n < 24:
            hsel, r_sel = 13, HENDERSON_RIC[13]
        if hsel != len(hw):
            hw = henderson_weights(hsel)
            hend = musgrave_table(hw, r_sel)
            t2 = _henderson_filter(adj1, hw, hend)
    # B5: final seasonal from the Henderson-detrended SI
    s2 = _normalize_seasonal(
        _seasonal_ma(x - t2, period, "3x5"), period, ends=norm_ends
    )
    # B6: final trend on the final adjusted series
    adjusted = x - s2
    t3 = _henderson_filter(adjusted, hw, hend)
    out = {
        "seasonal": s2,
        "trend": t3,
        "remainder": x - s2 - t3,
        "adjusted": adjusted,
    }
    if adaptive:
        out["hsel"], out["ic"] = hsel, ic
    return out


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


def _filt_henderson_ordered(arr: list, hw: list, ends: list[list[float]]) -> list:
    """IEEE-deterministic twin of :func:`_henderson_filter`: interior
    symmetric taps, Musgrave ends, EXPLICIT ascending-tap summation (the
    order the SQL oracle replays). Requires n >= len(hw); callers guard."""
    n, H = len(arr), len(hw) // 2
    out = []
    for i in range(n):
        s = 0.0
        if i < H:  # left end: q = i past points; reversed right-end vector
            aq = ends[i]
            for d in range(-i, H + 1):
                s += aq[H - d] * arr[i + d]
        elif n - 1 - i < H:  # right end: q = n-1-i future points
            q = n - 1 - i
            aq = ends[q]
            for d in range(-H, q + 1):
                s += aq[d + H] * arr[i + d]
        else:
            for d in range(-H, H + 1):
                s += hw[d + H] * arr[i + d]
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


import functools


@functools.lru_cache(maxsize=32)
def x11_weight_lists(period: int) -> dict[str, list[float]]:
    """The exact double tap values of the X-11 cascade filters, exposed so
    the SQL oracle can embed them as literals (repr round-trips doubles,
    so both engines compute with bit-identical constants). Cached per
    period (the Musgrave table costs ~40 numpy ops and this is called
    several times per kernel invocation) — callers must treat the
    returned dict as read-only."""
    out = {
        "m3x3": [float(v) for v in
                 np.array([1, 2, 3, 2, 1], dtype="float64") / 9.0],
        "m3x5": [float(v) for v in
                 np.array([1, 2, 3, 3, 3, 2, 1], dtype="float64") / 15.0],
        "h13": [float(v) for v in henderson_weights(13)],
        "h9": [float(v) for v in henderson_weights(9)],
        "h23": [float(v) for v in henderson_weights(23)],
    }
    out["h13_end"] = musgrave_table(out["h13"], HENDERSON_RIC[13])
    out["h9_end"] = musgrave_table(out["h9"], HENDERSON_RIC[9])
    out["h23_end"] = musgrave_table(out["h23"], HENDERSON_RIC[23])
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
        hend = musgrave_table(hw)
    else:
        hw = w["h13"]
        hend = w["h13_end"]

    def sub(a, b):
        return [a[i] - b[i] for i in range(n)]

    t1 = _filt_ordered(xs, w["ma_p"], odd=True)
    s1p = _phase_filt_ordered(sub(xs, t1), period, w["m3x3"])
    s1 = sub(s1p, _filt_ordered(s1p, w["ma_p"], odd=True))
    t2 = (_filt_henderson_ordered(sub(xs, s1), hw, hend) if n >= len(hw)
          else _filt_ordered(sub(xs, s1), hw, odd=True))
    s2p = _phase_filt_ordered(sub(xs, t2), period, w["m3x5"])
    s2 = sub(s2p, _filt_ordered(s2p, w["ma_p"], odd=True))
    t3 = (_filt_henderson_ordered(sub(xs, s2), hw, hend) if n >= len(hw)
          else _filt_ordered(sub(xs, s2), hw, odd=True))
    return {"s2": s2, "t3": t3, "n": n}


def x11_adaptive_deterministic_stats(x, period: int = 7) -> dict:
    """ADAPTIVE-I/C twin of :func:`x11_deterministic_stats` (closes the
    r3 verdict's fixed-3.5 divergence): runs the B1-B4 cascade with the
    default Henderson-13, measures the I/C ratio from the B-stage
    irregular — the single quotient of the two EXPLICIT ascending-index
    absolute-difference sums, so both engines branch identically — then
    re-runs the trend passes with the selected Henderson 9/13/23 and its
    conventional Musgrave R (:data:`HENDERSON_RIC`), clamped to 13 when
    n < 24 rules the 23-term filter out. Emits ``hsel`` and
    ``ic_e6 = floor(1e6 * ic)`` (NULL for a flat trend, which selects
    the 23-term branch as I/C -> inf)."""
    import math

    xs = [float(v) for v in x]
    n = len(xs)
    if n < 2 * period or period < 2:
        return {
            "hsel": 13 if n else None,
            "ic_e6": None,
            "seas_amp_e4": 0 if n else None,
            "trend_first_e4": math.floor(10000.0 * xs[0]) if n else None,
            "trend_last_e4": math.floor(10000.0 * xs[-1]) if n else None,
        }
    w = x11_weight_lists(period)
    if n < 13:
        # too short for any selection: same fallback as the plain twin
        base = x11_deterministic_stats(x, period)
        return {"hsel": None, "ic_e6": None, **base}

    def sub(a, b):
        return [a[i] - b[i] for i in range(n)]

    t1 = _filt_ordered(xs, w["ma_p"], odd=True)
    s1p = _phase_filt_ordered(sub(xs, t1), period, w["m3x3"])
    s1 = sub(s1p, _filt_ordered(s1p, w["ma_p"], odd=True))
    adj1 = sub(xs, s1)
    t2 = _filt_henderson_ordered(adj1, w["h13"], w["h13_end"])
    # I/C: ordered ascending-index abs-difference sums, one divide
    di = 0.0
    for k in range(1, n):
        di += abs((adj1[k] - t2[k]) - (adj1[k - 1] - t2[k - 1]))
    dc = 0.0
    for k in range(1, n):
        dc += abs(t2[k] - t2[k - 1])
    if dc == 0.0:
        hsel, ic_e6 = 23, None
    else:
        ic = di / dc
        ic_e6 = math.floor(1e6 * ic)
        hsel = 9 if ic < 1.0 else (13 if ic <= 3.5 else 23)
    if hsel == 23 and n < 24:
        hsel = 13
    hw = w[f"h{hsel}"]
    hend = w[f"h{hsel}_end"]
    if hsel != 13:
        t2 = _filt_henderson_ordered(adj1, hw, hend)
    s2p = _phase_filt_ordered(sub(xs, t2), period, w["m3x5"])
    s2 = sub(s2p, _filt_ordered(s2p, w["ma_p"], odd=True))
    t3 = _filt_henderson_ordered(sub(xs, s2), hw, hend)
    return {
        "hsel": hsel,
        "ic_e6": ic_e6,
        "seas_amp_e4": math.floor(10000.0 * (max(s2) - min(s2))),
        "trend_first_e4": math.floor(10000.0 * t3[0]),
        "trend_last_e4": math.floor(10000.0 * t3[n - 1]),
    }
