"""Interpolation kernels for gap-fill: natural cubic spline, monotone
(Fritsch-Carlson) cubic, and Stineman's rational interpolant — the
reference's W4 'spline'/'stine' methods
(``/root/reference/R/rtsa_gapfill.R:185-204``, delegating to
``imputeTS::na.interpolation``'s splinefun/stinterp).

'stine' runs :func:`stineman` — the rational-correction interpolant from
Stineman (1980, "A consistently well-behaved method of interpolation",
Creative Computing 6(7)), the same construction R's stinepack::stinterp
evaluates. Slope estimates use the weighted-secant ("parabola") rule, one
of stinepack's published slope options; the interpolant formula — the part
that gives Stineman its no-overshoot, well-behaved character — is exactly
the published one. The PCHIP variant remains available as 'pchip'.

numpy only (no scipy in this container). The spline solve is the Thomas
tridiagonal algorithm — O(n) with one short loop over KNOTS (bucket-
bounded, never row-bounded); evaluation is fully vectorized.
"""

from __future__ import annotations

import numpy as np


def natural_cubic_spline(
    x_obs: np.ndarray, y_obs: np.ndarray, x_new: np.ndarray
) -> np.ndarray:
    """Natural cubic spline (second derivative 0 at ends), evaluated at
    x_new. x_obs strictly increasing, len >= 2 (falls back to linear for 2)."""
    n = len(x_obs)
    if n < 2:
        return np.full(len(x_new), y_obs[0] if n else np.nan)
    if n == 2:
        return np.interp(x_new, x_obs, y_obs)
    h = np.diff(x_obs)
    # tridiagonal system for second derivatives m[1..n-2]; m[0]=m[n-1]=0
    rhs = 6.0 * np.diff(np.diff(y_obs) / h)
    diag = 2.0 * (h[:-1] + h[1:])
    upper = h[1:-1].copy()
    lower = h[1:-1].copy()
    m_inner = np.zeros(n - 2)
    # Thomas algorithm (loop over knots, not rows)
    c_prime = np.zeros(n - 2)
    d_prime = np.zeros(n - 2)
    c_prime[0] = upper[0] / diag[0] if n > 3 else 0.0
    d_prime[0] = rhs[0] / diag[0]
    for i in range(1, n - 2):
        denom = diag[i] - lower[i - 1] * c_prime[i - 1]
        if i < n - 3:
            c_prime[i] = upper[i] / denom
        d_prime[i] = (rhs[i] - lower[i - 1] * d_prime[i - 1]) / denom
    m_inner[-1] = d_prime[-1]
    for i in range(n - 4, -1, -1):
        m_inner[i] = d_prime[i] - c_prime[i] * m_inner[i + 1]
    m = np.concatenate([[0.0], m_inner, [0.0]])

    idx = np.clip(np.searchsorted(x_obs, x_new, side="right") - 1, 0, n - 2)
    x0, x1 = x_obs[idx], x_obs[idx + 1]
    y0, y1 = y_obs[idx], y_obs[idx + 1]
    m0, m1 = m[idx], m[idx + 1]
    hseg = x1 - x0
    a = (x1 - x_new) / hseg
    b = (x_new - x0) / hseg
    return (
        a * y0
        + b * y1
        + ((a**3 - a) * m0 + (b**3 - b) * m1) * hseg**2 / 6.0
    )


def monotone_cubic(
    x_obs: np.ndarray, y_obs: np.ndarray, x_new: np.ndarray
) -> np.ndarray:
    """Fritsch-Carlson monotone cubic (PCHIP): shape-preserving, no
    overshoot — the 'stine'-class interpolant. Fully vectorized."""
    n = len(x_obs)
    if n < 2:
        return np.full(len(x_new), y_obs[0] if n else np.nan)
    h = np.diff(x_obs)
    delta = np.diff(y_obs) / h
    d = np.empty(n)
    d[0], d[-1] = delta[0], delta[-1]
    if n > 2:
        w1 = 2 * h[1:] + h[:-1]
        w2 = h[1:] + 2 * h[:-1]
        harmonic = (w1 + w2) / (w1 / np.where(delta[:-1] == 0, 1, delta[:-1])
                                + w2 / np.where(delta[1:] == 0, 1, delta[1:]))
        same_sign = (np.sign(delta[:-1]) * np.sign(delta[1:])) > 0
        d[1:-1] = np.where(same_sign, harmonic, 0.0)
    idx = np.clip(np.searchsorted(x_obs, x_new, side="right") - 1, 0, n - 2)
    x0 = x_obs[idx]
    hseg = h[idx]
    t = (x_new - x0) / hseg
    y0, y1 = y_obs[idx], y_obs[idx + 1]
    d0, d1 = d[idx], d[idx + 1]
    h00 = (1 + 2 * t) * (1 - t) ** 2
    h10 = t * (1 - t) ** 2
    h01 = t**2 * (3 - 2 * t)
    h11 = t**2 * (t - 1)
    return h00 * y0 + h10 * hseg * d0 + h01 * y1 + h11 * hseg * d1


def stineman(
    x_obs: np.ndarray, y_obs: np.ndarray, x_new: np.ndarray
) -> np.ndarray:
    """Stineman (1980) rational interpolation, fully vectorized.

    Within [x_i, x_{i+1}] with secant slope s and tangent-line deviations
    ``d1 = (yp_i - s)(x - x_i)``, ``d2 = (yp_{i+1} - s)(x - x_{i+1})``:

    - d1*d2 > 0:  y = base + d1*d2 / (d1 + d2)
    - d1*d2 < 0:  y = base + d1*d2 * (dxo + dxp) / ((d1 - d2) * h)
    - else:       y = base   (the secant line)

    where base = y_i + s*(x - x_i). Slopes yp at interior points are the
    secant-weighted average ``(s_{i-1} h_i + s_i h_{i-1}) / (h_{i-1}+h_i)``
    zeroed at local extrema (sign change), with the standard quadratic
    endpoint rule ``yp_0 = 2 s_0 - yp_1``  bounded by monotonicity."""
    n = len(x_obs)
    if n < 2:
        return np.full(len(x_new), y_obs[0] if n else np.nan)
    if n == 2:
        return np.interp(x_new, x_obs, y_obs)
    h = np.diff(x_obs)
    s = np.diff(y_obs) / h
    yp = np.empty(n)
    wavg = (s[:-1] * h[1:] + s[1:] * h[:-1]) / (h[:-1] + h[1:])
    same_sign = (np.sign(s[:-1]) * np.sign(s[1:])) > 0
    yp[1:-1] = np.where(same_sign, wavg, 0.0)
    yp[0] = 2.0 * s[0] - yp[1]
    yp[-1] = 2.0 * s[-1] - yp[-2]
    # keep endpoint slopes shape-safe: same sign as the boundary secant,
    # magnitude at most 3x (the usual well-behavedness clamp)
    for j, sec in ((0, s[0]), (-1, s[-1])):
        if np.sign(yp[j]) != np.sign(sec):
            yp[j] = 0.0
        elif abs(yp[j]) > 3 * abs(sec):
            yp[j] = 3 * sec

    idx = np.clip(np.searchsorted(x_obs, x_new, side="right") - 1, 0, n - 2)
    x0, x1 = x_obs[idx], x_obs[idx + 1]
    y0 = y_obs[idx]
    sseg, hseg = s[idx], h[idx]
    dxo = x_new - x0
    dxp = x_new - x1
    base = y0 + sseg * dxo
    d1 = (yp[idx] - sseg) * dxo
    d2 = (yp[idx + 1] - sseg) * dxp
    prod = d1 * d2
    with np.errstate(divide="ignore", invalid="ignore"):
        pos = base + np.where(prod > 0, prod / np.where(d1 + d2 == 0, 1, d1 + d2), 0)
        neg = base + prod * (dxo + dxp) / (
            np.where(d1 - d2 == 0, 1, d1 - d2) * hseg
        )
    return np.where(prod > 0, pos, np.where(prod < 0, neg, base))
