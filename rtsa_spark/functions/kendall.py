"""Mann-Kendall trend statistics — vectorized numpy, no per-row Python.

Reproduces the statistics contract of the reference's MK pipeline
(``/root/reference/R/rtsa.mk.R:296-312``, which delegates to
``Kendall::MannKendall`` / ``SeasonalMannKendall``): score S, variance of S
with tie correction, Kendall's tau (tau-b denominator, ties in values only —
time points are distinct), and the two-sided p-value from the normal
approximation with continuity correction. The seasonal variant is selected
for period==12 exactly as the reference does (``R/rtsa.mk.R:121-125``):
per-season S and var(S) summed across seasons.

Public formulas: Mann (1945), Kendall (1975), Hirsch-Slack (1984) for the
seasonal variant.
"""

from __future__ import annotations

import math

import numpy as np

#: reference minimum series length (``R/rtsa.mk.R:273-275``); the buggy
#: scalar drop at :276 is NOT reproduced (SURVEY.md §8 Q4 — documented intent).
MK_MIN_OBS = 5


def _s_and_ties(x: np.ndarray) -> tuple[int, np.ndarray]:
    """S = sum_{i<j} sign(x_j - x_i) and tie-group sizes, vectorized.

    O(n^2) sign matrix; per-source tier series are bucket-bounded (<= a few
    thousand points), so the matrix stays small. Chunked over rows to bound
    the temporary at ~8 MB regardless of n.
    """
    n = len(x)
    s = 0
    chunk = max(1, (1 << 20) // max(n, 1))
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        diff = x[None, a:b] - x[:, None]  # (n, b-a): sign of x_col - x_row
        signs = np.sign(diff)
        # count only pairs i<j where j is the column index
        rows = np.arange(n)[:, None]
        cols = np.arange(a, b)[None, :]
        s += int(signs[rows < cols].sum())
    _, counts = np.unique(x, return_counts=True)
    return s, counts[counts > 1]


def _var_s(n: int, ties: np.ndarray) -> float:
    t = ties.astype(np.float64)
    correction = float((t * (t - 1) * (2 * t + 5)).sum())
    return (n * (n - 1) * (2 * n + 5) - correction) / 18.0


def _tau_denominator(n: int, ties: np.ndarray) -> float:
    t = ties.astype(np.float64)
    n0 = n * (n - 1) / 2.0
    n1 = float((t * (t - 1) / 2.0).sum())
    return math.sqrt((n0 - n1) * n0)


def _p_two_sided(s: int, var_s: float) -> float:
    if var_s <= 0:
        return float("nan")
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    return math.erfc(abs(z) / math.sqrt(2.0))


def mann_kendall(x: np.ndarray) -> dict[str, float]:
    """Classic MK on one series (NaNs dropped, like ``Kendall``'s NA policy)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if n < MK_MIN_OBS:
        return {"mk_s": float("nan"), "mk_vars": float("nan"),
                "mk_tau": float("nan"), "mk_p": float("nan")}
    s, ties = _s_and_ties(x)
    var_s = _var_s(n, ties)
    denom = _tau_denominator(n, ties)
    tau = s / denom if denom > 0 else float("nan")
    return {"mk_s": float(s), "mk_vars": var_s, "mk_tau": tau,
            "mk_p": _p_two_sided(s, var_s)}


def seasonal_mann_kendall(x: np.ndarray, period: int) -> dict[str, float]:
    """Hirsch-Slack seasonal MK: per-season S and var summed; tau from the
    summed denominator. Applied when period==12 (reference behavior)."""
    x = np.asarray(x, dtype=np.float64)
    s_total, var_total, denom_total = 0, 0.0, 0.0
    n_used = 0
    for ph in range(period):
        xi = x[ph::period]
        xi = xi[~np.isnan(xi)]
        if len(xi) < 2:
            continue
        s, ties = _s_and_ties(xi)
        s_total += s
        var_total += _var_s(len(xi), ties)
        denom_total += _tau_denominator(len(xi), ties)
        n_used += len(xi)
    if n_used < MK_MIN_OBS or denom_total <= 0:
        return {"mk_s": float("nan"), "mk_vars": float("nan"),
                "mk_tau": float("nan"), "mk_p": float("nan")}
    return {
        "mk_s": float(s_total),
        "mk_vars": var_total,
        "mk_tau": s_total / denom_total,
        "mk_p": _p_two_sided(s_total, var_total),
    }


def seasonal_mann_kendall_deterministic(
    x: np.ndarray, period: int
) -> dict[str, int | None]:
    """Oracle-facing Hirsch-Slack seasonal MK over an INTEGER series
    (IEEE-deterministic twin of :func:`seasonal_mann_kendall`; SQL replay
    in ``__spark_entry__``): S and 18*varS are exact integers; tau is
    ``floor(1e6 * S/denom)`` where the denominator sums the per-phase
    ``sqrt((n0-n1)*n0)`` terms in ascending-phase order — a fixed sequence
    of correctly-rounded ops both engines execute identically. Phases are
    POSITION-based (``i % period`` over the bucket-ordered series), the
    same convention as the production kernel."""
    s_total = 0
    vars18 = 0
    denom = 0.0
    n_used = 0
    for ph in range(period):
        xi = np.asarray(x[ph::period], dtype=np.int64)
        n = len(xi)
        if n < 2:
            continue
        s, ties = _s_and_ties(xi.astype(np.float64))
        t = ties.astype(np.int64)
        corr = int((t * (t - 1) * (2 * t + 5)).sum())
        n1 = int((t * (t - 1) // 2).sum())
        n0 = n * (n - 1) // 2
        s_total += int(s)
        vars18 += n * (n - 1) * (2 * n + 5) - corr
        denom += math.sqrt(float(n0 - n1) * float(n0))
        n_used += n
    if n_used < MK_MIN_OBS or denom <= 0:
        return {"smk_s": None, "smk_vars18": None, "smk_tau_e6": None}
    return {
        "smk_s": s_total,
        "smk_vars18": vars18,
        "smk_tau_e6": math.floor(1_000_000.0 * (s_total / denom)),
    }
