"""Pettitt change-point test and cross-correlation (CCF)."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.acf import ccf
from rtsa_spark.operators.changepoint import pettitt


def _df(spark, vals, key="a"):
    rows = [(key, i, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, x long")


def _df2(spark, xs, ys):
    rows = [("a", i, int(v)) for i, v in enumerate(xs)] + [
        ("b", i, int(v)) for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "k string, t long, x long")


def _brute_pettitt(vals):
    v = np.asarray(vals, dtype=np.int64)
    n = len(v)
    sgn = np.sign(v[:, None] - v[None, :])
    us = [sgn[: t + 1, t + 1 :].sum() for t in range(n - 1)]
    us = np.asarray(us, dtype=np.int64)
    k = int(np.abs(us).max())
    cp = int(np.argmax(np.abs(us) == k))
    return k, int(us[cp]), cp


# ----------------------------------------------------------------- pettitt


def test_pettitt_planted_shift(spark):
    vals = [10] * 20 + [50] * 20
    row = pettitt(_df(spark, vals), "k", "t", "x").collect()[0]
    k, u, cp = _brute_pettitt(vals)
    assert row["k_stat"] == k and row["u_at_cp"] == u and row["cp_t"] == cp
    assert row["cp_t"] == 19  # last bucket of the left segment
    assert row["u_at_cp"] < 0  # early segment stochastically smaller
    assert row["six_k2"] == 6 * k * k
    assert row["p_e6"] < 10_000  # clearly significant


def test_pettitt_brute_force_parity_with_ties(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 12, size=57)  # heavy ties
    row = pettitt(_df(spark, vals), "k", "t", "x").collect()[0]
    k, u, cp = _brute_pettitt(vals)
    assert (row["k_stat"], row["u_at_cp"], row["cp_t"]) == (k, u, cp)
    n = 57
    p = min(1.0, 2.0 * np.exp(-6.0 * k * k / (n**3 + n**2)))
    assert row["p_e6"] == int(np.floor(p * 1e6))


def test_pettitt_constant_and_singleton(spark):
    const = pettitt(_df(spark, [7] * 15), "k", "t", "x").collect()[0]
    assert const["k_stat"] == 0 and const["p_e6"] == 1_000_000
    single = pettitt(_df(spark, [3]), "k", "t", "x").collect()[0]
    assert single["n"] == 1 and single["k_stat"] is None
    assert single["cp_t"] is None and single["p_e6"] is None


# --------------------------------------------------------------------- ccf


def test_ccf_detects_lead(spark):
    rng = np.random.RandomState(3)
    y = rng.randint(0, 100, size=80)
    x = np.roll(y, 3)  # y leads x by 3
    out = {
        r["lag"]: r
        for r in ccf(_df2(spark, x, y), "k", "t", "x", [0, 1, 2, 3]).collect()
    }
    # interior rows t=3.. are an exact match at lag 3 -> near-1 peak
    best = max(out.values(), key=lambda r: r["ccf_e9"])
    assert best["lag"] == 3 and best["ccf_e9"] > 900_000_000
    assert out[0]["ccf_e9"] < out[3]["ccf_e9"]


def test_ccf_matches_numpy_chain(spark):
    rng = np.random.RandomState(8)
    xs = rng.randint(0, 50, size=60).astype(np.int64)
    ys = rng.randint(0, 50, size=60).astype(np.int64)
    out = {
        r["lag"]: r for r in ccf(_df2(spark, xs, ys), "k", "t", "x", [0, 2]).collect()
    }
    m = 60
    zx = m * xs - xs.sum()
    zy = m * ys - ys.sum()
    dx = float((zx * zx).sum())
    dy = float((zy * zy).sum())
    for lag in (0, 2):
        num = float((zx[lag:] * zy[: m - lag]).sum()) if lag else float((zx * zy).sum())
        want = int(np.floor(num / (np.sqrt(dx) * np.sqrt(dy)) * 1e9))
        assert out[lag]["ccf_e9"] == want and out[lag]["m"] == m


def test_ccf_partial_spine_and_constant(spark):
    # b missing early buckets: common spine is the overlap only
    rows = [("a", i, i % 7) for i in range(40)] + [
        ("b", i, (i * 3) % 5) for i in range(10, 40)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = ccf(df, "k", "t", "x", [0]).collect()
    assert len(out) == 1 and out[0]["m"] == 30
    const = _df2(spark, [5] * 20, list(range(20)))
    row = ccf(const, "k", "t", "x", [0]).collect()[0]
    assert row["ccf_e9"] is None  # constant x side -> NULL
    with pytest.raises(ValueError):
        ccf(const, "k", "t", "x", [-1])
