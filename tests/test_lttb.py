"""LTTB downsample: brute-force parity, invariants, passthrough."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.downsample import lttb_downsample


def _df(spark, vals, key="a"):
    rows = [(key, i, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, x long")


def _brute_lttb(x, m):
    """Independent reimplementation of the documented spec: exact-int
    bucket assignment + exact-int area argmax, scanning candidates one
    by one (no numpy vectorization) so a bug in the kernel's slicing
    can't be mirrored here."""
    x = [int(v) for v in x]
    n = len(x)
    if n <= m or n < 3:
        return list(range(n))
    bucket_of = lambda i: ((i - 1) * (m - 2)) // (n - 2)  # noqa: E731
    members = {b: [] for b in range(m - 2)}
    for i in range(1, n - 1):
        members[bucket_of(i)].append(i)
    sel = [0]
    prev = 0
    for b in range(m - 2):
        if b < m - 3:
            nxt = members[b + 1]
            mn = len(nxt)
            gi = sum(nxt)
            gx = sum(x[i] for i in nxt)
        else:
            mn, gi, gx = 1, n - 1, x[n - 1]
        best, best_area = None, -1
        for ci in members[b]:
            area = abs(
                (ci - prev) * (gx - mn * x[prev])
                - (gi - mn * prev) * (x[ci] - x[prev])
            )
            if area > best_area:
                best, best_area = ci, area
        sel.append(best)
        prev = best
    sel.append(n - 1)
    return sel


def test_lttb_brute_force_parity(spark):
    rng = np.random.RandomState(7)
    vals = np.cumsum(rng.randint(-9, 10, size=200)) + 500
    out = sorted(
        lttb_downsample(_df(spark, vals), "k", "t", "x", m=17).collect(),
        key=lambda r: r["rank"],
    )
    want = _brute_lttb(vals, 17)
    assert [r["i"] for r in out] == want
    assert [r["x"] for r in out] == [int(vals[i]) for i in want]
    assert out[0]["i"] == 0 and out[-1]["i"] == 199


def test_lttb_keeps_spike(spark):
    vals = [100] * 50
    vals[23] = 9000  # the dominant feature must survive any downsample
    out = lttb_downsample(_df(spark, vals), "k", "t", "x", m=8).collect()
    assert 23 in {r["i"] for r in out}
    assert len(out) == 8


def test_lttb_passthrough_and_guards(spark):
    out = lttb_downsample(_df(spark, [5, 6, 7]), "k", "t", "x", m=10).collect()
    assert sorted(r["i"] for r in out) == [0, 1, 2]
    assert all(r["rank"] == r["i"] for r in out)
    with pytest.raises(ValueError):
        lttb_downsample(_df(spark, [1, 2, 3]), "k", "t", "x", m=2)


def test_lttb_monotone_selection_multikey(spark):
    rng = np.random.RandomState(12)
    rows = []
    for key in ("p", "q"):
        vals = rng.randint(0, 1000, size=97)
        rows += [(key, i, int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = lttb_downsample(df, "k", "t", "x", m=12).collect()
    for key in ("p", "q"):
        sel = [r["i"] for r in sorted(out, key=lambda r: r["rank"]) if r["k"] == key]
        assert len(sel) == 12
        assert sel == sorted(sel) and len(set(sel)) == 12  # strictly increasing
