"""Matrix-profile motif/discord operator (operators/motif.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest


def _series_df(spark, values, key="a"):
    t0 = datetime(2024, 1, 1)
    rows = [
        (key, t0 + timedelta(days=i), int(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "source string, b timestamp, x long")


def _brute(x, m, excl):
    """Reference O(n^2) profile with the lexicographic (d2, j) argmin."""
    n_w = len(x) - m + 1
    out = {}
    for i in range(n_w):
        best = None
        for j in range(n_w):
            if abs(i - j) < excl:
                continue
            d2 = sum((int(x[i + t]) - int(x[j + t])) ** 2 for t in range(m))
            if best is None or (d2, j) < best:
                best = (d2, j)
        if best is not None:
            out[i] = best
    return out


def test_matrix_profile_hand_motif(spark):
    """A repeated [1,2,3] pattern: window 0 finds its exact copy at the
    earliest tied position; the spike window is the discord."""
    from rtsa_spark.operators.motif import matrix_profile, motif_topk

    vals = [1, 2, 3, 1, 2, 3, 1, 2, 3, 50]
    df = _series_df(spark, vals)
    mp = matrix_profile(df, "source", "b", "x", m=3, excl=1)
    t0 = datetime(2024, 1, 1)
    rows = {r["w_start"]: r for r in mp.collect()}
    r0 = rows[t0]
    assert r0["d2"] == 0 and r0["nn_start"] == t0 + timedelta(days=3)
    # discord: the window containing the 50 spike has the largest profile
    worst = max(rows.values(), key=lambda r: r["d2"])
    assert worst["w_start"] == t0 + timedelta(days=7)  # [2, 3, 50]
    top = motif_topk(mp, "source", k=1).collect()
    assert top[0]["rank"] == 1 and top[0]["d2"] == 0
    assert top[0]["w_start"] == t0  # earliest of the tied zero-distance wins


def test_matrix_profile_matches_bruteforce(spark):
    """Random integer series: the diagonal-sweep kernel equals the O(n^2)
    lexicographic brute force exactly, for several (m, excl) shapes."""
    from rtsa_spark.operators.motif import matrix_profile

    rng = np.random.default_rng(7)
    x = rng.integers(-50, 50, size=40)
    df = _series_df(spark, x)
    t0 = datetime(2024, 1, 1)
    for m, excl in [(5, 2), (3, 1), (7, 3)]:
        got = {
            r["w_start"]: (r["d2"], r["nn_start"])
            for r in matrix_profile(df, "source", "b", "x", m=m, excl=excl).collect()
        }
        ref = _brute(x, m, excl)
        assert len(got) == len(ref)
        for i, (d2, j) in ref.items():
            g = got[t0 + timedelta(days=int(i))]
            assert g == (d2, t0 + timedelta(days=int(j))), (m, excl, i)


def test_matrix_profile_guards(spark):
    from rtsa_spark.operators.motif import matrix_profile

    df = _series_df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="m must be"):
        matrix_profile(df, "source", "b", "x", m=1)
    with pytest.raises(ValueError, match="exclusion"):
        matrix_profile(df, "source", "b", "x", m=4, excl=0)
    # overflow guard fires loudly inside the kernel
    big = _series_df(spark, [0, 2**31, 0, 2**31, 0, 2**31, 0, 2**31])
    with pytest.raises(Exception, match="overflow"):
        matrix_profile(big, "source", "b", "x", m=4).collect()
    # short series (n < m) emits nothing rather than erroring
    assert matrix_profile(df, "source", "b", "x", m=5).count() == 0
