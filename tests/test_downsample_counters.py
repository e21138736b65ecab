"""M4 downsample + counter rate + CUSUM: hand cases and recursion parity."""

from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.operators.counters import counter_increase, cusum_drift
from rtsa_spark.operators.downsample import m4_downsample


def test_m4_hand_case(spark):
    # key a: ts 0..7, values chosen so min/max/first/last all differ
    rows = [("a", t, v) for t, v in zip(range(8), [5, 9, 1, 7, 2, 8, 3, 6])]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = {
        r["pixel"]: r.asDict()
        for r in m4_downsample(df, "k", "t", "v", width=2).collect()
    }
    # span 0..7, +1 -> pixel = floor(t * 2 / 8): t 0-3 -> 0, t 4-7 -> 1
    p0, p1 = out[0], out[1]
    assert (p0["v_first"], p0["v_last"], p0["v_min"], p0["v_max"]) == (5, 7, 1, 9)
    assert (p1["v_first"], p1["v_last"], p1["v_min"], p1["v_max"]) == (2, 6, 2, 8)
    assert (p0["t_first"], p0["t_last"], p1["t_first"], p1["t_last"]) == (0, 3, 4, 7)


def test_m4_matches_numpy_and_bounds(spark):
    rng = np.random.default_rng(11)
    ts = np.sort(rng.choice(100000, size=500, replace=False))
    vs = rng.integers(-1000, 1000, size=500)
    df = spark.createDataFrame(
        [("k", int(t), int(v)) for t, v in zip(ts, vs)], "k string, t long, v long"
    )
    width = 16
    out = m4_downsample(df, "k", "t", "v", width=width).collect()
    assert len(out) <= width
    tmin, tmax = int(ts.min()), int(ts.max())
    pix = (ts - tmin) * width // (tmax - tmin + 1)
    for r in out:
        sel = pix == r["pixel"]
        assert r["n"] == int(sel.sum())
        assert r["v_min"] == int(vs[sel].min())
        assert r["v_max"] == int(vs[sel].max())
        assert r["v_first"] == int(vs[sel][np.argmin(ts[sel])])
        assert r["v_last"] == int(vs[sel][np.argmax(ts[sel])])


def test_m4_single_point_series(spark):
    df = spark.createDataFrame([("a", 42, 7)], "k string, t long, v long")
    (r,) = m4_downsample(df, "k", "t", "v", width=8).collect()
    assert (r["pixel"], r["n"], r["v_min"], r["v_last"]) == (0, 1, 7, 7)


def test_counter_increase_hand_case(spark):
    # 10 -> 13 (+3) -> 2 (reset, +2) -> 2 (+0) -> 9 (+7)
    rows = [("a", t, c) for t, c in enumerate([10, 13, 2, 2, 9])]
    df = spark.createDataFrame(rows, "k string, t long, c long")
    out = {r["t"]: r for r in counter_increase(df, "k", "t", "c").collect()}
    assert out[0]["inc"] is None and out[0]["is_reset"] == 0
    assert [out[t]["inc"] for t in range(1, 5)] == [3, 2, 0, 7]
    assert [out[t]["is_reset"] for t in range(1, 5)] == [0, 1, 0, 0]


def test_cusum_matches_page_recursion(spark):
    """The window identity S_t = C_t - min(0, min C) equals Page's
    sequential recursion S_t = max(0, S_{t-1} + dev_t)."""
    rng = np.random.default_rng(3)
    xs = rng.integers(-5, 7, size=200)
    df = spark.createDataFrame(
        [("a", int(t), int(x)) for t, x in enumerate(xs)], "k string, t long, x long"
    )
    got = {
        r["t"]: r["cusum_s"]
        for r in cusum_drift(df, "k", "t", "x").collect()
    }
    s = 0
    for t, x in enumerate(xs):
        s = max(0, s + int(x))
        assert got[t] == s, f"t={t}"


def test_cusum_with_target_column(spark):
    df = spark.createDataFrame(
        [("a", 0, 10, 8), ("a", 1, 10, 8), ("a", 2, 4, 8)],
        "k string, t long, x long, tgt long",
    )
    got = {r["t"]: r["cusum_s"] for r in cusum_drift(df, "k", "t", "x", "tgt").collect()}
    assert got == {0: 2, 1: 4, 2: 0}


def test_cohort_retention_hand_case(spark):
    import datetime as dt

    from rtsa_spark.operators.counters import cohort_retention

    d = lambda day, u: (u, dt.datetime(2024, 1, 1 + day, 12, 0))
    rows = [
        d(0, 1), d(0, 2), d(0, 2),      # cohort day0: users 1,2
        d(1, 1),                        # day0 offset1: user 1 only
        d(1, 3),                        # cohort day1: user 3
        d(2, 1), d(2, 3),               # offsets 2 (u1) and 1 (u3)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort_day"], r["day_offset"]): r
           for r in cohort_retention(df, "user_id", "ts").collect()}
    c0 = dt.datetime(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    assert out[(c0, 0)]["n_active"] == 2 and out[(c0, 0)]["n_cohort"] == 2
    assert out[(c0, 0)]["retention_e6"] == 1_000_000
    assert out[(c0, 1)]["n_active"] == 1
    assert out[(c0, 1)]["retention_e6"] == 500_000
    assert out[(c0, 2)]["n_active"] == 1
    assert out[(c0 + 1, 0)]["n_cohort"] == 1
    assert out[(c0 + 1, 1)]["n_active"] == 1
    assert (c0 + 1, 2) not in out


def test_cohort_retention_max_offset_and_guard(spark):
    import datetime as dt

    import pytest as _pytest

    from rtsa_spark.operators.counters import cohort_retention

    rows = [(1, dt.datetime(2024, 1, 1 + i)) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    assert cohort_retention(df, "user_id", "ts", max_offset=2).count() == 3
    with _pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts", day_s=0)


def test_bucket_derivative_gap_aware(spark):
    import datetime as dt

    from rtsa_spark.operators.counters import bucket_derivative

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0, 100),
        ("k", t0 + dt.timedelta(hours=1), 400),   # +300 over 3600s
        ("k", t0 + dt.timedelta(hours=3), 100),   # -300 over 7200s (gap!)
    ]
    df = spark.createDataFrame(
        rows, "key string, bucket timestamp, x long"
    )
    out = {r["bucket"]: r
           for r in bucket_derivative(df, "key", "bucket", "x").collect()}
    first = out[t0]
    assert first["rate_e6"] is None and first["prev_x"] is None
    up = out[t0 + dt.timedelta(hours=1)]
    assert up["gap_s"] == 3600
    assert up["rate_e6"] == (1_000_000 * 300) // 3600
    down = out[t0 + dt.timedelta(hours=3)]
    assert down["gap_s"] == 7200
    assert down["rate_e6"] == -((1_000_000 * 300) // 7200)
