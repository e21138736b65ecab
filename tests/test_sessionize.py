"""Gap sessionization + exact tier percentiles (operators/sessionize.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from rtsa_spark.operators.sessionize import sessionize, tier_percentiles


def test_sessionize_hand_case(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        # key a: [0, 10, 20] | gap 40 | [60, 61]  (gap_s = 30 min)
        ("a", t(0), 1), ("a", t(10), 2), ("a", t(20), 3),
        ("a", t(60), 4), ("a", t(61), 5),
        # key b: single event
        ("b", t(5), 7),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = {(r["k"], r["session_id"]): r
           for r in sessionize(df, ["k"], gap_s=1800, value_col="v").collect()}
    assert set(out) == {("a", 1), ("a", 2), ("b", 1)}
    s1, s2 = out[("a", 1)], out[("a", 2)]
    assert s1["n_events"] == 3 and s1["v_sum"] == 6
    assert s1["duration_s"] == 1200
    assert s2["n_events"] == 2 and s2["v_sum"] == 9 and s2["duration_s"] == 60
    assert out[("b", 1)]["n_events"] == 1 and out[("b", 1)]["duration_s"] == 0


def test_sessionize_gap_boundary(spark):
    """Gap exactly == gap_s stays in-session; gap_s+1 splits."""
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        ("a", base, 1),
        ("a", base + dt.timedelta(seconds=600), 1),          # == gap
        ("a", base + dt.timedelta(seconds=1201), 1),         # 601 > gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = sessionize(df, ["k"], gap_s=600).collect()
    assert sorted(r["n_events"] for r in out) == [1, 2]
    with pytest.raises(ValueError):
        sessionize(df, ["k"], gap_s=-1)


def test_sessionize_matches_builtin_session_window(spark):
    """The lag+cumsum construction must agree with Spark's native
    F.session_window on (n_events, v_sum) multisets per key: both treat
    the boundary inclusively (an event exactly gap_s after the previous
    one extends the session; strictly-greater gaps split)."""
    import pyspark.sql.functions as F

    rng = np.random.default_rng(3)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for k in ("a", "b", "c"):
        t = 0
        for _ in range(200):
            t += int(rng.integers(1, 1200))
            rows.append((k, base + dt.timedelta(seconds=t), int(rng.integers(1, 9))))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    ours = sessionize(df, ["k"], gap_s=600, value_col="v").collect()
    native = (
        df.groupBy("k", F.session_window("ts", "600 seconds"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    ours_set = sorted((r["k"], r["n_events"], r["v_sum"]) for r in ours)
    native_set = sorted((r["k"], r["n"], r["s"]) for r in native)
    assert ours_set == native_set


def test_tier_percentiles_match_numpy_type7(spark):
    rng = np.random.default_rng(11)
    rows = []
    for src in ("a", "b"):
        vals = rng.integers(0, 10_000, size=37 if src == "a" else 8)
        rows += [(src, int(v)) for v in vals]
    df = spark.createDataFrame(rows, "source string, x long")
    out = {r["source"]: r for r in
           tier_percentiles(df, value_col="x", ps=(0, 50, 90, 99, 100)).collect()}
    for src in ("a", "b"):
        xs = sorted(v for s, v in rows if s == src)
        for p in (0, 50, 90, 99, 100):
            want = np.percentile(np.array(xs), p, method="linear") * 100
            assert out[src][f"p{p}_e2"] == pytest.approx(want, abs=0.51), (src, p)
    single = spark.createDataFrame([("c", 42)], "source string, x long")
    got = tier_percentiles(single, value_col="x", ps=(50,)).collect()[0]
    assert got["p50_e2"] == 4200
    with pytest.raises(ValueError):
        tier_percentiles(df, ps=(101,))


def test_phase_profile_hour_matches_numpy(spark):
    import datetime as dt

    import numpy as np

    from rtsa_spark.operators.sessionize import phase_profile

    t0 = dt.datetime(2024, 3, 1)
    rng = np.random.RandomState(5)
    rows = [
        ("k", t0 + dt.timedelta(hours=i), int(rng.randint(0, 1000)))
        for i in range(24 * 14)
    ]
    df = spark.createDataFrame(
        rows, "key string, bucket_start timestamp, x long"
    )
    out = {
        r["phase"]: r
        for r in phase_profile(
            df, "key", "bucket_start", "x", "hour"
        ).collect()
    }
    assert set(out) == set(range(24))
    for h in range(24):
        vals = sorted(x for _, b, x in rows if b.hour == h)
        assert out[h]["n_buckets"] == 14
        for p in (10, 50, 90):
            pos = (14 - 1) * p
            lo, rem = pos // 100, pos % 100
            hi = min(lo + 1, 13)
            exp = vals[lo] * (100 - rem) + vals[hi] * rem
            assert out[h][f"p{p}_e2"] == exp


def test_phase_profile_dow_epoch_arithmetic(spark):
    import datetime as dt

    from rtsa_spark.operators.sessionize import phase_profile

    # 2024-03-03 is a Sunday -> phase 0 under the (d+4)%7 convention
    rows = [
        ("k", dt.datetime(2024, 3, 3 + i), i) for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "key string, bucket_start timestamp, x long"
    )
    out = {r["phase"]: r["p50_e2"] for r in phase_profile(
        df, "key", "bucket_start", "x", "dow").collect()}
    assert set(out) == set(range(7))
    assert out[0] == 0 * 100 and out[6] == 6 * 100


def test_phase_profile_bad_phase(spark):
    import pytest as _pytest

    from rtsa_spark.operators.sessionize import phase_profile

    df = spark.createDataFrame(
        [("k", 0, 1)], "key string, bucket_start int, x long"
    )
    with _pytest.raises(ValueError):
        phase_profile(df, "key", "bucket_start", "x", "month")


def test_interarrival_stats_exact(spark):
    import datetime as dt

    from rtsa_spark.operators.sessionize import interarrival_stats

    t0 = dt.datetime(2024, 1, 1)
    gaps = [10, 70, 5]  # ts at 0, 10, 80, 85 seconds
    ts, rows = 0, []
    rows.append(("k", t0))
    for g in gaps:
        ts += g
        rows.append(("k", t0 + dt.timedelta(seconds=ts)))
    rows.append(("solo", t0))
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = {r["src"]: r for r in
           interarrival_stats(df, ["src"], "ts").collect()}
    k = out["k"]
    assert (k["n_events"], k["n_gaps"]) == (4, 3)
    assert (k["gap_min_s"], k["gap_max_s"], k["gap_sum_s"]) == (5, 70, 85)
    assert k["gap_mean_e2"] == (100 * 85) // 3
    s = out["solo"]
    assert s["n_gaps"] == 0 and s["gap_mean_e2"] is None
