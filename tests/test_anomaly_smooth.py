"""Hampel filter, seasonal-naive accuracy, period strength, Holt/SES."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.anomaly import hampel
from rtsa_spark.operators.forecast import period_strength, seasonal_naive_accuracy
from rtsa_spark.operators.smooth import holt_smooth


def _df(spark, vals, key="a"):
    rows = [(key, i, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, x long")


# ------------------------------------------------------------------ hampel


def test_hampel_flags_spike_only(spark):
    vals = [100, 102, 98, 101, 99, 500, 100, 103, 97, 101, 100]
    out = {r["t"]: r for r in hampel(_df(spark, vals), "k", "t", "x").collect()}
    assert out[5]["anom"] == 1
    flagged = [t for t, r in out.items() if r["anom"] == 1]
    assert flagged == [5]
    # edges (first/last half_window rows) are NULL
    for t in (0, 1, 2, 8, 9, 10):
        assert out[t]["anom"] is None and out[t]["med"] is None


def test_hampel_matches_numpy_median(spark):
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 1000, size=60)
    h = 3
    out = {r["t"]: r for r in hampel(_df(spark, vals), "k", "t", "x", h).collect()}
    for t in range(h, 60 - h):
        win = np.sort(vals[t - h : t + h + 1])
        med = int(win[h])
        assert out[t]["med"] == med
        assert out[t]["mad"] == int(np.sort(np.abs(win - med))[h])


def test_hampel_constant_series_no_flags(spark):
    out = hampel(_df(spark, [7] * 20), "k", "t", "x").collect()
    assert all(r["anom"] in (None, 0) for r in out)
    with pytest.raises(ValueError):
        hampel(_df(spark, [1, 2]), "k", "t", "x", half_window=0)


# ------------------------------------------------------- seasonal accuracy


def test_seasonal_naive_exact_period_is_perfect(spark):
    vals = [10, 20, 30, 40] * 6  # period-4 exact
    row = seasonal_naive_accuracy(_df(spark, vals), "k", "t", "x", 4).collect()[0]
    assert row["mae_e6"] == 0 and row["mase_e9"] == 0
    assert row["n"] == 24 and row["m_eval"] == 20


def test_seasonal_naive_matches_numpy(spark):
    rng = np.random.RandomState(2)
    vals = (100 + 50 * np.sin(np.arange(80) * 2 * np.pi / 8)).astype(int)
    vals = vals + rng.randint(-3, 4, size=80)
    row = seasonal_naive_accuracy(_df(spark, vals), "k", "t", "x", 8).collect()[0]
    err = np.abs(vals[8:] - vals[:-8]).sum()
    dif = np.abs(np.diff(vals)).sum()
    n, m = 80, 72
    assert row["mae_e6"] == int(np.floor(err / m * 1e6))
    assert row["mase_e9"] == int(np.floor((err * (n - 1)) / (dif * m) * 1e9))


def test_seasonal_naive_constant_null_mase(spark):
    row = seasonal_naive_accuracy(_df(spark, [5] * 30), "k", "t", "x", 7).collect()[0]
    assert row["mae_e6"] == 0 and row["mase_e9"] is None


# --------------------------------------------------------- period strength


def test_period_strength_finds_true_period(spark):
    vals = ([5, 9, 2, 7, 4, 8] * 20)[:120]  # strong period 6
    out = {
        r["period"]: r
        for r in period_strength(_df(spark, vals), "k", "t", "x", [5, 6, 12]).collect()
    }
    assert out[6]["strength_e9"] == 10**9  # pure periodic -> strength 1
    assert out[12]["strength_e9"] == 10**9  # multiples also perfect
    # lcm(5,6)=30 divides 120: every phase of 5 sees each base value equally
    # often, so the phase means coincide and the strength is exactly 0
    assert out[5]["strength_e9"] == 0
    assert out[6]["n_used"] == 120 and out[5]["n_used"] == 120


def test_period_strength_matches_numpy_anova(spark):
    rng = np.random.RandomState(9)
    vals = rng.randint(0, 100, size=50)
    p = 7
    m = 50 // p
    used = np.asarray(vals[: m * p], dtype=np.int64)
    sj = used.reshape(m, p).sum(axis=0)
    s = used.sum()
    num = p * (sj * sj).sum() - s * s
    den = m * p * (used * used).sum() - s * s
    row = [
        r
        for r in period_strength(_df(spark, vals), "k", "t", "x", [7]).collect()
    ][0]
    assert row["n_used"] == m * p
    assert row["strength_e9"] == int(np.floor(num / den * 1e9))


def test_period_strength_short_series_null(spark):
    # 10 rows, period 6 -> only 1 complete cycle -> NULL strength
    row = period_strength(_df(spark, list(range(10)), key="z"), "k", "t", "x", [6]).collect()[0]
    assert row["strength_e9"] is None and row["n_used"] == 6


# ------------------------------------------------------------- holt / ses


def _py_holt(vals, a=0.25, g=0.125):
    l, b = float(vals[0]), 0.0
    ses = float(vals[0])
    for x in vals[1:]:
        ses = a * x + (1 - a) * ses
        l2 = a * x + (1 - a) * (l + b)
        b = g * (l2 - l) + (1 - g) * b
        l = l2
    return ses, l, b


def test_holt_matches_python_bitwise(spark):
    rng = np.random.RandomState(4)
    vals = np.cumsum(rng.randint(-6, 7, size=300)) + 200
    row = holt_smooth(_df(spark, vals), "k", "t", "x").collect()[0]
    ses, l, b = _py_holt([float(v) for v in vals])
    assert row["n"] == 300
    assert row["ses_e6"] == int(np.floor(ses * 1e6))
    assert row["level_e6"] == int(np.floor(l * 1e6))
    assert row["trend_e6"] == int(np.floor(b * 1e6))
    assert row["fc_e6"] == int(np.floor((l + 24.0 * b) * 1e6))


def test_holt_single_element_and_guards(spark):
    row = holt_smooth(_df(spark, [42]), "k", "t", "x").collect()[0]
    assert row["level_e6"] == 42_000_000 and row["trend_e6"] == 0
    assert row["ses_e6"] == 42_000_000 and row["fc_e6"] == 42_000_000
    with pytest.raises(ValueError):
        holt_smooth(_df(spark, [1]), "k", "t", "x", alpha=0.3)
    with pytest.raises(ValueError):
        holt_smooth(_df(spark, [1]), "k", "t", "x", horizon=-1)


def test_holt_trend_sign_tracks_drift(spark):
    up = holt_smooth(_df(spark, list(range(0, 400, 4))), "k", "t", "x").collect()[0]
    dn = holt_smooth(_df(spark, list(range(400, 0, -4))), "k", "t", "x").collect()[0]
    assert up["trend_e6"] > 0 > dn["trend_e6"]
    assert up["fc_e6"] > up["level_e6"]


# ------------------------------------------------------------ holt-winters


def _py_hw(vals, p, a=0.25, g=0.125, d=0.25, h=24):
    l, b, s = float(vals[0]), 0.0, [0.0] * p
    for x in vals[1:]:
        s1 = s[0]
        l2 = a * (x - s1) + (1 - a) * (l + b)
        b = g * (l2 - l) + (1 - g) * b
        s = s[1:] + [d * (x - l2) + (1 - d) * s1]
        l = l2
    fc = l + float(h) * b + s[(h - 1) % p]
    return l, b, s[0], fc


def test_holt_winters_matches_python_bitwise(spark):
    from rtsa_spark.operators.smooth import holt_winters

    rng = np.random.RandomState(6)
    base = 300 + 80 * np.sin(np.arange(240) * 2 * np.pi / 12)
    vals = (base + rng.randint(-5, 6, size=240)).astype(int)
    row = holt_winters(_df(spark, vals), "k", "t", "x", period=12).collect()[0]
    l, b, s0, fc = _py_hw([float(v) for v in vals], 12)
    assert row["n"] == 240
    assert row["level_e6"] == int(np.floor(l * 1e6))
    assert row["trend_e6"] == int(np.floor(b * 1e6))
    assert row["s_next_e6"] == int(np.floor(s0 * 1e6))
    assert row["fc_e6"] == int(np.floor(fc * 1e6))


def test_holt_winters_learns_seasonal_sign(spark):
    from rtsa_spark.operators.smooth import holt_winters

    # period 4, phase 0 always high: after many cycles s for phase 0 > 0
    vals = [200, 100, 100, 100] * 30
    row = holt_winters(_df(spark, vals), "k", "t", "x", period=4).collect()[0]
    # last consumed phase is 3 (index 119); next to consume is phase 0 -> high
    assert row["s_next_e6"] > 10_000_000  # ~ +75 amplitude
    l, b, s0, fc = _py_hw([float(v) for v in vals], 4)
    assert row["s_next_e6"] == int(np.floor(s0 * 1e6))


def test_holt_winters_guards(spark):
    from rtsa_spark.operators.smooth import holt_winters

    with pytest.raises(ValueError):
        holt_winters(_df(spark, [1, 2]), "k", "t", "x", period=1)
    with pytest.raises(ValueError):
        holt_winters(_df(spark, [1, 2]), "k", "t", "x", period=4, delta=0.3)
    row = holt_winters(_df(spark, [50]), "k", "t", "x", period=3).collect()[0]
    assert row["level_e6"] == 50_000_000 and row["trend_e6"] == 0
    assert row["s_next_e6"] == 0 and row["fc_e6"] == 50_000_000


def test_zscore_outliers_matches_numpy(spark):
    import numpy as np

    from rtsa_spark.operators.anomaly import zscore_outliers

    rng = np.random.RandomState(11)
    vals = rng.randint(-500, 500, 64).tolist() + [9000]
    df = spark.createDataFrame(
        [("k", i, int(v)) for i, v in enumerate(vals)],
        "g string, t int, v long",
    )
    rows = zscore_outliers(df, "g", "t", "v").collect()
    mu, sd = np.mean(vals), np.std(vals, ddof=1)
    for r in rows:
        assert r["is_outlier"] == (abs(r["x"] - mu) > 3 * sd)
    assert sum(r["is_outlier"] for r in rows) >= 1


def test_zscore_degenerate_single_row(spark):
    from rtsa_spark.operators.anomaly import zscore_outliers

    df = spark.createDataFrame([("k", 0, 5)], "g string, t int, v long")
    [r] = zscore_outliers(df, "g", "t", "v").collect()
    assert r["is_outlier"] is False


def test_seasonal_zscore_composition(spark):
    """The seasonal-ESD shape: a moderate anomaly hidden under strong
    seasonality is invisible to the raw 3-sigma rule but flagged once
    decompose_components strips the seasonal/trend components."""
    import datetime as dt

    import numpy as np

    from rtsa_spark.operators.anomaly import zscore_outliers
    from rtsa_spark.operators.components import decompose_components

    t0 = dt.datetime(2024, 1, 1)
    n, p = 56, 7
    seas = [10000, -8000, 3000, -2000, 6000, -5000, -4000]
    vals = [seas[i % p] for i in range(n)]
    vals[30] += 5000  # ~0.7 sigma of the raw series: invisible raw
    rows = [
        ("s", t0 + dt.timedelta(days=i), int(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )
    raw = {
        r["t"]: r["is_outlier"]
        for r in zscore_outliers(df, "source", "bucket_start", "x").collect()
    }
    assert not any(raw.values())

    comp = decompose_components(df, "daily", value_col="x", period=p)
    adj = comp.select(
        "source",
        "bucket_start",
        (F.col("remainder") * 1000).cast("long").alias("r_e3"),
    )
    flags = {
        r["t"]: r["is_outlier"]
        for r in zscore_outliers(
            adj, "source", "bucket_start", "r_e3"
        ).collect()
    }
    anom_t = t0 + dt.timedelta(days=30)
    assert flags[anom_t]


def test_smooth_state_cap_fails_loudly(spark):
    """The per-key collect_list fold is bounded by max_points (module
    docstring state cap): a skewed key past the cap must raise, never
    silently OOM; under the cap the same data folds fine."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from rtsa_spark.operators.smooth import holt_smooth, holt_winters

    t0 = dt.datetime(2024, 1, 1)
    df = spark.range(50).select(
        F.lit("k").alias("key"),
        (F.lit(t0) + F.make_interval(hours=F.col("id"))).alias("ts"),
        (F.col("id") % 7 + 100).alias("v"),
    )
    with pytest.raises(Exception, match="max_points"):
        holt_smooth(df, "key", "ts", "v", max_points=49).collect()
    with pytest.raises(Exception, match="max_points"):
        holt_winters(df, "key", "ts", "v", period=7, max_points=10).collect()
    assert holt_smooth(df, "key", "ts", "v", max_points=50).count() == 1
    with pytest.raises(ValueError, match="max_points"):
        holt_smooth(df, "key", "ts", "v", max_points=0)


def test_mad_stats_hand(spark):
    from rtsa_spark.operators.anomaly import mad_stats

    rows = [("k", v) for v in (1, 3, 3, 7, 100)] + [("k", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    r = mad_stats(df, ["k"], "v").collect()[0]
    # lower median of [1,3,3,7,100]: rank (50*4)//100+1 = 3 -> 3
    assert r["n"] == 5 and r["median"] == 3
    # deviations [2,0,0,4,97] sorted [0,0,2,4,97]: rank 3 -> 2
    assert r["mad"] == 2
    # even n: lower pick
    ev = spark.createDataFrame([("k", v) for v in (1, 2, 3, 4)], "k string, v long")
    r2 = mad_stats(ev, ["k"], "v").collect()[0]
    assert r2["median"] == 2  # rank (50*3)//100+1 = 2
