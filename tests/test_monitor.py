"""Operational monitoring operators: missing_ranges, stale_sources,
top_movers (operators/monitor.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from rtsa_spark.operators.monitor import (
    missing_ranges,
    stale_sources,
    top_movers,
)

T0 = dt.datetime(2024, 1, 1)


def _hourly(spark, present):
    rows = [("k", T0 + dt.timedelta(hours=h)) for h in present]
    return spark.createDataFrame(
        rows, "source string, bucket_start timestamp"
    )


def test_missing_ranges_islands(spark):
    # present 0,1, missing 2-4, present 5, missing 6, present 7
    df = _hourly(spark, [0, 1, 5, 7])
    out = sorted(
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in missing_ranges(df, "hourly").collect()
    )
    h = lambda x: T0 + dt.timedelta(hours=x)
    assert out == [(h(2), h(4), 3), (h(6), h(6), 1)]


def test_missing_ranges_dense_spine_empty(spark):
    df = _hourly(spark, [0, 1, 2, 3])
    assert missing_ranges(df, "hourly").count() == 0


def test_stale_sources_flags(spark):
    rows = [
        ("fresh", T0 + dt.timedelta(hours=100)),
        ("old", T0 + dt.timedelta(hours=1)),
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp"
    )
    as_of = int((T0 + dt.timedelta(hours=101)).timestamp())
    out = {r["key"]: r for r in
           stale_sources(df, as_of, 7200).collect()}
    assert not out["fresh"]["is_stale"] and out["fresh"]["age_s"] == 3600
    assert out["old"]["is_stale"] and out["old"]["age_s"] == 100 * 3600
    with pytest.raises(ValueError):
        stale_sources(df, as_of, -1)


def test_top_movers_rank_and_prefilter(spark):
    rows = []
    for k, vals in {"a": [0, 10, 10, 100], "b": [0, 5, 50, 50]}.items():
        rows += [
            (k, T0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(
        rows, "key string, bucket timestamp, x long"
    )
    out = top_movers(df, "key", "bucket", "x", 3).collect()
    deltas = [(r["key"], r["delta"], r["rank"]) for r in out]
    assert deltas[0] == ("a", 90, 1)
    assert deltas[1] == ("b", 45, 2)
    assert deltas[2] == ("a", 10, 3)  # ties (a,10) < (b,5)? no: |10|>|5|
    with pytest.raises(ValueError):
        top_movers(df, "key", "bucket", "x", 0)


def test_phase_band_breach_flags(spark):
    from rtsa_spark.operators.monitor import phase_band_breach

    # 14 days hourly; hour 3 is steady at 100 except one 10000 spike
    rows = []
    for d in range(14):
        for h in range(24):
            v = 100 if h == 3 else 200 + h
            rows.append(("k", T0 + dt.timedelta(days=d, hours=h), v))
    rows[3] = ("k", T0 + dt.timedelta(hours=3), 10000)  # day-0 hour-3 spike
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )
    out = phase_band_breach(df, "source", "bucket_start", "x", "hour")
    above = [r for r in out.collect() if r["above"]]
    assert len(above) == 1
    assert above[0]["phase"] == 3 and above[0]["x"] == 10000
    assert out.where("below").count() == 0  # p10 of 13x100+spike is 100
