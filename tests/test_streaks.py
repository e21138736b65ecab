"""Value streaks (gaps-and-islands on a predicate): hand runs, breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.monitor import streak_summary, value_streaks


def _df(spark, rows):
    # rows: (key, hour_index, flag)
    return spark.createDataFrame(rows, "k string, h long, ok boolean").select(
        "k", F.timestamp_seconds(F.col("h") * 3600).alias("b"), "ok"
    )


def test_streaks_hand(spark):
    rows = [
        ("a", 0, True), ("a", 1, True), ("a", 2, False), ("a", 3, True),
        # hour 4 unobserved -> breaks the streak even though 5 is true
        ("a", 5, True), ("a", 6, True),
        ("b", 0, False),
    ]
    out = value_streaks(_df(spark, rows), ["k"], "b", 3600, "ok")
    got = sorted(
        (r["k"], int(r["streak_start"].timestamp()) // 3600, r["n_buckets"])
        for r in out.collect()
    )
    assert got == [("a", 0, 2), ("a", 3, 1), ("a", 5, 2)]


def test_streak_summary_ties_earliest(spark):
    rows = [
        ("a", 0, True), ("a", 1, True),
        ("a", 5, True), ("a", 6, True),  # second streak same length
        ("a", 9, True),
    ]
    s = streak_summary(_df(spark, rows), ["k"], "b", 3600, "ok").collect()[0]
    assert s["n_streaks"] == 3 and s["longest"] == 2 and s["total_true"] == 5
    assert int(s["longest_start"].timestamp()) == 0  # earliest of the tied pair


def test_streaks_empty_and_guard(spark):
    df = _df(spark, [("a", 0, False)])
    assert value_streaks(df, ["k"], "b", 3600, "ok").count() == 0
    with pytest.raises(ValueError):
        value_streaks(df, ["k"], "b", 0, "ok")


def test_streaks_duplicate_rows_collapse(spark):
    # a duplicated (key, bucket) row must not split or double-count runs
    rows = [("a", 0, True), ("a", 0, True), ("a", 1, True)]
    out = value_streaks(_df(spark, rows), ["k"], "b", 3600, "ok").collect()
    assert len(out) == 1 and out[0]["n_buckets"] == 2
    s = streak_summary(_df(spark, rows), ["k"], "b", 3600, "ok").collect()[0]
    assert s["n_streaks"] == 1 and s["total_true"] == 2


def test_topk_churn_hand(spark):
    from rtsa_spark.operators.monitor import topk_churn

    rows = (
        [("k", 1, it) for it in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
        + [("k", 2, it) for it in ["a"] * 4 + ["d"] * 3 + ["e"] * 2 + ["b"]]
    )
    df = spark.createDataFrame(rows, "k string, p long, it string")
    out = {r["period"]: r.asDict() for r in topk_churn(df, ["k"], "p", "it", k=3).collect()}
    assert out[1]["topk"] == ["a", "b", "c"]
    assert out[1]["n_kept"] is None  # first period
    # period 2 counts: a=4, d=3, e=2, b=1 -> top3 = [a, d, e]
    assert out[2]["topk"] == ["a", "d", "e"]
    assert out[2]["n_kept"] == 1 and out[2]["n_entered"] == 2
    assert out[2]["n_exited"] == 2
    assert out[2]["jaccard_e6"] == (1_000_000 * 1) // 5
    # tie pinning: equal counts order by item asc
    tie = spark.createDataFrame(
        [("k", 1, it) for it in ["z", "y", "x"]], "k string, p long, it string"
    )
    t = topk_churn(tie, ["k"], "p", "it", k=2).collect()[0]
    assert t["topk"] == ["x", "y"]
    import pytest as _pt
    with _pt.raises(ValueError):
        topk_churn(df, ["k"], "p", "it", k=0)


def test_local_time_bucket_hand(spark):
    from rtsa_spark.operators.rollup import local_time_bucket

    # 23:30 UTC with +1h offset lands in the NEXT local day; -2h offset
    # keeps it; negative local epochs floor correctly
    rows = [
        (1, 84600, 3600),    # 23:30 UTC day0, +1h -> local day1
        (2, 84600, -7200),   # 23:30 UTC day0, -2h -> local day0
        (3, 1800, -7200),    # 00:30 UTC day0, -2h -> local day -1
    ]
    df = spark.createDataFrame(rows, "id long, t long, off long").select(
        "id", F.timestamp_seconds("t").alias("ts"), "off"
    )
    out = {r["id"]: r["local_bucket_start"]
           for r in local_time_bucket(df, "ts", "off", 86400).collect()}
    assert out[1] == 86400
    assert out[2] == 0
    assert out[3] == -86400
    import pytest as _pt
    with _pt.raises(ValueError):
        local_time_bucket(df, "ts", "off", 0)
