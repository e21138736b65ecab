"""Weekly side-branch tier and the Benford first-digit audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from rtsa_spark.operators.anomaly import BENFORD_E6, benford_audit
from rtsa_spark.operators.rollup import rollup_next, rollup_raw


def test_benford_constants_sum_to_e6():
    assert sum(BENFORD_E6) == 1_000_000 and len(BENFORD_E6) == 9


def test_benford_hand_case(spark):
    vals = [1, 12, 199, 2, 25, 9000, -13]  # digits: 1,1,1,2,2,9,1
    df = spark.createDataFrame(
        [("k", v) for v in vals], "g string, v long"
    )
    rows = {r["digit"]: r for r in benford_audit(df, "g", "v").collect()}
    assert rows[1]["cnt"] == 4 and rows[2]["cnt"] == 2 and rows[9]["cnt"] == 1
    n = 7
    assert rows[1]["n"] == n
    assert rows[1]["exp_e6"] == 301030
    assert rows[1]["obs_e6"] == (1_000_000 * 4) // n
    assert rows[1]["dev_e6"] == abs(1_000_000 * 4 - 301030 * n) // n


def test_benford_excludes_zero(spark):
    df = spark.createDataFrame(
        [("k", 0), ("k", 5)], "g string, v long"
    )
    rows = benford_audit(df, "g", "v").collect()
    assert len(rows) == 1 and rows[0]["n"] == 1 and rows[0]["digit"] == 5


def test_weekly_branch_matches_direct(spark, tiny_sequences):
    """daily -> weekly cascade == direct week-trunc aggregation of raw."""
    raw = rollup_raw(tiny_sequences)
    hourly = rollup_next(raw, "hourly")
    daily = rollup_next(hourly, "daily")
    weekly = rollup_next(daily, "weekly")
    direct = (
        tiny_sequences.groupBy(
            "source", F.date_trunc("week", "ts").alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.sum("n_tok").cast("bigint").alias("n_tok_sum"),
            F.min("n_tok").cast("int").alias("n_tok_min"),
            F.max("n_tok").cast("int").alias("n_tok_max"),
        )
    )
    joined = weekly.select(
        "source", "bucket_start", "n_seq", "n_tok_sum", "n_tok_min", "n_tok_max"
    ).exceptAll(direct)
    assert joined.count() == 0
    assert weekly.count() == direct.count()


def test_iqr_outliers_flags_extremes(spark):
    from rtsa_spark.operators.anomaly import iqr_outliers

    vals = list(range(10, 30)) + [1000, -1000]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "g string, t int, v long",
    )
    out = {r["x"]: r for r in iqr_outliers(df, "g", "t", "v").collect()}
    assert out[1000]["is_high"] and not out[1000]["is_low"]
    assert out[-1000]["is_low"] and not out[-1000]["is_high"]
    assert not out[15]["is_low"] and not out[15]["is_high"]


def test_iqr_matches_numpy_fences(spark):
    import numpy as np

    from rtsa_spark.operators.anomaly import iqr_outliers

    rng = np.random.RandomState(2)
    vals = rng.randint(-200, 200, 101).tolist()
    df = spark.createDataFrame(
        [("k", i, int(v)) for i, v in enumerate(vals)],
        "g string, t int, v long",
    )
    rows = iqr_outliers(df, "g", "t", "v").collect()
    q25, q75 = np.percentile(vals, [25, 75])  # numpy default == type 7
    iqr = q75 - q25
    for r in rows:
        assert r["is_low"] == (r["x"] < q25 - 1.5 * iqr)
        assert r["is_high"] == (r["x"] > q75 + 1.5 * iqr)
