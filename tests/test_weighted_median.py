"""Exact lower weighted median: hand picks, tie collapse, guards."""

from __future__ import annotations

import pytest

from rtsa_spark.operators.sessionize import weighted_median


def _wm(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long, w long")
    return {
        r["k"]: r.asDict()
        for r in weighted_median(df, ["k"], "v", "w").collect()
    }


def test_hand_picks(spark):
    # total 10: cum at v=1 is 4 (<5), at v=2 is 7 (>=5) -> median 2
    got = _wm(spark, [("a", 1, 4), ("a", 2, 3), ("a", 3, 3)])
    assert got["a"]["wmedian"] == 2 and got["a"]["total_w"] == 10
    # heavy tail: one huge weight dominates
    got = _wm(spark, [("b", 1, 1), ("b", 2, 1), ("b", 100, 50)])
    assert got["b"]["wmedian"] == 100
    # exact half boundary: 2*cum >= tot at the lower value (lower median)
    got = _wm(spark, [("c", 1, 5), ("c", 9, 5)])
    assert got["c"]["wmedian"] == 1


def test_ties_collapse_and_python_reference(spark):
    import random

    rng = random.Random(3)
    rows = [("k", rng.randrange(1, 20), rng.randrange(1, 9)) for _ in range(200)]
    got = _wm(spark, rows)["k"]
    # reference: expand weights, lower median by cumulative rule
    expanded = sorted(v for _, v, w in rows for _ in range(w))
    tot = len(expanded)
    cum, ref = 0, None
    for v in sorted({v for _, v, _ in rows}):
        cum += sum(w for _, vv, w in rows if vv == v)
        if 2 * cum >= tot:
            ref = v
            break
    assert got["wmedian"] == ref and got["total_w"] == tot
    assert got["n_rows"] == 200


def test_weight_guard(spark):
    df = spark.createDataFrame([("k", 1, 0)], "k string, v long, w long")
    with pytest.raises(Exception):
        weighted_median(df, ["k"], "v", "w").collect()
