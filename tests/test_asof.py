"""As-of join (operators/asof.py): hand cases vs pandas merge_asof."""

from __future__ import annotations

import pandas as pd
import pytest

from rtsa_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, t long, lid long")
    right = spark.createDataFrame(right_rows, "k string, rt long, rv long")
    out = asof_join(left, right, "k", "t", "rt", ["rv"])
    return {
        (r["k"], r["t"], r["lid"]): (r["rv_asof"], r["rt_asof"])
        for r in out.collect()
    }


def test_asof_basic_backward(spark):
    got = _run(
        spark,
        [("a", 5, 1), ("a", 10, 2), ("a", 15, 3), ("a", 2, 4)],
        [("a", 4, 100), ("a", 10, 200)],
    )
    assert got[("a", 2, 4)] == (None, None)      # nothing at-or-before
    assert got[("a", 5, 1)] == (100, 4)
    assert got[("a", 10, 2)] == (200, 10)        # equal ts matches (<=)
    assert got[("a", 15, 3)] == (200, 10)


def test_asof_per_key_isolation(spark):
    got = _run(
        spark,
        [("a", 10, 1), ("b", 10, 2)],
        [("a", 9, 100), ("b", 3, 300)],
    )
    assert got[("a", 10, 1)] == (100, 9)
    assert got[("b", 10, 2)] == (300, 3)


def test_asof_duplicate_left_timestamps(spark):
    got = _run(
        spark,
        [("a", 7, 1), ("a", 7, 2)],
        [("a", 6, 60)],
    )
    assert got[("a", 7, 1)] == (60, 6)
    assert got[("a", 7, 2)] == (60, 6)


def test_asof_empty_right(spark):
    got = _run(spark, [("a", 1, 1)], [])
    assert got[("a", 1, 1)] == (None, None)


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference implementation."""
    import numpy as np

    rng = np.random.default_rng(7)
    lt = sorted(int(x) for x in rng.integers(0, 1000, 80))
    rt = sorted(set(int(x) for x in rng.integers(0, 1000, 25)))
    left_rows = [("k", t, i) for i, t in enumerate(lt)]
    right_rows = [("k", t, t * 10) for t in rt]
    got = _run(spark, left_rows, right_rows)

    exp = pd.merge_asof(
        pd.DataFrame({"t": lt, "lid": range(len(lt))}),
        pd.DataFrame({"rt": rt, "rv": [t * 10 for t in rt]}),
        left_on="t",
        right_on="rt",
        direction="backward",
    )
    for _, row in exp.iterrows():
        want = (
            None if pd.isna(row["rv"]) else int(row["rv"]),
            None if pd.isna(row["rt"]) else int(row["rt"]),
        )
        assert got[("k", int(row["t"]), int(row["lid"]))] == want


def test_asof_plan_has_no_join(spark):
    """The scale contract: union + window, not a join node."""
    left = spark.createDataFrame([("a", 1, 1)], "k string, t long, lid long")
    right = spark.createDataFrame([("a", 1, 2)], "k string, rt long, rv long")
    plan = asof_join(left, right, "k", "t", "rt", ["rv"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
