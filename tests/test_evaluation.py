"""Classifier evaluation: midrank AUC vs a reference fold, confusion
metrics, calibration bins, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.evaluation import (
    ab_test,
    binary_auc,
    calibration_bins,
    threshold_metrics,
)


def _auc_ref(pairs):
    """Reference midrank AUC * 1e6 (floored), straight from the
    definition: rank all scores ascending with midranks for ties."""
    n = len(pairs)
    by_score = sorted(range(n), key=lambda i: pairs[i][0])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and pairs[by_score[j]][0] == pairs[by_score[i]][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[by_score[k]] = mid
        i = j
    npos = sum(1 for _, y in pairs if y)
    nneg = n - npos
    rpos = sum(r for r, (_, y) in zip(ranks, pairs) if y)
    u = rpos - npos * (npos + 1) / 2.0
    return int(1_000_000 * 2 * u) // (2 * npos * nneg)


def _df(spark, pairs, key="k"):
    rows = [(key, s, y) for s, y in pairs]
    return spark.createDataFrame(rows, "k string, s long, y boolean")


def test_auc_matches_reference_with_ties(spark):
    pairs = [
        (10, True), (10, False), (5, False), (20, True), (20, True),
        (5, True), (1, False), (30, False), (10, False), (7, True),
    ]
    got = binary_auc(_df(spark, pairs), ["k"], "s", "y").collect()[0]
    assert got["n"] == 10 and got["n_pos"] == 5 and got["n_neg"] == 5
    assert got["auc_e6"] == _auc_ref(pairs)


def test_auc_endpoints_and_all_tied(spark):
    sep = [(i, i >= 5) for i in range(10)]
    assert binary_auc(_df(spark, sep), ["k"], "s", "y").collect()[0][
        "auc_e6"
    ] == 1_000_000
    rev = [(i, i < 5) for i in range(10)]
    assert binary_auc(_df(spark, rev), ["k"], "s", "y").collect()[0][
        "auc_e6"
    ] == 0
    tied = [(7, y) for y in (True, True, False, False, False)]
    assert binary_auc(_df(spark, tied), ["k"], "s", "y").collect()[0][
        "auc_e6"
    ] == 500_000


def test_auc_single_class_null(spark):
    one = [(1, True), (2, True)]
    r = binary_auc(_df(spark, one), ["k"], "s", "y").collect()[0]
    assert r["auc_e6"] is None and r["n_neg"] == 0


def test_threshold_metrics_hand(spark):
    pairs = [(10, True), (20, True), (5, False), (15, False)]
    out = threshold_metrics(_df(spark, pairs), ["k"], "s", "y", [12])
    r = out.collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
    assert r["precision_e6"] == 500_000
    assert r["recall_e6"] == 500_000
    assert r["f1_e6"] == 500_000
    # degenerate: threshold above everything -> no predictions
    r2 = threshold_metrics(_df(spark, pairs), ["k"], "s", "y", [99]).collect()[0]
    assert r2["precision_e6"] is None and r2["recall_e6"] == 0
    with pytest.raises(ValueError):
        threshold_metrics(_df(spark, pairs), ["k"], "s", "y", [])
    with pytest.raises(ValueError):
        threshold_metrics(_df(spark, pairs), ["k"], "s", "y", [1, 1])


def test_calibration_bins_hand(spark):
    # scale 100, 4 bins of width 25; score==100 clamps into bin 3
    pairs = [(10, False), (20, False), (30, True), (90, True), (100, True)]
    out = calibration_bins(
        _df(spark, pairs), ["k"], "s", "y", n_bins=4, score_scale=100
    )
    got = {r["bin"]: r.asDict() for r in out.collect()}
    assert set(got) == {0, 1, 3}
    assert got[0]["n"] == 2 and got[0]["n_pos"] == 0
    assert got[0]["mean_score_e6"] == (1_000_000 * 30) // (2 * 100)
    assert got[3]["n"] == 2 and got[3]["frac_pos_e6"] == 1_000_000
    assert got[3]["bin_lo_e6"] == 750_000
    with pytest.raises(ValueError):
        calibration_bins(_df(spark, pairs), ["k"], "s", "y", n_bins=1)


def test_calibration_out_of_range_raises(spark):
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    bad = _df(spark, [(150, True)])
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
        calibration_bins(bad, ["k"], "s", "y", n_bins=4, score_scale=100).collect()


def test_auc_null_labels_excluded(spark):
    labeled = [(10, True), (20, True), (1, False), (2, False)]
    with_nulls = labeled + [(15, None), (3, None)]
    a = binary_auc(_df(spark, labeled), ["k"], "s", "y").collect()[0]
    b = binary_auc(_df(spark, with_nulls), ["k"], "s", "y").collect()[0]
    assert b["n"] == 4 and b["auc_e6"] == a["auc_e6"] == 1_000_000


def test_ab_test_hand(spark):
    import math

    rows = (
        [("k", "A", True)] * 30 + [("k", "A", False)] * 70
        + [("k", "B", True)] * 45 + [("k", "B", False)] * 55
        + [("k", "C", True)] * 5      # unknown arm ignored
        + [("k", "B", None)] * 3       # NULL labels excluded
    )
    df = spark.createDataFrame(rows, "k string, v string, y boolean")
    r = ab_test(df, ["k"], "v", "y", control="A", treatment="B").collect()[0]
    assert (r["n_c"], r["x_c"], r["n_t"], r["x_t"]) == (100, 30, 100, 45)
    assert r["rate_c_e6"] == 300_000 and r["rate_t_e6"] == 450_000
    assert r["lift_e6"] == (1_000_000 * (45 * 100 - 30 * 100)) // (30 * 100)
    # z vs the textbook pooled formula
    x, n = 75, 200
    want = (45 * 100 - 30 * 100) / math.sqrt(x * (n - x) / n * (100 * 100))
    assert abs(r["z"] - want) < 1e-12


def test_ab_test_degenerate_nulls(spark):
    df = spark.createDataFrame(
        [("k", "A", True), ("k", "A", True)], "k string, v string, y boolean"
    )
    r = ab_test(df, ["k"], "v", "y", "A", "B").collect()[0]
    assert r["n_t"] == 0 and r["z"] is None and r["lift_e6"] is None
    allconv = spark.createDataFrame(
        [("k", "A", True), ("k", "B", True)], "k string, v string, y boolean"
    )
    r2 = ab_test(allconv, ["k"], "v", "y", "A", "B").collect()[0]
    assert r2["z"] is None  # pooled variance zero


def test_null_scores_and_labels_excluded_everywhere(spark):
    # binary_auc: NULL scores are excluded (not ranked first)
    pairs = [(10, True), (1, False), (None, True)]
    r = binary_auc(_df(spark, pairs), ["k"], "s", "y").collect()[0]
    assert r["n"] == 2 and r["auc_e6"] == 1_000_000
    # calibration_bins: NULL labels excluded from n and frac_pos
    rows = [(50, True), (50, True), (50, None)]
    c = calibration_bins(
        _df(spark, rows), ["k"], "s", "y", n_bins=4, score_scale=100
    ).collect()[0]
    assert c["n"] == 2 and c["frac_pos_e6"] == 1_000_000


def test_ab_sequential_final_matches_ab_test(spark):
    from rtsa_spark.operators.evaluation import ab_sequential

    rows = []
    for d in (1, 2, 3):
        rows += [("k", d, "A", u % 3 == 0) for u in range(20 * d)]
        rows += [("k", d, "B", u % 2 == 0) for u in range(20 * d)]
    df = spark.createDataFrame(rows, "k string, d long, v string, y boolean")
    seq = ab_sequential(df, ["k"], "d", "v", "y", "A", "B").collect()
    assert [r["bucket"] for r in sorted(seq, key=lambda r: r["bucket"])] == [1, 2, 3]
    last = max(seq, key=lambda r: r["bucket"])
    tot = ab_test(df, ["k"], "v", "y", "A", "B").collect()[0]
    for c in ("n_c", "x_c", "n_t", "x_t", "rate_c_e6", "lift_e6", "z"):
        assert last[c] == tot[c], c
    # cumulative counts are monotone
    ordered = sorted(seq, key=lambda r: r["bucket"])
    assert all(a["n_c"] <= b["n_c"] and a["x_t"] <= b["x_t"]
               for a, b in zip(ordered, ordered[1:]))


def test_proportion_ci_wilson(spark):
    import math

    from rtsa_spark.operators.evaluation import proportion_ci

    rows = [("k", True)] * 30 + [("k", False)] * 70 + [("k", None)] * 5
    df = spark.createDataFrame(rows, "k string, y boolean")
    r = proportion_ci(df, ["k"], "y").collect()[0]
    assert r["n"] == 100 and r["x"] == 30 and r["rate_e6"] == 300_000
    z, z2, n, x = 1.96, 1.96 * 1.96, 100, 30
    center = (x + z2 / 2) / (n + z2)
    half = z / (n + z2) * math.sqrt(x * (n - x) / n + z2 / 4)
    assert r["lo_e6"] == math.floor(1e6 * (center - half))
    assert r["hi_e6"] == math.floor(1e6 * (center + half))
    assert r["lo_e6"] < 300_000 < r["hi_e6"]
    # extremes stay inside [0, 1e6]
    allpos = spark.createDataFrame([("k", True)] * 5, "k string, y boolean")
    r2 = proportion_ci(allpos, ["k"], "y").collect()[0]
    assert 0 <= r2["lo_e6"] and r2["hi_e6"] <= 1_000_000 and r2["lo_e6"] < 1_000_000
