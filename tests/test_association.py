"""Pair association rules + Cohen's kappa: hand tables, prune, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rtsa_spark.operators.association import pair_rules
from rtsa_spark.operators.evaluation import cohens_kappa


def _rules(spark, rows, min_count=2):
    df = spark.createDataFrame(rows, "k string, u long, it string")
    out = pair_rules(df, ["k"], ["u"], "it", min_count=min_count)
    return {(r["antecedent"], r["consequent"]): r.asDict() for r in out.collect()}


def test_pair_rules_hand(spark):
    rows = [
        ("k", 1, "x"), ("k", 1, "y"),
        ("k", 2, "x"), ("k", 2, "y"),
        ("k", 3, "x"),
        ("k", 4, "z"), ("k", 4, "x"),
        ("k", 4, "x"),  # duplicate within basket collapses
    ]
    got = _rules(spark, rows, min_count=1)
    r = got[("x", "y")]
    assert r["n_baskets"] == 4 and r["n_ante"] == 4 and r["n_cons"] == 2
    assert r["n_both"] == 2
    assert r["support_e6"] == 500_000
    assert r["confidence_e6"] == 500_000
    # lift = (2/4) / (2/4) = 1.0
    assert r["lift_e6"] == 1_000_000
    # asymmetric confidence: y -> x is 100%
    assert got[("y", "x")]["confidence_e6"] == 1_000_000
    # lift(y->x) = (2*4)/(2*4) = 1.0 (x is in every basket)
    assert got[("y", "x")]["lift_e6"] == 1_000_000
    # z -> x : confidence 1.0, lift 1.0; x -> z : 1/4 conf, lift 1.0
    assert got[("z", "x")]["confidence_e6"] == 1_000_000
    assert got[("x", "z")]["support_e6"] == 250_000
    # no self pairs
    assert ("x", "x") not in got


def test_pair_rules_apriori_prune(spark):
    rows = [("k", 1, "x"), ("k", 1, "rare"), ("k", 2, "x"), ("k", 2, "y"),
            ("k", 3, "y"), ("k", 3, "x")]
    got = _rules(spark, rows, min_count=2)
    # 'rare' appears in one basket: pruned from all pairs
    assert all("rare" not in p for p in got)
    assert got[("x", "y")]["n_both"] == 2
    with pytest.raises(ValueError):
        _rules(spark, rows, min_count=0)
    df = spark.createDataFrame(rows, "k string, u long, it string")
    with pytest.raises(ValueError):
        pair_rules(df, ["k"], [], "it")


def test_kappa_hand_and_degenerate(spark):
    rows = (
        [("k", "a", "a")] * 20 + [("k", "b", "b")] * 5
        + [("k", "a", "b")] * 10 + [("k", "b", "a")] * 15
    )
    df = spark.createDataFrame(rows, "k string, r1 string, r2 string")
    r = cohens_kappa(df, ["k"], "r1", "r2").collect()[0]
    # n=50 d=25 rows a=30 b=20 cols a=35 b=15 -> pe=1350
    # kappa = (1250-1350)/(2500-1350) = -100/1150 -> toward zero
    assert r["n"] == 50 and r["n_agree"] == 25 and r["pe_num"] == 1350
    assert r["kappa_e6"] == -86956
    # perfect agreement -> 1e6; both constant -> NULL
    perf = spark.createDataFrame(
        [("k", "a", "a")] * 3 + [("k", "b", "b")] * 2,
        "k string, r1 string, r2 string",
    )
    assert cohens_kappa(perf, ["k"], "r1", "r2").collect()[0]["kappa_e6"] == 1_000_000
    const = spark.createDataFrame(
        [("k", "a", "a")] * 4, "k string, r1 string, r2 string"
    )
    assert cohens_kappa(const, ["k"], "r1", "r2").collect()[0]["kappa_e6"] is None
    with pytest.raises(ValueError):
        cohens_kappa(df, [], "r1", "r2")


def test_kappa_disjoint_categories_zero(spark):
    # raters that never use a common label: kappa is 0, not a dropped key
    df = spark.createDataFrame(
        [("k", "x", "y")] * 4, "k string, r1 string, r2 string"
    )
    r = cohens_kappa(df, ["k"], "r1", "r2").collect()
    assert len(r) == 1
    assert r[0]["pe_num"] == 0 and r[0]["kappa_e6"] == 0


def test_kappa_null_rater_rows_excluded(spark):
    rows = [("k", "a", "a")] * 10 + [("k", None, None)] * 10
    df = spark.createDataFrame(rows, "k string, r1 string, r2 string")
    r = cohens_kappa(df, ["k"], "r1", "r2").collect()[0]
    # unlabeled pairs are not evidence: n = labeled rows only, and the
    # 10 genuinely agreeing pairs give the constant-rater NULL kappa
    assert r["n"] == 10 and r["n_agree"] == 10 and r["kappa_e6"] is None


def test_cramers_v_hand(spark):
    import math

    from rtsa_spark.operators.association import cramers_v

    # 2x2 with known chi2: a=[x,y], b=[u,v]
    rows = (
        [("k", "x", "u")] * 30 + [("k", "x", "v")] * 10
        + [("k", "y", "u")] * 10 + [("k", "y", "v")] * 30
        + [("k", None, "u")] * 5  # excluded
    )
    df = spark.createDataFrame(rows, "k string, a string, b string")
    r = cramers_v(df, ["k"], "a", "b").collect()[0]
    assert r["n"] == 80 and r["r_cats"] == 2 and r["c_cats"] == 2
    assert r["dof"] == 1
    # reference chi2 via the same per-cell float chain, ordered fold
    cells = {("x", "u"): 30, ("x", "v"): 10, ("y", "u"): 10, ("y", "v"): 30}
    rm = {"x": 40, "y": 40}
    cm = {"u": 40, "v": 40}
    chi2 = 0.0
    for (a, b) in sorted(cells):
        e = rm[a] * cm[b] / 80
        d = cells[(a, b)] - e
        chi2 += d * d / e
    assert r["chi2"] == chi2
    assert r["v"] == math.sqrt(chi2 / (80 * 1))
    # independence -> chi2 == 0
    ind = spark.createDataFrame(
        [("k", a, b) for a in "xy" for b in "uv" for _ in range(10)],
        "k string, a string, b string",
    )
    r2 = cramers_v(ind, ["k"], "a", "b").collect()[0]
    assert r2["chi2"] == 0.0 and r2["v"] == 0.0
    # constant column -> NULL v
    const = spark.createDataFrame(
        [("k", "x", b) for b in "uvuv"], "k string, a string, b string"
    )
    assert cramers_v(const, ["k"], "a", "b").collect()[0]["v"] is None
    import pytest as _pt

    with _pt.raises(ValueError):
        cramers_v(df, [], "a", "b")
