"""Heaps-curve vocabulary accretion: hand curve, conservation, ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from rtsa_spark.operators.lm import vocab_growth


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, b long, it string")
    out = vocab_growth(df, ["k"], "b", "it")
    return {(r["k"], r["bucket"]): r.asDict() for r in out.collect()}


def test_hand_curve(spark):
    rows = [
        ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"),
        ("a", 2, "y"), ("a", 2, "z"),
        ("a", 4, "x"), ("a", 4, "w"),
    ]
    got = _run(spark, rows)
    assert got[("a", 1)]["n_items"] == 3 and got[("a", 1)]["new_types"] == 2
    assert got[("a", 2)]["new_types"] == 1
    assert got[("a", 4)]["new_types"] == 1
    assert got[("a", 4)]["cum_items"] == 7
    assert got[("a", 4)]["cum_types"] == 4
    assert got[("a", 4)]["ttr_e6"] == (1_000_000 * 4) // 7
    # bucket 3 unobserved: absent, not zero-filled (curve is per
    # OBSERVED bucket; gap-fill is the spine operators' job)
    assert ("a", 3) not in got


def test_conservation_and_monotone(spark):
    import random

    rng = random.Random(11)
    rows = [
        ("s", b, rng.choice("abcdefghij"))
        for b in range(1, 9)
        for _ in range(rng.randrange(1, 12))
    ]
    got = _run(spark, rows)
    ordered = [got[k] for k in sorted(got)]
    # totals conserve exactly
    assert ordered[-1]["cum_items"] == len(rows)
    assert ordered[-1]["cum_types"] == len({it for _, _, it in rows})
    assert sum(r["new_types"] for r in ordered) == ordered[-1]["cum_types"]
    # cum columns are running sums in bucket order
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur["cum_items"] == prev["cum_items"] + cur["n_items"]
        assert cur["cum_types"] == prev["cum_types"] + cur["new_types"]


def test_type_first_seen_once_across_keys(spark):
    # same item under two keys is new for EACH key (vocabularies are
    # per-key); empty input yields no rows
    rows = [("a", 1, "x"), ("b", 5, "x")]
    got = _run(spark, rows)
    assert got[("a", 1)]["new_types"] == 1 and got[("b", 5)]["new_types"] == 1
    empty = spark.createDataFrame([], "k string, b long, it string")
    assert vocab_growth(empty, ["k"], "b", "it").count() == 0
