"""Funnel conversion + Markov transitions: hand paths, windows, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.funnel import funnel_conversion, markov_transitions


def _fc(spark, rows, steps, within_s=None):
    df = spark.createDataFrame(rows, "u long, t long, ty string").select(
        "u", F.timestamp_seconds("t").alias("ts"), "ty"
    )
    out = funnel_conversion(df, "u", "ts", "ty", steps, within_s=within_s)
    return {r["step"]: r.asDict() for r in out.collect()}


def _mk(spark, rows):
    df = spark.createDataFrame(rows, "u long, t long, st string").select(
        "u", F.timestamp_seconds("t").alias("ts"), "st"
    )
    out = markov_transitions(df, ["u"], "ts", "st")
    return {(r["from_state"], r["to_state"]): r.asDict() for r in out.collect()}


def test_funnel_hand_conversion(spark):
    rows = [
        # u1 completes A -> B -> C in order
        (1, 0, "A"), (1, 10, "B"), (1, 20, "C"),
        # u2 completes A -> B, C happened BEFORE B (doesn't count)
        (2, 0, "A"), (2, 5, "C"), (2, 10, "B"),
        # u3 only A
        (3, 0, "A"),
        # u4 never does A; B/C alone must not enter any denominator
        (4, 0, "B"), (4, 5, "C"),
    ]
    got = _fc(spark, rows, ["A", "B", "C"])
    assert got[1]["n_converted"] == 3
    assert got[2]["n_converted"] == 2
    assert got[3]["n_converted"] == 1
    assert got[1]["conv_from_first_e6"] == 1_000_000
    assert got[2]["conv_from_first_e6"] == (1_000_000 * 2) // 3
    assert got[3]["conv_from_first_e6"] == (1_000_000 * 1) // 3
    assert got[3]["conv_from_prev_e6"] == (1_000_000 * 1) // 2


def test_funnel_order_requirement(spark):
    # B before A: step 2 incomplete
    got = _fc(spark, [(1, 10, "B"), (1, 20, "A")], ["A", "B"])
    assert got[1]["n_converted"] == 1 and got[2]["n_converted"] == 0
    # same-second follow-up counts (>= semantics)
    got = _fc(spark, [(1, 10, "A"), (1, 10, "B")], ["A", "B"])
    assert got[2]["n_converted"] == 1


def test_funnel_whole_window(spark):
    rows = [(1, 0, "A"), (1, 100, "B"), (2, 0, "A"), (2, 10, "B")]
    got = _fc(spark, rows, ["A", "B"], within_s=50)
    assert got[1]["n_converted"] == 2 and got[2]["n_converted"] == 1


def test_funnel_earliest_chain_not_any_pair(spark):
    # earliest A at t=0; B exists only before it -> no conversion even
    # though *some* (A, B) pair in another order might look tempting
    rows = [(1, 5, "A"), (1, 0, "B")]
    got = _fc(spark, rows, ["A", "B"])
    assert got[2]["n_converted"] == 0


def test_funnel_empty_and_guards(spark):
    df = spark.createDataFrame([], "u long, ts timestamp, ty string")
    out = funnel_conversion(df, "u", "ts", "ty", ["A", "B"]).collect()
    assert [r["n_converted"] for r in out] == [0, 0]
    assert all(r["conv_from_first_e6"] is None for r in out)
    with pytest.raises(ValueError):
        funnel_conversion(df, "u", "ts", "ty", ["A"])
    with pytest.raises(ValueError):
        funnel_conversion(df, "u", "ts", "ty", ["A", "A"])
    with pytest.raises(ValueError):
        funnel_conversion(df, "u", "ts", "ty", ["A", "B"], within_s=0)


def test_markov_hand_table(spark):
    rows = [
        (1, 0, "up"), (1, 10, "down"), (1, 20, "up"), (1, 30, "up"),
        (2, 0, "down"), (2, 10, "up"),
    ]
    got = _mk(spark, rows)
    assert got[("up", "down")]["cnt"] == 1
    assert got[("down", "up")]["cnt"] == 2
    assert got[("up", "up")]["cnt"] == 1
    assert got[("up", "down")]["from_total"] == 2
    assert got[("up", "down")]["p_e6"] == 500_000
    assert got[("down", "up")]["p_e6"] == 1_000_000
    # no cross-key transition: u1's last 'up' never chains into u2
    assert ("up", "down") in got and len(got) == 3


def test_markov_rows_sum_to_from_total(spark):
    import random

    rng = random.Random(5)
    rows = [
        (u, t, rng.choice(["a", "b", "c"]))
        for u in (1, 2, 3)
        for t in sorted(rng.sample(range(1000), 30))
    ]
    got = _mk(spark, rows)
    by_from = {}
    for (f, _), r in got.items():
        by_from.setdefault(f, []).append(r)
    for f, rs in by_from.items():
        assert sum(r["cnt"] for r in rs) == rs[0]["from_total"]
        assert all(r["from_total"] == rs[0]["from_total"] for r in rs)


def test_funnel_latency_hand(spark):
    from rtsa_spark.operators.funnel import funnel_latency

    rows = [
        (1, 0, "A"), (1, 10, "B"),
        (2, 0, "A"), (2, 30, "B"),
        (3, 0, "A"), (3, 20, "B"),
        (4, 0, "A"),             # never converts: no delta
    ]
    df = spark.createDataFrame(rows, "u long, t long, ty string").select(
        "u", F.timestamp_seconds("t").alias("ts"), "ty"
    )
    out = funnel_latency(df, "u", "ts", "ty", ["A", "B"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["step"] == 2 and r["step_type"] == "B" and r["n"] == 3
    assert r["min_s"] == 10 and r["max_s"] == 30
    # lower order stats over [10, 20, 30]: p50 rank (50*2)//100+1 = 2 -> 20
    assert r["p50_s"] == 20
    # p90 rank (90*2)//100+1 = 2 -> 20 (lower pick, no interpolation)
    assert r["p90_s"] == 20
