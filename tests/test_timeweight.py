"""Time-weighted avg + state durations: hand integrals, ties, conservation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rtsa_spark.operators.timeweight import duration_in_state, time_weighted_avg


def _twa(spark, rows):
    df = spark.createDataFrame(rows, "k string, t long, v long").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    return {
        r["k"]: r.asDict() for r in time_weighted_avg(df, ["k"], "ts", "v").collect()
    }


def _dis(spark, rows):
    df = spark.createDataFrame(rows, "k string, t long, st string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "st"
    )
    return {
        (r["k"], r["state"]): r.asDict()
        for r in duration_in_state(df, ["k"], "ts", "st").collect()
    }


def test_twa_hand_integrals(spark):
    # v=10 holds 10s, v=20 holds 20s, v=0 terminal (holds 0)
    out = _twa(spark, [("a", 0, 10), ("a", 10, 20), ("a", 30, 0)])
    a = out["a"]
    assert a["n_samples"] == 3 and a["span_s"] == 30
    # locf: (10*10 + 20*20) = 500 -> 500e6 // 30
    assert a["twa_locf_e6"] == (500 * 1_000_000) // 30
    # trap: (10+20)*10 + (20+0)*20 = 700 -> 700e6 // 60
    assert a["twa_trap_e6"] == (700 * 1_000_000) // 60


def test_twa_single_sample_null(spark):
    out = _twa(spark, [("a", 5, 42)])
    a = out["a"]
    assert a["n_samples"] == 1 and a["span_s"] == 0
    assert a["twa_locf_e6"] is None and a["twa_trap_e6"] is None


def test_twa_same_second_ties_pinned(spark):
    # two samples in one second: zero-length interval contributes nothing,
    # the (t, v)-sort-maximal row carries forward
    out = _twa(spark, [("a", 0, 1), ("a", 0, 5), ("a", 10, 5)])
    a = out["a"]
    assert a["span_s"] == 10
    assert a["twa_locf_e6"] == 5 * 1_000_000
    assert a["twa_trap_e6"] == (10 * 10 * 1_000_000) // 20  # (5+5)*10 / (2*10)


def test_twa_input_order_invariance(spark):
    rows = [("a", t, v) for t, v in [(0, 3), (7, -4), (9, 11), (20, 2)]]
    fwd = _twa(spark, rows)
    rev = _twa(spark, rows[::-1])
    assert fwd == rev


def test_twa_python_replay_random(spark):
    rng = random.Random(7)
    ts = sorted(rng.sample(range(0, 10_000), 50))
    rows = [("a", t, rng.randint(-500, 500)) for t in ts]
    out = _twa(spark, rows)["a"]
    pairs = sorted((t, v) for _, t, v in rows)
    num_l = sum(v * (pairs[i + 1][0] - t) for i, (t, v) in enumerate(pairs[:-1]))
    num_t = sum(
        (v + pairs[i + 1][1]) * (pairs[i + 1][0] - t)
        for i, (t, v) in enumerate(pairs[:-1])
    )
    span = pairs[-1][0] - pairs[0][0]

    def tdiv(a, b):  # truncate-toward-zero, matching Spark `div`
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    assert out["span_s"] == span
    assert out["twa_locf_e6"] == tdiv(1_000_000 * num_l, span)
    assert out["twa_trap_e6"] == tdiv(1_000_000 * num_t, 2 * span)


def test_state_durations_hand(spark):
    rows = [("a", 0, "up"), ("a", 10, "down"), ("a", 25, "up"), ("a", 40, "down")]
    out = _dis(spark, rows)
    up, down = out[("a", "up")], out[("a", "down")]
    assert up["held_s"] == 10 + 15 and up["n_obs"] == 2 and up["n_enters"] == 2
    assert down["held_s"] == 15 and down["n_obs"] == 2 and down["n_enters"] == 2
    assert up["pct_e6"] == (25 * 1_000_000) // 40
    assert down["pct_e6"] == (15 * 1_000_000) // 40


def test_state_durations_first_obs_is_entry(spark):
    out = _dis(spark, [("a", 0, "up"), ("a", 10, "up")])
    up = out[("a", "up")]
    assert up["n_enters"] == 1 and up["n_obs"] == 2 and up["held_s"] == 10
    assert up["pct_e6"] == 1_000_000


def test_state_durations_singleton_span_zero(spark):
    out = _dis(spark, [("a", 3, "up")])
    up = out[("a", "up")]
    assert up["held_s"] == 0 and up["pct_e6"] is None and up["n_enters"] == 1


def test_state_durations_null_states_not_evidence(spark):
    """NULL state rows are dropped before the window (ADVICE r4): no NULL
    state group, no spurious enters on neighbors, and durations/span are
    computed as if the NULL observations never happened."""
    rows = [("a", 0, "up"), ("a", 10, None), ("a", 20, "up"), ("a", 30, "down")]
    out = _dis(spark, rows)
    assert set(out) == {("a", "up"), ("a", "down")}
    up = out[("a", "up")]
    # one contiguous 'up' run 0..30 (the NULL at t=10 is not a boundary)
    assert up["n_enters"] == 1 and up["n_obs"] == 2 and up["held_s"] == 30
    down = out[("a", "down")]
    assert down["n_enters"] == 1 and down["held_s"] == 0
    # all-NULL key vanishes entirely
    out2 = _dis(spark, [("b", 0, None), ("b", 5, None)])
    assert not any(k == "b" for k, _ in out2)


def test_state_durations_conservation_random(spark):
    rng = random.Random(11)
    rows = []
    for k in ("a", "b"):
        for t in sorted(rng.sample(range(0, 5_000), 40)):
            rows.append((k, t, rng.choice(["up", "down", "degraded"])))
    df = spark.createDataFrame(rows, "k string, t long, st string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "st"
    )
    out = duration_in_state(df, ["k"], "ts", "st")
    per_key = {
        r["k"]: (r["held"], r["pct"])
        for r in out.groupBy("k")
        .agg(F.sum("held_s").alias("held"), F.sum("pct_e6").alias("pct"))
        .collect()
    }
    for k in ("a", "b"):
        span = max(t for kk, t, _ in rows if kk == k) - min(
            t for kk, t, _ in rows if kk == k
        )
        held, pct = per_key[k]
        assert held == span  # exact conservation
        assert 1_000_000 - 3 <= pct <= 1_000_000  # div truncation, <=3 states
