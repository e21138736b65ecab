"""Edit-distance near-dup: exactness on candidates, recall on mutations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.dedup import edit_near_dup


def _corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog every day",
        "pack my box with five dozen liquor jugs for the trip",
        "how vexingly quick daft zebras jump over fences today",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t.replace("quick", "quack", 1)
                     if "quick" in t else t + "!"))  # small edit
    rows.append((99, "completely different text about distributed systems"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_edit_pairs_exact_and_recall(spark):
    df = _corpus(spark)
    out = edit_near_dup(df, max_edit=5, max_hamming=4, bits=16).collect()
    got = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out}
    # each mutated twin is found with its true distance
    assert got[(0, 1)] <= 2 and got[(10, 11)] <= 2 and got[(20, 21)] <= 2
    # distances are exact vs python reference
    texts = {r["doc_id"]: r["text"] for r in df.collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for (a, b), d in got.items():
        assert d == lev(texts[a], texts[b])
    # the unrelated doc pairs with nothing
    assert all(99 not in p for p in got)


def test_edit_guard_and_zero(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        edit_near_dup(df, max_edit=-1)
    with pytest.raises(ValueError):
        edit_near_dup(df, bits=32)
    # max_edit=0 finds only exact duplicates
    dup = df.unionByName(
        df.where("doc_id = 0").select(F.lit(1000).alias("doc_id"), "text")
    )
    out = edit_near_dup(dup, max_edit=0, max_hamming=1, bits=48).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1000)}
    assert out[0]["edit_dist"] == 0
