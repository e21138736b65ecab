"""Deterministic sampling / splitting / packing (operators/sampling.py)
and benchmark decontamination (operators/dedup.contamination_check)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rtsa_spark.operators.dedup import contamination_check
from rtsa_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
    token_budget_pack,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") * 37 % 211 + 5).cast("bigint").alias("n_tokens"),
    )


def test_hash_split_deterministic_and_stable(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d).collect()}
    assert a == b
    # growing the corpus never moves an existing row between splits
    grown = {r["doc_id"]: r["split"]
             for r in hash_split(_docs(spark, 800)).collect()}
    assert all(grown[k] == v for k, v in a.items())
    # shares are roughly 98/1/1
    counts = {s: sum(1 for v in a.values() if v == s)
              for s in ("train", "val", "test")}
    assert counts["train"] > 350 and counts["val"] < 25 and counts["test"] < 25
    with pytest.raises(ValueError):
        hash_split(d, weights=(5000, 5000, 5000))


def test_hash_split_salt_independence(spark):
    """A different salt reshuffles the assignment (splits are not a
    property of the id alone)."""
    d = _docs(spark)
    a = {r["doc_id"]: r["bucket"] for r in hash_split(d).collect()}
    b = {r["doc_id"]: r["bucket"]
         for r in hash_split(d, salt="split-v2").collect()}
    assert a != b
    assert all(0 <= v < BUCKETS for v in a.values())


def test_hash_sample_rate_and_nesting(spark):
    d = _docs(spark, 2000)
    small = {r["doc_id"] for r in hash_sample(d, 1000).collect()}
    big = {r["doc_id"] for r in hash_sample(d, 5000).collect()}
    assert small < big  # same salt: lower rate is a strict subset
    assert 120 < len(small) < 280  # ~10% of 2000
    assert 800 < len(big) < 1200  # ~50%
    with pytest.raises(ValueError):
        hash_sample(d, 10_001)


def test_token_budget_pack_invariants(spark):
    d = _docs(spark)
    budget = 500
    out = token_budget_pack(d, budget).collect()
    assert len(out) == 400
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["tok_before"] == cum
            assert r["shard"] == cum // budget
            assert r["shard_offset"] == cum % budget
            cum += r["n_tokens"]
        # the stream actually spans multiple shards at this budget
        assert rows[-1]["shard"] >= 2
    with pytest.raises(ValueError):
        token_budget_pack(d, 0)


def test_contamination_check_planted_overlap(spark):
    """A corpus doc sharing an 8-word run with a benchmark doc must be
    flagged (winnowing guarantee: any shared run >= w+k-1 = 7 words);
    disjoint docs must not be."""
    shared = "the quick brown fox jumps over the lazy dog tonight"
    bench = spark.createDataFrame(
        [(100, "benchmark question: " + shared)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "totally unrelated words about spark partitions and shuffles"),
            (2, "contaminated document containing " + shared + " verbatim"),
            (3, "another clean doc with different vocabulary entirely here"),
        ],
        "doc_id long, text string",
    )
    for fn in ("xxhash64", "md5"):
        flagged = {r["doc_id"]: r for r in
                   contamination_check(corpus, bench, hash_fn=fn).collect()}
        assert 2 in flagged and flagged[2]["n_benchmark_docs_hit"] == 1
        assert 1 not in flagged and 3 not in flagged


def test_rank_normalize_exact_percentiles(spark):
    from rtsa_spark.operators.sampling import rank_normalize

    rows = [("s", i, v) for i, v in enumerate([50, 10, 30, 20, 40])]
    rows += [("t", 0, 7)]  # singleton key -> pr_e6 = 0
    df = spark.createDataFrame(rows, "src string, id long, score long")
    out = {(r["key"], r["id"]): r
           for r in rank_normalize(df, "src", "id", "score").collect()}
    assert out[("s", 1)]["pr_e6"] == 0          # lowest score
    assert out[("s", 0)]["pr_e6"] == 1_000_000  # highest
    assert out[("s", 2)]["pr_e6"] == 500_000    # median of 5
    assert out[("t", 0)]["pr_e6"] == 0 and out[("t", 0)]["n"] == 1


def test_rank_normalize_tie_break_on_id(spark):
    from rtsa_spark.operators.sampling import rank_normalize

    df = spark.createDataFrame(
        [("s", 2, 5), ("s", 1, 5), ("s", 3, 5)],
        "src string, id long, score long",
    )
    out = {r["id"]: r["rank"]
           for r in rank_normalize(df, "src", "id", "score").collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def test_weighted_hash_sample_rates_and_determinism(spark):
    from rtsa_spark.operators.sampling import weighted_hash_sample

    docs = spark.createDataFrame(
        [(i, "hi" if i % 2 else "lo") for i in range(2000)],
        "doc_id long, source string",
    )
    rates = spark.createDataFrame(
        [("hi", 8000), ("lo", 1000)], "source string, rate_e4 long"
    )
    kept = weighted_hash_sample(docs, rates, "source", "doc_id")
    counts = {r["source"]: r["cnt"] for r in
              kept.groupBy("source").agg(__import__("pyspark").sql.functions.count("*").alias("cnt")).collect()}
    # 1000 docs per source: expect ~800 and ~100, generous band
    assert 650 <= counts["hi"] <= 950
    assert 40 <= counts["lo"] <= 180
    # determinism + growth invariance: the same doc_ids survive when the
    # corpus doubles (new ids appended)
    first = {r["doc_id"] for r in kept.collect()}
    more = spark.createDataFrame(
        [(i, "hi" if i % 2 else "lo") for i in range(4000)],
        "doc_id long, source string",
    )
    second = {
        r["doc_id"]
        for r in weighted_hash_sample(more, rates, "source", "doc_id").collect()
        if r["doc_id"] < 2000
    }
    assert first == second
    # rate above BUCKETS clamps to keep-all
    all_r = spark.createDataFrame(
        [("hi", 99999), ("lo", 99999)], "source string, rate_e4 long"
    )
    assert weighted_hash_sample(docs, all_r, "source", "doc_id").count() == 2000


def test_apportion_budget_hand_and_sum(spark):
    from rtsa_spark.operators.sampling import apportion_budget
    import pytest as _pytest

    rows = [("a", 5), ("b", 3), ("c", 1), ("d", 0)]
    df = spark.createDataFrame(rows, "source string, weight long")
    got = {r["source"]: r for r in apportion_budget(df, 10).collect()}
    # quotas: a=50/9=5 r5, b=30/9=3 r3, c=10/9=1 r1, d=0; leftover=1 -> a
    assert (got["a"]["base_alloc"], got["a"]["alloc"]) == (5, 6)
    assert (got["b"]["base_alloc"], got["b"]["alloc"]) == (3, 3)
    assert got["c"]["alloc"] == 1 and got["d"]["alloc"] == 0
    assert sum(r["alloc"] for r in got.values()) == 10
    # exact-sum property holds for awkward totals and tie remainders
    df2 = spark.createDataFrame(
        [(f"s{i:02d}", 7) for i in range(13)], "source string, weight long"
    )
    out = apportion_budget(df2, 1_000_003).collect()
    assert sum(r["alloc"] for r in out) == 1_000_003
    # equal weights + tie remainders: the extra units go to smallest keys
    allocs = {r["source"]: r["alloc"] for r in out}
    base = min(allocs.values())
    extras = sorted(s for s, a in allocs.items() if a == base + 1)
    assert extras == sorted(allocs)[: len(extras)]
    with _pytest.raises(ValueError):
        apportion_budget(df, -1)
