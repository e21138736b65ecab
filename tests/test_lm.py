"""n-gram LM count tables: hand counts, KN discount, continuation parity."""

from __future__ import annotations

from collections import Counter

import pytest

from rtsa_spark.operators.lm import continuation_topk, kn_order_stats, ngram_counts

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_grams(rows, n):
    c = Counter()
    for _, text in rows:
        w = text.split(" ")
        for i in range(len(w) - n + 1):
            c[" ".join(w[i : i + n])] += 1
    return c


def test_ngram_counts_hand(spark):
    got = {r["gram"]: r["count"] for r in ngram_counts(_docs(spark), 2).collect()}
    assert got == dict(_py_grams(DOCS, 2))
    assert got["the cat"] == 2 and got["cat sat"] == 1


def test_ngram_counts_short_docs_drop(spark):
    rows = [(1, "one"), (2, "two words here")]
    got = {r["gram"]: r["count"] for r in ngram_counts(_docs(spark, rows), 3).collect()}
    assert got == {"two words here": 1}  # 1-word doc contributes nothing


def test_kn_order_stats_hand(spark):
    g = ngram_counts(_docs(spark), 1)
    row = kn_order_stats(g, 1).collect()[0]
    c = _py_grams(DOCS, 1)
    counts = Counter(c.values())
    assert row["ord"] == 1
    assert row["n_types"] == len(c)
    assert row["total_count"] == sum(c.values())
    for k in (1, 2, 3, 4):
        assert row[f"n{k}"] == counts.get(k, 0)
    n1, n2 = counts.get(1, 0), counts.get(2, 0)
    assert row["discount_e6"] == (1_000_000 * n1) // (n1 + 2 * n2)


def test_kn_discount_null_when_unestimable(spark):
    # every gram appears 3x: no singletons/doubletons -> NULL discount
    rows = [(i, "x y") for i in range(3)]
    row = kn_order_stats(ngram_counts(_docs(spark, rows), 2), 2).collect()[0]
    assert row["n1"] == 0 and row["n2"] == 0 and row["discount_e6"] is None


def test_continuation_counts_kn_intuition(spark):
    # "francisco" follows only "san" (cont=1) despite raw count 3;
    # "runs" follows 3 distinct predecessors
    rows = [
        (1, "san francisco san francisco san francisco"),
        (2, "he runs she runs it runs"),
    ]
    big = ngram_counts(_docs(spark, rows), 2)
    got = {r["word"]: r for r in continuation_topk(big, k=50).collect()}
    assert got["francisco"]["cont"] == 1
    assert got["runs"]["cont"] == 3
    n_types = big.count()
    assert got["runs"]["pcont_e6"] == (1_000_000 * 3) // n_types
    assert got["runs"]["n_bigram_types"] == n_types


def test_continuation_topk_rank_and_ties(spark):
    big = ngram_counts(_docs(spark), 2)
    out = continuation_topk(big, k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    # ties broken by word ascending
    pairs = [(r["cont"], r["word"]) for r in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_guards(spark):
    with pytest.raises(ValueError):
        ngram_counts(_docs(spark), 0)
    with pytest.raises(ValueError):
        continuation_topk(ngram_counts(_docs(spark), 2), k=0)


def test_empty_corpus_silent(spark):
    empty = _docs(spark).where("1=0")
    assert ngram_counts(empty, 2).count() == 0
    row = kn_order_stats(ngram_counts(empty, 2), 2).collect()[0]
    assert row["n_types"] == 0 and row["total_count"] == 0
    assert row["discount_e6"] is None
    assert continuation_topk(ngram_counts(empty, 2)).count() == 0
