"""Distributed n-gram language-model count tables (Kneser-Ney statistics).

The canonical web-scale token job: build the count tables a smoothed
n-gram LM needs — gram counts, count-of-counts, absolute-discount
estimates, and Kneser-Ney continuation counts — as pure map-side-combined
aggregations, the shape Brants et al. 2007 ("Large Language Models in
Machine Translation") ran over 2T tokens on MapReduce.  Public method
sources: Kneser & Ney 1995 (continuation counts), Ney, Essen & Kneser
1994 / Chen & Goodman 1999 (the discount estimate ``D = n1 / (n1 + 2*n2)``
from count-of-counts).  Implementation is original window/agg algebra.

Everything stays exact-int (counts and one trailing ``div`` per derived
column), so any engine replays the tables bit-identically; the discount
is emitted at e6 scale instead of a float quotient.

Scale shape at 100 TB: grams are built IN-ROW (``transform`` over an
index ``sequence`` — the slice never leaves the row, same device as
``dedup.token_ngram_contamination``), then one explode feeds one
map-side-combinable groupBy per order; the per-order summary is a second
combinable agg over the (already gram-type-sized) count table.
Continuation counts group the distinct bigram TYPE table — vocabulary-
bounded, never token-volume-bounded.  No joins except a single 1-row
broadcast for the normalizing denominator; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ngram_counts", "kn_order_stats", "continuation_topk", "vocab_growth"]


def ngram_counts(
    docs: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Word n-gram type counts over a document corpus: ``(gram, count)``
    with ``gram`` the space-joined n-word window (split on single
    space — the repo-wide tokenizer convention, replayable by any
    engine's ``string_split``).  Documents shorter than ``n`` words
    contribute nothing.  One in-row gram build + one combinable groupBy.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # split ONCE into a projected array column (the `_shingled` device,
    # operators/dedup.py): inline expressions re-evaluate split() per use
    words = docs.select(F.split(F.col(text_col), " ").alias("_w"))
    grams = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - n + 1),
            lambda i: F.array_join(F.slice(F.col("_w"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )


def kn_order_stats(grams: DataFrame, order: int) -> DataFrame:
    """One summary row for an order's count table (the numbers the
    smoother is fit from): ``(ord, n_types, total_count, n1..n4,
    discount_e6)`` where ``nK`` = number of gram types seen exactly K
    times and ``discount_e6 = (1e6 * n1) div (n1 + 2*n2)`` — the
    Ney-Essen-Kneser absolute discount (NULL when the corpus has no
    singletons or doubletons to estimate from).  A single combinable
    agg over the gram-type table.
    """
    c = F.col("count")
    agg = grams.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.coalesce(F.sum(c), F.lit(0)).cast("bigint").alias("total_count"),
        *[
            F.coalesce(F.sum((c == k).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"n{k}")
            for k in (1, 2, 3, 4)
        ],
    )
    return agg.select(
        F.lit(int(order)).cast("bigint").alias("ord"),
        "n_types",
        "total_count",
        "n1",
        "n2",
        "n3",
        "n4",
        F.when(
            (F.col("n1") + 2 * F.col("n2")) > 0,
            F.expr("(1000000 * n1) div (n1 + 2 * n2)"),
        ).alias("discount_e6"),
    )


def continuation_topk(bigram_types: DataFrame, k: int = 20) -> DataFrame:
    """Kneser-Ney continuation counts from the distinct bigram TYPE
    table (:func:`ngram_counts` with ``n=2``): for each word ``w``,
    ``cont = N1+(. w)`` — how many distinct predecessors it follows —
    and the KN unigram backoff probability ``pcont_e6 = (1e6 * cont)
    div n_bigram_types``.  This is the number that makes KN work: "San
    Francisco" gives "Francisco" a huge raw count but cont == 1.

    Emits the top-``k`` words by ``(cont desc, word)`` — deterministic
    tie-break — with the denominator carried on every row.  One
    combinable agg over the type table, a distributed top-k
    (``orderBy().limit(k)`` plans TakeOrderedAndProject: per-partition
    heads, one k-row driver merge — the window ranks only the k
    survivors), and a 1-row broadcast denominator.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    suf = bigram_types.select(
        F.element_at(F.split(F.col("gram"), " "), 2).alias("word")
    )
    cont = suf.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont")
    )
    denom = bigram_types.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types")
    )
    top = cont.orderBy(F.col("cont").desc(), F.asc("word")).limit(k)
    w = Window.orderBy(F.col("cont").desc(), F.asc("word"))
    return top.join(F.broadcast(denom)).select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "word",
        "cont",
        "n_bigram_types",
        F.expr("(1000000 * cont) div n_bigram_types").alias("pcont_e6"),
    )


def vocab_growth(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
) -> DataFrame:
    """Heaps-law vocabulary accretion curve per key: as the corpus grows
    bucket by bucket (ingestion batches, days — any ordered bucket),
    how many NEW types appear and how the cumulative type count tracks
    cumulative token volume (Heaps 1978, "Information Retrieval:
    Computational and Theoretical Aspects" — V(n) ~ K * n^beta; the
    curve itself is emitted exactly, the exponent fit is the caller's
    regression since ``log`` is not portable arithmetic).  A flattening
    curve is the canonical "this source stopped adding diversity"
    signal a data-mixing pipeline reads before re-weighting.
    Generalizes ``rollup.vocab_growth`` (pinned to the token-sequence
    daily table) to arbitrary key/bucket/item inputs and adds the
    token-volume and TTR columns.

    Emits one row per (key, bucket) OBSERVED in the input: ``(keys...,
    bucket, n_items, new_types, cum_items, cum_types, ttr_e6)`` where
    ``new_types`` counts items whose FIRST occurrence falls in the
    bucket, ``cum_*`` are running totals in bucket order, and
    ``ttr_e6 = (1e6 * cum_types) div cum_items`` is the cumulative
    type-token ratio.  Exact integers end to end; rows replay
    bit-identically on any engine.

    Scale shape: the heavy lift is ONE map-side-combinable min-bucket
    groupBy on (keys, item) — vocabulary-sized output, token-volume
    input; then two bucket-granular aggs and a window over the (tiny)
    per-bucket curve table.  No joins wider than (keys, bucket).
    """
    base = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(item_col).alias("_it"),
    )
    first = base.groupBy(*key_cols, "_it").agg(
        F.min("bucket").alias("bucket")
    )
    newt = first.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    vol = base.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items")
    )
    # outer join on the curve tables (bucket-granular, tiny): a bucket
    # always has n_items >= 1 if observed, but new_types may be absent
    curve = vol.join(newt, [*key_cols, "bucket"], "left").fillna(
        0, subset=["new_types"]
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return curve.select(
        *key_cols,
        "bucket",
        "n_items",
        "new_types",
        F.sum("n_items").over(w).cast("bigint").alias("cum_items"),
        F.sum("new_types").over(w).cast("bigint").alias("cum_types"),
    ).withColumn(
        "ttr_e6",
        F.expr("(1000000 * cum_types) div cum_items").cast("bigint"),
    )
