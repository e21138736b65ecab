"""Distributed BPE tokenizer-vocabulary learning (Sennrich, Haddow &
Birch 2016, arXiv:1508.07909; byte-pair coding after Gage 1994) — the
canonical LLM tokenizer-training operator the corpus-assembly surface
was missing (``functions/text.bpe_token_counts`` only *counts* with a
fixed regex; this learns the merge table from the corpus).

Word-level BPE: work on the DISTINCT-word frequency table, not the
corpus — the classic trick that makes tokenizer training cheap (vocab
cardinality, not token cardinality; one corpus shuffle total). Each
word's state is its symbol sequence joined with a DOUBLE-space
separator, so applying a merge is one literal, left-to-right,
non-overlapping ``replace(state, 'a  b', 'ab')`` — exactly the greedy
BPE application order — and stays whole-stage-codegen Catalyst (symbols
never contain spaces, and the double separator means adjacent matches
share no characters, unlike single-space padding which drops every
second merge in a run).

Per merge round: one map-side-combinable pair-count aggregation over the
word table + a 1-row ``collect()`` of the argmax (count DESC, then
lexicographic (left, right) — deterministic across engines for ASCII
corpora; both Spark and DuckDB compare strings bytewise). The state
table is ``localCheckpoint``-ed each round (same pattern as
``dedup.connected_components``) so round k never replays rounds 1..k-1.

Scale shape at 100 TB: the corpus is read once to build the word-freq
table (one shuffle on word); every round after that touches only the
vocab table (~10^7 rows independent of corpus size), so n_merges * vocab
is the whole training cost. Driver state is one (left, right, count)
row per round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BPE_SEP = "  "  # double space: adjacent pair matches never share chars


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct-word frequency table ``(word, cnt)`` — space-split, empty
    tokens dropped (the repo-wide tokenization convention of word_topk)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _initial_state(wf: DataFrame) -> DataFrame:
    # 'abc' -> 'a  b  c': every char followed by the double separator,
    # then the trailing one trimmed.
    return wf.select(
        F.expr(r"rtrim(regexp_replace(word, '(.)', '$1  '))").alias("state"),
        "cnt",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    arr = F.split(F.col("state"), BPE_SEP)
    pairs = F.filter(
        F.transform(
            arr,
            lambda x, i: F.struct(
                x.alias("left"), F.get(arr, i + 1).alias("right")
            ),
        ),
        lambda s: s["right"].isNotNull(),
    )
    return (
        state.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text corpus. Returns the merge
    table — ``(rank int, left, right, merged, pair_count bigint)``, one
    row per learned merge in learning order — the artifact a tokenizer
    ships. Stops early (fewer rows) if the vocabulary runs out of pairs.

    Tie-break: highest pair_count, then lexicographically smallest
    (left, right) — fully deterministic, replayed verbatim by the SQL
    oracle as an unrolled CTE chain (one round per CTE, the same shape as
    the IVF-oracle's Lloyd unroll).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    state = _initial_state(word_frequencies(df, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # no adjacent pairs left anywhere (tiny corpus)
        a, b, cnt = best[0]["left"], best[0]["right"], int(best[0]["pair_count"])
        merges.append((rank, a, b, a + b, cnt))
        state = state.select(
            F.replace(
                F.col("state"), F.lit(a + BPE_SEP + b), F.lit(a + b)
            ).alias("state"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "source",
) -> DataFrame:
    """Apply a learned merge list (in rank order) and count the resulting
    tokens per ``key_col``: ``(key, n_tokens, n_distinct_tokens)``. The
    whole application is a static fold of literal ``replace`` calls —
    pure codegen projection, no UDF, no shuffle before the final agg."""
    state = F.rtrim(
        F.regexp_replace(F.col(text_col), r"(\S)", r"$1" + BPE_SEP)
    )
    # regexp above splits every non-space char; real word boundaries stay
    # single-space and therefore never match a double-space merge pattern.
    for a, b in merges:
        state = F.replace(state, F.lit(a + BPE_SEP + b), F.lit(a + b))
    toks = F.filter(
        F.split(state, " "), lambda t: t != ""
    )
    return (
        df.select(F.col(key_col).alias("key"), toks.alias("toks"))
        .select("key", F.explode("toks").alias("tok"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("tok").cast("bigint").alias("n_distinct_tokens"),
        )
    )
