"""Distributed BPE tokenizer-vocabulary learning (Sennrich, Haddow &
Birch 2016, arXiv:1508.07909; byte-pair coding after Gage 1994) — the
canonical LLM tokenizer-training operator the corpus-assembly surface
was missing (``functions/text.bpe_token_counts`` only *counts* with a
fixed regex; this learns the merge table from the corpus).

Word-level BPE: work on the DISTINCT-word frequency table, not the
corpus — the classic trick that makes tokenizer training cheap (vocab
cardinality, not token cardinality; one corpus shuffle total). Each
word's state is its symbol sequence in BOUNDARY-ANCHORED form: every
symbol wrapped in single spaces, so the state for symbols ``[a, b, c]``
is ``" a  b  c "`` (one space at each edge, two between symbols — since
symbols never contain spaces, every space in a state is a symbol
boundary). Applying merge ``(a, b)`` is then one literal, left-to-right,
non-overlapping ``replace(state, ' a  b ', ' ab ')`` — and because the
pattern's edge spaces must align with symbol boundaries, a match is
EXACTLY an adjacent symbol pair ``(a, b)``: the anchored pattern cannot
fire on a symbol that merely *ends* with ``a`` or *starts* with ``b``
(the unanchored round-4 encoding could: ``'xa  b'`` contains
``'a  b'``). String replace is therefore provably identical to greedy
tokenwise BPE application, which is what lets the driver-side learner
below be a bit-exact twin of the distributed loop. Everything stays
whole-stage-codegen Catalyst.

Learning is ADAPTIVE, the same pattern as ``eof.gramian``'s
driver-size guard: the word-frequency table's cardinality is bounded by
the vocabulary (~10^6-10^7 rows regardless of corpus bytes), so when it
fits under ``driver_vocab_limit`` the merges are learned driver-side
over the collected table with the classic incremental pair-index
algorithm (Sennrich's ``learn_bpe`` shape) — O(total symbols) setup,
O(affected words) per merge, and O(1) Spark jobs TOTAL, so a real
tokenizer's 32k merges cost zero cluster round-trips after the one
corpus aggregation. Past the guard it falls back to the distributed
loop: per round one map-side-combinable pair-count aggregation + a
1-row ``collect()`` of the argmax, ``localCheckpoint``-ed states (same
pattern as ``dedup.connected_components``) so round k never replays
rounds 1..k-1.

Scale shape at 100 TB: the corpus is read once to build the word-freq
table (one shuffle on word); everything after that is off-corpus.
Driver state is the vocab table (driver path) or one
(left, right, count) row per round (distributed path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BPE_SEP = "  "  # double space between symbols; single space at state edges

#: vocab-row guard for the driver-side learner (eof.GRAMIAN_Z_DRIVER_LIMIT
#: pattern): 2M (word, cnt) rows is ~100 MB of Python state — comfortably
#: driver-sized, and above real-world tokenizer-training vocabularies.
BPE_DRIVER_VOCAB_LIMIT = 2_000_000

_MERGE_SCHEMA = (
    "rank int, left string, right string, merged string, pair_count bigint"
)


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
    # 'abc' -> ' a  b  c ': every char space-wrapped (edge spaces single,
    # interior boundaries double).
    return wf.select(
        F.expr(r"regexp_replace(word, '(.)', ' $1 ')").alias("state"),
        "cnt",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    arr = F.split(F.trim(F.col("state")), BPE_SEP)
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


def _apply_merge(sym: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    the tokenwise meaning of the anchored ``replace(' a  b ', ' ab ')``."""
    out: list[str] = []
    i, n, ab = 0, len(sym), a + b
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _learn_merges_driver(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-memory BPE merge learning over the collected word-frequency
    table: incremental pair-count maintenance with a pair -> word-set
    index, so each merge touches only the words that contain its pair.
    Pure Python dict arithmetic — no Spark jobs. Bit-exact twin of the
    distributed loop: same pair counting (every adjacent index pair),
    same (count DESC, left ASC, right ASC) tie-break (Python str
    comparison is code-point order, same as Spark/DuckDB byte order on
    UTF-8), same greedy application (see _apply_merge)."""
    from collections import defaultdict

    words = [list(w) for w, _ in word_counts]
    cnts = [c for _, c in word_counts]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (sym, c) in enumerate(zip(words, cnts)):
        for j in range(len(sym) - 1):
            p = (sym[j], sym[j + 1])
            stats[p] += c
            index[p].add(i)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not stats:
            break  # no adjacent pairs left anywhere (tiny corpus)
        (a, b), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, int(cnt)))
        # full recount of each affected word: subtract its old adjacent
        # pairs, apply the merge, add its new ones — exact by
        # construction, and affected words are short, so this is O(sum of
        # affected word lengths) per merge.
        for i in sorted(index[(a, b)]):
            old, c = words[i], cnts[i]
            for j in range(len(old) - 1):
                p = (old[j], old[j + 1])
                stats[p] -= c
                if stats[p] == 0:
                    del stats[p]
                index[p].discard(i)
            new = _apply_merge(old, a, b)
            words[i] = new
            for j in range(len(new) - 1):
                p = (new[j], new[j + 1])
                stats[p] += c
                index[p].add(i)
    return merges


def bpe_learn(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    driver_vocab_limit: int = BPE_DRIVER_VOCAB_LIMIT,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text corpus. Returns the merge
    table — ``(rank int, left, right, merged, pair_count bigint)``, one
    row per learned merge in learning order — the artifact a tokenizer
    ships. Stops early (fewer rows) if the vocabulary runs out of pairs.

    Adaptive execution: when the word-frequency table has at most
    ``driver_vocab_limit`` rows, merges are learned driver-side in one
    pass over the collected table (O(1) Spark jobs however many merges —
    the shape that survives a 32k-merge tokenizer run); otherwise the
    distributed per-round loop runs. ``driver_vocab_limit=0`` forces the
    distributed path (the tests use it to pin both paths bit-exact).

    Tie-break: highest pair_count, then lexicographically smallest
    (left, right) — fully deterministic, replayed verbatim by the SQL
    oracle as an unrolled CTE chain (one round per CTE, the same shape as
    the IVF-oracle's Lloyd unroll).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    wf = word_frequencies(df, text_col)
    if driver_vocab_limit:
        # ONE job decides path and fetches the table: collect at most
        # limit+1 rows — if we got <= limit, that IS the complete vocab
        # (a separate count() would recompute the corpus scan + shuffle,
        # doubling the dominant cost of exactly this path). Row order is
        # irrelevant to the learner (pair stats are order-independent;
        # the argmax tie-break is on (count, left, right), not position).
        # materialize wf ONCE before the probe: without this, the probe
        # runs the full corpus scan+shuffle behind word_frequencies and
        # the large-vocab fallback's _initial_state(wf) re-runs the same
        # scan — an extra corpus pass on exactly the path the limit is
        # meant to protect (r5 advice)
        wf = wf.localCheckpoint()
        probe = wf.limit(driver_vocab_limit + 1).collect()
        if len(probe) <= driver_vocab_limit:
            word_counts = [(r["word"], int(r["cnt"])) for r in probe]
            return spark.createDataFrame(
                _learn_merges_driver(word_counts, n_merges), _MERGE_SCHEMA
            )
    state = _initial_state(wf).localCheckpoint()
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
                F.col("state"),
                F.lit(" " + a + BPE_SEP + b + " "),
                F.lit(" " + a + b + " "),
            ).alias("state"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    key_col: str = "source",
) -> DataFrame:
    """Apply a learned merge list (in rank order) and count the resulting
    tokens per ``key_col``: ``(key, n_tokens, n_distinct_tokens)``. The
    whole application is a static fold of literal ``replace`` calls —
    pure codegen projection, no UDF, no shuffle before the final agg.

    Boundary anchoring carries over: each non-space char is
    space-wrapped, so in-word symbol gaps are double spaces while word
    gaps (the original single space plus the wraps) are triple — an
    anchored ``' a  b '`` pattern can match neither across words nor on
    a mere suffix/prefix of a wider symbol."""
    state = F.regexp_replace(F.col(text_col), r"(\S)", r" $1 ")
    for a, b in merges:
        state = F.replace(
            state,
            F.lit(" " + a + BPE_SEP + b + " "),
            F.lit(" " + a + b + " "),
        )
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
