"""Lexical ranked retrieval + rank fusion for the corpus-search surface.

The similarity operators (operators/similarity.py) give the DENSE side of
corpus search: cosine top-k, LSH, IVF, SemDeDup. This module adds the
LEXICAL side (BM25) and the standard way to combine the two lists
(reciprocal rank fusion) — together the textbook hybrid-search stack a
training-data pipeline uses to pull targeted slices out of a web corpus
("find the docs about X, lexically or semantically, and merge").

Exact-int contract (CLAUDE.md): every score is a BIGINT both engines
reproduce bit-for-bit.

- BM25 (Robertson/Sparck Jones; the Lucene ``k1=1.2, b=0.75`` flavor)
  needs ``idf = log2(1 + (N - df + 0.5) / (df + 0.5))
  = log2((2N + 2) / (2df + 1))``.  A whole-bit integer log
  (``bitlength(num div den) - 1``, the contrastive_selection identity)
  is too coarse here — every mid-frequency term floors to 0 bits and
  drops out of the score.  We keep quarter-bit resolution EXACTLY:
  ``floor(4 * log2(r)) = bitlength(num^4 div den^4) - 1`` — integer
  fourth powers, one integer division, one bitlength.  To keep the
  fourth powers inside BIGINT at any corpus size, both operands are
  first right-shifted by ``s = max(0, bitlength(2N + 2) - 15)`` (a
  shared shift cancels in the ratio up to the documented ~2^-14
  relative error; both engines apply the identical shift, so scores
  still agree exactly).
- The tf-saturation factor with ``k1 = 6/5``, ``b = 3/4`` and integer
  ``avgdl = L div N`` clears denominators:
  ``tf_sat = (22 * avg * tf) / (10 * avg * tf + 3 * avg + 9 * dl)``
  (multiply num/den of the textbook form by ``10 * avg``).  The final
  per-(term, doc) score is ONE floor division:
  ``score_e6 = (10^6 * idf_q * 22 * avg * tf)
  div (4 * (10 * avg * tf + 3 * avg + 9 * dl))`` — ``div 4`` returns
  quarter-bits to whole-bit units.  BIGINT headroom:
  ``10^6 * idf_q * 22 * avg * tf < 2^63`` — fine through ``avg ~ 10^4``
  and ``tf ~ 10^4`` simultaneously; shard longer docs first.
- RRF (Cormack, Clarke & Buettcher 2009): ``sum over lists of
  1 / (k + rank)`` becomes ``sum of 10^9 div (k + rank)`` — exact,
  engine-portable, and preserving the real RRF order for any plausible
  list depth (the e9 floor only merges ranks past ~30k).

Scale shape: BM25 never materializes a terms × docs matrix — the query
terms (a handful) broadcast-join against the token explode, df/N/L are
three tiny aggregates crossJoin-broadcast back, and the top-k is one
window over the matched docs only.  RRF is a unionByName + one groupBy.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k documents for a bag of query terms (module docstring
    for the exact-int score derivation). Only documents matching at
    least one term score; ranks break ties to the smaller id.

    Output: ``(id, n_hit, score_e6, rank)`` — ``n_hit`` = how many
    distinct query terms the doc contains.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = [t for t in dict.fromkeys(query_terms) if t]
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    dl = toks.groupBy("_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("len_total"),
    ).select(
        "n_docs",
        F.expr("len_total div n_docs").alias("avg_dl"),
    )
    qterms = toks.sparkSession.createDataFrame(
        [(t,) for t in terms], "token string"
    )
    tf = (
        toks.join(F.broadcast(qterms), "token")
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    # quarter-bit idf: shared shift keeps fourth powers inside BIGINT
    idf = (
        dfreq.crossJoin(F.broadcast(corpus))
        .select(
            "token",
            F.expr(
                "greatest(0, length(bin(2 * n_docs + 2)) - 15)"
            ).alias("_s"),
            (2 * F.col("n_docs") + 2).alias("_num"),
            (2 * F.col("df") + 1).alias("_den"),
        )
        .select(
            "token",
            F.expr("shiftright(_num, cast(_s as int))").alias("_ns"),
            F.expr("greatest(1, shiftright(_den, cast(_s as int)))").alias(
                "_ds"
            ),
        )
        .select(
            "token",
            (
                F.length(
                    F.bin(
                        F.expr("(_ns * _ns * _ns * _ns) div (_ds * _ds * _ds * _ds)")
                    )
                )
                - 1
            ).cast("bigint").alias("idf_q"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "_id",
            F.expr(
                "(1000000 * idf_q * 22 * avg_dl * tf)"
                " div (4 * (10 * avg_dl * tf + 3 * avg_dl + 9 * dl))"
            ).alias("_term_score"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit"),
            F.sum("_term_score").cast("bigint").alias("score_e6"),
        )
    )
    # distributed top-k (TakeOrderedAndProject — per-partition heads,
    # one driver merge of k rows), then rank the k survivors
    top = scored.orderBy(F.desc("score_e6"), F.asc("_id")).limit(k)
    w = Window.orderBy(F.desc("score_e6"), F.asc("_id"))
    return top.select(
        F.col("_id").alias(id_col),
        "n_hit",
        "score_e6",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked lists: ``rrf = sum over lists of 1 / (k + rank)``,
    kept exact as ``sum of 10^9 div (k + rank)``. The standard way to
    merge a lexical (:func:`bm25_topk`) and a dense
    (``similarity.cosine_topk``) list into one hybrid ranking — robust
    to incomparable score scales because only ranks enter.

    Output: ``(id, lists_hit, rrf_e9, rank)`` ordered by fused score
    (ties to the smaller id).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if not rankings:
        raise ValueError("rankings must contain at least one list")
    parts = [
        r.select(
            F.col(id_col).alias("_id"),
            F.col(rank_col).cast("bigint").alias("_r"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("lists_hit"),
        F.sum(F.expr(f"1000000000 div ({k} + _r)")).cast("bigint").alias(
            "rrf_e9"
        ),
    )
    w = Window.orderBy(F.desc("rrf_e9"), F.asc("_id"))
    return fused.select(
        F.col("_id").alias(id_col),
        "lists_hit",
        "rrf_e9",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )
