"""BM25 + reciprocal rank fusion (operators/retrieval.py)."""

import pytest

from rtsa_spark.operators.retrieval import bm25_topk, rrf_fuse


def _bm25_replay(corpus, terms, k):
    """Pure-Python twin of the exact-int BM25 pipeline."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in corpus}
    dl = {d: len(ws) for d, ws in toks.items() if ws}
    n = len(dl)
    avg = sum(dl.values()) // n
    scores, hits = {}, {}
    for term in dict.fromkeys(terms):
        tf = {d: ws.count(term) for d, ws in toks.items() if term in ws}
        df = len(tf)
        if df == 0:
            continue
        s = max(0, (2 * n + 2).bit_length() - 15)
        ns, ds = (2 * n + 2) >> s, max(1, (2 * df + 1) >> s)
        idf_q = ((ns ** 4) // (ds ** 4)).bit_length() - 1
        for d, f in tf.items():
            scores[d] = scores.get(d, 0) + (
                1_000_000 * idf_q * 22 * avg * f
            ) // (4 * (10 * avg * f + 3 * avg + 9 * dl[d]))
            hits[d] = hits.get(d, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (d, hits[d], s, i + 1) for i, (d, s) in enumerate(ranked)
    ]


def test_bm25_hand_replay(spark):
    corpus = [
        (0, "rare common common common"),
        (1, "common common common common common common"),
        (2, "rare rare common"),
        (3, "other words only here"),
        (4, "rare common other"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_hit"], r["score_e6"], r["rank"])
        for r in bm25_topk(df, ["rare", "common"], k=4)
        .orderBy("rank")
        .collect()
    ]
    exp = _bm25_replay(corpus, ["rare", "common"], 4)
    assert got == exp
    # the rare-term-heavy short doc must outrank the long common-only doc
    order = [d for d, *_ in got]
    assert order.index(2) < order.index(1)


def test_bm25_tf_saturation_and_length_norm(spark):
    """More tf helps but saturates; longer docs are penalized at equal
    tf — the two defining BM25 behaviors."""
    corpus = [
        (0, "t x x x"),
        (1, "t t x x"),
        (2, "t t t x"),
        (3, "t t x x x x x x"),  # same tf as 1, twice the length
        # docs without the term keep df < N, so idf stays positive
        # (df == N floors the quarter-bit idf to 0 — true BM25 behavior)
        (4, "x x x x"),
        (5, "x x x x"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    s = {
        r["doc_id"]: r["score_e6"]
        for r in bm25_topk(df, ["t"], k=4).collect()
    }
    assert s[0] < s[1] < s[2]
    assert (s[1] - s[0]) > (s[2] - s[1])  # saturation: diminishing gain
    assert s[3] < s[1]  # length normalization


def test_bm25_validation_and_unmatched_terms(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, ["a"], k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, [], k=3)
    # a term absent from the corpus contributes nothing but doesn't fail
    got = bm25_topk(df, ["a", "zzz"], k=3).collect()
    assert len(got) == 1 and got[0]["n_hit"] == 1


def test_rrf_fuse_hand_case(spark):
    la = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    lb = spark.createDataFrame(
        [(12, 1), (10, 2), (13, 3)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["lists_hit"], r["rrf_e9"], r["rank"])
        for r in rrf_fuse([la, lb], k=60).collect()
    }

    def rr(rank):
        return 1_000_000_000 // (60 + rank)

    exp_scores = {
        10: rr(1) + rr(2),
        11: rr(2),
        12: rr(3) + rr(1),
        13: rr(3),
    }
    order = sorted(exp_scores, key=lambda d: (-exp_scores[d], d))
    for d, sc in exp_scores.items():
        hit = 2 if d in (10, 12) else 1
        assert got[d] == (hit, sc, order.index(d) + 1), d
    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([la], k=-1)
