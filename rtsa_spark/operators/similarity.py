"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries are few); the corpus is scanned once;
  the dot product is a JVM-side higher-order-function fold (zip_with +
  aggregate), no Python in the loop.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH buckets
  shrink the candidate set before the exact re-rank. Hyperplanes are
  deterministic (seeded from xxhash64), so results are reproducible.

At 100 TB the brute-force path is O(|Q| * |corpus|): broadcast Q (must be
small) and let the scan parallelize; the LSH path makes |candidates| ~
|corpus| / 2^n_planes per query and re-ranks exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus (self excluded).
    Output: (query_id, neighbor_id, rank, cos_e6)."""
    from rtsa_spark.plans.spread import fan_out_scan

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    # the corpus side pays |queries| dot products per row — fan a small
    # single-row-group embeddings file out across the cluster first
    c = fan_out_scan(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1e6).cast("bigint").alias("cos_e6"),
        )
    )


def lsh_planes(n_planes: int, dim: int, seed: int = 42, n_tables: int = 1):
    """Deterministic +/-1 hyperplanes, one contiguous rng stream shared by
    every consumer (the Spark bucketer below AND the ANSI-SQL oracle in
    ``__spark_entry__``), shaped (n_tables * n_planes, dim)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.choice([-1.0, 1.0], size=(n_tables * n_planes, dim))


def hyperplane_bucket(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket ids per vector.

    Planes are seeded +/-1 literal vectors (no broadcast variable, no
    Python in the row path). With ``n_tables > 1`` the output has one row
    per (vector, table) — multiprobe tables trade candidate volume for
    recall; exploded JVM-side."""
    planes = lsh_planes(n_planes, dim, seed, n_tables)

    def bucket_for(t: int):
        bucket = None
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(x)) for x in planes[t * n_planes + p]])
            term = (_dot(F.col(vec_col), arr) > 0).cast("int") * (1 << p)
            bucket = term if bucket is None else bucket + term
        return bucket

    if n_tables == 1:
        return df.withColumn("lsh_table", F.lit(0)).withColumn(
            "lsh_bucket", bucket_for(0)
        )
    tb = F.array(
        *[
            F.struct(F.lit(t).alias("lsh_table"), bucket_for(t).alias("lsh_bucket"))
            for t in range(n_tables)
        ]
    )
    return df.withColumn("_tb", F.explode(tb)).select(
        *df.columns,
        F.col("_tb.lsh_table").alias("lsh_table"),
        F.col("_tb.lsh_bucket").alias("lsh_bucket"),
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates = pairs sharing any (table, bucket) across
    ``n_tables`` hyperplane tables, deduped, then exact cosine re-rank.
    Recall < 1 by construction and rises with n_tables (measured against
    cosine_topk in tests); rank/cos schema matches cosine_topk so the two
    are directly comparable.

    Scale shape: per-table bucket equi-join (never all-pairs), distinct on
    (query, neighbor) BEFORE the exact scoring, queries broadcast."""
    qb = hyperplane_bucket(
        queries, n_planes, dim, seed, vec_col, n_tables
    ).select(F.col(id_col).alias("query_id"), "lsh_table", "lsh_bucket")
    cb = hyperplane_bucket(
        corpus, n_planes, dim, seed, vec_col, n_tables
    ).select(F.col(id_col).alias("neighbor_id"), "lsh_table", "lsh_bucket")
    cand = (
        cb.join(F.broadcast(qb), ["lsh_table", "lsh_bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qe = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    ce = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1e6).cast("bigint").alias("cos_e6"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    min_cos_e6: int = 900_000,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: pairs with cosine above
    ``min_cos_e6/1e6``. The scale path (default) generates candidates from
    the multiprobe hyperplane-LSH tables and verifies exactly — same
    bucket-join shape as the MinHash text dedup, never all-pairs; genuine
    near-dups (cos -> 1) collide in some table with high probability.
    ``exact=True`` scores all pairs (the oracle/verification shape — O(n^2),
    small corpora only). Output: (id_a, id_b, cos_e6), id_a < id_b."""
    if exact:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        bucketed = hyperplane_bucket(df, n_planes, dim, seed, vec_col, n_tables)
        ab = bucketed.select(F.col(id_col).alias("id_a"), "lsh_table", "lsh_bucket")
        bb = bucketed.select(F.col(id_col).alias("id_b"), "lsh_table", "lsh_bucket")
        pairs = (
            ab.join(bb, ["lsh_table", "lsh_bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cand = pairs.join(va, "id_a").join(vb, "id_b")
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.select(
            "id_a", "id_b", F.floor(cos * 1e6).cast("bigint").alias("cos_e6")
        )
        .where(F.col("cos_e6") >= min_cos_e6)
    )


def norms_by_label(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Mean L2 norm per label (array-aggregation health check)."""
    return df.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.avg(_norm(F.col(vec_col))) * 1e6).cast("bigint").alias("avg_norm_e6"),
    )


# --------------------------------------------------------------- IVF ANN
#
# The second scale path the training-pipeline brief names (IVF): a coarse
# k-means quantizer partitions the corpus into inverted lists; a query
# probes only the nprobe nearest lists and re-ranks exactly. The quantizer
# runs in EXACT INTEGER arithmetic so the index is deterministic and
# cross-engine replayable (the DuckDB oracle rebuilds the identical
# index): vectors quantize as floor(e * 2^s) (power-of-two scale -> the
# multiply is exact in float64), and a centroid is kept as its exact
# (sum-vector, count) pair — comparing n^2*dist^2 = sum_d (n*q_d - s_d)^2
# needs no division, so assignments are order-independent integers.
# Driver state is only the k x dim centroid table; assignment and
# partial-sum passes are distributed (mapInPandas, numpy int64 bodies).

IVF_QUANT_SCALE = 256  # power of two: e*256 is exact in float64


def _ivf_quant(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda e: F.floor(e.cast("double") * IVF_QUANT_SCALE).cast("long"),
        ).alias("qv"),
    )


def _ivf_assign_kernel(cent_s, cent_n, cent_ids):
    """Closure: per-batch argmin over exact-int centroid distances with
    deterministic (distance, cid) tie-break."""
    import numpy as np

    S = np.asarray(cent_s, dtype=np.int64)          # (k, dim)
    N = np.asarray(cent_n, dtype=np.int64)          # (k,)
    IDS = np.asarray(cent_ids, dtype=np.int64)      # (k,) ascending

    def assign(Q):
        # dist[b, c] = sum_d (N[c] * Q[b, d] - S[c, d])^2 ; k is small, so
        # loop over centroids with vectorized rows
        nb = Q.shape[0]
        best_d = None
        best_c = np.zeros(nb, dtype=np.int64)
        for ci in range(len(IDS)):
            diff = N[ci] * Q - S[ci][None, :]
            d = np.einsum("bd,bd->b", diff, diff)
            if best_d is None:
                best_d = d
                best_c[:] = IDS[ci]
            else:
                better = d < best_d  # strict: ties keep the smaller cid
                best_d = np.where(better, d, best_d)
                best_c = np.where(better, IDS[ci], best_c)
        return best_c

    return assign


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_tag: str = ":ivf",
):
    """Build the IVF index: ``(assignments DataFrame(vid, cid), centroids)``
    where centroids is the driver-side list of ``(cid, sum_vec, count)``.
    Seeds = the ``n_centroids`` vectors with smallest ``md5(vid||tag)``
    (both engines agree); ``n_iter`` fixed Lloyd iterations in exact-int
    (sum, count) form; empty clusters drop out."""
    import numpy as np
    import pandas as pd

    from rtsa_spark.plans.spread import fan_out_scan

    # every Lloyd pass maps the whole corpus through the assign kernel;
    # a single-row-group embeddings file would serialize all of them
    q = _ivf_quant(fan_out_scan(corpus), id_col, vec_col)
    seeds = (
        q.withColumn(
            "h", F.md5(F.concat(F.col("vid").cast("string"), F.lit(seed_tag)))
        )
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cent = [
        (i + 1, np.asarray(r["qv"], dtype=np.int64), 1)
        for i, r in enumerate(seeds)
    ]

    def assigned(cent_list):
        ids = [c[0] for c in cent_list]
        S = [c[1] for c in cent_list]
        N = [c[2] for c in cent_list]
        kern = _ivf_assign_kernel(S, N, ids)

        def it(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Q = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                yield pd.DataFrame(
                    {"vid": pdf["vid"], "qv": pdf["qv"], "cid": kern(Q)}
                )

        return q.mapInPandas(it, "vid long, qv array<long>, cid long")

    dim = len(cent[0][1])
    for _ in range(n_iter):
        asg = assigned(cent)

        def partials(batches):
            sums: dict = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Q = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                cids = pdf["cid"].to_numpy()
                for cid in np.unique(cids):
                    m = cids == cid
                    prev = sums.get(int(cid))
                    s = Q[m].sum(axis=0)
                    n = int(m.sum())
                    if prev is None:
                        sums[int(cid)] = [s, n]
                    else:
                        prev[0] += s
                        prev[1] += n
            if not sums:
                # empty partition: yield NOTHING — a zero-row frame's "s"
                # column defaults to float64 and Arrow rejects it against
                # array<long>
                return
            yield pd.DataFrame(
                {
                    "cid": list(sums),
                    "s": [v[0] for v in sums.values()],
                    "n": [v[1] for v in sums.values()],
                }
            )

        acc: dict = {}
        for r in asg.mapInPandas(
            partials, "cid long, s array<long>, n long"
        ).collect():
            prev = acc.get(r["cid"])
            if prev is None:
                acc[r["cid"]] = [np.asarray(r["s"], dtype=np.int64), int(r["n"])]
            else:
                prev[0] = prev[0] + np.asarray(r["s"], dtype=np.int64)
                prev[1] += int(r["n"])
        cent = [(cid, v[0], v[1]) for cid, v in sorted(acc.items())]
        if not cent:  # degenerate: empty corpus
            return q.sparkSession.createDataFrame(
                [], "vid long, cid long"
            ), []
    final = assigned(cent).select("vid", "cid")
    return final, cent


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_iter: int = 2,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` nearest inverted lists per query,
    exact cosine re-rank within them. Same output schema as
    :func:`cosine_topk`; recall rises with nprobe (gated in tests).

    Scale shape: the k-means index costs ``n_iter`` passes over the
    corpus (exact-int partial sums; k x dim driver state); each query
    touches ~``nprobe/n_centroids`` of the corpus via a cid equi-join —
    never a full scan per query."""
    import numpy as np
    import pandas as pd

    asg, cent = ivf_index(corpus, n_centroids, n_iter, id_col, vec_col)
    if not cent:
        return cosine_topk(queries, corpus, k, id_col, vec_col).limit(0)
    kern = _ivf_assign_kernel(
        [c[1] for c in cent], [c[2] for c in cent], [c[0] for c in cent]
    )
    S = np.stack([c[1] for c in cent]).astype(np.int64)
    N = np.asarray([c[2] for c in cent], dtype=np.int64)
    IDS = np.asarray([c[0] for c in cent], dtype=np.int64)
    np_probe = min(nprobe, len(cent))

    qq = _ivf_quant(queries, id_col, vec_col)

    def probe_it(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            nb = Q.shape[0]
            dists = np.empty((nb, len(IDS)), dtype=np.int64)
            for ci in range(len(IDS)):
                diff = N[ci] * Q - S[ci][None, :]
                dists[:, ci] = np.einsum("bd,bd->b", diff, diff)
            # argsort by (dist, cid): IDS ascending makes stable sort by
            # dist the deterministic tie-break
            order = np.argsort(dists, axis=1, kind="stable")[:, :np_probe]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["vid"].to_numpy(), np_probe),
                    "cid": IDS[order].ravel(),
                }
            )

    probes = qq.mapInPandas(probe_it, "query_id long, cid long")
    cand = (
        asg.join(F.broadcast(probes), "cid")
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("neighbor_id"))
    )
    qe = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    ce = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.floor(F.col("cos") * 1e6).cast("bigint").alias("cos_e6"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    min_cos_e6: int = 900_000,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings with the exact-int IVF k-means
    quantizer, scoring exact cosine on within-cluster pairs only, and
    dropping every vector that has a smaller-id near neighbor
    (``cos_e6 >= min_cos_e6``) in its cluster. The keep rule is the
    deterministic greedy variant of the paper's one-per-group rule:
    smallest id in a near-dup group always survives; a chain a~b~c keeps
    only a (b and c each see an earlier near neighbor).

    Output: one row per input vector —
    ``(vec_id, cluster_id, keep boolean, dup_of)`` where ``dup_of`` is the
    smallest-id near neighbor (NULL for kept rows).

    Scale shape: the index costs ``n_iter`` corpus passes (exact-int
    partial sums, k x dim driver state — same ceiling as MLlib k-means);
    pair scoring is one cid equi-join, so work is sum over clusters of
    (cluster size)^2 — the SemDeDup design point: grow ``n_centroids``
    with the corpus so cluster size stays bounded, never all-pairs.
    """
    asg, cent = ivf_index(df, n_centroids, n_iter, id_col, vec_col)
    a = asg.select(F.col("vid").alias("id_a"), "cid")
    b = asg.select(F.col("vid").alias("id_b"), "cid")
    pairs = a.join(b, "cid").where(F.col("id_a") < F.col("id_b"))
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    dup = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.floor(cos * 1e6).cast("bigint").alias("cos_e6"),
        )
        .where(F.col("cos_e6") >= int(min_cos_e6))
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        asg.join(dup, asg["vid"] == dup["id_b"], "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cid").alias("cluster_id"),
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )
