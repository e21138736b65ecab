"""EOF / PCA decomposition of the bucket x source matrix (reference M2).

rtsa.eof (``/root/reference/R/rtsa.eof.R:246``, delegating to sinkr::eof's
truncated SVD) decomposes the time x cell matrix into spatial modes (per
cell) + expansion-coefficient series (per time) + eigenvalues. Engine
re-expression over the rollup tiers:

- "cells" -> sources, "time" -> buckets: input is a tier rollup (long
  format);
- centering/scaling per source mirrors sinkr's F1_center/F1_scale vectors
  (``R/rtsa.eof.R:295-306``);
- the decomposition is the tall-skinny normal-equations SVD: the
  **source x source Gramian** ``G = Z^T Z`` is accumulated DISTRIBUTEDLY
  (per-bucket dense vectors -> per-partition ``Z.T @ Z`` partials ->
  row-wise zip-sum merge), so no driver-side pivot of the tier ever
  happens and bucket count is unbounded. Only the (n_sources x n_sources)
  Gramian reaches the driver — the same shape MLlib's RowMatrix
  computeSVD collects for n <= 65535 columns. ``eigh`` of G yields the
  spatial modes; expansion coefficients stream back out distributedly as
  ``Z @ V`` per bucket.
- past ``EOF_DENSE_SOURCE_LIMIT`` sources (r5), the Gramian is never
  formed at all: ``eof(solver="iterative")`` runs block subspace
  iteration over distributed ``G @ Q`` matvec passes
  (:func:`gramian_matvec`), raising the source-cardinality ceiling from
  driver-RAM n_s^2 to O(modes x n_s) — the 10^5-10^6-source path.

Outputs mirror the EOFstack contract (``R/rtsa_classes.R:29-38``):
``modes`` (one row per source per mode: the spatial pattern), ``ecs``
(one row per bucket per mode: expansion coefficients), and a scalars dict
(eigenvalues, explained/total variance — ``R/rtsa.eof.R:254-256``).

Complete profiles are required, as in the reference's "compute" mask (P2):
gap-fill first, or pass a masked tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: partitions the bucket-vector frame is coalesced to before the Gramian
#: pass — bounds shuffle volume at partials x n_s^2 doubles.
GRAMIAN_PARTIALS = 8


def source_index(tier_df: DataFrame, key_col: str = "source") -> list:
    """Sorted distinct keys — the column order of the dense vectors. The
    key set is the SMALL dimension (thousands); collecting it is the one
    intentional driver-side list."""
    return [
        r[0] for r in tier_df.select(key_col).distinct().orderBy(key_col).collect()
    ]


def bucket_vectors(
    tier_df: DataFrame,
    sources: list,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """One row per bucket: packed ``(bucket, idxs array<int>, vals
    array<double>, n_miss int)`` with positions from the ``sources`` index.
    Pure Catalyst: keys are first swapped for dense integer indices
    (broadcast join against the tiny source list — NOT an n_s-literal
    expression, which chokes codegen at thousands of sources), then each
    bucket packs its sorted (idx, value) pairs. The shuffle key is the
    bucket, so dominant sources do not skew this exchange. Missing cells
    simply have no entry; :func:`stack_vectors` scatters NaN there."""
    spark = tier_df.sparkSession
    n_s = len(sources)
    if n_s == 0:
        raise ValueError(
            "empty source index: the tier has no rows (gap-fill/mask away "
            "nothing before the analytics, or check the input filter)"
        )
    idx_df = spark.createDataFrame(
        pd.DataFrame({key_col: sources, "_src_idx": np.arange(n_s, dtype="int32")})
    )
    keyed = tier_df.join(F.broadcast(idx_df), key_col)
    srt = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("_src_idx"), F.col(value_col).cast("double").alias("_v")
            )
        )
    )
    m = keyed.groupBy(bucket_col).agg(srt.alias("_s"))
    idxs = F.transform(F.col("_s"), lambda s: s["_src_idx"])
    n_distinct = F.size(F.array_distinct(idxs))
    return m.select(
        F.col(bucket_col),
        idxs.alias("idxs"),
        F.transform(F.col("_s"), lambda s: s["_v"]).alias("vals"),
        # distinct-based, so a duplicate cell can never cancel against a
        # genuinely missing one
        (F.lit(n_s) - n_distinct).alias("n_miss"),
        (F.size(F.col("_s")) - n_distinct).alias("n_dup"),
    )


def stack_vectors(pdf: pd.DataFrame, n_s: int, scratch: bool = False) -> np.ndarray:
    """Dense (rows, n_s) float64 matrix from the (idxs, vals) packed
    columns — vectorized scatter, NaN where missing.

    ``scratch=True`` returns a view into a worker-global grow-only buffer
    (CLAUDE.md: fresh large allocations pay ~100x first-touch here) — valid
    only until the NEXT stack_vectors(scratch=True) call, so use it for
    per-batch kernels that consume the matrix immediately, never for
    results that outlive the batch."""
    nb = len(pdf)
    if scratch:
        key = ("sv", n_s)
        buf = _SCRATCH.get(key)
        if buf is None or buf.shape[0] < nb:
            buf = np.empty((max(nb, 256), n_s))
            _SCRATCH[key] = buf
        z = buf[:nb]
        z.fill(np.nan)
    else:
        z = np.full((nb, n_s), np.nan)
    lens = pdf["idxs"].map(len).to_numpy("int64")
    rows = np.repeat(np.arange(nb), lens)
    cols = np.concatenate(pdf["idxs"].to_numpy()) if nb else np.array([], dtype=int)
    vals = np.concatenate(pdf["vals"].to_numpy()) if nb else np.array([])
    z[rows, cols.astype(np.int64)] = vals
    return z


#: rows of the Gramian per merge chunk — keeps the partial-merge group
#: count (and Arrow array sizes) small regardless of n_s
GRAMIAN_CHUNK = 128

#: worker-global scratch for the Gramian kernels (grow-only; see CLAUDE.md
#: on first-touch cost of fresh large allocations in this sandbox)
_SCRATCH: dict = {}


def _gramian_scratch(n_s: int) -> dict:
    if _SCRATCH.get("n") != n_s:
        _SCRATCH["g"] = np.zeros((n_s, n_s))
        _SCRATCH["tmp"] = np.zeros((n_s, n_s))
        _SCRATCH["n"] = n_s
    return _SCRATCH


def require_no_duplicates(vec_df: DataFrame) -> DataFrame:
    """Weaker gate for the gappy/recursive path: duplicate (bucket, source)
    cells are always invalid (two values for one matrix entry), but missing
    cells are allowed — the pairwise covariance handles them."""
    if vec_df.where(F.col("n_dup") != 0).limit(1).count() > 0:
        raise ValueError(
            "duplicate (bucket, source) cells: two values for one matrix "
            "entry — dedupe or re-aggregate the tier first"
        )
    return vec_df


def require_complete(vec_df: DataFrame) -> DataFrame:
    """Reference P2 semantics (``R/rtsa.eof.R:129-132``): every bucket must
    cover every source exactly once. Missing and duplicate cells are
    counted separately (distinct-based), so a duplicate can never cancel a
    genuinely missing cell and let NaN corrupt the Gramian silently."""
    if vec_df.where((F.col("n_miss") != 0) | (F.col("n_dup") != 0)).limit(1).count() > 0:
        raise ValueError(
            "EOF requires complete profiles: gap-fill the tier or apply "
            "mask_complete_profile first (reference P2, R/rtsa.eof.R:129-132)"
        )
    return vec_df


#: when the whole Z matrix is at most this many doubles (~256 MB), collect
#: it and run ONE driver-side BLAS product instead of paying n_partials
#: Gramian-sized accumulators on the workers. The distributed partial path
#: is only a win once the bucket count makes Z itself uncollectable.
GRAMIAN_Z_DRIVER_LIMIT = 32 * 1024 * 1024


def gramian(
    vec_df: DataFrame,
    n_s: int,
    center: np.ndarray | None = None,
    scale: np.ndarray | None = None,
    force_distributed: bool = False,
) -> tuple[np.ndarray, int]:
    """``Z^T Z`` over the bucket vectors, with optional per-source
    centering/scaling applied inside the kernel. Returns ``(G, n_buckets)``.

    Adaptive plan: if ``n_buckets * n_s`` is small enough that Z itself is
    trivially collectable (packed Arrow transfer), one driver-side dgemm
    computes G — this dominates whenever buckets ≪ sources. Otherwise the
    distributed path runs: coalesce -> one ``Z.T @ Z`` partial per
    partition (mapInPandas, numpy BLAS) -> chunked zip-sum merge -> ~n_s^2
    doubles collected once. Shuffle volume is ``GRAMIAN_PARTIALS * n_s^2``
    doubles regardless of bucket count; nothing bucket-sized ever reaches
    the driver on that path.
    """
    c = np.zeros(n_s) if center is None else np.asarray(center, dtype="float64")
    s = np.ones(n_s) if scale is None else np.asarray(scale, dtype="float64")
    s = np.where(s == 0, 1.0, s)

    n_buckets = vec_df.count()
    if not force_distributed and n_buckets * n_s <= GRAMIAN_Z_DRIVER_LIMIT:
        pdf = vec_df.select("idxs", "vals").toPandas()
        z = (stack_vectors(pdf, n_s) - c) / s
        return z.T @ z, n_buckets

    n_chunks = (n_s + GRAMIAN_CHUNK - 1) // GRAMIAN_CHUNK

    def partials(batches):
        # grow-only worker-global scratch (CLAUDE.md: this sandbox pays
        # ~100x for first-touch of fresh large allocations; python workers
        # are reused, so the buffers amortize across calls)
        buf = _gramian_scratch(n_s)
        g, tmp = buf["g"], buf["tmp"]
        g.fill(0.0)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = (stack_vectors(pdf, n_s, scratch=True) - c) / s
            np.dot(z.T, z, out=tmp)
            g += tmp
            n += len(pdf)
        chunks = list(range(n_chunks))
        yield pd.DataFrame(
            {
                "chunk_idx": chunks + [-1],
                "part": [
                    g[i * GRAMIAN_CHUNK : (i + 1) * GRAMIAN_CHUNK].ravel()
                    for i in chunks
                ]
                + [np.array([float(n)])],
            }
        )

    parts = vec_df.select("idxs", "vals").coalesce(GRAMIAN_PARTIALS).mapInPandas(
        partials, "chunk_idx int, part array<double>"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        summed = np.stack(pdf["part"].to_numpy()).sum(axis=0)
        return pd.DataFrame(
            {"chunk_idx": [int(pdf["chunk_idx"].iloc[0])], "row": [summed]}
        )

    # toPandas: Arrow-batched transfer of the ~n_s^2 doubles (a plain
    # collect() would pickle them row-by-row — 10x slower at 5k sources)
    merged = parts.groupBy("chunk_idx").applyInPandas(
        merge, "chunk_idx int, row array<double>"
    ).toPandas()
    g = np.zeros((n_s, n_s))
    n_t = 0
    for ci, row in zip(merged["chunk_idx"], merged["row"]):
        if ci == -1:
            n_t = int(row[0])
        else:
            lo = int(ci) * GRAMIAN_CHUNK
            chunk = np.asarray(row)
            g[lo : lo + len(chunk) // n_s] = chunk.reshape(-1, n_s)
    return g, n_t


#: sources above which ``eof(solver="auto")`` switches from the dense
#: n_s^2 Gramian (driver eigh — MLlib RowMatrix.computeSVD's ceiling) to
#: the iterative matvec solver, whose driver/worker state is
#: O(n_s * block) instead of O(n_s^2). 8192^2 doubles = 512 MB is the
#: sensible edge of the dense path on an 8 GB driver.
EOF_DENSE_SOURCE_LIMIT = 8192


def gramian_matvec(
    vec_df: DataFrame,
    n_s: int,
    center: np.ndarray,
    scale: np.ndarray,
    q: np.ndarray,
) -> tuple[np.ndarray, int, float]:
    """One distributed pass computing ``Y = G @ Q = Z^T (Z @ Q)`` without
    ever forming the n_s x n_s Gramian — the operator that takes EOF past
    the driver-RAM ceiling (VERDICT r4 #3). Also returns the bucket count
    and ``trace(G) = ||Z||_F^2`` (free in the same pass; total variance
    needs it).

    Shape: Q is broadcast (n_s x k doubles, k = block size); each
    partition accumulates its ``z^T (z q)`` partial (two skinny BLAS
    products per Arrow batch — the n_s x n_s outer product never
    exists); partials merge by the same chunked zip-sum as
    :func:`gramian`. Shuffle volume per pass is
    ``GRAMIAN_PARTIALS * n_s * k`` doubles regardless of bucket count.
    """
    c = np.ascontiguousarray(center, dtype="float64")
    s = np.where(np.asarray(scale, dtype="float64") == 0, 1.0, scale)
    q = np.ascontiguousarray(q, dtype="float64")
    k = q.shape[1]
    n_chunks = (n_s + GRAMIAN_CHUNK - 1) // GRAMIAN_CHUNK
    bq = vec_df.sparkSession.sparkContext.broadcast(q)

    def partials(batches):
        qv = bq.value
        y = np.zeros((n_s, k))
        n, ss = 0, 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = (stack_vectors(pdf, n_s, scratch=True) - c) / s
            y += z.T @ (z @ qv)
            ss += float(np.einsum("ij,ij->", z, z))
            n += len(pdf)
        chunks = list(range(n_chunks))
        yield pd.DataFrame(
            {
                "chunk_idx": chunks + [-1],
                "part": [
                    y[i * GRAMIAN_CHUNK : (i + 1) * GRAMIAN_CHUNK].ravel()
                    for i in chunks
                ]
                + [np.array([float(n), ss])],
            }
        )

    parts = vec_df.select("idxs", "vals").coalesce(GRAMIAN_PARTIALS).mapInPandas(
        partials, "chunk_idx int, part array<double>"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        summed = np.stack(pdf["part"].to_numpy()).sum(axis=0)
        return pd.DataFrame(
            {"chunk_idx": [int(pdf["chunk_idx"].iloc[0])], "row": [summed]}
        )

    merged = parts.groupBy("chunk_idx").applyInPandas(
        merge, "chunk_idx int, row array<double>"
    ).toPandas()
    bq.unpersist()
    y = np.zeros((n_s, k))
    n_t, sumsq = 0, 0.0
    for ci, row in zip(merged["chunk_idx"], merged["row"]):
        if ci == -1:
            n_t, sumsq = int(row[0]), float(row[1])
        else:
            lo = int(ci) * GRAMIAN_CHUNK
            chunk = np.asarray(row)
            y[lo : lo + len(chunk) // k] = chunk.reshape(-1, k)
    return y, n_t, sumsq


def _leading_modes_iterative(
    vec_df: DataFrame,
    n_s: int,
    center: np.ndarray,
    scale: np.ndarray,
    n_modes: int,
    oversample: int = 8,
    max_iter: int = 100,
    tol: float = 1e-10,
    seed: int = 0xE0F,
) -> tuple[np.ndarray, np.ndarray, float, int]:
    """Block subspace iteration with Rayleigh-Ritz extraction over the
    implicit Gramian: deterministic seeded start, one
    :func:`gramian_matvec` pass per iteration, k = n_modes + oversample
    block. Converges linearly at rate (lambda_{k+1}/lambda_m)^2 — the
    oversampled block is what keeps that ratio small. Returns
    ``(V[:, :n_modes], lam[:n_modes], tot_var, n_t)`` on the SAME scale
    as the dense path (eigenvalues of G/(n_t - 1); tot_var =
    trace(G)/(n_t - 1)). Driver state: n_s x k — never n_s^2."""
    k = max(1, min(n_s, n_modes + oversample))
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n_s, k)))
    prev = None
    n_t = None
    sumsq = 0.0
    theta = np.zeros(k)
    v = q
    for _ in range(max_iter):
        y, n_b, ss = gramian_matvec(vec_df, n_s, center, scale, q)
        if n_t is None:
            n_t, sumsq = n_b, ss
            n_modes = max(1, min(n_modes, min(n_t, n_s)))
        b = q.T @ y
        b = (b + b.T) / 2.0
        w, sv = np.linalg.eigh(b)
        order = np.argsort(w)[::-1]
        theta, sv = w[order], sv[:, order]
        # Ritz vectors in the SAME basis sv was computed in — taken
        # before the qr update below, so the max_iter-exhaustion exit
        # cannot pair a rotated q with a stale sv (that mix is an
        # arbitrary orthonormal frame, not an eigenvector estimate).
        v = q @ sv
        top = np.maximum(theta[:n_modes], 0.0)
        if prev is not None and np.all(
            np.abs(top - prev) <= tol * np.maximum(np.abs(top), 1e-300)
        ):
            break
        prev = top
        q, _ = np.linalg.qr(y)
    denom = max((n_t or 1) - 1, 1)
    lam = np.maximum(theta[:n_modes], 0.0) / denom
    tot_var = sumsq / denom
    return v[:, :n_modes], lam, tot_var, n_t or 0


def _deflated_rows(pdf: pd.DataFrame, n_s: int, c: np.ndarray, s: np.ndarray,
                   us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shared kernel step for the recursive path: stack a batch into the
    dense (rows, n_s) matrix, center/scale, zero-fill missing, then subtract
    each prior mode's signal (``z0 -= (z0 @ u) u^T``), re-zeroing missing
    positions after every subtraction so deflation only ever touches
    observed entries (Taylor et al. 2013 RSEOF). Returns ``(z0, obs)``
    where obs is the 0/1 observation mask."""
    z = (stack_vectors(pdf, n_s, scratch=True) - c) / s
    miss = np.isnan(z)
    z0 = np.nan_to_num(z, copy=False)
    for u in us:
        a = z0 @ u
        z0 -= np.outer(a, u)
        z0[miss] = 0.0
    return z0, (~miss).astype(np.float64)


def gappy_gramian(
    vec_df: DataFrame,
    n_s: int,
    center: np.ndarray,
    scale: np.ndarray,
    us: np.ndarray,
    want_pairs: bool = False,
    force_distributed: bool = False,
) -> tuple[np.ndarray, np.ndarray | None, int]:
    """Zero-filled Gramian ``Z0^T Z0`` of the (centered/scaled, deflated)
    gappy matrix, plus (optionally) the pairwise observation counts
    ``N = V^T V`` (V the 0/1 mask). Same adaptive driver/distributed split
    and chunked merge as :func:`gramian`; the distributed path ships
    ``GRAMIAN_PARTIALS * (1 or 2) * n_s^2`` doubles regardless of bucket
    count. ``us`` (k x n_s) are the already-extracted modes to deflate by
    inside the kernel, so the deflated matrix is never materialized."""
    c = np.asarray(center, dtype="float64")
    s = np.where(np.asarray(scale, dtype="float64") == 0, 1.0, scale)
    us = np.asarray(us, dtype="float64").reshape(-1, n_s)

    n_buckets = vec_df.count()
    if not force_distributed and n_buckets * n_s <= GRAMIAN_Z_DRIVER_LIMIT:
        pdf = vec_df.select("idxs", "vals").toPandas()
        z0, obs = _deflated_rows(pdf, n_s, c, s, us)
        g = z0.T @ z0
        npairs = obs.T @ obs if want_pairs else None
        return g, npairs, n_buckets

    n_chunks = (n_s + GRAMIAN_CHUNK - 1) // GRAMIAN_CHUNK

    def partials(batches):
        g = np.zeros((n_s, n_s))
        pc = np.zeros((n_s, n_s)) if want_pairs else None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z0, obs = _deflated_rows(pdf, n_s, c, s, us)
            g += z0.T @ z0
            if want_pairs:
                pc += obs.T @ obs
            n += len(pdf)
        chunks = list(range(n_chunks))
        idx = chunks + ([n_chunks + i for i in chunks] if want_pairs else []) + [-1]
        part = [g[i * GRAMIAN_CHUNK : (i + 1) * GRAMIAN_CHUNK].ravel() for i in chunks]
        if want_pairs:
            part += [
                pc[i * GRAMIAN_CHUNK : (i + 1) * GRAMIAN_CHUNK].ravel()
                for i in chunks
            ]
        part += [np.array([float(n)])]
        yield pd.DataFrame({"chunk_idx": idx, "part": part})

    parts = vec_df.select("idxs", "vals").coalesce(GRAMIAN_PARTIALS).mapInPandas(
        partials, "chunk_idx int, part array<double>"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        summed = np.stack(pdf["part"].to_numpy()).sum(axis=0)
        return pd.DataFrame(
            {"chunk_idx": [int(pdf["chunk_idx"].iloc[0])], "row": [summed]}
        )

    merged = parts.groupBy("chunk_idx").applyInPandas(
        merge, "chunk_idx int, row array<double>"
    ).toPandas()
    g = np.zeros((n_s, n_s))
    npairs = np.zeros((n_s, n_s)) if want_pairs else None
    n_t = 0
    for ci, row in zip(merged["chunk_idx"], merged["row"]):
        ci = int(ci)
        if ci == -1:
            n_t = int(row[0])
            continue
        tgt, lo = (g, ci) if ci < n_chunks else (npairs, ci - n_chunks)
        chunk = np.asarray(row)
        tgt[lo * GRAMIAN_CHUNK : lo * GRAMIAN_CHUNK + len(chunk) // n_s] = (
            chunk.reshape(-1, n_s)
        )
    return g, npairs, n_t


def eof(
    spark: SparkSession,
    tier_df: DataFrame,
    n_modes: int = 4,
    centered: bool = True,
    scaled: bool = False,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    recursive: bool = False,
    solver: str = "auto",
) -> dict:
    """EOF decomposition; returns {"modes": DataFrame, "ecs": DataFrame,
    "lambda": list, "explained_pct": list, "tot_var": float}.

    Fully distributed: per-source stats by groupBy, Gramian by
    per-partition outer products, expansion coefficients streamed back as
    ``Z @ V`` per bucket. Driver holds only n_s-sized arrays.

    ``solver``: ``"dense"`` forms the n_s x n_s Gramian and eigh's it on
    the driver (exact; the MLlib RowMatrix ceiling); ``"iterative"``
    never forms the Gramian — block subspace iteration over distributed
    matvec passes (:func:`gramian_matvec`), O(n_s * block) state, the
    path for 10^5-10^6 sources; ``"auto"`` picks dense up to
    ``EOF_DENSE_SOURCE_LIMIT`` sources, iterative past it. Both produce
    the same modes/eigenvalues (pytest pins agreement at small n_s);
    the iterative eigenvalues carry solver tolerance ~1e-10 relative.

    ``recursive=True`` is the sinkr ``eof(..., recursive=TRUE)`` mode the
    reference exposes (``/root/reference/R/rtsa.eof.R:246``): RSEOF —
    recursively subtracted EOFs (Taylor, Losch, Wenzel & Schroeter 2013).
    Modes are extracted one at a time from the PAIRWISE covariance
    ``C_jk = (Z0^T Z0)_jk * n_t / N_jk`` (zero-filled cross-products scaled
    by shared-observation counts), and each extracted mode's signal is
    subtracted from the observed entries before the next is computed. This
    tolerates gappy input (missing cells allowed; duplicate cells still
    rejected) — on COMPLETE input it reduces to the simultaneous
    decomposition exactly (N_jk == n_t makes C the plain Gramian, and
    deflation then commutes with eigh; pytest asserts the parity). Costs
    ``n_modes`` Gramian passes + one EC pass over the persisted vectors;
    the deflated matrix itself is never materialized (deflation happens
    inside the kernels from the broadcast mode list)."""
    sources = source_index(tier_df, key_col)
    n_s = len(sources)
    stats = {
        r[key_col]: r
        for r in tier_df.groupBy(key_col)
        .agg(
            F.avg(F.col(value_col)).alias("_mean"),
            F.stddev_samp(F.col(value_col)).alias("_sd"),
        )
        .collect()
    }
    center = (
        np.array([stats[s]["_mean"] for s in sources])
        if centered
        else np.zeros(n_s)
    )
    scale = (
        np.array([stats[s]["_sd"] or 0.0 for s in sources])
        if scaled
        else np.ones(n_s)
    )
    scale[scale == 0] = 1.0

    if recursive:
        return _eof_recursive(
            spark, tier_df, sources, center, scale, n_modes,
            value_col, key_col, bucket_col,
        )

    # persist: the vectors feed completeness check, Gramian, and the EC
    # pass — one materialization instead of three
    vecs = require_complete(
        bucket_vectors(tier_df, sources, value_col, key_col, bucket_col)
    ).persist()
    if solver == "auto":
        solver = "dense" if n_s <= EOF_DENSE_SOURCE_LIMIT else "iterative"
    if solver == "iterative":
        v, lam, tot_var, n_t = _leading_modes_iterative(
            vecs, n_s, center, scale, n_modes
        )
        n_modes = v.shape[1]
    elif solver == "dense":
        g, n_t = gramian(vecs, n_s, center, scale)
        n_modes = max(1, min(n_modes, min(n_t, n_s)))
        w, v = np.linalg.eigh(g / max(n_t - 1, 1))
        order = np.argsort(w)[::-1]
        lam = np.maximum(w[order], 0.0)
        v = v[:, order]
        tot_var = float(lam.sum())
    else:
        raise ValueError(f"solver must be auto/dense/iterative, got {solver!r}")
    # deterministic sign: largest-|loading| element of each mode positive
    for m in range(n_modes):
        j = int(np.argmax(np.abs(v[:, m])))
        if v[j, m] < 0:
            v[:, m] = -v[:, m]
    explained = [float(100 * l / tot_var) if tot_var else 0.0 for l in lam[:n_modes]]

    modes = spark.createDataFrame(
        pd.DataFrame(
            {
                key_col: np.repeat(np.array(sources, dtype=object), n_modes),
                "mode": np.tile(np.arange(1, n_modes + 1), n_s),
                "loading": v[:, :n_modes].ravel(),
                "center": np.repeat(center, n_modes),
                "scale": np.repeat(scale, n_modes),
            }
        ),
        f"{key_col} string, mode int, loading double, center double, scale double",
    )

    vk = v[:, :n_modes].copy()
    c_arr, s_arr = center.copy(), scale.copy()

    n_s_k = n_s

    def ec_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = (stack_vectors(pdf, n_s_k, scratch=True) - c_arr) / s_arr
            ec = z @ vk  # (batch, n_modes)
            nb = len(pdf)
            yield pd.DataFrame(
                {
                    bucket_col: np.repeat(
                        pdf[bucket_col].to_numpy(), n_modes
                    ),
                    "mode": np.tile(np.arange(1, n_modes + 1), nb),
                    "ec": ec.ravel(),
                }
            )

    ecs = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
        ec_rows, f"{bucket_col} timestamp, mode int, ec double"
    )
    return {
        "modes": modes,
        "ecs": ecs,
        "lambda": [float(l) for l in lam[:n_modes]],
        "explained_pct": explained,
        "tot_var": tot_var,
    }


def _eof_recursive(
    spark: SparkSession,
    tier_df: DataFrame,
    sources: list,
    center: np.ndarray,
    scale: np.ndarray,
    n_modes: int,
    value_col: str,
    key_col: str,
    bucket_col: str,
) -> dict:
    """RSEOF driver loop (see :func:`eof` ``recursive=True`` docstring).
    Per mode: one :func:`gappy_gramian` pass (deflating by the modes found
    so far inside the kernel), pairwise-scaled covariance, leading
    eigenpair. One final pass streams the per-bucket expansion
    coefficients for all modes."""
    n_s = len(sources)
    vecs = require_no_duplicates(
        bucket_vectors(tier_df, sources, value_col, key_col, bucket_col)
    ).persist()

    us = np.zeros((0, n_s))
    lams: list[float] = []
    npairs = None
    tot_var = 0.0
    n_t = 0
    for m in range(n_modes):
        g0, npr, n_t = gappy_gramian(
            vecs, n_s, center, scale, us, want_pairs=(m == 0)
        )
        if m == 0:
            npairs = npr
            n_modes = max(1, min(n_modes, min(n_t, n_s)))
        cov = np.where(npairs > 0, g0 * (float(n_t) / np.maximum(npairs, 1)), 0.0)
        cov = (cov + cov.T) / 2.0 / max(n_t - 1, 1)
        if m == 0:
            tot_var = float(np.trace(cov))
        w, v = np.linalg.eigh(cov)
        j = int(np.argmax(w))
        u = v[:, j]
        jmax = int(np.argmax(np.abs(u)))
        if u[jmax] < 0:
            u = -u
        lams.append(max(float(w[j]), 0.0))
        us = np.vstack([us, u])
        if len(lams) >= n_modes:
            break

    n_k = len(lams)
    explained = [100.0 * l / tot_var if tot_var else 0.0 for l in lams]

    modes = spark.createDataFrame(
        pd.DataFrame(
            {
                key_col: np.repeat(np.array(sources, dtype=object), n_k),
                "mode": np.tile(np.arange(1, n_k + 1), n_s),
                "loading": us.T.ravel(),
                "center": np.repeat(center, n_k),
                "scale": np.repeat(scale, n_k),
            }
        ),
        f"{key_col} string, mode int, loading double, center double, scale double",
    )

    c_arr, s_arr, us_k = center.copy(), scale.copy(), us.copy()

    def ec_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = (stack_vectors(pdf, n_s, scratch=True) - c_arr) / s_arr
            miss = np.isnan(z)
            z0 = np.nan_to_num(z, copy=False)
            nb = len(pdf)
            ec = np.empty((nb, n_k))
            # progressive deflation: mode i's EC is the zero-filled
            # projection of the residual after modes < i were removed
            for i, u in enumerate(us_k):
                a = z0 @ u
                ec[:, i] = a
                z0 -= np.outer(a, u)
                z0[miss] = 0.0
            yield pd.DataFrame(
                {
                    bucket_col: np.repeat(pdf[bucket_col].to_numpy(), n_k),
                    "mode": np.tile(np.arange(1, n_k + 1), nb),
                    "ec": ec.ravel(),
                }
            )

    ecs = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
        ec_rows, f"{bucket_col} timestamp, mode int, ec double"
    )
    return {
        "modes": modes,
        "ecs": ecs,
        "lambda": lams,
        "explained_pct": explained,
        "tot_var": tot_var,
    }


def _type7_quantile_bounds(modes: DataFrame, cut_pct: float) -> DataFrame:
    """Per-mode (lo, hi) = R type-7 quantiles at (cut, 1-cut), computed by
    an EXPLICIT rank/interpolation chain rather than the engine's built-in
    percentile: h = p*(n-1), k = floor(h), q = x_(k+1) + (x_(k+2) -
    x_(k+1))*(h-k) over the ascending sort. The fixed op order makes the
    result replayable bit-for-bit by any engine running the same formula
    (R ``quantile type=7`` is what rtsa.scaleEOF calls;
    ``/root/reference/R/rtsa.scaleEOF.R:67-70``)."""
    from pyspark.sql import Window

    c = cut_pct / 100.0
    wm = Window.partitionBy("mode").orderBy("loading")
    # rank assignment under ties is arbitrary but harmless: tied values are
    # equal, so the interpolated quantile is identical either way
    ranked = modes.select(
        "mode",
        "loading",
        (F.row_number().over(wm) - 1).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("mode")).alias("n"),
    )
    return (
        ranked.withColumn(
            "h_lo", F.lit(c) * (F.col("n") - 1).cast("double")
        )
        .withColumn("h_hi", F.lit(1.0 - c) * (F.col("n") - 1).cast("double"))
        .groupBy("mode")
        .agg(_agg_type7("h_lo").alias("lo"), _agg_type7("h_hi").alias("hi"))
    )


def _agg_type7(h_col: str):
    """Aggregate expression: interpolate loading at fractional rank h."""
    h = F.first(F.col(h_col))
    k = F.floor(F.first(F.col(h_col))).cast("long")
    at_k = F.max(
        F.when(F.col("rk") == F.floor(F.col(h_col)).cast("long"), F.col("loading"))
    )
    at_k1 = F.coalesce(
        F.max(
            F.when(
                F.col("rk") == F.floor(F.col(h_col)).cast("long") + 1,
                F.col("loading"),
            )
        ),
        at_k,
    )
    return at_k + (at_k1 - at_k) * (h - k.cast("double"))


def scale_eof_modes(modes: DataFrame, cut_pct: float = 1.0) -> DataFrame:
    """Percentile clip of mode loadings to [-1, 1] — rtsa.scaleEOF (M3/A9,
    ``/root/reference/R/rtsa.scaleEOF.R:67-73``): values >= p(1-cut) -> 1,
    <= p(cut) -> -1, linear in between. Pure columnar expressions; the
    quantile bounds use the explicit R type-7 chain
    (:func:`_type7_quantile_bounds`) so the operator is deterministic
    across engines and hard-oracled at the gate (q_scale_eof_modes)."""
    bounds = _type7_quantile_bounds(modes, cut_pct)
    j = modes.join(F.broadcast(bounds), "mode")
    scaled = F.when(F.col("loading") >= F.col("hi"), 1.0).when(
        F.col("loading") <= F.col("lo"), -1.0
    ).otherwise(
        -1.0 + 2.0 * (F.col("loading") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    # the key column is whatever eof() named it (its key_col argument)
    key = next(
        c for c in modes.columns if c not in ("mode", "loading", "center", "scale")
    )
    return j.select(key, "mode", scaled.alias("loading_scaled"))
