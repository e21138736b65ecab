"""EOT — Empirical Orthogonal Teleconnections (reference M4).

``rtsa.eot`` (``/root/reference/R/rtsa.eot.R:245``, delegating to
``remote::eot``) iteratively finds, per mode, the *base* cell whose series
best explains the variance of all other cells; emits the base-point series
plus per-cell regression statistics (r, r^2, intercept, slope, p), then
regresses the field on the base series and continues on the residuals.
(The reference's own "compute"-mask + gapfill paths are unrunnable as
written — SURVEY.md §8 Q2 — so this implements the documented intent.)

Distributed shape (no driver-side pivot for the default ``type="rsq"``):

- the centered field's **source x source Gramian** ``G`` is accumulated
  distributedly once (operators/eof.gramian);
- every per-mode quantity is a function of G: correlations
  ``r = G_jk / sqrt(G_jj G_kk)``, base selection = argmax row-sum of
  ``r^2``, regression ``slope = G_jk / G_jj``, explained variance =
  trace reduction; the residual update ``resid' = resid(I - e_j b^T)``
  is the **rank-1 Gramian downdate** ``G' = G - g_j g_j^T / G_jj`` —
  no second pass over the data per mode;
- base-point series stream out distributedly at the end: mode m's series
  is ``(x_b - mean) . w_m`` where ``w_m`` tracks the accumulated residual
  transform (driver-side n_s vector algebra only).

p-values use the exact Student-t correlation test
(functions/stats.t_p_two_sided) — R's ``cor.test`` identity, not the r1
normal approximation.

``type="ioa"`` (index-of-agreement base selection, the second ``remote``
option) needs per-pair absolute deviations that no Gramian carries, so it
scores candidates on the assembled dense field (bucket vectors collected
to numpy — tier-bounded) and is intended for modest source counts;
``rsq`` remains the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from rtsa_spark.functions.stats import t_p_two_sided
from rtsa_spark.operators.eof import (
    bucket_vectors,
    gramian,
    require_complete,
    source_index,
)


def _collect_matrix(
    vec_df: DataFrame, bucket_col: str, n_s: int
) -> tuple[np.ndarray, list]:
    """Assemble the dense bucket x source matrix from the distributed
    bucket vectors (single ordered collect of packed rows — used only by
    the ioa scorer and DINEOF, both inherently dense-iterative)."""
    pdf = vec_df.select(bucket_col, "idxs", "vals").orderBy(bucket_col).toPandas()
    from rtsa_spark.operators.eof import stack_vectors

    return stack_vectors(pdf, n_s), list(pdf[bucket_col])


def _ioa_scores(resid: np.ndarray) -> np.ndarray:
    """Sum over cells of Willmott's index of agreement of the base-j
    regression prediction vs each cell series; O(n_s^2 n_t) brute force
    (what ``remote::eot`` does per pixel)."""
    n_t, n_s = resid.shape
    var = np.einsum("ij,ij->j", resid, resid)
    var_safe = np.where(var == 0, 1.0, var)
    scores = np.zeros(n_s)
    for j in range(n_s):
        base = resid[:, j]
        slope = (resid.T @ base) / var_safe[j]
        pred = np.outer(base, slope)
        err = ((resid - pred) ** 2).sum(axis=0)
        denom = ((np.abs(pred) + np.abs(resid)) ** 2).sum(axis=0)
        denom = np.where(denom == 0, 1.0, denom)
        scores[j] = (1.0 - err / denom).sum()
    return scores


def eot(
    spark: SparkSession,
    tier_df: DataFrame,
    n_modes: int = 2,
    standardised: bool = False,
    type: str = "rsq",
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> dict:
    """Returns {"modes": DataFrame(source, mode, r, r2, slope, intercept, p),
    "base_points": [(mode, source)], "base_series": DataFrame,
    "explained_pct": [..]} — the EOTstack contract
    (``R/rtsa_classes.R:66-79``, unpack at ``R/rtsa.eot.R:285-362``)."""
    if type not in ("rsq", "ioa"):
        raise ValueError(f"type must be 'rsq' or 'ioa', got {type!r}")
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
    center = np.array([stats[s]["_mean"] for s in sources])
    scale = np.ones(n_s)
    if standardised:
        scale = np.array([stats[s]["_sd"] or 0.0 for s in sources])
        scale[scale == 0] = 1.0

    vecs = require_complete(
        bucket_vectors(tier_df, sources, value_col, key_col, bucket_col)
    ).persist()
    g, n_t = gramian(vecs, n_s, center, scale)
    tot_var = float(np.trace(g))

    dense = None
    if type == "ioa":
        mat, _ = _collect_matrix(vecs, bucket_col, n_s)
        dense = (mat - center) / scale

    mode_frames, bases, explained = [], [], []
    # w_cols[:, m] maps a centered bucket vector to mode m's base value:
    # resid_m = field @ T_m, base_m = resid_m[:, j_m] = field @ T_m e_{j_m}
    t_mat = np.eye(n_s)
    w_cols = np.zeros((n_s, n_modes))
    df_t = n_t - 2
    for mode in range(1, n_modes + 1):
        diag = np.diag(g).copy()
        diag_safe = np.where(diag <= 0, 1.0, diag)
        corr = g / np.sqrt(np.outer(diag_safe, diag_safe))
        r2 = corr**2
        if type == "ioa":
            scores = _ioa_scores(dense)
        else:
            scores = r2.sum(axis=1)
        base_j = int(np.argmax(scores))
        bases.append((mode, sources[base_j]))
        w_cols[:, mode - 1] = t_mat[:, base_j]

        gj = g[:, base_j]
        gjj = float(diag_safe[base_j])
        slope = gj / gjj
        r = corr[base_j, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            tval = r * np.sqrt(np.maximum(df_t, 0) / np.maximum(1 - r * r, 1e-300))
        p = np.where(
            np.abs(r) >= 1.0,
            0.0,
            t_p_two_sided(tval, df_t) if df_t > 0 else np.nan,
        )
        mode_frames.append(
            pd.DataFrame(
                {
                    key_col: np.array(sources, dtype=object),
                    "mode": mode,
                    "r": r,
                    "r2": r * r,
                    "slope": slope,
                    # residual field is centered by construction -> 0
                    "intercept": 0.0,
                    "p": p,
                }
            )
        )
        before = float(np.trace(g))
        # rank-1 downdate: resid' = resid (I - e_j slope^T)
        g = g - np.outer(gj, gj) / gjj
        t_mat = t_mat - np.outer(t_mat[:, base_j], slope)
        if dense is not None:
            dense = dense - np.outer(dense[:, base_j], slope)
        after = float(np.trace(g))
        explained.append(100.0 * (before - after) / tot_var if tot_var else 0.0)

    modes = spark.createDataFrame(
        pd.concat(mode_frames, ignore_index=True),
        f"{key_col} string, mode int, r double, r2 double, slope double,"
        " intercept double, p double",
    )

    wb = w_cols.copy()
    c_arr, s_arr = center.copy(), scale.copy()
    nm = n_modes

    from rtsa_spark.operators.eof import stack_vectors

    n_s_k = n_s

    def base_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = (stack_vectors(pdf, n_s_k, scratch=True) - c_arr) / s_arr
            bv = z @ wb  # (batch, n_modes)
            nb = len(pdf)
            yield pd.DataFrame(
                {
                    bucket_col: np.repeat(pdf[bucket_col].to_numpy(), nm),
                    "mode": np.tile(np.arange(1, nm + 1), nb),
                    "base_value": bv.ravel(),
                }
            )

    base_series = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
        base_rows, f"{bucket_col} timestamp, mode int, base_value double"
    )
    return {
        "modes": modes,
        "base_points": bases,
        "base_series": base_series,
        "explained_pct": explained,
    }
