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
option): Willmott's denominator needs per-pair sums of
``(|pred| + |resid|)^2`` — expandable as ``slope^2 G_jj + 2|slope| A_jk
+ G_kk`` where ``A = |resid|^T |resid|`` is the ABSOLUTE-value Gramian.
A is accumulated distributedly per mode (same partial-sum shape as G)
and the residual field is downdated by a distributed rank-1 pass, so
above ``IOA_Z_DRIVER_LIMIT`` the driver never holds more than n_s^2
doubles (the round-2 dense-collect scale ceiling is gone); small tiers
keep the dense scorer (fewer jobs, identical scores).
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
    (what ``remote::eot`` does per pixel). Dense-path scorer — the
    distributed path computes the identical quantity from (G, A) via
    :func:`_ioa_scores_from_gramians`."""
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


def _ioa_scores_from_gramians(g: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Willmott-ioa scores from the residual Gramian ``G`` and the
    absolute-value Gramian ``A = |resid|^T |resid|``: per (base j, cell k)
    ``err = G_kk - 2 slope G_jk + slope^2 G_jj`` and
    ``denom = slope^2 G_jj + 2 |slope| A_jk + G_kk`` with
    ``slope = G_jk / G_jj`` — algebraically identical to
    :func:`_ioa_scores`, O(n_s^2) driver math, nothing bucket-sized."""
    n_s = g.shape[0]
    var = np.diag(g).copy()
    var_safe = np.where(var == 0, 1.0, var)
    scores = np.zeros(n_s)
    for j in range(n_s):
        slope = g[:, j] / var_safe[j]
        err = var - 2.0 * slope * g[:, j] + slope * slope * var_safe[j]
        denom = slope * slope * var_safe[j] + 2.0 * np.abs(slope) * a[:, j] + var
        denom = np.where(denom == 0, 1.0, denom)
        scores[j] = float((1.0 - err / denom).sum())
    return scores


def common_spine_z(
    tier_df: DataFrame,
    value_col: str,
    key_col: str = "source",
    bucket_col: str = "bucket_start",
) -> tuple[DataFrame, DataFrame, list, int]:
    """Common complete spine + exact-int centering shared by the
    deterministic analytics (:func:`eot_deterministic`, the EOF
    reconstruction audit) and replayed in SQL by the driver's
    ``_SQL_SPINE_Z``: keep the buckets observed by every source, then
    center as ``z = n_t*x - S_key`` (scale-invariant for every emitted
    statistic, so no float mean ever enters). Returns
    ``(on_spine(key, bucket, _x), z_df(key, bucket, z), sources, n_t)``.
    """
    sources = source_index(tier_df, key_col)
    n_s = len(sources)
    x = F.col(value_col).cast("long")
    base = tier_df.select(key_col, bucket_col, x.alias("_x"))
    spine = (
        base.groupBy(bucket_col)
        .agg(F.count_distinct(key_col).alias("_nk"))
        .where(F.col("_nk") == n_s)
        .select(bucket_col)
    )
    on_spine = base.join(spine, bucket_col)
    n_t = spine.count()
    sums = on_spine.groupBy(key_col).agg(F.sum("_x").alias("_s"))
    z_df = on_spine.join(F.broadcast(sums), key_col).select(
        key_col,
        bucket_col,
        (F.lit(n_t) * F.col("_x") - F.col("_s")).alias("z"),
    )
    return on_spine, z_df, sources, n_t


def eot_deterministic(
    tier_df: DataFrame,
    value_col: str = "x",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    n_modes: int = 2,
) -> DataFrame:
    """Oracle-facing EOT twin (reference M4, ``/root/reference/R/rtsa.eot.R:245``)
    over an INTEGER-valued tier series, IEEE-deterministic so a DuckDB
    oracle hash-matches every output bit (CLAUDE.md pattern):

    - restrict to the **common complete spine** (buckets observed by every
      source) — the relational analog of the reference's complete-profile
      requirement, replayable as a ``HAVING count(*) = n_sources`` filter;
    - center in exact-int domain: ``z = n_t*x - S_j`` (scale-invariant for
      every emitted statistic, so no float mean ever enters);
    - the source x source Gramian ``G = Z^T Z`` is accumulated by the
      distributed :func:`rtsa_spark.operators.eof.gramian` pass — every
      entry an exact integer below 2^53, so float64 partials are exact and
      summation order is irrelevant;
    - per mode: base = argmax_j sum_k (G_jk*G_jk)/(G_jj*G_kk) with the sum
      taken in ascending-source order; emitted stats are fixed 3-op chains
      (product, sqrt, divide); the residual step is the rank-1 float
      downdate ``G' = G - (g_aj*g_bj)/G_jj`` with the base row/col zeroed
      exactly. Both engines execute the identical op sequence, so the
      doubles (and their ``floor(1e6*.)`` quantizations) are bit-equal.

    Returns one row per (source, mode): ``is_base``, ``r_e6``,
    ``slope_e6`` (NULL for sources already consumed as bases), and the
    per-mode ``expl_e4`` explained-variance quantization. The float64
    production path (:func:`eot`) is pinned to this twin in
    tests/test_dineof_eot.py.
    """
    import math

    from pyspark.sql.types import StructType

    spark = tier_df.sparkSession
    schema = (
        f"{key_col} string, mode int, is_base int, r_e6 bigint,"
        " slope_e6 bigint, expl_e4 bigint"
    )
    _, z_df, sources, n_t = common_spine_z(tier_df, value_col, key_col, bucket_col)
    n_s = len(sources)
    if n_s == 0:
        # empty tier: the SQL twin likewise emits no rows
        return spark.createDataFrame([], StructType.fromDDL(schema))
    vecs = bucket_vectors(z_df, sources, "z", key_col, bucket_col)
    g_mat, _ = gramian(vecs, n_s)
    # bit-equality contract: every Gramian entry must be an exact int below
    # 2^53 so Spark's float64 partial sums equal DuckDB's integer sums.
    # Enforce instead of silently diverging at larger SF / longer spines.
    g_abs_max = float(np.abs(np.asarray(g_mat)).max()) if n_s else 0.0
    if g_abs_max >= 2.0**53:
        raise ValueError(
            f"eot_deterministic exact-int domain exceeded: |G|max={g_abs_max:.3e}"
            " >= 2^53; rescale the input (coarser value units or shorter"
            " spine) to keep the oracle bit-exact"
        )

    rows: list[dict] = []
    g = [[float(g_mat[a][b]) for b in range(n_s)] for a in range(n_s)]
    diag = [g[a][a] for a in range(n_s)]
    tot0 = 0.0
    for a in range(n_s):
        tot0 += diag[a]
    for mode in range(1, n_modes + 1):
        elig = [a for a in range(n_s) if diag[a] > 0]
        best_j, best_score = None, None
        for j in elig:
            s = 0.0
            for k in elig:
                s += (g[j][k] * g[j][k]) / (diag[j] * diag[k])
            if best_score is None or s > best_score:
                best_j, best_score = j, s
        if best_j is None:
            # no eligible base (all variances consumed/zero): the SQL twin
            # still emits the ineligible-source NULL rows for this mode
            # (and nothing for later modes — its next diag CTE is empty)
            if n_t > 0:
                for k in range(n_s):
                    rows.append(
                        {
                            key_col: sources[k],
                            "mode": mode,
                            "is_base": 0,
                            "r_e6": None,
                            "slope_e6": None,
                            "expl_e4": None,
                        }
                    )
            break
        bj = best_j
        before = 0.0
        for a in range(n_s):
            before += diag[a]
        for k in range(n_s):
            if diag[k] > 0:
                r = g[bj][k] / math.sqrt(diag[bj] * diag[k])
                slope = g[bj][k] / diag[bj]
                rows.append(
                    {
                        key_col: sources[k],
                        "mode": mode,
                        "is_base": int(k == bj),
                        "r_e6": math.floor(1_000_000.0 * r),
                        "slope_e6": math.floor(1_000_000.0 * slope),
                    }
                )
            else:
                rows.append(
                    {
                        key_col: sources[k],
                        "mode": mode,
                        "is_base": 0,
                        "r_e6": None,
                        "slope_e6": None,
                    }
                )
        gj = [g[a][bj] for a in range(n_s)]
        gjj = diag[bj]
        for a in range(n_s):
            for b in range(n_s):
                if a == bj or b == bj:
                    g[a][b] = 0.0
                else:
                    g[a][b] = g[a][b] - (gj[a] * gj[b]) / gjj
        diag = [g[a][a] for a in range(n_s)]
        after = 0.0
        for a in range(n_s):
            after += diag[a]
        expl = math.floor(10_000.0 * ((before - after) / tot0)) if tot0 else None
        for r_ in rows[-n_s:]:
            r_["expl_e4"] = expl

    if not rows:
        # degenerate input (empty common spine / all-zero variance): the
        # SQL twin likewise emits no rows
        return spark.createDataFrame([], StructType.fromDDL(schema))
    # Plain python int|None tuples: pandas nullable-Int64 frames degrade to
    # float64 under the non-Arrow createDataFrame fallback and the LongType
    # verifier then rejects them (round-2 driver failure). Tuples are exact
    # on both the Arrow and the legacy row-verifier path.
    data = [
        (r[key_col], r["mode"], r["is_base"], r["r_e6"], r["slope_e6"], r["expl_e4"])
        for r in rows
    ]
    return spark.createDataFrame(data, schema)


#: remote::eot's exportable per-cell components (``R/rtsa.eot.R:21-37``)
#: mapped to this engine's column names.
EOT_PREDICTOR_COLS = {
    "r_predictor": "r",
    "rsq_predictor": "r2",
    "rsq_sums_predictor": "rsq_sums",
    "int_predictor": "intercept",
    "slp_predictor": "slope",
    "p_predictor": "p",
}


def eot(
    spark: SparkSession,
    tier_df: DataFrame,
    n_modes: int = 2,
    standardised: bool = False,
    type: str = "rsq",
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    predictor: tuple = ("all",),
    reduce_both: bool = True,
    force_distributed: bool = False,
) -> dict:
    """Returns {"modes": DataFrame(source, mode, <selected components>),
    "base_points": [(mode, source)], "base_series": DataFrame,
    "explained_pct": [..]} — the EOTstack contract
    (``R/rtsa_classes.R:66-79``, unpack at ``R/rtsa.eot.R:285-362``).

    ``predictor`` (``R/rtsa.eot.R:89,117-119``): which per-cell component
    columns to export — any of :data:`EOT_PREDICTOR_COLS` keys or "all"
    (default). ``rsq_sums`` is the per-cell sum of r^2 against all cells,
    i.e. the base-selection score map (remote's rsq_sums_predictor).

    ``force_distributed``: route ``type="ioa"`` scoring through the
    distributed G/A-Gramian path even below ``GRAMIAN_Z_DRIVER_LIMIT``
    (testing hook; the dispatch is otherwise size-adaptive).

    ``reduce_both`` (remote::eot's flag): True (default) deflates the
    single field after each mode — the classic one-field EOT the
    reference's single-raster call performs. False treats the input as
    predictor/response COPIES and deflates only the response: base
    selection for later modes scans the UNDEFLATED predictor field
    against the deflated response (remote's two-field
    ``reduce.both=FALSE`` semantics); base series are then original
    centered cell series. Only ``type="rsq"`` supports False (the ioa
    scorer is single-field)."""
    if type not in ("rsq", "ioa"):
        raise ValueError(f"type must be 'rsq' or 'ioa', got {type!r}")
    if not reduce_both and type != "rsq":
        raise ValueError("reduce_both=False requires type='rsq'")
    if "all" in predictor:
        sel_cols = list(EOT_PREDICTOR_COLS.values())
    else:
        bad = [p for p in predictor if p not in EOT_PREDICTOR_COLS]
        if bad:
            raise ValueError(
                f"unknown predictor component(s) {bad}; valid: "
                f"{sorted(EOT_PREDICTOR_COLS)} or 'all'"
            )
        sel_cols = [EOT_PREDICTOR_COLS[p] for p in predictor]
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

    from rtsa_spark.operators.eof import GRAMIAN_Z_DRIVER_LIMIT, stack_vectors

    dense = None
    ioa_state = None
    if type == "ioa":
        if not force_distributed and n_t * n_s <= GRAMIAN_Z_DRIVER_LIMIT:
            mat, _ = _collect_matrix(vecs, bucket_col, n_s)
            dense = (mat - center) / scale
        else:
            # distributed ioa: per-bucket residual rows; only the n_s^2
            # G/A Gramians ever reach the driver (module docstring)
            c_arr0, s_arr0 = center.copy(), scale.copy()
            n_s0 = n_s

            def _init_resid(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    z = (stack_vectors(pdf, n_s0) - c_arr0) / s_arr0
                    yield pd.DataFrame(
                        {bucket_col: pdf[bucket_col].to_numpy(), "resid": list(z)}
                    )

            _resid_schema = f"{bucket_col} timestamp, resid array<double>"
            ioa_state = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
                _init_resid, _resid_schema
            ).localCheckpoint(eager=True)

            def _abs_gramian(df):
                def part(batches):
                    acc = np.zeros((n_s0, n_s0))
                    for pdf in batches:
                        if len(pdf) == 0:
                            continue
                        z = np.abs(np.stack(pdf["resid"].to_numpy()))
                        acc += z.T @ z
                    yield pd.DataFrame({"g": [acc.ravel()]})

                tot = np.zeros(n_s0 * n_s0)
                for r_ in df.select("resid").mapInPandas(
                    part, "g array<double>"
                ).collect():
                    tot += np.asarray(r_["g"])
                return tot.reshape(n_s0, n_s0)

            def _downdate_resid(df, base_j, slope_vec):
                sl = slope_vec.copy()
                bj = int(base_j)

                def f(batches):
                    for pdf in batches:
                        if len(pdf) == 0:
                            continue
                        z = np.stack(pdf["resid"].to_numpy())
                        z = z - np.outer(z[:, bj], sl)
                        pdf = pdf.copy()
                        pdf["resid"] = list(z)
                        yield pdf

                # localCheckpoint keeps the plan depth constant across
                # modes (same rationale as the distributed DINEOF loop)
                return df.mapInPandas(f, _resid_schema).localCheckpoint(
                    eager=True
                )

    mode_frames, bases, explained = [], [], []
    # w_cols[:, m] maps a centered bucket vector to mode m's base value:
    # resid_m = field @ T_m, base_m = resid_m[:, j_m] = field @ T_m e_{j_m}
    t_mat = np.eye(n_s)
    w_cols = np.zeros((n_s, n_modes))
    df_t = n_t - 2
    if not reduce_both:
        # predictor/response copies: gp stays at the original Gramian, the
        # cross matrix c = P^T R and response variances gr deflate
        gp = g.copy()
        c_mat = g.copy()
        gr = np.diag(g).copy()
    for mode in range(1, n_modes + 1):
        if reduce_both:
            diag = np.diag(g).copy()
            diag_safe = np.where(diag <= 0, 1.0, diag)
            corr = g / np.sqrt(np.outer(diag_safe, diag_safe))
        else:
            dp = np.diag(gp).copy()
            dp_safe = np.where(dp <= 0, 1.0, dp)
            gr_safe = np.where(gr <= 0, 1.0, gr)
            corr = c_mat / np.sqrt(np.outer(dp_safe, gr_safe))
        r2 = corr**2
        rsq_sums = r2.sum(axis=1)
        if type == "ioa":
            if dense is not None:
                scores = _ioa_scores(dense)
            else:
                scores = _ioa_scores_from_gramians(g, _abs_gramian(ioa_state))
        else:
            scores = rsq_sums
        base_j = int(np.argmax(scores))
        bases.append((mode, sources[base_j]))
        w_cols[:, mode - 1] = t_mat[:, base_j]

        if reduce_both:
            gj = g[:, base_j]
            gjj = float(diag_safe[base_j])
        else:
            gj = c_mat[base_j, :]
            gjj = float(dp_safe[base_j])
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
                    "rsq_sums": rsq_sums,
                    "slope": slope,
                    # residual field is centered by construction -> 0
                    "intercept": 0.0,
                    "p": p,
                }
            )
        )
        if reduce_both:
            before = float(np.trace(g))
            # rank-1 downdate: resid' = resid (I - e_j slope^T)
            g = g - np.outer(gj, gj) / gjj
            t_mat = t_mat - np.outer(t_mat[:, base_j], slope)
            if dense is not None:
                dense = dense - np.outer(dense[:, base_j], slope)
            elif ioa_state is not None and mode < n_modes:
                ioa_state = _downdate_resid(ioa_state, base_j, slope)
            after = float(np.trace(g))
        else:
            before = float(gr.sum())
            # response-only deflation: r_k' = r_k - slope_k p_b, so
            # C' = C - Gp[:, b] slope^T and Gr' = Gr - C_bk^2 / Gp_bb;
            # the predictor (selection) field stays at the original.
            gr = gr - (c_mat[base_j, :] ** 2) / gjj
            c_mat = c_mat - np.outer(gp[:, base_j], slope)
            after = float(gr.sum())
        explained.append(100.0 * (before - after) / tot_var if tot_var else 0.0)

    modes = spark.createDataFrame(
        pd.concat(mode_frames, ignore_index=True)[
            [key_col, "mode", *sel_cols]
        ],
        f"{key_col} string, mode int, "
        + ", ".join(f"{c} double" for c in sel_cols),
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
