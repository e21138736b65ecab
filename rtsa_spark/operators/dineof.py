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
import pyspark.sql.functions as F
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


#: when the whole bucket x source matrix is at most this many doubles, the
#: dense driver iteration wins (one BLAS Gramian per inner step, zero
#: per-iteration job overhead); above it the distributed path runs and the
#: driver never holds more than n_s-sized state. Same rationale/number as
#: operators/eof.GRAMIAN_Z_DRIVER_LIMIT.
DINEOF_Z_DRIVER_LIMIT = 32 * 1024 * 1024


def _val_hash_mask(
    bsec: np.ndarray, n_s: int, val_frac: float, seed: int
) -> np.ndarray:
    """Deterministic per-cell validation selector for the distributed path:
    splitmix64 of (bucket epoch-seconds, source index) -> uniform [0,1) <
    val_frac. Stable across runs/partitionings — every pass recomputes the
    same mask with no global state."""
    cell = (
        bsec.astype(np.int64).view(np.uint64)[:, None] * np.uint64(1000003)
        + np.arange(n_s, dtype=np.uint64)[None, :]
        + np.uint64(seed)
    )
    z = cell + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53) < val_frac


def _bsec(pdf: pd.DataFrame, bucket_col: str) -> np.ndarray:
    return (
        pdf[bucket_col].to_numpy("datetime64[ns]").view("int64") // 1_000_000_000
    )


def _dineof_distributed(
    spark: SparkSession,
    vecs: DataFrame,
    sources: list,
    value_col: str,
    key_col: str,
    bucket_col: str,
    n_max: int,
    max_iter: int,
    tol: float,
    val_frac: float,
    seed: int,
    solver: str = "auto",
) -> DataFrame:
    """Distributed DINEOF fixed point: per-bucket dense state rows in a
    cached DataFrame; each inner iteration = one ``Z^T Z`` partial-sum pass
    + one rank-k rewrite pass with only (n_s x k) eigenvectors on the
    driver. See module docstring.

    ``solver``: rank-k subspace per inner iteration. ``"dense"`` collects
    the n_s x n_s Gramian and eigh's it (exact; driver-RAM ceiling at
    ~10^4.5 sources). ``"iterative"`` (r5) never forms the Gramian —
    warm-started block subspace iteration over distributed ``G @ Q``
    matvec passes, O(n_s x k) driver state; because the rewrite only uses
    the PROJECTOR ``V_k V_k^T``, subspace convergence (not eigenvector
    identity) is all that matters, and the warm start from the previous
    inner iteration typically converges in a handful of passes.
    ``"auto"`` switches to iterative past eof.EOF_DENSE_SOURCE_LIMIT."""
    from rtsa_spark.operators.eof import stack_vectors

    n_s = len(sources)

    # ---- pass 1: per-source stats (col means over non-validation observed
    # cells, observation counts) — n_s-sized driver state only
    def stats_part(batches):
        s = np.zeros(n_s)
        c = np.zeros(n_s, dtype=np.int64)
        obs_any = np.zeros(n_s, dtype=np.int64)
        nval = 0
        nb_total = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = stack_vectors(pdf, n_s)
            obs = ~np.isnan(z)
            vm = _val_hash_mask(_bsec(pdf, bucket_col), n_s, val_frac, seed) & obs
            keep = obs & ~vm
            s += np.where(keep, z, 0.0).sum(axis=0)
            c += keep.sum(axis=0)
            obs_any += obs.sum(axis=0)
            nval += int(vm.sum())
            nb_total += len(pdf)
        yield pd.DataFrame(
            {
                "s": [s],
                "c": [c.astype("float64")],
                "obs": [obs_any.astype("float64")],
                "nval": [float(nval)],
                "nb": [float(nb_total)],
            }
        )

    parts = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
        stats_part,
        "s array<double>, c array<double>, obs array<double>,"
        " nval double, nb double",
    ).collect()
    col_sum = np.zeros(n_s)
    col_cnt = np.zeros(n_s)
    obs_cnt = np.zeros(n_s)
    n_val_total = 0
    n_t = 0
    for r in parts:
        col_sum += np.asarray(r["s"])
        col_cnt += np.asarray(r["c"])
        obs_cnt += np.asarray(r["obs"])
        n_val_total += int(r["nval"])
        n_t += int(r["nb"])
    if (obs_cnt == 0).any():
        raise ValueError("DINEOF needs at least one observation per source")
    col_mean = np.where(col_cnt > 0, col_sum / np.maximum(col_cnt, 1), 0.0)
    use_cv = n_val_total > 0

    # ---- pass 2: init state rows (centered, work-missing zeroed)
    cm = col_mean

    def init_rows(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            z = stack_vectors(pdf, n_s)
            obs = ~np.isnan(z)
            vm = _val_hash_mask(_bsec(pdf, bucket_col), n_s, val_frac, seed) & obs
            wm = (~obs) | vm
            cur = np.where(wm, 0.0, z - cm)
            out = {
                bucket_col: pdf[bucket_col].to_numpy(),
                "cur": list(cur),
                "obs_idx": [np.where(o)[0].astype("int32") for o in obs],
                "obs_val": [row[o] for row, o in zip(z, obs)],
                "val_idx": [np.where(v)[0].astype("int32") for v in vm],
                "val_orig": [row[v] for row, v in zip(z, vm)],
                "wm_idx": [np.where(w)[0].astype("int32") for w in wm],
                "dsq": np.zeros(len(pdf)),
            }
            yield pd.DataFrame(out)

    state_schema = (
        f"{bucket_col} timestamp, cur array<double>, obs_idx array<int>,"
        " obs_val array<double>, val_idx array<int>, val_orig array<double>,"
        " wm_idx array<int>, dsq double"
    )
    state = vecs.select(bucket_col, "idxs", "vals").mapInPandas(
        init_rows, state_schema
    ).localCheckpoint(eager=True)
    total_wm = state.select(
        F.sum(F.size("wm_idx")).alias("w")
    ).collect()[0]["w"] or 0

    def dense_gramian(df) -> np.ndarray:
        def part(batches):
            g = np.zeros((n_s, n_s))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                z = np.stack(pdf["cur"].to_numpy())
                g += z.T @ z
            yield pd.DataFrame({"g": [g.ravel()]})

        acc = np.zeros(n_s * n_s)
        for r in df.select("cur").mapInPandas(part, "g array<double>").collect():
            acc += np.asarray(r["g"])
        return acc.reshape(n_s, n_s)

    def gram_matvec_dense(df, q: np.ndarray) -> np.ndarray:
        """One distributed pass: ``Y = Z^T (Z @ Q)`` over the state rows —
        the Gramian-free matvec (same shape as eof.gramian_matvec, but on
        the dense ``cur`` state column)."""
        bq = spark.sparkContext.broadcast(np.ascontiguousarray(q))
        kq = q.shape[1]

        def part(batches):
            qv = bq.value
            y = np.zeros((n_s, kq))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                z = np.stack(pdf["cur"].to_numpy())
                y += z.T @ (z @ qv)
            yield pd.DataFrame({"y": [y.ravel()]})

        acc = np.zeros(n_s * kq)
        for r in df.select("cur").mapInPandas(part, "y array<double>").collect():
            acc += np.asarray(r["y"])
        bq.unpersist()
        return acc.reshape(n_s, kq)

    def topk_subspace(
        df, k: int, q_warm: np.ndarray | None,
        oversample: int = 4, max_it: int = 60, sub_tol: float = 1e-9,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k invariant subspace by block iteration over
        :func:`gram_matvec_dense`, warm-started from the previous inner
        iteration's block. Returns ``(V_k, Q)`` — the Ritz block for the
        rewrite projector and the converged block for the next warm
        start."""
        kb = min(n_s, k + oversample)
        rng = np.random.default_rng(seed ^ 0x5B5)
        if q_warm is not None and q_warm.shape[1] > 0:
            base = q_warm[:, :kb]
            if base.shape[1] < kb:
                base = np.hstack(
                    [base, rng.standard_normal((n_s, kb - base.shape[1]))]
                )
        else:
            base = rng.standard_normal((n_s, kb))
        q, _ = np.linalg.qr(base)
        prev = None
        ritz = q
        for _ in range(max_it):
            y = gram_matvec_dense(df, q)
            b = q.T @ y
            b = (b + b.T) / 2.0
            w, sv = np.linalg.eigh(b)
            order = np.argsort(w)[::-1]
            theta, sv = w[order], sv[:, order]
            # Ritz block in the SAME basis sv came from — taken before
            # the qr update so the max_it-exhaustion exit cannot pair the
            # rotated q with a stale sv (which would hand the rewrite an
            # arbitrary kb-frame slice instead of the top-k subspace).
            ritz = q @ sv
            top = theta[:k]
            if prev is not None and np.all(
                np.abs(top - prev)
                <= sub_tol * np.maximum(np.abs(top), 1e-300)
            ):
                break
            prev = top
            q, _ = np.linalg.qr(y)
        vk = np.ascontiguousarray(ritz[:, :k])
        return vk, q

    def rewrite(df, vk: np.ndarray):
        def upd(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                z = np.stack(pdf["cur"].to_numpy())
                recon = (z @ vk) @ vk.T
                nb = len(pdf)
                lens = pdf["wm_idx"].map(len).to_numpy("int64")
                rows = np.repeat(np.arange(nb), lens)
                cols = (
                    np.concatenate(pdf["wm_idx"].to_numpy())
                    if nb and lens.sum()
                    else np.array([], dtype=np.int64)
                ).astype(np.int64)
                old = z[rows, cols]
                new = recon[rows, cols]
                z[rows, cols] = new
                dsq = np.zeros(nb)
                np.add.at(dsq, rows, (new - old) ** 2)
                pdf = pdf.copy()
                pdf["cur"] = list(z)
                pdf["dsq"] = dsq
                yield pdf

        return df.mapInPandas(upd, state_schema)

    from rtsa_spark.operators.eof import EOF_DENSE_SOURCE_LIMIT

    use_iterative = solver == "iterative" or (
        solver == "auto" and n_s > EOF_DENSE_SOURCE_LIMIT
    )
    q_warm: np.ndarray | None = None
    best_state = None
    best_rmse = np.inf
    best_k = 0
    k_cap = min(n_max, min(n_t, n_s))
    for k in range(1, max(1, k_cap) + 1):
        for _ in range(max_iter):
            if use_iterative:
                vk, q_warm = topk_subspace(state, k, q_warm)
            else:
                g = dense_gramian(state)
                w, v = np.linalg.eigh(g)
                vk = np.ascontiguousarray(v[:, -k:])
            # localCheckpoint TRUNCATES the lineage every iteration — a
            # persist() chain keeps the full mapInPandas nesting in the
            # logical plan and Catalyst re-analysis goes quadratic with
            # iteration count. Old checkpoints are GC'd once unreferenced.
            new_state = rewrite(state, vk).localCheckpoint(eager=True)
            delta_sq = new_state.select(F.sum("dsq").alias("d")).collect()[0]["d"]
            state = new_state
            if total_wm == 0 or float(
                np.sqrt((delta_sq or 0.0) / total_wm)
            ) < tol:
                break
        if not use_cv:
            best_state, best_k, best_rmse = state, k, float("nan")
            break

        def rmse_part(batches):
            se = 0.0
            n = 0
            for pdf in batches:
                nb = len(pdf)
                if nb == 0:
                    continue
                vlens = pdf["val_idx"].map(len).to_numpy("int64")
                if vlens.sum() == 0:
                    continue
                cur = np.stack(pdf["cur"].to_numpy())
                vrows = np.repeat(np.arange(nb), vlens)
                vcols = np.concatenate(pdf["val_idx"].to_numpy()).astype(np.int64)
                orig = np.concatenate(pdf["val_orig"].to_numpy())
                err = cur[vrows, vcols] + cm[vcols] - orig
                se += float((err * err).sum())
                n += len(vcols)
            yield pd.DataFrame({"se": [se], "n": [float(n)]})

        agg = state.select("cur", "val_idx", "val_orig").mapInPandas(
            rmse_part, "se double, n double"
        ).collect()
        se = sum(r["se"] for r in agg)
        nv = sum(r["n"] for r in agg)
        rmse = float(np.sqrt(se / nv)) if nv else np.inf
        if rmse < best_rmse:
            best_state, best_rmse, best_k = state, rmse, k
        else:
            break  # dineof stopping rule: CV error worsened

    if best_state is None:
        best_state = state

    # ---- final pass: uncenter, restore observed values bit-exactly, emit
    # long rows. Only truly-missing cells are gapfilled (validation cells
    # are observed -> original values pass through).
    src_arr = np.array(sources, dtype=object)

    def emit(batches):
        for pdf in batches:
            nb = len(pdf)
            if nb == 0:
                continue
            z = np.stack(pdf["cur"].to_numpy()) + cm
            missing = np.ones((nb, n_s), dtype=bool)
            lens = pdf["obs_idx"].map(len).to_numpy("int64")
            rows = np.repeat(np.arange(nb), lens)
            cols = (
                np.concatenate(pdf["obs_idx"].to_numpy())
                if nb and lens.sum()
                else np.array([], dtype=np.int64)
            ).astype(np.int64)
            vals = (
                np.concatenate(pdf["obs_val"].to_numpy())
                if nb and lens.sum()
                else np.array([])
            )
            z[rows, cols] = vals  # observed cells pass through bit-exactly
            missing[rows, cols] = False
            yield pd.DataFrame(
                {
                    key_col: np.tile(src_arr, nb),
                    bucket_col: np.repeat(pdf[bucket_col].to_numpy(), n_s),
                    value_col: z.ravel(),
                    "gapfilled": missing.ravel(),
                }
            )

    out = best_state.select(bucket_col, "cur", "obs_idx", "obs_val").mapInPandas(
        emit,
        f"{key_col} string, {bucket_col} timestamp, {value_col} double,"
        " gapfilled boolean",
    )
    return out


def dineof_gapfill(
    spark: SparkSession,
    tier_df: DataFrame,
    n_max: int = 10,
    value_col: str = "n_tok_mean",
    key_col: str = "source",
    bucket_col: str = "bucket_start",
    seed: int = 42,
    max_iter: int = 50,
    tol: float = 1e-6,
    val_frac: float = 0.05,
    force_distributed: bool = False,
    solver: str = "auto",
) -> DataFrame:
    """Fill missing (key, bucket) cells of a tier by iterative truncated-SVD
    reconstruction. Input: a tier rollup (sparse); output: dense rows
    (key, bucket, value, gapfilled) over the global bucket spine.

    Adaptive plan (see module docstring): dense driver iteration for small
    matrices, distributed per-bucket state above
    ``DINEOF_Z_DRIVER_LIMIT`` or when ``force_distributed=True``.
    ``solver`` must be ``"auto"``, ``"dense"`` or ``"iterative"`` (a typo
    would otherwise silently select the dense Gramian path and defeat the
    driver-RAM ceiling — validated up front like eof/gorilla_encode).
    It picks the distributed path's rank-k step (see
    :func:`_dineof_distributed`): ``"iterative"`` removes the per-inner-
    iteration n_s^2 Gramian collect — the past-driver-ceiling source
    cardinality path (r5)."""
    if solver not in ("auto", "dense", "iterative"):
        raise ValueError(
            f"solver must be auto/dense/iterative, got {solver!r}"
        )
    sources = source_index(tier_df, key_col)
    vecs = bucket_vectors(tier_df, sources, value_col, key_col, bucket_col)
    n_s = len(sources)
    n_t = vecs.count()
    if force_distributed or n_t * n_s > DINEOF_Z_DRIVER_LIMIT:
        vecs = vecs.persist()
        try:
            return _dineof_distributed(
                spark, vecs, sources, value_col, key_col, bucket_col,
                n_max, max_iter, tol, val_frac, seed, solver,
            )
        finally:
            vecs.unpersist()
    x, buckets = _collect_matrix(vecs, bucket_col, n_s)
    missing = np.isnan(x)
    if missing.all(axis=0).any():
        raise ValueError("DINEOF needs at least one observation per source")
    filled, _k, _rmse = _dineof_matrix(
        x, missing, n_max=n_max, max_iter=max_iter, tol=tol,
        val_frac=val_frac, seed=seed,
    )
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
