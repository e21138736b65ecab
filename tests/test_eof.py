from __future__ import annotations

import datetime as dt

import numpy as np
import pytest


def _tier_from_matrix(spark, mat, sources):
    rows = []
    for i in range(mat.shape[0]):
        b = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        for j, s in enumerate(sources):
            rows.append((s, b, float(mat[i, j])))
    return spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )


def test_eof_recovers_dominant_mode(spark):
    from rtsa_spark.operators.eof import eof

    rng = np.random.default_rng(4)
    n_t, n_s = 100, 6
    pattern = np.array([1.0, 0.8, 0.6, -0.4, -0.7, -1.0])
    signal = np.sin(np.linspace(0, 8 * np.pi, n_t))
    mat = np.outer(signal, pattern) + rng.normal(0, 0.05, (n_t, n_s))
    sources = [f"s{j}" for j in range(n_s)]

    out = eof(spark, _tier_from_matrix(spark, mat, sources), n_modes=2)
    assert out["explained_pct"][0] > 80
    m1 = {
        r["source"]: r["loading"]
        for r in out["modes"].where("mode = 1").collect()
    }
    loadings = np.array([m1[s] for s in sources])
    cos = abs(loadings @ pattern) / (
        np.linalg.norm(loadings) * np.linalg.norm(pattern)
    )
    assert cos > 0.99  # mode 1 == injected spatial pattern (up to sign)
    # EC series carries the temporal signal
    ecs = out["ecs"].where("mode = 1").orderBy("bucket_start").collect()
    ec = np.array([r["ec"] for r in ecs])
    corr = abs(np.corrcoef(ec, signal)[0, 1])
    assert corr > 0.99
    # additivity of variance
    assert out["tot_var"] == pytest.approx(
        float(np.var(mat - mat.mean(0), ddof=1, axis=0).sum()), rel=1e-6
    )


def test_eof_iterative_solver_matches_dense(spark):
    """The matvec subspace-iteration solver (r5: the past-driver-ceiling
    path, O(n_s * block) state) agrees with the dense Gramian+eigh path:
    same eigenvalues, same total variance, same mode loadings and EC
    series under the shared sign convention."""
    from rtsa_spark.operators.eof import eof

    rng = np.random.default_rng(9)
    n_t, n_s = 80, 12
    # three planted modes with well-separated strengths + noise floor
    t = np.linspace(0, 6 * np.pi, n_t)
    mat = (
        3.0 * np.outer(np.sin(t), rng.normal(size=n_s))
        + 1.5 * np.outer(np.cos(2 * t), rng.normal(size=n_s))
        + 0.7 * np.outer(np.sin(3 * t + 1), rng.normal(size=n_s))
        + rng.normal(0, 0.05, (n_t, n_s))
    )
    sources = [f"s{j:02d}" for j in range(n_s)]
    df = _tier_from_matrix(spark, mat, sources)
    dense = eof(spark, df, n_modes=3, solver="dense")
    it = eof(spark, df, n_modes=3, solver="iterative")
    assert it["tot_var"] == pytest.approx(dense["tot_var"], rel=1e-9)
    assert np.allclose(it["lambda"], dense["lambda"], rtol=1e-7)
    assert np.allclose(it["explained_pct"], dense["explained_pct"], rtol=1e-7)

    def grab(out, frame, key, val):
        return {
            (r[key], r["mode"]): r[val] for r in out[frame].collect()
        }

    md, mi = grab(dense, "modes", "source", "loading"), grab(
        it, "modes", "source", "loading"
    )
    assert set(md) == set(mi)
    for k in md:
        assert mi[k] == pytest.approx(md[k], abs=1e-6), k
    ed, ei = grab(dense, "ecs", "bucket_start", "ec"), grab(
        it, "ecs", "bucket_start", "ec"
    )
    for k in ed:
        assert ei[k] == pytest.approx(ed[k], abs=1e-5), k

    with pytest.raises(ValueError, match="solver"):
        eof(spark, df, n_modes=2, solver="bogus")


def test_eof_iterative_max_iter_exhaustion_returns_ritz_basis(spark):
    """Regression (r5 review): with ``tol=0`` the loop NEVER breaks and
    exits via max_iter exhaustion right after the trailing qr update.
    The returned loadings must still be Ritz vectors (sv applied in the
    basis it was computed in) — the pre-fix code paired the rotated q
    with the previous basis's sv there, returning an arbitrary
    orthonormal frame whose 'modes' matched nothing."""
    from rtsa_spark.operators.eof import (
        _leading_modes_iterative,
        bucket_vectors,
        eof,
        require_complete,
        source_index,
    )

    rng = np.random.default_rng(5)
    n_t, n_s = 60, 10
    t = np.linspace(0, 4 * np.pi, n_t)
    mat = (
        2.5 * np.outer(np.sin(t), rng.normal(size=n_s))
        + 1.0 * np.outer(np.cos(2 * t), rng.normal(size=n_s))
        + rng.normal(0, 0.05, (n_t, n_s))
    )
    sources = [f"s{j:02d}" for j in range(n_s)]
    df = _tier_from_matrix(spark, mat, sources)
    dense = eof(spark, df, n_modes=2, solver="dense")

    srcs = source_index(df)
    center = mat.mean(axis=0)
    vecs = require_complete(bucket_vectors(df, srcs)).persist()
    v, lam, tot_var, n_t_got = _leading_modes_iterative(
        vecs, n_s, center, np.ones(n_s), 2, max_iter=40, tol=0.0
    )
    assert n_t_got == n_t
    # orthonormal Ritz block, eigenvalues matching the dense spectrum
    assert np.allclose(v.T @ v, np.eye(2), atol=1e-8)
    assert np.allclose(lam, dense["lambda"], rtol=1e-6)
    # loadings span the dense top-2 subspace (sign/rotation-free check:
    # projector equality) — the pre-fix arbitrary frame fails this
    vd = np.array(
        [
            [
                {(r["source"], r["mode"]): r["loading"] for r in
                 dense["modes"].collect()}[(s, m)]
                for m in (1, 2)
            ]
            for s in sources
        ]
    )
    assert np.allclose(v @ v.T, vd @ vd.T, atol=1e-5)


def test_eof_rejects_gappy_input(spark):
    from rtsa_spark.operators.eof import eof

    rng = np.random.default_rng(1)
    mat = rng.normal(size=(10, 3))
    df = _tier_from_matrix(spark, mat, ["a", "b", "c"])
    gappy = df.where("NOT (source = 'b' AND bucket_start = timestamp '2024-01-03')")
    with pytest.raises(ValueError, match="complete profiles"):
        eof(spark, gappy)


def test_scale_eof_clips_to_unit(spark):
    from rtsa_spark.operators.eof import eof, scale_eof_modes

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(60, 8))
    out = eof(spark, _tier_from_matrix(spark, mat, [f"s{j}" for j in range(8)]), n_modes=2)
    scaled = scale_eof_modes(out["modes"], cut_pct=5.0).collect()
    vals = [r["loading_scaled"] for r in scaled]
    assert max(vals) <= 1.0 + 1e-9 and min(vals) >= -1.0 - 1e-9
    assert any(v == 1.0 for v in vals) and any(v == -1.0 for v in vals)


def test_gramian_distributed_path_matches_driver_path(spark):
    """The chunked distributed Gramian (the 100-TB path) and the
    collect-Z driver shortcut must agree to float precision."""
    from rtsa_spark.operators.eof import (
        bucket_vectors,
        gramian,
        require_complete,
        source_index,
    )

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(30, 12))
    tier = _tier_from_matrix(spark, mat, [f"s{j:02d}" for j in range(12)])
    sources = source_index(tier)
    vecs = require_complete(bucket_vectors(tier, sources)).persist()
    g1, n1 = gramian(vecs, 12)
    g2, n2 = gramian(vecs, 12, force_distributed=True)
    assert n1 == n2 == 30
    assert float(np.abs(g1 - g2).max()) < 1e-9
    assert np.allclose(g1, mat.T @ mat)


def test_require_complete_rejects_duplicates(spark):
    """Duplicate (bucket, source) rows must be rejected, not silently
    collapse against missing cells (n_miss != 0 check)."""
    import datetime as dt

    from rtsa_spark.operators.eof import eof

    rows = [
        ("a", dt.datetime(2024, 1, 1), 1.0),
        ("a", dt.datetime(2024, 1, 1), 2.0),  # duplicate cell
        ("c", dt.datetime(2024, 1, 1), 3.0),  # b missing in this bucket
        ("a", dt.datetime(2024, 1, 2), 1.0),
        ("b", dt.datetime(2024, 1, 2), 2.0),
        ("c", dt.datetime(2024, 1, 2), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    with pytest.raises(ValueError, match="complete profiles"):
        eof(spark, df)


def test_eof_recursive_matches_simultaneous_on_complete_data(spark):
    """sinkr eof(recursive=TRUE) parity (R/rtsa.eof.R:246): on complete
    input the pairwise covariance IS the Gramian and one-at-a-time
    deflation extracts the same eigenpairs as the simultaneous eigh."""
    from rtsa_spark.operators.eof import eof

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)) + np.outer(
        np.sin(np.linspace(0, 6 * np.pi, 60)), rng.normal(size=8) * 3
    )
    tier = _tier_from_matrix(spark, mat, [f"s{j}" for j in range(8)])
    sim = eof(spark, tier, n_modes=3)
    rec = eof(spark, tier, n_modes=3, recursive=True)

    assert np.allclose(rec["lambda"], sim["lambda"], rtol=1e-8)
    assert rec["tot_var"] == pytest.approx(sim["tot_var"], rel=1e-10)
    for out in (sim, rec):
        out["_m"] = {
            (r["source"], r["mode"]): r["loading"]
            for r in out["modes"].collect()
        }
    for k, v_sim in sim["_m"].items():
        assert rec["_m"][k] == pytest.approx(v_sim, abs=1e-8)
    ec_sim = {
        (r["bucket_start"], r["mode"]): r["ec"] for r in sim["ecs"].collect()
    }
    for r in rec["ecs"].collect():
        assert r["ec"] == pytest.approx(
            ec_sim[(r["bucket_start"], r["mode"])], abs=1e-7
        )


def test_eof_recursive_tolerates_gappy_input(spark):
    """The recursive path accepts missing cells (the simultaneous path
    raises) and still recovers the dominant injected pattern through 10%
    missingness via the pairwise-scaled covariance."""
    from rtsa_spark.operators.eof import eof

    rng = np.random.default_rng(11)
    n_t, n_s = 120, 6
    pattern = np.array([1.0, 0.7, 0.4, -0.3, -0.8, -1.1])
    signal = np.sin(np.linspace(0, 10 * np.pi, n_t))
    mat = np.outer(signal, pattern) + rng.normal(0, 0.05, (n_t, n_s))
    sources = [f"s{j}" for j in range(n_s)]
    tier = _tier_from_matrix(spark, mat, sources)
    # knock out ~10% of cells (but keep every source/bucket represented)
    gappy = tier.where(
        "pmod(hash(source, bucket_start), 10) != 3 OR source = 's0'"
    )
    assert gappy.count() < n_t * n_s

    out = eof(spark, gappy, n_modes=2, recursive=True)
    m1 = {
        r["source"]: r["loading"]
        for r in out["modes"].where("mode = 1").collect()
    }
    loadings = np.array([m1[s] for s in sources])
    cos = abs(loadings @ pattern) / (
        np.linalg.norm(loadings) * np.linalg.norm(pattern)
    )
    assert cos > 0.98
    assert out["explained_pct"][0] > 70
    # EC series still tracks the temporal signal
    ecs = out["ecs"].where("mode = 1").orderBy("bucket_start").collect()
    ec = np.array([r["ec"] for r in ecs])
    assert abs(np.corrcoef(ec, signal)[0, 1]) > 0.97


def test_eof_recursive_rejects_duplicates(spark):
    import datetime as dt

    from rtsa_spark.operators.eof import eof

    rows = [
        ("a", dt.datetime(2024, 1, 1), 1.0),
        ("a", dt.datetime(2024, 1, 1), 2.0),  # duplicate cell
        ("b", dt.datetime(2024, 1, 2), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        eof(spark, df, recursive=True)


def test_gappy_gramian_distributed_matches_driver(spark):
    """The distributed gappy Gramian (chunked two-family merge) must agree
    with the driver shortcut, including pair counts and deflation."""
    from rtsa_spark.operators.eof import (
        bucket_vectors,
        gappy_gramian,
        source_index,
    )

    rng = np.random.default_rng(5)
    n_t, n_s = 40, 9
    mat = rng.normal(size=(n_t, n_s))
    mat[rng.random((n_t, n_s)) < 0.15] = np.nan
    sources = [f"s{j}" for j in range(n_s)]
    rows = [
        (
            sources[j],
            dt.datetime(2024, 1, 1) + dt.timedelta(days=i),
            float(mat[i, j]),
        )
        for i in range(n_t)
        for j in range(n_s)
        if not np.isnan(mat[i, j])
    ]
    tier = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    vecs = bucket_vectors(tier, source_index(tier)).persist()
    u = rng.normal(size=n_s)
    u /= np.linalg.norm(u)
    c, s = np.zeros(n_s), np.ones(n_s)
    g1, p1, n1 = gappy_gramian(vecs, n_s, c, s, u[None, :], want_pairs=True)
    g2, p2, n2 = gappy_gramian(
        vecs, n_s, c, s, u[None, :], want_pairs=True, force_distributed=True
    )
    assert n1 == n2 == n_t
    assert float(np.abs(g1 - g2).max()) < 1e-9
    assert np.array_equal(p1, p2)
    # pair counts match the mask algebra
    obs = (~np.isnan(mat)).astype(float)
    assert np.array_equal(p1, obs.T @ obs)


def test_scale_eof_custom_key_col(spark):
    from rtsa_spark.operators.eof import eof, scale_eof_modes

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(40, 5))
    tier = _tier_from_matrix(spark, mat, [f"s{j}" for j in range(5)]).withColumnRenamed(
        "source", "model"
    )
    out = eof(spark, tier, n_modes=2, key_col="model")
    scaled = scale_eof_modes(out["modes"], cut_pct=5.0)
    assert "model" in scaled.columns and scaled.count() == 10
