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
