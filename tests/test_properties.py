"""Hypothesis property tests for the pure-numpy kernels added in round 3
(no SparkSession needed — these run in milliseconds)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rtsa_spark.operators.eot import _ioa_scores, _ioa_scores_from_gramians


@given(
    st.integers(2, 10), st.integers(3, 40), st.integers(0, 2**32 - 1),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ioa_gramian_equals_dense(n_s, n_t, seed, zero_col):
    """The distributed ioa scorer's (G, |resid|-Gramian) expansion equals
    the dense Willmott computation for any residual field, including a
    degenerate all-zero column."""
    rng = np.random.default_rng(seed)
    resid = rng.normal(scale=rng.uniform(0.1, 10.0), size=(n_t, n_s))
    if zero_col:
        resid[:, rng.integers(0, n_s)] = 0.0
    g = resid.T @ resid
    a = np.abs(resid).T @ np.abs(resid)
    dense = _ioa_scores(resid)
    from_gram = _ioa_scores_from_gramians(g, a)
    assert np.allclose(dense, from_gram, rtol=1e-8, atol=1e-8)


@given(st.integers(1, 200), st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_val_hash_mask_deterministic_and_bounded(n_rows, seed):
    """The DINEOF validation-cell selector is pure: identical across
    calls, respects the frac bound statistically, and frac=0 selects
    nothing."""
    from rtsa_spark.operators.dineof import _val_hash_mask

    bsec = (np.arange(n_rows, dtype=np.int64) * 86400) + 1_700_000_000
    m1 = _val_hash_mask(bsec, 16, 0.25, seed)
    m2 = _val_hash_mask(bsec, 16, 0.25, seed)
    assert np.array_equal(m1, m2)
    assert m1.shape == (n_rows, 16)
    assert not _val_hash_mask(bsec, 16, 0.0, seed).any()
    # loose statistical bound: expected 25% +- wide slack
    frac = m1.mean()
    assert 0.02 < frac < 0.6 or n_rows * 16 < 64


@given(st.lists(st.integers(-1000, 1000), min_size=14, max_size=60))
@settings(max_examples=30, deadline=None)
def test_component_twin_additive_identity(xs):
    """Exact-int component decomposition: the quantized components
    reconstruct x to within the 3-way floor-rounding slack for ANY
    integer series (period 7)."""
    import pandas as pd

    from rtsa_spark.operators.components import (
        decompose_components_deterministic,
    )

    # run the kernel body directly through the pandas path used by Spark
    kernel_holder = {}

    class FakeGrouped:
        def applyInPandas(self, fn, schema):
            kernel_holder["fn"] = fn
            return None

    class FakeDF:
        def groupBy(self, *_):
            return FakeGrouped()

    decompose_components_deterministic(FakeDF(), "daily", value_col="x", period=7)
    fn = kernel_holder["fn"]
    n = len(xs)
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "bucket_start": pd.date_range("2024-01-01", periods=n, freq="D"),
            "x": np.asarray(xs, dtype=np.int64),
        }
    )
    out = fn(pdf)
    recon = (
        out["seasonal_e4"].to_numpy()
        + out["trend_e4"].to_numpy()
        + out["remainder_e4"].to_numpy()
    )
    # each *_e4 is floor(1e4 * component): the sum may undershoot the
    # exact 1e4*x by at most 3 (one unit per floor), never overshoot
    diff = 10_000 * out["x"].to_numpy() - recon
    assert (diff >= 0).all() and (diff <= 3).all()


@settings(max_examples=40, deadline=None)
@given(
    half=st.integers(min_value=2, max_value=11),
    q=st.integers(min_value=0, max_value=11),
    r_ic=st.floats(min_value=0.5, max_value=8.0),
)
def test_musgrave_invariants(half, q, r_ic):
    """For ANY odd symmetric filter and I/C ratio: Musgrave end weights
    sum to 1 (constant reproduction), collapse to the symmetric filter at
    q=H, and the production Henderson filter reproduces constants exactly
    through the ends."""
    from rtsa_spark.functions.x11 import (
        _henderson_filter,
        henderson_weights,
        musgrave_table,
        musgrave_weights,
    )

    q = min(q, half)
    w = henderson_weights(2 * half + 1)
    u = musgrave_weights(w, q, r_ic)
    assert len(u) == half + q + 1
    assert abs(u.sum() - 1.0) < 1e-12
    if q == half:
        assert np.array_equal(u, w)
    n = 3 * (2 * half + 1)
    const = np.full(n, 3.75)
    out = _henderson_filter(const, w, musgrave_table(w, r_ic))
    assert np.allclose(out, 3.75, atol=1e-10)
