from __future__ import annotations

import numpy as np
import pytest

from rtsa_spark.functions.interp import monotone_cubic, natural_cubic_spline


def test_spline_passes_through_knots():
    x = np.array([0.0, 1, 2.5, 4, 7])
    y = np.array([1.0, 3, -2, 0.5, 4])
    got = natural_cubic_spline(x, y, x)
    np.testing.assert_allclose(got, y, atol=1e-9)


def test_spline_reproduces_smooth_function():
    x = np.linspace(0, 2 * np.pi, 20)
    y = np.sin(x)
    xf = np.linspace(0.2, 2 * np.pi - 0.2, 200)
    got = natural_cubic_spline(x, y, xf)
    assert np.abs(got - np.sin(xf)).max() < 0.01


def test_spline_linear_for_two_points():
    got = natural_cubic_spline(np.array([0.0, 10]), np.array([5.0, 15]), np.array([2.5]))
    assert got[0] == pytest.approx(7.5)


def test_monotone_cubic_no_overshoot():
    # step-like data: PCHIP must stay within [0, 10] (a natural spline won't)
    x = np.array([0.0, 1, 2, 3, 4, 5])
    y = np.array([0.0, 0, 0, 10, 10, 10])
    xf = np.linspace(0, 5, 500)
    got = monotone_cubic(x, y, xf)
    assert got.min() >= -1e-9 and got.max() <= 10 + 1e-9
    spl = natural_cubic_spline(x, y, xf)
    assert spl.min() < -0.1 or spl.max() > 10.1  # spline does overshoot here


def test_monotone_cubic_knots_and_monotonicity():
    x = np.array([0.0, 1, 3, 6])
    y = np.array([1.0, 2, 8, 9])
    xf = np.linspace(0, 6, 300)
    got = monotone_cubic(x, y, xf)
    np.testing.assert_allclose(monotone_cubic(x, y, x), y, atol=1e-9)
    assert (np.diff(got) >= -1e-9).all()  # monotone data -> monotone interp


def test_gapfill_interpolate_spark(spark, tiny_sequences):
    from rtsa_spark.operators.gapfill import bucket_spine, gapfill_interpolate
    from rtsa_spark.operators.rollup import rollup_next, rollup_raw
    from rtsa_spark.synth import knock_out_buckets

    gapped = knock_out_buckets(tiny_sequences, ["s001", "s002"], bucket="hour")
    hr = rollup_next(rollup_raw(gapped), "hourly").select(
        "source", "bucket_start", "n_tok_mean"
    )
    for method in ("spline", "stine"):
        dense = gapfill_interpolate(hr, "hourly", method=method, value_cols=["n_tok_mean"])
        assert dense.count() == bucket_spine(hr, "hourly").count()
        # observed rows pass through exactly
        j = dense.where("NOT gapfilled").alias("d").join(
            hr.alias("h"), ["source", "bucket_start"]
        )
        assert j.where("d.n_tok_mean != h.n_tok_mean").count() == 0
        assert dense.where("gapfilled").count() > 0
        assert dense.where("n_tok_mean IS NULL").count() == 0

    with pytest.raises(ValueError, match="unknown gap-fill method"):
        gapfill_interpolate(hr, "hourly", method="cubic-nope")


def test_gapfill_interpolate_rejects_misaligned_buckets(spark):
    """An observed bucket off the tier spine must raise loudly, not mark
    the wrong slot observed (ADVICE r1)."""
    import datetime as dt

    import pytest

    from rtsa_spark.operators.gapfill import gapfill_interpolate

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0), 1.0),
        ("a", dt.datetime(2024, 1, 1, 2, 30), 2.0),  # not hour-aligned
        ("a", dt.datetime(2024, 1, 1, 4, 0), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    with pytest.raises(Exception, match="not aligned"):
        gapfill_interpolate(df, "hourly", method="spline").collect()


def test_gapfill_interpolate_nonstring_keys(spark):
    """Key columns keep their input types (r1 hardcoded string keys)."""
    import datetime as dt

    from rtsa_spark.operators.gapfill import gapfill_interpolate

    rows = [
        (7, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (7, dt.datetime(2024, 1, 1, 2, 0), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "source bigint, bucket_start timestamp, n_tok_mean double"
    )
    out = gapfill_interpolate(df, "hourly", method="spline")
    assert dict(out.dtypes)["source"] == "bigint"
    got = {r["bucket_start"]: r["n_tok_mean"] for r in out.collect()}
    assert len(got) == 3


def test_stineman_passes_through_knots_and_lines():
    from rtsa_spark.functions.interp import stineman

    x = np.array([0.0, 1.0, 3.0, 4.0, 7.0])
    y = 2.0 + 0.5 * x
    out = stineman(x, y, np.linspace(0, 7, 29))
    assert np.allclose(out, 2.0 + 0.5 * np.linspace(0, 7, 29), atol=1e-12)
    # knots reproduced exactly for a non-linear shape too
    y2 = np.array([0.0, 1.0, 0.5, 2.0, -1.0])
    got = stineman(x, y2, x)
    assert np.allclose(got, y2, atol=1e-12)


def test_stineman_no_overshoot_on_monotone_data():
    """Stineman's defining property: well-behaved, no spline-style
    overshoot between knots of monotone data."""
    from rtsa_spark.functions.interp import natural_cubic_spline, stineman

    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([0.0, 0.0, 0.0, 5.0, 5.0, 5.0])  # step-ish
    xs = np.linspace(0, 5, 101)
    st = stineman(x, y, xs)
    assert st.min() >= -1e-9 and st.max() <= 5 + 1e-9
    # the cubic spline DOES overshoot here (what 'stine' users avoid)
    sp = natural_cubic_spline(x, y, xs)
    assert sp.min() < -1e-3 or sp.max() > 5 + 1e-3


def test_stineman_differs_from_pchip():
    """'stine' is its own curve now, not the PCHIP stand-in (r1 gap)."""
    from rtsa_spark.functions.interp import monotone_cubic, stineman

    x = np.array([0.0, 1.0, 2.0, 4.0, 5.0])
    y = np.array([0.0, 2.0, 1.5, 6.0, 6.5])
    xs = np.linspace(0, 5, 50)
    assert not np.allclose(stineman(x, y, xs), monotone_cubic(x, y, xs))


def test_gapfill_stine_roundtrip(spark):
    import datetime as dt

    from rtsa_spark.operators.gapfill import gapfill_interpolate

    rows = [
        ("a", dt.datetime(2024, 1, 1, h), float(v))
        for h, v in [(0, 1.0), (2, 5.0), (3, 4.0), (6, 10.0)]
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, n_tok_mean double"
    )
    out = gapfill_interpolate(df, "hourly", method="stine")
    got = {r["bucket_start"].hour: r for r in out.collect()}
    assert len(got) == 7
    for h, v in [(0, 1.0), (2, 5.0), (3, 4.0), (6, 10.0)]:
        assert got[h]["n_tok_mean"] == v and not got[h]["gapfilled"]
    assert got[1]["gapfilled"] and 1.0 <= got[1]["n_tok_mean"] <= 5.0
