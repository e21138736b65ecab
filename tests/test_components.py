"""Component-series table (STDstack bricks) — additive identity, stats
tie to compute_metrics, and the deterministic twin's quantization bound.

Reference contract: ``only.statistics=FALSE`` returns the full component
series per cell (``/root/reference/R/rtsa.stl.R:378-382,441-489``)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from rtsa_spark.operators.components import (
    decompose_components,
    decompose_components_deterministic,
)
from rtsa_spark.operators.metrics import compute_metrics
from rtsa_spark.operators.rollup import rollup_ladder


def _daily(tiny_sequences):
    return rollup_ladder(tiny_sequences)["daily"]


def test_additive_identity_and_metrics_tie(spark, tiny_sequences):
    daily = _daily(tiny_sequences)
    comps = decompose_components(
        daily, "daily", value_col="n_tok_mean", period=7
    ).toPandas()
    assert len(comps) == daily.count()
    assert np.allclose(
        comps["value"],
        comps["seasonal"] + comps["trend"] + comps["remainder"],
        atol=1e-9,
    )
    m = (
        compute_metrics(daily, "daily", value_col="n_tok_mean", period=7)
        .toPandas()
        .set_index("source")
    )
    for src, g in comps.groupby("source"):
        g = g.sort_values("bucket_start")
        amp = float(g["seasonal"].max() - g["seasonal"].min())
        assert abs(amp - m.loc[src, "seasonal_amplitude"]) < 1e-9
        t = g["bucket_start"].to_numpy("datetime64[ns]").view("int64") / 1e9
        slope = float(
            (g["trend"].iloc[-1] - g["trend"].iloc[0]) / (t[-1] - t[0])
        )
        assert abs(slope - m.loc[src, "trend_slope"]) < 1e-15
        rstd = float(np.std(g["remainder"].to_numpy(), ddof=1))
        assert abs(rstd - m.loc[src, "remainder_stdev"]) < 1e-9


def test_deterministic_twin_matches_float_path(spark, tiny_sequences):
    daily = _daily(tiny_sequences).select(
        "source", "bucket_start", F.col("n_tok_sum").cast("long").alias("x")
    )
    det = decompose_components_deterministic(
        daily, "daily", value_col="x", period=7
    ).toPandas()
    flt = decompose_components(
        daily.withColumn("x", F.col("x").cast("double")),
        "daily", value_col="x", period=7,
    ).toPandas()
    j = det.merge(flt, on=["source", "bucket_start"])
    assert len(j) == len(det) > 0
    # e4 quantization: floor(1e4*component) within 1 ulp-step of the float path
    for det_c, flt_c in (
        ("seasonal_e4", "seasonal"),
        ("trend_e4", "trend"),
        ("remainder_e4", "remainder"),
    ):
        diff = j[det_c].to_numpy("int64") - np.floor(
            10_000.0 * j[flt_c].to_numpy()
        ).astype("int64")
        assert int(np.abs(diff).max()) <= 1, det_c


def _tdiv(v: int, d: int) -> int:
    """Truncation-toward-zero division (Spark `div` / DuckDB `//`)."""
    return -((-v) // d) if v < 0 else v // d


def test_component_strength_matches_replay(spark, tiny_sequences):
    """Independent replay of the Wang-Smith-Hyndman strength definition
    over the quantized components, in plain Python ints + IEEE doubles."""
    import math

    from rtsa_spark.operators.components import component_strength

    daily = _daily(tiny_sequences)
    comp = decompose_components_deterministic(
        daily, "daily", value_col="n_tok_sum", period=7
    )
    pdf = comp.toPandas()
    got = {r["source"]: r for r in component_strength(comp).collect()}
    assert set(got) == set(pdf["source"].unique())
    for src, g in pdf.groupby("source"):
        r0 = [_tdiv(int(v), 10_000) for v in g["remainder_e4"]]
        d0 = [
            _tdiv(int(s) + int(r), 10_000)
            for s, r in zip(g["seasonal_e4"], g["remainder_e4"])
        ]
        t0 = [
            _tdiv(int(t) + int(r), 10_000)
            for t, r in zip(g["trend_e4"], g["remainder_e4"])
        ]

        def varnum(xs):
            n = len(xs)
            return n * sum(x * x for x in xs) - sum(xs) ** 2

        def strength(vc):
            if vc <= 0:
                return None
            return math.floor(
                1000000.0 * max(0.0, 1.0 - float(varnum(r0)) / float(vc))
            )

        row = got[src]
        assert row["n"] == len(r0)
        assert row["f_trend_e6"] == strength(varnum(t0)), src
        assert row["f_seasonal_e6"] == strength(varnum(d0)), src


def test_component_strength_regimes(spark):
    """Planted regimes: a pure period-7 pattern is all seasonal strength;
    a constant series has no defined strength (NULL, not zero)."""
    import datetime as dt

    from rtsa_spark.operators.components import component_strength

    base = dt.datetime(2024, 1, 1)
    season = [0, 300, 600, 900, 600, 300, 0]
    rows = []
    for d in range(35):
        rows.append(("seasonal", base + dt.timedelta(days=d), 1000 + season[d % 7]))
        rows.append(("flat", base + dt.timedelta(days=d), 5000))
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )
    comp = decompose_components_deterministic(df, "daily", value_col="x", period=7)
    got = {r["source"]: r for r in component_strength(comp).collect()}
    s = got["seasonal"]
    assert s["f_seasonal_e6"] >= 990_000
    # detrended variance dwarfs the remainder; trend+remainder is nearly
    # flat so the trend strength clamps low
    assert s["f_trend_e6"] is not None
    flat = got["flat"]
    assert flat["f_seasonal_e6"] is None and flat["f_trend_e6"] is None


def test_degenerate_short_series(spark):
    rows = [("a", f"2024-01-{d:02d} 00:00:00", 10 + d) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "source string, b string, x long").select(
        "source", F.to_timestamp("b").alias("bucket_start"), "x"
    )
    det = decompose_components_deterministic(
        df, "daily", value_col="x", period=7
    ).toPandas()
    assert (det["seasonal_e4"] == 0).all()
    assert (det["remainder_e4"] == 0).all()
    assert (det["trend_e4"] == 10_000 * det["x"]).all()


def test_remainder_outliers_flags_spike_not_season(spark):
    """Seasonal-ESD composition: on a strong period-7 series with one
    planted spike, k-sigma on the DESEASONALIZED remainder flags exactly
    the spiked bucket, while the same rule on the raw series flags the
    seasonal peaks too (or misses the spike) — the reason to decompose
    first."""
    import datetime as dt

    from rtsa_spark.operators.anomaly import zscore_outliers

    base = dt.datetime(2024, 1, 1)
    season = [0, 3000, 6000, 9000, 6000, 3000, 0]
    spike_day = 21  # mid-series, at a seasonal trough phase (21 % 7 == 0)
    rows = [
        (
            "s",
            base + dt.timedelta(days=d),
            10_000 + season[d % 7] + (8_000 if d == spike_day else 0),
        )
        for d in range(42)
    ]
    df = spark.createDataFrame(
        rows, "source string, bucket_start timestamp, x long"
    )
    comp = decompose_components_deterministic(df, "daily", value_col="x", period=7)
    rem = comp.select(
        "source", "bucket_start", F.expr("remainder_e4 div 10000").alias("r0")
    )
    out = zscore_outliers(rem, "source", "bucket_start", "r0").toPandas()
    flagged = {x.to_pydatetime() for x in out[out["is_outlier"]]["t"]}
    spike_ts = base + dt.timedelta(days=spike_day)
    assert spike_ts in flagged
    # decomposition absorbs the seasonal swing: nothing BUT the spike's
    # neighborhood is flagged (reflect-padded MA smears the spike into at
    # most the adjacent window, never onto seasonal peaks)
    peak_ts = {base + dt.timedelta(days=d) for d in range(42) if d % 7 == 3}
    assert not (flagged & peak_ts)
    # control: raw k-sigma cannot isolate the spike from the seasonal swing
    raw = zscore_outliers(df, "source", "bucket_start", "x").toPandas()
    raw_flagged = {x.to_pydatetime() for x in raw[raw["is_outlier"]]["t"]}
    assert raw_flagged != flagged
