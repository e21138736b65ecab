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
