from __future__ import annotations

from rtsa_spark.pipeline import TierPipeline
from rtsa_spark.operators.rollup import token_histogram


def test_pipeline_hist_stages_cascade_exact(spark, tiny_sequences, tmp_path):
    base = str(tmp_path / "h")
    p = TierPipeline(
        spark,
        base,
        gapfill_tiers=(),
        metrics_tiers=(),
        hist_tiers=("daily", "monthly"),
        hist_top_k=None,  # exact maps -> cascade must equal direct
    )
    out = p.run(tiny_sequences)
    assert "hist_daily" in out and "hist_monthly" in out

    got = {
        (r["source"], r["bucket_start"]): dict(r["tok_hist"])
        for r in spark.read.parquet(out["hist_monthly"]).collect()
    }
    want = {
        (r["source"], r["bucket_start"]): dict(r["tok_hist"])
        for r in token_histogram(tiny_sequences, "monthly").collect()
    }
    assert got == want  # monthly-from-daily merge == monthly-from-raw

    # resume: re-run is a no-op for hist stages too
    n = len(p._ledger())
    p.run(tiny_sequences)
    assert len(p._ledger()) == n


def test_pipeline_hist_topk_bounded(spark, tiny_sequences, tmp_path):
    p = TierPipeline(
        spark,
        str(tmp_path / "hk"),
        gapfill_tiers=(),
        metrics_tiers=(),
        hist_tiers=("monthly",),
        hist_top_k=5,
    )
    out = p.run(tiny_sequences)
    rows = spark.read.parquet(out["hist_monthly"]).collect()
    assert rows and all(len(r["tok_hist"]) <= 5 for r in rows)
