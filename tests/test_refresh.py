from __future__ import annotations

import pyspark.sql.functions as F

from rtsa_spark.pipeline import TierPipeline


def _tier_hash(spark, path):
    df = spark.read.parquet(path)
    return df.select(
        F.bit_xor(F.xxhash64(*sorted(df.columns))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def test_refresh_months_matches_full_recompute(spark, tiny_sequences, tmp_path):
    """Late data lands in 2024-02; refresh_months must produce tier tables
    identical to a from-scratch run over the corrected input, touching only
    the affected month's rows."""
    base = str(tmp_path / "tiers")
    p = TierPipeline(spark, base, gapfill_tiers=(), metrics_tiers=())
    p.run(tiny_sequences)

    # "late" replayed data: double every 2024-02 row's n_tok
    feb = F.date_format(F.col("ts"), "yyyy-MM") == "2024-02"
    corrected = tiny_sequences.withColumn(
        "n_tok", F.when(feb, F.col("n_tok") * 2).otherwise(F.col("n_tok"))
    )

    replaced = p.refresh_months(corrected, ["2024-02"])
    assert replaced["rollup_raw"] > 0

    # ground truth: full recompute on the corrected table
    truth_base = str(tmp_path / "truth")
    TierPipeline(spark, truth_base, gapfill_tiers=(), metrics_tiers=()).run(corrected)

    for tier in ("raw", "hourly", "daily", "monthly"):
        got = _tier_hash(spark, f"{base}/rollup_{tier}")
        want = _tier_hash(spark, f"{truth_base}/rollup_{tier}")
        assert got == want, tier

    # idempotence: refreshing again changes nothing
    before = {t: _tier_hash(spark, f"{base}/rollup_{t}") for t in ("raw", "monthly")}
    p.refresh_months(corrected, ["2024-02"])
    after = {t: _tier_hash(spark, f"{base}/rollup_{t}") for t in ("raw", "monthly")}
    assert before == after

    # untouched months really were untouched (January rows identical)
    jan_got = (
        spark.read.parquet(f"{base}/rollup_monthly")
        .where("date_format(bucket_start, 'yyyy-MM') = '2024-01'")
    )
    jan_want = (
        spark.read.parquet(f"{truth_base}/rollup_monthly")
        .where("date_format(bucket_start, 'yyyy-MM') = '2024-01'")
    )
    assert jan_got.exceptAll(jan_want).count() == 0

    # lineage records the refresh
    statuses = {r["status"] for r in p._ledger()}
    assert "REFRESH" in statuses
