from __future__ import annotations

import os

import pytest

from rtsa_spark.pipeline import TierPipeline
from rtsa_spark.plans.skew import dominant_keys, rollup_raw_salted
from rtsa_spark.operators.rollup import rollup_raw


def _hashes(spark, path):
    import pyspark.sql.functions as F

    df = spark.read.parquet(path)
    return df.select(
        F.bit_xor(F.xxhash64(*sorted(df.columns))).alias("h"), F.count(F.lit(1)).alias("n")
    ).first()


def test_pipeline_end_to_end_and_resume(spark, tiny_sequences, tmp_path):
    full_dir = str(tmp_path / "full")
    out = TierPipeline(spark, full_dir).run(tiny_sequences)
    assert set(out) >= {
        "rollup_raw", "rollup_hourly", "rollup_daily", "rollup_monthly",
        "gapfilled_hourly", "gapfilled_daily", "metrics_daily",
    }

    # kill after hourly rollup, then resume: identical final tables
    resume_dir = str(tmp_path / "resume")
    p1 = TierPipeline(spark, resume_dir)
    with pytest.raises(RuntimeError, match="injected failure"):
        p1.run(tiny_sequences, fail_after="rollup_hourly")
    assert not os.path.exists(os.path.join(resume_dir, "rollup_monthly"))
    p2 = TierPipeline(spark, resume_dir)
    out2 = p2.run(tiny_sequences)
    for stage in out:
        assert _hashes(spark, out[stage]) == _hashes(spark, out2[stage]), stage

    # resumed run reused the pre-crash tiers (no duplicate SUCCESS rows)
    ledger = p2._ledger()
    raw_rows = [r for r in ledger if r["stage"] == "rollup_raw" and r["status"] == "SUCCESS"]
    assert len(raw_rows) == 1

    # second full re-run is a complete no-op
    before = len(p2._ledger())
    p2.run(tiny_sequences)
    assert len(p2._ledger()) == before


def test_lineage_table(spark, tiny_sequences, tmp_path):
    d = str(tmp_path / "lin")
    p = TierPipeline(spark, d, metrics_tiers=())
    p.run(tiny_sequences)
    lin = p.lineage()
    rows = {r["stage"]: r for r in lin.collect()}
    assert rows["rollup_raw"]["rows_in"] == tiny_sequences.count()
    assert all(r["status"] == "SUCCESS" for r in rows.values())
    # cascade row counts are monotone non-increasing up the ladder
    assert rows["rollup_hourly"]["rows_out"] <= rows["rollup_raw"]["rows_out"]
    assert rows["rollup_monthly"]["rows_out"] <= rows["rollup_daily"]["rows_out"]


def test_partition_lineage_manifest(spark, tiny_sequences, tmp_path):
    """Every published stage gets per-month manifest rows whose row/file
    counts reconcile with the stage ledger and the bytes on disk."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "plin")
    p = TierPipeline(spark, d, metrics_tiers=())
    p.run(tiny_sequences)
    stage_rows = {r["stage"]: r for r in p._ledger()}
    parts = [r.asDict() for r in p.partition_lineage().collect()]
    by_stage: dict[str, list[dict]] = {}
    for r in parts:
        by_stage.setdefault(r["stage"], []).append(r)

    months = {
        r["m"]
        for r in tiny_sequences.select(
            F.date_format("ts", "yyyy-MM").alias("m")
        ).distinct().collect()
    }
    for stage, prs in by_stage.items():
        # partition grain: one row per month dir, all carrying real sizes
        assert {r["p_month"] for r in prs} == months, stage
        assert sum(r["rows"] for r in prs) == stage_rows[stage]["rows_out"], stage
        assert sum(r["n_files"] for r in prs) == stage_rows[stage]["n_files"], stage
        assert all(r["bytes"] > 0 and r["n_files"] >= 1 for r in prs), stage
    assert set(by_stage) == set(stage_rows)  # every stage has manifest rows


def test_partition_lineage_refresh_scoped(spark, tiny_sequences, tmp_path):
    """refresh_months appends REFRESH manifest rows ONLY for the refreshed
    months of the partition-swapped tiers (derived stages are fully
    rewritten and log SUCCESS rows)."""
    import pyspark.sql.functions as F

    import json

    d = str(tmp_path / "plref")
    p = TierPipeline(spark, d, gapfill_tiers=(), metrics_tiers=())
    p.run(tiny_sequences)

    def _rows():
        with open(p._partition_ledger_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    n_before = len(_rows())
    month = tiny_sequences.select(
        F.date_format("ts", "yyyy-MM").alias("m")
    ).agg(F.min("m")).first()[0]
    p.refresh_months(tiny_sequences, [month])
    fresh = _rows()[n_before:]
    refresh_rows = [r for r in fresh if r["status"] == "REFRESH"]
    assert refresh_rows and all(r["p_month"] == month for r in refresh_rows)
    assert {r["stage"] for r in refresh_rows} == {
        f"rollup_{t}" for t in p.tiers
    }


def test_salted_rollup_equals_plain(spark, tiny_sequences):
    import pyspark.sql.functions as F

    plain = rollup_raw(tiny_sequences)
    salted = rollup_raw_salted(tiny_sequences, n_salt=8)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_dominant_keys_finds_skewed_source(spark, tiny_sequences):
    keys = dominant_keys(tiny_sequences, sample_fraction=0.5)
    assert "s000" in keys  # synth gives s000 ~30% of rows


def test_encoded_stage_publish_resume_refresh(spark, tiny_sequences, tmp_path):
    """Opt-in encoded-block stage: published month-partitioned, decodes
    back to the tier bit-exactly, resumes like any stage, and refreshes
    partition-scoped (only the affected months' blocks are re-encoded)."""
    import hashlib
    import os

    import pyspark.sql.functions as F

    from rtsa_spark.operators.encode import decode_blocks

    def _file_digests(root):
        return {
            os.path.relpath(os.path.join(dp, f), root): hashlib.md5(
                open(os.path.join(dp, f), "rb").read()
            ).hexdigest()
            for dp, _dirs, files in os.walk(root)
            for f in files
            if f.endswith(".parquet")
        }

    base = str(tmp_path / "tiers")
    kw = dict(
        tiers=["raw", "hourly"], gapfill_tiers=(), metrics_tiers=(),
        encode_tiers=("hourly",),
    )
    p = TierPipeline(spark, base, **kw)
    out = p.run(tiny_sequences)
    assert "encoded_hourly" in out
    assert any(
        d.startswith("p_month=") for d in os.listdir(out["encoded_hourly"])
    )
    # decoded content == the published hourly tier (exact ints via float64)
    hourly = spark.read.parquet(out["rollup_hourly"]).drop("p_month")
    pts = decode_blocks(spark.read.parquet(out["encoded_hourly"]).drop("p_month"))
    want = hourly.select(
        "source", "bucket_start", F.col("n_tok_sum").cast("double").alias("value")
    )
    assert pts.count() == want.count() > 0
    assert pts.exceptAll(want).count() == 0
    # resume: a fresh pipeline over the same input skips every stage
    n_ledger = len(p._ledger())
    TierPipeline(spark, base, **kw).run(tiny_sequences)
    assert len(p._ledger()) == n_ledger
    # late data in 2024-02: refresh re-encodes ONLY that month's blocks
    before = _file_digests(os.path.join(base, "encoded_hourly"))
    feb = F.date_format(F.col("ts"), "yyyy-MM") == "2024-02"
    corrected = tiny_sequences.withColumn(
        "n_tok", F.when(feb, F.col("n_tok") * 2).otherwise(F.col("n_tok"))
    )
    p.refresh_months(corrected, ["2024-02"])
    after = _file_digests(os.path.join(base, "encoded_hourly"))
    changed = {k for k in before if after.get(k) != before[k]}
    assert changed and all("p_month=2024-02" in k for k in changed)
    # refreshed blocks decode to the corrected hourly tier
    hourly2 = spark.read.parquet(os.path.join(base, "rollup_hourly")).drop("p_month")
    pts2 = decode_blocks(
        spark.read.parquet(os.path.join(base, "encoded_hourly")).drop("p_month")
    )
    want2 = hourly2.select(
        "source", "bucket_start", F.col("n_tok_sum").cast("double").alias("value")
    )
    assert pts2.exceptAll(want2).count() == 0
    # and a run over the corrected input now skips the encoded stage too
    n_ledger = len(p._ledger())
    TierPipeline(spark, base, **kw).run(corrected)
    assert len(p._ledger()) == n_ledger


def test_encoded_stage_refresh_deletes_emptied_month(spark, tiny_sequences, tmp_path):
    """A correction that removes every 2024-02 row must delete the encoded
    stage's p_month=2024-02 dir (not leave a stale block partition), and
    the surviving blocks must decode to the corrected hourly tier."""
    import os

    import pyspark.sql.functions as F

    from rtsa_spark.operators.encode import decode_blocks

    base = str(tmp_path / "tiers")
    p = TierPipeline(
        spark, base, tiers=["raw", "hourly"], gapfill_tiers=(),
        metrics_tiers=(), encode_tiers=("hourly",),
    )
    p.run(tiny_sequences)
    feb_dir = os.path.join(base, "encoded_hourly", "p_month=2024-02")
    assert os.path.exists(feb_dir)
    corrected = tiny_sequences.where(
        F.date_format(F.col("ts"), "yyyy-MM") != "2024-02"
    )
    p.refresh_months(corrected, ["2024-02"])
    assert not os.path.exists(feb_dir)
    hourly = spark.read.parquet(os.path.join(base, "rollup_hourly")).drop("p_month")
    pts = decode_blocks(
        spark.read.parquet(os.path.join(base, "encoded_hourly")).drop("p_month")
    )
    want = hourly.select(
        "source", "bucket_start", F.col("n_tok_sum").cast("double").alias("value")
    )
    assert pts.count() == want.count() > 0
    assert pts.exceptAll(want).count() == 0
