"""Degenerate-input regression probes: empty tables, single source,
single row — the ANSI-mode traps the verify recipe calls out (zero
divisors, empty aggregates) must stay silent-correct, not throw."""

from __future__ import annotations


def test_empty_input_every_operator(spark):
    from rtsa_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_buckets,
        ngram_jaccard_lsh,
        simhash16,
    )
    from rtsa_spark.operators.encode import decode_blocks, encode_tier
    from rtsa_spark.operators.gapfill import gapfill_linear
    from rtsa_spark.operators.masks import mask_min_observations
    from rtsa_spark.operators.metrics import (
        compute_metrics,
        compute_metrics_deterministic,
    )
    from rtsa_spark.operators.rollup import rollup_ladder, rollup_raw, token_histogram
    from rtsa_spark.synth import synth_sequences

    empty = synth_sequences(spark, 0)
    tiers = rollup_ladder(empty)
    assert {k: v.count() for k, v in tiers.items()} == {
        "raw": 0, "hourly": 0, "daily": 0, "monthly": 0
    }
    raw = rollup_raw(empty)
    assert gapfill_linear(raw, "raw").count() == 0
    assert mask_min_observations(raw, 2).count() == 0
    assert compute_metrics(raw, "daily").count() == 0
    assert compute_metrics_deterministic(
        raw.selectExpr("source", "bucket_start", "n_tok_sum"), "daily"
    ).count() == 0
    assert decode_blocks(encode_tier(raw)).count() == 0
    assert token_histogram(empty).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string, lang string, source string")
    assert dedup_exact(docs).count() == 0
    assert minhash_lsh_buckets(docs).count() == 0
    assert simhash16(docs).count() == 0
    assert ngram_jaccard_lsh(docs).count() == 0


def test_single_row_and_single_source(spark):
    from rtsa_spark.operators.encode import decode_blocks, encode_tier
    from rtsa_spark.operators.gapfill import gapfill_linear
    from rtsa_spark.operators.metrics import compute_metrics
    from rtsa_spark.operators.rollup import rollup_ladder, rollup_raw
    from rtsa_spark.synth import synth_sequences

    one_row = synth_sequences(spark, 1, n_sources=1)
    assert rollup_ladder(one_row)["monthly"].count() == 1
    m = compute_metrics(rollup_raw(one_row), "daily").collect()
    assert len(m) == 1 and m[0]["n_buckets"] == 1  # stats NaN, no throw
    assert decode_blocks(encode_tier(rollup_raw(one_row))).count() == 1

    one_src = synth_sequences(spark, 500, n_sources=1)
    daily = gapfill_linear(rollup_ladder(one_src)["daily"], "daily")
    assert compute_metrics(daily, "daily").count() == 1


def test_single_doc_dedup(spark):
    from rtsa_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_buckets,
        ngram_jaccard_lsh,
    )

    one = spark.createDataFrame(
        [(1, "only one tiny doc here", "en", "w")],
        "doc_id long, text string, lang string, source string",
    )
    assert dedup_exact(one).count() == 1
    assert minhash_lsh_buckets(one).count() == 4  # one doc in each band
    assert ngram_jaccard_lsh(one).count() == 0  # no pairs


def test_eot_deterministic_degenerate_inputs(spark):
    """The oracle-facing EOT twin must mirror its SQL twin on degenerate
    inputs: a sourceless tier and an empty common spine both yield a typed
    empty result (no schema-inference errors), and a constant-valued tier
    (all variances zero) yields one NULL-stat row per source for mode 1."""
    import datetime as dt

    from rtsa_spark.operators.eot import eot_deterministic

    schema = "source string, bucket_start timestamp, x long"
    empty = spark.createDataFrame([], schema)
    out = eot_deterministic(empty, value_col="x")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "source", "mode", "is_base", "r_e6", "slope_e6", "expl_e4"
    ]

    # two sources with disjoint buckets -> empty common spine -> no rows
    b = dt.datetime(2024, 1, 1)
    disjoint = spark.createDataFrame(
        [("a", b, 10), ("b", b + dt.timedelta(hours=1), 20)], schema
    )
    assert eot_deterministic(disjoint, value_col="x").count() == 0

    # constant series: all-zero variance -> NULL-stat rows, mode 1 only
    rows = [
        (s, b + dt.timedelta(hours=i), 7) for s in ("a", "b") for i in range(4)
    ]
    const = spark.createDataFrame(rows, schema)
    out = eot_deterministic(const, value_col="x", n_modes=2).toPandas()
    assert len(out) == 2 and set(out["mode"]) == {1}
    assert out["r_e6"].isna().all() and (out["is_base"] == 0).all()
