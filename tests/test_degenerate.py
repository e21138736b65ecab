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


def test_new_ops_degenerate_inputs(spark):
    """Round-3 operators under degenerate inputs (ANSI mode throws on the
    sloppy paths): single-vector IVF, pairless dedup clustering, empty and
    single-row component decomposition."""
    import numpy as np
    import pyspark.sql.functions as F

    from rtsa_spark.operators.components import (
        decompose_components_deterministic,
    )
    from rtsa_spark.operators.dedup import dedup_clusters
    from rtsa_spark.operators.similarity import cosine_topk_ivf

    one = spark.createDataFrame(
        [(0, [float(x) for x in np.ones(8)])], "vec_id long, embedding array<float>"
    )
    # single vector: the only query's self-match is excluded -> empty top-k
    assert cosine_topk_ivf(one, one, k=3, n_centroids=4, nprobe=2).count() == 0

    # all-unique corpus: every doc is its own singleton cluster
    docs = spark.createDataFrame(
        [(f"d{i}", f"totally unique text number {i} with word {i*7}")
         for i in range(4)],
        "doc_id string, text string",
    )
    out = dedup_clusters(docs).toPandas()
    assert (out["cluster_size"] == 1).all() and out["is_canonical"].all()

    # empty tier -> empty components; single row -> degenerate contract
    empty = spark.createDataFrame(
        [], "source string, bucket_start timestamp, x long"
    )
    assert decompose_components_deterministic(
        empty, "daily", value_col="x", period=7
    ).count() == 0
    single = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 5)], "source string, b string, x long"
    ).select("source", F.to_timestamp("b").alias("bucket_start"), "x")
    row = decompose_components_deterministic(
        single, "daily", value_col="x", period=7
    ).collect()[0]
    assert row["seasonal_e4"] == 0 and row["trend_e4"] == 50_000


def test_degenerate_round3_late_ops(spark):
    """Empty and single-row probes for the late round-3 operators —
    ANSI mode throws on 0-divisors, so every e6/e2 div needs a guard
    or a structurally-empty path."""
    from rtsa_spark.functions.text import term_lift_topk, word_bigram_topk
    from rtsa_spark.operators.anomaly import iqr_outliers, zscore_outliers
    from rtsa_spark.operators.counters import cohort_retention
    from rtsa_spark.operators.distribution import distribution_drift
    from rtsa_spark.operators.monitor import (
        missing_ranges,
        stale_sources,
        top_movers,
    )
    from rtsa_spark.operators.sessionize import phase_profile

    empty_kv = spark.createDataFrame([], "g string, t int, v long")
    assert zscore_outliers(empty_kv, "g", "t", "v").count() == 0
    assert iqr_outliers(empty_kv, "g", "t", "v").count() == 0
    assert distribution_drift(empty_kv, "g", "t", "v").count() == 0

    empty_ts = spark.createDataFrame(
        [], "source string, bucket_start timestamp, x long"
    )
    assert phase_profile(
        empty_ts, "source", "bucket_start", "x", "hour"
    ).count() == 0
    assert missing_ranges(empty_ts, "hourly").count() == 0
    assert stale_sources(empty_ts, 0, 10).count() == 0
    assert top_movers(empty_ts, "source", "bucket_start", "x").count() == 0

    empty_docs = spark.createDataFrame([], "source string, text string")
    assert word_bigram_topk(empty_docs, "source").count() == 0
    assert term_lift_topk(empty_docs, "source").count() == 0

    empty_ev = spark.createDataFrame([], "user_id long, ts timestamp")
    assert cohort_retention(empty_ev, "user_id", "ts").count() == 0

    # single row: n=1 paths (zscore n-1 == 0 must not divide; drift has
    # no pair; movers have no lag)
    one = spark.createDataFrame([("g", 1, 7)], "g string, t int, v long")
    [z] = zscore_outliers(one, "g", "t", "v").collect()
    assert z["is_outlier"] is False
    assert distribution_drift(one, "g", "t", "v").count() == 0
    one_ts = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 3)], "source string, b string, x long"
    ).selectExpr("source", "to_timestamp(b) AS bucket_start", "x")
    assert top_movers(one_ts, "source", "bucket_start", "x").count() == 0
    assert missing_ranges(one_ts, "hourly").count() == 0


def test_degenerate_round4_ops(spark):
    """Empty and single-row probes for the round-4 operators (token
    analytics, trailing quantiles, span dedup, component strength,
    media decode) — every e6 div must survive n=0/n=1 under ANSI."""
    from rtsa_spark.functions.multimodal import extract_features
    from rtsa_spark.functions.text import winnow_fingerprints
    from rtsa_spark.operators.components import (
        component_strength,
        decompose_components_deterministic,
    )
    from rtsa_spark.operators.dedup import duplicate_spans
    from rtsa_spark.operators.rollup import (
        token_diversity,
        trailing_quantile,
        vocab_growth,
        vocab_overlap,
    )

    empty_seq = spark.createDataFrame(
        [], "source string, ts timestamp, tokens array<int>"
    )
    assert token_diversity(empty_seq, "daily").count() == 0
    assert vocab_growth(empty_seq, "daily").count() == 0
    assert vocab_overlap(empty_seq, "monthly").count() == 0

    empty_tier = spark.createDataFrame(
        [], "source string, bucket_start timestamp, n_tok_sum long"
    )
    assert trailing_quantile(empty_tier, 4, 3600, ["source"], "n_tok_sum").count() == 0
    comp = decompose_components_deterministic(empty_tier, "daily", period=7)
    assert comp.count() == 0
    assert component_strength(comp).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id string, text string")
    assert duplicate_spans(empty_docs).count() == 0
    assert winnow_fingerprints(empty_docs).count() == 0

    empty_media = spark.createDataFrame(
        [], "media_id string, kind string, payload binary"
    )
    assert extract_features(empty_media).count() == 0

    # single row: one token (n_tok=1 -> simpson NULL, divs still defined),
    # one bucket (trailing window of itself), doc shorter than one k-gram
    one_seq = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", [7])],
        "source string, ts string, tokens array<int>",
    ).selectExpr("source", "to_timestamp(ts) AS ts", "tokens")
    [d] = token_diversity(one_seq, "daily").collect()
    assert d["n_tok"] == 1 and d["simpson_e6"] is None
    assert d["ttr_e6"] == 1_000_000 and d["top_share_e6"] == 1_000_000
    [v] = vocab_growth(one_seq, "daily").collect()
    assert v["new_types"] == 1 and v["vocab_cum"] == 1
    assert vocab_overlap(one_seq, "monthly").count() == 0  # no pair

    one_tier = spark.createDataFrame(
        [("s", "2024-01-01 00:00:00", 5)],
        "source string, b string, n_tok_sum long",
    ).selectExpr("source", "to_timestamp(b) AS bucket_start", "n_tok_sum")
    [tq] = trailing_quantile(one_tier, 4, 3600, ["source"], "n_tok_sum").collect()
    assert tq["n_in_window"] == 1 and tq["w_p50"] == 5 and tq["w_p90"] == 5

    short_doc = spark.createDataFrame(
        [("d1", "ab")], "doc_id string, text string"
    )  # shorter than k=4 words: falls back to one whole-text gram
    assert winnow_fingerprints(short_doc).count() >= 1
    [sp] = duplicate_spans(short_doc).collect()
    assert sp["tot_fp"] >= 1 and sp["dup_fp"] == 0 and sp["dup_ppm"] == 0


def test_degenerate_snapshot_surfaces(spark, tmp_path):
    """Snapshot store + merging sink degenerate shapes: empty publish,
    refresh of a month with no prior rows, empty-vs-empty merge, and an
    empty micro-batch mid-stream (no commit, no crash)."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.rollup import merge_rollup, rollup_raw
    from rtsa_spark.snapshot import SnapshotStore
    from rtsa_spark.streaming.snapshot_sink import snapshot_rollup_sink
    from rtsa_spark.synth import synth_sequences

    empty_tier = rollup_raw(synth_sequences(spark, 0))
    seq = synth_sequences(spark, 800, n_sources=2)
    tier = rollup_raw(seq)

    # empty FIRST publish: commits a mapping-less snapshot; read returns
    # the pinned schema with zero rows
    st = SnapshotStore(spark, str(tmp_path / "empty_first"))
    sid = st.publish(empty_tier)
    assert sid == 1 and st.read().count() == 0
    assert st.read().columns == empty_tier.columns
    # a later real publish on the same store works
    st.publish(tier)
    assert st.read().count() == tier.count()

    # refresh a month that has no rows on either side: month stays absent,
    # commit still appends (idempotent bookkeeping)
    st.refresh_months(empty_tier, ["1999-12"])
    assert st.read().count() == tier.count()

    # empty-vs-empty and empty-delta merges
    assert merge_rollup(empty_tier, empty_tier).count() == 0
    assert merge_rollup(tier, empty_tier).exceptAll(tier).count() == 0

    # empty micro-batch through the sink: no commit, later batch fine
    st2 = SnapshotStore(spark, str(tmp_path / "sink"))
    fold = snapshot_rollup_sink(st2, tier="raw")
    fold(synth_sequences(spark, 0), 0)
    assert st2.current_snapshot() is None
    fold(seq, 1)
    assert st2.current_snapshot() == 1
    tok_store = st2.read().agg(F.sum("n_tok_sum")).first()[0]
    tok_src = seq.agg(F.sum("n_tok")).first()[0]
    assert tok_store == tok_src


def test_empty_input_sketch_quartet(spark):
    """Empty streams through every sketch build, merge, and probe: zero
    rows out, no ANSI throw, no empty-array aggregate trap."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.dedup import simhash48, simhash_hamming_pairs
    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_maybe_contains,
        bloom_merge_buckets,
        cm_bucket_sketch,
        cm_estimate,
        cm_merge_buckets,
        mg_bucket_sketch,
        mg_certified_topk,
        mg_merge_buckets,
    )

    ev = spark.createDataFrame([], "g string, b long, item string")
    cm = cm_bucket_sketch(ev, ["g"], "b", "item", d_rows=2, w_cols=8)
    assert cm.count() == 0
    assert cm_merge_buckets(cm, ["g"], F.lit(0)).count() == 0
    probes = spark.createDataFrame([("a",)], "item string")
    assert cm_estimate(cm, probes, d_rows=2, w_cols=8).count() == 0
    bl = bloom_bucket_sketch(ev, ["g"], "b", "item", m_bits=64, k_hash=2)
    assert bl.count() == 0
    assert bloom_merge_buckets(bl, ["g"], F.lit(0)).count() == 0
    assert bloom_maybe_contains(bl, probes, m_bits=64, k_hash=2).count() == 0
    mg = mg_bucket_sketch(ev, ["g"], "b", "item", k=4)
    assert mg.count() == 0
    assert mg_merge_buckets(mg, ["g"], F.lit(0), k=4).count() == 0
    fc = spark.createDataFrame([], "g string, bucket long, item string, c long")
    assert mg_certified_topk(fc, ["g"], F.lit(0), topk=2, mg_k=4).count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string")
    sh = simhash48(docs)
    assert sh.count() == 0
    assert simhash_hamming_pairs(sh, max_dist=2, bits=48).count() == 0


def test_single_row_sketch_quartet(spark):
    """One item, one bucket: exact everywhere — counts 1, distinct 1,
    MG weight 1/slack 0, bloom probes itself true."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_maybe_contains,
        cm_bucket_sketch,
        cm_estimate,
        mg_bucket_sketch,
    )

    ev = spark.createDataFrame([("g1", 0, "solo")], "g string, b long, item string")
    cm = cm_bucket_sketch(ev, ["g"], "b", "item", d_rows=2, w_cols=8)
    probes = spark.createDataFrame([("solo",), ("other",)], "item string")
    est = {r["item"]: r["est_count"]
           for r in cm_estimate(cm, probes, d_rows=2, w_cols=8).collect()}
    assert est["solo"] == 1
    bl = bloom_bucket_sketch(ev, ["g"], "b", "item", m_bits=64, k_hash=2)
    assert bl.collect()[0]["n_distinct"] == 1
    got = {r["item"]: r["maybe"]
           for r in bloom_maybe_contains(bl, probes, m_bits=64, k_hash=2).collect()}
    assert got["solo"] is True
    mg = mg_bucket_sketch(ev, ["g"], "b", "item", k=2).collect()
    assert {r["item"]: (r["w"], r["slack"]) for r in mg if r["item"]} == {
        "solo": (1, 0)
    }
