"""Token survivorship audit: matched/mutated/missing accounting."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from rtsa_spark.operators.audit import token_audit


def test_audit_hand(spark):
    source = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [4]), (3, [5, 6]), (4, None)],
        "doc_id long, tokens array<int>",
    )
    survivors = spark.createDataFrame(
        [
            ("a", 1, [1, 2, 3]),      # matched
            ("a", 2, [4, 9]),          # mutated
            ("a", 99, [7]),            # missing from source
            ("b", 3, [5, 6]),          # matched
            ("b", 4, None),            # NULL == NULL: matched
        ],
        "stage string, doc_id long, tokens array<int>",
    )
    got = {
        r["stage"]: r.asDict()
        for r in token_audit(survivors, source, ["stage"]).collect()
    }
    assert got["a"]["n_rows"] == 3
    assert got["a"]["n_matched"] == 1
    assert got["a"]["n_mismatched"] == 1
    assert got["a"]["n_missing"] == 1
    assert got["b"]["n_rows"] == 2 and got["b"]["n_matched"] == 2
    for r in got.values():
        assert r["n_rows"] == r["n_matched"] + r["n_mismatched"] + r["n_missing"]


def test_audit_clean_pipeline(spark):
    from rtsa_spark.synth import synth_sequences
    from rtsa_spark.operators.sampling import hash_sample

    seq = synth_sequences(spark, 2000, n_sources=4)
    kept = hash_sample(seq, 5000)  # selection-only stage
    out = token_audit(kept, seq, ["source"]).collect()
    assert len(out) == 4
    assert all(
        r["n_rows"] == r["n_matched"] and r["n_mismatched"] == 0
        and r["n_missing"] == 0
        for r in out
    )
