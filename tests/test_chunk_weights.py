"""Document chunking and temperature-based domain weights."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.sampling import chunk_documents, domain_temperature_weights


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


# ------------------------------------------------------------------ chunks


def test_chunk_covers_with_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    out = sorted(
        chunk_documents(_docs(spark, [" ".join(words)]), 4, 3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,3,6 cover [0,4),[3,7),[6,10); start 9 redundant (6+4 >= 10)
    assert [r["start_tok"] for r in out] == [0, 3, 6]
    assert [r["n_tok"] for r in out] == [4, 4, 4]
    assert out[1]["chunk_hash"] == _h48(" ".join(words[3:7]))


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, ["a b"]), 8, 4).collect()
    assert len(out) == 1
    assert out[0]["n_tok"] == 2 and out[0]["chunk_hash"] == _h48("a b")
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a"]), 4, 5)


def test_chunk_tail_shorter(spark):
    words = [f"t{i}" for i in range(11)]
    out = sorted(
        chunk_documents(_docs(spark, [" ".join(words)]), 4, 4).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["start_tok"] for r in out] == [0, 4, 8]
    assert out[-1]["n_tok"] == 3
    assert out[-1]["chunk_hash"] == _h48(" ".join(words[8:]))


# ----------------------------------------------------------------- weights


def test_temperature_weights_flatten(spark):
    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, i long")
    out = {r["source"]: r for r in domain_temperature_weights(df).collect()}
    tot = math.sqrt(90.0) + math.sqrt(10.0)
    assert out["big"]["w_e6"] == int(math.floor(math.sqrt(90.0) / tot * 1e6))
    assert out["small"]["w_e6"] == int(math.floor(math.sqrt(10.0) / tot * 1e6))
    # alpha=1/2 flattens: big is 9x the docs but < 3.01x the weight
    assert out["big"]["w_e6"] < 3.01 * out["small"]["w_e6"]


def test_temperature_weights_by_mass_ordered_fold(spark):
    rows = [(f"s{i}", 7 * i + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = domain_temperature_weights(
        df, tokens_expr=F.col("n_chars")
    ).collect()
    tot = 0.0
    for _, m in sorted(rows):  # ascending-key ordered fold, same as engine
        tot += math.sqrt(float(m))
    want = {s: int(math.floor(math.sqrt(float(m)) / tot * 1e6)) for s, m in rows}
    for r in out:
        assert r["w_e6"] == want[r["source"]] and r["n_units"] == dict(rows)[r["source"]]
