"""Deterministic epoch plan: counts, determinism, positions, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rtsa_spark.operators.sampling import epoch_plan


def _docs(spark):
    return spark.createDataFrame(
        [(1, 1), (2, 3), (3, 2), (4, 0)], "doc_id long, rep long"
    )


def test_counts_and_determinism(spark):
    df = _docs(spark)
    out = epoch_plan(df, "doc_id", n_epochs=2, repeat_col="rep")
    rows = out.collect()
    # 2 epochs x (1 + 3 + 2) copies; rep=0 doc excluded entirely
    assert len(rows) == 12
    assert all(r["id"] != 4 for r in rows)
    per = {}
    for r in rows:
        per[(r["epoch"], r["id"])] = per.get((r["epoch"], r["id"]), 0) + 1
    assert per[(0, 2)] == 3 and per[(1, 3)] == 2 and per[(0, 1)] == 1
    # rerun is bit-identical
    again = epoch_plan(df, "doc_id", n_epochs=2, repeat_col="rep").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # epochs shuffle differently, salts shuffle differently
    k0 = {r["order_key"] for r in rows if r["epoch"] == 0}
    k1 = {r["order_key"] for r in rows if r["epoch"] == 1}
    assert k0 != k1
    other = epoch_plan(df, "doc_id", n_epochs=2, repeat_col="rep", salt="v2")
    assert {r["order_key"] for r in other.collect()} != k0 | k1


def test_positions_dense_per_epoch(spark):
    out = epoch_plan(
        _docs(spark), "doc_id", n_epochs=2, repeat_col="rep",
        with_position=True,
    ).collect()
    for e in (0, 1):
        pos = sorted(r["position"] for r in out if r["epoch"] == e)
        assert pos == list(range(1, 7))
        # positions follow order_key order
        by_pos = sorted(
            (r for r in out if r["epoch"] == e), key=lambda r: r["position"]
        )
        keys = [r["order_key"] for r in by_pos]
        assert keys == sorted(keys)


def test_guards(spark):
    with pytest.raises(ValueError):
        epoch_plan(_docs(spark), "doc_id", n_epochs=0)
