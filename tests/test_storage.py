"""Bucketed tier tables: layout survives round-trip and kills the shuffle.

The claims under test are physical-plan properties (the point of the
feature), not just row equality:

- co-bucketed tiers join on ``source`` with NO shuffle Exchange on either
  side;
- ``groupBy("source")`` over a bucketed tier aggregates with NO Exchange;
- the same join over plain parquet DOES shuffle (the control — proves the
  assertion would catch a regression);
- content round-trips exactly and ``bucket_spec`` reports the layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtsa_spark.operators.rollup import rollup_ladder
from rtsa_spark.storage import bucket_spec, read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tiers(spark, tiny_sequences, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    tiers = rollup_ladder(tiny_sequences)
    for name in ("hourly", "daily"):
        write_bucketed(
            tiers[name],
            f"t_{name}_b",
            n_buckets=8,
            path=str(base / name),
        )
    yield {"hourly": tiers["hourly"], "daily": tiers["daily"]}
    for name in ("hourly", "daily"):
        spark.sql(f"DROP TABLE IF EXISTS t_{name}_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_roundtrip_and_spec(spark, bucketed_tiers):
    got = read_bucketed(spark, "t_daily_b")
    want = bucketed_tiers["daily"]
    assert got.count() == want.count()
    # order-independent content equality via the pipeline fingerprint trick
    a = got.agg(F.bit_xor(F.xxhash64(*sorted(got.columns)))).first()[0]
    b = want.agg(F.bit_xor(F.xxhash64(*sorted(want.columns)))).first()[0]
    assert a == b
    assert bucket_spec(spark, "t_daily_b") == (8, ["source"])
    assert bucket_spec(spark, "t_hourly_b")[0] == 8


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tiers):
    h = read_bucketed(spark, "t_hourly_b").groupBy("source").agg(
        F.sum("n_tok_sum").alias("h_tok")
    )
    d = read_bucketed(spark, "t_daily_b").groupBy("source").agg(
        F.sum("n_tok_sum").alias("d_tok")
    )
    # forbid the broadcast fallback so the test exercises the bucket path
    with_conf = spark.conf
    prev = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = h.join(d, "source").where("h_tok != d_tok")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # and the tiers really do agree (cascade exactness over the layout)
        assert joined.count() == 0
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tiers):
    agg = (
        read_bucketed(spark, "t_daily_b")
        .groupBy("source")
        .agg(F.sum("n_seq").alias("o"))
    )
    assert "Exchange" not in _plan(agg)
    assert agg.count() > 0


def test_plain_parquet_control_does_shuffle(spark, bucketed_tiers, tmp_path):
    """The control: without bucketing the same join re-hashes both sides —
    proves the no-Exchange assertions above have teeth."""
    p = str(tmp_path / "plain")
    bucketed_tiers["daily"].write.mode("overwrite").parquet(p)
    plain = spark.read.parquet(p)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = plain.alias("a").join(plain.alias("b"), "source")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_count_mismatch_is_detectable(spark, bucketed_tiers, tmp_path):
    write_bucketed(
        bucketed_tiers["daily"],
        "t_daily_b4",
        n_buckets=4,
        path=str(tmp_path / "b4"),
    )
    try:
        assert bucket_spec(spark, "t_daily_b4")[0] == 4
        assert bucket_spec(spark, "t_hourly_b")[0] == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS t_daily_b4")


def test_write_bucketed_validates(spark, bucketed_tiers):
    with pytest.raises(ValueError):
        write_bucketed(bucketed_tiers["daily"], "t_bad", n_buckets=0)


# --------------------------------------------------------------- z-order


def _py_spread(v):
    r = 0
    for i in range(32):
        r |= ((v >> i) & 1) << (2 * i)
    return r


def test_zorder_key_hand_replay(spark):
    """Morton key matches a bit-by-bit Python interleave for corner and
    mid-range values of both dims."""
    import pyspark.sql.functions as F

    from rtsa_spark.storage import zorder_key

    vals = [0, 1, 5, 255, 4096, 65535]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key("x", "y").alias("zk")).collect()
    for r in got:
        assert r["zk"] == (_py_spread(r["x"]) | (_py_spread(r["y"]) << 1)), (
            r["x"], r["y"])


def test_zorder_key_wide_bits(spark):
    """bits in (16, 31] interleave correctly (ADVICE r4: the 32-bit mask
    chain aliased spread(2^16) to spread(2^8) — a non-Morton layout for
    wide dims). Pins the exact collision pair plus corner/mid values up
    to 2^31 - 1 against the bit-by-bit Python interleave."""
    import pyspark.sql.functions as F  # noqa: F401

    from rtsa_spark.storage import zorder_key

    assert _py_spread(1 << 16) != _py_spread(1 << 8)
    vals = [0, 1, 255, 256, 65535, 65536, 1 << 20, (1 << 24) + 3, (1 << 31) - 1]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key("x", "y", bits=31).alias("zk")).collect()
    for r in got:
        assert r["zk"] == (_py_spread(r["x"]) | (_py_spread(r["y"]) << 1)), (
            r["x"], r["y"])


def test_zorder_key_out_of_range_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from rtsa_spark.storage import zorder_key

    df = spark.createDataFrame([(70000, 1)], "x long, y long")
    with pytest.raises(SparkRuntimeException):
        df.select(zorder_key("x", "y")).collect()
    with pytest.raises(ValueError):
        zorder_key("x", "y", bits=0)


def test_zorder_skip_audit_grid(spark):
    """On a 64x64 grid split into 16 files, a centered 16x16 box must
    scan strictly fewer files under the z layout than under linear
    (linear stripes cross the box's y range in every x stripe), and the
    per-layout accounting must replay exactly in Python."""
    from rtsa_spark.storage import zorder_skip_audit

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    box = (32, 47, 32, 47)
    out = {
        r["layout"]: r
        for r in zorder_skip_audit(
            df, "x", "y", 16, (box[0], box[1]), (box[2], box[3])
        ).collect()
    }

    def replay(order_key):
        ordered = sorted(rows, key=order_key)
        total = len(ordered)
        files = {}
        for i, (x, y) in enumerate(ordered):
            files.setdefault(16 * i // total, []).append((x, y))
        scanned = rows_scanned = matched = 0
        for pts in files.values():
            xs, ys = [p[0] for p in pts], [p[1] for p in pts]
            matched += sum(
                box[0] <= x <= box[1] and box[2] <= y <= box[3]
                for x, y in pts
            )
            if not (max(xs) < box[0] or min(xs) > box[1]
                    or max(ys) < box[2] or min(ys) > box[3]):
                scanned += 1
                rows_scanned += len(pts)
        return len(files), scanned, rows_scanned, matched

    exp_lin = replay(lambda p: (p[0], p[1]))
    exp_zo = replay(
        lambda p: (_py_spread(p[0]) | (_py_spread(p[1]) << 1), p[0], p[1])
    )
    for name, exp in (("linear", exp_lin), ("zorder", exp_zo)):
        r = out[name]
        assert (
            r["n_files"], r["files_scanned"], r["rows_scanned"],
            r["rows_matched"],
        ) == exp, name
    assert out["zorder"]["files_scanned"] < out["linear"]["files_scanned"]
    assert out["zorder"]["rows_matched"] == out["linear"]["rows_matched"]


def test_cluster_zorder_roundtrip_and_order(spark, tmp_path):
    """cluster_zorder preserves content exactly and every output
    partition is internally sorted by the Morton key (the property that
    gives parquet row groups tight two-dim envelopes)."""
    import pyspark.sql.functions as F

    from rtsa_spark.storage import cluster_zorder, zorder_key

    rows = [((i * 37) % 64, (i * 101) % 64) for i in range(1024)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = cluster_zorder(df, "x", "y")
    path = str(tmp_path / "zo")
    out.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    assert (
        back.groupBy("x", "y").count()
        .exceptAll(df.groupBy("x", "y").count()).count() == 0
    )
    # per input file (written partition), zk must be nondecreasing
    withf = back.select(
        "x", "y",
        zorder_key("x", "y").alias("zk"),
        F.expr("input_file_name()").alias("f"),
    ).collect()
    byf = {}
    for r in withf:
        byf.setdefault(r["f"], []).append(r["zk"])
    for zks in byf.values():
        assert zks == sorted(zks)
