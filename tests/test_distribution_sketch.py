"""Distribution-comparison stats (Spearman / KS) and token sketches
(KMV distinct, Simpson concentration)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rtsa_spark.operators.distribution import ks_two_sample, spearman_corr
from rtsa_spark.operators.sketch import (
    KMV_HASH_RANGE,
    gini_concentration,
    kmv_distinct,
)


def _series_df(spark, series: dict[str, list[int]]):
    rows = [
        (k, t, int(v)) for k, vs in series.items() for t, v in enumerate(vs)
    ]
    return spark.createDataFrame(rows, "k string, t int, x long")


# ----------------------------------------------------------- spearman


def test_spearman_perfect_monotone(spark):
    df = _series_df(
        spark, {"a": [1, 5, 3, 9, 7], "b": [10, 50, 30, 90, 70]}
    )
    row = spearman_corr(df, "k", "t", "x").collect()[0]
    assert (row["kx"], row["ky"], row["m"]) == ("a", "b", 5)
    assert row["rho_e9"] == 1_000_000_000


def test_spearman_anti_monotone(spark):
    df = _series_df(spark, {"a": [1, 2, 3, 4], "b": [9, 7, 5, 3]})
    assert (
        spearman_corr(df, "k", "t", "x").collect()[0]["rho_e9"]
        == -1_000_000_000
    )


def test_spearman_ties_match_rank_pearson(spark):
    rng = np.random.RandomState(7)
    x = rng.randint(0, 6, 40)  # heavy ties
    y = (x + rng.randint(0, 4, 40)).astype(int)
    df = _series_df(spark, {"a": x.tolist(), "b": y.tolist()})
    got = spearman_corr(df, "k", "t", "x").collect()[0]["rho_e9"]
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    want = np.corrcoef(rx, ry)[0, 1]
    assert got == pytest.approx(1e9 * want, abs=2)


def test_spearman_constant_side_null(spark):
    df = _series_df(spark, {"a": [3, 3, 3], "b": [1, 2, 3]})
    assert spearman_corr(df, "k", "t", "x").collect()[0]["rho_e9"] is None


# ----------------------------------------------------------------- ks


def test_ks_disjoint_supports_is_one(spark):
    df = _series_df(spark, {"a": [1, 2, 3], "b": [10, 11, 12, 13]})
    row = ks_two_sample(df, "k", "x").collect()[0]
    assert (row["n"], row["m"]) == (3, 4)
    assert row["d_num"] == 12  # 3*4
    assert row["ks_e6"] == 1_000_000


def test_ks_identical_samples_is_zero(spark):
    df = _series_df(spark, {"a": [1, 2, 2, 5], "b": [1, 2, 2, 5]})
    assert ks_two_sample(df, "k", "x").collect()[0]["ks_e6"] == 0


def test_ks_matches_bruteforce_with_ties(spark):
    rng = np.random.RandomState(11)
    xa = rng.randint(0, 20, 37)
    xb = rng.randint(5, 25, 23)
    df = _series_df(spark, {"a": xa.tolist(), "b": xb.tolist()})
    row = ks_two_sample(df, "k", "x").collect()[0]
    n, m = len(xa), len(xb)
    ts = np.unique(np.concatenate([xa, xb]))
    want = max(
        abs(int((xa <= t).sum()) * m - int((xb <= t).sum()) * n) for t in ts
    )
    assert row["d_num"] == want
    assert row["ks_e6"] == (1_000_000 * want) // (n * m)


def test_ks_all_pairs_emitted(spark):
    df = _series_df(spark, {"a": [1], "b": [2], "c": [3]})
    got = {
        (r["kx"], r["ky"]) for r in ks_two_sample(df, "k", "x").collect()
    }
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


# ---------------------------------------------------------------- kmv


def _items_df(spark, groups: dict[str, list[str]]):
    rows = [(k, it) for k, its in groups.items() for it in its]
    return spark.createDataFrame(rows, "g string, item string")


def test_kmv_exact_below_k(spark):
    df = _items_df(spark, {"a": ["x", "y", "z", "x", "y"]})
    row = kmv_distinct(df, "g", "item", k=64).collect()[0]
    assert row["k_used"] == 3
    assert row["est_distinct"] == 3  # exact when sketch not full


def test_kmv_estimate_in_range(spark):
    items = [f"tok{i}" for i in range(5000)]
    df = _items_df(spark, {"a": items})
    row = kmv_distinct(df, "g", "item", k=64).collect()[0]
    assert row["k_used"] == 64
    # KMV with k=64 has ~1/sqrt(62) ~ 13% relative sd; allow 4 sigma.
    assert 2500 <= row["est_distinct"] <= 10000
    assert 0 < row["h_kth"] < KMV_HASH_RANGE


def test_kmv_sketch_is_mergeable(spark):
    """k smallest hashes of the union == k smallest of each half's k
    smallest, so tier cascades can merge sketches without raw data."""
    import hashlib

    all_items = [f"tok{i}" for i in range(2000)]
    halves = {"h1": all_items[:1200], "h2": all_items[800:]}
    whole = kmv_distinct(
        _items_df(spark, {"w": all_items}), "g", "item", k=32
    ).collect()[0]

    def h48(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    merged = sorted({h48(i) for half in halves.values() for i in half})[:32]
    assert whole["h_kth"] == merged[-1]
    assert whole["k_used"] == 32


def test_gini_uniform_and_point_mass(spark):
    d = 25
    uniform = [f"t{i}" for i in range(d)] * 4
    point = ["only"] * 100
    df = _items_df(spark, {"u": uniform, "p": point})
    rows = {r["key"]: r for r in gini_concentration(df, "g", "item").collect()}
    s = len(uniform)
    c2 = d * 4 * 4
    assert rows["u"]["n_items"] == s and rows["u"]["n_distinct"] == d
    assert rows["u"]["gini_e6"] == (1_000_000 * (s * s - c2)) // (s * s)
    assert rows["u"]["eff_vocab_e3"] == 1000 * d  # inverse Simpson exact
    assert rows["p"]["gini_e6"] == 0
    assert rows["p"]["eff_vocab_e3"] == 1000


def test_distribution_drift_identical_and_disjoint(spark):
    from rtsa_spark.operators.distribution import distribution_drift

    rows = (
        # day 1 and day 2 identical mixes -> zero drift, full overlap
        [("k", 1, "a")] * 3 + [("k", 1, "b")] * 1
        + [("k", 2, "a")] * 3 + [("k", 2, "b")] * 1
        # day 3 disjoint support -> TVD 1, Jaccard 0
        + [("k", 3, "c")] * 2
    )
    df = spark.createDataFrame(rows, "key string, p int, item string")
    out = {r["period"]: r for r in
           distribution_drift(df, "key", "p", "item").collect()}
    assert set(out) == {2, 3}
    d2 = out[2]
    assert d2["prev_period"] == 1 and d2["tvd_e6"] == 0
    assert d2["jaccard_e6"] == 1_000_000 and d2["n_both"] == 2
    d3 = out[3]
    assert d3["tvd_e6"] == 1_000_000 and d3["jaccard_e6"] == 0
    assert d3["linf_e6"] == 1_000_000  # 'c': |2/2 - 0|


def test_distribution_drift_matches_python(spark):
    from collections import Counter

    from rtsa_spark.operators.distribution import distribution_drift

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        ("k", int(d), f"i{rng.randint(0, 12)}")
        for d in rng.randint(0, 5, 400)
    ]
    df = spark.createDataFrame(rows, "key string, p int, item string")
    got = {r["period"]: r for r in
           distribution_drift(df, "key", "p", "item").collect()}
    days = sorted({p for _, p, _ in rows})
    for prev, cur in zip(days, days[1:]):
        cp = Counter(i for _, p, i in rows if p == prev)
        cc = Counter(i for _, p, i in rows if p == cur)
        tp, tc = sum(cp.values()), sum(cc.values())
        num = {i: abs(cc.get(i, 0) * tp - cp.get(i, 0) * tc)
               for i in set(cp) | set(cc)}
        r = got[cur]
        assert r["prev_period"] == prev
        assert r["tvd_e6"] == (1_000_000 * sum(num.values())) // (2 * tc * tp)
        assert r["linf_e6"] == (1_000_000 * max(num.values())) // (tc * tp)
        both = len(set(cp) & set(cc))
        assert r["n_both"] == both
        assert r["jaccard_e6"] == 1_000_000 * both // len(set(cp) | set(cc))


def test_kmv_bucket_sketch_merge_identity(spark):
    """kmin_k(A∪B) == kmin_k(kmin_k(A) ∪ kmin_k(B)) — the cascade merge
    equals a direct sketch over the combined span, exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from rtsa_spark.operators.sketch import (
        kmv_bucket_sketch,
        kmv_merge_buckets,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(40):  # spans two months
        for u in range(d % 17 + 3):
            rows.append(("k", t0 + dt.timedelta(days=d), d * 100 + u))
    df = spark.createDataFrame(rows, "g string, d timestamp, uid long")

    daily = kmv_bucket_sketch(df, ["g"], "d", "uid", k=8)
    merged = kmv_merge_buckets(
        daily, ["g"], F.date_trunc("month", F.col("bucket")), k=8
    )
    direct = kmv_bucket_sketch(
        df.select("g", F.date_trunc("month", "d").alias("m"), "uid"),
        ["g"], "m", "uid", k=8,
    )
    a = {(r["bucket"], r["h_kth"], r["est_distinct"])
         for r in merged.collect()}
    b = {(r["bucket"], r["h_kth"], r["est_distinct"])
         for r in direct.collect()}
    assert a == b and len(a) == 2


def test_kmv_bucket_sketch_exact_below_k(spark):
    from rtsa_spark.operators.sketch import kmv_bucket_sketch

    df = spark.createDataFrame(
        [("k", 1, u) for u in (1, 2, 3, 2, 1)], "g string, d int, uid long"
    )
    [r] = kmv_bucket_sketch(df, ["g"], "d", "uid", k=8).collect()
    assert r["k_used"] == 3 and r["est_distinct"] == 3
    assert list(r["kmv"]) == sorted(r["kmv"])


def test_kmv_intersect_exact_below_k(spark):
    """With fewer than k distinct items per group the sketch holds the
    whole hash set, so est_union / est_intersect are EXACT and
    jaccard_e6 is the exact floor-scaled Jaccard."""
    from rtsa_spark.operators.sketch import kmv_bucket_sketch, kmv_intersect
    import pyspark.sql.functions as F

    rows = (
        [("a", f"t{i}") for i in range(20)]
        + [("b", f"t{i}") for i in range(10, 30)]
        + [("c", f"t{i}") for i in range(25, 30)]
    )
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_bucket_sketch(df, [], "g", "item", k=64).select(
        F.col("bucket").alias("g"), "kmv"
    )
    got = {(r["g1"], r["g2"]): r for r in kmv_intersect(sk, "g", k=64).collect()}
    sets = {
        "a": set(range(20)),
        "b": set(range(10, 30)),
        "c": set(range(25, 30)),
    }
    for (g1, g2), r in got.items():
        inter = len(sets[g1] & sets[g2])
        union = len(sets[g1] | sets[g2])
        assert r["est_union"] == union, (g1, g2)
        assert r["matches"] == inter and r["est_intersect"] == inter
        assert r["jaccard_e6"] == (1_000_000 * inter) // union
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_kmv_intersect_estimates_at_scale(spark):
    """Past k the estimate is within a loose band of truth (k=64 -> ~12%
    std error) and the identical-set pair estimates Jaccard ~ 1."""
    from rtsa_spark.operators.sketch import kmv_bucket_sketch, kmv_intersect
    import pyspark.sql.functions as F
    import pytest as _pytest

    rows = (
        [("x", f"i{i}") for i in range(3000)]
        + [("y", f"i{i}") for i in range(1000, 4000)]
        + [("z", f"i{i}") for i in range(3000)]
    )
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_bucket_sketch(df, [], "g", "item", k=64).select(
        F.col("bucket").alias("g"), "kmv"
    )
    got = {(r["g1"], r["g2"]): r for r in kmv_intersect(sk, "g", k=64).collect()}
    xy = got[("x", "y")]
    assert 2500 < xy["est_union"] < 5600  # true 4000
    assert xy["jaccard_e6"] < 900_000  # true 0.5
    xz = got[("x", "z")]
    assert xz["jaccard_e6"] == 1_000_000  # identical sets, identical sketches
    assert xz["matches"] == xz["sample_n"]
    with _pytest.raises(ValueError):
        kmv_intersect(sk, "g", k=1)


def test_cm_sketch_exact_when_wide(spark):
    """With width >> vocabulary no cells collide: every estimate equals
    the true count (and unseen probes estimate 0); n_items equals the
    stream length (each sketch row sums to it)."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import cm_bucket_sketch, cm_estimate

    rows = [("s1", 0, w) for w in "a a a b c a b".split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    sk = cm_bucket_sketch(df, ["g"], "d", "item", d_rows=3, w_cols=512)
    r = sk.collect()[0]
    assert r["n_items"] == 7
    arr = r["cm"]
    for rr in range(3):
        assert sum(arr[rr * 512:(rr + 1) * 512]) == 7  # row-sum invariant
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zz",)], "item string"
    )
    got = {
        x["item"]: x["est_count"]
        for x in cm_estimate(sk, probes, d_rows=3, w_cols=512).collect()
    }
    assert got == {"a": 4, "b": 2, "c": 1, "zz": 0}


def test_cm_bloom_cell_layout_python_replay(spark):
    """r6 internals change (union -> single explode pass in the cm and
    bloom builders): the exact cell/word BIT LAYOUT must still match an
    independent pure-Python replay of the md5 derivation — a wrong
    position, a dropped hash row, or a double-counted cell all fail."""
    import hashlib

    from rtsa_spark.operators.sketch import bloom_bucket_sketch, cm_bucket_sketch

    def h48(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    words = "pear plum pear fig plum pear kiwi".split()
    df = spark.createDataFrame(
        [("s1", 0, w) for w in words], "g string, d long, item string"
    )

    d_rows, w_cols = 3, 5  # narrow: collisions occur and must sum
    exp_cm = [0] * (d_rows * w_cols)
    for w in set(words):
        for r in range(d_rows):
            exp_cm[r * w_cols + h48(f"{r}:{w}") % w_cols] += words.count(w)
    got = cm_bucket_sketch(
        df, ["g"], "d", "item", d_rows=d_rows, w_cols=w_cols
    ).collect()[0]
    assert list(got["cm"]) == exp_cm and got["n_items"] == len(words)

    m_bits, k_hash = 64, 3  # 2 words of 32 bits
    exp_bloom = [0, 0]
    for w in set(words):
        for r in range(k_hash):
            pos = h48(f"{r}:{w}") % m_bits
            exp_bloom[pos // 32] |= 1 << (pos % 32)
    gb = bloom_bucket_sketch(
        df, ["g"], "d", "item", m_bits=m_bits, k_hash=k_hash
    ).collect()[0]
    assert list(gb["bloom"]) == exp_bloom and gb["n_distinct"] == len(set(words))


def test_cm_sketch_one_sided_under_collisions(spark):
    """Width 2 forces collisions: estimates may overshoot but NEVER
    undershoot the true count, for present and absent probes alike."""
    from rtsa_spark.operators.sketch import cm_bucket_sketch, cm_estimate

    words = ("alpha beta gamma delta epsilon zeta eta theta " * 3).split()
    df = spark.createDataFrame(
        [("s1", 0, w) for w in words], "g string, d long, item string"
    )
    sk = cm_bucket_sketch(df, ["g"], "d", "item", d_rows=2, w_cols=2)
    probes = spark.createDataFrame(
        [(w,) for w in set(words) | {"missing"}], "item string"
    )
    exact = {w: words.count(w) for w in set(words)}
    exact["missing"] = 0
    for r in cm_estimate(sk, probes, d_rows=2, w_cols=2).collect():
        assert r["est_count"] >= exact[r["item"]], r["item"]


def test_cm_merge_equals_direct_sketch(spark):
    """Cell-wise merge of per-day sketches is EXACTLY the sketch built
    from the union stream — the cascade identity that lets coarse tiers
    skip the raw re-scan."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import cm_bucket_sketch, cm_merge_buckets

    rows = []
    for d, ws in [(1, "a a b"), (2, "b c c c"), (3, "a d")]:
        rows += [("s1", d, w) for w in ws.split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = cm_bucket_sketch(df, ["g"], "d", "item", d_rows=4, w_cols=8)
    merged = cm_merge_buckets(daily, ["g"], F.lit(0)).collect()[0]
    direct = cm_bucket_sketch(
        df.withColumn("z", F.lit(0)), ["g"], "z", "item", d_rows=4, w_cols=8
    ).collect()[0]
    assert merged["cm"] == direct["cm"]
    assert merged["n_items"] == direct["n_items"] == 9


def test_cm_sketch_validation(spark):
    import pytest as _pytest

    from rtsa_spark.operators.sketch import cm_bucket_sketch

    df = spark.createDataFrame([("s", 0, "a")], "g string, d long, item string")
    with _pytest.raises(ValueError):
        cm_bucket_sketch(df, ["g"], "d", "item", d_rows=0)
    with _pytest.raises(ValueError):
        cm_bucket_sketch(df, ["g"], "d", "item", w_cols=1)


def test_bloom_no_false_negatives_and_exact_cardinality(spark):
    """Every inserted item probes maybe=True even at a width that forces
    collisions; n_distinct is the exact distinct count; unused high bits
    (>= 2^32) never light up."""
    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_maybe_contains,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta " * 2).split()
    df = spark.createDataFrame(
        [("s1", 0, w) for w in words], "g string, d long, item string"
    )
    sk = bloom_bucket_sketch(df, ["g"], "d", "item", m_bits=32, k_hash=2)
    r = sk.collect()[0]
    assert r["n_distinct"] == 8
    assert all(0 <= w_ < (1 << 32) for w_ in r["bloom"])
    probes = spark.createDataFrame([(w,) for w in set(words)], "item string")
    got = bloom_maybe_contains(sk, probes, m_bits=32, k_hash=2).collect()
    assert all(x["maybe"] for x in got)


def test_bloom_absent_items_mostly_false_when_wide(spark):
    """With a wide filter, absent probes read False (and a forced-narrow
    filter shows at least the guarantee direction: no False for present)."""
    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_maybe_contains,
    )

    df = spark.createDataFrame(
        [("s1", 0, w) for w in ["a", "b", "c"]],
        "g string, d long, item string",
    )
    sk = bloom_bucket_sketch(df, ["g"], "d", "item", m_bits=4096, k_hash=3)
    probes = spark.createDataFrame(
        [(f"absent_{i}",) for i in range(50)] + [("a",)], "item string"
    )
    got = {
        x["item"]: x["maybe"]
        for x in bloom_maybe_contains(sk, probes, m_bits=4096, k_hash=3).collect()
    }
    assert got["a"] is True
    # 3 items in 4096 bits: P(false positive) ~ (3*3/4096)^3 ~ 1e-8 per
    # probe — all 50 absent probes must read False.
    assert sum(v for k_, v in got.items() if k_ != "a") == 0


def test_bloom_merge_equals_direct_sketch(spark):
    """Word-wise bit_or merge of per-day filters is EXACTLY the filter
    built from the union stream."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import (
        bloom_bucket_sketch,
        bloom_merge_buckets,
    )

    rows = []
    for d, ws in [(1, "a a b"), (2, "b c c c"), (3, "a d")]:
        rows += [("s1", d, w) for w in ws.split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = bloom_bucket_sketch(df, ["g"], "d", "item", m_bits=64, k_hash=4)
    merged = bloom_merge_buckets(daily, ["g"], F.lit(0)).collect()[0]
    direct = bloom_bucket_sketch(
        df.withColumn("z", F.lit(0)), ["g"], "z", "item", m_bits=64, k_hash=4
    ).collect()[0]
    assert merged["bloom"] == direct["bloom"]


def test_bloom_validation(spark):
    import pytest as _pytest

    from rtsa_spark.operators.sketch import bloom_bucket_sketch

    df = spark.createDataFrame([("s", 0, "a")], "g string, d long, item string")
    with _pytest.raises(ValueError):
        bloom_bucket_sketch(df, ["g"], "d", "item", m_bits=100)
    with _pytest.raises(ValueError):
        bloom_bucket_sketch(df, ["g"], "d", "item", m_bits=0)
    with _pytest.raises(ValueError):
        bloom_bucket_sketch(df, ["g"], "d", "item", k_hash=0)


def test_mg_exact_when_few_items(spark):
    """With <= k distinct items nothing is decremented: weights are the
    exact counts, slack 0, and a sentinel row still marks the bucket."""
    from rtsa_spark.operators.sketch import mg_bucket_sketch

    rows = [("s1", 0, w) for w in "a a a b c a b".split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    got = mg_bucket_sketch(df, ["g"], "d", "item", k=8).collect()
    items = {r["item"]: (r["w"], r["slack"]) for r in got if r["item"]}
    assert items == {"a": (4, 0), "b": (2, 0), "c": (1, 0)}
    assert sum(1 for r in got if r["item"] is None) == 1  # sentinel


def test_mg_bounds_and_heavy_survivor(spark):
    """k=2 over a skewed stream: every surviving weight w satisfies
    w <= true <= w + slack; absent items satisfy true <= slack; and the
    dominant item (count > n/(k+1)) always survives."""
    from rtsa_spark.operators.sketch import mg_bucket_sketch

    words = ("x " * 30 + "y " * 9 + "p q r s t u v w " * 2).split()
    exact = {w: words.count(w) for w in set(words)}
    df = spark.createDataFrame(
        [("s1", 0, w) for w in words], "g string, d long, item string"
    )
    got = mg_bucket_sketch(df, ["g"], "d", "item", k=2).collect()
    slack = [r["slack"] for r in got if r["item"] is None][0]
    surv = {r["item"]: r["w"] for r in got if r["item"]}
    assert len(surv) <= 2
    assert "x" in surv  # 30 > 55/3, must survive
    for it, w in surv.items():
        assert w <= exact[it] <= w + slack, (it, w, slack)
    for it, c in exact.items():
        if it not in surv:
            assert c <= slack, (it, c, slack)


def test_mg_merge_bound_vs_union_stream(spark):
    """Merging daily summaries keeps the undercount bound against exact
    counts of the UNION stream, sums the fine slacks, and the dominant
    item survives the cascade."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_bucket_sketch, mg_merge_buckets

    days = {
        1: ("hot " * 20 + "a b c d e f " * 2).split(),
        2: ("hot " * 15 + "b c d e f g h " * 2).split(),
        3: ("hot " * 25 + "a c e g i k " * 3).split(),
    }
    rows = [("s1", d, w) for d, ws in days.items() for w in ws]
    exact = {}
    for ws in days.values():
        for w in ws:
            exact[w] = exact.get(w, 0) + 1
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = mg_bucket_sketch(df, ["g"], "d", "item", k=3)
    merged = mg_merge_buckets(daily, ["g"], F.lit(0), k=3).collect()
    slack = [r["slack"] for r in merged if r["item"] is None][0]
    surv = {r["item"]: r["w"] for r in merged if r["item"]}
    assert "hot" in surv and len(surv) <= 3
    for it, w in surv.items():
        assert w <= exact[it] <= w + slack, (it, w, slack)
    for it, c in exact.items():
        if it not in surv:
            assert c <= slack, (it, c, slack)
    # all sentinel slacks are identical per bucket (denormalized scalar)
    assert len({r["slack"] for r in merged}) == 1


def test_mg_empty_fine_sketch_keeps_slack(spark):
    """A fine bucket whose sketch prunes to sentinel-only still
    contributes its slack to the merge (the bound survives)."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_bucket_sketch, mg_merge_buckets

    # day 1: four items with equal counts, k=1 -> v equals every count,
    # all residuals 0 -> sentinel-only sketch with slack 3
    rows = [("s1", 1, w) for w in ("a a a b b b c c c d d d").split()]
    rows += [("s1", 2, w) for w in ("z z z z z a").split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = mg_bucket_sketch(df, ["g"], "d", "item", k=1)
    d1 = [r for r in daily.collect() if r["bucket"] == 1]
    assert all(r["item"] is None for r in d1) and d1[0]["slack"] == 3
    merged = mg_merge_buckets(daily, ["g"], F.lit(0), k=1).collect()
    slack = [r["slack"] for r in merged if r["item"] is None][0]
    exact = {"a": 4, "b": 3, "c": 3, "d": 3, "z": 5}
    surv = {r["item"]: r["w"] for r in merged if r["item"]}
    for it, c in exact.items():
        w = surv.get(it, 0)
        assert w <= c <= w + slack, (it, w, c, slack)


def test_mg_validation(spark):
    import pytest as _pytest

    from rtsa_spark.operators.sketch import mg_bucket_sketch

    df = spark.createDataFrame([("s", 0, "a")], "g string, d long, item string")
    with _pytest.raises(ValueError):
        mg_bucket_sketch(df, ["g"], "d", "item", k=0)


def _brute_topk(counts, k):
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_mg_certified_topk_matches_bruteforce_when_certified(spark):
    """Skewed daily counts, generous mg_k: the cascade's top-k is
    certified and equals the brute-force exact top-k item for item."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_certified_topk

    days = {
        1: {"hot": 40, "warm": 20, "a": 2, "b": 1, "c": 1},
        2: {"hot": 35, "warm": 25, "mild": 10, "d": 1},
        3: {"hot": 50, "mild": 15, "warm": 5, "e": 2},
    }
    rows = [("s1", d, it, c) for d, cs in days.items() for it, c in cs.items()]
    fc = spark.createDataFrame(rows, "g string, bucket long, item string, c long")
    got = mg_certified_topk(
        fc, ["g"], F.lit(0), topk=3, mg_k=8
    ).orderBy("rank").collect()
    total = {}
    for cs in days.values():
        for it, c in cs.items():
            total[it] = total.get(it, 0) + c
    want = _brute_topk(total, 3)
    assert [(r["item"], r["exact_c"]) for r in got] == want
    assert all(r["certified"] for r in got)
    # exact_c really is the exact coarse count, not the MG residual
    assert got[0]["exact_c"] == total["hot"]


def test_mg_certified_topk_refuses_when_slack_dominates(spark):
    """mg_k barely above topk on a flat distribution: slack swamps the
    k-th count, so the certificate must come back False."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_certified_topk

    rows = []
    for d in range(1, 4):
        rows.append(("s1", d, "hot", 10))  # survives every daily prune
        for i in range(12):
            rows.append(("s1", d, f"it{i:02d}", 3 + (i + d) % 2))
    fc = spark.createDataFrame(rows, "g string, bucket long, item string, c long")
    got = mg_certified_topk(fc, ["g"], F.lit(0), topk=2, mg_k=2).collect()
    assert got and not any(r["certified"] for r in got)
    # a fully-pruned cascade (no flat item survives any day) yields an
    # EMPTY result — nothing certifiable, documented behavior
    flat = spark.createDataFrame(
        [r for r in rows if r[2] != "hot"],
        "g string, bucket long, item string, c long",
    )
    assert mg_certified_topk(flat, ["g"], F.lit(0), topk=2, mg_k=2).count() == 0


def test_mg_certified_topk_exact_small_vocab(spark):
    """Vocabulary under mg_k: slack is 0, everything is certified, and
    fewer-than-topk rows come back when the vocab is smaller than topk."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_certified_topk

    rows = [("s1", 1, "x", 5), ("s1", 2, "x", 2), ("s1", 2, "y", 4)]
    fc = spark.createDataFrame(rows, "g string, bucket long, item string, c long")
    got = mg_certified_topk(fc, ["g"], F.lit(0), topk=5, mg_k=6).orderBy(
        "rank"
    ).collect()
    assert [(r["item"], r["exact_c"], r["slack"]) for r in got] == [
        ("x", 7, 0), ("y", 4, 0)
    ]
    assert all(r["certified"] for r in got)


def test_mg_certified_topk_validation(spark):
    import pytest as _pytest

    from rtsa_spark.operators.sketch import mg_certified_topk

    df = spark.createDataFrame([("s", 1, "a", 1)], "g string, bucket long, item string, c long")
    import pyspark.sql.functions as F
    with _pytest.raises(ValueError):
        mg_certified_topk(df, ["g"], F.lit(0), topk=0)
    with _pytest.raises(ValueError):
        mg_certified_topk(df, ["g"], F.lit(0), topk=5, mg_k=3)


def test_mg_trailing_topk_bound_per_window(spark):
    """Every trailing window keeps w <= true <= w + slack against the
    window's union stream; a token hot only in recent days dominates
    only the windows that contain them; no phantom windows past the
    data's end; same-slack days both count."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import mg_bucket_sketch, mg_trailing_topk

    days = {
        1: "a a a a b c d e".split(),
        2: "a a a a b c d f".split(),   # same slack shape as day 1
        3: ("hot " * 10 + "a b").split(),
        4: ("hot " * 12 + "x y z").split(),
    }
    rows = [("s1", d, w) for d, ws in days.items() for w in ws]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = mg_bucket_sketch(df, ["g"], "d", "item", k=2)
    got = mg_trailing_topk(daily, ["g"], window_buckets=3, k=2).collect()
    wins = sorted({r["bucket"] for r in got})
    assert wins == [1, 2, 3, 4]  # no 5/6 phantom windows
    for wb in wins:
        lo = wb - 2
        exact = {}
        for d in range(lo, wb + 1):
            for w in days.get(d, []):
                exact[w] = exact.get(w, 0) + 1
        rows_w = [r for r in got if r["bucket"] == wb]
        slack = [r["slack"] for r in rows_w if r["item"] is None][0]
        surv = {r["item"]: r["w"] for r in rows_w if r["item"]}
        for it, c in exact.items():
            w_ = surv.get(it, 0)
            assert w_ <= c <= w_ + slack, (wb, it, w_, c, slack)
    # the hot token rules exactly the windows containing days 3/4
    hot_wins = {
        r["bucket"] for r in got if r["item"] == "hot" and r["w"] > 0
    }
    assert hot_wins == {3, 4}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mg_trailing_topk(daily, ["g"], window_buckets=0)


def test_sample_sketch_merge_equals_direct(spark):
    """Bottom-k item samples cascade exactly: merged == direct build
    over the union stream, dedup across days, rank by hash."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import (
        sample_bucket_sketch,
        sample_merge_buckets,
    )

    rows = []
    for d, ws in [(1, "a b c d e"), (2, "c d e f g"), (3, "a g h i")]:
        rows += [("s1", d, w) for w in ws.split()]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = sample_bucket_sketch(df, ["g"], "d", "item", k=3)
    assert daily.groupBy("bucket").count().agg(
        F.max("count")
    ).collect()[0][0] <= 3
    merged = sorted(
        (r["rank"], r["item"])
        for r in sample_merge_buckets(daily, ["g"], F.lit(0), k=3).collect()
    )
    direct = sorted(
        (r["rank"], r["item"])
        for r in sample_bucket_sketch(
            df.withColumn("z", F.lit(0)), ["g"], "z", "item", k=3
        ).collect()
    )
    assert merged == direct and len(merged) == 3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_bucket_sketch(df, ["g"], "d", "item", k=0)


def test_sample_merge_identity_needs_coarse_k_at_most_fine_k(spark):
    """Coarse k <= fine k: merged sample == direct global sample.
    The converse (coarse k > fine k) can MISS globally-low items that
    never make a daily cut — documented precondition, demonstrated."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import (
        _h48,
        sample_bucket_sketch,
        sample_merge_buckets,
    )

    # 40 items spread over 4 days, 10 each (disjoint), plus one item
    # present EVERY day but never in a daily bottom-2
    items = [f"w{i:02d}" for i in range(40)]
    rows = []
    for d in range(4):
        rows += [("s1", d, it) for it in items[d * 10:(d + 1) * 10]]
    df = spark.createDataFrame(rows, "g string, d long, item string")
    daily = sample_bucket_sketch(df, ["g"], "d", "item", k=4)
    direct2 = sample_bucket_sketch(
        df.withColumn("z", F.lit(0)), ["g"], "z", "item", k=2
    )
    merged2 = sample_merge_buckets(daily, ["g"], F.lit(0), k=2)
    assert sorted(r["item"] for r in merged2.collect()) == sorted(
        r["item"] for r in direct2.collect()
    )
    # coarse k(16) > fine k(4): the merge CANNOT reconstruct the direct
    # global bottom-16 (only 4 survivors per day exist to merge)
    assert sample_merge_buckets(daily, ["g"], F.lit(0), k=16).count() == 16
    direct16 = sample_bucket_sketch(
        df.withColumn("z", F.lit(0)), ["g"], "z", "item", k=16
    )
    m16 = {r["item"] for r in
           sample_merge_buckets(daily, ["g"], F.lit(0), k=16).collect()}
    d16 = {r["item"] for r in direct16.collect()}
    assert m16 != d16  # the documented failure mode, pinned


def test_histogram_emd_hand(spark):
    from rtsa_spark.operators.distribution import histogram_emd

    # period 1: values at bin 0 (x4); period 2: values at bin 3 (x4)
    # -> every unit of mass moves 3 bins: W1 = 3 * bin_width = 30
    rows = [("k", 1, v) for v in (0, 1, 2, 3)] + [
        ("k", 2, v) for v in (30, 31, 32, 33)
    ]
    df = spark.createDataFrame(rows, "k string, p long, v long")
    r = histogram_emd(df, "k", "p", "v", bin_width=10).collect()[0]
    assert (r["period"], r["prev_period"]) == (2, 1)
    assert r["n_cur"] == 4 and r["n_prv"] == 4
    assert r["emd_e6"] == 30 * 1_000_000

    # identical distributions -> 0
    same = [("k", p, v) for p in (1, 2) for v in (5, 15, 25)]
    df2 = spark.createDataFrame(same, "k string, p long, v long")
    assert histogram_emd(df2, "k", "p", "v", 10).collect()[0]["emd_e6"] == 0

    # partial shift, python reference on the CDF-gap identity
    rows3 = [("k", 1, v) for v in (0, 0, 10)] + [("k", 2, v) for v in (0, 10, 10)]
    df3 = spark.createDataFrame(rows3, "k string, p long, v long")
    got = histogram_emd(df3, "k", "p", "v", 10).collect()[0]
    # bins: {0: cA=2 cB=1, 1: cA=1 cB=2}; cum at bin0: A2 B1 -> |2*3-1*3|*1=3
    # emd = 1e6*10*3 // (3*3) = 3_333_333
    assert got["emd_e6"] == (1_000_000 * 10 * 3) // 9
    import pytest as _pt

    with _pt.raises(ValueError):
        histogram_emd(df3, "k", "p", "v", 0)


def test_cm_mg_weight_col_seam_matches_raw_counts(spark):
    """r6 internals change: cm/mg bucket sketches accept pre-counted
    (key, bucket, item) input via ``weight_col`` (so one counted token
    table can feed the sketch AND its exact twin). Sketches must be
    bit-identical to the raw-stream build."""
    import pyspark.sql.functions as F

    from rtsa_spark.operators.sketch import cm_bucket_sketch, mg_bucket_sketch

    rows = [
        ("g", b, f"it{(i * 7 + b) % 5}")
        for b in (1, 2)
        for i in range(40)
    ]
    ev = spark.createDataFrame(rows, "g string, b long, item string")
    wc = ev.groupBy("g", "b", "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )

    key = lambda r: (r["g"], r["bucket"])  # noqa: E731
    cm_a = sorted(
        cm_bucket_sketch(ev, ["g"], "b", "item", d_rows=3, w_cols=8).collect(),
        key=key,
    )
    cm_b = sorted(
        cm_bucket_sketch(
            wc, ["g"], "b", "item", d_rows=3, w_cols=8, weight_col="c"
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in cm_a] == [tuple(r) for r in cm_b]

    mkey = lambda r: (r["g"], r["bucket"], r["item"] or "", r["w"])  # noqa: E731
    mg_a = sorted(
        mg_bucket_sketch(ev, ["g"], "b", "item", k=3).collect(), key=mkey
    )
    mg_b = sorted(
        mg_bucket_sketch(wc, ["g"], "b", "item", k=3, weight_col="c").collect(),
        key=mkey,
    )
    assert [tuple(r) for r in mg_a] == [tuple(r) for r in mg_b]


def test_fan_out_scan_spreads_small_scan_and_keeps_rows(spark, tmp_path):
    """r6: fan_out_scan must raise the partition count of a small
    single-file scan (the single-row-group input pathology) without
    changing the rows, and pass wide inputs through untouched."""
    import pyspark.sql.functions as F

    from rtsa_spark.plans.spread import fan_out_scan

    p = str(tmp_path / "one_file")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = fan_out_scan(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))
    # a non-scan plan with no stats estimate must be returned unchanged
    assert fan_out_scan(df, parallelism=1) is df


def test_sketch_hash_seam_xxhash64_family(spark):
    """r6 (verdict ask): the sketch-family hash seam. md5 stays the
    oracle-portable default; hash_fn='xxhash64' is the scale mode (one
    codegen integer hash, no hex strings). Every estimator bound and
    merge identity must hold under BOTH families — only the concrete
    cell values may differ."""
    import pyspark.sql.functions as F
    import pytest as _pt

    from rtsa_spark.operators.sketch import (
        _h48,
        bloom_bucket_sketch,
        bloom_maybe_contains,
        cm_bucket_sketch,
        cm_estimate,
        hll_bucket_sketch,
        kmv_bucket_sketch,
    )

    rows = [("g", b, f"item{i % 97}") for b in (1, 2) for i in range(400)]
    ev = spark.createDataFrame(rows, "g string, b long, item string")
    exact = ev.groupBy("g", "item").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    probes = ev.select("item").distinct()

    for fn in ("md5", "xxhash64"):
        # KMV: exact below k, hash range respected
        kmv = kmv_bucket_sketch(ev, ["g"], "b", "item", k=128, hash_fn=fn)
        for r in kmv.collect():
            assert r["est_distinct"] == 97, (fn, r)
            assert all(0 <= h < (1 << 48) for h in r["kmv"])
        # CM: one-sided bound est >= exact under both hash families
        cm = cm_bucket_sketch(ev, ["g"], "b", "item", d_rows=3, w_cols=16,
                              hash_fn=fn)
        est = cm_estimate(
            cm.where(F.col("bucket") == 1), probes, d_rows=3, w_cols=16,
            hash_fn=fn,
        )
        viol = est.join(
            ev.where("b = 1").groupBy("g", "item").agg(
                F.count(F.lit(1)).cast("bigint").alias("x")
            ),
            ["g", "item"],
        ).where("est_count < x").count()
        assert viol == 0, fn
        # Bloom: zero false negatives
        bl = bloom_bucket_sketch(ev, ["g"], "b", "item", m_bits=256,
                                 k_hash=3, hash_fn=fn)
        miss = bloom_maybe_contains(
            bl.where("bucket = 1"), probes, m_bits=256, k_hash=3, hash_fn=fn
        ).where("NOT maybe").count()
        assert miss == 0, fn
        # HLL: raw estimate in a loose band of the exact 97 (p=4 keeps
        # 97 distinct inside the raw estimator's valid >= 2.5m regime)
        hll = hll_bucket_sketch(ev, ["g"], "b", "item", p=4, hash_fn=fn)
        for r in hll.select("est_distinct").collect():
            assert 40 <= r["est_distinct"] <= 250, (fn, r)

    # the two families must actually differ (the seam is real)
    a = kmv_bucket_sketch(ev, ["g"], "b", "item", k=8, hash_fn="md5")
    b = kmv_bucket_sketch(ev, ["g"], "b", "item", k=8, hash_fn="xxhash64")
    ra = a.orderBy("g", "bucket").collect()
    rb = b.orderBy("g", "bucket").collect()
    assert [r["kmv"] for r in ra] != [r["kmv"] for r in rb]
    with _pt.raises(ValueError):
        _h48(F.lit("x"), "sha1")
