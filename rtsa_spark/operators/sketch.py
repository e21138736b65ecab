"""Mergeable cardinality / concentration sketches over token streams:
K-minimum-values distinct-count estimation and Simpson-index vocabulary
concentration, per key.

Extends the tier sketch surface (``rollup.token_histogram`` — frequency
top-k) with the other two questions a 100 TB corpus pipeline asks of a
token column: HOW MANY distinct tokens (KMV, Bar-Yossef et al. 2002 —
the k smallest hash values of a set are a uniform order-statistic sample,
so ``(k-1) * H / h_(k)`` estimates cardinality for hash range ``H``) and
how CONCENTRATED the distribution is (Simpson/Gini impurity
``1 - sum(p_i^2)`` and its inverse, "effective vocabulary" — both exact
rational in the counts, no logs, unlike Shannon entropy whose ``ln`` is
not correctly rounded cross-engine).

IEEE-deterministic contract (CLAUDE.md): everything is integer
arithmetic end-to-end.  The KMV hash is the portable 48-bit md5 prefix
(same seam as the synthetic media timestamps / chunk hashes — both
engines parse 12 hex chars), the estimator is an integer ``div``
(``(k-1)*2^48`` fits BIGINT for any practical k), and the concentration
ratios are scaled-integer ``div``s of exact sums — ANSI overflow throws
loudly if a key's token count passes ~3e6 at the e6 scale rather than
silently rounding.

Scale shape (KMV): one distinct on (key, hash) — map-side partial
dedup does the heavy lifting — then a per-key window keeps k rows, then
a map-side-combinable agg.  The sketch itself is mergeable: the k
smallest hashes of a union are a subset of the union of each side's k
smallest, so tier cascades can combine sketches without revisiting raw
data (pytest pins this).  Concentration: two map-side-combinable aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "gini_concentration",
    "value_histogram",
    "log2_histogram",
    "histogram_quantiles",
    "kmv_bucket_sketch",
    "kmv_merge_buckets",
    "kmv_intersect",
    "cm_bucket_sketch",
    "cm_merge_buckets",
    "cm_estimate",
    "bloom_bucket_sketch",
    "bloom_merge_buckets",
    "bloom_maybe_contains",
    "mg_bucket_sketch",
    "mg_merge_buckets",
    "mg_certified_topk",
    "mg_trailing_topk",
    "sample_bucket_sketch",
    "sample_merge_buckets",
    "hll_bucket_sketch",
    "hll_merge_buckets",
    "hll_corrected",
    "hll_trailing_distinct",
    "KMV_HASH_RANGE",
    "BLOOM_WORD_BITS",
]

#: Hash range of the portable 48-bit md5-prefix hash (exclusive upper bound).
KMV_HASH_RANGE = 1 << 48


def _h48(col: F.Column, hash_fn: str = "md5") -> F.Column:
    """48-bit item hash in [0, 2^48) — the sketch-family hash seam.

    - ``"md5"`` (default, the cross-engine ORACLE mode): first 12 hex
      chars of md5, as BIGINT. md5 emits lowercase hex in both Spark and
      DuckDB; 48 bits keeps the parse exact in either engine's signed
      64-bit integers. This is what every DuckDB correctness twin
      replays byte-for-byte.
    - ``"xxhash64"`` (the 100-TB SCALE mode): low 48 bits of the JVM
      xxhash64 — one codegen'd integer hash, no hex-string
      materialization, ~8x cheaper per item (r5/r6 verdict ask; same
      seam dedup.minhash_signatures already exposes). Identical range
      and uniformity, so every estimator bound/identity holds unchanged
      — only the concrete cell/bucket values differ, which is why the
      oracle-pinned entry queries stay on md5.
    """
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
        ).cast("bigint")
    if hash_fn == "xxhash64":
        return F.xxhash64(col.cast("string")).bitwiseAND(
            F.lit((1 << 48) - 1)
        ).cast("bigint")
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def kmv_distinct(
    df: DataFrame, key_col: str, item_col: str, k: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per key.

    Emits ``(key, k_used, h_kth, est_distinct)``: the k smallest 48-bit
    item hashes' count and max, and the cardinality estimate
    ``(k-1) * 2^48 div h_(k)`` — or the EXACT distinct count when the
    key has fewer than k distinct items (the sketch degenerates to the
    full hash set, so the count is exact, the honest answer).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    dist = df.select(
        F.col(key_col).alias("key"),
        _h48(F.col(item_col), hash_fn).alias("_h"),
    ).distinct()
    w = Window.partitionBy("key").orderBy("_h")
    sk = dist.select("key", "_h", F.row_number().over(w).alias("_rn")).where(
        F.col("_rn") <= k
    )
    agg = sk.groupBy("key").agg(
        F.count(F.lit(1)).alias("k_used"), F.max("_h").alias("h_kth")
    )
    # greatest(h_kth, 1): an all-zero md5 prefix is astronomically
    # unlikely but must not divide by zero under ANSI.
    return agg.select(
        "key",
        "k_used",
        "h_kth",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.expr(f"({k - 1} * {KMV_HASH_RANGE}) div greatest(h_kth, 1)")
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


def value_histogram(
    df: DataFrame, key_col: str, value_col: str, bin_width: int
) -> DataFrame:
    """Fixed-width value histogram per key: ``(key, bin, cnt)`` with
    ``bin = floor(value / bin_width)`` (Python floor semantics for
    negative values — pmod keeps the remainder nonnegative, so the div
    is exact in both engines).

    This is the mergeable quantile sketch for the tier cascade: bins are
    additive under union (map-sum, like the token histogram), the sketch
    is bounded by value range / bin_width regardless of row count, and
    :func:`histogram_quantiles` reads any quantile off the merged sketch
    with error at most one bin width.  The scale path where the exact
    type-7 percentiles (``operators/sessionize.tier_percentiles``) would
    need a full per-key sort of 100 TB.
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    pre = df.select(
        F.col(key_col).alias("key"), F.col(value_col).cast("bigint").alias("_v")
    )
    # Integer `div` (never float divide): (_v - pmod) is exactly divisible,
    # and pmod keeps the remainder nonnegative so this floors like Python.
    binned = pre.select(
        "key",
        F.expr(
            f"(_v - pmod(_v, {int(bin_width)})) div {int(bin_width)}"
        ).alias("bin"),
    )
    return binned.groupBy("key", "bin").agg(F.count(F.lit(1)).alias("cnt"))


def log2_histogram(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Base-2 exponential value histogram per key — the OTel-style
    log-width sketch (public shape: OpenTelemetry exponential histograms,
    scale 0): ``(key..., sign, mag, lo, hi, cnt)`` where ``sign`` is -1/0/1,
    ``mag = floor(log2(|v|))`` for nonzero values via the exact whole-bit
    identity ``len(bin(|v|)) - 1`` (see ``rollup.unigram_surprisal`` —
    never a float log), and ``[lo, hi]`` the signed inclusive value range
    of the bucket (``[2^mag, 2^(mag+1)-1]`` mirrored for sign=-1; zero
    gets its own ``[0, 0]`` bucket).

    Where :func:`value_histogram` needs range/bin_width bins, this one
    covers ANY value range in at most ~2*53 buckets per key — the sketch
    for long-tailed distributions (latencies, token counts, balances)
    whose range isn't known up front.  Counts are additive, so the
    cascade merge is a plain map-sum groupBy — exactly mergeable, like
    every sketch in this module.  Bound: ``|v| < 2^53`` (the repo-wide
    exact-int domain; ``abs`` of a wider value would risk ANSI overflow
    at the long minimum).
    """
    pre = df.select(
        *key_cols, F.col(value_col).cast("bigint").alias("_v")
    )
    a = F.abs(F.col("_v"))
    mag = F.when(
        F.col("_v") == 0, F.lit(0).cast("bigint")
    ).otherwise((F.length(F.bin(a)) - 1).cast("bigint"))
    binned = pre.select(
        *key_cols,
        F.signum("_v").cast("bigint").alias("sign"),
        mag.alias("mag"),
    )
    counted = binned.groupBy(*key_cols, "sign", "mag").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    lo_mag = F.expr("shiftleft(1, cast(mag as int))").cast("bigint")
    hi_mag = (F.expr("shiftleft(1, cast(mag as int) + 1)") - 1).cast("bigint")
    return counted.select(
        *key_cols,
        "sign",
        "mag",
        F.when(F.col("sign") == 0, F.lit(0))
        .when(F.col("sign") > 0, lo_mag)
        .otherwise(-hi_mag)
        .cast("bigint")
        .alias("lo"),
        F.when(F.col("sign") == 0, F.lit(0))
        .when(F.col("sign") > 0, hi_mag)
        .otherwise(-lo_mag)
        .cast("bigint")
        .alias("hi"),
        "cnt",
    )


def histogram_quantiles(
    hist: DataFrame, qs_e3: list[int], bin_width: int
) -> DataFrame:
    """Quantiles from a :func:`value_histogram` sketch (or a map-sum
    merge of several): for each ``q`` (permille), the lower bound of the
    first bin whose cumulative count reaches ``ceil(q/1000 * n)`` — the
    inverted-CDF (type-1) estimate, integer arithmetic end to end.

    Emits ``(key, q_e3, n, bin_lo)``; ``bin_lo = bin * bin_width`` is a
    lower bound on the true quantile, tight to one bin width.
    """
    if not qs_e3 or any(not 0 < int(q) <= 1000 for q in qs_e3):
        raise ValueError(f"qs_e3 must be permilles in (0, 1000], got {qs_e3}")
    qs = sorted({int(q) for q in qs_e3})
    w = Window.partitionBy("key").orderBy("bin")
    cum = hist.select(
        "key",
        "bin",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy("key")).alias("n"),
    )
    q = F.explode(
        F.array(*[F.lit(int(v)).cast("bigint") for v in qs])
    ).alias("q_e3")
    expanded = cum.select("key", "bin", "_cum", "n", q)
    # ceil(q*n/1000) as exact ints; first bin with _cum >= threshold
    thr = F.expr("(q_e3 * n + 999) div 1000")
    hit = expanded.where(F.col("_cum") >= thr)
    first = hit.groupBy("key", "q_e3", "n").agg(F.min("bin").alias("_bin"))
    return first.select(
        "key",
        "q_e3",
        "n",
        (F.col("_bin") * bin_width).cast("bigint").alias("bin_lo"),
    )


def gini_concentration(
    df: DataFrame, key_col: str, item_col: str
) -> DataFrame:
    """Simpson-index token concentration per key, exact scaled integers.

    Emits ``(key, n_items, n_distinct, sum_c2, gini_e6, eff_vocab_e3)``
    where ``gini_e6 = 1e6 * (S^2 - sum c_i^2) div S^2`` (Gini impurity:
    0 = all mass on one token, -> 1e6 = uniform over many) and
    ``eff_vocab_e3 = 1e3 * S^2 div sum c_i^2`` (inverse Simpson, the
    "effective number of distinct tokens" — equals ``1e3 * n_distinct``
    exactly when the distribution is uniform).
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(item_col).alias("_it")
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = counts.groupBy("key").agg(
        F.sum("_c").alias("n_items"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("_c") * F.col("_c")).alias("sum_c2"),
    )
    return agg.select(
        "key",
        "n_items",
        "n_distinct",
        "sum_c2",
        F.expr(
            "(1000000 * (n_items * n_items - sum_c2))"
            " div (n_items * n_items)"
        ).alias("gini_e6"),
        F.expr("(1000 * n_items * n_items) div sum_c2").alias("eff_vocab_e3"),
    )


def kmv_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    k: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-(key, bucket) KMV sketch as a mergeable column — the
    distinct-count answer the rollup ladder cannot get from plain sums
    (COUNT DISTINCT is not distributive; the k smallest hashes ARE:
    kmin_k(A ∪ B) = kmin_k(kmin_k(A) ∪ kmin_k(B)), exactly).

    Emits ``(keys..., bucket, kmv array<bigint> ascending, k_used,
    h_kth, est_distinct)`` with the same estimator contract as
    :func:`kmv_distinct` (exact below k).

    Scale shape: distinct on (keys, bucket, h48) — one map-side-combined
    shuffle — then a per-bucket window keeps only k rows before the
    array materializes, so no unbounded collect ever happens; the
    sketch column is ≤ k BIGINTs per bucket.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    dist = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        _h48(F.col(item_col), hash_fn).alias("_h"),
    ).distinct()
    w = Window.partitionBy(*key_cols, "bucket").orderBy("_h")
    sk = dist.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = sk.groupBy(*key_cols, "bucket").agg(
        F.sort_array(F.collect_list("_h")).alias("kmv")
    )
    return _kmv_finish(agg, k)


def kmv_merge_buckets(
    sketches: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
    k: int = 64,
) -> DataFrame:
    """Cascade a bucketed KMV sketch to a coarser tier WITHOUT touching
    raw data: union the fine sketches' hash sets, keep the k smallest.
    Input is ``kmv_bucket_sketch`` output; ``coarse_bucket`` maps the
    fine bucket to its coarse one (e.g. ``F.date_trunc('month',
    F.col('bucket'))``).  Exact-merge identity: the result's ``h_kth``
    and estimate equal a direct sketch over the combined span
    (pytest-pinned), so monthly distincts cost days x k values, not a
    raw re-scan.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ex = sketches.select(
        *key_cols,
        coarse_bucket.alias("bucket"),
        F.explode("kmv").alias("_h"),
    ).distinct()
    w = Window.partitionBy(*key_cols, "bucket").orderBy("_h")
    sk = ex.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = sk.groupBy(*key_cols, "bucket").agg(
        F.sort_array(F.collect_list("_h")).alias("kmv")
    )
    return _kmv_finish(agg, k)


def _kmv_finish(agg: DataFrame, k: int) -> DataFrame:
    """Attach (k_used, h_kth, est_distinct) to a kmv array column."""
    return agg.select(
        "*",
        F.size("kmv").cast("bigint").alias("k_used"),
        F.element_at("kmv", F.size("kmv")).cast("bigint").alias("h_kth"),
    ).withColumn(
        "est_distinct",
        F.when(F.col("k_used") < k, F.col("k_used"))
        .otherwise(
            F.expr(f"({k - 1} * {KMV_HASH_RANGE}) div greatest(h_kth, 1)")
        )
        .cast("bigint"),
    )


def kmv_intersect(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimation straight from KMV sketches — the
    theta-sketch intersection move (Dasgupta et al. 2016, "Theta-Sketch
    Framework"): for groups A, B with k-min-value sketches, the k
    smallest hashes of the UNION are a uniform sample of A ∪ B, so the
    fraction of that sample present in BOTH sketches estimates Jaccard,
    and ``jaccard * est_union`` estimates the intersection size. The
    sketch counterpart of ``rollup.vocab_overlap``'s exact join: at
    100 TB the exact path re-shuffles the full vocabularies, this one
    joins k-BIGINT arrays per group pair.

    All arithmetic is exact-int on the shared 48-bit md5 hash space:
    ``est_union = (k-1) * 2^48 div theta`` (``theta`` = k-th union
    hash), ``jaccard_e6 = 10^6 * matches div |S|``, ``est_intersect =
    matches * est_union div |S|``. When the union sample holds fewer
    than k hashes both estimates are EXACT (the sketches saw every
    element). Pairs are emitted once (``g1 < g2``).

    Scale shape: one row per group (already sketched) → one
    self-join over group pairs (G^2 rows of 2k BIGINTs — groups are
    sources/domains, thousands at most) with pure JVM array ops.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    a = sketches.select(
        F.col(group_col).alias("g1"), F.col("kmv").alias("kmv1")
    )
    b = sketches.select(
        F.col(group_col).alias("g2"), F.col("kmv").alias("kmv2")
    )
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    return (
        pairs.select(
            "g1",
            "g2",
            F.expr(
                f"slice(array_sort(array_union(kmv1, kmv2)), 1, {k})"
            ).alias("_s"),
            "kmv1",
            "kmv2",
            F.size("kmv1").alias("_n1"),
            F.size("kmv2").alias("_n2"),
        )
        .select(
            "g1",
            "g2",
            F.size("_s").cast("bigint").alias("sample_n"),
            F.size(
                F.array_intersect(F.array_intersect("_s", "kmv1"), "kmv2")
            ).cast("bigint").alias("matches"),
            F.element_at("_s", F.size("_s")).cast("bigint").alias("theta"),
            # union is exact while BOTH sides' sketches are exact (< k)
            # and their union fits the sample
            (
                (F.col("_n1") < k) & (F.col("_n2") < k)
                & (F.size("_s") < k)
            ).alias("_exact"),
        )
        .select(
            "g1",
            "g2",
            "sample_n",
            "matches",
            F.when(F.col("_exact"), F.col("sample_n"))
            .otherwise(
                F.expr(f"({k - 1} * {KMV_HASH_RANGE}) div greatest(theta, 1)")
            )
            .cast("bigint")
            .alias("est_union"),
            F.expr("(1000000 * matches) div sample_n")
            .cast("bigint")
            .alias("jaccard_e6"),
        )
        .select(
            "g1",
            "g2",
            "sample_n",
            "matches",
            "est_union",
            "jaccard_e6",
            F.expr("(matches * est_union) div sample_n")
            .cast("bigint")
            .alias("est_intersect"),
        )
    )


def _cm_cell(
    row: int, item: F.Column, w_cols: int, hash_fn: str = "md5"
) -> F.Column:
    """Count-min column index for hash row ``row``: the portable 48-bit
    md5 prefix of ``"<row>:<item>"`` mod the sketch width. Both engines
    concatenate and hash the same string, so cells agree exactly."""
    return F.pmod(
        _h48(
            F.concat_ws(":", F.lit(row).cast("string"), item.cast("string")),
            hash_fn,
        ),
        F.lit(w_cols),
    ).cast("int")


def cm_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    d_rows: int = 4,
    w_cols: int = 256,
    weight_col: str | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-(key, bucket) count-min sketch (Cormode & Muthukrishnan 2005)
    as one mergeable ``array<bigint>`` of ``d_rows * w_cols`` cells —
    the FREQUENCY companion of :func:`kmv_bucket_sketch` (distinct
    counts) and ``value_histogram`` (quantiles): point-queryable
    "how often did token X appear in this bucket" with the classic
    one-sided guarantee ``estimate >= true count`` (collisions only ADD).

    Deterministic contract: cell ``(r, c)`` counts items whose
    :func:`_cm_cell` hash for row ``r`` is ``c`` — integer counts, md5
    cells, no randomness, so two engines build bit-identical sketches.

    Scale shape: items aggregate to (keys, bucket, item) counts FIRST
    (one map-side-combined shuffle over the raw stream); only the
    distinct items fan out x ``d_rows`` (vocabulary-bounded, not
    stream-bounded); the array materializes from at most
    ``d_rows * w_cols`` cells per bucket via a bounded map lookup —
    no unbounded collect.

    Output: ``(keys..., bucket, cm array<bigint>[d*w], n_items)`` where
    ``n_items`` is the exact total item count (every row of ``cm``
    sums to it — the standard sketch sanity invariant).
    """
    if d_rows < 1:
        raise ValueError(f"d_rows must be >= 1, got {d_rows}")
    if w_cols < 2:
        raise ValueError(f"w_cols must be >= 2, got {w_cols}")
    # weight_col: the input is ALREADY (key, bucket, item) counts (each
    # row counts weight occurrences) — lets a caller share one counted
    # token table between the sketch and its exact-count twin instead of
    # re-running the item explode per consumer. Identical cells either way.
    sel = [
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(item_col).alias("_item"),
    ]
    if weight_col is not None:
        sel.append(F.col(weight_col).alias("_wt"))
    cnt = df.select(*sel).groupBy(*key_cols, "bucket", "_item").agg(
        (
            F.count(F.lit(1)) if weight_col is None else F.sum("_wt")
        ).cast("bigint").alias("_c")
    )
    # One explode pass, not a d_rows-way union: the union form made the
    # counted-items subtree a d_rows-consumer plan whose shared exchange
    # was re-read once per hash row (measured 4x18.7 MB at sf1).
    # explode(array(pos_0..pos_{d-1})) emits the identical row multiset
    # in a single read; the same d md5s per item run either way.
    cells = cnt.select(
        *key_cols,
        "bucket",
        F.explode(
            F.array(
                *[
                    _cm_cell(r, F.col("_item"), w_cols, hash_fn)
                    + r * w_cols
                    for r in range(d_rows)
                ]
            )
        ).alias("_pos"),
        "_c",
    )
    agg = cells.groupBy(*key_cols, "bucket", "_pos").agg(
        F.sum("_c").alias("_v")
    )
    maps = agg.groupBy(*key_cols, "bucket").agg(
        F.map_from_arrays(
            F.collect_list("_pos"), F.collect_list("_v")
        ).alias("_m")
    )
    n_cells = d_rows * w_cols
    return maps.select(
        *key_cols,
        "bucket",
        F.expr(
            f"transform(sequence(0, {n_cells - 1}),"
            " i -> coalesce(element_at(_m, i), 0L))"
        ).alias("cm"),
    ).withColumn(
        "n_items",
        F.expr(
            f"aggregate(slice(cm, 1, {w_cols}), 0L, (a, x) -> a + x)"
        ).cast("bigint"),
    )


def cm_merge_buckets(
    sketches: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
) -> DataFrame:
    """Cascade count-min sketches to a coarser tier: cell-wise BIGINT
    sum — the merge is EXACT (a merged sketch equals the sketch built
    directly from the union stream, pytest-pinned), so monthly token
    frequencies cost days x d*w cells, never a raw re-scan.

    ``n_items`` sums the input sketches' own ``n_items`` (each fine row
    contributes exactly once, tagged to cell 0) — the same cascade
    identity, with no dependence on knowing the build's row/width split.

    Scale shape: posexplode to (keys, coarse, pos, val) — bounded by
    fan-in x d*w, map-side combinable — then the same bounded map
    reassembly as :func:`cm_bucket_sketch`.
    """
    ex = sketches.select(
        *key_cols,
        coarse_bucket.alias("bucket"),
        F.col("n_items"),
        F.posexplode("cm").alias("_pos", "_v"),
    )
    agg = ex.groupBy(*key_cols, "bucket", "_pos").agg(
        F.sum("_v").alias("_v"),
        F.sum(
            F.when(F.col("_pos") == 0, F.col("n_items")).otherwise(0)
        ).alias("_n0"),
    )
    maps = agg.groupBy(*key_cols, "bucket").agg(
        F.map_from_arrays(F.collect_list("_pos"), F.collect_list("_v")).alias(
            "_m"
        ),
        (F.max("_pos") + 1).cast("int").alias("_n"),
        F.sum("_n0").cast("bigint").alias("n_items"),
    )
    return maps.select(
        *key_cols,
        "bucket",
        F.expr(
            "transform(sequence(0, _n - 1),"
            " i -> coalesce(element_at(_m, i), 0L))"
        ).alias("cm"),
        "n_items",
    )


def cm_estimate(
    sketches: DataFrame,
    probes: DataFrame,
    d_rows: int = 4,
    w_cols: int = 256,
    probe_col: str = "item",
    hash_fn: str = "md5",
) -> DataFrame:
    """Point-query a count-min sketch for each probe item: the estimate
    is the MIN over the ``d_rows`` hashed cells — never below the true
    count (one-sided error; the pytest pins ``est >= exact`` and exact
    equality when the width avoids collisions).

    ``probes`` is a small DataFrame (one row per item to query) —
    broadcast against the sketch rows, so the join is shuffle-free.

    Output: sketch keys + ``(item, est_count)``.
    """
    cols = [
        F.element_at(
            "cm",
            _cm_cell(r, F.col(probe_col), w_cols, hash_fn) + r * w_cols + 1,
        )
        for r in range(d_rows)
    ]
    est = cols[0] if d_rows == 1 else F.least(*cols)
    return sketches.crossJoin(
        F.broadcast(probes.select(F.col(probe_col).alias(probe_col)))
    ).select(
        *[c for c in sketches.columns if c not in ("cm", "n_items")],
        probe_col,
        est.cast("bigint").alias("est_count"),
    )

#: Bits stored per BIGINT word of a bloom sketch.  32 (not 64) so the
#: per-word mask stays strictly positive in BOTH engines' signed 64-bit
#: integers — ``1 << 63`` would flip sign in Spark and DuckDB alike and
#: make the bitwise-AND probe engine-dependent.
BLOOM_WORD_BITS = 32


def _bloom_pos(
    r: int, item: F.Column, m_bits: int, hash_fn: str = "md5"
) -> F.Column:
    """Bloom bit position for hash row ``r``: the portable 48-bit md5
    prefix of ``"<r>:<item>"`` mod the filter width — same derivation
    seam as :func:`_cm_cell`, so both engines light the same bits."""
    return F.pmod(
        _h48(
            F.concat_ws(":", F.lit(r).cast("string"), item.cast("string")),
            hash_fn,
        ),
        F.lit(m_bits),
    ).cast("int")


def bloom_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    m_bits: int = 4096,
    k_hash: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-(key, bucket) Bloom filter (Bloom 1970) as one mergeable
    ``array<bigint>`` of ``m_bits / 32`` words — the MEMBERSHIP
    companion of :func:`kmv_bucket_sketch` (distinct counts) and
    :func:`cm_bucket_sketch` (frequencies): "was item X ever seen in
    this bucket", with the classic guarantee of NO false negatives
    (absent items may collide to a spurious yes; present items never
    read no).

    This is the incremental-dedup primitive at 100 TB: a new day's
    batch probes a broadcast bloom of the historical corpus'
    fingerprints and only the "maybe seen" survivors pay the exact
    verify join — the alternative is shuffling the full historical
    fingerprint set against every batch.

    Deterministic contract: bit positions come from the portable md5
    prefix (:func:`_bloom_pos`), words accumulate with ``bit_or`` —
    order-free and exactly associative, so two engines (and any merge
    order) build bit-identical filters.

    Scale shape: items dedup to (keys, bucket, item) FIRST (map-side
    partial distinct), fan out x ``k_hash`` bounded by the vocabulary,
    ``bit_or`` per word is map-side combinable, and the array
    materializes from at most ``m_bits / 32`` words per bucket via a
    bounded map lookup — no unbounded collect.

    Output: ``(keys..., bucket, bloom array<bigint>[m/32], n_distinct)``
    where ``n_distinct`` is the EXACT distinct-item count (free from the
    dedup pass; feeds the standard ``(1 - e^{-kn/m})^k`` FP-rate read).
    """
    if m_bits < BLOOM_WORD_BITS or m_bits % BLOOM_WORD_BITS != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of {BLOOM_WORD_BITS},"
            f" got {m_bits}"
        )
    if k_hash < 1:
        raise ValueError(f"k_hash must be >= 1, got {k_hash}")
    n_words = m_bits // BLOOM_WORD_BITS
    dist = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(item_col).alias("_item"),
    ).distinct()
    # One explode pass, not a k_hash-way union (same fix as the count-min
    # builder: the union re-read the deduped-items exchange once per hash
    # row). Each array element carries (word index, bit mask, distinct
    # tag) for one hash row; the row multiset is identical to the union.
    def _entry(r: int) -> F.Column:
        pos = _bloom_pos(r, F.col("_item"), m_bits, hash_fn)
        return F.struct(
            (pos / BLOOM_WORD_BITS).cast("int").alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), pos % BLOOM_WORD_BITS
            ).alias("_m"),
            F.lit(1 if r == 0 else 0).cast("bigint").alias("_d"),
        )

    bits = dist.select(
        *key_cols,
        "bucket",
        F.explode(F.array(*[_entry(r) for r in range(k_hash)])).alias("_e"),
    ).select(
        *key_cols,
        "bucket",
        F.col("_e._w").alias("_w"),
        F.col("_e._m").alias("_m"),
        F.col("_e._d").alias("_d"),
    )
    # n_distinct rides the same aggregation (each item contributes its
    # _d=1 tag to exactly one word via hash row 0) — no second pass, and
    # no join that could degrade to a cartesian on a constant bucket.
    agg = bits.groupBy(*key_cols, "bucket", "_w").agg(
        F.bit_or("_m").alias("_v"), F.sum("_d").alias("_dw")
    )
    maps = agg.groupBy(*key_cols, "bucket").agg(
        F.map_from_arrays(
            F.collect_list("_w"), F.collect_list("_v")
        ).alias("_m"),
        F.sum("_dw").cast("bigint").alias("n_distinct"),
    )
    return maps.select(
        *key_cols,
        "bucket",
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(_m, i), 0L))"
        ).alias("bloom"),
        "n_distinct",
    )


def bloom_merge_buckets(
    sketches: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
) -> DataFrame:
    """Cascade Bloom filters to a coarser tier: word-wise ``bit_or`` —
    the merge is EXACT (a merged filter equals the filter built directly
    from the union stream, pytest-pinned), so "seen anywhere this
    month" costs days x m/32 words, never a raw re-scan.

    ``n_distinct`` does NOT survive a bit-or merge (buckets may share
    items), so the merged output drops it — read cardinality off the
    KMV cascade instead.

    Scale shape: posexplode to (keys, coarse, word, val) — bounded by
    fan-in x m/32, map-side combinable ``bit_or`` — then the same
    bounded map reassembly as the build.
    """
    ex = sketches.select(
        *key_cols,
        coarse_bucket.alias("bucket"),
        F.posexplode("bloom").alias("_w", "_v"),
    )
    agg = ex.groupBy(*key_cols, "bucket", "_w").agg(
        F.bit_or("_v").alias("_v")
    )
    maps = agg.groupBy(*key_cols, "bucket").agg(
        F.map_from_arrays(F.collect_list("_w"), F.collect_list("_v")).alias(
            "_m"
        ),
        (F.max("_w") + 1).cast("int").alias("_n"),
    )
    return maps.select(
        *key_cols,
        "bucket",
        F.expr(
            "transform(sequence(0, _n - 1),"
            " i -> coalesce(element_at(_m, i), 0L))"
        ).alias("bloom"),
    )


def bloom_maybe_contains(
    sketches: DataFrame,
    probes: DataFrame,
    m_bits: int = 4096,
    k_hash: int = 3,
    probe_col: str = "item",
    hash_fn: str = "md5",
) -> DataFrame:
    """Membership-probe a Bloom filter: ``maybe`` is true iff ALL
    ``k_hash`` hashed bits are set — never false for a present item
    (the pytest pins zero false negatives under forced collisions).

    ``probes`` is broadcast against the sketch rows (shuffle-free); in
    the incremental-dedup composition the roles invert — ONE sketch row
    broadcasts against a large probe batch, same plan shape either way.

    Output: sketch keys + ``(item, maybe boolean)``.
    """
    checks = []
    for r in range(k_hash):
        pos = _bloom_pos(r, F.col(probe_col), m_bits, hash_fn)
        word = F.element_at(
            "bloom", (pos / BLOOM_WORD_BITS).cast("int") + 1
        )
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), pos % BLOOM_WORD_BITS
        )
        checks.append(word.bitwiseAND(mask) != 0)
    maybe = checks[0]
    for c in checks[1:]:
        maybe = maybe & c
    return sketches.crossJoin(
        F.broadcast(probes.select(F.col(probe_col).alias(probe_col)))
    ).select(
        *[c for c in sketches.columns if c not in ("bloom", "n_distinct")],
        probe_col,
        maybe.alias("maybe"),
    )


def mg_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    k: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-(key, bucket) Misra-Gries heavy-hitters summary (Misra &
    Gries 1982; mergeable batch form per Agarwal et al. 2012,
    "Mergeable Summaries"): at most ``k`` surviving counters per bucket
    with the UNDERCOUNT-ONLY guarantee ``w <= true <= w + slack`` —
    the bounded answer to "which tokens dominate this bucket" when the
    vocabulary is too large to keep exact per-item counts at the coarse
    tiers.  Completes the sketch quartet: KMV (how many distinct),
    count-min (how often is X, overcount-only), Bloom (was X seen),
    Misra-Gries (which X dominate, undercount-only).

    Batch form: exact (keys, bucket, item) counts first (one map-side-
    combined shuffle), then subtract the (k+1)-th largest count ``v``
    from every counter and keep the strictly positive residuals — at
    most k survive, any item with count > n/(k+1) ALWAYS survives
    (pytest-pinned).  Deterministic: ``v`` is a count VALUE (order
    among tied items cannot change it), all arithmetic exact-int.

    Output rows per bucket: one SENTINEL row (``item`` NULL, ``w`` 0)
    that always exists and carries the bucket's ``slack`` (= total
    decrement so far — the undercount bound, also the bound for items
    NOT in the sketch: true <= slack), plus <= k item rows
    ``(item, w=residual, slack)``.  The sentinel is what keeps the
    bound sound through merges of buckets whose sketches pruned to
    empty.

    Scale shape: one shuffle to counts, two windows per bucket (rank,
    then v) — no joins, no Python, vocabulary-bounded intermediates.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # weight_col: pre-counted (key, bucket, item) input — see
    # cm_bucket_sketch; identical counters either way
    sel = [
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(item_col).alias("item"),
    ]
    if weight_col is not None:
        sel.append(F.col(weight_col).alias("_wt"))
    cnt = df.select(*sel).groupBy(*key_cols, "bucket", "item").agg(
        (
            F.count(F.lit(1)) if weight_col is None else F.sum("_wt")
        ).cast("bigint").alias("_c")
    )
    return _mg_prune(
        cnt, key_cols, k, slack_in=F.lit(0).cast("bigint")
    ).drop("_vsub")


def mg_merge_buckets(
    sketches: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
    k: int = 8,
) -> DataFrame:
    """Cascade Misra-Gries summaries to a coarser tier: sum surviving
    counters per item across fine buckets, sum the fine buckets'
    slacks (each sentinel row contributes its bucket's slack exactly
    once), then re-prune with the same (k+1)-th-value rule.  The merged
    bound is ``w <= true <= w + slack`` with
    ``slack = sum(fine slacks) + v_merge`` — monthly heavy hitters from
    daily summaries, never a raw re-scan (pytest pins the bound against
    exact counts from the union stream).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tagged = sketches.select(
        *key_cols, coarse_bucket.alias("bucket"), "item", "w", "slack",
        F.col("bucket").alias("_fine"),
    )
    items = tagged.where(F.col("item").isNotNull()).groupBy(
        *key_cols, "bucket", "item"
    ).agg(F.sum("w").alias("_c"))
    slacks = (
        tagged.select(*key_cols, "bucket", "_fine", "slack")
        .distinct()
        .groupBy(*key_cols, "bucket")
        .agg(F.sum("slack").cast("bigint").alias("_s"))
    )
    pruned = _mg_prune(items, key_cols, k, slack_in=None)
    # attach the carried slack as two broadcast joins (an outer join
    # cannot broadcast its preserved side): surviving counters inner-join
    # the per-bucket slack scalar; the sentinel re-emits from the slack
    # rows themselves so a bucket whose merge pruned to empty (or whose
    # fine sketches were all sentinel-only) still carries its bound.
    on = [*key_cols, "bucket"]
    item_rows = (
        pruned.where(F.col("item").isNotNull())
        .join(F.broadcast(slacks), on)
        .select(
            *on,
            "item",
            F.col("w").cast("bigint").alias("w"),
            (F.col("_vsub") + F.col("_s")).cast("bigint").alias("slack"),
        )
    )
    sent = (
        slacks.join(
            F.broadcast(
                pruned.where(F.col("item").isNull()).select(*on, "_vsub")
            ),
            on,
            "left",
        )
        .select(
            *on,
            F.lit(None).cast(item_rows.schema["item"].dataType).alias("item"),
            F.lit(0).cast("bigint").alias("w"),
            (F.coalesce("_vsub", F.lit(0)) + F.col("_s")).cast(
                "bigint"
            ).alias("slack"),
        )
    )
    return item_rows.unionByName(sent)


def _mg_prune(
    cnt: DataFrame, key_cols: list[str], k: int, slack_in
) -> DataFrame:
    """Shared prune: subtract the (k+1)-th largest count value per
    bucket, keep positive residuals + the slack-bearing sentinel.
    Emits ``(keys..., bucket, item, w, slack, _vsub)`` — ``_vsub`` (the
    decrement applied at THIS step) stays internal to the merge path.
    """
    wb = Window.partitionBy(*(*key_cols, "bucket"))
    wr = wb.orderBy(F.col("_c").desc(), F.col("item"))
    ranked = cnt.withColumn("_rn", F.row_number().over(wr))
    vd = ranked.withColumn(
        "_v",
        F.max(F.when(F.col("_rn") == k + 1, F.col("_c")).otherwise(0)).over(
            wb
        ),
    )
    item_rows = vd.where(F.col("_c") > F.col("_v")).select(
        *key_cols,
        "bucket",
        "item",
        (F.col("_c") - F.col("_v")).cast("bigint").alias("w"),
        F.col("_v").cast("bigint").alias("_vsub"),
    )
    sentinel = vd.where(F.col("_rn") == 1).select(
        *key_cols,
        "bucket",
        F.lit(None).cast(item_rows.schema["item"].dataType).alias("item"),
        F.lit(0).cast("bigint").alias("w"),
        F.col("_v").cast("bigint").alias("_vsub"),
    )
    out = item_rows.unionByName(sentinel)
    if slack_in is not None:
        out = out.withColumn("slack", (slack_in + F.col("_vsub")).cast("bigint"))
    else:
        out = out.withColumn("slack", F.col("_vsub"))
    return out.select(*key_cols, "bucket", "item", "w", "slack", "_vsub")


def mg_certified_topk(
    fine_counts: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
    topk: int = 10,
    mg_k: int = 64,
    item_col: str = "item",
    count_col: str = "c",
) -> DataFrame:
    """CERTIFIED exact top-k at a coarse tier from fine-tier exact
    counts, without re-aggregating the full vocabulary: prune each fine
    bucket to a Misra-Gries summary (vocabulary-bounded), merge the
    summaries up (:func:`mg_merge_buckets`), then re-count ONLY the
    surviving candidates via a broadcast semi-join back into the fine
    counts.  The MG guarantee turns into a certificate: any item absent
    from the merged summary has true coarse count <= slack, so when the
    k-th candidate's EXACT count >= slack the returned rows are provably
    a valid top-k (ties at exactly ``slack`` may admit other equally-
    ranked sets; strict > certifies uniqueness of the cutoff).

    At 100 TB this is the difference between shuffling the full
    (source x vocabulary) space to rank a month and shuffling
    ``mg_k`` counters per day plus <= ``mg_k`` re-counted candidates.

    ``fine_counts`` schema: ``(key_cols..., bucket, item_col,
    count_col)`` — exactly what the tier ladder materializes per bucket.
    Output: ``(keys..., bucket, item, exact_c, rank, slack,
    certified)`` with ``rank <= topk`` rows per coarse bucket.  Fewer
    than ``topk`` candidates (or none at all, when every fine summary
    pruned to its sentinel) come back short/empty with
    ``certified=false`` — the honest "raise mg_k and retry" signal,
    pytest-pinned.
    """
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if mg_k < topk:
        raise ValueError(f"mg_k must be >= topk, got {mg_k} < {topk}")
    fc = fine_counts.select(
        *key_cols,
        "bucket",
        F.col(item_col).alias("item"),
        F.col(count_col).cast("bigint").alias("_c"),
    )
    daily = _mg_prune(fc, key_cols, mg_k, slack_in=F.lit(0).cast("bigint"))
    merged = mg_merge_buckets(
        daily.drop("_vsub"), key_cols, coarse_bucket, mg_k
    )
    cand = merged.where(F.col("item").isNotNull()).select(
        *key_cols, F.col("bucket").alias("_cb"), "item"
    )
    slacks = merged.where(F.col("item").isNull()).select(
        *key_cols, F.col("bucket").alias("_cb"), "slack"
    )
    exact = (
        fc.withColumn("_cb", coarse_bucket)
        .join(F.broadcast(cand), [*key_cols, "_cb", "item"], "left_semi")
        .groupBy(*key_cols, "_cb", "item")
        .agg(F.sum("_c").alias("exact_c"))
    )
    wr = Window.partitionBy(*key_cols, "_cb").orderBy(
        F.col("exact_c").desc(), F.col("item")
    )
    ranked = exact.withColumn("rank", F.row_number().over(wr)).where(
        F.col("rank") <= topk
    )
    wb = Window.partitionBy(*key_cols, "_cb")
    certify = (
        ranked.withColumn("_kth", F.min("exact_c").over(wb))
        .withColumn("_nc", F.count(F.lit(1)).over(wb))
        .join(F.broadcast(slacks), [*key_cols, "_cb"])
        .select(
            *key_cols,
            F.col("_cb").alias("bucket"),
            "item",
            "exact_c",
            "rank",
            "slack",
            (
                (F.col("_nc") >= topk) & (F.col("_kth") >= F.col("slack"))
                | (F.col("slack") == 0)
            ).alias("certified"),
        )
    )
    return certify


def mg_trailing_topk(
    daily_sketches: DataFrame,
    key_cols: list[str],
    window_buckets: int,
    k: int = 8,
) -> DataFrame:
    """Trailing heavy hitters: for every bucket B, the Misra-Gries
    merge of the summaries for buckets ``(B - window_buckets + 1) .. B``
    — "which tokens dominate the last N days", per day, without ever
    re-scanning raw data (the monitoring composition of
    :func:`mg_bucket_sketch` + :func:`mg_merge_buckets`).

    ``daily_sketches`` is :func:`mg_bucket_sketch` output whose
    ``bucket`` is INTEGER-valued (epoch days, hours — cast timestamps
    with ``datediff``/``unix_timestamp div width`` first); each fine
    summary fans out to the ``window_buckets`` trailing windows it
    participates in, then the standard merge+re-prune runs per window.
    Leading windows with fewer than ``window_buckets`` fine buckets
    merge what exists (standard trailing semantics); every output
    window keeps the ``w <= true <= w + slack`` bound against the
    window's union stream (pytest-pinned).

    Scale shape: the fan-out multiplies SKETCH rows (<= (k+1) per fine
    bucket) by ``window_buckets`` — never raw rows — and the merge is
    the audited broadcast-only path.
    """
    if window_buckets < 1:
        raise ValueError(
            f"window_buckets must be >= 1, got {window_buckets}"
        )
    fanned = daily_sketches.withColumn(
        "_wb",
        F.explode(
            F.sequence(
                F.col("bucket").cast("bigint"),
                F.col("bucket").cast("bigint") + (window_buckets - 1),
            )
        ),
    )
    # the fine ``bucket`` column stays intact — mg_merge_buckets uses it
    # to count each fine summary's slack exactly once per window (two
    # same-slack days in one window must both contribute)
    out = mg_merge_buckets(fanned, key_cols, F.col("_wb"), k=k)
    # windows past the data's end are artifacts of the fan-out: a bucket
    # B only exists as a window if some fine bucket EQUALS it
    real = daily_sketches.select(
        *key_cols, F.col("bucket").cast("bigint").alias("bucket")
    ).distinct()
    return out.join(F.broadcast(real), [*key_cols, "bucket"], "left_semi")


def sample_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    k: int = 16,
) -> DataFrame:
    """Per-(key, bucket) uniform sample of k distinct ITEMS — the
    bottom-k-by-hash sketch (the KMV construction keeping the item
    values, not just the hashes): the k smallest 48-bit md5 hashes of a
    set are a uniform without-replacement sample of its distinct
    elements, and the sample is EXACTLY mergeable —
    bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B)) — so "show me
    representative examples per month" reads days x k rows, never raw.
    Deterministic: same inputs, same sample, both engines.

    Output rows (<= k per bucket): ``(keys..., bucket, item, h, rank)``
    with ``rank`` 1-based by hash order.

    Scale shape: one map-side-combined distinct, one per-bucket window
    bounded to k rows — identical to :func:`kmv_bucket_sketch`.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dist = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(item_col).alias("item"),
    ).distinct().withColumn("h", _h48(F.col("item")))
    w = Window.partitionBy(*key_cols, "bucket").orderBy("h", "item")
    return dist.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def sample_merge_buckets(
    samples: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
    k: int = 16,
) -> DataFrame:
    """Cascade bottom-k item samples to a coarser tier: union the fine
    samples, dedup (an item sampled on two days carries the same hash),
    keep the k smallest — exactly the sample a direct build over the
    union stream produces (pytest + oracle pinned), PROVIDED ``k`` here
    is <= the fine sketches' k: the identity
    bottomk(A ∪ B) = bottomk(bottomk'(A) ∪ bottomk'(B)) needs k' >= k
    (an item ranked k+1 in every fine bucket would otherwise be missing
    from the union of fine samples but belong in a larger coarse one).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ex = samples.select(
        *key_cols, coarse_bucket.alias("bucket"), "item", "h"
    ).distinct()
    w = Window.partitionBy(*key_cols, "bucket").orderBy("h", "item")
    return ex.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


# --------------------------------------------------------------- HyperLogLog

#: Bit width of the register-selector hash stream (the portable 48-bit
#: md5 prefix shared by every sketch in this module).
HLL_HASH_BITS = 48


def _hll_alpha_const(p: int) -> float:
    """The finished HLL estimator constant ``alpha_m * m^2 * 2^(Rmax)``
    as ONE double, so the estimate is a single correctly-rounded divide
    by the exact-integer ``z_scaled`` (see :func:`hll_bucket_sketch`).

    ``alpha_m = 0.7213 / (1 + 1.079 / m)`` is the large-m bias constant
    from Flajolet, Fusy, Gandouet & Meunier 2007 ("HyperLogLog: the
    analysis of a near-optimal cardinality estimation algorithm", §4);
    ``m^2 * 2^Rmax`` is a power of two, so the product rounds once.
    """
    m = 1 << p
    rmax = HLL_HASH_BITS - p + 1
    return 0.7213 / (1.0 + 1.079 / m) * float(m) * float(m) * float(1 << rmax)


def _hll_rho_cols(h: F.Column, p: int) -> tuple[F.Column, F.Column]:
    """Split a 48-bit hash into (register index, rank): the top ``p``
    bits select one of ``m = 2^p`` registers; the rank is the 1-based
    position of the leftmost 1-bit in the remaining ``48 - p`` bits
    (``48 - p + 1`` when they are all zero).  ``conv(w, 10, 2)`` gives
    the minimal binary string in Spark exactly as ``bin(w)`` does in
    DuckDB, so ``floor(log2 w) = length - 1`` is portable text algebra,
    no float logs.
    """
    wbits = HLL_HASH_BITS - p
    idx = F.shiftright(h, wbits).cast("int")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (
        F.when(w > 0, F.lit(wbits) - (F.length(F.conv(w, 10, 2)) - 1))
        .otherwise(F.lit(wbits + 1))
        .cast("int")
    )
    return idx, rho


def _hll_finish(agg: DataFrame, p: int) -> DataFrame:
    """Attach ``(n_zero, z_scaled, est_distinct)`` to a dense ``regs``
    register-array column.

    ``z_scaled = sum_j 2^(Rmax - reg_j)`` is the harmonic-mean
    denominator scaled into EXACT integers: every term is a whole power
    of two and the total is <= m * 2^Rmax = 2^49 < 2^53, so both
    engines hold it exactly in BIGINT and convert to double losslessly.
    The estimate is then ONE divide + ONE floor of the precomputed
    double constant (:func:`_hll_alpha_const`) — bit-identical
    cross-engine per the repo's IEEE-deterministic contract.  The raw
    estimator only: the small-range linear-counting branch needs ``ln``
    (not correctly rounded cross-engine) and lives in
    :func:`hll_corrected`, off the oracle path.
    """
    m = 1 << p
    rmax = HLL_HASH_BITS - p + 1
    c = _hll_alpha_const(p)
    return agg.select(
        "*",
        F.expr("size(filter(regs, r -> r = 0))").cast("bigint").alias(
            "n_zero"
        ),
        F.expr(
            "aggregate(regs, cast(0 as bigint),"
            f" (acc, r) -> acc + shiftleft(cast(1 as bigint), {rmax} - r))"
        ).alias("z_scaled"),
    ).withColumn(
        "est_distinct",
        F.floor(F.lit(c) / F.col("z_scaled").cast("double")).cast("bigint"),
    )


def _hll_dense(grouped: DataFrame, key_cols: list[str], p: int) -> DataFrame:
    """groupBy (keys, bucket) over (idx, rho) rows -> dense ``regs``
    array of m register maxima (0 = untouched).

    Gap-run construction, O(m) per bucket: sort the (idx, rho) entries,
    emit ``idx_j - idx_{j-1} - 1`` zeros before each rho, flatten, pad
    the tail — all codegen array ops.  (The obvious ``transform(
    sequence(0, m-1), i -> element_at(map, i))`` is O(m^2): Spark's map
    ``element_at`` is a linear scan, measured ~6x slower at m = 1024.)
    Groups always hold >= 1 entry (they come from an aggregation), so
    the last-entry tail pad never sees an empty array.
    """
    m = 1 << p
    agg = grouped.groupBy(*key_cols, "bucket").agg(
        F.array_sort(F.collect_list(F.struct("idx", "rho"))).alias("_es")
    )
    regs = F.expr(
        "concat("
        " flatten(zip_with(_es,"
        "  concat(array(named_struct('idx', -1, 'rho', 0)),"
        "         slice(_es, 1, size(_es) - 1)),"
        "  (cur, prev) -> concat(array_repeat(0, cur.idx - prev.idx - 1),"
        "                        array(cur.rho)))),"
        f" array_repeat(0, {m} - 1 - element_at(_es, -1).idx))"
    )
    return agg.select(*key_cols, "bucket", regs.alias("regs"))


def hll_bucket_sketch(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    item_col: str,
    p: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-(key, bucket) HyperLogLog sketch (Flajolet et al. 2007) as a
    mergeable dense register array — the fixed-size counterpart of
    :func:`kmv_bucket_sketch`: m = 2^p integers per bucket REGARDLESS of
    cardinality, with registers combining by elementwise max, so tier
    cascades merge sketches without revisiting raw data.

    Emits ``(keys..., bucket, regs array<int> length m, n_zero,
    z_scaled, est_distinct)``; ``est_distinct`` is the raw HLL estimate
    ``floor(alpha_m * m^2 * 2^Rmax / z_scaled)`` — deterministic
    integer/single-divide arithmetic end to end (see :func:`_hll_finish`;
    the reference's per-cell exactness stance re-expressed for sketches:
    same inputs, same bits, any engine).  Raw HLL over-corrects small
    cardinalities; use :func:`hll_corrected` (library-side linear
    counting) when buckets may hold < ~2.5m distinct items, or KMV when
    exact-below-k behavior is wanted.

    Scale shape: one map-side-combined distinct on (keys, bucket, h48),
    whole-bit idx/rho split, then a combinable per-register max — shuffle
    rows collapse to <= m per bucket; no window, no unbounded state.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")
    # no distinct pre-pass: duplicate items hash to the same (idx, rho)
    # and the map-side-combined max(rho) absorbs them — a distinct here
    # would add an item-cardinality-sized shuffle for nothing
    hashed = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        _h48(F.col(item_col), hash_fn).alias("_h"),
    ).where(F.col("_h").isNotNull())  # NULL items are not elements
    idx, rho = _hll_rho_cols(F.col("_h"), p)
    pre = hashed.select(
        *key_cols, "bucket", idx.alias("idx"), rho.alias("rho")
    ).groupBy(*key_cols, "bucket", "idx").agg(F.max("rho").alias("rho"))
    return _hll_finish(_hll_dense(pre, key_cols, p), p)


def hll_merge_buckets(
    sketches: DataFrame,
    key_cols: list[str],
    coarse_bucket: F.Column,
    p: int = 10,
) -> DataFrame:
    """Cascade bucketed HLL sketches to a coarser tier: elementwise max
    of the fine register arrays.  Exact-merge identity (pytest + oracle
    pinned): max is associative/commutative/idempotent, so the merged
    registers EQUAL a direct sketch over the combined span — monthly
    distinct estimates cost days x m integers, never a raw re-scan, and
    a replayed day is a no-op.

    Input is :func:`hll_bucket_sketch` output; only touched registers
    travel through the shuffle (zeros are dropped before the explode).
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    # a p that mismatches the input sketches' register width would
    # silently truncate registers — fail loudly instead
    guarded = sketches.withColumn(
        "regs",
        F.when(F.size("regs") == m, F.col("regs")).otherwise(
            F.raise_error(
                F.format_string(
                    f"hll_merge_buckets: p={p} expects {m} registers,"
                    " got %s",
                    F.size("regs").cast("string"),
                )
            )
        ),
    )
    ex = (
        guarded.select(
            *key_cols,
            coarse_bucket.alias("bucket"),
            F.posexplode("regs").alias("idx", "rho"),
        )
        .where(F.col("rho") > 0)
        .groupBy(*key_cols, "bucket", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return _hll_finish(_hll_dense(ex, key_cols, p), p)


def hll_corrected(sketches: DataFrame, p: int = 10) -> DataFrame:
    """Add the small-range linear-counting correction (Flajolet et al.
    2007 §4 practical considerations) to finished HLL sketch rows:
    when the raw estimate is <= 5m/2 and empty registers remain, the
    better estimator is ``m * ln(m / n_zero)``.

    Library-side only: ``ln`` is not correctly rounded identically
    across engines, so this column stays OFF the DuckDB oracle path
    (pytest bounds it against exact distinct counts instead — same
    stance as the STL outer-robustness split).
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    lc = F.floor(
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero"))
    ).cast("bigint")
    use_lc = (F.col("est_distinct") * 2 <= 5 * m) & (F.col("n_zero") > 0)
    corrected = F.when(use_lc, lc).otherwise(F.col("est_distinct"))
    # same fail-loud width guard as the merge/trailing paths: a p that
    # mismatches the sketches' register count would silently run linear
    # counting with the wrong m
    guarded = F.when(F.size("regs") == m, corrected).otherwise(
        F.raise_error(
            F.format_string(
                f"hll_corrected: p={p} expects {m} registers, got %s",
                F.size("regs").cast("string"),
            )
        )
    )
    return sketches.withColumn("est_corrected", guarded)


def hll_trailing_distinct(
    sketches: DataFrame,
    key_cols: list[str],
    window_buckets: int,
    bucket_seconds: int,
    p: int = 10,
) -> DataFrame:
    """Sliding-window cardinality from bucketed HLL sketches: for each
    observed bucket, the distinct estimate over the trailing
    ``window_buckets`` buckets — the WAU/MAU-style read ("distinct
    users in the last 7 days, every day") that raw COUNT DISTINCT
    cannot pre-aggregate but register-max CAN: the trailing union's
    registers are the elementwise max of the trailing days' registers,
    so each output row folds ``window_buckets`` fixed-size arrays
    instead of re-scanning raw events.

    Input is :func:`hll_bucket_sketch` output on a regular
    ``bucket_seconds`` spine; emits the same finished columns
    (``n_zero, z_scaled, est_distinct``) per observed bucket, where
    the window is a RANGE frame over epoch seconds — missing buckets
    shorten the fold (observed-spine convention, same as the trailing
    Misra-Gries cascade).

    Scale shape: one range window per key carrying <= window_buckets
    register arrays (w * 2^p ints, driver-side constants), one
    zip-with-greatest fold per row — never a raw re-scan, never a
    self-join on the bucket spine.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")
    if window_buckets < 1:
        raise ValueError(f"window_buckets must be >= 1, got {window_buckets}")
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    m = 1 << p
    span = (window_buckets - 1) * bucket_seconds
    base = sketches.select(
        *key_cols,
        "bucket",
        F.unix_timestamp("bucket").alias("_t"),
        # p/width mismatch would silently misfold — fail loudly
        F.when(F.size("regs") == m, F.col("regs"))
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"hll_trailing_distinct: p={p} expects {m} registers,"
                    " got %s",
                    F.size("regs").cast("string"),
                )
            )
        )
        .alias("regs"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_t")
        .rangeBetween(-span, 0)
    )
    folded = base.select(
        *key_cols,
        "bucket",
        F.collect_list("regs").over(w).alias("_rs"),
    )
    merged = F.expr(
        f"aggregate(_rs, array_repeat(0, {m}),"
        " (acc, x) -> zip_with(acc, x, (a, b) -> greatest(a, b)))"
    )
    return _hll_finish(
        folded.select(*key_cols, "bucket", merged.alias("regs")), p
    )
