"""Deduplication operators for training-data pipelines.

Four families, all pure DataFrame ops (no UDFs — every hash/shingle/band
is a Catalyst expression, so dedup runs JVM-side at full codegen speed):

- exact:        content-hash groupBy (one shuffle on the hash)
- fingerprint:  normalization (lowercase, whitespace-strip) then exact
- MinHash+LSH:  shingle -> k minhashes -> banded buckets -> bucket join
- SimHash:      per-bit majority vote over word hashes
- n-gram Jaccard: exact verify step for LSH candidate pairs

Hashes are md5 (hex string) so results are byte-identical to the ANSI-SQL
oracles; at 100 TB swap ``_hash_expr`` for ``xxhash64`` (same topology, 8x
cheaper, no semantic change — the seam is one function).

Scale notes: the shingle explode is the heavy stage — it shuffles
(doc_id, shingle) pairs but aggregates them map-side into k running mins,
so wire volume is k*docs, not total shingles. The LSH bucket join is an
equi-join on band_hash: dominant buckets (boilerplate docs) are exactly the
skew AQE's skew-join splitting handles. The verify stage (Jaccard) touches
only candidate pairs, never the full cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content-hash dedup: survivor = min id per hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def dedup_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalized fingerprint dedup (case/whitespace-insensitive)."""
    fp = F.md5(F.regexp_replace(F.lower(F.col(text_col)), " ", ""))
    return (
        df.groupBy(fp.alias("fingerprint"))
        .agg(
            F.min(id_col).alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingled(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) rows: word n-grams, 1-based indexing to match the SQL
    oracle. The text is split ONCE into a projected array column — naive
    inline expressions re-evaluate split() per shingle word, which was the
    dominant cost of the whole minhash stage.

    Documents shorter than ``n`` words contribute their whole text as one
    degenerate shingle (rather than being silently dropped from the
    near-dup pipeline — identical short docs must still collide).

    The input is fanned out first (:func:`~rtsa_spark.plans.spread.
    fan_out_scan`): a small single-row-group corpus file is one scan task,
    and the shingle explode is exactly the per-row-heavy stage that must
    not run on one core (no-op past a split per core)."""
    from rtsa_spark.plans.spread import fan_out_scan

    df = fan_out_scan(df)
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_w"), F.col(text_col)
    )
    sh = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_w"), i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(F.col(text_col)))
    return words.select(id_col, F.explode(sh).alias("shingle"))


#: 31-bit universal-hash constants for the xxhash64 signature path,
#: deterministic (seeded) so results are reproducible across runs
_MERSENNE_31 = (1 << 31) - 1


def _uh_constants(n_hashes: int, seed: int = 9):
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_31, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE_31, size=n_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """k MinHash signatures per doc. One explode + one groupBy with k
    running mins (map-side combined, so wire volume is k*docs).

    ``hash_fn`` is the documented performance seam (VERDICT r1):

    - ``"xxhash64"`` (default, the scale path): the shingle is hashed
      ONCE (JVM xxhash64), then the k signatures derive from k cheap
      31-bit universal-hash mixes ``(a_j*h + b_j) mod (2^31-1)`` — pure
      codegen arithmetic, no re-hashing of the string per signature, and
      products stay < 2^62 so ANSI overflow cannot throw.
    - ``"md5"``: one md5 per (shingle, j) — 8x the string hashing, kept
      because the ANSI-SQL correctness oracle replays it byte-for-byte.
    """
    shingled = _shingled(df, text_col, id_col, shingle_n)
    if hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"sig_{j}")
            for j in range(n_hashes)
        ]
    elif hash_fn == "xxhash64":
        a, b = _uh_constants(n_hashes)
        base = F.pmod(F.xxhash64(F.col("shingle")), F.lit(1 << 31))
        aggs = [
            F.min(
                F.pmod(F.lit(int(a[j])) * base + F.lit(int(b[j])), F.lit(_MERSENNE_31))
            ).alias(f"sig_{j}")
            for j in range(n_hashes)
        ]
    else:
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")
    return shingled.groupBy(id_col).agg(*aggs)


def _banded(sigs: DataFrame, n_hashes: int, band_size: int, id_col: str, hash_fn: str):
    """Explode signatures into (id, band, band_hash) rows."""
    n_bands = n_hashes // band_size

    def band_hash(b):
        cols = [F.col(f"sig_{b * band_size + i}") for i in range(band_size)]
        if hash_fn == "md5":
            return F.md5(F.concat(*cols))
        return F.xxhash64(*cols).cast("string")

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_hash(b).alias("band_hash"))
            for b in range(n_bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def minhash_lsh_buckets(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH banding: hash each band of ``band_size`` signatures; docs
    sharing a (band, band_hash) are near-dup candidates. Returns bucket
    occupancy: (band, band_hash, n_docs, survivor_doc_id). ``hash_fn``:
    see minhash_signatures (xxhash64 = scale default, md5 = oracle)."""
    sigs = minhash_signatures(df, n_hashes, shingle_n, text_col, id_col, hash_fn)
    exploded = _banded(sigs, n_hashes, band_size, id_col, hash_fn)
    return exploded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("survivor_doc_id"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs from LSH band buckets: docs sharing any
    (band, band_hash) bucket, deduped across bands BEFORE any expensive
    verify work. Returns (doc_a, doc_b), doc_a < doc_b.

    This is the scale-correct candidate generator: the pair space is the
    union of per-bucket cliques (bucket sizes bounded by signature
    collisions), never a popularity-keyed near-cartesian join. Dominant
    buckets (boilerplate) are plain equi-join skew -> AQE skew-join splits
    them (mechanical evidence:
    tests/test_dedup.py::test_lsh_candidate_join_aqe_skew_split drives
    this exact join on a synthesized hot bucket and asserts
    ``SortMergeJoin(skew=true)`` in the final adaptive plan)."""
    sigs = minhash_signatures(df, n_hashes, shingle_n, text_col, id_col, hash_fn)
    exploded = _banded(sigs, n_hashes, band_size, id_col, hash_fn)
    return candidate_pair_join(exploded, id_col)


def candidate_pair_join(exploded: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The LSH bucket self-join: docs sharing a (band, band_hash) bucket
    become candidate pairs (doc_a < doc_b), deduped across bands. Split
    out of :func:`minhash_lsh_pairs` so the AQE skew audit drives the
    production join verbatim on a controlled bucket distribution.

    Skew note for 100 TB operators: AQE's skew-join split fires when a
    hot bucket's partition exceeds BOTH the skewed-partition byte
    threshold AND ``skewedPartitionFactor`` x the MEDIAN partition size.
    A corpus where boilerplate dominates EVERY partition (e.g. one
    identical doc replicated everywhere — all of its band buckets hot at
    once) drags the median up and defeats detection; such corpora need
    an explicit bucket-size cap (drop or sample buckets with
    ``n_docs > cap`` from minhash_lsh_buckets) before the pair join,
    because their pair output is quadratic anyway."""
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_lsh(
    df: DataFrame,
    min_jaccard_e4: int = 5000,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact word-set Jaccard verify over MinHash-LSH candidate pairs —
    the default near-dup pipeline at scale (candidates bounded by LSH
    buckets; the exact verify touches only candidate pairs). Integer-exact
    ``jaccard_e4 = floor(1e4*|∩|/|∪|)``.

    Supersedes the 1-perm bucket in :func:`ngram_jaccard_pairs` (whose
    common-word buckets go near-cartesian on boilerplate-heavy corpora);
    that variant remains only as the legacy oracle query."""
    pairs = minhash_lsh_pairs(
        df, n_hashes, band_size, shingle_n, text_col, id_col, hash_fn
    )
    ws = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("ws"),
    )
    j = (
        pairs.join(ws.select(F.col(id_col).alias("doc_a"), F.col("ws").alias("ws_a")), "doc_a")
        .join(ws.select(F.col(id_col).alias("doc_b"), F.col("ws").alias("ws_b")), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    uni = F.size(F.col("ws_a")) + F.size(F.col("ws_b")) - inter
    jac = F.floor(10000 * inter / uni)
    return (
        j.select("doc_a", "doc_b", jac.alias("jaccard_e4"))
        .where(F.col("jaccard_e4") >= min_jaccard_e4)
    )


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash: per bit, majority vote of word-hash bits (words
    weighted by multiplicity). Word hash = first 8 hex chars of md5 as
    int (engine-portable)."""
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    h = F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("bigint")
    hashed = words.select(id_col, h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    simhash = None
    for b in range(16):
        term = F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return agg.select(id_col, simhash.cast("int").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    min_jaccard_e4: int = 5000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs sharing a 1-perm minhash
    bucket (min word-md5). Integer-exact jaccard_e4 = floor(1e4*|∩|/|∪|).

    The bucket join bounds the pair space; at scale, feed LSH buckets from
    ``minhash_lsh_buckets`` instead of the 1-perm bucket."""
    ws = F.array_distinct(F.split(F.col(text_col), " "))
    keyed = df.select(
        F.col(id_col),
        ws.alias("ws"),
        F.array_min(F.transform(ws, lambda x: F.md5(x))).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    uni = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    jac = F.floor(10000 * inter / uni)
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            jac.alias("jaccard_e4"),
        )
        .where(F.col("jaccard_e4") >= min_jaccard_e4)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate edges: min-label
    propagation with pointer jumping. Returns ``(id_col, cluster_id)``
    where ``cluster_id`` is the MINIMUM member id of the component — a
    deterministic canonical label any engine can reproduce (the DuckDB
    oracle replays it with a recursive CTE).

    Scale shape: each iteration is one neighbor-min shuffle plus one
    pointer-jumping self-join (path halving), so convergence is
    O(log diameter) iterations; LSH near-dup graphs are unions of bucket
    cliques (diameter ~2), so 2-3 iterations in practice. Per-iteration
    ``localCheckpoint`` keeps the plan depth constant (see
    operators/dineof.py). Raises after ``max_iter`` instead of silently
    emitting partial components.

    Reference scope: rtsa has no near-dup clustering; this closes the
    LLM-pipeline dedup family (pairs -> components -> canonical pick),
    the step a training-data pipeline actually dedupes with.
    """
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = sym.distinct().localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(
            nbr, labels["id"] == nbr["dst"], "left"
        ).select(
            "id",
            "comp",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp1"),
        )
        changed = stepped.where(F.col("comp1") < F.col("comp")).limit(1).count()
        # pointer jumping (path halving): comp <- label(comp)
        l2 = labels.select(
            F.col("id").alias("p_id"), F.col("comp").alias("p_comp")
        )
        labels = stepped.join(
            l2, stepped["comp1"] == l2["p_id"], "left"
        ).select(
            "id",
            F.least(
                F.col("comp1"), F.coalesce(F.col("p_comp"), F.col("comp1"))
            ).alias("comp"),
        ).localCheckpoint(eager=True)
        if changed == 0:
            return labels.select(F.col("id").alias(id_col), F.col("comp").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations —"
        " pathological chain graph; raise max_iter"
    )


def dedup_clusters(
    df: DataFrame,
    min_jaccard_e4: int = 5000,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """End-to-end near-dup cluster resolution: LSH candidate pairs ->
    exact-Jaccard verify (:func:`ngram_jaccard_lsh`) -> connected
    components -> canonical pick. One row per document:
    ``(id, cluster_id, cluster_size, is_canonical)`` with
    ``is_canonical = (id == cluster_id)`` (keep-min-id policy —
    deterministic; swap the ordering column for keep-longest/keep-newest).
    Filtering to ``is_canonical`` yields the deduplicated corpus."""
    verified = ngram_jaccard_lsh(
        df, min_jaccard_e4, n_hashes, band_size, shingle_n,
        text_col, id_col, hash_fn,
    ).select("doc_a", "doc_b")
    comps = connected_components(verified, df, id_col)
    sizes = comps.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return comps.join(sizes, "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    winnowing fingerprint (Schleimer 2003; functions/text.py) with an
    eval/benchmark document. The winnowing guarantee makes this catch
    any shared run of >= w+k-1 words — the n-gram-overlap test
    pretraining pipelines run before training so eval questions are not
    memorized from the corpus.

    Plan shape at 100 TB: benchmark sets are tiny (MBs) next to the
    corpus, so its fingerprint set is BROADCAST and the flagging is a
    map-side join at scan speed — the full corpus is fingerprinted in one
    projection+explode, never shuffled on content. Returns one row per
    contaminated corpus doc: ``(doc_id, n_shared_fps,
    n_benchmark_docs_hit)``.
    """
    from pyspark.sql.functions import broadcast

    from ..functions.text import winnow_fingerprints

    corp_fp = winnow_fingerprints(
        corpus, k=k, w=w, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    )
    bench_fp = winnow_fingerprints(
        benchmark, k=k, w=w, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    ).withColumnRenamed(id_col, "bench_doc_id")
    hits = corp_fp.join(broadcast(bench_fp), "fingerprint")
    return hits.groupBy(id_col).agg(
        F.countDistinct("fingerprint").cast("bigint").alias("n_shared_fps"),
        F.countDistinct("bench_doc_id").cast("bigint").alias(
            "n_benchmark_docs_hit"
        ),
    )


def token_ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Token-level n-gram decontamination — the published method run on
    pre-tokenized corpora (GPT-3 used 13-gram, PaLM / Llama-style
    pipelines 8-gram token overlap vs eval sets): for every corpus
    sequence, the share of its consecutive token n-grams that also occur
    anywhere in the benchmark set. The word-level winnowing variant is
    :func:`contamination_check`; this one operates on the token-id
    arrays themselves (the north-rule table's payload) and reports the
    contamination FRACTION so a pipeline can apply the usual
    "drop if > X% dirty" rule rather than any-hit flagging.

    Grams are md5 over the comma-joined token window — engine-portable,
    built in one codegen projection (``transform`` over an index
    ``sequence``; the slice never leaves the row). Plan shape at 100 TB:
    the benchmark gram set is tiny and BROADCAST; the corpus side
    explodes its grams and left-joins map-side (scan speed, no shuffle
    on content), then one map-side-combinable count per sequence id.
    Sequences shorter than ``n`` have no grams: ``n_grams = 0`` and a
    NULL ``dirty_e6`` (never a div-by-zero under ANSI).

    Returns one row per corpus sequence:
    ``(id_col, n_grams, n_dirty, dirty_e6)`` with
    ``dirty_e6 = (1e6 * n_dirty) div n_grams`` — 1e6 means every window
    is benchmark material (a verbatim eval leak).
    """
    from pyspark.sql.functions import broadcast

    def grams_of(col):
        strs = F.transform(col, lambda x: x.cast("string"))
        return F.when(
            F.size(col) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(col) - n + 1),
                lambda i: F.md5(F.array_join(F.slice(strs, i, n), ",")),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bench_grams = (
        benchmark.select(
            F.explode(grams_of(F.col(tokens_col))).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corp = corpus.select(
        F.col(id_col),
        F.explode_outer(grams_of(F.col(tokens_col))).alias("gram"),
    )
    joined = corp.join(broadcast(bench_grams), "gram", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("gram").cast("bigint").alias("n_grams"),
        F.count("_hit").cast("bigint").alias("n_dirty"),
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_dirty",
        F.when(
            F.col("n_grams") > 0, F.expr("(1000000 * n_dirty) div n_grams")
        ).alias("dirty_e6"),
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-span mass: the fraction of a document's
    winnowing fingerprints (Schleimer 2003; functions/text.py) that also
    occur in at least one OTHER document. This is the substring-level
    dedup decision input (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): whole-doc and near-dup hashes miss a
    boilerplate header pasted into thousands of otherwise-unique pages;
    the winnowing guarantee makes any shared run of >= w+k-1 words raise
    ``dup_ppm`` here.

    Plan shape at 100 TB: fingerprint once (projection + explode, no
    UDF), one map-side-combinable groupBy(fingerprint) to count carrier
    docs (fingerprints are pre-deduped per doc, so ``count(*)`` is the
    distinct-doc count), one fingerprint-keyed equi-join back, one
    groupBy(doc). Two shuffles total, both on high-cardinality keys; no
    pairwise blow-up — cost is linear in corpus fingerprints regardless
    of how many documents share a span.

    Returns ``(doc_id, tot_fp, dup_fp, dup_ppm)`` with ``dup_ppm =
    floor(dup_fp * 1e6 / tot_fp)`` exact-int (tot_fp >= 1 always: even
    an empty text yields one whole-text gram).
    """
    from ..functions.text import winnow_fingerprints

    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    )
    carriers = fps.groupBy("fingerprint").agg(
        F.count("*").alias("n_docs")
    )
    return (
        fps.join(carriers, "fingerprint")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("tot_fp"),
            F.sum(
                F.when(F.col("n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("dup_fp"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("dup_fp * 1000000L div tot_fp"),
        )
    )


def _hash64(hash_fn: str):
    """Column -> BIGINT hash chooser shared by the rewrite operators:
    ``xxhash64`` is the production fast path; ``md5`` (first 12 hex chars
    as BIGINT) is the cross-engine stream every ANSI-SQL oracle replays."""
    if hash_fn == "md5":
        return lambda g: F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast(
            "bigint"
        )
    if hash_fn == "xxhash64":
        # wrapped: the bare varargs builtin is rejected as a higher-order
        # function lambda (transform needs fixed arity)
        return lambda g: F.xxhash64(g)
    raise ValueError("hash_fn must be 'xxhash64' or 'md5'")


def strip_duplicate_spans(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Substring-level dedup REWRITE (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" — the remove step their
    suffix-array pipeline performs, here on the winnowing index that
    :func:`duplicate_spans` already measures): every winnowing window
    whose fingerprint occurs in >= 2 documents is removed from all
    documents EXCEPT one canonical owner (min ``id_col`` per
    fingerprint), so exactly one copy of each duplicated span survives
    the corpus.  Windows cover ``w + k - 1`` words, matching the
    winnowing guarantee (any shared run of >= w+k-1 words shares a
    fingerprint), so removals track real shared substrings, not single
    words.

    Fully deterministic and engine-replayable: lowercased words hash
    (same stream as :func:`~rtsa_spark.functions.text.winnow_fingerprints`;
    ``hash_fn="md5"`` for the DuckDB oracle), reconstruction keeps the
    original-case words outside the killed positions joined by single
    spaces.  Documents with no duplicated spans pass through with their
    text byte-identical (never split-rejoined).

    Plan shape at 100 TB: fingerprint windows are one projection +
    explode (no UDF); the carrier index is one map-side-combinable
    groupBy(fingerprint); kill windows come back via one
    fingerprint-keyed equi-join (never pairwise).  Only documents that
    actually contain a non-canonical duplicated span are word-exploded
    and reassembled — the rewrite cost is proportional to the duplicated
    subset, untouched documents never leave columnar form.

    Returns ``(id_col, n_words, n_removed, text_out)`` — exact BIGINT
    counts; ``n_removed`` is the number of word positions dropped.
    """
    span = w + k - 1
    words = F.split(F.col(text_col), " ")
    lw = F.split(F.lower(F.col(text_col)), " ")
    h = _hash64(hash_fn)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(lw) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(lw, i + 1, k)),
    )
    hashes = F.transform(grams, h)
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(hashes) - w, F.lit(0))),
        lambda j: F.struct(
            j.alias("j"), F.array_min(F.slice(hashes, j + 1, w)).alias("fp")
        ),
    )
    base = df.select(
        F.col(id_col), F.col(text_col), F.size(words).alias("_n")
    )
    w2 = base.select(
        id_col, "_n", F.explode(wins).alias("_w")
    ).select(
        id_col, "_n", F.col("_w.j").alias("j"), F.col("_w.fp").alias("fp")
    )
    carriers = (
        w2.select(id_col, "fp")
        .distinct()
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("_owner"),
        )
        .where(F.col("n_docs") >= 2)
    )
    kill_pos = (
        w2.join(carriers, "fp")
        .where(F.col(id_col) != F.col("_owner"))
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.col("j"),
                    F.least(F.col("j") + F.lit(span - 1), F.col("_n") - 1),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    removed = kill_pos.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_removed")
    )
    # rebuild ONLY the touched documents; everyone else passes through
    touched = base.join(removed, id_col)
    rebuilt = (
        touched.select(
            id_col, F.posexplode(words).alias("pos", "_word")
        )
        .join(kill_pos, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_word"))),
                    lambda s: s["_word"],
                ),
            ).alias("_text_out")
        )
    )
    out_touched = (
        touched.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("_n").cast("bigint").alias("n_words"),
            "n_removed",
            # a fully-killed document rebuilds to the empty string
            F.coalesce(F.col("_text_out"), F.lit("")).alias("text_out"),
        )
    )
    out_clean = base.join(removed, id_col, "left_anti").select(
        id_col,
        F.col("_n").cast("bigint").alias("n_words"),
        F.lit(0).cast("bigint").alias("n_removed"),
        F.col(text_col).alias("text_out"),
    )
    return out_clean.unionByName(out_touched)


LINE_POS_CAP = 1_000_000


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact line/paragraph-level corpus deduplication (the C4 "we
    deduplicated three-sentence spans" / Dolma "exact paragraph dedup"
    step, Raffel et al. 2020 §2.2, Soldaini et al. 2024): every line
    that occurs more than once IN THE WHOLE CORPUS keeps only its first
    occurrence (lexicographic min of ``(id_col, line position)``); all
    later occurrences — in other documents or repeated inside the same
    document — are dropped. Empty lines are never treated as duplicates
    and always pass through. ``sep`` is a literal separator (regex
    metacharacters are escaped before Spark's regex ``split``).

    Plan shape at 100 TB: split + posexplode is a projection; duplicated
    lines are found by one map-side-combinable groupBy on the line hash
    (only the BIGINT hash shuffles, never line text); kill positions come
    back via one hash-keyed equi-join against that (much smaller)
    duplicate index. Only documents that actually lose a line are
    re-assembled — clean documents pass through byte-identical without a
    split/rejoin. Line positions are guarded < ``LINE_POS_CAP`` so the
    ``doc_id * CAP + pos`` owner key stays exact BIGINT (requires
    ``doc_id < 2^53 / CAP``; a longer document raises loudly).

    Returns ``(id_col, n_lines, n_removed, text_out)`` — exact BIGINT
    counts; removed lines leave no separator behind.
    """
    import re

    h = _hash64(hash_fn)
    lines = F.split(F.col(text_col), re.escape(sep))
    base = df.select(
        F.col(id_col), F.col(text_col), F.size(lines).alias("_n")
    )
    # guard lives INSIDE the owner-key expression so column pruning can
    # never drop it: pos < n_lines, so capping pos caps the line count
    okey = F.when(
        F.col("pos") >= LINE_POS_CAP,
        F.raise_error(
            F.format_string(
                f"line_dedup: document %s has >= {LINE_POS_CAP} lines — "
                "raise LINE_POS_CAP (and check the 2^53 doc_id bound)",
                F.col(id_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(F.col(id_col) * F.lit(LINE_POS_CAP) + F.col("pos"))
    occ = (
        base.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
                "pos", "_line"
            ),
        )
        .where(F.col("_line") != "")
        .select(id_col, "pos", h(F.col("_line")).alias("lh"), okey.alias("_okey"))
    )
    dup_index = (
        occ.groupBy("lh")
        .agg(F.count("*").alias("n_occ"), F.min("_okey").alias("_owner"))
        .where(F.col("n_occ") >= 2)
    )
    kill_pos = (
        occ.join(dup_index, "lh")
        .where(F.col("_okey") != F.col("_owner"))
        .select(id_col, "pos")
    )
    removed = kill_pos.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_removed")
    )
    touched = base.join(removed, id_col)
    rebuilt = (
        touched.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
                "pos", "_line"
            ),
        )
        .join(kill_pos, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_line"))),
                    lambda s: s["_line"],
                ),
                sep,
            ).alias("_text_out")
        )
    )
    out_touched = touched.join(rebuilt, id_col, "left").select(
        id_col,
        F.col("_n").cast("bigint").alias("n_lines"),
        "n_removed",
        # a document whose every line was a later duplicate rebuilds empty
        F.coalesce(F.col("_text_out"), F.lit("")).alias("text_out"),
    )
    out_clean = base.join(removed, id_col, "left_anti").select(
        id_col,
        F.col("_n").cast("bigint").alias("n_lines"),
        F.lit(0).cast("bigint").alias("n_removed"),
        F.col(text_col).alias("text_out"),
    )
    return out_clean.unionByName(out_touched)


def simhash_hamming_pairs(
    simhashes: DataFrame,
    max_dist: int = 2,
    bits: int = 16,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """All pairs within Hamming distance ``max_dist`` of each other's
    SimHash, WITHOUT the all-pairs join: the pigeonhole block index of
    Manku, Jain & Das Sarma 2007 ("Detecting near-duplicates for web
    crawling").  Split the ``bits`` fingerprint into ``max_dist + 1``
    contiguous blocks; two codes within distance ``max_dist`` differ in
    at most ``max_dist`` blocks, so AT LEAST ONE block matches exactly
    (pigeonhole — completeness is guaranteed, pytest pins it against
    brute force).  Candidates are the per-block equi-join buckets; the
    exact verify is one ``bit_count(xor) <= max_dist`` per candidate.

    Scale shape: ``max_dist + 1`` projections of the fingerprint table
    (each one narrow int pair), one equi-join per block key — bucket
    sizes are the block-value collision classes (2^blockbits spread), a
    vanilla skew surface that AQE splits; never a cartesian.  The
    verify is codegen integer ops.  This is the near-dup counterpart of
    the exact-match ``simhash16`` grouping: distance 0 reduces to it.

    Output: ``(id_a, id_b, dist)`` with ``id_a < id_b``, deduped across
    blocks.
    """
    if not 0 <= max_dist < bits:
        raise ValueError(f"max_dist must be in [0, {bits}), got {max_dist}")
    n_blocks = max_dist + 1
    base, extra = divmod(bits, n_blocks)
    sizes = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    rows = simhashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).cast("bigint").alias("_h")
    )
    parts = []
    off = 0
    for i, sz in enumerate(sizes):
        parts.append(
            rows.select(
                "_id",
                "_h",
                F.lit(i).alias("_blk"),
                F.shiftright(F.col("_h"), off)
                .bitwiseAND(F.lit((1 << sz) - 1))
                .alias("_key"),
            )
        )
        off += sz
    blocks = parts[0]
    for p in parts[1:]:
        blocks = blocks.unionByName(p)
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(
            F.col("_ha").bitwiseXOR(F.col("_hb"))
        ).cast("bigint").alias("dist"),
    ).where(F.col("dist") <= max_dist)


def simhash48(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """48-bit SimHash — the production-selectivity fingerprint for
    :func:`simhash_hamming_pairs` (16 bits saturates: ~1% of random
    code pairs collide within distance 3, so at corpus scale almost
    everything pairs; at 48 bits random pairs at small distance are
    vanishingly rare and the survivors are genuinely similar — the
    sf0.01 documents show 40 pairs at d<=3 vs 39k for 16-bit).

    Same majority-vote construction as :func:`simhash16` over the
    portable 48-bit md5-prefix word hash (12 hex chars — parses exactly
    in both engines' signed 64-bit ints; a 64-bit code would overflow
    DuckDB's signed parse, so 48 is the portable maximum).

    Scale shape: one split, one hash, one groupBy with 48 map-side-
    combinable vote sums — same single shuffle as simhash16.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    h = F.conv(F.substring(F.md5(F.col("word")), 1, 12), 16, 10).cast(
        "bigint"
    )
    hashed = words.select(id_col, h.alias("h"))
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(48)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    simhash = None
    for b in range(48):
        term = F.when(F.col(f"v_{b}") > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("bigint")
        simhash = term if simhash is None else simhash + term
    return agg.select(id_col, simhash.cast("bigint").alias("simhash"))


def edit_near_dup(
    df: DataFrame,
    max_edit: int = 20,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
) -> DataFrame:
    """Typo-level near-duplicate pairs by EXACT edit distance, with the
    pigeonhole SimHash index generating candidates: pairs whose
    ``bits``-wide fingerprints (48 default — production selectivity; 16
    for tiny corpora) sit within Hamming distance ``max_hamming`` are
    length-prefiltered (``|len_a - len_b| <= max_edit`` — a lower bound
    on Levenshtein, so the filter is lossless) and then verified with
    the engine's exact ``levenshtein`` (standard unit-cost
    insert/delete/substitute; Spark and DuckDB agree integer-for-
    integer, probed in the oracle).

    Recall contract (same stance as the LSH → exact-Jaccard family):
    the OUTPUT is exact for every candidate pair — a few-edits pair
    whose word-level fingerprints drifted past ``max_hamming`` is not
    generated (single-word edits flip at most that word's votes;
    pytest pins recall on a mutated corpus).  Precision is absolute.

    Output: ``(id_a, id_b, len_a, len_b, edit_dist)``, ``id_a < id_b``.

    Scale shape: the candidate space is the pigeonhole block index of
    :func:`simhash_hamming_pairs` (never a cartesian); the O(len^2)
    Levenshtein kernel runs ONLY on length-compatible candidates, JVM-
    side codegen.  ``max_edit`` also caps the kernel: pairs differing
    in length by more than it never reach the DP.
    """
    if max_edit < 0:
        raise ValueError(f"max_edit must be >= 0, got {max_edit}")
    if bits not in (16, 48):
        raise ValueError(f"bits must be 16 or 48, got {bits}")
    fp = simhash48 if bits == 48 else simhash16
    sims = fp(df, text_col=text_col, id_col=id_col)
    cand = simhash_hamming_pairs(
        sims, max_dist=max_hamming, bits=bits, id_col=id_col
    ).select("id_a", "id_b")
    texts = df.select(
        F.col(id_col).alias("_tid"),
        F.col(text_col).alias("_tx"),
        F.length(text_col).cast("bigint").alias("_ln"),
    )
    j = (
        cand.join(
            texts.select(
                F.col("_tid").alias("id_a"),
                F.col("_tx").alias("_ta"),
                F.col("_ln").alias("len_a"),
            ),
            "id_a",
        )
        .join(
            texts.select(
                F.col("_tid").alias("id_b"),
                F.col("_tx").alias("_tb"),
                F.col("_ln").alias("len_b"),
            ),
            "id_b",
        )
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= max_edit)
    )
    return (
        j.select(
            "id_a",
            "id_b",
            "len_a",
            "len_b",
            F.levenshtein("_ta", "_tb").cast("bigint").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= max_edit)
    )
