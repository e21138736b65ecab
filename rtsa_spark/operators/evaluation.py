"""Classifier evaluation over scored corpora: exact-int AUC, threshold
metrics, and calibration tables.

The missing third leg of the curation stack: `text.quality_classifier` /
`gopher_filter` / `dsir_select` PRODUCE keep/drop scores; before gating
100 TB on one, a pipeline measures the score against labels on an eval
sample.  All three operators here are pure Catalyst rank/group algebra
in the repo's IEEE-deterministic contract — counts and one trailing
``div`` per derived column, no floats anywhere:

- :func:`binary_auc` — ROC AUC per key via the Mann-Whitney U identity
  ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)`` (Mann & Whitney
  1947; tie handling by midranks, Hanley & McNeil 1982).  Midranks are
  half-integers, so everything is carried DOUBLED (``sum2_ranks_pos =
  n_pos_g * (min_rank + max_rank)`` per tie group) and the e6 quotient
  divides by ``2 * n_pos * n_neg`` — exact integers end to end.
- :func:`threshold_metrics` — confusion counts + precision/recall/F1 at
  caller-fixed score thresholds (F1's harmonic mean is the exact
  rational ``2tp / (2tp + fp + fn)``, one div).
- :func:`calibration_bins` — the reliability table (DeGroot & Fienberg
  1983): equal-width score bins vs observed positive rate, the
  "is 0.9 really 90%?" read.

Overflow stance (ANSI throws loudly, same as the 2^53 guards): the AUC
numerator ``1e6 * 2 * n_pos * n_neg`` passes 2^63 once a single key
holds ~4e6 labeled rows — far beyond any human-labeled eval set; scores
and thresholds are integers (milli/e6-scaled upstream, e.g.
``quality_classifier.score_milli``).

Scale shape: one shuffle on (key, score) groups + one window over the
per-score GROUP table (rows = distinct scores, not documents) for AUC;
single conditional aggregations for the other two.  Eval sets are
samples, but nothing here collects to the driver, so a 10^9-row sweep
still distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binary_auc", "threshold_metrics", "calibration_bins", "cohens_kappa", "ab_test", "ab_sequential", "proportion_ci"]


def binary_auc(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Tie-aware ROC AUC per key from integer scores and boolean labels.

    Emits ``(keys..., n, n_pos, n_neg, u2, auc_e6)`` where ``u2`` is
    twice the Mann-Whitney U statistic (doubled to keep midranks
    integral) and ``auc_e6 = (1e6 * u2) div (2 * n_pos * n_neg)`` —
    NULL when a key lacks both classes (AUC undefined).  0.5e6 = random,
    1e6 = perfect separation with higher scores positive.  NULL-labeled
    rows are EXCLUDED before any counting (unlabeled rows are not
    evidence for either class).

    The rank sum runs over per-(key, score) tie GROUPS: each group at
    ascending-score position spans ranks ``[cum - n_g + 1, cum]``, and
    its positives contribute midrank ``(min + max) / 2`` each — doubled:
    ``n_pos_g * (min + max)``.  Window rows = distinct scores per key.
    """
    lab = F.col(label_col).cast("boolean")
    g = (
        df.select(
            *key_cols,
            F.col(score_col).cast("bigint").alias("_s"),
            lab.cast("int").alias("_y"),
        )
        # NULL labels AND NULL scores are EXCLUDED: an unlabeled row is
        # not evidence, and a NULL score would rank NULLS-FIRST here but
        # NULLS-LAST in the SQL twin — silently divergent midranks
        .where(F.col("_y").isNotNull() & F.col("_s").isNotNull())
        .groupBy(*key_cols, "_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_g"),
            F.sum("_y").cast("bigint").alias("_pos_g"),
        )
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = g.select(
        *key_cols,
        "_n_g",
        "_pos_g",
        F.sum("_n_g").over(w).alias("_cum"),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.sum("_n_g").cast("bigint").alias("n"),
        F.sum("_pos_g").cast("bigint").alias("n_pos"),
        F.sum(
            F.col("_pos_g") * (F.col("_cum") - F.col("_n_g") + 1 + F.col("_cum"))
        )
        .cast("bigint")
        .alias("_sum2_rpos"),
    )
    n_neg = (F.col("n") - F.col("n_pos")).alias("n_neg")
    u2 = (
        F.col("_sum2_rpos") - F.col("n_pos") * (F.col("n_pos") + 1)
    ).alias("u2")
    out = agg.select(*key_cols, "n", "n_pos", n_neg, u2)
    return out.select(
        *key_cols,
        "n",
        "n_pos",
        "n_neg",
        "u2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("(1000000 * u2) div (2 * n_pos * n_neg)"),
        )
        .cast("bigint")
        .alias("auc_e6"),
    )


def threshold_metrics(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    label_col: str,
    thresholds: list[int],
) -> DataFrame:
    """Confusion counts and precision/recall/F1 per key at each fixed
    ``score >= threshold`` cut (the keep/drop sweep run before picking a
    corpus filter's operating point).

    Emits one row per (key, threshold): ``(keys..., threshold, tp, fp,
    fn, tn, precision_e6, recall_e6, f1_e6)`` — precision NULL when
    nothing is predicted positive, recall NULL when no positives exist;
    ``f1_e6 = (1e6 * 2 * tp) div (2*tp + fp + fn)`` (NULL when that
    denominator is 0, i.e. no positives and none predicted).

    Scale shape: the threshold list fans out via a literal array explode
    (|T| driver-side constants), then ONE combinable conditional
    aggregation — no self-joins, no second scan per threshold.
    """
    if not thresholds:
        raise ValueError("need at least one threshold")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError(f"thresholds must be distinct, got {thresholds!r}")
    lab = F.col(label_col).cast("boolean")
    base = df.select(
        *key_cols,
        F.col(score_col).cast("bigint").alias("_s"),
        lab.alias("_y"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(int(t)).cast("bigint") for t in thresholds])
        ).alias("threshold"),
    )
    pred = F.col("_s") >= F.col("threshold")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = base.groupBy(*key_cols, "threshold").agg(
        cnt(pred & F.col("_y")).alias("tp"),
        cnt(pred & ~F.col("_y")).alias("fp"),
        cnt(~pred & F.col("_y")).alias("fn"),
        cnt(~pred & ~F.col("_y")).alias("tn"),
    )
    return agg.select(
        *key_cols,
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("(1000000 * tp) div (tp + fp)"),
        )
        .cast("bigint")
        .alias("precision_e6"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr("(1000000 * tp) div (tp + fn)"),
        )
        .cast("bigint")
        .alias("recall_e6"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.expr("(2000000 * tp) div (2 * tp + fp + fn)"),
        )
        .cast("bigint")
        .alias("f1_e6"),
    )


def calibration_bins(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    score_scale: int = 1_000_000,
) -> DataFrame:
    """Reliability table per key: equal-width bins over an integer score
    in ``[0, score_scale]`` vs the observed positive rate — a calibrated
    scorer's ``frac_pos_e6`` tracks its ``mean_score_e6`` bin by bin.

    Emits ``(keys..., bin, bin_lo_e6, n, n_pos, mean_score_e6,
    frac_pos_e6)``; ``bin = score * n_bins div score_scale`` clamped to
    ``n_bins - 1`` (so score == scale lands in the top bin), empty bins
    absent.  Scores outside [0, scale] raise upstream of any arithmetic
    (a wrong-scale join would silently pile into the edge bins);
    NULL-labeled rows are EXCLUDED (not evidence — same stance as
    :func:`binary_auc`), so ``frac_pos_e6`` is over labeled rows only.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if score_scale < n_bins:
        raise ValueError(f"score_scale must be >= n_bins, got {score_scale}")
    s = F.col(score_col).cast("bigint")
    base = df.select(
        *key_cols,
        F.when(
            (s >= 0) & (s <= score_scale), s
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"calibration_bins: score out of [0, {score_scale}]: %s",
                    s.cast("string"),
                )
            )
        )
        .alias("_s"),
        F.col(label_col).cast("boolean").cast("int").alias("_y"),
    ).where(F.col("_y").isNotNull())
    b = F.least(
        F.expr(f"(_s * {int(n_bins)}) div {int(score_scale)}"),
        F.lit(n_bins - 1).cast("bigint"),
    )
    agg = base.select(*key_cols, b.alias("bin"), "_s", "_y").groupBy(
        *key_cols, "bin"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("n_pos"),
        F.sum("_s").cast("bigint").alias("_sum_s"),
    )
    return agg.select(
        *key_cols,
        "bin",
        F.expr(f"(1000000 * bin) div {int(n_bins)}").cast("bigint").alias(
            "bin_lo_e6"
        ),
        "n",
        "n_pos",
        F.expr(f"(1000000 * _sum_s) div (n * {int(score_scale)})")
        .cast("bigint")
        .alias("mean_score_e6"),
        F.expr("(1000000 * n_pos) div n").cast("bigint").alias("frac_pos_e6"),
    )


def cohens_kappa(
    df: DataFrame,
    key_cols: list[str],
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Inter-annotator agreement per key: Cohen's kappa (Cohen 1960)
    over two categorical label columns — the QA read run before
    trusting a labeled eval set or a model-vs-model relabeling.

    Exact-rational form, cross-multiplied so no intermediate divide:
    with ``n`` pairs, observed-agreement numerator ``d = sum of diagonal
    counts`` and chance numerator ``pe_num = sum_c row_c * col_c``,
    ``kappa = (n*d - pe_num) / (n^2 - pe_num)`` — emitted as one e6
    ``div``; NULL when ``n^2 == pe_num`` (both raters constant — kappa
    undefined).  Negative kappa (worse than chance) rounds toward zero
    (sign-magnitude div — divide the absolute numerator, re-apply the
    sign), matching the oracle's CASE/abs replay.

    Emits ``(keys..., n, n_agree, pe_num, kappa_e6)``.

    Scale shape: one groupBy on (keys, a, b) — the contingency table,
    categories^2 rows — then category-sized row/column margins joined
    per key; nothing row-volume-sized past the first agg.  Overflow:
    ``1e6 * n * d`` passes 2^63 near n ~ 3e6 rows per key (ANSI throws
    loudly) — far beyond any annotated sample.
    """
    if not key_cols:
        raise ValueError("cohens_kappa needs at least one key column")
    cont = (
        df.select(
            *key_cols,
            F.col(a_col).cast("string").alias("_a"),
            F.col(b_col).cast("string").alias("_b"),
        )
        # a row either rater left unlabeled is not evidence: it would
        # inflate n while vanishing from n_agree and the pe margins
        .where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy(*key_cols, "_a", "_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    totals = cont.groupBy(*key_cols).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    rows = cont.groupBy(*key_cols, "_a").agg(
        F.sum("_c").cast("bigint").alias("_rc")
    )
    colx = cont.groupBy(*key_cols, "_b").agg(
        F.sum("_c").cast("bigint").alias("_cc")
    )
    pe = (
        rows.join(colx, [*key_cols])
        .where(F.col("_a") == F.col("_b"))
        .groupBy(*key_cols)
        .agg(F.sum(F.col("_rc") * F.col("_cc")).cast("bigint").alias("pe_num"))
    )
    # LEFT join + coalesce: raters with DISJOINT category sets produce
    # no matching (row, col) margin pair — pe_num is then exactly 0 and
    # kappa = n*0-0 / n^2-0 = 0, the honest "agreement never happens"
    # answer, not a dropped key
    out = totals.join(pe, [*key_cols], "left").fillna(0, subset=["pe_num"])
    # sign-magnitude toward-zero e6 quotient (den > 0 by Cauchy-Schwarz
    # unless both raters are constant; greatest() keeps the dead branch
    # ANSI-safe)
    kappa = F.expr(
        "case when n * n - pe_num > 0 then"
        " cast(signum(n * n_agree - pe_num) as bigint)"
        " * ((1000000 * abs(n * n_agree - pe_num))"
        "    div greatest(n * n - pe_num, 1)) end"
    )
    return out.select(
        *key_cols,
        "n",
        "n_agree",
        "pe_num",
        kappa.cast("bigint").alias("kappa_e6"),
    )


def ab_test(
    df: DataFrame,
    key_cols: list[str],
    variant_col: str,
    label_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion experiment read per key: control vs treatment
    conversion, exact-int rates and relative lift, and the pooled
    two-proportion z statistic (the standard A/B significance read)
    in the repo's IEEE-deterministic contract.

    Emits ``(keys..., n_c, x_c, n_t, x_t, rate_c_e6, rate_t_e6,
    lift_e6, z)`` where ``lift_e6`` is the sign-magnitude toward-zero
    e6 quotient of ``(x_t*n_c - x_c*n_t) / (x_c*n_t)`` (relative lift
    vs control; NULL when control converts zero) and

        z = (x_t*n_c - x_c*n_t) / sqrt(x*(n-x)/n * n_c*n_t)

    with ``x = x_c + x_t``, ``n = n_c + n_t`` — the cross-multiplied
    pooled form: one exact-int numerator, then a fixed final chain
    (int->double conversions, one divide, one multiply, one sqrt, one
    divide — every step correctly rounded, so both engines produce the
    identical double).  NULL when either arm is empty or the pooled
    variance is zero (all or none converted).  Rows whose variant is
    neither arm are ignored; NULL labels are excluded (not evidence).

    Scale shape: ONE combinable conditional aggregation — no joins, no
    second pass.  Exact-int terms stay under 2^63 for arms up to ~3e9
    rows (ANSI throws loudly past it).
    """
    v = F.col(variant_col).cast("string")
    y = F.col(label_col).cast("boolean")
    base = df.select(*key_cols, v.alias("_v"), y.alias("_y")).where(
        F.col("_y").isNotNull() & F.col("_v").isin(control, treatment)
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = base.groupBy(*key_cols).agg(
        cnt(F.col("_v") == control).alias("n_c"),
        cnt((F.col("_v") == control) & F.col("_y")).alias("x_c"),
        cnt(F.col("_v") == treatment).alias("n_t"),
        cnt((F.col("_v") == treatment) & F.col("_y")).alias("x_t"),
    )
    return _ab_finish(agg, [*key_cols])


def _ab_finish(agg: DataFrame, lead_cols: list[str]) -> DataFrame:
    """Append rates/lift/z to a frame carrying (n_c, x_c, n_t, x_t) —
    shared by :func:`ab_test` (one row per key) and
    :func:`ab_sequential` (one row per bucket, cumulative counts)."""
    num = "(x_t * n_c - x_c * n_t)"
    ok = "(n_c > 0 AND n_t > 0)"
    pooled = (
        "(cast((x_c + x_t) * ((n_c + n_t) - (x_c + x_t)) as double)"
        " / cast(n_c + n_t as double))"
        " * cast(n_c * n_t as double)"
    )
    return agg.select(
        *lead_cols,
        "n_c",
        "x_c",
        "n_t",
        "x_t",
        F.expr(
            "CASE WHEN n_c > 0 THEN (1000000 * x_c) div n_c END"
        ).cast("bigint").alias("rate_c_e6"),
        F.expr(
            "CASE WHEN n_t > 0 THEN (1000000 * x_t) div n_t END"
        ).cast("bigint").alias("rate_t_e6"),
        F.expr(
            f"CASE WHEN x_c * n_t > 0 THEN"
            f" cast(signum({num}) as bigint)"
            f" * ((1000000 * abs({num})) div greatest(x_c * n_t, 1)) END"
        ).cast("bigint").alias("lift_e6"),
        F.expr(
            f"CASE WHEN {ok} AND (x_c + x_t) > 0"
            f" AND (x_c + x_t) < (n_c + n_t) THEN"
            f" cast({num} as double) / sqrt({pooled}) END"
        ).alias("z"),
    )


def ab_sequential(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    variant_col: str,
    label_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """The experiment PEEKING CURVE: cumulative arm counts and the
    pooled two-proportion z after every observed bucket — what a
    sequential monitoring dashboard plots ("how has z evolved day by
    day"), with the same exact-int/fixed-float contract as
    :func:`ab_test`.  The curve is descriptive: repeated looks inflate
    the naive false-positive rate, so gate decisions on a corrected
    boundary (the z column is the input to one, not a decision).

    Emits one row per (key, bucket) observed for EITHER arm, with
    counts cumulative through that bucket: ``(keys..., bucket, n_c,
    x_c, n_t, x_t, rate_c_e6, rate_t_e6, lift_e6, z)``.  Exclusions
    (unknown arms, NULL labels) as in :func:`ab_test`.

    Scale shape: one per-bucket conditional agg, then four running-sum
    windows over the (tiny) bucket table per key.
    """
    v = F.col(variant_col).cast("string")
    y = F.col(label_col).cast("boolean")
    base = df.select(
        *key_cols,
        F.col(bucket_col).alias("bucket"),
        v.alias("_v"),
        y.alias("_y"),
    ).where(F.col("_y").isNotNull() & F.col("_v").isin(control, treatment))
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    per = base.groupBy(*key_cols, "bucket").agg(
        cnt(F.col("_v") == control).alias("_dn_c"),
        cnt((F.col("_v") == control) & F.col("_y")).alias("_dx_c"),
        cnt(F.col("_v") == treatment).alias("_dn_t"),
        cnt((F.col("_v") == treatment) & F.col("_y")).alias("_dx_t"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        *key_cols,
        "bucket",
        F.sum("_dn_c").over(w).cast("bigint").alias("n_c"),
        F.sum("_dx_c").over(w).cast("bigint").alias("x_c"),
        F.sum("_dn_t").over(w).cast("bigint").alias("n_t"),
        F.sum("_dx_t").over(w).cast("bigint").alias("x_t"),
    )
    return _ab_finish(cum, [*key_cols, "bucket"])


#: z for the 95% Wilson interval, and its square — fixed double
#: constants so both engines replay the identical rounding sequence.
WILSON_Z = 1.96
WILSON_Z2 = WILSON_Z * WILSON_Z


def proportion_ci(
    df: DataFrame,
    key_cols: list[str],
    label_col: str,
) -> DataFrame:
    """Wilson 95% score interval for a proportion per key (Wilson 1927)
    — the CI every rate dashboard should draw instead of the normal
    approximation that breaks near 0/1 and small n.

    Emits ``(keys..., n, x, rate_e6, lo_e6, hi_e6)`` with

        center = (x + z^2/2) / (n + z^2)
        half   = z / (n + z^2) * sqrt(x*(n-x)/n + z^2/4)

    evaluated as a FIXED sequence of correctly-rounded double ops over
    the exact-int ``n``/``x`` (each divide/multiply/add/sqrt rounds
    once, in the same order in both engines), then floored to e6 —
    bit-identical bounds anywhere.  NULL labels are excluded (not
    evidence); ``x*(n-x)`` stays exact below n ~ 1.9e8 rows per key
    (past that the int->double conversion would round — raise the
    sample out of one key first).

    Scale shape: one conditional aggregation, no joins.
    """
    y = F.col(label_col).cast("boolean")
    base = df.select(*key_cols, y.alias("_y")).where(F.col("_y").isNotNull())
    agg = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_y").cast("int")).cast("bigint").alias("x"),
    )
    # scientific-notation literals: a bare decimal routes through
    # DECIMAL in both engines' parsers (double-rounding trap, CLAUDE.md)
    z, z2 = "%.17e" % WILSON_Z, "%.17e" % WILSON_Z2
    center = f"(cast(x as double) + {z2} / 2) / (cast(n as double) + {z2})"
    half = (
        f"{z} / (cast(n as double) + {z2})"
        f" * sqrt(cast(x * (n - x) as double) / cast(n as double)"
        f"        + {z2} / 4)"
    )
    return agg.select(
        *key_cols,
        "n",
        "x",
        F.expr("CASE WHEN n > 0 THEN (1000000 * x) div n END")
        .cast("bigint")
        .alias("rate_e6"),
        F.expr(
            f"CASE WHEN n > 0 THEN"
            f" cast(floor(1e6 * (({center}) - ({half}))) as bigint) END"
        ).alias("lo_e6"),
        F.expr(
            f"CASE WHEN n > 0 THEN"
            f" cast(floor(1e6 * (({center}) + ({half}))) as bigint) END"
        ).alias("hi_e6"),
    )
