"""Distribution-comparison statistics between tier series: Spearman rank
correlation and the two-sample Kolmogorov-Smirnov statistic, per ordered
key pair.

Complements the reference's association surface — Mann-Kendall
(``/root/reference/R/rtsa.trend.R``, our ``functions/kendall.py``) is the
rank test rtsa runs WITHIN one series; these compare ACROSS series:
Spearman for monotone association between two sources on their common
bucket spine, KS for whether two sources draw bucket values from the same
distribution (the standard drift check a training-data pipeline runs
between corpus snapshots).

IEEE-deterministic contract (CLAUDE.md):

- Spearman with ties is Pearson on tie-averaged ranks.  We carry
  ``r2 = 2 * average_rank = rank_lt + rank_le + 1`` (``rank()`` +
  RANGE-framed ``count(*)``) so ranks stay exact BIGINT; the doubled
  scale cancels in Pearson.  With ``m`` the common-spine length and
  ``z = m*r2 - sum(r2)`` the exact-int residual numerators,
  ``rho = sum(zx*zy) / (sqrt(sum zx^2) * sqrt(sum zy^2))`` — integer
  sums in both engines, then a fixed int->double / sqrt / sqrt /
  multiply / divide chain (never ``sqrt(A*B)``: the product overflows
  the exact-int domain).
- KS: with ``n``/``m`` the two sample sizes and, at each observed value
  ``t``, ``i = #{x <= t}``, ``j = #{y <= t}`` (RANGE frames so ties are
  counted on both sides before comparing), the statistic's numerator
  ``max_t |i*m - j*n|`` is exact BIGINT; ``ks_e6 = (1e6*num) // (n*m)``
  never leaves integer arithmetic (ANSI overflow throws loudly rather
  than rounding).

Scale shape: one equi-join on bucket (Spearman) / one broadcast of the
tiny key-pair set (KS) — both quadratic in KEY count, not in rows;
callers with many keys pre-filter the pair set.  After pairing, each
statistic is one window pass + one map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_corr", "ks_two_sample", "distribution_drift", "histogram_emd"]


def spearman_corr(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Spearman rank correlation for every ordered key pair on the pair's
    common bucket spine.

    Emits ``(kx, ky, m, rho_e9)`` with ``rho_e9 = floor(1e9 * rho)``;
    NULL rho when the spine is shorter than 2 or either side's ranks are
    constant on it.  Ties get average ranks (the standard treatment), so
    the result equals Pearson correlation of the tie-averaged ranks.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("bigint").alias("_x"),
    )
    left = base.select(F.col("_k").alias("kx"), "_ts", F.col("_x").alias("x"))
    right = base.select(F.col("_k").alias("ky"), "_ts", F.col("_x").alias("y"))
    pair = left.join(right, "_ts").where(F.col("kx") < F.col("ky"))

    # Doubled tie-averaged ranks, exact ints: rank() = #{< v} + 1 and the
    # RANGE-framed count = #{<= v}; their sum is 2*avg_rank (+1 cancels -1).
    def _r2(col: str) -> F.Column:
        wo = Window.partitionBy("kx", "ky").orderBy(col)
        wr = wo.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        return (F.rank().over(wo) + F.count(F.lit(1)).over(wr) - 1).cast(
            "bigint"
        )

    ranked = pair.select(
        "kx", "ky", _r2("x").alias("_rx"), _r2("y").alias("_ry")
    )
    stats = ranked.groupBy("kx", "ky").agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("_rx").alias("_srx"),
        F.sum("_ry").alias("_sry"),
    )
    z = (
        ranked.join(F.broadcast(stats), ["kx", "ky"])
        .withColumn("_zx", F.col("_m") * F.col("_rx") - F.col("_srx"))
        .withColumn("_zy", F.col("_m") * F.col("_ry") - F.col("_sry"))
    )
    agg = z.groupBy("kx", "ky", "_m").agg(
        F.sum(F.col("_zx") * F.col("_zy")).alias("_num"),
        F.sum(F.col("_zx") * F.col("_zx")).alias("_dx"),
        F.sum(F.col("_zy") * F.col("_zy")).alias("_dy"),
    )
    ok = (F.col("_m") >= 2) & (F.col("_dx") > 0) & (F.col("_dy") > 0)
    rho = F.col("_num").cast("double") / (
        F.sqrt(F.col("_dx").cast("double")) * F.sqrt(F.col("_dy").cast("double"))
    )
    return agg.select(
        "kx",
        "ky",
        F.col("_m").alias("m"),
        F.when(ok, F.floor(F.lit(1e9) * rho)).cast("bigint").alias("rho_e9"),
    )


def ks_two_sample(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic for every ordered key pair
    over the keys' value distributions (no spine alignment — KS compares
    marginal distributions).

    Emits ``(kx, ky, n, m, d_num, ks_e6)``: ``d_num = max_t |i*m - j*n|``
    exact BIGINT and ``ks_e6 = (1e6 * d_num) // (n * m)`` — the classic
    ``D = sup_t |F_x(t) - F_y(t)|`` scaled to e6, evaluated at every
    observed value with ties absorbed into both empirical CDFs before
    comparison.
    """
    base = df.select(
        F.col(key_col).alias("_k"), F.col(value_col).cast("bigint").alias("_v")
    )
    keys = base.select("_k").distinct()
    pairs = (
        keys.select(F.col("_k").alias("kx"))
        .crossJoin(keys.select(F.col("_k").alias("ky")))
        .where(F.col("kx") < F.col("ky"))
    )
    # Tag each observation with the side it contributes to in each pair
    # the key participates in; the pair set is tiny (quadratic in key
    # count), so both joins broadcast.
    xs = base.join(
        F.broadcast(pairs), base["_k"] == pairs["kx"]
    ).select("kx", "ky", "_v", F.lit(1).alias("_is_x"))
    ys = base.join(
        F.broadcast(pairs), base["_k"] == pairs["ky"]
    ).select("kx", "ky", "_v", F.lit(0).alias("_is_x"))
    both = xs.unionByName(ys)

    wr = (
        Window.partitionBy("kx", "ky")
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("kx", "ky")
    cum = both.select(
        "kx",
        "ky",
        F.sum("_is_x").over(wr).alias("_i"),
        F.sum(1 - F.col("_is_x")).over(wr).alias("_j"),
        F.sum("_is_x").over(wall).alias("_n"),
        F.sum(1 - F.col("_is_x")).over(wall).alias("_m"),
    )
    agg = (
        cum.groupBy("kx", "ky", "_n", "_m")
        .agg(
            F.max(
                F.abs(F.col("_i") * F.col("_m") - F.col("_j") * F.col("_n"))
            ).alias("d_num")
        )
        .select(
            "kx",
            "ky",
            F.col("_n").alias("n"),
            F.col("_m").alias("m"),
            F.col("d_num").cast("bigint").alias("d_num"),
        )
    )
    # Integer `div` (not floor-of-double): 1e6*d_num can pass 2^53 long
    # before it nears 2^63, and a lossy double conversion would put the
    # floor off by one.  Both sides nonnegative, so Spark `div` ==
    # DuckDB `//`.
    return agg.withColumn(
        "ks_e6",
        F.when(
            (F.col("n") > 0) & (F.col("m") > 0),
            F.expr("(1000000 * d_num) div (n * m)"),
        ).cast("bigint"),
    )


def distribution_drift(
    df: DataFrame, key_col: str, period_col: str, item_col: str
) -> DataFrame:
    """Categorical-distribution drift between ADJACENT observed periods of
    each key: for every consecutive period pair ``(prev -> period)`` in the
    key's observed spine, compare the item-frequency distributions.

    The day-over-day / snapshot-over-snapshot mix monitor a training-data
    pipeline runs on its ingest (which sources / users / languages make up
    today's batch vs yesterday's?).  Complements :func:`ks_two_sample`:
    KS compares two NUMERIC marginals once, this walks the period spine
    and compares CATEGORICAL mixes pairwise.

    Emits per ``(key, period)`` with ``prev_period`` the key's previous
    observed period (spine gaps collapse — "previous" means previous
    OBSERVED, like the reference's irregular-spine handling in
    ``/root/reference/R/rtsa.trend.R``'s pairwise walks):

    - ``n_union`` / ``n_both``: item-support sizes (either / both sides);
      ``jaccard_e6 = (1e6 * n_both) // n_union`` — support overlap.
    - ``tvd_e6``: total variation distance ``0.5 * sum_i |p_i - q_i|``
      scaled to e6.  Exact-int chain: with per-side counts ``c/d`` and
      totals ``T_c/T_d``, ``tvd_num = sum |c_i*T_d - d_i*T_c|`` is an
      exact BIGINT and ``tvd_e6 = (1e6*tvd_num) // (2*T_c*T_d)``.
    - ``linf_e6``: worst single-item shift ``max_i |p_i - q_i|`` as
      ``(1e6 * max_i |c_i*T_d - d_i*T_c|) // (T_c*T_d)``.

    No float ever materializes, so both engines agree bit-for-bit.  ANSI
    overflow throws loudly when ``1e6 * T_c * T_d`` nears 2^63 (~ 3e6 rows
    per period side); at that scale drift should be run on a rolled-up
    tier or sampled counts, not the raw event stream.

    Scale shape: one map-side-combinable groupBy on ``(key, period,
    item)``, a period-spine window over the KEY-PERIOD set (tiny), then
    one groupBy on ``(key, pair, item)`` of the role-tagged union — counts
    flow through two shuffles of the distinct-triple set, never a second
    pass over the fact rows, and nothing is ever all-pairs-of-periods.
    """
    c = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(period_col).alias("p"),
            F.col(item_col).alias("item"),
        )
        .groupBy("key", "p", "item")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = c.groupBy("key", "p").agg(F.sum("c").alias("tot"))
    w = Window.partitionBy("key").orderBy("p")
    # per-key observed-period spine: each period knows its successor, so a
    # count row can be re-tagged into the NEXT period's comparison pair.
    spine = tot.select(
        "key",
        F.col("p").alias("prev_p"),
        F.col("tot").alias("tot_prv"),
        F.lead("p").over(w).alias("pair"),
    ).where(F.col("pair").isNotNull())

    cur = c.select(
        "key",
        F.col("p").alias("pair"),
        "item",
        F.col("c").alias("cur_c"),
        F.lit(0).cast("bigint").alias("prv_c"),
    )
    prv = (
        c.join(spine.select("key", "prev_p", "pair"), ["key"])
        .where(F.col("p") == F.col("prev_p"))
        .select(
            "key",
            "pair",
            "item",
            F.lit(0).cast("bigint").alias("cur_c"),
            F.col("c").alias("prv_c"),
        )
    )
    g = (
        cur.unionByName(prv)
        .groupBy("key", "pair", "item")
        .agg(F.sum("cur_c").alias("cur_c"), F.sum("prv_c").alias("prv_c"))
    )
    j = (
        g.join(
            tot.select("key", F.col("p").alias("pair"), F.col("tot").alias("tot_cur")),
            ["key", "pair"],
        )
        .join(
            spine.select("key", "pair", "prev_p", "tot_prv"), ["key", "pair"]
        )
    )
    diff = F.abs(F.col("cur_c") * F.col("tot_prv") - F.col("prv_c") * F.col("tot_cur"))
    agg = j.groupBy("key", "pair", "prev_p", "tot_cur", "tot_prv").agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum(
            F.when((F.col("cur_c") > 0) & (F.col("prv_c") > 0), 1).otherwise(0)
        ).alias("n_both"),
        F.sum(diff).alias("_tvd_num"),
        F.max(diff).alias("_linf_num"),
    )
    # Integer div throughout (nonnegative operands: Spark `div` == DuckDB
    # `//`); 1e6-scaled numerators stay exact BIGINT where a double floor
    # could land off by one.
    return agg.select(
        "key",
        F.col("pair").alias("period"),
        F.col("prev_p").alias("prev_period"),
        "tot_cur",
        "tot_prv",
        F.col("n_union").cast("bigint").alias("n_union"),
        F.col("n_both").cast("bigint").alias("n_both"),
        F.expr("(1000000 * n_both) div n_union").cast("bigint").alias("jaccard_e6"),
        F.expr("(1000000 * _tvd_num) div (2 * tot_cur * tot_prv)")
        .cast("bigint")
        .alias("tvd_e6"),
        F.expr("(1000000 * _linf_num) div (tot_cur * tot_prv)")
        .cast("bigint")
        .alias("linf_e6"),
    )


def histogram_emd(
    df: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    bin_width: int,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift between ADJACENT observed
    periods of each key over a NUMERIC column, computed exactly from
    fixed-width bins: unlike :func:`distribution_drift`'s TVD (which
    only sees probability mass moved), W1 weighs HOW FAR the mass
    moved — the "latencies doubled" vs "latencies reshuffled"
    distinction a drift monitor needs for ordered values.

    Identity: ``W1 = integral |F_A - F_B| dx`` over the value line; on
    binned data the CDF difference is piecewise constant between
    observed bins, so with per-pair union bins b_1 < ... < b_m,

        W1 = bin_width * sum_i |cumA_i*nB - cumB_i*nA| * (b_{i+1}-b_i)
                       / (nA*nB)

    where the cums and totals are exact BIGINTs — one cross-multiplied
    integer sum, one trailing div: ``emd_e6 = (1e6 * bin_width * S)
    div (nA * nB)`` is 1e6 x W1 in VALUE units, bit-identical on any
    engine.  The final observed bin contributes 0 (both CDFs reached
    1), so the open tail never enters.  ANSI overflow throws loudly
    once ``1e6 * bin_width * S`` nears 2^63 (S is bounded by
    bin-range x nA x nB — run wide-range drift on coarser bins).

    Emits ``(key, period, prev_period, n_cur, n_prv, emd_e6)`` per
    adjacent observed pair.  Scale shape: the distribution_drift
    role-tagged-union device over BIN rows — two shuffles of the
    distinct (key, period, bin) set, one cum window per pair, never a
    second pass over fact rows.
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    binned = df.select(
        F.col(key_col).alias("key"),
        F.col(period_col).alias("p"),
        F.expr(
            f"(cast({value_col} as bigint)"
            f" - pmod(cast({value_col} as bigint), {int(bin_width)}))"
            f" div {int(bin_width)}"
        ).alias("bin"),
    )
    c = binned.groupBy("key", "p", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = c.groupBy("key", "p").agg(F.sum("c").cast("bigint").alias("tot"))
    w = Window.partitionBy("key").orderBy("p")
    spine = tot.select(
        "key",
        F.col("p").alias("prev_p"),
        F.col("tot").alias("n_prv"),
        F.lead("p").over(w).alias("pair"),
    ).where(F.col("pair").isNotNull())
    cur = c.select(
        "key",
        F.col("p").alias("pair"),
        "bin",
        F.col("c").alias("cur_c"),
        F.lit(0).cast("bigint").alias("prv_c"),
    )
    prv = (
        c.join(spine.select("key", "prev_p", "pair"), ["key"])
        .where(F.col("p") == F.col("prev_p"))
        .select(
            "key",
            "pair",
            "bin",
            F.lit(0).cast("bigint").alias("cur_c"),
            F.col("c").alias("prv_c"),
        )
    )
    u = (
        cur.unionByName(prv)
        .groupBy("key", "pair", "bin")
        .agg(
            F.sum("cur_c").cast("bigint").alias("cc"),
            F.sum("prv_c").cast("bigint").alias("pc"),
        )
    )
    cw = (
        Window.partitionBy("key", "pair")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = u.select(
        "key",
        "pair",
        "bin",
        F.sum("cc").over(cw).alias("cumc"),
        F.sum("pc").over(cw).alias("cump"),
        (
            F.lead("bin").over(Window.partitionBy("key", "pair").orderBy("bin"))
            - F.col("bin")
        ).alias("gap"),
    )
    totals = tot.select(
        "key", F.col("p").alias("pair"), F.col("tot").alias("n_cur")
    )
    joined = (
        stepped.join(totals, ["key", "pair"])
        .join(spine.select("key", "pair", "prev_p", "n_prv"), ["key", "pair"])
    )
    s = joined.groupBy("key", "pair", "prev_p", "n_cur", "n_prv").agg(
        F.sum(
            F.when(
                F.col("gap").isNotNull(),
                F.abs(
                    F.col("cumc") * F.col("n_prv")
                    - F.col("cump") * F.col("n_cur")
                )
                * F.col("gap"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("_s")
    )
    return s.select(
        "key",
        F.col("pair").alias("period"),
        F.col("prev_p").alias("prev_period"),
        "n_cur",
        "n_prv",
        F.expr(
            f"(1000000 * {int(bin_width)} * _s)"
            " div greatest(n_cur * n_prv, 1)"
        )
        .cast("bigint")
        .alias("emd_e6"),
    )
