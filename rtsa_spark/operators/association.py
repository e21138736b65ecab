"""Pairwise association rules over item baskets: support, confidence,
lift — the A-Priori 2-itemset pass (Agrawal & Srikant 1994) as pure
DataFrame algebra.

The co-occurrence read a pipeline runs over event streams ("users who
export also share"), corpus tags, or per-document vocabularies.  Only
the PAIR pass is implemented: longer itemsets explode combinatorially
and the 2-itemset table already carries the lift/confidence signals the
monitoring family consumes.

Exact-int contract: counts and one trailing ``div`` per e6 ratio;
``lift_e6 = (1e6 * n_both * n_baskets) div (n_ante * n_cons)`` is the
cross-multiplied form (no intermediate probabilities).  Overflow: the
lift numerator passes 2^63 once ``n_both * n_baskets`` nears 9.2e12 —
at 1e6 baskets that allows every pair count, and ANSI throws loudly
past it (the repo's guard stance).

Scale shape: one distinct on (key, basket, item), one combinable item-
count agg, A-Priori prune BEFORE the pair join (only items meeting
``min_count`` survive — the frequent-item table is what self-joins, so
the within-basket pair explosion is bounded by the pruned basket
width), one groupBy on pairs, and two broadcast-sized margin joins.
No driver-side loops; nothing basket-volume-sized past the pair agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pair_rules", "cramers_v"]


def pair_rules(
    df: DataFrame,
    key_cols: list[str],
    basket_cols: list[str],
    item_col: str,
    min_count: int = 2,
) -> DataFrame:
    """Association rules between item PAIRS per key: for every ordered
    pair (antecedent -> consequent) of distinct frequent items that
    co-occur in at least one basket, emit

    ``(keys..., antecedent, consequent, n_baskets, n_ante, n_cons,
    n_both, support_e6, confidence_e6, lift_e6)``

    with ``support = n_both / n_baskets``, ``confidence = n_both /
    n_ante``, ``lift = confidence / (n_cons / n_baskets)``.  Both
    directions of a co-occurring pair appear (confidence is
    asymmetric); an item never pairs with itself.  ``min_count`` is the
    A-Priori frequency floor on BASKET count per item — items below it
    are pruned before the pair join (an infrequent item cannot be part
    of a frequent pair), and pairs inherit the floor through their
    members (a pair's ``n_both`` may be below ``min_count``; filter on
    ``support_e6`` downstream if a pair floor is wanted).

    Basket identity is the composite ``basket_cols`` tuple (e.g.
    ``["user_id", "day"]`` for daily user sessions); multiplicity
    within a basket is collapsed first, so counts are BASKET counts.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if not basket_cols:
        raise ValueError("need at least one basket column")
    base = df.select(
        *key_cols,
        F.struct(*basket_cols).alias("_bk"),
        F.col(item_col).alias("_it"),
    ).distinct()
    nb = base.groupBy(*key_cols).agg(
        F.count_distinct("_bk").cast("bigint").alias("n_baskets")
    )
    ic = base.groupBy(*key_cols, "_it").agg(
        F.count(F.lit(1)).cast("bigint").alias("_ic")
    )
    freq = ic.where(F.col("_ic") >= min_count)
    # A-Priori prune: only frequent items re-enter the basket table
    pruned = base.join(freq, [*key_cols, "_it"]).select(
        *key_cols, "_bk", "_it"
    )
    a = pruned.select(*key_cols, "_bk", F.col("_it").alias("antecedent"))
    b = pruned.select(*key_cols, "_bk", F.col("_it").alias("consequent"))
    pairs = (
        a.join(b, [*key_cols, "_bk"])
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy(*key_cols, "antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    with_m = (
        pairs.join(
            freq.select(
                *key_cols,
                F.col("_it").alias("antecedent"),
                F.col("_ic").alias("n_ante"),
            ),
            [*key_cols, "antecedent"],
        )
        .join(
            freq.select(
                *key_cols,
                F.col("_it").alias("consequent"),
                F.col("_ic").alias("n_cons"),
            ),
            [*key_cols, "consequent"],
        )
        .join(nb, [*key_cols])
    )
    return with_m.select(
        *key_cols,
        "antecedent",
        "consequent",
        "n_baskets",
        "n_ante",
        "n_cons",
        "n_both",
        F.expr("(1000000 * n_both) div n_baskets").cast("bigint").alias(
            "support_e6"
        ),
        F.expr("(1000000 * n_both) div n_ante").cast("bigint").alias(
            "confidence_e6"
        ),
        F.expr("(1000000 * n_both * n_baskets) div (n_ante * n_cons)")
        .cast("bigint")
        .alias("lift_e6"),
    )


def cramers_v(
    df: DataFrame,
    key_cols: list[str],
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Chi-square independence test + Cramér's V effect size between two
    categorical columns per key (Pearson 1900; Cramér 1946) — the
    "is lang associated with source" screen run before stratifying a
    mixture on a column that might be confounded with another.

    Emits ``(keys..., n, r_cats, c_cats, dof, chi2, v)``.  Exact-int
    contingency counts and margins; each cell's contribution
    ``(c_ij - e_ij)^2 / e_ij`` (``e_ij = r_i * k_j / n``) is a fixed
    chain of correctly-rounded double ops, and the cells are summed in
    ascending ``(a, b)`` order via an explicit sorted fold — the
    ordered-float-reduction device (CLAUDE.md), so both engines produce
    the identical ``chi2`` double.  ``v = sqrt(chi2 / (n * min(r-1,
    c-1)))``, NULL when either column is constant (dof 0).  Rows with a
    NULL category are excluded (not evidence, same stance as
    :func:`~rtsa_spark.operators.evaluation.cohens_kappa`).

    Scale shape: one groupBy builds the categories^2 contingency table;
    everything after runs on category-sized frames (margins join, one
    in-row sorted fold).
    """
    if not key_cols:
        raise ValueError("cramers_v needs at least one key column")
    cont = (
        df.select(
            *key_cols,
            F.col(a_col).cast("string").alias("_a"),
            F.col(b_col).cast("string").alias("_b"),
        )
        .where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy(*key_cols, "_a", "_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    rows = cont.groupBy(*key_cols, "_a").agg(
        F.sum("_c").cast("bigint").alias("_rc")
    )
    cols = cont.groupBy(*key_cols, "_b").agg(
        F.sum("_c").cast("bigint").alias("_cc")
    )
    tot = cont.groupBy(*key_cols).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.count_distinct("_a").cast("bigint").alias("r_cats"),
        F.count_distinct("_b").cast("bigint").alias("c_cats"),
    )
    j = (
        cont.join(rows, [*key_cols, "_a"])
        .join(cols, [*key_cols, "_b"])
        .join(tot.select(*key_cols, "n"), [*key_cols])
    )
    # per-cell contribution: exact ints -> e = r*k/n (1 divide),
    # d = c - e (c converts exactly below 2^53), cell = d*d/e — an
    # explicit multiply, never pow() (pow is not correctly rounded)
    cell = F.expr(
        "((cast(_c as double)"
        "  - cast(_rc * _cc as double) / cast(n as double))"
        " * (cast(_c as double)"
        "    - cast(_rc * _cc as double) / cast(n as double)))"
        " / (cast(_rc * _cc as double) / cast(n as double))"
    )
    per_key = j.select(
        *key_cols, F.struct("_a", "_b", cell.alias("cell")).alias("_s")
    ).groupBy(*key_cols).agg(
        F.expr(
            "aggregate(array_sort(collect_list(_s)),"
            " cast(0 as double), (acc, x) -> acc + x.cell)"
        ).alias("chi2")
    )
    out = tot.join(per_key, [*key_cols])
    dof = (F.col("r_cats") - 1) * (F.col("c_cats") - 1)
    return out.select(
        *key_cols,
        "n",
        "r_cats",
        "c_cats",
        dof.cast("bigint").alias("dof"),
        "chi2",
        F.when(
            (F.col("r_cats") > 1) & (F.col("c_cats") > 1),
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.least(F.col("r_cats") - 1, F.col("c_cats") - 1)
                ).cast("double")
            ),
        ).alias("v"),
    )
