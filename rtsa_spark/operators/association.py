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

__all__ = ["pair_rules"]


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
