"""As-of (backward) join — each left row matched to the latest right row
at-or-before its timestamp, per key.

The classic time-series enrichment op (kdb+ ``aj``, pandas
``merge_asof``) that Spark's relational join surface lacks: joining raw
events to the most recent completed retention-tier row, a price stream to
the prevailing quote, a sequence batch to the last published checkpoint.
Extends the reference's bucket-exact tier matching
(``/root/reference/R/rtsa.stl.R:120-126`` aligns cells to their
containing period) to *continuous* time alignment.

Spark-first plan — NO join node at all:

- tag both inputs, union them (cheap: narrow, no shuffle),
- one hash shuffle on the key into a single ordered window,
- ``last(value, ignorenulls=True)`` over rows-unbounded-preceding carries
  the latest right-side payload forward onto every left row,
- filter back to the left rows.

Cost is ONE shuffle of |L| + |R| rows — no range-explosion, no
per-key driver loop, no broadcast requirement on either side. Skewed
keys degrade exactly like any windowed op and are AQE-splittable. At
100 TB this is the plan you want: a sort-merge window, not an
O(|L|·|R|) interval join.

Tie semantics: right rows sort BEFORE left rows at equal timestamps, so
a left row at exactly ``t`` sees a right row stamped ``t``
(at-or-before, ``<=``). Multiple right rows on the same (key, ts) are
disambiguated by the caller-supplied deterministic ``order_col`` (both
engines replay the same total order, keeping the DuckDB oracle
hash-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every ``left`` row, attach the payload of
    the latest ``right`` row with ``right[right_ts] <= left[left_ts]``
    for the same ``key_col``.

    Returns all ``left`` columns plus, for each payload column ``c``,
    ``c + suffix`` (NULL when no right row precedes the left row) and
    ``right_ts + suffix`` — the matched right timestamp.

    Timestamps may be timestamp or numeric columns; ordering uses the
    column's native sort. Right rows must be unique per
    ``(key_col, right_ts)`` for a deterministic match (true for
    retention-tier inputs, which are unique per (source, bucket)).
    """
    lcols = left.columns
    marker = [f"{c}{suffix}" for c in payload_cols] + [f"{right_ts}{suffix}"]

    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_l"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )

    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in marker
        ],
    )
    out = carried.where(F.col("_is_l") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_m_{c}").alias(c) for c in marker],
    )
    return out
