"""Column-level data profiling: the ANALYZE-TABLE read a pipeline runs
on every new batch before trusting it — null rates, exact distincts,
and value ranges per column, one row per column.

Schema-drift monitoring companion to ``distribution.distribution_drift``
(which compares value DISTRIBUTIONS period over period): this one
watches the container — a column suddenly 40% null, a distinct count
collapsing, a max that jumped an order of magnitude — the cheap signals
that catch upstream breakage before any analytic does.

Exact-int contract: counts and one trailing e6 div; min/max are
computed in the column's native type and then rendered to strings (so
one output schema covers heterogeneous columns; numeric rendering of
BIGINT/VARCHAR is identical across engines — profiling DOUBLE columns
renders engine-dependently and is excluded by precondition).

Scale shape: ONE global aggregation computing 4 stats per column (the
exact ``count(distinct)`` expands the agg per column — the honest
cost; swap in ``sketch.kmv_distinct`` per column when 100 TB exactness
is not required), then an in-row ``stack`` unpivot of the single
result row.  No shuffle beyond the agg's own partial/final pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile"]

_FORBIDDEN = ("double", "float")


def column_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Profile ``columns`` of ``df``: one output row per column —
    ``(column, n, n_null, n_distinct, null_e6, min_str, max_str)``
    with ``null_e6 = (1e6 * n_null) div n`` (NULL on an empty input)
    and ``n_distinct`` the EXACT distinct count of non-null values.

    Floating-point columns are rejected (their string rendering is not
    engine-portable; profile their exact-int scaled twins instead —
    the repo-wide convention).
    """
    if not columns:
        raise ValueError("need at least one column to profile")
    types = dict(df.dtypes)
    for c in columns:
        if c not in types:
            raise ValueError(f"column {c!r} not in DataFrame")
        if any(t in types[c] for t in _FORBIDDEN):
            raise ValueError(
                f"column {c!r} is {types[c]}: float rendering is not "
                "engine-portable; profile an exact-int scaled column"
            )
    aggs = []
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"_n_{i}"),
            F.sum(col.isNull().cast("int")).cast("bigint").alias(f"_nn_{i}"),
            F.count_distinct(col).cast("bigint").alias(f"_nd_{i}"),
            F.min(col).cast("string").alias(f"_mn_{i}"),
            F.max(col).cast("string").alias(f"_mx_{i}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _n_{i}, _nn_{i}, _nd_{i}, _mn_{i}, _mx_{i}"
        for i, c in enumerate(columns)
    )
    rows = one.selectExpr(
        f"stack({len(columns)}, {stacked})"
        " as (column, n, n_null, n_distinct, min_str, max_str)"
    )
    return rows.select(
        "column",
        "n",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("bigint").alias("n_null"),
        "n_distinct",
        F.when(
            F.col("n") > 0,
            F.expr(
                "(1000000 * coalesce(n_null, 0)) div greatest(n, 1)"
            ),
        )
        .cast("bigint")
        .alias("null_e6"),
        "min_str",
        "max_str",
    )
