"""Row-level survivorship audits: the north-rule invariant — every row
that survives a pipeline stage must carry its token array BYTE-FOR-BYTE
equal to the source table — as a first-class, countable operator
instead of an assertion buried in tests.

Reference analogue: rtsa's masking contract (a masked cell is dropped,
never mutated — ``/root/reference/R/rtsa.ts.mask.R``); here the unit is
the pre-tokenized training sequence and the contract is that rollup /
mask / dedup / sampling stages SELECT rows, never rewrite payloads.

Scale shape: one equi-join on the id (the survivors side is usually
the smaller — Spark broadcasts it when it fits), array equality in
codegen, one combinable count agg.  At 10^12 rows this is a single
id-keyed shuffle; run it per partition-month via the usual pruned
reads when a full pass is too much.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_audit"]


def token_audit(
    survivors: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Audit surviving rows against the source-of-truth table: per key,
    how many survivors carry an IDENTICAL token array, how many were
    mutated in flight, and how many reference ids the source does not
    know.

    Emits ``(keys..., n_rows, n_matched, n_mismatched, n_missing)``
    with ``n_rows = n_matched + n_mismatched + n_missing`` exactly;
    a healthy pipeline reports ``n_rows == n_matched`` everywhere and
    anything else is a payload-corruption finding with an exact count
    (the keys localize WHERE).  Null-safe: a NULL survivor array only
    matches a NULL source array.

    ``key_cols`` come from the SURVIVORS side (e.g. source/stage);
    duplicate ids on the source side raise upstream assumptions, not
    here — the join is many-to-one by contract.
    """
    s = survivors.select(
        *key_cols,
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_ts"),
    )
    src = source.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).alias("_tr"),
        F.lit(1).alias("_present"),
    )
    j = s.join(src, "_id", "left")
    missing = F.col("_present").isNull()
    matched = (~missing) & F.col("_ts").eqNullSafe(F.col("_tr"))
    return j.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(matched.cast("int")).cast("bigint").alias("n_matched"),
        F.sum(((~missing) & ~F.col("_ts").eqNullSafe(F.col("_tr"))).cast("int"))
        .cast("bigint")
        .alias("n_mismatched"),
        F.sum(missing.cast("int")).cast("bigint").alias("n_missing"),
    )
