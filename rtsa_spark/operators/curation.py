"""End-to-end curation-funnel accounting for training-corpus builds.

Every production data-curation pipeline publishes a *funnel report*: how
many documents and tokens enter each stage and how many survive it — the
number the team watches when a filter regression silently eats half the
corpus. This module composes the repo's curation primitives
(language gate -> exact dedup -> Gopher quality rules -> DSIR importance
selection, the canonical modern ordering per Dolma/RefinedWeb/DSIR) and
emits one row per stage with exact-int document/token counts and
e4-floored survival percentages, so two engines agree bit-for-bit.

Scale shape: the funnel is an AUDIT query — each stage reduces to a
one-row aggregate, unioned (5 rows total). The per-document work is the
stage operators' own shapes (dedup: one shuffle on the content hash;
Gopher: one projection + the bigram agg; DSIR: one feature explode + two
broadcast-sized bucket models). At 100 TB you materialize each stage's
survivor set as a pipeline table and point the next stage at it (exactly
what ``TierPipeline`` does for tiers); this composition form is for
auditing a corpus that fits a single pass and for proving the stages
compose with zero driver-side glue.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from rtsa_spark.functions.text import gopher_filter
from rtsa_spark.operators.dedup import dedup_exact
from rtsa_spark.operators.sampling import dsir_select

#: (stage_ord, stage) labels in funnel order.
FUNNEL_STAGES = ("ingest", "lang", "dedup", "quality", "select")


def curation_funnel(
    df: DataFrame,
    lang_keep: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    gopher_kwargs: dict | None = None,
    dsir_kwargs: dict | None = None,
) -> DataFrame:
    """Per-stage survival accounting for the standard curation cascade.

    Stages (each consumes the previous stage's survivors):

    0. ``ingest``  — every input row (tokens = whitespace word count,
       0 for empty text);
    1. ``lang``    — ``lang_col == lang_keep``;
    2. ``dedup``   — exact content dedup, min-id survivor per
       ``md5(text)`` (:func:`~rtsa_spark.operators.dedup.dedup_exact`);
    3. ``quality`` — Gopher rule conjunction
       (:func:`~rtsa_spark.functions.text.gopher_filter`; documents with
       zero words cannot pass);
    4. ``select``  — DSIR top-fraction importance selection
       (:func:`~rtsa_spark.operators.sampling.dsir_select`) — NOTE the
       DSIR bucket models are built from THIS funnel's stage-3 survivors,
       as the paper prescribes (select from the cleaned pool), so the
       stage is corpus-dependent by design.

    Output: ``(stage_ord, stage, docs, tokens, docs_pct_e4,
    tokens_pct_e4)`` — percentages are e4 floors relative to the
    ``ingest`` stage (0 when ingest is empty), so the row set is
    integer-exact across engines.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("text"),
        F.size(
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')")
        ).cast("bigint").alias("n_tok"),
    )
    lang_ok = base.where(F.col("lang") == lang_keep)
    surv = dedup_exact(lang_ok, text_col="text", id_col="doc_id").select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    dd = lang_ok.join(surv, "doc_id")
    gk = gopher_filter(dd, **(gopher_kwargs or {})).where("keep").select(
        "doc_id"
    )
    qd = dd.join(gk, "doc_id")
    sk = dsir_select(qd, **(dsir_kwargs or {})).where("keep").select(
        "doc_id"
    )
    sd = qd.join(sk, "doc_id")

    def stage_agg(stage_df, ord_, name):
        return stage_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("bigint").alias(
                "tokens"
            ),
        ).select(
            F.lit(ord_).cast("bigint").alias("stage_ord"),
            F.lit(name).alias("stage"),
            "docs",
            "tokens",
        )

    rows = stage_agg(base, 0, "ingest")
    for ord_, (name, stage_df) in enumerate(
        zip(FUNNEL_STAGES[1:], (lang_ok, dd, qd, sd)), start=1
    ):
        rows = rows.unionByName(stage_agg(stage_df, ord_, name))
    ing = rows.where(F.col("stage_ord") == 0).select(
        F.col("docs").alias("_d0"), F.col("tokens").alias("_t0")
    )
    return rows.crossJoin(F.broadcast(ing)).select(
        "stage_ord",
        "stage",
        "docs",
        "tokens",
        F.when(F.col("_d0") > 0, F.expr("(10000 * docs) div _d0"))
        .otherwise(F.lit(0)).cast("bigint").alias("docs_pct_e4"),
        F.when(F.col("_t0") > 0, F.expr("(10000 * tokens) div _t0"))
        .otherwise(F.lit(0)).cast("bigint").alias("tokens_pct_e4"),
    )
