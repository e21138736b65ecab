"""Resumable tier pipeline: the engine's batch driver.

Runs the retention ladder stage by stage, persisting every tier before the
next reads it, with a lineage ledger that makes re-runs idempotent:

- each stage writes to ``<base>/<stage>`` (parquet, zstd) and appends a
  lineage row ``{run_id, stage, rows_in, rows_out, n_files, started_at,
  finished_at, status, fingerprint}`` to ``<base>/lineage.jsonl``;
- a stage is SKIPPED on re-run when a SUCCESS lineage row exists whose
  input fingerprint (row count of the stage input) matches — kill the
  driver between stages and rerun: completed tiers are not recomputed and
  final tables are identical (tested in tests/test_pipeline.py);
- writes go to a ``_tmp`` dir first and are atomically renamed, so a stage
  killed mid-write never leaves a half-table behind the SUCCESS check.

This is the parquet-backed emulation of Iceberg snapshot checkpoints
(SURVEY.md §7 "Iceberg in sandbox"): the lineage row plays the snapshot
commit, the atomic rename plays the manifest swap. On a real deployment the
``storage`` seam swaps to ``df.writeTo(...).createOrReplace()`` on an
Iceberg catalog with no driver changes.

The reference's analog is the per-function result-stack sink (S4 stacks,
``/root/reference/R/rtsa.stl.R:441-489``) — except rtsa recomputes
everything from scratch every call; resumability is ours.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from rtsa_spark.operators.gapfill import gapfill_linear
from rtsa_spark.operators.metrics import compute_metrics
from rtsa_spark.operators.rollup import TIER_ORDER, rollup_next, rollup_raw


class TierPipeline:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        tiers: list[str] | None = None,
        gapfill_tiers: tuple[str, ...] = ("hourly", "daily"),
        metrics_tiers: tuple[str, ...] = ("daily",),
        hist_tiers: tuple[str, ...] = (),
        hist_top_k: int | None = 128,
        run_id: str | None = None,
    ):
        self.spark = spark
        self.base = base_dir
        self.tiers = tiers or list(TIER_ORDER)
        self.gapfill_tiers = gapfill_tiers
        self.metrics_tiers = metrics_tiers
        self.hist_tiers = hist_tiers
        self.hist_top_k = hist_top_k
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(self.base, exist_ok=True)

    # ----------------------------------------------------------- ledger
    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.base, "lineage.jsonl")

    def _ledger(self) -> list[dict]:
        if not os.path.exists(self._ledger_path):
            return []
        with open(self._ledger_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _append_ledger(self, row: dict) -> None:
        with open(self._ledger_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def _completed(self, stage: str, fingerprint: int) -> bool:
        return any(
            r["stage"] == stage
            and r["status"] == "SUCCESS"
            and r["fingerprint"] == fingerprint
            for r in self._ledger()
        )

    # ------------------------------------------------------------ stages
    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def _write_stage(self, stage: str, df: DataFrame, rows_in: int) -> str:
        """Compute + atomically publish one stage, ledger-logged."""
        final = self._stage_path(stage)
        tmp = final + f"._tmp_{self.run_id}"
        t0 = time.time()
        df.write.mode("overwrite").parquet(tmp)
        rows_out = self.spark.read.parquet(tmp).count()
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        n_files = sum(1 for f in os.listdir(final) if f.endswith(".parquet"))
        self._append_ledger(
            {
                "run_id": self.run_id,
                "stage": stage,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "n_files": n_files,
                "started_at": t0,
                "finished_at": time.time(),
                "status": "SUCCESS",
                "fingerprint": rows_in,
            }
        )
        return final

    def run(self, sequences: DataFrame, fail_after: str | None = None) -> dict[str, str]:
        """Execute the ladder; returns {stage: path}. ``fail_after`` injects
        a crash after the named stage commits (resume testing)."""
        out: dict[str, str] = {}
        prev_df: DataFrame | None = None
        prev_rows = sequences.count()
        for tier in self.tiers:
            stage = f"rollup_{tier}"
            path = self._stage_path(stage)
            if self._completed(stage, prev_rows) and os.path.exists(path):
                tier_df = self.spark.read.parquet(path)
            else:
                computed = (
                    rollup_raw(sequences)
                    if tier == "raw"
                    else rollup_next(prev_df, tier)
                )
                self._write_stage(stage, computed, prev_rows)
                tier_df = self.spark.read.parquet(path)
            out[stage] = path
            if fail_after == stage:
                raise RuntimeError(f"injected failure after {stage}")

            if tier in self.gapfill_tiers:
                gstage = f"gapfilled_{tier}"
                gpath = self._stage_path(gstage)
                tier_rows = tier_df.count()
                if not (self._completed(gstage, tier_rows) and os.path.exists(gpath)):
                    self._write_stage(gstage, gapfill_linear(tier_df, tier), tier_rows)
                out[gstage] = gpath
                if fail_after == gstage:
                    raise RuntimeError(f"injected failure after {gstage}")

            if tier in self.hist_tiers:
                from rtsa_spark.operators.rollup import (
                    merge_token_histograms,
                    token_histogram,
                )

                hstage = f"hist_{tier}"
                hpath = self._stage_path(hstage)
                if not (self._completed(hstage, prev_rows) and os.path.exists(hpath)):
                    # first hist tier computes from raw sequences; coarser
                    # hist tiers cascade by map-sum merge of the previous one
                    finer = next(
                        (f"hist_{t}" for t in reversed(self.tiers[: self.tiers.index(tier)])
                         if t in self.hist_tiers),
                        None,
                    )
                    if finer and os.path.exists(self._stage_path(finer)):
                        hist = merge_token_histograms(
                            self.spark.read.parquet(self._stage_path(finer)), tier
                        )
                    else:
                        hist = token_histogram(
                            sequences, tier, top_k=self.hist_top_k
                        )
                    self._write_stage(hstage, hist, prev_rows)
                out[hstage] = hpath

            if tier in self.metrics_tiers:
                mstage = f"metrics_{tier}"
                mpath = self._stage_path(mstage)
                src = f"gapfilled_{tier}" if tier in self.gapfill_tiers else stage
                mdf = self.spark.read.parquet(self._stage_path(src))
                m_rows = mdf.count()
                if not (self._completed(mstage, m_rows) and os.path.exists(mpath)):
                    self._write_stage(mstage, compute_metrics(mdf, tier), m_rows)
                out[mstage] = mpath

            prev_df = tier_df
            prev_rows = tier_df.count()
        return out

    def lineage(self) -> DataFrame:
        """Ledger as a DataFrame (the `lineage` table of SURVEY.md §7.0)."""
        return self.spark.read.json(self._ledger_path)

    # ------------------------------------------ late-data partition refresh
    def refresh_months(self, sequences: DataFrame, months: list[str]) -> dict[str, int]:
        """Idempotent partition-scoped refresh for late/replayed data.

        ``months``: 'YYYY-MM' strings whose source rows changed. Each tier's
        rows belonging to those calendar months are recomputed from the
        (already-corrected) ``sequences`` table and swapped in, leaving all
        other rows byte-identical — the parquet emulation of Iceberg's
        ``overwrite-by-partition`` / ``MERGE INTO`` (north rule: "late/
        replayed data = re-run of affected partitions"). Re-running the
        same refresh is a no-op by construction (the recomputation is
        deterministic in its inputs).

        Returns {stage: rows_replaced}.
        """
        import pyspark.sql.functions as F

        from rtsa_spark.operators.rollup import rollup_next, rollup_raw

        replaced: dict[str, int] = {}
        affected_seq = sequences.where(
            F.date_format(F.col("ts"), "yyyy-MM").isin(months)
        )
        prev_recomputed: DataFrame | None = None
        for tier in self.tiers:
            stage = f"rollup_{tier}"
            path = self._stage_path(stage)
            existing = self.spark.read.parquet(path)
            recomputed = (
                rollup_raw(affected_seq)
                if tier == "raw"
                else rollup_next(prev_recomputed, tier)
            )
            in_months = F.date_format(F.col("bucket_start"), "yyyy-MM").isin(months)
            kept = existing.where(~in_months)
            merged = kept.unionByName(recomputed)
            t0 = time.time()
            tmp = path + f"._refresh_{self.run_id}"
            merged.write.mode("overwrite").parquet(tmp)
            n_new = recomputed.count()
            shutil.rmtree(path)
            os.rename(tmp, path)
            self._append_ledger(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "rows_in": n_new,
                    "rows_out": self.spark.read.parquet(path).count(),
                    "n_files": sum(1 for f in os.listdir(path) if f.endswith(".parquet")),
                    "started_at": t0,
                    "finished_at": time.time(),
                    "status": "REFRESH",
                    "fingerprint": n_new,
                    "months": months,
                }
            )
            replaced[stage] = n_new
            prev_recomputed = self.spark.read.parquet(path).where(in_months)
        return replaced
