"""Resumable tier pipeline: the engine's batch driver.

Runs the retention ladder stage by stage, persisting every tier before the
next reads it, with a lineage ledger that makes re-runs idempotent:

- each stage writes to ``<base>/<stage>`` (parquet, zstd), bucket-bearing
  stages **partitioned by calendar month** (``p_month=YYYY-MM`` dirs), and
  appends a lineage row ``{run_id, stage, rows_in, rows_out, n_files,
  started_at, finished_at, status, fingerprint}`` to
  ``<base>/lineage.jsonl``, plus one PER-PARTITION manifest row
  ``{run_id, stage, p_month, rows, n_files, bytes, status, finished_at}``
  per published month dir to ``<base>/partition_lineage.jsonl`` (the
  metrics rows of the north rule — what an Iceberg snapshot's manifest
  entries record per partition);
- optional stages per tier: gap-fill, token histograms, metrics, and
  (opt-in via ``encode_tiers``) the Gorilla/DoD encoded-block stage
  ``encoded_<tier>`` — month-partitioned on ``block_day``; blocks are
  calendar-month groups by construction, so late-data refreshes re-encode
  only the affected months' partitions like the tiers themselves;
- a stage is SKIPPED on re-run when a SUCCESS lineage row exists whose
  input fingerprint matches. The fingerprint is a CONTENT hash
  (``count:bit_xor(xxhash64(*cols))``, order-independent, one cheap
  columnar scan) — a corrected input with the same row count no longer
  silently skips recomputation. On Iceberg the seam is the snapshot id;
- full-stage writes go to a ``_tmp`` dir first and are atomically renamed,
  so a stage killed mid-write never leaves a half-table behind the SUCCESS
  check. Partition-scoped refreshes use dynamic partition overwrite and
  touch ONLY the affected ``p_month`` dirs.

Opt-in ``snapshot_tiers`` stores those rollup tiers through
:class:`rtsa_spark.snapshot.SnapshotStore` instead of a plain partitioned
dir: every publish/refresh is an append-only snapshot commit, so
``read_stage(stage, asof=...)`` time-travels to any retained checkpoint,
refreshes never destroy what an earlier snapshot read, and
``expire_snapshots`` reclaims history explicitly. Manifest rows for those
stages carry the committing ``snapshot_id``.

This is the parquet-backed emulation of Iceberg snapshot checkpoints
(SURVEY.md §7 "Iceberg in sandbox"): the lineage row plays the snapshot
commit, the atomic rename / per-partition swap plays the manifest swap. On
a real deployment the ``storage`` seam swaps to
``df.writeTo(...).overwritePartitions()`` on an Iceberg catalog with no
driver changes.

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
from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import MapType

from rtsa_spark.operators.encode import encode_tier
from rtsa_spark.operators.gapfill import gapfill_linear
from rtsa_spark.operators.metrics import compute_metrics
from rtsa_spark.operators.rollup import TIER_ORDER, rollup_next, rollup_raw
from rtsa_spark.snapshot import SnapshotStore
from rtsa_spark.storage import cluster_for_publish

P_MONTH = "p_month"


def _parse_ts(x):
    """datetime | ISO string | None -> naive UTC datetime (engine
    timestamps are UTC by construction, session tz pinned)."""
    if x is None or isinstance(x, datetime):
        return x
    return datetime.fromisoformat(x)


def _hash_cols(df: DataFrame) -> list:
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, MapType):
            c = F.to_json(c)
        cols.append(c)
    return cols


def content_fingerprint(df: DataFrame) -> str:
    """Order-independent content hash of a DataFrame: ``rows:xor-hash``.

    ``bit_xor(xxhash64(*cols))`` is commutative, partitioning-independent,
    and ANSI-safe; map-typed columns go through ``to_json`` (hashing maps
    is undefined in Spark). One columnar scan — at 100 TB the production
    seam replaces this with the Iceberg snapshot id, which is free.
    """
    hashed = df.select(F.xxhash64(*_hash_cols(df)).alias("h"))
    row = hashed.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x")
    ).first()
    return f"{row['n']}:{row['x'] if row['x'] is not None else 0}"


def month_fingerprints(df: DataFrame, ts_col: str = "ts") -> dict[str, str]:
    """Per-calendar-month content fingerprints of an input table:
    ``{YYYY-MM: "rows:xor-hash"}``.  Same hash construction as
    :func:`content_fingerprint` and COMBINABLE into it (xor of month
    hashes, sum of counts) because ``bit_xor`` is commutative across any
    partitioning — so recording month-grain lineage costs the same single
    scan the global fingerprint already paid.  This is what makes
    late-data detection cheap: compare a corrected input's month map
    against the published one and only the differing months recompute
    (:meth:`TierPipeline.refresh_changed`).
    """
    hashed = df.select(
        F.date_format(F.col(ts_col), "yyyy-MM").alias("m"),
        F.xxhash64(*_hash_cols(df)).alias("h"),
    )
    rows = (
        hashed.groupBy("m")
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()
    )
    return {
        r["m"]: f"{r['n']}:{r['x'] if r['x'] is not None else 0}"
        for r in rows
    }


def combine_month_fingerprints(months: dict[str, str]) -> str:
    """Fold a month-fingerprint map into the global
    :func:`content_fingerprint` value (sum counts, xor hashes)."""
    n = 0
    x = 0
    for v in months.values():
        c, h = v.split(":")
        n += int(c)
        x ^= int(h)
    return f"{n}:{x if months else 0}"


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
        encode_tiers: tuple[str, ...] = (),
        encode_value_col: str = "n_tok_sum",
        snapshot_tiers: tuple[str, ...] = (),
        run_id: str | None = None,
    ):
        self.spark = spark
        self.base = base_dir
        self.tiers = tiers or list(TIER_ORDER)
        # month-nested tiers only: a weekly bucket straddles month
        # boundaries (rollup.py documents it as a non-cascadable side
        # branch), so a month-scoped refresh could overwrite a neighbor
        # month's partition with a partial straddling bucket
        bad_tiers = [t for t in self.tiers if t not in TIER_ORDER]
        if bad_tiers:
            raise ValueError(
                f"tiers must be month-nested cascade tiers {TIER_ORDER}; "
                f"got {bad_tiers} (weekly is a read-side rollup, not a "
                f"pipeline tier)"
            )
        self.gapfill_tiers = gapfill_tiers
        self.metrics_tiers = metrics_tiers
        self.hist_tiers = hist_tiers
        self.hist_top_k = hist_top_k
        self.encode_tiers = encode_tiers
        self.encode_value_col = encode_value_col
        #: rollup tiers stored through :class:`SnapshotStore` instead of a
        #: plain partitioned dir: every publish/refresh is an append-only
        #: snapshot commit, so consumers can time-travel
        #: (``read_stage(stage, asof=...)``) and refreshes never destroy
        #: what an earlier checkpoint read. Downstream stages (gapfill /
        #: encode / metrics) read the CURRENT snapshot and keep their
        #: plain layout.
        self.snapshot_tiers = snapshot_tiers
        self._stores: dict[str, SnapshotStore] = {}
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
        self._append_ledger_row(self._ledger_path, row)

    # ------------------------------------------- per-partition lineage
    @property
    def _partition_ledger_path(self) -> str:
        return os.path.join(self.base, "partition_lineage.jsonl")

    def _append_partition_rows(
        self, stage: str, path: str, status: str, months: list[str] | None = None
    ) -> int:
        """Append one lineage row PER month partition of a published stage
        (the parquet emulation of an Iceberg snapshot's per-partition
        manifest entries): ``{run_id, stage, p_month, rows, n_files,
        bytes, status, finished_at}``. ``months`` restricts accounting to
        the refreshed partitions (partition-pruned scan). Non-partitioned
        stages get a single row with ``p_month=None``. Returns the total
        row count across the accounted partitions, so the caller's stage
        row needs no second count job."""
        df = self.spark.read.parquet(path)
        partitioned = P_MONTH in df.columns
        if partitioned:
            if months is not None:
                df = df.where(F.col(P_MONTH).isin(months))
            counts = {
                r[P_MONTH]: r["n"]
                for r in df.groupBy(P_MONTH).agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            # a refreshed month the recomputation emptied out was DELETED —
            # record it as a rows=0 manifest row, not a silent omission
            if months is not None:
                for m in months:
                    counts.setdefault(m, 0)
        else:
            counts = {None: df.count()}
        now = time.time()
        total = 0
        for month, rows in sorted(counts.items(), key=lambda kv: str(kv[0])):
            pdir = path if month is None else os.path.join(path, f"{P_MONTH}={month}")
            n_files = n_bytes = 0
            for root, _dirs, files in os.walk(pdir):
                for fname in files:
                    if fname.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(root, fname))
            self._append_ledger_row(
                self._partition_ledger_path,
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "p_month": month,
                    "rows": rows,
                    "n_files": n_files,
                    "bytes": n_bytes,
                    "status": status,
                    "finished_at": now,
                },
            )
            total += rows
        return total

    def _append_partition_rows_snap(
        self,
        stage: str,
        store: SnapshotStore,
        status: str,
        months: list[str] | None = None,
    ) -> int:
        """Snapshot-stage twin of :meth:`_append_partition_rows`: manifest
        rows account the CURRENT snapshot's mapped version dirs (one row
        per month; a refreshed month the commit deleted gets rows=0).
        Returns total rows across the accounted months."""
        sid = store.current_snapshot()
        mapping = store.months()
        df = store.read().select(
            F.date_format(F.col(store.ts_col), "yyyy-MM").alias("m")
        )
        if months is not None:
            df = df.where(F.col("m").isin(months))
        counts = {
            r["m"]: r["n"]
            for r in df.groupBy("m").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if months is not None:
            for m in months:
                counts.setdefault(m, 0)
        now = time.time()
        total = 0
        for month, rows in sorted(counts.items()):
            n_files = n_bytes = 0
            if month in mapping:
                vdir = os.path.join(
                    store._data_dir, f"{P_MONTH}={month}", f"v={mapping[month]}"
                )
                for root, _dirs, files in os.walk(vdir):
                    for fname in files:
                        if fname.endswith(".parquet"):
                            n_files += 1
                            n_bytes += os.path.getsize(os.path.join(root, fname))
            self._append_ledger_row(
                self._partition_ledger_path,
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "p_month": month,
                    "rows": rows,
                    "n_files": n_files,
                    "bytes": n_bytes,
                    "status": status,
                    "snapshot_id": sid,
                    "finished_at": now,
                },
            )
            total += rows
        return total

    @staticmethod
    def _append_ledger_row(ledger_path: str, row: dict) -> None:
        with open(ledger_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def partition_lineage(self) -> DataFrame:
        """Per-partition ledger as a DataFrame — the metrics-row twin of
        :meth:`lineage` at month-partition grain (north rule: resumable
        checkpoints with per-partition lineage + metrics rows)."""
        return self.spark.read.json(self._partition_ledger_path)

    def table_status(self) -> DataFrame:
        """CURRENT physical state of every published partition — the
        ``DESCRIBE``/``SHOW PARTITIONS`` of this table format, answered
        from the manifest alone (driver-side metadata, O(manifest rows),
        zero data files touched — the same promise an Iceberg metadata
        table makes).  Latest manifest row per (stage, p_month) wins
        across SUCCESS / REFRESH / COMPACT history; months whose latest
        row records ``rows = 0`` were deleted and are excluded.  Columns:
        ``stage, p_month, rows, n_files, bytes, status, finished_at,
        run_id`` (+ ``snapshot_id`` where the stage is snapshot-backed).
        """
        if not os.path.exists(self._partition_ledger_path):
            raise ValueError(
                "no partition manifest yet; run() must publish first"
            )
        from pyspark.sql import Window

        man = self.partition_lineage()
        w = Window.partitionBy("stage", "p_month").orderBy(
            F.col("finished_at").desc()
        )
        return (
            man.withColumn("_r", F.row_number().over(w))
            .where((F.col("_r") == 1) & (F.col("rows") > 0))
            .drop("_r")
            .orderBy("stage", "p_month")
        )

    def _completed(self, stage: str, fingerprint: str) -> bool:
        return any(
            r["stage"] == stage
            and r["status"] in ("SUCCESS", "REFRESH")
            and r["fingerprint"] == fingerprint
            for r in self._ledger()
        )

    # ------------------------------------------------------------ stages
    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def _is_snapshot_stage(self, stage: str) -> bool:
        # the snapshot policy follows the tier: if a tier checkpoints
        # through the store, its encoded-block stage does too (same time
        # travel / refresh semantics, keyed on block_day)
        return (
            stage.startswith("rollup_")
            and stage[len("rollup_"):] in self.snapshot_tiers
        ) or (
            stage.startswith("encoded_")
            and stage[len("encoded_"):] in self.snapshot_tiers
        )

    def _store(self, stage: str) -> SnapshotStore:
        if stage not in self._stores:
            ts_col = (
                "block_day" if stage.startswith("encoded_") else "bucket_start"
            )
            self._stores[stage] = SnapshotStore(
                self.spark, self._stage_path(stage), ts_col=ts_col
            )
        return self._stores[stage]

    def _stage_exists(self, stage: str) -> bool:
        if self._is_snapshot_stage(stage):
            return self._store(stage).current_snapshot() is not None
        return os.path.exists(self._stage_path(stage))

    def _read_stage(self, stage: str) -> DataFrame:
        if self._is_snapshot_stage(stage):
            return self._store(stage).read()
        df = self.spark.read.parquet(self._stage_path(stage))
        return df.drop(P_MONTH) if P_MONTH in df.columns else df

    def _read_stage_months(self, stage: str, months: list[str]) -> DataFrame:
        """Month-filtered stage read: partition-pruned on ``p_month`` for
        plain stages; snapshot stages restrict the manifest listing to the
        requested months (pruned at the dir level, not post-hoc)."""
        if self._is_snapshot_stage(stage):
            return self._store(stage).read(months=months)
        return (
            self.spark.read.parquet(self._stage_path(stage))
            .where(F.col(P_MONTH).isin(months))
            .drop(P_MONTH)
        )

    def read_stage(
        self,
        stage: str,
        asof: int | None = None,
        start=None,
        end=None,
        sources: list[str] | None = None,
        asof_ts: float | None = None,
    ) -> DataFrame:
        """Public stage read. ``asof`` time-travels a snapshot-backed
        stage to an earlier checkpoint — a snapshot id or a tag/branch
        name (``SnapshotStore.tag``/``branch``); ``asof_ts`` resolves a
        wall-clock time instead (``SnapshotStore.snapshot_as_of_ts``);
        plain stages hold only the current state and refuse both loudly.

        ``start``/``end`` (datetimes or ISO strings, half-open
        ``[start, end)``) and ``sources`` prune the read at every level
        the layout offers: the time range maps to an inclusive
        ``p_month`` range — directory-level partition pruning on plain
        stages, manifest-level dir listing on snapshot stages — and the
        row predicates land on the parquet scan, where the
        range-clustered sorted publish (:func:`cluster_for_publish`)
        makes the row-group min/max envelopes tight.  Encoded-block
        stages prune on the block ``[bucket_lo, bucket_hi]`` envelope
        (decode of surviving blocks is the caller's step — see
        ``operators.encode.read_points``).  A 3-day dashboard query over
        a 10-year 100 TB tier touches 1-2 month dirs and, within them,
        only the row groups covering the requested sources and days.
        """
        start, end = _parse_ts(start), _parse_ts(end)
        m_lo = start.strftime("%Y-%m") if start is not None else None
        m_hi = (
            (end - timedelta(microseconds=1)).strftime("%Y-%m")
            if end is not None
            else None
        )
        if self._is_snapshot_stage(stage):
            df = self._store(stage).read(
                asof=asof, month_lo=m_lo, month_hi=m_hi, asof_ts=asof_ts
            )
        else:
            if asof is not None or asof_ts is not None:
                raise ValueError(
                    f"stage {stage!r} is not snapshot-backed; add its tier "
                    f"to snapshot_tiers for time travel"
                )
            df = self.spark.read.parquet(self._stage_path(stage))
            if P_MONTH in df.columns:
                if m_lo is not None:
                    df = df.where(F.col(P_MONTH) >= m_lo)
                if m_hi is not None:
                    df = df.where(F.col(P_MONTH) <= m_hi)
                df = df.drop(P_MONTH)
        if start is not None or end is not None:
            if "bucket_start" in df.columns:
                if start is not None:
                    df = df.where(F.col("bucket_start") >= F.lit(start))
                if end is not None:
                    df = df.where(F.col("bucket_start") < F.lit(end))
            elif {"bucket_lo", "bucket_hi"} <= set(df.columns):
                if start is not None:
                    df = df.where(F.col("bucket_hi") >= F.lit(start))
                if end is not None:
                    df = df.where(F.col("bucket_lo") < F.lit(end))
            else:
                raise ValueError(
                    f"stage {stage!r} has no time column; start/end do not "
                    f"apply"
                )
        if sources is not None:
            if "source" not in df.columns:
                raise ValueError(f"stage {stage!r} has no source column")
            df = df.where(F.col("source").isin(list(sources)))
        return df

    def read_stage_changes(
        self, stage: str, since: int, until: int | None = None
    ) -> DataFrame:
        """Incremental consumption of a snapshot-backed stage: the rows
        that changed between checkpoint ``since`` and ``until`` (default
        current), tagged ``_change_type`` ∈ {INSERT, DELETE} — see
        :meth:`SnapshotStore.read_changes`.  A downstream consumer that
        recorded the snapshot id it last processed re-reads only the
        changed months' version dirs, O(changed months) never O(table).
        Plain stages hold only current state and refuse loudly."""
        if not self._is_snapshot_stage(stage):
            raise ValueError(
                f"stage {stage!r} is not snapshot-backed; add its tier to "
                f"snapshot_tiers for changelog reads"
            )
        return self._store(stage).read_changes(since, until)

    def tag_stage(
        self, stage: str, name: str, snapshot_id: int | None = None
    ) -> int:
        """Pin a snapshot-backed stage's checkpoint under a name (default:
        current) — readable as ``read_stage(stage, asof=name)`` and immune
        to ``expire_snapshots`` until :meth:`drop_stage_tag` releases it.
        See :meth:`SnapshotStore.tag`."""
        if not self._is_snapshot_stage(stage):
            raise ValueError(
                f"stage {stage!r} is not snapshot-backed; add its tier to "
                f"snapshot_tiers for tags"
            )
        return self._store(stage).tag(name, snapshot_id)

    def drop_stage_tag(self, stage: str, name: str) -> None:
        """Release a stage tag (metadata-only) — see
        :meth:`SnapshotStore.drop_tag`."""
        if not self._is_snapshot_stage(stage):
            raise ValueError(f"stage {stage!r} is not snapshot-backed")
        self._store(stage).drop_tag(name)

    def stage_store(self, stage: str) -> SnapshotStore:
        """The :class:`SnapshotStore` behind a snapshot-backed stage —
        the on-ramp for store-level operations the pipeline doesn't wrap
        (branch staging via ``publish(df, branch=...)``, ``read_changes``
        between arbitrary refs, row-level ``delete_where``,
        ``refs()``/``files()`` metadata views)."""
        if not self._is_snapshot_stage(stage):
            raise ValueError(
                f"stage {stage!r} is not snapshot-backed; add its tier to "
                f"snapshot_tiers"
            )
        return self._store(stage)

    def branch_stage(
        self, stage: str, name: str, snapshot_id: int | str | None = None
    ) -> int:
        """Cut a mutable branch ref on a snapshot-backed stage for
        write-audit-publish staging — see :meth:`SnapshotStore.branch`.
        Stage corrections onto it via
        ``stage_store(stage).refresh_months(df, months, branch=name)``,
        audit with ``read_stage(stage, asof=name)``, then land with
        :meth:`fast_forward_stage`."""
        return self.stage_store(stage).branch(name, snapshot_id)

    def fast_forward_stage(self, stage: str, name: str) -> int:
        """Land a staged branch on the stage's main history (metadata-only;
        refused on divergence) — see :meth:`SnapshotStore.fast_forward`."""
        return self.stage_store(stage).fast_forward(name)

    def drop_stage_branch(self, stage: str, name: str) -> None:
        """Delete a stage branch ref — see
        :meth:`SnapshotStore.drop_branch`."""
        self.stage_store(stage).drop_branch(name)

    def sync_stage_next(
        self, from_tier: str, to_tier: str, since: int | None = None
    ) -> int | None:
        """CDC-driven incremental maintenance between two snapshot-backed
        tiers: fold ``rollup_<from_tier>``'s changelog since the last sync
        into ``rollup_<to_tier>``, recomputing only the affected coarser
        buckets — see :func:`rtsa_spark.sync.sync_next`.  Both tiers must
        be in ``snapshot_tiers``."""
        from rtsa_spark.sync import sync_next

        return sync_next(
            self.stage_store(f"rollup_{from_tier}"),
            self.stage_store(f"rollup_{to_tier}"),
            to_tier,
            since=since,
        )

    def expire_snapshots(self, keep_last: int = 2) -> dict[str, dict]:
        """Expire old checkpoints on every snapshot-backed stage (rollup
        tiers and, when their tier encodes, the encoded-block stages);
        returns per-stage accounting from :meth:`SnapshotStore.expire`."""
        stages = [f"rollup_{t}" for t in self.snapshot_tiers] + [
            f"encoded_{t}"
            for t in self.snapshot_tiers
            if t in self.encode_tiers and self._stage_exists(f"encoded_{t}")
        ]
        return {s: self._store(s).expire(keep_last) for s in stages}

    @staticmethod
    def _with_month(df: DataFrame, ts_col: str = "bucket_start") -> DataFrame:
        return df.withColumn(
            P_MONTH, F.date_format(F.col(ts_col), "yyyy-MM")
        )

    def _write_stage(self, stage: str, df: DataFrame, fingerprint: str) -> str:
        """Compute + atomically publish one stage, ledger-logged.
        Bucket-bearing stages are written partitionBy(month) so late-data
        refreshes can swap single partition dirs. Snapshot-backed stages
        publish through their store instead: append-only version dirs +
        snapshot-log commit play the tmp-write + atomic rename (a crash
        between data write and log append leaves an orphan no read sees,
        reaped by expire)."""
        final = self._stage_path(stage)
        if self._is_snapshot_stage(stage):
            st = self._store(stage)
            t0 = time.time()
            st.publish(df)
            rows_out = self._append_partition_rows_snap(stage, st, "SUCCESS")
            mapping = st.months()
            n_files = sum(
                1
                for m, v in mapping.items()
                for _root, _dirs, files in os.walk(
                    os.path.join(st._data_dir, f"{P_MONTH}={m}", f"v={v}")
                )
                for f in files
                if f.endswith(".parquet")
            )
            rows_in = (
                int(fingerprint.split(":")[0]) if ":" in fingerprint else None
            )
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
                    "fingerprint": fingerprint,
                    "snapshot_id": st.current_snapshot(),
                }
            )
            return final
        tmp = final + f"._tmp_{self.run_id}"
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if "bucket_start" in df.columns:
            writer = (
                cluster_for_publish(
                    self._with_month(df), ("source", "bucket_start")
                )
                .write.mode("overwrite")
                .partitionBy(P_MONTH)
            )
        elif "block_day" in df.columns:
            # encoded-block stages: blocks are calendar-month groups, so
            # month partitioning keys on block_day and stays refresh-able
            writer = (
                cluster_for_publish(
                    self._with_month(df, "block_day"), ("source", "block_day")
                )
                .write.mode("overwrite")
                .partitionBy(P_MONTH)
            )
        writer.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # per-partition manifest rows double as the stage row count
        rows_out = self._append_partition_rows(stage, final, "SUCCESS")
        n_files = sum(
            1
            for _root, _dirs, files in os.walk(final)
            for f in files
            if f.endswith(".parquet")
        )
        rows_in = int(fingerprint.split(":")[0]) if ":" in fingerprint else None
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
                "fingerprint": fingerprint,
            }
        )
        return final

    def run(self, sequences: DataFrame, fail_after: str | None = None) -> dict[str, str]:
        """Execute the ladder; returns {stage: path}. ``fail_after`` injects
        a crash after the named stage commits (resume testing)."""
        out: dict[str, str] = {}
        prev_df: DataFrame | None = None
        # month-grain fingerprints combine into the global one (same single
        # scan), and publishing them is what lets refresh_changed() detect
        # late data without the caller naming months
        seq_months = month_fingerprints(sequences)
        if not seq_months:
            # an all-empty input is almost always an upstream accident (a
            # bad join, a wrong path); publishing it would wipe every tier.
            # Refuse loudly — tearing down a table is an explicit rm of the
            # base dir, never a side effect of a run.
            raise ValueError(
                "input is empty; refusing to publish empty tiers — remove "
                "the base dir explicitly to tear the table down"
            )
        prev_fp = combine_month_fingerprints(seq_months)
        seq_fp = prev_fp
        for tier in self.tiers:
            stage = f"rollup_{tier}"
            path = self._stage_path(stage)
            if self._completed(stage, prev_fp) and self._stage_exists(stage):
                tier_df = self._read_stage(stage)
            else:
                computed = (
                    rollup_raw(sequences)
                    if tier == "raw"
                    else rollup_next(prev_df, tier)
                )
                self._write_stage(stage, computed, prev_fp)
                tier_df = self._read_stage(stage)
            out[stage] = path
            if fail_after == stage:
                raise RuntimeError(f"injected failure after {stage}")
            # one fingerprint job per tier, shared by every dependent stage
            # (gapfill / encode / next-tier completion check)
            tier_fp = content_fingerprint(tier_df)

            if tier in self.gapfill_tiers:
                gstage = f"gapfilled_{tier}"
                gpath = self._stage_path(gstage)
                if not (self._completed(gstage, tier_fp) and os.path.exists(gpath)):
                    self._write_stage(gstage, gapfill_linear(tier_df, tier), tier_fp)
                out[gstage] = gpath
                if fail_after == gstage:
                    raise RuntimeError(f"injected failure after {gstage}")

            if tier in self.encode_tiers:
                estage = f"encoded_{tier}"
                epath = self._stage_path(estage)
                # _stage_exists, not os.path.exists: a snapshot-backed
                # stage's dir exists as soon as its store object is built,
                # with no committed snapshot behind it
                if not (
                    self._completed(estage, tier_fp)
                    and self._stage_exists(estage)
                ):
                    self._write_stage(
                        estage,
                        encode_tier(tier_df, value_col=self.encode_value_col),
                        tier_fp,
                    )
                out[estage] = epath
                if fail_after == estage:
                    raise RuntimeError(f"injected failure after {estage}")

            if tier in self.hist_tiers:
                from rtsa_spark.operators.rollup import (
                    merge_token_histograms,
                    token_histogram,
                )

                hstage = f"hist_{tier}"
                hpath = self._stage_path(hstage)
                if not (self._completed(hstage, seq_fp) and os.path.exists(hpath)):
                    # first hist tier computes from raw sequences; coarser
                    # hist tiers cascade by map-sum merge of the previous one
                    finer = next(
                        (f"hist_{t}" for t in reversed(self.tiers[: self.tiers.index(tier)])
                         if t in self.hist_tiers),
                        None,
                    )
                    if finer and os.path.exists(self._stage_path(finer)):
                        hist = merge_token_histograms(self._read_stage(finer), tier)
                    else:
                        hist = token_histogram(
                            sequences, tier, top_k=self.hist_top_k
                        )
                    self._write_stage(hstage, hist, seq_fp)
                out[hstage] = hpath

            if tier in self.metrics_tiers:
                mstage = f"metrics_{tier}"
                mpath = self._stage_path(mstage)
                src = f"gapfilled_{tier}" if tier in self.gapfill_tiers else stage
                mdf = self._read_stage(src)
                m_fp = content_fingerprint(mdf)
                if not (self._completed(mstage, m_fp) and os.path.exists(mpath)):
                    self._write_stage(mstage, compute_metrics(mdf, tier), m_fp)
                out[mstage] = mpath

            prev_df = tier_df
            prev_fp = tier_fp
        # published-input month map, written only once every stage is
        # committed: a crash mid-run leaves the previous map, so a later
        # refresh_changed() at worst re-refreshes months run() already
        # rebuilt (idempotent), never misses one
        self._write_input_months(seq_months)
        return out

    def lineage(self) -> DataFrame:
        """Ledger as a DataFrame (the `lineage` table of SURVEY.md §7.0)."""
        return self.spark.read.json(self._ledger_path)

    # ------------------------------------- late-data detection (month map)
    @property
    def _input_months_path(self) -> str:
        return os.path.join(self.base, "input_months.json")

    def _write_input_months(self, months: dict[str, str]) -> None:
        tmp = self._input_months_path + f"._tmp_{self.run_id}"
        with open(tmp, "w") as f:
            json.dump(months, f, sort_keys=True)
        os.replace(tmp, self._input_months_path)

    def _read_input_months(self) -> dict[str, str] | None:
        if not os.path.exists(self._input_months_path):
            return None
        with open(self._input_months_path) as f:
            return json.load(f)

    def detect_changed_months(self, sequences: DataFrame) -> dict[str, list[str]]:
        """Diff ``sequences`` against the PUBLISHED input's month map:
        ``{"changed": [...], "added": [...], "removed": [...]}`` (one scan
        of the new input; the published side is stored metadata).  This is
        the late-data seam of the north rule — on Iceberg the same diff
        falls out of snapshot changelogs; here the month fingerprints
        recorded at publish time play that role."""
        published = self._read_input_months()
        if published is None:
            raise ValueError(
                "no published input month map; run() must complete once "
                "before late-data detection"
            )
        new = month_fingerprints(sequences)
        return {
            "changed": sorted(
                m for m, fp in new.items()
                if m in published and published[m] != fp
            ),
            "added": sorted(m for m in new if m not in published),
            "removed": sorted(m for m in published if m not in new),
        }

    def refresh_changed(self, sequences: DataFrame) -> dict[str, int]:
        """Detect months whose input content changed and refresh exactly
        those (added months publish, emptied months delete).  No-op (empty
        dict) when the input matches the published fingerprints."""
        diff = self.detect_changed_months(sequences)
        months = sorted(set(diff["changed"] + diff["added"] + diff["removed"]))
        if not months:
            return {}
        return self.refresh_months(sequences, months)

    def sync(self, sequences: DataFrame) -> dict:
        """Make the published tiers match ``sequences`` with the cheapest
        correct action — the continuous-aggregate maintenance verb a
        scheduler calls on every input snapshot without caring what
        changed:

        - never published (no input month map): full :meth:`run` —
          which itself resumes past any stage whose content fingerprint
          already matches, so re-``sync`` of a pre-month-map base costs
          one fingerprint scan per stage, then records the map;
        - published: :meth:`detect_changed_months` diff, then
          :meth:`refresh_changed` over exactly the changed/added/removed
          months (empty no-op when the input is unchanged).

        Returns ``{"mode": "run", "stages": {...}}`` or ``{"mode":
        "refresh", "replaced": {stage: rows}}``.  Cost is O(changed
        months), never O(table) — at 100 TB the difference between a
        nightly correction touching one month dir and a full recompute.
        """
        if self._read_input_months() is None:
            return {"mode": "run", "stages": self.run(sequences)}
        return {"mode": "refresh", "replaced": self.refresh_changed(sequences)}

    # ------------------------------------------ late-data partition refresh
    def refresh_months(self, sequences: DataFrame, months: list[str]) -> dict[str, int]:
        """Idempotent partition-scoped refresh for late/replayed data.

        ``months``: 'YYYY-MM' strings whose source rows changed. For every
        rollup/hist tier, ONLY the affected ``p_month`` partition dirs are
        rewritten (Spark dynamic partition overwrite — the parquet emulation
        of Iceberg ``overwritePartitions``); all other partition dirs are
        left byte-identical on disk (asserted in tests/test_refresh.py).
        Downstream gapfill/metrics stages are then recomputed from the
        refreshed tiers (they are tier-sized, and their window/per-source
        semantics span month boundaries, so partial recompute would be
        incorrect) — this also closes the staleness hole where a refresh
        left derived stages behind a matching fingerprint.

        SUCCESS ledger rows with the post-refresh input fingerprints are
        appended, so a subsequent ``run(corrected)`` skips every stage.

        Returns {stage: rows_replaced}.
        """
        replaced: dict[str, int] = {}
        # Partition-scoped overwrite presupposes a prior full publish: a
        # missing tier dir would make _overwrite_months create a dir holding
        # ONLY the refreshed months while the ledger records the full-input
        # fingerprint, so run() would skip the rebuild forever. Fail loudly
        # instead (derived encode/hist stages fall back to a full build
        # below — they may legitimately be enabled after the first run()).
        missing = [
            f"rollup_{t}"
            for t in self.tiers
            if not self._stage_exists(f"rollup_{t}")
        ]
        if missing:
            raise ValueError(
                f"refresh_months requires a completed run() first; missing "
                f"stage dirs: {missing}"
            )
        affected_seq = sequences.where(
            F.date_format(F.col("ts"), "yyyy-MM").isin(months)
        )
        in_months = F.col(P_MONTH).isin(months)
        prev_recomputed: DataFrame | None = None
        seq_months = month_fingerprints(sequences)
        if not seq_months:
            # same rail as run(): an all-empty "correction" deleting every
            # published month is an upstream accident, not a refresh. A
            # correction that empties SOME months (rows elsewhere) still
            # deletes exactly those months, as tested.
            raise ValueError(
                "corrected input is empty; refusing a refresh that would "
                "delete every published month — remove the base dir "
                "explicitly to tear the table down"
            )
        seq_fp = combine_month_fingerprints(seq_months)
        # the TRUTHFUL post-refresh fingerprint: the published month map
        # with only the refreshed months replaced.  Recording seq_fp (the
        # full corrected input) on a SUBSET refresh would make a later
        # run(corrected) skip stages whose other months are still stale.
        published_now = self._read_input_months()
        if published_now:
            truthful = dict(published_now)
            for m in months:
                truthful.pop(m, None)
            truthful.update(
                {m: fp for m, fp in seq_months.items() if m in set(months)}
            )
            truthful_fp = combine_month_fingerprints(truthful)
        else:
            truthful_fp = seq_fp  # pre-month-map table: best available
        prev_fp = truthful_fp

        def _overwrite_months(
            df: DataFrame, path: str, ts_col: str = "bucket_start"
        ) -> None:
            """Dynamic partition overwrite of the affected months, PLUS
            explicit removal of any requested month the recomputation
            produced no rows for — dynamic mode only touches partitions
            present in the frame, so a fully-deleted month would otherwise
            survive as a stale partition dir forever."""
            # defensive scope to the requested months (same rail as
            # SnapshotStore.refresh_months): a recomputed frame must never
            # overwrite a neighbor month's partition with partial content
            with_m = self._with_month(df, ts_col).where(
                F.col(P_MONTH).isin(months)
            )
            written = {
                r[P_MONTH] for r in with_m.select(P_MONTH).distinct().collect()
            }
            existing = {
                d.split("=", 1)[1]
                for d in os.listdir(path)
                if d.startswith(f"{P_MONTH}=")
            }
            if not written and not (existing - set(months)):
                # this refresh would delete every month dir the stage has
                # and write nothing back — a stage with zero partitions is
                # unreadable (no schema) and certainly an upstream accident
                raise ValueError(
                    f"refresh of {sorted(months)} would empty {path} "
                    f"entirely; remove the base dir explicitly to tear "
                    f"the table down"
                )
            (
                cluster_for_publish(with_m, ("source", ts_col))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(P_MONTH)
                .parquet(path)
            )
            for m in set(months) - written:
                stale = os.path.join(path, f"{P_MONTH}={m}")
                if os.path.exists(stale):
                    shutil.rmtree(stale)

        for tier in self.tiers:
            stage = f"rollup_{tier}"
            path = self._stage_path(stage)
            recomputed = (
                rollup_raw(affected_seq)
                if tier == "raw"
                else rollup_next(prev_recomputed, tier)
            )
            t0 = time.time()
            # the recomputed plan is consumed by the count, the write, and
            # (plain path) the distinct-months probe — persist once so the
            # aggregation DAG runs once, not three times
            recomputed = recomputed.persist()
            n_new = recomputed.count()
            if self._is_snapshot_stage(stage):
                st = self._store(stage)
                st.refresh_months(recomputed, months)
                # manifest append returns the month-scoped row total —
                # no whole-table count on a month-scoped refresh
                rows_out = self._append_partition_rows_snap(
                    stage, st, "REFRESH", months=months
                )
                snap_extra = {"snapshot_id": st.current_snapshot()}
            else:
                _overwrite_months(recomputed, path)
                rows_out = self._append_partition_rows(
                    stage, path, "REFRESH", months=months
                )
                snap_extra = {}
            recomputed.unpersist()
            self._append_ledger(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "rows_in": n_new,
                    "rows_out": rows_out,
                    "n_files": None,
                    "started_at": t0,
                    "finished_at": time.time(),
                    "status": "REFRESH",
                    "fingerprint": prev_fp,
                    "months": months,
                    **snap_extra,
                }
            )
            replaced[stage] = n_new

            if tier in self.hist_tiers:
                from rtsa_spark.operators.rollup import (
                    merge_token_histograms,
                    token_histogram,
                )

                hstage = f"hist_{tier}"
                hpath = self._stage_path(hstage)
                # mirror run()'s construction exactly: first hist tier from
                # raw tokens with top_k; coarser hist tiers cascade by
                # merging the (already refreshed) finer tier's month rows —
                # a direct rebuild would change top-k truncation semantics
                # for refreshed months only
                finer = next(
                    (f"hist_{t}" for t in reversed(self.tiers[: self.tiers.index(tier)])
                     if t in self.hist_tiers),
                    None,
                )
                if not os.path.exists(hpath):
                    # hist enabled after the original run(): a partial
                    # publish under seq_fp would hide every other month from
                    # run() — build the whole stage instead (same fallback
                    # as the encoded stage below).
                    if finer and os.path.exists(self._stage_path(finer)):
                        hist = merge_token_histograms(self._read_stage(finer), tier)
                    else:
                        hist = token_histogram(
                            sequences, tier, top_k=self.hist_top_k
                        )
                    self._write_stage(hstage, hist, seq_fp)
                else:
                    t_h = time.time()
                    if finer and os.path.exists(self._stage_path(finer)):
                        finer_months = (
                            self.spark.read.parquet(self._stage_path(finer))
                            .where(in_months)
                            .drop(P_MONTH)
                        )
                        hist = merge_token_histograms(finer_months, tier)
                    else:
                        hist = token_histogram(
                            affected_seq, tier, top_k=self.hist_top_k
                        )
                    _overwrite_months(hist, hpath)
                    h_rows = self._append_partition_rows(
                        hstage, hpath, "REFRESH", months=months
                    )
                    self._append_ledger(
                        {
                            "run_id": self.run_id,
                            "stage": hstage,
                            "rows_in": None,
                            "rows_out": h_rows,
                            "n_files": None,
                            "started_at": t_h,
                            "finished_at": time.time(),
                            "status": "REFRESH",
                            "fingerprint": truthful_fp,
                            "months": months,
                        }
                    )
                replaced[hstage] = -1  # partition-scoped; rows tracked above

            tier_df = self._read_stage(stage)
            tier_fp = content_fingerprint(tier_df)
            if tier in self.gapfill_tiers:
                gstage = f"gapfilled_{tier}"
                self._write_stage(gstage, gapfill_linear(tier_df, tier), tier_fp)
                replaced[gstage] = 0
            if tier in self.encode_tiers:
                # blocks are month-scoped by construction, so the encoded
                # stage refreshes partition-scoped like the tiers: re-encode
                # only the affected months' tier rows and swap those dirs.
                # If the stage dir doesn't exist (encoding enabled after the
                # original run()), a partial publish under the full-tier
                # fingerprint would permanently hide every other month from
                # run() — build the whole stage instead.
                estage = f"encoded_{tier}"
                epath = self._stage_path(estage)
                if not self._stage_exists(estage):
                    self._write_stage(
                        estage,
                        encode_tier(tier_df, value_col=self.encode_value_col),
                        tier_fp,
                    )
                else:
                    t1 = time.time()
                    month_blocks = encode_tier(
                        self._read_stage_months(stage, months),
                        value_col=self.encode_value_col,
                    )
                    if self._is_snapshot_stage(estage):
                        est = self._store(estage)
                        est.refresh_months(month_blocks, months)
                        self._append_partition_rows_snap(
                            estage, est, "REFRESH", months=months
                        )
                    else:
                        _overwrite_months(
                            month_blocks, epath, ts_col="block_day"
                        )
                        self._append_partition_rows(
                            estage, epath, "REFRESH", months=months
                        )
                    self._append_ledger(
                        {
                            "run_id": self.run_id,
                            "stage": estage,
                            "rows_in": None,
                            "rows_out": self._read_stage(estage).count(),
                            "n_files": None,
                            "started_at": t1,
                            "finished_at": time.time(),
                            "status": "REFRESH",
                            "fingerprint": tier_fp,
                            "months": months,
                        }
                    )
                replaced[estage] = -1  # partition-scoped; rows tracked above
            if tier in self.metrics_tiers:
                mstage = f"metrics_{tier}"
                src = f"gapfilled_{tier}" if tier in self.gapfill_tiers else stage
                mdf = self._read_stage(src)
                self._write_stage(
                    mstage, compute_metrics(mdf, tier), content_fingerprint(mdf)
                )
                replaced[mstage] = 0

            prev_recomputed = self._read_stage_months(stage, months)
            prev_fp = tier_fp
        # Update ONLY the refreshed months' entries in the published month
        # map (not the whole new map): if the caller named a subset of the
        # months that really changed, the others keep their old published
        # fingerprint and detect_changed_months still flags them later.
        published = self._read_input_months() or {}
        for m in months:
            published.pop(m, None)
        published.update(
            {m: fp for m, fp in seq_months.items() if m in set(months)}
        )
        self._write_input_months(published)
        return replaced

    # ------------------------------------------------- file maintenance
    def compact_stage(
        self,
        stage: str,
        target_rows: int,
        months: list[str] | None = None,
    ) -> dict[str, dict]:
        """Execute the small-file compaction plan for a published stage —
        the engine-owned half of Iceberg's ``rewrite_data_files`` that
        :func:`operators.retention.plan_compaction` deliberately leaves to
        the table owner.  Per month partition: sub-``target_rows`` files
        are grouped by the plan, each group with >=2 files is rewritten as
        ONE file re-sorted on ``(source, time)`` (preserving the
        :func:`rtsa_spark.storage.cluster_for_publish` row-group-stats
        invariant), untouched files are hard-linked, and the month dir is
        swapped atomically — a reader never sees a half-compacted
        partition, and a crash mid-rebuild leaves the live dir intact.

        Content is bit-identical by construction (same rows, same
        schema), so stage fingerprints, resume skips, and late-data month
        maps are all unaffected; only the physical layout changes.  Each
        compacted month appends a ``COMPACT`` row to the partition
        manifest (rows unchanged, n_files/bytes shrink) — the operation
        is auditable, never silent.  Single-file groups are skipped, so
        re-running is a no-op (idempotent).

        Snapshot-backed stages route through the snapshot log instead of
        touching files (their version dirs are immutable):
        :meth:`rtsa_spark.snapshot.SnapshotStore.rewrite` for a whole-
        table compaction, or a month-scoped layout-only
        ``refresh_months`` when ``months`` is given.  Either way time
        travel stays intact and ``expire_snapshots`` later reclaims the
        fragmented versions.  ``target_rows`` is ignored on this path —
        a snapshot rewrite always re-clusters the whole month, so the
        trigger is simply >=2 parquet files in a month's current version
        dir (which also keeps re-running a no-op).

        Returns ``{month: {"files_before": .., "files_after": ..,
        "groups": ..}}`` for the months that actually changed.
        """
        from rtsa_spark.operators.retention import file_stats, plan_compaction

        if self._is_snapshot_stage(stage):
            return self._compact_snapshot_stage(stage, months)
        path = self._stage_path(stage)
        month_dirs = sorted(
            d for d in os.listdir(path) if d.startswith(f"{P_MONTH}=")
        )
        if not month_dirs:
            raise ValueError(
                f"stage {stage!r} is not month-partitioned; compaction "
                f"operates per partition"
            )
        want = set(months) if months is not None else None
        out: dict[str, dict] = {}
        for d in month_dirs:
            m = d.split("=", 1)[1]
            if want is not None and m not in want:
                continue
            mpath = os.path.join(path, d)
            df = self.spark.read.parquet(mpath)
            ts_col = "bucket_start" if "bucket_start" in df.columns else (
                "block_day" if "block_day" in df.columns else None
            )
            if ts_col is None:
                raise ValueError(f"stage {stage!r} has no time column")
            plan = plan_compaction(file_stats(df, ts_col), target_rows)
            groups: dict[int, list[str]] = {}
            for r in plan.collect():  # file-count sized, never data
                groups.setdefault(r["group"], []).append(r["file"])
            # rewriting a lone small file gains nothing and would make
            # compaction re-trigger forever; >=2-file groups only
            groups = {g: fs for g, fs in groups.items() if len(fs) >= 2}
            if not groups:
                continue
            order = [c for c in ("source", ts_col) if c in df.columns]

            def to_local(f: str) -> str:
                # input_file_name() yields URIs ("file:///x", sometimes
                # "file:/x"); os.walk yields plain paths. A mismatch here
                # would treat a grouped file as untouched AND rewrite it —
                # duplicated rows — so parse, never strip a fixed prefix.
                from urllib.parse import unquote, urlparse

                parsed = urlparse(f)
                return unquote(parsed.path) if parsed.scheme else f

            grouped_files = {
                to_local(f) for fs in groups.values() for f in fs
            }
            n_grouped = sum(len(fs) for fs in groups.values())
            if len(grouped_files) != n_grouped or not all(
                os.path.exists(f) for f in grouped_files
            ):
                raise RuntimeError(
                    f"file-URI normalization mismatch in {mpath}: plan "
                    f"names {n_grouped} files, {len(grouped_files)} "
                    f"resolved locally — refusing to compact"
                )
            tmp = mpath + f"._compact_{self.run_id}"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            files_before = 0
            for root, _dirs, files in os.walk(mpath):
                for fname in files:
                    if not fname.endswith(".parquet"):
                        continue
                    files_before += 1
                    src = os.path.join(root, fname)
                    if src not in grouped_files:
                        os.link(src, os.path.join(tmp, fname))
            for g, fs in sorted(groups.items()):
                gtmp = tmp + f".g{g}"
                (
                    self.spark.read.parquet(*fs)
                    .coalesce(1)
                    .sortWithinPartitions(*order)
                    .write.mode("overwrite")
                    .parquet(gtmp)
                )
                parts = [
                    f for f in os.listdir(gtmp) if f.endswith(".parquet")
                ]
                for i, f in enumerate(parts):
                    os.rename(
                        os.path.join(gtmp, f),
                        os.path.join(
                            tmp, f"compacted-g{g}-{i}-{self.run_id}.parquet"
                        ),
                    )
                shutil.rmtree(gtmp)
            old = mpath + f"._old_{self.run_id}"
            os.rename(mpath, old)
            os.rename(tmp, mpath)
            shutil.rmtree(old)
            self._append_partition_rows(stage, path, "COMPACT", months=[m])
            files_after = sum(
                1
                for _root, _dirs, files in os.walk(mpath)
                for f in files
                if f.endswith(".parquet")
            )
            out[m] = {
                "files_before": files_before,
                "files_after": files_after,
                "groups": len(groups),
            }
        return out

    def _compact_snapshot_stage(
        self, stage: str, months: list[str] | None
    ) -> dict[str, dict]:
        """Snapshot twin of :meth:`compact_stage`: never touches version
        dirs in place.  Whole-table → :meth:`SnapshotStore.rewrite` (all
        months land on ONE fresh clustered version, ``op="rewrite"``);
        month-scoped → a layout-only ``refresh_months`` re-publishing the
        CURRENT content of just the fragmented requested months (other
        months keep their versions).  Content is bit-identical either
        way; a COMPACT manifest row is appended per accounted month, and
        months already at <=1 file are skipped so re-running is a no-op
        (no empty snapshot commits)."""
        store = self._store(stage)
        mapping = store.months()

        def n_files(month: str, mp: dict[str, str]) -> int:
            vdir = os.path.join(
                store._data_dir, f"{P_MONTH}={month}", f"v={mp[month]}"
            )
            return sum(
                1
                for _root, _dirs, files in os.walk(vdir)
                for f in files
                if f.endswith(".parquet")
            )

        want = (
            sorted(mapping)
            if months is None
            else [m for m in months if m in mapping]
        )
        before = {m: n_files(m, mapping) for m in want}
        frag = [m for m in want if before[m] >= 2]
        if not frag:
            return {}
        if months is None:
            store.rewrite()
        else:
            # manifest-pruned read: only the fragmented months' dirs list
            cur = store.read(months=frag)
            # layout-only read-modify-write: pin the versions the copy was
            # read from so a concurrent merge/refresh into a fragmented
            # month raises CommitConflict instead of being overwritten
            # with the pre-merge copy (rewrite() self-validates the same
            # way on the whole-table path)
            store.refresh_months(
                cur, frag, extra={"reason": "compact"},
                expect_versions={m: mapping[m] for m in frag},
            )
        self._append_partition_rows_snap(
            stage, store, "COMPACT", months=None if months is None else frag
        )
        after_map = store.months()
        return {
            m: {
                "files_before": before[m],
                "files_after": n_files(m, after_map),
                "groups": 1,
            }
            for m in frag
        }

    def vacuum(self) -> list[str]:
        """Remove orphans left by CRASHED runs — the parquet-dir analog of
        Iceberg's ``remove_orphan_files``.  Every non-atomic moment in this
        pipeline writes under a dotted marker first (``._tmp_<run>`` stage
        builds and month-map swaps, ``._compact_<run>`` rebuilds,
        ``._old_<run>`` pre-swap dirs): a crash between build and rename
        leaves one behind, invisible to every reader (parquet discovery
        skips dotted paths) but holding disk forever.  Deletes any such
        entry under the base NOT owned by this live run and returns the
        removed paths.  One healing exception: a ``._old_`` dir whose live
        path is MISSING is not an orphan — it is the surviving copy from a
        crash inside ``compact_stage``'s two-rename swap (old moved aside,
        replacement not yet renamed in).  Vacuum RESTORES it instead of
        deleting it, so the month's only remaining data is never reaped.
        Safe concurrently with readers (the orphans are
        unreferenced by construction); do not run two writers with the
        same base at once — that is unsupported everywhere here."""
        markers = ("._tmp_", "._compact_", "._old_")
        mine = tuple(f"{m}{self.run_id}" for m in markers)
        removed: list[str] = []
        for dirpath, dirs, files in os.walk(self.base):
            for name in list(dirs) + list(files):
                if not any(m in name for m in markers):
                    continue
                if any(name.endswith(s) for s in mine):
                    continue  # the live run's own in-flight build
                full = os.path.join(dirpath, name)
                if "._old_" in name and os.path.isdir(full):
                    live = os.path.join(dirpath, name.split("._old_")[0])
                    if not os.path.exists(live):
                        os.rename(full, live)  # heal the interrupted swap
                        if name in dirs:
                            dirs.remove(name)
                        continue
                if os.path.isdir(full):
                    shutil.rmtree(full, ignore_errors=True)
                    if name in dirs:
                        dirs.remove(name)  # don't descend into removed dir
                else:
                    os.remove(full)
                removed.append(full)
        return sorted(removed)
