"""Physical-plan audit: print/inspect the plans of the engine's core
operators and assert the properties that matter at 100 TB:

- parquet scans are column-pruned (ReadSchema excludes `tokens` for the
  ladder) and filter-pushed (PushedFilters non-empty where a filter exists);
- aggregations are partial/final hash aggs (map-side combine present);
- the ladder's stages sit inside WholeStageCodegen spans;
- the mask semi-join broadcasts the key set;
- gap-fill is window exchange + projection (no UDF).

Usage: python tools/explain_audit.py  (prints a PASS/FAIL line per check)
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'} {name}" + (f"  [{detail}]" if detail else ""))
    return ok


def main() -> int:
    from rtsa_spark.operators.gapfill import gapfill_linear
    from rtsa_spark.operators.masks import apply_mask, mask_min_observations
    from rtsa_spark.operators.rollup import rollup_next, rollup_raw
    from rtsa_spark.session import get_spark
    from rtsa_spark.synth import synth_sequences

    spark = get_spark(
        app_name="explain_audit", cores=4, shuffle_partitions=4,
        # AQE wraps plans in AdaptiveSparkPlan pre-execution, hiding codegen
        # markers from static explain; disable it for static-structure audit
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    seq_path = "/tmp/rtsa_audit_seq"
    synth_sequences(spark, 5000, n_sources=4).write.mode("overwrite").parquet(seq_path)
    seq = spark.read.parquet(seq_path)

    ok = True

    # 1. ladder scan prunes tokens + keeps whole-stage codegen
    raw_plan = plan_of(rollup_raw(seq))
    ok &= check(
        "ladder scan prunes tokens column",
        "tokens" not in raw_plan.split("ReadSchema")[1].split("\n")[0],
        "ReadSchema excludes tokens",
    )
    ok &= check("raw tier partial agg (map-side combine)",
                "partial_count" in raw_plan and "partial_sum" in raw_plan)
    # codegen stages show as *(n) in the simple physical plan string
    simple = rollup_raw(seq)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    ok &= check("raw tier in WholeStageCodegen", "*(" in simple)

    # 2. filter pushdown reaches the scan
    filtered_plan = plan_of(seq.where("source = 's001'").select("source", "n_tok"))
    pushed = "PushedFilters: [" in filtered_plan and "IsNotNull(source)" in filtered_plan
    ok &= check("filter pushed to parquet scan", pushed)

    # 3. cascade reads only tier columns (no re-scan of sequences)
    hourly_plan = plan_of(rollup_next(rollup_raw(seq), "hourly"))
    # formatted mode prints each scan twice (tree + details): one scan == 2
    ok &= check("cascade has no second sequences scan",
                hourly_plan.count("Scan parquet") == 2)

    # 4. mask semi-join broadcasts
    hr = rollup_next(rollup_raw(seq), "hourly")
    mask = mask_min_observations(hr, 2)
    masked_plan = plan_of(apply_mask(seq, mask))
    ok &= check("mask applies as broadcast semi-join",
                "BroadcastHashJoin" in masked_plan and "LeftSemi" in masked_plan)

    # 5. gap-fill is pure window algebra (no python UDF in plan)
    gap_plan = plan_of(gapfill_linear(hr, "hourly"))
    ok &= check("gap-fill has no Python/Arrow eval node",
                "ArrowEvalPython" not in gap_plan and "BatchEvalPython" not in gap_plan)
    ok &= check("gap-fill uses window exchange", "Window" in gap_plan)

    spark.stop()
    print("AUDIT", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
