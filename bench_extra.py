"""Extra benchmarks (guide §1.4): isolate individual headline queries with
the noop sink and report a per-job wall breakdown from the Spark status
API, so optimization work targets the stage that actually burns the time.

NOT part of the driver contract — bench.py stays the frozen round metric.

Usage:
  python bench_extra.py dsir_select [reps] [count|noop]
  python bench_extra.py all [reps] [count|noop]
count (default) replays the frozen bench.py methodology (the optimizer may
prune subtrees a count never needs — that IS the round metric); noop forces
every column of every row (guide §1.4) for full-computation isolation.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Writes BENCH/extra_<name>.json with per-rep walls + per-stage task-time
breakdown of the final rep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools.dump_plans import HEADLINE  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_breakdown(spark, since_ms: float):
    """Executor-run-time per completed stage since `since_ms` (REST API)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            stages = json.load(r)
    except Exception as e:  # UI disabled or port busy
        return [{"err": str(e)}]
    out = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        if not sub or not comp:
            continue
        # ISO8601 'yyyy-MM-ddTHH:mm:ss.SSSGMT'
        from datetime import datetime

        t0 = datetime.strptime(sub[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()
        if t0 * 1000 < since_ms:
            continue
        t1 = datetime.strptime(comp[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "wall_s": round(t1 - t0, 3),
                "task_cpu_s": round(s.get("executorRunTime", 0) / 1000.0, 2),
                "tasks": s.get("numCompleteTasks"),
                "in_rec": s.get("inputRecords"),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            }
        )
    out.sort(key=lambda d: -d["task_cpu_s"])
    return out


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "dsir_select"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "count"

    from rtsa_spark.session import get_spark
    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra", cores=cores, shuffle_partitions=cores * 2,
        # the per-stage breakdown reads the UI REST API (off in the
        # bench session config)
        extra_conf={"spark.ui.enabled": "true"},
    )
    qs = E.queries()
    names = HEADLINE if name == "all" else [name]

    results = {}
    for n in names:
        if n == "minhash_lsh":
            from rtsa_spark.operators.dedup import minhash_lsh_buckets

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            mk = lambda: minhash_lsh_buckets(docs)  # noqa: E731
        else:
            mk = lambda n=n: qs[n](spark, sf_dir)  # noqa: E731
        walls = []
        spark.sparkContext.setJobDescription(f"extra:{n}")
        for rep in range(reps):
            t0 = time.time()
            since_ms = t0 * 1000
            if mode == "noop":
                noop(mk())
            else:
                mk().count()
            walls.append(round(time.time() - t0, 3))
        br = stage_breakdown(spark, since_ms)
        results[n] = {"walls": walls, "min": min(walls[1:] or walls),
                      "stages_last_rep": br}
        print(n, walls)
        for s in br[:12]:
            print("   ", s)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        f"extra_{name}.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
