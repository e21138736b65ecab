"""Two-parallelism scaling run (north-rule evidence, sandbox form).

No real cluster exists here, so the N->4N executor criterion is evidenced
by running the SAME ladder on the SAME cached input at local[8] and
local[32] in separate processes (fresh JVM each) and reporting throughput
at both plus efficiency = (t_8 / t_32) / 4. Results land in
BENCH/BASELINE.md. Usage: python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(sf_dir: str, cores: int) -> dict:
    env = dict(
        os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cores)
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    # warm the synth cache once so both runs read identical parquet
    r8 = run_once(sf_dir, 8)
    r8b = run_once(sf_dir, 8)  # second run = warm cache; use the warm one
    r32 = run_once(sf_dir, 32)
    t8, t32 = r8b["ladder_sec"], r32["ladder_sec"]
    eff = (t8 / t32) / 4
    md = f"""# BENCH — measured baseline (this engine)

Input: deterministic sequences table, {r8b['seq_rows']:,} rows
({r8b['sf']} SF x 20M rows/SF, 64 sources incl. one ~30% dominant),
cached parquet at /tmp/rtsa_bench. Ladder = raw->hourly->daily->monthly
rollups + hourly linear gap-fill (+ encode + metrics timed separately in
bench.py). local mode, single JVM; "executors" = worker threads.

| parallelism | ladder wall (s) | rolled points | points/sec |
|---|---|---|---|
| local[8]  | {t8:.1f} | {r8b['rolled_points']:,} | {r8b['points_per_sec']:,} |
| local[32] | {t32:.1f} | {r32['rolled_points']:,} | {r32['points_per_sec']:,} |

**Scaling efficiency (8 -> 32 threads, 4x): {eff:.2f}**
(north rule asks >= 0.8 between N and 4N executors; local-mode thread
scaling is the sandbox proxy — memory bandwidth is shared across threads,
so this floor is conservative vs real multi-host executors)

Cold-run (first-ever) numbers for reference: local[8] ladder {r8['ladder_sec']:.1f}s.
Raw JSON: see BENCH_scaling.json.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "BENCH_scaling.json"), "w") as f:
        json.dump({"local8_cold": r8, "local8": r8b, "local32": r32, "efficiency": eff}, f, indent=2)
    print(md)


if __name__ == "__main__":
    main(*sys.argv[1:])
