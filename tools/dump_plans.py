"""Dump .explain("formatted") for every headline bench query into
plans/<tag>/<query>_<suffix>.txt (round deliverable: judge checks plan
claims against these files).

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans.py r06 before
       python tools/dump_plans.py r06 after dsir_select minhash_lsh

Planning only — no jobs run. Uses the same session shape as bench.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "rollup_hourly",
    "rollup_daily_cascade",
    "gapfill_hourly_linear",
    "mask_consecutive_gap",
    "metrics_series",
    "dedup_exact",
    "minhash_lsh",
    "simhash16",
    "ann_cosine_topk",
    "text_quality",
    "semantic_dedup",
    "bpe_vocab_learn",
    "matrix_profile",
    "perplexity_partition",
    "dsir_select",
    "zorder_skip_audit",
    "sax_words",
    "bm25_topk",
    "hybrid_rrf",
    "cm_frequency_ladder",
    "bloom_incremental_dedup",
    "mg_heavy_hitters",
    "funnel_conversion",
    "hll_ladder",
    "classifier_auc",
    "heaps_curve",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE

    from rtsa_spark.session import get_spark
    import __spark_entry__ as E

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="dump_plans", cores=cores, shuffle_partitions=cores * 2
    )
    qs = E.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name == "minhash_lsh":
            # bench times the library-default variant, not the md5 oracle
            # twin (bench.py does the same)
            from rtsa_spark.operators.dedup import minhash_lsh_buckets

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            df = minhash_lsh_buckets(docs)
        elif name in qs:
            df = qs[name](spark, sf_dir)
        else:
            print(f"skip {name}: not declared")
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        plan = buf.getvalue()
        n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
        print(
            f"{name}: {len(plan.splitlines())} lines, "
            f"Exchange={n_ex} Reused={plan.count('ReusedExchange')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"SMJ={plan.count('SortMergeJoin')} "
            f"Py={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow') + plan.count('MapInBatch')}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
