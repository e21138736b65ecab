"""Ladder driver for the ``spark-submit --py-files`` launch evidence.

North rule: the engine must launch via ``spark-submit --py-files`` on a
multi-executor cluster. Sandbox form: package the library with
``tools/make_pyfiles_zip.py``, then run THIS script from a directory that
does NOT contain the repo, so every ``rtsa_spark`` import on the driver
and the executors resolves from the shipped zip alone::

    python tools/make_pyfiles_zip.py
    cd /tmp && spark-submit --master 'local[8]' \
        --conf spark.sql.shuffle.partitions=16 \
        --conf spark.sql.session.timeZone=UTC \
        --py-files /root/repo/rtsa_spark.zip /root/repo/tools/submit_ladder.py

Prints one ``SUBMIT_RESULT`` line with the per-tier rolled-point counts
plus the gap-filled dense row count; BENCH/BASELINE.md records it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("rtsa_submit_ladder").getOrCreate()
    # imports resolve from the --py-files zip (no repo checkout on path)
    from rtsa_spark.operators.gapfill import gapfill_linear
    from rtsa_spark.operators.rollup import rollup_ladder
    from rtsa_spark.synth import synth_sequences

    seq = synth_sequences(spark, 100_000, n_sources=24)
    tiers = rollup_ladder(seq)
    counts = {t: df.count() for t, df in tiers.items()}
    dense = gapfill_linear(tiers["hourly"], "hourly").count()
    print("SUBMIT_RESULT", counts, "gapfill_dense", dense)
    spark.stop()


if __name__ == "__main__":
    main()
