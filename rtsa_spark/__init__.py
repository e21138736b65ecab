"""rtsa_spark — a PySpark-native time-series rollup / downsample / retention engine.

A from-scratch re-imagination of ffilipponi/rtsa (R raster-time-series analysis,
``/root/reference``) as continuous aggregates over tables of pre-tokenized
training sequences ``(doc_id string, tokens array<int>, n_tok int, source string)``:

- cascading retention tiers raw -> hourly -> daily -> monthly
  (rtsa's periodicity ladder, ``R/rtsa.stl.R:128-135``),
- eligibility masks as semi-joins (rtsa's rastermask subsystem,
  ``R/rtsa_gapfill.R:98-155``),
- linear-interpolation gap-fill of missing buckets via window algebra
  (``R/rtsa_gapfill.R:177-232``),
- Gorilla XOR + delta-of-delta compression of per-partition streams in
  vectorized numpy/Arrow kernels,
- per-source metrics (seasonal amplitude / trend slope / remainder stdev /
  Mann-Kendall) matching rtsa's formulas (``R/rtsa.stl.R:363-375``,
  ``R/rtsa.mk.R:296-312``),
- plus the training-data-pipeline operators a 100 TB corpus needs:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), ANN similarity
  search, text quality analysis, multimodal column plumbing.

Everything is DataFrame-first: Catalyst plans the physical execution; Python
only ever sees Arrow batches (pandas UDFs / applyInPandas), never single rows.
"""

__version__ = "0.1.0"

TIERS = ("raw", "hourly", "daily", "monthly")
