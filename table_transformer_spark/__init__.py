"""table_transformer_spark — a PySpark-native table-extraction analytics
engine with the query/data-processing capabilities of
microsoft/table-transformer (TATR), rebuilt Spark-first.

Layers:

* :mod:`~table_transformer_spark.geometry` — box algebra (fitz.Rect
  semantics) usable both as numpy batch kernels and column expressions.
* :mod:`~table_transformer_spark.kernels` — per-table deterministic
  kernels (structure canonicalization, GriTS, text assembly) that run
  inside ``applyInPandas`` groups.
* :mod:`~table_transformer_spark.operators` — DataFrame-native operator
  algebra (iob theta-joins, argmax slotting windows, dedup, similarity
  search, text analysis) — the scalable path.
* :mod:`~table_transformer_spark.pipeline` — end-to-end extraction job
  (documents → tokens/objects → cells → ordered spans) with
  checkpointed, resumable partitions.
* :mod:`~table_transformer_spark.eval` — distributed GriTS / DAR
  evaluation.
* :mod:`~table_transformer_spark.fixtures` — deterministic synthetic
  corpus generator matching the BASELINE input contract.
"""

__version__ = "0.1.0"
