"""LLM-data-pipeline operators (BASELINE.json north-star): deduplication,
similarity search, text analysis, multimodal column handling — the operations
a 100 TB training-data pipeline needs, built Spark-first.

Design rules:
  - Everything hashes with md5 (bit-identical across Spark, DuckDB, and
    Python's hashlib) so oracles and tests can verify exact results.
  - Hot paths are JVM built-ins (split/transform/min/groupBy) — no Python
    row loops; the only Python is the multimodal mapInPandas path, which is
    Arrow-batched by design.
  - Pairwise stages (jaccard verify, hamming pairs) run on candidate sets
    produced by banding/bucketing, never on the full cross product — the
    banding join is the thing that survives a 1000-executor scale-up.
"""

from witdb_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
