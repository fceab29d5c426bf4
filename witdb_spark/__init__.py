"""witdb_spark — a PySpark-native analytics engine with the query surface of
GuinsooLab/witdb (a Trino 411 fork; see SURVEY.md).

The reference is a distributed MPP SQL engine (coordinator/worker, pipelined
columnar execution). We rebuild its *query surface and semantics* on Spark
SQL / Catalyst: the distributed execution layer (shuffles, spilling, codegen,
CBO, dynamic filtering) is Spark itself; our code is the SQL-semantics layer,
the function library, and the scale-oriented operator compositions on top.

Layout:
  session.py    — tuned SparkSession factory (AQE, broadcast, UTC, Arrow)
  catalog.py    — table registry over the driver's parquet fixtures
  queries/      — operator-inventory query registry (spark fn + DuckDB oracle)
  functions/    — Trino-name -> Spark Column builders + registered UDFs
  operators/    — custom operator compositions (topn, dedup joins, ...)
  pipeline/     — LLM-data-pipeline ops: dedup, similarity, text, multimodal
  streaming/    — Structured Streaming equivalents (bonus; reference is batch-only)
"""

from witdb_spark.catalog import Tables
from witdb_spark.engine import Engine
from witdb_spark.session import get_spark

__all__ = ["Engine", "get_spark", "Tables"]
__version__ = "0.1.0"
