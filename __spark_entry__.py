"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 as
(spark fn, DuckDB oracle SQL) pairs via witdb_spark.queries.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make witdb_spark importable regardless of the driver's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Also expose the repo to Spark's Python WORKERS: cloudpickle serializes
# module-level functions by reference, so an executor that cannot import
# witdb_spark fails at deserialize time. PYTHONPATH is inherited by the
# worker subprocesses when the JVM starts after this import; UDF closures
# additionally avoid module references (by-value capture) as the primary
# defense, since the JVM may already be up.
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + (os.pathsep + _pp if _pp else "")
    )

from witdb_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from witdb_spark.queries.tpch import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
