"""Query registry package. Importing this package registers every query
module's (spark_fn, oracle_sql) pairs into registry.QUERIES."""

from witdb_spark.queries.registry import QUERIES, all_oracles, all_queries

# Import for registration side effects — each module fills QUERIES.
from witdb_spark.queries import (  # noqa: E402,F401
    aggregates,
    analytics,
    curation_queries,
    functions_parity,
    patterns,
    pipeline_queries,
    spatial,
    tpch,
    tpch_sql,
    tpcds_sql,
)

__all__ = ["QUERIES", "all_queries", "all_oracles"]
