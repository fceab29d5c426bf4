"""Query registry: every implemented operator from SURVEY.md §2 registers a
(spark_fn, duckdb_oracle_sql) pair here. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this dict — the driver's correctness
gate (CORRECTNESS_r{N}.json) runs both sides at sf0.01 and hash-compares.

Determinism rules every query follows (so the order-insensitive value hash
matches bit-for-bit between Spark and DuckDB):
  - Floating aggregates go through a per-row cast to DECIMAL, are summed
    exactly, and only the final value is cast back to DOUBLE. Double summation
    order varies between engines/partitions; decimal summation does not.
  - Averages are computed as CAST(exact_sum AS DOUBLE) / COUNT — one IEEE
    division, identical in both engines.
  - Timestamp columns are returned as DATE or formatted strings, never raw
    (parquet is timestamp_ntz; string form is engine-neutral).
  - Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
