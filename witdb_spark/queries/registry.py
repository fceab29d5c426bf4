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


# The driver's correctness gate samples the FIRST 50 names from queries().
# Rotation rule (every round): lead with (a) anything new or whose
# engine/oracle changed this round, (b) the oldest driver-green queries.
# After r7 every registered query has a green driver row (cumulative
# 194/194); the staleness ledger is r3: 44, r4: 50, r6: 50, r7: 50.
# Round-8 window = 41 never-verified (TPC-DS tranches 4, 5 and 6 +
# the new geometry_collection_ops) + geometry_buffer_parity (its
# oracle went numeric in r8 — changed, so it re-verifies) + the FIRST
# 8 of the 44 r3-era greens in registration order. The remaining 36
# r3-era greens (groupby_rollup .. datetime_funcs_parity) lead
# round 9's fillers, then the r4-era 50. Everything else keeps local
# DuckDB coverage every pytest run (tests/test_queries_oracle.py
# parameterizes the whole registry).
_PRIORITY: tuple[str, ...] = (
    # r8-new: TPC-DS tranche 4
    "tpcds_sql_q1", "tpcds_sql_q30", "tpcds_sql_q81", "tpcds_sql_q6",
    "tpcds_sql_q32", "tpcds_sql_q17", "tpcds_sql_q25", "tpcds_sql_q29",
    "tpcds_sql_q62", "tpcds_sql_q99", "tpcds_sql_q64", "tpcds_sql_q78",
    # r8-new: TPC-DS tranche 5
    "tpcds_sql_q2", "tpcds_sql_q9", "tpcds_sql_q28", "tpcds_sql_q43",
    "tpcds_sql_q48", "tpcds_sql_q50", "tpcds_sql_q53", "tpcds_sql_q57",
    "tpcds_sql_q58", "tpcds_sql_q66", "tpcds_sql_q76", "tpcds_sql_q97",
    # r8-new: TPC-DS tranche 6
    "tpcds_sql_q12", "tpcds_sql_q20", "tpcds_sql_q98", "tpcds_sql_q16",
    "tpcds_sql_q22", "tpcds_sql_q26", "tpcds_sql_q27", "tpcds_sql_q37",
    "tpcds_sql_q40", "tpcds_sql_q41", "tpcds_sql_q42", "tpcds_sql_q55",
    "tpcds_sql_q45", "tpcds_sql_q61", "tpcds_sql_q90", "tpcds_sql_q96",
    # r8-new: GEOMETRYCOLLECTION operand query
    "geometry_collection_ops",
    # r8-changed: oracle strengthened from all-TRUE booleans to numeric
    # closed-form areas
    "geometry_buffer_parity",
    # filler: the 8 stalest greens (last driver row r3), registration
    # order
    "window_rank_topn", "window_lag_lead", "window_running_sum",
    "window_sliding_rows", "window_ntile_dist", "window_range_interval",
    "setops_intersect_except", "setops_intersect_all",
)


def _ordered_names() -> list[str]:
    prio = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prio)]
    return prio + rest


def all_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
