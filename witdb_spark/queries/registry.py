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
# Rounds 1-4 rotated this window; round 6 froze it (a process failure the
# r6 verdict flags). Round-7 window = ALL 34 queries that have never had a
# driver CORRECTNESS row (computed by diffing CORRECTNESS_r01..r06 against
# the registry): the r6 re-oracled sketch SQL-name rollups (highest-risk —
# engine+oracle were rewritten in lockstep), the DML trio, the MR corner,
# the 9 remaining TPC-H SQL texts, and the 18 TPC-DS SQL texts. The 16
# filler slots re-verify the STALEST greens (last driver row r1, by
# registration order). Everything else keeps local DuckDB coverage
# (tests/test_queries_oracle.py runs all of them). Rotation rule for every
# future round: lead with (a) anything new/changed, (b) the oldest greens.
_PRIORITY: tuple[str, ...] = (
    # r6 re-oracled sketch SQL-name aggregates — oracles changed in r6,
    # never independently verified
    "agg_qdigest_sql_names", "agg_tdigest_sql_names",
    "agg_histogram_sql_names",
    # DML trio — never driver-verified since registration (r5)
    "merge_upsert_result", "delete_update_snapshot", "ctas_writer_roundtrip",
    # r6 MATCH_RECOGNIZE corner
    "mr_label_nav_in_aggregate",
    # TPC-H SQL-text remainder (r5; the other 13 went driver-green r5/r6)
    "tpch_sql_q1", "tpch_sql_q4", "tpch_sql_q5", "tpch_sql_q6",
    "tpch_sql_q10", "tpch_sql_q12", "tpch_sql_q14", "tpch_sql_q16",
    "tpch_sql_q19",
    # TPC-DS SQL texts: tranche-1 remainder (r5) + all of tranche 2 (r6)
    "tpcds_sql_q5", "tpcds_sql_q23", "tpcds_sql_q31", "tpcds_sql_q34",
    "tpcds_sql_q38", "tpcds_sql_q39", "tpcds_sql_q44", "tpcds_sql_q49",
    "tpcds_sql_q51", "tpcds_sql_q59", "tpcds_sql_q65", "tpcds_sql_q67",
    "tpcds_sql_q74", "tpcds_sql_q75", "tpcds_sql_q87", "tpcds_sql_q89",
    "tpcds_sql_q93", "tpcds_sql_q95",
    # TPC-DS tranche 3 (r7-new — takes precedence over stale fillers)
    "tpcds_sql_q4", "tpcds_sql_q11", "tpcds_sql_q14", "tpcds_sql_q33",
    "tpcds_sql_q56", "tpcds_sql_q60", "tpcds_sql_q77", "tpcds_sql_q46",
    "tpcds_sql_q68",
    # r7-new operator queries
    "geometry_buffer_parity",
    # filler: stalest greens (last driver row r1) for re-verification
    "agg_approx_most_frequent", "agg_approx_sketches", "agg_checksum",
    "agg_conditional_bool", "agg_geo_mean_percentiles", "agg_histogram_map",
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
