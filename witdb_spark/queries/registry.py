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
# Rounds 1-4 rotated this window so that by r4 100 of the registered names
# had driver-green CORRECTNESS rows. Round-5 window = the SQL-text TPC-H
# tranche (the front-door dialect path, never driver-run before) + every
# query that has never had a driver row (r4 additions) + the r5-new
# operators. Everything else keeps local DuckDB coverage
# (tests/test_queries_oracle.py runs all of them).
_PRIORITY: tuple[str, ...] = (
    # TPC-H as Trino SQL text through Engine.sql (r5) — the hardest
    # transpiler shapes; the remaining 7 stay locally oracled
    "tpch_sql_q2", "tpch_sql_q3", "tpch_sql_q7",
    "tpch_sql_q8", "tpch_sql_q9", "tpch_sql_q11",
    "tpch_sql_q13", "tpch_sql_q15", "tpch_sql_q17", "tpch_sql_q18",
    "tpch_sql_q20", "tpch_sql_q21", "tpch_sql_q22",
    # never driver-verified (registered r4, local-green only)
    "recursive_factorial", "recursive_reachability",
    "groupby_grouping_operation", "tpcds_multicount_scan",
    "tpcds_rollup_rank", "curation_chunks", "curation_decontaminated",
    "curation_pii_scrub", "curation_stratified_sample", "text_langid",
    "text_fingerprint", "multimodal_features", "multimodal_resize",
    "text_repetition", "text_tfidf_top_terms", "dedup_clusters",
    "curation_semantic_decontaminated", "time_funcs_parity",
    "codec_funcs_parity", "timetz_funcs_parity", "bing_tile_funcs_parity",
    "geometry_accessors_parity", "mr_price_slide", "mr_rally",
    "mr_plateau_ends", "mr_error_burst", "mr_nav_measures",
    "mr_all_rows_running", "spatial_join_distance",
    # r5-new operators (registered later this round; filtered if absent)
    "tpcds_sql_q70", "tpcds_sql_q88", "tpcds_sql_q47", "tpcds_sql_q36",
    "geometry_union_agg_rollup", "mr_nav_in_aggregate",
    "mr_label_nav_all_rows", "mr_pattern_window",
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
