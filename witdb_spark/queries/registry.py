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
# Registration order follows module import order, which (pre-round-4) put the
# window/agg families first and left TPC-H, the dedup/similarity pipeline, and
# MATCH_RECOGNIZE outside the sampled window in every round. This explicit
# priority list pins the highest-risk queries into the window; everything else
# follows in registration order and stays covered by the local DuckDB suite
# (tests/test_queries_oracle.py runs all of them).
_PRIORITY: tuple[str, ...] = (
    # TPC-H, full sweep (22)
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22",
    # dedup / similarity pipeline (8)
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
    "similarity_topk", "similarity_lsh_buckets", "similarity_ivf_topk",
    "embedding_near_dup",
    # MATCH_RECOGNIZE (3)
    "mr_funnel", "mr_sql_funnel", "mr_subset_moves",
    # multimodal + text (3)
    "multimodal_metadata", "multimodal_frame_sample", "text_quality",
    # round-4 additions, never driver-verified (4)
    "agg_tdigest_rollup", "agg_setdigest", "spatial_join_contains",
    "try_fallback_parse",
    # function-parity families never in the window (10)
    "sql_json_2016_parity", "array_hof_parity", "math_funcs_parity",
    "json_funcs_parity", "regex_funcs_parity", "binary_funcs_parity",
    "bitwise_funcs_parity", "url_funcs_parity", "geo_funcs_parity",
    "geometry_funcs_parity",
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
