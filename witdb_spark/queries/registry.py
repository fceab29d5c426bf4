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
# Rotation rule (every round): lead with (a) anything never driver-verified
# or whose engine/oracle changed this round, (b) the oldest driver-green
# queries. Cumulative ledger after r10: 294/296 driver-green at least
# once; staleness by latest driver row: r4: 46, r6: 49, r7: 49, r8: 50,
# r9: 50, r10: 50; never-checked: the 2 late-r10 registrations.
# Round-11 window (prescribed by VERDICT r10 task 1): positions 1-2 the
# two never-driver-checked late-r10 queries; 3-4 the r11-new queries
# (log-only MERGE_ON_READ lifecycle, OR-predicate file skipping); 5-50
# ALL 46 remaining r4-era greens — after r11 no query's last driver row
# is older than r6. The 5 LATE-r11 registrations
# (iceberg_mor_partitioned_dml, hudi_mor_log_delete_dml,
# delta_table_changes_cdf, iceberg_incremental_scan,
# hudi_incremental_read) were registered after this window froze;
# all are contract-emulation green + TZ-probed locally and lead r12,
# the staging the late-r10 pair used.
# Engine-changed-in-r11 queries already holding an r10 row
# (delta_skipping_scan / iceberg_pruned_scan over the new predicate
# tree; the DV/posdelete/log-upsert DML paths now distributed) stay
# out: the window is exactly full, their r10 rows are the freshest in
# the ledger, delta_skipping_or_scan / hudi_mor_logonly_roundtrip
# drive the new engines in-window, and every one keeps local DuckDB
# coverage each pytest run (tests/test_queries_oracle.py parameterizes
# the whole registry) plus the r11 no-row-collect gate.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (late-r10 registrations)
    "hudi_mor_partitioned_roundtrip",
    "sql_lakehouse_select",
    # r11-new
    "hudi_mor_logonly_roundtrip",
    "delta_skipping_or_scan",
    # all 46 r4-era greens (last driver row: CORRECTNESS_r04),
    # registration order
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_ngram_jaccard", "similarity_topk", "similarity_lsh_buckets",
    "embedding_near_dup", "text_quality", "multimodal_metadata",
    "multimodal_frame_sample", "similarity_ivf_topk",
    "math_funcs_parity", "json_funcs_parity", "regex_funcs_parity",
    "binary_funcs_parity", "bitwise_funcs_parity", "array_hof_parity",
    "url_funcs_parity", "sql_json_2016_parity", "geo_funcs_parity",
    "geometry_funcs_parity", "try_fallback_parse", "mr_funnel",
    "mr_sql_funnel", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "tpch_q10", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22", "tpch_q2",
    "tpch_q11", "tpch_q20",
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
