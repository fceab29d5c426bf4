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
# queries. Cumulative ledger after r11: 298/303 driver-green at least
# once, ZERO latest-row failures; staleness by latest driver row:
# r6: 49, r7: 49, r8: 50, r9: 50, r10: 50, r11: 50; never-checked: the
# 5 late-r11 registrations.
# Round-12 window (VERDICT r11 task 1): positions 1-5 the five
# never-driver-checked late-r11 queries (delta_table_changes_cdf's
# ENGINE also changed this round: CDF now gates on
# enableChangeDataFeed and the DML writes real cdc files — the oracle
# is unchanged; iceberg_incremental_scan gained the branch-ancestry
# filter); 6-8 the r12-new queries (partition-spec evolution reads,
# virtual-key MOR writes, library avro-list DELETE blocks); 9-10 two
# engine-changed-in-r12 queries holding recent rows
# (sql_lakehouse_select — pushdown now refuses multi-occurrence refs;
# iceberg_pruned_scan — pruning resolves per-manifest spec-ids); 11-50
# forty of the 49 r6-era greens. The 9 deferred r6-era queries
# (tpch_sql_q3/q7/q8/q9/q20/q21/q22, tpcds_sql_q70/q88 — all SQL
# front-door texts whose engine family is represented in-window by
# tpch_sql_q11/q13/q15/q17/q18/q2 and tpcds_sql_q36/q47) lead r13
# alongside any r13-new; every deferred query keeps local DuckDB
# coverage each pytest run (tests/test_queries_oracle.py parameterizes
# the whole registry). FOUR queries were registered after this window
# froze (sql_lakehouse_ctas_insert, iceberg_mor_evolved_dml,
# hudi_mor_logical_types, delta_cdf_stream_drain) — the late-r12 set
# is contract-emulation green at sf0.01 AND sf0.1 plus TZ-probed;
# they lead r13 with the deferred nine, the same staging every prior
# round's late pair used.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (late-r11 registrations)
    "iceberg_mor_partitioned_dml",
    "hudi_mor_log_delete_dml",
    "delta_table_changes_cdf",
    "iceberg_incremental_scan",
    "hudi_incremental_read",
    # r12-new
    "iceberg_spec_evolution_scan",
    "hudi_virtual_key_upsert",
    "hudi_library_delete_block_scan",
    # engine changed in r12 (fresh rows exist, but the code under the
    # query moved: re-drive)
    "sql_lakehouse_select",
    "iceberg_pruned_scan",
    # 40 of the 49 r6-era greens (last driver row: CORRECTNESS_r06)
    "bing_tile_funcs_parity", "codec_funcs_parity", "curation_chunks",
    "curation_decontaminated", "curation_pii_scrub",
    "curation_semantic_decontaminated", "curation_stratified_sample",
    "dedup_clusters", "geometry_accessors_parity",
    "geometry_union_agg_rollup", "groupby_grouping_operation",
    "mr_all_rows_running", "mr_label_nav_all_rows",
    "mr_nav_in_aggregate", "mr_nav_measures", "mr_pattern_window",
    "mr_plateau_ends", "mr_price_slide", "mr_rally",
    "multimodal_features", "multimodal_resize", "recursive_factorial",
    "recursive_reachability", "spatial_join_distance",
    "text_fingerprint", "text_langid", "text_repetition",
    "text_tfidf_top_terms", "time_funcs_parity", "timetz_funcs_parity",
    "tpcds_multicount_scan", "tpcds_rollup_rank", "tpcds_sql_q36",
    "tpcds_sql_q47", "tpch_sql_q11", "tpch_sql_q13", "tpch_sql_q15",
    "tpch_sql_q17", "tpch_sql_q18", "tpch_sql_q2",
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
