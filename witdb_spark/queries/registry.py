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
# queries. Cumulative ledger after r8: 243/280 driver-green; staleness
# r3: 44, r4: 50, r6: 50, r7: 49, r8: 50; 37 queries (the r8-late 17 +
# TPC-DS tranche 7's last 20) have never had a driver row.
# Round-9 window (prescribed by VERDICT r8 task 1): positions 1-37 are
# exactly the 37 never-driver-verified queries — the 17 late-r8
# (lakehouse readers/writers/DML roundtrips, weighted digests,
# agg_merge_generic, agg_qdigest_distinct, ptf_sql_table_spelling, the
# five late LLM-pipeline ops) then the 20 tranche-7 TPC-DS texts —
# then the r9-new queries (rotation clause (a)), then the stalest
# r3-era greens filling the remaining slots. Done = CORRECTNESS_r09
# 50/50 green and cumulative driver coverage = all pre-r9 queries.
# Round 10's head: whichever r3-era greens missed this window, then
# the rest of r3 (through datetime_parity), then the 50 r4-era —
# after r10 no query's last driver verification should be older
# than r6.
# Everything keeps local DuckDB coverage every pytest run
# (tests/test_queries_oracle.py parameterizes the whole registry).
_PRIORITY: tuple[str, ...] = (
    # never-driver-verified: late-r8 sketch/digest + PTF spelling
    "agg_qdigest_weighted",
    "agg_tdigest_weighted",
    "agg_merge_generic",
    "ptf_sql_table_spelling",
    # never-driver-verified: jar-free lakehouse readers
    "delta_log_reader_snapshot",
    "iceberg_meta_reader_snapshot",
    "agg_qdigest_distinct",
    "hudi_timeline_reader_snapshot",
    # never-driver-verified: jar-free lakehouse writers + DML
    "delta_writer_roundtrip",
    # never-driver-verified: late-r8 LLM-pipeline tier
    "text_gopher_quality",
    "text_bigram_logprob",
    "pipeline_pack_concat",
    "pipeline_pack_nextfit",
    "curation_temperature_mix",
    "iceberg_dml_roundtrip",
    "hudi_dml_roundtrip",
    "lakehouse_merge_roundtrip",
    # never-driver-verified: TPC-DS tranche 7, remaining 20
    "tpcds_sql_q19", "tpcds_sql_q21", "tpcds_sql_q24", "tpcds_sql_q35",
    "tpcds_sql_q52", "tpcds_sql_q54", "tpcds_sql_q63", "tpcds_sql_q69",
    "tpcds_sql_q71", "tpcds_sql_q72", "tpcds_sql_q73", "tpcds_sql_q79",
    "tpcds_sql_q80", "tpcds_sql_q82", "tpcds_sql_q83", "tpcds_sql_q84",
    "tpcds_sql_q85", "tpcds_sql_q86", "tpcds_sql_q91", "tpcds_sql_q92",
    # r9-new (rotation rule clause (a) — new this round, enters the
    # window ahead of stale greens)
    "iceberg_posdelete_roundtrip",
    "lakehouse_merge_conditional",
    "hudi_keyed_upsert_roundtrip",
    "iceberg_eqdelete_roundtrip",
    "delta_dv_roundtrip",
    "hudi_mor_upsert_roundtrip",
    # stalest r3-era greens (last driver row: CORRECTNESS_r03) —
    # the remaining window positions
    "window_rank_topn", "window_lag_lead", "window_running_sum",
    "window_sliding_rows", "window_ntile_dist", "window_range_interval",
    "setops_intersect_except", "setops_intersect_all", "groupby_rollup",
    "groupby_cube", "groupby_grouping_sets", "unnest_words",
    "values_inline_join",
    # --- window boundary: everything below leads round 10 ---
    # remaining r3-era greens, oldest-first by registration order
    "distinct_order_offset", "pivot_event_counts", "lateral_top_event",
    "crossjoin_theta", "assign_unique_id", "tablesample",
    "window_groups_frame", "time_of_day_rollup", "ptf_sequence_join",
    "sessionize_events", "yoy_revenue", "category_share",
    "session_window_native", "moving_avg_deviation", "window_ignore_nulls",
    "limit_with_ties", "quantified_comparison", "agg_stats_moments",
    "agg_skew_kurt", "agg_regr", "agg_minmax_by", "agg_listagg_ordered",
    "agg_histogram_map", "agg_conditional_bool", "agg_geo_mean_percentiles",
    "agg_multi_distinct", "agg_approx_sketches", "agg_checksum",
    "agg_reduce_agg", "agg_approx_most_frequent", "agg_salted_skew",
    "agg_hll_merge_rollup", "agg_rollup_reuse", "agg_qdigest_rollup",
    "agg_multimap", "string_funcs_parity", "datetime_funcs_parity",
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
