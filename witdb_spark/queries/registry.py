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
# queries. Cumulative ledger after r9: 286/286 driver-green at least once;
# staleness by latest driver row: r3: 37, r4: 50, r6: 50, r7: 49, r8: 50,
# r9: 50.
# Round-10 window (prescribed by VERDICT r9 task 1, adjusted for r10-new
# work): positions 1-8 are the r10-new queries (jar-free Avro container
# scan with the snappy codec, Delta column-mapping id-mode reader AND
# writer-side mapping, identity- and transform-partitioned Iceberg
# writes, partitioned Hudi COW, Delta stats skipping + Iceberg
# manifest pruning); 9-11 are queries whose EXECUTION
# ENGINE changed this round (rotation clause (a)) — mr_subset_moves and
# mr_error_burst now ride the pure-JVM runs fast path (alternation /
# single-element-unbounded extension), spatial_join_contains gained the
# unrolled literal-SQL verify tier; 12-48 are ALL 37 remaining r3-era
# greens; 49-50 the 2 oldest r4-era greens (engine-changed slots 9-11
# are themselves r4/r6-era, so 42 of 50 slots refresh staleness). Done = CORRECTNESS_r10
# 50/50 green and no query's last driver row older than r4 (after r11:
# none older than r6 — r11 head = the remaining 43 r4-era).
# Everything keeps local DuckDB coverage every pytest run
# (tests/test_queries_oracle.py parameterizes the whole registry).
_PRIORITY: tuple[str, ...] = (
    # r10-new
    "avro_container_scan",
    "delta_cm_id_reader",
    "iceberg_partitioned_roundtrip",
    "iceberg_transform_partitioned_roundtrip",
    "delta_skipping_scan",
    "iceberg_pruned_scan",
    "delta_cm_writer_roundtrip",
    "hudi_partitioned_roundtrip",
    # engine changed in r10
    "mr_subset_moves",
    "mr_error_burst",
    "spatial_join_contains",
    # all 37 remaining r3-era greens (last driver row: CORRECTNESS_r03),
    # registration order
    "setops_intersect_all", "groupby_rollup", "groupby_cube",
    "groupby_grouping_sets", "unnest_words", "values_inline_join",
    "distinct_order_offset", "pivot_event_counts", "lateral_top_event",
    "crossjoin_theta", "assign_unique_id", "tablesample",
    "window_groups_frame", "time_of_day_rollup", "ptf_sequence_join",
    "sessionize_events", "yoy_revenue", "category_share",
    "session_window_native", "moving_avg_deviation", "window_ignore_nulls",
    "limit_with_ties", "quantified_comparison", "agg_stats_moments",
    "agg_skew_kurt", "agg_regr", "agg_minmax_by", "agg_listagg_ordered",
    "agg_multi_distinct", "agg_reduce_agg", "agg_salted_skew",
    "agg_hll_merge_rollup", "agg_rollup_reuse", "agg_qdigest_rollup",
    "agg_multimap", "string_funcs_parity", "datetime_funcs_parity",
    # 2 oldest r4-era greens (the remaining window slots)
    "agg_tdigest_rollup", "agg_setdigest",
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
