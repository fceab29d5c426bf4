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
# queries. Cumulative ledger after r12: 306 ever driver-checked, ZERO
# latest-row failures; staleness by latest driver row: r6: 9, r7: 49,
# r8: 50, r9: 50, r10: 49, r11: 49, r12: 50; never-checked: the 4
# late-r12 registrations.
# Round-13 window (VERDICT r12 task 1): positions 1-4 the four
# never-driver-checked late-r12 registrations; 5-13 the nine deferred
# r6-era SQL texts (tpch_sql_q3/q7/q8/q9/q20/q21/q22,
# tpcds_sql_q70/q88); 14-18 the r13-new queries (kryo DELETE log
# blocks, iceberg branch fast-forward, hudi CDC_DATA block read, the
# CDF-stream-to-delta-sink and iceberg-appends-to-iceberg-sink
# exactly-once loops); 19-21 engine-changed-in-r13
# re-drives — delta_table_changes_cdf (remove actions now stamp
# partitionValues, synthesis gained the pv fallback and the id-mode
# physical-name read path) and agg_qdigest/tdigest_sql_names (builds
# now pre-aggregate to (value, count) pairs; both also r7-stale);
# 20-50 the r7-era backfill: all 11 remaining non-SQL-text r7 queries,
# all 9 r7 tpch_sql texts, and 11 of the 27 r7 tpcds_sql texts chosen
# for shape diversity. The 16 deferred tpcds texts
# (q11/q14/q46/q56/q59/q60/q65/q67/q68/q74/q75/q77/q87/q89/q93/q95) have
# their families represented in-window (q4 & q74 are the
# year-over-year CTE pair, q23 & q14 the big multi-CTE pair, q5/q33
# cover the channel-union rollups of q56/q60/q77, the r12-green
# tpcds_sql_q47/q36 the window/rollup family of q51/q59, q34 the
# household
# family of q46/q68, q38 the INTERSECT family of q87, in-window
# q70/q88 and the r6-green tpcds_rollup_rank the ranking shapes of
# q44/q49) and lead r14;
# every deferred query keeps local DuckDB coverage each pytest run
# (tests/test_queries_oracle.py parameterizes the whole registry).
# ONE query was registered after this window froze
# (hudi_cdf_stream_sink_loop — the hudi member of the streaming-sink
# family; contract-emulation green at sf0.01 UTC + America/New_York
# and at sf0.1): it leads r14 with the deferred tpcds texts, the same
# staging every prior round's late registrations used.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (late-r12 registrations)
    "sql_lakehouse_ctas_insert",
    "iceberg_mor_evolved_dml",
    "hudi_mor_logical_types",
    "delta_cdf_stream_drain",
    # r6-era (the nine deferred from the r12 window)
    "tpch_sql_q3", "tpch_sql_q7", "tpch_sql_q8", "tpch_sql_q9",
    "tpch_sql_q20", "tpch_sql_q21", "tpch_sql_q22",
    "tpcds_sql_q70", "tpcds_sql_q88",
    # r13-new
    "hudi_kryo_delete_scan",
    "iceberg_fast_forward_scan",
    "hudi_cdc_block_read",
    "delta_cdf_stream_sink_loop",
    "iceberg_appends_stream_sink_loop",
    # engine changed in r13 (re-drive)
    "delta_table_changes_cdf",
    "agg_qdigest_rollup",
    "agg_tdigest_rollup",
    # r7-era backfill: the 13 non-SQL-text queries
    "agg_approx_most_frequent", "agg_approx_sketches", "agg_checksum",
    "agg_conditional_bool", "agg_geo_mean_percentiles",
    "agg_histogram_map", "agg_histogram_sql_names",
    "agg_qdigest_sql_names", "agg_tdigest_sql_names",
    "ctas_writer_roundtrip", "delete_update_snapshot",
    "merge_upsert_result", "mr_label_nav_in_aggregate",
    # r7-era backfill: all 9 tpch SQL texts
    "tpch_sql_q1", "tpch_sql_q4", "tpch_sql_q5", "tpch_sql_q6",
    "tpch_sql_q10", "tpch_sql_q12", "tpch_sql_q14", "tpch_sql_q16",
    "tpch_sql_q19",
    # r7-era backfill: 7 of 27 tpcds SQL texts (shape-diverse)
    "tpcds_sql_q4", "tpcds_sql_q5", "tpcds_sql_q23", "tpcds_sql_q31",
    "tpcds_sql_q33", "tpcds_sql_q34", "tpcds_sql_q38",
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
