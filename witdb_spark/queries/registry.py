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
# queries. Cumulative ledger after r13: 315 of 316 then-registered queries
# ever driver-checked, ZERO latest-row failures; staleness by latest driver
# row entering r14: r7: 20, r8: 50, r9: 50, r10: 47, r11: 49, r12: 49,
# r13: 50; never-checked: hudi_cdf_stream_sink_loop (late-r13) + the three
# r14-new registrations.
# Round-14 window: positions 1-4 the never-driver-checked queries —
# hudi_cdf_stream_sink_loop (late-r13 streaming sink) and the three
# r14-new registrations (hudi_hfile_block_read: jar-free HBase HFile
# log blocks; iceberg_analyze_puffin_stats: ANALYZE -> Puffin theta
# sketches; iceberg_cherry_pick_scan: diverged-branch publish);
# 5-24 the ENTIRE remaining r7-era staleness — all 20 deferred tpcds
# texts — draining r7 to zero the way r13 drained r6; 25-34 engine-
# changed re-drives: every delta snapshot READ now plans through
# _snapshot_files_plan (distributed checkpoint planning, executor-side
# file skipping — the seven delta read/write/DV/column-mapping/
# skipping queries), iceberg scans plan manifests on executors past 8
# manifests (iceberg_pruned_scan, iceberg_mor_partitioned_dml,
# iceberg_incremental_scan); 35-50 sixteen r8-era backfills chosen for
# shape diversity (both geometry parity queries; tpcds q2/q9/q13/q17/
# q25/q28/q29/q40/q57/q64/q66/q78/q94/q97 spanning date-window CTEs,
# channel unions, multi-store joins, returns/catalog correlations).
# The 34 deferred r8 texts keep local DuckDB coverage every pytest run
# (tests/test_queries_oracle.py parameterizes the whole registry) and
# lead r15 with whatever r14 registers late. Late-r14 registrations
# (after this window froze): hudi_changes_stream_drain (the hudi
# incremental change STREAM completing the 3x3 source/sink matrix)
# and dedup_passage_boilerplate (CCNet/C4-style common-passage
# removal over documents), delta_v2_checkpoint_roundtrip (the V2
# checkpoint WRITER + bootstrap), and similarity_pq_topk (product-
# quantization ANN — the corpus-shrinking third scale path); all
# contract-emulation green at sf0.01 UTC on registration (the
# passage + PQ queries also at sf0.1); they lead r15 with the
# deferred r8 texts.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (late-r13 + r14-new)
    "hudi_cdf_stream_sink_loop",
    "hudi_hfile_block_read",
    "iceberg_analyze_puffin_stats",
    "iceberg_cherry_pick_scan",
    # r7-era staleness: ALL 20 remaining tpcds texts (drain to zero)
    "tpcds_sql_q11", "tpcds_sql_q14", "tpcds_sql_q39",
    "tpcds_sql_q44", "tpcds_sql_q46", "tpcds_sql_q49",
    "tpcds_sql_q51", "tpcds_sql_q56", "tpcds_sql_q59",
    "tpcds_sql_q60", "tpcds_sql_q65", "tpcds_sql_q67",
    "tpcds_sql_q68", "tpcds_sql_q74", "tpcds_sql_q75",
    "tpcds_sql_q77", "tpcds_sql_q87", "tpcds_sql_q89",
    "tpcds_sql_q93", "tpcds_sql_q95",
    # engine changed in r14 (distributed snapshot planning re-drives)
    "delta_log_reader_snapshot", "delta_writer_roundtrip",
    "delta_dv_roundtrip", "delta_cm_id_reader",
    "delta_cm_writer_roundtrip", "delta_skipping_scan",
    "delta_skipping_or_scan", "iceberg_pruned_scan",
    "iceberg_mor_partitioned_dml", "iceberg_incremental_scan",
    # r8-era backfill (16 of 50, shape-diverse)
    "geometry_buffer_parity", "geometry_collection_ops",
    "tpcds_sql_q2", "tpcds_sql_q9", "tpcds_sql_q13",
    "tpcds_sql_q17", "tpcds_sql_q25", "tpcds_sql_q28",
    "tpcds_sql_q29", "tpcds_sql_q40", "tpcds_sql_q57",
    "tpcds_sql_q64", "tpcds_sql_q66", "tpcds_sql_q78",
    "tpcds_sql_q94", "tpcds_sql_q97",
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
