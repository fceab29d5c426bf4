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
# Round-8 window: r8 registered 78 new/changed queries (TPC-DS
# tranches 4-7 complete the 99-text suite; geometry_collection_ops and
# the re-oracled geometry_buffer_parity; late-r8: the weighted
# qdigest/tdigest builds, generic merge(), the TABLE() PTF spelling,
# the three jar-free lakehouse readers, and the DISTINCT sketch fold)
# — more than the 50 slots, so the window is ALL new/changed:
# tranches 4-6 (40), the two geometry entries, and 8 of tranche 7
# (q3 q7 q8 q10 q13 q15 q18 + the q16-twin q94). Round 9's head, in
# order: the late-r8 queries (below the boundary — the lakehouse
# paths, weighted digests, DISTINCT fold, PTF spelling, and the five
# late LLM-pipeline ops: Gopher rules, bigram-LM scoring, the two
# sequence packers, temperature mixing), then the
# remaining 20 tranche-7 texts (q19 q21 q24 q35 q52 q54 q63 q69 q71
# q72 q73 q79 q80 q82 q83 q84 q85 q86 q91 q92), then the 44 r3-era
# greens, then the r4-era 50. Everything keeps local DuckDB coverage
# every pytest run (tests/test_queries_oracle.py parameterizes the
# whole registry), and each late-r8 query was additionally
# hash-verified via the driver-contract emulation before commit.
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
    # r8-new: TPC-DS tranche 7, first 8 (window positions 43-50)
    "tpcds_sql_q3", "tpcds_sql_q7", "tpcds_sql_q8", "tpcds_sql_q10",
    "tpcds_sql_q13", "tpcds_sql_q15", "tpcds_sql_q18", "tpcds_sql_q94",
    # --- window boundary: everything below leads round 9 ---
    # (r8-new: weighted qdigest build — registered after the window
    # filled; hash-verified via the contract emulation in r8)
    "agg_qdigest_weighted",
    # (r8-new: weighted t-digest build — same treatment)
    "agg_tdigest_weighted",
    # (r8-new: type-overloaded merge(sketch) resolved at transpile time)
    "agg_merge_generic",
    # (r8-new: TABLE(sequence/exclude_columns) SQL spelling)
    "ptf_sql_table_spelling",
    # (r8-new: no-jar Delta transaction-log read path)
    "delta_log_reader_snapshot",
    # (r8-new: no-jar Iceberg metadata-chain read path)
    "iceberg_meta_reader_snapshot",
    # (r8-new: DISTINCT sketch builds via dedup-first rewrite)
    "agg_qdigest_distinct",
    # (r8-new: no-jar Hudi COW timeline read path)
    "hudi_timeline_reader_snapshot",
    # (r8-new: no-jar Delta write path — create/COW-delete/append)
    "delta_writer_roundtrip",
    # (r8-new, late: LLM-pipeline tier growth — Gopher quality rules,
    # bigram-LM perplexity proxy, both sequence packers, temperature
    # mixing; hash-verified via the contract emulation in r8)
    "text_gopher_quality",
    "text_bigram_logprob",
    "pipeline_pack_concat",
    "pipeline_pack_nextfit",
    "curation_temperature_mix",
    # (r8-new, late: jar-free Iceberg + Hudi COW DELETE/UPDATE, and
    # MERGE INTO across all three formats)
    "iceberg_dml_roundtrip",
    "hudi_dml_roundtrip",
    "lakehouse_merge_roundtrip",
    "tpcds_sql_q19", "tpcds_sql_q21", "tpcds_sql_q24", "tpcds_sql_q35",
    "tpcds_sql_q52", "tpcds_sql_q54", "tpcds_sql_q63", "tpcds_sql_q69",
    "tpcds_sql_q71", "tpcds_sql_q72", "tpcds_sql_q73", "tpcds_sql_q79",
    "tpcds_sql_q80", "tpcds_sql_q82", "tpcds_sql_q83", "tpcds_sql_q84",
    "tpcds_sql_q85", "tpcds_sql_q86", "tpcds_sql_q91", "tpcds_sql_q92",
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
