"""SQL MERGE semantics as a DataFrame operator (reference
MergeWriterOperator.java:46 + DeleteAndInsertMergeProcessor; SQL MERGE
grammar SqlBase.g4). Without a transactional table format in the container
(Delta/Iceberg), merge produces the post-merge dataset; the caller writes it
as the new snapshot (copy-on-write, which is exactly what those formats do
under the hood per touched file).

Plan shape: one full-outer shuffle join on the merge keys — the same
distribution the reference plans for MERGE (redistribution on row id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    insert_not_matched: bool = True,
    when_matched_update_cond: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    insert_cond: Column | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON <keys>
    [WHEN MATCHED AND <delete_cond> THEN DELETE]
    [WHEN MATCHED [AND <update_cond>] THEN UPDATE SET <assignments>]
    [WHEN NOT MATCHED [AND <insert_cond>] THEN INSERT
        * | (cols) VALUES (exprs)].

    Assignments may reference source columns as ``src.<col>`` via the
    aliased join (use F.col('src.x')). Target schema is preserved.

    r9 clause surface (reference core/trino-parser tree/MergeUpdate.java
    and MergeInsert.java carry a per-clause condition; MergeInsert
    carries a column list): ``when_matched_update_cond`` gates the
    UPDATE to matched rows satisfying it (first-match-wins with a
    preceding DELETE clause is preserved because the delete filter runs
    first); ``insert_values`` projects the inserted row — listed target
    columns get their expressions (evaluated over src.*), unlisted ones
    NULL; ``insert_cond`` gates the INSERT, non-matching source rows
    are simply not inserted.
    """
    # Plain equality, not eqNullSafe: SQL MERGE ON never matches NULL keys —
    # a NULL-keyed target row is kept as-is and a NULL-keyed source row
    # inserts as a separate row. Side-presence after the full-outer join is
    # read from non-nullable marker columns, never from key nullness.
    t = target.withColumn("__tgt_present", F.lit(True)).alias("tgt")
    s = source.withColumn("__src_present", F.lit(True)).alias("src")
    cond = [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in on]
    joined = t.join(s, cond, "full_outer")

    matched = (
        F.col("tgt.__tgt_present").isNotNull()
        & F.col("src.__src_present").isNotNull()
    )
    src_only = F.col("tgt.__tgt_present").isNull()

    # WHEN MATCHED THEN DELETE evaluates BEFORE the update projection (SQL
    # MERGE clause semantics: each clause's condition sees the ORIGINAL
    # matched row), and on the joined frame, so the condition may reference
    # tgt.* and src.* qualified columns.
    if when_matched_delete is not None:
        joined = joined.filter(
            ~(matched & F.coalesce(when_matched_delete, F.lit(False)))
        )

    # SQL identifiers fold case-insensitively: match SET keys to target
    # columns by lower-case, and an assignment naming NO target column is
    # an error, never a silent no-op
    updates = {
        k.lower(): v for k, v in (when_matched_update or {}).items()
    }
    known = {f.name.lower() for f in target.schema.fields}
    unknown = sorted(set(updates) - known)
    if unknown:
        raise ValueError(
            f"MERGE UPDATE SET names no target column: {unknown}"
        )
    ivals = (
        None
        if insert_values is None
        else {k.lower(): v for k, v in insert_values.items()}
    )
    if ivals is not None:
        unknown = sorted(set(ivals) - known)
        if unknown:
            raise ValueError(
                f"MERGE INSERT names no target column: {unknown}"
            )
    upd_gate = matched
    if when_matched_update_cond is not None:
        upd_gate = matched & F.coalesce(
            when_matched_update_cond, F.lit(False)
        )
    ins_gate = src_only
    if insert_cond is not None:
        ins_gate = src_only & F.coalesce(insert_cond, F.lit(False))
    out_cols = []
    for field in target.schema.fields:
        c = field.name
        tgt_c = F.col(f"tgt.{c}")
        if ivals is not None:
            src_c = ivals.get(c.lower(), F.lit(None))
        else:
            src_c = (
                F.col(f"src.{c}") if c in source.columns else F.lit(None)
            )
        val = tgt_c
        if c.lower() in updates:
            val = F.when(upd_gate, updates[c.lower()]).otherwise(tgt_c)
        if insert_not_matched:
            val = F.when(src_only, src_c).otherwise(val)
        out_cols.append(val.cast(field.dataType).alias(c))

    if not insert_not_matched:
        joined = joined.filter(~src_only)
    elif insert_cond is not None:
        # an unmatched source row failing the insert condition simply
        # does not insert (SQL MERGE: no clause applies -> no row)
        joined = joined.filter(~src_only | ins_gate)
    return joined.select(*out_cols)


def delete_where(target: DataFrame, predicate: Column) -> DataFrame:
    """DELETE FROM t WHERE p (reference TableDeleteOperator.java:33):
    anti-filter producing the new snapshot."""
    return target.filter(~F.coalesce(predicate, F.lit(False)))


def update_where(
    target: DataFrame, predicate: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE t SET ... WHERE p: conditional projection snapshot."""
    cols = []
    for field in target.schema.fields:
        c = field.name
        if c in assignments:
            cols.append(
                F.when(predicate, assignments[c])
                .otherwise(F.col(c))
                .cast(field.dataType)
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    return target.select(*cols)
