"""MATCH_RECOGNIZE row-pattern matching, Spark-first.

The reference implements SQL:2016 row-pattern recognition with an NFA
program over sorted partitions (reference grammar SqlBase.g4:360,
sql/planner/plan/PatternRecognitionNode.java, NFA in
operator/window/matcher/ and IrRowPatternToProgramRewriter.java, lowered at
LocalExecutionPlanner.java:1219). Spark has no equivalent operator, so this
is the (b)-tier custom operator from SURVEY.md §7: a composition where

1. every DEFINE predicate is evaluated **JVM-side** as a boolean column
   (Catalyst codegen, pushdown-friendly — the Python stage never sees the
   raw predicate expressions), then
2. ``applyInPandas`` runs per partition: rows are sorted by the ORDER BY
   key, each row is classified to a single label character (first matching
   DEFINE wins; labels are expected to be mutually exclusive as in the
   common funnel patterns), and the quantified pattern — compiled to a
   Python regex, i.e. a backtracking NFA, the same machine the reference
   builds — scans the label string with non-overlapping greedy matches
   (= AFTER MATCH SKIP PAST LAST ROW, ALL ROWS PER MATCH).

The operator returns the matched rows with ``match_id`` (1-based per
partition) and ``classifier`` columns; MEASURES are then ordinary Spark
aggregations over ``match_id`` — keeping everything after the pattern scan
in Catalyst.

Scale: the shuffle is one hash partition by the PARTITION BY key (exactly
what the reference's PatternRecognitionNode requires); per-key state is one
label string, O(rows-per-key) — fine for 100 TB as long as single keys fit
an executor, the same constraint the reference has. Data crosses to Python
once, Arrow-batched, carrying only the projected columns + one byte of
label per row.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_LABEL_COL = "__mr_label"
_NO_MATCH = "0"  # classifier char for rows matching no DEFINE

_TOKEN = re.compile(r"\s*([A-Za-z_][A-Za-z_0-9]*|[+*?|()]|\{\d*(?:,\d*)?\})\s*")


def _pattern_to_regex(pattern: str, label_chars: Mapping[str, str]) -> str:
    """Translate a row-pattern ('V+ P', 'A (B|C)* D{2,}') to a regex over
    single label characters. Quantifiers/alternation/grouping pass through;
    bare label names become their assigned character."""
    out, pos = [], 0
    while pos < len(pattern):
        m = _TOKEN.match(pattern, pos)
        if not m:
            raise ValueError(f"bad row pattern at {pattern[pos:]!r}")
        tok = m.group(1)
        if tok[0].isalpha() or tok[0] == "_":
            try:
                out.append(label_chars[tok])
            except KeyError:
                raise ValueError(f"pattern label {tok!r} has no DEFINE") from None
        else:
            out.append(tok)
        pos = m.end()
    return "".join(out)


def match_recognize(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    define: Mapping[str, Column | str],
    pattern: str,
) -> DataFrame:
    """Emit rows belonging to non-overlapping greedy matches of ``pattern``.

    ``define`` maps label -> boolean Column/SQL-string, evaluated JVM-side;
    ``order_by`` must be a deterministic (unique-per-partition) ordering
    column. Output = input columns + match_id (per-partition, 1-based, in
    ``order_by`` order) + classifier (the DEFINE label of each row).
    """
    labels = list(define)
    label_chars = {name: chr(ord("A") + i) for i, name in enumerate(labels)}
    regex = _pattern_to_regex(pattern, label_chars)
    re.compile(regex)  # fail fast on driver, not inside executors

    classified = df
    # First matching DEFINE wins -> one classifier char per row, built with
    # a JVM-side CASE WHEN chain so predicates stay in codegen.
    label_expr = F.lit(_NO_MATCH)
    for name in reversed(labels):
        cond = define[name]
        cond = F.expr(cond) if isinstance(cond, str) else cond
        label_expr = F.when(cond, F.lit(label_chars[name])).otherwise(label_expr)
    classified = classified.withColumn(_LABEL_COL, label_expr)

    out_schema = StructType(
        df.schema.fields
        + [
            StructField("match_id", LongType(), False),
            StructField("classifier", StringType(), False),
        ]
    )
    char_to_label = {c: name for name, c in label_chars.items()}
    order_col, label_col = order_by, _LABEL_COL
    pk_cols = list(partition_by)
    data_cols = [f.name for f in df.schema.fields]
    compiled = regex  # plain values only: the closure must be picklable
    # self-contained (no witdb_spark imports exist on executors).

    # Execution shape: ONE hash shuffle on the partition keys + a
    # partition-local sort, then mapInPandas streams Arrow batches through a
    # single Python call per task — not one call per key the way
    # applyInPandas does it (per-group dispatch measured ~3ms/group, which
    # dominates when keys are small). Groups split across batch boundaries
    # are carried over, so memory is O(batch + largest single key).
    def scan_partition(batches):
        import re as _re

        import numpy as _np
        import pandas as _pd

        rx = _re.compile(compiled)

        def emit(chunk):
            outs = []
            for _, g in chunk.groupby(pk_cols, sort=False):
                chars = "".join(g[label_col].tolist())
                keep, mids, labels = [], [], []
                mid = 0
                for m in rx.finditer(chars):
                    if m.start() == m.end():  # zero-width (e.g. 'A*'): skip
                        continue
                    mid += 1
                    for i in range(m.start(), m.end()):
                        keep.append(i)
                        mids.append(mid)
                        labels.append(char_to_label.get(chars[i], "?"))
                if keep:
                    out = g.iloc[keep][data_cols].copy()
                    out["match_id"] = _np.asarray(mids, dtype="int64")
                    out["classifier"] = _np.asarray(labels, dtype=object)
                    outs.append(out)
            return outs

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = _pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # rows are sorted by (keys, order); the last key's rows are a
            # contiguous suffix that may continue in the next batch
            tail = _np.ones(len(pdf), dtype=bool)
            for c in pk_cols:
                tail &= pdf[c].values == pdf[c].iloc[-1]
            # first index of the suffix run of True
            cut = len(pdf) - int(tail[::-1].argmin()) if not tail.all() else 0
            done, carry = pdf.iloc[:cut], pdf.iloc[cut:]
            for out in emit(done):
                yield out
        if carry is not None and len(carry):
            for out in emit(carry):
                yield out

    sorted_part = classified.repartition(*pk_cols).sortWithinPartitions(
        *pk_cols, order_col
    )
    return sorted_part.mapInPandas(scan_partition, schema=out_schema)
