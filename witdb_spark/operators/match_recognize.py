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
    data_cols = [f.name for f in df.schema.fields]
    compiled = regex  # plain strings only: the closure must be picklable
    # self-contained (no witdb_spark imports exist on executors).

    def scan(pdf):
        import re as _re

        import numpy as _np

        pdf = pdf.sort_values(order_col, ignore_index=True)
        chars = "".join(pdf[label_col].tolist())
        keep_idx, match_ids, classifiers = [], [], []
        mid = 0
        for m in _re.finditer(compiled, chars):
            if m.start() == m.end():  # zero-width match (e.g. 'A*'): skip
                continue
            mid += 1
            for i in range(m.start(), m.end()):
                keep_idx.append(i)
                match_ids.append(mid)
                classifiers.append(char_to_label.get(chars[i], "?"))
        out = pdf.iloc[keep_idx][data_cols].copy()
        out["match_id"] = _np.asarray(match_ids, dtype="int64")
        out["classifier"] = _np.asarray(classifiers, dtype=object)
        return out

    return classified.groupBy(*partition_by).applyInPandas(scan, schema=out_schema)
