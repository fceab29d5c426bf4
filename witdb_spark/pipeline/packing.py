"""Sequence packing: assemble documents into fixed token-budget training
chunks — the step between curation and the trainer's data loader.

Two public packers, matching the two packing disciplines in use:

- ``concat_chunk_pack``: GPT-style concatenate-and-split. Documents are
  laid end-to-end per source in doc_id order and the stream is cut every
  ``budget`` tokens, ignoring document boundaries (a document may straddle
  chunks). Pure window + integer arithmetic — no UDFs, fully
  whole-stage-codegen, and exactly expressible in portable SQL, so the
  DuckDB oracle replays it verbatim.
- ``greedy_nextfit_pack``: boundary-preserving next-fit bin packing. A
  document never splits; a bin closes when the next document does not fit.
  Inherently a sequential scan per source, so it runs as one Arrow-batched
  ``applyInPandas`` pass per source group (parallel ACROSS sources — the
  packing unit — sequential within, which is the algorithm's own data
  dependency, not an implementation shortcut). The oracle spells the same
  recurrence as a recursive CTE.

Token counts come from ``text.bpe_ish_token_estimate`` (chars/4 + word
count), the repo's deterministic tokenizer-budget proxy.

Scale shape: both packers shuffle once on the packing partition column
(window / groupBy on ``source``); chunk aggregation is a second partial-agg
shuffle on (source, chunk). Skew note: one giant source serializes into one
task — at 100 TB choose a finer packing unit (e.g. source + date) the same
way a real pipeline shards its corpus.

No reference counterpart (the reference is a SQL engine); packing is part
of the north-star LLM-pipeline tier (BASELINE.json).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from witdb_spark.pipeline.text import bpe_ish_token_estimate

DEFAULT_BUDGET = 256


def _with_offsets(
    df: DataFrame, part_col: str, id_col: str, text_col: str
) -> DataFrame:
    """(part, id, tok, start_off, end_off) — running token offsets of each
    document within its source's concatenated stream (end exclusive)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            part_col,
            id_col,
            bpe_ish_token_estimate(F.col(text_col)).alias("tok"),
        )
        .withColumn("end_off", F.sum("tok").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("tok"))
    )


def concat_chunk_pack(
    df: DataFrame,
    budget: int = DEFAULT_BUDGET,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-and-split packing: per (source, chunk) — how many
    documents touch the chunk, its first/last document, and its fill (the
    last chunk of a source is usually short). ``div`` keeps the chunk
    arithmetic in exact integers (no double rounding at any corpus size);
    a document spanning k chunks explodes into k rows (k ≤
    ceil(doc_tokens/budget) + 1, map-side, no shuffle amplification)."""
    b = F.lit(int(budget)).cast("bigint")
    off = _with_offsets(df, part_col, id_col, text_col)
    spans = off.select(
        part_col,
        id_col,
        "tok",
        "start_off",
        "end_off",
        F.explode(
            F.sequence(
                F.expr("start_off div " + str(int(budget))),
                F.expr(f"(end_off - 1) div {int(budget)}"),
            )
        ).alias("chunk_id"),
    )
    return spans.groupBy(part_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.sum(
            F.least(F.col("end_off"), (F.col("chunk_id") + 1) * b)
            - F.greatest(F.col("start_off"), F.col("chunk_id") * b)
        ).alias("fill_tokens"),
    )


def greedy_nextfit_pack(
    df: DataFrame,
    budget: int = DEFAULT_BUDGET,
    part_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit boundary-preserving packing: per document its assigned
    ``bin_id`` (1-based per source) and ``bin_offset`` (token offset inside
    the bin). Recurrence over docs in id order: a bin closes when
    ``used + tok > budget``; an oversized document still gets a bin of its
    own (the first document of a bin is always placed). Sequential per
    source by nature; Arrow-batched per-group pandas scan."""
    bud = int(budget)
    toks = df.select(
        part_col, id_col, bpe_ish_token_estimate(F.col(text_col)).alias("tok")
    )
    schema = StructType.fromDDL(
        f"{part_col} string, {id_col} bigint, tok bigint,"
        " bin_id bigint, bin_offset bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, offs = [], []
        bin_id, used = 0, None
        for tok in pdf["tok"].tolist():
            if used is None or used + tok > bud:
                bin_id += 1
                used = 0
            bins.append(bin_id)
            offs.append(used)
            used += tok
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_offset"] = pd.Series(offs, dtype="int64")
        return pdf[[part_col, id_col, "tok", "bin_id", "bin_offset"]]

    return toks.groupBy(part_col).applyInPandas(pack, schema)
