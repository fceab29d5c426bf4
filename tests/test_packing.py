"""Invariant tests for the sequence packers (pipeline/packing.py) beyond
the oracle hash-match: budget respect, completeness, offset consistency,
and non-degeneracy of the Gopher keep flag."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from witdb_spark.catalog import Tables
from witdb_spark.pipeline.packing import (
    concat_chunk_pack,
    greedy_nextfit_pack,
)
from witdb_spark.pipeline.text import gopher_quality_flags

BUDGET = 256


def test_nextfit_invariants(spark):
    docs = Tables(spark, SF_DIR).documents
    packed = greedy_nextfit_pack(docs, budget=BUDGET).toPandas()
    # every document assigned exactly once
    assert len(packed) == docs.count()
    assert packed["doc_id"].is_unique
    for (_, _), grp in packed.groupby(["source", "bin_id"]):
        used = int(grp["tok"].sum())
        # a bin exceeds the budget only as a single oversized document
        assert used <= BUDGET or len(grp) == 1
        # offsets are the prefix sums of tok in doc_id order
        g = grp.sort_values("doc_id")
        assert (
            g["bin_offset"].tolist()
            == [0] + g["tok"].cumsum().tolist()[:-1]
        )
    for _, grp in packed.groupby("source"):
        bins = sorted(grp["bin_id"].unique().tolist())
        assert bins == list(range(1, len(bins) + 1))  # dense, 1-based


def test_concat_chunk_invariants(spark):
    docs = Tables(spark, SF_DIR).documents
    chunks = concat_chunk_pack(docs, budget=BUDGET).toPandas()
    tot = (
        docs.select(
            ((F.length("text") / 4).cast("bigint")
             + F.size(F.split(F.col("text"), " "))).alias("tok"),
            "source",
        )
        .groupBy("source")
        .agg(F.sum("tok").alias("t"))
        .toPandas()
        .set_index("source")["t"]
    )
    for src, grp in chunks.groupby("source"):
        ids = sorted(grp["chunk_id"].tolist())
        assert ids == list(range(len(ids)))  # contiguous from 0
        # all chunks full except possibly the last; fills sum to the total
        g = grp.sort_values("chunk_id")
        assert (g["fill_tokens"].iloc[:-1] == BUDGET).all()
        assert int(g["fill_tokens"].sum()) == int(tot[src])


def test_gopher_flag_nondegenerate(spark):
    flags = gopher_quality_flags(Tables(spark, SF_DIR).documents).toPandas()
    kept = int(flags["keep"].sum())
    assert 0 < kept < len(flags)
