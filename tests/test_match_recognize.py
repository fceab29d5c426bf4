"""Unit semantics for operators/match_recognize.py: greedy quantifiers,
non-overlapping AFTER MATCH SKIP PAST LAST ROW, alternation, and the
pattern->regex compiler."""

from __future__ import annotations

import pytest

from witdb_spark.operators.match_recognize import _pattern_to_regex, match_recognize

CHARS = {"A": "A", "B": "B", "C": "C"}


def test_pattern_compiler():
    assert _pattern_to_regex("A+ B", CHARS) == "A+B"
    assert _pattern_to_regex("A (B|C)* A{2,3}", CHARS) == "A(B|C)*A{2,3}"
    with pytest.raises(ValueError):
        _pattern_to_regex("A Q", CHARS)


def _events(spark, rows):
    return spark.createDataFrame(
        [(1, i, ty) for i, ty in enumerate(rows)], "user_id int, seq int, ty string"
    )


def _matches(df):
    out = {}
    for r in df.orderBy("seq").collect():
        out.setdefault(r.match_id, []).append((r.seq, r.classifier))
    return list(out.values())


def test_greedy_skip_past_last_row(spark):
    # a a b a b  with pattern A+ B: match1 = [a0 a1 b2], match2 = [a3 b4]
    df = _events(spark, ["a", "a", "b", "a", "b"])
    got = _matches(
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'", "B": "ty = 'b'"}, "A+ B"
        )
    )
    assert got == [
        [(0, "A"), (1, "A"), (2, "B")],
        [(3, "A"), (4, "B")],
    ]


def test_alternation_and_unmatched_rows(spark):
    # pattern A (B|C) — x rows never participate
    df = _events(spark, ["a", "c", "x", "a", "x", "a", "b"])
    got = _matches(
        match_recognize(
            df,
            ["user_id"],
            "seq",
            {"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
            "A (B|C)",
        )
    )
    assert got == [[(0, "A"), (1, "C")], [(5, "A"), (6, "B")]]


def test_brace_quantifier(spark):
    df = _events(spark, ["e", "e", "e", "x", "e", "x", "e", "e"])
    got = _matches(
        match_recognize(df, ["user_id"], "seq", {"E": "ty = 'e'"}, "E{2,}")
    )
    assert got == [[(0, "E"), (1, "E"), (2, "E")], [(6, "E"), (7, "E")]]


def test_jaccard_prefix_candidates_complete(spark):
    """Prefix-filter theorem check: every pair with J >= t must appear in
    the candidate set (recall 100%); exactness of the final result is
    separately proven by the dedup_ngram_jaccard oracle."""
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables
    from witdb_spark.pipeline.dedup import jaccard_prefix_candidates

    docs = Tables(spark, "/root/testdata/sf0.001").documents
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    cands = {
        (r.a_id, r.b_id)
        for r in jaccard_prefix_candidates(tok, threshold=0.9).collect()
    }
    from witdb_spark.queries import QUERIES

    truth = {
        (r.a_id, r.b_id)
        for r in QUERIES["dedup_ngram_jaccard"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert truth <= cands
