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
    # undefined variable = implicit TRUE = matches any row
    assert _pattern_to_regex("A Q", CHARS) == "A."


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


def test_prev_navigation(spark):
    """B AS v < PREV(v) — the canonical descending-run pattern the r1/r2
    operator could not express (reference LogicalIndexNavigation)."""
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([10, 8, 6, 7, 5, 4, 3, 9])],
        "user_id int, seq int, v int",
    )
    got = _matches(
        match_recognize(
            df, ["user_id"], "seq", {"D": "v < PREV(v)"}, "D{2,}"
        )
    )
    # descents: 8,6 (seq 1-2) and 5,4,3 (seq 4-6)
    assert got == [
        [(1, "D"), (2, "D")],
        [(4, "D"), (5, "D"), (6, "D")],
    ]


def test_next_navigation(spark):
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([1, 5, 2, 9, 3])],
        "user_id int, seq int, v int",
    )
    # P AS v < NEXT(v): rows followed by a larger value
    got = _matches(
        match_recognize(df, ["user_id"], "seq", {"P": "v < NEXT(v)"}, "P")
    )
    assert [m[0][0] for m in got] == [0, 2]  # seq 0 (1<5), seq 2 (2<9)


def test_overlapping_defines_classified_by_pattern(spark):
    """U and H overlap on strictly-up rows (> implies >=); the VM must
    classify by pattern position, not first-DEFINE-wins."""
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([3, 4, 4, 5, 2])],
        "user_id int, seq int, v int",
    )
    got = _matches(
        match_recognize(
            df,
            ["user_id"],
            "seq",
            {"U": "v > PREV(v)", "H": "v >= PREV(v)"},
            "U H+",
        )
    )
    # seq1 (4>3) starts as U; seq2 (4>=4) and seq3 (5>4, satisfies BOTH)
    # continue as H — first-match-wins would have mislabeled seq3 as U
    assert got == [[(1, "U"), (2, "H"), (3, "H")]]


def test_undefined_label_is_true(spark):
    """S undefined in DEFINE -> implicit TRUE (SqlBase.g4 row pattern:
    undefined variables match every row)."""
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([9, 5, 3, 6, 8])],
        "user_id int, seq int, v int",
    )
    got = _matches(
        match_recognize(
            df,
            ["user_id"],
            "seq",
            {"D": "v < PREV(v)", "U": "v > PREV(v)"},
            "S D+ U+",
        )
    )
    # V-shape: S=seq0 (any row), D=seq1,2 (5,3), U=seq3,4 (6,8)
    assert got == [
        [(0, "S"), (1, "D"), (2, "D"), (3, "U"), (4, "U")]
    ]


def test_skip_to_next_row_overlaps(spark):
    df = _events(spark, ["a", "a", "a", "b"])
    got = _matches(
        match_recognize(
            df,
            ["user_id"],
            "seq",
            {"A": "ty = 'a'"},
            "A{2}",
            after_match="to next row",
        )
    )
    # overlapping pairs (0,1) and (1,2) — skip-past would give only (0,1)
    assert got == [[(0, "A"), (1, "A")], [(1, "A"), (2, "A")]]


def test_one_row_per_match_emits_last_row(spark):
    df = _events(spark, ["a", "a", "b", "x", "a", "b"])
    out = match_recognize(
        df,
        ["user_id"],
        "seq",
        {"A": "ty = 'a'", "B": "ty = 'b'"},
        "A+ B",
        rows_per_match="one",
    )
    rows = sorted((r.seq, r.match_id, r.classifier) for r in out.collect())
    assert rows == [(2, 1, "B"), (5, 2, "B")]


def test_anchors(spark):
    df = _events(spark, ["a", "b", "a"])
    got = _matches(
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'"}, "^ A"
        )
    )
    assert got == [[(0, "A")]]


def test_long_greedy_run_no_recursion_blowup(spark):
    """5000-row single-key greedy run through the VM path (overlapping
    defines force it off the C-regex fast path) — must not hit Python
    recursion limits."""
    df = spark.createDataFrame(
        [(1, i, 1) for i in range(5000)], "user_id int, seq int, v int"
    )
    out = match_recognize(
        df,
        ["user_id"],
        "seq",
        {"E": "v = 1", "F": "v >= 1"},
        "E F+",
    )
    assert out.count() == 5000


def test_nullable_unbounded_quantifier_rejected(spark):
    df = _events(spark, ["a"])
    with pytest.raises(ValueError):
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'"}, "(A*)*"
        )


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


@pytest.fixture(scope="module")
def engine(spark):
    from witdb_spark.engine import Engine

    return Engine(spark)


def test_sql_form_one_row(engine, spark):
    # reference SqlBase.g4:360 — SQL clause lowered onto the operator
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 1.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("mr_sql_t")
    rows = engine.sql(
        """
        SELECT k, start_seq, end_seq, n_down
        FROM mr_sql_t MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES FIRST(seq) AS start_seq, LAST(seq) AS end_seq,
                   count(*) AS n_down
          ONE ROW PER MATCH
          PATTERN (D{2} U)
          DEFINE D AS price < PREV(price), U AS price > PREV(price)
        )
        """
    ).collect()
    assert [(r.k, r.start_seq, r.end_seq, r.n_down) for r in rows] == [
        (1, 2, 4, 3)
    ]


def test_sql_form_all_rows_running(engine, spark):
    spark.createDataFrame(
        [(1, i, "e") for i in range(1, 4)], "k int, seq int, t string"
    ).createOrReplaceTempView("mr_sql_t2")
    rows = engine.sql(
        """
        SELECT seq, rn, tot FROM mr_sql_t2 MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES count(*) AS rn, FINAL count(*) AS tot
          ALL ROWS PER MATCH
          PATTERN (E+) DEFINE E AS t = 'e'
        ) ORDER BY seq
        """
    ).collect()
    assert [(r.seq, r.rn, r.tot) for r in rows] == [
        (1, 1, 3), (2, 2, 3), (3, 3, 3)
    ]


def test_sql_form_unsupported(engine, spark):
    import pytest

    from witdb_spark.plans.dialect import UnsupportedTrinoSyntax

    spark.range(1).createOrReplaceTempView("mr_sql_t3")
    # SUBSET members must be pattern variables
    with pytest.raises(UnsupportedTrinoSyntax):
        engine.sql(
            "SELECT * FROM mr_sql_t3 MATCH_RECOGNIZE ("
            "PARTITION BY id ORDER BY id "
            "MEASURES count(*) AS n ONE ROW PER MATCH "
            "PATTERN (A B) SUBSET S = (A, Z) "
            "DEFINE A AS id > 0, B AS id > 0)"
        )


def test_reluctant_quantifier(spark):
    """A+? B stops at the FIRST b (greedy A+ B would too here, so use a
    case where they differ): with rows a a b b, A+ B? greedy eats b2;
    A+ B?? prefers zero Bs."""
    df = _events(spark, ["a", "a", "b", "b"])
    greedy = _matches(
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'", "B": "ty = 'b'"}, "A+ B?"
        )
    )
    assert greedy == [[(0, "A"), (1, "A"), (2, "B")]]
    reluctant = _matches(
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'", "B": "ty = 'b'"}, "A+ B??"
        )
    )
    assert reluctant == [[(0, "A"), (1, "A")]]
    # reluctant star consumes as little as possible before the anchor label
    rel_star = _matches(
        match_recognize(
            df, ["user_id"], "seq",
            {"X": "ty IN ('a','b')", "B": "ty = 'b'"}, "X*? B"
        )
    )
    assert rel_star[0] == [(0, "X"), (1, "X"), (2, "B")]
    assert rel_star[1] == [(3, "B")]


def test_permute(spark):
    """PERMUTE(A, B, C) matches the three labels in any order, preferring
    the listed order (reference SqlBase.g4 patternPermutation)."""
    df = _events(spark, ["c", "a", "b", "x", "b", "a", "c"])
    got = _matches(
        match_recognize(
            df, ["user_id"], "seq",
            {"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
            "PERMUTE(A, B, C)",
        )
    )
    assert got == [
        [(0, "C"), (1, "A"), (2, "B")],
        [(4, "B"), (5, "A"), (6, "C")],
    ]
    with pytest.raises(ValueError):
        match_recognize(
            df, ["user_id"], "seq", {"A": "ty = 'a'"},
            "PERMUTE(A, A, A, A, A, A, A)",
        )


def test_exclusion_span(spark):
    """A {- B+ -} C: the b-rows participate in matching but are excluded
    from ALL ROWS output; ONE ROW PER MATCH is unaffected."""
    df = _events(spark, ["a", "b", "b", "c", "a", "c"])
    defs = {"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"}
    got = _matches(
        match_recognize(df, ["user_id"], "seq", defs, "A {- B+ -} C")
    )
    assert got == [[(0, "A"), (3, "C")]]
    # without exclusion the same pattern emits the b rows
    full = _matches(match_recognize(df, ["user_id"], "seq", defs, "A B+ C"))
    assert full == [[(0, "A"), (1, "B"), (2, "B"), (3, "C")]]
    one = match_recognize(
        df, ["user_id"], "seq", defs, "A {- B+ -} C", rows_per_match="one"
    ).collect()
    assert len(one) == 1 and one[0].classifier == "C" and one[0].seq == 3


def test_no_partition_by_is_one_sequence(spark):
    """r4 review fix: MATCH_RECOGNIZE without PARTITION BY must treat the
    whole input as ONE ordered sequence (not round-robin fragments)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["a", "a", "b", "x", "a", "b"])],
        "seq int, ty string",
    ).repartition(4)
    got = match_recognize(
        df, [], "seq", {"A": "ty = 'a'", "B": "ty = 'b'"}, "A+ B"
    )
    rows = sorted((r.seq, r.match_id) for r in got.collect())
    assert rows == [(0, 1), (1, 1), (2, 1), (4, 2), (5, 2)]
    assert "__mr_global" not in got.columns


def test_null_partition_keys_form_one_group(spark):
    """r4 review fix: NULL partition keys are ONE group (SQL semantics);
    NaN != NaN used to split the run into single-row groups."""
    rows = [(None, 0, "a"), (None, 1, "b"), (7, 0, "a"), (7, 1, "b")]
    df = spark.createDataFrame(rows, "user_id int, seq int, ty string")
    got = match_recognize(
        df, ["user_id"], "seq", {"A": "ty = 'a'", "B": "ty = 'b'"}, "A B"
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.user_id, []).append(r.seq)
    assert sorted(by_key.get(None, [])) == [0, 1]  # NULL group matched
    assert sorted(by_key.get(7, [])) == [0, 1]


def test_measure_mixing_bare_ref_and_navigation(engine, spark):
    """r4 review fix: MEASURES price - FIRST(price) must evaluate the bare
    reference on the LAST match row (FINAL semantics), not fail as an
    ungrouped column."""
    spark.createDataFrame(
        [(1, i, v) for i, v in enumerate([10, 12, 15, 9])],
        "g int, seq int, price int",
    ).createOrReplaceTempView("mr_mix_t")
    rows = engine.sql(
        """
        SELECT delta FROM mr_mix_t MATCH_RECOGNIZE (
          PARTITION BY g ORDER BY seq
          MEASURES price - FIRST(price) AS delta
          ONE ROW PER MATCH
          PATTERN (U U)
          DEFINE U AS price > PREV(price)
        )
        """
    ).collect()
    assert [r.delta for r in rows] == [3]  # last (15) - first (12)


def test_sql_form_exclusion_one_row(engine, spark):
    """r4: SQL-form exclusions with ONE ROW PER MATCH — measures see the
    excluded rows (SQL:2016), the output row count is unaffected."""
    spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(["a", "b", "b", "c", "a", "c"])],
        "g int, seq int, ty string",
    ).createOrReplaceTempView("mr_excl_t")
    rows = engine.sql(
        """
        SELECT n_rows, n_b FROM mr_excl_t MATCH_RECOGNIZE (
          PARTITION BY g ORDER BY seq
          MEASURES count(*) AS n_rows, count(B.*) AS n_b
          ONE ROW PER MATCH
          PATTERN (A {- B+ -} C)
          DEFINE A AS ty = 'a', B AS ty = 'b', C AS ty = 'c'
        )
        """
    ).collect()
    assert [(r.n_rows, r.n_b) for r in rows] == [(4, 2)]
    # since r4 exclusions also work under ALL ROWS PER MATCH: flagged
    # rows feed the measures but are dropped from the output
    out = engine.sql(
        """
        SELECT seq, n FROM mr_excl_t MATCH_RECOGNIZE (
          PARTITION BY g ORDER BY seq
          MEASURES FINAL count(*) AS n
          ALL ROWS PER MATCH
          PATTERN (A {- B+ -} C)
          DEFINE A AS ty = 'a', B AS ty = 'b', C AS ty = 'c'
        ) ORDER BY seq
        """
    ).collect()
    assert [tuple(r) for r in out] == [(0, 4), (3, 4)]


def test_prev_next_in_measures(spark):
    """PREV/NEXT navigation inside MEASURES (reference
    LogicalIndexNavigation): physical partition offsets from FIRST/LAST
    anchors, label-qualified anchors, literal offsets, NULL outside the
    partition."""
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    rows = [(1, i, v) for i, v in enumerate([10, 11, 12, 9, 8, 13, 14, 15, 7])]
    spark.createDataFrame(rows, ["k", "ts", "price"]).createOrReplaceTempView(
        "nav_quotes"
    )
    out = eng.sql(
        """
        SELECT start_p, end_p, before_start, after_end, prev2, prev_first_b
        FROM nav_quotes MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES FIRST(price) AS start_p,
                   LAST(price) AS end_p,
                   PREV(FIRST(price)) AS before_start,
                   NEXT(LAST(price)) AS after_end,
                   PREV(LAST(price), 2) AS prev2,
                   PREV(FIRST(B.price)) AS prev_first_b
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE B AS price > PREV(price)
        ) ORDER BY start_p
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        (8, 15, 9, 7, 13, 8),
        (10, 12, None, 9, 10, 10),
    ]
    # label-qualified anchors under ALL ROWS resolve the RUNNING member
    # anchor per output row (r5): every row here is B, so the running
    # LAST(B) is the current row and NEXT steps one row forward
    out2 = eng.sql(
        """
        SELECT ts, pp FROM nav_quotes MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES NEXT(LAST(B.price)) AS pp
          ALL ROWS PER MATCH
          PATTERN (B+) DEFINE B AS price > PREV(price))
        ORDER BY ts
        """
    ).collect()
    # ascending runs: ts1-2 (11,12) and ts5-7 (13,14,15)
    assert [(r.ts, r.pp) for r in out2] == [
        (1, 12), (2, 9), (5, 14), (6, 15), (7, 7)
    ]


def test_all_rows_label_measures_and_exclusions(spark):
    """r4: label-qualified measures under ALL ROWS PER MATCH lower to
    membership-guarded windows (running count/sum/last), and {- -}
    exclusions drop flagged rows from the output AFTER measures see
    them (SQL:2016)."""
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    rows = [
        (1, 1, "view", 10.0),
        (1, 2, "view", 20.0),
        (1, 3, "click", 5.0),
        (1, 4, "purchase", 100.0),
    ]
    spark.createDataFrame(rows, ["u", "ts", "et", "v"]).createOrReplaceTempView(
        "mr_allrows_ev"
    )
    out = eng.sql(
        """
        SELECT ts, n_views, v_sum, last_v, cls
        FROM mr_allrows_ev MATCH_RECOGNIZE (
          PARTITION BY u ORDER BY ts
          MEASURES count(V.*) AS n_views, sum(V.v) AS v_sum,
                   LAST(V.v) AS last_v, CLASSIFIER() AS cls
          ALL ROWS PER MATCH
          PATTERN (V+ C* P)
          DEFINE V AS et = 'view', C AS et = 'click', P AS et = 'purchase'
        ) ORDER BY ts
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        (1, 1, 10.0, 10.0, "V"),
        (2, 2, 30.0, 20.0, "V"),
        (3, 2, 30.0, 20.0, "C"),
        (4, 2, 30.0, 20.0, "P"),
    ]
    out2 = eng.sql(
        """
        SELECT ts, n
        FROM mr_allrows_ev MATCH_RECOGNIZE (
          PARTITION BY u ORDER BY ts
          MEASURES FINAL count(*) AS n
          ALL ROWS PER MATCH
          PATTERN (V+ {- C* -} P)
          DEFINE V AS et = 'view', C AS et = 'click', P AS et = 'purchase'
        ) ORDER BY ts
        """
    ).collect()
    # click row excluded from OUTPUT, still inside the FINAL count
    assert [tuple(r) for r in out2] == [(1, 4), (2, 4), (4, 4)]


def test_prev_next_all_rows(spark):
    """r4: PREV/NEXT measures under ALL ROWS PER MATCH — running
    physical navigation (source-level lag/lead carried through the
    operator), FIRST-anchored forms constant per match."""
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    rows = [(1, i, v) for i, v in enumerate([10.0, 11.0, 12.0, 9.0, 8.0, 13.0])]
    spark.createDataFrame(rows, ["k", "ts", "price"]).createOrReplaceTempView(
        "nav_all_rows"
    )
    out = eng.sql(
        """
        SELECT ts, pp, nn, pf
        FROM nav_all_rows MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY ts
          MEASURES PREV(price) AS pp, NEXT(price) AS nn,
                   PREV(FIRST(price)) AS pf
          ALL ROWS PER MATCH
          PATTERN (A B+)
          DEFINE B AS price > PREV(price)
        ) ORDER BY ts
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        (0, None, 11.0, None),
        (1, 10.0, 12.0, None),
        (2, 11.0, 9.0, None),
        (4, 9.0, 13.0, 9.0),
        (5, 8.0, None, 9.0),
    ]


def test_all_rows_null_value_navigation_and_struct_fields(spark):
    """r4 review fixes: LAST(V.v) navigates by POSITION (a member row
    whose value is NULL is still the navigated row — struct-wrap before
    ignoreNulls); FINAL LAST(V.v) uses the whole-match frame; dotted
    refs whose prefix is NOT a pattern variable (struct fields) lower
    through lag/lead under ALL ROWS."""
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    rows = [(1, 1, "view", 10.0), (1, 2, "view", None), (1, 3, "purchase", 100.0)]
    spark.createDataFrame(
        rows, "u int, ts int, et string, v double"
    ).createOrReplaceTempView("mr_nullv")
    out = eng.sql(
        """
        SELECT ts, lv, flv FROM mr_nullv MATCH_RECOGNIZE (
          PARTITION BY u ORDER BY ts
          MEASURES LAST(V.v) AS lv, FINAL LAST(V.v) AS flv
          ALL ROWS PER MATCH
          PATTERN (V+ P)
          DEFINE V AS et = 'view', P AS et = 'purchase')
        ORDER BY ts
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        (1, 10.0, None),
        (2, None, None),
        (3, None, None),
    ]
    spark.sql(
        "SELECT 1 AS u, 1 AS ts, named_struct('city', 'x') AS addr"
        " UNION ALL SELECT 1, 2, named_struct('city', 'y')"
    ).createOrReplaceTempView("mr_structnav")
    out2 = eng.sql(
        """
        SELECT ts, pc FROM mr_structnav MATCH_RECOGNIZE (
          PARTITION BY u ORDER BY ts
          MEASURES PREV(addr.city) AS pc
          ALL ROWS PER MATCH
          PATTERN (A+) DEFINE A AS ts > 0) ORDER BY ts
        """
    ).collect()
    assert [tuple(r) for r in out2] == [(1, None), (2, "x")]


def test_nav_inside_aggregate_one_row(engine, spark):
    """SQL:2016: a bare PREV/NEXT inside an aggregate argument under ONE
    ROW PER MATCH navigates PER ROW (each match row steps from itself),
    not once per match. avg(price - PREV(price)) over match rows 2..4 of
    (10, 8, 6, 9) = avg(8-10, 6-8, 9-6) ... the first matched row's PREV
    reads the row BEFORE the match (physical navigation)."""
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("mr_navagg")
    rows = engine.sql(
        """
        SELECT k, avg_step, n FROM mr_navagg MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES avg(price - PREV(price)) AS avg_step, count(*) AS n
          ONE ROW PER MATCH
          PATTERN (D{2} U)
          DEFINE D AS price < PREV(price), U AS price > PREV(price)
        )
        """
    ).collect()
    # match = seq 2,3,4; per-row steps: (8-10)=-2, (6-8)=-2, (9-6)=3
    assert [(r.k, r.avg_step, r.n) for r in rows] == [
        (1, (-2.0 - 2.0 + 3.0) / 3.0, 3)
    ]
    # explicit-anchor nav inside an aggregate stays a per-match constant:
    # sum(price - PREV(LAST(price))) = sum over rows of price - price@(last-1)
    rows2 = engine.sql(
        """
        SELECT k, s FROM mr_navagg MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES sum(price - PREV(LAST(price))) AS s
          ONE ROW PER MATCH
          PATTERN (D{2} U)
          DEFINE D AS price < PREV(price), U AS price > PREV(price)
        )
        """
    ).collect()
    # anchor LAST = seq4, PREV -> seq3 price 6.0; sum((8-6)+(6-6)+(9-6))=5
    assert [(r.k, r.s) for r in rows2] == [(1, 5.0)]


def test_final_first_last_unqualified_all_rows(engine, spark):
    """FINAL FIRST/LAST without a label under ALL ROWS PER MATCH: the
    whole-match frame (the docstring always claimed it; r5 makes the
    generic pass actually strip the FINAL keyword)."""
    spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 7.0), (1, 3, 9.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("mr_finalnav")
    rows = engine.sql(
        """
        SELECT seq, ff, fl, rl FROM mr_finalnav MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FINAL FIRST(price) AS ff, FINAL LAST(price) AS fl,
                   LAST(price) AS rl
          ALL ROWS PER MATCH
          PATTERN (A+) DEFINE A AS price > 0
        ) ORDER BY seq
        """
    ).collect()
    assert [(r.seq, r.ff, r.fl, r.rl) for r in rows] == [
        (1, 5.0, 9.0, 5.0), (2, 5.0, 9.0, 7.0), (3, 5.0, 9.0, 9.0)
    ]


def test_label_qualified_nav_in_aggregate(engine, spark):
    """r6: label-qualified PREV inside an aggregate under ONE ROW PER
    MATCH evaluates per aggregated row with the RUNNING last member row
    as the anchor (reference LogicalIndexNavigation.java). Pattern
    (V V C) over prices 10, 20, 35 (preceded by row 5 outside the
    match): V1 anchors itself -> prev = 5; V2 anchors itself -> prev =
    10; C anchors V2 -> prev(V2) = 10. sum(price - PREV(V.price)) =
    (10-5) + (20-10) + (35-10) = 40. A per-match-constant FINAL reading
    (every row anchored at the last V) would give 65 instead."""
    spark.createDataFrame(
        [(1, 0, 5.0, "x"), (1, 1, 10.0, "v"), (1, 2, 20.0, "v"),
         (1, 3, 35.0, "c")],
        "k int, seq int, price double, t string",
    ).createOrReplaceTempView("mr_navagg_run")
    rows = engine.sql(
        """
        SELECT s FROM mr_navagg_run MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES sum(price - PREV(V.price)) AS s
          ONE ROW PER MATCH
          PATTERN (V V C)
          DEFINE V AS t = 'v', C AS t = 'c'
        )
        """
    ).collect()
    assert [r.s for r in rows] == [40.0]


def test_label_qualified_nav_all_rows(engine, spark):
    """r5: label-qualified PREV/NEXT anchors under ALL ROWS PER MATCH
    (reference LogicalIndexNavigation): the anchor is the RUNNING
    first/last row classified with the label; PREV/NEXT then step
    physically over the partition from that anchor."""
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("mr_labnav")
    rows = engine.sql(
        """
        SELECT seq, pb, plb, pfb FROM mr_labnav MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES PREV(B.price) AS pb,
                   PREV(LAST(B.price)) AS plb,
                   PREV(FIRST(B.price)) AS pfb
          ALL ROWS PER MATCH
          PATTERN (A B B)
          DEFINE A AS price = 10, B AS price > 10
        ) ORDER BY seq
        """
    ).collect()
    # row1 (A): no B seen yet -> all NULL
    # row2 (B1): last B = row2 -> PREV = row1 (10); first B = row2 -> 10
    # row3 (B2): last B = row3 -> PREV = row2 (20); first B still row2 -> 10
    assert [(r.seq, r.pb, r.plb, r.pfb) for r in rows] == [
        (1, None, None, None),
        (2, 10.0, 10.0, 10.0),
        (3, 20.0, 20.0, 10.0),
    ]


def test_pattern_window_basic(engine, spark):
    """r5: row-pattern recognition in WINDOW structures (reference
    SqlBase.g4 windowFrame MEASURES/PATTERN/DEFINE): every non-skipped
    row is an INITIAL match attempt; starting rows read FINAL measures,
    skipped/failed rows read NULL."""
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0),
         (1, 5, 11.0), (1, 6, 7.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("pw_t")
    rows = engine.sql(
        """
        SELECT seq, lo OVER w AS lowest, lbl OVER w AS last_label
        FROM pw_t
        WINDOW w AS (
          PARTITION BY k ORDER BY seq
          MEASURES min(price) AS lo, CLASSIFIER() AS lbl
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+ U+)
          DEFINE D AS price < PREV(price), U AS price > PREV(price)
        )
        ORDER BY seq
        """
    ).collect()
    # only seq2 starts a match (D: 8<10, 6<8; U: 9>6, 11>9); rows 3-5
    # are skipped over, seq1 fails D (NULL PREV), seq6 has no U row
    assert [(r.seq, r.lowest, r.last_label) for r in rows] == [
        (1, None, None), (2, 6.0, "U"), (3, None, None),
        (4, None, None), (5, None, None), (6, None, None),
    ]


def test_pattern_window_rejections(engine, spark):
    import pytest

    from witdb_spark.plans.dialect import UnsupportedTrinoSyntax

    spark.range(3).createOrReplaceTempView("pw_rej")
    base = """
        SELECT m OVER w FROM pw_rej
        WINDOW w AS (PARTITION BY id ORDER BY id
          MEASURES count(*) AS m
          {frame} {mode}
          PATTERN (A+) DEFINE A AS id >= 0)
    """
    with pytest.raises(UnsupportedTrinoSyntax):
        engine.sql(base.format(
            frame="ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
            mode="SEEK"))
    with pytest.raises(UnsupportedTrinoSyntax):
        engine.sql(base.format(
            frame="ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            mode=""))
    # non-measure reference through the pattern window is rejected
    with pytest.raises(UnsupportedTrinoSyntax):
        engine.sql(
            """
            SELECT sum(id) OVER w FROM pw_rej
            WINDOW w AS (PARTITION BY id ORDER BY id
              MEASURES count(*) AS m
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
              PATTERN (A+) DEFINE A AS id >= 0)
            """
        )
    # a plain named window (no PATTERN) still reaches Spark's own
    # WINDOW clause untouched
    got = engine.sql(
        "SELECT id, sum(id) OVER w AS s FROM pw_rej "
        "WINDOW w AS (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) ORDER BY id"
    ).collect()
    assert [(r.id, r.s) for r in got] == [(0, 0), (1, 1), (2, 3)]


def test_final_running_prefixes_one_row(engine, spark):
    """FINAL/RUNNING prefixes are accepted (and no-ops) in ONE ROW PER
    MATCH measures — the match's final state makes them equal."""
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)],
        "k int, seq int, price double",
    ).createOrReplaceTempView("mr_finprefix")
    rows = engine.sql(
        """
        SELECT f, l, s FROM mr_finprefix MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FINAL FIRST(price) AS f, RUNNING LAST(price) AS l,
                   FINAL sum(price) AS s
          ONE ROW PER MATCH
          PATTERN (A+) DEFINE A AS price > 0
        )
        """
    ).collect()
    assert [(r.f, r.l, r.s) for r in rows] == [(10.0, 30.0, 60.0)]


def test_runs_fast_path_differential_vs_vm(spark, monkeypatch):
    """r9: the compiled runs plan must agree ROW-FOR-ROW with the
    backtracking VM on randomized inputs across pattern shapes in the
    eligible class (distinct exclusive labels, min>=1 quantifiers).
    The VM is forced by disabling the eligibility probe."""
    import importlib
    import random

    M = importlib.import_module(
        "witdb_spark.operators.match_recognize"
    )

    rng = random.Random(1909)
    patterns = [
        ({"V": "ty = 'v'", "P": "ty = 'p'"}, "V+ P"),
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
         "A+ B+ C+"),
        ({"A": "ty = 'a'", "B": "ty = 'b'"}, "A{2,} B"),
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
         "A B{1,2} C+"),
        ({"A": "ty = 'a'", "B": "ty = 'b'"}, "A{2} B{3,}"),
        # bounded FIRST element (suffix trim capped), bounded LAST
        ({"A": "ty = 'a'", "B": "ty = 'b'"}, "A{1,2} B{1,3}"),
        # interior exact + four elements
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'",
          "P": "ty = 'p'"}, "A+ B{1} C{1,2} P+"),
        # r10: alternation elements (disjoint label sets = super-label)
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
         "(A | B)+ C"),
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'",
          "P": "ty = 'p'"}, "(A | B){2,} (C | P)"),
        ({"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
         "A (B | C){1,3}"),
        # r10: single-element UNBOUNDED patterns
        ({"E": "ty = 'a'"}, "E{2,}"),
        ({"A": "ty = 'a'", "B": "ty = 'b'"}, "(A | B){3,}"),
        # r11: single-element BOUNDED patterns — SKIP PAST LAST ROW
        # restarts INSIDE a run; chunk arithmetic must agree with the
        # VM on every chunk boundary and tail length
        ({"E": "ty = 'a'"}, "E{2,5}"),
        ({"E": "ty = 'a'"}, "E{1,3}"),
        ({"E": "ty = 'a'"}, "E{3}"),
        ({"E": "ty = 'a'"}, "E"),
        ({"A": "ty = 'a'", "B": "ty = 'b'"}, "(A | B){2,4}"),
        ({"E": "ty = 'p'", "Z": "ty = 'x'"}, "E{2,2}"),
    ]
    alphabet = "abcpvx"  # x matches no label anywhere
    for define, pattern in patterns:
        rows = []
        for key in range(6):
            n = rng.randint(0, 40)
            for seq in range(n):
                rows.append((key, seq, rng.choice(alphabet)))
        df = spark.createDataFrame(rows, "k int, seq int, ty string")
        assert M._runs_plan_elements(
            M._parse_pattern(pattern, {x: 1 for x in define}), define
        ) is not None, pattern
        fast = M.match_recognize(df, ["k"], "seq", define, pattern)
        with monkeypatch.context() as mp:
            mp.setattr(M, "_runs_plan_elements", lambda *a: None)
            vm = M.match_recognize(df, ["k"], "seq", define, pattern)
        key = ["k", "seq", "ty", "match_id", "classifier"]
        a = sorted(map(tuple, fast.select(*key).collect()))
        b = sorted(map(tuple, vm.select(*key).collect()))
        assert a == b, (pattern, a[:5], b[:5])
