"""MATCH_RECOGNIZE-powered queries (reference SqlBase.g4:360 row-pattern
grammar; operator/window/pattern/). Both patterns here are deliberately
SQL-expressible so the DuckDB oracle fully hash-checks the operator: the
funnel (V+ P) and burst (E{2,}) patterns reduce to gaps-and-islands
window SQL, which is what the oracle runs on DuckDB's independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from witdb_spark.catalog import Tables
from witdb_spark.operators.match_recognize import match_recognize
from witdb_spark.queries.registry import register

# Shared oracle scaffolding: number rows per user, then gaps-and-islands
# (rn - row_number within type) to find maximal same-type runs.
_SEQ = """
    seq AS (SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
            FROM events)
"""


@register(
    "mr_funnel",
    f"""
    WITH {_SEQ},
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seq WHERE event_type = 'view'),
    vruns AS (SELECT user_id, grp, MIN(event_id) AS first_view,
                     COUNT(*) AS n_views, MAX(rn) AS last_rn
              FROM v GROUP BY user_id, grp),
    p AS (SELECT user_id, event_id AS purchase_id, rn FROM seq
          WHERE event_type = 'purchase')
    SELECT v.user_id, first_view, purchase_id, n_views
    FROM vruns v JOIN p ON p.user_id = v.user_id AND p.rn = v.last_rn + 1
    """,
    doc="MATCH_RECOGNIZE funnel: PATTERN (V+ P), PARTITION BY user_id "
    "ORDER BY event_id, AFTER MATCH SKIP PAST LAST ROW (reference "
    "PatternRecognitionNode.java; NFA operator/window/matcher/). The "
    "greedy V+ makes each match a maximal view-run ending in a purchase, "
    "which is exactly the gaps-and-islands oracle. MEASURES are ordinary "
    "Spark aggs over (user_id, match_id).",
    tags=("match_recognize", "pattern", "window"),
)
def mr_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matched = match_recognize(
        t.events.select("user_id", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by="event_id",
        define={"V": "event_type = 'view'", "P": "event_type = 'purchase'"},
        pattern="V+ P",
    )
    return matched.groupBy("user_id", "match_id").agg(
        F.min(F.when(F.col("classifier") == "V", F.col("event_id"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("classifier") == "P", F.col("event_id"))).alias(
            "purchase_id"
        ),
        F.count(F.when(F.col("classifier") == "V", 1)).alias("n_views"),
    ).drop("match_id")


@register(
    "mr_price_slide",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pv,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders),
    d AS (SELECT *, rn - row_number() OVER (PARTITION BY o_custkey ORDER BY rn) AS grp
          FROM s WHERE o_totalprice < pv),
    runs AS (SELECT o_custkey, grp, MIN(o_orderkey) AS start_key,
                    MAX(rn) AS rn_hi, COUNT(*) AS n_down
             FROM d GROUP BY o_custkey, grp HAVING COUNT(*) >= 2),
    u AS (SELECT o_custkey, o_orderkey AS end_key, rn FROM s
          WHERE o_totalprice > pv)
    SELECT r.o_custkey, r.start_key, u.end_key,
           CAST(r.n_down + 1 AS BIGINT) AS n_rows
    FROM runs r JOIN u ON u.o_custkey = r.o_custkey AND u.rn = r.rn_hi + 1
    """,
    doc="MATCH_RECOGNIZE with PREV() navigation: PATTERN (D{2,} U), "
    "D AS price < PREV(price), U AS price > PREV(price) — a maximal "
    "2+-step price slide ending in a rebound (reference "
    "LogicalIndexNavigation; matcher operator/window/matcher/Matcher.java). "
    "lag/lead computed JVM-side; the oracle is the lag + gaps-and-islands "
    "equivalent on DuckDB's independent engine.",
    tags=("match_recognize", "pattern", "navigation"),
)
def mr_price_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matched = match_recognize(
        t.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by="o_orderkey",
        define={
            "D": "o_totalprice < PREV(o_totalprice)",
            "U": "o_totalprice > PREV(o_totalprice)",
        },
        pattern="D{2,} U",
    )
    return (
        matched.groupBy("o_custkey", "match_id")
        .agg(
            F.min("o_orderkey").alias("start_key"),
            F.max("o_orderkey").alias("end_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("match_id")
    )


@register(
    "mr_rally",
    """
    WITH s AS (
      SELECT user_id, event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events),
    h AS (SELECT *, CASE WHEN value > pv THEN 1 ELSE 0 END AS is_up,
                 rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM s WHERE value >= pv),
    runs AS (SELECT user_id, grp, MAX(rn) AS rn_hi,
                    MIN(CASE WHEN is_up = 1 THEN rn END) AS p
             FROM h GROUP BY user_id, grp),
    m AS (SELECT user_id, p, rn_hi FROM runs WHERE p IS NOT NULL AND p < rn_hi)
    SELECT m.user_id, s1.event_id AS start_id, s2.event_id AS end_id,
           CAST(m.rn_hi - m.p AS BIGINT) AS n_high
    FROM m JOIN s s1 ON s1.user_id = m.user_id AND s1.rn = m.p
           JOIN s s2 ON s2.user_id = m.user_id AND s2.rn = m.rn_hi
    """,
    doc="MATCH_RECOGNIZE with OVERLAPPING defines: PATTERN (U H+), "
    "U AS v > PREV(v), H AS v >= PREV(v) — strictly-up rows satisfy BOTH "
    "labels, so per-row classification must follow pattern position (the "
    "backtracking VM), not first-DEFINE-wins: n_high counts H rows only, "
    "which the oracle reproduces as run-length minus the rally start.",
    tags=("match_recognize", "pattern", "navigation"),
)
def mr_rally(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matched = match_recognize(
        t.events.select("user_id", "event_id", "value"),
        partition_by=["user_id"],
        order_by="event_id",
        define={"U": "value > PREV(value)", "H": "value >= PREV(value)"},
        pattern="U H+",
    )
    return (
        matched.groupBy("user_id", "match_id")
        .agg(
            F.min("event_id").alias("start_id"),
            F.max("event_id").alias("end_id"),
            F.count(F.when(F.col("classifier") == "H", 1)).alias("n_high"),
        )
        .drop("match_id")
    )


@register(
    "mr_plateau_ends",
    """
    WITH s AS (
      SELECT user_id, event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
             lag(value, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS pv2
      FROM events)
    SELECT user_id, event_id AS end_id FROM s
    WHERE value >= pv AND pv >= pv2
    """,
    doc="MATCH_RECOGNIZE modes: PATTERN (H{2}) with H AS v >= PREV(v), "
    "AFTER MATCH SKIP TO NEXT ROW (overlapping matches; reference "
    "SqlBase.g4:372 skipTo grammar) and ONE ROW PER MATCH (FINAL "
    "semantics: the emitted row is the match's last row). Every row whose "
    "two predecessors step non-decreasingly ends a match, including "
    "consecutive such rows — exactly the two-lag oracle.",
    tags=("match_recognize", "pattern", "modes"),
)
def mr_plateau_ends(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matched = match_recognize(
        t.events.select("user_id", "event_id", "value"),
        partition_by=["user_id"],
        order_by="event_id",
        define={"H": "value >= PREV(value)"},
        pattern="H{2}",
        after_match="to next row",
        rows_per_match="one",
    )
    return matched.select("user_id", F.col("event_id").alias("end_id"))


@register(
    "mr_error_burst",
    f"""
    WITH {_SEQ},
    e AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seq WHERE event_type = 'error'),
    runs AS (SELECT user_id, MIN(event_id) AS first_error, COUNT(*) AS n_errors
             FROM e GROUP BY user_id, grp)
    SELECT user_id, first_error, n_errors FROM runs WHERE n_errors >= 2
    """,
    doc="MATCH_RECOGNIZE burst detection: PATTERN (E{2,}) — two or more "
    "consecutive errors per user (brace quantifier through the pattern "
    "compiler). Greedy maximal runs == gaps-and-islands runs with count>=2.",
    tags=("match_recognize", "pattern", "window"),
)
def mr_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matched = match_recognize(
        t.events.select("user_id", "event_id", "event_type"),
        partition_by=["user_id"],
        order_by="event_id",
        define={"E": "event_type = 'error'"},
        pattern="E{2,}",
    )
    return matched.groupBy("user_id", "match_id").agg(
        F.min("event_id").alias("first_error"),
        F.count(F.lit(1)).alias("n_errors"),
    ).drop("match_id")


@register(
    "mr_sql_funnel",
    f"""
    WITH {_SEQ},
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seq WHERE event_type = 'view'),
    vruns AS (SELECT user_id, grp, MIN(event_id) AS first_view,
                     COUNT(*) AS n_views, MAX(rn) AS last_rn
              FROM v GROUP BY user_id, grp),
    p AS (SELECT user_id, event_id AS purchase_id, rn FROM seq
          WHERE event_type = 'purchase')
    SELECT v.user_id, first_view, purchase_id,
           CAST(n_views AS BIGINT) AS n_views, 'P' AS last_label
    FROM vruns v JOIN p ON p.user_id = v.user_id AND p.rn = v.last_rn + 1
    """,
    doc="SQL-form MATCH_RECOGNIZE (reference grammar SqlBase.g4:360, "
    "RelationPlanner visitPatternRecognitionRelation): the full clause — "
    "PARTITION BY / ORDER BY / MEASURES with FIRST/LAST/CLASSIFIER / ONE "
    "ROW PER MATCH / AFTER MATCH SKIP / PATTERN / DEFINE — parsed from SQL "
    "and lowered onto the backtracking-VM operator; measures evaluate with "
    "FINAL semantics as min_by/max_by over the match ordering. Oracle is "
    "the independent gaps-and-islands form.",
    tags=("match_recognize", "pattern", "dialect"),
)
def mr_sql_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id, first_view, purchase_id, n_views, last_label
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES FIRST(event_id) AS first_view,
                   LAST(event_id) AS purchase_id,
                   count(*) - 1 AS n_views,
                   CLASSIFIER() AS last_label
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        )
        """
    )


@register(
    "mr_subset_moves",
    f"""
    WITH {_SEQ},
    kinds AS (
      SELECT user_id, event_id, rn,
             CASE WHEN event_type = 'view' THEN 'V'
                  WHEN event_type IN ('click', 'error') THEN 'M'
                  WHEN event_type = 'purchase' THEN 'P'
                  ELSE 'X' END AS kind
      FROM seq),
    runs AS (
      SELECT user_id, event_id, rn, kind,
             rn - row_number() OVER (PARTITION BY user_id, kind ORDER BY rn) AS grp
      FROM kinds),
    vruns AS (
      SELECT user_id, grp, MIN(event_id) AS first_view, COUNT(*) AS nv,
             MAX(rn) AS last_rn
      FROM runs WHERE kind = 'V' GROUP BY user_id, grp),
    mruns AS (
      SELECT user_id, grp, MIN(rn) AS min_rn, MAX(rn) AS max_rn,
             COUNT(*) AS n_mid, MAX(event_id) AS last_mid,
             MIN(event_id) AS min_mid
      FROM runs WHERE kind = 'M' GROUP BY user_id, grp),
    p AS (SELECT user_id, rn FROM runs WHERE kind = 'P')
    SELECT v.user_id, v.first_view, m.n_mid, m.last_mid, m.min_mid,
           v.nv + m.n_mid + 1 AS n_rows
    FROM vruns v
    JOIN mruns m ON m.user_id = v.user_id AND m.min_rn = v.last_rn + 1
    JOIN p ON p.user_id = m.user_id AND p.rn = m.max_rn + 1
    """,
    doc="MATCH_RECOGNIZE SUBSET (reference SqlBase.g4 SUBSET clause, "
    "Matcher.java union-variable resolution): PATTERN (V+ (C|E)+ P) with "
    "SUBSET M = (C, E); MEASURES reference the union variable via "
    "FIRST/LAST/count/min over M — lowered to CLASSIFIER()-membership-"
    "guarded min_by/max_by and aggregates (plans/mr_sql.py "
    "_qualify_labels). Oracle is the independent gaps-and-islands form "
    "over per-kind runs.",
    tags=("match_recognize", "pattern", "dialect", "subset"),
)
def mr_subset_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id, first_view, n_mid, last_mid, min_mid, n_rows
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES FIRST(V.event_id) AS first_view,
                   count(M.*) AS n_mid,
                   LAST(M.event_id) AS last_mid,
                   min(M.event_id) AS min_mid,
                   count(*) AS n_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ (C | E)+ P)
          SUBSET M = (C, E)
          DEFINE V AS event_type = 'view',
                 C AS event_type = 'click',
                 E AS event_type = 'error',
                 P AS event_type = 'purchase'
        )
        """
    )


@register(
    "mr_nav_measures",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pv,
             lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nx,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders),
    d AS (SELECT *, rn - row_number() OVER (PARTITION BY o_custkey ORDER BY rn) AS grp
          FROM s WHERE o_totalprice > pv),
    runs AS (SELECT o_custkey, grp, MIN(rn) AS rn_lo, MAX(rn) AS rn_hi,
                    COUNT(*) AS nb
             FROM d GROUP BY o_custkey, grp)
    SELECT r.o_custkey,
           a.o_orderkey AS start_key,
           a.pv AS before_start,
           e.nx AS after_end,
           CAST(r.nb + 1 AS BIGINT) AS n_rows
    FROM runs r
    JOIN s a ON a.o_custkey = r.o_custkey AND a.rn = r.rn_lo - 1
    JOIN s e ON e.o_custkey = r.o_custkey AND e.rn = r.rn_hi
    """,
    doc="MATCH_RECOGNIZE with PREV/NEXT NAVIGATION IN MEASURES (reference "
    "LogicalIndexNavigation: physical row offsets over the partition, "
    "possibly stepping outside the match; NULL outside the partition): "
    "PREV(FIRST(price)) reads the row before the match, NEXT(LAST(price)) "
    "the row after. The oracle rebuilds the same maximal ascending runs "
    "with gaps-and-islands and reads the stepped-to rows via lag/lead at "
    "the anchor rows.",
    tags=("match_recognize", "pattern", "navigation", "measures"),
)
def mr_nav_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return eng.sql(
        """
        SELECT o_custkey, start_key, before_start, after_end, n_rows
        FROM orders MATCH_RECOGNIZE (
          PARTITION BY o_custkey
          ORDER BY o_orderkey
          MEASURES FIRST(o_orderkey) AS start_key,
                   PREV(FIRST(o_totalprice)) AS before_start,
                   NEXT(LAST(o_totalprice)) AS after_end,
                   count(*) AS n_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE B AS o_totalprice > PREV(o_totalprice)
        )
        """
    )


@register(
    "mr_all_rows_running",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pv,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders),
    d AS (SELECT *, rn - row_number() OVER (PARTITION BY o_custkey ORDER BY rn) AS grp
          FROM s WHERE o_totalprice > pv),
    runs AS (SELECT o_custkey, grp, MIN(rn) AS rn_lo, MAX(rn) AS rn_hi
             FROM d GROUP BY o_custkey, grp)
    SELECT r.o_custkey, a.o_orderkey, CAST(0 AS BIGINT) AS n_up
    FROM runs r JOIN s a ON a.o_custkey = r.o_custkey AND a.rn = r.rn_lo - 1
    UNION ALL
    SELECT d.o_custkey, d.o_orderkey, CAST(d.rn - r.rn_lo + 1 AS BIGINT)
    FROM d JOIN runs r ON r.o_custkey = d.o_custkey AND r.grp = d.grp
    """,
    doc="ALL ROWS PER MATCH with a label-qualified RUNNING measure "
    "(SQL:2016 running semantics; reference MeasureComputation.java): "
    "count(B.*) per output row counts the ascending rows seen so far in "
    "the match — lowered to a membership-guarded cumulative window over "
    "(partition, match_id). The oracle rebuilds the same islands and "
    "derives the running count arithmetically from row positions.",
    tags=("match_recognize", "pattern", "measures", "allrows"),
)
def mr_all_rows_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return eng.sql(
        """
        SELECT o_custkey, o_orderkey, n_up
        FROM orders MATCH_RECOGNIZE (
          PARTITION BY o_custkey
          ORDER BY o_orderkey
          MEASURES count(B.*) AS n_up
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE B AS o_totalprice > PREV(o_totalprice)
        )
        """
    )


@register(
    "mr_nav_in_aggregate",
    """
    WITH seqv AS (
      SELECT user_id, event_id, value, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pval
      FROM events),
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seqv WHERE event_type = 'view'),
    runs AS (SELECT user_id, MIN(event_id) AS start_id,
                    CAST(COUNT(*) AS BIGINT) AS n_views,
                    SUM(CAST(value - pval AS DECIMAL(30,6))) AS s,
                    COUNT(value - pval) AS nn
             FROM v GROUP BY user_id, grp HAVING COUNT(*) >= 2)
    SELECT user_id, start_id, n_views,
           CAST(s AS DOUBLE) / nn AS avg_step
    FROM runs
    """,
    doc="Per-row navigation INSIDE an aggregate measure under ONE ROW PER "
    "MATCH (SQL:2016; reference MeasureComputation.java + "
    "LogicalIndexNavigation.java): avg step = sum/count of per-row "
    "value - PREV(value) over each >=2-run of views, where each match "
    "row navigates from ITSELF (physical navigation over the partition — "
    "the run's first view reads the event before the run). The r5 "
    "lowering carries a source-level lag column through the operator and "
    "aggregates it; the per-match-constant reading this replaced would "
    "return a different number. Oracle: gaps-and-islands with "
    "partition-level lag.",
    tags=("match_recognize", "pattern", "dialect", "navigation"),
)
def mr_nav_in_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id, start_id, n_views, avg_step
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES FIRST(event_id) AS start_id,
                   count(*) AS n_views,
                   CAST(sum(CAST(value - PREV(value) AS DECIMAL(30,6)))
                        AS DOUBLE)
                     / count(value - PREV(value)) AS avg_step
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V{2,})
          DEFINE V AS event_type = 'view'
        )
        """
    )


@register(
    "mr_label_nav_all_rows",
    """
    WITH seqn AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pval
      FROM events),
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seqn WHERE event_type = 'view'),
    vruns AS (SELECT user_id, grp, MAX(rn) AS last_rn,
                     max_by(pval, rn) AS last_v_pval
              FROM v GROUP BY user_id, grp),
    p AS (SELECT user_id, event_id, rn FROM seqn WHERE event_type = 'purchase'),
    matches AS (SELECT r.user_id, r.grp, r.last_rn, r.last_v_pval,
                       p.event_id AS p_eid
                FROM vruns r JOIN p ON p.user_id = r.user_id
                                   AND p.rn = r.last_rn + 1)
    SELECT v.user_id, v.event_id, v.pval AS prev_v
    FROM v JOIN matches m ON v.user_id = m.user_id AND v.grp = m.grp
    UNION ALL
    SELECT m.user_id, m.p_eid AS event_id, m.last_v_pval AS prev_v
    FROM matches m
    """,
    doc="Label-qualified PREV anchor under ALL ROWS PER MATCH (r5; "
    "reference LogicalIndexNavigation.java): PREV(V.value) resolves the "
    "RUNNING last V-classified row per output row and steps one row back "
    "over the PARTITION (physically — the step may leave the match). "
    "View rows read their own lag; the purchase row reads the lag of the "
    "run's last view. Oracle: gaps-and-islands with partition-level lag.",
    tags=("match_recognize", "pattern", "dialect", "navigation"),
)
def mr_label_nav_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id, event_id, prev_v
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES PREV(V.value) AS prev_v
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        )
        """
    )


@register(
    "mr_pattern_window",
    f"""
    WITH ev AS (SELECT * FROM events WHERE user_id % 7 = 0),
    seq AS (SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
            FROM ev),
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
          FROM seq WHERE event_type = 'view'),
    vruns AS (SELECT user_id, grp, MIN(event_id) AS start_id,
                     COUNT(*) AS n_views, MAX(rn) AS last_rn
              FROM v GROUP BY user_id, grp),
    p AS (SELECT user_id, event_id AS purchase_id, rn FROM seq
          WHERE event_type = 'purchase'),
    m AS (SELECT r.user_id, r.start_id, p.purchase_id,
                 CAST(r.n_views + 1 AS BIGINT) AS n_rows
          FROM vruns r JOIN p ON p.user_id = r.user_id
                             AND p.rn = r.last_rn + 1)
    SELECT e.user_id, e.event_id, m.purchase_id, m.n_rows
    FROM (SELECT user_id, event_id FROM ev) e
    LEFT JOIN m ON m.user_id = e.user_id AND m.start_id = e.event_id
    """,
    doc="Row-pattern recognition in a WINDOW structure (r5; reference "
    "SqlBase.g4 windowFrame MEASURES/PATTERN/DEFINE, SQL:2016 window "
    "row-pattern): measures are read as `m OVER w`, every non-skipped "
    "row is an INITIAL match attempt over the CURRENT ROW .. UNBOUNDED "
    "FOLLOWING frame, starting rows carry FINAL measures, and "
    "skipped/failed rows read NULL. Oracle: gaps-and-islands — the only "
    "value rows are the first views of purchase-terminated runs.",
    tags=("match_recognize", "pattern", "dialect", "window"),
)
def mr_pattern_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.where(F.col("user_id") % 7 == 0).createOrReplaceTempView(
        "events_w7"
    )
    return eng.sql(
        """
        SELECT user_id, event_id, pid OVER w AS purchase_id,
               nr OVER w AS n_rows
        FROM events_w7
        WINDOW w AS (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES LAST(event_id) AS pid, count(*) AS nr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS event_type = 'view', P AS event_type = 'purchase'
        )
        """
    )


@register(
    "mr_label_nav_in_aggregate",
    """
    WITH seqn AS (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pval,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS next_type,
             lead(value) OVER (PARTITION BY user_id ORDER BY event_id)
               AS next_val
      FROM events),
    v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
                 AS grp
          FROM seqn WHERE event_type = 'view'),
    isl AS (SELECT user_id, grp, MIN(event_id) AS start_id,
                   CAST(COUNT(*) + 1 AS BIGINT) AS n_rows,
                   SUM(CASE WHEN rn > 1
                            THEN CAST(value - pval AS DECIMAL(30,6)) END)
                     AS sv,
                   max_by(pval, rn) AS last_view_pval,
                   max_by(next_type, rn) AS after_type,
                   max_by(next_val, rn) AS after_val
            FROM v GROUP BY user_id, grp),
    m AS (SELECT user_id, start_id, n_rows, sv,
                 CASE WHEN last_view_pval IS NOT NULL
                      THEN CAST(after_val - last_view_pval AS DECIMAL(30,6))
                 END AS cterm
          FROM isl WHERE after_type = 'click')
    SELECT user_id, start_id, n_rows,
           CAST(CASE WHEN sv IS NULL AND cterm IS NULL THEN NULL
                     ELSE coalesce(sv, CAST(0 AS DECIMAL(30,6)))
                          + coalesce(cterm, CAST(0 AS DECIMAL(30,6))) END
                AS DOUBLE) AS step_sum
    FROM m
    """,
    doc="Label-qualified PREV inside an aggregate measure under ONE ROW "
    "PER MATCH (r6, the last recorded MATCH_RECOGNIZE corner; reference "
    "LogicalIndexNavigation.java + MeasureComputation.java): "
    "sum(value - PREV(V.value)) evaluates PER AGGREGATED ROW with the "
    "RUNNING last V-classified row as of that row as the anchor, stepping "
    "one row back over the PARTITION — each view row reads its own lag, "
    "the click row reads the lag of the run's last view, and rows before "
    "any V (none here) or navigating off the partition contribute NULL "
    "terms the sum skips. Oracle: gaps-and-islands with partition-level "
    "lag/lead.",
    tags=("match_recognize", "pattern", "dialect", "navigation"),
)
def mr_label_nav_in_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id, start_id, n_rows, step_sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY event_id
          MEASURES FIRST(event_id) AS start_id,
                   count(*) AS n_rows,
                   CAST(sum(CAST(value - PREV(V.value) AS DECIMAL(30,6)))
                        AS DOUBLE) AS step_sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ C)
          DEFINE V AS event_type = 'view', C AS event_type = 'click'
        )
        """
    )
