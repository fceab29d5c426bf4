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
