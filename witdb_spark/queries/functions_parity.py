"""Scalar-function parity queries: exercise the Trino function registry over
real tables with DuckDB oracle twins (reference test style:
sql/query/TestStringFunctions etc. asserted against the H2 oracle).

Only functions with identical DuckDB semantics appear here; the rest are
covered by tests/test_functions.py against literal expected values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from witdb_spark.catalog import Tables
from witdb_spark.functions import register_all
from witdb_spark.queries.registry import register


@register(
    "string_funcs_parity",
    """
    SELECT p_partkey,
           CAST(strpos(p_name, 'e') AS INT) AS pos_e,
           upper(p_name) AS uname,
           reverse(p_name) AS rname,
           CAST(levenshtein(p_name, p_brand) AS INT) AS lev,
           lpad(p_brand, 12, '*') AS padded,
           split_part(p_name, ' ', 2) AS second_word,
           translate(p_name, 'aeiou', 'AEIOU') AS devoweled,
           CAST(ascii(p_name) AS INT) AS first_cp,
           substr(p_name, 2, 3) AS mid,
           concat_ws('|', p_brand, p_type) AS joined
    FROM part
    WHERE p_partkey < 200
    """,
    doc="String function parity over the part table (reference "
    "StringFunctions.java:72-838): strpos/levenshtein/split_part/translate/"
    "codepoint and friends, all JVM built-ins or SQL macros.",
    tags=("functions", "string"),
)
def string_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               strpos(p_name, 'e') AS pos_e,
               upper(p_name) AS uname,
               reverse(p_name) AS rname,
               levenshtein(p_name, p_brand) AS lev,
               lpad(p_brand, 12, '*') AS padded,
               split_part(p_name, ' ', 2) AS second_word,
               translate(p_name, 'aeiou', 'AEIOU') AS devoweled,
               codepoint(p_name) AS first_cp,
               substr(p_name, 2, 3) AS mid,
               concat_ws('|', p_brand, p_type) AS joined
        FROM part
        WHERE p_partkey < 200
        """
    )


@register(
    "datetime_funcs_parity",
    """
    SELECT o_orderkey,
           CAST(isodow(o_orderdate) AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d
    FROM orders
    WHERE o_orderkey < 500
    """,
    doc="Datetime function parity over orders (reference "
    "DateTimeFunctions.java): ISO day-of-week macro, date_trunc, last_day, "
    "date_diff, interval arithmetic. All date-based (timezone-free on "
    "timestamp_ntz).",
    tags=("functions", "datetime"),
)
def datetime_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               day_of_week(o_orderdate) AS dow,
               dayofyear(o_orderdate) AS doy,
               weekofyear(o_orderdate) AS woy,
               quarter(o_orderdate) AS qtr,
               date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end,
               date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
               trino_date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                 AS days_to_y2k,
               date_format(trino_date_add('day', 90, o_orderdate), 'yyyy-MM-dd') AS plus_90d
        FROM orders
        WHERE o_orderkey < 500
        """
    )


@register(
    "math_funcs_parity",
    """
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)  AS sqrt_qty,
           round(cbrt(l_quantity), 6)  AS cbrt_qty,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           CAST(CASE WHEN l_quantity >= 50 THEN 11
                     ELSE floor(l_quantity / 5) + 1 END AS BIGINT) AS qty_bucket,
           -- DuckDB 1.0 has no width_bucket; equivalent arithmetic for (0,50,10)
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           round(power(l_tax + 1, 2), 6) AS tax_sq,
           mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7
    FROM lineitem
    WHERE l_orderkey < 100
    """,
    doc="Math function parity over lineitem (reference MathFunctions.java): "
    "sqrt/cbrt/ln/log10/width_bucket/sign/power/mod; transcendentals rounded "
    "to 6 (libm implementations differ in the last ulp).",
    tags=("functions", "math"),
)
def math_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_quantity), 6)  AS sqrt_qty,
               round(cbrt(l_quantity), 6)  AS cbrt_qty,
               round(ln(l_extendedprice), 6) AS ln_price,
               round(log10(l_extendedprice), 6) AS log10_price,
               width_bucket(CAST(l_quantity AS DOUBLE), 0D, 50D, 10) AS qty_bucket,
               sign(l_discount - 0.05) AS disc_sign,
               round(power(l_tax + 1, 2), 6) AS tax_sq,
               mod(CAST(l_quantity AS BIGINT), 7) AS qty_mod7
        FROM lineitem
        WHERE l_orderkey < 100
        """
    )


@register(
    "json_funcs_parity",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    WHERE event_id < 1000
    """,
    doc="JSON function parity over events.props (reference "
    "JsonFunctions.java json_extract_scalar): JsonPath common subset.",
    tags=("functions", "json"),
)
def json_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id,
               get_json_object(props, '$.k') AS k_val,
               CAST(get_json_object(props, '$.k') AS BIGINT) AS k_int
        FROM events
        WHERE event_id < 1000
        """
    )
