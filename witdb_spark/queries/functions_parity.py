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


@register(
    "regex_funcs_parity",
    """
    SELECT p_partkey,
           regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS is_two_words,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), '+') AS all_words
    FROM part
    WHERE p_partkey < 300
    """,
    doc="Regex function parity (reference JoniRegexpFunctions.java: "
    "regexp_like/extract/extract_all/replace/count). Spark and DuckDB both "
    "use Java-compatible regex syntax for this subset; DuckDB needs the 'g' "
    "flag where Trino/Spark replace globally by default.",
    tags=("functions", "regex"),
)
def regex_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               regexp_like(p_name, '^[a-z]+ [a-z]+$') AS is_two_words,
               regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '*') AS starred,
               regexp_count(p_name, '[aeiou]') AS n_vowels,
               array_join(regexp_extract_all(p_name, '[a-z]+', 0), '+') AS all_words
        FROM part
        WHERE p_partkey < 300
        """
    )


@register(
    "binary_funcs_parity",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           hex(p_name) AS name_hex,
           to_base64(encode(p_name)) AS name_b64,
           decode(from_base64(to_base64(encode(p_name)))) AS roundtrip
    FROM part
    WHERE p_partkey < 300
    """,
    doc="Binary/codec parity (reference VarbinaryFunctions.java: md5, "
    "sha256, to_hex, to/from_base64 — all through the to_utf8 varbinary "
    "model). Trino returns varbinary from sha*; ours does too "
    "(unhex(sha2)), hex-stringified lowercase here for comparison. crc32/"
    "sha1/xxhash64 are registered but DuckDB lacks them, so they are "
    "covered by literal tests instead.",
    tags=("functions", "binary"),
)
def binary_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               md5(to_utf8(p_name)) AS name_md5,
               lower(to_hex(sha256(to_utf8(p_name)))) AS name_sha256,
               to_hex(to_utf8(p_name)) AS name_hex,
               to_base64(to_utf8(p_name)) AS name_b64,
               from_utf8(from_base64(to_base64(to_utf8(p_name)))) AS roundtrip
        FROM part
        WHERE p_partkey < 300
        """
    )


@register(
    "bitwise_funcs_parity",
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey & l_partkey AS b_and,
           l_orderkey | l_partkey AS b_or,
           xor(l_orderkey, l_suppkey) AS b_xor,
           CAST(l_linenumber AS BIGINT) << 3 AS b_shl,
           l_orderkey >> 2 AS b_shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt,
           CAST(bit_count(l_orderkey & 65535) AS BIGINT) AS popcnt16
    FROM lineitem
    WHERE l_orderkey < 500
    """,
    doc="Bitwise parity (reference BitwiseFunctions.java: bitwise_and/or/"
    "xor, shifts, 2-arg bit_count): Trino names run through Engine.sql — "
    "macros for the operators, a transpiler width-mask rewrite for "
    "bit_count(x, bits).",
    tags=("functions", "bitwise"),
)
def bitwise_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    return eng.sql(
        """
        SELECT l_orderkey, l_linenumber,
               bitwise_and(l_orderkey, l_partkey) AS b_and,
               bitwise_or(l_orderkey, l_partkey) AS b_or,
               bitwise_xor(l_orderkey, l_suppkey) AS b_xor,
               bitwise_left_shift(CAST(l_linenumber AS BIGINT), 3) AS b_shl,
               bitwise_right_shift(l_orderkey, 2) AS b_shr,
               bit_count(l_orderkey, 64) AS popcnt,
               bit_count(l_orderkey, 16) AS popcnt16
        FROM lineitem
        WHERE l_orderkey < 500
        """
    )


@register(
    "array_hof_parity",
    """
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
                                  x -> upper(x)), ',') AS words_up,
           coalesce(array_to_string(list_filter(string_split(p_name, ' '),
                                       x -> len(x) > 4), ','), '') AS long_words,
           CAST(len(replace(p_name, ' ', '')) AS INT) AS total_len,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
           string_split(p_name, ' ')[-1] AS last_word,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           array_to_string(generate_series(1, CAST(p_size AS BIGINT), 7), ',') AS stepped,
           coalesce(array_to_string(
             list_transform(range(1, len(string_split(p_name, ' '))),
                            i -> string_split(p_name, ' ')[i] || ' ' ||
                                 string_split(p_name, ' ')[i+1]), '|'), '') AS bigrams
    FROM part
    WHERE p_partkey < 300
    """,
    doc="Array higher-order-function parity (reference "
    "ArrayTransformFunction/ArrayFilterFunction/ArrayReduceFunction/"
    "ArraySortFunction/SequenceFunction/ArrayNgramsFunction, all lambda "
    "HOFs): Catalyst evaluates the lambdas JVM-side; the DuckDB oracle "
    "computes the same values through its independent list_* lambda engine "
    "(total_len via a string identity to stay engine-independent).",
    tags=("functions", "array", "lambda"),
)
def array_hof_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey,
               array_join(transform(split(p_name, ' '), x -> upper(x)), ',')
                 AS words_up,
               array_join(filter(split(p_name, ' '), x -> length(x) > 4), ',')
                 AS long_words,
               aggregate(transform(split(p_name, ' '), x -> length(x)), 0,
                         (a, x) -> a + x) AS total_len,
               array_join(array_sort(split(p_name, ' ')), ',') AS sorted_words,
               element_at(split(p_name, ' '), -1) AS last_word,
               cardinality(split(p_name, ' ')) AS n_words,
               array_join(sequence(CAST(1 AS BIGINT), CAST(p_size AS BIGINT),
                                   CAST(7 AS BIGINT)), ',') AS stepped,
               array_join(transform(ngrams(split(p_name, ' '), 2),
                                    g -> array_join(g, ' ')), '|') AS bigrams
        FROM part
        WHERE p_partkey < 300
        """
    )


@register(
    "url_funcs_parity",
    """
    SELECT doc_id,
           source || '.example.org' AS host,
           '/docs/' || doc_id AS path,
           'https' AS protocol,
           CAST(8000 + doc_id % 3 AS BIGINT) AS port,
           'lang=' || lang AS query,
           lang AS lang_param
    FROM documents
    WHERE doc_id < 500
    """,
    doc="URL function parity (reference UrlFunctions.java: url_extract_"
    "host/path/protocol/port/query/parameter over parse_url). The oracle "
    "reconstructs each component from the URL's own building blocks — "
    "ground truth independent of any URL parser.",
    tags=("functions", "url"),
)
def url_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("documents")
    return spark.sql(
        """
        WITH urls AS (
          SELECT doc_id,
                 concat('https://', source, '.example.org:',
                        cast(8000 + doc_id % 3 AS STRING),
                        '/docs/', cast(doc_id AS STRING),
                        '?lang=', lang) AS url
          FROM documents WHERE doc_id < 500)
        SELECT doc_id,
               url_extract_host(url) AS host,
               url_extract_path(url) AS path,
               url_extract_protocol(url) AS protocol,
               url_extract_port(url) AS port,
               url_extract_query(url) AS query,
               url_extract_parameter(url, 'lang') AS lang_param
        FROM urls
        """
    )


@register(
    "sql_json_2016_parity",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           json_extract(props, '$.k') IS NOT NULL AS has_k,
           json_extract(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    WHERE event_id < 500
    """,
    doc="SQL/JSON-2016 json_value/json_exists (reference scalar/json/"
    "JsonValueFunction.java, JsonExistsFunction.java; path IR in "
    "core/trino-main/.../json/): lax-mode JSONPath over the events.props "
    "column via the Python-tier UDFs, checked against DuckDB's independent "
    "JSON extension.",
    tags=("functions", "json", "sqljson"),
)
def sql_json_2016_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id,
               json_value(props, '$.k') AS k_val,
               json_exists(props, '$.k') AS has_k,
               json_exists(props, '$.missing') AS has_missing
        FROM events
        WHERE event_id < 500
        """
    )


@register(
    "geo_funcs_parity",
    """
    WITH pts AS (
      SELECT s_suppkey,
             CAST(s_suppkey % 360 - 180 AS DOUBLE) AS x,
             CAST(s_suppkey % 170 - 85 AS DOUBLE) AS y
      FROM supplier
    )
    SELECT s_suppkey,
           round(sqrt(x * x + y * y), 6) AS dist_origin,
           x >= -90 AND x <= 90 AND y >= -45 AND y <= 45 AS in_box,
           round(2 * 6371.01 * asin(sqrt(
             pow(sin(radians(0 - y) / 2), 2) + cos(radians(y)) *
             cos(radians(0)) * pow(sin(radians(0 - x) / 2), 2))), 6) AS km_to_00
    FROM pts
    """,
    doc="Geospatial planar-point subset (plugin/trino-geospatial "
    "GeoFunctions.java ST_Point/ST_Distance/envelope; core "
    "great_circle_distance from MathFunctions.java): struct-backed points "
    "through SQL macros, haversine in km. The oracle recomputes the same "
    "closed-form math; full geometry types remain a documented gap.",
    tags=("functions", "geospatial"),
)
def geo_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.supplier.createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH pts AS (
          SELECT s_suppkey,
                 st_point(CAST(s_suppkey % 360 - 180 AS DOUBLE),
                          CAST(s_suppkey % 170 - 85 AS DOUBLE)) AS p
          FROM supplier
        )
        SELECT s_suppkey,
               round(st_distance(p, st_point(0D, 0D)), 6) AS dist_origin,
               st_envelope_contains(-90D, -45D, 90D, 45D, p) AS in_box,
               round(great_circle_distance(st_y(p), st_x(p), 0D, 0D), 6)
                 AS km_to_00
        FROM pts
        """
    )


@register(
    "time_funcs_parity",
    """
    WITH b AS (SELECT event_id, epoch_ns(ts) % 86400000000000 AS tod
               FROM events WHERE event_id < 500),
    t AS (SELECT event_id, tod,
                 make_time(CAST(tod // 3600000000000 AS BIGINT),
                           CAST((tod // 60000000000) % 60 AS BIGINT),
                           -- truncate to micros BEFORE make_time: it ROUNDS
                           -- its fractional input, while the Spark macros
                           -- floor nanos — sub-microsecond fixtures would
                           -- diverge (and X.9999995s would roll the minute)
                           CAST((tod % 60000000000) // 1000 AS BIGINT) / 1000000.0)
                   AS tt
          FROM b)
    SELECT event_id,
           CAST(hour(tt) AS BIGINT) AS h,
           CAST(minute(tt) AS BIGINT) AS mi,
           CAST(EXTRACT(second FROM tt) AS BIGINT) AS s,
           CAST(EXTRACT(millisecond FROM tt) AS BIGINT) % 1000 AS ms,
           lpad(CAST(hour(tt) AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(minute(tt) AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(EXTRACT(second FROM tt) AS BIGINT)::VARCHAR, 2, '0')
             || '.' || lpad(CAST(tod % 1000000000 AS VARCHAR), 9, '0')
             AS tstr,
           tod AS reparsed
    FROM t
    """,
    doc="TIME type parity (reference core/trino-spi/.../type/TimeType.java; "
    "DateTimeFunctions hour/minute/second over TIME): nanos-of-day BIGINT "
    "encoding with parse/extract/format macros; CAST(x AS TIME) and "
    "LOCALTIME/CURRENT_TIME are dialect rewrites. The oracle rebuilds each "
    "field through DuckDB's native TIME machinery (make_time/hour/extract), "
    "an independent engine path; reparsed proves the text round-trip is "
    "lossless at nanos.",
    tags=("functions", "time", "dialect"),
)
def time_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT event_id,
               time_hour(tod) AS h,
               time_minute(tod) AS mi,
               time_second(tod) AS s,
               time_millisecond(tod) AS ms,
               time_to_str(tod) AS tstr,
               CAST(time_to_str(tod) AS TIME) AS reparsed
        FROM (SELECT event_id, ts_ns % 86400000000000 AS tod
              FROM events WHERE event_id < 500) b
        """
    )


@register(
    "geometry_funcs_parity",
    """
    WITH g AS (
      SELECT s_suppkey,
             CAST(s_suppkey % 50 AS DOUBLE) AS x0,
             CAST((s_suppkey * 7) % 40 AS DOUBLE) AS y0,
             CAST(s_suppkey % 4 AS DOUBLE) AS a,
             CAST((s_suppkey // 4) % 3 AS DOUBLE) AS b,
             CAST(s_suppkey % 7 AS DOUBLE) AS px,
             CAST(s_suppkey % 5 AS DOUBLE) AS py
      FROM supplier),
    v AS (
      SELECT s_suppkey, px, py,
             x0 AS x1, y0 AS y1,
             x0 + 4 + a AS x2, y0 + 1 AS y2,
             x0 + 5 + a AS x3, y0 + 5 + b AS y3,
             x0 - 1 AS x4, y0 + 3 + b AS y4,
             x0 + px AS qx, y0 + py AS qy
      FROM g)
    SELECT s_suppkey,
           abs((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3)
               + (x4*y1 - x1*y4)) / 2 AS parea,
           round(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
               + sqrt((x3-x2)*(x3-x2) + (y3-y2)*(y3-y2))
               + sqrt((x4-x3)*(x4-x3) + (y4-y3)*(y4-y3))
               + sqrt((x1-x4)*(x1-x4) + (y1-y4)*(y1-y4)), 6) AS pperim,
           round(((x1+x2)*(x1*y2-x2*y1) + (x2+x3)*(x2*y3-x3*y2)
                + (x3+x4)*(x3*y4-x4*y3) + (x4+x1)*(x4*y1-x1*y4))
             / (3 * ((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3)
                + (x4*y1 - x1*y4))), 6) AS cx,
           round(((y1+y2)*(x1*y2-x2*y1) + (y2+y3)*(x2*y3-x3*y2)
                + (y3+y4)*(x3*y4-x4*y3) + (y4+y1)*(x4*y1-x1*y4))
             / (3 * ((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3)
                + (x4*y1 - x1*y4))), 6) AS cy,
           x4 AS exmin, y1 AS eymin,
           ((x2-x1)*(qy-y1) - (y2-y1)*(qx-x1)) > 0 AND
           ((x3-x2)*(qy-y2) - (y3-y2)*(qx-x2)) > 0 AND
           ((x4-x3)*(qy-y3) - (y4-y3)*(qx-x3)) > 0 AND
           ((x1-x4)*(qy-y4) - (y1-y4)*(qx-x4)) > 0 AS has_pt,
           round(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
               + sqrt((x3-x2)*(x3-x2) + (y3-y2)*(y3-y2)), 6) AS ls_len
    FROM v
    """,
    doc="WKT geometry parity (reference plugin/trino-geospatial "
    "GeoFunctions.java ST_Area/ST_Perimeter/ST_Centroid/ST_Envelope/"
    "ST_Contains/ST_Length): per-supplier convex quadrilaterals whose shape "
    "varies with the key, evaluated by the WKT kernel on the Spark side and "
    "by closed-form shoelace / cross-sign arithmetic in DuckDB — fully "
    "independent math paths. ST_Contains is strict-interior (OGC), matching "
    "the all-crosses-positive oracle.",
    tags=("functions", "geospatial", "geometry"),
)
def geometry_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.supplier.createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH g AS (
          SELECT s_suppkey,
                 CAST(s_suppkey % 50 AS DOUBLE) AS x0,
                 CAST((s_suppkey * 7) % 40 AS DOUBLE) AS y0,
                 CAST(s_suppkey % 4 AS DOUBLE) AS a,
                 CAST(s_suppkey DIV 4 % 3 AS DOUBLE) AS b,
                 CAST(s_suppkey % 7 AS DOUBLE) AS px,
                 CAST(s_suppkey % 5 AS DOUBLE) AS py
          FROM supplier),
        w AS (
          SELECT s_suppkey,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x0, y0, x0 + 4 + a, y0 + 1, x0 + 5 + a, y0 + 5 + b,
                   x0 - 1, y0 + 3 + b, x0, y0) AS quad,
                 format_string('LINESTRING (%s %s, %s %s, %s %s)',
                   x0, y0, x0 + 4 + a, y0 + 1, x0 + 5 + a, y0 + 5 + b)
                   AS path,
                 st_point(x0 + px, y0 + py) AS probe
          FROM g)
        SELECT s_suppkey,
               st_area(quad) AS parea,
               round(st_perimeter(quad), 6) AS pperim,
               round(st_x(st_centroid(quad)), 6) AS cx,
               round(st_y(st_centroid(quad)), 6) AS cy,
               st_xmin(st_envelope(quad)) AS exmin,
               st_ymin(st_envelope(quad)) AS eymin,
               st_contains(quad, probe) AS has_pt,
               round(st_length(path), 6) AS ls_len
        FROM w
        """
    )


@register(
    "codec_funcs_parity",
    """
    SELECT l_orderkey,
           lower(to_base(l_orderkey, 16)) AS hex_form,
           CAST(l_orderkey AS BIGINT) AS fb_roundtrip,
           to_base64(encode(l_returnflag || l_linestatus)) AS b64,
           replace(replace(to_base64(encode(l_returnflag || l_linestatus)), '+', '-'), '/', '_')
             AS b64url,
           lpad(hex(l_orderkey), 16, '0') AS be64_hex,
           CASE WHEN l_orderkey >= 604800
                THEN CAST(l_orderkey // 604800 AS VARCHAR) || ' week' ||
                     CASE WHEN l_orderkey // 604800 <> 1 THEN 's' ELSE '' END
                ELSE '' END AS weeks_part
    FROM lineitem WHERE l_orderkey < 300
    """,
    doc="Codec parity (reference VarbinaryFunctions.java to_base64url/"
    "to_big_endian_64, MathFunctions from_base/to_base, "
    "HumanReadableSeconds.java): DuckDB recomputes via its own to_base/"
    "to_base64/hex machinery; from_base proves the radix round-trip and "
    "weeks_part checks the human-readable decomposition's largest unit.",
    tags=("functions", "codec"),
)
def codec_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    return eng.sql(
        """
        SELECT l_orderkey,
               to_base(l_orderkey, 16) AS hex_form,
               from_base(to_base(l_orderkey, 16), 16) AS fb_roundtrip,
               base64(encode(l_returnflag || l_linestatus, 'UTF-8')) AS b64,
               to_base64url(encode(l_returnflag || l_linestatus, 'UTF-8')) AS b64url,
               hex(to_big_endian_64(l_orderkey)) AS be64_hex,
               CASE WHEN l_orderkey >= 604800
                    THEN split_part(human_readable_seconds(
                           CAST(l_orderkey AS DOUBLE)), ',', 1)
                    ELSE '' END AS weeks_part
        FROM lineitem WHERE l_orderkey < 300
        """
    )


@register(
    "try_fallback_parse",
    """
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0
                  THEN '2024-03-' || lpad(CAST(event_id % 28 + 1 AS VARCHAR), 2, '0')
                  ELSE 'not a date: ' || CAST(event_id AS VARCHAR) END AS s,
             CASE WHEN event_id % 4 = 0
                  THEN CAST(event_id % 90 AS VARCHAR) || 's'
                  ELSE 'junk' END AS d
      FROM events WHERE event_id < 3000)
    SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN substr(s, 1, 10) END AS parsed_day,
           CASE WHEN event_id % 4 = 0
                THEN CAST(event_id % 90 AS DOUBLE) END AS dur_secs
    FROM src
    """,
    doc="Generic TRY fallback (reference TryFunction.java): TRY over a "
    "non-decomposable failable function rewrites to its null-on-error "
    "twin (_TRY_FN_TWINS, plans/dialect.py) — TRY(parse_datetime(...)) -> "
    "__try_parse_datetime (try_to_timestamp under ANSI mode), "
    "TRY(parse_duration(...)) -> try_cast form. Malformed rows yield NULL "
    "instead of an ANSI error; the oracle states the expected values "
    "structurally.",
    tags=("functions", "dialect", "try"),
)
def try_fallback_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        WITH src AS (
          SELECT event_id,
                 CASE WHEN event_id % 3 = 0
                      THEN '2024-03-' || lpad(CAST(event_id % 28 + 1 AS VARCHAR), 2, '0')
                      ELSE 'not a date: ' || CAST(event_id AS VARCHAR) END AS s,
                 CASE WHEN event_id % 4 = 0
                      THEN CAST(event_id % 90 AS VARCHAR) || 's'
                      ELSE 'junk' END AS d
          FROM events WHERE event_id < 3000)
        SELECT event_id,
               date_format(TRY(parse_datetime(s, 'yyyy-MM-dd')), 'yyyy-MM-dd') AS parsed_day,
               TRY(parse_duration(d)) AS dur_secs
        FROM src
        """
    )


@register(
    "timetz_funcs_parity",
    """
    WITH src AS (
      SELECT event_id,
             event_id % 86400 AS secs,
             (event_id % 53 - 26) * 30 AS offmin
      FROM events WHERE event_id < 500),
    vals AS (
      SELECT event_id, secs, offmin,
             secs * 1000000000 * 4096 + (offmin + 1440) AS packed
      FROM src)
    SELECT event_id,
           packed,
           packed // 4096 AS nanos_back,
           packed % 4096 - 1440 AS off_back,
           ((packed // 4096 - (packed % 4096 - 1440) * 60000000000)
             % 86400000000000 + 86400000000000) % 86400000000000 AS utc_nanos,
           lpad(CAST(secs // 3600 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(secs // 60 % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(secs % 60 AS VARCHAR), 2, '0') || '.000000000' ||
           CASE WHEN offmin < 0 THEN '-' ELSE '+' END ||
           lpad(CAST(abs(offmin) // 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST(abs(offmin) % 60 AS VARCHAR), 2, '0') AS txt
    FROM vals
    """,
    doc="time(p) with time zone (reference StandardTypes.java:33, "
    "TimeWithTimeZoneType): packed-BIGINT encoding nanos_of_day*4096 + "
    "(offset_minutes+1440) — constructor, accessors, UTC-normalized "
    "comparison key, canonical text, and parse round-trip, all exact "
    "integer macros (functions/registry.py timetz_*). The oracle replays "
    "the pack arithmetic directly.",
    tags=("functions", "time", "timetz"),
)
def timetz_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        WITH src AS (
          SELECT event_id,
                 event_id % 86400 AS secs,
                 (event_id % 53 - 26) * 30 AS offmin
          FROM events WHERE event_id < 500),
        vals AS (
          SELECT event_id, secs, offmin,
                 timetz_make(secs * 1000000000, offmin) AS tz
          FROM src)
        SELECT event_id,
               tz AS packed,
               timetz_nanos(tz) AS nanos_back,
               timetz_offset_minutes(tz) AS off_back,
               timetz_utc_nanos(tz) AS utc_nanos,
               timetz_to_str(tz) AS txt
        FROM vals
        """
    )


@register(
    "bing_tile_funcs_parity",
    """
    WITH src AS (
      SELECT event_id,
             CAST(event_id % 160 AS DOUBLE) - 79.5e0 AS lat,
             CAST(event_id % 353 AS DOUBLE) - 176e0 AS lon,
             event_id % 12 + 4 AS z
      FROM events WHERE event_id < 600),
    xy AS (
      SELECT event_id, z,
             least((1::BIGINT << z) - 1, greatest(0, CAST(floor(
               (lon + 180e0) / 360e0 * CAST(1::BIGINT << z AS DOUBLE)) AS BIGINT))) AS x,
             least((1::BIGINT << z) - 1, greatest(0, CAST(floor(
               (0.5e0 - ln((1e0 + sin(greatest(-85.05112878e0, least(85.05112878e0, lat))
                 * 3.141592653589793e0 / 180e0)) /
                 (1e0 - sin(greatest(-85.05112878e0, least(85.05112878e0, lat))
                 * 3.141592653589793e0 / 180e0))) / (4e0 * 3.141592653589793e0))
               * CAST(1::BIGINT << z AS DOUBLE)) AS BIGINT))) AS y
      FROM src)
    SELECT event_id,
           x * 268435456 + y * 32 + z AS tile,
           x, y, CAST(z AS BIGINT) AS z,
           array_to_string(list_transform(range(1, CAST(z AS INT) + 1), i ->
             CAST(((x >> (z - i)) & 1) + 2 * ((y >> (z - i)) & 1) AS VARCHAR)), '') AS qk,
           TRUE AS qk_roundtrip
    FROM xy
    """,
    doc="Bing tile family (reference geospatial BingTileFunctions.java, "
    "BingTile.java): packed-BIGINT tiles, bing_tile_at Web-Mercator "
    "math, quadkey encode + decode round-trip — all exact integer/IEEE "
    "arithmetic as JVM macros, replayed formula-for-formula in the "
    "oracle.",
    tags=("functions", "geospatial", "bingtile"),
)
def bing_tile_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events")
    return eng.sql(
        """
        WITH src AS (
          SELECT event_id,
                 CAST(event_id % 160 AS DOUBLE) - 79.5e0 AS lat,
                 CAST(event_id % 353 AS DOUBLE) - 176e0 AS lon,
                 event_id % 12 + 4 AS z
          FROM events WHERE event_id < 600),
        tiles AS (
          SELECT event_id, bing_tile_at(lat, lon, z) AS tile FROM src)
        SELECT event_id, tile,
               bing_tile_x(tile) AS x, bing_tile_y(tile) AS y,
               bing_tile_zoom_level(tile) AS z,
               bing_tile_quadkey(tile) AS qk,
               bing_tile_from_quadkey(bing_tile_quadkey(tile)) = tile
                 AS qk_roundtrip
        FROM tiles
        """
    )


_GEO_ACC_BASE = """
    WITH g AS (
      SELECT s_suppkey,
             CAST(s_suppkey % 50 AS DOUBLE) AS x0,
             CAST((s_suppkey * 7) % 40 AS DOUBLE) AS y0,
             CAST(s_suppkey % 4 AS DOUBLE) AS a,
             CAST({div_expr} AS DOUBLE) AS b,
             CAST(s_suppkey % 7 AS DOUBLE) AS px,
             CAST(s_suppkey % 6 AS DOUBLE) AS dx
      FROM supplier),
    v AS (
      SELECT s_suppkey, px, dx,
             x0, y0,
             x0 AS x1, y0 AS y1,
             x0 + 4 + a AS x2, y0 + 1 AS y2,
             x0 + 5 + a AS x3, y0 + 5 + b AS y3,
             x0 - 1 AS x4, y0 + 3 + b AS y4
      FROM g)
"""


@register(
    "geometry_accessors_parity",
    _GEO_ACC_BASE.format(div_expr="(s_suppkey // 4) % 3")
    + """
    SELECT s_suppkey,
           round(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
               + sqrt((x3-x2)*(x3-x2) + (y3-y2)*(y3-y2))
               + sqrt((x4-x3)*(x4-x3) + (y4-y3)*(y4-y3))
               + sqrt((x1-x4)*(x1-x4) + (y1-y4)*(y1-y4)), 6) AS bnd_len,
           x2 AS p2x,
           x1 AS spx,
           y3 AS epy,
           CAST(2 + s_suppkey % 2 AS INT) AS ngeoms,
           round(px / 10.0, 6) AS locat,
           x0 + 2.5 AS interp_x,
           TRUE AS eq_rotated,
           CASE CAST(dx AS INT) WHEN 0 THEN 'E' WHEN 4 THEN 'T'
                WHEN 5 THEN 'D' ELSE 'O' END AS rel,
           abs((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3)
               + (x4*y1 - x1*y4)) / 2 AS wkb_area,
           CAST(21 AS INT) AS wkb_point_len,
           abs((x1*y2 - x2*y1) + (x2*y3 - x3*y2) + (x3*y4 - x4*y3)
               + (x4*y1 - x1*y4)) / 2 AS gj_area,
           x3 AS pl_x,
           round(atan2(sqrt(
               cos(radians(y0))*sin(radians(1.0))
                 * (cos(radians(y0))*sin(radians(1.0)))
               + (cos(radians(y0))*sin(radians(y0))
                  - sin(radians(y0))*cos(radians(y0))*cos(radians(1.0)))
                 * (cos(radians(y0))*sin(radians(y0))
                    - sin(radians(y0))*cos(radians(y0))*cos(radians(1.0)))),
               sin(radians(y0))*sin(radians(y0))
               + cos(radians(y0))*cos(radians(y0))*cos(radians(1.0)))
             * 6371.01 * 1000, 2) AS sph_m,
           CAST((floor((x0 + 5.7 + 180) / 360 * 64)
                 - floor((x0 + 0.3 + 180) / 360 * 64) + 1)
              * (floor((0.5 - ln((1 + sin(radians(y0 + 0.3)))
                     / (1 - sin(radians(y0 + 0.3)))) / (4 * pi())) * 64)
                 - floor((0.5 - ln((1 + sin(radians(y0 + 8.7)))
                     / (1 - sin(radians(y0 + 8.7)))) / (4 * pi())) * 64)
                 + 1) AS INT) AS ntiles
    FROM v
    """,
    doc="Accessor/relate/codec geometry parity (reference GeoFunctions.java"
    " ST_Boundary/ST_PointN/ST_StartPoint/ST_EndPoint/ST_NumGeometries/"
    "line_locate_point/line_interpolate_point/ST_Equals/ST_Touches/"
    "ST_Overlaps/ST_Disjoint/ST_AsBinary/ST_GeomFromBinary/GeoJSON/"
    "encoded-polyline codecs/stSphericalDistance; BingTileFunctions.java"
    " geometry_to_bing_tiles): every column the WKT kernel computes on the"
    " Spark side is re-derived in DuckDB with closed-form arithmetic —"
    " shoelace areas, projection fractions, Vincenty great-circle meters,"
    " and Web-Mercator tile-index floors — fully independent math paths.",
    tags=("functions", "geospatial", "geometry"),
)
def geometry_accessors_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark)
    t = Tables(spark, sf_dir)
    t.supplier.createOrReplaceTempView("supplier")
    return spark.sql(
        _GEO_ACC_BASE.format(div_expr="s_suppkey DIV 4 % 3")
        + """
        , w AS (
          SELECT s_suppkey, px, dx, x0, y0, x1, y1, x2, y2, x3, y3, x4, y4,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x1, y1, x2, y2, x3, y3, x4, y4, x1, y1) AS quad,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x3, y3, x4, y4, x1, y1, x2, y2, x3, y3) AS quad_rot,
                 format_string('LINESTRING (%s %s, %s %s, %s %s)',
                   x1, y1, x2, y2, x3, y3) AS line,
                 format_string('LINESTRING (%s %s, %s %s)',
                   x0, y0, x0 + 10, y0) AS hseg,
                 format_string('POINT (%s %s)', x0 + px, y0 + 3) AS probe,
                 CASE WHEN s_suppkey % 2 = 0
                      THEN format_string('MULTIPOINT (%s %s, %s %s)',
                                         x0, y0, x0 + 1, y0)
                      ELSE format_string('MULTIPOINT (%s %s, %s %s, %s %s)',
                                         x0, y0, x0 + 1, y0, x0 + 2, y0)
                 END AS mpt,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x0, y0, x0 + 4, y0, x0 + 4, y0 + 4, x0, y0 + 4,
                   x0, y0) AS rect_a,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x0 + dx, y0, x0 + dx + 4, y0, x0 + dx + 4, y0 + 4,
                   x0 + dx, y0 + 4, x0 + dx, y0) AS rect_b,
                 format_string('POINT (%s %s)', x0, y0) AS pt,
                 format_string('POINT (%s %s)', x0 + 1, y0) AS pt_e,
                 format_string(
                   'POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
                   x0 + 0.3, y0 + 0.3, x0 + 5.7, y0 + 0.3,
                   x0 + 5.7, y0 + 8.7, x0 + 0.3, y0 + 8.7,
                   x0 + 0.3, y0 + 0.3) AS tile_rect
          FROM v)
        SELECT s_suppkey,
               round(st_length(st_boundary(quad)), 6) AS bnd_len,
               st_x(st_pointn(line, 2)) AS p2x,
               st_x(st_startpoint(line)) AS spx,
               st_y(st_endpoint(line)) AS epy,
               st_numgeometries(mpt) AS ngeoms,
               round(line_locate_point(hseg, probe), 6) AS locat,
               st_x(line_interpolate_point(hseg, 0.25)) AS interp_x,
               st_equals(quad, quad_rot) AS eq_rotated,
               CASE WHEN st_equals(rect_a, rect_b) THEN 'E'
                    WHEN st_overlaps(rect_a, rect_b) THEN 'O'
                    WHEN st_touches(rect_a, rect_b) THEN 'T'
                    WHEN st_disjoint(rect_a, rect_b) THEN 'D'
               END AS rel,
               st_area(st_geomfrombinary(st_asbinary(quad))) AS wkb_area,
               CAST(length(st_asbinary(pt)) AS INT) AS wkb_point_len,
               st_area(from_geojson_geometry(to_geojson_geometry(quad)))
                 AS gj_area,
               st_x(st_pointn(
                 from_encoded_polyline(to_encoded_polyline(line)), 3))
                 AS pl_x,
               round(st_spherical_distance(
                 to_spherical_geography(pt),
                 to_spherical_geography(pt_e)), 2) AS sph_m,
               CAST(size(geometry_to_bing_tiles(tile_rect, 6)) AS INT)
                 AS ntiles
        FROM w
        """
    )
