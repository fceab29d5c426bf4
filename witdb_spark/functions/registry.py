"""Trino-name -> Spark mapping tables + SQL-macro registration.

Citations refer to the reference's scalar function files under
core/trino-main/src/main/java/io/trino/operator/scalar/ (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Tier 1: identical name+semantics in Spark (value = Spark name).
# Reference: StringFunctions.java:72-838, MathFunctions.java,
# DateTimeFunctions.java, Array*/Map* scalar files, UrlFunctions.java,
# VarbinaryFunctions.java, JoniRegexpFunctions.java.
# --------------------------------------------------------------------------
PASSTHROUGH: dict[str, str] = {
    # string
    "length": "length", "lower": "lower", "upper": "upper", "trim": "trim",
    "ltrim": "ltrim", "rtrim": "rtrim", "reverse": "reverse",
    "replace": "replace", "substr": "substr", "substring": "substring",
    "lpad": "lpad", "rpad": "rpad", "concat": "concat", "concat_ws": "concat_ws",
    "split_part": "split_part", "starts_with": "startswith",
    "translate": "translate", "levenshtein_distance": "levenshtein",
    "soundex": "soundex",
    "split_to_map": "str_to_map", "format": "format_string",
    "chr": "chr",  # Spark 4 ships chr natively
    # regex (Java dialect in both engines' common subset)
    "regexp_like": "rlike", "regexp_extract": "regexp_extract",
    "regexp_extract_all": "regexp_extract_all", "regexp_replace": "regexp_replace",
    "regexp_count": "regexp_count", "regexp_position": "regexp_instr",
    # math
    "abs": "abs", "cbrt": "cbrt", "ceil": "ceil", "ceiling": "ceiling",
    "exp": "exp", "floor": "floor", "ln": "ln", "log2": "log2", "log10": "log10",
    "log": "log", "mod": "mod", "pi": "pi", "pow": "pow", "power": "power",
    "radians": "radians", "degrees": "degrees", "round": "round", "sign": "sign",
    "sqrt": "sqrt", "random": "rand", "width_bucket": "width_bucket",
    "sin": "sin", "cos": "cos", "tan": "tan", "asin": "asin", "acos": "acos",
    "atan": "atan", "atan2": "atan2", "sinh": "sinh", "cosh": "cosh",
    "tanh": "tanh", "is_nan": "isnan", "greatest": "greatest", "least": "least",
    # datetime
    "date_trunc": "date_trunc", "year": "year", "month": "month", "day": "day",
    "hour": "hour", "minute": "minute", "second": "second", "quarter": "quarter",
    "day_of_year": "dayofyear", "week": "weekofyear", "week_of_year": "weekofyear",
    "last_day_of_month": "last_day", "now": "now",
    "current_timezone": "current_timezone",
    "current_date": "current_date", "current_timestamp": "current_timestamp",
    "from_unixtime": "timestamp_seconds",
    # array (element_at/slice/array_position are 1-based in BOTH engines;
    # Trino's negative element_at also matches Spark)
    "cardinality": "cardinality", "contains": "array_contains",
    "array_distinct": "array_distinct", "array_except": "array_except",
    "array_intersect": "array_intersect", "array_union": "array_union",
    "array_join": "array_join", "array_max": "array_max", "array_min": "array_min",
    "array_position": "array_position", "array_remove": "array_remove",
    "array_sort": "array_sort", "arrays_overlap": "arrays_overlap",
    "element_at": "element_at", "filter": "filter", "flatten": "flatten",
    "reduce": "aggregate", "repeat": "array_repeat", "sequence": "sequence",
    "shuffle": "shuffle", "slice": "slice", "transform": "transform",
    "zip": "arrays_zip", "zip_with": "zip_with",
    # map
    "map_concat": "map_concat", "map_entries": "map_entries",
    "map_filter": "map_filter", "map_from_entries": "map_from_entries",
    "map_keys": "map_keys", "map_values": "map_values",
    "map_zip_with": "map_zip_with", "transform_keys": "transform_keys",
    "transform_values": "transform_values",
    # binary / hashing (sha256/to_hex/... need arg or case fixes -> MACROS)
    "md5": "md5", "sha1": "sha1", "crc32": "crc32", "xxhash64": "xxhash64",
    # json (legacy; JsonPath common subset)
    "json_extract": "get_json_object", "json_extract_scalar": "get_json_object",
    "json_array_length": "json_array_length",
    # url
    "url_encode": "url_encode", "url_decode": "url_decode",
    # conditional / misc
    "coalesce": "coalesce", "nullif": "nullif", "if": "if", "try_cast": "try_cast",
    "typeof": "typeof", "uuid": "uuid", "version": "version",
    "current_user": "current_user", "luhn_check": "luhn_check",
    "current_schema": "current_schema", "current_catalog": "current_catalog",
    # numeric_histogram is arg-swapped vs Spark's histogram_numeric and is
    # handled as a dialect rewrite (plans/dialect.py), not a passthrough
    "bit_count": "bit_count",
}

# --------------------------------------------------------------------------
# Tier 2: SQL-expression macros for Trino functions Spark lacks.
# Registered via CREATE TEMPORARY FUNCTION — pure Catalyst, codegen'd.
# --------------------------------------------------------------------------

# MySQL-% pattern -> java.time pattern translation chain (reference
# DateTimeFunctions.java `date_format`; common tokens).
# MySQL % tokens -> java.time pattern (reference DateTimeFunctions.java
# dateFormat/dateParse token table). '%%' is masked to chr(1) FIRST so a
# literal percent neither matches a token nor trips the untranslated-%
# rejection in date_parse, and is restored LAST.
_MYSQL_TOKEN_MAP = (
    ("%Y", "yyyy"), ("%y", "yy"), ("%M", "MMMM"), ("%m", "MM"),
    ("%d", "dd"), ("%e", "d"), ("%H", "HH"), ("%h", "hh"), ("%I", "hh"),
    ("%i", "mm"), ("%s", "ss"), ("%S", "ss"), ("%T", "HH:mm:ss"),
    ("%j", "DDD"), ("%f", "SSSSSS"), ("%p", "a"), ("%k", "H"),
    ("%l", "h"), ("%r", "hh:mm:ss a"), ("%W", "EEEE"), ("%a", "EEE"),
    ("%b", "MMM"), ("%c", "M"),
)


def _mysql_fmt_chain(var: str = "fmt") -> str:
    """Token-translated pattern WITHOUT the %% restore (so callers can
    test for untranslated % tokens before restoring the literal)."""
    e = f"replace({var}, '%%', chr(1))"
    for tok, rep in _MYSQL_TOKEN_MAP:
        e = f"replace({e}, '{tok}', '{rep}')"
    return e


_MYSQL_FMT_PRE = _mysql_fmt_chain()
_MYSQL_FMT = f"replace({_MYSQL_FMT_PRE}, chr(1), '%')"

# Joda Z/Y token -> java.time translation for one unquoted pattern segment.
_JODA_SEG = (
    "replace(replace(replace(replace(replace(seg,"
    "'ZZZ','VV'),'ZZ','xxx'),'Z','xx'),'YYYY','yyyy'),'Y','y')"
)


def _JODA_FMT(var: str) -> str:
    """Joda -> java.time pattern translation applied only OUTSIDE
    single-quoted literal sections: split on the quote char (even segments
    are unquoted), translate those, join back with the quotes."""
    return (
        f"array_join(transform(split({var}, \"'\"), (seg, i) -> "
        f"IF(i % 2 = 0, {_JODA_SEG}, seg)), \"'\")"
    )

MACROS: dict[str, str] = {
    # --- string (StringFunctions.java) ---
    "strpos": "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
    "RETURNS INT RETURN instr(s, sub)",
    "codepoint": "CREATE OR REPLACE TEMPORARY FUNCTION codepoint(s STRING) "
    "RETURNS INT RETURN ascii(s)",
    # reference StringFunctions.java hamming_distance RAISES on unequal
    # lengths; zip_with would silently pad with NULLs and undercount.
    "hamming_distance": "CREATE OR REPLACE TEMPORARY FUNCTION hamming_distance"
    "(a STRING, b STRING) RETURNS BIGINT RETURN "
    "CASE WHEN length(a) <> length(b) THEN "
    "raise_error('hamming_distance: strings must have the same length') "
    "ELSE aggregate(zip_with(split(a, ''), split(b, ''), "
    "(x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END), 0L, (acc, v) -> acc + v) END",
    "from_utf8": "CREATE OR REPLACE TEMPORARY FUNCTION from_utf8(b BINARY) "
    "RETURNS STRING RETURN decode(b, 'UTF-8')",
    "to_utf8": "CREATE OR REPLACE TEMPORARY FUNCTION to_utf8(s STRING) "
    "RETURNS BINARY RETURN encode(s, 'UTF-8')",
    # --- math (MathFunctions.java) ---
    "truncate": "CREATE OR REPLACE TEMPORARY FUNCTION truncate(x DOUBLE) "
    "RETURNS DOUBLE RETURN sign(x) * floor(abs(x))",
    "infinity": "CREATE OR REPLACE TEMPORARY FUNCTION infinity() "
    "RETURNS DOUBLE RETURN double('Infinity')",
    "nan": "CREATE OR REPLACE TEMPORARY FUNCTION nan() "
    "RETURNS DOUBLE RETURN double('NaN')",
    "is_finite": "CREATE OR REPLACE TEMPORARY FUNCTION is_finite(x DOUBLE) "
    "RETURNS BOOLEAN RETURN NOT isnan(x) AND abs(x) <> double('Infinity')",
    "is_infinite": "CREATE OR REPLACE TEMPORARY FUNCTION is_infinite(x DOUBLE) "
    "RETURNS BOOLEAN RETURN abs(x) = double('Infinity')",
    "cosine_similarity": "CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity"
    "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) / "
    "(sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x)) * "
    " sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))",
    "wilson_interval_lower": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "wilson_interval_lower(s BIGINT, n BIGINT, z DOUBLE) RETURNS DOUBLE RETURN "
    "(s + z*z/2) / (n + z*z) - z / (n + z*z) * sqrt(s * (n - s) / n + z*z/4)",
    "wilson_interval_upper": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "wilson_interval_upper(s BIGINT, n BIGINT, z DOUBLE) RETURNS DOUBLE RETURN "
    "(s + z*z/2) / (n + z*z) + z / (n + z*z) * sqrt(s * (n - s) / n + z*z/4)",
    # --- datetime (DateTimeFunctions.java) ---
    "to_unixtime": "CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(ts TIMESTAMP) "
    "RETURNS DOUBLE RETURN cast(unix_micros(ts) AS DOUBLE) / 1e6",
    "day_of_week": "CREATE OR REPLACE TEMPORARY FUNCTION day_of_week(ts TIMESTAMP) "
    "RETURNS INT RETURN ((dayofweek(ts) + 5) % 7) + 1",  # ISO: Mon=1..Sun=7
    "year_of_week": "CREATE OR REPLACE TEMPORARY FUNCTION year_of_week(ts TIMESTAMP) "
    "RETURNS INT RETURN extract(YEAROFWEEK FROM ts)",
    # pmod: pre-1970 instants still land in [0, 999] (Trino's range; a
    # signed % would return -500 for 1969-12-31 23:59:59.5)
    "millisecond": "CREATE OR REPLACE TEMPORARY FUNCTION millisecond(ts TIMESTAMP) "
    "RETURNS INT RETURN cast(pmod(unix_micros(ts), 1000000) / 1000 AS INT)",
    "trino_date_add": "CREATE OR REPLACE TEMPORARY FUNCTION trino_date_add"
    "(unit STRING, n INT, ts TIMESTAMP) RETURNS TIMESTAMP RETURN CASE lower(unit) "
    "WHEN 'second' THEN timestampadd(SECOND, n, ts) "
    "WHEN 'minute' THEN timestampadd(MINUTE, n, ts) "
    "WHEN 'hour' THEN timestampadd(HOUR, n, ts) "
    "WHEN 'day' THEN timestampadd(DAY, n, ts) "
    "WHEN 'week' THEN timestampadd(WEEK, n, ts) "
    "WHEN 'month' THEN timestampadd(MONTH, n, ts) "
    "WHEN 'quarter' THEN timestampadd(QUARTER, n, ts) "
    "WHEN 'year' THEN timestampadd(YEAR, n, ts) END",
    "trino_date_diff": "CREATE OR REPLACE TEMPORARY FUNCTION trino_date_diff"
    "(unit STRING, t1 TIMESTAMP, t2 TIMESTAMP) RETURNS BIGINT RETURN CASE lower(unit) "
    "WHEN 'second' THEN timestampdiff(SECOND, t1, t2) "
    "WHEN 'minute' THEN timestampdiff(MINUTE, t1, t2) "
    "WHEN 'hour' THEN timestampdiff(HOUR, t1, t2) "
    "WHEN 'day' THEN timestampdiff(DAY, t1, t2) "
    "WHEN 'week' THEN timestampdiff(WEEK, t1, t2) "
    "WHEN 'month' THEN timestampdiff(MONTH, t1, t2) "
    "WHEN 'quarter' THEN timestampdiff(QUARTER, t1, t2) "
    "WHEN 'year' THEN timestampdiff(YEAR, t1, t2) END",
    # Joda (reference format_datetime, DateTimeFunctions.java) vs java.time:
    # most tokens agree (yyyy/MM/dd/HH/mm/ss/EEE/MMM) but Joda 'Y' is
    # year-of-era while java.time 'Y' is WEEK-BASED year (silently wrong at
    # year boundaries), and Joda's Z-family offsets map to x/V patterns —
    # 'ZZ' must become lowercase 'xxx' ('XXX' prints the literal 'Z' at zero
    # offset where Joda prints '+00:00'). Translation runs only OUTSIDE
    # single-quoted pattern literals: split on the quote, rewrite even
    # segments, join back. Joda 'e' (ISO day number) stays a documented gap.
    "format_datetime": "CREATE OR REPLACE TEMPORARY FUNCTION format_datetime"
    "(ts TIMESTAMP, fmt STRING) RETURNS STRING RETURN date_format(ts, "
    f"{_JODA_FMT('fmt')})",
    "parse_datetime": "CREATE OR REPLACE TEMPORARY FUNCTION parse_datetime"
    "(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN to_timestamp(s, "
    f"{_JODA_FMT('fmt')})",
    # null-on-error twin backing TRY(parse_datetime(...)) — the dialect's
    # generic TRY fallback (plans/dialect.py _TRY_FN_TWINS) rewrites to it
    "__try_parse_datetime": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "__try_parse_datetime(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN "
    f"try_to_timestamp(s, {_JODA_FMT('fmt')})",
    "mysql_date_format": "CREATE OR REPLACE TEMPORARY FUNCTION mysql_date_format"
    f"(ts TIMESTAMP, fmt STRING) RETURNS STRING RETURN date_format(ts, {_MYSQL_FMT})",
    # reference DateTimeFunctions.java:376 dateParse — MySQL-%-pattern
    # PARSE (the inverse of date_format); same token translation chain.
    # Trino semantics: RAISES on unparseable input (to_timestamp's NULL
    # would be silent) and REJECTS format strings with tokens outside
    # the translation table (they would otherwise pass through literally
    # and mis-parse at runtime). TRY(date_parse(..)) routes to the
    # null-on-error twin below.
    "date_parse": "CREATE OR REPLACE TEMPORARY FUNCTION date_parse"
    "(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN CASE "
    "WHEN s IS NULL OR fmt IS NULL THEN NULL "
    f"WHEN contains({_MYSQL_FMT_PRE}, '%') THEN "
    "cast(raise_error(concat('date_parse: unsupported format token in ', fmt)) "
    "AS TIMESTAMP) "
    f"WHEN try_to_timestamp(s, {_MYSQL_FMT}) IS NULL THEN "
    "cast(raise_error(concat('date_parse: invalid value ', s, "
    "' for format ', fmt)) AS TIMESTAMP) "
    f"ELSE try_to_timestamp(s, {_MYSQL_FMT}) END",
    "__try_date_parse": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "__try_date_parse(s STRING, fmt STRING) RETURNS TIMESTAMP RETURN "
    f"try_to_timestamp(s, {_MYSQL_FMT})",
    "parse_duration": "CREATE OR REPLACE TEMPORARY FUNCTION parse_duration(s STRING) "
    "RETURNS DOUBLE RETURN cast(regexp_extract(s, '^([0-9.]+)', 1) AS DOUBLE) * "
    "CASE regexp_extract(s, '([a-z]+)$', 1) "
    "WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6 WHEN 'ms' THEN 1e-3 "
    "WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0 WHEN 'h' THEN 3600.0 "
    "WHEN 'd' THEN 86400.0 END",  # seconds, reference util/Duration parsing
    "__try_parse_duration": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "__try_parse_duration(s STRING) RETURNS DOUBLE RETURN "
    "try_cast(regexp_extract(s, '^([0-9.]+)', 1) AS DOUBLE) * "
    "CASE regexp_extract(s, '([a-z]+)$', 1) "
    "WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6 WHEN 'ms' THEN 1e-3 "
    "WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0 WHEN 'h' THEN 3600.0 "
    "WHEN 'd' THEN 86400.0 END",
    # at_timezone/with_timezone (reference DateTimeFunctions.java): our
    # timestamps are NTZ (parquet timestamp_ntz), so at_timezone =
    # "reinterpret this UTC instant in zone tz" = convert_timezone.
    "at_timezone": "CREATE OR REPLACE TEMPORARY FUNCTION at_timezone"
    "(ts TIMESTAMP_NTZ, tz STRING) RETURNS TIMESTAMP_NTZ RETURN "
    "convert_timezone('UTC', tz, ts)",
    "with_timezone": "CREATE OR REPLACE TEMPORARY FUNCTION with_timezone"
    "(ts TIMESTAMP_NTZ, tz STRING) RETURNS TIMESTAMP_NTZ RETURN "
    "convert_timezone(tz, 'UTC', ts)",
    "to_iso8601": "CREATE OR REPLACE TEMPORARY FUNCTION to_iso8601(ts TIMESTAMP) "
    "RETURNS STRING RETURN date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSS\")",
    # ISO-8601 parse pair (reference DateTimeFunctions.java
    # from_iso8601_timestamp / from_iso8601_date): Spark's CAST accepts
    # ISO-8601 text incl. offsets (converted into the session zone).
    "from_iso8601_timestamp": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "from_iso8601_timestamp(s STRING) RETURNS TIMESTAMP RETURN "
    "cast(s AS TIMESTAMP)",
    "from_iso8601_date": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "from_iso8601_date(s STRING) RETURNS DATE RETURN cast(s AS DATE)",
    # null-on-error twins for the TRY fallback (plans/dialect.py)
    "__try_from_iso8601_timestamp": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "__try_from_iso8601_timestamp(s STRING) RETURNS TIMESTAMP RETURN "
    "try_cast(s AS TIMESTAMP)",
    "__try_from_iso8601_date": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "__try_from_iso8601_date(s STRING) RETURNS DATE RETURN try_cast(s AS DATE)",
    # reference timestamp(9) nanos clamp to our micros domain (documented
    # precision: parquet fixtures are micros; sub-micro truncates)
    "from_unixtime_nanos": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "from_unixtime_nanos(n BIGINT) RETURNS TIMESTAMP RETURN "
    "timestamp_micros(n DIV 1000)",
    "to_milliseconds": "CREATE OR REPLACE TEMPORARY FUNCTION to_milliseconds"
    "(i INTERVAL DAY TO SECOND) RETURNS BIGINT RETURN "
    "extract(DAY FROM i) * 86400000 + extract(HOUR FROM i) * 3600000 + "
    "extract(MINUTE FROM i) * 60000 + cast(extract(SECOND FROM i) * 1000 AS BIGINT)",
    # --- base conversion (reference MathFunctions.java from_base/to_base;
    # Trino prints lowercase digits, conv() uppercase) ---
    "from_base": "CREATE OR REPLACE TEMPORARY FUNCTION from_base"
    "(s STRING, r INT) RETURNS BIGINT RETURN cast(conv(s, r, 10) AS BIGINT)",
    "to_base": "CREATE OR REPLACE TEMPORARY FUNCTION to_base"
    "(x BIGINT, r INT) RETURNS STRING RETURN lower(conv(x, 10, r))",
    # --- base64url (reference VarbinaryFunctions.java) ---
    "to_base64url": "CREATE OR REPLACE TEMPORARY FUNCTION to_base64url"
    "(b BINARY) RETURNS STRING RETURN "
    "replace(replace(base64(b), '+', '-'), '/', '_')",
    "from_base64url": "CREATE OR REPLACE TEMPORARY FUNCTION from_base64url"
    "(s STRING) RETURNS BINARY RETURN "
    "unbase64(replace(replace(s, '-', '+'), '_', '/'))",
    # --- url (UrlFunctions.java) ---
    "url_extract_host": "CREATE OR REPLACE TEMPORARY FUNCTION url_extract_host"
    "(u STRING) RETURNS STRING RETURN parse_url(u, 'HOST')",
    "url_extract_path": "CREATE OR REPLACE TEMPORARY FUNCTION url_extract_path"
    "(u STRING) RETURNS STRING RETURN parse_url(u, 'PATH')",
    "url_extract_protocol": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "url_extract_protocol(u STRING) RETURNS STRING RETURN parse_url(u, 'PROTOCOL')",
    "url_extract_query": "CREATE OR REPLACE TEMPORARY FUNCTION url_extract_query"
    "(u STRING) RETURNS STRING RETURN parse_url(u, 'QUERY')",
    "url_extract_fragment": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "url_extract_fragment(u STRING) RETURNS STRING RETURN parse_url(u, 'REF')",
    # Spark parse_url has no 'PORT' key; take the :port suffix of AUTHORITY
    # (try_cast yields NULL when there is no port, matching Trino). The
    # regexp anchor keeps IPv6 authorities correct: '[::1]:8080' -> 8080,
    # bare '[::1]' -> NULL (a naive split-on-':' would return 1).
    "url_extract_port": "CREATE OR REPLACE TEMPORARY FUNCTION url_extract_port"
    "(u STRING) RETURNS BIGINT RETURN "
    "try_cast(nullif(regexp_extract(parse_url(u, 'AUTHORITY'),"
    " ':([0-9]+)$', 1), '') AS BIGINT)",
    "url_extract_parameter": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "url_extract_parameter(u STRING, k STRING) RETURNS STRING RETURN "
    "parse_url(u, 'QUERY', k)",
    # --- TIME type (reference core/trino-spi/.../type/TimeType.java stores
    # picoseconds-of-day in a long; here the encoding is NANOS-of-day BIGINT
    # — int64 covers the day at nanos, matches the events.ts_ns convention,
    # and sorts/compares/groups natively. CAST(x AS TIME) and
    # LOCALTIME/CURRENT_TIME are dialect rewrites onto these macros.) ---
    "trino_time": "CREATE OR REPLACE TEMPORARY FUNCTION trino_time(s STRING) "
    "RETURNS BIGINT RETURN "
    "(cast(split(s, ':')[0] AS BIGINT) * 3600"
    " + cast(split(s, ':')[1] AS BIGINT) * 60"
    " + cast(split_part(split(s, ':')[2], '.', 1) AS BIGINT)) * 1000000000"
    " + cast(rpad(coalesce(nullif(split_part(split(s, ':')[2], '.', 2), ''),"
    " '0'), 9, '0') AS BIGINT)",
    "time_hour": "CREATE OR REPLACE TEMPORARY FUNCTION time_hour(t BIGINT) "
    "RETURNS BIGINT RETURN t DIV 3600000000000",
    "time_minute": "CREATE OR REPLACE TEMPORARY FUNCTION time_minute(t BIGINT) "
    "RETURNS BIGINT RETURN (t DIV 60000000000) % 60",
    "time_second": "CREATE OR REPLACE TEMPORARY FUNCTION time_second(t BIGINT) "
    "RETURNS BIGINT RETURN (t DIV 1000000000) % 60",
    "time_millisecond": "CREATE OR REPLACE TEMPORARY FUNCTION time_millisecond"
    "(t BIGINT) RETURNS BIGINT RETURN (t DIV 1000000) % 1000",
    # time-of-day of an instant in the SESSION zone (Trino LOCALTIME /
    # CURRENT_TIME semantics): shift the instant into session wall time
    # first, so a non-UTC spark.sql.session.timeZone still yields local
    # time-of-day; pmod keeps pre-1970 instants positive. For TIMESTAMP_NTZ
    # inputs the NTZ->TZ coercion and this shift cancel, so wall micros
    # round-trip in any zone (matching the DuckDB oracle's naive micros).
    "time_of_day": "CREATE OR REPLACE TEMPORARY FUNCTION time_of_day"
    "(ts TIMESTAMP) RETURNS BIGINT RETURN "
    "pmod(unix_micros(from_utc_timestamp(ts, current_timezone())), 86400000000) * 1000",
    # canonical text form at full precision (Trino casts TIME(p) to varchar
    # at type precision; nanos encoding fixes p=9)
    "time_to_str": "CREATE OR REPLACE TEMPORARY FUNCTION time_to_str(t BIGINT) "
    "RETURNS STRING RETURN "
    "concat(lpad(cast(t DIV 3600000000000 AS STRING), 2, '0'), ':', "
    "lpad(cast((t DIV 60000000000) % 60 AS STRING), 2, '0'), ':', "
    "lpad(cast((t DIV 1000000000) % 60 AS STRING), 2, '0'), '.', "
    "lpad(cast(t % 1000000000 AS STRING), 9, '0'))",
    # --- array (ArrayNgramsFunction.java, trim_array) ---
    # guard: sequence(1, 0) DESCENDS in Spark, so short arrays need the if()
    "ngrams": "CREATE OR REPLACE TEMPORARY FUNCTION ngrams(a ARRAY<STRING>, n INT) "
    "RETURNS ARRAY<ARRAY<STRING>> RETURN if(size(a) < n, array(), "
    "transform(sequence(1, size(a) - n + 1), i -> slice(a, i, n)))",
    "trim_array": "CREATE OR REPLACE TEMPORARY FUNCTION trim_array"
    "(a ARRAY<STRING>, n INT) RETURNS ARRAY<STRING> RETURN "
    "slice(a, 1, size(a) - n)",
    "array_average": "CREATE OR REPLACE TEMPORARY FUNCTION array_average"
    "(a ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
    "aggregate(a, 0D, (acc, x) -> acc + x) / size(a)",
    "array_sum": "CREATE OR REPLACE TEMPORARY FUNCTION array_sum(a ARRAY<DOUBLE>) "
    "RETURNS DOUBLE RETURN aggregate(a, 0D, (acc, x) -> acc + x)",
    # --- binary / codec (VarbinaryFunctions.java; Trino returns varbinary
    # from the sha* family and UPPERCASE hex from to_hex) ---
    "sha256": "CREATE OR REPLACE TEMPORARY FUNCTION sha256(b BINARY) "
    "RETURNS BINARY RETURN unhex(sha2(b, 256))",
    "sha512": "CREATE OR REPLACE TEMPORARY FUNCTION sha512(b BINARY) "
    "RETURNS BINARY RETURN unhex(sha2(b, 512))",
    "to_hex": "CREATE OR REPLACE TEMPORARY FUNCTION to_hex(b BINARY) "
    "RETURNS STRING RETURN upper(hex(b))",
    "from_hex": "CREATE OR REPLACE TEMPORARY FUNCTION from_hex(s STRING) "
    "RETURNS BINARY RETURN unhex(s)",
    "to_base64": "CREATE OR REPLACE TEMPORARY FUNCTION to_base64(b BINARY) "
    "RETURNS STRING RETURN base64(b)",
    "from_base64": "CREATE OR REPLACE TEMPORARY FUNCTION from_base64(s STRING) "
    "RETURNS BINARY RETURN unbase64(s)",
    # --- bitwise (BitwiseFunctions.java: two's-complement 64-bit) ---
    "bitwise_and": "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_and"
    "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a & b",
    "bitwise_or": "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_or"
    "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a | b",
    "bitwise_xor": "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_xor"
    "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN a ^ b",
    "bitwise_not": "CREATE OR REPLACE TEMPORARY FUNCTION bitwise_not"
    "(a BIGINT) RETURNS BIGINT RETURN ~a",
    "bitwise_left_shift": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bitwise_left_shift(a BIGINT, n INT) RETURNS BIGINT RETURN shiftleft(a, n)",
    "bitwise_right_shift": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bitwise_right_shift(a BIGINT, n INT) RETURNS BIGINT RETURN "
    "shiftrightunsigned(a, n)",  # Trino right shift is logical (zero-fill)
    "bitwise_right_shift_arithmetic": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bitwise_right_shift_arithmetic(a BIGINT, n INT) RETURNS BIGINT RETURN "
    "shiftright(a, n)",
    # --- map constructors (MultimapFromEntriesFunction.java,
    # SplitToMultimapFunction.java; string-specialized — Trino's are
    # generic, Spark SQL macros are monomorphic) ---
    "multimap_from_entries": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "multimap_from_entries(a ARRAY<STRUCT<k: STRING, v: STRING>>) "
    "RETURNS MAP<STRING, ARRAY<STRING>> RETURN map_from_entries("
    "transform(array_distinct(transform(a, e -> e.k)), "
    "k -> struct(k, transform(filter(a, e -> e.k = k), e -> e.v))))",
    "split_to_multimap": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "split_to_multimap(s STRING, ed STRING, kvd STRING) "
    "RETURNS MAP<STRING, ARRAY<STRING>> RETURN multimap_from_entries("
    "transform(split(s, ed), p -> struct(split_part(p, kvd, 1), "
    "substr(p, instr(p, kvd) + length(kvd)))))",
    # --- json (JsonFunctions.java) ---
    "json_parse": "CREATE OR REPLACE TEMPORARY FUNCTION json_parse(s STRING) "
    "RETURNS STRING RETURN s",  # json type is modeled as string (SURVEY §1.2)
    "json_format": "CREATE OR REPLACE TEMPORARY FUNCTION json_format(s STRING) "
    "RETURNS STRING RETURN s",
    # objects -> member count, arrays -> element count, scalars -> 0
    # (reference JsonFunctions.jsonSize); malformed/missing -> NULL
    "json_size": "CREATE OR REPLACE TEMPORARY FUNCTION json_size"
    "(s STRING, p STRING) RETURNS INT RETURN CASE "
    "WHEN get_json_object(s, p) IS NULL THEN NULL "
    "WHEN substring(ltrim(get_json_object(s, p)), 1, 1) = '{' THEN "
    "size(from_json(get_json_object(s, p), 'map<string,string>')) "
    "WHEN substring(ltrim(get_json_object(s, p)), 1, 1) = '[' THEN "
    "cast(json_array_length(get_json_object(s, p)) AS INT) "
    "ELSE 0 END",
    # --- geospatial (plugin/trino-geospatial GeoFunctions.java). Geometry
    # IS its WKT text; the ST_* computational family (area/centroid/
    # contains/intersects/distance over polygons with holes) lives in
    # functions/geometry.py as Arrow-batched pandas UDFs. Only the
    # constructors that are pure string math stay macros (JVM-side). ---
    "st_point": "CREATE OR REPLACE TEMPORARY FUNCTION st_point"
    "(x DOUBLE, y DOUBLE) RETURNS STRING RETURN "
    "concat('POINT (', cast(x AS STRING), ' ', cast(y AS STRING), ')')",
    "st_envelope_contains": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "st_envelope_contains(xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE,"
    " p STRING) RETURNS BOOLEAN RETURN "
    "st_x(p) >= xmin AND st_x(p) <= xmax AND st_y(p) >= ymin AND st_y(p) <= ymax",
    # core Trino (MathFunctions.java great_circle_distance, km, haversine)
    "great_circle_distance": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "great_circle_distance(lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)"
    " RETURNS DOUBLE RETURN 2 * 6371.01 * asin(sqrt("
    "pow(sin(radians(lat2 - lat1) / 2), 2) + cos(radians(lat1)) * "
    "cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)))",
    # --- teradata compat (plugin/trino-teradata-functions) ---
    "index": "CREATE OR REPLACE TEMPORARY FUNCTION index(s STRING, sub STRING) "
    "RETURNS BIGINT RETURN instr(s, sub)",
    "char2hexint": "CREATE OR REPLACE TEMPORARY FUNCTION char2hexint(s STRING) "
    "RETURNS STRING RETURN upper(hex(encode(s, 'UTF-16BE')))",
    # --- misc (DataSizeFunctions.java) ---
    "parse_data_size": "CREATE OR REPLACE TEMPORARY FUNCTION parse_data_size"
    "(s STRING) RETURNS DECIMAL(38,0) RETURN cast("
    "cast(regexp_extract(s, '^([0-9.]+)', 1) AS DOUBLE) * "
    "CASE regexp_extract(s, '([A-Za-z]+)$', 1) "
    "WHEN 'B' THEN 1 WHEN 'kB' THEN 1024 WHEN 'MB' THEN 1048576 "
    "WHEN 'GB' THEN 1073741824 WHEN 'TB' THEN 1099511627776 "
    "WHEN 'PB' THEN 1125899906842624 END AS DECIMAL(38,0))",
    # --- time(p) with time zone (reference StandardTypes.java:33,
    # TimeWithTimeZoneType short/long encodings). Spark has no zoned
    # time-of-day type, so the value is a packed BIGINT:
    #   packed = nanos_of_day * 4096 + (offset_minutes + 1440)
    # nanos_of_day < 86400e9 < 2^47 and offset in [-1440, +1440], so the
    # pack fits 59 bits; all ops are exact integer arithmetic, JVM-side.
    # Ordering follows Trino: comparisons use the UTC-normalized nanos
    # (timetz_utc_nanos), not the raw packed value. ---
    "timetz_make": "CREATE OR REPLACE TEMPORARY FUNCTION timetz_make"
    "(nanos BIGINT, offmin BIGINT) RETURNS BIGINT RETURN "
    "nanos * 4096 + (offmin + 1440)",
    "timetz_nanos": "CREATE OR REPLACE TEMPORARY FUNCTION timetz_nanos"
    "(t BIGINT) RETURNS BIGINT RETURN t DIV 4096",
    "timetz_offset_minutes": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "timetz_offset_minutes(t BIGINT) RETURNS BIGINT RETURN t % 4096 - 1440",
    "timetz_utc_nanos": "CREATE OR REPLACE TEMPORARY FUNCTION timetz_utc_nanos"
    "(t BIGINT) RETURNS BIGINT RETURN "
    "pmod(t DIV 4096 - (t % 4096 - 1440) * 60000000000, 86400000000000)",
    # missing pieces (seconds, fraction) parse as 0 via the nullif guard
    "timetz_parse": "CREATE OR REPLACE TEMPORARY FUNCTION timetz_parse"
    "(s STRING) RETURNS BIGINT RETURN timetz_make("
    "cast(coalesce(nullif(regexp_extract(s, '^([0-9]+):', 1), ''), '0') AS BIGINT)"
    " * 3600000000000 + "
    "cast(coalesce(nullif(regexp_extract(s, '^[0-9]+:([0-9]+)', 1), ''), '0') AS BIGINT)"
    " * 60000000000 + "
    "cast(coalesce(nullif(regexp_extract(s, '^[0-9]+:[0-9]+:([0-9]+)', 1), ''), '0') AS BIGINT)"
    " * 1000000000 + "
    "cast(rpad(coalesce(nullif(regexp_extract(s, '[.]([0-9]+)', 1), ''), '0'), 9, '0') AS BIGINT), "
    "CASE WHEN s LIKE '%-%' THEN -1 ELSE 1 END * ("
    "cast(coalesce(nullif(regexp_extract(s, '[+-]([0-9]+):[0-9]+$', 1), ''), '0') AS BIGINT)"
    " * 60 + "
    "cast(coalesce(nullif(regexp_extract(s, '[+-][0-9]+:([0-9]+)$', 1), ''), '0') AS BIGINT)))",
    # contains_sequence (reference ArrayContainsSequence.java): true iff
    # seq appears as a CONTIGUOUS subsequence of x
    # probe longer than the array -> false (the size guard matters:
    # sequence(1, 0) is the DESCENDING [1, 0] and slice(x, 0, n) throws)
    "contains_sequence": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "contains_sequence(x ARRAY<STRING>, seq ARRAY<STRING>) RETURNS BOOLEAN "
    "RETURN size(seq) = 0 OR (size(x) >= size(seq) AND exists("
    "sequence(1, size(x) - size(seq) + 1), "
    "i -> slice(x, i, size(seq)) == seq))",
    # combine_hash (reference CombineHashFunction.java 31*h1+h2): Trino's
    # form needs Java wraparound arithmetic, which ANSI Spark rejects on
    # overflow — xxhash64 is the engine-native deterministic combiner
    # (documented deviation; only self-consistency is required)
    "combine_hash": "CREATE OR REPLACE TEMPORARY FUNCTION combine_hash"
    "(h1 BIGINT, h2 BIGINT) RETURNS BIGINT RETURN xxhash64(h1, h2)",
    # current_groups (reference SessionFunctions): no grant/group model
    # (recorded re-scope) -> always the empty group list
    "current_groups": "CREATE OR REPLACE TEMPORARY FUNCTION current_groups() "
    "RETURNS ARRAY<STRING> RETURN cast(array() AS ARRAY<STRING>)",
    # fail (reference FailureFunction.java) -> raise_error
    "fail": "CREATE OR REPLACE TEMPORARY FUNCTION fail(msg STRING) "
    "RETURNS STRING RETURN raise_error(msg)",
    # nanos variant: sub-micro truncates at the timestamp boundary (same
    # documented precision as from_unixtime_nanos)
    "from_iso8601_timestamp_nanos": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "from_iso8601_timestamp_nanos(s STRING) RETURNS TIMESTAMP RETURN "
    "cast(s AS TIMESTAMP)",
    # is_json_scalar (reference JsonFunctions.java isJsonScalar): valid
    # JSON whose root is not an array/object
    "is_json_scalar": "CREATE OR REPLACE TEMPORARY FUNCTION is_json_scalar"
    "(j STRING) RETURNS BOOLEAN RETURN CASE WHEN j IS NULL THEN NULL "
    "ELSE substring(ltrim(j), 1, 1) NOT IN ('[', '{') "
    "AND (get_json_object(j, '$') IS NOT NULL OR trim(j) = 'null') END",
    # json_array_contains(json, varchar) (reference JsonFunctions.java;
    # the varchar overload — numeric probes compare via their canonical
    # string form, a documented narrowing)
    "json_array_contains": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "json_array_contains(j STRING, v STRING) RETURNS BOOLEAN RETURN "
    "array_contains(from_json(j, 'array<string>'), v)",
    # timezone_hour/minute (reference DateTimeFunctions.java): offset of
    # the SESSION zone at the instant, both components carrying the sign
    # (truncation toward zero, Trino semantics)
    "timezone_hour": "CREATE OR REPLACE TEMPORARY FUNCTION timezone_hour"
    "(ts TIMESTAMP) RETURNS BIGINT RETURN cast("
    "(unix_seconds(from_utc_timestamp(ts, current_timezone()))"
    " - unix_seconds(ts)) / 3600.0e0 AS BIGINT)",
    "timezone_minute": "CREATE OR REPLACE TEMPORARY FUNCTION timezone_minute"
    "(ts TIMESTAMP) RETURNS BIGINT RETURN cast("
    "cast(sign(unix_seconds(from_utc_timestamp(ts, current_timezone()))"
    " - unix_seconds(ts)) AS BIGINT)"
    " * (abs(unix_seconds(from_utc_timestamp(ts, current_timezone()))"
    " - unix_seconds(ts)) % 3600) DIV 60 AS BIGINT)",
    # regexp_split (reference JoniRegexpFunctions.java regexpSplit):
    # split on a regex with no limit — Spark's split IS regex-based
    "regexp_split": "CREATE OR REPLACE TEMPORARY FUNCTION regexp_split"
    "(s STRING, p STRING) RETURNS ARRAY<STRING> RETURN split(s, p)",
    # json_array_get (reference JsonFunctions.java jsonArrayGet):
    # negative indexes count from the end. Scalar string elements come
    # back unquoted (get_json_object semantics) — documented nuance.
    "json_array_get": "CREATE OR REPLACE TEMPORARY FUNCTION json_array_get"
    "(j STRING, i BIGINT) RETURNS STRING RETURN CASE WHEN i >= 0 "
    "THEN get_json_object(j, concat('$[', cast(i AS STRING), ']')) "
    "ELSE get_json_object(j, concat('$[', "
    "cast(json_array_length(j) + i AS STRING), ']')) END",
    # --- Bing tiles (reference geospatial BingTileFunctions.java,
    # BingTile.java). A tile is a packed BIGINT: (x << 28) | (y << 5) | z
    # (x, y < 2^23, zoom <= 23 -> 51 bits). All arithmetic is the public
    # Bing tile-system math; lat clipped to the Web-Mercator domain
    # [-85.05112878, 85.05112878], x/y clamped to [0, 2^z - 1]. ---
    "bing_tile": "CREATE OR REPLACE TEMPORARY FUNCTION bing_tile"
    "(x BIGINT, y BIGINT, zoom BIGINT) RETURNS BIGINT RETURN "
    "(x * 268435456) + (y * 32) + zoom",
    "bing_tile_x": "CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_x"
    "(t BIGINT) RETURNS BIGINT RETURN t DIV 268435456",
    "bing_tile_y": "CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_y"
    "(t BIGINT) RETURNS BIGINT RETURN (t DIV 32) % 8388608",
    "bing_tile_zoom_level": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bing_tile_zoom_level(t BIGINT) RETURNS BIGINT RETURN t % 32",
    "bing_tile_at": "CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_at"
    "(lat DOUBLE, lon DOUBLE, zoom BIGINT) RETURNS BIGINT RETURN bing_tile("
    "least(shiftleft(1L, cast(zoom AS INT)) - 1, greatest(0L, cast(floor("
    "(lon + 180.0e0) / 360.0e0 * cast(shiftleft(1L, cast(zoom AS INT)) AS DOUBLE)"
    ") AS BIGINT))), "
    "least(shiftleft(1L, cast(zoom AS INT)) - 1, greatest(0L, cast(floor("
    "(0.5e0 - ln((1.0e0 + sin(greatest(-85.05112878e0, least(85.05112878e0, lat))"
    " * 3.141592653589793e0 / 180.0e0)) / "
    "(1.0e0 - sin(greatest(-85.05112878e0, least(85.05112878e0, lat))"
    " * 3.141592653589793e0 / 180.0e0))) / (4.0e0 * 3.141592653589793e0))"
    " * cast(shiftleft(1L, cast(zoom AS INT)) AS DOUBLE)) AS BIGINT))), zoom)",
    # reference ColorFunctions.java rgb:109 — packed 0xRRGGBB with range
    # validation; the rest of the color family is Python-tier
    # (python_udfs._color_udfs) plus dialect arity rewrites.
    "rgb": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "rgb(r BIGINT, g BIGINT, b BIGINT) RETURNS BIGINT RETURN "
    "CASE WHEN r BETWEEN 0 AND 255 AND g BETWEEN 0 AND 255 "
    "AND b BETWEEN 0 AND 255 THEN shiftleft(r, 16) + shiftleft(g, 8) + b "
    "ELSE CAST(raise_error('color component must be between 0 and 255')"
    " AS BIGINT) END",
    "bing_tile_coordinates": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bing_tile_coordinates(t BIGINT) RETURNS STRUCT<x: BIGINT, y: BIGINT> "
    "RETURN named_struct('x', t DIV 268435456, 'y', (t DIV 32) % 8388608)",
    # 3-arg bing_tiles_around (reference BingTileFunctions.java:169):
    # the tile under the point plus its in-range neighbors, x-major
    # order. The 9 neighbor cells are spelled out statically because
    # Spark cannot inline a SQL macro whose arguments reference lambda
    # variables (ResolveSQLFunctions loses them); the filter lambda
    # itself is macro-free. The 4-arg radius variant is the
    # bing_tiles_around_radius pandas UDF (geometry.py); dialect
    # rewrites 4-arg calls to it.
    "bing_tiles_around": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bing_tiles_around(lat DOUBLE, lon DOUBLE, zoom BIGINT) "
    "RETURNS ARRAY<BIGINT> RETURN filter(array("
    + ", ".join(
        "CASE WHEN bing_tile_x(bing_tile_at(lat, lon, zoom)) + ({i}) "
        "BETWEEN 0 AND shiftleft(1L, cast(zoom AS INT)) - 1 "
        "AND bing_tile_y(bing_tile_at(lat, lon, zoom)) + ({j}) "
        "BETWEEN 0 AND shiftleft(1L, cast(zoom AS INT)) - 1 THEN "
        "(bing_tile_x(bing_tile_at(lat, lon, zoom)) + ({i})) * 268435456"
        " + (bing_tile_y(bing_tile_at(lat, lon, zoom)) + ({j})) * 32"
        " + zoom ELSE -1L END".format(i=i, j=j)
        for i in (-1, 0, 1)
        for j in (-1, 0, 1)
    )
    + "), t -> t >= 0)",
    "bing_tile_quadkey": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bing_tile_quadkey(t BIGINT) RETURNS STRING RETURN array_join(transform("
    "sequence(1, cast(t % 32 AS INT)), i -> cast("
    "(shiftright(t DIV 268435456, cast(t % 32 AS INT) - i) & 1) + "
    "2 * (shiftright((t DIV 32) % 8388608, cast(t % 32 AS INT) - i) & 1)"
    " AS STRING)), '')",
    "bing_tile_from_quadkey": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "bing_tile_from_quadkey(q STRING) RETURNS BIGINT RETURN bing_tile("
    "aggregate(transform(sequence(1, length(q)), i -> "
    "shiftleft(cast(substring(q, i, 1) AS BIGINT) & 1, length(q) - i)), "
    "0L, (a, v) -> a + v), "
    "aggregate(transform(sequence(1, length(q)), i -> "
    "shiftleft(cast(substring(q, i, 1) AS BIGINT) DIV 2, length(q) - i)), "
    "0L, (a, v) -> a + v), length(q))",
    "timetz_to_str": "CREATE OR REPLACE TEMPORARY FUNCTION timetz_to_str"
    "(t BIGINT) RETURNS STRING RETURN concat(time_to_str(t DIV 4096), "
    "CASE WHEN t % 4096 - 1440 < 0 THEN '-' ELSE '+' END, "
    "lpad(cast(abs(t % 4096 - 1440) DIV 60 AS STRING), 2, '0'), ':', "
    "lpad(cast(abs(t % 4096 - 1440) % 60 AS STRING), 2, '0'))",
}

# --------------------------------------------------------------------------
# Tier 3: named gaps (kept honest).
# --------------------------------------------------------------------------
UNSUPPORTED: dict[str, str] = {
    "ST_* degenerate boolean inputs / geometry collections": "the WKT"
    " kernel (functions/geometry.py) covers measurements, predicates"
    " (incl. the DE-9IM relate family), accessors, WKB/GeoJSON/encoded-"
    "polyline codecs, spherical geography (validated lat/lon WKT; the"
    " spherical measurements are st_spherical_distance/area/length"
    " because this registry cannot overload ST_* by operand type),"
    " convex hull, simplify, buffers (points as inscribed n-gons; r7:"
    " lines and polygons as snapped-arrangement Minkowski sums with"
    " sampled round joins), and polygon booleans —"
    " convex clips via Sutherland-Hodgman, concave-x-concave via a"
    " Greiner-Hormann clipper (generic position, holes-in-results"
    " classified), and (r5) a snapped planar-arrangement N-way union"
    " (union_many) that handles shared-edge / vertex-on-edge incidence"
    " for ST_Union and geometry_union_agg"
    " (operators/spatial_join.py geometry_union_agg)."
    " r8: GEOMETRYCOLLECTION operates too — ST_Intersects distributes"
    " over members, ST_Contains/booleans dissolve polygonal GCs via"
    " union_many, ST_Buffer unions member buffers."
    " Still out of scope (raise, never approximate):"
    " MIXED-dimension GEOMETRYCOLLECTION as an AREAL operand and GC"
    " operands of ST_Relate/de9im,"
    " geometry_from_hadoop_shape (Esri-Hadoop private serialization;"
    " WKB/GeoJSON cover interchange), and spatial_partitioning/"
    "spatial_partitions (KDB-tree handles; the grid-cell banded join in"
    " operators/spatial_join.py is this engine's spatial partitioner)."
    " Bing tiles are covered by the bing_tile_* macro family and the"
    " geometry-level tile functions",
    "sketch-aggregate SQL `merge` overloading":
    "r5 lifts the old limitation: GROUPED_AGG pandas UDFs ARE"
    " SQL-registrable, so qdigest_agg / merge_qdigest / tdigest_agg /"
    " merge_tdigest (operator wire formats, read by the registered"
    " quantile scalars) and approx_set / merge_hll / hll_cardinality are"
    " SQL names now (functions/sql_sketch_aggs.py; no map-side partial —"
    " the scalable two-level builds stay operator APIs, mirroring the"
    " reference's partial/final accumulator split), and histogram /"
    " multimap_agg / map_union rewrite at transpile time"
    " (plans/dialect.py _rewrite_agg_calls). The merge(sketch) overload"
    " resolves since r8: _rewrite_generic_merge infers the sketch type"
    " from the producing build's alias in the same statement (the"
    " reference's plan-time type dispatch, done at transpile time);"
    " only storage-read blobs with no visible producer still need the"
    " type-suffixed names."
    " Historical note on the rest:"
    " the sketch builders/mergers are Python operator APIs"
    " (operators/hll.py, qdigest.py, tdigest.py, setdigest.py) and the"
    " map-shaped aggregates are two-level groupBy compositions"
    " (agg_histogram_map, agg_multimap queries). The scalar lookup"
    " surface (value_at_quantile, values_at_quantiles, cardinality) IS"
    " SQL-registered, and geometric_mean/map_agg/checksum/bitwise_*_agg"
    " rewrite at transpile time (plans/dialect.py _rewrite_agg_calls).",
    "row-pattern WINDOW clause: SEEK / other frame extents":
    "r5 implements the WINDOW-clause spelling of row-pattern recognition"
    " (reference grammar SqlBase.g4 windowFrame; plans/mr_sql.py"
    " rewrite_pattern_windows): measures read as `m OVER w`, INITIAL"
    " match attempts per non-skipped row over the CURRENT ROW .."
    " UNBOUNDED FOLLOWING frame, AFTER MATCH SKIP modes honoured."
    " Rejected loudly: SEEK mode, frame extents other than CURRENT ROW"
    " .. UNBOUNDED FOLLOWING (the only extent Trino itself accepts for"
    " pattern windows), PREV/NEXT inside window measures, and"
    " non-measure `x OVER w` references through a pattern window.",
    "timestamp(p > 6) / timestamp(p) with time zone beyond micros":
    "Spark's TIMESTAMP/TIMESTAMP_NTZ are microsecond-precision end to end"
    " (storage, Catalyst, Arrow), and the parquet fixtures are micros;"
    " a parallel nanos-precision timestamp type would fall out of every"
    " built-in (joins, windows, pushdown) and run Python-tier. Recorded"
    " decision: instant-attached nanos stay int64 epoch-nanos (events"
    " ts_ns pattern, catalog.py); time-of-day nanos use the TIME"
    " nanos-of-day encoding; zoned time-of-day uses the packed timetz_*"
    " BIGINT family (reference LongTimestampWithTimeZone.java,"
    " StandardTypes.java:33-36). from_unixtime_nanos documents the"
    " sub-micro truncation at the timestamp boundary.",
}


_REGISTERED_SESSIONS: "weakref.WeakSet" = None  # type: ignore[assignment]


def register_all(spark: SparkSession, force: bool = False) -> int:
    """Install every macro + Python-tier UDF into the session; returns the
    number registered. Idempotent per session: every registration is
    CREATE OR REPLACE / udf.register, but re-running the ~200 of them
    costs ~2s of analyzer round-trips, and each registered query calls
    this on entry — so repeat calls on an already-registered session
    return immediately (pass force=True after deliberately dropping
    functions)."""
    global _REGISTERED_SESSIONS
    import weakref

    if _REGISTERED_SESSIONS is None:
        _REGISTERED_SESSIONS = weakref.WeakSet()
    if not force and spark in _REGISTERED_SESSIONS:
        return 0
    from witdb_spark.functions.geometry import register_geometry_udfs
    from witdb_spark.functions.python_udfs import register_python_udfs

    # geometry UDFs first: macro bodies referencing them (e.g.
    # st_envelope_contains -> st_x) are validated at CREATE time
    from witdb_spark.operators.qdigest import register_digest_udfs

    n_geo = register_geometry_udfs(spark)
    for ddl in MACROS.values():
        spark.sql(ddl)
    n_digest = register_digest_udfs(spark)
    from witdb_spark.functions.sql_sketch_aggs import (
        register_misc_aggs,
        register_setdigest_aggs,
        register_sketch_aggs,
        register_tdigest_aggs,
    )

    n_sketch = (
        register_sketch_aggs(spark)
        + register_tdigest_aggs(spark)
        + register_setdigest_aggs(spark)
        + register_misc_aggs(spark)
    )
    n = len(MACROS) + register_python_udfs(spark) + n_geo + n_digest + n_sketch
    _REGISTERED_SESSIONS.add(spark)
    return n


def trino_fn(name: str):
    """Column-builder for a Trino function name: resolves passthrough renames
    and registered macros to a callable over Columns."""

    target = PASSTHROUGH.get(name, name)

    def build(*args: Column) -> Column:
        return F.call_function(target, *args)

    return build
