"""Function-registry battery: register the Trino-name macros and assert
exact outputs on known inputs (the reference's per-function unit-test style,
e.g. TestStringFunctions/TestMathFunctions in sql/query/)."""

from __future__ import annotations

import math

import pytest

from witdb_spark.functions import MACROS, register_all


@pytest.fixture(scope="module")
def fspark(spark):
    register_all(spark)
    return spark


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


CASES = [
    # string
    ("strpos('hello world', 'wor')", 7),
    ("strpos('hello', 'zz')", 0),
    ("codepoint('A')", 65),
    ("chr(66)", "B"),
    ("hamming_distance('karolin', 'kathrin')", 3),
    ("from_utf8(to_utf8('héllo'))", "héllo"),
    # math
    ("truncate(3.7)", 3.0),
    ("truncate(-3.7)", -3.0),
    ("is_finite(1.0)", True),
    ("is_finite(infinity())", False),
    ("is_infinite(infinity())", True),
    ("cosine_similarity(array(1D, 0D), array(1D, 0D))", 1.0),
    ("round(cosine_similarity(array(1D, 0D), array(0D, 1D)), 9)", 0.0),
    ("round(wilson_interval_lower(20, 100, 1.96), 6)", 0.133366),
    # datetime
    ("day_of_week(timestamp'2024-01-01 00:00:00')", 1),  # Monday -> ISO 1
    ("day_of_week(timestamp'2024-01-07 00:00:00')", 7),  # Sunday -> ISO 7
    ("to_unixtime(timestamp'1970-01-01 00:00:01.5')", 1.5),
    ("millisecond(timestamp'2024-01-01 00:00:00.123456')", 123),
    ("parse_duration('5m')", 300.0),
    ("parse_duration('1.5h')", 5400.0),
    ("format_datetime(timestamp'2024-03-05 07:08:09', 'yyyy-MM-dd HH:mm')", "2024-03-05 07:08"),
    ("mysql_date_format(timestamp'2024-03-05 07:08:09', '%Y/%m/%d %H:%i:%s')", "2024/03/05 07:08:09"),
    ("to_iso8601(timestamp'2024-03-05 07:08:09')", "2024-03-05T07:08:09.000"),
    # url
    ("url_extract_host('https://example.com:8080/p/q?k=v#frag')", "example.com"),
    ("url_extract_port('https://example.com:8080/p')", 8080),
    ("url_extract_path('https://example.com:8080/p/q?k=v')", "/p/q"),
    ("url_extract_parameter('https://example.com/p?k=v&x=2', 'x')", "2"),
    # array
    ("ngrams(array('a','b','c','d'), 2)", [["a", "b"], ["b", "c"], ["c", "d"]]),
    ("trim_array(array('a','b','c'), 1)", ["a", "b"]),
    ("array_sum(array(1.5D, 2.5D))", 4.0),
    ("array_average(array(1D, 2D, 3D))", 2.0),
    # data size
    ("parse_data_size('2.3MB')", 2411725),
    # passthrough spot checks (1-based semantics shared with Trino)
    ("element_at(array(10, 20, 30), -1)", 30),
    ("array_position(array('x','y'), 'y')", 2),
    ("slice(array(1,2,3,4), 2, 2)", [2, 3]),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_function_value(fspark, expr, expected):
    got = one(fspark, expr)
    if isinstance(expected, float):
        if expr.startswith("round(wilson"):
            assert abs(got - expected) < 1e-4
        else:
            assert got == expected
    elif isinstance(expected, int) and not isinstance(expected, bool):
        assert int(got) == expected
    else:
        assert got == expected


def test_macro_count_registered(fspark):
    # macros + the Python-UDF tier (functions/python_udfs.py);
    # register_all memoizes per session, so force a real pass to count
    assert register_all(fspark, force=True) >= len(MACROS) >= 30
    # and the memoized repeat is a no-op
    assert register_all(fspark) == 0


def test_is_nan_passthrough(fspark):
    assert one(fspark, "isnan(nan())") is True
    assert math.isnan(one(fspark, "nan()"))


def test_teradata_compat(fspark):
    assert one(fspark, "index('banana', 'nan')") == 3
    assert one(fspark, "char2hexint('AB')") == "00410042"


def test_format_parse_datetime_joda_tokens(fspark):
    # Joda 'YYYY' means year-of-era; a passthrough to java.time would hit
    # week-based-year and report 2021 for 2020-12-31
    got = one(
        fspark,
        "format_datetime(TIMESTAMP '2020-12-31 23:00:00', 'YYYY-MM-dd HH:mm')",
    )
    assert got == "2020-12-31 23:00"
    rt = one(
        fspark,
        "parse_datetime('2020-12-31 23:00', 'YYYY-MM-dd HH:mm')",
    )
    assert str(rt) == "2020-12-31 23:00:00"


def test_multimap_constructors(fspark):
    got = one(
        fspark,
        "multimap_from_entries(array(struct('a','1'), struct('b','2'),"
        " struct('a','3')))",
    )
    assert dict(got) == {"a": ["1", "3"], "b": ["2"]}
    got = one(fspark, "split_to_multimap('k1=v1,k2=v2,k1=v3', ',', '=')")
    assert dict(got) == {"k1": ["v1", "v3"], "k2": ["v2"]}


def test_numeric_histogram(spark):
    """reference NumericHistogram.java: n approximate (x, count) bins whose
    counts sum to the row count (approximation-equal across engines, not
    bit-equal — different merge orders)."""
    from pyspark.sql import functions as F

    from witdb_spark.plans import transpile

    spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("v")
    ).createOrReplaceTempView("nh_t")
    bins = spark.sql(
        transpile("SELECT numeric_histogram(4, v) AS h FROM nh_t")
    ).collect()[0].h
    assert len(bins) == 4
    assert sum(b.y for b in bins) == 1000.0


def test_timetz_parse_roundtrip(fspark):
    """timetz_parse(timetz_to_str(x)) == x for the packed time-with-zone
    encoding, incl. negative offsets and missing seconds/fraction."""
    rows = fspark.sql(
        "SELECT timetz_parse(timetz_to_str(timetz_make(37230123456789, -330))) AS a,"
        " timetz_make(37230123456789, -330) AS b,"
        " timetz_parse('10:30+05:30') AS c,"
        " timetz_make(37800000000000, 330) AS d,"
        " timetz_utc_nanos(timetz_make(3600000000000, 120)) AS e"
    ).collect()[0]
    assert rows.a == rows.b
    assert rows.c == rows.d
    # 01:00 at +02:00 == 23:00 UTC the previous day -> wraps to 23h
    assert rows.e == 23 * 3600 * 1_000_000_000


def test_regexp_split_and_json_array_get(fspark):
    r = fspark.sql(
        "SELECT regexp_split('a1b22c333d', '[0-9]+') AS sp,"
        " json_array_get('[\"x\", \"y\", \"z\"]', 1) AS mid,"
        " json_array_get('[\"x\", \"y\", \"z\"]', -1) AS last,"
        " json_array_get('[1, 2, 3]', 0) AS num"
    ).collect()[0]
    assert r.sp == ["a", "b", "c", "d"]
    assert r.mid == "y" and r.last == "z" and r.num == "1"


def test_r4_scalar_gap_fills(fspark):
    """The 14 names the reference-annotation audit found missing."""
    from witdb_spark.plans.dialect import transpile

    r = fspark.sql(transpile(
        "SELECT all_match(array(2, 4), x -> x % 2 = 0) AS am,"
        " any_match(array(1, 2), x -> x > 1) AS nm1,"
        " none_match(array(1, 3), x -> x > 5) AS nm2,"
        " contains_sequence(array('a','b','c','d'), array('b','c')) AS cs1,"
        " contains_sequence(array('a','b'), array('b','a')) AS cs2,"
        " current_groups() AS cg,"
        " is_json_scalar('42') AS js1, is_json_scalar('[1]') AS js2,"
        " json_array_contains('[\"x\", \"y\"]', 'y') AS jac,"
        " combine_hash(1, 2) = combine_hash(1, 2) AS ch,"
        " timezone_hour(timestamp'2024-06-01 00:00:00') AS tzh,"
        " value_at_quantile(X'00000000000024400000000000000000000000000000f03f0000000000000040', 1.0e0) AS vq"
    )).collect()[0]
    assert r.am is True and r.nm1 is True and r.nm2 is True
    assert r.cs1 is True and r.cs2 is False
    assert r.cg == []
    assert r.js1 is True and r.js2 is False
    assert r.jac is True and r.ch is True
    assert r.tzh == 0  # UTC session
    assert r.vq == 2.0  # blob [n=10, 0.0, 1.0, 2.0] -> q=1 -> last point
    import pytest as _pytest

    with _pytest.raises(Exception):
        fspark.sql("SELECT fail('boom')").collect()


def test_r4_agg_name_rewrites(fspark):
    from witdb_spark.plans.dialect import transpile

    fspark.range(1, 5).createOrReplaceTempView("agn_t")
    r = fspark.sql(transpile(
        "SELECT geometric_mean(CAST(id AS DOUBLE)) AS gm,"
        " bitwise_and_agg(id) AS ba, bitwise_or_agg(id) AS bo,"
        " map_agg(CAST(id AS STRING), id * 10) AS ma,"
        " checksum(id) AS ck"
        " FROM agn_t"
    )).collect()[0]
    assert abs(r.gm - (1 * 2 * 3 * 4) ** 0.25) < 1e-12
    assert r.ba == 0 and r.bo == 7
    assert dict(r.ma) == {"1": 10, "2": 20, "3": 30, "4": 40}
    assert r.ck is not None


def test_r4_third_review_fixes(fspark):
    from witdb_spark.plans.dialect import transpile

    # string literals survive every rewrite pass
    r = fspark.sql(transpile(
        "SELECT 'cast(x as varchar)' AS lit1, 'please TRY (this)' AS lit2,"
        " CAST('12:00:00+05:30' AS TIME WITH TIME ZONE) AS tz,"
        " TRY(element_at(array(1), 5)) AS oob,"
        " bit_count(abs(-3), 8) AS bc,"
        " millisecond(timestamp'1969-12-31 23:59:59.5') AS ms,"
        " json_size('[1, 2, 3]', '$') AS jarr,"
        " json_size('{\"a\": {\"b\": 1}}', '$.a') AS jobj,"
        " json_size('7', '$') AS jscal"
    )).collect()[0]
    assert r.lit1 == "cast(x as varchar)" and r.lit2 == "please TRY (this)"
    assert r.tz == (12 * 3600 * 1_000_000_000) * 4096 + (330 + 1440)
    assert r.oob is None
    assert r.bc == 2  # popcount(3 & 0xff)
    assert r.ms == 500  # Trino range [0, 999], not -500
    assert r.jarr == 3 and r.jobj == 1 and r.jscal == 0


def test_date_parse_mysql_patterns(fspark):
    """reference DateTimeFunctions.java:376 dateParse — MySQL %-pattern
    parse, the inverse of date_format's translation chain."""
    register_all(fspark)
    r = fspark.sql(
        "SELECT date_parse('2020-01-05 13:14:15', '%Y-%m-%d %H:%i:%s') a,"
        " date_parse('05/01/2020', '%d/%m/%Y') b"
    ).collect()[0]
    assert str(r["a"]) == "2020-01-05 13:14:15"
    assert str(r["b"]) == "2020-01-05 00:00:00"


def test_date_parse_strict_and_extended_tokens(fspark):
    """r5 review fix (reference DateTimeFunctions.java dateParse): raises
    on unparseable input (not NULL), rejects untranslated % tokens, and
    covers %f/%p/%k/%l/%r/%T/%%; TRY(date_parse(..)) is the null-on-error
    escape hatch."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from witdb_spark.engine import Engine

    eng = Engine(fspark)
    q = lambda s: eng.sql(s).collect()[0][0]  # noqa: E731
    assert (
        str(q("SELECT date_parse('2020-01-05 13:14:15.250000', '%Y-%m-%d %H:%i:%s.%f')"))
        == "2020-01-05 13:14:15.250000"
    )
    assert str(q("SELECT date_parse('03:14 PM', '%h:%i %p')")) == "1970-01-01 15:14:00"
    assert str(q("SELECT date_parse('9', '%k')")) == "1970-01-01 09:00:00"
    assert str(q("SELECT date_parse('10%', '%k%%')")) == "1970-01-01 10:00:00"
    # unparseable input raises (Trino: INVALID_FUNCTION_ARGUMENT), not NULL
    with pytest.raises(Exception) as ei:
        fspark.sql("SELECT date_parse('not-a-date', '%Y-%m-%d')").collect()
    assert "date_parse" in str(ei.value)
    # untranslated token rejected loudly
    with pytest.raises(Exception) as ei2:
        fspark.sql("SELECT date_parse('2020 05', '%Y %U')").collect()
    assert "unsupported format token" in str(ei2.value)
    # TRY() twin: null on error
    assert q("SELECT TRY(date_parse('nope', '%Y-%m-%d'))") is None
    # NULL inputs stay NULL (no raise)
    assert q("SELECT date_parse(NULL, '%Y')") is None
