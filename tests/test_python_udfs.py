"""Literal-value tests for the Python-UDF tier (functions/python_udfs.py):
normalize, word_stem, combinations, hmac_*, SQL/JSON-2016."""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

import pytest

from witdb_spark.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_normalize(spark):
    # e + combining acute (NFD) -> precomposed e-acute (NFC)
    assert one(spark, "normalize('e\\u0301', 'NFC')") == "é"
    assert one(spark, "normalize('\\u00e9', 'NFD')") == "é"
    assert one(spark, "normalize(NULL, 'NFC')") is None


@pytest.mark.parametrize(
    "word,stem",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("relational", "relat"),
        ("hopefulness", "hope"),
        ("running", "run"),
        ("adjustable", "adjust"),
        ("sky", "sky"),
    ],
)
def test_word_stem(spark, word, stem):
    assert one(spark, f"word_stem('{word}')") == stem


def test_combinations(spark):
    got = one(spark, "combinations(array('a','b','c'), 2)")
    assert [list(x) for x in got] == [["a", "b"], ["a", "c"], ["b", "c"]]
    assert one(spark, "combinations(array('a'), 2)") == []


def test_hmac(spark):
    expected = hmac_mod.new(b"key", b"msg", hashlib.sha256).digest()
    got = one(spark, "hmac_sha256(encode('msg', 'UTF-8'), encode('key', 'UTF-8'))")
    assert bytes(got) == expected


DOC = '{"a": {"b": [1, 2, {"c": "x"}]}, "flag": true}'


def test_json_exists(spark):
    assert one(spark, f"json_exists('{DOC}', '$.a.b')") is True
    assert one(spark, f"json_exists('{DOC}', '$.a.z')") is False
    assert one(spark, "json_exists('not json', '$.a')") is None


def test_json_value(spark):
    assert one(spark, f"json_value('{DOC}', '$.a.b[0]')") == "1"
    assert one(spark, f"json_value('{DOC}', '$.a.b[2].c')") == "x"
    assert one(spark, f"json_value('{DOC}', '$.flag')") == "true"
    assert one(spark, f"json_value('{DOC}', '$.a')") is None  # non-scalar


def test_json_query(spark):
    assert one(spark, f"json_query('{DOC}', '$.a.b')") == '[1,2,{"c":"x"}]'
    assert one(spark, f"json_query('{DOC}', '$.a.b[*]')") == '[1,2,{"c":"x"}]'
    assert one(spark, f"json_query('{DOC}', '$.missing')") is None


def test_beta_cdf(spark):
    # closed forms: Beta(1,1)=uniform, Beta(2,1) cdf = x^2, symmetry at .5
    assert abs(one(spark, "beta_cdf(1D, 1D, 0.3D)") - 0.3) < 1e-12
    assert abs(one(spark, "beta_cdf(2D, 1D, 0.5D)") - 0.25) < 1e-12
    assert abs(one(spark, "beta_cdf(2D, 2D, 0.5D)") - 0.5) < 1e-12
    assert one(spark, "beta_cdf(2D, 2D, 0D)") == 0.0
    assert one(spark, "beta_cdf(2D, 2D, 1D)") == 1.0


def test_inverse_beta_cdf_roundtrip(spark):
    for a, b, p in [(2.0, 3.0, 0.25), (0.5, 0.5, 0.9), (5.0, 1.0, 0.5)]:
        x = one(spark, f"inverse_beta_cdf({a}D, {b}D, {p}D)")
        back = one(spark, f"beta_cdf({a}D, {b}D, {x}D)")
        assert abs(back - p) < 1e-9, (a, b, p, x, back)


def test_human_readable_seconds(spark):
    # reference operator/scalar/timestamp/HumanReadableSeconds.java
    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT human_readable_seconds(96861.5) AS a, "
        "human_readable_seconds(0.2) AS z, "
        "human_readable_seconds(-61D) AS n, "
        "human_readable_seconds(604800D) AS w"
    ).collect()[0]
    assert r.a == "1 day, 2 hours, 54 minutes, 22 seconds"
    assert r.z == "0 seconds"
    assert r.n == "1 minute, 1 second"  # |x| like the reference
    assert r.w == "1 week"


def test_binary_codecs(spark):
    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT hex(to_big_endian_64(258)) AS be64, "
        "from_big_endian_64(to_big_endian_64(-5)) AS sig, "
        "from_big_endian_32(to_big_endian_32(-7)) AS sig32, "
        "from_ieee754_64(to_ieee754_64(2.5)) AS d, "
        "hex(to_ieee754_32(1.0)) AS f32, "
        "to_base32(encode('Hello', 'UTF-8')) AS b32, "
        "decode(from_base32('JBSWY3DP'), 'UTF-8') AS b32d, "
        "to_base64url(unhex('FBFF')) AS url, "
        "hex(from_base64url('-_8=')) AS urld, "
        "to_base(255, 16) AS tb, from_base('ff', 16) AS fb"
    ).collect()[0]
    assert r.be64 == "0000000000000102"
    assert r.sig == -5 and r.sig32 == -7
    assert r.d == 2.5 and r.f32 == "3F800000"
    assert r.b32 == "JBSWY3DP" and r.b32d == "Hello"
    assert r.url == "-_8=" and r.urld == "FBFF"
    assert r.tb == "ff" and r.fb == 255


def test_ip_contains(spark):
    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT ip_contains('10.0.0.0/8', '10.255.0.1') AS a, "
        "ip_contains('10.0.0.0/8', '11.0.0.1') AS b, "
        "ip_contains('2001:db8::/32', '2001:db8::1') AS c"
    ).collect()[0]
    assert r.a is True and r.b is False and r.c is True


def test_sql_json_path_extensions(spark):
    """SQL/JSON path steps beyond the round-2 subset: recursive descent,
    wildcard members, slices, filter predicates, lax/strict prefixes
    (reference core/trino-main/.../json/ path IR)."""
    from witdb_spark.functions import register_all

    register_all(spark)
    doc = (
        '{"store": {"book": [{"t": "a", "price": 5}, {"t": "b", "price": 15},'
        ' {"t": "c", "price": 25}], "bike": {"price": 99}}}'
    )
    spark.createDataFrame([(doc,)], "j string").createOrReplaceTempView("jt")

    def q(path):
        return spark.sql(
            f"SELECT json_query(j, '{path}') AS r FROM jt"
        ).collect()[0].r

    # filter predicate
    assert q("$.store.book[*] ? (@.price > 10)") == (
        '[{"t":"b","price":15},{"t":"c","price":25}]'
    )
    # recursive descent collects every price
    assert q("$..price") == "[5,15,25,99]"
    # slice
    assert q("$.store.book[0:2]") == '[{"t":"a","price":5},{"t":"b","price":15}]'
    # wildcard member
    assert q("$.store.bike.*") == "99"
    # lax: missing member -> no match -> NULL; strict: error -> NULL too,
    # but a present path still answers
    assert q("lax $.store.missing") is None
    assert q("strict $.store.bike.price") == "99"
    r = spark.sql(
        "SELECT json_exists(j, 'strict $.store.missing') AS e FROM jt"
    ).collect()[0].e
    assert r is None  # strict structural error -> NULL (ERROR ON ERROR off)
    r2 = spark.sql(
        "SELECT json_exists(j, 'lax $.store.missing') AS e FROM jt"
    ).collect()[0].e
    assert r2 is False


def test_murmur3_and_spooky_vectors():
    """Byte-for-byte vectors from the reference
    TestVarbinaryFunctions.java:763-792 (short path); the >=192-byte
    SpookyHash long path has no published vector there, so it gets
    determinism/avalanche checks only."""
    import struct

    from witdb_spark.functions.python_udfs import _HASH_SRC

    ns: dict = {}
    exec(_HASH_SRC, ns)
    assert ns["murmur3_x64_128"](b"").hex() == "0" * 32
    assert (
        ns["murmur3_x64_128"](b"hashme").hex().upper()
        == "93192FE805BE23041C8318F67EC4F2BC"
    )

    def h64(b):
        return struct.pack(">Q", ns["spooky_hash128"](b)[0]).hex().upper()

    def h32(b):
        return (
            struct.pack(">I", ns["spooky_hash128"](b)[0] & 0xFFFFFFFF)
            .hex()
            .upper()
        )

    assert h32(b"") == "6BF50919"
    assert h32(b"hello") == "D382E6CA"
    assert h64(b"") == "232706FC6BF50919"
    assert h64(b"hello") == "3768826AD382E6CA"
    big = bytes(range(256))
    assert ns["spooky_hash128"](big) == ns["spooky_hash128"](bytes(big))
    assert ns["spooky_hash128"](big) != ns["spooky_hash128"](
        big[:-1] + b"\x00"
    )


def test_color_functions(spark):
    """reference ColorFunctions.java: packed 0xRRGGBB / negative system
    colors, HSV interpolation, ANSI escapes."""
    from witdb_spark.engine import Engine

    eng = Engine(spark)
    r = eng.sql(
        "SELECT color('#f00') a, color('red') b, rgb(0, 255, 0) c,"
        " color(0.0, rgb(255, 0, 0), rgb(0, 255, 0)) d,"
        " color(1.0, 0.0, 2.0, rgb(255, 0, 0), rgb(0, 255, 0)) e,"
        " render('x', color('red')) f, render(false) g,"
        " bar(0.3, 10) h"
    ).collect()[0]
    assert r["a"] == 0xFF0000 and r["b"] == -2 and r["c"] == 0x00FF00
    assert r["d"] == 0xFF0000
    assert r["e"] == 0xFFFF00  # HSV midpoint of red->green is yellow
    assert r["f"] == "\x1b[38;5;1mx\x1b[0m"
    assert "✗" in r["g"]
    assert r["h"].count("█") == 3 and r["h"].endswith(" " * 7)


def test_normal_cdf_pair(spark):
    """reference MathFunctions.java normalCdf:674 / inverseNormalCdf:663."""
    import math

    from witdb_spark.functions.python_udfs import _NORM_SRC

    ns: dict = {}
    exec(_NORM_SRC, ns)
    assert ns["normal_cdf"](0, 1, 1.96) == 0.5 * (1 + math.erf(1.96 / math.sqrt(2)))
    assert ns["normal_cdf"](10, 9, 10) == 0.5
    assert ns["inverse_normal_cdf"](0, 1, 0.5) == 0.0
    assert abs(ns["inverse_normal_cdf"](0, 1, 0.975) - 1.959963984540054) < 1e-12
    for p in (1e-12, 0.025, 0.3, 0.7, 0.999):
        assert abs(ns["normal_cdf"](0, 1, ns["inverse_normal_cdf"](0, 1, p)) - p) < 1e-15
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ns["inverse_normal_cdf"](0, 1, 1.0)
    with _pytest.raises(ValueError):
        ns["normal_cdf"](0, -1, 0)
    # SQL registration
    from witdb_spark.functions.registry import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT normal_cdf(0, 1, 0) a, inverse_normal_cdf(2, 3, 0.5) b"
    ).collect()[0]
    assert r["a"] == 0.5 and r["b"] == 2.0
