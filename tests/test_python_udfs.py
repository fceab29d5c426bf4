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
