"""Trino edge-semantics parity (SURVEY.md §7 'genuinely hard' list):
1-based subscripts, element_at negatives, try_cast, decimal rounding,
interval literals, FETCH FIRST, quoted identifiers, dialect renames."""

from __future__ import annotations

import pytest

from witdb_spark.engine import Engine
from witdb_spark.plans.dialect import UnsupportedTrinoSyntax, transpile


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def one(engine, expr):
    return engine.sql(f"SELECT {expr} AS v").collect()[0].v


def test_array_subscript_one_based(engine):
    assert one(engine, "(ARRAY['a','b','c'])[1]") == "a"
    assert one(engine, "(ARRAY['a','b','c'])[3]") == "c"


def test_map_subscript_by_key(engine):
    assert one(engine, "(MAP(ARRAY['k','j'], ARRAY[7, 8]))['j']") == 8


def test_element_at_negative(engine):
    assert one(engine, "element_at(ARRAY[1, 2, 3], -1)") == 3
    assert one(engine, "element_at(ARRAY[1, 2, 3], 9)") is None


def test_try_cast(engine):
    assert one(engine, "try_cast('abc' AS INTEGER)") is None
    assert one(engine, "try_cast('42' AS INTEGER)") == 42


def test_decimal_half_up_rounding(engine):
    # Trino decimal casts round HALF_UP (reference DecimalType/Int128 ops);
    # Spark matches.
    assert str(one(engine, "CAST(2.5 AS DECIMAL(10,0))")) == "3"
    assert str(one(engine, "CAST(-2.5 AS DECIMAL(10,0))")) == "-3"
    assert str(one(engine, "CAST(1.005 AS DECIMAL(10,2))")) == "1.01"


def test_decimal_38_precision(engine):
    big = "12345678901234567890123456789012345678"
    assert str(one(engine, f"CAST('{big}' AS DECIMAL(38,0))")) == big


def test_interval_literal(engine):
    got = one(
        engine,
        "date_format(TIMESTAMP '1997-03-15 00:00:00' + INTERVAL '3' DAY,"
        " 'yyyy-MM-dd')",
    )
    assert got == "1997-03-18"


def test_fetch_first(engine):
    rows = engine.sql(
        "SELECT x FROM (VALUES 3, 1, 2) AS t(x) ORDER BY x FETCH FIRST 2 ROWS ONLY"
    ).collect()
    assert [r.x for r in rows] == [1, 2]


def test_quoted_identifiers(engine):
    rows = engine.sql('SELECT "the col" FROM (VALUES 1) AS t("the col")').collect()
    assert rows[0][0] == 1


def test_dialect_renames():
    assert "timestamp_seconds(" in transpile("SELECT from_unixtime(0)")
    assert "approx_count_distinct(" in transpile("SELECT approx_distinct(x) FROM t")
    assert "any_value(" in transpile("SELECT arbitrary(x) FROM t")
    assert "bit_count(x)" in transpile("SELECT bit_count(x, 64) FROM t")


def test_try_decomposition(engine):
    assert one(engine, "TRY(1/0)") is None
    assert one(engine, "TRY(CAST('abc' AS INTEGER))") is None
    assert one(engine, "TRY(element_at(ARRAY[1], 5))") is None
    assert one(engine, "TRY(2 + 3)") == 5
    with pytest.raises(UnsupportedTrinoSyntax):
        transpile("SELECT TRY(upper(x)) FROM t")


def test_mysql_date_format(engine):
    got = one(
        engine, "date_format(TIMESTAMP '2001-02-03 04:05:06', '%Y-%m-%d %H:%i:%s')"
    )
    assert got == "2001-02-03 04:05:06"
