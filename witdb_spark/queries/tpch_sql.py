"""TPC-H q01-q22 as Trino-dialect SQL TEXT through ``Engine.sql``.

The reference's whole user interface is SQL text (reference
testing/trino-benchmark-queries/src/main/resources/sql/presto/tpch/
q01.sql-q22.sql; benchto tpch.yaml runs exactly these). The DataFrame
builds in queries/tpch.py verify the OPERATORS; this module verifies the
FRONT DOOR — parser, transpiler, function registry, and Catalyst planning
together on realistic query texts. Each text mirrors the same
driver-schema adaptations its DataFrame twin documents (no partsupp ->
derived from lineitem; missing columns -> documented substitutions) and
REUSES the twin's DuckDB oracle verbatim, so both forms are held to the
identical expected output.

Dialect surface intentionally exercised across the suite: FETCH FIRST ..
ROWS ONLY, date_format with MySQL %-patterns, INTERVAL literals,
EXISTS/NOT EXISTS, IN-subqueries with HAVING, correlated scalar
subqueries, CTEs (WITH), scalar-subquery comparisons, CASE aggregation,
and typed TIMESTAMP literals.

Spark-first execution note: these texts lower onto the SAME Catalyst
plans as the DataFrame builds (broadcast of nation/region happens via
AQE/auto-broadcast thresholds rather than explicit broadcast() hints, so
the physical plans are equivalent at every SF where the dims stay under
the broadcast threshold — which constant-cardinality nation/region always
do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from witdb_spark.queries.registry import QUERIES, register

# Adapted TPC-H texts in Trino dialect. Adaptations match queries/tpch.py
# docstrings 1:1 (the driver schema drops partsupp and several columns).
_DEC_SUM = "CAST(SUM(CAST({x} AS DECIMAL(30,6))) AS DOUBLE) AS {a}"
_DEC_AVG = "CAST(SUM(CAST({x} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({x}) AS {a}"


def _s(x: str, a: str) -> str:
    return _DEC_SUM.format(x=x, a=a)


def _a(x: str, a: str) -> str:
    return _DEC_AVG.format(x=x, a=a)


# Derived partsupp (driver schema has none) — same derivation as
# queries/tpch.py PS_SQL, spelled once here for the SQL texts.
_PS = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost,
             SUM(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
"""

TEXTS: dict[int, str] = {
    1: f"""
    SELECT l_returnflag, l_linestatus,
           {_s('l_quantity', 'sum_qty')},
           {_s('l_extendedprice', 'sum_base_price')},
           {_s('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {_s('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {_a('l_quantity', 'avg_qty')},
           {_a('l_extendedprice', 'avg_price')},
           {_a('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    2: f"""
    WITH ps AS ({_PS}),
    eps AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, p_type
    FROM part JOIN eps ON p_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND ps_supplycost = (SELECT MIN(e2.ps_supplycost) FROM eps e2
                           WHERE e2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    FETCH FIRST 100 ROWS ONLY
    """,
    3: """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue,
           date_format(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    4: """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    5: f"""
    SELECT n_name, {_s('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    6: f"""
    SELECT {_s('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    7: f"""
    SELECT supp_nation, cust_nation, l_year, {_s('volume', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) AS shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    8: """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3'
                         THEN CAST(volume AS DECIMAL(30,6))
                         ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) AS all_nations
    GROUP BY o_year
    """,
    9: f"""
    SELECT nation, o_year, {_s('amount', 'sum_profit')}
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) AS profit
    GROUP BY nation, o_year
    """,
    10: f"""
    SELECT c_custkey, c_name,
           {_s('l_extendedprice * (1 - l_discount)', 'revenue')},
           {_s('c_acctbal', 'acctbal')},
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    11: """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(FLOOR(l_extendedprice / l_quantity * 1000000) AS BIGINT))
               AS ps_cost_micros,
             SUM(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY 1, 2),
    nps AS (
      SELECT ps_partkey,
             ps_cost_micros * CAST(ps_availqty AS BIGINT) AS part_value
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')),
    pv AS (
      SELECT ps_partkey,
             CAST(SUM(part_value) AS DOUBLE) / 1000000.0 AS value
      FROM nps GROUP BY ps_partkey)
    SELECT ps_partkey, value
    FROM pv
    WHERE value > (SELECT CAST(SUM(part_value) AS DOUBLE) / 1000000.0
                          * 2.0 / COUNT(DISTINCT ps_partkey) FROM nps)
    ORDER BY value DESC, ps_partkey
    LIMIT 100
    """,
    12: """
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL '30' DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_year
    """,
    13: """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    """,
    14: """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                    END) AS DOUBLE) * 100
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                  AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    15: """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    16: """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 35, 45)
    GROUP BY p_brand, p_type, p_size
    """,
    17: """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    18: f"""
    SELECT c_name, c_custkey, o_orderkey,
           date_format(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {_s('l_quantity', 'sum_qty')}
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    19: f"""
    SELECT {_s('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    20: f"""
    WITH ps AS ({_PS})
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > 0.5 * (
            SELECT SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
    ORDER BY s_name, s_acctbal
    """,
    21: """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL '60' DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    22: f"""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           {_s('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_nationkey IN (1, 2, 3, 4, 5)
      AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,6)))
                                   AS DOUBLE) / COUNT(c2.c_acctbal)
                       FROM customer c2
                       WHERE c2.c_acctbal > 0.0
                         AND c2.c_nationkey IN (1, 2, 3, 4, 5))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
}


def _make(n: int, text: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from witdb_spark.engine import Engine

        return Engine(spark, sf_dir=sf_dir).sql(text)

    fn.__name__ = f"tpch_sql_q{n}"
    fn.__doc__ = (
        f"TPC-H Q{n} as Trino SQL text through Engine.sql (reference "
        f"testing/trino-benchmark-queries/.../tpch/q{n:02d}.sql, adapted "
        "to the driver schema exactly as its DataFrame twin documents)."
    )
    return fn


for _n, _text in TEXTS.items():
    _twin = QUERIES[f"tpch_q{_n}"]
    register(
        f"tpch_sql_q{_n}",
        _twin.oracle,  # byte-identical expected output to the DataFrame twin
        doc=_make(_n, _text).__doc__,
        tags=("tpch", "sql_text", "dialect"),
    )(_make(_n, _text))
