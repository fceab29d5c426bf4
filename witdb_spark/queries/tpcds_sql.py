"""TPC-DS-shape queries as Trino SQL TEXT through ``Engine.sql``.

The reference ships 99 TPC-DS texts (reference
testing/trino-benchmark-queries/src/main/resources/sql/presto/tpcds/
q01-q99.sql). The driver schema is TPC-H-ish, so each query here keeps
the STRUCTURAL shape that makes its TPC-DS original a classic
transpiler/planner workout and maps the retail columns onto the driver
tables (mapping documented per query). These run through the full
parse -> transpile -> Catalyst path like the tpch_sql suite.

Determinism: every float aggregate follows the registry's decimal-exact
rules; every rank() carries name tie-breaks; queries avoid LIMIT so the
order-insensitive driver compare cannot interact with NULL-ordering
differences between engines (rolled-up NULLs sort differently in Spark
vs DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from witdb_spark.queries.registry import register

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))"

# q70 shape (reference tpcds/q70.sql): ROLLUP over a two-level hierarchy
# + GROUPING() arithmetic + rank() PARTITIONed by the grouping level and
# parent + an IN-subquery that itself ranks a windowed aggregate.
# Mapping: store_sales -> lineitem x orders x customer; s_state ->
# customer nation, s_county -> market segment; "top 5 states" -> top 3
# nations by revenue.
_Q70 = f"""
    SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS total_rev,
           n_name, c_mktsegment,
           (GROUPING(n_name) + GROUPING(c_mktsegment)) AS lochierarchy,
           CAST(rank() OVER (
             PARTITION BY GROUPING(n_name) + GROUPING(c_mktsegment),
                          CASE WHEN GROUPING(c_mktsegment) = 0 THEN n_name END
             ORDER BY SUM({_REV_DEC}) DESC, n_name, c_mktsegment
           ) AS INTEGER) AS rank_within_parent
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN (
      SELECT n_name FROM (
        SELECT n_name,
               rank() OVER (ORDER BY SUM({_REV_DEC}) DESC, n_name) AS ranking
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
      ) AS tmp1
      WHERE ranking <= 3)
    GROUP BY ROLLUP (n_name, c_mktsegment)
"""

# q36 shape (reference tpcds/q36.sql): gross-margin RATIO of two sums
# under ROLLUP + rank within parent ordered by the ratio. Mapping:
# i_category/i_class -> p_type/p_brand; net profit uses the q9 supply-
# cost model (0.5 * p_retailprice).
_Q36 = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS gross_margin,
           p_type, p_brand,
           (GROUPING(p_type) + GROUPING(p_brand)) AS lochierarchy,
           CAST(rank() OVER (
             PARTITION BY GROUPING(p_type) + GROUPING(p_brand),
                          CASE WHEN GROUPING(p_brand) = 0 THEN p_type END
             ORDER BY CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    - 0.5 * p_retailprice * l_quantity
                                    AS DECIMAL(30,6))) AS DOUBLE)
                      / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(30,6))) AS DOUBLE) ASC,
                      p_type, p_brand
           ) AS INTEGER) AS rank_within_parent
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ROLLUP (p_type, p_brand)
"""

# q47 shape (reference tpcds/q47.sql): CTE with a windowed average OVER
# the grouped sums + a rank-sequence self-joined twice to read the lag
# and lead neighbours, then a deviation filter. Mapping: (category,
# brand, store) -> order priority; monthly store sales -> monthly order
# totals. The windowed mean divides an exact DECIMAL window sum once so
# both engines produce bit-identical doubles.
_Q47 = """
    WITH v1 AS (
      SELECT o_orderpriority AS prio,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS moy,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS sum_dec
      FROM orders
      GROUP BY o_orderpriority, year(o_orderdate), month(o_orderdate)
    ),
    v1x AS (
      SELECT prio, yr, moy,
             CAST(sum_dec AS DOUBLE) AS sum_sales,
             CAST(SUM(sum_dec) OVER (PARTITION BY prio, yr) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY prio, yr) AS avg_monthly_sales,
             CAST(rank() OVER (PARTITION BY prio ORDER BY yr, moy)
                  AS INTEGER) AS rn
      FROM v1
    ),
    v2 AS (
      SELECT v.prio, v.yr, v.moy, v.avg_monthly_sales, v.sum_sales,
             vlag.sum_sales AS psum, vlead.sum_sales AS nsum
      FROM v1x v, v1x vlag, v1x vlead
      WHERE v.prio = vlag.prio AND v.prio = vlead.prio
        AND v.rn = vlag.rn + 1 AND v.rn = vlead.rn - 1
    )
    SELECT prio, yr, moy, sum_sales, avg_monthly_sales, psum, nsum
    FROM v2
    WHERE avg_monthly_sales > 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.05
"""

# q88 shape (reference tpcds/q88.sql): N independent filtered COUNT(*)
# scalar subqueries cross-joined into one row. Mapping: the 8 half-hour
# time buckets -> 4 quantity bands with a discount predicate.
_Q88 = """
    SELECT * FROM
      (SELECT COUNT(*) AS band_1_11 FROM lineitem
       WHERE l_quantity BETWEEN 1 AND 11 AND l_discount < 0.05) AS s1,
      (SELECT COUNT(*) AS band_12_24 FROM lineitem
       WHERE l_quantity BETWEEN 12 AND 24 AND l_discount < 0.05) AS s2,
      (SELECT COUNT(*) AS band_25_36 FROM lineitem
       WHERE l_quantity BETWEEN 25 AND 36 AND l_discount >= 0.05) AS s3,
      (SELECT COUNT(*) AS band_37_50 FROM lineitem
       WHERE l_quantity BETWEEN 37 AND 50 AND l_discount >= 0.05) AS s4
"""

TEXTS: dict[str, tuple[str, str | None, str]] = {
    # name -> (trino_text, oracle_override_or_None_for_same_text, doc)
    "tpcds_sql_q70": (
        _Q70,
        None,
        "TPC-DS q70 shape via Engine.sql: ROLLUP + GROUPING() + "
        "rank-within-parent + IN-subquery ranking a windowed aggregate "
        "(reference tpcds/q70.sql adapted: nation/mktsegment hierarchy).",
    ),
    "tpcds_sql_q36": (
        _Q36,
        None,
        "TPC-DS q36 shape via Engine.sql: ratio-of-sums gross margin "
        "under ROLLUP with rank within parent (reference tpcds/q36.sql "
        "adapted: p_type/p_brand hierarchy, q9 supply-cost model).",
    ),
    "tpcds_sql_q47": (
        _Q47,
        None,
        "TPC-DS q47 shape via Engine.sql: windowed average over grouped "
        "sums + rank-sequence self-joins for lag/lead neighbours + "
        "deviation filter (reference tpcds/q47.sql adapted to monthly "
        "order totals per priority).",
    ),
    "tpcds_sql_q88": (
        _Q88,
        None,
        "TPC-DS q88 shape via Engine.sql: independent filtered COUNT(*) "
        "scalar subqueries cross-joined into one row (reference "
        "tpcds/q88.sql adapted to quantity/discount bands).",
    ),
}


def _make(name: str, text: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from witdb_spark.engine import Engine

        return Engine(spark, sf_dir=sf_dir).sql(text)

    fn.__name__ = name
    return fn


for _name, (_text, _oracle, _doc) in TEXTS.items():
    register(
        _name,
        _oracle if _oracle is not None else _text,
        doc=_doc,
        tags=("tpcds", "sql_text", "dialect"),
    )(_make(_name, _text))


# q67 shape (reference tpcds/q67.sql): three-level ROLLUP ranked within
# the top category partition, top-k by windowed rank over the rollup
# output. NULL grouping keys from the rollup are coalesced in the rank
# tie-breaks (Spark orders NULLS FIRST, DuckDB NULLS LAST — coalesce
# makes the total order engine-identical).
_Q67 = """
    SELECT p_type, p_brand, yr, sum_sales, rk
    FROM (
      SELECT p_type, p_brand, yr, sum_sales,
             CAST(rank() OVER (
               PARTITION BY p_type
               ORDER BY sum_sales DESC, coalesce(p_brand, ''),
                        coalesce(yr, -1)
             ) AS INTEGER) AS rk
      FROM (
        SELECT p_type, p_brand,
               CAST(year(l_shipdate) AS INTEGER) AS yr,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,6))) AS DOUBLE) AS sum_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY ROLLUP (p_type, p_brand, year(l_shipdate))
      ) AS agg
    ) AS ranked
    WHERE rk <= 5
"""

# q34/q73 shape (reference tpcds/q34.sql): per-ticket item-count band
# via HAVING BETWEEN, joined back to the customer dimension, with a
# disjunctive dimension filter.
_Q34 = """
    WITH cnt AS (
      SELECT o_orderkey, o_custkey, CAST(COUNT(*) AS BIGINT) AS items
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         OR o_orderstatus = 'F'
      GROUP BY o_orderkey, o_custkey
      HAVING COUNT(*) BETWEEN 4 AND 7)
    SELECT c_name, c_custkey, o_orderkey, items
    FROM cnt JOIN customer ON c_custkey = o_custkey
"""

# q89 shape (reference tpcds/q89.sql): windowed mean over the grouped
# sums + relative-deviation filter (the q47 family without the
# lag/lead self-joins).
_Q89 = """
    SELECT p_brand, prio, moy, sum_sales, avg_monthly
    FROM (
      SELECT p_brand, prio, moy,
             CAST(sdec AS DOUBLE) AS sum_sales,
             CAST(SUM(sdec) OVER (PARTITION BY p_brand, prio) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand, prio) AS avg_monthly
      FROM (
        SELECT p_brand, o_orderpriority AS prio,
               CAST(month(o_orderdate) AS INTEGER) AS moy,
               SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS sdec
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY p_brand, o_orderpriority, month(o_orderdate)
      ) AS m
    ) AS x
    WHERE avg_monthly > 0
      AND abs(sum_sales - avg_monthly) / avg_monthly > 0.1
"""

# q44 shape (reference tpcds/q44.sql): best and worst performers via two
# opposite-direction ranked subqueries joined on rank, each resolved
# against the dimension table.
_Q44 = """
    WITH perf AS (
      SELECT l_suppkey AS sk,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) AS rev
      FROM lineitem GROUP BY l_suppkey),
    asc_r AS (
      SELECT sk, CAST(rank() OVER (ORDER BY rev ASC, sk) AS INTEGER)
               AS rnk FROM perf),
    desc_r AS (
      SELECT sk, CAST(rank() OVER (ORDER BY rev DESC, sk) AS INTEGER)
               AS rnk FROM perf)
    SELECT a.rnk, s1.s_name AS best_performing,
           s2.s_name AS worst_performing
    FROM asc_r a JOIN desc_r d ON a.rnk = d.rnk
         JOIN supplier s1 ON s1.s_suppkey = d.sk
         JOIN supplier s2 ON s2.s_suppkey = a.sk
    WHERE a.rnk <= 10
"""

_EXTRA: dict[str, tuple[str, str]] = {
    "tpcds_sql_q67": (
        _Q67,
        "TPC-DS q67 shape via Engine.sql: three-level ROLLUP + windowed "
        "rank top-k over the rollup output with NULL-safe tie-breaks "
        "(reference tpcds/q67.sql adapted to p_type/p_brand/ship-year).",
    ),
    "tpcds_sql_q34": (
        _Q34,
        "TPC-DS q34 shape via Engine.sql: per-ticket count band (HAVING "
        "BETWEEN) joined back to the customer dimension under a "
        "disjunctive filter (reference tpcds/q34.sql).",
    ),
    "tpcds_sql_q89": (
        _Q89,
        "TPC-DS q89 shape via Engine.sql: windowed mean over grouped "
        "sums + relative-deviation filter (reference tpcds/q89.sql).",
    ),
    "tpcds_sql_q44": (
        _Q44,
        "TPC-DS q44 shape via Engine.sql: opposite-direction rank "
        "subqueries joined on rank, resolved twice against the "
        "dimension (reference tpcds/q44.sql).",
    ),
}

for _name, (_text, _doc) in _EXTRA.items():
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# q51 shape (reference tpcds/q51.sql): per-channel cumulative window
# sums FULL OUTER JOINed on the time key, then a cumulative-vs-
# cumulative comparison. The empty-partition window runs over the
# already-aggregated month rows (tiny), not the fact table.
_Q51 = """
    WITH a AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
               AS ym,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS s
      FROM orders GROUP BY year(o_orderdate) * 100 + month(o_orderdate)),
    b AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER)
               AS ym,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS s
      FROM lineitem GROUP BY year(l_shipdate) * 100 + month(l_shipdate)),
    ac AS (SELECT ym, CAST(SUM(s) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM a),
    bc AS (SELECT ym, CAST(SUM(s) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM b)
    SELECT coalesce(ac.ym, bc.ym) AS ym,
           ac.cum AS order_cumulative, bc.cum AS ship_cumulative
    FROM ac FULL OUTER JOIN bc ON ac.ym = bc.ym
    WHERE ac.cum > bc.cum
"""

# q74 shape (reference tpcds/q74.sql): one year-total CTE self-joined
# across two years with a growth-ratio filter.
_Q74 = """
    WITH year_total AS (
      SELECT c_custkey, c_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name, year(o_orderdate))
    SELECT t1.c_custkey, t1.c_name,
           round(CAST(t2.total AS DOUBLE) / CAST(t1.total AS DOUBLE), 6)
             AS ratio
    FROM year_total t1 JOIN year_total t2 ON t1.c_custkey = t2.c_custkey
    WHERE t1.yr = 1996 AND t2.yr = 1997
      AND CAST(t2.total AS DOUBLE) / CAST(t1.total AS DOUBLE) > 1.5
"""

for _name, (_text, _doc) in {
    "tpcds_sql_q51": (
        _Q51,
        "TPC-DS q51 shape via Engine.sql: per-channel cumulative window "
        "sums FULL OUTER JOINed on the time key with a cumulative "
        "comparison (reference tpcds/q51.sql).",
    ),
    "tpcds_sql_q74": (
        _Q74,
        "TPC-DS q74 shape via Engine.sql: year-total CTE self-joined "
        "across years with a growth-ratio filter (reference "
        "tpcds/q74.sql).",
    ),
}.items():
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# q49 shape (reference tpcds/q49.sql): per-channel return-ratio ranking
# (two rank orders per channel), rank filter, UNION ALL across channels,
# DISTINCT. Quantities are integer-valued doubles, so the ratio is one
# deterministic IEEE division.
_Q49 = """
    WITH base AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'high'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                  ELSE 'low' END AS channel,
             l_partkey,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
               AS ret_qty,
             SUM(l_quantity) AS tot_qty
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, l_partkey
      HAVING SUM(l_quantity) > 0),
    ranked AS (
      SELECT channel, l_partkey,
             round(ret_qty / tot_qty, 6) AS return_ratio,
             CAST(rank() OVER (PARTITION BY channel
                               ORDER BY ret_qty / tot_qty DESC, l_partkey)
                  AS INTEGER) AS return_rank
      FROM base)
    SELECT DISTINCT channel, l_partkey, return_ratio, return_rank
    FROM (
      SELECT * FROM ranked WHERE channel = 'high'   AND return_rank <= 10
      UNION ALL
      SELECT * FROM ranked WHERE channel = 'medium' AND return_rank <= 10
      UNION ALL
      SELECT * FROM ranked WHERE channel = 'low'    AND return_rank <= 10
    ) AS u
"""

register(
    "tpcds_sql_q49",
    _Q49,
    doc="TPC-DS q49 shape via Engine.sql: per-channel return-ratio "
    "ranking, rank filter, UNION ALL across channels, DISTINCT "
    "(reference tpcds/q49.sql adapted to priority channels and "
    "returnflag quantities).",
    tags=("tpcds", "sql_text", "dialect"),
)(_make("tpcds_sql_q49", _Q49))


# q31 shape (reference tpcds/q31.sql): one quarter-total CTE per channel,
# SIX-way self-join pinning consecutive quarters, cross-channel growth
# comparison. Classic join-reorder workout.
_Q31 = """
    WITH ss AS (
      SELECT n_name, CAST(quarter(o_orderdate) AS INTEGER) AS q,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS total
      FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name, quarter(o_orderdate)),
    ws AS (
      SELECT n_name, CAST(quarter(l_shipdate) AS INTEGER) AS q,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS total
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name, quarter(l_shipdate))
    SELECT ss1.n_name,
           round(CAST(ss2.total AS DOUBLE) / CAST(ss1.total AS DOUBLE), 6)
             AS store_q1_q2_increase,
           round(CAST(ss3.total AS DOUBLE) / CAST(ss2.total AS DOUBLE), 6)
             AS store_q2_q3_increase,
           round(CAST(ws2.total AS DOUBLE) / CAST(ws1.total AS DOUBLE), 6)
             AS web_q1_q2_increase,
           round(CAST(ws3.total AS DOUBLE) / CAST(ws2.total AS DOUBLE), 6)
             AS web_q2_q3_increase
    FROM ss ss1 JOIN ss ss2 ON ss1.n_name = ss2.n_name
         JOIN ss ss3 ON ss1.n_name = ss3.n_name
         JOIN ws ws1 ON ss1.n_name = ws1.n_name
         JOIN ws ws2 ON ss1.n_name = ws2.n_name
         JOIN ws ws3 ON ss1.n_name = ws3.n_name
    WHERE ss1.q = 1 AND ss2.q = 2 AND ss3.q = 3
      AND ws1.q = 1 AND ws2.q = 2 AND ws3.q = 3
      AND CAST(ws2.total AS DOUBLE) / CAST(ws1.total AS DOUBLE)
          > CAST(ss2.total AS DOUBLE) / CAST(ss1.total AS DOUBLE)
"""

register(
    "tpcds_sql_q31",
    _Q31,
    doc="TPC-DS q31 shape via Engine.sql: per-channel quarter-total CTEs "
    "six-way self-joined on consecutive quarters with a cross-channel "
    "growth comparison (reference tpcds/q31.sql adapted to "
    "orders-vs-lineitem channels by customer nation).",
    tags=("tpcds", "sql_text", "dialect"),
)(_make("tpcds_sql_q31", _Q31))
