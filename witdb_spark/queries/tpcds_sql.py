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


# ---- r6 tranche 2: channel-UNION YoY, set-op overlap, multi-reference
# CTEs, returns-adjusted sales, period pivots, below-average scans,
# cov self-joins (reference testing/trino-benchmark-queries/.../tpcds/
# q75 q5 q38 q87 q23 q95 q93 q59 q65 q39) ----

# q75 shape: UNION ALL across channels -> per (year, brand) totals ->
# prev/curr year self-join -> decline filter. The decline comparison is
# cross-multiplied in DECIMAL (curr*10 < prev*9 <=> ratio < 0.9) so no
# engine-specific decimal-division scale rule can flip a row.
_Q75 = """
    WITH all_sales AS (
      SELECT yr, p_brand,
             SUM(qty) AS qty, SUM(amt) AS amt
      FROM (
        SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, p_brand,
               CAST(l_quantity AS DECIMAL(30,6)) AS qty,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS amt
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION ALL
        SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, p_brand,
               CAST(l_quantity AS DECIMAL(30,6)) AS qty,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS amt
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority = '3-MEDIUM'
        UNION ALL
        SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, p_brand,
               CAST(l_quantity AS DECIMAL(30,6)) AS qty,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS amt
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      ) AS u
      GROUP BY yr, p_brand)
    SELECT prev_s.yr AS prev_year, curr_s.yr AS yr, curr_s.p_brand,
           CAST(prev_s.qty AS DOUBLE) AS prev_qty,
           CAST(curr_s.qty AS DOUBLE) AS curr_qty,
           CAST(curr_s.qty - prev_s.qty AS DOUBLE) AS qty_diff,
           CAST(curr_s.amt - prev_s.amt AS DOUBLE) AS amt_diff
    FROM all_sales curr_s JOIN all_sales prev_s
         ON curr_s.p_brand = prev_s.p_brand
    WHERE prev_s.yr = 1996 AND curr_s.yr = 1997
      AND curr_s.qty * 10 < prev_s.qty * 9
"""

# q5 shape: per-channel sales/returns/profit report rolled up with
# ROLLUP(channel, id) — the channel P&L union report. Channels map to
# order-priority classes; returns are the R-returnflag rows.
_Q5 = """
    WITH wd AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'web'
                  WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog'
                  ELSE 'store' END AS channel,
             o_orderpriority AS id,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
               AS sales_price,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(30,6))
                  ELSE CAST(0 AS DECIMAL(30,6)) END AS return_amt
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
    SELECT channel, id,
           CAST(SUM(sales_price) AS DOUBLE) AS sales,
           CAST(SUM(return_amt) AS DOUBLE) AS returns_amt,
           CAST(SUM(sales_price) - SUM(return_amt) AS DOUBLE) AS profit
    FROM wd
    GROUP BY ROLLUP (channel, id)
"""

# q38 shape: customers active in ALL THREE channels — INTERSECT of three
# DISTINCT key sets, then one COUNT.
_Q38 = """
    SELECT COUNT(*) AS hot_cust
    FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    ) AS hot
"""

# q87 shape: the EXCEPT twin — customers in the first channel and in
# neither of the others.
_Q87 = """
    SELECT COUNT(*) AS exclusive_cust
    FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'
      EXCEPT
      SELECT o_custkey FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    ) AS ex
"""

# q23 shape: two CTEs (frequent items, best customers) each referenced
# TWICE — once by each UNION ALL half — plus a scalar-subquery threshold
# over a third CTE that the best-customers CTE also reads. The spend
# threshold is cross-multiplied (tot * 4 > max) to stay in DECIMAL.
_Q23 = """
    WITH freq AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(*) > 4),
    cust_tot AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS tot
      FROM orders GROUP BY o_custkey),
    best AS (
      SELECT o_custkey FROM cust_tot
      WHERE tot * 4 > (SELECT MAX(tot) FROM cust_tot))
    SELECT CAST(SUM(amt) AS DOUBLE) AS total_sales
    FROM (
      SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS amt
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE quarter(o_orderdate) <= 2
        AND l_partkey IN (SELECT l_partkey FROM freq)
        AND o_custkey IN (SELECT o_custkey FROM best)
      UNION ALL
      SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS amt
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE quarter(o_orderdate) >= 3
        AND l_partkey IN (SELECT l_partkey FROM freq)
        AND o_custkey IN (SELECT o_custkey FROM best)
    ) AS halves
"""

# q95 shape: one CTE consumed by TWO IN-subqueries of the same outer
# query (the second nested inside another subquery) — the CTE-reuse
# pattern that separates plan-level CTE materialization from textual
# inlining.
_Q95 = """
    WITH multi_supp AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1)
    SELECT COUNT(DISTINCT o_orderkey) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderkey IN (SELECT l_orderkey FROM multi_supp)
      AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_orderkey IN (SELECT l_orderkey FROM multi_supp))
"""

# q93 shape: returns-adjusted actual sales — aggregated returns CTE LEFT
# JOINed back to sales rows, CASE choosing between net-of-returns and
# full quantity. least() caps the returned quantity like the reference
# caps sr_return_quantity at ss_quantity.
_Q93 = """
    WITH ret AS (
      SELECT l_orderkey AS r_orderkey, l_partkey AS r_partkey,
             SUM(l_quantity) AS ret_qty
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_orderkey, l_partkey)
    SELECT o_custkey,
           CAST(SUM(CASE WHEN ret_qty IS NOT NULL
                    THEN CAST((l_quantity - least(l_quantity, ret_qty))
                              * l_extendedprice AS DECIMAL(30,6))
                    ELSE CAST(l_quantity * l_extendedprice
                              AS DECIMAL(30,6)) END) AS DOUBLE) AS sumsales
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         LEFT JOIN ret ON r_orderkey = l_orderkey AND r_partkey = l_partkey
    WHERE l_returnflag <> 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY o_custkey
"""

# q59 shape: per-period CASE-pivot totals (the day-of-week pivot of the
# original, mapped to quarters) self-joined across two years with
# per-column ratios.
_Q59 = """
    WITH qt AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(CASE WHEN quarter(o_orderdate) = 1
                      THEN CAST(o_totalprice AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS q1_sales,
             SUM(CASE WHEN quarter(o_orderdate) = 2
                      THEN CAST(o_totalprice AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS q2_sales,
             SUM(CASE WHEN quarter(o_orderdate) = 3
                      THEN CAST(o_totalprice AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS q3_sales,
             SUM(CASE WHEN quarter(o_orderdate) = 4
                      THEN CAST(o_totalprice AS DECIMAL(30,6))
                      ELSE CAST(0 AS DECIMAL(30,6)) END) AS q4_sales
      FROM orders GROUP BY o_custkey, year(o_orderdate))
    SELECT y1.o_custkey,
           round(CAST(y2.q1_sales AS DOUBLE) / CAST(y1.q1_sales AS DOUBLE), 6)
             AS q1_ratio,
           round(CAST(y2.q2_sales AS DOUBLE) / CAST(y1.q2_sales AS DOUBLE), 6)
             AS q2_ratio,
           round(CAST(y2.q3_sales AS DOUBLE) / CAST(y1.q3_sales AS DOUBLE), 6)
             AS q3_ratio,
           round(CAST(y2.q4_sales AS DOUBLE) / CAST(y1.q4_sales AS DOUBLE), 6)
             AS q4_ratio
    FROM qt y1 JOIN qt y2 ON y1.o_custkey = y2.o_custkey
    WHERE y1.yr = 1996 AND y2.yr = 1997
      AND y1.q1_sales > 0 AND y1.q2_sales > 0
      AND y1.q3_sales > 0 AND y1.q4_sales > 0
"""

# q65 shape: (supplier, part) revenues joined against the supplier's
# average part revenue, keeping rows at or below 10% of it. The
# threshold is cross-multiplied (rev * cnt * 10 <= tot) so both engines
# compare exact decimals instead of divided doubles.
_Q65 = """
    WITH sb AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS revenue
      FROM lineitem GROUP BY l_suppkey, l_partkey),
    sa AS (
      SELECT l_suppkey, SUM(revenue) AS tot, COUNT(*) AS cnt
      FROM sb GROUP BY l_suppkey)
    SELECT s_name, p_name, CAST(sb.revenue AS DOUBLE) AS revenue
    FROM sb JOIN sa ON sb.l_suppkey = sa.l_suppkey
         JOIN supplier ON s_suppkey = sb.l_suppkey
         JOIN part ON p_partkey = sb.l_partkey
    WHERE sb.revenue * cnt * 10 <= sa.tot
"""

# q39 shape: coefficient-of-variation per (part, month) computed from
# exact decimal sum/sum-of-squares (quantities are integer-valued, so
# both moments are exact), consecutive months self-joined where both
# sides are high-variance. greatest(...) clamps the tiny negative
# variance float error so sqrt never sees it.
_Q39 = """
    WITH inv AS (
      SELECT l_partkey, CAST(month(l_shipdate) AS INTEGER) AS mo,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS s,
             SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS ss
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY l_partkey, month(l_shipdate)
      HAVING COUNT(*) > 1),
    cv AS (
      SELECT l_partkey, mo,
             round(sqrt(greatest((CAST(ss AS DOUBLE)
                                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                 / (n - 1), 0.0e0))
                   / (CAST(s AS DOUBLE) / n), 6) AS cov
      FROM inv WHERE s > 0)
    SELECT i1.l_partkey, i1.mo AS mo1, i1.cov AS cov1,
           i2.mo AS mo2, i2.cov AS cov2
    FROM cv i1 JOIN cv i2
         ON i1.l_partkey = i2.l_partkey AND i2.mo = i1.mo + 1
    WHERE i1.cov > 0.7e0 AND i2.cov > 0.7e0
"""

for _name, _text, _doc in [
    ("tpcds_sql_q75", _Q75,
     "TPC-DS q75 shape via Engine.sql: three-channel UNION ALL, per "
     "(year, brand) totals, prev/curr self-join, cross-multiplied "
     "decline filter (reference tpcds/q75.sql adapted to order-priority "
     "channels)."),
    ("tpcds_sql_q5", _Q5,
     "TPC-DS q5 shape via Engine.sql: channel sales/returns/profit "
     "report under ROLLUP(channel, id) (reference tpcds/q5.sql adapted: "
     "priority channels, R-returnflag returns)."),
    ("tpcds_sql_q38", _Q38,
     "TPC-DS q38 shape via Engine.sql: INTERSECT of three channel "
     "customer sets, counted (reference tpcds/q38.sql)."),
    ("tpcds_sql_q87", _Q87,
     "TPC-DS q87 shape via Engine.sql: chained EXCEPT across the three "
     "channel customer sets, counted (reference tpcds/q87.sql)."),
    ("tpcds_sql_q23", _Q23,
     "TPC-DS q23 shape via Engine.sql: frequent-items + best-customers "
     "CTEs each referenced twice across UNION ALL halves, scalar MAX "
     "threshold over a shared CTE (reference tpcds/q23.sql)."),
    ("tpcds_sql_q95", _Q95,
     "TPC-DS q95 shape via Engine.sql: one CTE feeding two IN-subqueries "
     "(one nested) of the same query (reference tpcds/q95.sql adapted: "
     "multi-supplier orders for the warehouse condition)."),
    ("tpcds_sql_q93", _Q93,
     "TPC-DS q93 shape via Engine.sql: aggregated returns LEFT JOINed "
     "back to sales with a CASE net-of-returns measure (reference "
     "tpcds/q93.sql)."),
    ("tpcds_sql_q59", _Q59,
     "TPC-DS q59 shape via Engine.sql: CASE-pivot per-quarter totals "
     "self-joined across years with per-column ratios (reference "
     "tpcds/q59.sql, day-of-week pivot mapped to quarters)."),
    ("tpcds_sql_q65", _Q65,
     "TPC-DS q65 shape via Engine.sql: per-(supplier, part) revenue vs "
     "the supplier's average part revenue, cross-multiplied threshold "
     "(reference tpcds/q65.sql)."),
    ("tpcds_sql_q39", _Q39,
     "TPC-DS q39 shape via Engine.sql: per-(part, month) coefficient of "
     "variation from exact decimal moments, consecutive-month self-join "
     "on high-variance cells (reference tpcds/q39.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# ---- tranche 3 (r7): year-total ratios, cross-channel INTERSECT CTE,
# triple-union item-list family, channel P&L with returns, visit shapes.

# q11 shape (reference tpcds/q11.sql): a year_total CTE (per-customer
# yearly totals per channel, UNION ALL with a sale_type tag) self-joined
# FOUR ways (channel x first/second year); customers whose second-year
# growth ratio in channel w beats channel s. The ratio comparison is
# cross-multiplied so both engines compare exact decimals (both
# first-year totals are filtered > 0, so the inequality is equivalent).
# Channels: s = urgent/high priority orders, w = the rest.
_Q11 = """
    WITH year_total AS (
      SELECT o_custkey AS cid, CAST(year(o_orderdate) AS INTEGER) AS dyear,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS year_total,
             's' AS sale_type
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey, year(o_orderdate)
      UNION ALL
      SELECT o_custkey AS cid, CAST(year(o_orderdate) AS INTEGER) AS dyear,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS year_total,
             'w' AS sale_type
      FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey, year(o_orderdate))
    SELECT t_s_secyear.cid AS customer_id, c_name AS customer_name
    FROM year_total t_s_firstyear
         JOIN year_total t_s_secyear
           ON t_s_secyear.cid = t_s_firstyear.cid
         JOIN year_total t_w_firstyear
           ON t_w_firstyear.cid = t_s_firstyear.cid
         JOIN year_total t_w_secyear
           ON t_w_secyear.cid = t_s_firstyear.cid
         JOIN customer ON c_custkey = t_s_firstyear.cid
    WHERE t_s_firstyear.sale_type = 's' AND t_s_secyear.sale_type = 's'
      AND t_w_firstyear.sale_type = 'w' AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 1996 AND t_s_secyear.dyear = 1997
      AND t_w_firstyear.dyear = 1996 AND t_w_secyear.dyear = 1997
      AND t_s_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND t_w_secyear.year_total * t_s_firstyear.year_total
          > t_s_secyear.year_total * t_w_firstyear.year_total
"""

# q4 shape (reference tpcds/q4.sql): q11 with a THIRD channel — the
# year_total CTE is self-joined SIX ways and both channel growth ratios
# must beat the store channel's (both comparisons cross-multiplied).
# The two comparison periods are multi-year halves (<=1997 vs >1997)
# so all-three-channel presence in both periods is non-degenerate at
# the sf0.01 gate scale (single years gave an empty result).
_Q4 = """
    WITH year_total AS (
      SELECT o_custkey AS cid,
             CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END AS dyear,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS year_total,
             's' AS sale_type
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey,
               CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END
      UNION ALL
      SELECT o_custkey AS cid,
             CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END AS dyear,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS year_total,
             'c' AS sale_type
      FROM orders WHERE o_orderpriority = '3-MEDIUM'
      GROUP BY o_custkey,
               CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END
      UNION ALL
      SELECT o_custkey AS cid,
             CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END AS dyear,
             SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS year_total,
             'w' AS sale_type
      FROM orders
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      GROUP BY o_custkey,
               CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 2 END)
    SELECT t_s_secyear.cid AS customer_id, c_name AS customer_name
    FROM year_total t_s_firstyear
         JOIN year_total t_s_secyear
           ON t_s_secyear.cid = t_s_firstyear.cid
         JOIN year_total t_c_firstyear
           ON t_c_firstyear.cid = t_s_firstyear.cid
         JOIN year_total t_c_secyear
           ON t_c_secyear.cid = t_s_firstyear.cid
         JOIN year_total t_w_firstyear
           ON t_w_firstyear.cid = t_s_firstyear.cid
         JOIN year_total t_w_secyear
           ON t_w_secyear.cid = t_s_firstyear.cid
         JOIN customer ON c_custkey = t_s_firstyear.cid
    WHERE t_s_firstyear.sale_type = 's' AND t_s_secyear.sale_type = 's'
      AND t_c_firstyear.sale_type = 'c' AND t_c_secyear.sale_type = 'c'
      AND t_w_firstyear.sale_type = 'w' AND t_w_secyear.sale_type = 'w'
      AND t_s_firstyear.dyear = 1 AND t_s_secyear.dyear = 2
      AND t_c_firstyear.dyear = 1 AND t_c_secyear.dyear = 2
      AND t_w_firstyear.dyear = 1 AND t_w_secyear.dyear = 2
      AND t_s_firstyear.year_total > 0
      AND t_c_firstyear.year_total > 0
      AND t_w_firstyear.year_total > 0
      AND t_c_secyear.year_total * t_s_firstyear.year_total
          > t_s_secyear.year_total * t_c_firstyear.year_total
      AND t_w_secyear.year_total * t_s_firstyear.year_total
          > t_s_secyear.year_total * t_w_firstyear.year_total
"""

# q14 shape (reference tpcds/q14.sql): cross_items = parts whose
# (brand, type) sold in ALL THREE channels (a two-fold INTERSECT inside
# a CTE), avg_sales = a scalar threshold CTE over all channels, main
# query = per-channel brand totals over cross_items only, kept when the
# channel total beats the all-channel average (cross-multiplied:
# sum * count > total), UNION ALLed. Sales threshold and measures stay
# DECIMAL until the final projection.
_Q14 = """
    WITH cross_items AS (
      SELECT p_partkey FROM part
      JOIN (
        SELECT p_brand AS brand_id, p_type AS type_id
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        INTERSECT
        SELECT p_brand AS brand_id, p_type AS type_id
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority = '3-MEDIUM'
        INTERSECT
        SELECT p_brand AS brand_id, p_type AS type_id
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      ) AS ci ON p_brand = brand_id AND p_type = type_id),
    avg_sales AS (
      SELECT SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS tot,
             COUNT(*) AS cnt
      FROM lineitem)
    SELECT channel, p_brand, CAST(sales AS DOUBLE) AS sales, num_sales
    FROM (
      SELECT 'store' AS channel, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             CAST(COUNT(*) AS BIGINT) AS num_sales
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l_partkey IN (SELECT p_partkey FROM cross_items)
      GROUP BY p_brand
      UNION ALL
      SELECT 'catalog' AS channel, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             CAST(COUNT(*) AS BIGINT) AS num_sales
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE o_orderpriority = '3-MEDIUM'
        AND l_partkey IN (SELECT p_partkey FROM cross_items)
      GROUP BY p_brand
      UNION ALL
      SELECT 'web' AS channel, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             CAST(COUNT(*) AS BIGINT) AS num_sales
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND l_partkey IN (SELECT p_partkey FROM cross_items)
      GROUP BY p_brand
    ) AS per_channel
    WHERE sales * (SELECT cnt FROM avg_sales)
          > num_sales * (SELECT tot FROM avg_sales)
"""

# q33/q56/q60 family (reference tpcds/q33.sql, q56.sql, q60.sql): three
# per-channel CTEs each restricted to an ITEM LIST (brands matching an
# item attribute, via IN over the dimension), UNION ALLed and re-grouped.
# The three variants differ only in the item-list attribute — exactly as
# in TPC-DS (q33: manufacturer by category; q56: item by color; q60: item
# by category) — mapped here to p_type / p_size / p_name prefix.
def _q33_family(item_list_where: str) -> str:
    chan = {
        "ss": "o_orderpriority IN ('1-URGENT', '2-HIGH')",
        "cs": "o_orderpriority = '3-MEDIUM'",
        "ws": "o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')",
    }
    ctes = ",\n".join(
        f"""    {name} AS (
      SELECT p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS total_sales
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE {cond}
        AND year(o_orderdate) = 1996
        AND p_brand IN (SELECT p_brand FROM part WHERE {item_list_where})
      GROUP BY p_brand)"""
        for name, cond in chan.items()
    )
    return f"""
    WITH
{ctes}
    SELECT p_brand, CAST(SUM(total_sales) AS DOUBLE) AS total_sales
    FROM (
      SELECT * FROM ss
      UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws
    ) AS tmp1
    GROUP BY p_brand
"""


_Q33 = _q33_family("p_type = 'ECONOMY'")
_Q56 = _q33_family("p_size IN (1, 2, 3, 4, 5)")
_Q60 = _q33_family("p_name LIKE 'small%'")

# q77 shape (reference tpcds/q77.sql): per-channel P&L — each channel
# computes a sales CTE and a returns CTE on its own key, LEFT JOINs them,
# the three channel reports are UNION ALLed and rolled up with
# ROLLUP(channel, id). Returns are the R-returnflag rows; profit nets
# the tax like the reference nets net_loss.
_Q77 = """
    WITH ss AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             SUM(CAST(l_extendedprice * (1 - l_discount) * (1 - l_tax)
                      AS DECIMAL(30,6))) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l_returnflag <> 'R'
      GROUP BY s_nationkey),
    sr AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS returns_amt,
             SUM(CAST(l_extendedprice * (1 - l_discount) * l_tax
                      AS DECIMAL(30,6))) AS profit_loss
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l_returnflag = 'R'
      GROUP BY s_nationkey),
    cs AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             SUM(CAST(l_extendedprice * (1 - l_discount) * (1 - l_tax)
                      AS DECIMAL(30,6))) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority = '3-MEDIUM' AND l_returnflag <> 'R'
      GROUP BY s_nationkey),
    cr AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS returns_amt,
             SUM(CAST(l_extendedprice * (1 - l_discount) * l_tax
                      AS DECIMAL(30,6))) AS profit_loss
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority = '3-MEDIUM' AND l_returnflag = 'R'
      GROUP BY s_nationkey),
    ws AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sales,
             SUM(CAST(l_extendedprice * (1 - l_discount) * (1 - l_tax)
                      AS DECIMAL(30,6))) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND l_returnflag <> 'R'
      GROUP BY s_nationkey),
    wr AS (
      SELECT s_nationkey AS id,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS returns_amt,
             SUM(CAST(l_extendedprice * (1 - l_discount) * l_tax
                      AS DECIMAL(30,6))) AS profit_loss
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
        AND l_returnflag = 'R'
      GROUP BY s_nationkey)
    SELECT channel, id,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns_amt) AS DOUBLE) AS returns_amt,
           CAST(SUM(profit) AS DOUBLE) AS profit
    FROM (
      SELECT 'store channel' AS channel, ss.id,
             sales, coalesce(returns_amt, CAST(0 AS DECIMAL(30,6)))
               AS returns_amt,
             profit - coalesce(profit_loss, CAST(0 AS DECIMAL(30,6)))
               AS profit
      FROM ss LEFT JOIN sr ON ss.id = sr.id
      UNION ALL
      SELECT 'catalog channel' AS channel, cs.id,
             sales, coalesce(returns_amt, CAST(0 AS DECIMAL(30,6)))
               AS returns_amt,
             profit - coalesce(profit_loss, CAST(0 AS DECIMAL(30,6)))
               AS profit
      FROM cs LEFT JOIN cr ON cs.id = cr.id
      UNION ALL
      SELECT 'web channel' AS channel, ws.id,
             sales, coalesce(returns_amt, CAST(0 AS DECIMAL(30,6)))
               AS returns_amt,
             profit - coalesce(profit_loss, CAST(0 AS DECIMAL(30,6)))
               AS profit
      FROM ws LEFT JOIN wr ON ws.id = wr.id
    ) AS x
    GROUP BY ROLLUP (channel, id)
"""

# q46 shape (reference tpcds/q46.sql): per-ticket (order) aggregate with
# a DISJUNCTIVE dimension filter, grouped by a hidden extra key (the
# supplier nation = "bought city"), joined back to the customer and
# kept where the customer's own nation differs ("current_addr.ca_city
# <> bought_city"), nation joined twice under different aliases.
_Q46 = """
    WITH dn AS (
      SELECT l_orderkey AS ticket_number, o_custkey,
             s_nationkey AS bought_nation,
             SUM(CAST(l_extendedprice * l_discount
                      AS DECIMAL(30,6))) AS amt,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE (o_orderpriority = '1-URGENT' OR o_orderstatus = 'F')
        AND year(o_orderdate) IN (1996, 1997)
      GROUP BY l_orderkey, o_custkey, s_nationkey)
    SELECT c_name, cn.n_name AS current_nation,
           bn.n_name AS bought_nation, ticket_number,
           CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
    FROM dn JOIN customer ON c_custkey = o_custkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
         JOIN nation bn ON bn.n_nationkey = dn.bought_nation
    WHERE cn.n_name <> bn.n_name
"""

# q68 shape (reference tpcds/q68.sql): q46's sibling — same
# ticket-grouped inner aggregate under a different disjunctive filter,
# THREE measures, and the customer key carried to the output.
_Q68 = """
    WITH dn AS (
      SELECT l_orderkey AS ticket_number, o_custkey,
             s_nationkey AS bought_nation,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS extended_price,
             SUM(CAST(l_extendedprice * l_tax AS DECIMAL(30,6))) AS
               extended_tax,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS list_quantity
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE (o_orderstatus = 'O' OR o_orderpriority = '5-LOW')
        AND year(o_orderdate) IN (1996, 1997)
      GROUP BY l_orderkey, o_custkey, s_nationkey)
    SELECT c_custkey, c_name, cn.n_name AS current_nation,
           bn.n_name AS bought_nation, ticket_number,
           CAST(extended_price AS DOUBLE) AS extended_price,
           CAST(extended_tax AS DOUBLE) AS extended_tax,
           CAST(list_quantity AS DOUBLE) AS list_quantity
    FROM dn JOIN customer ON c_custkey = o_custkey
         JOIN nation cn ON cn.n_nationkey = c_nationkey
         JOIN nation bn ON bn.n_nationkey = dn.bought_nation
    WHERE cn.n_name <> bn.n_name
"""

for _name, _text, _doc in [
    ("tpcds_sql_q11", _Q11,
     "TPC-DS q11 shape via Engine.sql: year_total CTE (two channels "
     "UNION ALL) self-joined four ways, cross-multiplied growth-ratio "
     "comparison (reference tpcds/q11.sql adapted to priority "
     "channels)."),
    ("tpcds_sql_q4", _Q4,
     "TPC-DS q4 shape via Engine.sql: year_total CTE over THREE "
     "channels self-joined six ways, two cross-multiplied ratio "
     "comparisons (reference tpcds/q4.sql)."),
    ("tpcds_sql_q14", _Q14,
     "TPC-DS q14 shape via Engine.sql: cross-channel INTERSECT CTE "
     "(items sold in all three channels), scalar threshold CTE, "
     "per-channel UNION ALL report filtered by a cross-multiplied "
     "group-avg-vs-global-avg comparison (reference tpcds/q14.sql)."),
    ("tpcds_sql_q33", _Q33,
     "TPC-DS q33 shape via Engine.sql: three channel CTEs restricted "
     "to an item list (brands of a p_type), UNION ALL re-grouped "
     "(reference tpcds/q33.sql)."),
    ("tpcds_sql_q56", _Q56,
     "TPC-DS q56 shape via Engine.sql: the q33 family keyed by an item "
     "size list (reference tpcds/q56.sql)."),
    ("tpcds_sql_q60", _Q60,
     "TPC-DS q60 shape via Engine.sql: the q33 family keyed by an item "
     "name prefix (reference tpcds/q60.sql)."),
    ("tpcds_sql_q77", _Q77,
     "TPC-DS q77 shape via Engine.sql: per-channel sales CTE LEFT JOIN "
     "returns CTE, three channel reports UNION ALLed under "
     "ROLLUP(channel, id) (reference tpcds/q77.sql)."),
    ("tpcds_sql_q46", _Q46,
     "TPC-DS q46 shape via Engine.sql: ticket-grouped aggregate with a "
     "disjunctive filter, customer joined back, nation dimension "
     "aliased twice, mismatch predicate (reference tpcds/q46.sql)."),
    ("tpcds_sql_q68", _Q68,
     "TPC-DS q68 shape via Engine.sql: q46's sibling with three "
     "measures and the customer key in the output (reference "
     "tpcds/q68.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# ---------------------------------------------------------------------------
# Tranche 4 (r8): returns-CTE correlated thresholds (q1/q30/q81),
# sales<->returns 3-way chains (q17/q25/q29), day-bucket CASE pivots
# (q62/q99), ranked-month scalar subquery (q6), excess-discount
# correlated avg (q32), wide multi-join with HAVING CTE + year self-join
# (q64), and the cross-channel anti-join report (q78).
#
# Driver-schema return model (documented once, used by the whole
# tranche): the fixture has no separate returns fact table, so a
# "return" IS the lineitem row with l_returnflag = 'R', matched 1:1 on
# (l_orderkey, l_linenumber); the returned quantity is modeled as a
# partial return floor((l_quantity + 1) / 2). The "catalog" channel of
# the q17/q25/q29 chains is another sale of the same (part, supplier)
# in a different order. Correlated AVG thresholds use the registry's
# decimal-exact avg (CAST(SUM(decimal) AS DOUBLE) / COUNT(*)) so the
# threshold comparison is one deterministic IEEE multiply per row.

# q1 shape (reference tpcds/q01.sql): returns-total CTE per (customer,
# store), correlated AVG*1.2 threshold over the same CTE, store filter,
# customer join. Mapping: store -> supplier nation.
_Q1 = """
    WITH customer_total_return AS (
      SELECT o_custkey AS ctr_customer, n_name AS ctr_store,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS ctr_total_return
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1995
      GROUP BY o_custkey, n_name)
    SELECT c_name, CAST(ctr_total_return AS DOUBLE) AS total_return
    FROM customer_total_return ctr1 JOIN customer ON c_custkey = ctr_customer
    WHERE ctr_store = 'NATION_7'
      AND CAST(ctr_total_return AS DOUBLE) > (
        SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
        FROM customer_total_return ctr2
        WHERE ctr1.ctr_store = ctr2.ctr_store)
"""

# q30 shape (reference tpcds/q30.sql): the q1 family keyed by the
# CUSTOMER's geography (web returns per customer per state), wide
# customer output columns.
_Q30 = """
    WITH customer_total_return AS (
      SELECT o_custkey AS ctr_customer, n_name AS ctr_state,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS ctr_total_return
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer cx ON cx.c_custkey = o_custkey
           JOIN nation ON cx.c_nationkey = n_nationkey
      WHERE l_returnflag = 'R' AND year(o_orderdate) = 1997
      GROUP BY o_custkey, n_name)
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
    FROM customer_total_return ctr1 JOIN customer ON c_custkey = ctr_customer
    WHERE ctr_state = 'NATION_11'
      AND CAST(ctr_total_return AS DOUBLE) > (
        SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
        FROM customer_total_return ctr2
        WHERE ctr1.ctr_state = ctr2.ctr_state)
"""

# q81 shape (reference tpcds/q81.sql): the q1 family over catalog
# returns with tax-inclusive amounts and the address-style output list.
_Q81 = """
    WITH customer_total_return AS (
      SELECT o_custkey AS ctr_customer, n_name AS ctr_state,
             SUM(CAST(l_extendedprice * (1 + l_tax) AS DECIMAL(30,6)))
               AS ctr_total_return
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer cx ON cx.c_custkey = o_custkey
           JOIN nation ON cx.c_nationkey = n_nationkey
      WHERE l_returnflag = 'R' AND year(o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey, n_name)
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal, ctr_state,
           CAST(ctr_total_return AS DOUBLE) AS ctr_total_return
    FROM customer_total_return ctr1 JOIN customer ON c_custkey = ctr_customer
    WHERE ctr_state = 'NATION_3'
      AND CAST(ctr_total_return AS DOUBLE) > (
        SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
        FROM customer_total_return ctr2
        WHERE ctr1.ctr_state = ctr2.ctr_state)
"""

# q6 shape (reference tpcds/q06.sql): per-state customer count for
# items priced above k * category average — a scalar DISTINCT month
# subquery (EnforceSingleRow) AND a correlated category-average scalar
# subquery in one WHERE. k adapted 1.2 -> 1.05: fixture p_retailprice
# is uniform [900, 1000], so 1.2 * avg selects nothing by construction.
_Q6 = """
    SELECT n_name AS state, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN part i ON i.p_partkey = l.l_partkey
    WHERE year(o.o_orderdate) = (
        SELECT DISTINCT year(o_orderdate) FROM orders
        WHERE year(o_orderdate) = 1995)
      AND i.p_retailprice > 1.05 * (
        SELECT CAST(SUM(CAST(j.p_retailprice AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*)
        FROM part j WHERE j.p_type = i.p_type)
    GROUP BY n_name
    HAVING COUNT(*) >= 5
"""

# q32 shape (reference tpcds/q32.sql): excess-discount amount — sum
# over rows whose discount exceeds 1.3 * the part's average discount
# (correlated scalar AVG), brand + date-window filters.
_Q32 = """
    SELECT CAST(SUM(CAST(l.l_extendedprice * l.l_discount
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS excess_discount_amount
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l.l_discount > 1.3 * (
        SELECT CAST(SUM(CAST(l2.l_discount AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def _chain(select_items: str, group_keys: str, windows: str) -> str:
    """The q17/q25/q29 join graph (reference tpcds/q17.sql, q25.sql,
    q29.sql share it): sale -> its 1:1 return row -> another sale of
    the same (part, supplier), three date dimensions, item + store
    dims. Callers vary the aggregates and the date windows exactly as
    the three TPC-DS originals do."""
    return f"""
    WITH sr AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
             floor((l_quantity + 1) / 2) AS r_quantity,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
               AS r_amount,
             l_shipdate AS r_shipdate
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT {select_items}
    FROM lineitem ss JOIN orders o1 ON ss.l_orderkey = o1.o_orderkey
         JOIN part p ON p.p_partkey = ss.l_partkey
         JOIN supplier s ON s.s_suppkey = ss.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         JOIN sr ON sr.r_orderkey = ss.l_orderkey
                AND sr.r_linenumber = ss.l_linenumber
         JOIN lineitem cs ON cs.l_partkey = ss.l_partkey
                AND cs.l_suppkey = ss.l_suppkey
                AND cs.l_orderkey <> ss.l_orderkey
         JOIN orders o3 ON o3.o_orderkey = cs.l_orderkey
    WHERE {windows}
    GROUP BY {group_keys}
"""


def _cov_stats(s: str, q: str, label: str) -> str:
    """count/avg/stddev_samp/CoV from exact decimal sums (the q39
    pattern): one IEEE division per output, NULL stddev for n = 1
    groups exactly like stddev_samp."""
    ave = f"CAST({s} AS DOUBLE) / COUNT(*)"
    var = (
        f"greatest((CAST({q} AS DOUBLE)"
        f" - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE) / COUNT(*))"
        f" / (COUNT(*) - 1), 0.0e0)"
    )
    return (
        f"round({ave}, 6) AS {label}_ave,\n"
        f"           CASE WHEN COUNT(*) > 1 THEN round(sqrt({var}), 6) END"
        f" AS {label}_stdev,\n"
        f"           CASE WHEN COUNT(*) > 1 THEN round(sqrt({var}) / ({ave}), 6) END"
        f" AS {label}_cov"
    )


# q17 shape (reference tpcds/q17.sql): the chain with count/avg/
# stddev_samp/coefficient-of-variation of the quantity in each of the
# three channels. Quarter windows widened to year-grain so the chain
# is non-degenerate at sf0.01 (the fixture's repeat-purchase rate is
# far below retail TPC-DS).
_Q17 = _chain(
    """p_type AS item_type, n_name AS store_nation,
           CAST(COUNT(*) AS BIGINT) AS store_sales_quantitycount,
           """
    + _cov_stats("SUM(CAST(ss.l_quantity AS DECIMAL(30,6)))",
                 "SUM(CAST(ss.l_quantity * ss.l_quantity AS DECIMAL(30,6)))",
                 "store_sales_quantity")
    + ",\n           "
    + _cov_stats("SUM(CAST(sr.r_quantity AS DECIMAL(30,6)))",
                 "SUM(CAST(sr.r_quantity * sr.r_quantity AS DECIMAL(30,6)))",
                 "store_returns_quantity")
    + ",\n           "
    + _cov_stats("SUM(CAST(cs.l_quantity AS DECIMAL(30,6)))",
                 "SUM(CAST(cs.l_quantity * cs.l_quantity AS DECIMAL(30,6)))",
                 "catalog_sales_quantity"),
    "p_type, n_name",
    """year(o1.o_orderdate) = 1995
      AND year(sr.r_shipdate) = 1995
      AND year(o3.o_orderdate) IN (1995, 1996)""",
)

# q25 shape (reference tpcds/q25.sql): the chain summing net profit /
# return loss / catalog profit (q9 supply-cost model 0.5 *
# p_retailprice), April-October windows.
_Q25 = _chain(
    """p_brand AS item_brand, s_name AS store_name,
           CAST(SUM(CAST(ss.l_extendedprice * (1 - ss.l_discount)
                         - 0.5 * p_retailprice * ss.l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE) AS store_sales_profit,
           CAST(SUM(sr.r_amount) AS DOUBLE) AS store_returns_loss,
           CAST(SUM(CAST(cs.l_extendedprice * (1 - cs.l_discount)
                         - 0.5 * p_retailprice * cs.l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE) AS catalog_sales_profit""",
    "p_brand, s_name",
    """year(o1.o_orderdate) = 1997
      AND month(o1.o_orderdate) BETWEEN 4 AND 10
      AND year(sr.r_shipdate) = 1997 AND month(sr.r_shipdate) >= 4
      AND year(o3.o_orderdate) IN (1997, 1998)""",
)

# q29 shape (reference tpcds/q29.sql): the chain summing quantities
# (sold / partial-returned / repurchased), month window on the sale,
# three-year window on the repurchase.
_Q29 = _chain(
    """p_brand AS item_brand, s_name AS store_name,
           CAST(SUM(CAST(ss.l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS store_sales_quantity,
           CAST(SUM(CAST(sr.r_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS store_returns_quantity,
           CAST(SUM(CAST(cs.l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS catalog_sales_quantity""",
    "p_brand, s_name",
    """year(o1.o_orderdate) = 1996
      AND month(o1.o_orderdate) BETWEEN 7 AND 12
      AND year(sr.r_shipdate) IN (1996, 1997)
      AND year(o3.o_orderdate) IN (1996, 1997, 1998)""",
)


def _lag_buckets(lag: str) -> str:
    """q62/q99's five shipping-lag CASE buckets over ``lag`` days."""
    return f"""
           CAST(SUM(CASE WHEN {lag} <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d_30_days,
           CAST(SUM(CASE WHEN {lag} > 30 AND {lag} <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d_31_60_days,
           CAST(SUM(CASE WHEN {lag} > 60 AND {lag} <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d_61_90_days,
           CAST(SUM(CASE WHEN {lag} > 90 AND {lag} <= 120 THEN 1 ELSE 0 END)
                AS BIGINT) AS d_91_120_days,
           CAST(SUM(CASE WHEN {lag} > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d_over_120_days"""


_LAG = "date_diff('day', o_orderdate, l_shipdate)"

# q62 shape (reference tpcds/q62.sql): web-sales shipping-lag report —
# substr()-keyed warehouse dim + ship mode + site, five CASE buckets
# of day lag. Mapping: warehouse -> supplier nation, ship_mode ->
# order priority, web site -> line status; lag = order-to-ship days.
_Q62 = f"""
    SELECT substr(n_name, 1, 20) AS warehouse_nation,
           o_orderpriority AS ship_mode, l_linestatus AS web_name,
           {_lag_buckets(_LAG)}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
    WHERE year(l_shipdate) = 1996
    GROUP BY substr(n_name, 1, 20), o_orderpriority, l_linestatus
"""

# q99 shape (reference tpcds/q99.sql): the catalog-channel sibling —
# same five-bucket skeleton, different dims (call center -> order
# status, supplier name for the warehouse) and an order-year window.
_Q99 = f"""
    SELECT substr(s_name, 1, 20) AS warehouse_name,
           o_orderstatus AS call_center, o_orderpriority AS ship_mode,
           {_lag_buckets(_LAG)}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE year(o_orderdate) = 1997
    GROUP BY substr(s_name, 1, 20), o_orderstatus, o_orderpriority
"""

# q64 shape (reference tpcds/q64.sql): HAVING-filtered returns CTE
# (sale > 2x refund), wide multi-join cross_sales CTE grouped on
# product/store/buyer-geography/year, self-joined across consecutive
# years with a cnt comparison. Mapping: item list price arithmetic ->
# quantity/extendedprice/discount sums; store -> supplier.
_Q64 = """
    WITH cs_ui AS (
      SELECT l_partkey AS ui_partkey
      FROM lineitem
      GROUP BY l_partkey
      HAVING SUM(CAST(CASE WHEN l_returnflag = 'R'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END AS DECIMAL(30,6))) > 0
         AND CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,6))) AS DOUBLE) >
             2 * CAST(SUM(CAST(CASE WHEN l_returnflag = 'R'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)),
    cross_sales AS (
      SELECT p_name AS product_name, p_partkey AS item_sk,
             s_name AS store_name, cn.n_name AS buyer_nation,
             CAST(year(o_orderdate) AS INTEGER) AS syear,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS s1,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS s2,
             SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS s3
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer c ON c.c_custkey = o_custkey
           JOIN nation cn ON cn.n_nationkey = c.c_nationkey
           JOIN supplier s ON s.s_suppkey = l_suppkey
           JOIN part p ON p.p_partkey = l_partkey
           JOIN cs_ui ON ui_partkey = l_partkey
      GROUP BY p_name, p_partkey, s_name, cn.n_name, year(o_orderdate))
    SELECT cs1.product_name, cs1.store_name,
           cs1.buyer_nation, cs2.buyer_nation AS repeat_buyer_nation,
           cs1.cnt AS cnt1, cs2.cnt AS cnt2,
           CAST(cs1.s1 AS DOUBLE) AS s11, CAST(cs1.s2 AS DOUBLE) AS s21,
           CAST(cs1.s3 AS DOUBLE) AS s31,
           CAST(cs2.s1 AS DOUBLE) AS s12, CAST(cs2.s2 AS DOUBLE) AS s22,
           CAST(cs2.s3 AS DOUBLE) AS s32
    FROM cross_sales cs1 JOIN cross_sales cs2
         ON cs1.item_sk = cs2.item_sk AND cs1.store_name = cs2.store_name
    WHERE cs1.syear = 1996 AND cs2.syear = 1997 AND cs2.cnt <= cs1.cnt
"""

# q78 shape (reference tpcds/q78.sql): three per-channel CTE instances
# (channel = l_linenumber % 3) each excluding returned rows via the
# LEFT JOIN ... IS NULL anti pattern, LEFT JOINed across channels on
# (year, item) with COALESCE ratio output (the customer key of the
# original is dropped: the fixture's repeat-purchase rate makes a
# per-customer 3-channel match empty at sf0.01). The reference
# text's famous "cs_item_sk = cs_item_sk" tautology bug is NOT
# reproduced — the join matches on the item key properly.
_Q78 = """
    WITH rets AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber
      FROM lineitem WHERE l_returnflag = 'R'),
    ch AS (
      SELECT l_linenumber % 3 AS chan,
             CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS qty,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
               AS wc,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS sp
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           LEFT JOIN rets r ON r.r_orderkey = l.l_orderkey
                AND r.r_linenumber = l.l_linenumber
      WHERE r.r_orderkey IS NULL
      GROUP BY l_linenumber % 3, year(o_orderdate), l_partkey)
    SELECT ss.yr, ss.l_partkey AS item,
           round(CAST(ss.qty AS DOUBLE)
                 / CAST(COALESCE(ws.qty + cs.qty, 1) AS DOUBLE), 6) AS ratio,
           CAST(ss.qty AS DOUBLE) AS store_qty,
           CAST(ss.wc AS DOUBLE) AS store_wholesale_cost,
           CAST(ss.sp AS DOUBLE) AS store_sales_price,
           CAST(COALESCE(ws.qty, 0) + COALESCE(cs.qty, 0) AS DOUBLE)
             AS other_chan_qty,
           CAST(COALESCE(ws.wc, 0) + COALESCE(cs.wc, 0) AS DOUBLE)
             AS other_chan_wholesale_cost,
           CAST(COALESCE(ws.sp, 0) + COALESCE(cs.sp, 0) AS DOUBLE)
             AS other_chan_sales_price
    FROM ch ss LEFT JOIN ch ws ON ws.chan = 1 AND ws.yr = ss.yr
             AND ws.l_partkey = ss.l_partkey
         LEFT JOIN ch cs ON cs.chan = 2 AND cs.yr = ss.yr
             AND cs.l_partkey = ss.l_partkey
    WHERE ss.chan = 0 AND COALESCE(ws.qty, 0) > 0 AND COALESCE(cs.qty, 0) > 0
      AND ss.yr = 1996
"""

for _name, _text, _doc in [
    ("tpcds_sql_q1", _Q1,
     "TPC-DS q1 shape via Engine.sql: returns-total CTE referenced "
     "twice, correlated AVG*1.2 threshold, store filter (reference "
     "tpcds/q01.sql; store -> supplier nation)."),
    ("tpcds_sql_q30", _Q30,
     "TPC-DS q30 shape via Engine.sql: the q1 family keyed by customer "
     "geography with wide customer output (reference tpcds/q30.sql)."),
    ("tpcds_sql_q81", _Q81,
     "TPC-DS q81 shape via Engine.sql: the q1 family with tax-inclusive "
     "return amounts (reference tpcds/q81.sql)."),
    ("tpcds_sql_q6", _Q6,
     "TPC-DS q6 shape via Engine.sql: scalar DISTINCT subquery "
     "(EnforceSingleRow) + correlated category-average threshold + "
     "HAVING count (reference tpcds/q06.sql; 1.2 -> 1.05 for the "
     "fixture's uniform price range)."),
    ("tpcds_sql_q32", _Q32,
     "TPC-DS q32 shape via Engine.sql: excess-discount sum over a "
     "correlated per-part average-discount threshold (reference "
     "tpcds/q32.sql)."),
    ("tpcds_sql_q17", _Q17,
     "TPC-DS q17 shape via Engine.sql: sales->returns->repurchase "
     "chain with count/avg/stddev/CoV per channel from exact decimal "
     "sums (reference tpcds/q17.sql)."),
    ("tpcds_sql_q25", _Q25,
     "TPC-DS q25 shape via Engine.sql: the q17 chain summing profit / "
     "loss / catalog profit (reference tpcds/q25.sql)."),
    ("tpcds_sql_q29", _Q29,
     "TPC-DS q29 shape via Engine.sql: the q17 chain summing sold / "
     "returned / repurchased quantities (reference tpcds/q29.sql)."),
    ("tpcds_sql_q62", _Q62,
     "TPC-DS q62 shape via Engine.sql: five CASE day-lag buckets over "
     "substr-keyed dims (reference tpcds/q62.sql)."),
    ("tpcds_sql_q99", _Q99,
     "TPC-DS q99 shape via Engine.sql: the q62 skeleton on the catalog "
     "channel dims and order-year window (reference tpcds/q99.sql)."),
    ("tpcds_sql_q64", _Q64,
     "TPC-DS q64 shape via Engine.sql: HAVING-filtered returns CTE, "
     "wide multi-join cross_sales, consecutive-year self-join with cnt "
     "comparison (reference tpcds/q64.sql)."),
    ("tpcds_sql_q78", _Q78,
     "TPC-DS q78 shape via Engine.sql: three channel CTE instances "
     "with LEFT JOIN ... IS NULL return exclusion, cross-channel LEFT "
     "JOINs, COALESCE ratio (reference tpcds/q78.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# ---------------------------------------------------------------------------
# Tranche 5 (r8): week-over-year ratio pivot (q2), scalar-subquery CASE
# buckets (q9/q28), day-name pivots (q43), OR-of-ANDs across dimension
# joins (q48), sales->returns lag buckets (q50), quarterly deviation
# windows (q53/q57), three-channel equal-share (q58), month pivot with
# carrier UNION (q66), IS-NULL channel report (q76), and the
# FULL OUTER channel-overlap count (q97).
#
# Day-of-week arithmetic: the fixture ships no date_dim, so day index =
# date_diff('day', TIMESTAMP '1994-12-26', d) % 7 (that anchor is a
# Monday; every fixture date is later, so % is the positive remainder
# in both engines) — 0=Mon .. 6=Sun. Week sequence = floor(days/7) from
# the same anchor. Engine-native dayofweek()/weekofyear() are avoided
# deliberately: Spark and DuckDB disagree on both.

_ANCHOR = "TIMESTAMP '1994-12-26 00:00:00'"
_DAYS = [
    ("mon", 0), ("tue", 1), ("wed", 2), ("thu", 3),
    ("fri", 4), ("sat", 5), ("sun", 6),
]


def _dow(col: str) -> str:
    return f"date_diff('day', {_ANCHOR}, {col}) % 7"


def _day_pivot(col: str, price: str, as_double: bool = False) -> str:
    tmpl = (
        "CAST(SUM(CASE WHEN {dow} = {i} THEN {price} END) AS DOUBLE)"
        " AS {d}_sales"
        if as_double
        else "SUM(CASE WHEN {dow} = {i} THEN {price} END) AS {d}_sales"
    )
    return ",\n             ".join(
        tmpl.format(dow=_dow(col), i=i, price=price, d=d) for d, i in _DAYS
    )


# q2 shape (reference tpcds/q02.sql): two-channel UNION ALL, per-week
# day-name pivot CTE referenced twice, cross-year self-join on the
# week sequence (z = y + 52 weeks), per-day ratio output.
_Q2_RATIOS = ",\n           ".join(
    f"round(CAST(y.{d}_sales AS DOUBLE)"
    f" / CAST(z.{d}_sales AS DOUBLE), 6) AS {d}_ratio"
    for d, _ in _DAYS
)
_Q2 = f"""
    WITH wscs AS (
      SELECT o_orderdate AS sold_date,
             CAST(o_totalprice AS DECIMAL(30,6)) AS sales_price
      FROM orders
      UNION ALL
      SELECT l_shipdate AS sold_date,
             CAST(l_extendedprice AS DECIMAL(30,6)) AS sales_price
      FROM lineitem),
    wswscs AS (
      SELECT CAST(floor(date_diff('day', {_ANCHOR}, sold_date) / 7.0)
                  AS INTEGER) AS week_seq,
             max(year(sold_date)) AS wk_year,
             {_day_pivot("sold_date", "sales_price")}
      FROM wscs
      GROUP BY 1)
    SELECT y.week_seq AS d_week_seq1,
           {_Q2_RATIOS}
    FROM wswscs y JOIN wswscs z ON z.week_seq = y.week_seq + 52
    WHERE y.wk_year = 1996 AND z.wk_year = 1997
"""

# q9 shape (reference tpcds/q09.sql): five CASE buckets, each choosing
# between two scalar-average subqueries by a scalar-count threshold —
# 15 scalar subqueries projected from a one-row dimension scan.
# Thresholds sit near the sf0.01 band counts so both branches fire.
_Q9_BANDS = [(1, 10, 12150), (11, 20, 11900), (21, 30, 12300),
             (31, 40, 12000), (41, 50, 11800)]
_Q9 = (
    "\n    SELECT "
    + ",\n           ".join(
        f"""CASE WHEN (SELECT COUNT(*) FROM lineitem
                  WHERE l_quantity BETWEEN {a} AND {b}) > {n}
           THEN (SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                                      AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
                 FROM lineitem WHERE l_quantity BETWEEN {a} AND {b})
           ELSE (SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
                 FROM lineitem WHERE l_quantity BETWEEN {a} AND {b})
           END AS bucket{i + 1}"""
        for i, (a, b, n) in enumerate(_Q9_BANDS)
    )
    + "\n    FROM region WHERE r_regionkey = 0\n"
)

# q28 shape (reference tpcds/q28.sql): six bucket subqueries (avg /
# count / count DISTINCT of the list price under OR-band filters)
# cross-joined into one row.
_Q28_BANDS = [
    (0, 5, 1000, 0.00, 0.00), (6, 10, 10000, 0.02, 0.02),
    (11, 15, 20000, 0.04, 0.04), (16, 20, 30000, 0.06, 0.01),
    (21, 25, 40000, 0.08, 0.03), (26, 30, 50000, 0.10, 0.05),
]
_Q28 = (
    "\n    SELECT * FROM "
    + ",\n    ".join(
        f"""(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                     AS DOUBLE) / COUNT(l_extendedprice) AS b{i + 1}_lp,
            CAST(COUNT(l_extendedprice) AS BIGINT) AS b{i + 1}_cnt,
            CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS b{i + 1}_cntd
     FROM lineitem
     WHERE l_quantity BETWEEN {a} AND {b}
       AND ((l_extendedprice BETWEEN {p} AND {p} + 10000)
         OR (l_discount BETWEEN {d} AND {d} + 0.03)
         OR (l_tax BETWEEN {t} AND {t} + 0.02))) AS b{i + 1}"""
        for i, (a, b, p, d, t) in enumerate(_Q28_BANDS)
    )
    + "\n"
)

# q43 shape (reference tpcds/q43.sql): per-store day-name pivot under a
# store-attribute filter (gmt_offset -> low nation keys).
_Q43 = f"""
    SELECT s_name,
             {_day_pivot("o_orderdate",
                         "CAST(l_extendedprice AS DECIMAL(30,6))",
                         as_double=True)}
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE year(o_orderdate) = 1997 AND s_nationkey < 13
    GROUP BY s_name
"""

# q48 shape (reference tpcds/q48.sql): one SUM under two independent
# OR-of-ANDs blocks that each mix a dimension attribute with a fact
# measure band — the disjunction straddles the join, so the planner
# must join first and filter after.
_Q48 = """
    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS total_qty
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
    WHERE year(o_orderdate) = 1996
      AND ((c_mktsegment = 'BUILDING'
            AND l_extendedprice BETWEEN 10000 AND 30000)
        OR (c_mktsegment = 'AUTOMOBILE'
            AND l_extendedprice BETWEEN 20000 AND 40000)
        OR (c_mktsegment = 'MACHINERY'
            AND l_extendedprice BETWEEN 30000 AND 50000))
      AND ((n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
            AND l_discount BETWEEN 0.00 AND 0.04)
        OR (n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
            AND l_discount BETWEEN 0.02 AND 0.06)
        OR (n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
            AND l_discount BETWEEN 0.04 AND 0.10))
"""

# q50 shape (reference tpcds/q50.sql): sold->returned day-lag buckets
# per store, the return month pinned. Returns are the 1:1 'R' rows
# (tranche-4 model); lag = order date -> the return row's ship date.
_Q50_LAG = "date_diff('day', o_orderdate, sr.r_date)"
_Q50 = f"""
    WITH sr AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
             l_shipdate AS r_date
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT s_name, n_name,
           {_lag_buckets(_Q50_LAG)}
    FROM lineitem ss JOIN orders ON o_orderkey = ss.l_orderkey
         JOIN sr ON sr.r_orderkey = ss.l_orderkey
                AND sr.r_linenumber = ss.l_linenumber
         JOIN supplier ON s_suppkey = ss.l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
    WHERE year(sr.r_date) = 1998 AND month(sr.r_date) IN (7, 8)
    GROUP BY s_name, n_name
"""


# q53 shape (reference tpcds/q53.sql): grouped quarterly sums + windowed
# average over the group partition + CASE relative-deviation filter,
# under an OR-of-triples item filter.
_Q53 = """
    SELECT * FROM (
      SELECT p_brand, qoy,
             CAST(sdec AS DOUBLE) AS sum_sales,
             CAST(SUM(sdec) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand)
               AS avg_quarterly_sales
      FROM (
        SELECT p_brand, CAST(quarter(o_orderdate) AS INTEGER) AS qoy,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))) AS sdec
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE year(o_orderdate) = 1996
          AND ((p_type IN ('ECONOMY', 'STANDARD') AND p_size < 25)
            OR (p_type IN ('SMALL', 'MEDIUM') AND p_size >= 25))
        GROUP BY p_brand, quarter(o_orderdate)) AS q
    ) AS tmp1
    WHERE (CASE WHEN avg_quarterly_sales > 0
                THEN abs(sum_sales - avg_quarterly_sales)
                     / avg_quarterly_sales END) > 0.1
"""

# q57 shape (reference tpcds/q57.sql): the q47 family on the catalog
# channel — monthly sums per (item attr, call center), windowed mean,
# rank-sequence lag/lead self-joins, an edge-padded year window
# (year +- one month) and the deviation filter.
_Q57 = """
    WITH v1 AS (
      SELECT p_type, s_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS moy,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sum_dec
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE year(o_orderdate) = 1996
         OR (year(o_orderdate) = 1995 AND month(o_orderdate) = 12)
         OR (year(o_orderdate) = 1997 AND month(o_orderdate) = 1)
      GROUP BY p_type, s_name, year(o_orderdate), month(o_orderdate)),
    v1x AS (
      SELECT p_type, s_name, yr, moy,
             CAST(sum_dec AS DOUBLE) AS sum_sales,
             CAST(SUM(sum_dec) OVER (PARTITION BY p_type, s_name)
                  AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_type, s_name)
               AS avg_monthly_sales,
             CAST(rank() OVER (PARTITION BY p_type, s_name
                               ORDER BY yr, moy) AS INTEGER) AS rn
      FROM v1),
    v2 AS (
      SELECT v.p_type, v.s_name, v.yr, v.moy, v.avg_monthly_sales,
             v.sum_sales, vlag.sum_sales AS psum, vlead.sum_sales AS nsum
      FROM v1x v, v1x vlag, v1x vlead
      WHERE v.p_type = vlag.p_type AND v.p_type = vlead.p_type
        AND v.s_name = vlag.s_name AND v.s_name = vlead.s_name
        AND v.rn = vlag.rn + 1 AND v.rn = vlead.rn - 1)
    SELECT p_type, s_name, yr, moy, avg_monthly_sales, sum_sales,
           psum, nsum
    FROM v2
    WHERE yr = 1996 AND avg_monthly_sales > 0
      AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
"""

# q58 shape (reference tpcds/q58.sql): per-item revenue in each of
# three channels over a quarter chosen by a nested scalar subquery,
# three-way join keeping items whose per-channel share sits within 30%
# of the three-channel mean.
_Q58 = """
    WITH ch AS (
      SELECT l_linenumber % 3 AS chan, l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS rev
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE year(o_orderdate) * 10 + quarter(o_orderdate) = (
          SELECT DISTINCT year(o_orderdate) * 10 + quarter(o_orderdate)
          FROM orders
          WHERE o_orderdate = TIMESTAMP '1996-03-04 00:00:00')
      GROUP BY l_linenumber % 3, l_partkey)
    SELECT ss.l_partkey AS item,
           CAST(ss.rev AS DOUBLE) AS ss_item_rev,
           CAST(cs.rev AS DOUBLE) AS cs_item_rev,
           CAST(ws.rev AS DOUBLE) AS ws_item_rev,
           round(CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3, 6)
             AS average
    FROM ch ss JOIN ch cs ON ss.l_partkey = cs.l_partkey AND cs.chan = 1
         JOIN ch ws ON ss.l_partkey = ws.l_partkey AND ws.chan = 2
    WHERE ss.chan = 0
      AND CAST(ss.rev AS DOUBLE)
            BETWEEN 0.7 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
                AND 1.3 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
      AND CAST(cs.rev AS DOUBLE)
            BETWEEN 0.7 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
                AND 1.3 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
      AND CAST(ws.rev AS DOUBLE)
            BETWEEN 0.7 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
                AND 1.3 * CAST(ss.rev + cs.rev + ws.rev AS DOUBLE) / 3
"""


# q66 shape (reference tpcds/q66.sql): warehouse-by-year report with a
# twelve-column month pivot, built from a two-"carrier" UNION ALL
# (carriers -> returnflag halves; warehouse -> supplier nation).
_Q66_MONTHS = ",\n           ".join(
    f"CAST(SUM(CASE WHEN moy = {m} THEN rev END) AS DOUBLE) AS m{m:02d}_sales"
    for m in range(1, 13)
)
_Q66 = f"""
    WITH carriers AS (
      SELECT n_name AS wh, CAST(year(l_shipdate) AS INTEGER) AS yr,
             month(l_shipdate) AS moy,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
               AS rev
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE l_returnflag = 'A' AND year(l_shipdate) = 1996
      UNION ALL
      SELECT n_name AS wh, CAST(year(l_shipdate) AS INTEGER) AS yr,
             month(l_shipdate) AS moy,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
               AS rev
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE l_returnflag IN ('N', 'R') AND year(l_shipdate) = 1996)
    SELECT wh, yr,
           {_Q66_MONTHS},
           CAST(SUM(rev) AS DOUBLE) AS total_sales
    FROM carriers
    GROUP BY wh, yr
"""

# q76 shape (reference tpcds/q76.sql): three-channel UNION ALL report
# of "sales with a missing attribute" — the fixture has no NULL
# foreign keys, so each channel derives its NULL through NULLIF
# (discount = 0 / tax = 0 / quantity = 1), keeping the IS NULL
# predicate and channel/col_name literals of the original.
_Q76 = """
    SELECT channel, col_name, yr, qoy, p_type,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           CAST(SUM(CAST(ext AS DECIMAL(30,6))) AS DOUBLE) AS sales_amt
    FROM (
      SELECT 'store' AS channel, 'l_discount' AS col_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(quarter(o_orderdate) AS INTEGER) AS qoy,
             p_type, l_extendedprice AS ext
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE NULLIF(l_discount, 0.0) IS NULL
      UNION ALL
      SELECT 'web' AS channel, 'l_tax' AS col_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(quarter(o_orderdate) AS INTEGER) AS qoy,
             p_type, l_extendedprice AS ext
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE NULLIF(l_tax, 0.0) IS NULL
      UNION ALL
      SELECT 'catalog' AS channel, 'l_quantity' AS col_name,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(quarter(o_orderdate) AS INTEGER) AS qoy,
             p_type, l_extendedprice AS ext
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
      WHERE NULLIF(l_quantity, 1.0) IS NULL
    ) AS foo
    GROUP BY channel, col_name, yr, qoy, p_type
"""

# q97 shape (reference tpcds/q97.sql): two grouped (customer, item)
# channel sets FULL OUTER joined, CASE overlap counters. Channels =
# even/odd line numbers within one year.
_Q97 = """
    WITH ssci AS (
      SELECT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_linenumber % 2 = 0 AND year(o_orderdate) = 1996
      GROUP BY o_custkey, l_partkey),
    csci AS (
      SELECT o_custkey AS customer_sk, l_partkey AS item_sk
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_linenumber % 2 = 1 AND year(o_orderdate) = 1996
      GROUP BY o_custkey, l_partkey)
    SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
           CAST(SUM(CASE WHEN ssci.customer_sk IS NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
           CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                          AND csci.customer_sk IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS store_and_catalog
    FROM ssci FULL JOIN csci
         ON ssci.customer_sk = csci.customer_sk
        AND ssci.item_sk = csci.item_sk
"""

for _name, _text, _doc in [
    ("tpcds_sql_q2", _Q2,
     "TPC-DS q2 shape via Engine.sql: two-channel UNION ALL, per-week "
     "day pivot CTE referenced twice, cross-year week-seq self-join "
     "with per-day ratios (reference tpcds/q02.sql; week/day indices "
     "from anchored date arithmetic — engine-native dayofweek/"
     "weekofyear disagree between Spark and DuckDB)."),
    ("tpcds_sql_q9", _Q9,
     "TPC-DS q9 shape via Engine.sql: five CASE buckets choosing "
     "between scalar-average subqueries by scalar-count thresholds — "
     "15 scalar subqueries off a one-row scan (reference "
     "tpcds/q09.sql)."),
    ("tpcds_sql_q28", _Q28,
     "TPC-DS q28 shape via Engine.sql: six bucket subqueries (avg / "
     "count / count DISTINCT under OR-band filters) cross-joined into "
     "one row (reference tpcds/q28.sql)."),
    ("tpcds_sql_q43", _Q43,
     "TPC-DS q43 shape via Engine.sql: per-store day-name pivot "
     "(reference tpcds/q43.sql; day index from anchored date "
     "arithmetic)."),
    ("tpcds_sql_q48", _Q48,
     "TPC-DS q48 shape via Engine.sql: one SUM under two OR-of-ANDs "
     "blocks mixing dimension attributes with fact measure bands "
     "(reference tpcds/q48.sql)."),
    ("tpcds_sql_q50", _Q50,
     "TPC-DS q50 shape via Engine.sql: sold->returned day-lag buckets "
     "per store with the return month pinned (reference "
     "tpcds/q50.sql; 1:1 return-row model)."),
    ("tpcds_sql_q53", _Q53,
     "TPC-DS q53 shape via Engine.sql: quarterly sums + windowed "
     "partition average + CASE deviation filter under an OR-of-triples "
     "item filter (reference tpcds/q53.sql)."),
    ("tpcds_sql_q57", _Q57,
     "TPC-DS q57 shape via Engine.sql: the q47 family on the catalog "
     "channel — edge-padded year window, rank-sequence lag/lead "
     "self-joins, deviation filter (reference tpcds/q57.sql)."),
    ("tpcds_sql_q58", _Q58,
     "TPC-DS q58 shape via Engine.sql: three-channel per-item revenue "
     "over a scalar-subquery-chosen quarter, equal-share band join "
     "(reference tpcds/q58.sql; 0.9/1.1 -> 0.7/1.3 for the fixture's "
     "channel variance)."),
    ("tpcds_sql_q66", _Q66,
     "TPC-DS q66 shape via Engine.sql: warehouse-by-year twelve-month "
     "pivot over a two-carrier UNION ALL (reference tpcds/q66.sql)."),
    ("tpcds_sql_q76", _Q76,
     "TPC-DS q76 shape via Engine.sql: three-channel IS NULL report "
     "via UNION ALL (reference tpcds/q76.sql; NULLs derived through "
     "NULLIF — the fixture ships no NULL foreign keys)."),
    ("tpcds_sql_q97", _Q97,
     "TPC-DS q97 shape via Engine.sql: FULL OUTER join of two grouped "
     "channel sets with CASE overlap counters (reference "
     "tpcds/q97.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# ---------------------------------------------------------------------------
# Tranche 6 (r8): revenue-share window family (q12/q20/q98), the
# EXISTS/NOT-EXISTS shipping report (q16), inventory rollup (q22),
# demographic averages (q26/q27), derived-inventory range join (q37),
# before/after returns netting (q40), dim-only correlated count (q41),
# simple dim reports (q42/q55), OR-with-IN-subquery (q45), promo-ratio
# cross join (q61), and the time-dim am/pm family (q90/q96) on the
# events table.


def _rev_share(category_filter: str, date_lo: str, channel: str) -> str:
    """q12/q20/q98 skeleton (reference tpcds/q12.sql, q20.sql,
    q98.sql share it): item revenue + its share of the class total
    via a windowed sum over the grouped sums, 30-day window. The
    three originals differ only by fact table; here the channel is a
    returnflag slice."""
    return f"""
    SELECT p_name, p_type, p_brand,
           CAST(sdec AS DOUBLE) AS itemrevenue,
           round(CAST(sdec * 100 AS DOUBLE)
                 / CAST(SUM(sdec) OVER (PARTITION BY p_type) AS DOUBLE), 6)
             AS revenueratio
    FROM (
      SELECT p_name, p_type, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS sdec
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE {channel}
        AND {category_filter}
        AND l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{date_lo} 00:00:00'
                          + INTERVAL '30' DAY
      GROUP BY p_name, p_type, p_brand) AS g
"""


_Q12 = _rev_share("p_type IN ('ECONOMY', 'STANDARD', 'LARGE')",
                  "1996-02-22", "l_returnflag = 'N'")
_Q20 = _rev_share("p_type IN ('SMALL', 'MEDIUM', 'PROMO')",
                  "1997-03-10", "l_returnflag = 'A'")
_Q98 = _rev_share("p_type IN ('ECONOMY', 'PROMO', 'SMALL')",
                  "1998-01-05", "l_returnflag IN ('A', 'N', 'R')")

# q16 shape (reference tpcds/q16.sql): orders shipped in a 60-day
# window with EXISTS (another line of the same order from a DIFFERENT
# supplier — multi-warehouse analog) and NOT EXISTS (any return on the
# order), COUNT(DISTINCT order) + decimal-exact cost sums.
_Q16 = """
    SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS total_shipping_cost,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS total_net_profit
    FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN part p ON p.p_partkey = l1.l_partkey
    WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-02-01 00:00:00'
                         + INTERVAL '60' DAY
      AND n_name = 'NATION_5'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      AND EXISTS (
        SELECT * FROM lineitem l2
        WHERE l1.l_orderkey = l2.l_orderkey
          AND l1.l_suppkey <> l2.l_suppkey)
      AND NOT EXISTS (
        SELECT * FROM lineitem l3
        WHERE l1.l_orderkey = l3.l_orderkey
          AND l3.l_returnflag = 'R')
"""

# q22 shape (reference tpcds/q22.sql): average quantity on hand under
# a four-level ROLLUP of the item hierarchy; inventory -> lineitem
# quantity over a year window.
_Q22 = """
    SELECT p_name, p_brand, p_type, p_size,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS qoh
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE year(l_shipdate) = 1996
    GROUP BY ROLLUP (p_name, p_brand, p_type, p_size)
"""

# q26 shape (reference tpcds/q26.sql): four demographic-filtered
# averages per item attribute under an OR promotion filter.
_Q26 = """
    SELECT p_type,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg1,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 6) AS agg2,
           round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg3,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg4
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN part ON p_partkey = l_partkey
    WHERE c_mktsegment = 'BUILDING'
      AND (o_orderpriority = '5-LOW' OR o_orderstatus = 'F')
      AND year(o_orderdate) = 1997
    GROUP BY p_type
"""

# q27 shape (reference tpcds/q27.sql): the q26 averages under
# ROLLUP(state, item).
_Q27 = """
    SELECT n_name, p_type,
           (GROUPING(n_name) + GROUPING(p_type)) AS lochierarchy,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg1,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 6) AS agg2,
           round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg3,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg4
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN part ON p_partkey = l_partkey
    WHERE c_mktsegment = 'AUTOMOBILE' AND year(o_orderdate) = 1996
    GROUP BY ROLLUP (n_name, p_type)
"""

# q37 shape (reference tpcds/q37.sql): items in a price band whose
# DERIVED inventory (summed quantity over a 180-day window — the
# fixture's per-part density needs the wider window) lands in a
# range, and that sold at all — the inventory is a HAVING-filtered
# subquery standing in for the missing inventory table.
_Q37 = """
    SELECT p_name, p_type,
           CAST(p_retailprice AS DOUBLE) AS current_price
    FROM part
         JOIN (
           SELECT l_partkey AS inv_partkey
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00'
                               + INTERVAL '180' DAY
           GROUP BY l_partkey
           HAVING SUM(l_quantity) BETWEEN 50 AND 200) AS inv
           ON inv_partkey = p_partkey
         JOIN lineitem ON l_partkey = p_partkey
    WHERE p_retailprice BETWEEN 940 AND 970
      AND p_size IN (10, 20, 30, 40)
    GROUP BY p_name, p_type, p_retailprice
"""

# q40 shape (reference tpcds/q40.sql): net sales before/after a pivot
# date with refunds netted through the LEFT-JOINed 1:1 returns view
# (partial-refund model: half the revenue).
_Q40 = """
    WITH cr AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
             CAST(0.5 * l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,6)) AS refunded
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT n_name AS w_state, p_brand,
           CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-03-11 00:00:00'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,6))
                              - COALESCE(refunded, 0)
                         ELSE 0 END) AS DOUBLE) AS sales_before,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-03-11 00:00:00'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,6))
                              - COALESCE(refunded, 0)
                         ELSE 0 END) AS DOUBLE) AS sales_after
    FROM lineitem LEFT JOIN cr ON r_orderkey = l_orderkey
                              AND r_linenumber = l_linenumber
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN part ON p_partkey = l_partkey
    WHERE p_retailprice BETWEEN 920 AND 950
      AND l_shipdate >= TIMESTAMP '1997-03-11 00:00:00'
                        - INTERVAL '30' DAY
      AND l_shipdate <  TIMESTAMP '1997-03-11 00:00:00'
                        + INTERVAL '30' DAY
    GROUP BY n_name, p_brand
"""

# q41 shape (reference tpcds/q41.sql): dim-only — product names whose
# brand carries at least one item matching an OR-of-ANDs attribute
# grid, via a correlated scalar COUNT subquery.
_Q41 = """
    SELECT DISTINCT p_name
    FROM part i1
    WHERE p_partkey BETWEEN 738 AND 778
      AND (SELECT COUNT(*) FROM part
           WHERE p_brand = i1.p_brand
             AND ((p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15)
               OR (p_type = 'STANDARD' AND p_size BETWEEN 16 AND 30)
               OR (p_type = 'PROMO' AND p_size BETWEEN 31 AND 50))) > 0
"""

# q42 / q55 shapes (reference tpcds/q42.sql, q55.sql): the simple
# dimension reports — revenue by (year, category) / by brand for one
# month.
_Q42 = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year, p_type,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS sum_sales
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
    WHERE year(o_orderdate) = 1998 AND month(o_orderdate) = 11
    GROUP BY year(o_orderdate), p_type
"""
_Q55 = """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS ext_price
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
    WHERE year(o_orderdate) = 1999 AND month(o_orderdate) = 11
    GROUP BY p_brand
"""

# q45 shape (reference tpcds/q45.sql): geography revenue where the
# filter is a disjunction of a literal geography list and an
# IN-subquery over the item dimension.
_Q45 = """
    SELECT n_name, c_mktsegment,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS total_sales
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
    WHERE (n_name IN ('NATION_2', 'NATION_7', 'NATION_12', 'NATION_17')
        OR l_partkey IN (
          SELECT p_partkey FROM part
          WHERE p_partkey IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
      AND year(o_orderdate) = 1997 AND quarter(o_orderdate) = 2
    GROUP BY n_name, c_mktsegment
"""

# q61 shape (reference tpcds/q61.sql): promotional vs total revenue —
# two single-row aggregate subqueries cross-joined, ratio output.
_Q61 = """
    SELECT CAST(promotions AS DOUBLE) AS promotions,
           CAST(total AS DOUBLE) AS total,
           round(CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE)
                 * 100, 6) AS promo_pct
    FROM (
      SELECT SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS promotions
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN part ON p_partkey = l_partkey
      WHERE n_nationkey < 13 AND p_type = 'PROMO'
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(o_orderdate) = 1998 AND month(o_orderdate) = 5
    ) AS promotional_sales,
    (
      SELECT SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS total
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN part ON p_partkey = l_partkey
      WHERE n_nationkey < 13 AND p_type = 'PROMO'
        AND year(o_orderdate) = 1998 AND month(o_orderdate) = 5
    ) AS all_sales
"""


# q90 / q96 shapes (reference tpcds/q90.sql, q96.sql): the time-dim
# family, mapped onto the events stream (the relational fixture has no
# time-of-day; events.ts does). Spark reads the catalog's ts_ns
# (int64 nanos — exact integer hour arithmetic in both engines);
# the DuckDB oracle derives the identical value via epoch_ns(ts), so
# these two carry their own oracle text instead of reusing the query
# text verbatim.
_Q90_SPARK = """
    SELECT round(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 6)
             AS am_pm_ratio
    FROM (
      SELECT COUNT(*) AS amc FROM events
      WHERE (ts_ns div 3600000000000) % 24 BETWEEN 8 AND 9
        AND event_type IN ('view', 'click')
        AND value BETWEEN 50 AND 250
    ) AS at_,
    (
      SELECT COUNT(*) AS pmc FROM events
      WHERE (ts_ns div 3600000000000) % 24 BETWEEN 19 AND 20
        AND event_type IN ('view', 'click')
        AND value BETWEEN 50 AND 250
    ) AS pt
"""
_Q90_ORACLE = """
    SELECT round(CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE), 6)
             AS am_pm_ratio
    FROM (
      SELECT COUNT(*) AS amc FROM events
      WHERE (epoch_ns(ts) // 3600000000000) % 24 BETWEEN 8 AND 9
        AND event_type IN ('view', 'click')
        AND value BETWEEN 50 AND 250
    ) AS at_,
    (
      SELECT COUNT(*) AS pmc FROM events
      WHERE (epoch_ns(ts) // 3600000000000) % 24 BETWEEN 19 AND 20
        AND event_type IN ('view', 'click')
        AND value BETWEEN 50 AND 250
    ) AS pt
"""
_Q96_SPARK = """
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    WHERE (ts_ns div 3600000000000) % 24 = 20
      AND (ts_ns div 60000000000) % 60 >= 30
      AND event_type = 'purchase'
      AND value BETWEEN 20 AND 300
"""
_Q96_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    WHERE (epoch_ns(ts) // 3600000000000) % 24 = 20
      AND (epoch_ns(ts) // 60000000000) % 60 >= 30
      AND event_type = 'purchase'
      AND value BETWEEN 20 AND 300
"""

for _name, _text, _oracle6, _doc in [
    ("tpcds_sql_q12", _Q12, None,
     "TPC-DS q12 shape via Engine.sql: item revenue + class share via "
     "a windowed sum over grouped sums, 30-day window, web channel -> "
     "returnflag slice (reference tpcds/q12.sql)."),
    ("tpcds_sql_q20", _Q20, None,
     "TPC-DS q20 shape via Engine.sql: the q12 skeleton on the "
     "catalog channel slice (reference tpcds/q20.sql)."),
    ("tpcds_sql_q98", _Q98, None,
     "TPC-DS q98 shape via Engine.sql: the q12 skeleton over all rows "
     "(store channel; reference tpcds/q98.sql)."),
    ("tpcds_sql_q16", _Q16, None,
     "TPC-DS q16 shape via Engine.sql: 60-day shipping report with "
     "EXISTS (another line from a different supplier) and NOT EXISTS "
     "(any return), COUNT DISTINCT + decimal sums (reference "
     "tpcds/q16.sql)."),
    ("tpcds_sql_q22", _Q22, None,
     "TPC-DS q22 shape via Engine.sql: average quantity under a "
     "four-level item ROLLUP (reference tpcds/q22.sql; inventory -> "
     "lineitem quantity)."),
    ("tpcds_sql_q26", _Q26, None,
     "TPC-DS q26 shape via Engine.sql: four demographic-filtered "
     "averages per item attribute under an OR promotion filter "
     "(reference tpcds/q26.sql)."),
    ("tpcds_sql_q27", _Q27, None,
     "TPC-DS q27 shape via Engine.sql: the q26 averages under "
     "ROLLUP(state, item) with GROUPING() (reference tpcds/q27.sql)."),
    ("tpcds_sql_q37", _Q37, None,
     "TPC-DS q37 shape via Engine.sql: price-band items whose derived "
     "inventory (HAVING-filtered 60-day quantity sum) lands in a "
     "range and that sold (reference tpcds/q37.sql)."),
    ("tpcds_sql_q40", _Q40, None,
     "TPC-DS q40 shape via Engine.sql: before/after-pivot net sales "
     "with refunds netted through the LEFT-JOINed 1:1 returns view "
     "(reference tpcds/q40.sql)."),
    ("tpcds_sql_q41", _Q41, None,
     "TPC-DS q41 shape via Engine.sql: dim-only correlated scalar "
     "COUNT over an OR-of-ANDs attribute grid (reference "
     "tpcds/q41.sql)."),
    ("tpcds_sql_q42", _Q42, None,
     "TPC-DS q42 shape via Engine.sql: revenue by (year, category) "
     "for one month (reference tpcds/q42.sql)."),
    ("tpcds_sql_q55", _Q55, None,
     "TPC-DS q55 shape via Engine.sql: revenue by brand for one month "
     "(reference tpcds/q55.sql)."),
    ("tpcds_sql_q45", _Q45, None,
     "TPC-DS q45 shape via Engine.sql: geography revenue under a "
     "disjunction of a literal list and an IN-subquery (reference "
     "tpcds/q45.sql)."),
    ("tpcds_sql_q61", _Q61, None,
     "TPC-DS q61 shape via Engine.sql: promotional vs total revenue — "
     "two single-row aggregate subqueries cross-joined (reference "
     "tpcds/q61.sql)."),
    ("tpcds_sql_q90", _Q90_SPARK, _Q90_ORACLE,
     "TPC-DS q90 shape via Engine.sql: am/pm count ratio over the "
     "events stream's hour-of-day (reference tpcds/q90.sql; time_dim "
     "-> exact integer nanosecond arithmetic, oracle via epoch_ns)."),
    ("tpcds_sql_q96", _Q96_SPARK, _Q96_ORACLE,
     "TPC-DS q96 shape via Engine.sql: half-hour band count over the "
     "events stream (reference tpcds/q96.sql)."),
]:
    register(
        _name,
        _oracle6 if _oracle6 is not None else _text,
        doc=_doc,
        tags=("tpcds", "sql_text", "dialect"),
    )(_make(_name, _text))


# ---------------------------------------------------------------------------
# Tranche 7 (r8): the final 28 — completes all 99 TPC-DS shapes.
# Batch A: simple dim reports (q3/q52), demographic averages (q7/q13/
# q18), zip INTERSECT (q8), EXISTS-in-OR demographics (q10/q35),
# geography disjunction (q15), shop-away-from-home (q19), inventory
# before/after ratio (q21), CTE-with-scalar-threshold-over-itself
# (q24), cross-channel cohort revenue segmentation (q54), and the q53
# manager twin (q63).

_Q3 = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year, p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS sum_agg
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
    WHERE p_size = 28 AND month(o_orderdate) = 11
    GROUP BY year(o_orderdate), p_brand
"""

_Q52 = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS d_year, p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS ext_price
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
    WHERE year(o_orderdate) = 1998 AND month(o_orderdate) = 11
    GROUP BY year(o_orderdate), p_brand
"""

# q7 shape (reference tpcds/q07.sql): the q26 skeleton on the store
# channel with its own demographic/promotion filters.
_Q7 = """
    SELECT p_brand,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg1,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 6) AS agg2,
           round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg3,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg4
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN part ON p_partkey = l_partkey
    WHERE c_mktsegment = 'HOUSEHOLD'
      AND (o_orderpriority = '3-MEDIUM' OR o_orderstatus = 'O')
      AND year(o_orderdate) = 1995
    GROUP BY p_brand
"""

# q8 shape (reference tpcds/q08.sql): store profit where the store's
# geography sits in the INTERSECT of a literal list and the geography
# of preferred customers counted above a threshold.
_Q8 = """
    SELECT s_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS net_profit
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE year(o_orderdate) = 1996 AND quarter(o_orderdate) = 2
      AND s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_0', 'NATION_3', 'NATION_5', 'NATION_7',
                         'NATION_9', 'NATION_11', 'NATION_14',
                         'NATION_17', 'NATION_20', 'NATION_23')
        INTERSECT
        SELECT c_nationkey FROM customer
        WHERE c_acctbal > 5000
        GROUP BY c_nationkey
        HAVING COUNT(*) > 20)
    GROUP BY s_name
"""

# q10 shape (reference tpcds/q10.sql): demographic counts over
# customers with EXISTS (channel A) AND (EXISTS channel B OR EXISTS
# channel C) — the EXISTS-in-disjunction planning workout. Channels =
# line-number residues.
_Q10 = """
    SELECT c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS INTEGER) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS cnt1,
           CAST(COUNT(*) AS BIGINT) AS cnt2,
           CAST(COUNT(*) AS BIGINT) AS cnt3
    FROM customer c JOIN nation ON n_nationkey = c_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_8', 'NATION_11',
                     'NATION_14')
      AND EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 0
          AND year(o_orderdate) = 1996
          AND month(o_orderdate) BETWEEN 1 AND 4)
      AND (EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 1
          AND year(o_orderdate) = 1996
          AND month(o_orderdate) BETWEEN 1 AND 4)
        OR EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 2
          AND year(o_orderdate) = 1996
          AND month(o_orderdate) BETWEEN 1 AND 4))
    GROUP BY c_mktsegment, floor(c_acctbal / 2000)
"""

# q13 shape (reference tpcds/q13.sql): single-row averages under two
# OR-of-ANDs blocks (the q48 skeleton with avg outputs).
_Q13 = """
    SELECT round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_ext_price,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS sum_revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
    WHERE year(o_orderdate) = 1997
      AND ((c_mktsegment = 'MACHINERY'
            AND o_orderpriority = '1-URGENT'
            AND l_extendedprice BETWEEN 10000 AND 30000)
        OR (c_mktsegment = 'FURNITURE'
            AND o_orderpriority = '2-HIGH'
            AND l_extendedprice BETWEEN 5000 AND 20000)
        OR (c_mktsegment = 'BUILDING'
            AND o_orderpriority = '3-MEDIUM'
            AND l_extendedprice BETWEEN 15000 AND 35000))
      AND ((n_name IN ('NATION_1', 'NATION_4', 'NATION_7')
            AND l_discount BETWEEN 0.00 AND 0.04)
        OR (n_name IN ('NATION_10', 'NATION_13', 'NATION_16')
            AND l_discount BETWEEN 0.03 AND 0.07)
        OR (n_name IN ('NATION_19', 'NATION_22', 'NATION_24')
            AND l_discount BETWEEN 0.06 AND 0.10))
"""

# q15 shape (reference tpcds/q15.sql): geography revenue where the
# disjunction spans a geography list, a segment list, and a fact
# measure threshold.
_Q15 = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS total_sales
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
    WHERE (n_name IN ('NATION_3', 'NATION_6', 'NATION_9', 'NATION_21')
        OR c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        OR l_extendedprice > 50000)
      AND year(o_orderdate) = 1997 AND quarter(o_orderdate) = 2
    GROUP BY n_name
"""

# q18 shape (reference tpcds/q18.sql): decimal-cast averages under
# ROLLUP(item, country, state) with a birth-month-style key filter.
_Q18 = """
    SELECT p_type, n_name, c_mktsegment,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg1,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
                      AS DOUBLE) / COUNT(*), 6) AS agg2,
           round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg3,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg4,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS agg5
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN part ON p_partkey = l_partkey
    WHERE c_custkey % 12 IN (1, 2, 6, 8, 9)
      AND year(o_orderdate) = 1996
      AND n_name IN ('NATION_1', 'NATION_8', 'NATION_15', 'NATION_22')
    GROUP BY ROLLUP (p_type, n_name, c_mktsegment)
"""

# q19 shape (reference tpcds/q19.sql): brand revenue for one month
# where the buyer's geography differs from the store's (the
# shop-away-from-home zip inequality).
_Q19 = """
    SELECT p_brand, p_type,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS ext_price
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN part ON p_partkey = l_partkey
    WHERE p_size = 8
      AND year(o_orderdate) = 1996 AND month(o_orderdate) = 11
      AND c_nationkey <> s_nationkey
    GROUP BY p_brand, p_type
"""

# q21 shape (reference tpcds/q21.sql): quantity before/after a pivot
# date per (warehouse, item), keeping rows whose after/before ratio
# sits between 2/3 and 3/2 (CASE-guarded NULL on zero).
_Q21 = """
    SELECT * FROM (
      SELECT n_name AS w_name, p_name,
             CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-03-11 00:00:00'
                           THEN l_quantity ELSE 0 END) AS BIGINT)
               AS inv_before,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-03-11 00:00:00'
                           THEN l_quantity ELSE 0 END) AS BIGINT)
               AS inv_after
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN part ON p_partkey = l_partkey
      WHERE p_retailprice BETWEEN 930 AND 960
        AND l_shipdate >= TIMESTAMP '1997-03-11 00:00:00'
                          - INTERVAL '30' DAY
        AND l_shipdate <  TIMESTAMP '1997-03-11 00:00:00'
                          + INTERVAL '30' DAY
      GROUP BY n_name, p_name) AS x
    WHERE (CASE WHEN inv_before > 0
                THEN CAST(inv_after AS DOUBLE) / inv_before END)
          BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
"""

# q24 shape (reference tpcds/q24.sql): a many-key grouped CTE over
# returns-matched sales with a buyer-nation = store-nation equality,
# re-aggregated under a HAVING threshold that is a scalar subquery
# over the SAME CTE.
_Q24 = """
    WITH ssales AS (
      SELECT c_name, s_name, p_type, p_brand, p_size,
             SUM(CAST(ss.l_extendedprice * (1 - ss.l_discount)
                      AS DECIMAL(30,6))) AS netpaid
      FROM lineitem ss
           JOIN lineitem sr ON sr.l_orderkey = ss.l_orderkey
                AND sr.l_linenumber = ss.l_linenumber
                AND sr.l_returnflag = 'R'
           JOIN orders ON o_orderkey = ss.l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = ss.l_suppkey
           JOIN part ON p_partkey = ss.l_partkey
      WHERE c_nationkey = s_nationkey
      GROUP BY c_name, s_name, p_type, p_brand, p_size)
    SELECT c_name, s_name, CAST(SUM(netpaid) AS DOUBLE) AS paid
    FROM ssales
    WHERE p_type = 'PROMO'
    GROUP BY c_name, s_name
    HAVING CAST(SUM(netpaid) AS DOUBLE) > (
      SELECT 0.05 * CAST(SUM(netpaid) AS DOUBLE) / COUNT(*)
      FROM ssales)
"""

# q35 shape (reference tpcds/q35.sql): the q10 EXISTS structure with
# aggregate outputs (count + avg/max/sum of the balance).
_Q35 = """
    SELECT c_mktsegment,
           CAST(floor(c_acctbal / 2500) AS INTEGER) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           round(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS bal_avg,
           CAST(max(c_acctbal) AS DOUBLE) AS bal_max,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
             AS bal_sum
    FROM customer c JOIN nation ON n_nationkey = c_nationkey
    WHERE EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 0
          AND year(o_orderdate) = 1997
          AND quarter(o_orderdate) < 4)
      AND (EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 1
          AND year(o_orderdate) = 1997
          AND quarter(o_orderdate) < 4)
        OR EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 2
          AND year(o_orderdate) = 1997
          AND quarter(o_orderdate) < 4))
    GROUP BY c_mktsegment, floor(c_acctbal / 2500)
"""

# q54 shape (reference tpcds/q54.sql): cohort of customers buying a
# category through two channels in one month, their home-nation store
# revenue over the FOLLOWING three months (month bounds via scalar
# DISTINCT subqueries), bucketed into revenue segments.
_Q54 = """
    WITH my_customers AS (
      SELECT DISTINCT o_custkey AS customer_sk, c_nationkey
      FROM (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_linenumber % 2 = 0
        UNION ALL
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_linenumber % 2 = 1) AS cs_or_ws
        JOIN orders ON o_orderkey = cs_or_ws.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN part ON p_partkey = cs_or_ws.l_partkey
      WHERE p_type = 'PROMO'
        AND year(o_orderdate) = 1996 AND month(o_orderdate) = 12),
    my_revenue AS (
      SELECT customer_sk,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,6))) AS revenue
      FROM my_customers
           JOIN orders ON o_custkey = customer_sk
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = c_nationkey
        AND year(o_orderdate) * 12 + month(o_orderdate) BETWEEN (
          SELECT DISTINCT year(o_orderdate) * 12 + month(o_orderdate) + 1
          FROM orders
          WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 12)
        AND (
          SELECT DISTINCT year(o_orderdate) * 12 + month(o_orderdate) + 3
          FROM orders
          WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 12)
      GROUP BY customer_sk),
    segments AS (
      SELECT CAST(floor(CAST(revenue AS DOUBLE) / 5000) AS INTEGER)
               AS segment
      FROM my_revenue)
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS num_customers,
           segment * 5000 AS segment_base
    FROM segments
    GROUP BY segment
"""

# q63 shape (reference tpcds/q63.sql): the q53 deviation skeleton
# keyed by size buckets over monthly windows.
_Q63 = """
    SELECT * FROM (
      SELECT CAST(floor(p_size / 10) AS INTEGER) AS size_band, moy,
             CAST(sdec AS DOUBLE) AS sum_sales,
             CAST(SUM(sdec) OVER (PARTITION BY floor(p_size / 10))
                  AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY floor(p_size / 10))
               AS avg_monthly_sales
      FROM (
        SELECT p_size, CAST(month(o_orderdate) AS INTEGER) AS moy,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))) AS sdec
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN part ON p_partkey = l_partkey
        WHERE year(o_orderdate) = 1997
          AND ((p_type IN ('ECONOMY', 'LARGE') AND p_brand LIKE 'Brand#1%')
            OR (p_type IN ('PROMO', 'SMALL') AND p_brand LIKE 'Brand#2%'))
        GROUP BY p_size, month(o_orderdate)) AS q
    ) AS tmp1
    WHERE (CASE WHEN avg_monthly_sales > 0
                THEN abs(sum_sales - avg_monthly_sales)
                     / avg_monthly_sales END) > 0.1
"""


for _name, _text, _doc in [
    ("tpcds_sql_q3", _Q3,
     "TPC-DS q3 shape via Engine.sql: brand revenue by year for one "
     "month under an item attribute filter (reference tpcds/q03.sql)."),
    ("tpcds_sql_q52", _Q52,
     "TPC-DS q52 shape via Engine.sql: (year, brand) revenue for one "
     "month (reference tpcds/q52.sql)."),
    ("tpcds_sql_q7", _Q7,
     "TPC-DS q7 shape via Engine.sql: the q26 average grid on the "
     "store channel (reference tpcds/q07.sql)."),
    ("tpcds_sql_q8", _Q8,
     "TPC-DS q8 shape via Engine.sql: store profit where the store "
     "geography lies in the INTERSECT of a literal list and "
     "preferred-customer geographies counted above a threshold "
     "(reference tpcds/q08.sql)."),
    ("tpcds_sql_q10", _Q10,
     "TPC-DS q10 shape via Engine.sql: demographic counts under "
     "EXISTS AND (EXISTS OR EXISTS) — disjunctive correlated "
     "subqueries (reference tpcds/q10.sql)."),
    ("tpcds_sql_q13", _Q13,
     "TPC-DS q13 shape via Engine.sql: single-row averages under two "
     "OR-of-ANDs blocks (reference tpcds/q13.sql)."),
    ("tpcds_sql_q15", _Q15,
     "TPC-DS q15 shape via Engine.sql: geography revenue under a "
     "three-way disjunction spanning dims and a fact measure "
     "(reference tpcds/q15.sql)."),
    ("tpcds_sql_q18", _Q18,
     "TPC-DS q18 shape via Engine.sql: five averages under "
     "ROLLUP(item, country, segment) with a residue key filter "
     "(reference tpcds/q18.sql)."),
    ("tpcds_sql_q19", _Q19,
     "TPC-DS q19 shape via Engine.sql: brand revenue where the buyer "
     "and store geographies differ (reference tpcds/q19.sql)."),
    ("tpcds_sql_q21", _Q21,
     "TPC-DS q21 shape via Engine.sql: before/after-pivot quantity "
     "ratio per (warehouse, item) with a CASE-guarded band filter "
     "(reference tpcds/q21.sql)."),
    ("tpcds_sql_q24", _Q24,
     "TPC-DS q24 shape via Engine.sql: many-key CTE over "
     "returns-matched sales re-aggregated under a HAVING threshold "
     "that is a scalar subquery over the same CTE (reference "
     "tpcds/q24.sql)."),
    ("tpcds_sql_q35", _Q35,
     "TPC-DS q35 shape via Engine.sql: the q10 EXISTS structure with "
     "count/avg/max/sum outputs (reference tpcds/q35.sql)."),
    ("tpcds_sql_q54", _Q54,
     "TPC-DS q54 shape via Engine.sql: two-channel cohort, "
     "home-nation revenue over scalar-subquery month bounds, revenue "
     "segmentation (reference tpcds/q54.sql)."),
    ("tpcds_sql_q63", _Q63,
     "TPC-DS q63 shape via Engine.sql: the q53 deviation skeleton "
     "keyed by size buckets over monthly windows (reference "
     "tpcds/q63.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )


# Tranche 7 batch B: NOT-EXISTS demographics (q69), three-channel
# time-bucket pivot (q71), inequality-date + IS-NULL-promo join (q72),
# the q34 twin (q73), ticket reports (q79), three-channel P&L rollup
# (q80), the q37 twin (q82), three-channel returns equal-share with
# nested week IN subqueries (q83), dim-chain customer lookup (q84),
# returns-reason averages (q85), the q36/q70 rank rollup on the web
# measure (q86), call-center returns (q91), the q32 twin with the
# windowed correlated average (q92), and the q16 twin (q94).

_Q69 = """
    SELECT c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS INTEGER) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS cnt1,
           CAST(COUNT(*) AS BIGINT) AS cnt2
    FROM customer c JOIN nation ON n_nationkey = c_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_6', 'NATION_16', 'NATION_21')
      AND EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 0
          AND year(o_orderdate) = 1997
          AND month(o_orderdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 1
          AND year(o_orderdate) = 1997
          AND month(o_orderdate) BETWEEN 4 AND 6)
      AND NOT EXISTS (
        SELECT * FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_custkey = c.c_custkey AND l_linenumber % 3 = 2
          AND year(o_orderdate) = 1997
          AND month(o_orderdate) BETWEEN 4 AND 6)
    GROUP BY c_mktsegment, floor(c_acctbal / 2000)
"""

# q71: three-channel UNION ALL joined to the item dim, grouped by a
# two-level time bucket with a meal-time disjunction. The fixture's
# orders carry no time-of-day, so t_hour/t_minute map to the ship
# month and day-of-month bucket, and the meal-time disjunction to two
# day-of-month ranges.
_Q71 = """
    SELECT p_brand,
           CAST(month(sold_date) AS INTEGER) AS t_hour,
           CAST(day(sold_date) AS INTEGER) AS t_minute,
           CAST(SUM(ext_price) AS DOUBLE) AS ext_price
    FROM part JOIN (
      SELECT CAST(l_extendedprice AS DECIMAL(30,6)) AS ext_price,
             l_shipdate AS sold_date, l_partkey AS sold_item
      FROM lineitem WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
      UNION ALL
      SELECT CAST(l_extendedprice AS DECIMAL(30,6)) AS ext_price,
             l_shipdate AS sold_date, l_partkey AS sold_item
      FROM lineitem WHERE l_returnflag = 'A' AND year(l_shipdate) = 1996
      UNION ALL
      SELECT CAST(l_extendedprice AS DECIMAL(30,6)) AS ext_price,
             l_shipdate AS sold_date, l_partkey AS sold_item
      FROM lineitem WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
    ) AS tmp ON sold_item = p_partkey
    WHERE p_size = 14
      AND (day(sold_date) BETWEEN 1 AND 10
        OR day(sold_date) BETWEEN 21 AND 31)
    GROUP BY p_brand, month(sold_date), day(sold_date)
"""

# q72: derived weekly inventory (summed shipped quantity per part per
# week) joined on the ORDER week with an under-stock inequality
# (on_hand < ordered quantity), a +5-day shipping-lag inequality, and
# IS NULL / IS NOT NULL promotion counts from a LEFT JOIN.
_Q72 = f"""
    WITH inv AS (
      SELECT l_partkey AS inv_partkey,
             CAST(floor(date_diff('day', {_ANCHOR}, l_shipdate) / 7.0)
                  AS INTEGER) AS inv_week,
             SUM(l_quantity) AS on_hand
      FROM lineitem
      GROUP BY l_partkey,
               floor(date_diff('day', {_ANCHOR}, l_shipdate) / 7.0))
    SELECT p_brand, n_name, inv_week,
           CAST(SUM(CASE WHEN promo_key IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS no_promo,
           CAST(SUM(CASE WHEN promo_key IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS promo,
           CAST(COUNT(*) AS BIGINT) AS total_cnt
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN part ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN inv ON inv_partkey = l_partkey
              AND inv_week = CAST(floor(date_diff('day', {_ANCHOR},
                                                  o_orderdate) / 7.0)
                                  AS INTEGER)
         LEFT JOIN (SELECT p_partkey AS promo_key FROM part
                    WHERE p_type = 'PROMO') AS promo
              ON promo_key = l_partkey
    WHERE on_hand < l_quantity
      AND l_shipdate > o_orderdate + INTERVAL '5' DAY
      AND year(o_orderdate) = 1996
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY p_brand, n_name, inv_week
"""

# q73: the q34 twin — 1-5 item-count band under a different
# disjunction plus a CASE-guarded ratio filter.
_Q73 = """
    WITH dj AS (
      SELECT o_orderkey AS ticket_number, o_custkey,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           JOIN customer ON c_custkey = o_custkey
      WHERE (o_orderpriority = '4-NOT SPECIFIED'
          OR o_orderpriority = '5-LOW')
        AND (CASE WHEN c_acctbal > 0
                  THEN CAST(o_totalprice AS DOUBLE) / c_acctbal
                  END) > 10
        AND year(o_orderdate) IN (1996, 1997, 1998)
      GROUP BY o_orderkey, o_custkey)
    SELECT c_name, c_mktsegment, ticket_number, cnt
    FROM dj JOIN customer ON c_custkey = o_custkey
    WHERE cnt BETWEEN 1 AND 5
"""

# q79: ticket-grouped coupon/profit amounts under a day-of-week pin
# and a store-attribute band, customer joined back.
_Q79 = f"""
    WITH ms AS (
      SELECT ss.l_orderkey AS ticket_number, o_custkey, s_name,
             SUM(CAST(ss.l_extendedprice * ss.l_discount
                      AS DECIMAL(30,6))) AS amt,
             SUM(CAST(ss.l_extendedprice * (1 - ss.l_discount)
                      - 0.5 * p_retailprice * ss.l_quantity
                      AS DECIMAL(30,6))) AS profit
      FROM lineitem ss JOIN orders ON o_orderkey = ss.l_orderkey
           JOIN supplier ON s_suppkey = ss.l_suppkey
           JOIN part p ON p.p_partkey = ss.l_partkey
      WHERE {_dow("o_orderdate")} = 0
        AND year(o_orderdate) IN (1996, 1997, 1998)
        AND s_acctbal BETWEEN 0 AND 5000
        AND (o_orderpriority = '2-HIGH' OR o_orderstatus = 'F')
      GROUP BY ss.l_orderkey, o_custkey, s_name)
    SELECT c_name, substr(s_name, 1, 30) AS store_name, ticket_number,
           CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
    FROM ms JOIN customer ON c_custkey = o_custkey
"""

# q80: three channel CTEs of sales / returns / profit (returns netted
# through the 1:1 'R' view) UNION ALLed under ROLLUP(channel, id)
# with a window + price + promotion filter.
_Q80_CH = """
      SELECT {id_col} AS id,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(30,6))) AS sales,
             SUM(COALESCE(r.ret_amt, 0)) AS returns_,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      - 0.5 * p_retailprice * l.l_quantity
                      AS DECIMAL(30,6))
                 - COALESCE(r.ret_amt, 0)) AS profit
      FROM lineitem l JOIN orders ON o_orderkey = l.l_orderkey
           JOIN supplier ON s_suppkey = l.l_suppkey
           JOIN part ON p_partkey = l.l_partkey
           LEFT JOIN rets r ON r.r_orderkey = l.l_orderkey
                AND r.r_linenumber = l.l_linenumber
      WHERE l.l_linenumber % 3 = {chan}
        AND o_orderdate >= TIMESTAMP '1997-08-23 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-08-23 00:00:00'
                           + INTERVAL '30' DAY
        AND p_retailprice > 950
        AND p_type <> 'PROMO'
      GROUP BY {id_col}
"""
_Q80 = (
    """
    WITH rets AS (
      SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
             CAST(0.5 * l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,6)) AS ret_amt
      FROM lineitem WHERE l_returnflag = 'R'),
    ssr AS ("""
    + _Q80_CH.format(id_col="s_name", chan=0)
    + """),
    csr AS ("""
    + _Q80_CH.format(id_col="p_brand", chan=1)
    + """),
    wsr AS ("""
    + _Q80_CH.format(id_col="o_orderpriority", chan=2)
    + """)
    SELECT channel, id,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns_) AS DOUBLE) AS returns_,
           CAST(SUM(profit) AS DOUBLE) AS profit
    FROM (
      SELECT 'store channel' AS channel, id, sales, returns_, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel' AS channel, id, sales, returns_, profit
      FROM csr
      UNION ALL
      SELECT 'web channel' AS channel, id, sales, returns_, profit
      FROM wsr
    ) AS x
    GROUP BY ROLLUP (channel, id)
"""
)

# q82: the q37 twin with its own bands and window.
_Q82 = """
    SELECT p_name, p_type,
           CAST(p_retailprice AS DOUBLE) AS current_price
    FROM part
         JOIN (
           SELECT l_partkey AS inv_partkey
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-05-25 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-05-25 00:00:00'
                               + INTERVAL '180' DAY
           GROUP BY l_partkey
           HAVING SUM(l_quantity) BETWEEN 40 AND 180) AS inv
           ON inv_partkey = p_partkey
         JOIN lineitem ON l_partkey = p_partkey
    WHERE p_retailprice BETWEEN 905 AND 935
      AND p_size IN (5, 15, 25, 35, 45)
    GROUP BY p_name, p_type, p_retailprice
"""

# q83: three per-channel returned-quantity CTEs over the months
# chosen by a nested IN subquery anchored at three literal dates
# (month grain: the fixture's per-week return density leaves a
# week-grain three-channel item join empty), joined on item with
# equal-share percentage outputs.
_Q83_CH = """
      SELECT l_partkey AS item_id,
             SUM(CAST(floor((l_quantity + 1) / 2) AS DECIMAL(30,6)))
               AS qty
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_linenumber % 3 = {chan}
        AND year(l_shipdate) * 100 + month(l_shipdate) IN (
          SELECT year(o_orderdate) * 100 + month(o_orderdate)
          FROM orders
          WHERE o_orderdate IN (TIMESTAMP '1996-06-28 00:00:00',
                                TIMESTAMP '1997-09-26 00:00:00',
                                TIMESTAMP '1998-11-17 00:00:00'))
      GROUP BY l_partkey
"""
_Q83 = (
    "\n    WITH sr_items AS ("
    + _Q83_CH.format(chan=0)
    + "),\n    cr_items AS ("
    + _Q83_CH.format(chan=1)
    + "),\n    wr_items AS ("
    + _Q83_CH.format(chan=2)
    + """)
    SELECT sr_items.item_id,
           CAST(sr_items.qty AS DOUBLE) AS sr_item_qty,
           round(CAST(sr_items.qty AS DOUBLE)
                 / CAST(sr_items.qty + cr_items.qty + wr_items.qty
                        AS DOUBLE) / 3 * 100, 6) AS sr_dev,
           CAST(cr_items.qty AS DOUBLE) AS cr_item_qty,
           round(CAST(cr_items.qty AS DOUBLE)
                 / CAST(sr_items.qty + cr_items.qty + wr_items.qty
                        AS DOUBLE) / 3 * 100, 6) AS cr_dev,
           CAST(wr_items.qty AS DOUBLE) AS wr_item_qty,
           round(CAST(wr_items.qty AS DOUBLE)
                 / CAST(sr_items.qty + cr_items.qty + wr_items.qty
                        AS DOUBLE) / 3 * 100, 6) AS wr_dev,
           round(CAST(sr_items.qty + cr_items.qty + wr_items.qty
                      AS DOUBLE) / 3, 6) AS average
    FROM sr_items JOIN cr_items ON sr_items.item_id = cr_items.item_id
         JOIN wr_items ON sr_items.item_id = wr_items.item_id
"""
)

# q84: dim-chain customer lookup — geography + balance band + "has a
# return" via the returns view, concatenated display name.
_Q84 = """
    SELECT c_custkey AS customer_id,
           concat(c_name, ', ', n_name) AS customername
    FROM customer JOIN nation ON n_nationkey = c_nationkey
         JOIN region ON r_regionkey = n_regionkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
    WHERE n_name = 'NATION_13'
      AND c_acctbal BETWEEN 3000 AND 8000
      AND r_regionkey >= 0
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
"""

# q85: returns-reason averages under two OR-of-ANDs blocks; reason ->
# the returned order's priority.
_Q85 = """
    SELECT substr(o_orderpriority, 1, 20) AS reason_desc,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quantity,
           round(CAST(SUM(CAST(0.5 * l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_refunded,
           round(CAST(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_fee
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996
      AND ((c_mktsegment = 'MACHINERY'
            AND l_extendedprice BETWEEN 10000 AND 30000)
        OR (c_mktsegment = 'AUTOMOBILE'
            AND l_extendedprice BETWEEN 20000 AND 45000)
        OR (c_mktsegment = 'HOUSEHOLD'
            AND l_extendedprice BETWEEN 30000 AND 60000))
      AND ((n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
            AND l_discount BETWEEN 0.00 AND 0.05)
        OR (n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
            AND l_discount BETWEEN 0.03 AND 0.08)
        OR (n_name IN ('NATION_4', 'NATION_9', 'NATION_14')
            AND l_discount BETWEEN 0.05 AND 0.10))
    GROUP BY o_orderpriority
"""

# q86: the q36/q70 rank-within-parent rollup on the tax-inclusive
# (web net-paid) measure.
_Q86 = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 + l_tax)
                         AS DECIMAL(30,6))) AS DOUBLE) AS total_sum,
           p_type, p_brand,
           (GROUPING(p_type) + GROUPING(p_brand)) AS lochierarchy,
           CAST(rank() OVER (
             PARTITION BY GROUPING(p_type) + GROUPING(p_brand),
                          CASE WHEN GROUPING(p_brand) = 0 THEN p_type END
             ORDER BY SUM(CAST(l_extendedprice * (1 + l_tax)
                               AS DECIMAL(30,6))) DESC, p_type, p_brand
           ) AS INTEGER) AS rank_within_parent
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY ROLLUP (p_type, p_brand)
"""

# q91: call-center returns loss per (center, manager) under an
# either-or demographic pair and a pinned month.
_Q91 = """
    SELECT n_name AS call_center, s_name AS manager,
           CAST(SUM(CAST(0.5 * l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS returns_loss
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
    WHERE l_returnflag = 'R'
      AND year(o_orderdate) = 1997 AND month(o_orderdate) = 11
      AND ((c_mktsegment = 'BUILDING' AND c_acctbal > 0)
        OR (c_mktsegment = 'MACHINERY' AND c_acctbal <= 0))
    GROUP BY n_name, s_name
"""

# q92: the q32 twin — the correlated average carries the SAME date
# window as the outer query.
_Q92 = """
    SELECT CAST(SUM(CAST(l.l_extendedprice * l.l_discount
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS excess_discount_amount
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 35
      AND l.l_shipdate >= TIMESTAMP '1997-01-27 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-27 00:00:00'
                          + INTERVAL '90' DAY
      AND l.l_discount > 1.3 * (
        SELECT CAST(SUM(CAST(l2.l_discount AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1997-01-27 00:00:00'
          AND l2.l_shipdate <  TIMESTAMP '1997-01-27 00:00:00'
                               + INTERVAL '90' DAY)
"""

# q94: the q16 twin on another channel slice / window / geography.
_Q94 = """
    SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS total_shipping_cost,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity
                         AS DECIMAL(30,6))) AS DOUBLE)
             AS total_net_profit
    FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation ON n_nationkey = c_nationkey
         JOIN part p ON p.p_partkey = l1.l_partkey
    WHERE o_orderdate >= TIMESTAMP '1997-02-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
                         + INTERVAL '60' DAY
      AND n_name = 'NATION_9'
      AND o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
      AND EXISTS (
        SELECT * FROM lineitem l2
        WHERE l1.l_orderkey = l2.l_orderkey
          AND l1.l_suppkey <> l2.l_suppkey)
      AND NOT EXISTS (
        SELECT * FROM lineitem l3
        WHERE l1.l_orderkey = l3.l_orderkey
          AND l3.l_returnflag = 'R')
"""

for _name, _text, _doc in [
    ("tpcds_sql_q69", _Q69,
     "TPC-DS q69 shape via Engine.sql: demographic counts under "
     "EXISTS AND NOT EXISTS AND NOT EXISTS across channels (reference "
     "tpcds/q69.sql)."),
    ("tpcds_sql_q71", _Q71,
     "TPC-DS q71 shape via Engine.sql: three-channel UNION ALL joined "
     "to the item dim, two-level time buckets with a meal-time "
     "disjunction (reference tpcds/q71.sql; t_hour/t_minute -> ship "
     "month / day-of-month — the fixture has no time-of-day)."),
    ("tpcds_sql_q72", _Q72,
     "TPC-DS q72 shape via Engine.sql: week-matched inventory with an "
     "under-stock inequality, +5-day lag inequality, and IS NULL "
     "promotion counts from a LEFT JOIN (reference tpcds/q72.sql)."),
    ("tpcds_sql_q73", _Q73,
     "TPC-DS q73 shape via Engine.sql: the q34 twin — 1-5 count band "
     "under a CASE-ratio filter (reference tpcds/q73.sql)."),
    ("tpcds_sql_q79", _Q79,
     "TPC-DS q79 shape via Engine.sql: ticket-grouped coupon/profit "
     "under a day-of-week pin, customer joined back (reference "
     "tpcds/q79.sql)."),
    ("tpcds_sql_q80", _Q80,
     "TPC-DS q80 shape via Engine.sql: three channel CTEs of sales/"
     "returns/profit netted through the 1:1 returns view, UNION ALL "
     "under ROLLUP(channel, id) (reference tpcds/q80.sql)."),
    ("tpcds_sql_q82", _Q82,
     "TPC-DS q82 shape via Engine.sql: the q37 derived-inventory twin "
     "(reference tpcds/q82.sql)."),
    ("tpcds_sql_q83", _Q83,
     "TPC-DS q83 shape via Engine.sql: three per-channel returned-"
     "quantity CTEs over nested week IN subqueries, equal-share "
     "percentages (reference tpcds/q83.sql)."),
    ("tpcds_sql_q84", _Q84,
     "TPC-DS q84 shape via Engine.sql: dim-chain customer lookup with "
     "a balance band, has-a-return condition, concatenated display "
     "name (reference tpcds/q84.sql)."),
    ("tpcds_sql_q85", _Q85,
     "TPC-DS q85 shape via Engine.sql: returns-reason averages under "
     "two OR-of-ANDs blocks (reference tpcds/q85.sql; reason -> order "
     "priority)."),
    ("tpcds_sql_q86", _Q86,
     "TPC-DS q86 shape via Engine.sql: rank-within-parent ROLLUP on "
     "the tax-inclusive measure (reference tpcds/q86.sql)."),
    ("tpcds_sql_q91", _Q91,
     "TPC-DS q91 shape via Engine.sql: call-center returns loss under "
     "an either-or demographic pair (reference tpcds/q91.sql)."),
    ("tpcds_sql_q92", _Q92,
     "TPC-DS q92 shape via Engine.sql: the q32 twin whose correlated "
     "average carries the same date window (reference tpcds/q92.sql)."),
    ("tpcds_sql_q94", _Q94,
     "TPC-DS q94 shape via Engine.sql: the q16 twin — EXISTS "
     "different-supplier, NOT EXISTS returns, COUNT DISTINCT "
     "(reference tpcds/q94.sql)."),
]:
    register(_name, _text, doc=_doc, tags=("tpcds", "sql_text", "dialect"))(
        _make(_name, _text)
    )
