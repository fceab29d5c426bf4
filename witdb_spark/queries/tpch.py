"""TPC-H-derived query suite, adapted to the driver's reduced schema.

The reference ships TPC-H q01-q22 as its benchmark/test corpus
(reference testing/trino-benchmark-queries/src/main/resources/sql/presto/tpch/,
testing/trino-benchto-benchmarks/.../tpch.yaml:1-38). The driver's synthetic
tables drop some columns (no partsupp table; lineitem lacks
commitdate/receiptdate/shipmode; orders lacks shippriority) so queries that
need them are adapted — each docstring says how.

Every query is written Spark-first: declarative DataFrame ops so Catalyst
gets pushdown/pruning/join-reordering; explicit broadcast() on
constant-cardinality dims (nation/region); fact-fact joins shuffle on their
keys and rely on AQE for skew/coalesce. Aggregates follow the determinism
rules in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from witdb_spark.catalog import Tables
from witdb_spark.queries.registry import register
from witdb_spark.queries.shared import DEC, davg, dsum, sql_avg, sql_sum, ts


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum('l_quantity', 'sum_qty')},
           {sql_sum('l_extendedprice', 'sum_base_price')},
           {sql_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_avg('l_quantity', 'avg_qty')},
           {sql_avg('l_extendedprice', 'avg_price')},
           {sql_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary report (TPC-H Q1): scan+filter+hash-aggregate. "
    "Reference operators: HashAggregationOperator.java:49, FilterAndProjectOperator.java:40.",
    tags=("tpch", "aggregate"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           {sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Shipping priority (TPC-H Q3, minus missing o_shippriority): 3-way join "
    "+ agg + deterministic top-k (tie-broken by unique key). Reference: "
    "LookupJoinOperator.java:36, TopNOperator.java:35.",
    tags=("tpch", "join", "topn"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(F.col("o_orderdate") < ts("1997-03-15 00:00:00"))
    li = t.lineitem.filter(F.col("l_shipdate") > ts("1997-03-15 00:00:00"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    f"""
    SELECT n_name, {sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
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
    doc="Local supplier volume (TPC-H Q5): 6-way join; nation/region broadcast "
    "(constant cardinality at every SF), fact joins shuffle on keys. "
    "Reference: DetermineJoinDistributionType.java:59 picks broadcast the same way.",
    tags=("tpch", "join", "broadcast"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    nr = (
        t.nation.join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q6",
    f"""
    SELECT {sql_sum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Forecast revenue change (TPC-H Q6): pure scan+filter+global agg; the "
    "whole predicate pushes into the parquet scan. Reference: "
    "AggregationOperator.java:35, ScanFilterAndProjectOperator.java:68.",
    tags=("tpch", "scan", "aggregate"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           {sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           {sql_sum('c_acctbal', 'acctbal')},
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
    doc="Returned-item reporting (TPC-H Q10, minus missing address/phone cols): "
    "join + agg + top-20. acctbal summed (not grouped) to keep output stable.",
    tags=("tpch", "join", "topn"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            dsum("c_acctbal", "acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="Order priority checking (TPC-H Q4; commitdate/receiptdate absent, so "
    "'late' means shipped after order date): EXISTS -> left-semi join with a "
    "non-equi conjunct. Reference: HashSemiJoinOperator.java:49, "
    "TransformExistsApplyToCorrelatedJoin.java.",
    tags=("tpch", "semijoin"),
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-10-01 00:00:00"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_sum('volume', 'revenue')}
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
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="Volume shipping (TPC-H Q7): nation self-join aliased twice + year "
    "extraction; both nation joins broadcast.",
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1998-01-01 00:00:00"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        t.supplier.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .withColumn("volume", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume", "revenue"))
    )


@register(
    "tpch_q8",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3'
                         THEN CAST(volume AS DECIMAL(30,6)) ELSE 0 END) AS DOUBLE)
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
    ) all_nations
    GROUP BY o_year
    """,
    doc="National market share (TPC-H Q8, no p_mfgr in schema): 8-way join, "
    "conditional aggregation as exact-decimal ratio of doubles.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    orders = t.orders.filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1998-01-01 00:00:00"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        t.part.filter(F.col("p_type") == "ECONOMY")
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.cast(DEC).alias("volume_dec"),
            "nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume_dec")).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).cast("double")
            / F.sum("volume_dec").cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q9",
    f"""
    SELECT nation, o_year, {sql_sum('amount', 'sum_profit')}
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
    ) profit
    GROUP BY nation, o_year
    """,
    doc="Product type profit (TPC-H Q9 adapted: no partsupp table, so supply "
    "cost is modeled as 0.5*p_retailprice): LIKE filter + 5-way join. "
    "Reference LIKE engine: likematcher/LikeMatcher.java.",
    tags=("tpch", "join", "like"),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t.part.filter(F.col("p_name").like("%red%"))
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
    )


@register(
    "tpch_q12",
    """
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_year
    """,
    doc="Shipping modes / priority (TPC-H Q12 adapted: no l_shipmode column, "
    "grouped by ship year; 'late' = shipped >30 days after order): interval "
    "arithmetic join predicate + pivot-style conditional counts.",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="Customer distribution (TPC-H Q13): left outer join with extra join-"
    "condition predicate + double aggregation. Reference: "
    "LookupOuterOperator.java:35.",
    tags=("tpch", "outerjoin"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q14",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                    END) AS DOUBLE) * 100
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="Promotion effect (TPC-H Q14; p_type here is a single word so "
    "equality replaces LIKE 'PROMO%%'): conditional agg ratio.",
    tags=("tpch", "aggregate"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1996-10-01 00:00:00"))
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", disc)).cast("double")
                * F.lit(100)
                / F.sum(disc).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="Top supplier (TPC-H Q15): CTE + scalar subquery on an exact decimal "
    "(ties-safe equality). Spark side computes the max via a broadcast "
    "cross-join instead of a collect.",
    tags=("tpch", "subquery"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
                "total_rev"
            )
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        t.supplier.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@register(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 35, 45)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="Parts/supplier relationship (TPC-H Q16 adapted: no partsupp, "
    "supplier-per-part derived from lineitem): DISTINCT aggregation. "
    "Reference: MarkDistinctOperator.java:36.",
    tags=("tpch", "distinct"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 35, 45))
    )
    return (
        t.lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="Small-quantity-order revenue (TPC-H Q17): correlated scalar subquery "
    "-> per-part average joined back (what Catalyst decorrelation does; "
    "reference TransformCorrelatedScalarSubquery.java:80). Quantities are "
    "integer-valued doubles, so plain AVG is exact and engine-identical.",
    tags=("tpch", "subquery"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    thresholds = t.lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        t.lineitem.join(
            t.part.filter(F.col("p_brand") == "Brand#3"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {sql_sum('l_quantity', 'sum_qty')}
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="Large volume customer (TPC-H Q18): IN-subquery with HAVING -> "
    "semi join on an aggregated derived table. Reference: "
    "TransformUncorrelatedInPredicateSubqueryToSemiJoin.java.",
    tags=("tpch", "semijoin", "having"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "leftsemi")
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", "sum_qty"))
    )


@register(
    "tpch_q19",
    f"""
    SELECT {sql_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="Discounted revenue (TPC-H Q19, minus missing shipmode/shipinstruct "
    "predicates): disjunctive multi-clause join filter.",
    tags=("tpch", "join"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "tpch_q21",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
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
    doc="Suppliers who kept orders waiting (TPC-H Q21 adapted: 'late' = "
    "shipped >60 days after order date, since receipt/commit dates are "
    "absent): EXISTS + NOT EXISTS -> left-semi + left-anti self joins. "
    "Reference: HashSemiJoinOperator.java:49, LookupJoinOperator.java:36.",
    tags=("tpch", "semijoin", "antijoin"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    late = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = t.lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        late.join(
            l2,
            (F.col("l2_orderkey") == F.col("l_orderkey"))
            & (F.col("l2_suppkey") != F.col("l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l3_orderkey") == F.col("l_orderkey"))
            & (F.col("l3_suppkey") != F.col("l_suppkey")),
            "leftanti",
        )
    )
    return (
        waiting.join(t.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@register(
    "tpch_q22",
    f"""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           {sql_sum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_nationkey IN (1, 2, 3, 4, 5)
      AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer
                       WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="Global sales opportunity (TPC-H Q22 adapted: nationkey replaces the "
    "missing phone country code; 'no orders' scoped to 2000+ since every "
    "customer has some order): uncorrelated scalar subquery + anti join.",
    tags=("tpch", "antijoin", "subquery"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pool = t.customer.filter(F.col("c_nationkey").isin(1, 2, 3, 4, 5))
    # davg, not F.avg: the threshold feeds an unrounded comparison, so the
    # mean must be bit-identical across engines (decimal-exact sum + one
    # IEEE division — the registry's floating-aggregate rule)
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    recent = t.orders.filter(F.col("o_orderdate") >= ts("2000-01-01 00:00:00")).select(
        "o_custkey"
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "leftanti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# The driver's schema has no partsupp table; q2/q11/q20 derive one from
# lineitem's observed (l_partkey, l_suppkey) pairs: supplycost := the best
# (minimum) observed unit price, availqty := total quantity ever shipped.
# MIN and integer-valued SUM are order-insensitive, so the derivation is
# engine-deterministic without decimal casts.
PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost,
           SUM(l_quantity) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


def _partsupp(t: Tables) -> DataFrame:
    return t.lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


@register(
    "tpch_q2",
    f"""
    WITH ps AS ({PS_SQL}),
    eps AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             s_acctbal, s_name, n_name
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
    LIMIT 100
    """,
    doc="Minimum-cost supplier (TPC-H Q2), partsupp derived from lineitem "
    "(driver schema has none): correlated MIN subquery -> groupBy+join-back, "
    "exactly Catalyst's decorrelation (reference "
    "TransformCorrelatedScalarSubquery.java:80). nation/region broadcast; "
    "the MIN is computed identically on both sides of the equality so "
    "double-equality is safe.",
    tags=("tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    nr = t.nation.join(
        F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    eps = (
        _partsupp(t)
        .join(t.supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    best = eps.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("b_cost")
    )
    pf = t.part.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    return (
        eps.join(
            best,
            (F.col("ps_partkey") == F.col("b_partkey"))
            & (F.col("ps_supplycost") == F.col("b_cost")),
        )
        .join(pf, F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q11",
    f"""
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
    doc="Important stock identification (TPC-H Q11, derived partsupp, "
    "threshold adapted to 2x the mean part value so it scales with SF "
    "instead of TPC-H's 0.0001/SF constant): global-agg scalar subquery "
    "broadcast against the grouped values. Unit cost is FLOORed to integer "
    "micro-units before aggregation: double->decimal casts tie-break "
    "differently across engines (Spark HALF_UP vs DuckDB half-even) but "
    "FLOOR of an identical IEEE double is identical everywhere, and the "
    "bigint sums after it are exact.",
    tags=("tpch", "aggregate", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    nat = t.nation.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    ps = t.lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * F.lit(1_000_000)
            ).cast("bigint")
        ).alias("ps_cost_micros"),
        F.sum("l_quantity").alias("ps_availqty"),
    )
    nps = (
        ps.join(t.supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (
                F.col("ps_cost_micros") * F.col("ps_availqty").cast("bigint")
            ).alias("part_value"),
        )
    )
    pv = nps.groupBy("ps_partkey").agg(
        (F.sum("part_value").cast("double") / F.lit(1_000_000.0)).alias("value")
    )
    threshold = nps.agg(
        (
            F.sum("part_value").cast("double")
            / F.lit(1_000_000.0)
            * F.lit(2.0)
            / F.count_distinct("ps_partkey")
        ).alias("thresh")
    )
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thresh"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
        .limit(100)
    )


@register(
    "tpch_q20",
    f"""
    WITH ps AS ({PS_SQL})
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
    doc="Potential part promotion (TPC-H Q20, derived partsupp): nested IN "
    "subqueries with a correlated scalar -> semi joins + grouped join-back "
    "(reference TransformCorrelatedInPredicateToJoin.java). The inner join "
    "against the 1996 shipments drops (part,supp) pairs with no window "
    "shipments — the same rows the NULL comparison excludes in SQL.",
    tags=("tpch", "join", "subquery", "semijoin"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    small_parts = t.part.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        )
        .groupBy(
            F.col("l_partkey").alias("w_partkey"),
            F.col("l_suppkey").alias("w_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("window_qty"))
    )
    qualified = (
        _partsupp(t)
        .join(small_parts, F.col("p_partkey") == F.col("ps_partkey"), "leftsemi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("w_partkey"))
            & (F.col("ps_suppkey") == F.col("w_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.col("window_qty"))
        .select("ps_suppkey")
    )
    return (
        t.supplier.join(
            F.broadcast(t.nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )
