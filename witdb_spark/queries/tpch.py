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
