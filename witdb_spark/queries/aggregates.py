"""Aggregate-function library coverage (SURVEY.md §2.4; reference
operator/aggregation/ — 108 files registered via
metadata/SystemFunctionBundle.java:368-).

Determinism strategy per family:
  - Moment statistics (stddev/var/corr/covar/regr): both engines implement
    the same textbook definitions but accumulate doubles in different orders;
    values agree to ~1e-12 relative, so both sides round to 6 decimals.
  - Skewness/kurtosis: DuckDB applies sample-bias correction while
    Trino/Spark use population moments (reference
    CentralMomentsAggregation.java), so the oracle spells out the population
    formula from exact decimal power sums.
  - min_by/max_by: keyed on ts_ns which is verified-unique per user — no
    tie ambiguity between engines.
  - Ordered array_agg / listagg: emitted as delimiter-joined strings
    (reference arrayagg/, listagg/ with OrderedAccumulatorFactory) — string
    output is engine-neutral, array reprs are not.
  - approx_* sketches: algorithms are engine-specific; those queries carry
    no oracle (driver records rows-only) and tests/test_approx.py bounds
    their error against the exact answer instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from witdb_spark.catalog import Tables
from witdb_spark.queries.analytics import EVENTS_NS
from witdb_spark.queries.registry import register
from witdb_spark.queries.shared import DEC, dsum, sql_sum



def _mat_ctes(sql: str) -> str:
    """Pin single execution of every CTE in a DuckDB ORACLE text.

    DuckDB inlines CTEs by default and re-executes a CTE's whole chain
    once per reference, so the scalar-subquery-heavy digest oracles go
    multiplicative: agg_tdigest_sql_names' oracle measured 118.8 s at
    sf0.01 and 6.3 s with AS MATERIALIZED -- identical values (r16; the
    57 s test_queries_oracle hotspot). Oracle-side only; Spark never
    sees these texts."""
    return re.sub(r"\bAS\s*\(\s*(SELECT|VALUES)", r"AS MATERIALIZED (\1", sql)


@register(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)                 AS sd_qty,
           round(var_samp(l_quantity), 6)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
           round(covar_pop(l_quantity, l_extendedprice), 6)  AS covarp_qp
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Variance/stddev/correlation/covariance (reference "
    "VarianceAggregation.java, DoubleCorrelationAggregation.java, "
    "DoubleCovarianceAggregation.java); 6-decimal rounding absorbs "
    "accumulation-order noise.",
    tags=("aggregate", "stats"),
)

def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("covarp_qp"),
    )


@register(
    "agg_skew_kurt",
    """
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*)::DOUBLE AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skew_qty,
           round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 2) - 3, 6) AS kurt_qty
    FROM m
    """,
    doc="Population skewness / excess kurtosis (reference "
    "CentralMomentsAggregation.java uses population moments, same as Spark). "
    "DuckDB's built-ins apply sample-bias correction, so the oracle computes "
    "the population formula from exact decimal power sums.",
    tags=("aggregate", "stats"),
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


@register(
    "agg_regr",
    """
    SELECT round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 6)      AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 6)      AS avgy
    FROM lineitem
    """,
    doc="Linear regression aggregates (reference "
    "DoubleRegressionAggregation.java; Trino ships regr_slope/intercept, "
    "Spark 3.4+ ships the full regr_* family).",
    tags=("aggregate", "stats"),
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return t.lineitem.agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx"),
        F.round(F.regr_avgy(y, x), 6).alias("avgy"),
    )


@register(
    "agg_minmax_by",
    f"""
    {EVENTS_NS}
    SELECT user_id,
           max_by(event_id, ts_ns) AS last_event,
           min_by(event_id, ts_ns) AS first_event,
           max_by(event_type, ts_ns) AS last_type,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events_ns
    GROUP BY user_id
    """,
    doc="min_by/max_by (reference MaxByAggregationFunction.java, minmaxbyn/) "
    "keyed on the verified-unique ts_ns so both engines pick the same row.",
    tags=("aggregate",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.max_by("event_id", "ts_ns").alias("last_event"),
        F.min_by("event_id", "ts_ns").alias("first_event"),
        F.max_by("event_type", "ts_ns").alias("last_type"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "agg_listagg_ordered",
    f"""
    {EVENTS_NS}
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts_ns, event_id) AS type_seq,
           string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY event_id DESC) AS ids_desc
    FROM events_ns
    WHERE user_id < 20
    GROUP BY user_id
    """,
    doc="Ordered array_agg / listagg (reference "
    "arrayagg/ArrayAggregationFunction.java + OrderedAccumulatorFactory.java, "
    "listagg/): Spark rewrite is array_sort(collect_list(struct(key, val))) "
    "then join — the documented workaround for collect_list's "
    "non-deterministic order.",
    tags=("aggregate", "arrayagg"),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("user_id") < 20)
    type_seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts_ns", "event_id", "event_type"))),
            lambda s: s.event_type,
        ),
        ",",
    )
    ids_desc = F.array_join(
        F.transform(
            F.reverse(F.array_sort(F.collect_list(F.struct(F.col("event_id"))))),
            lambda s: s.event_id.cast("string"),
        ),
        "|",
    )
    return ev.groupBy("user_id").agg(
        type_seq.alias("type_seq"), ids_desc.alias("ids_desc")
    )


@register(
    "agg_histogram_map",
    """
    SELECT user_id % 5 AS bucket,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY event_type || ':' || CAST(n AS VARCHAR))
             AS type_histogram
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ) c
    GROUP BY user_id % 5
    """,
    doc="histogram / map_agg (reference histogram/Histogram.java, "
    "MapAggregationFunction.java) rendered as a sorted k:v string — the "
    "engine-neutral serialization of a map aggregate.",
    tags=("aggregate", "map"),
)
def agg_histogram_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    counts = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    kv = F.concat_ws(":", F.col("event_type"), F.col("n").cast("string"))
    return (
        counts.withColumn("bucket", F.col("user_id") % 5)
        .groupBy("bucket")
        .agg(
            F.array_join(F.array_sort(F.collect_list(kv)), ",").alias("type_histogram")
        )
    )


@register(
    "agg_conditional_bool",
    """
    SELECT event_type,
           CAST(count_if(value > 50) AS BIGINT) AS n_big,
           bool_and(value >= 0)                 AS all_nonneg,
           bool_or(value > 99)                  AS any_huge,
           bit_and(user_id)                     AS band,
           bit_or(user_id)                      AS bor,
           COUNT(*) FILTER (WHERE value < 10)   AS n_small
    FROM events
    GROUP BY event_type
    """,
    doc="count_if / bool_and / bool_or / bitwise aggs / FILTER clause "
    "(reference CountIfAggregation.java, BooleanAndAggregation.java, "
    "BitwiseAndAggregation.java, DistinctAccumulatorFactory FILTER support).",
    tags=("aggregate",),
)
def agg_conditional_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_big"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_huge"),
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.count(F.when(F.col("value") < 10, 1)).alias("n_small"),
    )


@register(
    "agg_geo_mean_percentiles",
    """
    SELECT round(exp(avg(ln(value))), 6)          AS geo_mean,
           round(median(value), 6)                AS med,
           round(quantile_cont(value, 0.25), 6)   AS p25,
           round(quantile_cont(value, 0.95), 6)   AS p95
    FROM events
    WHERE value > 0
    """,
    doc="geometric_mean (reference GeometricMeanAggregations.java) as "
    "exp(avg(ln x)); exact interpolated percentiles (reference "
    "ApproximateLongPercentileAggregations is approx — Spark's "
    "percentile() is the exact counterpart, DuckDB quantile_cont).",
    tags=("aggregate", "percentile"),
)
def agg_geo_mean_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value") > 0)
    return ev.agg(
        F.round(F.exp(F.avg(F.log("value"))), 6).alias("geo_mean"),
        F.round(F.median("value"), 6).alias("med"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


@register(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_supp,
           COUNT(DISTINCT l_partkey)  AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_ord,
           COUNT(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multiple DISTINCT aggregates in one query (reference "
    "MarkDistinctOperator.java:36, MultipleDistinctAggregationToMarkDistinct"
    ".java:69; Spark uses the same expand-based rewrite).",
    tags=("aggregate", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
        F.count_distinct("l_orderkey").alias("n_ord"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _approx_sketches_oracle() -> str:
    from witdb_spark.operators.hll import hll_oracle_cte

    q1 = hll_oracle_cte("lineitem", "l_orderkey", [], "approx_orders")
    q2 = hll_oracle_cte("lineitem", "l_partkey", [], "approx_parts")
    q3 = hll_oracle_cte("lineitem", "l_suppkey", [], "approx_supps")
    return (
        "SELECT a.approx_orders, b.approx_parts, c.approx_supps "
        f"FROM ({q1}) a CROSS JOIN ({q2}) b CROSS JOIN ({q3}) c"
    )


@register(
    "agg_approx_sketches",
    _approx_sketches_oracle(),
    doc="approx-distinct sketches (reference "
    "ApproximateCountDistinctAggregation.java:45, "
    "ApproximateSetAggregation.java) as deterministic md5-register HLL "
    "(operators/hll.py): bucket/rho from md5 slices with integer-only "
    "arithmetic, so the identical registers — and the identical estimate — "
    "are reproducible in DuckDB SQL and hash-checked by the driver. Spark's "
    "native approx_count_distinct/hll_sketch_agg remain covered by error "
    "bounds in tests/test_approx.py (their register hashes are "
    "engine-private and cannot be oracle-checked).",
    tags=("aggregate", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.hll import hll_estimate, hll_registers

    t = Tables(spark, sf_dir)
    ords = hll_estimate(hll_registers(t.lineitem, [], "l_orderkey"), [], "approx_orders")
    parts = hll_estimate(hll_registers(t.lineitem, [], "l_partkey"), [], "approx_parts")
    supps = hll_estimate(hll_registers(t.lineitem, [], "l_suppkey"), [], "approx_supps")
    return ords.crossJoin(parts).crossJoin(supps)


@register(
    "agg_checksum",
    """
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
               CAST(l_linenumber AS VARCHAR)), 1, 12)) AS BIGINT)) AS DECIMAL(38,0))
             AS VARCHAR)
           AS row_checksum
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Order-insensitive checksum aggregate (reference "
    "ChecksumAggregationFunction.java): sum of 48-bit md5 prefixes of the "
    "row key — commutative, so partition order can't change it; portable "
    "across engines unlike xxhash64-based checksums. Summed in "
    "DECIMAL(38,0) and emitted as text: an int64 sum overflows beyond "
    "~65k rows per group (2^48 * 2^16 > 2^63), which sf0.1+ reaches.",
    tags=("aggregate", "checksum"),
)
def agg_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            12,  # 48-bit prefixes; sum in DECIMAL(38,0) — an int64 sum
        ),  # overflows once a group exceeds ~2^15 rows
        16,
        10,
    ).cast("decimal(38,0)")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.sum(row_hash).cast("decimal(38,0)").cast("string").alias("row_checksum")
    )


@register(
    "agg_reduce_agg",
    """
    SELECT user_id,
           round(CAST(SUM(CAST(ln(value) AS DECIMAL(30,12))) AS DOUBLE), 6) AS log_sum
    FROM (SELECT user_id, value FROM events WHERE value > 0) t
    GROUP BY user_id
    """,
    doc="reduce_agg lambda aggregation (reference "
    "ReduceAggregationFunction.java): the Spark expression is a true fold — "
    "aggregate() over array_agg — demonstrating arbitrary lambda state; "
    "decimal-cast per element keeps the fold order-insensitive.",
    tags=("aggregate", "lambda"),
)
def agg_reduce_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("value") > 0)
    # reduce_agg(value, 0, (s, x) -> s + ln(x), (a, b) -> a + b) spelled as
    # an explicit fold over the collected group — Catalyst evaluates the
    # lambda chain JVM-side; decimal addition is associative so the
    # collect_list order cannot affect the result.
    fold = F.aggregate(
        F.collect_list(F.log("value").cast("decimal(30,12)")),
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    )
    return ev.groupBy("user_id").agg(
        F.round(fold.cast("double"), 6).alias("log_sum")
    )


@register(
    "agg_approx_most_frequent",
    """
    SELECT p_brand AS value, COUNT(*) AS freq
    FROM part GROUP BY 1
    ORDER BY freq DESC, value LIMIT 5
    """,
    doc="approx_most_frequent(5, p_brand) (reference "
    "ApproximateMostFrequentHistogram.java / BigintApproximateMostFrequent."
    "java, a SpaceSaving sketch): at any fixed k the exact plan — map-side "
    "partial counts into a groupBy on the value, then a global top-k "
    "(TakeOrderedAndProject, no full sort) — has the same shuffle shape as "
    "merging sketches and is exact; the sketch only wins when the value "
    "cardinality itself overwhelms executors, which a brand-like column "
    "never does.",
    tags=("aggregate", "approx"),
)
def agg_approx_most_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.part.groupBy(F.col("p_brand").alias("value"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "value")
        .limit(5)
    )


@register(
    "agg_salted_skew",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           CAST(SUM(sub_total) AS BIGINT) AS n_orders
    FROM (
      SELECT o_orderpriority, o_custkey, COUNT(*) AS sub_total
      FROM orders GROUP BY 1, 2
    ) t
    GROUP BY o_orderpriority
    """,
    doc="Skew-resistant aggregation (operators/skew.py): COUNT DISTINCT via "
    "value-salted two-stage groupBy — each distinct value hashes to one "
    "bucket so per-bucket distinct counts are additive; the hot key's rows "
    "spread over 16 reducers instead of one. Reference handles the same "
    "problem with partial aggregation pushdown "
    "(PushPartialAggregationThroughExchange.java:60); salting covers the "
    "holistic aggregates partial agg can't collapse. The oracle computes "
    "the same counts the direct single-stage way.",
    tags=("aggregate", "skew"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.skew import salted_agg, salted_count_distinct

    t = Tables(spark, sf_dir)
    nd = salted_count_distinct(
        t.orders, ["o_orderpriority"], "o_custkey", buckets=16
    ).withColumnRenamed("n_distinct", "n_custs")
    totals = salted_agg(
        t.orders,
        ["o_orderpriority"],
        stage1=lambda: [F.count(F.lit(1)).alias("__c")],
        stage2=lambda: [F.sum("__c").alias("n_orders")],
        buckets=16,
    )
    return nd.join(totals, "o_orderpriority")


def _hll_rollup_oracle() -> str:
    from witdb_spark.operators.hll import hll_oracle_cte

    # Register MAX is associative: building per-nation registers then
    # merging to region == building per-region registers directly, so the
    # oracle may group by region in one pass.
    src = "(SELECT n_regionkey, c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey)"
    return hll_oracle_cte(src, "c_custkey", ["n_regionkey"], "approx_custs")


@register(
    "agg_hll_merge_rollup",
    _hll_rollup_oracle(),
    doc="HLL sketch merge/rollup (reference HyperLogLogFunctions.java merge "
    "+ ApproximateSetAggregation.java): per-nation customer register "
    "sketches (operators/hll.py) are re-aggregated to region level by "
    "UNIONING SKETCHES (per-register MAX), not recounting rows — the "
    "property that makes approx-distinct rollups one cheap merge pass at "
    "100 TB instead of a rescan. Registers derive from md5 with "
    "integer-only arithmetic, so the merged estimate is bit-reproducible "
    "in DuckDB SQL (the oracle exploits MAX-associativity and groups by "
    "region directly).",
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.hll import hll_estimate, hll_merge, hll_registers

    t = Tables(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    per_nation = hll_registers(joined, ["n_regionkey", "n_nationkey"], "c_custkey")
    per_region = hll_merge(per_nation, ["n_regionkey"])
    return hll_estimate(per_region, ["n_regionkey"], "approx_custs")


@register(
    "agg_rollup_reuse",
    """
    WITH hourly AS (
      SELECT epoch_ns(ts) // 3600000000000 AS hour_id, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS sum_v
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(hour_id // 24 AS BIGINT) AS day_id, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sum_v) AS DOUBLE) AS total
    FROM hourly GROUP BY 1, 2
    """,
    doc="Hierarchical rollup reuse (the hypertable/continuous-aggregate "
    "pattern): daily totals are computed FROM the hourly materialization, "
    "not from raw events — sums re-aggregate exactly because the partial "
    "state (count, decimal sum) is algebraic. At scale the hourly relation "
    "is the stored rollup; each refresh touches only new hours.",
    tags=("aggregate", "rollup", "timeseries"),
)
def agg_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # integer `div`, not `/`: ts_ns ~1.7e18 exceeds double's 2^53 exact
    # range, so float division could mis-bucket exact hour boundaries
    hourly = t.events.groupBy(
        F.expr("ts_ns div 3600000000000").alias("hour_id"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("sum_v"),
    )
    return hourly.groupBy(
        F.expr("hour_id div 24").alias("day_id"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").cast("double").alias("total"),
    )


def _qdigest_rollup_oracle() -> str:
    from witdb_spark.operators.qdigest import K_POINTS, quantile_index

    kp = K_POINTS
    i25, i50, i75 = (quantile_index(q, kp) for q in (0.25, 0.5, 0.75))
    # Reproduce the integer-rank digest pipeline (operators/qdigest.py):
    # per-flag K-point rank selection -> weight-n pool -> rank re-selection.
    return _mat_ctes(f"""
    WITH ranked AS (
      SELECT l_returnflag AS f, l_extendedprice + 0.0e0 AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    ks AS (SELECT range AS k FROM range({kp})),
    digest AS (
      SELECT f, k, v, n FROM ranked JOIN ks ON rn = (k * (n - 1)) // {kp - 1}),
    sorted AS (
      SELECT v, SUM(n) OVER (ORDER BY v, f, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM digest),
    tot AS (SELECT SUM(n) AS wtot FROM digest),
    merged AS (
      SELECT k, (SELECT MIN(v) FROM sorted WHERE cum >= (k * (SELECT wtot FROM tot)) // {kp - 1}) AS mv
      FROM ks)
    SELECT (SELECT mv FROM merged WHERE k = {i25}) AS p25,
           (SELECT mv FROM merged WHERE k = {i50}) AS p50,
           (SELECT mv FROM merged WHERE k = {i75}) AS p75
    """)


@register(
    "agg_qdigest_rollup",
    _qdigest_rollup_oracle(),
    doc="Quantile digests as values (reference QuantileDigestAggregation"
    "Function.java:40, QuantileDigestFunctions.java value_at_quantile/"
    "merge): per-returnflag price digests built with qdigest_agg, MERGED "
    "upward (integer-rank pooled re-selection, operators/qdigest.py) to a "
    "global digest, then values_at_quantiles([0.25, 0.5, 0.75]) — the "
    "store-then-merge model that makes percentile rollups one merge pass "
    "instead of a rescan. Every digest point is an exact input value "
    "selected by integer rank (no float interpolation), so the oracle "
    "replays the identical pipeline in DuckDB SQL and the driver "
    "hash-checks it.",
    tags=("aggregate", "approx", "sketch"),
)
def agg_qdigest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.qdigest import (
        merge_qdigests,
        qdigest_agg,
        values_at_quantiles,
    )

    t = Tables(spark, sf_dir)
    per_flag = qdigest_agg(
        t.lineitem.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
    )
    merged = merge_qdigests(
        per_flag.withColumn("g", F.lit(1)).select("g", "qdigest"), ["g"]
    )
    return merged.select(
        values_at_quantiles("qdigest", [0.25, 0.5, 0.75]).alias("qvals")
    ).select(
        F.col("qvals")[0].alias("p25"),
        F.col("qvals")[1].alias("p50"),
        F.col("qvals")[2].alias("p75"),
    )


@register(
    "agg_multimap",
    """
    SELECT bucket,
           string_agg(entry, '|' ORDER BY entry) AS mm
    FROM (
      SELECT user_id % 5 AS bucket,
             event_type || ':' ||
             string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
               AS entry
      FROM events
      WHERE event_id < 2000
      GROUP BY user_id % 5, event_type
    ) e
    GROUP BY bucket
    """,
    doc="multimap_agg (reference aggregation/multimapagg/"
    "MultimapAggregationFunction.java: key -> ARRAY of all values). "
    "Composed as two hash aggregations — per (group, key) value lists, "
    "then key->list entries per group — which is the scale-correct shape "
    "(two key-partitioned shuffles, no per-group quadratic work). "
    "Serialized sorted for the cross-engine hash.",
    tags=("aggregate", "map", "multimap"),
)
def agg_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_key = (
        t.events.filter(F.col("event_id") < 2000)
        .withColumn("bucket", F.col("user_id") % 5)
        .groupBy("bucket", "event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("event_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("vals")
        )
    )
    entry = F.concat_ws(":", F.col("event_type"), F.col("vals"))
    return per_key.groupBy("bucket").agg(
        F.array_join(F.array_sort(F.collect_list(entry)), "|").alias("mm")
    )


def _tdigest_rollup_oracle() -> str:
    from witdb_spark.operators.tdigest import (
        K_CENTROIDS,
        grid_bracket,
        rank_mids,
        scale_grid,
    )

    grid = scale_grid(K_CENTROIDS)
    mids = rank_mids(K_CENTROIDS)
    vals = ", ".join(
        f"({k}, {q!r}, {mids[k]!r}, {mids[k + 1]!r})" for k, q in enumerate(grid)
    )

    def interp(q: float, alias: str) -> str:
        lo, hi, w = grid_bracket(q)
        return (
            f"(SELECT mv FROM merged WHERE k = {lo}) + {w!r} * "
            f"((SELECT mv FROM merged WHERE k = {hi}) - "
            f"(SELECT mv FROM merged WHERE k = {lo})) AS {alias}"
        )
    # Replay the determinized t-digest pipeline (operators/tdigest.py):
    # per-flag nearest-rank selection on the cosine grid -> weight-n pool
    # -> weighted grid re-selection. The grid literals come from the same
    # Python scale_grid() the UDFs close over, so both engines do identical
    # IEEE arithmetic.
    return _mat_ctes(f"""
    WITH ranked AS (
      SELECT l_returnflag AS f, l_extendedprice + 0.0e0 AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    grid(k, q, mlo, mhi) AS (VALUES {vals}),
    digest AS (
      SELECT f, g.k, v,
             CAST(floor(g.mhi * n + 0.5) AS BIGINT)
               - CAST(floor(g.mlo * n + 0.5) AS BIGINT) AS w
      FROM ranked
      JOIN grid g ON rn = CAST(floor(g.q * (n - 1) + 0.5) AS BIGINT)),
    sorted AS (
      SELECT v, SUM(w) OVER (ORDER BY v, f, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM digest),
    tot AS (SELECT SUM(w) AS wtot FROM digest),
    merged AS (
      SELECT g.k,
             CASE WHEN g.k = 0 THEN (SELECT MIN(v) FROM sorted)
                  WHEN g.k = {K_CENTROIDS - 1} THEN (SELECT MAX(v) FROM sorted)
                  ELSE (SELECT MIN(v) FROM sorted
                        WHERE cum >= floor(g.q * (CAST((SELECT wtot FROM tot) AS DOUBLE) - 1) + 0.5) + 1)
             END AS mv
      FROM grid g)
    SELECT {interp(0.50, "p50")},
           {interp(0.95, "p95")},
           {interp(0.99, "p99")}
    """)


@register(
    "agg_tdigest_rollup",
    _tdigest_rollup_oracle(),
    doc="T-digests as values (reference TDigestAggregationFunction.java:32, "
    "TDigestFunctions.java value_at_quantile/merge): per-returnflag price "
    "digests on the k1-scale cosine grid (tail-dense — p95/p99 resolve at "
    "O(1/K^2) spacing), MERGED upward by weighted grid re-selection to one "
    "global digest, then values_at_quantiles([0.5, 0.95, 0.99]). Every "
    "centroid is an exact input value selected by integer rank on a grid "
    "injected identically into both engines, so the oracle replays the "
    "pipeline bit-for-bit (operators/tdigest.py).",
    tags=("aggregate", "approx", "sketch"),
)
def agg_tdigest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.tdigest import (
        merge_tdigests,
        tdigest_agg,
        values_at_quantiles,
    )

    t = Tables(spark, sf_dir)
    per_flag = tdigest_agg(
        t.lineitem.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
    )
    merged = merge_tdigests(
        per_flag.withColumn("g", F.lit(1)).select("g", "tdigest"), ["g"]
    )
    return merged.select(
        values_at_quantiles("tdigest", [0.50, 0.95, 0.99]).alias("tv")
    ).select(
        F.col("tv")[0].alias("p50"),
        F.col("tv")[1].alias("p95"),
        F.col("tv")[2].alias("p99"),
    )


def _setdigest_oracle() -> str:
    from witdb_spark.operators.hll import hll_oracle_cte
    from witdb_spark.operators.setdigest import K_HASHES

    card_a = hll_oracle_cte(
        "(SELECT event_id % 599 AS v FROM events WHERE event_type = 'view')",
        "v", [], "card_view",
    )
    card_b = hll_oracle_cte(
        "(SELECT event_id % 599 AS v FROM events WHERE event_type = 'purchase')",
        "v", [], "card_purchase",
    )
    # register MAX is associative, so merge_set_digest(A, B)'s HLL half ==
    # registers built over the unioned rows directly
    card_u = hll_oracle_cte(
        "(SELECT event_id % 599 AS v FROM events"
        " WHERE event_type IN ('view', 'purchase'))",
        "v", [], "ucard",
    )
    return f"""
    WITH a AS (SELECT DISTINCT md5(CAST(event_id % 599 AS VARCHAR)) AS h
               FROM events WHERE event_type = 'view'),
    b AS (SELECT DISTINCT md5(CAST(event_id % 599 AS VARCHAR)) AS h
          FROM events WHERE event_type = 'purchase'),
    uk AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
           ORDER BY h LIMIT {K_HASHES}),
    counts AS (
      SELECT (SELECT COUNT(*) FROM uk) AS nu,
             (SELECT COUNT(*) FROM uk
              WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS nb)
    SELECT CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE) AS jaccard,
           ca.card_view, cb.card_purchase,
           CAST(round(CAST(nb AS DOUBLE) / CAST(nu AS DOUBLE) * cu.ucard, 6)
                AS DOUBLE) AS icard
    FROM counts CROSS JOIN ({card_a}) ca CROSS JOIN ({card_b}) cb
    CROSS JOIN ({card_u}) cu
    """


@register(
    "agg_setdigest",
    _setdigest_oracle(),
    doc="SetDigest family (reference type/setdigest/SetDigest.java, "
    "SetDigestFunctions.java make_set_digest/merge_set_digest/cardinality/"
    "intersection_cardinality/jaccard_index): HLL + bottom-k MinHash over "
    "md5 (operators/setdigest.py). Digests of the view-event and "
    "purchase-event id sets; jaccard from the bottom-k estimator, "
    "cardinalities from the md5-register HLL, intersection_cardinality = "
    "jaccard x cardinality(merged digest). Deterministic end-to-end, so "
    "DuckDB replays the identical sketches.",
    tags=("aggregate", "approx", "sketch", "dedup"),
)
def agg_setdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.operators.setdigest import (
        cardinality,
        intersection_cardinality,
        jaccard_index,
        make_set_digest,
    )

    t = Tables(spark, sf_dir)
    ev = t.events
    val = "event_id % 599"
    dig_a = make_set_digest(ev.where(F.col("event_type") == "view"), [], val)
    dig_b = make_set_digest(ev.where(F.col("event_type") == "purchase"), [], val)
    j = jaccard_index(dig_a[0], dig_b[0])
    ca = cardinality(dig_a, [], "card_view")
    cb = cardinality(dig_b, [], "card_purchase")
    ic = intersection_cardinality(dig_a, dig_b)
    return (
        j.crossJoin(ca).crossJoin(cb).crossJoin(ic)
        .select("jaccard", "card_view", "card_purchase", "icard")
    )


def _qdigest_salted_oracle() -> str:
    """Replay the r6 PARTIAL->FINAL qdigest pipeline: the transpiler
    splits ``qdigest_agg(v) GROUP BY f`` into per-(f, salt) builds merged
    per f (plans/dialect.py::_rewrite_sketch_two_level, salt =
    floor(v) mod N — deterministic so this oracle can reproduce the exact
    value partition), then the query's own merge_qdigest folds flags to
    one global digest: three integer-rank selection levels."""
    from witdb_spark.operators.qdigest import K_POINTS, quantile_index
    from witdb_spark.plans.dialect import SKETCH_SALT_BUCKETS as NS

    kp = K_POINTS
    i25, i50, i75 = (quantile_index(q, kp) for q in (0.25, 0.5, 0.75))
    salt = f"CAST(floor(l_extendedprice) AS BIGINT) % {NS}"
    return _mat_ctes(f"""
    WITH ks AS (SELECT range AS k FROM range({kp})),
    r0 AS (
      SELECT l_returnflag AS f, {salt} AS s, l_extendedprice + 0.0e0 AS v,
             row_number() OVER (PARTITION BY l_returnflag, {salt}
                                ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag, {salt}) AS n
      FROM lineitem),
    d0 AS (SELECT f, s, k, v, n FROM r0 JOIN ks ON rn = (k * (n - 1)) // {kp - 1}),
    s1 AS (SELECT f, v, SUM(n) OVER (PARTITION BY f ORDER BY v, s, k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d0),
    t1 AS (SELECT f, SUM(n) AS wtot FROM d0 GROUP BY f),
    nf AS (SELECT f, COUNT(*) AS n FROM r0 GROUP BY f),
    m1 AS (SELECT t1.f, ks.k,
             (SELECT MIN(v) FROM s1 WHERE s1.f = t1.f
              AND s1.cum >= (ks.k * t1.wtot) // {kp - 1}) AS v
           FROM t1 CROSS JOIN ks),
    d1 AS (SELECT m1.f, m1.k, m1.v, nf.n FROM m1 JOIN nf ON m1.f = nf.f),
    s2 AS (SELECT v, SUM(n) OVER (ORDER BY v, f, k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d1),
    t2 AS (SELECT SUM(n) AS wtot FROM d1),
    merged AS (SELECT ks.k,
                 (SELECT MIN(v) FROM s2
                  WHERE cum >= (ks.k * (SELECT wtot FROM t2)) // {kp - 1}) AS mv
               FROM ks)
    SELECT (SELECT mv FROM merged WHERE k = {i25}) AS p25,
           (SELECT mv FROM merged WHERE k = {i50}) AS p50,
           (SELECT mv FROM merged WHERE k = {i75}) AS p75
    """)


@register(
    "agg_qdigest_sql_names",
    _qdigest_salted_oracle(),
    doc="The qdigest rollup written as plain SQL text through Engine.sql "
    "(functions/sql_sketch_aggs.py GROUPED_AGG pandas UDFs). r6: the "
    "transpiler plans the build PARTIAL->FINAL (reference "
    "AggregationNode.java:347 Step) — per-(flag, salt) constant-size "
    "partial digests, merged per flag, so no single Python task ever "
    "sees a whole group; the oracle replays the salted three-level "
    "pipeline exactly (deterministic floor(v)-mod salt).",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_qdigest_sql_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT value_at_quantile(d, 0.25) AS p25,
               value_at_quantile(d, 0.5)  AS p50,
               value_at_quantile(d, 0.75) AS p75
        FROM (
          SELECT merge_qdigest(d) AS d
          FROM (SELECT l_returnflag, qdigest_agg(l_extendedprice) AS d
                FROM lineitem GROUP BY l_returnflag) AS per_flag
        ) AS merged
        """
    )


@register(
    "agg_merge_generic",
    _qdigest_salted_oracle(),
    doc="Trino's type-overloaded merge(sketch) aggregate (reference "
    "MergeQuantileDigestFunction.java and siblings, all "
    "@AggregationFunction(\"merge\") dispatched on argument type). "
    "SQL text carries no types, so plans/dialect.py::"
    "_rewrite_generic_merge infers the sketch type from the producing "
    "build's alias in the same statement and resolves to the "
    "type-suffixed merge UDAF at transpile time — the same plan-time "
    "resolution the reference does. Identical pipeline to "
    "agg_qdigest_sql_names, so it shares that oracle.",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_merge_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT value_at_quantile(d, 0.25) AS p25,
               value_at_quantile(d, 0.5)  AS p50,
               value_at_quantile(d, 0.75) AS p75
        FROM (
          SELECT merge(d) AS d
          FROM (SELECT l_returnflag, qdigest_agg(l_extendedprice) AS d
                FROM lineitem GROUP BY l_returnflag) AS per_flag
        ) AS merged
        """
    )


def _qdigest_weighted_oracle() -> str:
    """Replay the weighted single-level build exactly: sort by value,
    cumulate the integer weights, pick the K grid points at
    (k * wtot) // (K - 1) (functions/sql_sketch_aggs.py
    qdigest_agg_w), then read value_at_quantile's index
    floor(q * (K - 1) + 0.5)."""
    import math

    from witdb_spark.operators.qdigest import K_POINTS as KP

    def k(q: float) -> int:
        return int(math.floor(q * (KP - 1) + 0.5))

    sel = ",\n           ".join(
        f"(SELECT MIN(v) FROM s WHERE s.flag = t.flag"
        f" AND cum >= ({k(q)} * t.wtot) // {KP - 1}) AS p{int(q * 100)}"
        for q in (0.25, 0.5, 0.75)
    )
    return _mat_ctes(f"""
    WITH r0 AS (
      SELECT l_returnflag AS flag, l_extendedprice + 0.0e0 AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
    s AS (SELECT flag, v, SUM(w) OVER (PARTITION BY flag ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM r0),
    t AS (SELECT flag, SUM(w) AS wtot FROM r0 GROUP BY flag)
    SELECT t.flag,
           {sel}
    FROM t
    """)


@register(
    "agg_qdigest_weighted",
    _qdigest_weighted_oracle(),
    doc="Weighted qdigest build — qdigest_agg(x, w) (reference "
    "QuantileDigestAggregationFunction.java's 2-arg overload; Spark "
    "UDAFs cannot overload by arity, so plans/dialect.py routes the "
    "spelling to the qdigest_agg_w UDAF). Weights are cumulative "
    "counts in the grid selection, so the DuckDB oracle replays the "
    "exact sorted-cumulative-weight point selection and the "
    "value_at_quantile index rule.",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_qdigest_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    # the builds nest inside value_at_quantile, which the two-level
    # recognizer deliberately bails on — a single weighted build per
    # group (three groups), the spelling a report writer uses
    return eng.sql(
        """
        SELECT l_returnflag AS flag,
               value_at_quantile(qdigest_agg(l_extendedprice, l_quantity),
                                 0.25) AS p25,
               value_at_quantile(qdigest_agg(l_extendedprice, l_quantity),
                                 0.5) AS p50,
               value_at_quantile(qdigest_agg(l_extendedprice, l_quantity),
                                 0.75) AS p75
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_returnflag
        """
    )


def _qdigest_distinct_oracle() -> str:
    """Replay the DISTINCT build: dedupe (flag, value), then the
    single-level rank-grid selection (the reader-wrapped spelling keeps
    the build single-level after the dedup fold) and the
    value_at_quantile index rule."""
    import math

    from witdb_spark.operators.qdigest import K_POINTS as KP

    def k(q: float) -> int:
        return int(math.floor(q * (KP - 1) + 0.5))

    sel = ",\n           ".join(
        f"(SELECT v FROM s WHERE s.flag = t.flag"
        f" AND rn = ({k(q)} * (t.n - 1)) // {KP - 1}) AS p{int(q * 100)}"
        for q in (0.25, 0.5, 0.75)
    )
    return f"""
    WITH r0 AS (
      SELECT DISTINCT l_returnflag AS flag, l_extendedprice + 0.0e0 AS v
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
    s AS (SELECT flag, v,
             row_number() OVER (PARTITION BY flag ORDER BY v) - 1 AS rn
          FROM r0),
    t AS (SELECT flag, COUNT(*) AS n FROM r0 GROUP BY flag)
    SELECT t.flag,
           {sel}
    FROM t
    """


@register(
    "agg_qdigest_distinct",
    _qdigest_distinct_oracle(),
    doc="DISTINCT sketch build — qdigest_agg(DISTINCT x) (reference "
    "AggregationNode mask/distinct planning lowers DISTINCT aggregates "
    "through MarkDistinct). Spark refuses DISTINCT on a Python UDAF "
    "outright, so plans/dialect.py::_rewrite_sketch_distinct "
    "deduplicates the argument in a subquery first — including inside "
    "reader-wrapped spellings like value_at_quantile(build, q) — and "
    "the oracle replays the dedupe + rank-grid selection exactly.",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_qdigest_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT l_returnflag AS flag,
               value_at_quantile(qdigest_agg(DISTINCT l_extendedprice),
                                 0.25) AS p25,
               value_at_quantile(qdigest_agg(DISTINCT l_extendedprice),
                                 0.5) AS p50,
               value_at_quantile(qdigest_agg(DISTINCT l_extendedprice),
                                 0.75) AS p75
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_returnflag
        """
    )


def _tdigest_weighted_oracle() -> str:
    """Replay the weighted single-level t-digest build exactly: sort by
    value, cumulate the (integer-valued) weights, pick the K cosine-grid
    points at threshold floor(q_k*(W-1)+0.5)+1 with endpoints pinned to
    min/max (functions/sql_sketch_aggs.py tdigest_agg_w), then replay
    the reader's grid-bracket interpolation with injected grid
    literals."""
    from witdb_spark.operators.tdigest import (
        K_CENTROIDS,
        grid_bracket,
        scale_grid,
    )

    grid = scale_grid(K_CENTROIDS)
    vals = ", ".join(f"({k}, {q!r})" for k, q in enumerate(grid))
    last = K_CENTROIDS - 1

    def interp(q: float, alias: str) -> str:
        lo, hi, w = grid_bracket(q)
        return (
            f"(SELECT v FROM pts WHERE pts.flag = t.flag AND k = {lo})"
            f" + {w!r} * "
            f"((SELECT v FROM pts WHERE pts.flag = t.flag AND k = {hi})"
            f" - (SELECT v FROM pts WHERE pts.flag = t.flag AND k = {lo}))"
            f" AS {alias}"
        )

    return f"""
    WITH grid(k, q) AS (VALUES {vals}),
    r0 AS (
      SELECT l_returnflag AS flag, l_extendedprice + 0.0e0 AS v,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'),
    s AS (SELECT flag, v, SUM(w) OVER (PARTITION BY flag ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM r0),
    t AS (SELECT flag, SUM(w) AS wtot FROM r0 GROUP BY flag),
    mm AS (SELECT flag, MIN(v) AS mn, MAX(v) AS mx FROM r0 GROUP BY flag),
    pts AS (SELECT t.flag, g.k,
              CASE WHEN g.k = 0
                     THEN (SELECT mn FROM mm WHERE mm.flag = t.flag)
                   WHEN g.k = {last}
                     THEN (SELECT mx FROM mm WHERE mm.flag = t.flag)
                   ELSE (SELECT MIN(v) FROM s WHERE s.flag = t.flag
                         AND cum >= floor(g.q * (CAST(t.wtot AS DOUBLE) - 1)
                                          + 0.5) + 1)
              END AS v
            FROM t CROSS JOIN grid g)
    SELECT t.flag,
           {interp(0.5, "p50")},
           {interp(0.9, "p90")},
           {interp(0.99, "p99")}
    FROM t
    """


@register(
    "agg_tdigest_weighted",
    _tdigest_weighted_oracle(),
    doc="Weighted t-digest build — tdigest_agg(x, w) (reference "
    "TDigestAggregationFunction.java's weightedInput overload; Spark "
    "UDAFs cannot overload by arity, so plans/dialect.py routes the "
    "spelling to the tdigest_agg_w UDAF). Points are selected by "
    "cumulative weight on the cosine grid with the same threshold "
    "rule merge_tdigest uses, so the DuckDB oracle replays the exact "
    "selection and the reader's grid-bracket interpolation.",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_tdigest_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    # the builds nest inside tdigest_value_at_quantile, which the
    # two-level recognizer deliberately bails on — a single weighted
    # build per group (three groups), the spelling a report writer uses
    return eng.sql(
        """
        SELECT l_returnflag AS flag,
               tdigest_value_at_quantile(
                 tdigest_agg(l_extendedprice, l_quantity), 0.5) AS p50,
               tdigest_value_at_quantile(
                 tdigest_agg(l_extendedprice, l_quantity), 0.9) AS p90,
               tdigest_value_at_quantile(
                 tdigest_agg(l_extendedprice, l_quantity), 0.99) AS p99
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_returnflag
        """
    )


def _tdigest_salted_oracle() -> str:
    """Replay the r6 PARTIAL->FINAL t-digest pipeline: per-(flag, salt)
    cosine-grid builds, weighted grid-re-selection merge per flag
    (plans/dialect.py::_rewrite_sketch_two_level), then the query's own
    merge_tdigest folds flags to one global digest. Grid/mid literals are
    injected from the same Python lists the UDFs close over."""
    from witdb_spark.operators.tdigest import (
        K_CENTROIDS,
        grid_bracket,
        rank_mids,
        scale_grid,
    )
    from witdb_spark.plans.dialect import SKETCH_SALT_BUCKETS as NS

    grid = scale_grid(K_CENTROIDS)
    mids = rank_mids(K_CENTROIDS)
    vals = ", ".join(
        f"({k}, {q!r}, {mids[k]!r}, {mids[k + 1]!r})" for k, q in enumerate(grid)
    )
    salt = f"CAST(floor(l_extendedprice) AS BIGINT) % {NS}"

    def interp(q: float, alias: str) -> str:
        lo, hi, w = grid_bracket(q)
        return (
            f"(SELECT mv FROM merged WHERE k = {lo}) + {w!r} * "
            f"((SELECT mv FROM merged WHERE k = {hi}) - "
            f"(SELECT mv FROM merged WHERE k = {lo})) AS {alias}"
        )

    last = K_CENTROIDS - 1
    return _mat_ctes(f"""
    WITH grid(k, q, mlo, mhi) AS (VALUES {vals}),
    r0 AS (
      SELECT l_returnflag AS f, {salt} AS s, l_extendedprice + 0.0e0 AS v,
             row_number() OVER (PARTITION BY l_returnflag, {salt}
                                ORDER BY l_extendedprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag, {salt}) AS n
      FROM r0src),
    d0 AS (
      SELECT f, s, g.k, v,
             CAST(floor(g.mhi * n + 0.5) AS BIGINT)
               - CAST(floor(g.mlo * n + 0.5) AS BIGINT) AS w
      FROM r0 JOIN grid g ON rn = CAST(floor(g.q * (n - 1) + 0.5) AS BIGINT)),
    s1 AS (SELECT f, v, SUM(w) OVER (PARTITION BY f ORDER BY v, s, k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d0),
    t1 AS (SELECT f, SUM(w) AS wtot FROM d0 GROUP BY f),
    nf AS (SELECT f, COUNT(*) AS n FROM r0 GROUP BY f),
    mm1 AS (SELECT f, MIN(v) AS mn, MAX(v) AS mx FROM d0 GROUP BY f),
    m1 AS (SELECT t1.f, g.k,
             CASE WHEN g.k = 0 THEN (SELECT mn FROM mm1 WHERE mm1.f = t1.f)
                  WHEN g.k = {last} THEN (SELECT mx FROM mm1 WHERE mm1.f = t1.f)
                  ELSE (SELECT MIN(v) FROM s1 WHERE s1.f = t1.f
                        AND cum >= floor(g.q * (CAST(t1.wtot AS DOUBLE) - 1) + 0.5) + 1)
             END AS v
           FROM t1 CROSS JOIN grid g),
    d1 AS (SELECT m1.f, m1.k, m1.v,
             CAST(floor(g2.mhi * nf.n + 0.5) AS BIGINT)
               - CAST(floor(g2.mlo * nf.n + 0.5) AS BIGINT) AS w
           FROM m1 JOIN nf ON m1.f = nf.f JOIN grid g2 ON g2.k = m1.k),
    s2 AS (SELECT v, SUM(w) OVER (ORDER BY v, f, k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d1),
    t2 AS (SELECT SUM(w) AS wtot FROM d1),
    merged AS (SELECT g.k,
                 CASE WHEN g.k = 0 THEN (SELECT MIN(v) FROM d1)
                      WHEN g.k = {last} THEN (SELECT MAX(v) FROM d1)
                      ELSE (SELECT MIN(v) FROM s2
                            WHERE cum >= floor(g.q * (CAST((SELECT wtot FROM t2) AS DOUBLE) - 1) + 0.5) + 1)
                 END AS mv
               FROM grid g)
    SELECT {interp(0.50, "p50")},
           {interp(0.95, "p95")},
           {interp(0.99, "p99")}
    """).replace("r0src", "lineitem")


@register(
    "agg_tdigest_sql_names",
    _tdigest_salted_oracle(),
    doc="The t-digest rollup written as plain SQL text through Engine.sql "
    "(functions/sql_sketch_aggs.py GROUPED_AGG pandas UDFs). r6: the "
    "transpiler plans the build PARTIAL->FINAL (reference "
    "AggregationNode.java:347 Step) — per-(flag, salt) constant-size "
    "cosine-grid partials, merged per flag by weighted grid "
    "re-selection, so no single Python task ever sees a whole group; "
    "the oracle replays the salted three-level pipeline exactly.",
    tags=("aggregate", "approx", "sketch", "dialect"),
)
def agg_tdigest_sql_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT tv[1] AS p50, tv[2] AS p95, tv[3] AS p99
        FROM (
          SELECT tdigest_values_at_quantiles(
                   merge_tdigest(d), ARRAY[0.50, 0.95, 0.99]) AS tv
          FROM (SELECT l_returnflag, tdigest_agg(l_extendedprice) AS d
                FROM lineitem GROUP BY l_returnflag) AS per_flag
        ) AS merged
        """
    )


@register(
    "agg_histogram_sql_names",
    """
    SELECT g, string_agg(event_type || '=' || CAST(n AS VARCHAR), ','
                         ORDER BY event_type) AS histo
    FROM (SELECT user_id % 5 AS g, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2) AS c
    GROUP BY g
    """,
    doc="histogram() as a plain SQL aggregate through Engine.sql (r5 "
    "transpile rewrite, reference Histogram.java): the value-counts map "
    "is built from ONE collect_list aggregate buffer with post-agg "
    "lambda projection (Catalyst extracts the repeated aggregate), then "
    "canonicalized to sorted key=value text so the driver can hash it. "
    "multimap_agg and map_union rewrite the same way "
    "(plans/dialect.py::_rewrite_agg_calls).",
    tags=("aggregate", "map", "dialect"),
)
def agg_histogram_sql_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.engine import Engine

    eng = Engine(spark, sf_dir=sf_dir)
    return eng.sql(
        """
        SELECT g, array_join(
                 transform(array_sort(map_keys(m)),
                           k -> k || '=' || CAST(element_at(m, k) AS VARCHAR)),
                 ',') AS histo
        FROM (SELECT user_id % 5 AS g, histogram(event_type) AS m
              FROM events GROUP BY user_id % 5) AS h
        """
    )
