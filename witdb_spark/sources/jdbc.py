"""JDBC connector surface (reference plugin/trino-base-jdbc —
BaseJdbcClient.java builds per-split SELECTs with pushed-down predicates;
JdbcSplitManager parallelizes over partitions). Spark's built-in jdbc
datasource implements the identical split model: each partition issues one
bounded SELECT, filters and required columns are pushed into the remote
query (predicate/projection pushdown is on by default, `pushDownAggregate`
extends it to min/max/count/sum/avg like the reference's
AggregationApplicationResult).

Scale notes:
  - A JDBC source is the one input whose parallelism Spark cannot infer:
    without partitioning options the whole table arrives through ONE
    connection on one task. `read_jdbc` therefore requires either
    `partition_column` + bounds (numeric/date/timestamp stride splits) or
    explicit `predicates` (one WHERE clause per split) for anything beyond
    lookup-table size, mirroring the reference's mandatory split scheme.
  - Writes batch rows per round-trip (`batchsize`, default 1000) over one
    connection per task — a large write should be repartitioned to the
    concurrency the remote database can absorb, not to cluster width.

The container ships only the embedded Derby driver (tests use
jdbc:derby:...); any other driver jar goes on spark.jars at session build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    push_down_aggregate: bool = True,
    **options,
) -> DataFrame:
    """Read a remote table (or `(SELECT ...) q` subquery) over JDBC.

    `table` may be a table name or a parenthesized pushdown subquery —
    exactly the reference's JdbcQueryRelationHandle. With
    `partition_column`, the source issues `num_partitions` stride-bounded
    SELECTs in parallel; with `predicates`, one SELECT per entry. The two
    are mutually exclusive (Spark's API constraint, same as the
    reference's split-scheme choice).
    """
    if predicates and partition_column:
        raise ValueError("pass either predicates or partition_column, not both")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("pushDownPredicate", "true")
        .option("pushDownAggregate", str(push_down_aggregate).lower())
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and"
                " num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    if predicates:
        # per-predicate splits go through the lower-level API
        props = {"pushDownPredicate": "true"}
        if driver:
            props["driver"] = driver
        props.update({k: str(v) for k, v in options.items()})
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
    batch_size: int = 1000,
    num_writers: int | None = None,
    **options,
) -> None:
    """Write a DataFrame to a remote table (reference JdbcPageSink.java
    batches inserts per split the same way). `num_writers` caps concurrent
    connections by repartitioning first."""
    if num_writers is not None:
        df = df.repartition(num_writers)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
