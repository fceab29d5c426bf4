"""Polymorphic table functions (reference SPI
core/trino-spi/.../ptf/ConnectorTableFunction.java; built-ins registered in
trino-main: `sequence` (SequenceFunction) and `exclude_columns`
(ExcludeColumnsFunction), invoked as TABLE(sequence(...)) — SURVEY.md §2.8).

Spark-first: `sequence` IS spark.range (a parallel, partitioned source —
no driver-side materialization at any size); `exclude_columns` is a
projection, so Catalyst's column pruning reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sequence_table(
    spark: SparkSession, start: int, stop: int, step: int = 1
) -> DataFrame:
    """TABLE(sequence(start => s, stop => e, step => d)) — inclusive stop,
    like the reference. Backed by spark.range (exclusive end, hence +/-1)."""
    if step == 0:
        raise ValueError("step must not be 0")
    end = stop + (1 if step > 0 else -1)
    return spark.range(start, end, step).select(
        F.col("id").alias("sequential_number")
    )


def exclude_columns(df: DataFrame, *columns: str) -> DataFrame:
    """TABLE(exclude_columns(input => TABLE(t), columns => DESCRIPTOR(...)))."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing}")
    return df.drop(*columns)
