"""GROUPS window frames for Spark.

Trino supports ROWS / RANGE / GROUPS frames (reference
core/trino-parser/.../tree/WindowFrame.java:28-31, GroupsFraming.java in
operator/window/); Spark has only ROWS and RANGE. A GROUPS frame counts
*peer groups* (rows tying on the ORDER BY key) instead of rows or value
ranges.

Rewrite: dense_rank() numbers the peer groups consecutively, so
  GROUPS BETWEEN p PRECEDING AND f FOLLOWING   over ORDER BY k
is exactly
  RANGE BETWEEN p PRECEDING AND f FOLLOWING    over ORDER BY dense_rank(k).
Two window passes over the same partitioning — no extra shuffle: the second
window reuses the first's hash partitioning and sort (Catalyst plans one
Exchange + one Sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def groups_frame_sum(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    value: Column,
    preceding: int,
    following: int,
    alias: str,
) -> DataFrame:
    """SUM(value) OVER (PARTITION BY ... ORDER BY k
    GROUPS BETWEEN <preceding> PRECEDING AND <following> FOLLOWING)."""
    w_rank = Window.partitionBy(*partition_by).orderBy(order_by)
    ranked = df.withColumn("__grp", F.dense_rank().over(w_rank))
    w_groups = (
        Window.partitionBy(*partition_by)
        .orderBy("__grp")
        .rangeBetween(-preceding, following)
    )
    return ranked.withColumn(alias, F.sum(value).over(w_groups)).drop("__grp")
