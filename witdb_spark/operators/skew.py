"""Skew-resistant aggregation: explicit two-stage salted groupBy.

The reference handles skewed aggregation keys with partial aggregation
before the exchange (reference PushPartialAggregationThroughExchange.java:60)
— which collapses heavy keys map-side and is what Spark's partial_* aggs do
automatically. That is sufficient for algebraic aggregates (sum/count/min/
max). Salting matters for the cases partial aggregation does NOT collapse:

  - collect_list / array_agg style holistic aggregates, where one hot key
    ships its entire group to a single reducer;
  - count_distinct on a hot key (partial agg keeps every distinct value).

`salted_agg` implements the standard two-stage plan: stage 1 groups by
(key, salt) — the hot key's rows spread over `buckets` reducers — stage 2
merges the per-salt partials by key. The caller supplies per-stage
aggregate builders because stage-2 must be the MERGE form of stage-1's
aggregate (sum→sum, count→sum, collect_set→flatten∘collect_set, ...).

AQE's skew handling (spark.sql.adaptive.skewJoin, on in session.py) covers
skewed JOINs at runtime; salting is the aggregation-side complement.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    stage1: Callable[[], Sequence[Column]],
    stage2: Callable[[], Sequence[Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then keys.

    stage1() builds partial aggregates (aliased); stage2() builds the merge
    aggregates over stage-1's output columns (aliased to the final names).
    The salt is derived from a deterministic per-row hash (no rand(): keeps
    retries/speculative tasks consistent — nondeterministic salts can
    double-count rows when a stage retries)."""
    all_cols = [c for c in df.columns]
    salt = (F.xxhash64(*[F.col(c) for c in all_cols]) % buckets).cast("int")
    staged = (
        df.withColumn(SALT, F.abs(salt))
        .groupBy(*keys, SALT)
        .agg(*stage1())
        .drop(SALT)
    )
    return staged.groupBy(*keys).agg(*stage2())


def salted_count_distinct(
    df: DataFrame, keys: Sequence[str], value: str, buckets: int = 16
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT value) BY keys: salt BY THE VALUE so each
    distinct value lands in exactly one bucket — per-bucket distinct counts
    are then additive (no double counting across buckets)."""
    salt = (F.abs(F.xxhash64(F.col(value))) % buckets).cast("int")
    per_bucket = (
        df.withColumn(SALT, salt)
        .groupBy(*keys, SALT)
        .agg(F.count_distinct(F.col(value)).alias("__pc"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("__pc").alias("n_distinct"))
