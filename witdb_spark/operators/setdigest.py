"""SetDigest sketches: HLL + bottom-k MinHash (reference
core/trino-main/.../type/setdigest/SetDigest.java, SetDigestFunctions.java:
make_set_digest, merge_set_digest, cardinality, intersection_cardinality,
jaccard_index; SetDigestType as an exchangeable value).

The reference's SetDigest couples a HyperLogLog (for cardinality) with a
MinHash of the k smallest 64-bit hashes (for set overlap): jaccard_index
estimates J(A,B) from the bottom-k signatures and intersection_cardinality
is J × |A ∪ B|. That pairing is an LLM-dedup primitive — corpus-level
overlap between document sets in one merge pass, no rescan.

This module re-expresses both halves deterministically over md5 so DuckDB
can replay them (the same strategy as operators/hll.py, which supplies the
cardinality half unchanged):

  minhash part  := the K smallest DISTINCT md5(value) hex strings per group
  bottom-k est. := J(A,B) ≈ |B_k(A∪B) ∩ B_k(A) ∩ B_k(B)| / |B_k(A∪B)|
                   (the standard bottom-k sketch estimator; exact when
                   |A∪B| <= K, error O(1/sqrt(K)) otherwise)

Scale shape: the bottom-k build is a distinct + ranked-window filter —
Spark plans a WindowGroupLimit, so each map partition keeps only its local
top-K rows before the single shuffle on the group key (plan-gated in
tests/test_plans.py). Merges re-rank K-row sketches and never rescan raw
data. Everything is JVM-side (md5 + window), no Python in the path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from witdb_spark.operators.hll import hll_estimate, hll_merge, hll_registers

K_HASHES = 128


def minhash_bottom_k(
    df: DataFrame, keys: Sequence[str], value_expr: str, k: int = K_HASHES
) -> DataFrame:
    """(keys..., h) — the k smallest distinct md5 hashes per group. The
    ranked-window filter compiles to WindowGroupLimit: partial per-partition
    top-k before the shuffle, so the exchange carries O(k) rows per group."""
    keys = list(keys)
    h = F.md5(F.expr(value_expr).cast("string")).alias("h")
    hashes = df.where(F.expr(value_expr).isNotNull()).select(*keys, h).distinct()
    if not keys:
        # global sketch: sort+limit plans as TakeOrderedAndProject —
        # distributed partial top-k, no single-partition window
        return hashes.orderBy("h").limit(k)
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def make_set_digest(
    df: DataFrame, keys: Sequence[str], value_expr: str, k: int = K_HASHES
) -> tuple[DataFrame, DataFrame]:
    """make_set_digest(value) GROUP BY keys -> (minhash, hll) relation pair
    — the two halves of the reference's SetDigest value."""
    return (
        minhash_bottom_k(df, keys, value_expr, k),
        hll_registers(df, keys, value_expr),
    )


def merge_set_digests(
    digest: tuple[DataFrame, DataFrame], keys: Sequence[str], k: int = K_HASHES
) -> tuple[DataFrame, DataFrame]:
    """merge_set_digest under a coarser grouping: bottom-k of the unioned
    bottom-k sets (closed: B_k(A ∪ B) ⊆ B_k(A) ∪ B_k(B)), HLL register MAX.
    Touches only sketch rows."""
    mh, hll = digest
    keys = list(keys)
    dedup = mh.select(*keys, "h").distinct()
    if not keys:
        merged_mh = dedup.orderBy("h").limit(k)
    else:
        w = Window.partitionBy(*keys).orderBy("h")
        merged_mh = (
            dedup.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .drop("rk")
        )
    return merged_mh, hll_merge(hll, keys)


def cardinality(
    digest: tuple[DataFrame, DataFrame], keys: Sequence[str], alias: str = "card"
) -> DataFrame:
    """cardinality(setdigest) — the HLL half's estimate."""
    return hll_estimate(digest[1], list(keys), alias)


def jaccard_index(
    mh_a: DataFrame, mh_b: DataFrame, k: int = K_HASHES
) -> DataFrame:
    """jaccard_index(a, b) over two single-set minhash relations (column
    ``h`` each) -> one row (jaccard double). Bottom-k estimator: rank the
    union's hashes, keep the smallest k, count how many sit in both sets.
    All ratios are exact integer counts until one final double division."""
    union_k = (
        mh_a.select("h")
        .unionByName(mh_b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    in_both = (
        union_k.join(mh_a.select("h").distinct(), "h", "semi")
        .join(mh_b.select("h").distinct(), "h", "semi")
    )
    return union_k.agg(F.count(F.lit(1)).alias("nu")).crossJoin(
        in_both.agg(F.count(F.lit(1)).alias("nb"))
    ).select(
        (F.col("nb").cast("double") / F.col("nu").cast("double")).alias("jaccard")
    )


def intersection_cardinality(
    digest_a: tuple[DataFrame, DataFrame],
    digest_b: tuple[DataFrame, DataFrame],
    k: int = K_HASHES,
    alias: str = "icard",
) -> DataFrame:
    """intersection_cardinality(a, b) ≈ jaccard_index(a, b) ×
    cardinality(merge(a, b)) — the reference's estimator
    (SetDigestFunctions.java intersectionCardinality), one row out."""
    mh_a, hll_a = digest_a
    mh_b, hll_b = digest_b
    union_hll = hll_merge(
        hll_a.select("bucket", "r").unionByName(hll_b.select("bucket", "r")), []
    )
    union_card = hll_estimate(union_hll, [], "ucard")
    j = jaccard_index(mh_a, mh_b, k)
    return j.crossJoin(union_card).select(
        F.expr("cast(round(jaccard * ucard, 6) as double)").alias(alias)
    )


def hash_counts(
    df: DataFrame, keys: Sequence[str], value_expr: str, k: int = K_HASHES
) -> DataFrame:
    """hash_counts(setdigest) -> map(hash -> count) per group (reference
    SetDigestFunctions.java hashCounts: the digest's retained hash ->
    insertion-count map, counts saturating at smallint). Here the
    retained hashes are the bottom-k md5 sketch and counts are exact
    row multiplicities: one pre-aggregation per (keys, h) — map-side
    partial combine — then the same ranked-window bottom-k filter as
    minhash_bottom_k, then map_from_entries. Counts cap at 32767 to
    mirror the reference's smallint saturation."""
    keys = list(keys)
    h = F.md5(F.expr(value_expr).cast("string")).alias("h")
    counted = (
        df.where(F.expr(value_expr).isNotNull())
        .select(*keys, h)
        .groupBy(*keys, "h")
        .agg(F.least(F.count(F.lit(1)), F.lit(32767)).alias("cnt"))
    )
    if keys:
        w = Window.partitionBy(*keys).orderBy("h")
        kept = (
            counted.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .drop("rk")
        )
        return kept.groupBy(*keys).agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("h", "cnt")))
            ).alias("hash_counts")
        )
    kept = counted.orderBy("h").limit(k)
    return kept.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("h", "cnt")))
        ).alias("hash_counts")
    )
