"""T-digests as first-class binary values (reference
operator/aggregation/TDigestAggregationFunction.java:32,
scalar/TDigestFunctions.java: tdigest_agg, merge(tdigest),
value_at_quantile / values_at_quantiles).

The t-digest's defining idea (Dunning's merging digest) is a NON-uniform
centroid budget driven by the k1 scale function k(q) = δ/2π·asin(2q−1):
resolution concentrates at the tails, so p99/p999 stay sharp while the
middle compresses. The reference stores these digests as values, merges
them upward, and queries quantiles later — one merge pass at 100 TB
instead of a rescan (the same algebra as operators/qdigest.py, which keeps
a UNIFORM rank grid).

Dunning's algorithm is input-order dependent (centroid means shift with
insertion order), which can never hash-match an independent engine. This
module determinizes it the same way qdigest.py does — every centroid is an
exact input value selected by integer rank — but on the t-digest's
cosine-spaced quantile grid

  q_k = (1 − cos(π·k/(K−1))) / 2            k = 0..K−1

(the inverse of the k1 scale function at equal k-steps; tail spacing
O(1/K²) vs the uniform grid's O(1/K), with q_0 = 0 and q_{K−1} = 1 so
exact min/max are preserved, as the reference's digest guarantees).
The grid is computed ONCE in Python (math.cos) and injected as full-
precision literals into both the Spark UDFs and the DuckDB oracle SQL, so
both engines evaluate identical IEEE arithmetic — no libm divergence.

Build: one applyInPandas per group key (per-group sort, distributed); for
LOW-cardinality keys over big data use ``tdigest_agg_scalable`` — two-level
per-partition partials + merge, so no task ever sorts a whole group.
Merge: pooled weighted points re-selected on the same grid by cumulative
weight — ties in value make the selection invariant to pool order, so the
rollup is deterministic and associative-enough, error bounded in rank by
the grid spacing. Wire format is ours alone (SURVEY §7: self-compat only).

Scale shape: the digest is K floats per group; rollups merge K-point blobs
and never rescan raw data.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

K_CENTROIDS = 100


def scale_grid(k_centroids: int = K_CENTROIDS) -> list[float]:
    """Cosine-spaced quantile grid — the single source of truth shared by
    the pandas UDFs and the oracle-SQL generator (literal injection keeps
    both engines on the same doubles)."""
    n = k_centroids - 1
    return [(1.0 - math.cos(math.pi * k / n)) / 2.0 for k in range(k_centroids)]


def rank_mids(k_centroids: int = K_CENTROIDS) -> list[float]:
    """K+1 midpoint boundaries between grid quantiles (0 and 1 at the
    ends). Point k represents the rank mass n·(mid_{k+1} − mid_k); as
    integers, w_k = floor(mid_{k+1}·n + 0.5) − floor(mid_k·n + 0.5), which
    telescopes to exactly n. This non-uniform weighting is what makes the
    pooled merge honest: a tail point stands for far fewer ranks than a
    mid-distribution point (uniform weights would inflate the tails)."""
    g = scale_grid(k_centroids)
    return [0.0] + [(g[k - 1] + g[k]) / 2.0 for k in range(1, k_centroids)] + [1.0]


def grid_bracket(q: float, k_centroids: int = K_CENTROIDS) -> tuple[int, int, float]:
    """(k_lo, k_hi, w) so that value_at_quantile(q) = p[k_lo] + w·(p[k_hi]
    − p[k_lo]) — the reference digest interpolates between centroids
    (TDigestFunctions.java valueAtQuantile), and with q and the grid both
    known at plan time, w is a compile-time double literal: the same
    single fused expression evaluates identically in Spark and DuckDB."""
    g = scale_grid(k_centroids)
    if q <= g[0]:
        return 0, 0, 0.0
    if q >= g[-1]:
        return k_centroids - 1, k_centroids - 1, 0.0
    for k in range(k_centroids - 1):
        if g[k] <= q <= g[k + 1]:
            if q == g[k]:
                return k, k, 0.0
            return k, k + 1, (q - g[k]) / (g[k + 1] - g[k])
    raise AssertionError("unreachable: grid spans [0, 1]")


def _digest_schema(df: DataFrame, keys: Sequence[str]) -> StructType:
    return StructType(
        [df.schema[k] for k in keys] + [StructField("tdigest", BinaryType())]
    )


def tdigest_agg(
    df: DataFrame, keys: Sequence[str], value_col: str, k_centroids: int = K_CENTROIDS
) -> DataFrame:
    """tdigest_agg(value) GROUP BY keys -> (keys..., tdigest binary).

    blob = [n, p_0..p_{K-1}] float64; p_k = sorted_vals[floor(q_k·(n−1)+0.5)]
    — nearest-rank selection on the cosine grid, every point an exact input
    value.

    r13 hot-group bound (same as qdigest_agg): rows reduce to (value,
    count) pairs in a JVM hash aggregation first; the per-group pandas
    task holds distinct values only, and the weighted rank selection
    is byte-equal to the raw-row build (property-tested)."""
    keys = list(keys)
    kp = k_centroids
    grid = scale_grid(kp)
    pooled = df.groupBy(
        *keys, F.col(value_col).cast("double").alias("__td_v")
    ).agg(F.count(F.lit(1)).alias("__td_c"))

    def build(pdf):
        import numpy as _np
        import pandas as _pd

        vals = pdf["__td_v"].to_numpy(dtype="float64")
        cnts = pdf["__td_c"].to_numpy(dtype="int64")
        live = ~_np.isnan(vals)
        # + 0.0 maps -0.0 to +0.0: equal for sorting but not for the
        # bit-level blob/oracle hash — normalize at ingestion
        vals, cnts = vals[live] + 0.0, cnts[live]
        order = _np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = _np.cumsum(cnts)
        n = int(cum[-1]) if len(cum) else 0
        if n:
            idx = _np.floor(_np.asarray(grid) * (n - 1) + 0.5).astype("int64")
            pts = vals[_np.searchsorted(cum, idx, side="right")]
        else:
            pts = _np.full(kp, _np.nan)
        blob = _np.concatenate(([float(n)], pts)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["tdigest"] = [blob]
        return _pd.DataFrame(out)

    return pooled.groupBy(*keys).applyInPandas(
        build, schema=_digest_schema(pooled, keys)
    )


def merge_tdigests(
    digests: DataFrame, keys: Sequence[str], k_centroids: int = K_CENTROIDS
) -> DataFrame:
    """merge(tdigest) GROUP BY keys — pool points with their rank-mass
    integer weights (rank_mids × the digest's n), re-select the cosine
    grid by cumulative weight. Selection = value at the first v-sorted
    index whose cum reaches the grid threshold, which is invariant to the
    ordering of value ties, so the result is deterministic."""
    keys = list(keys)
    kp = k_centroids
    grid = scale_grid(kp)
    mids = rank_mids(kp)

    def merge(pdf):
        import numpy as _np
        import pandas as _pd

        marr = _np.asarray(mids)
        total = 0
        pools, weights = [], []
        for blob in pdf["tdigest"]:
            arr = _np.frombuffer(bytes(blob), dtype="float64")
            n, pts = int(arr[0]), arr[1:]
            if n <= 0:
                continue
            total += n
            bounds = _np.floor(marr * n + 0.5).astype("int64")
            pools.append(pts)
            weights.append(bounds[1:] - bounds[:-1])
        if not pools:
            merged = _np.full(kp, _np.nan)
        else:
            allpts = _np.concatenate(pools) + 0.0  # -0.0 -> +0.0
            allw = _np.concatenate(weights)
            order = _np.argsort(allpts, kind="stable")
            allpts, allw = allpts[order], allw[order]
            cum = _np.cumsum(allw)
            w_tot = float(cum[-1])
            # weighted grid rank g_k = floor(q_k·(W−1)+0.5)+1; select the
            # first pooled point whose cumulative weight reaches g_k
            g = _np.floor(_np.asarray(grid) * (w_tot - 1) + 0.5) + 1
            merged = allpts[
                _np.searchsorted(cum, g, side="left").clip(0, len(allpts) - 1)
            ]
            # endpoints are exact (the reference digest preserves min/max
            # through merges; rank thresholds can skip zero-weight extremes)
            merged[0] = allpts[0]
            merged[-1] = allpts[-1]
        blob = _np.concatenate(([float(total)], merged)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["tdigest"] = [blob]
        return _pd.DataFrame(out)

    return digests.groupBy(*keys).applyInPandas(
        merge, schema=_digest_schema(digests, keys)
    )


def values_at_quantiles(
    digest_col: str, quantiles: Sequence[float], k_centroids: int = K_CENTROIDS
) -> F.Column:
    """values_at_quantiles(tdigest, ARRAY[...]) -> array<double>: linear
    interpolation between the bracketing grid slots, with plan-time
    weights (grid_bracket) so the arithmetic replays identically in the
    oracle."""
    brackets = [grid_bracket(float(q), k_centroids) for q in quantiles]

    @F.pandas_udf(ArrayType(DoubleType()))
    def _vals(blobs):
        import numpy as _np
        import pandas as _pd

        out = []
        for blob in blobs:
            if blob is None:
                out.append(None)
                continue
            pts = _np.frombuffer(bytes(blob), dtype="float64")[1:]
            out.append(
                [
                    float(pts[lo] + w * (pts[hi] - pts[lo]))
                    for lo, hi, w in brackets
                ]
            )
        return _pd.Series(out)

    return _vals(F.col(digest_col))


def value_at_quantile(
    digest_col: str, quantile: float, k_centroids: int = K_CENTROIDS
) -> F.Column:
    """value_at_quantile(tdigest, q) -> double (reference
    TDigestFunctions.java valueAtQuantile)."""
    return values_at_quantiles(digest_col, [quantile], k_centroids)[0]


def tdigest_agg_scalable(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k_centroids: int = K_CENTROIDS,
) -> DataFrame:
    """Two-level build for low-cardinality group keys: per-(key, input
    partition) partial digests first, then a digest merge per key. The
    direct ``tdigest_agg`` shuffles EVERY row to as many tasks as there
    are groups — with 3 return flags over 100 TB that is 3 tasks sorting
    ~33 TB each. This path keeps the heavy sort partition-local (each
    task digests only its own split) and shuffles K-point blobs, at the
    cost of merge-grade (rank-bounded, tested in
    test_tdigest_merge_matches_direct_build) rather than build-grade
    accuracy — which is why the deterministic oracle query keeps the
    direct form while 100 TB callers should use this one.
    """
    partials = tdigest_agg(
        df.withColumn("_pid", F.spark_partition_id()),
        [*keys, "_pid"],
        value_col,
        k_centroids,
    ).drop("_pid")
    return merge_tdigests(partials, list(keys), k_centroids)
