"""Quantile digests as first-class binary values (reference
QuantileDigestAggregationFunction.java:40, TDigestAggregationFunction.java:32
and the scalar surface QuantileDigestFunctions.java: qdigest_agg,
merge(qdigest), value_at_quantile / values_at_quantiles).

Spark's approx_percentile answers quantile queries but never exposes the
digest itself; the reference's model — build digests per group, store/ship
them, MERGE them upward, query quantiles later — is what makes percentile
rollups one cheap merge pass at 100 TB instead of a rescan. This module
implements that model with a deterministic equi-RANK summary:

  digest := serialize(count n, K points; point[k] = sorted_values[(k*(n-1)) // (K-1)])

Every arithmetic step is integer rank selection — no float interpolation —
so every point in a digest (and in any merge of digests) is an exact input
value, and the identical pipeline is expressible in DuckDB SQL for the
driver's hash gate (see queries/aggregates.py:agg_qdigest_rollup's oracle).

Build is an applyInPandas per group (sort is per-group, distributed by the
group key); merge re-aggregates digests as a weight-n pooled rank selection
recompressed to K points — associative enough for rollups, deterministic
(no RNG, no float ties: equal pooled values yield the same selected value
regardless of pool order), error bounded by ~1/(2(K-1)) in rank. Wire
format is ours alone (SURVEY §7: only self-compat is needed — digests are
never exchanged with the reference engine).
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

K_POINTS = 128


def _digest_schema(df: DataFrame, keys: Sequence[str]) -> StructType:
    return StructType(
        [df.schema[k] for k in keys] + [StructField("qdigest", BinaryType())]
    )


def quantile_index(q: float, k_points: int = K_POINTS) -> int:
    """Nearest digest-point index for quantile q — shared by the pandas UDF
    and oracle-SQL generation so both compute the identical lookup."""
    return int(math.floor(q * (k_points - 1) + 0.5))


def qdigest_agg(
    df: DataFrame, keys: Sequence[str], value_col: str, k_points: int = K_POINTS
) -> DataFrame:
    """qdigest_agg(value) GROUP BY keys -> (keys..., qdigest binary).

    r13 hot-group bound: the rows are first reduced to (value, count)
    run-length pairs by a JVM hash aggregation on (keys..., value) —
    map-side combine bounds the shuffle, and the per-group pandas task
    then holds the group's DISTINCT values, not its raw rows, so a
    pathological hot group can no longer materialize as one giant
    frame. The weighted integer-rank selection is byte-equal to the
    raw-row build (sorted_vals[j] == distinct[searchsorted(cum, j,
    'right')]); property-tested in test_approx.py."""
    keys = list(keys)
    kp = k_points
    # keep NULL/NaN value groups through the pre-agg (Spark normalizes
    # NaN and -0.0 in grouping keys, matching the raw build's +0.0
    # map) so all-NaN groups still emit their n=0 digest
    pooled = df.groupBy(
        *keys, F.col(value_col).cast("double").alias("__qd_v")
    ).agg(F.count(F.lit(1)).alias("__qd_c"))

    def build(pdf):
        import numpy as _np
        import pandas as _pd

        vals = pdf["__qd_v"].to_numpy(dtype="float64")
        cnts = pdf["__qd_c"].to_numpy(dtype="int64")
        live = ~_np.isnan(vals)
        vals, cnts = vals[live] + 0.0, cnts[live]
        order = _np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = _np.cumsum(cnts)
        n = int(cum[-1]) if len(cum) else 0
        if n:
            # integer rank selection: exact, no float interpolation
            idx = (_np.arange(kp, dtype="int64") * (n - 1)) // (kp - 1)
            pts = vals[_np.searchsorted(cum, idx, side="right")]
        else:
            pts = _np.full(kp, _np.nan)
        blob = _np.concatenate(([float(n)], pts)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["qdigest"] = [blob]
        return _pd.DataFrame(out)

    return pooled.groupBy(*keys).applyInPandas(
        build, schema=_digest_schema(pooled, keys)
    )


def merge_qdigests(
    digests: DataFrame, keys: Sequence[str], k_points: int = K_POINTS
) -> DataFrame:
    """merge(qdigest) GROUP BY keys — pool the input digests' points with
    integer weight n each, re-select k_points by integer rank. Equal pooled
    values make the selection invariant to pool order (the cum boundary of a
    tie block is order-independent), so the result is deterministic even
    though the incoming group order is not."""
    keys = list(keys)
    kp = k_points

    def merge(pdf):
        import numpy as _np
        import pandas as _pd

        total = 0
        pools, weights = [], []
        for blob in pdf["qdigest"]:
            arr = _np.frombuffer(bytes(blob), dtype="float64")
            n, pts = int(arr[0]), arr[1:]
            if n <= 0:
                continue
            total += n
            pools.append(pts)
            weights.append(_np.full(len(pts), n, dtype="int64"))
        if not pools:
            merged = _np.full(kp, _np.nan)
        else:
            allpts = _np.concatenate(pools) + 0.0  # -0.0 -> +0.0
            allw = _np.concatenate(weights)
            order = _np.argsort(allpts, kind="stable")
            allpts, allw = allpts[order], allw[order]
            cum = _np.cumsum(allw)
            w_tot = int(cum[-1])
            # integer rank grid: g_k = (k * W) // (K-1); select first
            # pooled point whose cumulative weight reaches g_k
            grid = (_np.arange(kp, dtype="int64") * w_tot) // (kp - 1)
            merged = allpts[
                _np.searchsorted(cum, grid, side="left").clip(0, len(allpts) - 1)
            ]
        blob = _np.concatenate(([float(total)], merged)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["qdigest"] = [blob]
        return _pd.DataFrame(out)

    return digests.groupBy(*keys).applyInPandas(
        merge, schema=_digest_schema(digests, keys)
    )


def values_at_quantiles(digest_col: str, quantiles: Sequence[float]) -> F.Column:
    """Scalar surface: values_at_quantiles(qdigest, ARRAY[...]) -> array<double>.
    Nearest-rank point lookup (quantile_index) — returns exact digest points,
    never interpolated values."""
    qs = [float(q) for q in quantiles]

    @F.pandas_udf(ArrayType(DoubleType()))
    def _vals(blobs):
        import math as _math

        import numpy as _np
        import pandas as _pd

        out = []
        for blob in blobs:
            if blob is None:
                out.append(None)
                continue
            arr = _np.frombuffer(bytes(blob), dtype="float64")
            pts = arr[1:]
            out.append(
                [
                    float(pts[int(_math.floor(q * (len(pts) - 1) + 0.5))])
                    for q in qs
                ]
            )
        return _pd.Series(out)

    return _vals(F.col(digest_col))


def qdigest_agg_scalable(
    df: DataFrame, keys: Sequence[str], value_col: str, k_points: int = K_POINTS
) -> DataFrame:
    """Two-level build (per-partition partials -> merge per key): the
    100 TB-shape twin of ``qdigest_agg``, which funnels every row of a
    group into one task. Same trade as tdigest_agg_scalable: merge-grade
    rank error (~1/(2(K-1)) per level) instead of build-grade, partition-
    local sorts, and only K-point blobs on the wire."""
    from pyspark.sql import functions as F

    partials = qdigest_agg(
        df.withColumn("_pid", F.spark_partition_id()),
        [*keys, "_pid"],
        value_col,
        k_points,
    ).drop("_pid")
    return merge_qdigests(partials, list(keys), k_points)


def register_digest_udfs(spark) -> int:
    """SQL-name surface (reference QuantileDigestFunctions.java
    value_at_quantile / values_at_quantiles): runtime-quantile lookups
    over the qdigest wire format ([n, K points] float64 — the uniform
    rank grid, so index = floor(q*(K-1)+0.5)). The tdigest family keeps
    its plan-time interpolating Python API (operators/tdigest.py) — the
    two wire formats share a layout but not a grid, and SQL name
    resolution cannot see the difference."""
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf("double")
    def _value_at_quantile(blobs, qs):
        import math as _math

        import numpy as _np
        import pandas as _pd

        out = []
        for blob, q in zip(blobs, qs):
            if blob is None or q is None:
                out.append(None)
                continue
            q = float(q)  # SQL DECIMAL literals arrive as Decimal
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"value_at_quantile: q must be in [0, 1], got {q}")
            pts = _np.frombuffer(bytes(blob), dtype="float64")[1:]
            out.append(float(pts[int(_math.floor(q * (len(pts) - 1) + 0.5))]))
        return _pd.Series(out)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _values_at_quantiles(blobs, qlists):
        import math as _math

        import numpy as _np
        import pandas as _pd

        out = []
        for blob, qs in zip(blobs, qlists):
            if blob is None or qs is None:
                out.append(None)
                continue
            qs = [float(q) for q in qs]
            if any(not 0.0 <= q <= 1.0 for q in qs):
                raise ValueError(
                    f"values_at_quantiles: every q must be in [0, 1], got {list(qs)}"
                )
            pts = _np.frombuffer(bytes(blob), dtype="float64")[1:]
            out.append(
                [
                    float(pts[int(_math.floor(q * (len(pts) - 1) + 0.5))])
                    for q in qs
                ]
            )
        return _pd.Series(out)

    spark.udf.register("value_at_quantile", _value_at_quantile)
    spark.udf.register("values_at_quantiles", _values_at_quantiles)
    return 2
