"""Quantile digests as first-class binary values (reference
QuantileDigestAggregationFunction.java:40, TDigestAggregationFunction.java:32
and the scalar surface QuantileDigestFunctions.java: qdigest_agg,
merge(qdigest), value_at_quantile / values_at_quantiles).

Spark's approx_percentile answers quantile queries but never exposes the
digest itself; the reference's model — build digests per group, store/ship
them, MERGE them upward, query quantiles later — is what makes percentile
rollups one cheap merge pass at 100 TB. This module implements that model
with a deterministic equi-spaced quantile summary:

  digest := serialize(count n, K quantile points of the group's values)

Build is an applyInPandas per group (sort is per-group, distributed by the
group key); merge re-aggregates digests as a weighted mixture of their
quantile functions and recompresses to K points — associative enough for
rollups, deterministic (no RNG), error bounded by ~1/(2K) in rank. Wire
format is ours alone (SURVEY §7: only self-compat is needed — digests are
never exchanged with the reference engine).
"""

from __future__ import annotations

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


def qdigest_agg(
    df: DataFrame, keys: Sequence[str], value_col: str, k_points: int = K_POINTS
) -> DataFrame:
    """qdigest_agg(value) GROUP BY keys -> (keys..., qdigest binary)."""
    keys = list(keys)
    vcol = value_col
    kp = k_points

    def build(pdf):
        import numpy as _np
        import pandas as _pd

        vals = pdf[vcol].to_numpy(dtype="float64")
        vals = vals[~_np.isnan(vals)]
        pts = _np.quantile(vals, _np.linspace(0.0, 1.0, kp)) if len(vals) else _np.full(kp, _np.nan)
        blob = _np.concatenate(([float(len(vals))], pts)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["qdigest"] = [blob]
        return _pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(build, schema=_digest_schema(df, keys))


def merge_qdigests(
    digests: DataFrame, keys: Sequence[str], k_points: int = K_POINTS
) -> DataFrame:
    """merge(qdigest) GROUP BY keys — weighted mixture of the input
    digests' quantile functions, recompressed to k_points. Empty-group and
    single-digest merges are exact pass-throughs."""
    keys = list(keys)
    kp = k_points

    def merge(pdf):
        import numpy as _np
        import pandas as _pd

        total, pools, weights = 0.0, [], []
        for blob in pdf["qdigest"]:
            arr = _np.frombuffer(bytes(blob), dtype="float64")
            n, pts = arr[0], arr[1:]
            if n <= 0:
                continue
            total += n
            pools.append(pts)
            weights.append(_np.full(len(pts), n / len(pts)))
        if not pools:
            merged = _np.full(kp, _np.nan)
        else:
            allpts = _np.concatenate(pools)
            allw = _np.concatenate(weights)
            order = _np.argsort(allpts, kind="stable")
            allpts, allw = allpts[order], allw[order]
            cum = _np.cumsum(allw)
            # weighted quantiles at the equi-spaced grid
            grid = _np.linspace(0.0, 1.0, kp) * cum[-1]
            merged = allpts[_np.searchsorted(cum, grid, side="left").clip(0, len(allpts) - 1)]
        blob = _np.concatenate(([total], merged)).tobytes()
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["qdigest"] = [blob]
        return _pd.DataFrame(out)

    return digests.groupBy(*keys).applyInPandas(
        merge, schema=_digest_schema(digests, keys)
    )


def values_at_quantiles(digest_col: str, quantiles: Sequence[float]) -> F.Column:
    """Scalar surface: values_at_quantiles(qdigest, ARRAY[...]) -> array<double>."""
    qs = [float(q) for q in quantiles]

    @F.pandas_udf(ArrayType(DoubleType()))
    def _vals(blobs):
        import numpy as _np
        import pandas as _pd

        out = []
        for blob in blobs:
            if blob is None:
                out.append(None)
                continue
            arr = _np.frombuffer(bytes(blob), dtype="float64")
            pts = arr[1:]
            grid = _np.linspace(0.0, 1.0, len(pts))
            out.append([float(_np.interp(q, grid, pts)) for q in qs])
        return _pd.Series(out)

    return _vals(F.col(digest_col))
