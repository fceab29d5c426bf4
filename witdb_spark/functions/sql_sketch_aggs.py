"""SQL-name SKETCH AGGREGATES via grouped-agg pandas UDFs (r5).

The r1-r4 recorded limitation said PySpark cannot register Python
AGGREGATE functions under SQL names — that is true of row-at-a-time
UDFs, but GROUPED_AGG pandas UDFs *are* SQL-registrable and usable in
GROUP BY queries. This lifts the reference's sketch-aggregate SQL
surface (reference ApproximateSetAggregation.java,
QuantileDigestAggregationFunction.java, HyperLogLogFunctions.java):

  - qdigest_agg(v) -> binary           (same wire format as
    operators/qdigest.py: [n, K rank-grid points] float64, so the
    registered value_at_quantile / values_at_quantiles scalars read it)
  - merge_qdigest(digest) -> binary    (pooled integer-rank re-selection
    — the reference's `merge(qdigest)`; the name is type-suffixed because
    SQL name resolution here cannot overload `merge` by sketch type)
  - approx_set(x) -> binary            (md5-register HLL, 2048 buckets —
    reference default 11-bit indexing; md5 because the Python tier must
    hash identically on driver and executors with no external libs)
  - merge_hll(hll) -> binary           (register-wise max)
  - hll_cardinality(hll) -> bigint     (bias-corrected estimate with
    linear counting for the small range — the reference's
    cardinality(HyperLogLog) overload, type-suffixed for the same reason)

Scale note: a grouped-agg pandas UDF has NO map-side partial — every
group's rows shuffle to one task. That is the right trade for the SQL
convenience surface; the scalable two-level builds remain the operator
APIs (operators/qdigest.py qdigest_agg_scalable et al), exactly like the
reference splits its accumulator into partial/final forms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from witdb_spark.operators.qdigest import K_POINTS

_HLL_BUCKETS = 2048  # 11 indexing bits (reference NewHyperLogLog default)


def _hll_update(registers, values) -> None:
    import hashlib

    for s in values:
        if s is None:
            continue
        h = int.from_bytes(
            hashlib.md5(str(s).encode()).digest()[:12], "big"
        )
        bucket = h & (_HLL_BUCKETS - 1)
        rest = h >> 11
        # rho = leading-zero run length in an 85-bit field + 1
        rho = 85 - rest.bit_length() + 1 if rest else 85
        if rho > registers[bucket]:
            registers[bucket] = rho


def _hll_estimate(registers) -> int:
    m = float(_HLL_BUCKETS)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -r for r in registers)
    est = alpha * m * m / s
    zeros = sum(1 for r in registers if r == 0)
    if est <= 2.5 * m and zeros:
        import math

        est = m * math.log(m / zeros)  # linear counting, small range
    return int(round(est))


def register_sketch_aggs(spark: SparkSession) -> int:
    import numpy as np

    @F.pandas_udf("binary")
    def qdigest_agg(v: pd.Series) -> bytes:
        vals = v.to_numpy(dtype="float64")
        vals = np.sort(vals[~np.isnan(vals)]) + 0.0  # -0.0 -> +0.0
        n = len(vals)
        if n:
            idx = (np.arange(K_POINTS, dtype="int64") * (n - 1)) // (
                K_POINTS - 1
            )
            pts = vals[idx]
        else:
            pts = np.full(K_POINTS, np.nan)
        return np.concatenate(([float(n)], pts)).tobytes()

    @F.pandas_udf("binary")
    def qdigest_agg_w(v: pd.Series, w: pd.Series) -> bytes:
        """Weighted build — reference QuantileDigestAggregationFunction
        qdigest_agg(x, w): slot 0 carries TOTAL WEIGHT (the same role
        the row count plays in the unweighted blob, so merge_qdigest
        combines both kinds), and the K grid points are selected by
        cumulative weight instead of row rank. NULL pairs are skipped;
        nonpositive weights raise (Trino rejects them)."""
        vals = v.to_numpy(dtype="float64")
        ws = w.to_numpy(dtype="float64")
        mask = ~(np.isnan(vals) | np.isnan(ws))
        vals, ws = vals[mask] + 0.0, ws[mask]
        if len(ws) and (ws <= 0).any():
            raise ValueError("qdigest_agg: weight must be > 0")
        if len(ws) and (ws != np.floor(ws)).any():
            # Trino binds the weight parameter as bigint — a fractional
            # weight is a type error there, so reject rather than truncate
            raise ValueError("qdigest_agg: weight must be an integer")
        ws = ws.astype("int64")
        order = np.argsort(vals, kind="stable")
        vals, ws = vals[order], ws[order]
        if len(vals):
            cum = np.cumsum(ws)
            wtot = int(cum[-1])
            grid = (np.arange(K_POINTS, dtype="int64") * wtot) // (
                K_POINTS - 1
            )
            pts = vals[
                np.searchsorted(cum, grid, side="left").clip(
                    0, len(vals) - 1
                )
            ]
        else:
            wtot = 0
            pts = np.full(K_POINTS, np.nan)
        return np.concatenate(([float(wtot)], pts)).tobytes()

    @F.pandas_udf("binary")
    def merge_qdigest(blobs: pd.Series) -> bytes:
        total = 0
        pools, weights = [], []
        for blob in blobs:
            if blob is None:
                continue
            arr = np.frombuffer(bytes(blob), dtype="float64")
            n, pts = int(arr[0]), arr[1:]
            if n <= 0:
                continue
            total += n
            pools.append(pts)
            weights.append(np.full(len(pts), n, dtype="int64"))
        if not pools:
            merged = np.full(K_POINTS, np.nan)
        else:
            allpts = np.concatenate(pools) + 0.0
            allw = np.concatenate(weights)
            order = np.argsort(allpts, kind="stable")
            allpts, allw = allpts[order], allw[order]
            cum = np.cumsum(allw)
            w_tot = int(cum[-1])
            grid = (np.arange(K_POINTS, dtype="int64") * w_tot) // (
                K_POINTS - 1
            )
            merged = allpts[
                np.searchsorted(cum, grid, side="left").clip(
                    0, len(allpts) - 1
                )
            ]
        return np.concatenate(([float(total)], merged)).tobytes()

    @F.pandas_udf("binary")
    def approx_set(v: pd.Series) -> bytes:
        registers = bytearray(_HLL_BUCKETS)
        _hll_update(registers, v)
        return bytes(registers)

    @F.pandas_udf("binary")
    def merge_hll(blobs: pd.Series) -> bytes:
        acc = bytearray(_HLL_BUCKETS)
        for blob in blobs:
            if blob is None:
                continue
            b = bytes(blob)
            for i in range(_HLL_BUCKETS):
                if b[i] > acc[i]:
                    acc[i] = b[i]
        return bytes(acc)

    @F.pandas_udf("long")
    def hll_cardinality(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else _hll_estimate(bytes(b))
                for b in blobs
            ]
        )

    spark.udf.register("qdigest_agg", qdigest_agg)
    spark.udf.register("qdigest_agg_w", qdigest_agg_w)
    spark.udf.register("merge_qdigest", merge_qdigest)
    spark.udf.register("approx_set", approx_set)
    spark.udf.register("merge_hll", merge_hll)
    spark.udf.register("hll_cardinality", hll_cardinality)
    return 6


def register_tdigest_aggs(spark: SparkSession) -> int:
    """tdigest SQL names (reference TDigestAggregationFunction.java):
    tdigest_agg / merge_tdigest as GROUPED_AGG pandas UDFs emitting the
    operator wire format ([n, K cosine-grid points] float64 —
    operators/tdigest.py), plus the tdigest_value_at_quantile /
    tdigest_values_at_quantiles scalar readers (type-suffixed: the
    qdigest scalars own the unsuffixed names and the two wire formats
    share a layout but not a grid)."""
    import math

    import numpy as np
    from pyspark.sql.types import ArrayType, DoubleType

    from witdb_spark.operators.tdigest import (
        K_CENTROIDS,
        rank_mids,
        scale_grid,
    )

    grid = np.asarray(scale_grid(K_CENTROIDS))
    mids = np.asarray(rank_mids(K_CENTROIDS))
    grid_list = list(scale_grid(K_CENTROIDS))  # plain values: the UDF
    # closures below must capture NO witdb_spark module references —
    # cloudpickle serializes module functions by reference, and the
    # driver's executors do not have the package on PYTHONPATH

    def _bracket(q: float):
        # local twin of operators/tdigest.grid_bracket over grid_list —
        # always the fixed K_CENTROIDS grid (blob layout is validated by
        # the caller), so k derives from the grid, never from the blob
        g = grid_list
        k = len(g)
        if q <= g[0]:
            return 0, 0, 0.0
        if q >= g[-1]:
            return k - 1, k - 1, 0.0
        for i in range(k - 1):
            if g[i] <= q <= g[i + 1]:
                if q == g[i]:
                    return i, i, 0.0
                return i, i + 1, (q - g[i]) / (g[i + 1] - g[i])
        raise AssertionError("unreachable: grid spans [0, 1]")

    @F.pandas_udf("binary")
    def tdigest_agg(v: pd.Series) -> bytes:
        vals = v.to_numpy(dtype="float64")
        vals = np.sort(vals[~np.isnan(vals)]) + 0.0
        n = len(vals)
        if n:
            idx = np.floor(grid * (n - 1) + 0.5).astype("int64")
            pts = vals[idx]
        else:
            pts = np.full(K_CENTROIDS, np.nan)
        return np.concatenate(([float(n)], pts)).tobytes()

    @F.pandas_udf("binary")
    def tdigest_agg_w(v: pd.Series, w: pd.Series) -> bytes:
        """Weighted build — reference TDigestAggregationFunction.java's
        weightedInput(value, weight) overload (weight is DOUBLE there,
        unlike qdigest's bigint). Slot 0 carries TOTAL WEIGHT, so
        merge_tdigest combines weighted and unweighted blobs; the K
        cosine-grid points are selected by cumulative weight with the
        SAME threshold rule merge_tdigest uses (g_k =
        floor(q_k*(W-1)+0.5)+1, endpoints pinned to min/max), so a
        unit-weight build is bit-identical to tdigest_agg. NULL pairs
        are skipped; nonpositive weights raise (Trino verifyWeight)."""
        vals = v.to_numpy(dtype="float64")
        ws = w.to_numpy(dtype="float64")
        mask = ~(np.isnan(vals) | np.isnan(ws))
        vals, ws = vals[mask] + 0.0, ws[mask]
        if len(ws) and (ws <= 0).any():
            raise ValueError("tdigest_agg: weight must be > 0")
        order = np.argsort(vals, kind="stable")
        vals, ws = vals[order], ws[order]
        if len(vals):
            cum = np.cumsum(ws)
            wtot = float(cum[-1])
            g = np.floor(grid * (wtot - 1) + 0.5) + 1
            pts = vals[
                np.searchsorted(cum, g, side="left").clip(
                    0, len(vals) - 1
                )
            ]
            pts[0] = vals[0]
            pts[-1] = vals[-1]
        else:
            wtot = 0.0
            pts = np.full(K_CENTROIDS, np.nan)
        return np.concatenate(([wtot], pts)).tobytes()

    @F.pandas_udf("binary")
    def merge_tdigest(blobs: pd.Series) -> bytes:
        total = 0.0
        pools, weights = [], []
        for blob in blobs:
            if blob is None:
                continue
            arr = np.frombuffer(bytes(blob), dtype="float64")
            # slot 0 is a float total (row count for unweighted blobs,
            # total weight for tdigest_agg_w blobs) — keep it float so
            # weighted totals survive the merge
            n, pts = float(arr[0]), arr[1:]
            if n <= 0:
                continue
            total += n
            bounds = np.floor(mids * n + 0.5).astype("int64")
            pools.append(pts)
            weights.append(bounds[1:] - bounds[:-1])
        if not pools:
            merged = np.full(K_CENTROIDS, np.nan)
        else:
            allpts = np.concatenate(pools) + 0.0
            allw = np.concatenate(weights)
            order = np.argsort(allpts, kind="stable")
            allpts, allw = allpts[order], allw[order]
            cum = np.cumsum(allw)
            w_tot = float(cum[-1])
            g = np.floor(grid * (w_tot - 1) + 0.5) + 1
            merged = allpts[
                np.searchsorted(cum, g, side="left").clip(
                    0, len(allpts) - 1
                )
            ]
            merged[0] = allpts[0]
            merged[-1] = allpts[-1]
        return np.concatenate(([float(total)], merged)).tobytes()

    def _lookup(blob, q):
        q = float(q)
        if not 0.0 <= q <= 1.0:
            raise ValueError(
                f"tdigest value_at_quantile: q in [0, 1], got {q}"
            )
        pts = np.frombuffer(bytes(blob), dtype="float64")[1:]
        if len(pts) != len(grid_list):
            raise ValueError(
                "tdigest blob has %d points, expected %d"
                % (len(pts), len(grid_list))
            )
        lo, hi, frac = _bracket(q)
        return float(pts[lo] + (pts[hi] - pts[lo]) * frac)

    @F.pandas_udf("double")
    def tdigest_value_at_quantile(blobs, qs):
        return pd.Series(
            [
                None if b is None or q is None else _lookup(b, q)
                for b, q in zip(blobs, qs)
            ]
        )

    @F.pandas_udf(ArrayType(DoubleType()))
    def tdigest_values_at_quantiles(blobs, qlists):
        out = []
        for b, qs in zip(blobs, qlists):
            if b is None or qs is None:
                out.append(None)
            else:
                out.append([_lookup(b, q) for q in qs])
        return pd.Series(out)

    spark.udf.register("tdigest_agg", tdigest_agg)
    spark.udf.register("tdigest_agg_w", tdigest_agg_w)
    spark.udf.register("merge_tdigest", merge_tdigest)
    spark.udf.register("tdigest_value_at_quantile", tdigest_value_at_quantile)
    spark.udf.register(
        "tdigest_values_at_quantiles", tdigest_values_at_quantiles
    )
    return 5


def register_setdigest_aggs(spark: SparkSession) -> int:
    """setdigest SQL names (reference SetDigestFunctions.java /
    SetDigestAggregationFunction): make_set_digest / merge_set_digest as
    GROUPED_AGG pandas UDFs over a serialized blob = [2048 HLL register
    bytes][k x 16-byte bottom-k md5 hashes, ascending], plus the scalar
    estimators setdigest_cardinality (HLL half), setdigest_jaccard
    (bottom-k estimator: |bottom_k(A u B) in both| / k'), and
    setdigest_intersection_cardinality (jaccard x union cardinality —
    the reference's estimator). Both halves hash with the same md5, so
    the sketch is self-consistent across make/merge/compare."""
    import hashlib

    K = 128  # bottom-k size (reference MinHash default 8192 is sized for
    # billion-row sets; 128 matches operators/setdigest.K_HASHES scale)

    def _mk(values) -> bytes:
        regs = bytearray(_HLL_BUCKETS)
        hashes = set()
        for s in values:
            if s is None:
                continue
            d = hashlib.md5(str(s).encode()).digest()
            hashes.add(d)
            h = int.from_bytes(d[:12], "big")
            bucket = h & (_HLL_BUCKETS - 1)
            rest = h >> 11
            rho = 85 - rest.bit_length() + 1 if rest else 85
            if rho > regs[bucket]:
                regs[bucket] = rho
        bottom = sorted(hashes)[:K]
        return bytes(regs) + b"".join(bottom)

    def _parts(blob: bytes):
        regs = blob[:_HLL_BUCKETS]
        rest = blob[_HLL_BUCKETS:]
        hashes = [rest[i : i + 16] for i in range(0, len(rest), 16)]
        return regs, hashes

    @F.pandas_udf("binary")
    def make_set_digest(v: pd.Series) -> bytes:
        return _mk(v)

    @F.pandas_udf("binary")
    def merge_set_digest(blobs: pd.Series) -> bytes:
        regs = bytearray(_HLL_BUCKETS)
        hashes = set()
        for blob in blobs:
            if blob is None:
                continue
            r, hs = _parts(bytes(blob))
            for i in range(_HLL_BUCKETS):
                if r[i] > regs[i]:
                    regs[i] = r[i]
            hashes.update(hs)
        bottom = sorted(hashes)[:K]
        return bytes(regs) + b"".join(bottom)

    @F.pandas_udf("long")
    def setdigest_cardinality(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if b is None
                else _hll_estimate(_parts(bytes(b))[0])
                for b in blobs
            ]
        )

    def _jaccard(ba: bytes, bb: bytes) -> float:
        _, ha = _parts(ba)
        _, hb = _parts(bb)
        sa, sb = set(ha), set(hb)
        union_k = sorted(sa | sb)[:K]
        if not union_k:
            return 0.0
        nb = sum(1 for h in union_k if h in sa and h in sb)
        return nb / float(len(union_k))

    @F.pandas_udf("double")
    def setdigest_jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None
                else _jaccard(bytes(x), bytes(y))
                for x, y in zip(a, b)
            ]
        )

    @F.pandas_udf("double")
    def setdigest_intersection_cardinality(
        a: pd.Series, b: pd.Series
    ) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(None)
                continue
            x, y = bytes(x), bytes(y)
            ra, _ = _parts(x)
            rb, _ = _parts(y)
            union = bytes(max(p, q) for p, q in zip(ra, rb))
            out.append(
                round(_jaccard(x, y) * _hll_estimate(union), 6)
            )
        return pd.Series(out)

    spark.udf.register("make_set_digest", make_set_digest)
    spark.udf.register("merge_set_digest", merge_set_digest)
    spark.udf.register("setdigest_cardinality", setdigest_cardinality)
    spark.udf.register("setdigest_jaccard", setdigest_jaccard)
    spark.udf.register(
        "setdigest_intersection_cardinality",
        setdigest_intersection_cardinality,
    )
    return 5


def register_misc_aggs(spark: SparkSession) -> int:
    """approx_most_frequent(buckets, value, capacity) -> map<varchar,
    bigint> (reference ApproximateMostFrequentFunction.java — stream
    summary sketch). This deployment computes the EXACT top-k per group
    (deterministic, a strict accuracy upgrade at the same signature);
    `capacity` is accepted for parity and ignored. Ties break by value
    so results are engine-stable."""

    @F.pandas_udf("map<string,bigint>")
    def approx_most_frequent(
        buckets: pd.Series, v: pd.Series, capacity: pd.Series
    ) -> dict:
        k = int(buckets.iloc[0])
        counts: dict = {}
        for s in v:
            if s is None:
                continue
            key = str(s)
            counts[key] = counts.get(key, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return dict(top)

    spark.udf.register("approx_most_frequent", approx_most_frequent)
    return 1
