"""Deterministic HyperLogLog sketches over md5 (reference
ApproximateSetAggregation.java, HyperLogLogFunctions.java:merge,
airlift/stats HyperLogLog).

The reference models approx-distinct as a three-step algebra: build a
per-group HLL sketch, MERGE sketches upward (union = per-register max),
estimate at the end — the property that makes approx-distinct rollups one
cheap merge pass at 100 TB instead of a rescan. Spark's own
approx_count_distinct / hll_sketch_agg implement the same algebra but their
register hashes are engine-private, so results cannot be checked against an
independent engine. This module derives the registers from md5 — which every
engine computes identically — with integer-only arithmetic, so the whole
sketch pipeline (registers, merge, estimate) is bit-reproducible in DuckDB
SQL and hash-checkable by the driver:

  h      = md5(cast(v as string))             -- 32 hex chars
  bucket = int(h[0:8], 16) % m                -- m = 2^p buckets
  rho    = 61 - bitlen(int(h[8:23], 16))      -- leading zeros in a 60-bit
                                              --    window, + 1; bitlen via
                                              --    length(ltrim(bin(w),'0'))
  register[bucket] = MAX(rho)                 -- grouped agg; union = MAX too
  S      = sum(2^(61-r)) as exact integers    -- decimal(38,0); empty buckets
                                              --    contribute 2^61 each
  E      = alpha_m * m^2 / (S / 2^61)         -- one double division at the end
           (linear counting m*ln(m/V) when E <= 2.5m and V empties remain)

Everything before the final estimate is integer/decimal-exact; the estimate
itself is a short chain of IEEE-double ops evaluated identically by Spark and
DuckDB (double literals spelled `1.0e0` so neither engine parses them as
DECIMAL). Standard HLL error ~1.04/sqrt(m) = 3.25% at p=10.

Scale shape: one shuffle of at most m rows per group key (map-side partial
MAX collapses each partition to <= m rows first); merge/rollup is another
MAX-groupBy over m-row sketches, never a rescan of the raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 10
M = 1 << P  # 1024 registers
TWO61 = 1 << 61


def _bucket_rho(value_expr: str) -> tuple[F.Column, F.Column]:
    """(bucket, rho) columns for one value expression (SQL-text expr)."""
    h = F.md5(F.expr(value_expr).cast("string"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % M
    # 15 hex chars = 60-bit window; bin() prints no leading zeros in either
    # engine, and ltrim('0') maps w=0 -> '' -> rho 61 (the max) for free.
    # The hash-slice constants (9, 15) exist only here — rho derives from
    # the same windowed value (ADVICE r2).
    w = F.conv(F.substring(h, 9, 15), 16, 10).cast("bigint")
    rho = F.lit(61) - F.length(F.call_function("ltrim", F.lit("0"), F.bin(w)))
    return bucket.alias("bucket"), rho.alias("rho")


def hll_registers(df: DataFrame, keys: Sequence[str], value_expr: str) -> DataFrame:
    """Build per-group HLL registers: (keys..., bucket, r). This IS the
    sketch — at most m=1024 rows per group, mergeable by MAX.

    NULL values are dropped before bucketing (reference approx_distinct
    ignores NULLs; an md5(NULL) row would otherwise add a phantom register
    whose NULL rho biases the estimate — ADVICE r2)."""
    b, rho = _bucket_rho(value_expr)
    keys = list(keys)
    return (
        df.where(F.expr(value_expr).isNotNull())
        .select(*keys, b, rho)
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(registers: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Sketch union (reference HyperLogLogFunctions.java:merge): per-register
    MAX under a coarser grouping. Never touches the raw data."""
    return registers.groupBy(*keys, "bucket").agg(F.max("r").alias("r"))


# Final-estimate expression over (nz, sp) one-row summaries. All literals are
# spelled `e0` so both Spark and DuckDB parse them as DOUBLE (bare `0.7213`
# is DECIMAL in both, with engine-specific division semantics).
_EST = (
    f"(0.7213e0/(1.0e0+1.079e0/{M})) * {M} * {M} / "
    f"(CAST(sp + ({M} - nz) * CAST({TWO61} AS DECIMAL(38,0)) AS DOUBLE) / pow(2.0e0,61))"
)
_FINAL = (
    f"CASE WHEN {_EST} <= 2.5e0*{M} AND ({M} - nz) > 0 "
    f"THEN {M} * ln(CAST({M} AS DOUBLE) / ({M} - nz)) "
    f"ELSE {_EST} END"
)


def hll_estimate(registers: DataFrame, keys: Sequence[str], alias: str) -> DataFrame:
    """(keys..., estimate) from a register relation. Exact integer/decimal
    arithmetic up to one final double division + round(6)."""
    keys = list(keys)
    summary = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr("cast(shiftleft(1L, 61 - r) as decimal(38,0))")).alias("sp"),
    )
    return summary.select(
        *keys, F.expr(f"cast(round({_FINAL}, 6) as double)").alias(alias)
    )


def hll_oracle_cte(source_sql: str, value_expr: str, keys: Sequence[str], alias: str) -> str:
    """DuckDB SQL computing the identical estimate from the same md5-derived
    registers; used verbatim inside oracle strings so both sides stay in
    lock-step with this module."""
    keys = list(keys)
    kcols = (", ".join(keys) + ",") if keys else ""
    ksel = (", ".join(keys)) if keys else ""
    group_h = ("GROUP BY " + ", ".join([*keys, "bucket"])) if keys else "GROUP BY bucket"
    group_s = ("GROUP BY " + ksel) if keys else ""
    return f"""
  WITH h AS (
    SELECT {kcols}
           CAST(('0x' || substr(md5(CAST(({value_expr}) AS VARCHAR)),1,8)) AS BIGINT) % {M} AS bucket,
           61 - length(ltrim(bin(CAST(('0x' || substr(md5(CAST(({value_expr}) AS VARCHAR)),9,15)) AS BIGINT)),'0')) AS rho
    FROM {source_sql}
    WHERE ({value_expr}) IS NOT NULL),
  regs AS (SELECT {kcols} bucket, MAX(rho) AS r FROM h {group_h}),
  s AS (SELECT {kcols} COUNT(*) AS nz,
               CAST(SUM(CAST((1::BIGINT << (61 - r)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp
        FROM regs {group_s})
  SELECT {kcols} CAST(round({_FINAL}, 6) AS DOUBLE) AS {alias} FROM s
"""
