"""Iceberg partition transforms, jar-free (PUBLIC spec: 'Partition
Transforms' + 'Appendix B: 32-bit Hash Requirements' at
iceberg.apache.org/spec; reference analog
plugin/trino-iceberg/src/main/java/io/trino/plugin/iceberg/
PartitionTransforms.java, pinned values from TestIcebergBucketing.java).

Two synchronized halves:

  * ``transform_expr`` — a Spark Column computing the transform
    DISTRIBUTED at write-staging time. ``bucket[N]`` over fixed-width
    sources (int/long/date/timestamp) compiles murmur3_x86_32 of the
    8-byte little-endian value to pure JVM bigint arithmetic
    (split-multiply keeps every intermediate < 2^49, so the chain is
    ANSI-overflow-safe and whole-stage-codegen'd — no Python in the
    staging plan). Strings are variable-width, so ``bucket`` over a
    string column uses an Arrow-batched pandas UDF of the same hash.
  * ``transform_value`` — the Python twin for single values (manifest
    partition structs, tests). A randomized differential in
    tests/test_sources.py holds the two halves row-for-row equal.

Result types follow the spec: bucket -> int, truncate -> source type,
year/month/hour -> int (ordinals from 1970 epoch), day -> date (ISO
directory names; the manifest struct stores epoch days via the avro
date logical type).
"""

from __future__ import annotations

import datetime

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


class TransformError(ValueError):
    pass


# ------------------------------------------------------------- murmur3


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public reference implementation by Austin
    Appleby, released to the public domain), returning a SIGNED int32
    like the JVM implementations the spec's test values assume."""
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def bucket_hash(value, ice_type: str) -> int:
    """Spec Appendix B hash: integral types widen to a long and hash
    its 8-byte little-endian two's complement; strings hash UTF-8."""
    if ice_type in ("int", "long", "date", "time", "timestamp",
                    "timestamptz"):
        if isinstance(value, datetime.datetime):  # -> epoch micros
            value = (
                value - datetime.datetime(1970, 1, 1)
            ) // datetime.timedelta(microseconds=1)
        elif isinstance(value, datetime.date):  # -> epoch days
            value = (value - datetime.date(1970, 1, 1)).days
        v = int(value)
        return murmur3_32(v.to_bytes(8, "little", signed=True))
    if ice_type == "string":
        return murmur3_32(str(value).encode("utf-8"))
    raise TransformError(
        f"bucket over iceberg type {ice_type!r} is outside the"
        " jar-free writer subset (int/long/date/timestamp/string)"
    )


def bucket_value(value, n: int, ice_type: str) -> int | None:
    if value is None:
        return None
    return (bucket_hash(value, ice_type) & 0x7FFFFFFF) % n


# ------------------------------------------------------- parse / typing

_TEMPORAL = ("year", "month", "day", "hour")


def parse_transform(transform: str) -> tuple[str, int | None]:
    """Spec transform string -> (kind, parameter). 'bucket[16]' ->
    ('bucket', 16); 'identity' -> ('identity', None)."""
    t = transform.strip()
    if t.startswith("bucket[") and t.endswith("]"):
        return "bucket", int(t[len("bucket["):-1])
    if t.startswith("truncate[") and t.endswith("]"):
        return "truncate", int(t[len("truncate["):-1])
    if t in ("identity",) + _TEMPORAL:
        return t, None
    raise TransformError(
        f"partition transform {transform!r} is outside the jar-free"
        " writer subset (identity/bucket[N]/truncate[W]/year/month/"
        "day/hour; void needs the iceberg-spark-runtime jar)"
    )


def parse_partition_by(entry: str) -> tuple[str, str]:
    """A ``write_iceberg(partition_by=...)`` entry -> (column,
    spec-transform string). Accepts the Spark-DDL spellings
    ``bucket(16, col)``, ``truncate(3, col)`` / ``truncate(col, 3)``,
    ``year(col)`` / ``years(col)`` (etc.), and a bare column name for
    identity."""
    e = entry.strip()
    if "(" not in e:
        return e, "identity"
    fn, _, rest = e.partition("(")
    fn = fn.strip().lower()
    if fn not in ("bucket", "truncate"):
        fn = fn.rstrip("s")  # years(ts) == year(ts), etc.
    args = [a.strip() for a in rest.rstrip(")").split(",")]
    if fn == "bucket":
        if len(args) != 2 or not args[0].isdigit():
            raise TransformError(f"bucket spelling {entry!r}: want"
                                 " bucket(N, col)")
        return args[1], f"bucket[{int(args[0])}]"
    if fn == "truncate":
        if len(args) != 2:
            raise TransformError(f"truncate spelling {entry!r}: want"
                                 " truncate(W, col)")
        if args[0].isdigit():
            return args[1], f"truncate[{int(args[0])}]"
        if args[1].isdigit():
            return args[0], f"truncate[{int(args[1])}]"
        raise TransformError(f"truncate spelling {entry!r}: no width")
    if fn in _TEMPORAL:
        if len(args) != 1:
            raise TransformError(f"{fn} spelling {entry!r}: want"
                                 f" {fn}(col)")
        return args[0], fn
    raise TransformError(
        f"partition transform {fn!r} in {entry!r} is outside the"
        " jar-free writer subset"
    )


def default_field_name(col: str, transform: str) -> str:
    """iceberg-java's PartitionSpec field naming convention."""
    kind, param = parse_transform(transform)
    if kind == "identity":
        return col
    if kind == "bucket":
        return f"{col}_bucket"
    if kind == "truncate":
        return f"{col}_trunc"
    return f"{col}_{kind}"


_TRUNC_TYPES = ("int", "long", "string")
_BUCKET_TYPES = ("int", "long", "date", "timestamp", "timestamptz",
                 "string")


def result_type(transform: str, src_type: str) -> str:
    """Transform result iceberg type (spec 'Partition Transforms'
    table); raises on (transform, source-type) pairs outside the
    jar-free subset so writes refuse instead of mis-partitioning."""
    kind, _ = parse_transform(transform)
    if kind == "identity":
        return src_type
    if kind == "bucket":
        if src_type not in _BUCKET_TYPES:
            raise TransformError(
                f"bucket over {src_type!r} needs the"
                " iceberg-spark-runtime jar"
            )
        return "int"
    if kind == "truncate":
        if src_type not in _TRUNC_TYPES:
            raise TransformError(
                f"truncate over {src_type!r} needs the"
                " iceberg-spark-runtime jar"
            )
        return src_type
    # temporal
    if kind == "day":
        if src_type not in ("date", "timestamp", "timestamptz"):
            raise TransformError(f"day over {src_type!r} is invalid")
        return "date"
    if kind == "hour":
        if src_type not in ("timestamp", "timestamptz"):
            raise TransformError(f"hour over {src_type!r} is invalid")
        return "int"
    if src_type not in ("date", "timestamp", "timestamptz"):
        raise TransformError(f"{kind} over {src_type!r} is invalid")
    return "int"


# ------------------------------------------------------- python twin


def transform_value(transform: str, value, src_type: str):
    """Python twin of transform_expr for a single value (tests; the
    manifest struct itself parses back from staged directory names)."""
    kind, param = parse_transform(transform)
    if value is None:
        return None
    if kind == "identity":
        return value
    if kind == "bucket":
        return bucket_value(value, param, src_type)
    if kind == "truncate":
        if src_type == "string":
            return str(value)[:param]
        v = int(value)
        return v - (((v % param) + param) % param)
    # temporal over datetime.date / datetime.datetime
    if isinstance(value, datetime.datetime):
        d = value
    elif isinstance(value, datetime.date):
        d = datetime.datetime(value.year, value.month, value.day)
    else:
        raise TransformError(f"{kind} over non-temporal {value!r}")
    if kind == "year":
        return d.year - 1970
    if kind == "month":
        return (d.year - 1970) * 12 + (d.month - 1)
    if kind == "day":
        return d.date()
    if kind == "hour":
        epoch = datetime.datetime(1970, 1, 1)
        return int((d - epoch).total_seconds() // 3600)
    raise TransformError(f"unhandled transform {kind!r}")


# ------------------------------------------------------- spark column


def _mul32(x, c: int):
    """low32(x * c) without any intermediate over 2^49 — ANSI-safe.
    x must already be masked to [0, 2^32)."""
    from pyspark.sql import functions as F

    lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = (F.shiftright(x, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF))
    return (lo + F.shiftleft(hi, 16)).bitwiseAND(F.lit(_M32))


def _rotl32(x, r: int):
    from pyspark.sql import functions as F

    return (
        F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r))
    ).bitwiseAND(F.lit(_M32))


def _murmur3_long_expr(v):
    """murmur3_x86_32 of the 8-byte little-endian two's complement of
    bigint Column ``v`` (seed 0) — the spec hash for every fixed-width
    source — as pure JVM arithmetic (stays in whole-stage codegen)."""
    from pyspark.sql import functions as F

    k1 = v.bitwiseAND(F.lit(_M32))
    k2 = F.shiftrightunsigned(v, 32).bitwiseAND(F.lit(_M32))
    h = F.lit(0).cast("bigint")
    for k in (k1, k2):
        k = _mul32(k, _C1)
        k = _rotl32(k, 15)
        k = _mul32(k, _C2)
        h = h.bitwiseXOR(k)
        h = _rotl32(h, 13)
        h = (h * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32))
    h = h.bitwiseXOR(F.lit(8))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mul32(h, 0xC2B2AE35)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    return h  # unsigned 32-bit as bigint


def _epoch_micros_expr(col_name: str):
    """Session-zone-free micros since epoch for a timestamp_ntz column
    (the unix_micros(cast(...)) spelling is session-zone dependent)."""
    from pyspark.sql import functions as F

    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01',"
        f" `{col_name}`)"
    )


def transform_expr(transform: str, col_name: str, src_type: str):
    """Spark Column computing ``transform`` of column ``col_name``
    (iceberg source type ``src_type``) — the value that partitions the
    write staging and lands in the manifest partition struct."""
    from pyspark.sql import functions as F

    kind, param = parse_transform(transform)
    result_type(transform, src_type)  # validate the pair loudly
    c = F.col(col_name)
    if kind == "identity":
        return c
    if kind == "truncate":
        if src_type == "string":
            return F.substring(c, 1, param)
        w = F.lit(param)
        return (c - (((c % w) + w) % w)).cast(
            "bigint" if src_type == "long" else "int"
        )
    if kind == "bucket":
        if src_type == "string":
            return _bucket_string_udf(param)(c)
        if src_type in ("int", "long"):
            v = c.cast("bigint")
        elif src_type == "date":
            v = F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast(
                "bigint"
            )
        else:  # timestamp / timestamptz (stored as micros)
            v = _epoch_micros_expr(col_name)
        h = _murmur3_long_expr(v)
        return h.bitwiseAND(F.lit(0x7FFFFFFF)).__mod__(
            F.lit(param)
        ).cast("int")
    # temporal: date or timestamp_ntz source
    if kind == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if kind == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c)
            - F.lit(1)
        ).cast("int")
    if kind == "day":
        return F.to_date(c)
    if kind == "hour":  # result_type already rejected date sources
        # decimal division: bigint/bigint would go through double and
        # can flip within ~128us of an hour boundary past ~2^53 micros
        return F.floor(
            _epoch_micros_expr(col_name).cast("decimal(38,6)")
            / F.lit(3_600_000_000)
        ).cast("int")
    raise TransformError(f"unhandled transform {kind!r}")


def _bucket_string_udf(n: int):
    """Arrow-batched pandas UDF for bucket[N] over strings — variable
    width defeats the fixed-block JVM arithmetic; write staging is the
    only caller, so the Python hop never sits in a query hot path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # this module defers the pandas import; pandas_udf resolves the
    # (stringified, via __future__.annotations) hints against module
    # globals, so the name must exist there when the UDF is defined
    globals().setdefault("pd", pd)

    @pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None if v is None else
            (murmur3_32(v.encode("utf-8")) & 0x7FFFFFFF) % n
        ).astype("Int32")

    return _bucket


# ---------------------------------------------------- predicate pruning


def partition_struct_can_match(
    clauses, part_fields: list[dict], schema_fields: list[dict],
    struct: dict | None,
) -> bool:
    """Conservative manifest-level pruning (the reference's
    residual-predicate projection in
    plugin/trino-iceberg/.../IcebergSplitSource + the spec's
    'Transform projection' rules): can a data file with partition
    ``struct`` contain a row satisfying every clause? Monotonic
    transforms (identity/truncate/temporal) project range comparisons
    by transforming the literal; bucket projects equality only.
    Unknown anything -> True (scan the file)."""
    from witdb_spark.sources.skipping import (
        partition_value_can_match,
    )

    if struct is None:
        return True
    by_src: dict[int, list[dict]] = {}
    for pf in part_fields:
        by_src.setdefault(pf["source-id"], []).append(pf)
    id_by_name = {f["name"]: f for f in schema_fields}
    for cl in clauses:
        src = id_by_name.get(cl.col)
        if src is None:
            continue
        for pf in by_src.get(src["id"], ()):
            if pf["name"] not in struct and cl.op not in ("isnull",):
                continue
            pv = struct.get(pf["name"])
            kind, param = parse_transform(pf.get("transform", "identity"))
            # transform(NULL) is NULL for every transform, so the
            # NULL-ness projections hold universally
            if cl.op == "isnull":
                if pf["name"] in struct and pv is not None:
                    return False
                continue
            if pv is None:
                return False  # all-null source; comparisons never match
            if cl.op == "notnull":
                continue
            if kind == "identity":
                if not partition_value_can_match(cl, pv):
                    return False
                continue
            if kind == "bucket":
                if cl.op == "=":
                    try:
                        want = bucket_value(cl.value, param, src["type"])
                    except (TransformError, TypeError, ValueError):
                        continue
                    if pv != want:
                        return False
                elif cl.op == "in":
                    try:
                        wants = {
                            bucket_value(v, param, src["type"])
                            for v in cl.value
                        }
                    except (TransformError, TypeError, ValueError):
                        continue
                    if pv not in wants:
                        return False
                continue
            # monotonic transforms: row `x op lit` implies
            # `t(x) op' t(lit)` with strict ops relaxed
            try:
                tl = transform_value(
                    pf["transform"], cl.value, src["type"]
                )
            except (TransformError, TypeError, ValueError):
                continue
            if cl.op == "=":
                if _neq(pv, tl):
                    return False
            elif cl.op == "in":
                try:
                    wants = [
                        transform_value(pf["transform"], v, src["type"])
                        for v in cl.value
                    ]
                except (TransformError, TypeError, ValueError):
                    continue
                if all(_neq(pv, w) for w in wants):
                    return False
            elif cl.op in ("<", "<="):
                if _cmp_known(pv, tl) == 1:  # pv > t(lit): no row can be < lit
                    return False
            elif cl.op in (">", ">="):
                if _cmp_known(pv, tl) == -1:
                    return False
            # '<>' never prunes under a lossy transform
    return True


def _cmp_known(a, b) -> int:
    """-1/0/1 when comparable, 0 (no prune) otherwise."""
    try:
        if a < b:
            return -1
        if a > b:
            return 1
        return 0
    except TypeError:
        return 0


def _neq(a, b) -> bool:
    try:
        return not (a == b)
    except TypeError:
        return False


def manifest_summary_can_match(
    clauses, part_fields: list[dict], schema_fields: list[dict],
    summaries: list[dict] | None, deser,
) -> bool:
    """Manifest-LIST-level pruning over the spec's positional
    field_summary records (contains_null + lower/upper bound per
    partition-spec field) — a manifest whose summary cannot satisfy
    the predicate is never even opened. ``deser`` decodes the bounds
    (single-value serialization, iceberg_meta._ice_single_deser).
    Monotonic transforms project range comparisons; bucket projects
    equality; a null lower_bound means every value in the manifest is
    NULL (spec). Any doubt -> open the manifest."""
    from witdb_spark.sources.skipping import _range_can_match

    if not summaries or not part_fields:
        return True
    id_by_name = {f["name"]: f for f in schema_fields}
    for cl in clauses:
        src = id_by_name.get(cl.col)
        if src is None:
            continue
        for idx, pf in enumerate(part_fields):
            if pf["source-id"] != src["id"] or idx >= len(summaries):
                continue
            fs = summaries[idx] or {}
            kind, param = parse_transform(pf.get("transform", "identity"))
            if cl.op == "isnull":
                if fs.get("contains_null") is False:
                    return False
                continue
            all_null = (
                fs.get("lower_bound") is None
                and fs.get("contains_null") is True
            )
            if all_null:
                return False  # comparisons / IS NOT NULL never match
            if cl.op == "notnull":
                continue
            if fs.get("lower_bound") is None or fs.get(
                "upper_bound"
            ) is None:
                continue
            try:
                rt = result_type(pf.get("transform", "identity"),
                                 src["type"])
                lo = deser(rt, fs["lower_bound"])
                hi = deser(rt, fs["upper_bound"])
            except Exception:
                continue  # undecodable summary: open the manifest
            if lo is None or hi is None:
                continue
            if kind == "identity":
                if cl.op == "in":
                    if not any(
                        _range_can_match("=", lo, hi, v)
                        for v in cl.value
                    ):
                        return False
                elif not _range_can_match(cl.op, lo, hi, cl.value):
                    return False
                continue
            if kind == "bucket":
                if cl.op in ("=", "in"):
                    vals = cl.value if cl.op == "in" else (cl.value,)
                    try:
                        wants = [
                            bucket_value(v, param, src["type"])
                            for v in vals
                        ]
                    except (TransformError, TypeError, ValueError):
                        continue
                    if not any(
                        _range_can_match("=", lo, hi, w) for w in wants
                    ):
                        return False
                continue
            # monotonic transforms: project the literal(s)
            try:
                if cl.op == "in":
                    wants = [
                        transform_value(pf["transform"], v, src["type"])
                        for v in cl.value
                    ]
                    if not any(
                        _range_can_match("=", lo, hi, w) for w in wants
                    ):
                        return False
                    continue
                tl = transform_value(
                    pf["transform"], cl.value, src["type"]
                )
            except (TransformError, TypeError, ValueError):
                continue
            if cl.op in ("=", "<", "<=", ">", ">="):
                # x < lit only implies t(x) <= t(lit) for a LOSSY
                # monotonic transform — strict ops must RELAX to their
                # inclusive forms or a boundary manifest (lo == t(lit),
                # rows earlier inside the same day/month/...) would be
                # pruned wrongly. day over a DATE source is lossless
                # (t(x) == x), so it keeps the strict op.
                op = cl.op
                if not _lossless(kind, src["type"]):
                    op = {"<": "<=", ">": ">="}.get(op, op)
                if not _range_can_match(op, lo, hi, tl):
                    return False
    return True


def _lossless(kind: str, src_type: str) -> bool:
    """Transforms where t(x) == x up to representation: strict range
    ops project without relaxation."""
    return kind == "identity" or (kind == "day" and src_type == "date")
