"""Pure-Python Delta Lake transaction-log reader (read path, no jar).

The reference's delta connector (plugin/trino-delta-lake,
io/trino/plugin/deltalake/transactionlog/TransactionLogAccess.java) does
NOT link the Delta runtime: it implements the PUBLIC Delta transaction
log protocol (github.com/delta-io/delta PROTOCOL.md) itself — JSON
commits + parquet checkpoints reconstructed into a snapshot, then the
data files scanned as ordinary parquet. This module is the same
architecture on Spark: the driver folds the log into the active
add-file set (exactly what every Delta reader materializes), and the
data scan stays a distributed parquet read with full predicate
pushdown / column pruning; partition values are injected from the log
as per-group literals, so Catalyst folds partition-column filters to
constants and prunes the unioned branches — log-driven partition
pruning without a connector jar.

Used by sources/lakehouse.read_table as the fallback when the Delta jar
is absent; with the jar present the DSv2 connector takes over unchanged.

Loud scope-outs (raise, never silently misread): column mapping other
than `none`, active deletion vectors, v2 checkpoints, and any reader
feature outside the understood set.
"""

from __future__ import annotations

import json
import os
import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: minReaderVersion 3 reader features this module actually honors.
#: timestampNtz is a plain parquet NTZ read; columnMapping is accepted
#: only while the table's mode stays "none"; deletionVectors is accepted
#: only while no ACTIVE add carries one (checked per snapshot below).
_OK_READER_FEATURES = {"timestampNtz", "columnMapping", "deletionVectors"}

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(
    r"^(\d{20})\.checkpoint(\.\d{10}\.\d{10})?\.parquet$"
)


class DeltaProtocolError(RuntimeError):
    """The log demands a protocol feature this reader does not handle."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _list_log(path: str) -> tuple[dict[int, str], dict[int, list[str]]]:
    """(version -> commit json, version -> checkpoint parquet parts)."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"{path} is not a Delta table (no _delta_log directory)"
        )
    commits: dict[int, str] = {}
    checkpoints: dict[int, list[str]] = {}
    for name in os.listdir(d):
        m = _COMMIT_RE.match(name)
        if m:
            commits[int(m.group(1))] = os.path.join(d, name)
            continue
        m = _CHECKPOINT_RE.match(name)
        if m:
            checkpoints.setdefault(int(m.group(1)), []).append(
                os.path.join(d, name)
            )
    return commits, checkpoints


def _commit_timestamp(commit_path: str) -> int:
    """Commit time in epoch millis: commitInfo.timestamp when the
    writer recorded one, else the log file's modification time (the
    same fallback order the protocol prescribes for time travel)."""
    with open(commit_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            info = action.get("commitInfo")
            if info and "timestamp" in info:
                return int(info["timestamp"])
    return int(os.path.getmtime(commit_path) * 1000)


def _check_protocol(protocol: dict) -> None:
    v = int(protocol.get("minReaderVersion", 1))
    if v <= 1:
        return
    if v == 2:
        return  # column-mapping gate happens against metaData below
    if v == 3:
        feats = set(protocol.get("readerFeatures") or [])
        bad = feats - _OK_READER_FEATURES
        if bad:
            raise DeltaProtocolError(
                "unsupported Delta reader features "
                f"{sorted(bad)}; this no-jar protocol reader handles "
                f"{sorted(_OK_READER_FEATURES)} — add the delta-spark"
                " jar for full protocol support"
            )
        return
    raise DeltaProtocolError(
        f"unsupported Delta minReaderVersion {v}; add the delta-spark jar"
    )


def _snapshot_state(
    spark: SparkSession, path: str, version: int | None, timestamp_ms: int | None
) -> tuple[dict, dict, dict[str, dict], int]:
    """Fold the log into (protocol, metaData, path -> add, version)."""
    commits, checkpoints = _list_log(path)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"{path}: empty _delta_log")
    latest = max(list(commits) + list(checkpoints))
    if timestamp_ms is not None:
        eligible = [
            v for v in sorted(commits)
            if _commit_timestamp(commits[v]) <= timestamp_ms
        ]
        if not eligible:
            raise ValueError(
                f"no Delta commit at or before timestamp {timestamp_ms}"
            )
        version = eligible[-1]
    target = latest if version is None else int(version)
    if target > latest:
        raise ValueError(
            f"requested Delta version {target}, latest is {latest}"
        )

    protocol: dict = {}
    metadata: dict = {}
    state: dict[str, dict] = {}

    cp_versions = [v for v in checkpoints if v <= target]
    start = 0
    if cp_versions:
        cp = max(cp_versions)
        rows = (
            spark.read.parquet(*sorted(checkpoints[cp]))
            .select("protocol", "metaData", "add")
            .collect()
        )
        for r in rows:
            d = r.asDict(recursive=True)
            if d.get("protocol"):
                protocol = {
                    k: v for k, v in d["protocol"].items() if v is not None
                }
            if d.get("metaData"):
                metadata = d["metaData"]
            if d.get("add"):
                add = d["add"]
                state[add["path"]] = add
        start = cp + 1
    for v in range(start, target + 1):
        if v not in commits:
            if v in checkpoints:
                continue  # checkpoint-only version (no json written)
            raise FileNotFoundError(
                f"{path}: missing Delta commit {v:020d}.json"
            )
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    state[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    state.pop(action["remove"]["path"], None)
    if not metadata:
        raise DeltaProtocolError(f"{path}: no metaData action in log")
    _check_protocol(protocol or {"minReaderVersion": 1})
    mode = (metadata.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode != "none":
        raise DeltaProtocolError(
            f"Delta column mapping mode {mode!r} needs the delta-spark jar"
        )
    for add in state.values():
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "active deletion vectors need the delta-spark jar"
            )
    return protocol, metadata, state, target


def read_delta_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Read a Delta table at a snapshot (latest, an explicit version, or
    the last version committed at/before ``timestamp_ms``) without the
    connector jar — reference TransactionLogAccess/CheckpointEntryIterator
    analog. Returns a DataFrame in the table's declared column order."""
    _, metadata, state, _ = _snapshot_state(spark, path, version, timestamp_ms)
    schema = StructType.fromJson(json.loads(metadata["schemaString"]))
    part_cols = list(metadata.get("partitionColumns") or [])
    part_fields = {f.name: f for f in schema.fields if f.name in part_cols}
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )

    if not state:
        return spark.createDataFrame([], schema)

    groups: dict[tuple, list[str]] = {}
    for add in state.values():
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(path, unquote(add["path"]))
        )

    parts = []
    for key, files in sorted(groups.items()):
        df = spark.read.schema(data_schema).parquet(*sorted(files))
        for c, raw in zip(part_cols, key):
            # partition values are the protocol's string serialization
            # (PROTOCOL.md "Partition Value Serialization"); a literal
            # cast both restores the type and lets Catalyst fold
            # partition predicates per branch (log-driven pruning)
            df = df.withColumn(
                c, F.lit(raw).cast(part_fields[c].dataType)
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*[f.name for f in schema.fields])


def delta_table_version(spark: SparkSession, path: str) -> int:
    """Latest snapshot version (reference SHOW ... table$history analog)."""
    commits, checkpoints = _list_log(path)
    return max(list(commits) + list(checkpoints))
