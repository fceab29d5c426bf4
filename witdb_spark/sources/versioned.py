"""Native VERSIONED TABLE format: snapshot isolation + time travel
without connector jars (reference plugin/trino-delta-lake
TransactionLogAccess / plugin/trino-iceberg snapshot reads).

The sandbox re-scope recorded in sources/lakehouse.py stands for the
REAL formats (their jars cannot be installed here), but the table-level
BEHAVIOR those connectors provide — versioned snapshots, time travel,
copy-on-write DML, history — is format-independent. This module
implements it directly over parquet + a JSON transaction log, the same
shape Delta's protocol reduces to:

    <path>/_vlog/00000000.json   one entry per committed version:
        {"version": N, "ts": "<utc iso>", "operation": "...",
         "files": [<relative parquet dirs>]}    # FULL snapshot file set
    <path>/data/v<N>-<uuid>/part-*.parquet      immutable data files

Each commit lists its COMPLETE file set (checkpoint-per-commit — Delta
reaches the same state by folding add/remove actions; with one log
entry per version the fold is the entry). Readers resolve a version (or
a timestamp) to its file list and hand Spark a plain parquet scan, so
pushdown/pruning/statistics all work unchanged — and at 100 TB a
snapshot read costs exactly what the parquet scan costs, never a log
replay over the data.

Scope, loud: single-writer (commits are temp-file + atomic rename; no
optimistic concurrency-conflict detection), no schema evolution (the
snapshot's schema is its files' schema), no VACUUM (old versions keep
their files — that IS time travel).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession

_LOG_DIR = "_vlog"
_DATA_DIR = "data"


def _parse_ts(s: str) -> datetime:
    """Normalize a timestamp literal (space- or T-separated, optional
    offset) to an aware UTC datetime so snapshot resolution never falls
    back to string order."""
    s = str(s).strip().replace(" ", "T", 1)
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


class VersionedTable:
    """Handle to one versioned table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ---- log plumbing -------------------------------------------------

    def _log_dir(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def history(self) -> list[dict]:
        """All committed versions, ascending (DESCRIBE HISTORY analog —
        reference delta-lake $history / iceberg $snapshots tables)."""
        d = self._log_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(json.load(f))
        return out

    def latest_version(self) -> int:
        h = self.history()
        if not h:
            raise FileNotFoundError(
                f"not a versioned table (no {_LOG_DIR}): {self.path}"
            )
        return h[-1]["version"]

    def _commit(self, files: list[str], operation: str) -> int:
        h = self.history()
        version = (h[-1]["version"] + 1) if h else 0
        return self._commit_at(version, files, operation)

    def _commit_at(self, version: int, files: list[str], operation: str) -> int:
        os.makedirs(self._log_dir(), exist_ok=True)
        entry = {
            "version": version,
            "ts": datetime.now(timezone.utc).isoformat(),
            "operation": operation,
            "files": files,
        }
        final = os.path.join(self._log_dir(), f"{version:08d}.json")
        if os.path.exists(final):
            raise RuntimeError(
                f"concurrent commit detected at version {version} (this"
                " format is single-writer by recorded scope)"
            )
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.rename(tmp, final)  # atomic on POSIX
        return version

    def _write_files(self, df: DataFrame, version_hint: int) -> str:
        rel = os.path.join(_DATA_DIR, f"v{version_hint}-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(os.path.join(self.path, rel))
        return rel

    # ---- writes -------------------------------------------------------

    @staticmethod
    def create(spark: SparkSession, path: str, df: DataFrame) -> "VersionedTable":
        t = VersionedTable(spark, path)
        if t.history():
            raise ValueError(f"versioned table already exists: {path}")
        rel = t._write_files(df, 0)
        t._commit([rel], "create")
        return t

    def append(self, df: DataFrame) -> int:
        """INSERT INTO: new files + prior snapshot's files."""
        prev = self.history()[-1]
        rel = self._write_files(df, prev["version"] + 1)
        return self._commit([*prev["files"], rel], "append")

    def overwrite(self, df: DataFrame) -> int:
        rel = self._write_files(df, self.latest_version() + 1)
        return self._commit([rel], "overwrite")

    def delete_where(self, predicate: Column) -> int:
        """Copy-on-write DELETE: the surviving rows become the next
        snapshot (what Delta/Iceberg do per touched file; one snapshot
        here — file-level pruning of untouched files is an optimization
        this minimal format skips, loudly)."""
        from witdb_spark.sources.merge import delete_where

        return self.overwrite(delete_where(self.read(), predicate))

    def update_where(self, predicate: Column, assignments: dict) -> int:
        from witdb_spark.sources.merge import update_where

        return self.overwrite(update_where(self.read(), predicate, assignments))

    def merge_into(self, source: DataFrame, on: list[str], **kwargs) -> int:
        """MERGE INTO this table USING source — copy-on-write commit of
        the post-merge snapshot (sources/merge.py semantics)."""
        from witdb_spark.sources.merge import merge_into

        return self.overwrite(merge_into(self.read(), source, on, **kwargs))

    # ---- reads --------------------------------------------------------

    def read(
        self, version: int | None = None, timestamp: str | None = None
    ) -> DataFrame:
        """Snapshot read; version/timestamp select FOR VERSION|TIMESTAMP
        AS OF. A timestamp resolves to the LAST version committed at or
        before it (reference delta-lake TimeTravelUtil semantics)."""
        h = self.history()
        if not h:
            raise FileNotFoundError(
                f"not a versioned table (no {_LOG_DIR}): {self.path}"
            )
        if version is not None and timestamp is not None:
            raise ValueError("pass version OR timestamp, not both")
        entry = h[-1]
        if version is not None:
            matches = [e for e in h if e["version"] == int(version)]
            if not matches:
                raise ValueError(
                    f"version {version} not in history 0..{h[-1]['version']}"
                )
            entry = matches[0]
        elif timestamp is not None:
            # parse both sides to aware datetimes — a raw string compare
            # would sort '2026-08-14 12:00' before '2026-08-14T00:00'
            # and silently pick the wrong snapshot. A date-only timestamp
            # means end-of-day (Trino's DATE time-travel semantics).
            ts = str(timestamp).strip()
            if len(ts) == 10:
                ts += "T23:59:59.999999+00:00"
            want = _parse_ts(ts)
            eligible = [e for e in h if _parse_ts(e["ts"]) <= want]
            if not eligible:
                raise ValueError(
                    f"no version committed at or before {timestamp!r}"
                )
            entry = eligible[-1]
        paths = [os.path.join(self.path, rel) for rel in entry["files"]]
        return self.spark.read.parquet(*paths)
