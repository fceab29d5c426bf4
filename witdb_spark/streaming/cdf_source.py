"""Structured Streaming source for the Delta Change Data Feed — a
Spark 4 PYTHON DataSource (pyspark.sql.datasource): offsets are commit
versions, each microbatch serves the cdc/synthesized change rows of
the versions between its start and end offsets, and the row decode
runs ON EXECUTORS with pyarrow + the pure-python deletion-vector
reader (no driver-side row materialization, no jar).

BEYOND-REFERENCE (Trino 411 has no table_changes and no streaming);
semantics mirror sources/delta_log.delta_table_changes exactly:
explicit cdc actions are authoritative for their commit, add-only
commits synthesize inserts, whole-file removes synthesize deletes, a
same-path DV re-add yields exactly the newly-shadowed positions, and
UPDATE commits label update_preimage/update_postimage. Output schema =
table columns + _change_type, _commit_version, _commit_timestamp.

Usage:
    spark.dataSource.register(DeltaCDFDataSource)
    (spark.readStream.format("witdb_delta_cdf")
        .option("path", table_path)
        .option("starting_version", 0)   # default 0
        .load())

Scope gates (loud): delta.enableChangeDataFeed must be true;
mode=name column mapping streams for FLAT schemas (physical names
ride each partition's schema triple; r12) while mode=id and nested
mapped types refuse; schema changes inside the stream refuse; commits
dropped from the log (vacuumed/checkpoint-subsumed) refuse — the
stream needs the original commit JSONs, like the batch reader.
"""

from __future__ import annotations

import datetime
import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _ChangeItem(InputPartition):
    """One executor work item: decode one file's contribution to one
    commit's change set. ``kind``: 'cdc' (the parquet carries
    _change_type), 'rows' (whole file minus ``dv`` positions, fixed
    ``label``), 'dvdiff' (exactly the positions in ``dv`` minus
    ``dv_old``, fixed ``label``)."""

    def __init__(self, kind, abs_path, pv, version, ts_ms, label=None,
                 dv=None, dv_old=None):
        self.kind = kind
        self.abs_path = abs_path
        self.pv = pv or {}
        self.version = version
        self.ts_ms = ts_ms
        self.label = label
        self.dv = dv
        self.dv_old = dv_old


def _parse_commit(commit_path: str):
    adds, removes, cdcs, info, meta_changed = [], [], [], {}, False
    with open(commit_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a = json.loads(line)
            if a.get("add"):
                adds.append(a["add"])
            elif a.get("remove"):
                removes.append(a["remove"])
            elif a.get("cdc"):
                cdcs.append(a["cdc"])
            elif a.get("commitInfo"):
                info = a["commitInfo"]
            elif a.get("metaData"):
                meta_changed = True
    return adds, removes, cdcs, info, meta_changed


class DeltaCDFStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_version: int, schema_fields):
        from witdb_spark.sources.delta_log import _list_log

        self.path = path
        self.start_version = starting_version
        self.fields = schema_fields  # [(name, ddl, physical name)]
        commits, _ = _list_log(path)
        if not commits:
            raise ValueError(f"{path}: empty _delta_log")
        self._commits = commits

    def initialOffset(self) -> dict:
        # "changes THROUGH version N served" — the first batch starts
        # at start_version
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        from witdb_spark.sources.delta_log import _list_log

        commits, checkpoints = _list_log(self.path)
        self._commits = commits
        return {"version": max(list(commits) + list(checkpoints))}

    def commit(self, end: dict) -> None:
        pass

    def _dv_state_at(self, version: int) -> dict[str, str]:
        """file rel path -> DV descriptor json, as of ``version``
        (inclusive) — a pure-python walk of the commit JSONs (the
        stream refuses vacuumed history like the batch reader)."""
        state: dict[str, str] = {}
        for v in range(0, version + 1):
            if v not in self._commits:
                raise ValueError(
                    f"commit {v} no longer in the log — the CDF stream"
                    " needs the original commit JSONs"
                )
            adds, removes, _, _, _ = _parse_commit(self._commits[v])
            add_paths = set()
            for add in adds:
                add_paths.add(add["path"])
                if add.get("deletionVector"):
                    state[add["path"]] = json.dumps(
                        add["deletionVector"]
                    )
                else:
                    state.pop(add["path"], None)
            for r in removes:
                if r["path"] not in add_paths:
                    state.pop(r["path"], None)
        return state

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        missing = [
            v for v in range(lo + 1, hi + 1) if v not in self._commits
        ]
        if missing:
            raise ValueError(
                f"commit(s) {missing[:3]} no longer in the log — the"
                " CDF stream needs the original commit JSONs"
            )
        dv_state = self._dv_state_at(lo) if lo >= 0 else {}
        items: list[_ChangeItem] = []
        for v in range(lo + 1, hi + 1):
            adds, removes, cdcs, info, meta_changed = _parse_commit(
                self._commits[v]
            )
            if meta_changed and v > self.start_version:
                raise ValueError(
                    f"schema/metadata change at version {v} inside the"
                    " CDF stream — restart the stream from it"
                )
            ts = int(
                info.get("timestamp")
                or int(os.path.getmtime(self._commits[v]) * 1000)
            )

            def ap(rel):
                return os.path.abspath(
                    os.path.join(self.path, unquote(rel))
                )

            if cdcs:
                items += [
                    _ChangeItem(
                        "cdc", ap(c["path"]), c.get("partitionValues"),
                        v, ts,
                    )
                    for c in cdcs
                ]
            else:
                op = str(info.get("operation") or "").upper()
                pre = "update_preimage" if op == "UPDATE" else "delete"
                post = "update_postimage" if op == "UPDATE" else "insert"
                removed = {
                    r["path"]: r
                    for r in removes
                    if r.get("dataChange", True)
                }
                readded = set()
                for add in adds:
                    if not add.get("dataChange", True):
                        continue
                    rel = add["path"]
                    new_dv = (
                        json.dumps(add["deletionVector"])
                        if add.get("deletionVector")
                        else None
                    )
                    if rel in removed:
                        readded.add(rel)
                        old_dv = dv_state.get(rel)
                        if new_dv == old_dv:
                            continue  # metadata-only re-add
                        items.append(
                            _ChangeItem(
                                "dvdiff", ap(rel),
                                add.get("partitionValues"), v, ts,
                                label=pre, dv=new_dv, dv_old=old_dv,
                            )
                        )
                    else:
                        items.append(
                            _ChangeItem(
                                "rows", ap(rel),
                                add.get("partitionValues"), v, ts,
                                label=post, dv=new_dv,
                            )
                        )
                for rel, r in removed.items():
                    if rel in readded:
                        continue
                    items.append(
                        _ChangeItem(
                            "rows", ap(rel), r.get("partitionValues"),
                            v, ts, label=pre, dv=dv_state.get(rel),
                        )
                    )
            # roll DV state forward for the NEXT version in the batch
            add_paths = set()
            for add in adds:
                add_paths.add(add["path"])
                if add.get("deletionVector"):
                    dv_state[add["path"]] = json.dumps(
                        add["deletionVector"]
                    )
                else:
                    dv_state.pop(add["path"], None)
            for r in removes:
                if r["path"] not in add_paths:
                    dv_state.pop(r["path"], None)
        # attach reader context (fields + table root travel with each
        # serialized partition; O(schema), not O(rows))
        for it in items:
            it.fields = self.fields
            it.table = os.path.abspath(self.path)
        return items

    def read(self, partition: _ChangeItem):
        """Executor-side decode: pyarrow parquet + the pure-python DV
        reader; yields tuples in the declared schema order."""
        import pyarrow.parquet as pq

        from witdb_spark.sources.delta_log import (
            _typed_partition_value,
            read_deletion_vector,
        )

        it = partition
        table = pq.read_table(it.abs_path)
        names = set(table.schema.names)
        ts = datetime.datetime.fromtimestamp(
            it.ts_ms / 1000.0, tz=datetime.timezone.utc
        )
        if it.kind == "dvdiff":
            keep = set(
                read_deletion_vector(it.table, json.loads(it.dv))
            )
            if it.dv_old:
                keep -= set(
                    read_deletion_vector(it.table, json.loads(it.dv_old))
                )
            rows_iter = (
                (i, r)
                for i, r in enumerate(table.to_pylist())
                if i in keep
            )
        elif it.kind == "rows" and it.dv:
            dead = set(
                read_deletion_vector(it.table, json.loads(it.dv))
            )
            rows_iter = (
                (i, r)
                for i, r in enumerate(table.to_pylist())
                if i not in dead
            )
        else:
            rows_iter = enumerate(table.to_pylist())
        for _i, rec in rows_iter:
            out = []
            for name, ddl, phys in it.fields:
                if name == "_change_type":
                    out.append(
                        rec["_change_type"]
                        if it.kind == "cdc"
                        else it.label
                    )
                elif name == "_commit_version":
                    out.append(it.version)
                elif name == "_commit_timestamp":
                    out.append(ts)
                elif phys in names:  # data files store PHYSICAL names
                    out.append(rec[phys])
                else:  # partition column: typed from the action
                    # (partitionValues are keyed physically too)
                    v = _typed_partition_value(it.pv.get(phys), ddl)
                    out.append(None if v is NotImplemented else v)
            yield tuple(out)


class DeltaCDFDataSource(DataSource):
    """spark.readStream.format('witdb_delta_cdf').option('path', p)"""

    @classmethod
    def name(cls) -> str:
        return "witdb_delta_cdf"

    def _table_schema(self):
        from pyspark.sql.types import StructType

        from witdb_spark.sources.delta_log import (
            DeltaProtocolError,
            _cdf_enabled,
            _snapshot_state,
        )

        from pyspark.sql import SparkSession

        path = self.options["path"]
        # schema() runs on the driver, where a session exists (needed
        # only if the log is checkpoint-subsumed)
        spark = SparkSession.getActiveSession()
        _, metadata, _, _ = _snapshot_state(
            spark, path, None, None,
            allow_dvs=True, allow_name_mapping=True,
        )
        if not _cdf_enabled(metadata):
            raise DeltaProtocolError(
                "the CDF stream requires delta.enableChangeDataFeed="
                "true on the table"
            )
        cm_mode = (metadata.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if cm_mode == "id":
            raise DeltaProtocolError(
                "the CDF STREAM serves mode=name column mapping;"
                " mode=id needs field-id resolution — use the batch"
                " delta_table_changes"
            )
        st = StructType.fromJson(json.loads(metadata["schemaString"]))
        if cm_mode == "name" and any(
            f.dataType.typeName() in ("struct", "array", "map")
            for f in st.fields
        ):
            raise DeltaProtocolError(
                "the CDF STREAM serves FLAT column-mapped schemas —"
                " nested mapped types need the batch reader"
            )
        return st

    def schema(self) -> str:
        st = self._table_schema()
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
        )
        return (
            f"{cols}, `_change_type` string,"
            " `_commit_version` bigint, `_commit_timestamp` timestamp"
        )

    def streamReader(self, schema) -> DeltaCDFStreamReader:
        # mode=name column mapping (flat — gated in schema()): data
        # files and partitionValues are keyed PHYSICALLY; ship the
        # per-field physical name with the schema triple
        st = self._table_schema()
        from witdb_spark.sources.delta_log import _cm_physical_name

        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        from witdb_spark.sources.delta_log import _snapshot_state

        _, metadata, _, _ = _snapshot_state(
            spark, self.options["path"], None, None,
            allow_dvs=True, allow_name_mapping=True,
        )
        mapped = (metadata.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        ) == "name"
        phys = {
            f.name: (_cm_physical_name(f) if mapped else f.name)
            for f in st.fields
        }
        fields = [
            (f.name, f.dataType.simpleString(), phys.get(f.name, f.name))
            for f in schema.fields
        ]
        return DeltaCDFStreamReader(
            self.options["path"],
            int(self.options.get("starting_version", 0)),
            fields,
        )
