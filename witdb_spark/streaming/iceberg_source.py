"""Structured Streaming source for Iceberg INCREMENTAL APPEND reads —
a Spark 4 python DataSource (pyspark.sql.datasource): offsets are
snapshot ids along MAIN's lineage, each microbatch serves the data
files ADDED by the snapshots between its offsets, and the parquet
decode runs ON EXECUTORS with pyarrow. The streaming twin of
sources/iceberg_meta.iceberg_incremental_scan (spec 'Incremental
processing'; Spark's own start/end-snapshot-id batch options) — and of
the reference's append-only consumption pattern.

Usage:
    spark.dataSource.register(IcebergAppendsDataSource)
    (spark.readStream.format("witdb_iceberg_appends")
        .option("path", table_path)
        .load())            # streams snapshots committed AFTER start

Every snapshot in a batch must be an APPEND (overwrite/delete/replace
change or remove rows, which an append-only consumer cannot
represent) — anything else fails the batch loudly, the same contract
the batch scan and the library enforce. Branch commits (r12 refs) are
excluded via the main-ancestry walk. Output = table columns +
``_snapshot_id``.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _AddedFile(InputPartition):
    def __init__(self, abs_path, snapshot_id, out_schema):
        self.abs_path = abs_path
        self.snapshot_id = snapshot_id
        self.out_schema = out_schema  # pyspark StructType (output)


def _main_snapshots(meta: dict) -> list[dict]:
    from witdb_spark.sources.iceberg_meta import _main_ancestry_ids

    snaps = sorted(
        meta.get("snapshots") or [],
        key=lambda s: (s["timestamp-ms"], s["snapshot-id"]),
    )
    main_ids = _main_ancestry_ids(meta)
    if main_ids is not None:
        snaps = [s for s in snaps if s["snapshot-id"] in main_ids]
    return snaps


class IcebergAppendsStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_snapshot, out_schema):
        from witdb_spark.sources.iceberg_meta import _current_metadata

        self.path = path
        self.out_schema = out_schema
        meta = _current_metadata(path)
        snaps = _main_snapshots(meta)
        if not snaps:
            raise ValueError(f"{path}: Iceberg table has no snapshots")
        if starting_snapshot is None:
            # stream everything committed AFTER the stream's start
            self.start_id = meta.get(
                "current-snapshot-id", snaps[-1]["snapshot-id"]
            )
        else:
            self.start_id = int(starting_snapshot)
            if all(
                s["snapshot-id"] != self.start_id for s in snaps
            ):
                raise ValueError(
                    f"unknown starting snapshot {self.start_id}"
                )

    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_id}

    def latestOffset(self) -> dict:
        from witdb_spark.sources.iceberg_meta import _current_metadata

        meta = _current_metadata(self.path)
        snaps = _main_snapshots(meta)
        return {
            "snapshot_id": meta.get(
                "current-snapshot-id", snaps[-1]["snapshot-id"]
            )
        }

    def commit(self, end: dict) -> None:
        pass

    def partitions(self, start: dict, end: dict):
        from witdb_spark.sources.avro_codec import read_avro_file
        from witdb_spark.sources.iceberg_meta import (
            _current_metadata,
            _resolve,
        )

        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        if lo == hi:
            return []
        meta = _current_metadata(self.path)
        snaps = _main_snapshots(meta)
        order = [s["snapshot-id"] for s in snaps]
        if lo not in order or hi not in order:
            raise ValueError(
                f"snapshot range [{lo}, {hi}] off main's lineage —"
                " expired or branch-only snapshots cannot stream"
            )
        by_id = {s["snapshot-id"]: s for s in snaps}
        items: list[_AddedFile] = []
        for sid in order[order.index(lo) + 1 : order.index(hi) + 1]:
            s = by_id[sid]
            op = str((s.get("summary") or {}).get("operation") or "")
            if op != "append":
                raise ValueError(
                    f"snapshot {sid} is {op or 'unknown'!r} — the"
                    " appends stream covers APPEND-only ranges"
                    " (restart from its snapshot after handling it)"
                )
            _, manifests = read_avro_file(
                _resolve(self.path, s["manifest-list"])
            )
            for m in manifests:
                if m.get("content", 0) != 0:
                    continue
                if (
                    m.get("added_snapshot_id") is not None
                    and m["added_snapshot_id"] != sid
                ):
                    continue
                _, entries = read_avro_file(
                    _resolve(self.path, m["manifest_path"])
                )
                for e in entries:
                    if e.get("status", 1) != 1:  # ADDED entries only
                        continue
                    rec = e["data_file"]
                    if rec.get("content", 0) != 0:
                        continue
                    items.append(
                        _AddedFile(
                            _resolve(self.path, rec["file_path"]),
                            sid,
                            self.out_schema,
                        )
                    )
        return items

    def read(self, partition: _AddedFile):
        """Executor-side decode: yields pyarrow RecordBatches (r13 —
        column operations, no per-row python objects). Columns a file
        predates (schema evolution) are null columns; _snapshot_id is
        a constant column."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        if n == 0:
            return
        out_schema = to_arrow_schema(partition.out_schema)
        names = set(tbl.schema.names)
        cols = []
        for f in out_schema:
            if f.name == "_snapshot_id":
                col = pa.repeat(
                    pa.scalar(partition.snapshot_id, f.type), n
                )
            elif f.name in names:
                col = tbl.column(f.name).combine_chunks()
                if col.type != f.type:
                    col = col.cast(f.type)
            else:
                col = pa.nulls(n, f.type)
            cols.append(col)
        out = pa.Table.from_arrays(cols, schema=out_schema)
        yield from out.combine_chunks().to_batches()


class IcebergAppendsDataSource(DataSource):
    """spark.readStream.format('witdb_iceberg_appends')"""

    @classmethod
    def name(cls) -> str:
        return "witdb_iceberg_appends"

    def schema(self) -> str:
        from witdb_spark.sources.iceberg_meta import (
            _current_metadata,
            _ice_type_ddl,
            _table_schema,
        )

        meta = _current_metadata(self.options["path"])
        cols = ", ".join(
            f"`{f['name']}` {_ice_type_ddl(f['type'])}"
            for f in _table_schema(meta)["fields"]
        )
        return f"{cols}, `_snapshot_id` bigint"

    def streamReader(self, schema) -> IcebergAppendsStreamReader:
        return IcebergAppendsStreamReader(
            self.options["path"],
            self.options.get("starting_snapshot"),
            schema,
        )
