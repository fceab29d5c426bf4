"""Structured Streaming source for Hudi INCREMENTAL CHANGE reads — a
Spark 4 python DataSource, the hudi member of the source family
(cdf_source.py: delta CDF; iceberg_source.py: iceberg appends) and the
streaming twin of sources/hudi_meta.hudi_incremental_read (hudi's
hoodie.datasource.query.type=incremental, the consumption pattern
DeltaStreamer pipelines chain on).

Offsets are COMPLETED timeline instants (lexicographically ordered
timestamps — timeline order IS string order). Each microbatch serves
the records WRITTEN by the commits/deltacommits in (start, end]:
base parquet files from each commit's partitionToWriteStats —
filtered to rows whose _hoodie_commit_time IS that instant when the
file carries meta columns (MOR base groups: a rewrite preserves old
rows' commit times, so only changed rows emit), served whole for
pure-ADD commits on meta-less COW files, refused loudly for COW
rewrites (the gate hudi_incremental_read enforces: no per-row commit
material jar-free) — and log-file records whose block INSTANT_TIME
matches (AVRO/PARQUET/HFILE blocks alike; tombstones do not emit —
hudi's own incremental mode serves no delete images either).
Compaction/clustering replacecommits move rows without changing them
and are skipped, like hudi's incremental reader.

Semantics note: a catch-up batch spanning N commits emits one image
PER COMMIT of a twice-updated key (an upsert change stream keyed by
_hoodie_record_key + _commit_instant); hudi's batch incremental
collapses to the latest image. Per-microbatch (the steady state:
one commit per batch) the two are identical.

Decode runs ON EXECUTORS as pyarrow RecordBatches. Virtual-key
tables (hoodie.populate.meta.fields=false) refuse loudly — without
per-row commit provenance the rewrite-filter cannot be applied.

Usage:
    spark.dataSource.register(HudiChangesDataSource)
    (spark.readStream.format("witdb_hudi_changes")
        .option("path", table_path)
        .option("starting_instant", instant)   # exclusive; default:
        .load())                               # latest at stream start
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _ChangeFile(InputPartition):
    def __init__(self, kind, abs_path, instant, out_schema, op=""):
        self.kind = kind  # "base" | "log"
        self.abs_path = abs_path
        self.instant = instant
        self.out_schema = out_schema  # pyspark StructType (output)
        self.op = op  # "rewrite" | "add" (routing for meta-less files)


def _newest_base_file(path: str) -> str | None:
    best = None
    for dirpath, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for f in files:
            if not f.endswith(".parquet") or f.startswith("."):
                continue
            stem = f[: -len(".parquet")]
            instant = stem.rsplit("_", 1)[-1]
            if best is None or instant > best[0]:
                best = (instant, os.path.join(dirpath, f))
    return best[1] if best else None


class HudiChangesStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_instant, out_schema):
        from witdb_spark.sources.hudi_meta import (
            _completed_instants,
            _properties,
        )

        props = _properties(path)
        if (
            props.get("hoodie.populate.meta.fields", "true").lower()
            == "false"
        ):
            raise ValueError(
                "witdb_hudi_changes needs per-row commit provenance"
                " (_hoodie_commit_time); virtual-key tables"
                " (hoodie.populate.meta.fields=false) cannot stream"
                " incrementally jar-free"
            )
        self.path = path
        self.out_schema = out_schema
        completed = _completed_instants(path)
        if starting_instant is not None:
            self.start = str(starting_instant)
        else:
            # stream commits that land AFTER the stream's start
            self.start = completed[-1][0] if completed else ""

    def initialOffset(self) -> dict:
        return {"instant": self.start}

    def latestOffset(self) -> dict:
        from witdb_spark.sources.hudi_meta import _completed_instants

        completed = _completed_instants(self.path)
        return {
            "instant": completed[-1][0] if completed else self.start
        }

    def commit(self, end: dict) -> None:
        pass

    def partitions(self, start: dict, end: dict):
        from witdb_spark.sources.hudi_meta import _completed_instants

        lo, hi = start["instant"], end["instant"]
        if lo == hi:
            return []
        items: list[_ChangeFile] = []
        for instant, action, fpath in _completed_instants(self.path):
            if not (lo < instant <= hi):
                continue
            if action not in (
                "commit", "deltacommit", "replacecommit"
            ):
                continue  # clean/rollback carry no row images
            with open(fpath) as f:
                body = f.read().strip()
            meta = json.loads(body) if body else {}
            if action == "replacecommit" and str(
                meta.get("operationType") or ""
            ).upper() in ("COMPACT", "CLUSTER", "CLUSTERING"):
                # rows move, none change (hudi's incremental reader
                # skips these too); UPSERT/DELETE replacecommits DO
                # carry new row images and stream (the per-row
                # commit-time filter isolates them)
                continue
            for stats in (
                meta.get("partitionToWriteStats") or {}
            ).values():
                for st in stats:
                    rel = st.get("path")
                    if not rel:
                        continue
                    ap = os.path.join(self.path, rel)
                    base = os.path.basename(rel)
                    # pure-add commits (create/append/bulk insert)
                    # own every row of their files; anything that
                    # RETIRES file groups is a rewrite
                    op = (
                        "rewrite"
                        if action == "replacecommit"
                        or meta.get("partitionToReplaceFileIds")
                        else "add"
                    )
                    if rel.endswith(".parquet"):
                        items.append(
                            _ChangeFile(
                                "base", ap, instant,
                                self.out_schema, op,
                            )
                        )
                    elif ".log." in base:
                        items.append(
                            _ChangeFile(
                                "log", ap, instant, self.out_schema, op
                            )
                        )
        # a log file accrues blocks across commits and appears in
        # several instants' writeStats — the per-partition instant
        # filter keeps each (file, instant) pair exact; dedup pairs
        seen: set[tuple] = set()
        out = []
        for it in items:
            key = (it.kind, it.abs_path, it.instant)
            if key not in seen:
                seen.add(key)
                out.append(it)
        return out

    def read(self, partition: _ChangeFile):
        """Executor-side decode to pyarrow RecordBatches."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(partition.out_schema)

        def shape(tbl: "pa.Table"):
            n = tbl.num_rows
            if n == 0:
                return
            names = set(tbl.schema.names)
            cols = []
            for f in out_schema:
                if f.name == "_commit_instant":
                    col = pa.repeat(
                        pa.scalar(partition.instant, f.type), n
                    )
                elif f.name in names:
                    col = tbl.column(f.name).combine_chunks()
                    if col.type != f.type:
                        col = col.cast(f.type)
                else:
                    col = pa.nulls(n, f.type)
                cols.append(col)
            yield from (
                pa.Table.from_arrays(cols, schema=out_schema)
                .combine_chunks()
                .to_batches()
            )

        if partition.kind == "base":
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.abs_path)
            if "_hoodie_commit_time" in tbl.schema.names:
                # MOR base groups carry per-row provenance: only the
                # commit's own rows emit (a rewrite preserves old
                # rows' commit times)
                tbl = tbl.filter(
                    pc.equal(
                        pc.cast(
                            tbl.column("_hoodie_commit_time"),
                            pa.string(),
                        ),
                        partition.instant,
                    )
                )
            elif partition.op == "add":
                pass  # fully-new file: every row belongs to the commit
            else:
                # meta-less COW rewrite (UPSERT/DELETE): the same gate
                # hudi_incremental_read enforces — no per-row commit
                # material jar-free
                raise ValueError(
                    f"{partition.abs_path}: {partition.op or 'rewrite'}"
                    " commit on a table without _hoodie_commit_time —"
                    " incremental streams need a MERGE_ON_READ table"
                    " (COW rows carry no commit provenance jar-free)"
                )
            yield from shape(tbl)
            return
        from witdb_spark.sources.hudi_log import log_entries

        recs = [
            r
            for r, inst, is_del in log_entries(partition.abs_path)
            if inst == partition.instant and not is_del
        ]
        if not recs:
            return
        arrays = []
        for f in out_schema:
            if f.name == "_commit_instant":
                arrays.append(
                    pa.repeat(
                        pa.scalar(partition.instant, f.type),
                        len(recs),
                    )
                )
            else:
                arrays.append(
                    pa.array(
                        [r.get(f.name) for r in recs], type=f.type
                    )
                )
        yield from (
            pa.Table.from_arrays(arrays, schema=out_schema)
            .combine_chunks()
            .to_batches()
        )


class HudiChangesDataSource(DataSource):
    """spark.readStream.format('witdb_hudi_changes')"""

    @classmethod
    def name(cls) -> str:
        return "witdb_hudi_changes"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructField, StringType, StructType

        base = _newest_base_file(self.options["path"])
        if base is None:
            raise ValueError(
                f"{self.options['path']}: no base parquet file to"
                " derive the stream schema from"
            )
        arrow = pq.read_schema(base)
        st = from_arrow_schema(arrow)
        return StructType(
            list(st.fields)
            + [StructField("_commit_instant", StringType())]
        )

    def streamReader(self, schema) -> HudiChangesStreamReader:
        return HudiChangesStreamReader(
            self.options["path"],
            self.options.get("starting_instant"),
            schema,
        )
