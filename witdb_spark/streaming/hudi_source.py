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
pure-ADD commits on meta-less COW files, and for meta-less COW
REWRITES (r15 — this previously refused) attributed by an
executor-side anti-diff against the retired file groups' base files:
the commit's rows are the new file's rows minus the rows carried
over unchanged, which under hudi's unique-record-key contract is
exactly the per-key change-image set; the diff still refuses loudly
when the predecessor state is not reconstructible (cleaned files, or
retired groups that carried logs without meta columns) — and
log-file records whose block INSTANT_TIME matches (AVRO/PARQUET/
HFILE blocks alike; tombstones do not emit — hudi's own incremental
mode serves no delete images either).
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
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _ChangeFile(InputPartition):
    def __init__(
        self, kind, abs_path, instant, out_schema, op="", prev_paths=()
    ):
        self.kind = kind  # "base" | "log"
        self.abs_path = abs_path
        self.instant = instant
        self.out_schema = out_schema  # pyspark StructType (output)
        self.op = op  # "rewrite" | "add" (routing for meta-less files)
        # predecessor base files of the file groups this rewrite
        # RETIRED in the same partition (r15): the anti-diff base for
        # meta-less COW attribution; () for adds, None when the
        # predecessor state is not reconstructible (log-bearing or
        # cleaned groups) so the diff path must refuse
        self.prev_paths = prev_paths


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
        return _plan_change_files(
            self.path, self.out_schema,
            start["instant"], end["instant"],
        )

    def read(self, partition: _ChangeFile):
        return _read_change_partition(partition)


def _plan_change_files(path, out_schema, lo, hi):
    """Driver-side change planning shared by the STREAM reader and the
    r15 BATCH reader: every commit in (lo, hi] maps to its written
    files, with the timeline fold supplying each rewrite's predecessor
    base files for the meta-less COW anti-diff."""
    from witdb_spark.sources.hudi_meta import _completed_instants

    if lo == hi:
        return []
    items: list[_ChangeFile] = []
    # fold the WHOLE timeline in instant order so each rewrite in
    # (lo, hi] can look up the base files of the groups it retired
    # AS OF just before it committed — the anti-diff predecessors
    # meta-less COW attribution needs (r15). The fold is the same
    # (partition, fileId) -> newest-base walk hudi_base_files does;
    # metadata-scale, driver-side, like every planner here.
    groups: dict[tuple, str] = {}  # (part, fid) -> rel base path
    logged: set[tuple] = set()  # (part, fid) with log files
    for instant, action, fpath in _completed_instants(path):
        if action not in (
            "commit", "deltacommit", "replacecommit"
        ):
            continue  # clean/rollback carry no row images
        with open(fpath) as f:
            body = f.read().strip()
        meta = json.loads(body) if body else {}
        compaction = action == "replacecommit" and str(
            meta.get("operationType") or ""
        ).upper() in ("COMPACT", "CLUSTER", "CLUSTERING")
        wstats = meta.get("partitionToWriteStats") or {}
        replaced = meta.get("partitionToReplaceFileIds") or {}
        if lo < instant <= hi and not compaction:
            # rows move, none change, under compaction (hudi's
            # incremental reader skips these too); UPSERT/DELETE
            # replacecommits DO carry new row images and stream
            # pure-add commits (create/append/bulk insert) own
            # every row of their files; anything that RETIRES
            # file groups is a rewrite
            op = (
                "rewrite"
                if action == "replacecommit" or replaced
                else "add"
            )
            prev_by_part: dict[str, tuple | None] = {}
            if op == "rewrite":
                for part, fids in replaced.items():
                    if any((part, fid) in logged for fid in fids):
                        # a retired group had log files: its full
                        # row state is base+logs, not the base
                        # alone — the diff path must refuse
                        prev_by_part[part] = None
                        continue
                    prev_by_part[part] = tuple(
                        os.path.join(path, groups[(part, fid)])
                        for fid in fids
                        if (part, fid) in groups
                    )
            for part, stats in wstats.items():
                for st in stats:
                    rel = st.get("path")
                    if not rel:
                        continue
                    ap = os.path.join(path, rel)
                    base = os.path.basename(rel)
                    if rel.endswith(".parquet"):
                        items.append(
                            _ChangeFile(
                                "base", ap, instant,
                                out_schema, op,
                                prev_by_part.get(part, ()),
                            )
                        )
                    elif ".log." in base:
                        items.append(
                            _ChangeFile(
                                "log", ap, instant,
                                out_schema, op,
                            )
                        )
        # apply this instant to the fold AFTER planning against
        # the pre-instant state
        for part, fids in replaced.items():
            for fid in fids:
                groups.pop((part, fid), None)
                logged.discard((part, fid))
        for part, stats in wstats.items():
            for st in stats:
                fid, rel = st.get("fileId"), st.get("path")
                if not fid or not rel:
                    continue
                if rel.endswith(".parquet"):
                    groups[(part, fid)] = rel
                else:
                    logged.add((part, fid))
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

def _read_change_partition(partition: _ChangeFile):
    """Executor-side decode to pyarrow RecordBatches (shared by the
    stream and batch readers)."""
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
        elif partition.prev_paths is None:
            # the retired groups' pre-rewrite state is not
            # reconstructible (log-bearing groups without meta
            # columns) — refuse rather than misattribute
            raise ValueError(
                f"{partition.abs_path}: rewrite commit retired"
                " log-bearing file groups on a table without"
                " _hoodie_commit_time — per-row attribution needs"
                " the hudi-spark bundle (or a MERGE_ON_READ table)"
            )
        else:
            # meta-less COW rewrite (UPSERT/DELETE, r15 — the gate
            # this replaced refused outright): the commit's rows
            # are the new file's rows MINUS the rows carried over
            # unchanged from the file groups it retired in the
            # same partition. Hudi record keys are unique per
            # group, so the full-row anti-diff is exactly the
            # per-key change-image set: updated rows differ,
            # carried rows match, fresh inserts match nothing.
            # Executor-side, bounded by the file-group size — the
            # same memory bound the MOR base+log merge carries.
            # Rows moved ACROSS partitions by an update emit in
            # their new partition (they match no predecessor
            # there), matching upsert change semantics. Tombstones
            # do not emit, like hudi's own incremental mode.
            missing = [
                p for p in partition.prev_paths
                if not os.path.exists(p)
            ]
            if missing:
                raise ValueError(
                    f"{partition.abs_path}: predecessor base"
                    f" file(s) {missing[:2]} of the rewrite were"
                    " cleaned — re-anchor the stream with"
                    " starting_instant past this commit"
                )
            if partition.prev_paths:
                data_cols = [
                    f.name
                    for f in out_schema
                    if f.name != "_commit_instant"
                    and f.name in tbl.schema.names
                ]
                new_pd = (
                    tbl.select(data_cols)
                    .to_pandas()
                    .reset_index(drop=True)
                )
                prev_pd = pa.concat_tables(
                    [
                        pq.read_table(p, columns=data_cols)
                        for p in partition.prev_paths
                    ],
                    promote_options="permissive",
                ).to_pandas()
                try:
                    marked = new_pd.merge(
                        prev_pd.drop_duplicates(),
                        on=data_cols,
                        how="left",
                        indicator=True,
                    )
                except TypeError as e:  # unhashable column types
                    raise ValueError(
                        f"{partition.abs_path}: COW rewrite"
                        " attribution cannot diff nested/"
                        f" unhashable columns jar-free ({e}) —"
                        " use a MERGE_ON_READ table"
                    ) from e
                keep = (
                    marked["_merge"] == "left_only"
                ).to_numpy()
                tbl = tbl.filter(pa.array(keep))
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

    def reader(self, schema) -> "HudiChangesBatchReader":
        return HudiChangesBatchReader(
            self.options["path"],
            self.options.get("starting_instant"),
            self.options.get("ending_instant"),
            schema,
        )


class HudiChangesBatchReader(DataSourceReader):
    """BATCH incremental change read over the same planner/decoder the
    stream uses (r15): spark.read.format('witdb_hudi_changes') with
    starting_instant (exclusive; required) and ending_instant
    (inclusive; default latest). This is what lets
    hudi_meta.hudi_incremental_read serve COW tables — per-commit
    change images fold to latest-per-key batch semantics there."""

    def __init__(self, path, starting_instant, ending_instant, schema):
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
                " (hoodie.populate.meta.fields=false) cannot read"
                " incrementally jar-free"
            )
        if starting_instant is None:
            raise ValueError(
                "batch witdb_hudi_changes needs starting_instant"
                " (exclusive) — omit only on the streaming path"
            )
        completed = _completed_instants(path)
        self.path = path
        self.lo = str(starting_instant)
        self.hi = (
            str(ending_instant)
            if ending_instant is not None
            else (completed[-1][0] if completed else self.lo)
        )
        self.out_schema = schema

    def partitions(self):
        return _plan_change_files(
            self.path, self.out_schema, self.lo, self.hi
        )

    def read(self, partition: _ChangeFile):
        return _read_change_partition(partition)
