"""Jar-free Apache Hudi copy-on-write read path (public table layout).

Reference analog: plugin/trino-hudi (HudiReadOptimizedDirectoryLister)
serves read-optimized COW snapshots: the newest base parquet file per
file group among COMPLETED commits. The on-disk layout is public
(hudi.apache.org/docs — ``.hoodie/`` timeline of ``<instant>.commit``
JSON actions plus ``hoodie.properties``): each commit's
``partitionToWriteStats`` names the base files it wrote per file group
(fileId), and a ``replacecommit`` (clustering / insert-overwrite)
additionally retires whole file groups via
``partitionToReplaceFileIds``. Folding the timeline in instant order
yields the active base-file set; the data scan is then an ordinary
distributed parquet read (COW base files carry full rows, including
partition columns and the ``_hoodie_*`` meta columns).

Loud scope-outs: MERGE_ON_READ tables (log-file compaction needs the
Hudi runtime) and unknown timeline actions that change visible data.
Pending instants (``.inflight`` / ``.requested``) are ignored — that
IS snapshot isolation on the timeline.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession


class HudiProtocolError(RuntimeError):
    pass


_COMPLETED_RE = re.compile(
    r"^(\d+)(?:_(\d+))?\.(commit|replacecommit)$"
)


def _meta_dir(path: str) -> str:
    return os.path.join(path, ".hoodie")


def _properties(path: str) -> dict[str, str]:
    p = os.path.join(_meta_dir(path), "hoodie.properties")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{path} is not a Hudi table (no .hoodie/hoodie.properties)"
        )
    props = {}
    for line in open(p):
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        props[k.strip()] = v.strip()
    return props


def _completed_instants(path: str) -> list[tuple[str, str, str]]:
    """Sorted (instant, action, file) for completed commits. Hudi
    instants are lexicographically ordered timestamps (yyyyMMddHHmmss
    plus optional millis), so string sort IS timeline order."""
    out = []
    for name in os.listdir(_meta_dir(path)):
        m = _COMPLETED_RE.match(name)
        if m:
            out.append(
                (m.group(1), m.group(3), os.path.join(_meta_dir(path), name))
            )
    return sorted(out)


def hudi_base_files(
    path: str, as_of_instant: str | None = None
) -> list[str]:
    """Fold the timeline into the active base-file list (read-optimized
    COW snapshot, optionally at/before ``as_of_instant``)."""
    props = _properties(path)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise HudiProtocolError(
            f"Hudi table type {ttype} needs the hudi-spark bundle"
            " (merge-on-read log compaction)"
        )
    instants = _completed_instants(path)
    if as_of_instant is not None:
        instants = [i for i in instants if i[0] <= str(as_of_instant)]
    if not instants:
        raise FileNotFoundError(f"{path}: no completed Hudi commits")
    # (partition, fileId) -> (instant, relative path)
    groups: dict[tuple[str, str], tuple[str, str]] = {}
    for instant, action, fpath in instants:
        with open(fpath) as f:
            body = f.read().strip()
        meta = json.loads(body) if body else {}
        if action == "replacecommit":
            for part, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    groups.pop((part, fid), None)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats:
                fid, rel = st.get("fileId"), st.get("path")
                if not fid or not rel:
                    continue
                prev = groups.get((part, fid))
                if prev is None or instant >= prev[0]:
                    groups[(part, fid)] = (instant, rel)
    return sorted(
        os.path.join(path, rel) for _, rel in groups.values()
    )


def read_hudi_snapshot(
    spark: SparkSession, path: str, as_of_instant: str | None = None
) -> DataFrame:
    """Read a Hudi COW table at a snapshot (latest completed commit, or
    at/before ``as_of_instant``) without the connector jar. COW base
    files carry full rows, so the scan is plain distributed parquet;
    the ``_hoodie_*`` meta columns surface like Hudi's own reader. A
    snapshot whose every file group was retired (delete-all) reads as a
    TYPED empty frame from the newest commit's schema metadata."""
    files = hudi_base_files(path, as_of_instant)
    if files:
        return spark.read.parquet(*files)
    from pyspark.sql.types import StructType

    instants = _completed_instants(path)
    if as_of_instant is not None:
        instants = [i for i in instants if i[0] <= str(as_of_instant)]
    for _, _, fpath in reversed(instants):
        with open(fpath) as f:
            body = f.read().strip()
        schema_json = (
            (json.loads(body) if body else {})
            .get("extraMetadata", {})
            .get("schema")
        )
        if schema_json:
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
    raise HudiProtocolError(
        f"{path}: zero active file groups and no schema in the commit"
        " metadata (library-written table) — add the hudi-spark bundle"
    )


def _claim_instant(path: str) -> str:
    """Claim a commit instant FIRST (put-if-absent on a ``.requested``
    marker, Hudi's own protocol): two writers in the same millisecond
    would otherwise collide on the completed-commit filename only AFTER
    their data files were already published. The marker name carries NO
    action — a commit and a replacecommit claimed in the same
    millisecond must also conflict, or the timeline would hold two
    actions at one instant (ambiguous time travel). The completed-
    instants regex ignores ``.requested``, so claims are invisible to
    readers."""
    import datetime
    import time

    for _ in range(50):
        instant = datetime.datetime.utcnow().strftime(
            "%Y%m%d%H%M%S%f"
        )[:17]
        try:
            with open(
                os.path.join(_meta_dir(path), f"{instant}.requested"),
                "x",
            ):
                return instant
        except FileExistsError:
            time.sleep(0.001)
    raise HudiProtocolError("could not claim a commit instant")


def write_hudi(
    spark: SparkSession,
    df,
    path: str,
    mode: str = "append",
    record_key: str | None = None,
) -> str:
    """Jar-free Hudi COW write (create/append/overwrite as bulk-insert
    of fresh file groups; keyed UPSERT routes through hudi_upsert using
    parquet footer statistics instead of the bundle's record index).
    Each staged parquet file becomes its own file group; a commit JSON
    publishes them — overwrite retires every prior file group via a
    replacecommit, the timeline's own mechanism for insert-overwrite.
    ``record_key`` (create only) records
    hoodie.table.recordkey.fields in hoodie.properties, the same key
    real Hudi tables carry, enabling keyed hudi_upsert without an
    explicit key argument. Returns the commit instant."""
    import glob
    import shutil
    import uuid

    if mode not in ("create", "append", "overwrite"):
        raise ValueError("mode must be create/append/overwrite")
    exists = os.path.isdir(_meta_dir(path))
    if mode == "create" and exists:
        raise FileExistsError(f"{path} is already a Hudi table")
    if not exists:
        os.makedirs(_meta_dir(path))
        props_text = (
            "hoodie.table.name=%s\nhoodie.table.type=COPY_ON_WRITE\n"
            % os.path.basename(path.rstrip("/"))
        )
        if record_key:
            if record_key not in df.columns:
                raise HudiProtocolError(
                    f"record key {record_key!r} is not a column of the"
                    f" data ({df.columns})"
                )
            props_text += (
                f"hoodie.table.recordkey.fields={record_key}\n"
            )
        with open(
            os.path.join(_meta_dir(path), "hoodie.properties"), "w"
        ) as f:
            f.write(props_text)
    else:
        props = _properties(path)
        if props.get("hoodie.table.type", "COPY_ON_WRITE") != "COPY_ON_WRITE":
            raise HudiProtocolError(
                "writes to MERGE_ON_READ tables need the hudi-spark bundle"
            )
    action = (
        "replacecommit" if mode == "overwrite" and exists else "commit"
    )
    instant = _claim_instant(path)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    stats = []
    for f in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
        fid = uuid.uuid4().hex
        rel = f"{fid}_0_{instant}.parquet"
        shutil.move(f, os.path.join(path, rel))
        stats.append(
            {
                "fileId": fid,
                "path": rel,
                "totalWriteBytes": os.path.getsize(
                    os.path.join(path, rel)
                ),
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    meta: dict = {
        "partitionToWriteStats": {"": stats},
        # schema travels in the commit metadata (as real Hudi does) so
        # an all-rows-deleted table can still produce a TYPED empty read
        "extraMetadata": {"schema": df.schema.json()},
    }
    if action == "replacecommit":
        rels = [
            os.path.relpath(p, path) for p in hudi_base_files(path)
        ]
        if any(os.sep in r for r in rels):
            raise HudiProtocolError(
                "overwrite of a PARTITIONED Hudi table needs the"
                " hudi-spark bundle (partitioned replace bookkeeping)"
            )
        prior = {r.split("_", 1)[0] for r in rels}
        meta["partitionToReplaceFileIds"] = {"": sorted(prior)}
    target = os.path.join(_meta_dir(path), f"{instant}.{action}")
    # the .requested claim made this instant ours; 'x' stays as a belt
    with open(target, "x") as f:
        json.dump(meta, f)
    return instant


def hudi_commits(path: str) -> list[dict]:
    """Completed-commit history (reference `timeline` metadata)."""
    return [
        {"instant": i, "action": a}
        for i, a, _ in _completed_instants(path)
    ]


def _hudi_rewrite_matched(
    spark: SparkSession,
    path: str,
    matcher,
    rewrite,
    commit_on_no_match: bool = False,
    op: str = "DML",
    scan_files: list[str] | None = None,
) -> str | None:
    """Copy-on-write file-group rewrite shared by DELETE/UPDATE/MERGE:
    one replacecommit retires every file group ``matcher`` flags (it
    receives the __sf-annotated scan and returns the matching ``__sf``
    column) and publishes the surviving rows as fresh groups — the
    timeline's own mechanism, so readers (including as-of time travel)
    need nothing new. ``commit_on_no_match`` keeps going when no group
    matched (MERGE's pure-insert case). Returns the commit instant, or
    None when nothing was committed."""
    import glob
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from witdb_spark.sources.delta_log import _strip_uri

    files = hudi_base_files(path)
    by_abs = {os.path.abspath(f): f for f in files}
    if not files and not commit_on_no_match:
        return None
    if scan_files is not None:
        # keyed-upsert footer pruning: only a SUPERSET of the groups
        # that can contain matches needs scanning; the rest are never
        # read and never rewritten. Must be active files.
        unknown = [
            f for f in scan_files if os.path.abspath(f) not in by_abs
        ]
        if unknown:
            raise HudiProtocolError(
                f"scan pruning produced non-snapshot files: {unknown[:3]}"
            )
        files = sorted(scan_files)
    # staleness fence: remember the last completed instant we planned
    # against; a concurrent commit retiring the same groups would make
    # our survivors duplicate rows, so re-check before publishing
    base_last = _completed_instants(path)[-1][0]
    if files:
        df = spark.read.parquet(*files).withColumn(
            "__sf", F.input_file_name()
        )
    else:
        # zero active file groups (delete-all): MERGE pure inserts must
        # still commit against the typed empty frame
        df = read_hudi_snapshot(spark, path).withColumn("__sf", F.lit(""))
    if matcher is None:
        # clustering: the matched set is ALL active file groups, known
        # driver-side — no scan-and-collect, and zero-row file groups
        # (invisible to a row-derived matcher) are retired too
        matched_paths = [os.path.abspath(f) for f in files]
    else:
        matched_uris = [
            r["__sf"] for r in matcher(df).distinct().collect()
        ]
        if not matched_uris and not commit_on_no_match:
            return None
        matched_paths = []
        for u in matched_uris:
            ap = os.path.abspath(_strip_uri(u))
            if ap not in by_abs:
                raise HudiProtocolError(
                    f"scanned file {ap} not in the current snapshot"
                )
            matched_paths.append(ap)
    matched_fids = set()
    for ap in matched_paths:
        rel = os.path.relpath(ap, path)
        if os.sep in rel:
            raise HudiProtocolError(
                f"{op} on a PARTITIONED Hudi table needs the hudi-spark"
                " bundle (partitioned replace bookkeeping)"
            )
        matched_fids.add(os.path.basename(rel).split("_", 1)[0])

    if matcher is None:
        touched = df.drop("__sf")
    else:
        touched = (
            df.where(F.col("__sf").isin(matched_uris))
            if matched_uris
            else df.limit(0)
        ).drop("__sf")
    survivors = rewrite(touched).select(*touched.columns)
    if not matched_fids and survivors.isEmpty():
        # MERGE with nothing matched and nothing to insert: a true
        # no-op, detected BEFORE claiming an instant or staging files
        return None
    instant = _claim_instant(path)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    survivors.write.mode("overwrite").parquet(staging)
    import pyarrow.parquet as pq

    stats = []
    for f in sorted(glob.glob(os.path.join(staging, "part-*.parquet"))):
        if pq.ParquetFile(f).metadata.num_rows == 0:
            continue  # a fully-deleted file group leaves no survivor
        fid = uuid.uuid4().hex
        rel = f"{fid}_0_{instant}.parquet"
        shutil.move(f, os.path.join(path, rel))
        stats.append(
            {
                "fileId": fid,
                "path": rel,
                "totalWriteBytes": os.path.getsize(os.path.join(path, rel)),
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    if not stats and not matched_fids:
        # survivors were all zero-row part files: nothing to publish —
        # release the claimed instant so no-ops leave no litter
        os.remove(os.path.join(_meta_dir(path), f"{instant}.requested"))
        return None
    meta = {
        "partitionToWriteStats": {"": stats},
        "partitionToReplaceFileIds": {"": sorted(matched_fids)},
        "extraMetadata": {"schema": survivors.schema.json()},
    }
    if _completed_instants(path)[-1][0] != base_last:
        raise HudiProtocolError(
            f"{path}: concurrent commit during COW rewrite — rewritten"
            " file groups are stale; re-run the statement"
        )
    target = os.path.join(_meta_dir(path), f"{instant}.replacecommit")
    with open(target, "x") as f:
        json.dump(meta, f)
    return instant


def hudi_delete_where(
    spark: SparkSession, path: str, predicate_sql: str
) -> str | None:
    """Copy-on-write DELETE (reference hudi connector analog): matched
    file groups are retired by a replacecommit and re-published without
    the matching rows; prior instants still see the old slices."""
    return _hudi_rewrite_matched(
        spark, path,
        lambda df: df.where(predicate_sql).select("__sf"),
        lambda rows: rows.filter(f"NOT ({predicate_sql})"),
    )


def hudi_update_where(
    spark: SparkSession,
    path: str,
    predicate_sql: str,
    assignments: dict[str, str],
) -> str | None:
    """Copy-on-write UPDATE: every assignment RHS and the predicate
    evaluate against the PRE-update row (delta_log._apply_assignments,
    the rule all three COW paths share)."""
    from witdb_spark.sources.delta_log import _apply_assignments

    return _hudi_rewrite_matched(
        spark, path,
        lambda df: df.where(predicate_sql).select("__sf"),
        lambda rows: _apply_assignments(
            rows, predicate_sql, assignments, HudiProtocolError
        ),
    )


def hudi_merge_into(
    spark: SparkSession,
    path: str,
    source,
    on: list[str],
    **merge_kwargs,
) -> str | None:
    """MERGE INTO a Hudi COW table, file-GROUP-level (the bundle's
    record-key index does per-RECORD upsert routing; without it, any
    group containing a key-matched row is rewritten whole through
    sources/merge.merge_into — coarser writes, identical results). Pure
    inserts commit as fresh groups with zero rewrites. Accepts
    merge_into's clause kwargs."""
    from witdb_spark.sources.merge import merge_into

    return _hudi_rewrite_matched(
        spark, path,
        lambda df: df.join(
            source.select(*on).distinct(), on=on, how="left_semi"
        ).select("__sf"),
        lambda rows: merge_into(rows, source, on, **merge_kwargs),
        commit_on_no_match=True,
        op="MERGE",
    )


def hudi_upsert(
    spark: SparkSession,
    path: str,
    source,
    record_key: str | None = None,
) -> str | None:
    """Keyed UPSERT (reference plugin/trino-hudi read side + the Hudi
    upsert contract: source rows whose record key exists REPLACE the
    stored row, the rest insert). The bundle routes records with its
    record-level index; jar-free, the same routing comes from parquet
    FOOTER statistics at metadata scale: each base file's footer
    carries min/max for the key column, so file groups whose key range
    cannot contain any source key are never read and never rewritten —
    only touched groups are retired by the replacecommit. A footer
    without usable statistics makes its group an unconditional
    candidate (pruning is always a superset of the true match set).
    ``record_key`` defaults to hoodie.table.recordkey.fields from
    hoodie.properties. Returns the commit instant, or None if the
    upsert was a no-op."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from witdb_spark.sources.merge import merge_into

    props = _properties(path)
    key = record_key or props.get("hoodie.table.recordkey.fields")
    if not key:
        raise HudiProtocolError(
            "UPSERT needs a record key: pass record_key= or create the"
            " table with write_hudi(..., record_key=...)"
        )
    if "," in key:
        raise HudiProtocolError(
            "composite record keys need the hudi-spark bundle"
        )
    if key not in source.columns:
        raise HudiProtocolError(
            f"record key {key!r} is not a column of the source"
        )
    files = hudi_base_files(path)
    ranges: list[tuple[str, object, object]] = []
    candidates: list[str] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        if key not in names:
            raise HudiProtocolError(
                f"record key {key!r} absent from base file {f}"
            )
        lo, hi, ok = None, None, md.num_row_groups > 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[key]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok:
            ranges.append((f, lo, hi))
        else:
            candidates.append(f)
    if ranges:
        key_type = dict(
            zip(source.schema.names, source.schema.fields)
        )[key].dataType.simpleString()
        rng = spark.createDataFrame(
            ranges, f"__hf string, __lo {key_type}, __hi {key_type}"
        )
        hit = rng.join(
            source.select(F.col(key).alias("__k")).distinct(),
            (F.col("__k") >= F.col("__lo"))
            & (F.col("__k") <= F.col("__hi")),
            "left_semi",
        )
        candidates += [r["__hf"] for r in hit.collect()]

    update_cols = {
        c: F.col(f"src.{c}") for c in source.columns if c != key
    }
    return _hudi_rewrite_matched(
        spark, path,
        lambda df: df.join(
            source.select(key).distinct(), on=[key], how="left_semi"
        ).select("__sf"),
        lambda rows: merge_into(
            rows, source, [key],
            when_matched_update=update_cols,
            insert_not_matched=True,
        ),
        commit_on_no_match=True,
        op="UPSERT",
        scan_files=candidates,
    )


def hudi_clean(path: str, keep_last: int = 1) -> dict:
    """Retention maintenance (real Hudi's cleaner, KEEP_LATEST_COMMITS
    analog): keep every base file visible as of any of the last
    ``keep_last`` completed instants; delete the rest (slices
    superseded or retired before the retention window). Unpartitioned
    layout only — the same subset the writer produces."""
    import glob

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    instants = _completed_instants(path)
    if not instants:
        raise FileNotFoundError(f"{path}: no completed Hudi commits")
    retained = instants[-keep_last:]
    newest_completed = instants[-1][0]
    referenced: set[str] = set()
    for inst, _, _ in retained:
        for p in hudi_base_files(path, as_of_instant=inst):
            referenced.add(os.path.abspath(p))
    deleted = 0
    name_re = re.compile(r"^[0-9a-f]{32}_\d+_(\d+)\.parquet$")
    for p in glob.glob(os.path.join(path, "*.parquet")):
        if os.path.abspath(p) in referenced:
            continue
        m = name_re.match(os.path.basename(p))
        # only files this module's writers named, and only those whose
        # embedded instant is covered by a COMPLETED commit — a newer
        # instant belongs to an IN-FLIGHT writer that published its
        # files before its commit JSON (the write protocol's order);
        # deleting them would corrupt that commit. Unknown filenames
        # are never touched.
        if m is None or m.group(1) > newest_completed:
            continue
        os.remove(p)
        deleted += 1
    return {"deleted_files": deleted, "retained_instants": len(retained)}


def hudi_cluster(
    spark: SparkSession, path: str, target_groups: int = 1
) -> str | None:
    """Clustering (real Hudi's replacecommit-based clustering service):
    rewrite the whole active set into ``target_groups`` file groups —
    one replacecommit retires every prior group and publishes the
    coalesced ones; prior instants still time-travel. Already-compact
    tables are a no-op — an hourly maintenance run must not accrete a
    table copy per run."""
    if len(hudi_base_files(path)) <= max(1, int(target_groups)):
        return None
    return _hudi_rewrite_matched(
        spark, path,
        None,
        lambda rows: rows.coalesce(max(1, int(target_groups))),
        op="clustering",
    )
