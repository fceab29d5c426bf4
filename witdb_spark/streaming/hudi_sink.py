"""Structured Streaming SINK into a jar-free Hudi table with
EXACTLY-ONCE batch semantics (r13) — the hudi member of the sink
family (delta_sink.py: SetTransaction actions; iceberg_sink.py:
snapshot-summary epoch markers).

Hudi's own streaming writers (DeltaStreamer / the Spark streaming
sink) persist their source checkpoint in the commit's
``extraMetadata`` map and skip already-committed batches on restart.
This sink mirrors that: every microbatch publishes one commit
(COPY_ON_WRITE bulk-insert) or deltacommit (MERGE_ON_READ log-insert)
whose extraMetadata carries ``streaming-app-id`` (stable across
restarts: derived from the checkpoint location unless given) and
``streaming-epoch-id`` (the batch id); a replayed batch whose epoch is
already on the completed timeline commits NOTHING.

Usage:
    q = (hudi_stream_writer(stream_df, table_path, ckpt,
                            record_key="id")
         .trigger(availableNow=True).start())
"""

from __future__ import annotations

import json
import os


# (path, app_id) -> (newest instant examined, last epoch found).
# Purely an I/O saver: a cold process rescans the timeline and gets
# the same answer, so restarts stay exactly-once.
_EPOCH_CACHE: dict[tuple[str, str], tuple[str, int | None]] = {}


def hudi_last_committed_epoch(path: str, app_id: str) -> int | None:
    """Largest streaming-epoch-id any COMPLETED instant recorded for
    ``app_id`` (None if the app never committed). Scans the timeline
    NEWEST-FIRST and stops at the first instant carrying the app's
    marker — epochs are monotone per app, so the newest marked
    instant holds the max — and caches the scan frontier per
    (path, app) so steady-state microbatches parse O(new instants)
    files, not O(timeline) (ADVICE r13)."""
    from witdb_spark.sources.hudi_meta import _completed_instants

    key = (os.path.abspath(path), app_id)
    seen_upto, cached = _EPOCH_CACHE.get(key, ("", None))
    instants = _completed_instants(path)
    if seen_upto and all(i != seen_upto for i, _a, _f in instants):
        # the cached frontier is gone from the timeline — the table
        # was recreated at this path (or its history archived); a
        # stale cache here could silently skip batches, so rescan
        seen_upto, cached = "", None
    newest = instants[-1][0] if instants else ""
    for inst, _action, fpath in reversed(instants):
        if inst <= seen_upto:
            break  # older than the cached frontier: already examined
        with open(fpath) as f:
            body = f.read().strip()
        meta = (json.loads(body) if body else {}).get(
            "extraMetadata"
        ) or {}
        if meta.get("streaming-app-id") == app_id:
            epoch = int(meta["streaming-epoch-id"])
            cached = epoch if cached is None else max(cached, epoch)
            break
    _EPOCH_CACHE[key] = (newest, cached)
    return cached


def hudi_stream_writer(
    sdf,
    path: str,
    checkpoint_location: str,
    record_key: str | None = None,
    table_type: str = "COPY_ON_WRITE",
    app_id: str | None = None,
):
    """DataStreamWriter appending ``sdf``'s microbatches to the Hudi
    table at ``path`` exactly once per batch id — COW batches land as
    bulk-insert commits, MOR batches as log-insert deltacommits.
    Returns the writer (caller picks trigger and calls .start())."""
    from witdb_spark.sources.hudi_meta import (
        _meta_dir,
        _properties,
        hudi_log_insert,
        write_hudi,
        write_hudi_mor_create,
    )

    if table_type not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise ValueError(
            "table_type must be COPY_ON_WRITE or MERGE_ON_READ"
        )
    app = app_id or (
        "witdb-hudi-sink:" + os.path.abspath(checkpoint_location)
    )

    def _batch(df, batch_id: int) -> None:
        spark = df.sparkSession
        if not os.path.isdir(_meta_dir(path)):
            # EMPTY create so batch 0's rows land via the
            # epoch-stamped commit below
            if table_type == "MERGE_ON_READ":
                if record_key is None:
                    raise ValueError(
                        "a MERGE_ON_READ sink needs record_key"
                    )
                write_hudi_mor_create(
                    spark, df.limit(0), path, record_key=record_key
                )
            else:
                write_hudi(
                    spark, df.limit(0), path, mode="create",
                    record_key=record_key,
                )
        last = hudi_last_committed_epoch(path, app)
        if last is not None and int(batch_id) <= last:
            return  # replayed batch: already on the timeline
        marks = {
            "streaming-app-id": app,
            "streaming-epoch-id": str(int(batch_id)),
        }
        if (
            _properties(path).get("hoodie.table.type")
            == "MERGE_ON_READ"
        ):
            hudi_log_insert(spark, path, df, extra_metadata=marks)
        else:
            write_hudi(
                spark, df, path, mode="append", extra_metadata=marks
            )

    return (
        sdf.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_location)
    )
