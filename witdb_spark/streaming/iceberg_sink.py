"""Structured Streaming SINK into a jar-free Iceberg table with
EXACTLY-ONCE batch semantics (r13) — the iceberg twin of
streaming/delta_sink.py.

Iceberg has no SetTransaction action; the iceberg library's own Spark
streaming sink achieves idempotence by stamping the committing query's
id and epoch into the SNAPSHOT SUMMARY and skipping batches whose
epoch is already on the current lineage. This sink mirrors that:
every microbatch append carries ``streaming-app-id`` (stable across
restarts: derived from the checkpoint location unless given) and
``streaming-epoch-id`` (the batch id) in its snapshot summary, and a
replayed batch whose epoch is <= the app's last committed epoch
appends NOTHING. Parquet staging stays JVM-side via foreachBatch +
sources/iceberg_meta.write_iceberg.

Usage:
    q = (iceberg_stream_writer(stream_df, table_path, ckpt)
         .trigger(availableNow=True).start())
"""

from __future__ import annotations

import os


def iceberg_last_committed_epoch(path: str, app_id: str) -> int | None:
    """Largest streaming-epoch-id any snapshot in the CURRENT metadata
    recorded for ``app_id`` (None if the app never committed).
    expire_snapshots can age out old epochs, like the library's sink —
    the latest epoch is what replay protection needs and retention
    always keeps the current snapshot."""
    from witdb_spark.sources.iceberg_meta import _current_metadata

    last: int | None = None
    for s in _current_metadata(path).get("snapshots") or []:
        summ = s.get("summary") or {}
        if summ.get("streaming-app-id") != app_id:
            continue
        epoch = int(summ["streaming-epoch-id"])
        last = epoch if last is None else max(last, epoch)
    return last


def iceberg_stream_writer(
    sdf,
    path: str,
    checkpoint_location: str,
    app_id: str | None = None,
):
    """DataStreamWriter appending ``sdf``'s microbatches to the
    Iceberg table at ``path`` exactly once per batch id. Returns the
    writer (caller picks trigger and calls .start())."""
    from witdb_spark.sources.iceberg_meta import write_iceberg

    app = app_id or (
        "witdb-iceberg-sink:" + os.path.abspath(checkpoint_location)
    )

    def _batch(df, batch_id: int) -> None:
        spark = df.sparkSession
        if not os.path.isdir(os.path.join(path, "metadata")):
            # EMPTY create so batch 0's rows land via the
            # epoch-stamped append (a data-carrying create could
            # duplicate on a batch-0 replay)
            write_iceberg(spark, df.limit(0), path, mode="create")
        last = iceberg_last_committed_epoch(path, app)
        if last is not None and int(batch_id) <= last:
            return  # replayed batch: already on the lineage
        write_iceberg(
            spark, df, path, mode="append",
            summary_extra={
                "streaming-app-id": app,
                "streaming-epoch-id": str(int(batch_id)),
            },
        )

    return (
        sdf.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_location)
    )
