"""Structured Streaming SINK into a jar-free Delta table with
EXACTLY-ONCE batch semantics (r13).

The write side of the streaming tier: ``delta_stream_writer`` wires a
``foreachBatch`` that appends each microbatch through
sources/delta_log.write_delta with a SetTransaction identifier
(PROTOCOL.md 'Transaction Identifiers') — ``txn.appId`` names the sink
(stable across restarts: derived from the checkpoint location unless
given) and ``txn.version`` is the batch id. A batch replayed after a
crash/restart finds its version already recorded and commits NOTHING,
which is exactly how delta-spark's own streaming sink achieves
idempotence. The parquet staging inside write_delta is Spark's own
JVM writer — foreachBatch keeps the row path out of Python entirely.

Usage:
    q = (delta_stream_writer(stream_df, table_path, ckpt)
         .trigger(availableNow=True).start())

The target table is created EMPTY on first use (schema from the
stream) so that batch 0's rows are themselves covered by a txn-stamped
append — a create carrying data could duplicate on a batch-0 replay.
"""

from __future__ import annotations

import os


def delta_stream_writer(
    sdf,
    path: str,
    checkpoint_location: str,
    app_id: str | None = None,
):
    """DataStreamWriter appending ``sdf``'s microbatches to the Delta
    table at ``path`` exactly once per batch id. Returns the writer
    (caller picks trigger and calls .start())."""
    from witdb_spark.sources.delta_log import _log_dir, write_delta

    app = app_id or (
        "witdb-delta-sink:" + os.path.abspath(checkpoint_location)
    )

    def _batch(df, batch_id: int) -> None:
        spark = df.sparkSession
        if not os.path.isdir(_log_dir(path)):
            # EMPTY create: batch 0's rows must land via the
            # txn-stamped append below, or a batch-0 replay after a
            # crash between create and checkpoint would duplicate
            write_delta(spark, df.limit(0), path, mode="create")
        write_delta(
            spark, df, path, mode="append",
            txn_app_id=app, txn_version=int(batch_id),
        )

    return (
        sdf.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_location)
    )
