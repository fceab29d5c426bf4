"""Structured Streaming operators over the events stream.

The reference engine has NO streaming (SURVEY.md §2.11 — its Kafka/Kinesis
connectors expose topics as batch tables), so everything here is north-star
bonus, built the way a 100 TB/day event pipeline would:

  - file-source ingestion with a declared schema (no inference in the hot
    path; at scale this is a Kafka source with the same downstream graph)
  - event-time watermarks bounding state (late data beyond the watermark is
    dropped deterministically, state stores stay O(windows), not O(stream))
  - tumbling-window aggregates: partial aggregation happens per microbatch
    and the state store holds only open windows
  - streaming dedup keyed on event_id within the watermark horizon — the
    streaming twin of pipeline.dedup.exact_duplicates
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events_from_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event rows (schema declared, never inferred)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(input_dir)
    )


def windowed_event_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + exact-decimal value sums per event_type.
    The watermark bounds the state store; output mode 'append' emits each
    window once it is final — deterministic results for the batch twin."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def stream_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids arriving within
    the watermark horizon (state = one key per id inside the horizon)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_windows(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged) on the event stream — the
    stateful-session operator the reference lacks entirely. State holds one
    open session per active user; the watermark closes sessions whose gap
    can no longer be extended, so 'append' mode emits each session exactly
    once, equal to the batch session_window over the same data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


FUNNEL_STATE_SCHEMA = "views BIGINT"
FUNNEL_OUT_SCHEMA = (
    "user_id BIGINT, purchase_id BIGINT, n_views BIGINT"
)


def stateful_funnels(stream: DataFrame, inactivity_ms: int = 7_200_000) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    view->purchase funnel machine (the streaming twin of the
    match_recognize V+ P pattern). State = the current run of consecutive
    views; a purchase that follows >=1 views emits one funnel row and
    resets. A processing-time timeout drops state for users gone quiet, so
    the store is O(active users) — the shape a 100 TB/day stream needs.

    A key's microbatch rows can arrive split across several Arrow chunks in
    arbitrary order, so all chunks are accumulated and sorted ONCE by
    event_id before the fold — results are deterministic given
    deterministic batching (e.g. availableNow over staged files)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        (views,) = state.get if state.exists else (0,)
        out_uid, out_pid, out_nv = [], [], []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("event_id")
            for et, eid in zip(pdf["event_type"], pdf["event_id"]):
                if et == "view":
                    views += 1
                elif et == "purchase":
                    if views > 0:
                        out_uid.append(key[0])
                        out_pid.append(int(eid))
                        out_nv.append(int(views))
                    views = 0
                else:
                    views = 0
        state.update((views,))
        state.setTimeoutDuration(inactivity_ms)
        if out_uid:
            yield pd.DataFrame(
                {"user_id": out_uid, "purchase_id": out_pid, "n_views": out_nv}
            )

    return (
        stream.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def windowed_approx_distinct(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming approx-distinct users per tumbling window via the same
    md5-register HLL as the batch tier (operators/hll.py): registers are
    MAX-aggregable, and MAX is a streaming-supported aggregate, so the
    sketch builds incrementally inside the state store — O(m=1024) state
    per window instead of one key per user. The estimate is computed from
    the final registers per window, so every window the stream FINALIZES
    equals the batch estimate bit-for-bit (test_streaming.py); append
    mode holds back windows still inside the watermark, exactly like the
    other windowed ops here.

    Two stateful stages (register MAX, then per-window finalize) chain in
    append mode under the watermark. State: windows x registers, bounded.
    """
    from witdb_spark.operators.hll import _FINAL, _bucket_rho

    b, rho = _bucket_rho("user_id")
    regs = (
        stream.withWatermark("ts", watermark)
        .where(F.col("user_id").isNotNull())
        .select(F.window("ts", window).alias("win"), b, rho)
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    summary = regs.groupBy("win").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.expr("cast(shiftleft(1L, 61 - r) as decimal(38,0))")).alias("sp"),
    )
    return summary.select(
        F.col("win.start").alias("window_start"),
        F.expr(f"cast(round({_FINAL}, 6) as double)").alias("approx_users"),
    )


def interval_join_views_purchases(
    views: DataFrame,
    purchases: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase joins the
    SAME user's view events from the preceding ``max_gap`` window — the
    classic attribution join. Both sides carry event-time watermarks and
    the join condition time-bounds BOTH directions, so Spark can expire
    state for rows older than watermark + gap instead of buffering the
    streams forever (state is O(users x gap), not O(stream)).

    Batch-equivalent semantics: an ordinary inner join with the same
    condition (tests assert equality on a static frame)."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    gap = F.expr(f"INTERVAL {max_gap}")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - gap),
    ).select(
        F.col("p_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "v_ts",
        "p_ts",
    )
