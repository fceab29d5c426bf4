from witdb_spark.streaming.cdf_source import DeltaCDFDataSource
from witdb_spark.streaming.hudi_source import HudiChangesDataSource
from witdb_spark.streaming.iceberg_source import IcebergAppendsDataSource
from witdb_spark.streaming.ops import (
    interval_join_views_purchases,
    session_windows,
    stateful_funnels,
    stream_dedup,
    stream_events_from_dir,
    windowed_event_counts,
)

__all__ = [
    "interval_join_views_purchases",
    "stream_events_from_dir",
    "windowed_event_counts",
    "stream_dedup",
    "session_windows",
    "stateful_funnels",
    # r12: incremental streaming SOURCES (Spark 4 python DataSource)
    "DeltaCDFDataSource",
    "IcebergAppendsDataSource",
    # r14: the hudi member — incremental change stream
    "HudiChangesDataSource",
]
