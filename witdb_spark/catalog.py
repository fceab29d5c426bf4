"""Table catalog over the driver-generated parquet fixtures.

The reference resolves `catalog.schema.table` through ConnectorMetadata
(reference core/trino-spi/.../connector/ConnectorMetadata.java:1); here a
scale-factor directory of parquet files plays the role of a catalog. Schema
is declared by the files (SURVEY.md §1.2); Spark's vectorized parquet reader
is the Page/Block layer (SURVEY.md §1.1) — we never materialize rows manually.

At cluster scale the same interface would point at an object-store prefix;
nothing below assumes local paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables that stay broadcast-sized at any scale factor (nation and
# region are constant-cardinality in TPC-H; customer/supplier/part scale).
BROADCAST_DIMS = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Tables:
    """Lazy namespace of DataFrames for one scale-factor directory.

    ``Tables(spark, sf_dir).lineitem`` → DataFrame. Reads are lazy and
    metadata-cached by Spark, so repeated attribute access is cheap.
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self._spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLE_NAMES:
            raise AttributeError(name)
        if name == "events":
            return self._read_events()
        return self._spark.read.parquet(os.path.join(self.sf_dir, f"{name}.parquet"))

    def _read_events(self) -> DataFrame:
        """Expose events.ts as ``ts_ns`` — int64 nanoseconds since epoch.

        Nanosecond integers compare/sort/window exactly in both Spark and
        DuckDB (oracle twin: ``epoch_ns(ts)``), so every downstream query
        does exact integer arithmetic instead of engine-specific timestamp
        semantics. The fixture schema has shipped both ways — parquet
        TIMESTAMP(NANOS) (readable only as raw int64 via nanosAsLong) and
        TIMESTAMP(MICROS) — so normalize whichever arrives:
          - timestamp column → wall-clock micros * 1000, computed with
            pure NTZ arithmetic (timestampdiff over TIMESTAMP_NTZ) so the
            value is independent of spark.sql.session.timeZone — the
            ``unix_micros(cast(ts AS TIMESTAMP))`` form shifted by the
            session offset in non-UTC sessions and diverged from DuckDB's
            naive ``epoch_ns``;
          - int64 nanos → pass through.
        Both are pure map-stage projections; pushdown/pruning unaffected."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        self._spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self._spark.read.parquet(os.path.join(self.sf_dir, "events.parquet"))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.TimestampNTZType):
            # naive wall time: pure NTZ arithmetic, no instant conversion
            ts_ns = (
                F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                )
                * F.lit(1000)
            )
        elif isinstance(ts_type, T.TimestampType):
            # true instant: unix_micros IS the zone-independent value —
            # casting through NTZ here would re-introduce the session
            # offset this function exists to avoid
            ts_ns = F.unix_micros(F.col("ts")) * F.lit(1000)
        else:  # legacy int64-nanos fixture
            ts_ns = F.col("ts")
        return df.select(
            "event_id",
            ts_ns.alias("ts_ns"),
            "user_id",
            "event_type",
            "value",
            "props",
        )

    def register_views(self, names: list[str] | None = None) -> None:
        """Register temp views so spark.sql() sees the catalog (the
        reference's information_schema equivalent is spark.catalog).
        Memoized per (session, sf_dir): the SQL-text query suites build
        an Engine per call, and re-deriving ten parquet reads per query
        is pure driver overhead (a different sf_dir re-registers)."""
        key = ("witdb_views_sf_dir", self.sf_dir, tuple(names or ()))
        cache = getattr(self._spark, "_witdb_view_memo", None)
        if cache == key:
            return
        for name in names or TABLE_NAMES:
            getattr(self, name).createOrReplaceTempView(name)
        try:
            self._spark._witdb_view_memo = key
        except AttributeError:
            pass
