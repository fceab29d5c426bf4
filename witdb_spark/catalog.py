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
        """events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        reader rejects; read it as raw int64 nanoseconds instead and expose
        it as ``ts_ns`` (BIGINT). Nanosecond integers compare/sort/window
        exactly in both Spark and DuckDB (oracle twin: ``epoch_ns(ts)``),
        with no truncation — sub-microsecond ordering is preserved, which a
        cast to Spark's microsecond timestamps would lose."""
        self._spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self._spark.read.parquet(os.path.join(self.sf_dir, "events.parquet"))
        return df.withColumnRenamed("ts", "ts_ns")

    def register_views(self, names: list[str] | None = None) -> None:
        """Register temp views so spark.sql() sees the catalog (the
        reference's information_schema equivalent is spark.catalog)."""
        for name in names or TABLE_NAMES:
            getattr(self, name).createOrReplaceTempView(name)
