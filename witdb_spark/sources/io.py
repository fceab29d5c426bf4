"""Source/sink surface (SURVEY.md §2.1).

Reference analogs: TableScanOperator.java:47 (reads),
TableWriterOperator.java:63 + TableFinishOperator.java:51 (writes; Spark's
file-commit protocol plays the TableFinish role), file formats from
lib/trino-parquet / lib/trino-orc / lib/trino-hive-formats (csv/json text).

Scale notes:
  - write_table partitions by low-cardinality columns only (partition_by is
    directory-level partitioning — the analog of Hive partitioned tables the
    reference writes through ConnectorPageSink). High-cardinality layout
    control belongs in sort_by (file-internal ordering for row-group
    skipping).
  - repartition_to bounds output file count: at 100 TB you want
    ~128MB-1GB files, never one file per shuffle partition of a small agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "json", "csv", "avro", "text", "binaryFile")
# text: one string column `value` per line (reference hive text tables);
# binaryFile: path/modificationTime/length/content — the multimodal blob
# ingest (image/audio dirs become the opaque-binary-column tables the
# pipeline tier processes; reference reads these through hive external
# tables). binaryFile is read-only in Spark.
READ_ONLY_FORMATS = ("binaryFile",)


def _check_format(spark_or_df, fmt: str, writing: bool = False) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if writing and fmt in READ_ONLY_FORMATS:
        raise ValueError(f"format {fmt!r} is read-only in Spark")
    if fmt == "avro" and not _has_avro_module(spark_or_df):
        # The avro datasource lives in the external spark-avro module
        # (reference lib/trino-hive-formats avro support is always-on; in
        # Spark it ships separately). Fail with the remedy, not a Java trace.
        raise RuntimeError(
            "the spark-avro module is not on this session's classpath; add"
            " --packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )


def _has_avro_module(spark_or_df) -> bool:
    spark = getattr(spark_or_df, "sparkSession", spark_or_df)
    try:
        # the datasource registry is the authoritative probe (a bare
        # Class.forName hits stub classes in spark-sql and false-positives)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatching reader (csv/json get sane defaults: header on,
    schema either declared or inferred)."""
    if fmt == "avro" and not _has_avro_module(spark):
        # jar-free fallback: the pure-Python Avro codec
        # (sources/avro_codec.py, public Avro spec), decoding on
        # EXECUTORS via binaryFiles + flatMap so the scan stays
        # distributed. With spark-avro present the DSv2 reader below
        # takes over unchanged.
        return _read_avro_fallback(spark, path)
    _check_format(spark, fmt)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def _avro_to_spark_type(schema, names):
    """Writer-schema -> Spark DataType (logical types honored; avro
    timestamps map to TIMESTAMP_NTZ so results are session-zone-free)."""
    from pyspark.sql import types as T

    from witdb_spark.sources.avro_codec import AvroError, _named

    schema = _named(schema, names)
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise AvroError(
                "only [null, T] Avro unions map to a Spark column type"
            )
        return _avro_to_spark_type(branches[0], names)
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampNTZType()
        if lt in ("time-millis", "time-micros"):
            # Spark has no TIME type; the repo-wide convention (TIME
            # operator tier) is nanos-of-day BIGINT — _tupleize converts
            # the codec's datetime.time to match
            return T.LongType()
        if lt == "decimal":
            return T.DecimalType(schema.get("precision", 38),
                                 schema.get("scale", 0))
    prims = {
        "boolean": "BooleanType", "int": "IntegerType",
        "long": "LongType", "float": "FloatType",
        "double": "DoubleType", "bytes": "BinaryType",
        "string": "StringType",
    }
    if t in prims:
        return getattr(T, prims[t])()
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _avro_to_spark_type(f["type"], names)
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(_avro_to_spark_type(schema["items"], names))
    if t == "map":
        return T.MapType(
            T.StringType(), _avro_to_spark_type(schema["values"], names)
        )
    from witdb_spark.sources.avro_codec import AvroError as _E

    raise _E(f"unsupported Avro type {t!r}")


def _read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Distributed jar-free Avro scan: the driver decodes ONE header for
    the schema; files decode on executors (binaryFiles partitions them).
    The codec source ships inside the closure via exec — executors in a
    foreign deployment need no witdb_spark on their PYTHONPATH.

    Scale note: parallelism is per FILE (binaryFiles holds a whole file
    in executor memory; Avro blocks inside one file are not split), so
    this path suits the many-modest-files layout Avro datasets ship in.
    A single multi-GB file needs the spark-avro jar, which splits on
    sync markers."""
    import glob
    import os

    from witdb_spark.sources import avro_codec
    from witdb_spark.sources.avro_codec import read_avro_file

    if os.path.isdir(path):
        files = sorted(
            f
            for f in glob.glob(os.path.join(path, "**"), recursive=True)
            if os.path.isfile(f)
            and not os.path.basename(f).startswith(("_", "."))
        )
    else:
        files = sorted(glob.glob(path))
    if not files:
        raise FileNotFoundError(f"no avro files under {path}")
    wschema, _ = read_avro_file(files[0])
    names: dict = {}
    from witdb_spark.sources.avro_codec import _register

    _register(wschema, names)
    if not (isinstance(wschema, dict) and wschema.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    spark_schema = _avro_to_spark_type(wschema, names)
    field_specs = [f["type"] for f in wschema["fields"]]
    with open(avro_codec.__file__) as f:
        codec_src = f.read()

    def _tupleize(schema, value, names):
        # Rows must be tuples (nested structs included) for createDataFrame
        if value is None:
            return None
        if isinstance(schema, str) and schema in names:
            schema = names[schema]
        if isinstance(schema, list):
            branches = [s for s in schema if s != "null"]
            return _tupleize(branches[0], value, names)
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return tuple(
                    _tupleize(f["type"], value[f["name"]], names)
                    for f in schema["fields"]
                )
            if t == "array":
                return [
                    _tupleize(schema["items"], v, names) for v in value
                ]
            if t == "map":
                return {
                    k: _tupleize(schema["values"], v, names)
                    for k, v in value.items()
                }
            if schema.get("logicalType") in ("time-millis", "time-micros"):
                # codec yields datetime.time; the Spark column is
                # nanos-of-day BIGINT (see _avro_to_spark_type)
                return (
                    (value.hour * 3600 + value.minute * 60 + value.second)
                    * 1_000_000_000
                    + value.microsecond * 1_000
                )
        return value

    wschema_c, names_c = wschema, names

    def decode_file(kv):
        ns: dict = {}
        exec(codec_src, ns)
        _, recs = ns["read_container"](bytes(kv[1]))
        out = []
        for rec in recs:
            out.append(
                tuple(
                    _tupleize(ft, rec[fname], names_c)
                    for ft, fname in zip(
                        field_specs,
                        [f["name"] for f in wschema_c["fields"]],
                    )
                )
            )
        return out

    rdd = spark.sparkContext.binaryFiles(",".join(files)).flatMap(
        decode_file
    )
    return spark.createDataFrame(rdd, spark_schema)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    repartition_to: int | None = None,
    **options,
) -> None:
    """INSERT/CTAS write path. sort_by orders rows within each output file
    (parquet/orc row-group min-max stats then prune on those columns at read
    time — the reference gets this from ORC writer stripe stats)."""
    _check_format(df, fmt, writing=True)
    if repartition_to is not None:
        df = df.repartition(repartition_to)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def ctas(
    spark: SparkSession,
    sql: str,
    path: str,
    fmt: str = "parquet",
    view_name: str | None = None,
    **write_kwargs,
) -> DataFrame:
    """CREATE TABLE AS SELECT onto a file path (reference CreateTableTask +
    TableWriterOperator): run, write, optionally re-register as a view, and
    return the re-read table."""
    write_table(spark.sql(sql), path, fmt=fmt, **write_kwargs)
    out = read_any(spark, path, fmt)
    if view_name:
        out.createOrReplaceTempView(view_name)
    return out


def insert_into(df: DataFrame, path: str, fmt: str = "parquet", **kwargs) -> None:
    """INSERT INTO == append-mode write (files are immutable; appends add
    new files under the same root, exactly the reference's connector-sink
    model)."""
    write_table(df, path, fmt=fmt, mode="append", **kwargs)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """CREATE TABLE ... WITH (bucketed_by=..., bucket_count=...) — the
    reference's Hive bucketed tables (plugin/trino-hive
    HiveBucketProperty; the coordinator plans co-located joins/aggs on
    matching bucket counts). Spark analog: bucketBy + saveAsTable; a join
    of two tables bucketed by the same key and count plans with NO
    Exchange on either side — at 100 TB that is the difference between a
    full fact-fact shuffle and a local merge per bucket. sort_cols adds
    SORTED BY so the merge join also skips the per-task sort."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
