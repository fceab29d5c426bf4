from witdb_spark.sources.io import ctas, insert_into, read_any, write_table
from witdb_spark.sources.jdbc import read_jdbc, write_jdbc
from witdb_spark.sources.lakehouse import (
    connector_available,
    read_kafka_batch,
    read_kafka_stream,
    read_table,
    write_lakehouse_table,
)
from witdb_spark.sources.merge import merge_into

__all__ = [
    "ctas",
    "insert_into",
    "read_any",
    "write_table",
    "merge_into",
    "read_jdbc",
    "write_jdbc",
    "connector_available",
    "read_table",
    "read_kafka_batch",
    "read_kafka_stream",
    "write_lakehouse_table",
]
