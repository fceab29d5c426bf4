from witdb_spark.sources.io import ctas, insert_into, read_any, write_table
from witdb_spark.sources.jdbc import read_jdbc, write_jdbc
from witdb_spark.sources.merge import merge_into

__all__ = [
    "ctas",
    "insert_into",
    "read_any",
    "write_table",
    "merge_into",
    "read_jdbc",
    "write_jdbc",
]
