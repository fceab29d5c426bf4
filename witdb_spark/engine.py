"""Engine facade: the reference's query surface on a SparkSession.

Reference lifecycle (SURVEY.md §3): HTTP submit -> parse -> analyze ->
optimize -> fragment -> schedule -> execute. In Spark terms everything from
parse onward IS Catalyst + Tungsten; the Engine provides the equivalents of
the coordinator-side surface:

  - catalog registration (ConnectorMetadata analog — parquet tables as views)
  - the Trino function library (functions.register_all)
  - the Trino SQL dialect (plans.transpile) on top of spark.sql
  - session properties mapped to Spark confs (reference SetSessionTask)
  - EXPLAIN [ANALYZE] (reference ExplainAnalyzeOperator.java:36)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from witdb_spark.catalog import Tables
from witdb_spark.functions import register_all
from witdb_spark.plans import transpile

# Reference session properties (SystemSessionProperties.java) -> Spark confs.
SESSION_PROPERTIES: dict[str, str] = {
    "join_distribution_type": "spark.sql.autoBroadcastJoinThreshold",
    "join_reordering_strategy": "spark.sql.cbo.joinReorder.enabled",
    "hash_partition_count": "spark.sql.shuffle.partitions",
    "query_max_execution_time": "spark.sql.broadcastTimeout",
}


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        if sf_dir is not None:
            Tables(spark, sf_dir).register_views()
        register_all(spark)

    def sql(self, text: str, **named_params) -> DataFrame:
        """Run a Trino-dialect query; named params use Spark 3.4+ parameter
        binding (the reference's PREPARE/EXECUTE analog, PrepareTask.java)."""
        spark_sql = transpile(text)
        if named_params:
            return self.spark.sql(spark_sql, args=named_params)
        return self.spark.sql(spark_sql)

    def set_session(self, prop: str, value: str) -> None:
        """SET SESSION prop=value (reference SetSessionTask.java); unknown
        properties fall through to raw Spark conf names."""
        if prop == "join_distribution_type":
            # AUTOMATIC keeps broadcast; PARTITIONED disables broadcast joins
            value = "-1" if value.upper() == "PARTITIONED" else "67108864"
        self.spark.conf.set(SESSION_PROPERTIES.get(prop, prop), value)

    def explain(self, text: str, analyze: bool = False) -> str:
        """EXPLAIN [ANALYZE] — formatted plan; with analyze=True the query
        runs and per-operator metrics come from the executed plan."""
        df = self.sql(text)
        if analyze:
            df.collect()
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def tables(self) -> list[str]:
        """SHOW TABLES (reference information_schema / ShowTablesTask)."""
        return [t.name for t in self.spark.catalog.listTables()]

    def describe(self, table: str) -> list[tuple[str, str]]:
        """DESCRIBE table -> [(column, type)]."""
        return [
            (f.name, f.dataType.simpleString())
            for f in self.spark.table(table).schema.fields
        ]

    # -- PREPARE / EXECUTE / DEALLOCATE (reference PrepareTask.java,
    # ExecuteTask, DeallocateTask; parameters bound in the analyzer). Spark's
    # parameterized sql() does the actual binding, so values are passed as
    # literals-by-name, never string-spliced.

    def prepare(self, name: str, text: str) -> None:
        """PREPARE name FROM query — positional `?` parameters."""
        if not hasattr(self, "_prepared"):
            self._prepared: dict[str, str] = {}
        self._prepared[name] = text

    def execute(self, name: str, *args) -> DataFrame:
        """EXECUTE name USING arg1, arg2, ... — binds `?` left to right."""
        prepared = getattr(self, "_prepared", {})
        if name not in prepared:
            raise KeyError(f"prepared statement {name!r} does not exist")
        text = prepared[name]
        out, i = [], 0
        for chunk in re.split(r"('(?:[^']|'')*')", text):
            if chunk.startswith("'"):  # string literal: '?' is not a param
                out.append(chunk)
                continue
            while "?" in chunk:
                chunk = chunk.replace("?", f":p{i}", 1)
                i += 1
            out.append(chunk)
        if i != len(args):
            raise ValueError(f"{name!r} takes {i} parameters, got {len(args)}")
        return self.sql("".join(out), **{f"p{k}": v for k, v in enumerate(args)})

    def deallocate(self, name: str) -> None:
        """DEALLOCATE PREPARE name."""
        getattr(self, "_prepared", {}).pop(name, None)
