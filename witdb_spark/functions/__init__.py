"""Trino scalar-function library mapped onto Spark (SURVEY.md §2.9;
reference core/trino-main/.../operator/scalar/ — 139 files).

Three tiers:
  - PASSTHROUGH: Trino name == Spark name (or a direct rename) with matching
    semantics — nothing to do but document the mapping.
  - MACROS: Trino functions Spark lacks, registered as SQL-expression
    temporary functions (Spark 4 `CREATE FUNCTION ... RETURN expr`).
    These are pure Catalyst expressions — codegen'd, no Python in the path.
  - UNSUPPORTED: named gaps with reasons (need native libs or stateful
    engines); kept visible so coverage claims stay honest.

`register_all(spark)` installs every macro into the session; after that the
Trino names work in spark.sql() and via F.call_function.
"""

from witdb_spark.functions.registry import (
    MACROS,
    PASSTHROUGH,
    UNSUPPORTED,
    register_all,
    trino_fn,
)

__all__ = ["MACROS", "PASSTHROUGH", "UNSUPPORTED", "register_all", "trino_fn"]
