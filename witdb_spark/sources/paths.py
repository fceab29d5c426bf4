"""Shared scan-path <-> log-path normalization.

Spark renders ``_metadata.file_path`` / ``input_file_name()`` as a
percent-ENCODED URI (``file:/tmp/dv%20space%20test/part-0.parquet``),
while lakehouse log/metadata structures (Delta add actions after
``unquote``, Iceberg manifest ``file_path`` entries, caller-supplied
table paths) carry the DECODED filesystem path. Any join or lookup
between the two sides must normalize BOTH to the decoded,
scheme-stripped form, or rows silently (re)appear: a left-anti
deletion join that matches nothing resurrects deleted rows.

Reference analog: the engine's connectors compare
``org.apache.hadoop.fs.Path`` objects, which canonicalize encoding
before equality — this module is the Spark-first equivalent.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:/{0,2}(?=/)"


def norm_path(p: str) -> str:
    """Python-side: strip URI scheme, percent-decode."""
    return unquote(re.sub(_SCHEME_RE, "", p))


def norm_path_expr(col: Column) -> Column:
    """JVM-side twin of :func:`norm_path` — keeps path joins inside
    whole-stage codegen (no Python round-trip on the scan side).

    ``url_decode`` is form-decoding (``+`` -> space), but URI path
    renderings keep a literal ``+`` as ``+`` — pre-encode it to
    ``%2B`` so the decode round-trips it. ``try_url_decode`` +
    coalesce keeps a path with a stray non-hex ``%`` (possible in
    library-written metadata that stored the raw name) as-is instead
    of failing the whole scan.
    """
    stripped = F.regexp_replace(col, _SCHEME_RE, "")
    return F.coalesce(
        F.try_url_decode(F.regexp_replace(stripped, r"\+", "%2B")),
        stripped,
    )


# ------------------------------------------------- empty-string partitions
# Spark's hive-style directory writer renders BOTH NULL and '' partition
# values as __HIVE_DEFAULT_PARTITION__, so a writer that recovers
# partition values from staged directory names (the jar-free delta/
# iceberg/hudi staging paths here) would conflate the two: '' would be
# recorded as NULL, and pruning for ``col = ''`` would silently drop
# files that DO contain matching rows. Escaping '' to a sentinel (and
# quote-prefixing genuine sentinel occurrences so the mapping stays
# bijective) before partitionBy keeps the two distinct. The sentinel
# only ever names STAGING DIRECTORIES — partitionBy drops the column
# from file content, and the recovered (unescaped) value is what lands
# in the table metadata.

EMPTY_PARTITION_SENTINEL = "__WITDB_EMPTY_STRING__"


def escape_empty_partition_expr(col: Column) -> Column:
    """JVM-side escape for a string partition column about to feed
    ``partitionBy``: '' -> sentinel; a genuine value starting with the
    sentinel gets sentinel-prefixed (quoting), everything else passes
    through. NULL stays NULL (-> __HIVE_DEFAULT_PARTITION__)."""
    return (
        F.when(col == "", F.lit(EMPTY_PARTITION_SENTINEL))
        .when(
            col.startswith(EMPTY_PARTITION_SENTINEL),
            F.concat(F.lit(EMPTY_PARTITION_SENTINEL), col),
        )
        .otherwise(col)
    )


def unescape_partition_value(v: str | None) -> str | None:
    """Python-side inverse of :func:`escape_empty_partition_expr`,
    applied to a percent-DECODED directory value (the sentinel is
    URL-safe, so decode order doesn't matter)."""
    if v is None or not isinstance(v, str):
        return v
    if v == EMPTY_PARTITION_SENTINEL:
        return ""
    if v.startswith(EMPTY_PARTITION_SENTINEL):
        return v[len(EMPTY_PARTITION_SENTINEL):]
    return v
