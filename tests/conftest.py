"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the driver's view names pre-registered, and a comparison
helper that mirrors the driver's correctness gate (row-count + schema +
order-insensitive value comparison).

This mirrors the reference's H2-oracle design
(reference testing/trino-testing/.../AbstractTestQueryFramework.java:328-335,
H2QueryRunner.java:91) with DuckDB as the oracle, per SURVEY.md §5.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from witdb_spark.catalog import TABLE_NAMES
from witdb_spark.session import get_spark

SF_DIR = os.environ.get("WITDB_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="witdb-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — the driver's
    order-insensitive comparison shape."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    Values must match exactly — the driver hashes values, so we do not allow
    float tolerance. Query authors guarantee determinism via decimal-exact
    aggregation (see queries/registry.py docstring).
    """
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count mismatch: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        bad = []
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    bad.append((i, x, y, abs(x - y)))
            elif str(x) != str(y):
                bad.append((i, x, y, None))
        if bad:
            problems.append(f"col {col}: {len(bad)} mismatches, first: {bad[:3]}")
    return problems


def run_both(spark, oracle, spec, sf_dir: str = SF_DIR):
    """Run a QuerySpec on Spark and on the DuckDB oracle; return both frames.

    The oracle connection's views are bound to SF_DIR, so a different
    sf_dir would silently compare two different datasets — rejected."""
    if sf_dir != SF_DIR:
        raise ValueError(
            f"run_both: oracle views are bound to {SF_DIR}; build a fresh"
            f" DuckDB connection for {sf_dir}"
        )
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    # bound the session's cache: several pipeline queries persist()
    # intermediates that would otherwise pin storage for all 120+ queries
    spark.catalog.clearCache()
    oracle_pdf = oracle.execute(spec.oracle).fetchdf() if spec.oracle else None
    return spark_pdf, oracle_pdf
