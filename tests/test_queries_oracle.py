"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json). Queries without an
oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from tests.conftest import compare_frames, run_both
from witdb_spark.queries import QUERIES

IDS = sorted(QUERIES)


@pytest.mark.parametrize("name", IDS)
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    spark_pdf, oracle_pdf = run_both(spark, oracle, spec)
    if spec.oracle is None:
        assert spark_pdf is not None  # rows-only smoke: ran and produced a frame
        return
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_monotonic_id_unique(spark):
    """assign_unique_id's scale path (AssignUniqueIdOperator.java:36):
    monotonically_increasing_id needs no sort and no single-partition
    window; ids are engine-generated, so only the uniqueness invariant is
    checkable."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from witdb_spark.catalog import Tables

    ev = Tables(spark, SF_DIR).events.withColumn(
        "uid", F.monotonically_increasing_id()
    )
    row = ev.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct("uid").alias("d")
    ).collect()[0]
    assert row.n == row.d
