"""ANN quality tests: the approximate paths must actually approximate —
recall against the exact brute-force baseline, not just hash-match their
own oracles. (The reference has no ANN; these operators are the
training-data north star, so quality is their correctness axis.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from witdb_spark.catalog import Tables
from witdb_spark.pipeline.similarity import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def embeddings(spark):
    return Tables(spark, SF_DIR).embeddings


def _hits(df):
    return {(r.query_id, r.match_id) for r in df.collect()}


def test_ivf_recall_vs_brute_force(spark, embeddings):
    """IVF with n_probe/n_centroids = 1/2 of cells scanned must keep most
    of the exact top-k while scoring roughly half the pairs. The floor is
    deliberately loose (deterministic lowest-id centroids, no training) —
    it guards against the candidate plumbing silently breaking, which
    would show up as recall near zero."""
    queries = embeddings.filter(F.col("vec_id") % 97 == 0).limit(16)
    exact = _hits(brute_force_topk(embeddings, queries, k=5))
    approx = _hits(
        ivf_topk(embeddings, queries, k=5, n_centroids=8, n_probe=4)
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"
    # every query must still produce k results (candidate set never empty)
    per_q = (
        ivf_topk(embeddings, queries, k=5, n_centroids=8, n_probe=4)
        .groupBy("query_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 5 for r in per_q)


def test_ivf_probe_monotonicity(spark, embeddings):
    """More probes -> recall can only improve (supersets of candidates)."""
    queries = embeddings.filter(F.col("vec_id") % 193 == 0).limit(8)
    exact = _hits(brute_force_topk(embeddings, queries, k=5))
    r1 = len(exact & _hits(ivf_topk(embeddings, queries, k=5, n_probe=1))) / len(exact)
    r4 = len(exact & _hits(ivf_topk(embeddings, queries, k=5, n_probe=4))) / len(exact)
    r8 = len(exact & _hits(ivf_topk(embeddings, queries, k=5, n_centroids=8, n_probe=8))) / len(exact)
    assert r1 <= r4 + 1e-9 <= r8 + 2e-9
    assert r8 == 1.0  # probing every cell IS brute force


def test_embedding_near_dup_probes_dimension(spark):
    """r4 review fix: non-64-d embeddings must bucket correctly (a wrong
    plane length would NULL the dots and collapse everything to bucket 0,
    going quadratic silently)."""
    import random

    from pyspark.sql import functions as F

    from witdb_spark.pipeline.similarity import embedding_near_duplicates, lsh_buckets

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(200)]
    # make one exact near-dup pair
    rows.append((900, list(rows[0][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_duplicates(df, threshold=0.999, num_planes=4)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (0, 900) in got
    # buckets must actually spread (not all-zero)
    b = lsh_buckets(df, num_planes=4, dim=32).select("bucket").distinct().count()
    assert b > 1
