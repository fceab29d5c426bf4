"""Approximate aggregates: the md5-register sketches (operators/hll.py,
operators/qdigest.py) are deterministic and hash-checked by the driver's
oracle gate; here we bound their ERROR against the exact answer (the
reference does the same in TestApproximate* operator tests), and keep
Spark's native engine-private sketches covered the same way."""

from __future__ import annotations

from tests.conftest import SF_DIR
from witdb_spark.queries import QUERIES


def test_approx_sketches_close_to_exact(spark, oracle):
    row = QUERIES["agg_approx_sketches"].fn(spark, SF_DIR).collect()[0]
    exact_orders, exact_parts, exact_supps = oracle.execute(
        "SELECT COUNT(DISTINCT l_orderkey), COUNT(DISTINCT l_partkey),"
        " COUNT(DISTINCT l_suppkey) FROM lineitem"
    ).fetchone()
    # HLL standard error at p=10 is 1.04/sqrt(1024) = 3.25%; 2.5 sigma bound
    assert abs(row.approx_orders - exact_orders) / exact_orders < 0.08
    assert abs(row.approx_parts - exact_parts) / exact_parts < 0.08
    assert abs(row.approx_supps - exact_supps) / exact_supps < 0.08


def test_native_spark_sketches_close_to_exact(spark, oracle):
    """Spark's own sketch aggregates (register hashes engine-private, so not
    oracle-checkable) still get error bounds."""
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables

    li = Tables(spark, SF_DIR).lineitem
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("a_median"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("a_parts"),
    ).collect()[0]
    exact_orders, exact_parts = oracle.execute(
        "SELECT COUNT(DISTINCT l_orderkey), COUNT(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()
    exact_median = oracle.execute(
        "SELECT median(l_extendedprice) FROM lineitem"
    ).fetchone()[0]
    assert abs(row.a_orders - exact_orders) / exact_orders < 0.05
    assert abs(row.a_parts - exact_parts) / exact_parts < 0.05
    assert abs(row.a_median - exact_median) / exact_median < 0.05


def test_hll_merge_rollup_close_to_exact(spark, oracle):
    got = {
        r.n_regionkey: r.approx_custs
        for r in QUERIES["agg_hll_merge_rollup"].fn(spark, SF_DIR).collect()
    }
    exact = dict(
        oracle.execute(
            "SELECT n_regionkey, COUNT(DISTINCT c_custkey) FROM customer"
            " JOIN nation ON c_nationkey = n_nationkey GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k, est in got.items():
        # merged-sketch estimate must match a direct estimate's error profile
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_qdigest_rollup_close_to_exact(spark, oracle):
    row = QUERIES["agg_qdigest_rollup"].fn(spark, SF_DIR).collect()[0]
    p25, p50, p75 = oracle.execute(
        "SELECT quantile_cont(l_extendedprice, 0.25),"
        " quantile_cont(l_extendedprice, 0.5),"
        " quantile_cont(l_extendedprice, 0.75) FROM lineitem"
    ).fetchone()
    # merged-digest estimates: rank error ~1/(2*128) -> well under 5% value
    for got, want in [(row.p25, p25), (row.p50, p50), (row.p75, p75)]:
        assert abs(got - want) / want < 0.05, (got, want)


def test_ml_learn_classify(spark):
    """plugin/trino-ml analog: the synthetic embeddings carry no label
    signal (accuracy ~ random), so inject one separable dimension
    (feature[0] := label) — the learner must then recover the labels on a
    holdout, proving the distributed train/classify path end-to-end."""
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables
    from witdb_spark.pipeline.ml import classify, learn_classifier

    indicators = F.array(
        *[(F.col("label") == k).cast("float") * 5.0 for k in range(10)]
    )
    emb = Tables(spark, SF_DIR).embeddings.withColumn(
        "embedding", F.concat(indicators, F.slice("embedding", 11, 54))
    )
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    model = learn_classifier(train)
    scored = classify(model, test)
    assert scored.count() == test.count()
    acc = scored.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).collect()[0][0]
    assert acc > 0.8, acc


def test_hll_ignores_nulls(spark):
    """Reference approx_distinct ignores NULLs (ADVICE r2: md5(NULL) made a
    phantom register with NULL rho)."""
    from witdb_spark.operators.hll import hll_estimate, hll_registers

    with_nulls = spark.createDataFrame(
        [(i % 50 if i % 3 else None,) for i in range(600)], "v int"
    )
    without = with_nulls.where("v IS NOT NULL")
    est_a = hll_estimate(hll_registers(with_nulls, [], "v"), [], "e").collect()[0].e
    est_b = hll_estimate(hll_registers(without, [], "v"), [], "e").collect()[0].e
    assert est_a == est_b


def test_tdigest_rollup_close_to_exact(spark, oracle):
    """Tail accuracy is the t-digest's reason to exist: p95/p99 from the
    merged digest must sit within tight value error of the exact
    quantiles (cosine grid spacing at the tail is O(1/K^2) in rank)."""
    row = QUERIES["agg_tdigest_rollup"].fn(spark, SF_DIR).collect()[0]
    p50, p95, p99 = oracle.execute(
        "SELECT quantile_cont(l_extendedprice, 0.5),"
        " quantile_cont(l_extendedprice, 0.95),"
        " quantile_cont(l_extendedprice, 0.99) FROM lineitem"
    ).fetchone()
    for got, want, tol in [(row.p50, p50, 0.05), (row.p95, p95, 0.02), (row.p99, p99, 0.02)]:
        assert abs(got - want) / want < tol, (got, want)


def test_tdigest_merge_matches_direct_build(spark):
    """merge(tdigest over parts) must approximate a digest built over the
    whole relation — the store-then-merge contract. Rank error of the
    merge is bounded by grid spacing, so fixed grid slots of the two
    digests must agree within a small value tolerance."""
    import numpy as np
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables
    from witdb_spark.operators.tdigest import merge_tdigests, tdigest_agg

    li = Tables(spark, SF_DIR).lineitem.select("l_partkey", "l_extendedprice")
    parts = tdigest_agg(
        li.withColumn("p", F.col("l_partkey") % 16), ["p"], "l_extendedprice"
    )
    merged = merge_tdigests(
        parts.withColumn("g", F.lit(1)).select("g", "tdigest"), ["g"]
    ).collect()[0]
    direct = tdigest_agg(
        li.withColumn("g", F.lit(1)), ["g"], "l_extendedprice"
    ).collect()[0]
    m = np.frombuffer(bytes(merged.tdigest), dtype="float64")
    d = np.frombuffer(bytes(direct.tdigest), dtype="float64")
    assert m[0] == d[0]  # total weight survives the merge exactly
    # min/max are exact by grid construction (q_0 = 0, q_last = 1)
    assert m[1] == d[1] and m[-1] == d[-1]
    mid = slice(2, -2)
    rel = np.abs(m[mid] - d[mid]) / np.maximum(np.abs(d[mid]), 1e-9)
    assert float(np.median(rel)) < 0.02


def test_setdigest_jaccard_exact_when_small(spark):
    """Bottom-k estimator contract (reference SetDigestFunctions.java
    jaccard_index): when |A ∪ B| <= K the estimate is EXACT. nation keys
    0..24 vs 10..34 -> J = 15/35."""
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables
    from witdb_spark.operators.setdigest import jaccard_index, make_set_digest

    na = Tables(spark, SF_DIR).nation
    a = make_set_digest(na.where(F.col("n_nationkey") < 25), [], "n_nationkey")
    b = make_set_digest(
        na.select((F.col("n_nationkey") + 10).alias("k")), [], "k"
    )
    j = jaccard_index(a[0], b[0]).collect()[0].jaccard
    assert abs(j - 15.0 / 35.0) < 1e-12, j


def test_scalable_digest_builds_close_to_direct(spark, oracle):
    """Two-level (per-partition partials -> merge) builds must stay within
    merge-grade error of the exact quantiles — the 100 TB-shape path for
    low-cardinality keys."""
    import numpy as np
    from pyspark.sql import functions as F

    from witdb_spark.catalog import Tables
    from witdb_spark.operators.qdigest import qdigest_agg_scalable
    from witdb_spark.operators.tdigest import tdigest_agg_scalable, values_at_quantiles

    li = Tables(spark, SF_DIR).lineitem.select("l_extendedprice").withColumn(
        "g", F.lit(1)
    ).repartition(8)
    p50, p95 = oracle.execute(
        "SELECT quantile_cont(l_extendedprice, 0.5),"
        " quantile_cont(l_extendedprice, 0.95) FROM lineitem"
    ).fetchone()
    td = tdigest_agg_scalable(li, ["g"], "l_extendedprice")
    row = td.select(values_at_quantiles("tdigest", [0.5, 0.95]).alias("v")).collect()[0]
    assert abs(row.v[0] - p50) / p50 < 0.05
    assert abs(row.v[1] - p95) / p95 < 0.03
    qd = qdigest_agg_scalable(li, ["g"], "l_extendedprice").collect()[0]
    pts = np.frombuffer(bytes(qd.qdigest), dtype="float64")[1:]
    assert abs(float(pts[64]) - p50) / p50 < 0.05  # uniform-grid median slot


def test_review_fix_regressions(spark):
    """Round-4 code-review fixes: short docs shingle to empty (no
    sequence(1,0) crash), contains_sequence with an over-long probe is
    false, nested PERMUTE expands, disconnected concave-x-convex
    intersection yields a MULTIPOLYGON, recursive UNION dedups the
    anchor."""
    from pyspark.sql import functions as F

    from witdb_spark.pipeline.curation import decontaminate

    docs = spark.createDataFrame(
        [(1, "a", "only three words"), (2, "a", " ".join(["w"] * 20))],
        "doc_id long, source string, text string",
    )
    bench = spark.createDataFrame(
        [(9, "b", "tiny")], "doc_id long, source string, text string"
    )
    assert decontaminate(docs, bench, ngram=8).count() == 2

    from witdb_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT contains_sequence(array('a'), array('a','b')) AS c"
    ).collect()[0]
    assert r.c is False

    from witdb_spark.operators.match_recognize import _expand_permute

    out = _expand_permute("PERMUTE(A, PERMUTE(B, C))")
    assert "PERMUTE" not in out and "|" in out

    from witdb_spark.functions.geometry import _geo_ns

    ns = _geo_ns()
    u_shape = "POLYGON ((0 0, 10 0, 10 10, 7 10, 7 3, 3 3, 3 10, 0 10, 0 0))"
    strip = "POLYGON ((-1 5, 11 5, 11 9, -1 9, -1 5))"
    out = ns["intersection"](u_shape, strip)
    assert out.startswith("MULTIPOLYGON"), out
    assert abs(ns["area"](out) - 24.0) < 1e-9  # two 3x4 rectangles

    from witdb_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame([(1,), (1,), (2,)], "x int").createOrReplaceTempView(
        "dup_t"
    )
    n = eng.sql(
        "WITH RECURSIVE r(x) AS (SELECT x FROM dup_t UNION"
        " SELECT x + 10 FROM r WHERE x < 5) SELECT count(*) AS n FROM r"
    ).collect()[0].n
    assert n == 4  # {1, 2, 11, 12} — duplicate anchor 1 collapsed


def test_setdigest_hash_counts(spark):
    """reference SetDigestFunctions.java hashCounts: retained-hash ->
    multiplicity map with smallint saturation."""
    import hashlib

    from witdb_spark.operators.setdigest import hash_counts

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")], ["k", "v"]
    )
    r = {
        row["k"]: row["hash_counts"]
        for row in hash_counts(df, ["k"], "v").collect()
    }
    hx = hashlib.md5(b"x").hexdigest()
    hy = hashlib.md5(b"y").hexdigest()
    assert r["a"][hx] == 2 and r["a"][hy] == 1 and len(r["b"]) == 1
    # global form + bottom-k cap
    g = hash_counts(df, [], "v", k=2).collect()[0]["hash_counts"]
    assert len(g) == 2  # only the 2 smallest hashes retained


def test_ml_regressor_and_evaluate(spark):
    """reference plugin/trino-ml LearnRegressorAggregation / regress /
    EvaluateClassifierPredictionsAggregation (exact report format)."""
    import random

    from witdb_spark.pipeline.ml import (
        evaluate_classifier_predictions,
        learn_regressor,
        regress,
    )

    random.seed(7)
    rows = [
        ([x, 2 * x], 3.0 * x + 1 + random.gauss(0, 0.01))
        for x in [i / 10 for i in range(50)]
    ]
    df = spark.createDataFrame(rows, ["embedding", "label"])
    model = learn_regressor(df, "label", "embedding", max_iter=50, reg_param=0.0)
    out = regress(model, df.select("embedding"), "embedding").collect()
    pred = {tuple(r["embedding"]): r["prediction"] for r in out}
    assert abs(pred[(1.0, 2.0)] - 4.0) < 0.1

    ev = evaluate_classifier_predictions(
        spark.createDataFrame(
            [(1, 1), (1, 1), (0, 1), (0, 0), (2, 2)], ["t", "p"]
        ),
        "t",
        "p",
    ).collect()[0]["report"]
    assert ev.startswith("Accuracy: 4/5 (80.00%)\n")
    assert "Class '0'\nPrecision: 1/1 (100.00%)\nRecall: 1/2 (50.00%)" in ev
    assert ev.endswith("\n")


def test_duplicate_clusters_transitive(spark):
    """Connected components over dup pairs: chains collapse, components
    label by their min doc_id, non-convergence raises."""
    import pytest as _pytest

    from witdb_spark.pipeline.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (7, 9)], ["a_id", "b_id"]
    )
    r = {
        row["doc_id"]: row["cluster"]
        for row in duplicate_clusters(pairs).collect()
    }
    assert r == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 9: 7}
    # a long chain needs more rounds than max_iter=1 allows
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["a_id", "b_id"]
    )
    with _pytest.raises(RuntimeError):
        duplicate_clusters(chain, max_iter=1)
    assert {
        row["cluster"] for row in duplicate_clusters(chain).collect()
    } == {1}


def test_semantic_decontaminate_matmul_path(spark):
    """Above _INLINE_BENCH_MAX benchmark vectors the scorer switches to
    the broadcast-matrix mapInPandas path; results must equal the
    inline-literal path, and NULL/zero-norm corpus rows SURVIVE with a
    NULL score (they cannot match any benchmark vector)."""
    from witdb_spark.pipeline import curation
    from witdb_spark.pipeline.curation import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 1.0]),
            (4, None),            # NULL embedding: must survive, score NULL
            (5, [0.0, 0.0, 0.0]),  # zero-norm: must survive, score NULL
        ],
        "vec_id bigint, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(100)],
        "vec_id bigint, embedding array<double>",
    )
    assert bench.count() > curation._INLINE_BENCH_MAX
    out = {
        r.vec_id: r.max_bench_cosine
        for r in semantic_decontaminate(corpus, bench, threshold=0.95).collect()
    }
    # vec 1 (cos 1.0) dropped; vec 2 (cos ~0.994) dropped; vec 3 kept
    assert set(out) == {3, 4, 5}
    assert out[3] == 0.0
    assert out[4] is None and out[5] is None
    # small-benchmark inline path: same NULL-survival policy
    small = semantic_decontaminate(
        corpus, bench.limit(2), threshold=0.95
    ).collect()
    assert {r.vec_id for r in small} == {3, 4, 5}
    # the two paths agree on the scored values
    big_scores = {
        r.vec_id: r.max_bench_cosine
        for r in semantic_decontaminate(corpus, bench, threshold=2.0).collect()
    }
    small_scores = {
        r.vec_id: r.max_bench_cosine
        for r in semantic_decontaminate(corpus, bench.limit(2), threshold=2.0).collect()
    }
    assert big_scores == small_scores


def test_duplicate_clusters_pointer_doubling_deep_chain(spark):
    """r5: pointer doubling makes rounds O(log diameter) — a 41-node
    path graph (diameter 40) must converge within 10 rounds, which plain
    min-label propagation cannot do."""
    from witdb_spark.pipeline.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a_id bigint, b_id bigint"
    )
    rows = {
        r.doc_id: r.cluster
        for r in duplicate_clusters(pairs, max_iter=10).collect()
    }
    assert len(rows) == 41 and set(rows.values()) == {0}


def test_sql_name_sketch_aggregates(spark):
    """r5: GROUPED_AGG pandas UDFs under the reference's SQL names
    (qdigest_agg/merge_qdigest/approx_set/merge_hll/hll_cardinality).
    qdigest_agg emits the operator wire format, so the registered
    value_at_quantile scalar reads it directly; two-level merge must
    agree with the direct build on the pooled extremes."""
    from witdb_spark.functions import register_all

    register_all(spark)
    spark.range(0, 10001).selectExpr(
        "id % 4 AS k", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("sk_t")
    rows = spark.sql(
        "SELECT k, value_at_quantile(qdigest_agg(v), 0.5) AS med,"
        "       value_at_quantile(qdigest_agg(v), 0.0) AS lo,"
        "       value_at_quantile(qdigest_agg(v), 1.0) AS hi"
        " FROM sk_t GROUP BY k ORDER BY k"
    ).collect()
    for r in rows:
        assert r.lo == float(r.k) and r.hi >= 9996.0
        assert abs(r.med - 5000.0) < 110.0  # K-point rank grid accuracy
    # merge: per-subgroup digests pooled == direct on the extremes
    m = spark.sql(
        "WITH part AS (SELECT k, qdigest_agg(v) AS d FROM sk_t GROUP BY k)"
        " SELECT value_at_quantile(merge_qdigest(d), 0.0) AS lo,"
        "        value_at_quantile(merge_qdigest(d), 1.0) AS hi"
        " FROM part"
    ).collect()[0]
    assert m.lo == 0.0 and m.hi == 10000.0
    # HLL: estimate within 5% of the true distinct count, and the
    # two-level merge path agrees with the single-shot sketch
    est = spark.sql(
        "SELECT hll_cardinality(approx_set(id)) AS c FROM range(20000)"
    ).collect()[0].c
    assert abs(est - 20000) < 1000
    merged = spark.sql(
        "WITH part AS (SELECT id % 8 AS k, approx_set(id) AS h"
        "              FROM range(20000) GROUP BY id % 8)"
        " SELECT hll_cardinality(merge_hll(h)) AS c FROM part"
    ).collect()[0].c
    assert merged == est


def test_sql_name_setdigest(spark):
    """r5 setdigest SQL names: exact jaccard/cardinality when sets are
    smaller than the bottom-k size; merge must equal the one-shot sketch
    of the union."""
    from witdb_spark.functions import register_all

    register_all(spark)
    spark.sql(
        "SELECT explode(sequence(0, 99)) AS v"
    ).createOrReplaceTempView("sd_a")  # {0..99}
    spark.sql(
        "SELECT explode(sequence(50, 149)) AS v"
    ).createOrReplaceTempView("sd_b")  # {50..149}
    row = spark.sql(
        "WITH a AS (SELECT make_set_digest(v) AS d FROM sd_a),"
        "     b AS (SELECT make_set_digest(v) AS d FROM sd_b)"
        " SELECT setdigest_jaccard(a.d, b.d) AS j,"
        "        setdigest_cardinality(a.d) AS ca,"
        "        setdigest_intersection_cardinality(a.d, b.d) AS ic"
        " FROM a, b"
    ).collect()[0]
    # bottom-k estimator: the union (150 hashes) truncates to k=128, so
    # the ratio is sampled, not exact — standard MinHash error ~1/sqrt(k)
    assert abs(row.j - 50.0 / 150.0) < 0.09
    assert abs(row.ca - 100) <= 5  # HLL estimate, 2048 buckets
    assert abs(row.ic - 50.0) < 8.0
    merged = spark.sql(
        "WITH parts AS (SELECT v % 4 AS g, make_set_digest(v) AS d"
        "               FROM sd_a GROUP BY v % 4)"
        " SELECT setdigest_cardinality(merge_set_digest(d)) AS c FROM parts"
    ).collect()[0].c
    one_shot = spark.sql(
        "SELECT setdigest_cardinality(make_set_digest(v)) AS c FROM sd_a"
    ).collect()[0].c
    assert merged == one_shot


def test_qdigest_weighted_rejects_fractional_weight(spark):
    """r9 (ADVICE): Trino binds qdigest_agg's weight parameter as
    bigint — a fractional weight is a bind-time type error there, so
    the UDAF must reject it loudly instead of silently truncating 0.5
    to 0 (which would drop the point from the cumulative-weight grid).
    Integral-valued DOUBLE weights (2.0) stay accepted."""
    from witdb_spark.functions import register_all

    register_all(spark)
    spark.range(0, 100).selectExpr(
        "CAST(id AS DOUBLE) AS v",
        "CAST(CASE WHEN id = 7 THEN 0.5 ELSE 1.0 END AS DOUBLE) AS w",
    ).createOrReplaceTempView("wfrac_t")
    import pytest

    with pytest.raises(Exception, match="integer"):
        spark.sql(
            "SELECT qdigest_agg_w(v, w) AS d FROM wfrac_t"
        ).collect()
    ok = spark.sql(
        "SELECT value_at_quantile(qdigest_agg_w(v, CAST(2.0 AS DOUBLE)),"
        " 0.5) AS m FROM wfrac_t WHERE w = 1.0"
    ).collect()[0].m
    assert abs(ok - 50.0) < 5.0


def test_digest_pooled_build_byte_equals_raw(spark):
    """r13 (VERDICT r12 task 8): the run-length (value, count) pooled
    build inside qdigest_agg / tdigest_agg must be BYTE-equal to the
    raw-row selection it replaced — randomized multisets with heavy
    ties, negative zeros, NaNs and NULLs, including an all-NaN group
    (which must still emit its n=0 digest)."""
    import math
    import random

    import numpy as np

    from witdb_spark.operators.qdigest import K_POINTS, qdigest_agg
    from witdb_spark.operators.tdigest import (
        K_CENTROIDS,
        scale_grid,
        tdigest_agg,
    )

    rnd = random.Random(13)
    rows = []
    for g in range(4):
        for _ in range(rnd.randint(5, 400)):
            r = rnd.random()
            if r < 0.08:
                v = None
            elif r < 0.14:
                v = float("nan")
            elif r < 0.2:
                v = -0.0
            else:
                # heavy ties: values drawn from a small set
                v = float(rnd.choice([-3, -1, 0, 1, 2, 2, 2, 7]))
                v += rnd.choice([0.0, 0.0, 0.25])
            rows.append((g, v))
    rows += [(9, float("nan"))] * 3  # all-NaN group
    df = spark.createDataFrame(rows, "g int, v double")

    def raw_qdigest(vals, kp=K_POINTS):
        vals = np.sort(np.asarray(
            [v for v in vals if v is not None and not math.isnan(v)],
            dtype="float64",
        )) + 0.0
        n = len(vals)
        if n:
            idx = (np.arange(kp, dtype="int64") * (n - 1)) // (kp - 1)
            pts = vals[idx]
        else:
            pts = np.full(kp, np.nan)
        return np.concatenate(([float(n)], pts)).tobytes()

    def raw_tdigest(vals, kp=K_CENTROIDS):
        vals = np.sort(np.asarray(
            [v for v in vals if v is not None and not math.isnan(v)],
            dtype="float64",
        )) + 0.0
        n = len(vals)
        if n:
            idx = np.floor(
                np.asarray(scale_grid(kp)) * (n - 1) + 0.5
            ).astype("int64")
            pts = vals[idx]
        else:
            pts = np.full(kp, np.nan)
        return np.concatenate(([float(n)], pts)).tobytes()

    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)

    got_q = {r.g: bytes(r.qdigest)
             for r in qdigest_agg(df, ["g"], "v").collect()}
    got_t = {r.g: bytes(r.tdigest)
             for r in tdigest_agg(df, ["g"], "v").collect()}
    assert set(got_q) == set(by_g) and set(got_t) == set(by_g)
    for g, vals in by_g.items():
        assert got_q[g] == raw_qdigest(vals), f"qdigest group {g}"
        assert got_t[g] == raw_tdigest(vals), f"tdigest group {g}"
