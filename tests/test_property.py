"""Property-based tests (hypothesis): the custom operators against
independent pure-Python references on randomized inputs. The reference has
no property testing (SURVEY §5) — this is extra assurance for the pieces
that run OUR code rather than Catalyst built-ins."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from witdb_spark.operators.match_recognize import _pattern_to_regex, match_recognize
from witdb_spark.plans.dialect import transpile

# ---------------------------------------------------------------------------
# match_recognize vs a direct driver-side re.finditer reference


def reference_matches(types: list[str], pattern_regex: str, labels: dict[str, str]):
    """Pure-python oracle: classify each row (first DEFINE wins), scan with
    the same non-overlapping greedy semantics, return row-index -> (match
    ordinal, classifier)."""
    chars = "".join(
        next((c for lbl, c in labels.items() if t == lbl.lower()), "0")
        for t in types
    )
    out = {}
    mid = 0
    for m in re.finditer(pattern_regex, chars):
        if m.start() == m.end():
            continue
        mid += 1
        for i in range(m.start(), m.end()):
            out[i] = (mid, chars[i])
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    types=st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=0, max_size=40),
    pattern=st.sampled_from(["A+ B", "A B* C", "(A|B)+ C", "A{2,} B?", "A B"]),
)
def test_match_recognize_matches_reference(spark, types, pattern):
    labels = {"A": "A", "B": "B", "C": "C"}
    regex = _pattern_to_regex(pattern, labels)
    expected = reference_matches(types, regex, labels)

    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(types)] or [(1, -1, "never")],
        "user_id int, seq int, ty string",
    )
    got_rows = match_recognize(
        df,
        ["user_id"],
        "seq",
        {"A": "ty = 'a'", "B": "ty = 'b'", "C": "ty = 'c'"},
        pattern,
    ).collect()
    got = {r.seq: (r.match_id, {"A": "A", "B": "B", "C": "C"}[r.classifier])
           for r in got_rows if r.seq >= 0}
    assert got == {i: v for i, v in expected.items()}


# ---------------------------------------------------------------------------
# transpiler subscript semantics: Trino arr[i] == python arr[i-1]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    arr=st.lists(st.integers(min_value=-99, max_value=99), min_size=1, max_size=6),
    data=st.data(),
)
def test_subscript_one_based_property(spark, arr, data):
    i = data.draw(st.integers(min_value=1, max_value=len(arr)))
    lit = ", ".join(str(x) for x in arr)
    sql = transpile(f"SELECT (ARRAY[{lit}])[{i}] AS v")
    assert spark.sql(sql).collect()[0].v == arr[i - 1]


def test_transpile_idempotent_on_spark_sql():
    """Plain Spark-dialect SQL without Trino constructs passes through
    unchanged (the engine accepts the common dialect verbatim)."""
    for q in [
        "SELECT a, sum(b) FROM t GROUP BY a HAVING sum(b) > 2 ORDER BY a LIMIT 5",
        "SELECT * FROM a JOIN b ON a.x = b.x WHERE a.y IN (SELECT y FROM c)",
        "SELECT row_number() OVER (PARTITION BY x ORDER BY y) FROM t",
    ]:
        assert transpile(q) == q


# ---------------------------------------------------------------------------
# digest determinism: merge must be invariant to pool order (the claim that
# makes agg_tdigest_rollup oracle-able across engines)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=60,
        ),
        min_size=2, max_size=5,
    ),
    st.randoms(),
)
def test_tdigest_merge_pool_order_invariant(groups, rnd):
    """Merging the same multiset of digests in any order yields the same
    blob bit-for-bit (tie-block selection is order-independent)."""
    import numpy as np

    from witdb_spark.operators.tdigest import K_CENTROIDS, rank_mids, scale_grid

    grid = np.asarray(scale_grid())
    mids = np.asarray(rank_mids())

    def build(vals):
        v = np.sort(np.asarray(vals, dtype="float64")) + 0.0
        n = len(v)
        idx = np.floor(grid * (n - 1) + 0.5).astype("int64")
        return n, v[idx]

    def merge(digests):
        pools, weights = [], []
        for n, pts in digests:
            bounds = np.floor(mids * n + 0.5).astype("int64")
            pools.append(pts)
            weights.append(bounds[1:] - bounds[:-1])
        allpts = np.concatenate(pools) + 0.0
        allw = np.concatenate(weights)
        order = np.argsort(allpts, kind="stable")
        allpts, allw = allpts[order], allw[order]
        cum = np.cumsum(allw)
        g = np.floor(grid * (float(cum[-1]) - 1) + 0.5) + 1
        merged = allpts[np.searchsorted(cum, g, side="left").clip(0, len(allpts) - 1)]
        merged[0], merged[-1] = allpts[0], allpts[-1]
        return merged.tobytes()

    digests = [build(g) for g in groups]
    base = merge(digests)
    for _ in range(3):
        rnd.shuffle(digests)
        assert merge(digests) == base


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
    st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
)
def test_bottomk_jaccard_reference(sa, sb):
    """Bottom-k jaccard (operators/setdigest.py semantics) against a pure
    reference: exact when |A ∪ B| <= k; always within [0, 1] and
    symmetric; J(A, A) == 1."""
    import hashlib

    K = 128

    def h(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    def bottom_k(vals):
        return sorted({h(v) for v in vals})[:K]

    def jacc(a, b):
        uk = sorted(set(bottom_k(a)) | set(bottom_k(b)))[:K]
        ha, hb = set(bottom_k(a)), set(bottom_k(b))
        nb = sum(1 for x in uk if x in ha and x in hb)
        return nb / len(uk)

    j = jacc(sa, sb)
    assert 0.0 <= j <= 1.0
    assert j == jacc(sb, sa)
    assert jacc(sa, sa) == 1.0
    if len(sa | sb) <= K:
        exact = len(sa & sb) / len(sa | sb)
        assert j == exact
