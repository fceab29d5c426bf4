"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors the reference's benchto methodology (prewarm runs then
measured runs; reference testing/trino-benchto-benchmarks/.../tpch.yaml:3-5
uses 2 prewarm + 6 measured; we use 1 + 3 to fit the round budget), with AQE
on — the point is steady-state plan quality, not JVM warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PREWARM_RUNS = 1
MEASURED_RUNS = 3

# Headline set: exercised operators span scan/filter/agg (q1,q6), multi-way
# joins (q3,q5,q10), the heaviest join+agg (q9), and the custom
# applyInPandas pattern operator (mr_funnel) — extended as coverage widens.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "mr_funnel",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from witdb_spark.queries import QUERIES
    from witdb_spark.session import get_spark

    spark = get_spark(app="witdb-bench")
    names = [n for n in HEADLINE if n in QUERIES]
    names += sorted(n for n in QUERIES if n not in names and "bench" in QUERIES[n].tags)

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        for _ in range(PREWARM_RUNS):
            fn(spark, sf_dir).collect()
        best = min(
            _timed(lambda: fn(spark, sf_dir).collect()) for _ in range(MEASURED_RUNS)
        )
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
