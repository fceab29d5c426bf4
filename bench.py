"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors the reference's benchto methodology (prewarm runs then
measured runs; reference testing/trino-benchto-benchmarks/.../tpch.yaml:3-5
uses 2 prewarm + 6 measured; we use 1 + 3 to fit the round budget), with AQE
on — the point is steady-state plan quality, not JVM warmup.

Drift note (r3->r4): BENCH_r03 showed a uniform +20-37% on queries whose
code, plans, and configs had not changed since r2 (tpch_q1 1.42->1.94s).
r4 local re-runs of the same commits return r2-level numbers (tpch_q1
1.37s) with those queries still untouched — consistent with sandbox load
variance, not a plan regression (all hot plans are gated in
tests/test_plans.py). To make any future drift diagnosable instead of
arguable, each run now also emits `stage_metrics_per_run` (per query,
from the UI REST API): `executor_run_ms` (task WALL time summed across
tasks — load- and frequency-sensitive), `executor_cpu_ms` (task CPU
time, r14 — the load-insensitive signal VERDICT r13 asked for: r13's
+29% run time with byte-flat plans could not be adjudicated without
it), and shuffle/input bytes. A wall-clock delta with flat bytes and
flat CPU is machine noise; rising shuffle bytes or rising CPU is a
real regression. Each run also times a fixed JVM-only calibration spin
(`calibration`) so cross-round machine-speed drift is directly
measurable.
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
# joins (q3,q5,q10), the heaviest join+agg (q9), the custom applyInPandas
# pattern operator (mr_funnel), and (r5) the operator families added in
# r4/r5 so they get round-over-round tracking: connected-components
# clustering (dedup_clusters), the banded spatial join with the vectorized
# verify kernel (spatial_join_contains), the two-shuffle TF-IDF top-k
# (text_tfidf_top_terms), and one TPC-H query as Trino SQL text through
# the full parse/transpile path (tpch_sql_q9 — its DataFrame twin is
# already tracked, so the delta isolates the front-door overhead).
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q10",
    "mr_funnel",
    "dedup_clusters",
    "spatial_join_contains",
    "text_tfidf_top_terms",
    "tpch_sql_q9",
    "agg_qdigest_sql_names",
    "agg_tdigest_sql_names",
    "tpcds_sql_q67",
    # r8: the widest multi-join shape (HAVING CTE + six-table
    # cross_sales + consecutive-year self-join) — tracks the tranche-4
    # join family round-over-round
    "tpcds_sql_q64",
    # late-r8: the bigram-LM scorer — explode + three partial-agg
    # shuffles + two equi-joins; tracks the LLM-pipeline text tier
    "text_bigram_logprob",
]


def _stage_totals(spark) -> dict[str, int] | None:
    """Cumulative completed-stage metrics from the UI REST API — lets a
    round-over-round wall-clock drift decompose into CPU vs shuffle vs
    scan (VERDICT r3: unexplained +20-25% on unchanged queries)."""
    try:
        import urllib.request

        app_id = spark.sparkContext.applicationId
        port = spark.conf.get("spark.ui.port", "4040")
        url = f"http://127.0.0.1:{port}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=5) as r:
            stages = json.loads(r.read())
        tot = {
            "executor_run_ms": 0,
            "executor_cpu_ms": 0,
            "shuffle_read_b": 0,
            "shuffle_write_b": 0,
            "input_b": 0,
        }
        cpu_ns = 0
        for s in stages:
            tot["executor_run_ms"] += s.get("executorRunTime", 0)
            cpu_ns += s.get("executorCpuTime", 0)  # REST reports ns
            tot["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
            tot["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
            tot["input_b"] += s.get("inputBytes", 0)
        tot["executor_cpu_ms"] = cpu_ns // 1_000_000
        return tot
    except Exception:
        return None


#: r10 (VERDICT r9 task 6): two consecutive rounds' wall numbers were
#: load-contaminated. The headline snapshot now WAITS for a quiet box
#: (1-minute loadavg under the gate, up to the budget) and records an
#: explicit contention note when it never quiets down — so a wall
#: regression with loadavg_start < gate is a real signal, not noise.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
LOAD_WAIT_BUDGET_S = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_S", "300"))


def _wait_for_quiet_box() -> bool:
    waited = 0
    while os.getloadavg()[0] > LOAD_GATE and waited < LOAD_WAIT_BUDGET_S:
        time.sleep(15)
        waited += 15
    return os.getloadavg()[0] <= LOAD_GATE


def _round_number() -> int:
    """Next round number inferred from the driver's BENCH_r{N}.json
    files — at bench time the current round's file does not exist yet,
    so max(existing)+1 names this run's archive."""
    import glob
    import re

    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json"))
        for m in [re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p))]
        if m
    ]
    return (max(ns) + 1) if ns else 0


def _load_prev_stages():
    """The previous round's stage sidecar for delta_vs_prev (r12,
    VERDICT r11 task 4: byte drift must self-adjudicate — sidecars are
    archived per round now, so the comparison needs no archaeology).
    Prefers the newest BENCH_STAGES_r{N}.json; falls back to the
    un-numbered r11-era sidecar."""
    import glob
    import re

    cands = glob.glob(os.path.join(REPO_ROOT, "BENCH_STAGES_r*.json"))

    def rn(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    path = (
        max(cands, key=rn)
        if cands
        else os.path.join(REPO_ROOT, "BENCH_STAGES.json")
    )
    try:
        with open(path) as f:
            return json.load(f), os.path.basename(path)
    except (OSError, ValueError):
        return None, None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    prev_stages, prev_name = _load_prev_stages()
    quiet = _wait_for_quiet_box()

    from witdb_spark.queries import QUERIES
    from witdb_spark.session import get_spark

    spark = get_spark(
        app="witdb-bench",
        extra={"spark.ui.enabled": "true", "spark.ui.port": "40413"},
    )
    names = [n for n in HEADLINE if n in QUERIES]
    names += sorted(n for n in QUERIES if n not in names and "bench" in QUERIES[n].tags)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    stage_deltas: dict[str, dict[str, int]] = {}
    executor_ms: dict[str, int] = {}
    executor_cpu_ms: dict[str, int] = {}
    load_per_query: dict[str, float] = {}
    load_start = round(os.getloadavg()[0], 2)

    # r14 calibration (VERDICT r13): a FIXED JVM-only spin — same bytes,
    # same plan, every round — so machine-speed drift (CPU frequency,
    # sandbox throttling) is measured directly instead of inferred from
    # query deltas. ~0.5s of pure codegen arithmetic, no I/O, no shuffle.
    def _calibrate() -> dict:
        spin = lambda: spark.range(0, 150_000_000, 1, 32).selectExpr(  # noqa: E731
            "sum(id % 7919) AS s"
        ).collect()
        spin()  # prewarm
        cb = _stage_totals(spark)
        walls = sorted(_timed(spin) for _ in range(3))
        ca = _stage_totals(spark)
        rec = {"wall_sec_min_of_3": round(walls[0], 4)}
        if cb is not None and ca is not None:
            rec["cpu_ms_per_run"] = (
                ca["executor_cpu_ms"] - cb["executor_cpu_ms"]
            ) // 3
            rec["run_ms_per_run"] = (
                ca["executor_run_ms"] - cb["executor_run_ms"]
            ) // 3
        return rec

    calibration = _calibrate()
    for name in names:
        fn = QUERIES[name].fn
        for _ in range(PREWARM_RUNS):
            fn(spark, sf_dir).collect()
        before = _stage_totals(spark)
        runs = sorted(
            _timed(lambda: fn(spark, sf_dir).collect()) for _ in range(MEASURED_RUNS)
        )
        after = _stage_totals(spark)
        # headline stays min-of-N (comparable with prior rounds); the
        # spread [min, median, max] makes noise visible so a +15% wall
        # swing with flat bytes (r7: mr_funnel, tpch_q10) is flagged as
        # noise by the numbers, not by argument.
        timings[name] = round(runs[0], 4)
        spreads[name] = [
            round(runs[0], 3),
            round(runs[len(runs) // 2], 3),
            round(runs[-1], 3),
        ]
        load_per_query[name] = round(os.getloadavg()[0], 2)
        if before is not None and after is not None:
            # delta across the MEASURED_RUNS executions of this query
            stage_deltas[name] = {
                k: (after[k] - before[k]) // MEASURED_RUNS for k in after
            }
            executor_ms[name] = stage_deltas[name]["executor_run_ms"]
            executor_cpu_ms[name] = stage_deltas[name]["executor_cpu_ms"]

    total = round(sum(timings.values()), 4)
    # r16 (VERDICT r15 #4): the PRINTED final line carries ONLY the
    # contract fields (metric/value/unit/queries/sf, plus the tiny
    # stat/total-CPU scalars) — the r14 line grew so large the driver's
    # stdout tail truncated it mid-JSON and PERF_r15 lost every
    # round-over-round speedup. Everything diagnostic (spreads,
    # per-query executor/CPU ms, loadavg, calibration, byte deltas)
    # moves to the sidecar file and an EARLIER stdout line for humans.
    # Timing methodology is unchanged: same queries, same 1+3 runs,
    # same min-of-3 statistic.
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stat": f"min_of_{MEASURED_RUNS}",
        # the two load-insensitive scalars stay on the line: they are
        # the round-over-round drift signal and cost ~60 bytes
        "executor_ms_total": sum(executor_ms.values()),
        "executor_cpu_ms_total": sum(executor_cpu_ms.values()),
    }
    diag = {
        "calibration": calibration,
        "load_gate": {
            "gate_1m": LOAD_GATE,
            "quiet_at_start": quiet,
            "note": (
                None
                if quiet
                else f"box never quieted below {LOAD_GATE} within"
                f" {LOAD_WAIT_BUDGET_S}s — wall numbers are"
                " load-contaminated; read executor_ms instead"
            ),
        },
        "spread": spreads,
        "executor_ms": executor_ms,
        "executor_cpu_ms": executor_cpu_ms,
        "loadavg": {
            "start": load_start,
            "end": round(os.getloadavg()[0], 2),
            "per_query_1m": load_per_query,
        },
    }
    # r12 (VERDICT r11 task 4): per-query byte comparison against the
    # previous round's archived sidecar — a wall/CPU delta with
    # bytes_flat covering the query is machine noise by the numbers; a
    # query in bytes_changed is a real plan/volume change.
    if prev_stages and stage_deltas and prev_stages.get("sf") == out["sf"]:
        prev_sm = prev_stages.get("stage_metrics_per_run") or {}
        byte_keys = ("shuffle_read_b", "shuffle_write_b", "input_b")
        flat, changed = [], {}
        for qname, cur in stage_deltas.items():
            p = prev_sm.get(qname)
            if p is None:
                continue
            diffs = {
                k: [p.get(k, 0), cur[k]]
                for k in byte_keys
                if abs(cur[k] - p.get(k, 0))
                > max(1024, 0.02 * max(cur[k], p.get(k, 0)))
            }
            if diffs:
                changed[qname] = diffs
            else:
                flat.append(qname)
        diag["delta_vs_prev"] = {
            "baseline": prev_name,
            "bytes_flat": sorted(flat),
            "bytes_changed": changed,
        }
    # r7 stdout contract fix (VERDICT r6 "What's wrong #2"): the driver
    # tail-captures stdout; stage metrics and diagnostics go to a
    # sidecar file (and an EARLIER stdout line for humans); the compact
    # headline object is the LAST stdout line, small enough for any
    # tail window.
    sidecar = {
        "sf": out["sf"],
        "headline": out,
        "diagnostics": diag,
    }
    if stage_deltas:
        sidecar["stage_metrics_per_run"] = stage_deltas
        sidecar["spread_min_median_max_sec"] = spreads
    # r12: the sidecar is ARCHIVED per round (BENCH_STAGES_r{N}) so
    # round-over-round byte comparison never needs archaeology; the
    # un-numbered name stays for compatibility. Only the default-SF
    # (driver) run archives — ad-hoc sf0.01 iteration must not clobber
    # the round record.
    try:
        with open(os.path.join(REPO_ROOT, "BENCH_STAGES.json"), "w") as f:
            json.dump(sidecar, f)
        if "SPARK_GRAFT_SF_DIR" not in os.environ:
            rn = _round_number()
            with open(
                os.path.join(REPO_ROOT, f"BENCH_STAGES_r{rn:02d}.json"),
                "w",
            ) as f:
                json.dump(sidecar, f)
    except OSError:
        pass
    print(json.dumps({"diagnostics": diag, "stage_metrics_per_run": stage_deltas}))
    print(json.dumps(out))
    spark.stop()


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
