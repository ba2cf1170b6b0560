#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default all cores),
``SPARK_GRAFT_BENCH_REPS`` (default 3 — per-query time is the MIN over
the TIMED reps, which strips VM-noise spikes; this box swings 3x on
heavy queries, so n=1 measures the hypervisor, not the plan),
``SPARK_GRAFT_BENCH_WARMUP`` (default 1 — DISCARDED warmup sweeps run
before the timed reps, so first-pass JIT/codegen-compile/page-cache
effects never pollute any timed rep; round 8's capstone spread
35.6/8.8/8.8 s was exactly this artifact.  Warmup times are recorded
in BENCH_DETAIL.json under "warmup" for the archaeology but excluded
from every reported stat), ``SPARK_GRAFT_BENCH_BUDGET`` (seconds,
default 1800 — raised from 1200 when the warmup sweep landed so the
default run still fits warmup + 3 TIMED reps; a budget that only
admits warmup + 2 reps silently weakens the min statistic vs earlier
rounds.  The warmup sweep and timed rep 1 always complete; later reps
are skipped once the budget is spent, so a slow VM degrades to n=1
instead of overrunning the driver).

Each query is materialized with the ``noop`` sink — full computation, no
driver-side row transfer — so the number measures the engine, not py4j.

Output contract: the FINAL stdout line is one machine-readable JSON
object ``{"metric", "value", "unit", "queries", "sf", ...}`` kept under
~1.9 KB (the driver records only a 2000-char stdout tail; round 1's
2.7 KB line was truncated into ``"parsed": null``).  If the full
per-query map won't fit, the slowest queries are kept and the rest are
dropped from the LINE only — ``BENCH_DETAIL.json`` next to this script
always holds every rep of every query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MAX_LINE = 1900  # driver keeps a 2000-char stdout tail; stay clearly under


def _machine_state() -> dict:
    """Snapshot of host load so cross-round bench comparisons can tell a
    plan regression from a busy/cold box (round 9's ANN-family numbers
    were 1.6x on byte-unchanged code — this stamp makes that diagnosable
    instead of archaeological)."""
    state: dict = {}
    try:
        with open("/proc/loadavg") as fh:
            parts = fh.read().split()
        state["loadavg_1m"], state["loadavg_5m"], state["loadavg_15m"] = (
            float(parts[0]),
            float(parts[1]),
            float(parts[2]),
        )
    except Exception:
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                key, _, rest = line.partition(":")
                if key in ("MemTotal", "MemAvailable", "Cached"):
                    mem[key] = int(rest.split()[0])  # kB
        state["mem_available_gb"] = round(mem.get("MemAvailable", 0) / 1048576, 2)
        state["page_cache_gb"] = round(mem.get("Cached", 0) / 1048576, 2)
    except Exception:
        pass
    state["cpu_count"] = os.cpu_count()
    # fixed-work microbenchmarks (~100 ms total): a pure-Python loop and
    # a numpy GEMM.  These give future rounds an absolute yardstick for
    # host speed — the r9->r10 investigation showed byte-identical r8
    # code running 1.5x slower on the same box a week later, which was
    # only provable by re-running old code; with these stamps the next
    # drift is one subtraction.
    try:
        t = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i
        state["py_loop_ms"] = round((time.perf_counter() - t) * 1000, 1)
    except Exception:
        pass
    try:
        import numpy as np

        a = np.ones((512, 512), dtype=np.float32)
        t = time.perf_counter()
        for _ in range(8):
            a = a @ a * 1e-6
        state["np_gemm_ms"] = round((time.perf_counter() - t) * 1000, 1)
    except Exception:
        pass
    return state


def _compact(payload: dict) -> str:
    return json.dumps(payload, separators=(",", ":"))


def _final_line(best: dict[str, float], sf, machine: dict | None = None) -> str:
    """Build the final stdout line, shedding per-query entries (fastest
    first) until it fits the driver's capture window."""
    total = round(sum(best.values()), 3)
    base = {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": {},
        "n_queries": len(best),
        "mean_query_time": round(total / max(len(best), 1), 3),
        "sf": sf,
    }
    if machine:
        # the host yardstick travels IN the per-round artifact: the
        # driver records only this line, and cross-round totals on this
        # box are meaningless without it (same-code spans measured
        # 55-101 s at x100 and py_loop 60-160 ms within one round)
        base["host"] = {
            k: machine[k]
            for k in ("py_loop_ms", "np_gemm_ms", "loadavg_1m")
            if k in machine
        }
    # slowest-first so a truncated line still covers the heavy hitters
    ordered = sorted(best.items(), key=lambda kv: -kv[1])
    kept = {k: round(v, 2) for k, v in ordered}
    while kept:
        base["queries"] = dict(sorted(kept.items()))
        if len(kept) < len(best):
            base["queries_truncated"] = len(best) - len(kept)
            base["detail"] = "BENCH_DETAIL.json"
        line = _compact(base)
        if len(line) <= MAX_LINE:
            return line
        kept.pop(next(reversed(kept)))  # drop the current fastest
        base.pop("queries_truncated", None)
        base.pop("detail", None)
    base["queries"] = {}
    base["queries_truncated"] = len(best)
    base["detail"] = "BENCH_DETAIL.json"
    return _compact(base)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    warmups = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1800"))
    sf_raw = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_raw) if sf_raw.replace(".", "").isdigit() else sf_raw

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bdq_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # Focused re-measurement: SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the
    # sweep to the named entries (diagnosing one family without paying
    # the full-registry wall time).  Full runs leave it unset.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = [q.strip() for q in only.split(",") if q.strip()]
        unknown = [q for q in wanted if q not in queries]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names unknown queries: {unknown}")
        queries = {name: queries[name] for name in wanted}

    machine_start = _machine_state()

    # warm up JVM/codegen/scan paths so the first timed query measures the
    # engine rather than one-time initialization
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    t0 = time.perf_counter()
    all_reps: dict[str, list[float]] = {name: [] for name in queries}
    warmup_reps: dict[str, list[float]] = {name: [] for name in queries}
    reps_done = 0
    warmups_done = 0
    # negative rep indices are DISCARDED warmup sweeps: identical work,
    # times recorded separately and excluded from every reported stat
    for rep in range(-warmups, reps):
        if rep > 0 and time.perf_counter() - t0 > budget:
            break
        target = warmup_reps if rep < 0 else all_reps
        for name, fn in queries.items():
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            target[name].append(round(time.perf_counter() - start, 4))
            # operators may cache intermediates (minhash signatures,
            # shingle sets); drop them so later queries aren't timed under
            # the accumulated memory/GC pressure of earlier ones, and take
            # the stop-the-world GC hit between queries rather than inside
            spark.catalog.clearCache()
            # clearCache covers the SQL cache but NOT localCheckpoint
            # blocks (dedup's prefix index, connected components' round
            # checkpoints) — those sit in the block manager until the
            # async ContextCleaner notices, and 75 queries x 3 reps of
            # accumulation made later reps 2-3x slower.  Unpersist them
            # explicitly so every query starts from a clean block manager.
            for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                jrdd.unpersist()
            spark.sparkContext._jvm.System.gc()
        if rep < 0:
            warmups_done += 1
        else:
            reps_done = rep + 1

    best = {name: min(ts) for name, ts in all_reps.items() if ts}
    detail = {
        "sf": sf,
        "cpus": int(cpus),
        "reps_requested": reps,
        "reps_done": reps_done,
        "warmups_requested": warmups,
        "warmups_done": warmups_done,
        "budget_sec": budget,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "min": best,
        "mean": {
            name: round(sum(ts) / len(ts), 4) for name, ts in all_reps.items() if ts
        },
        # statistics.median averages the two middle reps for even n, so a
        # budget-degraded 2-rep query reports the midpoint, not the worse rep
        "median": {
            name: round(statistics.median(ts), 4)
            for name, ts in all_reps.items()
            if ts
        },
        "reps": all_reps,
        "warmup": warmup_reps,
        "machine": {"start": machine_start, "end": _machine_state()},
    }
    if only:
        detail["bench_only"] = sorted(queries)
    # focused runs record to a sidecar so the full-registry artifact the
    # judge compares across rounds is never overwritten by a subset sweep
    detail_name = "BENCH_DETAIL_ONLY.json" if only else "BENCH_DETAIL.json"
    with open(os.path.join(REPO, detail_name), "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)

    print(_final_line(best, sf, machine=detail["machine"]["end"]))


if __name__ == "__main__":
    main()
