"""Per-action cost decomposition for the bench queries (r9 verdict #2).

The paired bench ratio has read >2x for three rounds with the same
explanation — "Spark's fixed ~0.1-0.3 s/action local-mode cost against
an in-process columnar engine on sub-second queries". This tool turns
that sentence into a measured artifact. For each bench query it splits
the end-to-end wall time (what bench.py times, rebuilding the DataFrame
every run exactly like the driver protocol) into:

  build_s   — Python-side DataFrame construction: pure Py4J expression
              chatter, zero data touched.
  plan_s    — Catalyst analysis + optimization + physical planning of
              the exact count-shaped plan .count() executes (count()
              constructs a fresh groupBy().count() dataset on every
              call, so planning happens on EVERY bench run — this is a
              per-run cost, measured by forcing executedPlan() with no
              execution).
  e2e_s     — median-of-5 of the full bench action (rebuild + plan +
              execute), i.e. the number bench.py reports.
  exec_s    — derived: e2e_s - build_s - plan_s. Task scheduling + the
              actual work (AQE's runtime replanning lands here, where
              it happens).

and, from the Spark UI REST API (this tool runs its own session with
spark.ui.enabled=true; the shared factory keeps it off), the JVM task
metrics summed over the 5 e2e runs' stages and divided by 5 (per-run
averages):

  task_run_ms      — executorRunTime (the only part that is "work")
  task_deser_ms    — executorDeserializeTime
  task_gc_ms       — jvmGcTime
  task_result_ms   — resultSerializationTime
  n_tasks          — task launch count
  sched_ms         — exec wall x slots - all of the above: idle slot
                     time = scheduler delay + launch gaps (upper bound)

Reading the artifact: plan_s + build_s is a FIXED per-query cost that
is identical at sf0.1 and at 100 TB (Catalyst does not look at data),
so it amortizes to zero at the design point; exec_s scales with data.
DuckDB's parse+plan on these texts is ~0.1-1 ms, so the honest
scale-relevant comparison is exec_s vs the DuckDB median — both are
"execute a planned query over warm data".

Usage:  python tools/bench_decompose.py [sf_dir] [label ...]
Writes one JSON line per query + a summary line to stdout; commit the
output as BENCH_DECOMP.json (bench.py's baseline_note points here).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_FIXTURES", "1")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _rest(ui: str, app: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    from pyspark.sql import SparkSession

    from basis_spark.session import default_parallelism

    n = default_parallelism()
    # Same tuned configs as basis_spark.session.get_spark, UI enabled so
    # the REST API can report task metrics (the shared factory disables
    # the UI; this tool owns its process so a one-off session is safe).
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("bench-decompose")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", str(2 * n))
        .config("spark.default.parallelism", str(2 * n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import basis_spark.operators  # noqa: F401
    from basis_spark.registry import QUERIES
    from bench import BENCH_KEYS

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    # load gate + settle canary, same protocol as bench.py: the first
    # decomposition run on a post-sweep host produced internally
    # inconsistent segments (build_s > e2e_s) because the five-run
    # medians of DIFFERENT segments are measured at different moments
    # of a decaying load curve.
    waits = 0
    while os.getloadavg()[0] > 1.0 and waits < 6:
        waits += 1
        print(f"# load {os.getloadavg()[0]:.2f} > 1.0; sleeping 30s", file=sys.stderr)
        time.sleep(30)
    prev = None
    for _ in range(12):
        t0 = time.perf_counter()
        QUERIES["agg_groupby_multi"](spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) / max(dt, prev) < 0.15:
            break
        prev = dt

    out = {}
    for label, key in BENCH_KEYS.items():
        if ONLY and label not in ONLY and key not in ONLY:
            continue
        if label == "q11_neardup_minhash":
            continue  # cold-build protocol; decomposition targets the overhead-bound 11

        fn = QUERIES[key]
        fn(spark, SF_DIR).count()  # untimed warm-up (codegen compiled)

        # build: DataFrame construction only (Py4J expression chatter),
        # median of 5 — construction repeats on every bench run
        builds = []
        for _ in range(5):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            builds.append(time.perf_counter() - t0)
        build_s = _median(builds)

        # plan: force analysis+optimization+physical planning of the
        # count-shaped plan (what .count() actually executes), median
        # of 5 fresh plans, no execution
        plans = []
        for _ in range(5):
            cdf = fn(spark, SF_DIR).groupBy().count()
            t0 = time.perf_counter()
            cdf._jdf.queryExecution().executedPlan()
            plans.append(time.perf_counter() - t0)
        plan_s = _median(plans)

        # e2e: the bench.py protocol (rebuild every run) — median of 5,
        # with REST stage capture for JVM task metrics
        before = {s["stageId"] for s in _rest(ui, app, "/stages")}
        e2e = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            e2e.append(time.perf_counter() - t0)
        # Poll until no new stage is still ACTIVE/PENDING (r10 advice:
        # a COMPLETE-only snapshot taken while a stage is finishing
        # drops its tasks, understating task_run_ms and inflating the
        # idle_slot_ms upper bound). Local-mode actions are synchronous
        # so this settles immediately in practice; the poll is the
        # guarantee, max ~2 s. SKIPPED stages are kept and counted.
        for _ in range(20):
            snap = [s for s in _rest(ui, app, "/stages") if s["stageId"] not in before]
            if not any(s["status"] in ("ACTIVE", "PENDING") for s in snap):
                break
            time.sleep(0.1)
        stages = [s for s in snap if s["status"] in ("COMPLETE", "SKIPPED")]
        n_skipped = sum(1 for s in stages if s["status"] == "SKIPPED")
        e2e_s = _median(e2e)
        exec_s = max(0.0, e2e_s - build_s - plan_s)

        run_ms = sum(s.get("executorRunTime", 0) for s in stages) / 5.0
        deser_ms = sum(s.get("executorDeserializeTime", 0) for s in stages) / 5.0
        gc_ms = sum(s.get("jvmGcTime", 0) for s in stages) / 5.0
        res_ms = sum(s.get("resultSerializationTime", 0) for s in stages) / 5.0
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages) / 5.0
        slots = float(n)
        sched_ms = max(0.0, exec_s * 1000.0 * slots - run_ms - deser_ms - res_ms)

        out[label] = {
            # build+plan measured in different instants than e2e: if
            # they exceed e2e the host moved mid-query — flag it so the
            # artifact self-reports contamination instead of clamping
            # silently.
            "segments_inconsistent": bool(build_s + plan_s > e2e_s),
            "e2e_s": round(e2e_s, 4),
            "build_s": round(build_s, 4),
            "plan_s": round(plan_s, 4),
            "exec_s": round(exec_s, 4),
            "fixed_s": round(build_s + plan_s, 4),
            "task_run_ms": round(run_ms, 1),
            "task_deser_ms": round(deser_ms, 1),
            "task_gc_ms": round(gc_ms, 1),
            "task_result_ms": round(res_ms, 1),
            "n_tasks_per_run": round(n_tasks, 1),
            "idle_slot_ms_ub": round(sched_ms, 1),
            "n_skipped_stages": n_skipped,
        }
        print(f"# {label}: {json.dumps(out[label])}", file=sys.stderr)

    fixed = sum(v["build_s"] + v["plan_s"] for v in out.values())
    e2e_t = sum(v["e2e_s"] for v in out.values())
    exec_t = sum(v["exec_s"] for v in out.values())
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "queries": out,
                "e2e_total_s": round(e2e_t, 4),
                "exec_total_s": round(exec_t, 4),
                "fixed_total_s": round(fixed, 4),
                "fixed_share": round(fixed / e2e_t, 3) if e2e_t else None,
                "note": (
                    "fixed_s = DataFrame build (Py4J) + Catalyst planning - "
                    "per-query constants that do not scale with data and "
                    "amortize to ~0 at the 100 TB design point; exec_s = "
                    "re-execution of the memoized plan (scheduling + work). "
                    "task_* are per-run JVM task metrics (UI REST, averaged "
                    "over the 5 e2e runs); idle_slot_ms_ub = exec wall x "
                    "slots minus accounted task time (scheduler delay + "
                    "launch gaps + underparallelism, upper bound)."
                ),
                "load_avg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
