#!/usr/bin/env python
"""Multi-SF close-out gate (r9 verdict #3): run the full oracle sweep
at sf0.001, sf0.01 AND sf0.1 in one command and record the artifact.

Why this exists as a GATE and not a habit: the driver's per-round gate
runs only at sf0.01, and r9 proved that scale-factor-dependent
knife-edges hide from any single SF — five real divergence classes
(fixture-size-dependent oracles, sf0.1-only window midpoints, the
15-site decimal-midpoint hazard) were caught only by manually sweeping
the other two SFs. This tool makes that evidence class one command, and
SURVEY §5's close-out protocol requires its artifact (SWEEP_ALL_SF.txt,
committed) in the final commit of every round.

Each SF runs in a SUBPROCESS: oracle_sweep pins process TZ and binds
SPARK_GRAFT_ORACLE_SF_DIR at import time, and a single shared
SparkSession would otherwise carry one SF's cached fixture tables into
the next SF's run.

Usage:
    python tools/sweep_all_sf.py              # all three SFs
    python tools/sweep_all_sf.py sf0.001 sf0.1   # subset
    python tools/sweep_all_sf.py --hostile    # 3 SFs + a 4th leg at
        sf0.01 under SWEEP_HOSTILE=1 (local[8], America/Chicago
        session TZ - simulates the driver's own untuned session)
    python tools/sweep_all_sf.py --bench-profile  # + a leg at sf0.1
        under SWEEP_BENCH_PROFILE=1 (shuffle.partitions=8, AQE off -
        bench.py's small-SF profile) over a 20-key representative
        subset, re-proving the profile result-invariant mechanically
        every close-out (r10 verdict #4) instead of by the one-time
        r10 A/B assertion.

The close-out invocation is `--hostile --bench-profile`: ONE tool run
writes ONE machine-generated SWEEP_ALL_SF.txt at the closing HEAD
(r10 advice: a hand-spliced artifact with two HEADs defeats the
"fresh single-run artifact" gate).

Exit 0 iff every SF sweep exits 0. Writes SWEEP_ALL_SF.txt at the repo
root (one summary line per SF + any FAIL lines, with a UTC timestamp
and the git HEAD at run time).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = "/root/testdata"
DEFAULT_SFS = ["sf0.001", "sf0.01", "sf0.1"]

# Representative subset for the --bench-profile invariance leg: the 13
# bench.py keys (the queries actually timed under the profile) plus 7
# AQE-sensitive shapes (multi-exchange aggs, as-of/bucketed joins, set
# ops, an iterative graph op) whose plans the partitions=8/AQE-off
# profile could plausibly perturb.
BENCH_PROFILE_KEYS = [
    "agg_groupby_multi", "join_multiway_star", "sort_multikey",
    "win_row_number_topk", "win_running_frame", "agg_count_distinct",
    "stream_session", "agg_rollup", "join_anti", "str_regexp",
    "similarity_topk", "dedup_near_minhash", "agg_conditional_pivot",
    "agg_cube", "agg_grouping_sets", "join_asof", "join_bucketed",
    "set_intersect_all", "graph_connected_components", "win_moving_median",
]


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    bench_profile = "--bench-profile" in args
    sfs = [a for a in args if not a.startswith("--")] or DEFAULT_SFS
    if hostile:
        sfs = sfs + ["sf0.01-hostile"]
    if bench_profile:
        sfs = sfs + ["sf0.1-benchprofile"]
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    lines = [
        f"# sweep_all_sf @ {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} "
        f"HEAD={head or 'unknown'}"
    ]
    rc = 0
    for sf in sfs:
        env = dict(os.environ)
        env.pop("SWEEP_HOSTILE", None)
        env.pop("SWEEP_BENCH_PROFILE", None)
        extra_keys: list[str] = []
        if sf.endswith("-hostile"):
            env["SWEEP_HOSTILE"] = "1"
            sf_dir = os.path.join(TESTDATA, sf.replace("-hostile", ""))
        elif sf.endswith("-benchprofile"):
            env["SWEEP_BENCH_PROFILE"] = "1"
            sf_dir = os.path.join(TESTDATA, sf.replace("-benchprofile", ""))
            extra_keys = BENCH_PROFILE_KEYS
        else:
            sf_dir = os.path.join(TESTDATA, sf)
        if not os.path.isdir(sf_dir):
            lines.append(f"{sf}: MISSING ({sf_dir})")
            rc = 1
            continue
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "oracle_sweep.py"), sf_dir]
            + extra_keys,
            cwd=REPO,
            capture_output=True,
            text=True,
            env=env,
        )
        dt = time.time() - t0
        summary = next(
            (ln for ln in p.stdout.splitlines() if " keys in " in ln), "NO SUMMARY"
        )
        sf_line = f"{sf}: exit={p.returncode} wall={dt:.0f}s  {summary}"
        lines.append(sf_line)
        for ln in p.stdout.splitlines():
            if ln.strip().startswith("FAIL"):
                lines.append(f"{sf}:   {ln.strip()}")
        if p.returncode != 0:
            rc = 1
            if summary == "NO SUMMARY":
                lines.append(f"{sf}: stderr tail: {p.stderr[-500:]}")
        print(sf_line, file=sys.stderr)
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "SWEEP_ALL_SF.txt"), "w") as f:
        f.write(out)
    print(out)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
