#!/usr/bin/env python
"""Capture the loop-ROUND plan for graph_bfs_distance (r11 verdict item:
"one representative graph-loop key (before/after width in the exchange
nodes)").

The registered key's returned plan cannot evidence the r11
pinned-shuffle-width change: every round ends in localCheckpoint(), so
the final plan is a LogicalRDD with the loop's exchanges truncated
away. The evidencable unit is ONE round's update DataFrame — the
dist ∪ expand → groupBy(min) plan the loop materializes each hop —
explained (a) at the session shuffle width (how rounds planned before
r11's 3db2ed4) and (b) under pinned_shuffle_partitions sized from the
measured edge count (how they plan since). The hashpartitioning width
in the Exchange nodes is the claim under test.

Usage: python tools/capture_bfs_round_plan.py [sf_dir]
Writes plans/r12/graph_bfs_distance_loopround_{before,after}.txt
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.environ["TZ"] = "UTC"
    import time as _t

    _t.tzset()
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from basis_spark.io import load
    from basis_spark.operators.joins import proximity_edges
    from basis_spark.session import get_spark, pinned_shuffle_partitions

    spark = get_spark("capture-bfs-round")
    spark.sparkContext.setLogLevel("ERROR")

    edges = proximity_edges(spark, sf)
    nbr = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    dist = (
        load(spark, sf, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("node"), F.lit(0).alias("d"))
        .localCheckpoint()  # loop state arrives checkpointed, as in the operator
    )

    def round_plan() -> str:
        expanded = dist.join(nbr, dist["node"] == nbr["u"]).select(
            F.col("v").alias("node"), (F.col("d") + 1).alias("d")
        )
        upd = dist.unionAll(expanded).groupBy("node").agg(F.min("d").alias("d"))
        return upd._sc._jvm.PythonSQLUtils.explainString(
            upd._jdf.queryExecution(), "formatted"
        )

    outdir = os.path.join(REPO, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    n_edges = edges.count()
    session_w = spark.conf.get("spark.sql.shuffle.partitions")
    before = round_plan()
    with pinned_shuffle_partitions(spark, n_edges) as parts:
        after = round_plan()

    for suffix, txt, note in (
        ("before", before, f"session width {session_w}"),
        ("after", after, f"pinned width {parts} (edge count {n_edges})"),
    ):
        path = os.path.join(outdir, f"graph_bfs_distance_loopround_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# graph_bfs_distance — ONE loop round's update plan at {sf}"
                f" ({suffix}: {note}).\n"
                "# The registered key's final plan is checkpoint-truncated"
                " (LogicalRDD), so the loop-internal round plan is the"
                " evidencable unit for the r11 width-pinning change.\n"
            )
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
