"""The driver runs queries() under ITS OWN SparkSession, not ours.
These tests spawn a subprocess whose session has hostile defaults
(non-UTC timezone, none of our tuned confs) and assert the contract
still holds: entry() runs, events load (nanos adapter is runtime-set),
and date extraction matches the UTC oracle semantics."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
Q = mod.queries()
assert len(mod.entry(spark).collect()) > 0
row = sorted(Q["date_parts"](spark, "/root/testdata/sf0.001").collect(),
             key=lambda r: r["event_id"])[0]
# events.ts starts at 2024-01-01 00:00:00 UTC: a tz-leaking session
# would report y=2023/h=19 here (America/New_York).
assert (row["y"], row["h"]) == (2024, 0), dict(row.asDict())
n = Q["agg_count_distinct"](spark, "/root/testdata/sf0.001").count()
assert n > 0
print("HOSTILE_SESSION_OK")
"""


def test_queries_survive_hostile_driver_session():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "HOSTILE_SESSION_OK" in res.stdout, res.stdout + res.stderr
