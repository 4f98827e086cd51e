"""SparkSession factory with scale-aware defaults.

Tuned for local[32] testing but every setting is chosen to also be the
right default on a 1000-executor cluster reading 100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the single most important knob at scale.
- Arrow on for every Python<->JVM columnar hop (pandas UDFs, toPandas).
- shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "basis-spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) the shared tuned SparkSession."""
    n = cpus or default_parallelism()
    # Shuffle-partition override for A/B experiments (r9 verdict #2a:
    # re-test bench-profile partition counts with order control). The
    # default stays 2x cores — also the right starting point on a real
    # cluster, where AQE's coalescing absorbs the initial number.
    shuffle_p = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * n))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # memory only applies if we are the one launching the JVM
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", shuffle_p)
        .config("spark.default.parallelism", str(2 * n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # events.ts is parquet TIMESTAMP(NANOS): read as long, convert in io.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    return builder.getOrCreate()
