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

from contextlib import contextmanager

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def spread_width(n32: int) -> int:
    """Scale a local[32]-tuned fixture-spread width to this host's
    measured parallelism (SPARK_GRAFT_CPUS — the bench/driver contract
    knob, falling back to the machine's core count): identical layout
    at 32 cores, proportionally fewer tiny tasks when the driver
    benches at lower core counts, proportionally wider with more. The
    spread exists to fan a single-split fixture scan across cores
    before per-row-heavy work (decoders, hash folds); at real scale
    the input arrives already split and the repartition re-keys
    cheaply. Floor 2 keeps the spread real on local[1]."""
    return max(2, n32 * default_parallelism() // 32)


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


@contextmanager
def pinned_shuffle_partitions(spark: SparkSession, n_rows: int, rows_per_partition: int = 500_000):
    """Scale-adaptive shuffle width for driver-side iterative loops
    (BFS/SSSP/PageRank/star-CC...), r11 guide §2: the per-round state of
    these loops is graph-sized, usually orders of magnitude below the
    table data the session's shuffle.partitions is sized for, so each
    round at session width is all task-launch overhead. Pin the width to
    the measured state size (n_rows, typically the checkpointed edge
    count — a cheap count on materialized data), never above the session
    value: at 100 TB the row count keeps the width at the session
    setting and AQE coalesces the shrinking tail, locally a 4-to-8-wide
    loop replaces a 64-wide one. Restores the session conf on exit; the
    DataFrame a caller returns executes later under the restored session
    width, so only the loop's internal actions are affected."""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    parts = max(4, min(int(saved), n_rows // rows_per_partition + 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
