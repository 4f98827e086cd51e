"""Fixture/table IO.

All inputs are the driver-generated parquet fixtures (TESTDATA.md /
FIXTURES.md). At 100 TB the same `spark.read.parquet` path applies —
parquet scans get predicate pushdown, column pruning, and partition
pruning from Catalyst for free as long as callers express filters and
projections declaratively (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses natively
    (PARQUET_TYPE_ILLEGAL); we read nanos as long and convert to a µs
    timestamp with integer division (lossless here — fixture values carry
    only µs precision, FIXTURES.md). Runtime-set so it also works under
    the driver's own SparkSession.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Declared semantics are UTC (oracle compares timestamp VALUES; DuckDB
    # timestamps are naive). Under the driver's own session the timezone is
    # whatever the host JVM defaults to — a non-UTC session silently shifts
    # every date extraction/trunc (verified: date_parts under
    # America/New_York returns h=19 for UTC midnight). Runtime-settable,
    # so enforce it at the data boundary.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def scratch_dir(subdir: str = "") -> str:
    """A writable scratch area inside the repo (gitignored) for sinks."""
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")
    path = os.path.join(base, subdir) if subdir else base
    os.makedirs(path, exist_ok=True)
    return path
