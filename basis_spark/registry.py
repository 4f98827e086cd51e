"""Operator registry: maps SURVEY.md §2 keys to (PySpark callable, DuckDB oracle SQL).

Every operator registers itself with @register(key, oracle=SQL). The
driver contract (__spark_entry__.py) simply re-exports these dicts.
Operators whose results are approximate/sampled register with
oracle=None and get the driver's weaker rows-only check (SURVEY §5.6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco
