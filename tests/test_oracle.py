"""Differential oracle tests (SURVEY.md §5.1): every registered operator
with oracle SQL is compared Spark-vs-DuckDB at sf0.01 — the same check
the driver's t2 harness runs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, compare_frames

_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("key", _KEYS)
def test_oracle_match(spark, duck, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    compare_frames(q(spark, SF_ORACLE), duck, sql, key=key)


def test_every_query_runs(spark):
    """Keys without oracle SQL still must run and return a DataFrame."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for key, fn in sorted(qs.items()):
        if key in oracles:
            continue
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0, key


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
